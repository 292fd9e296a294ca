#!/usr/bin/env python3
"""Extract ingest-protocol golden tables from app/vlinsert/*_test.go:

- jsonline TestProcessStreamInternalSuccess:
    f(data, timeField, msgField, []int64{...}, resultExpected)
- elasticsearch TestReadBulkRequest_Success:
    f(data, encoding, timeField, msgField, []int64{...}, result)
- loki TestParseJSONRequest_Success: f(payload, []int64{...}, result)
- datadog TestReadLogsRequestSuccess: f(data, rowsExpected, result)
  (timestamps are the ingestion time there)

-> conformance/ingest_protocols.txt
   {"proto": ..., "in": payload, "time_field": ..., "msg_field": ...,
    "ts": [...], "rows": ["{json}", ...]}

This extracts test DATA (payloads + expected parsed rows), not
reference code.
"""
import json
import os
import re
import sys

OUT = os.path.join(os.path.dirname(__file__), "..", "src", "test",
                   "resources", "conformance", "ingest_protocols.txt")


def parse_go_string(src, i):
    c = src[i]
    if c == '`':
        j = src.index('`', i + 1)
        return src[i + 1:j], j + 1
    assert c == '"', src[i:i+30]
    out = []
    j = i + 1
    while True:
        ch = src[j]
        if ch == '\\':
            nxt = src[j + 1]
            m = {'n': '\n', 't': '\t', 'r': '\r', '\\': '\\', '"': '"',
                 'a': '\a', 'b': '\b', 'f': '\f', 'v': '\v'}
            if nxt in m:
                out.append(m[nxt]); j += 2
            elif nxt == 'x':
                out.append(chr(int(src[j + 2:j + 4], 16))); j += 4
            elif nxt == 'u':
                out.append(chr(int(src[j + 2:j + 6], 16))); j += 6
            elif nxt == '0':
                out.append('\0'); j += 2
            else:
                raise ValueError(f"escape {nxt}")
        elif ch == '"':
            return ''.join(out), j + 1
        else:
            out.append(ch); j += 1


def skip_ws(src, i):
    while True:
        while i < len(src) and src[i] in ' \t\n':
            i += 1
        if src.startswith("//", i):
            i = src.index('\n', i)
            continue
        return i


def body_of(src, name):
    start = src.index(f"func {name}(t *testing.T) {{")
    end = src.find("\nfunc ", start + 10)
    return src[start:end] if end > 0 else src[start:]


def parse_int_list(src, i):
    i = skip_ws(src, i)
    if src.startswith("nil", i):
        return [], i + 3
    m = re.match(r'\[\]int64\{', src[i:])
    assert m, src[i:i+30]
    i += m.end()
    out = []
    while True:
        i = skip_ws(src, i)
        if src[i] == '}':
            return out, i + 1
        m2 = re.match(r'-?\d+', src[i:])
        assert m2, src[i:i+30]
        out.append(int(m2.group(0)))
        i += m2.end()
        i = skip_ws(src, i)
        if src[i] == ',':
            i += 1


def string_var_env(body):
    """data := `...` / timeField = "x" style assignments, walked in order
    alongside the f(...) calls using VARIABLES (jsonline style)."""
    events = []
    for m in re.finditer(
            r'(?m)^\t(\w+) :?= ([`"])', body):
        events.append((m.start(), "assign", m))
    for m in re.finditer(r'(?m)^\t(\w+) :?= \[\]int64\{', body):
        events.append((m.start(), "ints", m))
    for m in re.finditer(r'(?m)^\tf\(', body):
        events.append((m.start(), "call", m))
    events.sort(key=lambda e: e[0])
    return events


def resolve(arg, env):
    return env[arg] if isinstance(arg, str) and arg in env else arg


def extract_jsonline(cases):
    src = open("/root/reference/app/vlinsert/jsonline/jsonline_test.go",
               encoding="utf-8").read()
    body = body_of(src, "TestProcessStreamInternalSuccess")
    env = {}
    for pos, kind, m in string_var_env(body):
        if kind == "assign":
            v, _ = parse_go_string(body, body.index(m.group(2), m.start()))
            env[m.group(1)] = v
        elif kind == "ints":
            v, _ = parse_int_list(body, body.index("[]int64{", m.start()))
            env[m.group(1)] = v
        else:  # call f(data, timeField, msgField, timestampsExpected, result)
            i = skip_ws(body, m.end())
            args = []
            for _ in range(5):
                i = skip_ws(body, i)
                if body[i] in '`"':
                    v, i = parse_go_string(body, i)
                elif body.startswith("[]int64{", i):
                    v, i = parse_int_list(body, i)
                else:
                    vm = re.match(r'[A-Za-z_][A-Za-z0-9_]*', body[i:])
                    v = env[vm.group(0)]
                    i += vm.end()
                args.append(v)
                i = skip_ws(body, i)
                if body[i] == ',':
                    i += 1
            data, tf, mf, ts, res = args
            cases.append({"proto": "jsonline", "in": data, "time_field": tf,
                          "msg_field": mf, "ts": ts,
                          "rows": [l for l in res.split("\n") if l]})


def extract_elasticsearch(cases):
    src = open(
        "/root/reference/app/vlinsert/elasticsearch/elasticsearch_test.go",
        encoding="utf-8").read()
    body = body_of(src, "TestReadBulkRequest_Success")
    env = {}
    for pos, kind, m in string_var_env(body):
        if kind == "assign":
            v, _ = parse_go_string(body, body.index(m.group(2), m.start()))
            env[m.group(1)] = v
        elif kind == "ints":
            v, _ = parse_int_list(body, body.index("[]int64{", m.start()))
            env[m.group(1)] = v
        else:  # f(data, encoding, timeField, msgField, ts, result)
            i = skip_ws(body, m.end())
            args = []
            for _ in range(6):
                i = skip_ws(body, i)
                if body[i] in '`"':
                    v, i = parse_go_string(body, i)
                elif body.startswith("[]int64{", i):
                    v, i = parse_int_list(body, i)
                elif body.startswith("nil", i):
                    v = []
                    i += 3
                else:
                    vm = re.match(r'[A-Za-z_][A-Za-z0-9_]*', body[i:])
                    v = env[vm.group(0)]
                    i += vm.end()
                args.append(v)
                i = skip_ws(body, i)
                if body[i] == ',':
                    i += 1
            data, _enc, tf, mf, ts, res = args
            cases.append({"proto": "elasticsearch", "in": data,
                          "time_field": tf, "msg_field": mf, "ts": ts,
                          "rows": [l for l in res.split("\n") if l]})


def extract_loki(cases):
    src = open("/root/reference/app/vlinsert/loki/loki_json_test.go",
               encoding="utf-8").read()
    body = body_of(src, "TestParseJSONRequest_Success")
    for m in re.finditer(r'(?m)^\tf\(', body):
        i = skip_ws(body, m.end())
        data, i = parse_go_string(body, i)
        i = skip_ws(body, i)
        assert body[i] == ','
        ts, i = parse_int_list(body, i + 1)
        i = skip_ws(body, i)
        assert body[i] == ','
        res, _ = parse_go_string(body, skip_ws(body, i + 1))
        cases.append({"proto": "loki_json", "in": data, "ts": ts,
                      "rows": [l for l in res.split("\n") if l]})


def extract_datadog(cases):
    src = open("/root/reference/app/vlinsert/datadog/datadog_test.go",
               encoding="utf-8").read()
    body = body_of(src, "TestReadLogsRequestSuccess")
    env = {}
    for m in re.finditer(r'(?m)^\t(\w+) :?= (\d+)$', body):
        env[m.group(1)] = m.group(2)
    for pos, kind, m in string_var_env(body):
        if kind == "assign":
            v, _ = parse_go_string(body, body.index(m.group(2), m.start()))
            env[m.group(1)] = v
        elif kind == "ints":
            pass
        else:  # f(data, rowsExpected, result)
            i = skip_ws(body, m.end())
            if body[i] in '`"':
                data, i = parse_go_string(body, i)
            else:
                vm = re.match(r'[A-Za-z_][A-Za-z0-9_]*', body[i:])
                data = env[vm.group(0)]
                i += vm.end()
            i = skip_ws(body, i)
            assert body[i] == ','
            i = skip_ws(body, i + 1)
            nm = re.match(r'\d+|\w+', body[i:])
            tok = nm.group(0)
            nrows = int(tok if tok.isdigit() else env[tok])
            i += nm.end()
            i = skip_ws(body, i)
            assert body[i] == ','
            i = skip_ws(body, i + 1)
            if body[i] in '`"':
                res, _ = parse_go_string(body, i)
            else:
                vm = re.match(r'[A-Za-z_][A-Za-z0-9_]*', body[i:])
                res = env[vm.group(0)]
            cases.append({"proto": "datadog", "in": data, "ts": [],
                          "nrows": nrows,
                          "rows": [l for l in res.split("\n") if l]})


def extract_journald(cases):
    src = open("/root/reference/app/vlinsert/journald/journald_test.go",
               encoding="utf-8").read()
    body = body_of(src, "TestPushJournald_Success")
    for m in re.finditer(r'(?m)^\tf\(', body):
        i = skip_ws(body, m.end())
        data, i = parse_go_string(body, i)
        i = skip_ws(body, i)
        assert body[i] == ','
        ts, i = parse_int_list(body, i + 1)
        i = skip_ws(body, i)
        assert body[i] == ','
        res, _ = parse_go_string(body, skip_ws(body, i + 1))
        cases.append({"proto": "journald", "in": data, "ts": ts,
                      "rows": [l for l in res.split("\n") if l]})


def main():
    cases = []
    extract_jsonline(cases)
    extract_elasticsearch(cases)
    extract_loki(cases)
    extract_datadog(cases)
    extract_journald(cases)
    with open(OUT, "w", encoding="utf-8") as fh:
        fh.write("# extracted from app/vlinsert/{jsonline,elasticsearch,"
                 "loki,datadog} tests by tools/extract_protocol_corpus.py\n")
        for c in cases:
            fh.write(json.dumps(c, ensure_ascii=False) + "\n")
    by = {}
    for c in cases:
        by[c["proto"]] = by.get(c["proto"], 0) + 1
    for k in sorted(by):
        print(f"{k}: {by[k]}")
    print(f"total: {len(cases)}")


if __name__ == "__main__":
    sys.exit(main())
