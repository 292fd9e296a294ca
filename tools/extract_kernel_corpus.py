#!/usr/bin/env python3
"""Extract kernel-level golden tables:

- json_parser_test.go TestJSONParserSuccess: f(json, []Field{...}) and
  TestJSONParserFailure: f(json) → conformance/json_parser.txt
  {"in":..., "out":[[k,v],...] | null}  (null = must fail)
- tokenizer_test.go TestTokenizeStrings: f([]string{...}, []string{...})
  → conformance/tokenizer.txt {"in":[...], "out":[...]}
"""
import json
import os
import re
import sys

DIR = "/root/reference/lib/logstorage"
OUT = os.path.join(os.path.dirname(__file__), "..", "src", "test",
                   "resources", "conformance")


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
            m = {'n': '\n', 't': '\t', 'r': '\r', '\\': '\\', '"': '"'}
            if nxt in m:
                out.append(m[nxt]); j += 2
            elif nxt == 'x':
                out.append(chr(int(src[j + 2:j + 4], 16))); j += 4
            elif nxt == 'u':
                out.append(chr(int(src[j + 2:j + 6], 16))); j += 6
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


def parse_fields(src, i):
    """[]Field{ {Name: ..., Value: ...} | {"n", "v"}, ... } or nil."""
    i = skip_ws(src, i)
    if src.startswith("nil", i):
        return [], i + 3
    m = re.match(r'\[\](?:logstorage\.)?Field\{', src[i:])
    assert m, src[i:i+30]
    i += m.end()
    out = []
    while True:
        i = skip_ws(src, i)
        if src[i] == '}':
            return out, i + 1
        assert src[i] == '{'
        i = skip_ws(src, i + 1)
        name = value = None
        while src[i] != '}':
            fm = re.match(r'(Name|Value)\s*:', src[i:])
            if fm:
                i = skip_ws(src, i + fm.end())
                v, i = parse_go_string(src, i)
                if fm.group(1) == "Name":
                    name = v
                else:
                    value = v
            else:
                v, i = parse_go_string(src, i)
                if name is None:
                    name = v
                else:
                    value = v
            i = skip_ws(src, i)
            if src[i] == ',':
                i = skip_ws(src, i + 1)
        i += 1
        out.append([name, value])
        i = skip_ws(src, i)
        if src[i] == ',':
            i += 1


def extract_json_parser():
    src = open(f"{DIR}/json_parser_test.go", encoding="utf-8").read()
    cases = []
    body = body_of(src, "TestJSONParserFailure")
    for m in re.finditer(r'(?m)^\tf\(', body):
        v, _ = parse_go_string(body, skip_ws(body, m.end()))
        cases.append({"in": v, "out": None})
    body = body_of(src, "TestJSONParserSuccess")
    for m in re.finditer(r'(?m)^\tf\(', body):
        i = skip_ws(body, m.end())
        v, i = parse_go_string(body, i)
        i = skip_ws(body, i)
        assert body[i] == ','
        fields, _ = parse_fields(body, i + 1)
        cases.append({"in": v, "out": fields})
    path = os.path.join(OUT, "json_parser.txt")
    with open(path, "w", encoding="utf-8") as fh:
        fh.write("# extracted from json_parser_test.go by "
                 "tools/extract_kernel_corpus.py\n")
        for c in cases:
            fh.write(json.dumps(c, ensure_ascii=False) + "\n")
    print(f"json_parser.txt: {len(cases)} cases")


def parse_string_list(src, i):
    i = skip_ws(src, i)
    if src.startswith("nil", i):
        return [], i + 3
    m = re.match(r'(?:\[\]string\{|strings\.Split\()', src[i:])
    assert m, src[i:i+40]
    if src[i:].startswith("strings.Split("):
        i += len("strings.Split(")
        s, i = parse_go_string(src, skip_ws(src, i))
        i = skip_ws(src, i)
        assert src[i] == ','
        sep, i = parse_go_string(src, skip_ws(src, i + 1))
        i = skip_ws(src, i)
        assert src[i] == ')'
        return s.split(sep), i + 1
    i += m.end()
    vals = []
    while True:
        i = skip_ws(src, i)
        if src[i] == '}':
            return vals, i + 1
        v, i = parse_go_string(src, i)
        vals.append(v)
        i = skip_ws(src, i)
        if src[i] == ',':
            i += 1


def extract_tokenizer():
    src = open(f"{DIR}/tokenizer_test.go", encoding="utf-8").read()
    body = body_of(src, "TestTokenizeStrings")
    cases = []
    for m in re.finditer(r'(?m)^\tf\(', body):
        i = skip_ws(body, m.end())
        ins, i = parse_string_list(body, i)
        i = skip_ws(body, i)
        assert body[i] == ','
        outs, _ = parse_string_list(body, i + 1)
        cases.append({"in": ins, "out": outs})
    path = os.path.join(OUT, "tokenizer.txt")
    with open(path, "w", encoding="utf-8") as fh:
        fh.write("# extracted from tokenizer_test.go by "
                 "tools/extract_kernel_corpus.py\n")
        for c in cases:
            fh.write(json.dumps(c, ensure_ascii=False) + "\n")
    print(f"tokenizer.txt: {len(cases)} cases")


def extract_extra_filters():
    src = open("/root/reference/app/vlselect/logsql/logsql_test.go",
               encoding="utf-8").read()
    cases = []
    for fn, stream, ok in (
            ("TestParseExtraFilters_Success", False, True),
            ("TestParseExtraFilters_Failure", False, False),
            ("TestParseExtraStreamFilters_Success", True, True),
            ("TestParseExtraStreamFilters_Failure", True, False)):
        body = body_of(src, fn)
        for m in re.finditer(r'(?m)^\tf\(', body):
            i = skip_ws(body, m.end())
            v, i = parse_go_string(body, i)
            out = None
            if ok:
                i = skip_ws(body, i)
                assert body[i] == ','
                out, _ = parse_go_string(body, skip_ws(body, i + 1))
            cases.append({"in": v, "stream": stream, "out": out})
    path = os.path.join(OUT, "extra_filters.txt")
    with open(path, "w", encoding="utf-8") as fh:
        fh.write("# extracted from app/vlselect/logsql/logsql_test.go by "
                 "tools/extract_kernel_corpus.py\n")
        for c in cases:
            fh.write(json.dumps(c, ensure_ascii=False) + "\n")
    print(f"extra_filters.txt: {len(cases)} cases")


def extract_logfmt_parser():
    """logfmt_parser_test.go TestLogfmtParser: f(s, resultExpected) where
    the expectation is the MarshalFieldsToLogfmt re-rendering."""
    src = open(f"{DIR}/logfmt_parser_test.go", encoding="utf-8").read()
    body = body_of(src, "TestLogfmtParser")
    cases = []
    for m in re.finditer(r'(?m)^\tf\(', body):
        i = skip_ws(body, m.end())
        s, i = parse_go_string(body, i)
        i = skip_ws(body, i)
        assert body[i] == ','
        out, _ = parse_go_string(body, skip_ws(body, i + 1))
        cases.append({"in": s, "out": out})
    path = os.path.join(OUT, "logfmt_parser.txt")
    with open(path, "w", encoding="utf-8") as fh:
        fh.write("# extracted from logfmt_parser_test.go by "
                 "tools/extract_kernel_corpus.py\n")
        for c in cases:
            fh.write(json.dumps(c, ensure_ascii=False) + "\n")
    print(f"logfmt_parser.txt: {len(cases)} cases")


def extract_values_encoder():
    """values_encoder_test.go tryParseXxx golden tables: ipv4 / iso8601
    string-roundtrip successes and failures, float64-exact / uint64 /
    int64 successes (with expected values) and failures."""
    src = open(f"{DIR}/values_encoder_test.go", encoding="utf-8").read()
    cases = []

    def grab_expr(body, i):
        """Text of the argument up to the call's closing ')' or next ','
        at depth 0."""
        depth = 0
        j = i
        while True:
            c = body[j]
            if c == '(':
                depth += 1
            elif c == ')':
                if depth == 0:
                    break
                depth -= 1
            elif c == ',' and depth == 0:
                break
            j += 1
        return body[i:j].strip(), j

    def num_expr(body, i):
        """Constant Go int expression: digits, parens, <<, +, -, *."""
        txt, j = grab_expr(body, i)
        txt = txt.replace('_', '')
        assert re.fullmatch(r'[0-9()<>+\-* ]+', txt), txt
        return eval(txt), j  # arithmetic over ints only

    def flt_expr(body, i):
        txt, j = grab_expr(body, i)
        txt = txt.replace('_', '')
        assert re.fullmatch(r'[0-9()<>+\-*. ]+', txt), txt
        return float(eval(txt)), j

    tables = [
        ("TestTryParseIPv4String_Success", "ipv4_ok", None),
        ("TestTryParseIPv4_Failure", "ipv4_bad", None),
        ("TestTryParseTimestampISO8601String_Success", "iso_ok", None),
        ("TestTryParseTimestampISO8601_Failure", "iso_bad", None),
        ("TestTryParseFloat64Exact_Success", "f64x_ok", flt_expr),
        ("TestTryParseFloat64Exact_Failure", "f64x_bad", None),
        ("TestTryParseUint64_Success", "u64_ok", num_expr),
        ("TestTryParseUint64_Failure", "u64_bad", None),
        ("TestTryParseInt64_Success", "i64_ok", num_expr),
        ("TestTryParseInt64_Failure", "i64_bad", None),
    ]
    for tname, kind, expr_fn in tables:
        body = body_of(src, tname)
        for m in re.finditer(r'(?m)^\tf\(', body):
            i = skip_ws(body, m.end())
            s, i = parse_go_string(body, i)
            c = {"t": kind, "in": s}
            if expr_fn is not None:
                i = skip_ws(body, i)
                assert body[i] == ','
                v, _ = expr_fn(body, skip_ws(body, i + 1))
                c["out"] = str(v)
            cases.append(c)
    path = os.path.join(OUT, "values_encoder.txt")
    with open(path, "w", encoding="utf-8") as fh:
        fh.write("# extracted from values_encoder_test.go by "
                 "tools/extract_kernel_corpus.py\n")
        for c in cases:
            fh.write(json.dumps(c, ensure_ascii=False) + "\n")
    print(f"values_encoder.txt: {len(cases)} cases")


def extract_timestamp_parse():
    """RFC3339Nano roundtrip/failure tables (values_encoder_test.go) +
    ingest ExtractTimestampFromFields tables
    (app/vlinsert/insertutil/timestamp_test.go)."""
    cases = []

    src = open(f"{DIR}/values_encoder_test.go", encoding="utf-8").read()
    body = body_of(src, "TestTryParseTimestampRFC3339NanoString_Success")
    for m in re.finditer(r'(?m)^\tf\(', body):
        i = skip_ws(body, m.end())
        s, i = parse_go_string(body, i)
        i = skip_ws(body, i)
        assert body[i] == ','
        out, _ = parse_go_string(body, skip_ws(body, i + 1))
        cases.append({"t": "rfc_rt", "in": s, "out": out})
    src = open(f"{DIR}/values_encoder_test.go", encoding="utf-8").read()
    body = body_of(src, "TestTryParseTimestampRFC3339Nano_Failure")
    for m in re.finditer(r'(?m)^\tf\(', body):
        s, _ = parse_go_string(body, skip_ws(body, m.end()))
        cases.append({"t": "rfc_bad", "in": s})

    tsrc = open("/root/reference/app/vlinsert/insertutil/timestamp_test.go",
                encoding="utf-8").read()
    body = body_of(tsrc, "TestExtractTimestampFromFields_Success")
    for m in re.finditer(r'(?m)^\tf\(', body):
        i = skip_ws(body, m.end())
        time_field, i = parse_go_string(body, i)
        i = skip_ws(body, i)
        assert body[i] == ','
        fields, i = parse_fields(body, skip_ws(body, i + 1))
        i = skip_ws(body, i)
        assert body[i] == ','
        m2 = re.match(r'\s*(-?\d+)', body[i + 1:])
        nsecs = int(m2.group(1))
        val = dict(fields)[time_field]
        cases.append({"t": "ingest_ok", "in": val, "out": str(nsecs)})
    body = body_of(tsrc, "TestExtractTimestampFromFields_Now")
    for m in re.finditer(r'(?m)^\tf\(', body):
        i = skip_ws(body, m.end())
        time_field, i = parse_go_string(body, i)
        i = skip_ws(body, i)
        assert body[i] == ','
        fields, _ = parse_fields(body, skip_ws(body, i + 1))
        cases.append({"t": "ingest_now", "in": dict(fields)[time_field]})
    body = body_of(tsrc, "TestExtractTimestampFromFields_Error")
    for m in re.finditer(r'(?m)^\tf\(', body):
        s, _ = parse_go_string(body, skip_ws(body, m.end()))
        cases.append({"t": "ingest_bad", "in": s})

    path = os.path.join(OUT, "timestamp_parse.txt")
    with open(path, "w", encoding="utf-8") as fh:
        fh.write("# extracted from values_encoder_test.go (RFC3339Nano) and "
                 "app/vlinsert/insertutil/timestamp_test.go by "
                 "tools/extract_kernel_corpus.py\n")
        for c in cases:
            fh.write(json.dumps(c, ensure_ascii=False) + "\n")
    print(f"timestamp_parse.txt: {len(cases)} cases")


def extract_duration_bytes():
    """tryParseDuration / tryParseBytes / marshalDurationString golden
    tables (values_encoder_test.go). Numeric expectations are Go constant
    expressions over the nsecsPerXxx constants — evaluated exactly with
    Fractions."""
    from fractions import Fraction

    CONSTS = {
        "nsecsPerYear": 365 * 24 * 3600 * 10**9,
        "nsecsPerWeek": 7 * 24 * 3600 * 10**9,
        "nsecsPerDay": 24 * 3600 * 10**9,
        "nsecsPerHour": 3600 * 10**9,
        "nsecsPerMinute": 60 * 10**9,
        "nsecsPerSecond": 10**9,
        "nsecsPerMillisecond": 10**6,
        "nsecsPerMicrosecond": 10**3,
    }

    def grab_expr(body, i):
        depth = 0
        j = i
        while True:
            c = body[j]
            if c == '(':
                depth += 1
            elif c == ')':
                if depth == 0:
                    break
                depth -= 1
            elif c == ',' and depth == 0:
                break
            j += 1
        return body[i:j].strip(), j

    def eval_expr(txt):
        # exact: Fractions for decimals, ints elsewhere; << as *2**
        t = txt.replace('_', '')
        for k, v in CONSTS.items():
            t = t.replace(k, str(v))
        t = re.sub(r'(\d+\.\d+)', r'F("\1")', t)
        t = t.replace('<<', '*2**')
        v = eval(t, {"F": Fraction})
        assert v == int(v), txt
        return int(v)

    src = open(f"{DIR}/values_encoder_test.go", encoding="utf-8").read()
    cases = []
    for tname, kind, has_out, str_out in (
            ("TestTryParseDuration_Success", "dur_ok", True, False),
            ("TestTryParseDuration_Failure", "dur_bad", False, False),
            ("TestTryParseBytes_Success", "bytes_ok", True, False),
            ("TestTryParseBytes_Failure", "bytes_bad", False, False)):
        body = body_of(src, tname)
        for m in re.finditer(r'(?m)^\tf\(', body):
            i = skip_ws(body, m.end())
            s, i = parse_go_string(body, i)
            c = {"t": kind, "in": s}
            if has_out:
                i = skip_ws(body, i)
                assert body[i] == ','
                txt, _ = grab_expr(body, skip_ws(body, i + 1))
                c["out"] = str(eval_expr(txt))
            cases.append(c)
    # marshalDurationString: f(nsecs, resultExpected)
    body = body_of(src, "TestMarshalDurationString")
    for m in re.finditer(r'(?m)^\tf\(', body):
        i = skip_ws(body, m.end())
        txt, i = grab_expr(body, i)
        i = skip_ws(body, i)
        assert body[i] == ','
        s, _ = parse_go_string(body, skip_ws(body, i + 1))
        cases.append({"t": "dur_str", "in": str(eval_expr(txt)), "out": s})
    path = os.path.join(OUT, "duration_bytes.txt")
    with open(path, "w", encoding="utf-8") as fh:
        fh.write("# extracted from values_encoder_test.go (duration/bytes "
                 "tables) by tools/extract_kernel_corpus.py\n")
        for c in cases:
            fh.write(json.dumps(c, ensure_ascii=False) + "\n")
    print(f"duration_bytes.txt: {len(cases)} cases")


if __name__ == "__main__":
    extract_json_parser()
    extract_tokenizer()
    extract_extra_filters()
    extract_logfmt_parser()
    extract_values_encoder()
    extract_timestamp_parse()
    extract_duration_bytes()
    sys.exit(0)
