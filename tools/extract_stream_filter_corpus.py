#!/usr/bin/env python3
"""Extract TestStreamFilterMatchStreamName from
lib/logstorage/stream_filter_test.go:

    f(`{foo="bar"}`, `{a="b",foo="bar"}`, true)

-> {"filter": "...", "stream": "...", "match": true}

This extracts test DATA (filter + stream name + golden verdict), not
reference code.
"""
import json
import os
import re
import sys

SRC = "/root/reference/lib/logstorage/stream_filter_test.go"
OUT = os.path.join(os.path.dirname(__file__), "..", "src", "test",
                   "resources", "conformance", "stream_filter_match.txt")


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
            out.append(m[nxt])
            j += 2
        elif ch == '"':
            return ''.join(out), j + 1
        else:
            out.append(ch)
            j += 1


def skip_ws(src, i):
    while src[i] in ' \t\n':
        i += 1
    return i


def main():
    src = open(SRC, encoding="utf-8").read()
    tm = re.search(r'func TestStreamFilterMatchStreamName\(t \*testing\.T\) \{',
                   src)
    end = src.find("\nfunc ", tm.end())
    body = src[tm.end():end]
    cases = []
    for m in re.finditer(r'(?m)^\tf\(', body):
        i = skip_ws(body, m.end())
        flt, i = parse_go_string(body, i)
        i = skip_ws(body, i)
        assert body[i] == ','
        stream, i = parse_go_string(body, skip_ws(body, i + 1))
        i = skip_ws(body, i)
        assert body[i] == ','
        i = skip_ws(body, i + 1)
        if body.startswith("true", i):
            match = True
        elif body.startswith("false", i):
            match = False
        else:
            raise ValueError(body[i:i+20])
        cases.append({"filter": flt, "stream": stream, "match": match})
    with open(OUT, "w", encoding="utf-8") as fh:
        fh.write("# extracted from lib/logstorage/stream_filter_test.go "
                 "(TestStreamFilterMatchStreamName) by "
                 "tools/extract_stream_filter_corpus.py\n")
        for c in cases:
            fh.write(json.dumps(c, ensure_ascii=False) + "\n")
    print(f"stream_filter_match.txt: {len(cases)} cases")


if __name__ == "__main__":
    sys.exit(main())
