#!/usr/bin/env python3
"""Extract the reference's LogsQL parser conformance corpus.

Reads /root/reference/lib/logstorage/parser_test.go and pulls the query
strings out of TestParseQuery_Success (f(input, canonical)) and
TestParseQuery_Failure (f(input)) into two fixture files under
src/test/resources/conformance/:

  parser_success.txt  - one JSON-encoded string per line (the input)
  parser_failure.txt  - one JSON-encoded string per line

JSON encoding keeps newlines/quotes unambiguous for the ScalaTest reader.
This extracts test DATA (query strings = observable parser behavior), not
reference code.
"""
import json
import os
import re
import sys

REF = "/root/reference/lib/logstorage/parser_test.go"
OUT = os.path.join(os.path.dirname(__file__), "..", "src", "test",
                   "resources", "conformance")


def parse_go_string(src, i):
    """Parse a Go string literal starting at src[i]; return (value, next)."""
    c = src[i]
    if c == '`':
        j = src.index('`', i + 1)
        return src[i + 1:j], j + 1
    if c in ('"', "'"):
        quote = c
        out = []
        j = i + 1
        while True:
            ch = src[j]
            if ch == '\\':
                nxt = src[j + 1]
                mapping = {'n': '\n', 't': '\t', 'r': '\r', '\\': '\\',
                           '"': '"', "'": "'", 'a': '\a', 'b': '\b',
                           'f': '\f', 'v': '\v', '0': '\0'}
                if nxt in mapping:
                    out.append(mapping[nxt])
                    j += 2
                elif nxt == 'x':
                    out.append(chr(int(src[j + 2:j + 4], 16)))
                    j += 4
                elif nxt == 'u':
                    out.append(chr(int(src[j + 2:j + 6], 16)))
                    j += 6
                else:
                    raise ValueError(f"escape \\{nxt} at {j}")
            elif ch == quote:
                return ''.join(out), j + 1
            else:
                out.append(ch)
                j += 1


def extract(body, pairs=False):
    """Yield first-argument strings (or (first, second) pairs) of every
    f(...) call in body."""
    for m in re.finditer(r'(?m)^\tf\(', body):
        i = m.end()
        while body[i] in ' \t\n':
            i += 1
        val, j = parse_go_string(body, i)
        if not pairs:
            yield val
            continue
        while body[j] in ' \t\n':
            j += 1
        if body[j] != ',':
            raise ValueError(f"expected ',' after first arg at {j}")
        j += 1
        while body[j] in ' \t\n':
            j += 1
        want, _ = parse_go_string(body, j)
        yield val, want


def func_body(src, name):
    start = src.index(f"func {name}(t *testing.T) {{")
    # body ends at the first line that is exactly "}"
    end = src.index("\n}\n", start)
    return src[start:end]


def main():
    src = open(REF, encoding="utf-8").read()
    os.makedirs(OUT, exist_ok=True)
    for fn, out in (("TestParseQuery_Success", "parser_success.txt"),
                    ("TestParseQuery_Failure", "parser_failure.txt")):
        vals = list(extract(func_body(src, fn)))
        path = os.path.join(OUT, out)
        with open(path, "w", encoding="utf-8") as fh:
            fh.write("# extracted from lib/logstorage/parser_test.go "
                     f"({fn}) by tools/extract_parser_corpus.py\n")
            for v in vals:
                fh.write(json.dumps(v, ensure_ascii=False) + "\n")
        print(f"{out}: {len(vals)} cases")
    # (input, canonical) pairs for the renderer conformance spec
    vals = list(extract(func_body(src, "TestParseQuery_Success"), pairs=True))
    path = os.path.join(OUT, "parser_canonical.txt")
    with open(path, "w", encoding="utf-8") as fh:
        fh.write("# [input, canonical] pairs from TestParseQuery_Success "
                 "(parser_test.go) by tools/extract_parser_corpus.py\n")
        for v in vals:
            fh.write(json.dumps(list(v), ensure_ascii=False) + "\n")
    print(f"parser_canonical.txt: {len(vals)} pairs")
    # (input, canonical-after-AddTimeFilter(2024-12-25T14:56:43Z,
    # 2025-01-13T12:45:34Z)) pairs for the injection conformance spec
    vals = list(extract(func_body(src, "TestQuery_AddTimeFilter"), pairs=True))
    path = os.path.join(OUT, "add_time_filter.txt")
    with open(path, "w", encoding="utf-8") as fh:
        fh.write("# [input, canonical after AddTimeFilter] pairs from "
                 "TestQuery_AddTimeFilter (parser_test.go) by "
                 "tools/extract_parser_corpus.py\n")
        for v in vals:
            fh.write(json.dumps(list(v), ensure_ascii=False) + "\n")
    print(f"add_time_filter.txt: {len(vals)} pairs")


if __name__ == "__main__":
    sys.exit(main())
