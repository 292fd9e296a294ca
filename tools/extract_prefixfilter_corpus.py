#!/usr/bin/env python3
"""Extract lib/prefixfilter/filter_test.go's table-driven goldens.

Every `f(...)` call becomes {"test": <TestName>, "args": [...]} where an
arg is a string, a list of strings ([]string{...}), null (nil), or a
bool. The Scala spec dispatches on the test name.

This extracts test DATA (inputs + expected outputs), not reference code.
"""
import json
import os
import re
import sys

SRC = "/root/reference/lib/prefixfilter/filter_test.go"
OUT = os.path.join(os.path.dirname(__file__), "..", "src", "test",
                   "resources", "conformance", "prefixfilter.txt")


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


def parse_arg(src, i):
    i = skip_ws(src, i)
    if src.startswith("nil", i):
        return None, i + 3
    if src.startswith("true", i):
        return True, i + 4
    if src.startswith("false", i):
        return False, i + 5
    if src.startswith("[]string{", i):
        i += len("[]string{")
        out = []
        while True:
            i = skip_ws(src, i)
            if src[i] == '}':
                return out, i + 1
            v, i = parse_go_string(src, i)
            out.append(v)
            i = skip_ws(src, i)
            if src[i] == ',':
                i += 1
    if src[i] in '"`':
        return parse_go_string(src, i)
    raise ValueError(f"unparseable arg at {i}: {src[i:i+30]!r}")


def main():
    src = open(SRC, encoding="utf-8").read()
    cases = []
    for tm in re.finditer(r'func (Test\w+)\(t \*testing\.T\) \{', src):
        tname = tm.group(1)
        end = src.find("\nfunc ", tm.end())
        body = src[tm.end():end if end > 0 else len(src)]
        if "f := func(" not in body:
            continue
        for m in re.finditer(r'(?m)^\tf\(', body):
            i = m.end()
            args = []
            while True:
                a, i = parse_arg(body, i)
                args.append(a)
                i = skip_ws(body, i)
                if body[i] == ',':
                    i += 1
                    continue
                assert body[i] == ')'
                break
            cases.append({"test": tname, "args": args})
    with open(OUT, "w", encoding="utf-8") as fh:
        fh.write("# extracted from lib/prefixfilter/filter_test.go by "
                 "tools/extract_prefixfilter_corpus.py\n")
        for c in cases:
            fh.write(json.dumps(c, ensure_ascii=False) + "\n")
    by = {}
    for c in cases:
        by[c["test"]] = by.get(c["test"], 0) + 1
    for k in sorted(by):
        print(f"{k}: {by[k]}")
    print(f"total: {len(cases)}")


if __name__ == "__main__":
    sys.exit(main())
