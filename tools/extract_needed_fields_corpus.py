#!/usr/bin/env python3
"""Extract every expectPipeNeededFields golden table from
lib/logstorage/*_test.go:

    f := func(s, allowFilters, denyFilters, allowFiltersExpected,
              denyFiltersExpected string) { ... }
    f("copy s1 d1", "*", "", "*", "d1")

-> {"src": "pipe_copy_test.go:TestPipeCopyUpdateNeededFields",
    "pipe": "copy s1 d1", "allow": "*", "deny": "",
    "allow_expected": "*", "deny_expected": "d1"}

Filters are comma-separated lists ("" = empty). This extracts test DATA
(pipe text + golden filter states), not reference code.
"""
import glob
import json
import os
import re
import sys

OUT = os.path.join(os.path.dirname(__file__), "..", "src", "test",
                   "resources", "conformance", "pipe_needed_fields.txt")


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
    cases = []
    skipped = 0
    for path in sorted(glob.glob("/root/reference/lib/logstorage/*_test.go")):
        src = open(path, encoding="utf-8", errors="replace").read()
        for tm in re.finditer(r'func (Test\w+)\(t \*testing\.T\) \{', src):
            tname = tm.group(1)
            end = src.find("\nfunc ", tm.end())
            body = src[tm.end():end if end > 0 else len(src)]
            if "expectPipeNeededFields(t, s, allowFilters" not in body:
                continue
            for m in re.finditer(r'(?m)^\tf\(', body):
                try:
                    i = m.end()
                    args = []
                    for _ in range(5):
                        i = skip_ws(body, i)
                        v, i = parse_go_string(body, i)
                        args.append(v)
                        i = skip_ws(body, i)
                        if body[i] == ',':
                            i += 1
                    cases.append({
                        "src": f"{os.path.basename(path)}:{tname}",
                        "pipe": args[0], "allow": args[1], "deny": args[2],
                        "allow_expected": args[3],
                        "deny_expected": args[4]})
                except (ValueError, AssertionError, IndexError) as e:
                    skipped += 1
                    print(f"SKIP {os.path.basename(path)}:{tname}: {e}",
                          file=sys.stderr)
    with open(OUT, "w", encoding="utf-8") as fh:
        fh.write("# extracted from lib/logstorage/*_test.go "
                 "(expectPipeNeededFields tables) by "
                 "tools/extract_needed_fields_corpus.py\n")
        for c in cases:
            fh.write(json.dumps(c, ensure_ascii=False) + "\n")
    by = {}
    for c in cases:
        f = c["src"].split(":")[0]
        by[f] = by.get(f, 0) + 1
    for k in sorted(by):
        print(f"{k}: {by[k]}")
    print(f"total: {len(cases)}, skipped {skipped}")


if __name__ == "__main__":
    sys.exit(main())
