#!/usr/bin/env python3
"""Extract the reference's table-driven pipe execution tests.

Scans /root/reference/lib/logstorage/*_test.go (pipes, stats functions,
and any other file using the expectPipeResults helper) for Test functions
that define the canonical helper

    f := func(pipeStr string, rows, rowsExpected [][]Field) {
        t.Helper()
        expectPipeResults(t, pipeStr, rows, rowsExpected)
    }

and extracts every `f(pipeStr, [][]Field{...}, [][]Field{...})` call into
JSON lines:

    {"src": "pipe_stats_test.go:TestPipeStats",
     "pipe": "count(*)",
     "in":  [[["_msg","abc"],["a","2"]], ...],
     "out": [[["count(*)","3"]]]}

This extracts test DATA (pipe text + golden row sets = observable
behavior), not reference code.
"""
import glob
import json
import os
import re
import sys

OUT = os.path.join(os.path.dirname(__file__), "..", "src", "test",
                   "resources", "conformance", "pipe_exec.txt")


def parse_go_string(src, i):
    c = src[i]
    if c == '`':
        j = src.index('`', i + 1)
        return src[i + 1:j], j + 1
    if c == '"':
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
            elif ch == '"':
                return ''.join(out), j + 1
            else:
                out.append(ch)
                j += 1
    raise ValueError(f"not a string at {i}: {src[i:i+20]!r}")


def skip_ws(src, i):
    while True:
        while i < len(src) and src[i] in ' \t\n':
            i += 1
        if src.startswith("//", i):
            i = src.index('\n', i)
            continue
        return i


def parse_rows(src, i):
    """Parse `[][]Field{ {...}, {...} }` starting at `[`; return (rows, next)."""
    m = re.match(r'\[\]\[\]Field\{', src[i:])
    if not m:
        raise ValueError(f"not [][]Field at {i}: {src[i:i+30]!r}")
    i += m.end()
    rows = []
    while True:
        i = skip_ws(src, i)
        if src[i] == '}':
            return rows, i + 1
        if src[i] != '{':
            raise ValueError(f"expected row {{ at {i}: {src[i:i+30]!r}")
        i += 1
        fields = []
        while True:
            i = skip_ws(src, i)
            if src[i] == '}':
                i += 1
                break
            if src[i] != '{':
                raise ValueError(f"expected field {{ at {i}: {src[i:i+30]!r}")
            i += 1
            i = skip_ws(src, i)
            name, i = parse_go_string(src, i)
            i = skip_ws(src, i)
            assert src[i] == ',', src[i:i+20]
            i = skip_ws(src, i + 1)
            val, i = parse_go_string(src, i)
            i = skip_ws(src, i)
            if src[i] == ',':
                i += 1
            i = skip_ws(src, i)
            assert src[i] == '}', src[i:i+20]
            i += 1
            i = skip_ws(src, i)
            if src[i] == ',':
                i += 1
            fields.append([name, val])
        rows.append(fields)
        i = skip_ws(src, i)
        if src[i] == ',':
            i += 1


HELPER_RE = re.compile(
    r'f := func\(pipeStr string, rows, rowsExpected \[\]\[\]Field\) \{\s*'
    r't\.Helper\(\)\s*expectPipeResults\(t, pipeStr, rows, rowsExpected\)')


def extract_file(path):
    src = open(path, encoding="utf-8", errors="replace").read()
    cases = []
    for m in re.finditer(r'func (Test\w+)\(t \*testing\.T\) \{', src):
        name = m.group(1)
        end = src.find("\nfunc ", m.end())
        body = src[m.end():end if end > 0 else len(src)]
        if not HELPER_RE.search(body):
            continue
        for c in re.finditer(r'(?m)^\tf\(', body):
            i = c.end()
            try:
                i = skip_ws(body, i)
                pipe, i = parse_go_string(body, i)
                i = skip_ws(body, i)
                assert body[i] == ','
                i = skip_ws(body, i + 1)
                rows_in, i = parse_rows(body, i)
                i = skip_ws(body, i)
                assert body[i] == ','
                i = skip_ws(body, i + 1)
                rows_out, i = parse_rows(body, i)
                cases.append({
                    "src": f"{os.path.basename(path)}:{name}",
                    "pipe": pipe, "in": rows_in, "out": rows_out})
            except (ValueError, AssertionError, IndexError) as e:
                print(f"SKIP {path}:{name} at f() offset {c.start()}: {e}",
                      file=sys.stderr)
    return cases


def main():
    all_cases = []
    for path in sorted(glob.glob(
            "/root/reference/lib/logstorage/*_test.go")):
        all_cases.extend(extract_file(path))
    with open(OUT, "w", encoding="utf-8") as fh:
        fh.write("# extracted from lib/logstorage/pipe_*_test.go "
                 "(expectPipeResults tables) by tools/extract_pipe_corpus.py\n")
        for c in all_cases:
            fh.write(json.dumps(c, ensure_ascii=False) + "\n")
    by_file = {}
    for c in all_cases:
        by_file.setdefault(c["src"].split(":")[0], 0)
        by_file[c["src"].split(":")[0]] += 1
    for k in sorted(by_file):
        print(f"{k}: {by_file[k]}")
    print(f"total: {len(all_cases)} cases")


if __name__ == "__main__":
    sys.exit(main())
