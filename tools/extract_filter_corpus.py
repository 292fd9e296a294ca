#!/usr/bin/env python3
"""Extract the reference's filter golden tests.

Scans lib/logstorage/filter_*_test.go for testFilterMatchForColumns
calls, resolving the filter variable to its most recent `&filterX{...}`
struct literal (plus `v.values.values = []string{...}` post-assignments)
and the current `columns := []column{...}` table. Emits JSON lines:

    {"src": "filter_phrase_test.go:TestFilterPhrase",
     "filter": {"type": "filterPhrase",
                "fields": {"fieldName": "foo", "phrase": "abc"}},
     "columns": [["foo", ["abc def"]], ["other column", ["asdfdsf"]]],
     "result_field": "foo",
     "expected_rows": [0]}

This extracts test DATA (filter parameters + golden row sets), not
reference code. Unresolvable shapes are skipped with a note on stderr.
"""
import glob
import json
import os
import re
import sys

OUT = os.path.join(os.path.dirname(__file__), "..", "src", "test",
                   "resources", "conformance", "filter_exec.txt")


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
                m = {'n': '\n', 't': '\t', 'r': '\r', '\\': '\\', '"': '"',
                     "'": "'", 'a': '\a', 'b': '\b', 'f': '\f', 'v': '\v',
                     '0': '\0'}
                if nxt in m:
                    out.append(m[nxt]); j += 2
                elif nxt == 'x':
                    out.append(chr(int(src[j + 2:j + 4], 16))); j += 4
                elif nxt == 'u':
                    out.append(chr(int(src[j + 2:j + 6], 16))); j += 6
                else:
                    raise ValueError(f"escape \\{nxt}")
            elif ch == '"':
                return ''.join(out), j + 1
            else:
                out.append(ch); j += 1
    raise ValueError(f"not a string at {i}: {src[i:i+30]!r}")


def skip_ws(src, i):
    while True:
        while i < len(src) and src[i] in ' \t\n':
            i += 1
        if src.startswith("//", i):
            i = src.index('\n', i)
            continue
        return i


def parse_string_list(src, i):
    """[]string{ "a", "b", } starting at '['."""
    m = re.match(r'\[\]string\{', src[i:])
    if not m:
        raise ValueError("not []string")
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


def parse_filter_list(src, i, env):
    """[]filter{ &filterX{...}, ... } starting at '[' — nested boolean
    combinator children (filterAnd/filterOr)."""
    m = re.match(r'\[\]filter\{', src[i:])
    if not m:
        raise ValueError("not []filter")
    i += m.end()
    out = []
    while True:
        i = skip_ws(src, i)
        if src[i] == '}':
            return out, i + 1
        st, i = parse_struct(src, i, env)
        out.append(st)
        i = skip_ws(src, i)
        if src[i] == ',':
            i += 1


def parse_value(src, i, env):
    """A struct field value: string, number, bool, []string, wrapped
    regex, or a variable reference into env."""
    i = skip_ws(src, i)
    if src[i] in '"`':
        return parse_go_string(src, i)
    if src.startswith("[]string{", i):
        return parse_string_list(src, i)
    if src.startswith("[]filter{", i):
        return parse_filter_list(src, i, env)
    m = re.match(r'mustCompileRegex\(', src[i:])
    if m:
        v, j = parse_go_string(src, skip_ws(src, i + m.end()))
        j = skip_ws(src, j)
        assert src[j] == ')'
        return v, j + 1
    m = re.match(r'-?(?:0x[0-9a-fA-F]+|\d+(?:\.\d+)?(?:e-?\d+)?)', src[i:])
    if m:
        tok = m.group(0)
        val = int(tok, 16) if tok.startswith("0x") else (
            float(tok) if ('.' in tok or 'e' in tok) else int(tok))
        j = i + m.end()
        # arithmetic like `* nsecsPerDay` is out of scope
        k = skip_ws(src, j)
        if src[k] in '*+/':
            raise ValueError("arithmetic value")
        return val, j
    m = re.match(r'(true|false)\b', src[i:])
    if m:
        return m.group(1) == "true", i + m.end()
    m = re.match(r'(-?inf|math\.Inf\((-?1)\))', src[i:])
    if m:
        raise ValueError("inf literal")
    m = re.match(r'[A-Za-z_][A-Za-z0-9_]*', src[i:])
    if m:
        name = m.group(0)
        if name in env:
            return {"ref": env[name]}, i + m.end()
        raise ValueError(f"unknown identifier {name}")
    raise ValueError(f"unparseable value at {i}: {src[i:i+30]!r}")


def parse_struct(src, i, env):
    """&filterX{ field: value, ... } starting at '&'."""
    m = re.match(r'&(filter[A-Za-z0-9]+)\{', src[i:])
    if not m:
        raise ValueError("not a filter struct")
    typ = m.group(1)
    i += m.end()
    fields = {}
    while True:
        i = skip_ws(src, i)
        if src[i] == '}':
            return {"type": typ, "fields": fields}, i + 1
        fm = re.match(r'([A-Za-z_][A-Za-z0-9_]*)\s*:', src[i:])
        if not fm:
            raise ValueError(f"expected field at {i}: {src[i:i+30]!r}")
        fname = fm.group(1)
        i = skip_ws(src, i + fm.end())
        if src[i] == '&':
            v, i = parse_struct(src, i, env)
        else:
            v, i = parse_value(src, i, env)
            if isinstance(v, dict) and "ref" in v:
                v = v["ref"]
        fields[fname] = v
        i = skip_ws(src, i)
        if src[i] == ',':
            i += 1


def parse_columns(src, i):
    """[]column{ {name: "x", values: []string{...}}, ... } at '['."""
    m = re.match(r'\[\]column\{', src[i:])
    if not m:
        raise ValueError("not []column")
    i += m.end()
    cols = []
    while True:
        i = skip_ws(src, i)
        if src[i] == '}':
            return cols, i + 1
        assert src[i] == '{'
        i += 1
        name = None
        values = None
        while True:
            i = skip_ws(src, i)
            if src[i] == '}':
                i += 1
                break
            fm = re.match(r'(name|values)\s*:', src[i:])
            assert fm, src[i:i+30]
            i = skip_ws(src, i + fm.end())
            if fm.group(1) == "name":
                name, i = parse_go_string(src, i)
            else:
                values, i = parse_string_list(src, i)
            i = skip_ws(src, i)
            if src[i] == ',':
                i += 1
        cols.append([name, values])
        i = skip_ws(src, i)
        if src[i] == ',':
            i += 1


def extract_file(path):
    src = open(path, encoding="utf-8", errors="replace").read()
    cases = []
    skipped = 0
    for tm in re.finditer(r'func (Test\w+)\(t \*testing\.T\) \{', src):
        tname = tm.group(1)
        end = src.find("\nfunc ", tm.end())
        body = src[tm.end():end if end > 0 else len(src)]

        columns = None
        env = {}

        # walk statements in order
        events = []
        for m in re.finditer(r'(?m)^\t+columns := \[\]column\{', body):
            events.append((m.start(), "columns", m))
        for m in re.finditer(
                r'(?m)^\t+(\w+) :?= (&filter[A-Za-z0-9]+\{)', body):
            events.append((m.start(), "assign", m))
        for m in re.finditer(
                r'(?m)^\t+(\w+)\.values\.values = (\[\]string\{)', body):
            events.append((m.start(), "invalues", m))
        for m in re.finditer(
                r'(?m)^\t+testFilterMatchForColumns\(t, columns, ', body):
            events.append((m.start(), "call", m))
        events.sort(key=lambda e: e[0])

        for _, kind, m in events:
            try:
                if kind == "columns":
                    i = body.index("[]column{", m.start())
                    columns, _ = parse_columns(body, i)
                elif kind == "assign":
                    var = m.group(1)
                    i = body.index("&filter", m.start())
                    try:
                        st, _ = parse_struct(body, i, env)
                        env[var] = st
                    except (ValueError, AssertionError, IndexError):
                        # an unparseable assignment must POISON the var —
                        # otherwise later calls silently pair with a stale
                        # filter value
                        env.pop(var, None)
                        raise
                elif kind == "invalues":
                    var = m.group(1)
                    i = body.index("[]string{", m.start())
                    vals, _ = parse_string_list(body, i)
                    if var in env:
                        # copy to avoid mutating an already-recorded case
                        st = {"type": env[var]["type"],
                              "fields": dict(env[var]["fields"])}
                        st["fields"]["values"] = vals
                        env[var] = st
                elif kind == "call":
                    i = m.end()
                    i = skip_ws(body, i)
                    if body[i] == '&':
                        st, i = parse_struct(body, i, env)
                    else:
                        vm = re.match(r'[A-Za-z_][A-Za-z0-9_]*', body[i:])
                        var = vm.group(0)
                        st = env.get(var)
                        if st is None:
                            raise ValueError(f"unresolved var {var}")
                        i += vm.end()
                    i = skip_ws(body, i)
                    assert body[i] == ','
                    i = skip_ws(body, i + 1)
                    rf, i = parse_go_string(body, i)
                    i = skip_ws(body, i)
                    assert body[i] == ','
                    i = skip_ws(body, i + 1)
                    if body.startswith("nil", i):
                        nums = []
                        lm = None
                    else:
                        lm = re.match(r'\[\]int\{([^}]*)\}', body[i:])
                        assert lm, body[i:i+40]
                        nums = [int(x) for x in lm.group(1).split(',')
                                if x.strip()] if lm.group(1).strip() else []
                    if columns is None:
                        raise ValueError("no columns in scope")
                    cases.append({
                        "src": f"{os.path.basename(path)}:{tname}",
                        "filter": st,
                        "columns": columns,
                        "result_field": rf,
                        "expected_rows": nums})
            except (ValueError, AssertionError, IndexError) as e:
                skipped += 1
                print(f"SKIP {os.path.basename(path)}:{tname}: {e}",
                      file=sys.stderr)
    return cases, skipped


def main():
    all_cases = []
    total_skipped = 0
    paths = sorted(glob.glob(
        "/root/reference/lib/logstorage/filter_*_test.go"))
    # TestComplexFilters (nested and/or/not combinators) lives in
    # filter_test.go, which the filter_*_test.go glob does not match
    paths.append("/root/reference/lib/logstorage/filter_test.go")
    for path in paths:
        cases, skipped = extract_file(path)
        all_cases.extend(cases)
        total_skipped += skipped
    with open(OUT, "w", encoding="utf-8") as fh:
        fh.write("# extracted from lib/logstorage/filter_*_test.go "
                 "(testFilterMatchForColumns tables) by "
                 "tools/extract_filter_corpus.py\n")
        for c in all_cases:
            fh.write(json.dumps(c, ensure_ascii=False) + "\n")
    by_type = {}
    for c in all_cases:
        by_type.setdefault(c["filter"]["type"], 0)
        by_type[c["filter"]["type"]] += 1
    for k in sorted(by_type):
        print(f"{k}: {by_type[k]}")
    print(f"total: {len(all_cases)} cases, skipped {total_skipped}")


if __name__ == "__main__":
    sys.exit(main())
