#!/usr/bin/env python3
"""Extract the reference's query-string and timestamp-struct filter tests.

Two shapes not covered by extract_filter_corpus.py:

1. filter_and_test.go / filter_or_test.go run whole LogsQL filter
   expressions through ParseQuery:

       f := func(qStr string, expectedRowIdxs []int) {
           ...
           testFilterMatchForColumns(t, columns, q.f, "foo", expectedRowIdxs)
       }
       f(`foo:a AND foo:abc*`, []int{2, 6})

   -> {"kind": "query", "query": "...", "columns": [...],
       "result_field": "foo", "expected_rows": [...]}

2. filter_time_test.go / filter_day_range_test.go /
   filter_week_range_test.go match a filter struct against a timestamp
   list (testFilterMatchForTimestamps):

       ft := &filterDayRange{start: 0, end: 1, offset: 10}
       testFilterMatchForTimestamps(t, timestamps, ft, []int{0})

   -> {"kind": "timestamps", "timestamps": [...], "filter": {...},
       "expected_rows": [...]}

   Timestamp/struct values may be constant arithmetic over nsecsPerDay /
   nsecsPerHour / time.Monday / time.Date(...).UnixNano() — evaluated here.

This extracts test DATA (query text + golden row sets = observable
behavior), not reference code.
"""
import json
import os
import re
import sys

OUT = os.path.join(os.path.dirname(__file__), "..", "src", "test",
                   "resources", "conformance", "filter_query_exec.txt")

REF = "/root/reference/lib/logstorage"

CONSTS = {
    "nsecsPerDay": 86400 * 10**9,
    "nsecsPerHour": 3600 * 10**9,
    "nsecsPerMinute": 60 * 10**9,
    "nsecsPerSecond": 10**9,
    "time.Sunday": 0, "time.Monday": 1, "time.Tuesday": 2,
    "time.Wednesday": 3, "time.Thursday": 4, "time.Friday": 5,
    "time.Saturday": 6,
}


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


# ---------------------------------------------------------------- expr eval

import datetime


def eval_expr(src, i, env):
    """Constant Go arithmetic: ints (with _), +-*, parens, known consts,
    env vars, time.Date(...).UnixNano(). Returns (value, next_i)."""
    def primary(i):
        i = skip_ws(src, i)
        if src[i] == '(':
            v, i = expr(i + 1)
            i = skip_ws(src, i)
            assert src[i] == ')'
            return v, i + 1
        if src[i] == '-':
            v, i = primary(i + 1)
            return -v, i
        m = re.match(r'\d[\d_]*', src[i:])
        if m:
            return int(m.group(0).replace('_', '')), i + m.end()
        m = re.match(r'time\.Date\(([^)]*)\)\.UnixNano\(\)', src[i:])
        if m:
            args = [a.strip() for a in m.group(1).split(',')]
            # (year, month, day, hour, min, sec, nsec, loc)
            assert len(args) == 8 and args[7] == 'time.UTC'
            y, mo, d, h, mi, s, ns = (int(a) for a in args[:7])
            dt = datetime.datetime(y, mo, d, h, mi, s,
                                   tzinfo=datetime.timezone.utc)
            return int(dt.timestamp()) * 10**9 + ns, i + m.end()
        m = re.match(r'time\.Duration\(', src[i:])
        if m:
            v, j = expr(i + m.end())
            j = skip_ws(src, j)
            assert src[j] == ')'
            return v, j + 1
        m = re.match(r'[A-Za-z_][A-Za-z0-9_.]*', src[i:])
        if m:
            name = m.group(0)
            if name in CONSTS:
                return CONSTS[name], i + m.end()
            if name in env:
                return env[name], i + m.end()
            raise ValueError(f"unknown identifier {name}")
        raise ValueError(f"unparseable expr at {i}: {src[i:i+30]!r}")

    def term(i):
        v, i = primary(i)
        while True:
            i = skip_ws(src, i)
            if i < len(src) and src[i] == '*':
                w, i = primary(i + 1)
                v *= w
            else:
                return v, i

    def expr(i):
        v, i = term(i)
        while True:
            i = skip_ws(src, i)
            if i < len(src) and src[i] == '+':
                w, i = term(i + 1)
                v += w
            elif i < len(src) and src[i] == '-' and src[i + 1] not in '0123456789(':
                # binary minus only when followed by ws+operand; all the
                # corpus files write `a - b` / `-2 * x` unambiguously
                w, i = term(i + 1)
                v -= w
            elif i < len(src) and src[i] == '-' and src[i - 1] in ' \t':
                w, i = term(i + 1)
                v -= w
            else:
                return v, i

    return eval_inner(src, i, expr)


def eval_inner(src, i, expr):
    return expr(i)


def parse_int_list_expr(src, i, env):
    """[]int64{ expr, expr, ... } at '['."""
    m = re.match(r'\[\]int64\{', src[i:])
    assert m, src[i:i+20]
    i += m.end()
    vals = []
    while True:
        i = skip_ws(src, i)
        if src[i] == '}':
            return vals, i + 1
        v, i = eval_expr(src, i, env)
        vals.append(v)
        i = skip_ws(src, i)
        if src[i] == ',':
            i += 1


def parse_struct_expr(src, i, env):
    """&filterX{ field: <const expr>, ... } at '&' (flat, numeric/const
    values only — the timestamp-filter structs)."""
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
        v, i = eval_expr(src, i, env)
        fields[fname] = v
        i = skip_ws(src, i)
        if src[i] == ',':
            i += 1


def parse_columns(src, i):
    m = re.match(r'\[\]column\{', src[i:])
    assert m
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
                m2 = re.match(r'\[\]string\{', src[i:])
                assert m2
                i += m2.end()
                values = []
                while True:
                    i = skip_ws(src, i)
                    if src[i] == '}':
                        i += 1
                        break
                    v, i = parse_go_string(src, i)
                    values.append(v)
                    i = skip_ws(src, i)
                    if src[i] == ',':
                        i += 1
            i = skip_ws(src, i)
            if src[i] == ',':
                i += 1
        cols.append([name, values])
        i = skip_ws(src, i)
        if src[i] == ',':
            i += 1


def parse_expected(src, i):
    i = skip_ws(src, i)
    if src.startswith("nil", i):
        return [], i + 3
    lm = re.match(r'\[\]int\{([^}]*)\}', src[i:])
    assert lm, src[i:i+40]
    body = lm.group(1).strip()
    nums = [int(x) for x in body.split(',') if x.strip()] if body else []
    return nums, i + lm.end()


def extract_query_file(path):
    """filter_and_test.go / filter_or_test.go shape."""
    src = open(path, encoding="utf-8", errors="replace").read()
    cases = []
    for tm in re.finditer(r'func (Test\w+)\(t \*testing\.T\) \{', src):
        tname = tm.group(1)
        end = src.find("\nfunc ", tm.end())
        body = src[tm.end():end if end > 0 else len(src)]

        cm = re.search(r'(?m)^\t+columns := \[\]column\{', body)
        if not cm:
            continue
        columns, _ = parse_columns(body, body.index("[]column{", cm.start()))

        rm = re.search(
            r'testFilterMatchForColumns\(t, columns, q\.f, "(\w+)"', body)
        if not rm:
            continue
        result_field = rm.group(1)

        for m in re.finditer(r'(?m)^\tf\(', body):
            i = skip_ws(body, m.end())
            try:
                q, i = parse_go_string(body, i)
                i = skip_ws(body, i)
                assert body[i] == ','
                nums, _ = parse_expected(body, i + 1)
                cases.append({
                    "src": f"{os.path.basename(path)}:{tname}",
                    "kind": "query",
                    "query": q,
                    "columns": columns,
                    "result_field": result_field,
                    "expected_rows": nums})
            except (ValueError, AssertionError, IndexError) as e:
                print(f"SKIP {os.path.basename(path)}:{tname}: {e}",
                      file=sys.stderr)
    return cases


def extract_timestamps_file(path):
    """filter_time/day_range/week_range_test.go shape."""
    src = open(path, encoding="utf-8", errors="replace").read()
    cases = []
    for tm in re.finditer(r'func (Test\w+)\(t \*testing\.T\) \{', src):
        tname = tm.group(1)
        end = src.find("\nfunc ", tm.end())
        body = src[tm.end():end if end > 0 else len(src)]

        env = {}
        structs = {}

        events = []
        for m in re.finditer(r'(?m)^\t(\w+) := ([^\n]+)$', body):
            events.append((m.start(), "var", m))
        for m in re.finditer(r'(?m)^\ttimestamps := \[\]int64\{', body):
            events.append((m.start(), "timestamps", m))
        for m in re.finditer(r'(?m)^\t(\w+) :?= &(filter[A-Za-z0-9]+)\{',
                             body):
            events.append((m.start(), "assign", m))
        for m in re.finditer(
                r'(?m)^\ttestFilterMatchForTimestamps\(t, timestamps, ',
                body):
            events.append((m.start(), "call", m))
        events.sort(key=lambda e: e[0])

        timestamps = None
        for _, kind, m in events:
            try:
                if kind == "timestamps":
                    timestamps, _ = parse_int_list_expr(
                        body, body.index("[]int64{", m.start()), env)
                elif kind == "var":
                    var, rhs = m.group(1), m.group(2).strip()
                    if var == "timestamps" or rhs.startswith('&'):
                        continue
                    try:
                        v, _ = eval_expr(body, m.start() + 1 + len(var) + 4,
                                         env)
                        env[var] = v
                    except (ValueError, AssertionError, IndexError):
                        pass
                elif kind == "assign":
                    var = m.group(1)
                    i = body.index("&filter", m.start())
                    try:
                        st, _ = parse_struct_expr(body, i, env)
                        structs[var] = st
                    except (ValueError, AssertionError, IndexError):
                        structs.pop(var, None)
                        raise
                elif kind == "call":
                    i = skip_ws(body, m.end())
                    vm = re.match(r'[A-Za-z_][A-Za-z0-9_]*', body[i:])
                    st = structs.get(vm.group(0))
                    if st is None:
                        raise ValueError(f"unresolved var {vm.group(0)}")
                    i = skip_ws(body, i + vm.end())
                    assert body[i] == ','
                    nums, _ = parse_expected(body, i + 1)
                    if timestamps is None:
                        raise ValueError("no timestamps in scope")
                    cases.append({
                        "src": f"{os.path.basename(path)}:{tname}",
                        "kind": "timestamps",
                        "timestamps": timestamps,
                        "filter": st,
                        "expected_rows": nums})
            except (ValueError, AssertionError, IndexError) as e:
                print(f"SKIP {os.path.basename(path)}:{tname}: {e}",
                      file=sys.stderr)
    return cases


def main():
    cases = []
    for f in ["filter_and_test.go", "filter_or_test.go"]:
        cases.extend(extract_query_file(os.path.join(REF, f)))
    for f in ["filter_time_test.go", "filter_day_range_test.go",
              "filter_week_range_test.go"]:
        cases.extend(extract_timestamps_file(os.path.join(REF, f)))
    with open(OUT, "w", encoding="utf-8") as fh:
        fh.write("# extracted from lib/logstorage filter_{and,or,time,"
                 "day_range,week_range}_test.go (ParseQuery-based and "
                 "testFilterMatchForTimestamps tables) by "
                 "tools/extract_filter_query_corpus.py\n")
        for c in cases:
            fh.write(json.dumps(c, ensure_ascii=False) + "\n")
    by = {}
    for c in cases:
        by.setdefault(c["src"], 0)
        by[c["src"]] += 1
    for k in sorted(by):
        print(f"{k}: {by[k]}")
    print(f"total: {len(cases)}")


if __name__ == "__main__":
    sys.exit(main())
