#!/usr/bin/env python3
"""Extract TestParseTimeRange golden bounds (parser_test.go).

The table assigns `minTimestamp`/`maxTimestamp` via uniform
`time.Date(y, time.Month, d, h, m, s, ns, time.UTC).UnixNano()`
expressions (with optional trailing `- 1`) and then calls
`f("<timeexpr>", minTimestamp, maxTimestamp)`. Evaluate the Date math
in Python and emit JSON lines {"s":..., "min":..., "max":...}.
Expressions the evaluator cannot handle are skipped with a note.
"""
import datetime
import json
import os
import re
import sys

REF = "/root/reference/lib/logstorage/parser_test.go"
OUT = os.path.join(os.path.dirname(__file__), "..", "src", "test",
                   "resources", "conformance", "time_range.txt")

MONTHS = {m: i + 1 for i, m in enumerate(
    ["January", "February", "March", "April", "May", "June", "July",
     "August", "September", "October", "November", "December"])}

DATE_RE = re.compile(
    r'time\.Date\((\d+), time\.(\w+), (\d+), (\d+), (\d+), (\d+), (\d+), '
    r'time\.UTC\)\.UnixNano\(\)')

OFFSET_NS = (30 * 60 + 5) * 10**9  # int64(30*time.Minute + 5*time.Second)


def eval_term(t):
    t = t.strip()
    m = DATE_RE.fullmatch(t)
    if m:
        y, mon, d, h, mi, s, ns = (int(m.group(1)), MONTHS[m.group(2)],
                                   int(m.group(3)), int(m.group(4)),
                                   int(m.group(5)), int(m.group(6)),
                                   int(m.group(7)))
        dt = datetime.datetime(y, mon, d, h, mi, s,
                               tzinfo=datetime.timezone.utc)
        return int(dt.timestamp()) * 10**9 + ns
    if t == "offset":
        return OFFSET_NS
    if t == "math.MaxInt64":
        return 2**63 - 1
    if t == "math.MinInt64":
        return -(2**63)
    pm = re.fullmatch(r'(\d+) \* 1e(\d)', t)
    if pm:
        return int(pm.group(1)) * 10**int(pm.group(2))
    if re.fullmatch(r'\d+', t):
        return int(t)
    raise ValueError(f"unsupported term: {t!r}")


def eval_expr(expr):
    # left-to-right +/- chain of terms (Go int64 arithmetic; the
    # MaxInt64/MinInt64 ± offset cases WRAP like Go)
    parts = re.split(r'\s([+-])\s', expr.strip())
    v = eval_term(parts[0])
    i = 1
    while i < len(parts):
        t = eval_term(parts[i + 1])
        v = v + t if parts[i] == '+' else v - t
        # wrap to int64 like Go
        v = (v + 2**63) % 2**64 - 2**63
        i += 2
    return v


def main():
    src = open(REF, encoding="utf-8").read()
    start = src.index("func TestParseTimeRange(t *testing.T) {")
    end = src.index("\nfunc ", start + 10)
    body = src[start:end]
    env = {}
    cases = []
    skipped = 0
    for line in body.splitlines():
        line = line.strip()
        am = re.match(r'(minTimestamp|maxTimestamp) = (.+)$', line)
        if am:
            try:
                env[am.group(1)] = eval_expr(am.group(2))
            except ValueError as e:
                env.pop(am.group(1), None)
                skipped += 1
                print(f"SKIP assign: {e}", file=sys.stderr)
            continue
        cm = re.match(r'f\((`[^`]*`|"(?:[^"\\]|\\.)*"), minTimestamp, '
                      r'maxTimestamp\)$', line)
        if cm:
            tok = cm.group(1)
            sval = tok[1:-1] if tok[0] == '`' else json.loads(tok)
            if "minTimestamp" in env and "maxTimestamp" in env:
                cases.append({"s": sval, "min": env["minTimestamp"],
                              "max": env["maxTimestamp"]})
            else:
                skipped += 1
                print(f"SKIP call (poisoned env): {sval}", file=sys.stderr)
    with open(OUT, "w", encoding="utf-8") as fh:
        fh.write("# extracted from parser_test.go TestParseTimeRange by "
                 "tools/extract_timerange_corpus.py\n")
        for c in cases:
            fh.write(json.dumps(c, ensure_ascii=False) + "\n")
    print(f"total: {len(cases)} cases, skipped {skipped}")


if __name__ == "__main__":
    sys.exit(main())
