#!/usr/bin/env python3
"""Extract TestSyslogParser golden pairs (syslog_parser_test.go):
f(line, time.UTC, expectedLogfmt) → JSON {"in":..., "out":{k:v}}.
The expected logfmt is parsed here (keys are plain, values optionally
Go-quoted). Cases with non-UTC zones would be skipped (none today)."""
import json
import os
import re
import sys

REF = "/root/reference/lib/logstorage/syslog_parser_test.go"
OUT = os.path.join(os.path.dirname(__file__), "..", "src", "test",
                   "resources", "conformance", "syslog_parser.txt")


def parse_go_string(src, i):
    c = src[i]
    if c == '`':
        j = src.index('`', i + 1)
        return src[i + 1:j], j + 1
    assert c == '"', src[i:i+20]
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


def parse_logfmt(s):
    fields = {}
    i = 0
    while i < len(s):
        if s[i] == ' ':
            i += 1
            continue
        eq = s.index('=', i)
        key = s[i:eq]
        i = eq + 1
        if i < len(s) and s[i] == '"':
            v, i = parse_go_string(s, i)
        else:
            j = i
            while j < len(s) and s[j] != ' ':
                j += 1
            v = s[i:j]
            i = j
        fields[key] = v
    return fields


def main():
    src = open(REF, encoding="utf-8").read()
    start = src.index("func TestSyslogParser(t *testing.T) {")
    end = src.find("\nfunc ", start + 10)
    body = src[start:end] if end > 0 else src[start:]
    cases = []
    skipped = 0
    for m in re.finditer(r'(?m)^\tf\(', body):
        i = m.end()
        try:
            line, i = parse_go_string(body, i)
            tz = re.match(r',\s*(time\.UTC|[\w.()\" ]+),', body[i:])
            if not tz or tz.group(1) != "time.UTC":
                skipped += 1
                continue
            i += tz.end()
            while body[i] in ' \t\n':
                i += 1
            expected, i = parse_go_string(body, i)
            cases.append({"in": line, "out": parse_logfmt(expected)})
        except (ValueError, AssertionError, IndexError) as e:
            skipped += 1
            print(f"SKIP at {m.start()}: {e}", file=sys.stderr)
    with open(OUT, "w", encoding="utf-8") as fh:
        fh.write("# extracted from syslog_parser_test.go TestSyslogParser "
                 "(currentYear=2024, UTC) by tools/extract_syslog_corpus.py\n")
        for c in cases:
            fh.write(json.dumps(c, ensure_ascii=False) + "\n")
    print(f"total: {len(cases)} cases, skipped {skipped}")


if __name__ == "__main__":
    sys.exit(main())
