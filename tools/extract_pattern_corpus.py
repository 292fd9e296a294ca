#!/usr/bin/env python3
"""Extract TestPatternApply triples (pattern_test.go):
f(patternStr, input, []string{expected...}) → JSON lines
{"pat":..., "in":..., "out":[...]}."""
import json
import os
import re
import sys

REF = "/root/reference/lib/logstorage/pattern_test.go"
OUT = os.path.join(os.path.dirname(__file__), "..", "src", "test",
                   "resources", "conformance", "pattern_apply.txt")


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
            else:
                raise ValueError(f"escape {nxt}")
        elif ch == '"':
            return ''.join(out), j + 1
        else:
            out.append(ch); j += 1


def main():
    src = open(REF, encoding="utf-8").read()
    start = src.index("func TestPatternApply(t *testing.T) {")
    end = src.index("\nfunc ", start + 10)
    body = src[start:end]
    cases = []
    for m in re.finditer(r'(?m)^\tf\(', body):
        i = m.end()
        pat, i = parse_go_string(body, i)
        i = body.index(',', i) + 1
        while body[i] in ' \t\n':
            i += 1
        sval, i = parse_go_string(body, i)
        lm = re.search(r'\[\]string\{([^}]*)\}', body[i:])
        inner = lm.group(1)
        outs = []
        k = 0
        pending_concat = False
        while k < len(inner):
            ch = inner[k]
            if ch in '"`':
                v, k = parse_go_string(inner, k)
                if pending_concat and outs:
                    outs[-1] += v
                else:
                    outs.append(v)
                pending_concat = False
            elif ch == '+':
                pending_concat = True
                k += 1
            else:
                k += 1
        cases.append({"pat": pat, "in": sval, "out": outs})
    with open(OUT, "w", encoding="utf-8") as fh:
        fh.write("# extracted from pattern_test.go TestPatternApply by "
                 "tools/extract_pattern_corpus.py\n")
        for c in cases:
            fh.write(json.dumps(c, ensure_ascii=False) + "\n")
    print(f"total: {len(cases)} cases")


if __name__ == "__main__":
    sys.exit(main())
