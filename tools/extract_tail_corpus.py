#!/usr/bin/env python3
"""Extract the CanLiveTail and CanReturnLastNResults golden tables from
the reference's lib/logstorage/parser_test.go into
src/test/resources/conformance/{can_live_tail,can_return_last_n}.txt as
JSON lines {"q": <query>, "ok": <bool>} — the gates deciding which
queries the /select/logsql/tail endpoint accepts and which queries the
limit=N day-descent path may serve early."""
import json
import re
import sys

REF = "/root/reference/lib/logstorage/parser_test.go"

TABLES = [
    ("TestQueryCanLiveTail",
     "src/test/resources/conformance/can_live_tail.txt", 40),
    ("TestQueryCanReturnLastNResults",
     "src/test/resources/conformance/can_return_last_n.txt", 25),
]


def main():
    src = open(REF, encoding="utf-8").read()
    for name, out, min_rows in TABLES:
        m = re.search(r"func %s\(t \*testing\.T\) \{(.*?)\n\}" % name,
                      src, re.S)
        if not m:
            sys.exit(f"{name} not found")
        body = m.group(1)
        rows = []
        # f("query", true|false) — queries use Go string literals (no
        # escapes present in these tables, but handle \" anyway)
        for q, ok in re.findall(
                r'\bf\("((?:[^"\\]|\\.)*)",\s*(true|false)\)', body):
            rows.append({"q": q.replace('\\"', '"'), "ok": ok == "true"})
        if len(rows) < min_rows:
            sys.exit(f"suspiciously few goldens for {name}: {len(rows)}")
        with open(out, "w", encoding="utf-8") as f:
            f.write(f"# goldens extracted from reference "
                    f"lib/logstorage/parser_test.go {name}\n")
            for r in rows:
                f.write(json.dumps(r) + "\n")
        print(f"wrote {len(rows)} goldens to {out}")


if __name__ == "__main__":
    main()
