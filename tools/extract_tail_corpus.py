#!/usr/bin/env python3
"""Extract the CanLiveTail golden table from the reference's
lib/logstorage/parser_test.go (TestQueryCanLiveTail) into
src/test/resources/conformance/can_live_tail.txt as JSON lines
{"q": <query>, "ok": <bool>} — the gate deciding which queries the
/select/logsql/tail endpoint accepts."""
import json
import re
import sys

REF = "/root/reference/lib/logstorage/parser_test.go"
OUT = "src/test/resources/conformance/can_live_tail.txt"


def main():
    src = open(REF, encoding="utf-8").read()
    m = re.search(r"func TestQueryCanLiveTail\(t \*testing\.T\) \{(.*?)\n\}",
                  src, re.S)
    if not m:
        sys.exit("TestQueryCanLiveTail not found")
    body = m.group(1)
    rows = []
    # f("query", true|false) — queries use Go string literals (no escapes
    # present in this table, but handle \" anyway)
    for q, ok in re.findall(r'\bf\("((?:[^"\\]|\\.)*)",\s*(true|false)\)', body):
        rows.append({"q": q.replace('\\"', '"'), "ok": ok == "true"})
    if len(rows) < 40:
        sys.exit(f"suspiciously few goldens extracted: {len(rows)}")
    with open(OUT, "w", encoding="utf-8") as f:
        f.write("# CanLiveTail goldens extracted from reference "
                "lib/logstorage/parser_test.go TestQueryCanLiveTail\n")
        for r in rows:
            f.write(json.dumps(r) + "\n")
    print(f"wrote {len(rows)} goldens to {OUT}")


if __name__ == "__main__":
    main()
