#!/usr/bin/env python3
"""Extract the four GetStatsByFields golden tables from the reference's
lib/logstorage/parser_test.go into
src/test/resources/conformance/stats_by_fields.txt as JSON lines:

  {"kind": "fields_ok",  "q": ..., "fields": [...]}
  {"kind": "fields_err", "q": ...}
  {"kind": "step_ok",    "q": ..., "step": ns, "fields": [...], "canon": ...}
  {"kind": "step_err",   "q": ..., "step": ns}
"""
import json
import re
import sys

REF = "/root/reference/lib/logstorage/parser_test.go"
OUT = "src/test/resources/conformance/stats_by_fields.txt"

NSECS = {"nsecsPerHour": 3600 * 10**9, "nsecsPerDay": 86400 * 10**9}

GO_STR = r'(?:"(?:[^"\\]|\\.)*"|`[^`]*`)'


def unquote(s):
    if s.startswith("`"):
        return s[1:-1]
    body = s[1:-1]
    return body.replace('\\"', '"').replace("\\\\", "\\")


def body_of(src, name):
    m = re.search(r"func %s\(t \*testing\.T\) \{(.*?)\n\}" % re.escape(name),
                  src, re.S)
    if not m:
        sys.exit(f"{name} not found")
    return m.group(1)


def parse_string_list(s):
    return [unquote(x) for x in re.findall(GO_STR, s)]


def main():
    src = open(REF, encoding="utf-8").read()
    rows = []

    b = body_of(src, "TestQueryGetStatsByFields_Success")
    for q, fields in re.findall(
            r'f\((%s), \[\]string\{([^}]*)\}\)' % GO_STR, b):
        rows.append({"kind": "fields_ok", "q": unquote(q),
                     "fields": parse_string_list(fields)})

    b = body_of(src, "TestQueryGetStatsByFields_Failure")
    for q in re.findall(r'f\((%s)\)' % GO_STR, b):
        rows.append({"kind": "fields_err", "q": unquote(q)})

    b = body_of(src, "TestQueryGetStatsByFieldsAddGroupingByTime_Success")
    for q, step, fields, canon in re.findall(
            r'f\((%s), (\w+), \[\]string\{([^}]*)\}, (%s)\)' % (GO_STR, GO_STR), b):
        rows.append({"kind": "step_ok", "q": unquote(q), "step": NSECS[step],
                     "fields": parse_string_list(fields),
                     "canon": unquote(canon)})

    b = body_of(src, "TestQueryGetStatsByFieldsAddGroupingByTime_Failure")
    for q in re.findall(r'f\((%s)\)' % GO_STR, b):
        rows.append({"kind": "step_err", "q": unquote(q),
                     "step": NSECS["nsecsPerHour"]})

    counts = {}
    for r in rows:
        counts[r["kind"]] = counts.get(r["kind"], 0) + 1
    if counts.get("fields_ok", 0) < 30 or counts.get("fields_err", 0) < 40 \
            or counts.get("step_ok", 0) < 8 or counts.get("step_err", 0) < 8:
        sys.exit(f"suspicious extraction counts: {counts}")

    with open(OUT, "w", encoding="utf-8") as f:
        f.write("# GetStatsByFields goldens extracted from reference "
                "lib/logstorage/parser_test.go (TestQueryGetStatsByFields_*"
                " and ...AddGroupingByTime_*)\n")
        for r in rows:
            f.write(json.dumps(r) + "\n")
    print(f"wrote {len(rows)} goldens to {OUT}: {counts}")


if __name__ == "__main__":
    main()
