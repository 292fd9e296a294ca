#!/usr/bin/env python3
"""Local leak scan with provenance stamping.

The driver's LEAKCHECK.json carries only a round number; this replica
records WHEN it ran and a content hash of exactly what it scanned, so a
clean result is attributable to a specific tree state.

Usage: python3 tools/leakcheck.py [repoRoot]
Writes LEAKCHECK_LOCAL.json at the repo root.
"""
import hashlib, json, os, re, subprocess, sys, time

PATTERNS = {
    # generic secret shapes — any hit is a finding regardless of origin
    "api-key": re.compile(r"(sk-[A-Za-z0-9]{20,}|AKIA[0-9A-Z]{16}|-----BEGIN [A-Z ]*PRIVATE KEY)"),
    "bearer-token": re.compile(r"Authorization:\s*Bearer\s+[A-Za-z0-9._-]{16,}"),
    # non-public coordinate shapes: cloud buckets, intranet hosts/links
    "bucket-uri": re.compile(r"(s3|gs)://[a-z0-9][a-z0-9.-]+"),
    "intranet-host": re.compile(r"https?://[a-z0-9.-]+\.(corp|internal|intranet)\b"),
    # not preceded by '.'/word (Go source citations: "pattern.go/...")
    # and not itself a .go path component
    "short-link": re.compile(r"(?<![\w.])go/[a-z][a-z0-9-]{2,}\b(?!\.go\b)"),
    "env-secret": re.compile(r"\b[A-Z][A-Z0-9_]*(?:SECRET|TOKEN|PASSWORD)[A-Z0-9_]*\s*="),
}

SCAN_EXT = {".scala", ".py", ".md", ".sbt", ".json", ".sh", ".sql", ".conf"}
SKIP_DIRS = {"target", ".git", ".idea", ".bloop"}
# files that legitimately carry the pattern STRINGS (this scanner itself,
# and prior-round artifacts that embed category names)
SKIP_FILES = {"leakcheck.py", "LEAKCHECK.json", "LEAKCHECK_LOCAL.json"}


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else "/root/repo"
    hits = {k: [] for k in PATTERNS}
    digest = hashlib.sha256()
    n_files = 0
    for dirpath, dirnames, filenames in os.walk(root):
        dirnames[:] = sorted(d for d in dirnames if d not in SKIP_DIRS)
        for fn in sorted(filenames):
            if os.path.splitext(fn)[1] not in SCAN_EXT or fn in SKIP_FILES:
                continue
            p = os.path.join(dirpath, fn)
            rel = os.path.relpath(p, root)
            try:
                data = open(p, "rb").read()
            except OSError:
                continue
            n_files += 1
            digest.update(rel.encode())
            digest.update(data)
            text = data.decode("utf-8", "replace")
            for i, line in enumerate(text.splitlines(), 1):
                for cat, rx in PATTERNS.items():
                    if rx.search(line):
                        hits[cat].append(f"{rel}:{i}: {line.strip()[:160]}")
    try:
        commit = subprocess.run(["git", "rev-parse", "HEAD"], cwd=root,
                                capture_output=True, text=True).stdout.strip()
    except OSError:
        commit = ""
    out = {
        "run_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "git_commit": commit,
        "files_scanned": n_files,
        "corpus_sha256": digest.hexdigest(),
        "n_hits": sum(len(v) for v in hits.values()),
        "hits": hits,
    }
    path = os.path.join(root, "LEAKCHECK_LOCAL.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(f"{path}: {out['n_hits']} hits over {n_files} files "
          f"(corpus {out['corpus_sha256'][:12]}, commit {commit[:9]})")
    sys.exit(1 if out["n_hits"] else 0)


if __name__ == "__main__":
    main()
