#!/usr/bin/env python3
"""Merge the round-7 sf1 check_oracle logs into SF1_CORRECTNESS.md —
the per-query record (status + row count) the sf1 sweep produces.
Dev tool; paths are the round-7 session's scratch layout.

Usage: python3 tools/summarize_sf1.py <log1> [log2 ...] > SF1_CORRECTNESS.md
Each log line: 'PASS <name> (<rows> rows)' or 'FAIL <name>: <reason>'.
Later logs override earlier ones (re-runs after fixes).
"""
import sys, re

rows = {}
for path in sys.argv[1:]:
    for line in open(path):
        m = re.match(r"PASS (\S+) \((\d+) rows\)", line)
        if m:
            rows[m.group(1)] = ("PASS", int(m.group(2)), "")
            continue
        m = re.match(r"FAIL (\S+): (.*)", line)
        if m:
            rows[m.group(1)] = ("FAIL", None, m.group(2)[:140])

n_pass = sum(1 for v in rows.values() if v[0] == "PASS")
n_fail = len(rows) - n_pass
print(f"# SF1 correctness sweep — {n_pass} pass / {n_fail} fail over {len(rows)} checked\n")
print("| query | status | rows | note |")
print("|---|---|---|---|")
for name in sorted(rows):
    st, n, note = rows[name]
    print(f"| {name} | {st} | {'' if n is None else n} | {note} |")
