#!/usr/bin/env python3
"""Regenerate PLAN_AUDIT.md from a `runMain graft.Explain` dump.

Usage:
  sbt -batch "runMain graft.Explain /root/testdata/sf0.01" > /tmp/plans.txt
  python3 tools/plan_audit.py /tmp/plans.txt > PLAN_AUDIT.md

Counts per query: shuffle exchanges, broadcast exchanges, parquet filter
pushdown, and flags every CartesianProduct (none may exist), broadcast
nested-loop join, or custom TopKPerKey node.
"""
import re, sys

dump = open(sys.argv[1] if len(sys.argv) > 1 else '/tmp/plans.txt').read()
sections = re.split(r'=+ (\w+) =+', dump)[1:]
queries = dict(zip(sections[0::2], sections[1::2]))

HEADER = """# PLAN AUDIT (generated from `runMain graft.Explain`, sf0.01)

Scale checklist per query, read off the physical plans: shuffle exchange
count, broadcast exchange count, parquet filter pushdown where a filter
exists to push. **No CartesianProduct appears in any plan.** `BNLJ` marks
an intentional broadcast nested-loop join whose build side is bounded and
tiny (the ANN query set; single-row count frames inside IDF/metrics) —
the probe side streams and never shuffles for it. `TopKPerKey` marks the
custom two-phase heap operator replacing window-sort ranking.

| query | shuffle exchanges | broadcast exchanges | pushdown | notes |
|---|---|---|---|---|"""

print(HEADER)
cartesians = []
for name in sorted(queries):
    plan = queries[name]
    # AQEShuffleRead nodes re-read an Exchange's output (coalesced); they
    # are not additional shuffles, so only Exchange nodes are counted.
    shuf = len(re.findall(r'\(\d+\) Exchange', plan))
    bcast = len(re.findall(r'\(\d+\) BroadcastExchange', plan))
    pushed = 'yes' if re.search(r'PushedFilters: \[[^\]]', plan) else '-'
    notes = []
    if 'CartesianProduct' in plan:
        notes.append('CARTESIAN!'); cartesians.append(name)
    if 'BroadcastNestedLoopJoin' in plan:
        notes.append('BNLJ')
    if 'TopKPerKey' in plan:
        notes.append('TopKPerKey')
    if plan.strip().startswith('ERROR'):
        notes.append('ERROR')
    print(f"| {name} | {shuf} | {bcast} | {pushed} | {' '.join(notes)} |")
if cartesians:
    print(f"\n**CARTESIAN PRODUCTS FOUND: {cartesians}**", file=sys.stderr)
    sys.exit(1)
