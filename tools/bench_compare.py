"""Cross-round bench comparison: BENCH_DETAIL.json (current full run)
vs a prior round's BENCH_DETAIL_r0N.json and the frozen r5 anchor.

Usage: python tools/bench_compare.py [BENCH_DETAIL_r08.json]

Prints the shared-prefix subset totals (the HEADLINE list is
append-only, so the intersection IS the prior round's query set), the
r5-anchor 46-query subset, and per-query movers beyond the noise
policy (>1.4x on >=1s queries, >2x on anything).
"""

from __future__ import annotations

import json
import sys

CUR = "BENCH_DETAIL.json"
PREV = sys.argv[1] if len(sys.argv) > 1 else "BENCH_DETAIL_r08.json"
R5_ANCHOR_TOTAL = 46.6  # BASELINE.md frozen r5 curve (first 46 HEADLINE)


def load(p):
    d = json.load(open(p))
    return d.get("queries", d)


cur, prev = load(CUR), load(PREV)

shared = [q for q in prev if q in cur]
ct, pt = sum(cur[q] for q in shared), sum(prev[q] for q in shared)
print(f"shared {len(shared)}-query subset: cur {ct:.1f}s vs prev {pt:.1f}s "
      f"= {ct / pt:.2f}x")

sys.path.insert(0, ".")
from bench import FAST_TIER_N, HEADLINE  # noqa: E402

tier = [q for q in HEADLINE[:FAST_TIER_N] if q in cur]
ct_a = sum(cur[q] for q in tier)
print(f"r5-anchor {len(tier)}-query subset: cur {ct_a:.1f}s vs "
      f"anchor {R5_ANCHOR_TOTAL:.1f}s = {ct_a / R5_ANCHOR_TOTAL:.2f}x")

print("\nmovers (vs prev):")
for q in sorted(shared, key=lambda q: -(cur[q] / max(prev[q], 1e-9))):
    r = cur[q] / max(prev[q], 1e-9)
    if (r > 1.4 and cur[q] >= 1.0) or r > 2.0 or (1 / r > 2.0):
        print(f"  {q}: {prev[q]:.2f}s -> {cur[q]:.2f}s ({r:.2f}x)")

new = sorted((q for q in cur if q not in prev), key=lambda q: -cur[q])
print("\nnew queries this round:")
for q in new:
    print(f"  {cur[q]:6.2f}s  {q}")
print(f"\ncurrent total: {sum(cur.values()):.1f}s over {len(cur)} queries")
