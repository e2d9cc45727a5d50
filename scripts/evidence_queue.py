#!/usr/bin/env python
"""Evidence-queue and staleness report from the committed
CORRECTNESS_r*.json files — the bookkeeping behind the DRIVER_WINDOW
rotation (round-12 verdict directive #1), as a tool instead of an
ad-hoc snippet re-derived each round.

    python scripts/evidence_queue.py          # summary + stalest 50
    python scripts/evidence_queue.py --all    # every oracled query

Prints, per oracled query, the LAST round it held a green
(rows+schema+hash, no err) driver row — queue entries (never verified)
first, then ascending staleness. The window recipe: round-N births
first, then engine/oracle-changed re-gates, then this list's head.
"""
from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from data_lake_with_spark_spark.plans import REGISTRY  # noqa: E402

last: dict[str, int] = {}
for f in sorted(REPO.glob("CORRECTNESS_r*.json")):
    rnd = int(f.stem.split("_r")[1])
    for name, row in json.loads(f.read_text()).items():
        if (
            isinstance(row, dict)
            and row.get("rows_match")
            and row.get("schema_match")
            and row.get("hash_match")
            and not row.get("err")
        ):
            last[name] = max(last.get(name, 0), rnd)

oracled = sorted(n for n, q in REGISTRY.items() if q.oracle)
queue = [n for n in oracled if n not in last]
ranked = sorted((n for n in oracled if n in last), key=lambda n: (last[n], n))

print(f"registry: {len(REGISTRY)} queries, {len(oracled)} oracled")
print(f"evidence queue (oracled, never driver-verified): {len(queue)}")
for n in queue:
    print(f"  QUEUE  {n}")
n_show = len(ranked) if "--all" in sys.argv else 50
print(f"stalest {n_show} verified (last green round, ascending):")
for n in ranked[:n_show]:
    print(f"  r{last[n]:02d}  {n}")
