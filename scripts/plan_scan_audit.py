"""Effective-scan audit: per registered query, count FileScans in the
executed plan OUTSIDE cached relations (descending AQE wrappers —
their children() are empty, so naive walks see nothing). A count far
above the query's table arity means a reused subtree is being
re-derived per reference — the trap that made the lazy k-truss unroll
re-run the near-dup generator 864× and TextRank re-tokenize the
corpus 32× (both fixed with lazy .cache() in round 8), and the four
graph queries fixed in round 9 via operators/plan_cache.shared
(graph_local_clustering 94 → 0, harmonic_centrality 48,
assortativity 24, link_prediction 18). The budget is now ALSO a
pytest gate (tests/test_plan_quality.py::test_effective_scans_bounded,
bound 16); this script remains the exploratory form with full counts.

    python scripts/plan_scan_audit.py          # prints counts >= 5
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from data_lake_with_spark_spark.session import get_spark
from data_lake_with_spark_spark.plans import REGISTRY

spark = get_spark(app_name="scan_audit")
SF = "/root/testdata/sf0.001"

def scans_outside_cache(node) -> int:
    cname = node.getClass().getSimpleName()
    if "InMemoryTableScan" in cname:
        return 0
    if cname == "AdaptiveSparkPlanExec":
        return scans_outside_cache(node.executedPlan())
    if "QueryStage" in cname:
        return scans_outside_cache(node.plan())
    n = 1 if cname.startswith("FileSourceScan") else 0
    ch = node.children()
    for i in range(ch.size()):
        n += scans_outside_cache(ch.apply(i))
    return n

rows = []
for name in sorted(REGISTRY):
    try:
        df = REGISTRY[name].spark(spark, SF)
        n = scans_outside_cache(df._jdf.queryExecution().executedPlan())
        rows.append((n, name))
    except Exception as ex:
        print(f"ERR {name}: {type(ex).__name__} {str(ex)[:80]}", flush=True)
rows.sort(reverse=True)
for n, name in rows:
    if n >= 5:
        print(f"{n:3d}  {name}")
print("max-under-5 sample:", [x for x in rows if x[0] < 5][:3])
