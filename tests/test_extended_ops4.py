"""Invariant suite for the round-8 batch (plans/extended_ops4.py):
algebraic properties the DuckDB hash-parity gate can't express —
conservation laws, frontier ordering, and the Murphy identity."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_lake_with_spark_spark.catalog import load_table
from data_lake_with_spark_spark.plans import REGISTRY


def run(spark, sf_dir, name):
    return REGISTRY[name].spark(spark, sf_dir)


def test_fifo_conserves_and_orders_the_frontier(spark, sf_dir):
    """Conservation: per type, total consumed == min(total_in,
    total_out) — FIFO neither creates nor loses quantity. Frontier
    order: in lot order every CONSUMED lot precedes every PARTIAL lot
    precedes every OPEN lot (≤1 PARTIAL per type)."""
    out = run(spark, sf_dir, "inventory_fifo_allocation").collect()
    flows = (
        load_table(spark, sf_dir, "events")
        .select(
            "event_type",
            F.floor(F.col("value") * 1e6 + F.lit(0.5)).cast("long").alias("mu"),
        )
        .groupBy("event_type")
        .agg(
            F.sum(F.when(F.col("mu") > 0, F.col("mu")).otherwise(0)).alias("tin"),
            F.sum(F.when(F.col("mu") < 0, -F.col("mu")).otherwise(0)).alias("tout"),
        )
        .collect()
    )
    totals = {r["event_type"]: (r["tin"], r["tout"]) for r in flows}
    by_type: dict[str, list] = {}
    for r in out:
        by_type.setdefault(r["event_type"], []).append(r)
        assert r["consumed"] + r["remaining"] == r["qty"]
        assert 0 <= r["consumed"] <= r["qty"]
    for et, rows in by_type.items():
        tin, tout = totals[et]
        assert sum(r["consumed"] for r in rows) == min(tin, tout), et
        statuses = [r["status"] for r in rows]
        assert statuses.count("PARTIAL") <= 1, f"{et}: >1 PARTIAL lot"
        for r in rows:
            # statuses mean exactly what they say
            if r["status"] == "CONSUMED":
                assert r["consumed"] == r["qty"] and r["remaining"] == 0
            elif r["status"] == "OPEN":
                assert r["consumed"] == 0 and r["remaining"] == r["qty"]
            else:
                assert 0 < r["consumed"] < r["qty"]


def test_brier_murphy_identity_and_calibration(spark, sf_dir):
    """REL − RES + UNC must reconstruct the directly-computed Brier
    score up to the within-bin variance correction (bins are 0.1 wide
    and outcomes are calibrated, so the correction is ≈ var(p|bin)
    ≤ 0.1²/12); and calibrated outcomes mean per-bin |p̄ − ȳ| stays
    small (reliability near zero by construction)."""
    rows = run(spark, sf_dir, "ml_brier_decomposition").collect()
    n_total = sum(r["n"] for r in rows)
    rel = sum(r["reliability_num"] for r in rows) / (n_total * 1e12)
    res = sum(r["resolution_num"] for r in rows) / (n_total * 1e12)
    unc = rows[0]["uncertainty_ppm2"] / 1e12
    decomposed = rel - res + unc

    ev = load_table(spark, sf_dir, "events")
    h = (
        "CAST(conv(substring(md5(concat(CAST(event_id AS STRING), '{s}')),"
        " 1, 8), 16, 10) AS BIGINT)"
    )
    direct = (
        ev.selectExpr(
            f"({h.format(s='brp')} % 1000) / 1000.0 AS p",
            f"CASE WHEN {h.format(s='bry')} % 1000 < {h.format(s='brp')} % 1000"
            " THEN 1.0 ELSE 0.0 END AS y",
        )
        .agg(F.avg((F.col("p") - F.col("y")) * (F.col("p") - F.col("y"))))
        .collect()[0][0]
    )
    direct = float(direct)
    assert abs(direct - decomposed) < 0.005, (direct, decomposed)
    for r in rows:
        assert abs(r["mean_p_ppm"] - r["mean_y_ppm"]) < 120_000, r  # calibrated


def test_kappa_bounds_and_agreement_direction(spark, sf_dir):
    """The noisy-copy rater must agree beyond chance (po > pe) and
    kappa must land strictly inside (0, 1e6) micro-units."""
    r = run(spark, sf_dir, "ml_cohens_kappa").collect()[0]
    assert r["po_ppm"] > r["pe_ppm"]
    assert 0 < r["kappa_micro"] < 1_000_000
    assert r["agree"] <= r["n"]


def test_kappa_div_idiom_exact_for_negative_numerator(spark):
    """Round-8 ADVICE follow-up: the kappa readout divides
    sign-extracted magnitudes (non-negative operands only) so the
    result is exact under BOTH floor and truncate integer-division
    semantics. Empirically DuckDB's integer // truncates toward zero
    exactly like Spark DIV (-7//2 = -3 on BIGINT/HUGEINT — the
    ADVICE's floor-division premise was wrong), so this pin proves
    agreement on below-chance (negative-kappa) inputs and guards any
    future engine or type change that flips the semantics."""
    import duckdb

    cases = [(-300_000, 400_000), (-1, 999_999), (-999_999, 1), (0, 500_000),
             (250_000, 500_000)]
    idiom_spark = (
        "CASE WHEN po_ppm >= pe_ppm"
        " THEN (po_ppm - pe_ppm) * 1000000 DIV (1000000 - pe_ppm)"
        " ELSE -((pe_ppm - po_ppm) * 1000000 DIV (1000000 - pe_ppm)) END"
    )
    df = spark.createDataFrame(
        [(pe + num, pe) for num, pe in cases], "po_ppm bigint, pe_ppm bigint"
    )
    got = [r[0] for r in df.selectExpr(f"{idiom_spark} AS k").collect()]
    con = duckdb.connect()
    want = []
    for num, pe in cases:
        po = pe + num
        want.append(
            con.sql(
                "SELECT CASE WHEN po >= pe"
                " THEN (po - pe) * 1000000 // (1000000 - pe)"
                " ELSE -((pe - po) * 1000000 // (1000000 - pe)) END"
                f" FROM (SELECT CAST({po} AS BIGINT) po, CAST({pe} AS BIGINT) pe)"
            ).fetchone()[0]
        )
    con.close()
    assert got == want, (got, want)
    assert got[0] < 0  # the below-chance case really is negative
