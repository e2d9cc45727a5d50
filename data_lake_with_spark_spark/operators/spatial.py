"""Spatial blocking — the geo analog of LSH candidate generation.

``grid_near_pairs`` finds all point pairs within a radius by hashing
points into fixed-size grid cells and equi-joining each point's 3×3
neighbor cells against home cells — candidates are O(n·9·density),
never n², and the join is a plain hash join on (cell_x, cell_y). The
verify step is exact integer squared distance, so the whole operator
is deterministic and SQL-oracle-able (coordinates are kept in
micro-degree BIGINTs; flat-distance semantics, no trig — the
blocking pattern is the point, great-circle verify slots in where a
production system needs it).

Each unordered pair surfaces EXACTLY once: the expanded side joins
the home side, and the (a_id < b_id) filter keeps one of the two
symmetric matches. Antimeridian wraparound is intentionally not
handled (documented limit — production geo uses S2/H3 cells, which
this operator's shape maps onto 1:1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def grid_near_pairs(
    points: DataFrame,
    radius: int,
    id_col: str = "id",
    x_col: str = "x",
    y_col: str = "y",
) -> DataFrame:
    """(a_id, b_id, dist2) for every pair with squared distance ≤
    radius² — ``radius`` in the same integer units as the
    coordinates; the grid cell edge equals the radius, so all true
    pairs fall in the 3×3 neighborhood."""
    r2 = radius * radius
    home = points.select(
        F.col(id_col).alias("b_id"),
        F.col(x_col).alias("bx"),
        F.col(y_col).alias("by"),
        F.expr(f"({x_col} - pmod({x_col}, {radius})) div {radius}").alias("cx"),
        F.expr(f"({y_col} - pmod({y_col}, {radius})) div {radius}").alias("cy"),
    )
    offsets = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]
    expanded = points.select(
        F.col(id_col).alias("a_id"),
        F.col(x_col).alias("ax"),
        F.col(y_col).alias("ay"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        (
                            F.expr(
                                f"({x_col} - pmod({x_col}, {radius}))"
                                f" div {radius}"
                            )
                            + F.lit(dx)
                        ).alias("cx"),
                        (
                            F.expr(
                                f"({y_col} - pmod({y_col}, {radius}))"
                                f" div {radius}"
                            )
                            + F.lit(dy)
                        ).alias("cy"),
                    )
                    for dx, dy in offsets
                ]
            )
        ).alias("c"),
    ).select("a_id", "ax", "ay", F.col("c.cx").alias("cx"), F.col("c.cy").alias("cy"))
    d2 = (F.col("ax") - F.col("bx")) * (F.col("ax") - F.col("bx")) + (
        F.col("ay") - F.col("by")
    ) * (F.col("ay") - F.col("by"))
    return (
        expanded.join(home, ["cx", "cy"])
        .where(F.col("a_id") < F.col("b_id"))
        .withColumn("dist2", d2.cast("bigint"))
        .where(F.col("dist2") <= F.lit(r2))
        .select("a_id", "b_id", "dist2")
    )
