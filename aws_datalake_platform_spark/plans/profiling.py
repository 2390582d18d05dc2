"""Profiling / incremental-maintenance queries: column profiles, fixed-
range histograms, mergeable rollup refresh, embedding quantization.

Oracles mirror the exact arithmetic (explicit floor-based bucketing and
rounding, DECIMAL sums for the incremental merge) so every query is
hash-checkable despite float folklore.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators.profiling import merge_rollup, numeric_histogram, profile_columns
from ..operators.similarity import quantization_profile
from .queries import register

_PROFILE_COLS = ["l_quantity", "l_extendedprice", "l_discount"]


def _profile_branch(c: str) -> str:
    return f"""
    SELECT '{c}' AS column_name, COUNT(*) AS n_rows,
           CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
           COUNT(DISTINCT {c}) AS n_distinct,
           CAST(MIN({c}) AS DOUBLE) AS min_val,
           CAST(MAX({c}) AS DOUBLE) AS max_val,
           ROUND(AVG({c}), 4) AS avg_val
    FROM lineitem
    """


@register(
    "q74_column_profile",
    " UNION ALL ".join(_profile_branch(c) for c in _PROFILE_COLS),
    doc="Per-column data profile (count/nulls/distinct/min/max/avg) in "
    "ONE fused aggregate pass + stack() unpivot — the numbers you read "
    "before writing validation expectations. The oracle's UNION ALL of "
    "per-column scans is the naive plan this operator avoids.",
)
def q74_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    return profile_columns(load_table(spark, sf_dir, "lineitem"), _PROFILE_COLS)


@register(
    "q75_numeric_histogram",
    """
    WITH b AS (
      SELECT LEAST(GREATEST(CAST(floor((o_totalprice - 0.0) / 30000.0) AS BIGINT), 0),
                   19) AS bucket
      FROM orders WHERE o_totalprice IS NOT NULL
    )
    SELECT bucket,
           ROUND(CAST(bucket * 30000.0 + 0.0 AS DOUBLE), 4) AS bucket_lo,
           ROUND(CAST((bucket + 1) * 30000.0 + 0.0 AS DOUBLE), 4) AS bucket_hi,
           COUNT(*) AS n
    FROM b GROUP BY bucket
    """,
    doc="Fixed-range 20-bucket histogram of order totals via explicit "
    "floor bucketing (DuckDB lacks width_bucket; identical arithmetic "
    "both engines). Map-side combine caps shuffle rows at n_buckets/task.",
)
def q75_numeric_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    return numeric_histogram(
        load_table(spark, sf_dir, "orders"), "o_totalprice", lo=0.0, hi=600000.0, n_buckets=20
    )


@register(
    "q76_incremental_rollup",
    """
    SELECT o_orderstatus, CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
           COUNT(*) AS cnt,
           floor(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
                 * 1e4 + 0.5) / 1e4 AS avg_price
    FROM orders GROUP BY 1, 2
    """,
    doc="Incremental rollup refresh: aggregate a base slice (o_orderkey "
    "% 10 != 0) and a delta slice separately, merge partials with "
    "merge_rollup, recompute the derived avg — and hash-match the "
    "direct full aggregate. DECIMAL sums make the merge order-exact "
    "(float addition is non-associative). The point at 100 TB: a daily "
    "refresh aggregates ONLY the new partition.",
)
def q76_incremental_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        F.date_trunc("month", "o_orderdate").alias("month"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
    )

    def rollup(part: DataFrame) -> DataFrame:
        return part.groupBy("o_orderstatus", "month").agg(
            F.sum("price").alias("total"), F.count(F.lit(1)).alias("cnt")
        )

    base = rollup(orders.filter(F.col("o_orderkey") % 10 != 0))
    delta = rollup(orders.filter(F.col("o_orderkey") % 10 == 0))
    merged = merge_rollup(
        base, delta, keys=["o_orderstatus", "month"], sum_cols=["total"], count_col="cnt"
    )
    return merged.select(
        "o_orderstatus",
        "month",
        # DECIMAL stays INTERNAL only. The r3/r4 driver runs proved the
        # values bit-identical yet the hash still flipped: at the pandas
        # layer Spark renders decimals as object/Decimal while DuckDB
        # renders float64 — a dtype-kind gap no width pin can close. So
        # the output projects to DOUBLE on both sides. Exactness holds:
        # the decimal value is n/100 with n << 2^53, and decimal->double
        # is correctly rounded in both engines, so the doubles agree
        # bit-for-bit.
        F.col("total").cast("double").alias("total"),
        "cnt",
        # explicit floor(x*1e4+0.5)/1e4, not round(): Spark rounds the
        # shortest decimal repr HALF_UP while DuckDB rounds the binary
        # value — they disagree on exact .xxxx5 doubles; floor math on
        # identical doubles cannot.
        (
            F.floor(F.col("total").cast("double") / F.col("cnt") * 10000.0 + 0.5) / 10000.0
        ).alias("avg_price"),
    )


@register(
    "q77_quantize_embeddings",
    """
    WITH e AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ),
    m AS (
      SELECT vec_id, v, list_min(v) AS lo, list_max(v) AS hi,
             CASE WHEN list_max(v) > list_min(v)
                  THEN (list_max(v) - list_min(v)) / 255.0 ELSE 1.0 END AS step
      FROM e
    )
    SELECT vec_id, ROUND(lo, 4) AS lo, ROUND(hi, 4) AS hi,
           ROUND(list_sum(list_transform(v, x -> abs(x - (lo +
                   LEAST(GREATEST(CAST(floor((x - lo) / step + 0.5) AS BIGINT), 0), 255)
                   * step)))) / len(v), 6) AS mean_abs_err
    FROM m
    """,
    doc="Int8 scalar quantization profile per embedding: min-max codes, "
    "reconstruction error. 4x storage cut for ANN corpora; explicit "
    "floor(x+0.5) rounding keeps both engines bit-identical.",
)
def q77_quantize_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    return quantization_profile(load_table(spark, sf_dir, "embeddings"))
