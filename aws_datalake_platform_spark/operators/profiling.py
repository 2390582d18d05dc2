"""Data-profiling and incremental-maintenance operators: per-column
statistics, numeric histograms, and mergeable rollup refresh.

The Glue-Data-Quality-shaped extension of the validation suite
(validation.py, reference transform.py:51-118): where DataValidator
answers pass/fail, these produce the numbers you look at to WRITE the
expectations. All single-pass relational plans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(df: DataFrame, numeric_cols: list[str]) -> DataFrame:
    """Long-format per-column profile: one row per column with
    (column_name, n_rows, n_null, n_distinct, min_val, max_val, avg_val).

    Scale: ONE aggregate pass computes every column's stats (the same
    fused-scan trick as DataValidator.validate); the long format comes
    from a stack() unpivot of the single result row, not per-column
    scans. count(DISTINCT x) for several x at once plans as one Expand +
    two-level aggregate — still a single source scan.
    """
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in numeric_cols:
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"__null_{c}"),
            F.count_distinct(F.col(c)).alias(f"__dist_{c}"),
            F.min(c).alias(f"__min_{c}"),
            F.max(c).alias(f"__max_{c}"),
            F.round(F.avg(c), 4).alias(f"__avg_{c}"),
        ]
    one = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', __null_{c}, __dist_{c}, CAST(__min_{c} AS DOUBLE), "
        f"CAST(__max_{c} AS DOUBLE), __avg_{c}"
        for c in numeric_cols
    )
    return one.selectExpr(
        f"stack({len(numeric_cols)}, {stack_args}) AS "
        "(column_name, n_null, n_distinct, min_val, max_val, avg_val)",
        "__n AS n_rows",
    ).select("column_name", "n_rows", "n_null", "n_distinct", "min_val", "max_val", "avg_val")


def numeric_histogram(
    df: DataFrame, col: str, lo: float, hi: float, n_buckets: int
) -> DataFrame:
    """Fixed-range histogram: (bucket, bucket_lo, bucket_hi, n) for
    values in [lo, hi); out-of-range values clamp into the edge buckets.

    Bucket arithmetic is explicit floor() math (not width_bucket) so the
    DuckDB oracle can mirror it token-for-token. One scan + one small
    aggregate keyed by the bucket id — at 100 TB this is the map-side-
    combine ideal: at most n_buckets rows per task reach the shuffle.
    """
    w = (hi - lo) / n_buckets
    bucket = F.least(
        F.greatest(F.floor((F.col(col) - lo) / w), F.lit(0)), F.lit(n_buckets - 1)
    ).cast("long")
    return (
        df.filter(F.col(col).isNotNull())
        .groupBy(bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "bucket",
            F.round(F.col("bucket") * w + lo, 4).alias("bucket_lo"),
            F.round((F.col("bucket") + 1) * w + lo, 4).alias("bucket_hi"),
            "n",
        )
    )


def merge_rollup(
    base: DataFrame, delta: DataFrame, keys: list[str], sum_cols: list[str], count_col: str
) -> DataFrame:
    """Merge two partial rollups (same schema: keys + sum_cols +
    count_col) into one — the algebra behind incremental aggregate
    maintenance: refresh a materialized rollup by aggregating ONLY the
    new partition and merging, never rescanning the base table.

    Sums and counts are re-additive; anything derived (avg, rate) must
    be recomputed from the merged sums by the caller. Exactness: callers
    should sum DECIMAL, not DOUBLE, so that merge order cannot change
    the result (float addition is non-associative).

    Scale: input is two already-aggregated relations (|groups|, not
    |rows|); the merge is one union + one hash aggregate on the keys.
    """
    merged = base.unionByName(delta)
    aggs = [F.sum(c).alias(c) for c in sum_cols] + [F.sum(count_col).alias(count_col)]
    return merged.groupBy(*keys).agg(*aggs)
