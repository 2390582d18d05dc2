"""Temporal join operators: as-of join, range join, sessionization.

Spark has no native ASOF JOIN (DuckDB/Pandas do); the union+window
encoding below expresses it relationally so Catalyst plans it with ONE
shuffle on the key — no per-key Python, no driver loops:

    union(left tagged 1, right tagged 0)
    -> window last(right_ts, ignorenulls) ordered by (ts, tag)
    -> filter tag=1

Scale: cost is a single hash partition by join key + an in-partition
sort — the same shape as a sort-merge join, and immune to right-side
fan-out (each left row picks exactly one predecessor). Range joins use
the equi-key + interval-predicate form, which Spark executes as a
shuffled join with the interval as a post-filter; sessionization is the
classic gaps-and-islands double window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    direction: str = "backward",
    tolerance: str | None = None,
) -> DataFrame:
    """For each left row, attach the nearest right timestamp at-or-before
    (backward) / at-or-after (forward) its own. Inner semantics: left rows
    with no match are dropped. Output: left columns + ``asof_ts``.

    Equal timestamps match (right row sorts before left via the tag), the
    same tie rule as DuckDB's ASOF JOIN ``l.ts >= r.ts``. ``tolerance``
    (an INTERVAL string, e.g. "2 hours") additionally bounds the match
    distance — pandas.merge_asof's tolerance semantics: matches farther
    than the tolerance are dropped, not clamped.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction}")

    l_cols = [c for c in left.columns]
    tagged_left = left.select(
        F.col(on).alias("__k"), F.col(left_ts).alias("__ts"), F.lit(1).alias("__tag"),
        F.struct(*l_cols).alias("__row"),
    )
    tagged_right = right.select(
        F.col(on).alias("__k"), F.col(right_ts).alias("__ts"), F.lit(0).alias("__tag"),
        F.lit(None).cast(tagged_left.schema["__row"].dataType).alias("__row"),
    )
    unioned = tagged_left.unionByName(tagged_right)

    if direction == "backward":
        w = (
            Window.partitionBy("__k")
            .orderBy(F.col("__ts").asc(), F.col("__tag").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        asof_ts = F.last(F.when(F.col("__tag") == 0, F.col("__ts")), ignorenulls=True).over(w)
    else:
        w = (
            Window.partitionBy("__k")
            .orderBy(F.col("__ts").asc(), F.col("__tag").desc())
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        asof_ts = F.first(F.when(F.col("__tag") == 0, F.col("__ts")), ignorenulls=True).over(w)

    matched = unioned.withColumn("__asof", asof_ts).filter(
        (F.col("__tag") == 1) & F.col("__asof").isNotNull()
    )
    if tolerance is not None:
        # filter on the internal columns BEFORE the output projection: a
        # left frame that itself carries an `asof_ts` column would make a
        # post-select F.col("asof_ts") reference ambiguous
        tol = F.expr(f"INTERVAL {tolerance}")
        if direction == "backward":
            matched = matched.filter(F.col("__ts") - F.col("__asof") <= tol)
        else:
            matched = matched.filter(F.col("__asof") - F.col("__ts") <= tol)
    return matched.select(
        *[F.col(f"__row.{c}").alias(c) for c in l_cols], F.col("__asof").alias("asof_ts")
    )


def asof_join_pandas(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
) -> DataFrame:
    """Alternate backward as-of via per-key pandas.merge_asof inside
    applyInPandas — kept to demonstrate the grouped-map UDF surface; the
    window encoding above is the preferred (JVM-side) path."""
    import pandas as pd
    from pyspark.sql import types as T

    # fresh StructType: StructType.add would mutate the DataFrame's cached schema
    out_schema = T.StructType(
        list(left.schema.fields) + [T.StructField("asof_ts", right.schema[right_ts].dataType)]
    )
    l_cols = left.columns

    def merge(lpdf, rpdf):
        if lpdf.empty or rpdf.empty:
            return pd.DataFrame(columns=[*l_cols, "asof_ts"])
        merged = pd.merge_asof(
            lpdf.sort_values(left_ts),
            rpdf[[right_ts]].sort_values(right_ts).rename(columns={right_ts: "asof_ts"}),
            left_on=left_ts,
            right_on="asof_ts",
            direction="backward",
        )
        return merged.dropna(subset=["asof_ts"])[[*l_cols, "asof_ts"]]

    return left.groupBy(on).cogroup(right.groupBy(on)).applyInPandas(merge, schema=out_schema)


def range_join_count(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    lower_interval: str,
    id_col: str,
) -> DataFrame:
    """Count right rows within (left_ts - interval, left_ts) per left row.
    Equi-key + interval predicate: Spark shuffles on the key and applies
    the range as a join filter (AQE handles skewed keys)."""
    lo = F.col(f"l.{left_ts}") - F.expr(f"INTERVAL {lower_interval}")
    joined = left.alias("l").join(
        right.alias("r"),
        (F.col(f"l.{on}") == F.col(f"r.{on}"))
        & (F.col(f"r.{right_ts}") >= lo)
        & (F.col(f"r.{right_ts}") < F.col(f"l.{left_ts}")),
        "inner",
    )
    return joined.groupBy(F.col(f"l.{id_col}").alias(id_col)).agg(
        F.count(F.lit(1)).alias("n_in_range")
    )


def sessionize(
    df: DataFrame, key: str, ts: str, order_tiebreak: str, gap: str = "12 hours"
) -> DataFrame:
    """Gaps-and-islands sessionization: a new session starts when the gap
    to the previous event exceeds ``gap``. Output one row per session:
    (key, session_id, session_start, session_end, n_events).

    Batch analogue of Structured Streaming's session_window (which the
    streaming module uses for live data)."""
    w = Window.partitionBy(key).orderBy(F.col(ts).asc(), F.col(order_tiebreak).asc())
    gap_micros = F.expr(f"INTERVAL {gap}")
    prev = F.lag(F.col(ts)).over(w)
    brk = F.when(prev.isNull() | (F.col(ts) > prev + gap_micros), 1).otherwise(0)
    sess = F.sum(brk).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (
        df.withColumn("__sess", sess)
        .groupBy(key, "__sess")
        .agg(
            F.min(ts).alias("session_start"),
            F.max(ts).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(key, F.col("__sess").alias("session_id"), "session_start", "session_end", "n_events")
    )


def gap_fill(
    df: DataFrame,
    key: str,
    ts_bucket: str,
    value: str,
    step: str = "1 hour",
) -> DataFrame:
    """Hypertable-style gap filling: densify a sparse per-key time series
    to a regular grid and fill holes with LOCF and linear interpolation
    (the time_bucket_gapfill / locf / interpolate trio).

    Per key: grid = sequence(min bucket, max bucket, step) -> left join
    the sparse series -> two windows (backward LOCF carry + the
    bracketing points for linear). No extrapolation: linear is null
    before the first / after the last observation.

    Output: (key, ts_bucket, locf_v, linear_v, filled).

    Scale: one shuffle on the key for the grid join + windows (same
    partitioning reused); grid explode is map-side. Dense-grid blowup is
    bounded by (range/step) per key — pick the step to match the rollup,
    not the raw event rate. Rounding of interpolated values is explicit
    floor(x*1e4+0.5)/1e4 so both engines agree on exact-half doubles.
    """
    sparse = df
    bounds = sparse.groupBy(key).agg(F.min(ts_bucket).alias("__lo"), F.max(ts_bucket).alias("__hi"))
    grid = bounds.select(
        key, F.explode(F.sequence("__lo", "__hi", F.expr(f"INTERVAL {step}"))).alias(ts_bucket)
    )
    j = grid.join(sparse, [key, ts_bucket], "left")
    wb = Window.partitionBy(key).orderBy(ts_bucket).rowsBetween(Window.unboundedPreceding, 0)
    wf = Window.partitionBy(key).orderBy(ts_bucket).rowsBetween(0, Window.unboundedFollowing)
    v = F.col(value)
    locf_v = F.last(v, ignorenulls=True).over(wb)
    prev_h = F.last(F.when(v.isNotNull(), F.col(ts_bucket)), ignorenulls=True).over(wb)
    next_v = F.first(v, ignorenulls=True).over(wf)
    next_h = F.first(F.when(v.isNotNull(), F.col(ts_bucket)), ignorenulls=True).over(wf)
    eh = F.unix_timestamp(ts_bucket).cast("double")
    ep = F.unix_timestamp(prev_h).cast("double")
    en = F.unix_timestamp(next_h).cast("double")
    interp = locf_v + (next_v - locf_v) * (eh - ep) / (en - ep)
    linear_v = (
        F.when(v.isNotNull(), F.round(v, 4))
        .when(locf_v.isNull() | next_v.isNull(), F.lit(None))
        .otherwise(F.floor(interp * 10000.0 + 0.5) / 10000.0)
    )
    return j.select(
        key,
        ts_bucket,
        F.round(locf_v, 4).alias("locf_v"),
        linear_v.alias("linear_v"),
        v.isNull().alias("filled"),
    )
