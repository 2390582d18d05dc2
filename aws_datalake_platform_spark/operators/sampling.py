"""Dataset curation sampling: deterministic, engine-independent, skew-aware.

A training-data pipeline samples constantly — held-out splits, ablation
subsets, per-domain caps so boilerplate-heavy sources don't dominate the
mix. Two properties matter at 100 TB and neither comes from
``df.sample()``:

- **Determinism across engines and runs**: membership must be a pure
  function of the ROW, not of partition layout or RNG state, so a
  re-run (or a different engine reading the same lake) selects the same
  rows. We hash ``md5(seed || id)`` to 60 bits and threshold it — the
  same idiom as the MinHash pipeline, mirrored verbatim in the DuckDB
  oracles.
- **No extra pass**: membership is a map-side filter pushed at the scan;
  sampling 1% of 100 TB reads the id column and nothing else when the
  projection allows it.

``cap_per_group`` is the boilerplate-domain guard: at most n rows per
group under a deterministic total order (window row_number — Spark
plans a WindowGroupLimit below the shuffle, so oversized groups are
truncated before they travel).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_HASH_SPACE = 1 << 60  # 15 hex chars of md5


def _row_hash(id_col: str | Column, seed: int) -> Column:
    """Uniform 60-bit hash of (seed, id) — deterministic under any
    partitioning; identical to DuckDB's
    ('0x' || substr(md5(seed || '|' || id), 1, 15))::BIGINT."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{seed}|"), c.cast("string"))), 1, 15), 16, 10
    ).cast("long")


def deterministic_sample(
    df: DataFrame, id_col: str, fraction: float, seed: int = 42
) -> DataFrame:
    """Keep ~``fraction`` of rows, chosen by row-content hash: stable
    across runs, engines, partitionings, and cluster sizes."""
    return df.filter(_row_hash(id_col, seed) < int(fraction * _HASH_SPACE))


def stratified_sample(
    df: DataFrame, id_col: str, strata_col: str, fractions: dict[str, float], seed: int = 42
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. keep 100% of rare
    languages, 1% of English). Strata absent from ``fractions`` are
    dropped — an explicit mix spec, not a default."""
    thresh = F.lit(None).cast("long")
    expr = None
    for value, frac in sorted(fractions.items()):
        cond = F.col(strata_col) == value
        lit = F.lit(int(frac * _HASH_SPACE))
        expr = F.when(cond, lit) if expr is None else expr.when(cond, lit)
    thresh = expr.otherwise(F.lit(-1))
    return df.filter(_row_hash(id_col, seed) < thresh)


def cap_per_group(
    df: DataFrame, group_cols: list[str], order_cols: list[str], n: int
) -> DataFrame:
    """At most ``n`` rows per group under a deterministic order. The
    ``order_cols`` must form a total order within each group (include a
    unique id as tiebreak) or membership is nondeterministic."""
    w = Window.partitionBy(*group_cols).orderBy(*[F.col(c) for c in order_cols])
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n)
        .drop("__rn")
    )
