"""Explicit-register HyperLogLog built from engine-portable primitives.

Spark's built-in ``hll_sketch_agg`` (Apache DataSketches) is the right
production sketch, but its binary registers can't be replayed by a
different engine, so queries using it were stuck with rows-only driver
checks. This module implements the same algorithm with EXPLICIT
registers derived from md5 — every step is integer arithmetic available
identically in Spark SQL and DuckDB (md5, substring, hex parse, bin,
shift, max, exact decimal sums), so the estimate is bit-reproducible
across engines and the driver can hash-check it (q32's plane-replay
oracle precedent).

Register math (p=12 → m=4096 registers, 60-bit rank window):

    h    = md5(utf8(value))               # 32 hex chars
    idx  = int(h[0:3], 16)                # 12 bits → register 0..4095
    w    = int(h[3:18], 16)               # next 60 bits
    rank = 61 - bitlength(w)   (61 if w == 0)
    M[idx] = max(rank) per group          # the registers

    S    = Σ_j 2^(61-M[j])   (M[j]=0 for absent registers)  # EXACT:
           each term is an integer shift, summed in DECIMAL(38,0)/HUGEINT
           — never a float sum, so accumulation order cannot matter
    E    = α·m²·2^61 / S     (single double division)
    E'   = m·ln(m/zeros)     when E ≤ 2.5m and zeros > 0  (linear counting)

Merging sketches == per-register MAX, which is exactly what the grouped
aggregate already computes — so a union-merge replay is one more
``groupBy(reg_idx).max(mj)``, and merged-vs-direct equality is an exact
identity, not an approximation.

Scale: one shuffle on (group, reg_idx) with map-side combine — at most
m=4096 rows per group survive the map side regardless of input size;
the estimate pass reduces 4096 rows/group to 1. This is the same
communication pattern as the built-in sketch (constant-size state per
group), just with the state laid out relationally.

Reference parity: the reference's Athena surface exposes
approx_distinct (docs/runbook.md:161 'any SQL Athena supports');
this is that capability with a cross-engine-verifiable twist.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HLL_P = 12
HLL_M = 1 << HLL_P  # 4096 registers
_WBITS = 60
_RANK_NULL = _WBITS + 1  # 61: rank when the 60-bit window is all zeros
_POW61 = 1 << 61  # exact in int and in double
# α·m²·2^61 — computed once in Python, embedded as the SAME double
# literal on both engine sides (repr round-trips exactly).
HLL_A = 0.7213 / (1.0 + 1.079 / HLL_M) * HLL_M * HLL_M * float(_POW61)
_LINEAR_THRESHOLD = 2.5 * HLL_M  # 10240.0


def hll_registers(df: DataFrame, group_cols: list[str], value_col: str) -> DataFrame:
    """Per-group HLL registers: (``*group_cols``, ``reg_idx``, ``mj``).

    One shuffle on (group, reg_idx); map-side max caps the shuffle at
    4096 rows per group per task.
    """
    h = F.md5(F.col(value_col).cast("string"))
    idx = F.conv(F.substring(h, 1, 3), 16, 10).cast("int")
    w = F.conv(F.substring(h, 4, 15), 16, 10).cast("long")
    rank = F.when(w == 0, F.lit(_RANK_NULL)).otherwise(
        F.lit(_RANK_NULL) - F.length(F.bin(w))
    )
    return (
        df.select(*group_cols, idx.alias("reg_idx"), rank.alias("reg_rank"))
        .groupBy(*group_cols, "reg_idx")
        .agg(F.max("reg_rank").alias("mj"))
    )


def hll_merge(regs: DataFrame, group_cols: list[str]) -> DataFrame:
    """Union-merge sketches down to ``group_cols`` granularity: the HLL
    merge IS per-register max, so this is exact (order-invariant)."""
    return regs.groupBy(*group_cols, "reg_idx").agg(F.max("mj").alias("mj"))


def hll_estimate(regs: DataFrame, group_cols: list[str], est_col: str = "est") -> DataFrame:
    """Estimate distinct counts from explicit registers.

    Returns (``*group_cols``, ``n_registers`` BIGINT, ``est_col`` DOUBLE
    rounded at 1e-4 with the cross-engine floor(x·1e4+0.5) convention).
    The register sum is exact DECIMAL — no float accumulation — so the
    only float ops are one division (+ ln on the linear-counting branch),
    performed in the identical order as the DuckDB replay.
    """
    term = F.expr(
        f"CAST(shiftleft(CAST(1 AS BIGINT), {_RANK_NULL} - mj) AS DECIMAL(38,0))"
    )
    agg = regs.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n_registers"),
        F.sum(term).alias("s_present"),
    )
    s_total = (
        F.col("s_present")
        + (F.lit(HLL_M).cast("long") - F.col("n_registers"))
        * F.lit(_POW61).cast("decimal(38,0)")
    ).cast("double")
    est_raw = F.lit(HLL_A) / s_total
    zeros = (F.lit(HLL_M).cast("long") - F.col("n_registers")).cast("double")
    est = F.when(
        (est_raw <= F.lit(_LINEAR_THRESHOLD)) & (zeros > 0),
        F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / zeros),
    ).otherwise(est_raw)
    return agg.select(
        *group_cols,
        "n_registers",
        (F.floor(est * 1e4 + 0.5) / 1e4).alias(est_col),
    )


def hll_oracle_cte(source_sql: str, scope_expr: str, value_expr: str) -> str:
    """DuckDB CTE replaying the register math over ``source_sql``.

    Produces a relation ``hll_regs(scope, reg_idx, mj)`` — feed it to
    :func:`hll_oracle_estimate`. ``scope_expr`` must yield VARCHAR.
    """
    return f"""
    hll_rows AS (
      SELECT {scope_expr} AS scope, md5(CAST({value_expr} AS VARCHAR)) AS h
      FROM ({source_sql})
    ),
    hll_bits AS (
      SELECT scope,
             CAST(('0x' || substr(h, 1, 3)) AS BIGINT) AS reg_idx,
             CAST(('0x' || substr(h, 4, 15)) AS BIGINT) AS w
      FROM hll_rows
    ),
    hll_regs AS (
      SELECT scope, reg_idx,
             MAX(CASE WHEN w = 0 THEN {_RANK_NULL}
                      ELSE {_RANK_NULL} - length(bin(w)) END) AS mj
      FROM hll_bits GROUP BY scope, reg_idx
    )"""


def hll_oracle_estimate(
    regs_rel: str, est_col: str = "est", scope_alias: str = "scope"
) -> str:
    """SELECT replaying :func:`hll_estimate` over a (scope, reg_idx, mj)
    relation — identical literals and float-op order as the Spark side."""
    s_total = (
        f"CAST(s_present + ({HLL_M} - n_registers) * "
        f"CAST({_POW61} AS HUGEINT) AS DOUBLE)"
    )
    est_raw = f"{HLL_A!r} / {s_total}"
    linear = f"{float(HLL_M)!r} * ln({float(HLL_M)!r} / CAST({HLL_M} - n_registers AS DOUBLE))"
    return f"""
    SELECT scope AS {scope_alias}, CAST(n_registers AS BIGINT) AS n_registers,
           floor(CASE WHEN {est_raw} <= {_LINEAR_THRESHOLD!r}
                       AND n_registers < {HLL_M}
                      THEN {linear} ELSE {est_raw} END * 1e4 + 0.5) / 1e4
             AS {est_col}
    FROM (
      SELECT scope, COUNT(*) AS n_registers,
             SUM(CAST((CAST(1 AS BIGINT) << ({_RANK_NULL} - mj)) AS HUGEINT))
               AS s_present
      FROM {regs_rel} GROUP BY scope
    )"""
