"""Local mirror of the driver's DuckDB-oracle comparison.

Runs a Spark query and its DuckDB oracle SQL on the same parquet tables,
then compares row count, column-name set, and an order-insensitive
value representation (columns sorted by name, floats rounded, rows
sorted by their string form). Catching a mismatch here means catching
it before the driver's CORRECTNESS_r{N}.json does.
"""

from __future__ import annotations

import math
from datetime import date, datetime

import duckdb

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    # Pin x/0 -> NULL semantics: every try_divide-based degenerate-lake
    # mirror depends on DuckDB returning NULL for division by zero, which
    # newer DuckDB versions flip to IEEE inf/nan when
    # ieee_floating_point_ops defaults to true (ADVICE r9). Guarded for
    # versions that predate the setting.
    try:
        con.execute("SET ieee_floating_point_ops = false")
    except duckdb.Error:
        pass
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # round to 6 significant-ish decimals; queries already round
        # explicitly, this only smooths representation noise
        return f"{v:.6f}"
    if isinstance(v, (datetime, date)):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm(x) for x in v) + "]"
    return str(v)


def canonical_rows(columns, rows):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(_norm(r[i]) for i in order) for r in rows]
    out.sort()
    return [columns[i] for i in order], out  # name-sorted columns + rows


def _pd_kind(series) -> str:
    """Coarse dtype class of a pandas column, as the driver's TYPED hash
    sees it. Whitelists the normalizations with driver-green precedent
    (timestamp tz/unit — q102/q116 are hash-green across tz-aware vs
    naive and ns vs µs), and nothing else."""
    import decimal as _decimal

    import numpy as np
    import pandas.api.types as pt

    dt = series.dtype
    if pt.is_datetime64_any_dtype(dt):
        return "temporal"
    if pt.is_bool_dtype(dt):
        return "bool"
    if pt.is_integer_dtype(dt):
        return "int"
    if pt.is_float_dtype(dt):
        return "float"
    for v in series:
        if v is None or (isinstance(v, float) and math.isnan(v)):
            continue
        if isinstance(v, _decimal.Decimal):
            return "decimal"
        if isinstance(v, (list, tuple, dict, set, np.ndarray)):
            return "nested"
        if isinstance(v, (datetime, date)):
            return "temporal"
        if isinstance(v, bool):
            return "bool"
        if isinstance(v, (int, np.integer)):
            return "int"
        if isinstance(v, (float, np.floating)):
            return "float"
        if isinstance(v, (str, np.str_)):
            return "str"
        return type(v).__name__
    return "empty"


def compare_repr(spark_df, con, sql: str) -> tuple[bool, str]:
    """Type-REPRESENTATION parity at the pandas layer, mirroring the
    driver's typed hash. VERDICT r4: the value compare alone was blind
    to both of that round's driver failures — q76's Decimal-vs-float64
    dtype-kind gap (values bit-identical, hash red) and q196's list
    cells (driver canonicalizer TypeError). Run AFTER the value compare;
    any flag here predicts a driver hash-flip or crash."""
    s = spark_df.toPandas()
    d = con.execute(sql).fetchdf()
    issues = []
    for c in sorted(s.columns):
        if c not in d.columns:
            continue  # the value compare already reports column mismatches
        sk, dk = _pd_kind(s[c]), _pd_kind(d[c])
        if "nested" in (sk, dk):
            issues.append(
                f"{c}: nested cells (spark={sk}, duckdb={dk}) crash the "
                "driver's sort_values canonicalizer"
            )
        elif "decimal" in (sk, dk):
            issues.append(
                f"{c}: decimal representation (spark={sk}, duckdb={dk}) — "
                "Spark renders object/Decimal, DuckDB float64; hash flips"
            )
        elif sk != dk and "empty" not in (sk, dk):
            issues.append(f"{c}: pandas dtype-kind mismatch spark={sk} duckdb={dk}")
    return (not issues), "; ".join(issues) or "ok"


def compare(spark_df, con, sql: str, *, check_repr: bool = True) -> tuple[bool, str]:
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    res = con.execute(sql)
    d_cols = [d[0] for d in res.description]
    d_rows = res.fetchall()

    if sorted(s_cols) != sorted(d_cols):
        return False, f"column mismatch: spark={sorted(s_cols)} duckdb={sorted(d_cols)}"
    if len(s_rows) != len(d_rows):
        return False, f"row count mismatch: spark={len(s_rows)} duckdb={len(d_rows)}"
    _, s_canon = canonical_rows(s_cols, s_rows)
    _, d_canon = canonical_rows(d_cols, d_rows)
    if s_canon != d_canon:
        diff = [(a, b) for a, b in zip(s_canon, d_canon) if a != b][:3]
        return False, f"value mismatch, first diffs: {diff}"
    if check_repr:
        ok, msg = compare_repr(spark_df, con, sql)
        if not ok:
            return False, f"values match but representation differs: {msg}"
    return True, "ok"
