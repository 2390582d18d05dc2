"""Corpus-curation and CDC queries: repetition filtering, PII redaction,
benchmark decontamination, snapshot diff.

Each Spark plan has an exactly-mirrored DuckDB oracle (same math, same
regexes — patterns restricted to the Java-regex ∩ RE2 dialect so both
engines interpret them identically).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators.quality import (
    contamination_pairs,
    pii_counts,
    redact_pii,
    repetition_stats,
    snapshot_diff,
)
from .queries import register


@register(
    "q70_repetition_stats",
    r"""
    WITH tok AS (
      SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS toks
      FROM documents
    ),
    bg AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(toks)),
                                   i -> toks[i] || ' ' || toks[i+1])) AS bigram
      FROM tok WHERE len(toks) >= 2
    ),
    per AS (SELECT doc_id, bigram, count(*) AS c FROM bg GROUP BY 1, 2)
    SELECT doc_id,
           CAST(sum(c) AS BIGINT) AS n_bigrams,
           ROUND(1.0 - count(*) * 1.0 / CAST(sum(c) AS BIGINT), 4) AS dup_bigram_frac,
           ROUND(max(c) * 1.0 / CAST(sum(c) AS BIGINT), 4) AS top_bigram_frac
    FROM per GROUP BY doc_id
    """,
    doc="Gopher-style repetition profile: duplicate-bigram fraction and "
    "top-bigram dominance per document. Two hash aggregates, no windows.",
)
def q70_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return repetition_stats(load_table(spark, sf_dir, "documents"), "doc_id", "text")


@register(
    "q71_pii_redaction",
    r"""
    WITH contact AS (
      SELECT c_custkey,
             'Reach ' || c_name || ' at user' || CAST(c_custkey AS VARCHAR)
             || '@example.com or +1 555 '
             || lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0')
             || ' from 10.0.' || CAST(c_custkey % 256 AS VARCHAR) || '.1' AS txt
      FROM customer
    )
    SELECT c_custkey,
           regexp_replace(regexp_replace(regexp_replace(txt,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
             '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '[IP]', 'g'),
             '\+?\d[\d -]{7,}\d', '[PHONE]', 'g') AS redacted,
           CAST(len(regexp_extract_all(txt,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_email,
           CAST(len(regexp_extract_all(txt,
             '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS BIGINT) AS n_ipv4,
           CAST(len(regexp_extract_all(txt,
             '\+?\d[\d -]{7,}\d')) AS BIGINT) AS n_phone
    FROM contact
    """,
    doc="Regex PII redaction (email/IPv4/phone) with per-kind match "
    "counts, over deterministically constructed contact strings — "
    "extends the reference's PII column drop (transform.py:131-140) to "
    "in-text masking. Pure regexp_replace chain, zero shuffles.",
)
def q71_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    contact = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.concat(
            F.lit("Reach "),
            F.col("c_name"),
            F.lit(" at user"),
            F.col("c_custkey").cast("string"),
            F.lit("@example.com or +1 555 "),
            F.lpad((F.col("c_custkey") % 10000).cast("string"), 4, "0"),
            F.lit(" from 10.0."),
            (F.col("c_custkey") % 256).cast("string"),
            F.lit(".1"),
        ).alias("txt"),
    )
    return contact.select(
        "c_custkey",
        redact_pii("txt").alias("redacted"),
        *pii_counts("txt"),
    )


@register(
    "q72_contamination_check",
    r"""
    WITH tok AS (
      SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents
    ),
    sh AS (
      SELECT doc_id, unnest(list_distinct(
        CASE WHEN len(toks) >= 5
             THEN list_transform(range(1, len(toks)-3),
                                 i -> array_to_string(toks[i:i+4], ' '))
             ELSE []::VARCHAR[] END)) AS s
      FROM tok
    )
    SELECT c.doc_id AS doc_id, b.doc_id AS bench_id, count(*) AS n_shared
    FROM sh c JOIN sh b ON c.s = b.s
    WHERE b.doc_id % 20 = 0 AND c.doc_id % 20 <> 0
    GROUP BY 1, 2
    """,
    doc="Benchmark decontamination: corpus docs sharing any 5-gram with a "
    "held-out benchmark slice (doc_id % 20 = 0). Broadcast the small "
    "benchmark shingle side; corpus is never shuffled.",
)
def q72_contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 20 == 0)
    corpus = docs.filter(F.col("doc_id") % 20 != 0)
    return contamination_pairs(corpus, bench, "doc_id", "text", k=5, min_shared=1)


@register(
    "q73_snapshot_diff",
    """
    WITH newsnap AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 100 = 0 THEN o_totalprice + 10.0
                  ELSE o_totalprice END AS o_totalprice,
             o_orderstatus
      FROM orders WHERE o_orderkey % 97 <> 0
      UNION ALL
      SELECT o_orderkey + 10000000, o_totalprice, o_orderstatus
      FROM orders WHERE o_orderkey % 500 = 0
    )
    SELECT COALESCE(n.o_orderkey, o.o_orderkey) AS o_orderkey,
           CASE WHEN o.o_orderkey IS NULL THEN 'INSERT'
                WHEN n.o_orderkey IS NULL THEN 'DELETE'
                ELSE 'UPDATE' END AS change_type,
           o.o_totalprice AS old_o_totalprice,
           o.o_orderstatus AS old_o_orderstatus,
           n.o_totalprice AS new_o_totalprice,
           n.o_orderstatus AS new_o_orderstatus
    FROM orders o FULL OUTER JOIN newsnap n ON o.o_orderkey = n.o_orderkey
    WHERE o.o_orderkey IS NULL OR n.o_orderkey IS NULL
       OR o.o_totalprice IS DISTINCT FROM n.o_totalprice
       OR o.o_orderstatus IS DISTINCT FROM n.o_orderstatus
    """,
    doc="Snapshot diff (CDC): row-level INSERT/DELETE/UPDATE between two "
    "table versions via one full-outer key join; output scales with "
    "churn, not table size. New snapshot simulated deterministically "
    "(delete %97, reprice %100, insert %500 with shifted keys).",
)
def q73_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    newsnap = (
        orders.filter(F.col("o_orderkey") % 97 != 0)
        .select(
            "o_orderkey",
            F.when(F.col("o_orderkey") % 100 == 0, F.col("o_totalprice") + 10.0)
            .otherwise(F.col("o_totalprice"))
            .alias("o_totalprice"),
            "o_orderstatus",
        )
        .unionAll(
            orders.filter(F.col("o_orderkey") % 500 == 0).select(
                (F.col("o_orderkey") + 10000000).alias("o_orderkey"),
                "o_totalprice",
                "o_orderstatus",
            )
        )
    )
    return snapshot_diff(
        orders, newsnap, keys=["o_orderkey"], compare_cols=["o_totalprice", "o_orderstatus"]
    )


def _zorder_oracle_sql(bits: int = 16) -> str:
    # every shift term fully parenthesized: DuckDB (like Postgres) gives
    # << and | EQUAL precedence with left associativity, so an unwrapped
    # "a << 1 | b << 2" chain re-shifts the accumulated value and overflows
    terms = []
    for i in range(bits):
        terms.append(f"((((o_custkey & 65535) >> {i}) & 1) << {2 * i + 1})")
        terms.append(f"((((o_orderkey & 65535) >> {i}) & 1) << {2 * i})")
    z = " | ".join(terms)
    return f"SELECT o_orderkey, ({z}) AS z FROM orders"


@register(
    "q79_zorder_key",
    _zorder_oracle_sql(),
    doc="32-bit Morton (Z-order) interleave of (o_custkey, o_orderkey) "
    "low 16 bits each — the clustering key behind multi-dimensional "
    "data skipping (cluster_by_zorder). Pure bitwise exprs, bit-exact "
    "against the SQL oracle.",
)
def q79_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.maintenance import zorder_key

    return load_table(spark, sf_dir, "orders").select(
        "o_orderkey", zorder_key("o_custkey", "o_orderkey").alias("z")
    )


@register(
    "q80_approx_percentiles",
    None,  # t-digest internals differ per engine: rows-only + pytest bound
    doc="approx_percentile (p50/p90/p99) per return flag — the sketch "
    "path for percentile queries whose exact form (q43) needs a full "
    "sort. Accuracy bound asserted against exact percentiles in pytest "
    "(test_profiling.py).",
)
def q80_approx_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.percentile_approx("l_extendedprice", [0.5, 0.9, 0.99], 10000).alias("pcts")
        )
        .select(
            "l_returnflag",
            F.round(F.col("pcts")[0], 2).alias("p50"),
            F.round(F.col("pcts")[1], 2).alias("p90"),
            F.round(F.col("pcts")[2], 2).alias("p99"),
        )
    )
