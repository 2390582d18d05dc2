"""LLM-data-pipeline queries: dedup, text analysis, similarity search.

Registered into QUERY_REGISTRY next to the SQL surface. The dedup/text
oracles replicate the exact md5-based math in DuckDB SQL, so even the
LSH pipelines are hash-match checkable: same hash family -> same
buckets -> same candidates -> same verified pairs on both engines.

DuckDB shingle idiom: range(1, len(toks)-1) yields indices 1..n-2 and
toks[i:i+2] is the inclusive 3-token slice — equivalent to Spark's
sequence(1, size-2) + slice(toks, i, 3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..catalog import load_table
from ..operators.dedup import (
    exact_dedup_groups,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_near_dup_pairs,
)
from .queries import register

# shared DuckDB CTE: distinct word-3-shingles per document
_SH_CTE = r"""
sh AS (
  SELECT doc_id, unnest(list_distinct(
    CASE WHEN len(toks) >= 3
         THEN list_transform(range(1, len(toks)-1), i -> array_to_string(toks[i:i+2], ' '))
         ELSE []::VARCHAR[] END)) AS s
  FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents)
),
sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id)
"""


@register(
    "q22_dedup_exact",
    """
    SELECT md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'),
                                   ' +', ' ', 'g'))) AS fingerprint,
           MIN(doc_id) AS keep_id,
           COUNT(*) AS n_docs
    FROM documents GROUP BY 1
    """,
    doc="Exact dedup: hash-groupBy on normalized text, min-id canonical "
    "representative. One shuffle on the fingerprint.",
)
def q22_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return exact_dedup_groups(load_table(spark, sf_dir, "documents"), "doc_id", "text")


@register(
    "q23_ngram_jaccard_dedup",
    f"""
    WITH {_SH_CTE},
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b, ROUND(i * 1.0 / (sa.sz + sb.sz - i), 4) AS jaccard
    FROM inter
    JOIN sz sa ON sa.doc_id = doc_a
    JOIN sz sb ON sb.doc_id = doc_b
    WHERE i * 1.0 / (sa.sz + sb.sz - i) >= 0.5
    """,
    doc="n-gram Jaccard near-dup pairs via shared-shingle join (exact).",
)
def q23_ngram_jaccard_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ngram_jaccard_pairs(
        load_table(spark, sf_dir, "documents"), "doc_id", "text", k=3, threshold=0.5
    )


@register(
    "q24_minhash_lsh_dedup",
    f"""
    WITH {_SH_CTE},
    seeds AS (SELECT unnest(range(0, 32)) AS seed),
    mh AS (
      SELECT doc_id, seed, min(substr(md5(s || '|' || seed::VARCHAR), 1, 16)) AS mh
      FROM sh CROSS JOIN seeds GROUP BY doc_id, seed
    ),
    buckets AS (
      SELECT doc_id, CAST(seed // 4 AS INT) AS band,
             md5(string_agg(mh, ',' ORDER BY seed)) AS bucket
      FROM mh GROUP BY doc_id, seed // 4
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM buckets a
      JOIN buckets b ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
    ),
    inter AS (
      SELECT doc_a, doc_b, count(*) AS i
      FROM cand
      JOIN sh a ON a.doc_id = doc_a
      JOIN sh b ON b.doc_id = doc_b AND a.s = b.s
      GROUP BY doc_a, doc_b
    )
    SELECT doc_a, doc_b, ROUND(i * 1.0 / (sa.sz + sb.sz - i), 4) AS jaccard
    FROM inter
    JOIN sz sa ON sa.doc_id = doc_a
    JOIN sz sb ON sb.doc_id = doc_b
    WHERE i * 1.0 / (sa.sz + sb.sz - i) >= 0.5
    """,
    doc="MinHash (32 hashes) + banded LSH (8 bands x 4) near-dup pairs, "
    "exact-Jaccard verified. Deterministic md5 hash family makes the whole "
    "LSH pipeline oracle-checkable.",
)
def q24_minhash_lsh_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return minhash_lsh_pairs(
        load_table(spark, sf_dir, "documents"),
        "doc_id",
        "text",
        k=3,
        num_hashes=32,
        bands=8,
        threshold=0.5,
    )


@register(
    "q25_simhash_dedup",
    None,  # 64-bit SimHash signature math is not SQL-expressible in DuckDB;
    # correctness is pinned by tests/test_dedup.py against the planted
    # near-duplicate pairs instead (rows-only driver check).
    doc="SimHash near-dup pairs: vectorized 64-bit signatures, pigeonhole "
    "banding for candidates, bit_count Hamming verify.",
)
def q25_simhash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return simhash_near_dup_pairs(
        load_table(spark, sf_dir, "documents"), "doc_id", "text", max_hamming=3
    )
