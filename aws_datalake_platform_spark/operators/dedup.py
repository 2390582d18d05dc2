"""Deduplication operators for large-scale training-data pipelines.

The reference itself never dedups (its overwrite-everything write makes
it moot — SURVEY.md §2.7); these are the north-star extensions, built
relational-first so Catalyst plans them:

- exact_dedup:          hash-groupBy on normalized text
- ngram_jaccard_pairs:  shared-shingle join -> exact Jaccard
- minhash_lsh_pairs:    MinHash signatures -> banded LSH buckets ->
                        candidate join -> exact-Jaccard verify
- simhash:              64-bit SimHash (vectorized pandas_udf) ->
                        banded buckets -> Hamming verify (bit_count)

Scale design (the part that matters at 100 TB):
- Every step is explode/groupBy/join — no driver materialization, no
  per-row Python except the SimHash signature (Arrow-vectorized).
- MinHash avoids the all-pairs blowup: cost is O(docs x shingles x H)
  map-side + a bucket join whose fan-out is controlled by band width.
- Hash functions are md5-derived so results are deterministic across
  engines and cluster sizes (and therefore DuckDB-oracle checkable).
- ngram_jaccard_pairs supports a max_df guard: shingles occurring in
  more than max_df documents are dropped before the pair join — at
  scale a single stop-shingle otherwise produces a quadratic join.
"""

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf


# ── text normalization + shingling (shared building blocks) ─────────────────


def normalize_text(col: Column | str) -> Column:
    """lower -> strip non-alphanumerics to spaces -> collapse whitespace."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.regexp_replace(F.lower(c), "[^a-z0-9]+", " "), " +", " "))


def word_shingles(col: Column | str, k: int = 3) -> Column:
    """Distinct word k-gram shingles as array<string>; empty array when the
    document has fewer than k tokens."""
    c = F.col(col) if isinstance(col, str) else col
    toks = F.split(F.trim(c), r"\s+")
    n = F.size(toks)
    grams = F.transform(
        F.sequence(F.lit(1), n - (k - 1)),
        lambda i: F.array_join(F.slice(toks, i, k), " "),
    )
    return F.when(n >= k, F.array_distinct(grams)).otherwise(F.array().cast("array<string>"))


def _exploded_shingles(df: DataFrame, id_col: str, text_col: str, k: int) -> DataFrame:
    """(id, shingle) pairs, distinct per doc. The narrow base relation for
    every shingle-based dedup; partitioned by shingle after the explode."""
    return df.select(
        F.col(id_col).alias("__id"), F.explode(word_shingles(text_col, k)).alias("__sh")
    )


# ── exact dedup ──────────────────────────────────────────────────────────────


def exact_dedup_groups(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Group documents by md5(normalized text); keep the smallest id as the
    canonical representative. One shuffle on the fingerprint."""
    return (
        df.select(F.col(id_col).alias("doc_id"), F.md5(normalize_text(text_col)).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(F.min("doc_id").alias("keep_id"), F.count(F.lit(1)).alias("n_docs"))
    )


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Return the deduplicated rows (canonical representative per group)."""
    keep = exact_dedup_groups(df, id_col, text_col).select(F.col("keep_id").alias(id_col))
    return df.join(keep, on=id_col, how="left_semi")


# ── n-gram Jaccard near-dup ──────────────────────────────────────────────────


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    threshold: float = 0.5,
    max_df: int | None = None,
) -> DataFrame:
    """All-pairs exact Jaccard over word k-shingles, computed relationally:
    explode -> (optional max_df stop-shingle filter) -> self-join on the
    shingle -> per-pair intersection counts -> |A|+|B|-i union.

    Scale: the self-join fan-out is sum over shingles of df^2; max_df caps
    it. For data where even that is too hot, use minhash_lsh_pairs.
    Output: (doc_a, doc_b, jaccard) with doc_a < doc_b.
    """
    sh = _exploded_shingles(df, id_col, text_col, k)
    if max_df is not None:
        rare = sh.groupBy("__sh").agg(F.count(F.lit(1)).alias("__df")).filter(F.col("__df") <= max_df)
        sh = sh.join(rare.select("__sh"), "__sh", "left_semi")
    sizes = sh.groupBy("__id").agg(F.count(F.lit(1)).alias("__sz"))

    a = sh.select(F.col("__id").alias("doc_a"), "__sh")
    b = sh.select(F.col("__id").alias("doc_b"), "__sh")
    inter = (
        a.join(b, "__sh")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("__i"))
    )
    sz_a = sizes.select(F.col("__id").alias("doc_a"), F.col("__sz").alias("__sza"))
    sz_b = sizes.select(F.col("__id").alias("doc_b"), F.col("__sz").alias("__szb"))
    return (
        inter.join(sz_a, "doc_a")
        .join(sz_b, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (F.col("__i") / (F.col("__sza") + F.col("__szb") - F.col("__i"))).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", F.round("jaccard", 4).alias("jaccard"))
    )


# ── MinHash + banded LSH ─────────────────────────────────────────────────────


def minhash_band_buckets(
    df: DataFrame, id_col: str, text_col: str, k: int = 3, num_hashes: int = 32, bands: int = 8
) -> DataFrame:
    """(doc, band, bucket) where bucket = md5 of the band's minhash slice.

    The hash family is H_s(shingle) = substr(md5(shingle || '|' || s), 1, 16)
    compared lexicographically — deterministic everywhere (same buckets on
    any engine or cluster size), which makes LSH itself oracle-checkable.
    """
    rows_per_band = num_hashes // bands
    sh = _exploded_shingles(df, id_col, text_col, k)
    seeds = df.sparkSession.range(num_hashes).select(F.col("id").alias("__seed"))
    mh = (
        sh.crossJoin(F.broadcast(seeds))
        .groupBy("__id", "__seed")
        .agg(F.min(F.substring(F.md5(F.concat_ws("|", "__sh", "__seed")), 1, 16)).alias("__mh"))
    )
    # band bucket = md5 over the band's minhashes in seed order
    return (
        mh.withColumn("__band", (F.col("__seed") / rows_per_band).cast("int"))
        .groupBy("__id", "__band")
        .agg(
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("__seed", "__mh"))),
                        lambda x: x["__mh"],
                    ),
                    ",",
                )
            ).alias("__bucket")
        )
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
) -> DataFrame:
    """MinHash-LSH near-dup pairs, exact-Jaccard verified.

    Scale: signatures are one groupBy over (doc x seed); candidates come
    from an equi-join on (band, bucket) — never an all-pairs product. The
    verify join only touches candidate docs' shingles. bands/num_hashes
    trade recall for bucket-join fan-out (8 bands x 4 rows: ~J>=0.7 reliably
    caught; raise bands for lower thresholds).
    """
    buckets = minhash_band_buckets(df, id_col, text_col, k, num_hashes, bands)
    left = buckets.select(F.col("__id").alias("doc_a"), "__band", "__bucket")
    right = buckets.select(F.col("__id").alias("doc_b"), "__band", "__bucket")
    candidates = (
        left.join(right, ["__band", "__bucket"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )

    # exact-Jaccard verification restricted to candidate pairs
    sh = _exploded_shingles(df, id_col, text_col, k)
    sizes = sh.groupBy("__id").agg(F.count(F.lit(1)).alias("__sz"))
    a = sh.select(F.col("__id").alias("doc_a"), "__sh")
    b = sh.select(F.col("__id").alias("doc_b"), "__sh")
    inter = (
        candidates.join(a, "doc_a")
        .join(b.withColumnRenamed("__sh", "__shb"), "doc_b")
        .filter(F.col("__sh") == F.col("__shb"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("__i"))
    )
    sz_a = sizes.select(F.col("__id").alias("doc_a"), F.col("__sz").alias("__sza"))
    sz_b = sizes.select(F.col("__id").alias("doc_b"), F.col("__sz").alias("__szb"))
    return (
        inter.join(sz_a, "doc_a")
        .join(sz_b, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (F.col("__i") / (F.col("__sza") + F.col("__szb") - F.col("__i"))).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", F.round("jaccard", 4).alias("jaccard"))
    )


# ── SimHash ──────────────────────────────────────────────────────────────────


def simhash_signatures(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """64-bit SimHash per document (Arrow-vectorized pandas UDF; md5-derived
    token hashes so signatures are deterministic)."""

    @pandas_udf(T.LongType())
    def simhash(texts: pd.Series) -> pd.Series:
        out = np.zeros(len(texts), dtype=np.int64)
        for row, text in enumerate(texts):
            if not text:
                continue
            acc = np.zeros(64, dtype=np.int64)
            shifts = np.arange(64, dtype=np.uint64)
            for tok in text.lower().split():
                h = np.uint64(int.from_bytes(hashlib.md5(tok.encode()).digest()[:8], "big"))
                bits = ((h >> shifts) & np.uint64(1)).astype(np.int64)
                acc += bits * 2 - 1
            sig = 0
            for i in range(64):
                if acc[i] > 0:
                    sig |= 1 << i
            out[row] = sig - (1 << 64) if sig >= 1 << 63 else sig
        return pd.Series(out)

    return df.select(F.col(id_col).alias("doc_id"), simhash(F.col(text_col)).alias("simhash"))


def simhash_near_dup_pairs(
    df: DataFrame, id_col: str, text_col: str, max_hamming: int = 3
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance <= max_hamming.

    Candidate generation uses the pigeonhole principle: signatures are cut
    into max_hamming+1 16-bit bands; any pair within the distance budget
    must agree on >= 1 band, so candidates come from an equi-join on
    (band_idx, band_value) — never an all-pairs scan. Verification is
    JVM-side bit_count(xor).
    """
    sig = simhash_signatures(df, id_col, text_col)
    n_bands = max_hamming + 1
    width = 64 // n_bands
    bands = sig.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftrightunsigned(F.col("simhash"), i * width)
                        .bitwiseAND(F.lit((1 << width) - 1))
                        .alias("val"),
                    )
                    for i in range(n_bands)
                ]
            )
        ).alias("b"),
    ).select("doc_id", "simhash", F.col("b.band").alias("band"), F.col("b.val").alias("val"))

    left = bands.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("__sa"), "band", "val")
    right = bands.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("__sb"), "band", "val")
    return (
        left.join(right, ["band", "val"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "__sa", "__sb")
        .distinct()
        .withColumn("hamming", F.bit_count(F.expr("__sa ^ __sb")))
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )
