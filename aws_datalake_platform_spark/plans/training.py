"""Training-data shaping operators (round 6): the pre-training steps a
data team runs AFTER curation — clustering the corpus for mixture /
dedup decisions, decontaminating against a benchmark in EMBEDDING
space, inducing tokenizer merge candidates, and shaping length buckets
for efficient batch packing.

Reference tie-in: the reference delegates all analytics to Athena
(README.md:128-132); these extend the engine's LLM-pipeline surface
(SURVEY.md north-star ops) the same way q192-q202 did.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load_table
from ..functions.core import round_half_up
from .queries import register

# ── q203: k-means cluster profile (the corpus-clustering readout) ───────────

_Q203_K = 12  # clusters
_Q203_ITER = 10


def _q203_sql() -> str:
    from .extras import _kmeans_prefix_sql
    from .llm_ops import _COS

    prefix = _kmeans_prefix_sql(
        n_centroids=_Q203_K, sample_size=1024, n_iter=_Q203_ITER, seed=42, dim=64
    )
    # cosine of each RAW corpus vector to its (unit-norm) centroid —
    # the same proven _COS expression, then floor-half-up quantized to
    # 1e-6 BIGINT so the per-cluster SUM is order-free exact integer math
    cos = _COS.format(a="m.embedding", b="c.cv")
    return f"""
    WITH {prefix},
    qx AS (
      SELECT m.cluster,
             CAST(FLOOR({cos} * 1000000 + 0.5) AS BIGINT) AS q6
      FROM cb m JOIN cents{_Q203_ITER} c ON c.cid = m.cluster
    )
    SELECT CAST(cluster AS INT) AS cluster,
           CAST(COUNT(*) AS BIGINT) AS n_members,
           FLOOR(SUM(q6)::DOUBLE / (1000000.0 * COUNT(*)) * 1000000 + 0.5)
             / 1000000 AS avg_cos
    FROM qx GROUP BY cluster ORDER BY cluster
    """


@register(
    "q203_kmeans_clusters",
    _q203_sql(),
    doc="K-means corpus clustering profile: assign every embedding to "
    "its nearest learned centroid (the q47 coarse quantizer surfaced as "
    "a first-class clustering operator) and report per-cluster size and "
    "mean cosine-to-centroid — the readout that drives cluster-balanced "
    "mixture sampling and SemDeDup K sizing. The oracle replays the "
    "full quantizer via the shared _kmeans_prefix_sql CTEs; per-cluster "
    "mean cosine is floor-half-up quantized to 1e-6 BIGINT before the "
    "SUM so the aggregate is order-free exact integer math (q175's "
    "integer-quantized-sum idiom).",
)
def q203_kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: centroids come from a bounded driver sample (one
    TakeOrdered corpus scan); assignment is one vectorized fold per
    Arrow batch (map-side, no shuffle); the profile is a K-row hash
    aggregate with map-side combine on quantized integers. The only
    corpus-sized shuffle is the final K-group aggregate."""
    import numpy as np

    from ..operators.similarity import _centroid_matrix, cosine, ivf_assign

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    cents = _centroid_matrix(emb, "vec_id", "embedding", _Q203_K, n_iter=_Q203_ITER)
    asg = ivf_assign(emb, cents, n_probe=1)
    cdf = F.broadcast(
        spark.createDataFrame(
            [(int(i), [float(x) for x in row]) for i, row in enumerate(cents)],
            "cluster INT, cv ARRAY<DOUBLE>",
        )
    )
    q6 = F.floor(cosine(F.col("embedding"), F.col("cv")) * 1_000_000 + 0.5).cast(
        "long"
    )
    return (
        asg.withColumn("cluster", F.col("cluster").cast("int"))
        .join(cdf, "cluster")
        .groupBy("cluster")
        .agg(F.count(F.lit(1)).alias("n_members"), F.sum(q6).alias("__s"))
        .select(
            "cluster",
            "n_members",
            round_half_up(
                F.col("__s").cast("double") / (1_000_000.0 * F.col("n_members")), 6
            ).alias("avg_cos"),
        )
        .orderBy("cluster")
    )


# ── q204: semantic decontamination (benchmark overlap in embedding space) ───

_Q204_T = 0.35  # cosine threshold; bench slice = vec_id % 20 == 0


def _q204_sql() -> str:
    from .llm_ops import _COS

    cos = _COS.format(a="t.embedding", b="b.embedding")
    return f"""
    WITH bench AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 20 = 0),
    train AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 20 <> 0),
    hits AS (
      SELECT t.vec_id, ROUND({cos}, 6) AS sim
      FROM train t CROSS JOIN bench b
      WHERE ROUND({cos}, 6) >= {_Q204_T}
    )
    SELECT vec_id, CAST(COUNT(*) AS BIGINT) AS n_bench_hits,
           MAX(sim) AS max_sim
    FROM hits GROUP BY vec_id
    """


@register(
    "q204_semantic_decontamination",
    _q204_sql(),
    doc="Semantic (embedding-space) benchmark decontamination: flag "
    "every training vector whose cosine to ANY held-out benchmark "
    "vector (vec_id % 20 == 0) reaches the threshold — the paraphrase-"
    "robust complement of the 5-gram decontamination (q72), which "
    "literal-match contamination checks miss. Output: contaminated "
    "vec_id, how many benchmark items it collides with, and the max "
    "similarity.",
)
def q204_semantic_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: the BENCHMARK side is small by construction (a held-out
    eval suite — thousands of rows, here corpus/20), so it broadcasts
    and the scan over training embeddings is map-side with a per-row
    K_bench fold; the aggregate shuffles only the flagged rows. At a
    benchmark too large to broadcast, swap the candidate stage for the
    LSH bucket join (q59's embedding_near_dup_pairs) — same verdict
    columns."""
    from ..operators.similarity import cosine

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    bench = emb.filter(F.col("vec_id") % 20 == 0).select(
        F.col("vec_id").alias("__bid"), F.col("embedding").alias("__be")
    )
    train = emb.filter(F.col("vec_id") % 20 != 0)
    sim = F.round(cosine(F.col("embedding"), F.col("__be")), 6)
    return (
        train.crossJoin(F.broadcast(bench))
        .select("vec_id", sim.alias("sim"))
        .filter(F.col("sim") >= _Q204_T)
        .groupBy("vec_id")
        .agg(
            F.count(F.lit(1)).alias("n_bench_hits"),
            F.max("sim").alias("max_sim"),
        )
    )


# ── q205: BPE merge-pair statistics (tokenizer induction, step 1) ───────────

_Q205_TOP = 25


@register(
    "q205_bpe_pair_stats",
    rf"""
    WITH words AS (
      SELECT w, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
        SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS w
        FROM documents
      ) WHERE length(w) >= 2 GROUP BY w
    ),
    pairs AS (
      SELECT unnest(list_transform(range(1, length(w)),
                                   i -> substr(w, i, 2))) AS pair, cnt
      FROM words
    ),
    agg AS (
      SELECT pair, CAST(SUM(cnt) AS BIGINT) AS n_occurrences,
             CAST(COUNT(*) AS BIGINT) AS n_word_types
      FROM pairs GROUP BY pair
    )
    SELECT pair, n_occurrences, n_word_types, rank FROM (
      SELECT pair, n_occurrences, n_word_types,
             CAST(ROW_NUMBER() OVER (ORDER BY n_occurrences DESC, pair)
                  AS INTEGER) AS rank
      FROM agg) t
    WHERE rank <= {_Q205_TOP}
    """,
    doc="BPE tokenizer induction, first merge step: corpus-frequency-"
    "weighted counts of adjacent character pairs inside words — the "
    "statistic the byte-pair-encoding loop greedily merges (Sennrich et "
    "al., ACL'16). Top candidates by total occurrences (word frequency x "
    "in-word positions), with the number of distinct word types each "
    "pair appears in. Pure integer math, exact.",
)
def q205_bpe_pair_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: the word-frequency aggregate shuffles UNIQUE words (zipf-
    bounded vocabulary, not the corpus), and bigram expansion runs over
    that vocabulary — so the quadratic-ish blowup is |vocab| x word_len,
    independent of corpus row count. Both aggregates are map-side
    combinable; the top-k is a TakeOrdered, no global sort. A full BPE
    trainer iterates this query, re-splitting words on the learned
    merges — each iteration the same one-shuffle shape."""
    docs = load_table(spark, sf_dir, "documents")
    words = (
        docs.select(
            F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("w")
        )
        .filter(F.length("w") >= 2)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    pairs = words.select(
        F.explode(
            F.expr("transform(sequence(1, length(w) - 1), i -> substr(w, i, 2))")
        ).alias("pair"),
        "cnt",
    )
    agg = pairs.groupBy("pair").agg(
        F.sum("cnt").alias("n_occurrences"),
        F.count(F.lit(1)).alias("n_word_types"),
    )
    w = Window.orderBy(F.desc("n_occurrences"), F.asc("pair"))
    return (
        agg.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= _Q205_TOP)
        .select("pair", "n_occurrences", "n_word_types", "rank")
    )


# ── q206: length-bucket padding efficiency (batch shaping) ──────────────────

_Q206_BUCKETS = 8


@register(
    "q206_padding_efficiency",
    f"""
    WITH toks AS (
      SELECT doc_id,
             CAST(len(string_split_regex(trim(lower(text)), '\\s+')) AS BIGINT)
               AS n_tokens
      FROM documents WHERE length(trim(text)) > 0
    ),
    bucketed AS (
      SELECT doc_id, n_tokens,
             CAST(NTILE({_Q206_BUCKETS}) OVER (ORDER BY n_tokens, doc_id)
                  AS INTEGER) AS bucket
      FROM toks
    )
    SELECT bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           MAX(n_tokens) AS max_tokens,
           CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
           CAST(MAX(n_tokens) * COUNT(*) - SUM(n_tokens) AS BIGINT)
             AS padding_tokens,
           FLOOR((MAX(n_tokens) * COUNT(*) - SUM(n_tokens))::DOUBLE
                 / (MAX(n_tokens) * COUNT(*)) * 1000000 + 0.5) / 1000000
             AS waste_frac
    FROM bucketed GROUP BY bucket ORDER BY bucket
    """,
    doc="Length-bucketed batch-shaping report: split docs into "
    f"{_Q206_BUCKETS} equal-depth token-length buckets (NTILE over the "
    "deterministic (n_tokens, doc_id) order) and report per-bucket "
    "padding overhead if every batch pads to the bucket max — the "
    "decision artifact for sequence-length bucketing in a training "
    "loader (padding waste falls from one global bucket's worst case to "
    "the per-bucket residual). Integer token math; the waste fraction "
    "is a single deterministic double division, floor-half-up rounded.",
)
def q206_padding_efficiency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: token counts are map-side column math; NTILE needs a total
    order — at 100 TB replace it with a two-pass equi-depth split
    (approx quantile boundaries broadcast as a range predicate, q161's
    histogram machinery) instead of a global sort; the per-bucket
    aggregate is 8 groups with map-side combine. The oracle setting
    keeps NTILE so both engines share exact bucket assignment."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.filter(F.length(F.trim(F.col("text"))) > 0).select(
        "doc_id",
        F.size(F.split(F.trim(F.lower("text")), r"\s+")).cast("long").alias(
            "n_tokens"
        ),
    )
    w = Window.orderBy(F.asc("n_tokens"), F.asc("doc_id"))
    bucketed = toks.withColumn("bucket", F.ntile(_Q206_BUCKETS).over(w).cast("int"))
    pad = F.max("n_tokens") * F.count(F.lit(1)) - F.sum("n_tokens")
    return (
        bucketed.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.max("n_tokens").alias("max_tokens"),
            F.sum("n_tokens").alias("sum_tokens"),
            pad.alias("padding_tokens"),
            round_half_up(
                pad.cast("double") / (F.max("n_tokens") * F.count(F.lit(1))), 6
            ).alias("waste_frac"),
        )
        .orderBy("bucket")
    )
