"""Property-based tests (hypothesis): invariants that must hold for ANY
input, not just the fixture corpus — soundness of verified dedup pairs,
sampling determinism/monotonicity, and packing conservation laws.

Examples are kept small (Spark job per example); the properties, not the
volume, carry the weight.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

words = st.sampled_from("the quick brown fox jumps over a lazy dog spark".split())
texts = st.lists(words, min_size=0, max_size=12).map(" ".join)


@given(docs=st.lists(texts, min_size=1, max_size=12))
@settings(**SETTINGS)
def test_minhash_pairs_are_sound(spark, docs):
    """Every emitted pair's jaccard is the TRUE Jaccard over 3-shingles
    and >= the threshold — LSH may miss pairs (recall), but verified
    output must never overstate similarity (soundness)."""
    from aws_datalake_platform_spark.operators.dedup import minhash_lsh_pairs

    df = spark.createDataFrame([(i, t) for i, t in enumerate(docs)], "doc_id long, text string")
    out = minhash_lsh_pairs(df, "doc_id", "text", k=3, threshold=0.5).collect()

    def shingles(t):
        toks = t.split()
        return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}

    for r in out:
        a, b = shingles(docs[r["doc_a"]]), shingles(docs[r["doc_b"]])
        true_j = len(a & b) / len(a | b)
        assert abs(r["jaccard"] - round(true_j, 4)) < 1e-9
        assert r["jaccard"] >= 0.5


@given(docs=st.lists(texts, min_size=2, max_size=8))
@settings(**SETTINGS)
def test_minhash_identical_docs_always_pair(spark, docs):
    """Planted exact duplicates (J=1) must ALWAYS be found: identical
    docs share every band bucket, so banding cannot miss them."""
    from aws_datalake_platform_spark.operators.dedup import minhash_lsh_pairs

    long_doc = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [(i, t) for i, t in enumerate(docs)] + [(100, long_doc), (101, long_doc)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_lsh_pairs(df, "doc_id", "text", k=3, threshold=0.5).collect()
    }
    assert (100, 101) in pairs


@given(
    ids=st.lists(st.integers(min_value=0, max_value=10**9), min_size=1, max_size=50, unique=True),
    f1=st.floats(min_value=0.05, max_value=0.5),
    f2=st.floats(min_value=0.5, max_value=0.95),
)
@settings(**SETTINGS)
def test_deterministic_sample_monotone_and_partition_free(spark, ids, f1, f2):
    """Raising the fraction only ADDS rows (nested samples), and the
    selection is identical under a different partitioning — the two
    properties df.sample() does NOT give you."""
    from aws_datalake_platform_spark.operators.sampling import deterministic_sample

    df = spark.createDataFrame([(i,) for i in ids], "id long")
    s1 = {r["id"] for r in deterministic_sample(df, "id", f1).collect()}
    s2 = {r["id"] for r in deterministic_sample(df, "id", f2).collect()}
    assert s1 <= s2
    rep = {r["id"] for r in deterministic_sample(df.repartition(7), "id", f1).collect()}
    assert rep == s1


@given(lens=st.lists(st.integers(min_value=0, max_value=600), min_size=1, max_size=40))
@settings(**SETTINGS)
def test_sequence_packing_conserves_tokens(spark, lens):
    """Concat-and-split invariants for any doc-length profile: offsets
    equal the running prefix sum (no token lost or duplicated), offsets
    stay inside the budget, and pack ids are non-decreasing in doc
    order."""
    budget = 512
    df = spark.createDataFrame(
        [(i, " ".join(["w"] * n)) for i, n in enumerate(lens)], "doc_id long, text string"
    )
    toks = df.select(
        "doc_id",
        F.size(F.filter(F.split("text", "\\s+"), lambda t: t != "")).alias("n_tokens"),
    )
    from pyspark.sql import Window

    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    out = (
        toks.withColumn("off", F.sum("n_tokens").over(w) - F.col("n_tokens"))
        .select(
            "doc_id",
            "n_tokens",
            (F.col("off") / budget).cast("long").alias("pack_id"),
            (F.col("off") % budget).alias("pack_offset"),
        )
        .orderBy("doc_id")
        .collect()
    )
    running = 0
    prev_pack = 0
    for r in out:
        assert r["pack_id"] * budget + r["pack_offset"] == running
        assert 0 <= r["pack_offset"] < budget
        assert r["pack_id"] >= prev_pack
        prev_pack = r["pack_id"]
        running += r["n_tokens"]


@given(
    rows=st.lists(
        st.tuples(st.sampled_from(["a", "b", "c"]), st.integers(0, 10**6)),
        min_size=1,
        max_size=40,
        unique_by=lambda t: t[1],
    ),
    cap=st.integers(min_value=1, max_value=5),
)
@settings(**SETTINGS)
def test_cap_per_group_bound_and_determinism(spark, rows, cap):
    """cap_per_group never exceeds the cap, keeps the LOWEST-ordered rows
    per group, and is partitioning-independent."""
    from aws_datalake_platform_spark.operators.sampling import cap_per_group

    df = spark.createDataFrame(rows, "g string, id long")
    out = cap_per_group(df, ["g"], ["id"], cap).collect()
    by_g: dict[str, list[int]] = {}
    for r in out:
        by_g.setdefault(r["g"], []).append(r["id"])
    expected: dict[str, list[int]] = {}
    for g, i in rows:
        expected.setdefault(g, []).append(i)
    for g, got in by_g.items():
        assert sorted(got) == sorted(expected[g])[:cap]
    rep = cap_per_group(df.repartition(5), ["g"], ["id"], cap).collect()
    assert {(r["g"], r["id"]) for r in rep} == {(r["g"], r["id"]) for r in out}


@given(
    n=st.integers(min_value=2, max_value=10_000_000),
    threshold=st.floats(min_value=0.3, max_value=0.999),
)
@settings(max_examples=200, deadline=None)
def test_lsh_band_params_properties(n, threshold):
    """Sizing invariants: finite sane outputs for any corpus/threshold,
    bucket width grows (weakly) with the corpus, recall bound holds
    whenever the cap did not bite."""
    import math
    import warnings

    from aws_datalake_platform_spark.operators.similarity import lsh_band_params

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        b, r = lsh_band_params(n, threshold)
        assert 1 <= b <= 64 and 2 <= r <= 32
        # weak monotonicity in corpus size (same threshold)
        b2, r2 = lsh_band_params(n * 2, threshold)
    assert r2 >= r
    # recall bound holds when uncapped
    p = 1 - math.acos(threshold) / math.pi
    if b < 64:
        assert 1 - (1 - p**r) ** b >= 0.95 - 1e-9


# ── round-3 analytics invariants ────────────────────────────────────────────


def _run_q(spark, name, sf="/root/testdata/sf0.001"):
    from aws_datalake_platform_spark.plans.queries import QUERY_REGISTRY

    return QUERY_REGISTRY[name].fn(spark, sf)


def test_ks_drift_statistic_in_unit_interval(spark):
    row = _run_q(spark, "q169_ks_drift").collect()[0]
    assert 0.0 <= row.d_stat <= 1.0
    assert row.d_num <= row.na * row.nb
    # exact integer numerator consistent with the rounded statistic
    assert abs(row.d_stat - row.d_num / (row.na * row.nb)) < 1e-6


def test_ks_identical_samples_is_zero(spark):
    """KS of a distribution against itself must be exactly 0 — pin the
    integer cross-multiplication (ca*nb == cb*na when the samples are
    copies)."""
    from pyspark.sql import Window
    from aws_datalake_platform_spark.plans.analytics import q169_ks_drift  # noqa: F401

    df = spark.createDataFrame([(float(v % 7),) for v in range(200)], "v double")
    tagged = df.select("v", (F.lit(1)).alias("in_a")).unionAll(
        df.select("v", F.lit(0).alias("in_a"))
    )
    pv = tagged.groupBy("v").agg(
        F.sum("in_a").alias("ca_v"), F.sum(1 - F.col("in_a")).alias("cb_v")
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wf = Window.orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = pv.select(
        F.sum("ca_v").over(w).alias("ca"),
        F.sum("cb_v").over(w).alias("cb"),
        F.sum("ca_v").over(wf).alias("na"),
        F.sum("cb_v").over(wf).alias("nb"),
    )
    d = cum.agg(
        F.max(F.abs(F.col("ca") * F.col("nb") - F.col("cb") * F.col("na"))).alias("d")
    ).collect()[0].d
    assert d == 0


def test_dup_spans_are_maximal_and_disjoint(spark):
    """Per doc: spans are >= k tokens, pairwise disjoint, AND separated by
    more than adjacency (else the island merge failed to be maximal)."""
    from aws_datalake_platform_spark.plans.curation import _Q172_K

    rows = _run_q(spark, "q172_dup_span_merge").collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        assert r.span_tokens == r.span_end - r.span_start + 1 >= _Q172_K
        by_doc.setdefault(r.doc_id, []).append((r.span_start, r.span_end))
    for spans in by_doc.values():
        spans.sort()
        for (s1, e1), (s2, e2) in zip(spans, spans[1:]):
            assert s2 > e1 + 1, "adjacent/overlapping spans must have merged"


def test_winsorized_stats_bounds(spark):
    """Clamp counts are consistent with p05/p95 (each tail <= ~5% + ties)
    and the winsorized average sits within the clamp bounds."""
    rows = _run_q(spark, "q178_winsorized_stats").collect()
    for r in rows:
        assert 0 <= r.n_clamped_low and 0 <= r.n_clamped_high
        assert r.n_clamped_low <= 0.06 * r.n + 1
        assert r.n_clamped_high <= 0.06 * r.n + 1
        # rounded average is consistent with the exact integer sum
        assert abs(r.avg_winsorized - r.sum_wins_cents / (100.0 * r.n)) < 1e-4


def test_gini_in_unit_interval_and_uniform_is_zero(spark):
    row = _run_q(spark, "q180_gini_concentration").collect()[0]
    assert 0.0 <= row.gini <= 1.0
    # closed form on a uniform distribution must be ~0
    from pyspark.sql import Window

    rev = spark.createDataFrame([(i, 100) for i in range(1, 101)], "k long, cents long")
    w = Window.orderBy("cents", "k")
    ranked = rev.select(
        "cents",
        F.row_number().over(w).alias("i"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
    )
    g = ranked.agg(
        (
            2.0
            * F.sum(F.col("i").cast("double") * F.col("cents"))
            / (F.max("n") * 1.0 * F.sum("cents"))
            - (F.max("n") + 1.0) / F.max("n")
        ).alias("g")
    ).collect()[0].g
    assert abs(g) < 1e-9


def test_centroid_similarity_is_bounded_and_symmetric_free(spark):
    """Cosines lie in [-1, 1] and each unordered label pair appears
    exactly once (a < b canonicalization)."""
    rows = _run_q(spark, "q175_centroid_similarity").collect()
    seen = set()
    for r in rows:
        assert -1.0001 <= r.centroid_cos <= 1.0001
        assert r.label_a < r.label_b
        key = (r.label_a, r.label_b)
        assert key not in seen
        seen.add(key)


def test_triangles_are_canonical_and_edge_consistent(spark):
    """Every emitted triangle is strictly ordered n1<n2<n3 and unique."""
    rows = _run_q(spark, "q168_trade_triangles").collect()
    seen = set()
    for r in rows:
        assert r.n1 < r.n2 < r.n3
        t = (r.n1, r.n2, r.n3)
        assert t not in seen
        seen.add(t)


@given(docs=st.lists(texts, min_size=1, max_size=10))
@settings(**SETTINGS)
def test_gopher_rules_match_python_reference(spark, docs):
    """Every emitted statistic equals a pure-Python recomputation, and
    ``passes`` is exactly the conjunction of the rule flags — for ANY
    token content, including empty-ish docs."""
    from aws_datalake_platform_spark.operators.quality import gopher_rules

    rows = [(i, t) for i, t in enumerate(docs) if t.strip()]
    if not rows:
        return
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in gopher_rules(df, "doc_id", "text").collect()}
    stop = {"the", "be", "to", "of", "and", "that", "have", "with"}
    for i, t in rows:
        toks = t.strip().split()
        r = out[i]
        assert r["word_count"] == len(toks)
        assert r["mean_word_len"] == round(sum(map(len, toks)) / len(toks), 4)
        assert r["n_stopwords"] == len({w.lower() for w in toks} & stop)
        assert r["alpha_word_ratio"] == round(
            sum(any(c.isalpha() for c in w) for w in toks) / len(toks), 4
        )
        flags = (r["rule_word_count"], r["rule_mean_word_len"], r["rule_symbol_ratio"],
                 r["rule_alpha_words"], r["rule_stopwords"])
        assert r["passes"] == all(flags)


@given(
    sizes=st.lists(st.integers(min_value=1, max_value=40), min_size=1, max_size=5)
)
@settings(**SETTINGS)
def test_mixture_weights_partition_of_unity(spark, sizes):
    """For ANY domain size profile: weights are positive, sum to ~1, and
    ordering by weight equals ordering by token count (sqrt is
    monotone) — temperature reshapes, never reorders."""
    from aws_datalake_platform_spark.operators.quality import mixture_weights

    rows = [(f"d{i}", ("w " * n).strip()) for i, n in enumerate(sizes)]
    df = spark.createDataFrame(rows, "source string, text string")
    out = mixture_weights(df, "source", "text").collect()
    assert abs(sum(r["mix_weight"] for r in out) - 1.0) < 1e-4
    assert all(r["mix_weight"] > 0 for r in out)
    by_tokens = sorted(out, key=lambda r: (r["n_tokens"], r["source"]))
    by_weight = sorted(out, key=lambda r: (r["mix_weight"], r["source"]))
    assert [r["source"] for r in by_tokens] == [r["source"] for r in by_weight]


@given(
    rows=st.lists(
        st.tuples(st.sampled_from("AB"), st.sampled_from("xy"), st.sampled_from("stuvw")),
        min_size=1,
        max_size=30,
    )
)
@settings(**SETTINGS)
def test_k_anonymity_counts_match_reference(spark, rows):
    """Class sizes and distinct-sensitive counts equal a pure-Python
    recomputation; flags follow the thresholds exactly."""
    from collections import defaultdict

    from aws_datalake_platform_spark.operators.quality import k_anonymity_audit

    df = spark.createDataFrame(rows, "q1 string, q2 string, s string")
    out = {(r["q1"], r["q2"]): r for r in
           k_anonymity_audit(df, ["q1", "q2"], "s", k=3, l=2).collect()}
    ref = defaultdict(list)
    for q1, q2, s in rows:
        ref[(q1, q2)].append(s)
    assert set(out) == set(ref)
    for key, vals in ref.items():
        r = out[key]
        assert r["class_size"] == len(vals)
        assert r["n_sensitive_distinct"] == len(set(vals))
        assert r["k_anonymous"] == (len(vals) >= 3)
        assert r["l_diverse"] == (len(set(vals)) >= 2)


@given(docs=st.lists(texts, min_size=2, max_size=10))
@settings(**SETTINGS)
def test_prefix_containment_equals_brute(spark, docs):
    """Prefix filtering is a LOSSLESS candidate filter: the prefix-
    filtered operator must return exactly the brute self-join's pairs
    and values for ANY corpus."""
    from aws_datalake_platform_spark.operators.dedup import (
        shingle_containment_pairs,
        shingle_containment_pairs_prefix,
    )

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id long, text string"
    )
    brute = {
        (r["doc_a"], r["doc_b"]): r["containment"]
        for r in shingle_containment_pairs(df, "doc_id", "text", k=3, threshold=0.6).collect()
    }
    pref = {
        (r["doc_a"], r["doc_b"]): r["containment"]
        for r in shingle_containment_pairs_prefix(
            df, "doc_id", "text", k=3, threshold=0.6
        ).collect()
    }
    assert brute == pref
