"""Invariant tests for the round-6 training-data shaping operators
(q203-q206) beyond the DuckDB oracle equivalence the driver gate checks."""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_datalake_platform_spark.plans.queries import QUERY_REGISTRY

from .conftest import SF_SMOKE


def test_q203_cluster_profile_partitions_corpus(spark):
    """Cluster sizes must partition the corpus (every vector assigned to
    exactly one cluster) and mean cosine-to-centroid must be a valid
    cosine; a healthy quantizer uses more than one cluster."""
    from aws_datalake_platform_spark.catalog import load_table

    rows = QUERY_REGISTRY["q203_kmeans_clusters"].fn(spark, SF_SMOKE).collect()
    n_corpus = load_table(spark, SF_SMOKE, "embeddings").count()
    assert sum(r["n_members"] for r in rows) == n_corpus
    assert 1 < len(rows) <= 12
    for r in rows:
        assert -1.0 <= r["avg_cos"] <= 1.0
        assert r["n_members"] > 0
    # members should on average be CLOSER to their centroid than random
    # vectors are to each other (the clustering did something)
    total = sum(r["avg_cos"] * r["n_members"] for r in rows) / n_corpus
    assert total > 0.1


def test_q204_semantic_decontamination_flags_only_train(spark):
    """Flagged ids must come from the training split only, hit counts
    must be positive, and max_sim must clear the threshold."""
    rows = QUERY_REGISTRY["q204_semantic_decontamination"].fn(spark, SF_SMOKE).collect()
    assert rows  # vacuity: the threshold must fire at test scale
    for r in rows:
        assert r["vec_id"] % 20 != 0
        assert r["n_bench_hits"] >= 1
        assert r["max_sim"] >= 0.35


def test_q205_bpe_pairs_ranked_and_shaped(spark):
    rows = sorted(
        QUERY_REGISTRY["q205_bpe_pair_stats"].fn(spark, SF_SMOKE).collect(),
        key=lambda r: r["rank"],
    )
    assert len(rows) == 25
    assert all(len(r["pair"]) == 2 for r in rows)
    occ = [r["n_occurrences"] for r in rows]
    assert occ == sorted(occ, reverse=True)
    assert all(r["n_word_types"] <= r["n_occurrences"] for r in rows)


def test_q206_padding_buckets_partition_and_bound_waste(spark):
    """Buckets partition the non-empty docs; padding identity holds per
    bucket; bucketed waste must beat the single-global-bucket baseline."""
    from pyspark.sql import functions as F

    from aws_datalake_platform_spark.catalog import load_table

    rows = QUERY_REGISTRY["q206_padding_efficiency"].fn(spark, SF_SMOKE).collect()
    docs = load_table(spark, SF_SMOKE, "documents").filter(
        F.length(F.trim(F.col("text"))) > 0
    )
    assert sum(r["n_docs"] for r in rows) == docs.count()
    for r in rows:
        assert r["padding_tokens"] == r["max_tokens"] * r["n_docs"] - r["sum_tokens"]
        assert 0.0 <= r["waste_frac"] < 1.0
    global_max = max(r["max_tokens"] for r in rows)
    n = sum(r["n_docs"] for r in rows)
    toks = sum(r["sum_tokens"] for r in rows)
    bucketed_pad = sum(r["padding_tokens"] for r in rows)
    assert bucketed_pad < global_max * n - toks  # bucketing must help


def test_training_queries_registered_at_tail():
    """Rotation invariant: the round-6 registry entries must sit BEHIND
    every older never-sampled query in registry order."""
    names = list(QUERY_REGISTRY)
    idx = {n: i for i, n in enumerate(names)}
    for newer in (
        "q203_kmeans_clusters",
        "q204_semantic_decontamination",
        "q205_bpe_pair_stats",
        "q206_padding_efficiency",
    ):
        assert idx[newer] > idx["q202_mmr_rerank"]


def test_q207_pca_rayleigh_quotient_near_top_eigenvalue(spark):
    """The power-iteration eigenvalue is a Rayleigh quotient: it can
    never exceed the true top eigenvalue of the sample covariance, and
    after 12 iterations it must capture most of it even with this
    corpus's small eigengap (lambda2/lambda1 ~ 0.93). Projections must
    be rank-ordered by |proj|."""
    import numpy as np

    from aws_datalake_platform_spark.catalog import load_table

    rows = sorted(
        QUERY_REGISTRY["q207_pca_top_component"].fn(spark, SF_SMOKE).collect(),
        key=lambda r: r["rank"],
    )
    assert len(rows) == 20 and [r["rank"] for r in rows] == list(range(1, 21))
    absp = [abs(r["proj"]) for r in rows]
    assert absp == sorted(absp, reverse=True)
    lam = rows[0]["eigval"]
    assert all(r["eigval"] == lam for r in rows)

    x = np.array(
        [
            r["embedding"]
            for r in load_table(spark, SF_SMOKE, "embeddings")
            .select("embedding")
            .collect()
        ],
        dtype=np.float64,
    )
    xc = x - x.mean(axis=0)
    true_top = float(np.linalg.eigvalsh(xc.T @ xc / len(x))[-1])
    assert lam <= true_top + 1e-9  # Rayleigh bound
    assert lam >= 0.9 * true_top  # convergence quality


def test_q208_bigram_scores_held_out_only_and_sane(spark):
    rows = QUERY_REGISTRY["q208_bigram_perplexity"].fn(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r["doc_id"] % 5 == 0  # held-out split only
        assert r["n_bigrams"] >= 1
        assert r["avg_logprob"] < 0  # log-probabilities
    # smoothing floor: nothing can be less likely than 1/(0 + V) with
    # V = train vocab; mean log-prob must stay above ln(1/(max_c1+V))
    # trivially > -20 at this scale — a sanity band, not a tight bound
    assert all(r["avg_logprob"] > -20 for r in rows)


def test_q209_recall_audit_bounds_and_probe_count(spark):
    rows = QUERY_REGISTRY["q209_ann_recall_audit"].fn(spark, SF_SMOKE).collect()
    assert len(rows) == 10  # one row per probe, even at recall 0
    for r in rows:
        assert 0 <= r["n_hits"] <= 5
        assert r["recall"] == r["n_hits"] / 5
    # the IVF index must be doing real work at probe scale
    assert sum(r["n_hits"] for r in rows) / 50 >= 0.5


def test_q210_phrase_search_matches_text_scan(spark):
    """Every reported doc must actually contain the adjacent phrase, at
    the reported position, the reported number of times."""
    import re

    from aws_datalake_platform_spark.catalog import load_table

    rows = {
        r["doc_id"]: r
        for r in QUERY_REGISTRY["q210_phrase_search"].fn(spark, SF_SMOKE).collect()
    }
    assert rows  # vacuity
    texts = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, SF_SMOKE, "documents")
        .select("doc_id", "text")
        .collect()
    }
    for did, r in rows.items():
        toks = re.split(r"\s+", texts[did].strip().lower())
        occ = [i + 1 for i in range(len(toks) - 1)
               if toks[i] == "spark" and toks[i + 1] == "window"]
        assert r["n_occurrences"] == len(occ) and occ
        assert r["first_pos"] == occ[0]
    # completeness: no phrase-bearing doc is missing
    for did, text in texts.items():
        toks = re.split(r"\s+", text.strip().lower())
        if any(toks[i] == "spark" and toks[i + 1] == "window"
               for i in range(len(toks) - 1)):
            assert did in rows


def test_q211_woe_partitions_and_signs(spark):
    """Counts must partition orders; WOE sign must match whether the
    category's bad-rate exceeds the global bad-rate."""
    from aws_datalake_platform_spark.catalog import load_table

    rows = QUERY_REGISTRY["q211_woe_iv"].fn(spark, SF_SMOKE).collect()
    orders = load_table(spark, SF_SMOKE, "orders")
    assert sum(r["n_good"] + r["n_bad"] for r in rows) == orders.count()
    tb = sum(r["n_bad"] for r in rows)
    tg = sum(r["n_good"] for r in rows)
    for r in rows:
        expected_sign = (r["n_bad"] / tb) - (r["n_good"] / tg)
        if abs(expected_sign) > 1e-9:
            assert (r["woe"] > 0) == (expected_sign > 0), r
        assert r["iv_term"] >= -1e-6  # (a-b)*ln(a/b) >= 0 up to rounding


def test_q212_target_encoding_leaves_fold_out(spark):
    """Each (category, fold) encoding must equal the category's target
    mean computed over the OTHER folds only."""
    from pyspark.sql import functions as F

    from aws_datalake_platform_spark.catalog import load_table

    rows = QUERY_REGISTRY["q212_target_encoding"].fn(spark, SF_SMOKE).collect()
    orders = load_table(spark, SF_SMOKE, "orders").select(
        "o_orderpriority",
        (F.col("o_orderkey") % 3).cast("int").alias("fold"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("y"),
    )
    raw = orders.groupBy("o_orderpriority", "fold").agg(
        F.sum("y").alias("s"), F.count(F.lit(1)).alias("c")
    ).collect()
    sums = {}
    for r in raw:
        sums.setdefault(r["o_orderpriority"], {})[r["fold"]] = (r["s"], r["c"])
    assert len(rows) == len(sums) * 3
    import math

    for r in rows:
        other = [v for f, v in sums[r["o_orderpriority"]].items() if f != r["fold"]]
        s = sum(x[0] for x in other)
        c = sum(x[1] for x in other)
        want = math.floor(s / c * 1e6 + 0.5) / 1e6
        assert r["encoded"] == want, (r, want)
        assert r["n_rows"] == sums[r["o_orderpriority"]][r["fold"]][1]


def test_q213_drift_shape_and_cosine_bounds(spark):
    rows = sorted(
        QUERY_REGISTRY["q213_embedding_drift"].fn(spark, SF_SMOKE).collect(),
        key=lambda r: r["rank"],
    )
    assert len(rows) == 10 and [r["rank"] for r in rows] == list(range(1, 11))
    shifts = [r["shift"] for r in rows]
    assert shifts == sorted(shifts, reverse=True)
    cos = rows[0]["cos_shift"]
    assert all(r["cos_shift"] == cos for r in rows)
    assert -1.0 <= cos <= 1.0
    for r in rows:
        assert r["shift"] == abs(r["sum_new"] - r["sum_old"])
        assert 1 <= r["pos"] <= 64


def test_q214_histogram_partitions_corpus(spark):
    """Histogram rows (including the singleton row) must partition the
    corpus: sum(n_docs) == |documents|, n_docs == size * n_clusters for
    multi-doc clusters, and no cluster size below 2 except the
    singleton row."""
    from aws_datalake_platform_spark.catalog import load_table

    rows = QUERY_REGISTRY["q214_dup_cluster_histogram"].fn(spark, SF_SMOKE).collect()
    n_docs_total = load_table(spark, SF_SMOKE, "documents").count()
    assert sum(r["n_docs"] for r in rows) == n_docs_total
    for r in rows:
        if r["cluster_size"] == 1:
            assert r["n_docs"] == r["n_clusters"]
        else:
            assert r["cluster_size"] >= 2
            assert r["n_docs"] == r["cluster_size"] * r["n_clusters"]


def test_q215_noise_is_seeded_laplace(spark):
    """Noisy counts must differ from true counts by reproducible
    Laplace noise recomputed from the md5-derived uniform in Python."""
    import hashlib
    import math

    rows = QUERY_REGISTRY["q215_dp_noisy_counts"].fn(spark, SF_SMOKE).collect()
    assert {r["event_type"] for r in rows} == {
        "click", "view", "purchase", "signup", "error"
    }
    for r in rows:
        h = hashlib.md5(f"dp42{r['event_type']}".encode()).hexdigest()
        u = int(h[:13], 16) / float(16**13)
        noise = -1.0 * math.copysign(1.0, u - 0.5) * math.log(
            max(1e-15, 1 - 2 * abs(u - 0.5))
        ) if u != 0.5 else 0.0
        want = math.floor((r["n_true"] + noise) * 1e4 + 0.5) / 1e4
        assert r["n_noisy"] == want, (r, want)


def test_q216_attribution_partitions_purchases(spark):
    """Attributed purchase counts/revenue must partition all purchases,
    and every touch_type must be a real touch or 'none'."""
    from pyspark.sql import functions as F

    from aws_datalake_platform_spark.catalog import load_table

    rows = QUERY_REGISTRY["q216_touch_attribution"].fn(spark, SF_SMOKE).collect()
    ev = load_table(spark, SF_SMOKE, "events")
    purchases = ev.filter(F.col("event_type") == "purchase")
    assert sum(r["n_purchases"] for r in rows) == purchases.count()
    assert {r["touch_type"] for r in rows} <= {"click", "view", "none"}
    want_total = (
        purchases.select(
            F.floor(F.col("value") * 10_000 + 0.5).cast("long").alias("q")
        ).agg(F.sum("q")).first()[0] / 1e4
    )
    assert abs(sum(r["total_value"] for r in rows) - want_total) < 1e-6


def test_q217_bounce_invariants(spark):
    """Sessions partition into bounces and non-bounces; total sessions
    across days must match q36's session count."""
    rows = QUERY_REGISTRY["q217_session_bounce"].fn(spark, SF_SMOKE).collect()
    assert rows
    n_sessions_q36 = QUERY_REGISTRY["q36_sessionize"].fn(spark, SF_SMOKE).count()
    assert sum(r["n_sessions"] for r in rows) == n_sessions_q36
    for r in rows:
        assert 0 <= r["n_bounces"] <= r["n_sessions"]
        assert 0.0 <= r["bounce_rate"] <= 1.0


def test_q218_pct_rank_is_uniform_within_source(spark):
    """Within every source the percent ranks must be the exact lattice
    {0, 1/(n-1), ..., 1} (ties broken by doc_id make ranks unique)."""
    import math

    rows = QUERY_REGISTRY["q218_quantile_normalization"].fn(spark, SF_SMOKE).collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(r["pct_rank"])
    for src, pr in by_src.items():
        n = len(pr)
        if n == 1:
            assert pr == [0.5]
            continue
        want = sorted(math.floor(i / (n - 1) * 1e6 + 0.5) / 1e6 for i in range(n))
        assert sorted(pr) == want, src


def test_q219_oov_partition_and_bounds(spark):
    """OOV tokens are a subset of held-out tokens; rate in [0,1]; the
    summed per-source token count matches a direct recount of the
    held-out split."""
    rows = QUERY_REGISTRY["q219_vocab_oov_coverage"].fn(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_oov"] <= r["n_tokens"]
        assert 0 <= r["n_oov_types"] <= r["n_oov"] or r["n_oov"] == 0
        assert 0.0 <= r["oov_rate"] <= 1.0
    from aws_datalake_platform_spark.catalog import load_table

    docs = load_table(spark, SF_SMOKE, "documents")
    want = (
        docs.filter(F.col("doc_id") % 5 == 0)
        .select(
            F.explode(
                F.filter(F.split(F.lower("text"), "[^a-z]+"), lambda t: t != "")
            ).alias("tk")
        )
        .count()
    )
    assert sum(r["n_tokens"] for r in rows) == want


def test_q220_df_occ_ordering(spark):
    """Every inventory row has occ >= df >= 1 and the listing is the
    true top by (df, occ, gram)."""
    rows = QUERY_REGISTRY["q220_duplicate_ngrams"].fn(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r["occ"] >= r["df"] >= 1
    keys = [(-r["df"], -r["occ"], r["gram"]) for r in rows]
    assert keys == sorted(keys)


def test_q221_curve_monotone_and_q23_consistent(spark):
    """Both cumulative counts are non-increasing in the threshold, and
    the 0.5 point agrees with q23's pair relation (the integer-bucket
    boundary (i*10) DIV u >= 5 is exactly j >= 0.5)."""
    rows = {
        r["thr"]: r
        for r in QUERY_REGISTRY["q221_dedup_threshold_curve"].fn(spark, SF_SMOKE).collect()
    }
    assert len(rows) == 10
    thrs = sorted(rows)
    for lo, hi in zip(thrs, thrs[1:]):
        assert rows[lo]["n_pairs_ge"] >= rows[hi]["n_pairs_ge"]
        assert rows[lo]["n_docs_ge"] >= rows[hi]["n_docs_ge"]
    q23 = QUERY_REGISTRY["q23_ngram_jaccard_dedup"].fn(spark, SF_SMOKE)
    assert rows[0.5]["n_pairs_ge"] == q23.count()
    docs_in_pairs = (
        q23.select(F.col("doc_a").alias("d"))
        .unionAll(q23.select(F.col("doc_b").alias("d")))
        .distinct()
        .count()
    )
    assert rows[0.5]["n_docs_ge"] == docs_in_pairs


def test_q222_skew_profile_invariants(spark):
    """Ranks are dense from 1, shares are consistent (cum is a running
    sum, hot_factor = share * k), and the top key really is the hottest."""
    from aws_datalake_platform_spark.catalog import load_table

    rows = sorted(
        QUERY_REGISTRY["q222_key_skew_profile"].fn(spark, SF_SMOKE).collect(),
        key=lambda r: r["rk"],
    )
    assert rows and [r["rk"] for r in rows] == list(range(1, len(rows) + 1))
    counts = [r["n_rows"] for r in rows]
    assert counts == sorted(counts, reverse=True)
    ev = load_table(spark, SF_SMOKE, "events")
    per_key = ev.groupBy("user_id").count()
    true_max = per_key.agg(F.max("count")).first()[0]
    assert rows[0]["n_rows"] == true_max
    k = per_key.count()
    for r in rows:
        assert r["cum_share"] >= r["share"] - 1e-9
        assert abs(r["hot_factor"] - r["share"] * k) < k * 1e-6 + 1e-6


def test_q223_dim_stats_bounds(spark):
    """64 dims, every dim sees every vector, min <= mean <= max,
    std >= 0, and dim 1's mean matches a direct quantized recount."""
    from aws_datalake_platform_spark.catalog import load_table

    rows = QUERY_REGISTRY["q223_embedding_dim_stats"].fn(spark, SF_SMOKE).collect()
    assert len(rows) == 64
    n_vec = load_table(spark, SF_SMOKE, "embeddings").count()
    for r in rows:
        assert r["n"] == n_vec
        assert r["min_v"] <= r["mean"] <= r["max_v"]
        assert r["std"] >= 0.0
    import math

    emb = load_table(spark, SF_SMOKE, "embeddings")
    s1 = (
        emb.select(
            F.floor(F.col("embedding")[0].cast("double") * 1_000_000 + 0.5)
            .cast("long")
            .alias("q6")
        )
        .agg(F.sum("q6"))
        .first()[0]
    )
    want_mean = math.floor(s1 / n_vec + 0.5) / 1_000_000
    got = {r["dim"]: r["mean"] for r in rows}[1]
    assert got == want_mean


def test_q224_ewma_matches_python_fold(spark):
    """EWMA must equal the in-order Python fold over each key's last-32
    readings; deviation = last - ewma (pre-quantization); convexity
    keeps ewma inside [min, max] of the folded values."""
    import math

    from aws_datalake_platform_spark.catalog import load_table

    rows = {r["user_id"]: r
            for r in QUERY_REGISTRY["q224_ewma_deviation"].fn(spark, SF_SMOKE).collect()}
    assert rows
    ev = (
        load_table(spark, SF_SMOKE, "events")
        .select("user_id", "ts", "event_id", "value")
        .collect()
    )
    series = {}
    for e in ev:
        series.setdefault(e["user_id"], []).append((e["ts"], e["event_id"], e["value"]))
    assert set(rows) == set(series)
    for uid, evs in series.items():
        vals = [v for _, _, v in sorted(evs)][-32:]
        acc = vals[0]
        for x in vals[1:]:
            acc = acc * 0.75 + x * 0.25
        r = rows[uid]
        assert r["n_used"] == len(vals)
        assert r["ewma"] == math.floor(acc * 1e6 + 0.5) / 1e6
        assert r["deviation"] == math.floor((vals[-1] - acc) * 1e6 + 0.5) / 1e6
        assert min(vals) - 1e-9 <= r["ewma"] <= max(vals) + 1e-9


def test_q225_audit_consistent_with_q23_q24(spark):
    """The audit's three counts must equal direct counts of the two pair
    relations and their intersection; rates follow from the counts."""
    import math

    [r] = QUERY_REGISTRY["q225_lsh_dedup_audit"].fn(spark, SF_SMOKE).collect()
    q23 = QUERY_REGISTRY["q23_ngram_jaccard_dedup"].fn(spark, SF_SMOKE).select("doc_a", "doc_b")
    q24 = QUERY_REGISTRY["q24_minhash_lsh_dedup"].fn(spark, SF_SMOKE).select("doc_a", "doc_b")
    n_true, n_cand = q23.count(), q24.count()
    n_hit = q24.join(q23, ["doc_a", "doc_b"]).count()
    assert (r["n_true"], r["n_cand"], r["n_hit"]) == (n_true, n_cand, n_hit)
    assert r["n_hit"] <= min(r["n_cand"], r["n_true"])
    assert r["prec"] == (1.0 if not n_cand else math.floor(n_hit / n_cand * 1e6 + 0.5) / 1e6)
    assert r["recall"] == (1.0 if not n_true else math.floor(n_hit / n_true * 1e6 + 0.5) / 1e6)
    assert n_true > 0  # vacuity: the truth relation fires at test scale


def test_q226_mix_plan_invariants(spark):
    """Candidates must equal the exact-dedup keep count; sampling is a
    subset; achieved rate tracks the target within a binomial band; all
    four target rates appear across the 20 sources."""
    from aws_datalake_platform_spark.catalog import load_table
    from aws_datalake_platform_spark.operators.dedup import exact_dedup

    rows = QUERY_REGISTRY["q226_epoch_mix_plan"].fn(spark, SF_SMOKE).collect()
    docs = load_table(spark, SF_SMOKE, "documents")
    assert sum(r["n_candidates"] for r in rows) == exact_dedup(
        docs, "doc_id", "text"
    ).count()
    assert {r["target_rate"] for r in rows} == {0.25, 0.5, 0.75, 1.0}
    for r in rows:
        assert 0 <= r["n_sampled"] <= r["n_candidates"]
        assert r["tok_sampled"] >= 0
        if r["target_rate"] == 1.0:
            assert r["n_sampled"] == r["n_candidates"]
        # 4-sigma binomial band around the target rate
        import math

        n, p = r["n_candidates"], r["target_rate"]
        sigma = math.sqrt(p * (1 - p) / n) if n else 0.0
        assert abs(r["achieved_rate"] - p) <= 4 * sigma + 1e-9


def test_q227_leakage_pairs_cross_split(spark):
    """Every leaked pair must have the train doc in the train split and
    the held doc in the held split, at q23's threshold; the count must
    equal q23's cross-split subset."""
    rows = QUERY_REGISTRY["q227_split_leakage"].fn(spark, SF_SMOKE).collect()
    assert rows  # vacuity: leakage must exist at test scale
    for r in rows:
        assert r["doc_train"] % 5 != 0
        assert r["doc_held"] % 5 == 0
        assert r["jaccard"] >= 0.5
    q23 = QUERY_REGISTRY["q23_ngram_jaccard_dedup"].fn(spark, SF_SMOKE)
    want = q23.filter(
        (F.col("doc_a") % 5 == 0) != (F.col("doc_b") % 5 == 0)
    ).count()
    assert len(rows) == want


def test_q228_balanced_sample_counts(spark):
    """Counts partition the events; the kept-negative count hits the
    target balance within a 4-sigma binomial band."""
    import math

    from aws_datalake_platform_spark.catalog import load_table

    [r] = QUERY_REGISTRY["q228_class_balanced_sample"].fn(spark, SF_SMOKE).collect()
    n_events = load_table(spark, SF_SMOKE, "events").count()
    assert r["n_pos"] + r["n_neg"] == n_events
    assert 0 <= r["n_neg_kept"] <= r["n_neg"]
    p = min(1.0, r["n_pos"] / r["n_neg"])
    sigma = math.sqrt(r["n_neg"] * p * (1 - p))
    assert abs(r["n_neg_kept"] - r["n_neg"] * p) <= 4 * sigma + 1e-9


def test_q229_feature_frame_windows(spark):
    """lag1 is null exactly on each customer's first month; avg3 lies
    within [min, max] of the trailing 3 months; one customer's frame
    matches a Python recomputation."""
    import math

    rows = QUERY_REGISTRY["q229_customer_feature_frame"].fn(spark, SF_SMOKE).collect()
    assert rows
    by_c = {}
    for r in rows:
        by_c.setdefault(r["custkey"], []).append(r)
    for ck, rs in by_c.items():
        rs.sort(key=lambda r: r["month"])
        assert rs[0]["lag1_cents"] is None
        for i, r in enumerate(rs):
            if i:
                assert r["lag1_cents"] == rs[i - 1]["m_cents"]
            tail = [x["m_cents"] for x in rs[max(0, i - 2): i + 1]]
            assert min(tail) <= r["avg3_cents"] <= max(tail)
            assert r["avg3_cents"] == math.floor(sum(tail) / len(tail) + 0.5)


def test_q230_bt_strengths_valid(spark):
    """Strengths form a normalized distribution; rank follows the
    rounded strength with the event_type tie-break; every type with a
    decisive comparison is rated."""
    rows = QUERY_REGISTRY["q230_bt_preference"].fn(spark, SF_SMOKE).collect()
    assert len(rows) >= 2
    assert abs(sum(r["bt_strength"] for r in rows) - 1.0) < 1e-3
    by_rank = sorted(rows, key=lambda r: r["rank"])
    assert [r["rank"] for r in by_rank] == list(range(1, len(rows) + 1))
    resorted = sorted(rows, key=lambda r: (-r["bt_strength"], r["event_type"]))
    assert [r["event_type"] for r in resorted] == [
        r["event_type"] for r in by_rank
    ]
    for r in rows:
        assert 0 <= r["wins"] <= r["n_comparisons"]


def test_q231_kappa_from_counts(spark):
    """Kappa recomputed from the confusion counts in Python matches the
    engine's value; counts partition the joined docs."""
    [r] = (
        QUERY_REGISTRY["q231_quality_gate_agreement"].fn(spark, SF_SMOKE).collect()
    )
    n = r["n_docs"]
    assert (
        r["n_both_pass"] + r["n_rule_only"] + r["n_lm_only"] + r["n_both_fail"]
        == n
    )
    po = (r["n_both_pass"] + r["n_both_fail"]) / n
    pa = (r["n_both_pass"] + r["n_rule_only"]) / n
    pb = (r["n_both_pass"] + r["n_lm_only"]) / n
    pe = pa * pb + (1 - pa) * (1 - pb)
    import math

    assert r["po"] == math.floor(po * 1e6 + 0.5) / 1e6
    assert abs(r["kappa"] - (po - pe) / (1 - pe)) < 1e-5
    assert -1.0 <= r["kappa"] <= 1.0
    # non-vacuous: both classifiers disagree somewhere and agree somewhere
    assert r["n_both_pass"] > 0 and (r["n_rule_only"] + r["n_lm_only"]) > 0


def test_q232_memorization_one_doc_brute(spark):
    """One document's score matches a pure-Python recomputation over
    the raw corpus text."""
    import re
    from collections import defaultdict

    from aws_datalake_platform_spark.catalog import load_table

    rows = QUERY_REGISTRY["q232_doc_memorization_score"].fn(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_shared"] <= r["n_grams"]
        assert 0.0 <= r["memorization_score"] <= 1.0
    docs = {
        d["doc_id"]: d["text"]
        for d in load_table(spark, SF_SMOKE, "documents").collect()
    }
    gram_docs = defaultdict(set)
    per_doc = defaultdict(list)
    for did, text in docs.items():
        toks = [t for t in re.split("[^a-z]+", (text or "").lower()) if t]
        for i in range(len(toks) - 4):
            g = " ".join(toks[i : i + 5])
            gram_docs[g].add(did)
            per_doc[did].append(g)
    target = rows[0]
    grams = per_doc[target["doc_id"]]
    shared = sum(1 for g in grams if len(gram_docs[g]) >= 2)
    assert target["n_grams"] == len(grams)
    assert target["n_shared"] == shared


def test_q233_stages_partition_ordered(spark):
    """All 10 stages exist, sizes differ by at most one (NTILE), and
    difficulty ranges are non-decreasing across stages."""
    rows = sorted(
        QUERY_REGISTRY["q233_curriculum_buckets"].fn(spark, SF_SMOKE).collect(),
        key=lambda r: r["stage"],
    )
    assert [r["stage"] for r in rows] == list(range(1, 11))
    sizes = [r["n_docs"] for r in rows]
    assert max(sizes) - min(sizes) <= 1
    for prev, cur in zip(rows, rows[1:]):
        assert cur["min_oov_rate"] >= prev["max_oov_rate"] - 1e-12
    for r in rows:
        assert r["min_oov_rate"] <= r["avg_oov_rate"] <= r["max_oov_rate"]


def test_q234_reweight_monotone(spark):
    """Both weight vectors normalize; the zero-excess source is the
    min-NLL source; the multiplicative update w1/w0 is strictly
    increasing in excess loss."""
    rows = QUERY_REGISTRY["q234_domain_reweight"].fn(spark, SF_SMOKE).collect()
    assert len(rows) >= 2
    assert abs(sum(r["w0"] for r in rows) - 1.0) < 1e-3
    assert abs(sum(r["w1"] for r in rows) - 1.0) < 1e-3
    zero = [r for r in rows if r["excess_nll"] == 0.0]
    assert zero and min(rows, key=lambda r: r["nll"])["nll"] == zero[0]["nll"]
    by_exc = sorted(rows, key=lambda r: r["excess_nll"])
    ratios = [r["w1"] / r["w0"] for r in by_exc]
    for a, b, ra, rb in zip(by_exc, by_exc[1:], ratios, ratios[1:]):
        if b["excess_nll"] > a["excess_nll"]:
            assert rb > ra


def test_q235_ndcg_bounds(spark):
    """nDCG lies in (0, 1], DCG never exceeds the ideal DCG, and the
    per-term candidate set is the ranker's top-10."""
    rows = QUERY_REGISTRY["q235_ndcg_ranking_eval"].fn(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert 0.0 < r["ndcg"] <= 1.0
        assert r["dcg"] <= r["idcg"] + 1e-9
        assert 0 <= r["n_highly_rel"] <= 10


def test_q236_planner_matches_python_convolution(spark):
    """The per-config expectation matches a pure-Python convolution of
    q221's histogram with the banding S-curve; recall and junk rate are
    both monotone in rows-per-band."""
    import math

    rows = QUERY_REGISTRY["q236_lsh_parameter_plan"].fn(spark, SF_SMOKE).collect()
    assert len(rows) == 8
    curve = sorted(
        QUERY_REGISTRY["q221_dedup_threshold_curve"].fn(spark, SF_SMOKE).collect(),
        key=lambda r: r["thr"],
    )
    hist = []
    for i, c in enumerate(curve):
        nxt = curve[i + 1]["n_pairs_ge"] if i + 1 < len(curve) else 0
        hist.append((c["thr"], c["n_pairs_ge"] - nxt))
    by_r = sorted(rows, key=lambda r: r["n_rows_per_band"])
    for row in rows:
        b, r = row["n_bands"], row["n_rows_per_band"]
        assert b * r == 128
        det_u = 0
        for thr, n in hist:
            p = 1 - math.exp(b * math.log(1 - math.exp(r * math.log(thr + 0.05))))
            det_u += math.floor(n * p * 1e6 + 0.5)
        assert row["exp_detected_pairs"] == math.floor(det_u / 1e6 * 100 + 0.5) / 100
        assert 0.0 <= row["recall_ge05"] <= 1.0
        assert 0.0 <= row["fp_rate_lt03"] <= 1.0
    for a, c in zip(by_r, by_r[1:]):  # more rows/band = stricter
        assert c["recall_ge05"] <= a["recall_ge05"] + 1e-9
        assert c["fp_rate_lt03"] <= a["fp_rate_lt03"] + 1e-9
        assert c["approx_threshold"] >= a["approx_threshold"] - 1e-9


def test_q237_kmv_estimates_track_exact_overlap(spark):
    """KMV estimates must track q195's exact matrix: per-pair Jaccard
    error bounded by the k=256 sketch std-err band, union estimate
    within 25% of the true distinct-union size, and the intersection
    estimate consistent with rho * est_union."""
    import math

    rows = QUERY_REGISTRY["q237_kmv_source_overlap"].fn(spark, SF_SMOKE).collect()
    n_src = (1 + math.isqrt(1 + 8 * len(rows))) // 2
    assert len(rows) == n_src * (n_src - 1) // 2  # every pair, overlap or not
    for r in rows:
        assert r["abs_err"] <= 0.08  # ~5 sigma at k=256
        assert r["n_union"] > 0
        assert abs(r["est_union"] - r["n_union"]) / r["n_union"] <= 0.25
        rho = r["jaccard_est"]
        assert abs(r["est_inter"] - rho * r["est_union"]) <= r["est_union"] * 1e-5 + 1.0
        if r["n_shared"] == 0:
            assert r["jaccard_exact"] == 0.0
    errs = [r["abs_err"] for r in rows]
    assert sum(errs) / len(errs) <= 0.02  # mean error well inside 1 sigma


def test_q238_nprobe_curve_monotone_and_exact_at_full_probe(spark):
    """Recall and cost must be non-decreasing in n_probe; probing all 16
    lists IS brute force, so recall hits 1.0 and the scan fraction ~1
    (probed lists cover the whole corpus)."""
    rows = sorted(
        QUERY_REGISTRY["q238_ivf_nprobe_plan"].fn(spark, SF_SMOKE).collect(),
        key=lambda r: r["n_probe"],
    )
    assert [r["n_probe"] for r in rows] == [1, 2, 4, 8, 16]
    for a, b in zip(rows, rows[1:]):
        assert b["recall_at5"] >= a["recall_at5"] - 1e-9
        assert b["avg_candidates"] >= a["avg_candidates"]
        assert b["cost_fraction"] >= a["cost_fraction"]
    full = rows[-1]
    assert full["recall_at5"] == 1.0 and full["n_hits"] == 50
    assert abs(full["cost_fraction"] - 1.0) < 1e-6
    assert rows[0]["cost_fraction"] < 0.5  # p=1 must actually prune


def test_q239_calibration_matches_python(spark):
    """Bucket stats must equal a pure-Python recomputation from the two
    component queries, and every probability column stays in [0,1]."""
    rows = QUERY_REGISTRY["q239_calibration_brier"].fn(spark, SF_SMOKE).collect()
    m = {
        r["doc_id"]: int(r["quality_score"] * 10000 + 0.5)
        for r in QUERY_REGISTRY["q173_quality_logreg"].fn(spark, SF_SMOKE).collect()
    }
    g = {
        r["doc_id"]: int(bool(r["passes"]))
        for r in QUERY_REGISTRY["q192_gopher_quality_rules"].fn(spark, SF_SMOKE).collect()
    }
    import math
    from collections import defaultdict

    agg = defaultdict(lambda: [0, 0, 0, 0])  # n, sum_u, n_pass, sq
    for d, su in m.items():
        if d not in g:
            continue
        b = min(su // 1000, 9)
        a = agg[b]
        a[0] += 1
        a[1] += su
        a[2] += g[d]
        a[3] += (su - g[d] * 10000) ** 2
    assert {r["bucket"] for r in rows} == set(agg)
    for r in rows:
        n, su, npass, sq = agg[r["bucket"]]
        assert r["n_docs"] == n
        assert r["avg_pred"] == math.floor(su / (10000.0 * n) * 1e6 + 0.5) / 1e6
        assert r["obs_rate"] == math.floor(npass * 1.0 / n * 1e6 + 0.5) / 1e6
        assert r["brier"] == math.floor(sq / (1e8 * n) * 1e6 + 0.5) / 1e6
        assert 0.0 <= r["avg_pred"] <= 1.0 and 0.0 <= r["obs_rate"] <= 1.0
        assert 0.0 <= r["brier"] <= 1.0


def test_q240_auc_matches_sklearn_free_reference(spark):
    """The histogram rank-sum AUC must equal the O(n^2) pairwise
    definition (ties count half) computed in Python."""
    [r] = QUERY_REGISTRY["q240_roc_auc"].fn(spark, SF_SMOKE).collect()
    m = {
        x["doc_id"]: int(x["quality_score"] * 10000 + 0.5)
        for x in QUERY_REGISTRY["q173_quality_logreg"].fn(spark, SF_SMOKE).collect()
    }
    g = {
        x["doc_id"]: bool(x["passes"])
        for x in QUERY_REGISTRY["q192_gopher_quality_rules"].fn(spark, SF_SMOKE).collect()
    }
    pos = [m[d] for d in m if d in g and g[d]]
    neg = [m[d] for d in m if d in g and not g[d]]
    assert r["n_pos"] == len(pos) and r["n_neg"] == len(neg)
    wins = sum((p > q) + 0.5 * (p == q) for p in pos for q in neg)
    import math

    expected = math.floor(wins / (len(pos) * len(neg)) * 1e6 + 0.5) / 1e6
    assert abs(r["auc"] - expected) <= 2e-6
    assert abs(r["gini"] - (2 * r["auc"] - 1)) <= 3e-6
    assert 0.5 < r["auc"] <= 1.0  # the model must beat coin-flip on its own gate


def test_q241_entropy_bounds_and_composition(spark):
    """Per-state entropy is bounded by log2(n_next_states); the modal
    probability and entropy move inversely; transition totals add up to
    the number of non-terminal events."""
    import math

    rows = QUERY_REGISTRY["q241_transition_entropy"].fn(spark, SF_SMOKE).collect()
    assert len(rows) >= 2
    for r in rows:
        cap = math.log2(r["n_next_states"]) if r["n_next_states"] > 1 else 0.0
        assert -1e-6 <= r["entropy_bits"] <= cap + 1e-4
        if r["n_next_states"] > 1:
            assert 0.0 <= r["norm_entropy"] <= 1.0 + 1e-6
        assert 1.0 / r["n_next_states"] - 1e-6 <= r["top_next_p"] <= 1.0


def test_q242_confusion_rows_partition_each_lang(spark):
    """Cell fractions within each stored language must sum to ~1, cell
    counts to the language total, and is_match only on the diagonal."""
    rows = QUERY_REGISTRY["q242_lang_confusion"].fn(spark, SF_SMOKE).collect()
    from collections import defaultdict

    frac = defaultdict(float)
    for r in rows:
        frac[r["lang"]] += r["frac_of_lang"]
        assert r["is_match"] == (r["lang"] == r["lang_pred"])
        assert r["n_docs"] > 0
    for lang, total in frac.items():
        assert abs(total - 1.0) < 1e-4, (lang, total)


def test_q243_golden_record_survivorship_rules(spark):
    """The canonical doc must be the longest member (ties to smallest
    id), the majority lang the modal one (ties alphabetical), and the
    aggregates must match a Python recompute from q68 + documents."""
    rows = {
        r["cluster_id"]: r
        for r in QUERY_REGISTRY["q243_golden_record"].fn(spark, SF_SMOKE).collect()
    }
    assert rows
    cl = QUERY_REGISTRY["q68_dup_clusters"].fn(spark, SF_SMOKE).collect()
    docs = {
        d["doc_id"]: d
        for d in spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .select("doc_id", "source", "lang", "n_chars")
        .collect()
    }
    from collections import defaultdict

    members = defaultdict(list)
    for c in cl:
        members[c["cluster_id"]].append(docs[c["doc_id"]])
    assert set(rows) == set(members)
    for cid, ms in members.items():
        r = rows[cid]
        best = min(ms, key=lambda d: (-d["n_chars"], d["doc_id"]))
        assert r["canonical_doc"] == best["doc_id"]
        assert r["canonical_source"] == best["source"]
        langs = defaultdict(int)
        for d in ms:
            langs[d["lang"]] += 1
        assert r["majority_lang"] == min(langs, key=lambda L: (-langs[L], L))
        assert r["n_members"] == len(ms)
        assert r["n_sources"] == len({d["source"] for d in ms})
        assert r["total_chars"] == sum(d["n_chars"] for d in ms)


def test_q244_fertility_sane_and_consistent(spark):
    """Fertility (BPE tokens per word) must be >= 1 on this corpus and
    the totals must add up across languages to the q26 totals."""
    rows = QUERY_REGISTRY["q244_fertility_rollup"].fn(spark, SF_SMOKE).collect()
    assert len(rows) >= 2
    for r in rows:
        assert r["fertility"] >= 1.0
        assert 1.0 <= r["chars_per_token"] <= 20.0
    s = QUERY_REGISTRY["q26_text_stats"].fn(spark, SF_SMOKE).collect()
    assert sum(r["total_words"] for r in rows) == sum(
        x["n_tokens"] for x in s if x["n_tokens"] > 0
    )


def test_q245_chi2_matches_python(spark):
    """The chi-square statistic must match a from-scratch Python
    recompute (same quantization) and Cramer's V must be sqrt(chi2/n)
    for the 2-column case."""
    import math
    from collections import defaultdict

    [r] = QUERY_REGISTRY["q245_source_quality_chi2"].fn(spark, SF_SMOKE).collect()
    g = {
        x["doc_id"]: int(bool(x["passes"]))
        for x in QUERY_REGISTRY["q192_gopher_quality_rules"].fn(spark, SF_SMOKE).collect()
    }
    src = {
        d["doc_id"]: d["source"]
        for d in spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .select("doc_id", "source")
        .collect()
    }
    o = defaultdict(int)
    rs = defaultdict(int)
    cs = defaultdict(int)
    n = 0
    for d, p in g.items():
        o[(src[d], p)] += 1
        rs[src[d]] += 1
        cs[p] += 1
        n += 1
    su = 0
    for s_ in rs:
        for p in cs:
            e = rs[s_] * cs[p] * 1.0 / n
            su += math.floor((o[(s_, p)] * 1.0 - e) ** 2 / e * 1e6 + 0.5)
    assert r["n_docs"] == n
    assert r["dof"] == (len(rs) - 1) * (len(cs) - 1)
    assert r["chi2"] == math.floor(su / 1e6 * 1e6 + 0.5) / 1e6
    assert abs(r["cramers_v"] - math.sqrt(r["chi2"] / n)) < 2e-6


def test_q246_merge_invariance_holds_everywhere(spark):
    """Every source's merged half-sketch must equal its full-corpus
    sketch — the property that makes incremental sketch maintenance
    sound. Also sanity: full sketches are k=256 (corpora here exceed k)."""
    rows = QUERY_REGISTRY["q246_kmv_merge_invariance"].fn(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r["sketch_equal"] is True
        assert r["k_full"] == 256
        assert r["uk_full"] == r["uk_merged"]


def test_q247_bootstrap_matches_python_replicas(spark):
    """Every Poisson-weighted replicate mean recomputed in Python must
    yield the same order statistics; the CI must bracket the full mean
    with positive width."""
    import hashlib
    import math

    [r] = QUERY_REGISTRY["q247_bootstrap_ci"].fn(spark, SF_SMOKE).collect()
    docs = (
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .select("doc_id", "n_chars")
        .collect()
    )
    cdf = [
        0.36787944117144233, 0.7357588823428847, 0.9196986029286058,
        0.9810118431238463, 0.9963401531726563, 0.9994058151824183,
        0.999916758850712, 0.9999897508033253,
    ]
    means = []
    for b in range(64):
        wx = wn = 0
        for d in docs:
            hx = hashlib.md5(f"bs|{b}|{d['doc_id']}".encode()).hexdigest()
            u = (int(hx[:15], 16) + 1) / 1152921504606846976.0
            w = next((k for k, c in enumerate(cdf) if u < c), 8)
            wx += w * d["n_chars"]
            wn += w
        means.append(wx * 1.0 / wn)
    means.sort()
    assert r["n_rows"] == len(docs) and r["n_resamples"] == 64
    assert r["ci_lo"] == math.floor(means[1] * 1e6 + 0.5) / 1e6
    assert r["ci_hi"] == math.floor(means[62] * 1e6 + 0.5) / 1e6
    assert r["ci_lo"] <= r["mean_full"] <= r["ci_hi"]
    assert r["ci_width"] > 0


def test_q248_jackknife_identity(spark):
    """Leave-one-out means must satisfy (S - s_i)/(N - n_i) exactly, and
    a source longer than the corpus average must have positive
    influence (it pulls the mean up)."""
    rows = QUERY_REGISTRY["q248_jackknife_influence"].fn(spark, SF_SMOKE).collect()
    import math

    per = {r["source"]: r for r in rows}
    N = sum(r["n_docs"] for r in rows)
    # reconstruct exact sums from source means is lossy; recompute from data
    docs = (
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .select("source", "n_chars")
        .collect()
    )
    from collections import defaultdict

    s = defaultdict(int)
    n = defaultdict(int)
    for d in docs:
        s[d["source"]] += d["n_chars"]
        n[d["source"]] += 1
    S = sum(s.values())
    assert N == sum(n.values())
    mean = S / N
    for src, r in per.items():
        loo = (S - s[src]) / (N - n[src])
        assert r["loo_mean"] == math.floor(loo * 1e6 + 0.5) / 1e6
        assert abs(r["influence"] - (mean - loo)) < 2e-6
        if r["source_mean"] > mean + 1:
            assert r["influence"] > 0


def test_q249_conformal_coverage_near_target(spark):
    """Split-conformal guarantees coverage >= 0.9 in expectation over
    splits; on a fixed split assert it lands in a sane band and the
    radius is the exact calibration order statistic."""
    [r] = QUERY_REGISTRY["q249_conformal_interval"].fn(spark, SF_SMOKE).collect()
    assert r["n_train"] > 0 and r["n_cal"] > 0 and r["n_test"] > 0
    assert 0.80 <= r["coverage"] <= 1.0
    assert r["q_hat"] > 0
    assert r["slope"] > 0  # more words -> more chars, necessarily


def test_q250_power_identities(spark):
    """MDE must satisfy its closed form against q179's cohort counts,
    shrink like 1/sqrt(n), and the 5%-lift sample size must exceed the
    current arm size exactly when the relative MDE exceeds 5%."""
    import math

    [r] = QUERY_REGISTRY["q250_power_mde"].fn(spark, SF_SMOKE).collect()
    p = r["base_rate"]
    n_min = min(r["n_arm_a"], r["n_arm_b"])
    zz = 1.959963984540054 + 0.8416212335729143
    expect = zz * math.sqrt(2 * p * (1 - p) / n_min)
    assert abs(r["mde_abs"] - expect) < 1e-4
    assert abs(r["mde_rel"] - r["mde_abs"] / p) < 1e-3
    assert (r["n_per_arm_5pct_lift"] > n_min) == (r["mde_rel"] > 0.05)


def test_q251_heaps_growth_monotone_sublinear(spark):
    """Checkpoint words/vocab must be non-decreasing in the prefix, the
    fitted exponent must be sublinear (0 < beta < 1 for natural-ish
    text), and V(n) = K*n^beta must reproduce the observed endpoints
    within a loose band."""
    rows = sorted(
        QUERY_REGISTRY["q251_heaps_law_fit"].fn(spark, SF_SMOKE).collect(),
        key=lambda r: r["decile"],
    )
    assert [r["decile"] for r in rows] == list(range(1, 11))
    for a, b in zip(rows, rows[1:]):
        assert b["n_words"] >= a["n_words"] and b["vocab"] >= a["vocab"]
    beta, k = rows[0]["heaps_beta"], rows[0]["heaps_k"]
    assert 0.0 < beta < 1.0
    last = rows[-1]
    pred = k * last["n_words"] ** beta
    assert 0.5 * last["vocab"] <= pred <= 2.0 * last["vocab"]


def test_q252_zipf_slope_negative_power_law(spark):
    """Rank-frequency slope must be negative with a decent log-log fit
    on this corpus."""
    [r] = QUERY_REGISTRY["q252_zipf_fit"].fn(spark, SF_SMOKE).collect()
    assert r["n_terms"] > 10
    assert r["zipf_slope"] < -0.1
    assert 0.3 <= r["r2"] <= 1.0


def test_q253_snippets_contain_query_terms(spark):
    """Every returned snippet must contain at least n_terms distinct
    query terms within the window; results are ordered by snippet
    quality."""
    rows = QUERY_REGISTRY["q253_search_snippets"].fn(spark, SF_SMOKE).collect()
    assert 0 < len(rows) <= 10
    terms = {"table", "join", "query"}
    for r in rows:
        toks = r["snippet"].split(" ")
        assert len(toks) <= 10
        present = {t for t in toks if t in terms}
        assert len(present) == r["n_terms"]
        assert sum(1 for t in toks if t in terms) == r["n_matches"]
    keys = [(-r["n_terms"], -r["n_matches"], r["doc_id"]) for r in rows]
    assert keys == sorted(keys)


def test_q254_paths_share_and_conversion_bounds(spark):
    """Top paths are ordered by count, shares are positive and sum
    below 1 for a 15-row cut, and conversion probabilities live in
    [0,1]."""
    rows = QUERY_REGISTRY["q254_top_event_paths"].fn(spark, SF_SMOKE).collect()
    assert 0 < len(rows) <= 15
    ns = [r["n"] for r in rows]
    assert ns == sorted(ns, reverse=True)
    assert sum(r["share"] for r in rows) <= 1.0 + 1e-6
    for r in rows:
        assert r["path"].count(">") == 2
        assert r["p_next_purchase"] is None or 0.0 <= r["p_next_purchase"] <= 1.0


def test_q255_sampler_passes_uniformity(spark):
    """The seeded md5-uniform must pass both uniformity tests at the
    audit SF — this is the justification for every seeded-sampling
    query in the registry."""
    [r] = QUERY_REGISTRY["q255_sampler_uniformity"].fn(spark, SF_SMOKE).collect()
    assert r["n_samples"] > 0
    assert r["uniform_at_95"] is True
    assert r["dkw_at_95"] is True
    assert 0.0 <= r["d_max"] < 0.1


def test_ahash64_matches_python_grid_math(spark):
    """The Arrow-batched aHash must equal a from-scratch Python
    recompute of the 64-cell integer grid on raw payload bytes, and an
    identical payload must hash identically (hamming 0)."""
    from aws_datalake_platform_spark.operators.multimodal import (
        ahash64,
        attach_binary_payload,
    )

    docs = (
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .select("doc_id", "text")
        .filter("length(text) >= 64")
        .limit(5)
    )
    rows = {r["doc_id"]: r for r in ahash64(attach_binary_payload(docs)).collect()}
    for d in docs.collect():
        payload = d["text"].encode()
        n = len(payload)
        total = sum(payload)
        bits = []
        for j in range(64):
            lo, hi = n * j // 64, n * (j + 1) // 64
            cnt = hi - lo
            s = sum(payload[lo:hi])
            bits.append(1 if cnt > 0 and s * n > total * cnt else 0)
        h1 = sum(b << i for i, b in enumerate(bits[:32]))
        h2 = sum(b << i for i, b in enumerate(bits[32:]))
        bands = [
            sum(bits[8 * k + i] << i for i in range(8)) for k in range(8)
        ]
        r = rows[d["doc_id"]]
        assert (r["h1"], r["h2"]) == (h1, h2)
        assert list(r["bands"]) == bands


def test_q256_near_dup_pairs_ordered_and_bounded(spark):
    """Candidate pairs come out closest-first; hamming and shared-band
    counts live in their algebraic ranges; sharing b bands forces at
    least 8*b agreeing bits (hamming <= 64 - 8*n_shared)."""
    rows = QUERY_REGISTRY["q256_media_ahash_near_dup"].fn(spark, SF_SMOKE).collect()
    assert 0 < len(rows) <= 20
    hams = [r["hamming"] for r in rows]
    assert hams == sorted(hams)
    for r in rows:
        assert 0 <= r["hamming"] <= 64
        assert 1 <= r["n_shared_bands"] <= 8
        assert r["hamming"] <= 64 - 8 * r["n_shared_bands"]


def test_q257_rrf_identity_and_order(spark):
    """Fused score must equal 1/(60+r_lex) + 1/(60+r_sem) and rows come
    out fused-score-descending; both rank columns are positive and
    distinct within the result."""
    import math

    rows = QUERY_REGISTRY["q257_rrf_hybrid_rank"].fn(spark, SF_SMOKE).collect()
    assert 0 < len(rows) <= 10
    vals = []
    for r in rows:
        expect = 1.0 / (60 + r["bm25_rank"]) + 1.0 / (60 + r["sem_rank"])
        assert r["rrf"] == math.floor(expect * 1e6 + 0.5) / 1e6
        assert r["bm25_rank"] >= 1 and r["sem_rank"] >= 1
        vals.append(expect)
    assert vals == sorted(vals, reverse=True)
    assert len({r["bm25_rank"] for r in rows}) == len(rows)


def test_q258_negatives_exclude_near_dups(spark):
    """Every anchor gets at most K negatives, none of which appears in
    the q23 near-dup relation with its anchor; sample keys fall under
    the prefilter threshold and rank in key order."""
    rows = QUERY_REGISTRY["q258_contrastive_negatives"].fn(spark, SF_SMOKE).collect()
    assert rows
    nd = {
        frozenset((r["doc_a"], r["doc_b"]))
        for r in QUERY_REGISTRY["q23_ngram_jaccard_dedup"].fn(spark, SF_SMOKE).collect()
    }
    from collections import defaultdict

    per = defaultdict(list)
    for r in rows:
        assert frozenset((r["anchor_id"], r["neg_id"])) not in nd
        assert r["neg_id"] != r["anchor_id"]
        assert r["sample_key"] < 0.05 + 1e-6
        per[r["anchor_id"]].append((r["neg_rank"], r["sample_key"]))
    for a, lst in per.items():
        lst.sort()
        assert [x[0] for x in lst] == list(range(1, len(lst) + 1))
        assert len(lst) <= 4
        keys = [x[1] for x in lst]
        assert keys == sorted(keys)


def test_q259_cosine_matches_sklearn_free_recompute(spark):
    """Top pair cosines must match a from-scratch Python TF-IDF cosine
    (same quantization, same max_df guard) and be bounded by 1."""
    import math
    from collections import Counter, defaultdict

    rows = QUERY_REGISTRY["q259_tfidf_cosine_pairs"].fn(spark, SF_SMOKE).collect()
    assert 0 < len(rows) <= 20
    docs = (
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    )
    toks = {
        d["doc_id"]: d["text"].strip().lower().split()
        for d in docs
        if d["text"].strip()
    }
    N = len(toks)
    dfc = Counter()
    tfs = {}
    for d, ts in toks.items():
        c = Counter(ts)
        tfs[d] = c
        for t in c:
            dfc[t] += 1
    w = defaultdict(dict)
    for d, c in tfs.items():
        for t, tf in c.items():
            if dfc[t] / N <= 0.5:
                w[d][t] = math.floor(tf * math.log(N * 1.0 / dfc[t]) * 1000 + 0.5)
    for r in rows[:5]:
        wa, wb = w[r["doc_a"]], w[r["doc_b"]]
        shared = set(wa) & set(wb)
        assert len(shared) == r["n_shared_terms"]
        dp = sum(wa[t] * wb[t] for t in shared)
        na = math.sqrt(sum(v * v for v in wa.values()))
        nb = math.sqrt(sum(v * v for v in wb.values()))
        assert r["cosine"] == math.floor(dp / (na * nb) * 1e6 + 0.5) / 1e6
        assert 0.0 < r["cosine"] <= 1.0


def test_q260_budget_allocation_greedy_invariants(spark):
    """Allocations must respect per-source caps, exhaust the budget
    exactly (sum == floor(0.5*total) whenever caps allow), follow the
    quality ranking greedily (a partially-filled source implies every
    worse-ranked source got zero), and fully_taken must mean cap-level
    funding."""
    rows = sorted(
        QUERY_REGISTRY["q260_token_budget_plan"].fn(spark, SF_SMOKE).collect(),
        key=lambda r: r["quality_rank"],
    )
    assert rows
    total = sum(r["tokens_available"] for r in rows)
    budget = total // 2
    got = sum(r["allocated_tokens"] for r in rows)
    cap_sum = sum(r["cap_tokens"] for r in rows)
    assert got == min(budget, cap_sum)
    partial_seen = False
    for r in rows:
        assert 0 <= r["allocated_tokens"] <= r["cap_tokens"]
        assert r["cap_tokens"] == int(r["tokens_available"] * 0.8)
        assert r["fully_taken"] == (r["allocated_tokens"] == r["cap_tokens"])
        if partial_seen:
            assert r["allocated_tokens"] == 0
        if 0 < r["allocated_tokens"] < r["cap_tokens"]:
            partial_seen = True


def test_q261_rfm_segments_partition_customers(spark):
    """Segment counts must sum to the customer universe; segment codes
    decompose into valid quintiles; quintile-1 cells exist on every
    axis (NTILE always fills bucket 1)."""
    rows = QUERY_REGISTRY["q261_rfm_segmentation"].fn(spark, SF_SMOKE).collect()
    n_cust = (
        spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
        .select("o_custkey")
        .distinct()
        .count()
    )
    assert sum(r["n_customers"] for r in rows) == n_cust
    axes = {0: set(), 1: set(), 2: set()}
    for r in rows:
        s = r["segment"]
        rq, fq, mq = s // 100, (s // 10) % 10, s % 10
        for i, v in enumerate((rq, fq, mq)):
            assert 1 <= v <= 5
            axes[i].add(v)
        assert r["avg_recency_days"] >= 0 and r["avg_orders"] >= 1
    for i in axes:
        assert 1 in axes[i]


def test_q262_lift_matches_counts(spark):
    """Lift/support/confidence must satisfy their definitions against a
    Python recount of the basket relation for every returned pair."""
    import math
    from collections import Counter, defaultdict

    rows = QUERY_REGISTRY["q262_basket_lift"].fn(spark, SF_SMOKE).collect()
    assert rows
    li = (
        spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
        .select("l_orderkey", "l_partkey")
        .distinct()
        .collect()
    )
    orders = defaultdict(set)
    for r in li:
        orders[r["l_orderkey"]].add(r["l_partkey"])
    n = len(orders)
    c = Counter()
    cab = Counter()
    for parts in orders.values():
        for p in parts:
            c[p] += 1
        ps = sorted(parts)
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                cab[(ps[i], ps[j])] += 1
    for r in rows:
        k = (r["part_a"], r["part_b"])
        assert r["n_cooccur"] == cab[k]
        assert r["support"] == math.floor(cab[k] / n * 1e6 + 0.5) / 1e6
        assert r["confidence_ab"] == math.floor(
            cab[k] / c[r["part_a"]] * 1e6 + 0.5
        ) / 1e6
        lift = cab[k] * n / (c[r["part_a"]] * c[r["part_b"]])
        assert r["lift"] == math.floor(lift * 100 + 0.5) / 100
        assert r["lift"] >= 1.0  # top-15 by lift must be positive associations


def test_q263_ltv_monotone_within_cohort(spark):
    """Cumulative LTV must be non-decreasing in age within each cohort,
    ages stay within the first year, and at most 6 cohorts appear."""
    rows = QUERY_REGISTRY["q263_cohort_ltv"].fn(spark, SF_SMOKE).collect()
    assert rows
    from collections import defaultdict

    per = defaultdict(list)
    for r in rows:
        assert 0 <= r["age_months"] <= 11
        per[r["cohort"]].append((r["age_months"], r["ltv_per_customer"]))
    assert len(per) <= 6
    for cohort, pts in per.items():
        pts.sort()
        vals = [v for _, v in pts]
        assert vals == sorted(vals)
        assert vals[0] > 0  # month 0 includes the first order itself


def test_q264_elasticity_has_evidence_floor(spark):
    """Every brand row carries >= 20 lines, R^2 in [0,1], and the slope
    matches a numpy OLS recompute for the first few brands."""
    import numpy as np

    rows = QUERY_REGISTRY["q264_discount_elasticity"].fn(spark, SF_SMOKE).collect()
    assert rows
    li = (
        spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
        .select("l_partkey", "l_discount", "l_quantity")
        .collect()
    )
    parts = {
        r["p_partkey"]: r["p_brand"]
        for r in spark.read.parquet(f"{SF_SMOKE}/part.parquet")
        .select("p_partkey", "p_brand")
        .collect()
    }
    from collections import defaultdict

    xs = defaultdict(list)
    ys = defaultdict(list)
    for r in li:
        b = parts[r["l_partkey"]]
        xs[b].append(r["l_discount"])
        ys[b].append(float(r["l_quantity"]))
    for r in rows[:5]:
        assert r["n_lines"] >= 20
        assert 0.0 <= r["r2"] <= 1.0
        x = np.array(xs[r["p_brand"]])
        y = np.array(ys[r["p_brand"]])
        slope = ((x - x.mean()) * (y - y.mean())).sum() / ((x - x.mean()) ** 2).sum()
        assert abs(r["qty_per_discount_slope"] - slope) < 2e-3


def test_q265_drift_profile_matches_recount(spark):
    """Null rates and means must match a DuckDB-free recount on the
    parity halves; the synthetic halves of one table should mostly NOT
    drift (same distribution)."""
    import math

    rows = {r["col"]: r for r in QUERY_REGISTRY["q265_profile_drift"].fn(spark, SF_SMOKE).collect()}
    assert set(rows) == {"l_quantity", "l_extendedprice", "l_discount", "l_tax"}
    li = (
        spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
        .select("l_orderkey", "l_quantity")
        .collect()
    )
    s = {0: 0, 1: 0}
    n = {0: 0, 1: 0}
    for r in li:
        h = r["l_orderkey"] % 2
        n[h] += 1
        s[h] += math.floor(r["l_quantity"] * 10000 + 0.5)
    r = rows["l_quantity"]
    assert r["null_rate_a"] == 0.0 and r["null_rate_b"] == 0.0
    assert r["mean_a"] == math.floor(s[0] / (n[0] * 10000.0) * 1e6 + 0.5) / 1e6
    assert r["mean_b"] == math.floor(s[1] / (n[1] * 10000.0) * 1e6 + 0.5) / 1e6
    drifts = [x["mean_drift"] for x in rows.values()]
    assert drifts.count(False) >= 3  # hash halves of one table barely drift


def test_q266_delay_order_statistics(spark):
    """The p50/p90 must be exact order statistics of the recomputed
    delay list and the summary must be internally ordered."""
    import math

    [r] = QUERY_REGISTRY["q266_time_to_convert"].fn(spark, SF_SMOKE).collect()
    ev = (
        spark.read.parquet(f"{SF_SMOKE}/events.parquet")
        .select("user_id", "ts", "event_type")
        .collect()
    )
    sign, pur = {}, {}
    for e in ev:
        if e["event_type"] == "signup":
            sign[e["user_id"]] = min(sign.get(e["user_id"], e["ts"]), e["ts"])
        elif e["event_type"] == "purchase":
            pur[e["user_id"]] = min(pur.get(e["user_id"], e["ts"]), e["ts"])
    delays = sorted(
        int((pur[u] - sign[u]).total_seconds())
        for u in sign
        if u in pur and pur[u] >= sign[u]
    )
    assert r["n_converted"] == len(delays)
    assert r["p50_delay_s"] == delays[math.ceil(len(delays) * 0.5) - 1]
    assert r["p90_delay_s"] == delays[math.ceil(len(delays) * 0.9) - 1]
    assert r["mean_delay_s"] == sum(delays) // len(delays)
    assert r["p50_delay_s"] <= r["p90_delay_s"] <= r["max_delay_s"]


def test_q267_richness_identities(spark):
    """Chao1 must exceed the observed vocabulary, missing mass must
    match singletons/tokens, and frequency-of-frequency counts must
    match a Python recount for one source."""
    import math
    from collections import Counter

    rows = QUERY_REGISTRY["q267_vocab_richness"].fn(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r["chao1_vocab_est"] >= r["vocab"]
        assert r["missing_mass"] == math.floor(
            r["singletons"] / r["n_tokens"] * 1e6 + 0.5
        ) / 1e6
    docs = (
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .select("source", "text")
        .filter("length(trim(text)) > 0")
        .collect()
    )
    src = rows[0]["source"]
    c = Counter()
    for d in docs:
        if d["source"] == src:
            c.update(d["text"].strip().lower().split())
    r = rows[0]
    assert r["vocab"] == len(c)
    assert r["n_tokens"] == sum(c.values())
    assert r["singletons"] == sum(1 for v in c.values() if v == 1)
    assert r["doubletons"] == sum(1 for v in c.values() if v == 2)


def test_q268_looks_monotone_and_final_matches_q179_shape(spark):
    """Cohort sizes must be non-decreasing across looks, the final look
    must cover every user, z must satisfy the two-proportion formula,
    and boundary flags must follow |z| > 2.413."""
    import math

    rows = sorted(
        QUERY_REGISTRY["q268_sequential_ab_looks"].fn(spark, SF_SMOKE).collect(),
        key=lambda r: r["look"],
    )
    assert [r["look"] for r in rows] == [1, 2, 3, 4, 5]
    for a, b in zip(rows, rows[1:]):
        assert b["n_a"] >= a["n_a"] and b["n_b"] >= a["n_b"]
    total_users = (
        spark.read.parquet(f"{SF_SMOKE}/events.parquet")
        .select("user_id")
        .distinct()
        .count()
    )
    assert rows[-1]["n_a"] + rows[-1]["n_b"] == total_users
    for r in rows:
        p = (r["rate_a"] * r["n_a"] + r["rate_b"] * r["n_b"]) / (r["n_a"] + r["n_b"])
        z = (r["rate_b"] - r["rate_a"]) / math.sqrt(
            p * (1 - p) * (1 / r["n_a"] + 1 / r["n_b"])
        )
        assert abs(r["z"] - z) < 5e-3  # rates are rounded, so loose band
        assert r["crossed_boundary"] == (abs(r["z"]) > 2.413) or abs(abs(r["z"]) - 2.413) < 1e-2


def test_q269_shares_partition_hierarchy(spark):
    """Within each region, nation shares must sum to ~1 and ranks be
    dense from 1; global shares must sum to ~1 across all rows."""
    rows = QUERY_REGISTRY["q269_hierarchy_contribution"].fn(spark, SF_SMOKE).collect()
    assert rows
    from collections import defaultdict

    reg = defaultdict(list)
    for r in rows:
        reg[r["region"]].append(r)
    assert abs(sum(r["share_of_total"] for r in rows) - 1.0) < 1e-3
    for region, rs in reg.items():
        assert abs(sum(x["share_of_region"] for x in rs) - 1.0) < 1e-3
        ranks = sorted(x["rank_in_region"] for x in rs)
        assert ranks == list(range(1, len(rs) + 1))


def test_q270_wilson_ranking_properties(spark):
    """The Wilson LB must be below the raw rate, match a Python
    recompute, and the ordering must differ from (or at least respect)
    evidence: a user cannot rank above another with both lower rate
    AND fewer events."""
    import math

    rows = QUERY_REGISTRY["q270_wilson_error_ranking"].fn(spark, SF_SMOKE).collect()
    assert rows
    z = 1.959963984540054
    for r in rows:
        assert r["n_events"] >= 10
        p = r["n_errors"] / r["n_events"]
        n = r["n_events"]
        wlb = (p + z * z / (2 * n) - z * math.sqrt(p * (1 - p) / n + z * z / (4.0 * n * n))) / (
            1 + z * z / n
        )
        assert abs(r["wilson_lb"] - wlb) < 2e-6
        assert r["wilson_lb"] <= r["error_rate"] + 1e-9
    lbs = [r["wilson_lb"] for r in rows]
    assert lbs == sorted(lbs, reverse=True)


def test_q271_recs_ranked_by_lift_per_part(spark):
    """Each part's shelf has <= 3 recs in strict lift order (ties to
    smaller part id) with the minimum co-occurrence floor respected."""
    rows = QUERY_REGISTRY["q271_copurchase_recs"].fn(spark, SF_SMOKE).collect()
    assert rows
    from collections import defaultdict

    per = defaultdict(list)
    for r in rows:
        assert r["n_cooccur"] >= 2
        assert r["part"] != r["rec"]
        per[r["part"]].append((r["rec_rank"], r["lift"]))
    for part, lst in per.items():
        lst.sort()
        assert [x[0] for x in lst] == list(range(1, len(lst) + 1))
        assert len(lst) <= 3
        lifts = [x[1] for x in lst]
        assert lifts == sorted(lifts, reverse=True)


def test_q272_forecast_consistency(spark):
    """Forecast = trend x dow_factor (rounded), horizons are 1..7 with
    consecutive dates, and the trend component moves linearly."""
    import math

    rows = sorted(
        QUERY_REGISTRY["q272_volume_forecast"].fn(spark, SF_SMOKE).collect(),
        key=lambda r: r["horizon_days"],
    )
    assert [r["horizon_days"] for r in rows] == list(range(1, 8))
    for a, b in zip(rows, rows[1:]):
        assert (b["forecast_date"] - a["forecast_date"]).days == 1
    deltas = [
        round(b["trend_component"] - a["trend_component"], 2)
        for a, b in zip(rows, rows[1:])
    ]
    assert max(deltas) - min(deltas) <= 0.02  # linear trend, equal steps
    for r in rows:
        approx = r["trend_component"] * r["dow_factor"]
        assert abs(r["forecast_events"] - approx) <= max(1.0, 0.01 * approx)
        assert r["forecast_events"] >= 0


def test_q273_outliers_are_lowest_density_probes(spark):
    """Outlier score must be 1 - k5 cosine, ordered ascending by the
    k-th neighbor similarity, and scores within [0, 2]."""
    rows = QUERY_REGISTRY["q273_knn_outlier_scores"].fn(spark, SF_SMOKE).collect()
    assert 0 < len(rows) <= 10
    sims = [r["k5_cosine"] for r in rows]
    assert sims == sorted(sims)
    for r in rows:
        assert abs(r["outlier_score"] - (1 - r["k5_cosine"])) < 2e-6
        assert 0.0 <= r["outlier_score"] <= 2.0


def test_q274_active_user_containment(spark):
    """DAU <= WAU <= MAU per day (window containment), stickiness in
    (0,1], and WAU must match a Python recount for the latest day."""
    rows = QUERY_REGISTRY["q274_dau_wau_mau"].fn(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r["dau"] <= r["wau"] <= r["mau"]
        assert 0 < r["stickiness"] <= 1.0
    latest = max(rows, key=lambda r: r["day"])
    ev = (
        spark.read.parquet(f"{SF_SMOKE}/events.parquet")
        .selectExpr("cast(ts as date) d", "user_id")
        .collect()
    )
    import datetime

    lo = latest["day"] - datetime.timedelta(days=6)
    wau = {e["user_id"] for e in ev if lo <= e["d"] <= latest["day"]}
    assert latest["wau"] == len(wau)


def test_q275_abc_pareto_structure(spark):
    """Classes partition the part universe; shares sum to 1 with A >=
    B >= C share-per-part density (A parts are individually bigger);
    class boundaries respect the 80/95 cuts."""
    rows = {r["abc"]: r for r in QUERY_REGISTRY["q275_abc_classification"].fn(spark, SF_SMOKE).collect()}
    assert set(rows) <= {"A", "B", "C"} and "A" in rows
    total_share = sum(r["revenue_share"] for r in rows.values())
    assert abs(total_share - 1.0) < 1e-3
    if "B" in rows:
        assert rows["A"]["min_part_revenue"] >= rows["B"]["max_part_revenue"] - 0.01
    n_parts = (
        spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
        .select("l_partkey")
        .distinct()
        .count()
    )
    assert sum(r["n_parts"] for r in rows.values()) == n_parts


def test_q276_priority_percentiles_ordered(spark):
    """Per-priority percentiles must be internally ordered and match a
    Python recount for one priority class."""
    import math

    rows = QUERY_REGISTRY["q276_fulfillment_intervals"].fn(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert 0 <= r["p50_days"] <= r["p90_days"] <= r["max_days"]
    li = (
        spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
        .select("l_orderkey", "l_shipdate")
        .collect()
    )
    od = {
        o["o_orderkey"]: (o["o_orderdate"], o["o_orderpriority"])
        for o in spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
        .select("o_orderkey", "o_orderdate", "o_orderpriority")
        .collect()
    }
    pr = rows[0]["priority"]
    days = sorted(
        (l["l_shipdate"].date() - od[l["l_orderkey"]][0].date()).days
        for l in li
        if od[l["l_orderkey"]][1] == pr
        and l["l_shipdate"] >= od[l["l_orderkey"]][0]
    )
    r = rows[0]
    assert r["n_lines"] == len(days)
    assert r["p50_days"] == days[math.ceil(len(days) * 0.5) - 1]
    assert r["p90_days"] == days[math.ceil(len(days) * 0.9) - 1]
    assert r["mean_days"] == sum(days) // len(days)


def test_q277_agreement_set_algebra(spark):
    """Intersection can exceed neither side; pair Jaccard must equal
    |both| / |union| recomputed from the two detectors."""
    import math

    [r] = QUERY_REGISTRY["q277_detector_agreement"].fn(spark, SF_SMOKE).collect()
    mh = {
        (x["doc_a"], x["doc_b"])
        for x in QUERY_REGISTRY["q24_minhash_lsh_dedup"].fn(spark, SF_SMOKE).collect()
    }
    sh = {
        (x["doc_a"], x["doc_b"])
        for x in QUERY_REGISTRY["q25_simhash_dedup"].fn(spark, SF_SMOKE).collect()
    }
    assert r["n_minhash_pairs"] == len(mh)
    assert r["n_simhash_pairs"] == len(sh)
    assert r["n_both"] == len(mh & sh)
    assert r["pair_jaccard"] == math.floor(
        len(mh & sh) / len(mh | sh) * 1e6 + 0.5
    ) / 1e6


def test_q278_shares_partition_and_js_nonneg(spark):
    """Each half's shares must sum to ~1 over clusters, JS terms are
    non-negative, and abs_shift equals |share_a - share_b|."""
    rows = QUERY_REGISTRY["q278_cluster_share_drift"].fn(spark, SF_SMOKE).collect()
    assert rows
    assert abs(sum(r["share_a"] for r in rows) - 1.0) < 1e-3
    assert abs(sum(r["share_b"] for r in rows) - 1.0) < 1e-3
    for r in rows:
        assert r["js_term"] >= 0.0
        assert abs(r["abs_shift"] - abs(r["share_a"] - r["share_b"])) < 3e-6
    assert sum(r["js_term"] for r in rows) < 0.5  # random halves: low drift


def test_q279_hhi_bounds_and_recompute(spark):
    """HHI must lie in [1/n, 1], and match a Python recompute of
    squared revenue shares for every nation."""
    import math
    from collections import defaultdict

    rows = QUERY_REGISTRY["q279_supplier_hhi"].fn(spark, SF_SMOKE).collect()
    assert rows
    li = (
        spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
        .select("l_suppkey", "l_extendedprice", "l_discount")
        .collect()
    )
    sup = {
        s["s_suppkey"]: s["s_nationkey"]
        for s in spark.read.parquet(f"{SF_SMOKE}/supplier.parquet").collect()
    }
    nat = {
        n["n_nationkey"]: n["n_name"]
        for n in spark.read.parquet(f"{SF_SMOKE}/nation.parquet").collect()
    }
    cells = defaultdict(int)
    for l in li:
        nation = nat[sup[l["l_suppkey"]]]
        cells[(nation, l["l_suppkey"])] += math.floor(
            l["l_extendedprice"] * (1 - l["l_discount"]) * 100 + 0.5
        )
    per_nation = defaultdict(list)
    for (nation, _), c in cells.items():
        per_nation[nation].append(c)
    for r in rows:
        vals = per_nation[r["nation"]]
        tc = sum(vals)
        hu = sum(math.floor((v / tc) ** 2 * 1e9 + 0.5) for v in vals)
        assert r["n_suppliers"] == len(vals)
        assert r["hhi"] == math.floor(hu / 1e9 * 1e6 + 0.5) / 1e6
        assert r["hhi_floor"] - 1e-6 <= r["hhi"] <= 1.0


def test_q280_funnel_monotone_and_matches_components(spark):
    """Funnel stages must be monotone non-increasing and each count
    must match its component query recomputed directly."""
    [r] = QUERY_REGISTRY["q280_corpus_funnel"].fn(spark, SF_SMOKE).collect()
    assert r["n_docs"] >= r["n_after_exact_dedup"] >= r["n_after_quality"] >= r["n_final"]
    keeps = {
        x["keep_id"]
        for x in QUERY_REGISTRY["q22_dedup_exact"].fn(spark, SF_SMOKE).collect()
    }
    passes = {
        x["doc_id"]
        for x in QUERY_REGISTRY["q173_quality_logreg"].fn(spark, SF_SMOKE).collect()
        if x["quality_pass"]
    }
    dirty = {
        x["doc_id"]
        for x in QUERY_REGISTRY["q72_contamination_check"].fn(spark, SF_SMOKE).collect()
    }
    assert r["n_after_exact_dedup"] == len(keeps)
    assert r["n_after_quality"] == len(keeps & passes)
    assert r["n_final"] == len((keeps & passes) - dirty)
    assert 0.0 <= r["drop_fraction"] <= 1.0


def test_q281_mix_audit_within_band(spark):
    """Achieved rates must sit inside the 4-sigma binomial band for
    every stratum, and degenerate strata (keep-all / drop-all) must be
    exact."""
    rows = QUERY_REGISTRY["q281_sample_mix_audit"].fn(spark, SF_SMOKE).collect()
    assert {r["lang"] for r in rows} >= {"en", "es", "fr", "de", "zh"}
    for r in rows:
        assert r["within_4_sigma"] is True
        if r["target_rate"] == 1.0:
            assert r["n_got"] == r["n_pop"]
        if r["target_rate"] == 0.0:
            assert r["n_got"] == 0


def test_q282_auc_ci_brackets_point(spark):
    """The bootstrap CI must bracket the point AUC, match q240's point
    estimate exactly, and have positive width (replicates genuinely
    vary)."""
    [r] = QUERY_REGISTRY["q282_auc_bootstrap_ci"].fn(spark, SF_SMOKE).collect()
    [p] = QUERY_REGISTRY["q240_roc_auc"].fn(spark, SF_SMOKE).collect()
    assert r["auc"] == p["auc"]
    assert r["ci_lo"] <= r["auc"] <= r["ci_hi"]
    assert r["ci_hi"] > r["ci_lo"]
    assert r["n_resamples"] == 64


def test_q283_anomalies_ranked_and_standardized(spark):
    """Rows come out |z|-descending, and the mean |z| of the TOP list
    must exceed 1 (they are the extremes of the residual distribution)."""
    rows = QUERY_REGISTRY["q283_volume_anomalies"].fn(spark, SF_SMOKE).collect()
    assert 0 < len(rows) <= 10
    zs = [r["abs_z"] for r in rows]
    assert zs == sorted(zs, reverse=True)
    assert zs[0] >= 1.0
    for r in rows:
        assert r["n_events"] > 0 and r["abs_z"] >= 0


def test_q284_growth_identity(spark):
    """new + retained + resurrected must equal active for every week,
    week 1 is all-new, and churned(w) = active(w-1) - retained(w)."""
    rows = sorted(
        QUERY_REGISTRY["q284_growth_accounting"].fn(spark, SF_SMOKE).collect(),
        key=lambda r: r["week"],
    )
    assert rows
    for r in rows:
        assert r["new_users"] + r["retained"] + r["resurrected"] == r["active"]
    assert rows[0]["new_users"] == rows[0]["active"]
    for a, b in zip(rows, rows[1:]):
        if (b["week"] - a["week"]).days == 7:
            assert b["churned_from_prev"] == a["active"] - b["retained"]


def test_q285_ece_matches_bucket_recompute(spark):
    """ECE must equal the doc-weighted mean of q239's gaps and MCE its
    max; both bounded by [0,1]."""
    import math

    [r] = QUERY_REGISTRY["q285_expected_calibration_error"].fn(spark, SF_SMOKE).collect()
    buckets = QUERY_REGISTRY["q239_calibration_brier"].fn(spark, SF_SMOKE).collect()
    n = sum(b["n_docs"] for b in buckets)
    ece = sum(b["n_docs"] * b["calib_gap"] for b in buckets) / n
    assert r["n_docs"] == n and r["n_buckets"] == len(buckets)
    assert abs(r["ece"] - ece) < 2e-6
    assert r["mce"] == max(b["calib_gap"] for b in buckets)
    assert 0.0 <= r["ece"] <= r["mce"] <= 1.0


def test_q286_context_sweep_monotone(spark):
    """Longer contexts must monotonically reduce truncation loss and
    chunk count while utilization falls; identities hold against a
    Python recount at one length."""
    import math

    rows = sorted(
        QUERY_REGISTRY["q286_context_length_plan"].fn(spark, SF_SMOKE).collect(),
        key=lambda r: r["context_len"],
    )
    assert [r["context_len"] for r in rows] == [64, 128, 256, 512, 1024]
    for a, b in zip(rows, rows[1:]):
        assert b["truncation_loss"] <= a["truncation_loss"] + 1e-9
        assert b["n_chunks"] <= a["n_chunks"]
        assert b["n_truncated"] <= a["n_truncated"]
        assert b["chunk_utilization"] <= a["chunk_utilization"] + 1e-6
    toks = [
        len(d["text"].strip().split())
        for d in spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .select("text")
        .collect()
        if d["text"].strip()
    ]
    L = 256
    r = next(x for x in rows if x["context_len"] == L)
    assert r["n_truncated"] == sum(1 for t in toks if t > L)
    assert r["n_chunks"] == sum((t + L - 1) // L for t in toks)
    total, kept = sum(toks), sum(min(t, L) for t in toks)
    assert r["truncation_loss"] == math.floor((total - kept) / total * 1e6 + 0.5) / 1e6


def test_q287_pmi_matches_python(spark):
    """PMI values must match a Python recompute of document-level
    co-occurrence for every returned association; shelves are ranked
    PMI-descending."""
    import math
    from collections import defaultdict

    rows = QUERY_REGISTRY["q287_pmi_associations"].fn(spark, SF_SMOKE).collect()
    assert rows
    docs = (
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    )
    terms = {
        d["doc_id"]: set(d["text"].strip().lower().split())
        for d in docs
        if d["text"].strip()
    }
    N = len(terms)
    df = defaultdict(int)
    for ts in terms.values():
        for t in ts:
            df[t] += 1
    for r in rows:
        c_co = sum(1 for ts in terms.values() if r["seed"] in ts and r["term"] in ts)
        assert r["n_docs_together"] == c_co >= 3
        pmi = math.log(c_co * N / (df[r["seed"]] * df[r["term"]]))
        assert r["pmi"] == math.floor(pmi * 1e4 + 0.5) / 1e4
    per = defaultdict(list)
    for r in rows:
        per[r["seed"]].append((r["assoc_rank"], r["pmi"]))
    for seed, lst in per.items():
        lst.sort()
        pmis = [x[1] for x in lst]
        assert pmis == sorted(pmis, reverse=True)


def test_q288_dup_rate_partitions_corpus(spark):
    """Decile doc counts must sum to the corpus and total duplicates to
    n_docs - n_keeps; rates live in [0,1]."""
    rows = QUERY_REGISTRY["q288_dup_rate_trend"].fn(spark, SF_SMOKE).collect()
    n_docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").count()
    n_keeps = QUERY_REGISTRY["q22_dedup_exact"].fn(spark, SF_SMOKE).count()
    assert sum(r["n_docs"] for r in rows) == n_docs
    assert sum(r["n_duplicates"] for r in rows) == n_docs - n_keeps
    for r in rows:
        assert 0.0 <= r["dup_rate"] <= 1.0


def test_q289_novelty_decreasing_first_decile_full(spark):
    """Decile 0 is 100% novel by definition; later deciles must have
    novelty strictly below 1; new-gram counts must sum to the distinct
    trigram universe."""
    rows = sorted(
        QUERY_REGISTRY["q289_novelty_curve"].fn(spark, SF_SMOKE).collect(),
        key=lambda r: r["decile"],
    )
    assert rows[0]["decile"] == 0 and rows[0]["novelty_rate"] == 1.0
    for r in rows[1:]:
        assert r["novelty_rate"] < 1.0
        assert 0 <= r["n_new_grams"] <= r["n_distinct_grams"]
    docs = (
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .select("text")
        .collect()
    )
    grams = set()
    for d in docs:
        t = d["text"].strip().lower().split()
        for i in range(len(t) - 2):
            grams.add(" ".join(t[i : i + 3]))
    assert sum(r["n_new_grams"] for r in rows) == len(grams)


def test_q290_ht_estimates_recover_truth(spark):
    """The HT population-size estimate must land near the true
    sampleable population and the mean within a loose relative band
    (the identity is exact in expectation; this fixed sample is one
    draw)."""
    [r] = QUERY_REGISTRY["q290_horvitz_thompson"].fn(spark, SF_SMOKE).collect()
    assert r["n_sampled"] < r["n_pop"]
    assert abs(r["ht_n_est"] - r["n_pop"]) / r["n_pop"] < 0.2
    assert r["rel_err"] < 0.1
    assert abs(
        r["rel_err"]
        - abs(r["ht_mean_chars"] - r["true_mean_chars"]) / r["true_mean_chars"]
    ) < 1e-4


def test_q291_gain_monotone_and_ends_at_one(spark):
    """Cumulative capture must be non-decreasing and reach 1.0 at the
    last decile; lift must be non-increasing and end at 1.0; decile 1
    must beat random (lift > 1)."""
    rows = sorted(
        QUERY_REGISTRY["q291_gain_chart"].fn(spark, SF_SMOKE).collect(),
        key=lambda r: r["score_decile"],
    )
    assert [r["score_decile"] for r in rows] == list(range(1, 11))
    caps = [r["cum_capture"] for r in rows]
    assert caps == sorted(caps)
    assert abs(caps[-1] - 1.0) < 1e-6
    lifts = [r["lift"] for r in rows]
    # lift is ~decreasing but NOT guaranteed monotone between adjacent
    # deciles (a later decile can be locally denser); the guarantees are
    # the endpoints: top decile beats random, full coverage is exactly 1
    assert abs(lifts[-1] - 1.0) < 1e-3
    assert lifts[0] > 1.0
    assert max(lifts) <= 1.0 / (sum(r["n_pos"] for r in rows) / sum(r["n_docs"] for r in rows)) + 1e-6


def test_q292_bloom_plan_matches_closed_form(spark):
    """FPP must match the closed form with optimal k at each budget,
    decrease with budget, and byte sizes scale linearly in keys."""
    import math

    rows = sorted(
        QUERY_REGISTRY["q292_bloom_sizing_plan"].fn(spark, SF_SMOKE).collect(),
        key=lambda r: r["bits_per_key"],
    )
    assert [r["bits_per_key"] for r in rows] == [4, 8, 12, 16, 20]
    prev = 1.0
    for r in rows:
        k = math.floor(r["bits_per_key"] * 0.6931471805599453 + 0.5)
        assert r["n_hashes"] == k
        fpp = math.exp(k * math.log(1 - math.exp(-(k / r["bits_per_key"]))))
        assert r["fpp"] == math.floor(fpp * 1e6 + 0.5) / 1e6
        assert r["fpp"] <= prev
        prev = r["fpp"]
        assert r["filter_bytes"] == math.floor(
            r["bits_per_key"] * r["n_keys"] / 8.0 + 0.5
        )


def test_q293_diversity_bounds(spark):
    """Effective sources must lie in [1, n_sources]; uniformity in
    (0,1]; entropy bounded by log2(n)."""
    import math

    [r] = QUERY_REGISTRY["q293_mixture_diversity"].fn(spark, SF_SMOKE).collect()
    n = r["n_sources"]
    assert 1.0 <= r["effective_sources"] <= n + 1e-6
    assert 0.0 < r["uniformity"] <= 1.0 + 1e-6
    assert 0.0 <= r["share_entropy_bits"] <= math.log2(n) + 1e-4


def test_q294_temperature_flattens_mixture(spark):
    """Lower temperature must flatten the mixture: effective sources
    non-increasing in T, max weight non-decreasing in T, min weight
    non-increasing in T; T=1 reproduces natural shares."""
    rows = sorted(
        QUERY_REGISTRY["q294_temperature_sweep"].fn(spark, SF_SMOKE).collect(),
        key=lambda r: r["temperature"],
    )
    assert [r["temperature"] for r in rows] == [0.3, 0.5, 0.7, 1.0]
    for a, b in zip(rows, rows[1:]):
        assert b["effective_sources"] <= a["effective_sources"] + 1e-6
        assert b["max_weight"] >= a["max_weight"] - 1e-9
        assert b["min_weight"] <= a["min_weight"] + 1e-9
    nat = rows[-1]
    [div] = QUERY_REGISTRY["q293_mixture_diversity"].fn(spark, SF_SMOKE).collect()
    assert abs(nat["effective_sources"] - div["effective_sources"]) < 0.01


def test_q295_mrr_identities(spark):
    """Reciprocal rank must be 1/first_relevant_rank (0 when no
    relevant doc ranks), success implies first rank <= 5, and counts
    match a recount from q197 + the labeling rule."""
    import math
    from collections import defaultdict

    rows = QUERY_REGISTRY["q295_mrr_success_at_k"].fn(spark, SF_SMOKE).collect()
    assert rows
    ranked = QUERY_REGISTRY["q197_bm25_scoring"].fn(spark, SF_SMOKE).collect()
    per = defaultdict(list)
    for x in ranked:
        per[x["term"]].append((x["rank"], x["doc_id"] % 3 == 0))
    for r in rows:
        lst = sorted(per[r["term"]])
        firsts = [rk for rk, rel in lst if rel]
        if firsts:
            assert r["first_relevant_rank"] == firsts[0]
            assert r["reciprocal_rank"] == math.floor(1.0 / firsts[0] * 1e6 + 0.5) / 1e6
        else:
            assert r["first_relevant_rank"] == 0 and r["reciprocal_rank"] == 0.0
        assert r["success_at5"] == bool(firsts and firsts[0] <= 5)
        assert r["n_relevant_at5"] == sum(1 for rk, rel in lst if rel and rk <= 5)


def test_q296_point_biserial_matches_numpy(spark):
    """The correlation must equal numpy's Pearson r between the binary
    near-dup flag and the quantized score."""
    import numpy as np

    [r] = QUERY_REGISTRY["q296_dup_quality_correlation"].fn(spark, SF_SMOKE).collect()
    losers = {
        x["doc_b"]
        for x in QUERY_REGISTRY["q23_ngram_jaccard_dedup"].fn(spark, SF_SMOKE).collect()
    }
    m = QUERY_REGISTRY["q173_quality_logreg"].fn(spark, SF_SMOKE).collect()
    xs = np.array([int(x["quality_score"] * 10000 + 0.5) for x in m], dtype=float)
    ys = np.array([1.0 if x["doc_id"] in losers else 0.0 for x in m])
    assert r["n_duplicates"] == int(ys.sum())
    expect = np.corrcoef(xs, ys)[0, 1]
    # note orientation: r is corr(is_dup, score)
    assert abs(r["point_biserial_r"] - expect) < 2e-6
    assert -1.0 <= r["point_biserial_r"] <= 1.0


def test_q297_fences_contain_iqr(spark):
    """Q1 <= Q3, fences bracket the quartiles, and the outlier count
    matches a Python recount for one event type."""
    rows = QUERY_REGISTRY["q297_tukey_fences"].fn(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r["q1"] <= r["q3"]
        assert r["fence_lo"] <= r["q1"] and r["fence_hi"] >= r["q3"]
        assert 0 <= r["n_outliers"] < r["n_values"]
    import math

    et = rows[0]["event_type"]
    vals = sorted(
        v["value"]
        for v in spark.read.parquet(f"{SF_SMOKE}/events.parquet")
        .select("event_type", "value")
        .collect()
        if v["event_type"] == et and v["value"] is not None
    )
    n = len(vals)
    q1 = vals[math.ceil(n * 0.25) - 1]
    q3 = vals[math.ceil(n * 0.75) - 1]
    lo, hi = q1 - 1.5 * (q3 - q1), q3 + 1.5 * (q3 - q1)
    assert rows[0]["n_outliers"] == sum(1 for v in vals if v < lo or v > hi)


def test_q298_freshness_reference_is_newest(spark):
    """Exactly one table has age 0 (the reference clock); ages are
    non-negative; row counts match the tables."""
    rows = QUERY_REGISTRY["q298_freshness_audit"].fn(spark, SF_SMOKE).collect()
    assert len(rows) == 3
    assert sum(1 for r in rows if r["age_days"] == 0) >= 1
    for r in rows:
        assert r["age_days"] >= 0
        assert r["is_stale"] == (r["age_days"] > 30)
    ev = next(r for r in rows if r["table_name"] == "events")
    assert ev["n_rows"] == spark.read.parquet(f"{SF_SMOKE}/events.parquet").count()


def test_q299_spearman_matches_scipy_free(spark):
    """The histogram-midrank Spearman must equal a Python midrank
    Pearson recompute."""
    import numpy as np

    [r] = QUERY_REGISTRY["q299_scorer_rank_agreement"].fn(spark, SF_SMOKE).collect()
    m = {
        x["doc_id"]: int(x["quality_score"] * 10000 + 0.5)
        for x in QUERY_REGISTRY["q173_quality_logreg"].fn(spark, SF_SMOKE).collect()
    }
    import math

    l = {
        x["doc_id"]: math.floor(x["avg_logprob"] * 10000 + 0.5)
        for x in QUERY_REGISTRY["q92_unigram_logprob"].fn(spark, SF_SMOKE).collect()
    }
    ids = sorted(set(m) & set(l))
    s1 = np.array([m[d] for d in ids], dtype=float)
    s2 = np.array([l[d] for d in ids], dtype=float)

    def midrank(a):
        import collections

        cnt = collections.Counter(a)
        cum = {}
        tot = 0
        for v in sorted(cnt):
            cum[v] = tot
            tot += cnt[v]
        return np.array([2 * cum[v] + cnt[v] + 1 for v in a], dtype=float)

    rho = np.corrcoef(midrank(s1), midrank(s2))[0, 1]
    assert abs(r["spearman_rho"] - rho) < 2e-6
    assert r["n_docs"] == len(ids)


def test_q300_scorecard_components_match(spark):
    """Every scorecard number must match its component query."""
    [r] = QUERY_REGISTRY["q300_corpus_scorecard"].fn(spark, SF_SMOKE).collect()
    n_docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").count()
    assert r["n_docs"] == n_docs
    losers = {
        x["doc_b"]
        for x in QUERY_REGISTRY["q23_ngram_jaccard_dedup"].fn(spark, SF_SMOKE).collect()
    }
    import math

    assert r["near_dup_rate"] == math.floor(len(losers) / n_docs * 1e6 + 0.5) / 1e6
    [dv] = QUERY_REGISTRY["q293_mixture_diversity"].fn(spark, SF_SMOKE).collect()
    assert r["effective_sources"] == dv["effective_sources"]
    assert 0.0 < r["quality_pass_rate"] < 1.0


def test_q301_distinctive_terms_positive_z(spark):
    """Top distinctive terms must carry positive z (over-represented in
    their source), shelves are ranked descending, and the z formula
    matches a Python recompute for one row."""
    import math
    from collections import Counter, defaultdict

    rows = QUERY_REGISTRY["q301_fightin_words"].fn(spark, SF_SMOKE).collect()
    assert rows
    per = defaultdict(list)
    for r in rows:
        per[r["source"]].append((r["distinct_rank"], r["log_odds_z"]))
        assert r["log_odds_z"] > 0
    for src, lst in per.items():
        lst.sort()
        zs = [x[1] for x in lst]
        assert zs == sorted(zs, reverse=True)
    docs = (
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .select("source", "text")
        .filter("length(trim(text)) > 0")
        .collect()
    )
    cnt = defaultdict(Counter)
    for d in docs:
        cnt[d["source"]].update(d["text"].strip().lower().split())
    grand = Counter()
    tot = {}
    for s, c in cnt.items():
        grand.update(c)
        tot[s] = sum(c.values())
    V = len(grand)
    NT = sum(tot.values())
    a = 0.01
    r = rows[0]
    y = cnt[r["source"]][r["term"]]
    n = tot[r["source"]]
    yt = grand[r["term"]]
    num1 = (y + a) / (n + a * V - y - a)
    num2 = (yt - y + a) / (NT - n + a * V - (yt - y) - a)
    z = (math.log(num1) - math.log(num2)) / math.sqrt(
        1.0 / (y + a) + 1.0 / (yt - y + a)
    )
    assert r["n_occurrences"] == y
    assert r["log_odds_z"] == math.floor(z * 1e4 + 0.5) / 1e4


def test_q302_lorenz_convexity(spark):
    """The Lorenz curve must be convex (revenue share grows slower than
    customer share on the left), end at (1,1), and stay below the
    diagonal everywhere except the end."""
    rows = sorted(
        QUERY_REGISTRY["q302_lorenz_curve"].fn(spark, SF_SMOKE).collect(),
        key=lambda r: r["decile"],
    )
    assert [r["decile"] for r in rows] == list(range(1, 11))
    assert abs(rows[-1]["cum_customer_share"] - 1.0) < 1e-6
    assert abs(rows[-1]["cum_revenue_share"] - 1.0) < 1e-6
    prev = 0.0
    for r in rows[:-1]:
        assert r["cum_revenue_share"] <= r["cum_customer_share"] + 1e-6
        assert r["cum_revenue_share"] >= prev
        prev = r["cum_revenue_share"]


def test_q304_kaplan_meier_invariants(spark):
    """KM curve sanity: every order is a subject (events + censored sum
    to the order count), the risk set shrinks as time advances, the
    survival estimate is non-increasing in [0, 1], and the first row's
    survival equals its own factor 1 - d/n exactly."""
    from aws_datalake_platform_spark.catalog import load_table

    rows = sorted(
        QUERY_REGISTRY["q304_kaplan_meier"].fn(spark, SF_SMOKE).collect(),
        key=lambda r: r["t_weeks"],
    )
    n_orders = load_table(spark, SF_SMOKE, "orders").count()
    assert sum(r["n_events"] + r["n_censored"] for r in rows) == n_orders
    assert rows[0]["n_at_risk"] == n_orders
    prev_s, prev_risk = 1.0 + 1e-9, n_orders + 1
    for r in rows:
        assert 0.0 <= r["survival"] <= prev_s + 1e-6
        assert r["n_at_risk"] < prev_risk
        prev_s, prev_risk = r["survival"], r["n_at_risk"]
    r0 = rows[0]
    expect = 1 - r0["n_events"] / r0["n_at_risk"]
    assert abs(r0["survival"] - expect) < 2e-6


def test_q305_cusum_integer_exactness(spark):
    """CUSUM·k must be an exact integer telescoping to zero at the last
    day (Σ(n·k − s) over all days = s·k − s·k), the flagged changepoint
    is the earliest day attaining max |CUSUM|, and exactly one row is
    flagged."""
    rows = sorted(
        QUERY_REGISTRY["q305_cusum_changepoint"].fn(spark, SF_SMOKE).collect(),
        key=lambda r: r["d"],
    )
    assert abs(rows[-1]["cusum"]) < 0.005  # telescopes to 0 (rounded)
    flagged = [r for r in rows if r["is_changepoint"]]
    assert len(flagged) == 1
    peak = max(abs(r["cusum"]) for r in rows)
    assert abs(abs(flagged[0]["cusum"]) - peak) < 0.02
    firsts = [r for r in rows if abs(abs(r["cusum"]) - peak) < 0.005]
    assert flagged[0]["d"] == min(r["d"] for r in firsts)


def test_q306_mann_whitney_against_scipy_formula(spark):
    """Recompute U, z and the effect size in numpy from the raw values
    (midranks via scipy-style average ranking) and compare."""
    import numpy as np

    from aws_datalake_platform_spark.catalog import load_table
    from pyspark.sql import functions as F

    [row] = QUERY_REGISTRY["q306_mann_whitney"].fn(spark, SF_SMOKE).collect()
    docs = load_table(spark, SF_SMOKE, "documents").select("source", "n_chars")
    counts = {
        r["source"]: r["n"]
        for r in docs.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    top2 = sorted(counts, key=lambda s: (-counts[s], s))[:2]
    assert row["source_a"] == top2[0] and row["source_b"] == top2[1]
    xs = np.array(
        [r["n_chars"] for r in docs.filter(F.col("source") == top2[0]).collect()]
    )
    ys = np.array(
        [r["n_chars"] for r in docs.filter(F.col("source") == top2[1]).collect()]
    )
    allv = np.concatenate([xs, ys])
    order = np.argsort(allv, kind="stable")
    ranks = np.empty(len(allv))
    sv = allv[order]
    i = 0
    while i < len(sv):
        j = i
        while j < len(sv) and sv[j] == sv[i]:
            j += 1
        ranks[order[i:j]] = (i + j + 1) / 2.0
        i = j
    r1 = ranks[: len(xs)].sum()
    n1, n2 = len(xs), len(ys)
    u = r1 - n1 * (n1 + 1) / 2
    assert row["n_a"] == n1 and row["n_b"] == n2
    assert row["u_stat"] == int(u)
    _, t_counts = np.unique(allv, return_counts=True)
    tie3 = float((t_counts**3 - t_counts).sum())
    nn = n1 + n2
    sigma = np.sqrt(n1 * n2 / 12.0 * ((nn + 1) - tie3 / (nn * (nn - 1))))
    assert abs(row["z"] - (u - n1 * n2 / 2.0) / sigma) < 2e-4
    assert abs(row["rank_biserial"] - (1 - 2 * u / (n1 * n2))) < 2e-6


def test_q307_discount_dispersion_recompute(spark):
    """Recompute the winner part's variance from raw lineitems in exact
    integer cents and confirm the ranking column is dense 1..10."""
    from aws_datalake_platform_spark.catalog import load_table
    from pyspark.sql import functions as F

    rows = QUERY_REGISTRY["q307_discount_dispersion"].fn(spark, SF_SMOKE).collect()
    assert [r["dispersion_rank"] for r in rows] == list(range(1, 11))
    top = rows[0]
    li = (
        load_table(spark, SF_SMOKE, "lineitem")
        .filter(F.col("l_partkey") == top["l_partkey"])
        .select(F.round(F.col("l_discount") * 100).cast("long").alias("c"))
        .collect()
    )
    cents = [r["c"] for r in li]
    n, s, ss = len(cents), sum(cents), sum(c * c for c in cents)
    assert top["n_sales"] == n
    assert top["n_discount_levels"] == len(set(cents))
    assert abs(top["var_discount"] - (n * ss - s * s) / (n * n) / 10_000) < 1e-8
    # every later rank has variance <= the winner's
    for r in rows[1:]:
        assert r["var_discount"] <= top["var_discount"] + 1e-8


def test_q308_matryoshka_monotone_fidelity(spark):
    """Longer prefixes must be at least as faithful: mean |cosine error|
    non-increasing in prefix_dim, zero error at the full dimension, and
    sign agreement 1.0 at dim 64."""
    rows = sorted(
        QUERY_REGISTRY["q308_matryoshka_audit"].fn(spark, SF_SMOKE).collect(),
        key=lambda r: r["prefix_dim"],
    )
    assert [r["prefix_dim"] for r in rows] == [8, 16, 32, 64]
    assert all(r["n_pairs"] == rows[0]["n_pairs"] > 0 for r in rows)
    errs = [r["mean_abs_err"] for r in rows]
    assert errs[-1] == 0.0 and rows[-1]["sign_agreement"] == 1.0
    assert all(a >= b - 1e-6 for a, b in zip(errs, errs[1:]))


def test_q309_fano_recompute(spark):
    """Recompute one event type's Fano factor from raw hourly counts in
    exact integers."""
    from collections import Counter

    from aws_datalake_platform_spark.catalog import load_table
    from pyspark.sql import functions as F

    rows = QUERY_REGISTRY["q309_burstiness_fano"].fn(spark, SF_SMOKE).collect()
    assert len(rows) == 5  # five event types in the testdata
    pick = rows[0]
    ev = (
        load_table(spark, SF_SMOKE, "events")
        .filter(F.col("event_type") == pick["event_type"])
        .select(F.date_trunc("hour", F.col("ts")).alias("h"))
        .collect()
    )
    counts = Counter(r["h"] for r in ev)
    k, s = len(counts), sum(counts.values())
    ss = sum(c * c for c in counts.values())
    assert pick["n_hours"] == k and pick["n_events"] == s
    fano = (k * ss - s * s) / (k * s)
    assert abs(pick["fano"] - fano) < 1e-4
    assert pick["is_bursty"] == (fano > 1.5)


def test_q310_wilcoxon_against_numpy(spark):
    """Recompute W+, the tie-corrected z and the verdict from raw events
    in numpy (pairs = per-user half-window value sums at the exact
    epoch-millisecond midpoint)."""
    import numpy as np

    from aws_datalake_platform_spark.catalog import load_table
    from pyspark.sql import functions as F

    [row] = QUERY_REGISTRY["q310_wilcoxon_value_shift"].fn(spark, SF_SMOKE).collect()
    ev = load_table(spark, SF_SMOKE, "events").select(
        "user_id", F.unix_millis("ts").alias("ms"),
        F.round(F.col("value") * 10_000).cast("long").alias("q"),
    ).collect()
    lo = min(r["ms"] for r in ev)
    hi = max(r["ms"] for r in ev)
    mid = (lo + hi) // 2
    per: dict[int, list[int]] = {}
    for r in ev:
        v = per.setdefault(r["user_id"], [0, 0])
        v[0 if r["ms"] <= mid else 1] += r["q"]
    d = np.array([v2 - v1 for v1, v2 in per.values()])
    d = d[d != 0]
    ad = np.abs(d)
    order = np.argsort(ad, kind="stable")
    ranks = np.empty(len(ad))
    sv = ad[order]
    i = 0
    while i < len(sv):
        j = i
        while j < len(sv) and sv[j] == sv[i]:
            j += 1
        ranks[order[i:j]] = (i + j + 1) / 2.0
        i = j
    n = len(d)
    wplus = ranks[d > 0].sum()
    _, t_counts = np.unique(ad, return_counts=True)
    tie3 = float((t_counts**3 - t_counts).sum())
    z = (wplus - n * (n + 1) / 4.0) / np.sqrt(
        n * (n + 1) * (2 * n + 1) / 24.0 - tie3 / 48.0
    )
    assert row["n_shifted_users"] == n
    assert abs(row["w_plus"] - wplus) < 0.11
    assert abs(row["z"] - z) < 2e-4
    expect = "increased" if z > 1.959964 else "decreased" if z < -1.959964 else "no_shift"
    assert row["verdict"] == expect


def test_q311_hill_against_numpy(spark):
    """Recompute the Hill estimator from the raw term-frequency order
    statistics in numpy."""
    import numpy as np

    from aws_datalake_platform_spark.catalog import load_table
    from pyspark.sql import functions as F

    [row] = QUERY_REGISTRY["q311_hill_tail_index"].fn(spark, SF_SMOKE).collect()
    docs = load_table(spark, SF_SMOKE, "documents")
    tok = (
        docs.filter(F.length(F.trim("text")) > 0)
        .select(F.split(F.trim(F.lower("text")), r"\s+").alias("t"))
        .filter(F.size("t") >= 3)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(t) - 2), "
                    "i -> concat_ws(' ', slice(t, i, 3)))"
                )
            ).alias("term")
        )
    )
    freqs = sorted(
        (
            r["f"]
            for r in tok.groupBy("term")
            .agg(F.count(F.lit(1)).alias("f"))
            .collect()
        ),
        reverse=True,
    )
    k = row["k_top"]
    fk1 = freqs[k]  # (k+1)-th largest
    lsum = float(np.log(np.array(freqs[:k]) / fk1).sum())
    assert row["freq_cutoff"] == fk1
    assert abs(row["hill_alpha"] - k / lsum) < 2e-3
    assert abs(row["implied_zipf_s"] - (1 + lsum / k)) < 2e-4


def test_q312_srm_counts_and_flag(spark):
    """The split must cover every distinct user exactly once, and the
    chi-square must equal (n_a - n_b)^2 / n."""
    from aws_datalake_platform_spark.catalog import load_table

    [row] = QUERY_REGISTRY["q312_srm_check"].fn(spark, SF_SMOKE).collect()
    n_users = (
        load_table(spark, SF_SMOKE, "events").select("user_id").distinct().count()
    )
    assert row["n_total"] == n_users == row["n_a"] + row["n_b"]
    chi2 = (row["n_a"] - row["n_b"]) ** 2 / n_users
    assert abs(row["chi2"] - chi2) < 1e-4
    assert row["srm_detected"] == (chi2 > 3.841458820694124)


def test_q313_benford_components(spark):
    """Nine digit rows; observed fractions sum to 1; each chi-square
    component recomputes from its own row's counts."""
    import math

    rows = sorted(
        QUERY_REGISTRY["q313_benford_audit"].fn(spark, SF_SMOKE).collect(),
        key=lambda r: r["digit"],
    )
    assert [r["digit"] for r in rows] == list(range(1, 10))
    assert abs(sum(r["observed_frac"] for r in rows) - 1.0) < 1e-4
    n = sum(r["n_obs"] for r in rows)
    for r in rows:
        p = math.log10(1 + 1 / r["digit"])
        assert abs(r["expected_frac"] - p) < 1e-6
        expect = (r["n_obs"] - n * p) ** 2 / (n * p)
        assert abs(r["chi2_component"] - expect) < 2e-3


def test_q314_acf_against_numpy(spark):
    """Recompute every lag's Pearson ACF from the raw daily counts."""
    import numpy as np

    from aws_datalake_platform_spark.catalog import load_table
    from pyspark.sql import functions as F

    rows = sorted(
        QUERY_REGISTRY["q314_volume_autocorrelation"].fn(spark, SF_SMOKE).collect(),
        key=lambda r: r["lag"],
    )
    daily = {
        r["d"]: r["n"]
        for r in load_table(spark, SF_SMOKE, "events")
        .groupBy(F.col("ts").cast("date").alias("d"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    import datetime

    for r in rows:
        lag = r["lag"]
        xs, ys = [], []
        for d, n in daily.items():
            d2 = d + datetime.timedelta(days=lag)
            if d2 in daily:
                xs.append(n)
                ys.append(daily[d2])
        assert r["n_pairs"] == len(xs)
        acf = float(np.corrcoef(xs, ys)[0, 1])
        assert abs(r["acf"] - acf) < 2e-6


def test_q315_budget_plan_monotonicity(spark):
    """More hashes: estimator std shrinks like 1/sqrt(h) exactly, and
    banded detection probability never decreases."""
    rows = sorted(
        QUERY_REGISTRY["q315_minhash_budget_plan"].fn(spark, SF_SMOKE).collect(),
        key=lambda r: r["num_hashes"],
    )
    assert [r["num_hashes"] for r in rows] == [8, 16, 32, 64, 128]
    assert all(r["n_pairs"] == rows[0]["n_pairs"] > 0 for r in rows)
    for a, b in zip(rows, rows[1:]):
        assert b["mean_estimator_std"] < a["mean_estimator_std"]
        assert b["mean_detect_prob"] >= a["mean_detect_prob"] - 1e-9
        # exact 1/sqrt(2) scaling of the std between adjacent budgets
        assert abs(b["mean_estimator_std"] * 2**0.5 - a["mean_estimator_std"]) < 1e-4


def test_q316_aa_readout_recompute(spark):
    """Recompute the A/A DiD and Welch z from raw events in Python
    (same md5 parity split and millisecond midpoint)."""
    import hashlib
    import math

    from aws_datalake_platform_spark.catalog import load_table
    from pyspark.sql import functions as F

    [row] = QUERY_REGISTRY["q316_aa_test_readout"].fn(spark, SF_SMOKE).collect()
    ev = load_table(spark, SF_SMOKE, "events").select(
        "user_id", F.unix_millis("ts").alias("ms"),
        F.round(F.col("value") * 10_000).cast("long").alias("q"),
    ).collect()
    mid = (min(r["ms"] for r in ev) + max(r["ms"] for r in ev)) // 2
    per: dict[int, list[int]] = {}
    for r in ev:
        v = per.setdefault(r["user_id"], [0, 0])
        v[0 if r["ms"] <= mid else 1] += r["q"]
    arms: dict[int, list[int]] = {0: [], 1: []}
    for uid, (v1, v2) in per.items():
        h = hashlib.md5(f"aa42{uid}".encode()).hexdigest()[:13]
        arms[int(h, 16) % 2].append(v2 - v1)
    n_c, n_t = len(arms[0]), len(arms[1])
    assert row["n_control"] == n_c and row["n_treat"] == n_t
    mc = sum(arms[0]) / n_c
    mt = sum(arms[1]) / n_t
    var_c = (n_c * sum(d * d for d in arms[0]) - sum(arms[0]) ** 2) / (
        n_c * n_c * (n_c - 1)
    )
    var_t = (n_t * sum(d * d for d in arms[1]) - sum(arms[1]) ** 2) / (
        n_t * n_t * (n_t - 1)
    )
    z = (mt - mc) / math.sqrt(var_t + var_c)
    assert abs(row["did"] - (mt - mc) / 10_000) < 1e-3
    assert abs(row["did_z"] - z) < 2e-4
    assert row["false_positive"] == (abs(z) > 1.959964)


def test_q317_eta2_bounds_and_recompute(spark):
    """eta^2 in [0, 1]; recompute both statistics from raw daily counts
    with the same floor-divided between term."""
    from collections import defaultdict

    from aws_datalake_platform_spark.catalog import load_table
    from pyspark.sql import functions as F

    [row] = QUERY_REGISTRY["q317_seasonality_strength"].fn(spark, SF_SMOKE).collect()
    daily = (
        load_table(spark, SF_SMOKE, "events")
        .groupBy(
            F.col("ts").cast("date").alias("d"),
            F.dayofweek(F.col("ts").cast("date")).alias("dow"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    k = len(daily)
    s = sum(r["n"] for r in daily)
    ss = sum(r["n"] * r["n"] for r in daily)
    groups = defaultdict(list)
    for r in daily:
        groups[r["dow"]].append(r["n"])
    between = sum(sum(g) ** 2 // len(g) for g in groups.values())
    cm = s * s / k
    eta2 = (between - cm) / (ss - cm)
    f = ((between - cm) / (len(groups) - 1)) / ((ss - between) / (k - len(groups)))
    assert row["n_days"] == k and row["n_dow_groups"] == len(groups)
    assert 0.0 <= row["eta2_dow"] <= 1.0
    assert abs(row["eta2_dow"] - eta2) < 2e-6
    assert abs(row["f_stat"] - f) < 2e-3


def test_q318_coverage_monotone_and_recount(spark):
    """Coverage is non-increasing in k, bounded by 1, and k=3 equals
    the share of parts with a full 3-rec shelf."""
    from pyspark.sql import functions as F

    from aws_datalake_platform_spark.catalog import load_table

    rows = sorted(
        QUERY_REGISTRY["q318_rec_coverage"].fn(spark, SF_SMOKE).collect(),
        key=lambda r: r["k"],
    )
    assert [r["k"] for r in rows] == [1, 2, 3]
    n_parts = load_table(spark, SF_SMOKE, "part").count()
    recs = QUERY_REGISTRY["q271_copurchase_recs"].fn(spark, SF_SMOKE)
    per = recs.groupBy("part").agg(F.count(F.lit(1)).alias("c")).collect()
    for k, row in zip((1, 2, 3), rows):
        covered = sum(1 for r in per if r["c"] >= k)
        assert row["n_parts_covered"] == covered
        assert abs(row["coverage_frac"] - covered / n_parts) < 1e-6
    assert rows[0]["n_parts_covered"] >= rows[1]["n_parts_covered"] >= rows[2]["n_parts_covered"]


def test_q319_stop_shingle_plan_recompute(spark):
    """Recompute one cap's counters from the raw shingle df histogram
    and pin monotonicity (a larger cap prunes no more work)."""
    from collections import Counter

    from aws_datalake_platform_spark.catalog import load_table
    from pyspark.sql import functions as F

    rows = sorted(
        QUERY_REGISTRY["q319_stop_shingle_plan"].fn(spark, SF_SMOKE).collect(),
        key=lambda r: r["max_df"],
    )
    assert [r["max_df"] for r in rows] == [4, 16, 64, 256, 1024]
    docs = load_table(spark, SF_SMOKE, "documents")
    sh = (
        docs.filter(F.length(F.trim("text")) > 0)
        .select("doc_id", F.split(F.trim(F.lower("text")), r"\s+").alias("t"))
        .filter(F.size("t") >= 3)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(t) - 2), "
                    "i -> concat_ws(' ', slice(t, i, 3)))"
                )
            ).alias("s"),
        )
        .distinct()
        .collect()
    )
    dfs = Counter(r["s"] for r in sh)
    total = sum(d * (d - 1) for d in dfs.values())
    for row in rows:
        cap = row["max_df"]
        stop = sum(1 for d in dfs.values() if d > cap)
        kept = sum(d * (d - 1) for d in dfs.values() if d <= cap)
        assert row["n_stop_shingles"] == stop
        assert row["kept_pair_work"] == kept
        assert row["total_pair_work"] == total
    for a, b in zip(rows, rows[1:]):
        assert b["kept_pair_work"] >= a["kept_pair_work"]
        assert b["work_pruned_frac"] <= a["work_pruned_frac"] + 1e-9


def test_q320_winsorize_recompute(spark):
    """Recompute the p99 cut and both means in exact integer cents."""
    import math

    from aws_datalake_platform_spark.catalog import load_table

    [row] = QUERY_REGISTRY["q320_winsorize_impact"].fn(spark, SF_SMOKE).collect()
    vals = sorted(
        round(r["o_totalprice"] * 100)
        for r in load_table(spark, SF_SMOKE, "orders").collect()
    )
    n = len(vals)
    p99 = vals[math.ceil(0.99 * n) - 1]
    assert row["n_orders"] == n
    assert abs(row["p99_value"] - p99 / 100) < 0.01
    assert row["n_clamped"] == sum(1 for v in vals if v > p99)
    s_raw = sum(vals)
    s_win = sum(min(v, p99) for v in vals)
    assert abs(row["mean_raw"] - s_raw / n / 100) < 1e-3
    assert abs(row["mean_winsorized"] - s_win / n / 100) < 1e-3
    assert row["mean_winsorized"] <= row["mean_raw"]
    assert abs(row["mass_clamped_frac"] - (s_raw - s_win) / s_raw) < 1e-6


def test_q321_partition_balance_recompute(spark):
    """Recompute the 8-bucket distribution with hashlib and pin the
    skew-factor identity max/(total/n)."""
    import hashlib

    from aws_datalake_platform_spark.catalog import load_table

    rows = sorted(
        QUERY_REGISTRY["q321_partition_balance_plan"].fn(spark, SF_SMOKE).collect(),
        key=lambda r: r["n_buckets"],
    )
    assert [r["n_buckets"] for r in rows] == [8, 32, 128]
    keys = [
        r["l_orderkey"]
        for r in load_table(spark, SF_SMOKE, "lineitem")
        .select("l_orderkey")
        .collect()
    ]
    from collections import Counter

    buckets = Counter(
        int(hashlib.md5(f"part42{k}".encode()).hexdigest()[:13], 16) % 8
        for k in keys
    )
    row8 = rows[0]
    assert row8["total_rows"] == len(keys)
    assert row8["max_bucket_rows"] == max(buckets.values())
    expect = max(buckets.values()) / (len(keys) / 8)
    assert abs(row8["skew_factor"] - expect) < 1e-3
    # every plan row: skew >= 1 by construction
    assert all(r["skew_factor"] >= 1.0 for r in rows)


def test_q322_filter_order_plan_invariants(spark):
    """Greedy order sorts by solo rejection rate; docs_evaluated is
    non-increasing, starts at the corpus size, and each stage's
    attrition matches the first-rejecting-rule attribution recomputed
    from q192's flags."""
    rows = sorted(
        QUERY_REGISTRY["q322_filter_order_plan"].fn(spark, SF_SMOKE).collect(),
        key=lambda r: r["eval_order"],
    )
    assert [r["eval_order"] for r in rows] == [1, 2, 3, 4, 5]
    rejects = [r["n_reject_solo"] for r in rows]
    assert rejects == sorted(rejects, reverse=True)

    flags = QUERY_REGISTRY["q192_gopher_quality_rules"].fn(spark, SF_SMOKE).collect()
    n_docs = len(flags)
    assert rows[0]["docs_evaluated"] == n_docs
    order = [r["rule"] for r in rows]
    evaluated = [0] * 5
    for doc in flags:
        for k, rule in enumerate(order):
            evaluated[k] += 1
            if not doc[rule]:
                break
    for k, r in enumerate(rows):
        assert r["docs_evaluated"] == evaluated[k], r["rule"]
    des = [r["docs_evaluated"] for r in rows]
    assert des == sorted(des, reverse=True)
