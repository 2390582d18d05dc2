"""Targeted tests for the extended surface: approx-distinct error bound,
IVF ANN recall vs brute force, and salted-agg equivalence."""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_datalake_platform_spark.catalog import load_table
from aws_datalake_platform_spark.operators.similarity import brute_force_topk, ivf_topk
from aws_datalake_platform_spark.plans.queries import QUERY_REGISTRY

from .conftest import SF_SMOKE


def test_approx_distinct_within_bound(spark):
    got = {
        r["event_type"]: r["approx_users"]
        for r in QUERY_REGISTRY["q40_approx_distinct"].fn(spark, SF_SMOKE).collect()
    }
    ev = load_table(spark, SF_SMOKE, "events")
    exact = {
        r["event_type"]: r["exact"]
        for r in ev.groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("exact"))
        .collect()
    }
    assert set(got) == set(exact)
    for et, est in got.items():
        assert abs(est - exact[et]) <= max(2, 0.05 * exact[et]), (et, est, exact[et])


def test_ivf_kmeans_centroids_on_clustered_data(spark):
    """k-means centroids must adapt to real cluster structure: 4 tight
    orthogonal clusters, n_probe=1 — each query probes exactly its own
    cluster's list, so recall vs brute force should be ~1. (The former
    lowest-id centroid heuristic put all 4 'centroids' inside cluster 0
    and failed this.)"""
    import numpy as np

    rng = np.random.RandomState(7)
    dim, per_cluster = 64, 50
    rows = []
    for c in range(4):
        base = np.zeros(dim)
        base[c] = 1.0
        for _ in range(per_cluster):
            v = base + 0.05 * rng.randn(dim)
            rows.append((len(rows), [float(x) for x in v]))
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    queries = corpus.filter(F.col("vec_id") % per_cluster == 0)  # one per cluster

    truth = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(queries, corpus, k=5).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf_topk(queries, corpus, k=5, n_centroids=4, n_probe=1).collect()
    }
    recall = len(truth & approx) / len(truth)
    assert recall >= 0.95, f"recall {recall:.2f}"


def test_ivf_recall_vs_brute_force(spark):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    truth = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(queries, emb, k=5).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf_topk(queries, emb, k=5, n_centroids=8, n_probe=4).collect()
    }
    # probing half the lists must recover a solid fraction of true neighbors
    recall = len(truth & approx) / len(truth)
    assert recall >= 0.5, f"recall {recall:.2f}"
    # every query produced a full (or near-full) result set
    per_q = {}
    for q, _ in approx:
        per_q[q] = per_q.get(q, 0) + 1
    assert all(v >= 1 for v in per_q.values())


def test_salted_agg_equals_plain(spark):
    ev = load_table(spark, SF_SMOKE, "events")
    plain = {
        r["user_id"]: (r["n_events"], r["sum_value"])
        for r in ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
        .collect()
    }
    salted = {
        r["user_id"]: (r["n_events"], r["sum_value"])
        for r in QUERY_REGISTRY["q45_salted_agg"].fn(spark, SF_SMOKE).collect()
    }
    assert plain == salted


def test_bucketed_join_no_exchange(spark, tmp_path):
    """Both sides bucketed by the join key into the same bucket count ->
    sort-merge join with zero Exchange operators (the 100 TB co-located
    join contract), and the same rows as the shuffled plan."""
    from aws_datalake_platform_spark.operators.bucketing import bucketed_join, write_bucketed

    orders = load_table(spark, SF_SMOKE, "orders").select("o_custkey", "o_totalprice")
    customer = load_table(spark, SF_SMOKE, "customer").select("c_custkey", "c_mktsegment")
    write_bucketed(orders, "t_b_orders", "o_custkey", 4, str(tmp_path / "o"))
    write_bucketed(customer, "t_b_customer", "c_custkey", 4, str(tmp_path / "c"))

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", -1)
    try:
        joined = bucketed_join(
            spark, "t_b_orders", "t_b_customer", F.col("o_custkey") == F.col("c_custkey")
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        expected = orders.join(customer, F.col("o_custkey") == F.col("c_custkey")).count()
        assert joined.count() == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS t_b_orders")
        spark.sql("DROP TABLE IF EXISTS t_b_customer")


def test_stratified_sample_fractions(spark):
    """Per-stratum hash sampling: rates land near spec, absent strata drop,
    and membership is deterministic across invocations."""
    from aws_datalake_platform_spark.operators.sampling import stratified_sample

    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "lang")
    totals = {r["lang"]: r["cnt"] for r in docs.groupBy("lang").agg(F.count("*").alias("cnt")).collect()}
    langs = sorted(totals)
    keep_all, keep_tenth = langs[0], langs[1]
    out = stratified_sample(docs, "doc_id", "lang", {keep_all: 1.0, keep_tenth: 0.5}, seed=7)
    got = {r["lang"]: r["cnt"] for r in out.groupBy("lang").agg(F.count("*").alias("cnt")).collect()}
    assert got[keep_all] == totals[keep_all]
    assert set(got) == {keep_all, keep_tenth}  # unlisted strata dropped
    # binomial(n, 0.5) within 4 sigma
    import math
    n = totals[keep_tenth]
    assert abs(got[keep_tenth] - 0.5 * n) <= 4 * math.sqrt(n * 0.25) + 1
    again = stratified_sample(docs, "doc_id", "lang", {keep_all: 1.0, keep_tenth: 0.5}, seed=7)
    assert {r["doc_id"] for r in again.collect()} == {r["doc_id"] for r in out.collect()}
