"""Invariant tests for the lakehouse change-management queries (q142-q144):
properties the DuckDB hash-match can't express — interval tiling, MERGE
idempotence, and the count-min one-sided error guarantee."""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_datalake_platform_spark.plans.queries import QUERY_REGISTRY

from .conftest import SF_SMOKE


def test_scd2_intervals_tile_each_user_history(spark):
    """Per user: exactly one open (is_current) interval, no interval
    overlaps, and each closed interval's valid_to equals the next
    interval's valid_from (the history tiles with no gaps)."""
    df = QUERY_REGISTRY["q142_scd2_intervals"].fn(spark, SF_SMOKE).cache()
    open_counts = (
        df.groupBy("user_id")
        .agg(F.sum(F.col("is_current").cast("int")).alias("n_open"))
        .filter(F.col("n_open") != 1)
    )
    assert open_counts.count() == 0
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("valid_from")
    gaps = df.withColumn("next_from", F.lead("valid_from").over(w)).filter(
        F.col("valid_to").isNotNull() & (F.col("valid_to") != F.col("next_from"))
    )
    assert gaps.count() == 0
    df.unpersist()


def test_scd2_states_change_at_every_boundary(spark):
    """Consecutive intervals of one user never carry the same state —
    the gaps-and-islands collapse really merged same-state runs."""
    from pyspark.sql import Window

    df = QUERY_REGISTRY["q142_scd2_intervals"].fn(spark, SF_SMOKE)
    w = Window.partitionBy("user_id").orderBy("valid_from")
    repeats = df.withColumn("prev_state", F.lag("state").over(w)).filter(
        F.col("state") == F.col("prev_state")
    )
    assert repeats.count() == 0


def test_cdc_merge_respects_ops(spark):
    """Deleted keys (custkey%37==0, not overridden by %41 insert-shift)
    vanish, inserted keys appear under the shifted id with NEW# names,
    and every surviving updated key carries its latest order total."""
    merged = QUERY_REGISTRY["q143_cdc_merge_apply"].fn(spark, SF_SMOKE).cache()
    # %37 keys only ever produce 'D' ops (unless %41 shifts them into
    # inserts, e.g. custkey 0), so exactly the (%37, not %41) keys with
    # at least one order must vanish
    from aws_datalake_platform_spark.catalog import load_table

    orders = load_table(spark, SF_SMOKE, "orders")
    d_keys = (
        orders.filter((F.col("o_custkey") % 37 == 0) & (F.col("o_custkey") % 41 != 0))
        .select(F.col("o_custkey").alias("c_custkey"))
        .distinct()
    )
    assert merged.join(d_keys, "c_custkey", "left_semi").count() == 0
    inserts = merged.filter(F.col("c_custkey") >= 10000000)
    assert inserts.count() > 0
    assert inserts.filter(~F.col("c_name").startswith("NEW#")).count() == 0
    merged.unpersist()


def test_countmin_never_underestimates(spark):
    """CMS guarantee: estimate >= true count for every key (one-sided
    error); at least one key should be exact (collision-free buckets)."""
    rows = QUERY_REGISTRY["q144_countmin_sketch"].fn(spark, SF_SMOKE).collect()
    assert rows, "no keys probed"
    assert all(r.cms_cnt >= r.true_cnt for r in rows)
    assert any(r.cms_cnt == r.true_cnt for r in rows)
