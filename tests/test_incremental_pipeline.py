"""Daily-batch incremental curation (pipelines/incremental.py).

The planted 10-day simulation is the contract: every cross-day exact
copy and near-copy is caught against the STORED index (never the prior
text), the final curated set equals a full recompute over the union,
and per-day state appends version monotonically.
"""

from __future__ import annotations

import pytest

from aws_datalake_platform_spark.pipelines.incremental import (
    CENTROIDS,
    DEDUP_INDEX,
    SEMANTIC_INDEX,
    curate_incremental,
)

N_DAYS = 10
N_ORIG = 30  # originals per day
N_EXACT = 5  # cross-day exact copies planted per day (of day N-1 docs)
N_NEAR = 3  # cross-day near copies (one word appended, J ~ 0.93)


def _text(day: int, j: int) -> str:
    # 30 unique tokens per doc -> no accidental shingle overlap between
    # originals; near-copy Jaccard (28+1 shared of 28+1+2) ~ 0.93
    return f"day{day} doc{j} " + " ".join(f"w{day}x{j}y{t}" for t in range(28))


def _day_rows(day: int) -> list[tuple[int, str, str, str, int]]:
    rows = []
    for j in range(N_ORIG):
        t = _text(day, j)
        rows.append((day * 1000 + j, t, "en", f"s{day % 3}", len(t)))
    if day > 0:
        for j in range(N_EXACT):  # exact copies of yesterday's originals
            t = _text(day - 1, j)
            rows.append((day * 1000 + 500 + j, t, "en", "dup", len(t)))
        for j in range(N_NEAR):  # near copies: one token appended
            t = _text(day - 1, 10 + j) + " extraword"
            rows.append((day * 1000 + 600 + j, t, "en", "dup", len(t)))
    # within-day exact copy of today's first original
    t = _text(day, 0)
    rows.append((day * 1000 + 700, t, "en", "dup", len(t)))
    return rows


SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


@pytest.fixture(scope="module")
def sim(spark, tmp_path_factory):
    """Run the 10-day simulation once; tests assert on the collected
    per-day reports + final state."""
    state = str(tmp_path_factory.mktemp("inc_state"))
    reports = []
    for day in range(N_DAYS):
        batch = spark.createDataFrame(_day_rows(day), SCHEMA)
        r = curate_incremental(spark, batch, state, near_dup_threshold=0.5)
        r["survivor_ids"] = {
            x["doc_id"] for x in r["curated"].select("doc_id").collect()
        }
        del r["curated"]
        reports.append(r)
    return state, reports


def test_day0_bootstraps_and_later_days_catch_cross_day_dups(sim):
    _, reports = sim
    assert reports[0]["bootstrap"] is True
    assert reports[0]["n_corpus_exact_dup"] == 0
    assert reports[0]["n_final"] == N_ORIG  # within-day copy dropped
    for day in range(1, N_DAYS):
        r = reports[day]
        assert r["bootstrap"] is False
        # every planted cross-day copy judged against the STORED index
        assert r["n_corpus_exact_dup"] == N_EXACT, day
        assert r["n_corpus_near_dup"] == N_NEAR, day
        # all originals survive, every planted dup dropped
        assert r["n_final"] == N_ORIG, day
        assert r["survivor_ids"] == {day * 1000 + j for j in range(N_ORIG)}


def test_incremental_equals_full_recompute(spark, sim):
    """Recall vs full-recompute: the union of per-day survivors equals
    exact + MinHash-LSH near-dup dedup (keep min id per component) run
    over the whole 10-day corpus at once."""
    from pyspark.sql import functions as F

    from aws_datalake_platform_spark.operators.dedup import (
        connected_components,
        exact_dedup,
        minhash_lsh_pairs,
    )

    _, reports = sim
    incremental = set().union(*(r["survivor_ids"] for r in reports))

    rows = [row for day in range(N_DAYS) for row in _day_rows(day)]
    full = spark.createDataFrame(rows, SCHEMA)
    surv = exact_dedup(full, "doc_id", "text")
    pairs = minhash_lsh_pairs(surv, "doc_id", "text", threshold=0.5)
    comp = connected_components(pairs, "doc_a", "doc_b")
    losers = comp.filter(F.col("node") != F.col("comp")).select(
        F.col("node").alias("doc_id")
    )
    surv = surv.join(losers, "doc_id", "left_anti")
    recompute = {x["doc_id"] for x in surv.select("doc_id").collect()}
    assert incremental == recompute


def test_state_versions_grow_and_store_no_text(spark, sim):
    from aws_datalake_platform_spark.operators.snapshots import (
        list_snapshots,
        read_snapshot,
    )

    state, reports = sim
    assert [r["dedup_index_version"] for r in reports] == list(range(1, N_DAYS + 1))
    snaps = list_snapshots(f"{state}/{DEDUP_INDEX}")
    assert len(snaps) == N_DAYS
    idx = read_snapshot(spark, f"{state}/{DEDUP_INDEX}")
    # the stored artifact is metadata only — corpus text never persists
    assert "text" not in idx.columns
    assert set(idx.columns) == {"__id", "__fp", "__bks", "__mh"}
    # one index row per curated doc
    assert idx.count() == sum(r["n_final"] for r in reports)
    # appends reference prior days' files: day-N version holds N data dirs
    assert len(snaps[-1]["data_dirs"]) == N_DAYS


def test_semantic_pass_catches_cross_day_embedding_twins(spark, tmp_path):
    """3-day semantic run: orthogonal per-doc embeddings, day-1/2 plant
    embedding TWINS of earlier docs under fresh text (text dedup can't
    catch them) — the stored semantic index must."""
    state = str(tmp_path / "sem_state")
    dim = 16

    def emb_vec(k: int, jitter: float = 0.0) -> list[float]:
        v = [0.0] * dim
        v[k % dim] = 1.0
        if jitter:
            v[(k + 7) % dim] = jitter
        return v

    # day 0: 8 originals
    docs0 = [(i, f"zero {i} " + " ".join(f"a{i}b{t}" for t in range(10)),
              "en", "s", 40) for i in range(8)]
    emb0 = [(i, emb_vec(i)) for i in range(8)]
    # day 1: 4 new originals + 2 twins of day-0 docs (new text, ~same vec)
    docs1 = [(100 + i, f"one {i} " + " ".join(f"c{i}d{t}" for t in range(10)),
              "en", "s", 40) for i in range(4)]
    emb1 = [(100 + i, emb_vec(8 + i)) for i in range(4)]
    docs1 += [(150 + i, f"twin {i} " + " ".join(f"e{i}f{t}" for t in range(10)),
               "en", "s", 40) for i in range(2)]
    emb1 += [(150 + i, emb_vec(i, jitter=0.001)) for i in range(2)]

    eschema = "doc_id long, embedding array<double>"
    r0 = curate_incremental(
        spark,
        spark.createDataFrame(docs0, SCHEMA),
        state,
        batch_embeddings=spark.createDataFrame(emb0, eschema),
        semantic_threshold=0.97,
        n_centroids=4,
    )
    assert r0["n_final"] == 8 and r0["n_semantic_dup"] == 0

    r1 = curate_incremental(
        spark,
        spark.createDataFrame(docs1, SCHEMA),
        state,
        batch_embeddings=spark.createDataFrame(emb1, eschema),
        semantic_threshold=0.97,
        n_centroids=4,
    )
    # both twins dropped against the STORED semantic index; originals kept
    assert r1["n_semantic_dup"] == 2
    surv = {x["doc_id"] for x in r1["curated"].select("doc_id").collect()}
    assert surv == {100, 101, 102, 103}
    # state holds centroids + assignments for exactly the curated docs
    from aws_datalake_platform_spark.operators.snapshots import read_snapshot

    assert read_snapshot(spark, f"{state}/{CENTROIDS}").count() == 4
    assert read_snapshot(spark, f"{state}/{SEMANTIC_INDEX}").count() == 12

    # half-configured semantic stage fails loud (same contract as
    # curate_corpus)
    with pytest.raises(ValueError, match="semantic_threshold"):
        curate_incremental(
            spark, spark.createDataFrame(docs0, SCHEMA), state,
            batch_embeddings=spark.createDataFrame(emb0, eschema),
        )


def test_cli_curate_incremental(spark, tmp_path, capsys):
    from aws_datalake_platform_spark.__main__ import main

    state = str(tmp_path / "cli_state")
    rc = main([
        "curate-incremental", "--state", state,
        "--sf-dir", "/root/testdata/sf0.001", "--day", "0", "--of", "10",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "bootstrap: True" in out and "dedup_index_version: 1" in out

    rc = main([
        "curate-incremental", "--state", state,
        "--sf-dir", "/root/testdata/sf0.001", "--day", "1", "--of", "10",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "bootstrap: False" in out and "dedup_index_version: 2" in out


def test_curate_stream_drives_incremental_state(spark, tmp_path):
    """Streaming front end: three parquet drops become three
    micro-batches (maxFilesPerTrigger=1); each is curated against the
    state its predecessors built — the day-2 planted copy of a day-0
    doc is caught as a corpus duplicate, and the state ends at
    version 3."""
    from aws_datalake_platform_spark.operators.snapshots import list_snapshots
    from aws_datalake_platform_spark.pipelines.incremental import curate_stream

    inp = tmp_path / "drops"
    state = str(tmp_path / "stream_state")
    ckpt = str(tmp_path / "ckpt")
    inp.mkdir()

    def drop_day(day: int, extra=()):
        # the file source watches FILES under input_dir (it does not
        # recurse into per-batch subdirectories) — stage the write,
        # then move the single part file in as bN.parquet
        import glob as _glob
        import shutil as _shutil

        rows = list(_day_rows(day))[: N_ORIG] + list(extra)
        staging = str(tmp_path / f"staging_{day}")
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(staging)
        [part] = _glob.glob(f"{staging}/part-*.parquet")
        _shutil.move(part, str(inp / f"b{day}.parquet"))

    # day files dropped up front; availableNow drains them in order
    drop_day(0)
    drop_day(1)
    copy_of_day0 = (99_999, _text(0, 3), "en", "dup", len(_text(0, 3)))
    drop_day(2, extra=[copy_of_day0])

    reports = curate_stream(spark, str(inp), state, ckpt)
    assert [r["batch_id"] for r in reports] == [0, 1, 2]
    assert reports[0]["bootstrap"] is True
    assert reports[1]["bootstrap"] is False
    # day 2 catches the planted cross-batch copy against stored state
    assert reports[2]["n_corpus_exact_dup"] == 1
    assert reports[2]["n_final"] == N_ORIG
    assert [r["dedup_index_version"] for r in reports] == [1, 2, 3]
    assert len(list_snapshots(f"{state}/dedup_index")) == 3

    # replay idempotence: a fresh checkpoint re-processes every file,
    # and the dedup itself makes the replay harmless — every doc is an
    # exact_dup of what the first run appended, nothing survives
    reports2 = curate_stream(spark, str(inp), state, str(tmp_path / "ckpt2"))
    assert all(r["n_final"] == 0 for r in reports2)
    assert all(
        r["n_corpus_exact_dup"] == r["n_after_batch_near"] for r in reports2
    )
