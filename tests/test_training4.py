"""Semantic invariant tests for the round-7 session-5 queries (q414+).

The parametrized oracle test in test_queries_oracle.py already
hash-checks each against DuckDB; these pin the MATH — each query's
statistic recomputed from raw rows by an independent (plain
Python/collections) implementation.
"""

from __future__ import annotations

import hashlib
import math
import re
from collections import Counter

from aws_datalake_platform_spark.catalog import TESTDATA_TABLES, load_table
from aws_datalake_platform_spark.plans.queries import QUERY_REGISTRY

from .conftest import SF_SMOKE


def _doc_tokens(spark):
    """(doc_id, lang, [tokens]) exactly as q414/q415 tokenize."""
    rows = (
        load_table(spark, SF_SMOKE, "documents")
        .select("doc_id", "lang", "text")
        .collect()
    )
    out = []
    for r in rows:
        toks = [w for w in re.split(r"\s+", r["text"].strip().lower()) if w]
        out.append((r["doc_id"], r["lang"], toks))
    return out


def _md5_bucket(prefix: str, key: str, mod: int) -> int:
    h = hashlib.md5((prefix + key).encode()).hexdigest()
    return int(h[:15], 16) % mod


def test_q414_dsir_recompute(spark):
    """Top-25 DSIR weights recomputed independently: same ranking, and
    the winners must skew overwhelmingly English (the target domain)."""
    out = QUERY_REGISTRY["q414_dsir_importance_weights"].fn(spark, SF_SMOKE).collect()
    assert len(out) == 25
    docs = _doc_tokens(spark)
    B, SC = 256, 1_000_000
    c_raw: Counter = Counter()
    c_tgt: Counter = Counter()
    for _, lang, toks in docs:
        for w in toks:
            b = _md5_bucket("dsir|", w, B)
            c_raw[b] += 1
            if lang == "en":
                c_tgt[b] += 1
    n_raw = sum(c_raw.values())
    n_tgt = sum(c_tgt.values())
    llr_q = {
        b: math.floor(
            (
                math.log((c_tgt.get(b, 0) + 1.0) / (n_tgt + B))
                - math.log((c_raw[b] + 1.0) / (n_raw + B))
            )
            * SC
            + 0.5
        )
        for b in c_raw
    }
    scored = []
    for doc_id, _, toks in docs:
        if not toks:
            continue
        lw = sum(llr_q[_md5_bucket("dsir|", w, B)] for w in toks)
        scored.append((doc_id, len(toks), lw))
    scored.sort(key=lambda t: (-t[2], t[0]))
    want = scored[:25]
    got = [(r["doc_id"], r["n_tokens"]) for r in out]
    assert got == [(d, n) for d, n, _ in want]
    # winners should be ENRICHED in the target domain: hashed-unigram
    # LLR over 256 buckets is a noisy lang-id at tiny SF, so pin the
    # actual DSIR claim — top-25 English share strictly above the
    # corpus base rate — not an absolute count.
    lang_by_id = {d: lang for d, lang, _ in docs}
    n_en = sum(1 for d, _ in got if lang_by_id[d] == "en")
    base = sum(1 for _, lang, _ in docs if lang == "en") / len(docs)
    assert n_en / 25 > base, (
        f"top-25 English share {n_en}/25 not enriched over base {base:.2f}"
    )
    # rank column is 1..25 in order
    assert [r["rank"] for r in out] == list(range(1, 26))


def test_q415_logistic_against_float_irls(spark):
    """The fixed-point IRLS fit must agree with an independent FLOAT
    Newton solve to ~1e-3, the slope must be positive (longer docs
    pass the word-count gate), and the score residuals must certify
    convergence."""
    out = QUERY_REGISTRY["q415_logistic_quality_irls"].fn(spark, SF_SMOKE).collect()
    assert len(out) == 1
    got = out[0]
    rows = (
        load_table(spark, SF_SMOKE, "documents")
        .select("doc_id", "text", "n_chars")
        .collect()
    )
    grid: Counter = Counter()
    pos: Counter = Counter()
    n_docs = 0
    for r in rows:
        n_docs += 1
        wc = len(re.split(r"\s+", r["text"].strip().lower()))
        y = 1 if wc >= 50 else 0
        x = min(r["n_chars"] // 32, 19)
        grid[x] += 1
        pos[x] += y
    assert got["n_docs"] == n_docs
    assert got["n_positive"] == sum(pos.values())
    assert got["n_buckets"] == len(grid)
    # independent float Newton on the SAME ridge (lambda=1) objective,
    # no quantization
    b0 = b1 = 0.0
    for _ in range(40):
        g0 = g1 = h00 = h01 = h11 = 0.0
        for x, n in grid.items():
            k = pos[x]
            p = 1.0 / (1.0 + math.exp(-(b0 + b1 * x)))
            g0 += k - n * p
            g1 += x * (k - n * p)
            h00 += n * p * (1 - p)
            h01 += x * n * p * (1 - p)
            h11 += x * x * n * p * (1 - p)
        g0 -= b0
        g1 -= b1
        h00 += 1.0
        h11 += 1.0
        det = h00 * h11 - h01 * h01
        b0 += (h11 * g0 - h01 * g1) / det
        b1 += (h00 * g1 - h01 * g0) / det
    assert abs(got["beta0"] - b0) < 1e-3
    assert abs(got["beta1"] - b1) < 1e-3
    assert got["beta1"] > 0  # longer docs pass the word-count gate
    assert abs(got["odds_ratio_per_bucket"] - math.exp(b1)) < 1e-2
    assert got["score_residual0"] < 0.01
    assert got["score_residual1"] < 0.05
    assert got["se_beta1"] > 0
    assert abs(got["z_beta1"] - got["beta1"] / got["se_beta1"]) < 1e-3


def test_q416_hbos_recompute(spark):
    """Top-20 HBOS orders recomputed independently: identical ranking,
    and every reported order must sit in a strictly rarer-or-equal
    density cell than any non-reported order."""
    out = QUERY_REGISTRY["q416_hbos_outliers"].fn(spark, SF_SMOKE).collect()
    assert len(out) == 20
    orders = load_table(spark, SF_SMOKE, "orders").select(
        "o_orderkey", "o_totalprice"
    ).collect()
    li = load_table(spark, SF_SMOKE, "lineitem").select("l_orderkey").collect()
    items: Counter = Counter(r["l_orderkey"] for r in li)
    B, SC = 16, 1_000_000
    feat = [
        (
            r["o_orderkey"],
            math.floor(r["o_totalprice"] * 100 + 0.5),
            items.get(r["o_orderkey"], 0),
        )
        for r in orders
    ]
    n = len(feat)
    c_lo = min(c for _, c, _ in feat)
    c_hi = max(c for _, c, _ in feat)
    i_lo = min(i for _, _, i in feat)
    i_hi = max(i for _, _, i in feat)
    cb_of = lambda c: min(math.floor((c - c_lo) * B * 1.0 / max(c_hi - c_lo + 1, 1)), B - 1)  # noqa: E731
    ib_of = lambda i: min(math.floor((i - i_lo) * B * 1.0 / max(i_hi - i_lo + 1, 1)), B - 1)  # noqa: E731
    chist: Counter = Counter(cb_of(c) for _, c, _ in feat)
    ihist: Counter = Counter(ib_of(i) for _, _, i in feat)
    sc_q = {b: math.floor(-math.log(v / n) * SC + 0.5) for b, v in chist.items()}
    si_q = {b: math.floor(-math.log(v / n) * SC + 0.5) for b, v in ihist.items()}
    scored = [
        (ok, c, i, sc_q[cb_of(c)] + si_q[ib_of(i)]) for ok, c, i in feat
    ]
    scored.sort(key=lambda t: (-t[3], t[0]))
    want = scored[:20]
    got = [(r["o_orderkey"], r["n_items"]) for r in out]
    assert got == [(ok, i) for ok, _, i, _ in want]
    # outlier property: min reported score >= max non-reported score
    min_in = min(s for _, _, _, s in want)
    max_out = max((s for _, _, _, s in scored[20:]), default=0)
    assert min_in >= max_out
    assert [r["rank"] for r in out] == list(range(1, 21))


def test_q418_chimerge_recompute(spark):
    """The merge sequence recomputed independently with FLOAT chi2 (no
    quantization) must produce the same final partition, the bins must
    tile the base-bin range in order, and counts must sum to the
    order count."""
    out = QUERY_REGISTRY["q418_chimerge_binning_plan"].fn(spark, SF_SMOKE).collect()
    orders = load_table(spark, SF_SMOKE, "orders").select(
        "o_totalprice", "o_orderpriority"
    ).collect()
    feat = [
        (
            math.floor(r["o_totalprice"] * 100 + 0.5),
            1 if r["o_orderpriority"] in ("1-URGENT", "2-HIGH") else 0,
        )
        for r in orders
    ]
    lo = min(c for c, _ in feat)
    hi = max(c for c, _ in feat)
    B = 16
    base: dict[int, list[int]] = {}
    for c, y in feat:
        bb = min(math.floor((c - lo) * B * 1.0 / max(hi - lo + 1, 1)), B - 1)
        e = base.setdefault(bb, [0, 0])
        e[0] += 1
        e[1] += y
    mb = {bb: bb for bb in base}
    for _ in range(8):
        merged: dict[int, list[int]] = {}
        for bb, lab in mb.items():
            merged.setdefault(lab, []).append(bb)
        labs = sorted(merged)
        if len(labs) < 2:
            break
        cand = []
        for j in range(len(labs) - 1):
            n1 = sum(base[bb][0] for bb in merged[labs[j]])
            k1 = sum(base[bb][1] for bb in merged[labs[j]])
            n2 = sum(base[bb][0] for bb in merged[labs[j + 1]])
            k2 = sum(base[bb][1] for bb in merged[labs[j + 1]])
            a, b, c, d = k1, n1 - k1, k2, n2 - k2
            if a + c == 0 or b + d == 0:
                q = 0.0
            else:
                q = (
                    (a + b + c + d)
                    * (a * d - b * c) ** 2
                    / ((a + c) * (b + d) * (a + b) * (c + d))
                )
            cand.append((q, labs[j], labs[j + 1]))
        _, b1, b2 = min(cand)
        for bb, lab in mb.items():
            if lab == b2:
                mb[bb] = b1
    groups: dict[int, list[int]] = {}
    for bb, lab in mb.items():
        groups.setdefault(lab, []).append(bb)
    want = [
        (min(bs), max(bs), sum(base[b][0] for b in bs), sum(base[b][1] for b in bs))
        for bs in (sorted(groups[lab]) for lab in sorted(groups))
    ]
    got = [
        (r["first_base_bin"], r["last_base_bin"], r["n_orders"], r["n_high_priority"])
        for r in out
    ]
    assert got == want
    # bins tile the range in order with no overlap
    for prev, cur in zip(out, out[1:]):
        assert cur["first_base_bin"] > prev["last_base_bin"]
    assert sum(r["n_orders"] for r in out) == len(feat)
    assert all(r["n_final_bins"] == len(out) for r in out)


def test_q418_degenerate_constant_price_matches_oracle(spark, tmp_path):
    """ADVICE r7: with a near-constant o_totalprice only ONE base bin
    populates, every merge round finds no adjacent pair, and the
    oracle's per-round best{i} CTE is empty — the LEFT JOIN ON TRUE
    guard must make those rounds no-ops (matching the Spark loop's
    break) instead of collapsing the chain to zero rows."""
    import pyarrow.parquet as pq
    import pyarrow.compute as pc

    from .oracle import compare, duckdb_conn

    dst = tmp_path / "degenerate"
    dst.mkdir()
    for t in TESTDATA_TABLES:
        src = pq.read_table(f"{SF_SMOKE}/{t}.parquet")
        if t == "orders":
            const = pc.multiply(
                pc.divide(src.column("o_totalprice"), src.column("o_totalprice")),
                42.5,
            )
            src = src.set_column(
                src.schema.get_field_index("o_totalprice"), "o_totalprice", const
            )
        pq.write_table(src, str(dst / f"{t}.parquet"))
    spec = QUERY_REGISTRY["q418_chimerge_binning_plan"]
    out = spec.fn(spark, str(dst)).collect()
    assert len(out) == 1  # one populated bin survives untouched
    assert out[0]["n_final_bins"] == 1
    ok, msg = compare(spec.fn(spark, str(dst)), duckdb_conn(str(dst)), spec.sql)
    assert ok, msg


def test_q419_mixture_recompute(spark):
    """Mixture shares recomputed independently from raw tokens: shares
    sum to ~100, every source keeps at least half its natural share
    (the alpha=0.5 floor), and higher excess loss implies a weakly
    higher doremi tilt."""
    out = QUERY_REGISTRY["q419_domain_mixture_plan"].fn(spark, SF_SMOKE).collect()
    docs = (
        load_table(spark, SF_SMOKE, "documents").select("source", "text").collect()
    )
    vocab: Counter = Counter()
    per_src: dict[str, Counter] = {}
    for r in docs:
        toks = [w for w in re.split(r"\s+", r["text"].strip().lower()) if w]
        vocab.update(toks)
        per_src.setdefault(r["source"], Counter()).update(toks)
    total = sum(vocab.values())
    SC = 1_000_000
    nll_q = {w: math.floor(-math.log(c * 1.0 / total) * SC + 0.5) for w, c in vocab.items()}
    ce = {
        s: math.floor(sum(c * nll_q[w] for w, c in cnt.items()) * 1.0 / sum(cnt.values()) + 0.5)
        for s, cnt in per_src.items()
    }
    assert len(out) == len(per_src)
    by_src = {r["source"]: r for r in out}
    for s, cq in ce.items():
        # true milli-nats (one /1000 from micro-nats — q429 convention)
        assert abs(by_src[s]["ce_milli_nats"] - math.floor(cq / 1000.0 + 0.5)) < 1e-9
    assert abs(sum(r["mixture_share_pct"] for r in out) - 100.0) < 0.05
    assert abs(sum(r["doremi_share_pct"] for r in out) - 100.0) < 0.05
    for r in out:
        assert r["mixture_share_pct"] >= 0.5 * r["natural_share_pct"] - 0.01
    ranked = sorted(out, key=lambda r: r["excess_milli_nats"])
    for a, b in zip(ranked, ranked[1:]):
        # excess is reported in MILLI-nats: sources whose excess rounds
        # to the same milli can differ at micro precision, so require
        # monotone tilt only across strictly separated excess values
        if b["excess_milli_nats"] > a["excess_milli_nats"] + 0.001:
            assert b["doremi_share_pct"] >= a["doremi_share_pct"] - 1e-6


def test_q420_bpe_against_reference_trainer(spark):
    """The in-engine merge table must equal an independent plain-Python
    greedy BPE trainer (naive overlap stats, left-to-right merge scan)
    run on the same word-frequency table."""
    out = QUERY_REGISTRY["q420_bpe_merge_train"].fn(spark, SF_SMOKE).collect()
    docs = load_table(spark, SF_SMOKE, "documents").select("text").collect()
    words: Counter = Counter()
    for r in docs:
        for w in re.split(r"\s+", r["text"].strip().lower()):
            if len(w) >= 2:
                words[w] += 1
    seqs = {w: list(w) for w in words}
    want = []
    for rnd in range(1, 7):
        stats: Counter = Counter()
        for w, seq in seqs.items():
            c = words[w]
            for a, b in zip(seq, seq[1:]):
                stats[(a, b)] += c
        if not stats:
            break
        (s1, s2), c = min(stats.items(), key=lambda kv: (-kv[1], kv[0]))
        want.append((rnd, s1, s2, s1 + s2, c))
        for w, seq in seqs.items():
            merged, i = [], 0
            while i < len(seq):
                if i + 1 < len(seq) and seq[i] == s1 and seq[i + 1] == s2:
                    merged.append(s1 + s2)
                    i += 2
                else:
                    merged.append(seq[i])
                    i += 1
            seqs[w] = merged
    got = [
        (r["merge_round"], r["left_sym"], r["right_sym"], r["merged_sym"],
         r["pair_occurrences"])
        for r in out
    ]
    assert got == want
    # later rounds must be able to build on earlier merges: at least one
    # merged symbol should be longer than 2 chars by round 6 on any
    # natural-language-like corpus, OR all merges are char pairs — both
    # legal; pin only that counts are non-increasing is NOT guaranteed
    # (merges change pair landscapes), so pin positivity instead
    assert all(c > 0 for *_, c in got)


def test_q421_compression_curve_recompute(spark):
    """Per-round symbol totals recomputed with the independent Python
    trainer: identical totals, strictly decreasing, round-0 total =
    corpus-weighted character count."""
    out = QUERY_REGISTRY["q421_bpe_compression_curve"].fn(spark, SF_SMOKE).collect()
    docs = load_table(spark, SF_SMOKE, "documents").select("text").collect()
    words: Counter = Counter()
    for r in docs:
        for w in re.split(r"\s+", r["text"].strip().lower()):
            if len(w) >= 2:
                words[w] += 1
    seqs = {w: list(w) for w in words}
    want = [sum(len(s) * words[w] for w, s in seqs.items())]
    for _ in range(6):
        stats: Counter = Counter()
        for w, seq in seqs.items():
            for a, b in zip(seq, seq[1:]):
                stats[(a, b)] += words[w]
        if not stats:
            break
        (s1, s2), _c = min(stats.items(), key=lambda kv: (-kv[1], kv[0]))
        for w, seq in seqs.items():
            merged, i = [], 0
            while i < len(seq):
                if i + 1 < len(seq) and seq[i] == s1 and seq[i + 1] == s2:
                    merged.append(s1 + s2)
                    i += 2
                else:
                    merged.append(seq[i])
                    i += 1
            seqs[w] = merged
        want.append(sum(len(s) * words[w] for w, s in seqs.items()))
    got = [r["total_symbol_instances"] for r in out]
    assert got == want
    assert all(a > b for a, b in zip(got, got[1:]))  # every merge compresses
    assert out[0]["compression_pct"] == 0.0
    assert all(
        b["compression_pct"] > a["compression_pct"] for a, b in zip(out, out[1:])
    )


def test_q422_effective_rank_against_numpy(spark):
    """The quantized participation ratio must agree with a straight
    numpy eigendecomposition of the Gram matrix to ~1e-2, and sit in
    (1, dim]."""
    import numpy as np

    out = QUERY_REGISTRY["q422_embedding_effective_rank"].fn(spark, SF_SMOKE).collect()
    assert len(out) == 1
    got = out[0]
    rows = load_table(spark, SF_SMOKE, "embeddings").select("embedding").collect()
    X = np.array([r["embedding"] for r in rows], dtype=np.float64)
    S = X.T @ X  # uncentered second-moment (Gram in dim space)
    lam = np.linalg.eigvalsh(S)
    pr = lam.sum() ** 2 / (lam**2).sum()
    assert got["n_vectors"] == len(rows)
    assert got["dim"] == 64
    assert abs(got["participation_ratio"] - pr) < 1e-2 * max(pr, 1)
    assert 1.0 < got["participation_ratio"] <= 64.0
    assert abs(got["effective_dim_pct"] - 100 * pr / 64) < 0.1
    assert abs(got["mean_sq_norm"] - (X**2).sum() / len(rows)) < 1e-2


def test_q423_edit_audit_recompute(spark):
    """Bucket histogram recomputed with Python's difflib-free DP on the
    engine's own pair relation semantics: shares sum to 100, cum is
    monotone, and near-dup pairs must concentrate in the low-edit
    bands (cum share at <30% edit distance over half the mass)."""
    out = QUERY_REGISTRY["q423_pair_edit_distance_audit"].fn(spark, SF_SMOKE).collect()
    assert out, "q24 finds pairs at sf0.001, the audit cannot be empty"
    assert abs(sum(r["share_pct"] for r in out) - 100.0) < 0.01
    cums = [r["cum_share_pct"] for r in out]
    assert all(b >= a for a, b in zip(cums, cums[1:]))
    assert abs(cums[-1] - 100.0) < 0.01
    low = [r for r in out if r["bucket"] <= 2]
    assert low and sum(r["share_pct"] for r in low) > 50.0, (
        "MinHash-verified pairs should be character-level close"
    )
    # full independent recompute of the histogram via Python DP
    from aws_datalake_platform_spark.operators.dedup import minhash_lsh_pairs

    docs = load_table(spark, SF_SMOKE, "documents")
    pairs = minhash_lsh_pairs(
        docs, "doc_id", "text", k=3, num_hashes=32, bands=8, threshold=0.5
    ).collect()
    texts = {r["doc_id"]: r["text"] for r in docs.select("doc_id", "text").collect()}

    def lev(a: str, b: str) -> int:
        if len(a) < len(b):
            a, b = b, a
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    hist: Counter = Counter()
    for p in pairs:
        ta, tb = texts[p["doc_a"]], texts[p["doc_b"]]
        d = lev(ta, tb)
        mx = max(len(ta), len(tb), 1)
        hist[min(math.floor(d * 10.0 / mx), 9)] += 1
    got = {r["bucket"]: r["n_pairs"] for r in out}
    assert got == dict(hist)


def test_q424_realization_recompute(spark):
    """The realized shares must be exactly consistent with the reported
    keep rates and token counts: downsample-only (keep rate <= 100, at
    least one source at 100), realized shares sum to ~100, and abs_err
    equals |realized - planned|."""
    out = QUERY_REGISTRY["q424_mixture_realization_audit"].fn(spark, SF_SMOKE).collect()
    assert out
    assert all(r["keep_rate_pct"] <= 100.0001 for r in out)
    assert any(r["keep_rate_pct"] > 99.99 for r in out), (
        "max-tilt source must keep everything (downsample-only)"
    )
    assert abs(sum(r["realized_share_pct"] for r in out) - 100.0) < 0.05
    zk = sum(r["tokens_kept"] for r in out)
    for r in out:
        realized = r["tokens_kept"] * 100.0 / max(zk, 1)
        assert abs(r["realized_share_pct"] - realized) < 5e-4
        assert (
            abs(
                r["abs_err_pct"]
                - abs(realized - r["planned_share_pct"])
            )
            < 1e-3
        )
        assert r["docs_kept"] <= r["docs_total"]


def test_q425_dedup_budget_recompute(spark):
    """Per-source savings recomputed from the engine's own cluster
    relation: exactly one keeper per cluster (the min id), totals
    reconcile, and sources with planted dups show positive savings."""
    from aws_datalake_platform_spark.operators.dedup import (
        connected_components,
        minhash_lsh_pairs,
    )

    out = QUERY_REGISTRY["q425_dedup_token_budget"].fn(spark, SF_SMOKE).collect()
    docs = load_table(spark, SF_SMOKE, "documents")
    pairs = minhash_lsh_pairs(
        docs, "doc_id", "text", k=3, num_hashes=32, bands=8, threshold=0.5
    )
    comp = connected_components(pairs, "doc_a", "doc_b").collect()
    clusters: dict[int, list[int]] = {}
    for r in comp:
        clusters.setdefault(r["comp"], []).append(r["node"])
    dropped = {n for c, ms in clusters.items() for n in ms if n != min(ms)}
    rows = docs.select("doc_id", "source", "text").collect()
    import re as _re

    per_src: dict[str, list[int]] = {}
    for r in rows:
        t = r["text"].strip()
        if not t:
            continue
        toks = len(_re.split(r"\s+", t.lower()))
        per_src.setdefault(r["source"], []).append(
            toks if r["doc_id"] not in dropped else -toks
        )
    for r in out:
        vals = per_src[r["source"]]
        total = sum(abs(v) for v in vals)
        kept = sum(v for v in vals if v > 0)
        assert r["tokens_total"] == total
        assert r["tokens_after_dedup"] == kept
        assert r["docs_dropped"] == sum(1 for v in vals if v < 0)
    assert sum(r["docs_dropped"] for r in out) == len(dropped)
    assert any(r["savings_pct"] > 0 for r in out), "corpus has planted dups"


def _fl_greedy(ids, Xn, cand_ids, k=8):
    """Independent numpy replay of q426's greedy facility-location step:
    micro-quantized cosine sims, exact integer cover/gain algebra,
    ties -> lowest vec_id."""
    import numpy as np

    mask = np.isin(ids, cand_ids)
    cids = ids[mask]
    Sq = np.floor(Xn @ Xn[mask].T * 1_000_000 + 0.5).astype(np.int64)
    cover = np.zeros(len(ids), dtype=np.int64)
    picked, gains = [], []
    for _ in range(k):
        avail = [j for j in range(len(cids)) if cids[j] not in picked]
        if not avail:
            break
        g, cid, j = max(
            (
                (int(np.maximum(Sq[:, j] - cover, 0).sum()), int(cids[j]), j)
                for j in avail
            ),
            key=lambda t: (t[0], -t[1]),
        )
        picked.append(cid)
        gains.append(g)
        cover = np.maximum(cover, Sq[:, j])
    return picked, gains


def _fl_learned_reps(df, ids, X, nrm, n_centroids=50):
    """q426's candidate shortlist recomputed independently: package
    quantizer (its own pytest covers the k-means), then plain-numpy
    assignment + per-cluster closest-to-centroid representative."""
    import numpy as np

    from aws_datalake_platform_spark.operators.similarity import (
        _centroid_matrix,
        _seq_dots,
    )

    cents = _centroid_matrix(
        df, "vec_id", "embedding",
        n_centroids=n_centroids, sample_size=1024, n_iter=10, seed=42,
    )
    Xn = X / np.maximum(nrm[:, None], 1e-12)
    assign = np.argsort(-_seq_dots(Xn, cents), axis=1, kind="stable")[:, 0]
    reps = []
    for c in range(cents.shape[0]):
        m = assign == c
        if not m.any():
            continue
        score = _seq_dots(X, cents[c : c + 1])[:, 0] / nrm
        best = np.lexsort((ids, np.where(m, -score, np.inf)))[0]
        reps.append(int(ids[best]))
    return reps


def _fl_hash_shortlist(ids, n=50):
    """The r8 hash-arbitrary shortlist q426 used before the learned swap."""
    return sorted(ids.tolist(), key=lambda v: ((v * 2654435761) % 1000000007, v))[:n]


def test_q426_facility_location_against_numpy(spark):
    """The candidate shortlist (per-cluster representatives of the
    50-centroid quantizer) and the greedy selection recomputed
    independently with numpy floats: same candidate set, same selection
    order, diminishing marginal gains (submodularity), monotonically
    increasing coverage — and the learned candidates must not cover
    WORSE than the r8 hash-arbitrary shortlist by more than a few
    percent (on the uniform synthetic fixtures the two are ~equal; on
    clustered data the learned set wins — the reason for the swap)."""
    import numpy as np

    from aws_datalake_platform_spark.operators.similarity import _seq_norms

    out = QUERY_REGISTRY["q426_facility_location_coreset"].fn(spark, SF_SMOKE).collect()
    assert len(out) == 8
    rows = load_table(spark, SF_SMOKE, "embeddings").select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in rows])
    X = np.array([r["embedding"] for r in rows], dtype=np.float64)
    nrm = _seq_norms(X)
    Xn = X / np.maximum(nrm[:, None], 1e-12)

    reps = _fl_learned_reps(
        load_table(spark, SF_SMOKE, "embeddings"), ids, X, nrm
    )
    assert 0 < len(reps) <= 50  # size-bounded: one rep per non-empty cluster
    assert len(set(reps)) == len(reps)

    picked, _ = _fl_greedy(ids, Xn, reps)
    assert [r["vec_id"] for r in out] == picked
    gains_out = [r["marginal_gain_milli"] for r in out]
    assert all(a >= b for a, b in zip(gains_out, gains_out[1:])), (
        "facility location is submodular: marginal gains must not increase"
    )
    covs = [r["avg_coverage"] for r in out]
    assert all(b >= a for a, b in zip(covs, covs[1:]))
    assert 0 < covs[-1] <= 1.0001

    # coverage-gain audit vs the r8 hash shortlist (uniform fixtures:
    # ~equal; a >5% regression would mean the reps are broken)
    _, hash_gains = _fl_greedy(ids, Xn, _fl_hash_shortlist(ids))
    # marginal_gain_milli ~= gain_q / 1e6 -> rescale before comparing
    assert sum(gains_out) * 1_000_000 >= 0.95 * sum(hash_gains), (
        "learned candidates cover materially worse than the hash shortlist"
    )


def test_q426_learned_candidates_win_on_clustered_data(spark, tmp_path):
    """VERDICT r9 item 4: the uniform fixtures cannot show the learned
    shortlist's structural win (random embeddings have no cluster
    structure to exploit), so plant a mixture-of-Gaussians lake at sf0.1
    scale — 2000 x 64, 30 components, Zipf-1.5 sizes, within-cluster
    sigma 0.8 — and (a) drive the REAL q426 Spark pipeline on it against
    the numpy replay, (b) measure greedy coverage learned-vs-hash.
    Measured on this fixture: learned 0.8278 vs hash 0.8158 avg-coverage
    (+1.46% relative); every clustered configuration probed in r10 was
    positive (+0.15%..+1.46%), vs ~0 on uniform fixtures."""
    import numpy as np

    from aws_datalake_platform_spark.operators.similarity import _seq_norms

    rng = np.random.default_rng(7)
    n, d, k_true = 2000, 64, 30
    centers = rng.normal(size=(k_true, d)) * 3.0
    w = np.arange(1, k_true + 1, dtype=np.float64) ** -1.5
    w /= w.sum()
    comp = rng.choice(k_true, size=n, p=w)
    X = centers[comp] + rng.normal(size=(n, d)) * 0.8
    ids = np.arange(n)

    lake = tmp_path / "clustered"
    lake.mkdir()
    df = spark.createDataFrame(
        [(int(i), [float(v) for v in X[i]]) for i in range(n)],
        "vec_id long, embedding array<double>",
    )
    df.write.parquet(str(lake / "embeddings.parquet"))

    nrm = _seq_norms(X)
    Xn = X / np.maximum(nrm[:, None], 1e-12)
    reps = _fl_learned_reps(df, ids, X, nrm)
    picked, gains = _fl_greedy(ids, Xn, reps)

    # (a) the real Spark pipeline on the clustered lake matches the replay
    out = QUERY_REGISTRY["q426_facility_location_coreset"].fn(spark, str(lake)).collect()
    assert [r["vec_id"] for r in out] == picked
    assert [r["marginal_gain_milli"] for r in out] == [
        math.floor(g / 1000.0 + 0.5) / 1000.0 for g in gains
    ]

    # (b) the structural win: learned reps must cover strictly better
    # than the hash-arbitrary shortlist on clustered data
    _, hash_gains = _fl_greedy(ids, Xn, _fl_hash_shortlist(ids))
    learned_cov, hash_cov = sum(gains), sum(hash_gains)
    assert learned_cov > hash_cov, (
        f"learned {learned_cov} <= hash {hash_cov} on the clustered fixture"
    )
    # pin the measured margin loosely (exact ints are deterministic here,
    # but leave headroom for BLAS-order variation across platforms)
    assert (learned_cov - hash_cov) / hash_cov > 0.005


def test_q427_wasserstein_recompute(spark):
    """W1 per source recomputed exactly (Fractions, no quantization at
    all): matches the pinned 4-digit values; W1 of the whole corpus vs
    itself would be 0 and every source's drift is >= 0."""
    from fractions import Fraction

    out = QUERY_REGISTRY["q427_wasserstein_source_drift"].fn(spark, SF_SMOKE).collect()
    docs = load_table(spark, SF_SMOKE, "documents").select("source", "text").collect()
    BW = 8
    per_src: dict[str, Counter] = {}
    allh: Counter = Counter()
    for r in docs:
        t = r["text"].strip()
        if not t:
            continue
        b = len(re.split(r"\s+", t.lower())) // BW
        per_src.setdefault(r["source"], Counter())[b] += 1
        allh[b] += 1
    n = sum(allh.values())
    spine = sorted(allh)
    want = {}
    for s, h in per_src.items():
        ns = sum(h.values())
        cs = ca = 0
        w1 = Fraction(0)
        for b in spine:
            cs += h.get(b, 0)
            ca += allh[b]
            w1 += Fraction(abs(cs * n - ca * ns) * BW, ns * n)
        want[s] = math.floor(w1 * 10000 + Fraction(1, 2)) / 10000
    assert len(out) == len(want)
    for r in out:
        assert abs(r["w1_tokens"] - want[r["source"]]) < 1e-9, r["source"]
        assert r["w1_tokens"] >= 0
    ranks = [r["drift_rank"] for r in out]
    assert ranks == sorted(ranks)


def test_q428_weighted_sample_recompute(spark):
    """The selected set recomputed independently (hashlib + math.log):
    identical draws in identical order, and the sample must skew long
    (size-proportional weights -> mean sampled length above corpus
    mean)."""
    out = QUERY_REGISTRY[
        "q428_weighted_sample_without_replacement"
    ].fn(spark, SF_SMOKE).collect()
    docs = load_table(spark, SF_SMOKE, "documents").select(
        "doc_id", "n_chars"
    ).collect()
    keyed = []
    for r in docs:
        if r["n_chars"] <= 0:
            continue
        h = int(
            hashlib.md5(f"esws|{r['doc_id']}".encode()).hexdigest()[:15], 16
        )
        u = (h + 1.0) / float(1 << 60)
        kq = math.floor(-math.log(u) / r["n_chars"] * 1_000_000 * 1000 + 0.5)
        keyed.append((kq, r["doc_id"], r["n_chars"]))
    keyed.sort()
    want = keyed[:50]
    got = [(r["doc_id"], r["n_chars"]) for r in out]
    assert got == [(d, c) for _, d, c in want]
    assert [r["draw_order"] for r in out] == list(range(1, 51))
    mean_all = sum(r["n_chars"] for r in docs) / len(docs)
    mean_sampled = sum(c for _, c in got) / len(got)
    assert mean_sampled > mean_all, "size-weighted sample must skew long"


def test_q429_scaling_law_recompute(spark):
    """Per-fraction held-out CE and the OLS fit recomputed from raw
    rows: CE values match to milli precision, fractions are nested
    (train tokens strictly increase), CE is non-increasing in data
    (more data never hurts add-one unigram CE on this corpus), and
    the exponent is <= 0."""
    out = QUERY_REGISTRY["q429_scaling_law_fit"].fn(spark, SF_SMOKE).collect()
    assert len(out) == 5
    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text").collect()
    SC, SP = 1_000_000, 1 << 60
    dens = (16, 8, 4, 2, 1)
    held: Counter = Counter()
    tiers: dict[int, Counter] = {i + 1: Counter() for i in range(5)}
    for r in docs:
        toks = [t for t in re.split(r"[^a-z]+", r["text"].lower()) if t]
        if r["doc_id"] % 5 == 0:
            held.update(toks)
            continue
        h = int(hashlib.md5(f"slf|{r['doc_id']}".encode()).hexdigest()[:15], 16)
        tier = next(
            (i + 1 for i, d in enumerate(dens) if h < SP // d), None
        )
        if tier is not None:
            tiers[tier].update(toks)
    t_h = sum(held.values())
    want_ce = []
    cum: Counter = Counter()
    for fid in range(1, 6):
        cum.update(tiers[fid])
        n_tok = sum(cum.values())
        v = len(cum)
        nll = sum(
            hw
            * math.floor(-math.log((cum.get(w, 0) + 1.0) / (n_tok + v)) * SC + 0.5)
            for w, hw in held.items()
        )
        ce_q = math.floor(nll * 1.0 / t_h + 0.5)
        want_ce.append((n_tok, float(math.floor(ce_q / 1000.0 + 0.5))))
    got = [(r["train_tokens"], r["heldout_ce_milli"]) for r in out]
    assert got == want_ce
    ntoks = [r["train_tokens"] for r in out]
    assert all(b > a for a, b in zip(ntoks, ntoks[1:])), "fractions nest"
    ces = [r["heldout_ce_milli"] for r in out]
    assert all(b <= a + 1e-9 for a, b in zip(ces, ces[1:])), "more data helps"
    assert out[0]["scaling_exponent"] <= 0
    assert out[0]["pred_ce_milli_at_10x"] > 0
    assert len({r["scaling_exponent"] for r in out}) == 1
    # semantic invariant (the r7 q429-bug class: plan AND oracle shared
    # a unit error the exact-replay recompute above could not catch):
    # refit the power law with PLAIN-FLOAT OLS on (ln tokens, ln CE)
    # and require the engine's slope AND its 10x extrapolation to match
    # this independent algebra within a loose band — a slope mishandled
    # by any constant factor moves the prediction far outside it.
    xs = [math.log(t) for t, _ in want_ce]
    ys = [math.log(c / 1000.0) for _, c in want_ce]  # CE back to nats
    np_, sx, sy = len(xs), sum(xs), sum(ys)
    slope = (np_ * sum(x * y for x, y in zip(xs, ys)) - sx * sy) / (
        np_ * sum(x * x for x in xs) - sx * sx
    )
    intercept = sy / np_ - slope * sx / np_
    pred_milli = math.exp(intercept + slope * math.log(10 * want_ce[-1][0])) * 1000
    assert abs(out[0]["scaling_exponent"] - slope) < 5e-3
    assert abs(out[0]["pred_ce_milli_at_10x"] - pred_milli) / pred_milli < 0.02
    # the prediction must RESPOND to the slope: with a negative slope,
    # 10x data strictly improves on the last observed CE
    if slope < -1e-4:
        assert out[0]["pred_ce_milli_at_10x"] < ces[-1]


def test_q430_brier_decomposition_recompute(spark):
    """The Murphy identity pinned with an independent float recompute
    on the engine's own (score, label) pairs: BS ~= REL - RES + UNC +
    within_bin_residual, every component in range, and the skill score
    consistent with BS/UNC."""
    out = QUERY_REGISTRY["q430_brier_decomposition"].fn(spark, SF_SMOKE).collect()
    assert len(out) == 1
    got = out[0]
    m = QUERY_REGISTRY["q173_quality_logreg"].fn(spark, SF_SMOKE).select(
        "doc_id", "quality_score"
    ).collect()
    g = QUERY_REGISTRY["q192_gopher_quality_rules"].fn(spark, SF_SMOKE).select(
        "doc_id", "passes"
    ).collect()
    lab = {r["doc_id"]: 1 if r["passes"] else 0 for r in g}
    pairs = [
        (math.floor(r["quality_score"] * 10000 + 0.5) / 10000.0, lab[r["doc_id"]])
        for r in m
        if r["doc_id"] in lab
    ]
    n = len(pairs)
    assert got["n_docs"] == n
    bs = sum((p - y) ** 2 for p, y in pairs) / n
    obar = sum(y for _, y in pairs) / n
    unc = obar * (1 - obar)
    buckets: dict[int, list] = {}
    for p, y in pairs:
        buckets.setdefault(min(int(p * 10), 9), []).append((p, y))
    rel = sum(
        len(v) * (sum(p for p, _ in v) / len(v) - sum(y for _, y in v) / len(v)) ** 2
        for v in buckets.values()
    ) / n
    res = sum(
        len(v) * (sum(y for _, y in v) / len(v) - obar) ** 2
        for v in buckets.values()
    ) / n
    assert abs(got["brier"] - bs) < 1e-4
    assert abs(got["reliability"] - rel) < 1e-4
    assert abs(got["resolution"] - res) < 1e-4
    assert abs(got["uncertainty"] - unc) < 1e-4
    # Murphy identity with the binning residual
    assert abs(
        got["brier"]
        - (got["reliability"] - got["resolution"] + got["uncertainty"]
           + got["within_bin_residual"])
    ) < 5e-6
    assert abs(got["brier_skill_score"] - (1 - bs / unc)) < 1e-3
    assert 0 <= got["reliability"] and 0 <= got["resolution"] <= unc + 1e-9
