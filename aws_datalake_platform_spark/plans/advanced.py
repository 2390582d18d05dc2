"""Advanced query surface, round 2: chunking, mixture sampling, ordered-set
aggregates, map columns, LATERAL joins, LM-style scoring, Python UDTFs,
calendar arithmetic, higher statistical moments, and time-range windows.

These extend the Athena-SQL serving role (reference: README.md:128-132,
athena/main.tf:18-38) and the LLM-training-data operator set with the
surfaces a curation pipeline reaches for next: splitting documents into
model-context-sized chunks, hitting a per-language mixture target, and
scoring text against corpus statistics. Every query carries a DuckDB
oracle; scale notes are in each docstring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from .queries import register

# ── q87: document chunking ──────────────────────────────────────────────────

_CHUNK_SIZE = 400
_CHUNK_STEP = 300  # 100-char overlap between consecutive chunks


@register(
    "q87_document_chunks",
    f"""
    SELECT doc_id,
           CAST((s - 1) // {_CHUNK_STEP} AS INTEGER) AS chunk_idx,
           substring(text, s, {_CHUNK_SIZE}) AS chunk_text
    FROM (SELECT doc_id, text,
                 unnest(generate_series(1, greatest(length(text), 1), {_CHUNK_STEP}))
                   AS s
          FROM documents)
    """,
    doc="Sliding-window document chunking (400-char chunks, 100-char "
    "overlap) — the split step before tokenization/embedding in a "
    "training-data pipeline. sequence + posexplode + substring, all "
    "codegen'd; no Python.",
)
def q87_document_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: pure map-side fan-out (no shuffle at all) — each input row
    emits len/step chunks locally; output partitioning inherits the scan.
    At 100 TB this is the shape you want: chunking never becomes a
    shuffle, and downstream ops see ~3x rows at ~1/3 size each."""
    docs = load_table(spark, sf_dir, "documents")
    starts = F.expr(f"sequence(1, greatest(char_length(text), 1), {_CHUNK_STEP})")
    return (
        docs.select("doc_id", "text", F.posexplode(starts).alias("chunk_idx", "start"))
        .select(
            "doc_id",
            "chunk_idx",
            F.expr(f"substring(text, start, {_CHUNK_SIZE})").alias("chunk_text"),
        )
    )


# ── q88: per-language mixture sampling ──────────────────────────────────────

_MIX = {"en": 0.25, "es": 0.5, "fr": 1.0, "de": 1.0}  # zh: dropped
_HASH_SPACE = 1 << 60


def _mix_case_sql() -> str:
    arms = " ".join(
        f"WHEN '{lang}' THEN {int(frac * _HASH_SPACE)}" for lang, frac in sorted(_MIX.items())
    )
    return f"CASE lang {arms} ELSE -1 END"


@register(
    "q88_stratified_sample",
    f"""
    SELECT doc_id, lang, source
    FROM documents
    WHERE CAST(('0x' || substr(md5('42|' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
          < {_mix_case_sql()}
    """,
    doc="Domain-mixture sampling: keep 25% of en, 50% of es, all fr/de, "
    "drop zh — membership is a pure row-content hash (md5 60-bit "
    "threshold per stratum), so the mix is reproducible across runs, "
    "engines, and partitionings (operators/sampling.py:stratified_sample).",
)
def q88_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: map-side filter at the scan — no shuffle, no RNG state, no
    sampleBy() two-pass fraction estimation. Changing the mix spec is a
    literal change, not a re-shuffle."""
    from ..operators.sampling import stratified_sample

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "source")
    return stratified_sample(docs, "doc_id", "lang", _MIX, seed=42)


# ── q89: ordered-set aggregates ─────────────────────────────────────────────


@register(
    "q89_ordered_set_aggs",
    """
    SELECT r.r_name,
           string_agg(DISTINCT n.n_name, ',' ORDER BY n.n_name) AS nations,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           MEDIAN(c.c_acctbal) AS median_acctbal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
    doc="Ordered-set aggregates: LISTAGG ... WITHIN GROUP (Spark 4) and "
    "MEDIAN per region over a dim-dim-fact join (DuckDB string_agg/median "
    "oracle).",
)
def q89_ordered_set_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: both dims broadcast; one shuffle on r_name. LISTAGG
    concatenates a bounded set (nations per region), never an unbounded
    fact column — the per-group buffer stays O(dim)."""
    for t in ("customer", "nation", "region"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(
        """
        SELECT r.r_name,
               listagg(DISTINCT n.n_name, ',') WITHIN GROUP (ORDER BY n.n_name) AS nations,
               COUNT(*) AS n_customers,
               MEDIAN(c.c_acctbal) AS median_acctbal
        FROM customer c
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name
        """
    )


# ── q90: map-typed aggregation roundtrip ────────────────────────────────────


@register(
    "q90_map_aggregation",
    """
    SELECT event_type,
           CAST(hour(ts) AS INTEGER) AS hr,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM events GROUP BY event_type, hour(ts)
    """,
    doc="MapType surface: per-event-type map<hour,count> built with "
    "map_from_entries(collect_list(struct)), then exploded back to flat "
    "rows — exercises map construction, map explode, and the array_sort "
    "struct ordering; the oracle checks the flat equivalent.",
)
def q90_map_aggregation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: the map is per-group state bounded by 24 hours — safe to
    collect_list. The pattern matters because feature stores ship exactly
    this shape (entity -> map<bucket, stat>) to serving."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy("event_type", F.hour("ts").alias("hr")).agg(
        F.count(F.lit(1)).alias("n_events")
    )
    maps = hourly.groupBy("event_type").agg(
        F.map_from_entries(F.array_sort(F.collect_list(F.struct("hr", "n_events")))).alias(
            "hr_counts"
        )
    )
    return maps.select("event_type", F.explode("hr_counts").alias("hr", "n_events"))


# ── q91: LATERAL correlated top-k join ──────────────────────────────────────

_LATERAL_SQL = """
    SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice
    FROM customer c,
         LATERAL (SELECT o_orderkey, o_totalprice
                  FROM orders
                  WHERE o_custkey = c.c_custkey
                  ORDER BY o_totalprice DESC, o_orderkey
                  LIMIT 2) o
    WHERE c.c_acctbal > 9000
"""


@register(
    "q91_lateral_topk",
    _LATERAL_SQL,
    doc="LATERAL correlated subquery with ORDER BY + LIMIT (top-2 orders "
    "per rich customer) — Catalyst decorrelates to a window/rank plan; "
    "DuckDB executes the identical statement.",
)
def q91_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: decorrelation turns the per-row subquery into ONE pass over
    orders (rank by custkey), not N correlated scans — the plan survives
    a 100 TB orders table because the customer filter semi-joins first."""
    for t in ("customer", "orders"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_LATERAL_SQL)


# ── q92: unigram language-model scoring ─────────────────────────────────────


@register(
    "q92_unigram_logprob",
    """
    WITH toks AS (
      SELECT doc_id, t.tok
      FROM documents,
           UNNEST(string_split_regex(lower(text), '[^a-z]+')) AS t(tok)
      WHERE t.tok <> ''
    ),
    vocab AS (SELECT tok, COUNT(*) AS tf FROM toks GROUP BY tok),
    tot AS (SELECT SUM(tf) AS total FROM vocab)
    SELECT toks.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           ROUND(SUM(CAST(ROUND(LN(v.tf / t.total) * 1000000) AS BIGINT))
                 / (COUNT(*) * 1000000.0), 4) AS avg_logprob
    FROM toks JOIN vocab v USING (tok) CROSS JOIN tot t
    GROUP BY toks.doc_id
    """,
    doc="Perplexity-style quality scoring: corpus unigram LM, each doc "
    "scored by mean token log-probability — the classic cheap LM filter "
    "for training-data curation (two aggregates + one broadcast join). "
    "Each token's log-prob is quantized to integer micro-nats BEFORE the "
    "per-doc sum, so the aggregate is an order-free integer sum on both "
    "engines — the former double AVG could flip its 4th decimal on a "
    "different partition layout (ADVICE r2 flakiness class).",
)
def q92_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: vocab is a heavy-tailed but bounded relation (≪ corpus) —
    broadcast it and the scalar total; the only big shuffles are the
    vocab count and the per-doc re-aggregation, both map-side-combined.
    Token explode is a local fan-out, no shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    toks = (
        docs.select("doc_id", F.explode(F.split(F.lower("text"), "[^a-z]+")).alias("tok"))
        .filter(F.col("tok") != "")
    )
    vocab = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("tf"))
    total = vocab.agg(F.sum("tf").alias("total"))
    return (
        toks.join(F.broadcast(vocab), "tok")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(
                F.sum(F.round(F.log(F.col("tf") / F.col("total")) * 1e6).cast("long"))
                / (F.count(F.lit(1)) * 1e6),
                4,
            ).alias("avg_logprob"),
        )
    )


# ── q93: Python UDTF sentence splitting ─────────────────────────────────────

try:  # pyspark >= 3.5 only
    from pyspark.sql.functions import udtf

    @udtf(returnType="sent_idx: int, sentence: string")
    class _SplitSentences:
        """Emit ('. '-delimited) sentences with their position; index
        counts every split slot so it is reconstructible downstream even
        when empties are dropped."""

        def eval(self, text: str):  # noqa: D102
            if text is None:
                return
            for i, s in enumerate(text.split(". ")):
                if s:
                    yield i, s

except ImportError:  # pragma: no cover
    _SplitSentences = None


@register(
    "q93_sentence_udtf",
    """
    SELECT doc_id,
           CAST(i - 1 AS INTEGER) AS sent_idx,
           parts[i] AS sentence
    FROM (SELECT doc_id, parts, unnest(generate_series(1, len(parts))) AS i
          FROM (SELECT doc_id, string_split(text, '. ') AS parts
                FROM documents WHERE doc_id < 50))
    WHERE parts[i] <> ''
    """,
    doc="Python UDTF (Spark 4 table function) splitting documents into "
    "sentences, invoked via LATERAL in SQL — the extension point for "
    "row-to-many Python logic (segmenters, parsers) when no builtin "
    "generator fits.",
)
def q93_sentence_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: UDTFs run in Python workers (slow path) — acceptable here
    because sentence segmentation is genuinely imperative; the builtin
    split+posexplode twin (q87) is the fast path when a regex suffices.
    The doc_id filter bounds the Python fan-out."""
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    spark.udtf.register("split_sentences", _SplitSentences)
    return spark.sql(
        """
        SELECT d.doc_id, s.sent_idx, s.sentence
        FROM documents d, LATERAL split_sentences(d.text) s
        WHERE d.doc_id < 50
        """
    )


# ── q94: calendar / interval arithmetic ─────────────────────────────────────


@register(
    "q94_date_arithmetic",
    """
    SELECT o_orderkey,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
           last_day(CAST(o_orderdate AS DATE)) AS month_end,
           CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS plus3m,
           CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-12-31') AS INTEGER)
             AS age_days,
           CAST(isodow(o_orderdate) - 1 AS INTEGER) AS dow,
           CAST(quarter(o_orderdate) AS INTEGER) AS qtr
    FROM orders
    """,
    doc="Calendar arithmetic surface: date_trunc, last_day, add_months "
    "(month-end clamping matches DuckDB interval addition), datediff, "
    "weekday, quarter — the date dimension a partitioned lake lives on "
    "(reference stores date partitions as substring(timestamp,1,10), "
    "transform.py:176).",
)
def q94_date_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: all pure column expressions inside whole-stage codegen; a
    date-partitioned lake prunes on exactly these derivations."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.last_day("o_orderdate").alias("month_end"),
        F.add_months("o_orderdate", 3).alias("plus3m"),
        F.datediff(F.lit("1998-12-31").cast("date"), F.col("o_orderdate")).alias("age_days"),
        F.weekday("o_orderdate").alias("dow"),
        F.quarter("o_orderdate").alias("qtr"),
    )


# ── q95: higher statistical moments ─────────────────────────────────────────


@register(
    "q95_stats_moments",
    """
    WITH mu AS (SELECT l_returnflag, AVG(l_quantity) AS m
                FROM lineitem GROUP BY l_returnflag)
    SELECT l.l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(corr(l.l_quantity, l.l_extendedprice), 4) AS corr_qty_price,
           ROUND(covar_samp(l.l_quantity, l.l_extendedprice), 2) AS covar_qp,
           ROUND(stddev_samp(l.l_quantity), 4) AS sd_qty,
           ROUND(AVG(POW(l.l_quantity - mu.m, 3))
                 / POW(AVG(POW(l.l_quantity - mu.m, 2)), 1.5), 4) + 0.0 AS skew_qty,
           ROUND(AVG(POW(l.l_quantity - mu.m, 4))
                 / POW(AVG(POW(l.l_quantity - mu.m, 2)), 2) - 3, 4) + 0.0 AS kurt_qty
    FROM lineitem l JOIN mu USING (l_returnflag)
    GROUP BY l.l_returnflag
    """,
    doc="Statistical profile per group: correlation, sample covariance, "
    "stddev, population skewness and excess kurtosis (Spark's one-pass "
    "central-moment aggregates; the oracle recomputes the moments "
    "two-pass from the mean). Known, accepted flakiness class (ADVICE "
    "r2): ROUND(...,4) of float aggregates whose accumulation order is "
    "partition-dependent can flip the last digit if a value lands within "
    "float noise of a 5e-5 boundary; quantizing would discard exactly "
    "the one-pass moment surface this query exists to exercise, so the "
    "risk (~1e-8/value) is documented instead.",
)
def q95_stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: all six statistics stream in ONE partial-aggregate pass
    (central moment sketches merge associatively) — no second scan, no
    per-group buffering, unlike the oracle's two-pass formulation."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        # Pearson r as covar_samp/(sd*sd) under try_divide: F.corr itself
        # RAISES ANSI DIVIDE_BY_ZERO on a zero-variance group (constant
        # column), where this form yields NULL like DuckDB's corr; the
        # two agree to ~1e-12 before the 4-digit rounding
        F.round(
            F.try_divide(
                F.covar_samp("l_quantity", "l_extendedprice"),
                F.stddev_samp("l_quantity") * F.stddev_samp("l_extendedprice"),
            ),
            4,
        ).alias("corr_qty_price"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 2).alias("covar_qp"),
        F.round(F.stddev_samp("l_quantity"), 4).alias("sd_qty"),
        # + 0.0 collapses IEEE negative zero (round can yield -0.0 on one
        # engine and +0.0 on the other for near-zero moments)
        (F.round(F.skewness("l_quantity"), 4) + F.lit(0.0)).alias("skew_qty"),
        (F.round(F.kurtosis("l_quantity"), 4) + F.lit(0.0)).alias("kurt_qty"),
    )


# ── q96: event-time range window ────────────────────────────────────────────

_HOUR_MICROS = 3_600_000_000


@register(
    "q96_time_range_window",
    """
    SELECT event_id, user_id,
           ROUND(AVG(value) OVER w, 4) AS trail_avg_1h,
           CAST(COUNT(*) OVER w AS BIGINT) AS n_in_window
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
    """,
    doc="Trailing 1-hour per-user moving average via a RANGE window over "
    "event time (microsecond-exact frame bounds on both engines) — the "
    "batch twin of a sliding streaming window.",
)
def q96_time_range_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: one shuffle on user_id, then a sorted range-frame scan per
    partition; RANGE frames are peer-deterministic so tied timestamps
    can't flip results. unix_micros ordering keeps the frame arithmetic
    integer-exact (a seconds cast would truncate sub-second event times)."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-_HOUR_MICROS, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.avg("value").over(w), 4).alias("trail_avg_1h"),
        F.count(F.lit(1)).over(w).alias("n_in_window"),
    )


# ── q97: bloom-filter join pre-filter ───────────────────────────────────────

_Q97_ORACLE = """
    SELECT o.o_orderkey,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(ROUND(l.l_discount * 100) AS BIGINT))) / 10000.0
             AS revenue
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_totalprice > 400000
    GROUP BY o.o_orderkey
"""


@register(
    "q97_bloom_join_prefilter",
    _Q97_ORACLE,
    doc="Bloom-filter join pre-filter: build a k-hash Bloom bitmap over "
    "the selective orders side (xxhash64 positions, bounded collect_set), "
    "drop non-matching lineitem rows map-side BEFORE the join shuffle, "
    "then join exactly — false positives are eliminated by the real join, "
    "so the result is exact and the oracle is the plain join.",
)
def q97_bloom_join_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: THE pattern for selective fact-dim joins at 100 TB — an
    ~8 KB packed bitmap (m = 2^16 bits as a word->long map) broadcasts to
    every task, and each fact row's membership test is k O(1) bit probes
    (map element_at + shift), so the fact side sheds rows map-side
    instead of shuffling them; this hand-rolls what Spark's runtime
    row-level filtering injects when stats allow, from public primitives
    only (Spark's bloom_filter_agg expression is not SQL-registered).
    Two earlier formulations mattered: array_contains membership was a
    LINEAR scan per probe (78 s at sf0.1), and building the bitmap with
    a per-word HOF filter re-walked the position set 1024 times (2.3 s);
    the relational bit_or-per-word build + O(1) map probes run 1.2 s."""
    m, seeds = 1 << 16, (1, 2, 3)
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    li = load_table(spark, sf_dir, "lineitem")

    def positions(key: str):
        return [F.pmod(F.xxhash64(F.col(key), F.lit(s)), F.lit(m)) for s in seeds]

    # one row: the Bloom filter as a word->long map (word = pos div 64,
    # bit = pos % 64), built relationally — a bit_or aggregate per word
    # (map-side combined, fully parallel), then packed into one map
    bloom = (
        orders.select(F.explode(F.array(*positions("o_orderkey"))).alias("pos"))
        .groupBy(F.expr("pos div 64").alias("w"))
        .agg(F.expr("bit_or(shiftleft(1L, cast(pos % 64 as int)))").alias("wb"))
        .agg(F.map_from_entries(F.collect_list(F.struct("w", "wb"))).alias("bits"))
    )
    member = None
    for s in seeds:
        hit = F.expr(
            f"(shiftright(coalesce(element_at(bits, pmod(xxhash64(l_orderkey, {s}), {m}) div 64), 0L), "
            f"cast(pmod(xxhash64(l_orderkey, {s}), {m}) % 64 as int)) & 1) = 1"
        )
        member = hit if member is None else member & hit
    li_pref = li.join(F.broadcast(bloom)).filter(member).drop("bits")
    return (
        li_pref.join(orders, li_pref.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderkey")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            # exact integer-cents arithmetic: prices/discounts carry 2
            # decimals, so the sum is integer — accumulation-order and
            # round-half-mode independent across engines
            (
                F.sum(
                    F.round(F.col("l_extendedprice") * 100).cast("long")
                    * (100 - F.round(F.col("l_discount") * 100).cast("long"))
                )
                / 10000.0
            ).alias("revenue"),
        )
    )


# ── q98: regex collocation extraction ───────────────────────────────────────


@register(
    "q98_regex_collocations",
    """
    SELECT doc_id,
           CAST(len(hits) AS INTEGER) AS n_hits,
           COALESCE(array_to_string(hits, '|'), '') AS hits_joined
    FROM (SELECT doc_id,
                 regexp_extract_all(text, '[a-z]+ join') AS hits
          FROM documents)
    """,
    doc="regexp_extract_all collocation mining ('<word> join' bigrams per "
    "document) — the regex-surface twin of the tokenizer ops; arrays "
    "stay JVM-side (no Python).",
)
def q98_regex_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: pure map-side column expressions inside codegen; regex state
    machines run per-row with zero shuffle. Non-overlapping scan
    semantics are identical in Java regex and RE2 for this pattern."""
    docs = load_table(spark, sf_dir, "documents")
    hits = F.expr("regexp_extract_all(text, '[a-z]+ join', 0)")
    return docs.select(
        "doc_id",
        F.size(hits).alias("n_hits"),
        F.array_join(hits, "|").alias("hits_joined"),
    )


# ── q99: deterministic argmax per group ─────────────────────────────────────

# Fixed-width sortable encoding makes (price, orderkey) a single ordering
# key both engines compare identically — arg_max/max_by tie-break is
# engine-arbitrary otherwise.
_ARGMAX_KEY_SPARK = "format_string('%018.4f|%018d', l_extendedprice, l_orderkey)"
_ARGMAX_KEY_DUCK = "printf('%018.4f|%018d', l_extendedprice, l_orderkey)"


@register(
    "q99_argmax_group",
    f"""
    SELECT l_returnflag, l_linestatus,
           arg_max(l_orderkey, {_ARGMAX_KEY_DUCK}) AS top_orderkey,
           ROUND(MAX(l_extendedprice), 2) AS top_price
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="Deterministic per-group argmax via max_by/arg_max over a "
    "fixed-width sortable composite key (price, orderkey) — single-pass "
    "alternative to the window-rank top-1 (q10).",
)
def q99_argmax_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: one partial-aggregable pass (max_by merges associatively) —
    no window sort, no per-group buffering; preferred over row_number
    when only the top-1 row is needed."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.expr(f"max_by(l_orderkey, {_ARGMAX_KEY_SPARK})").alias("top_orderkey"),
        F.round(F.max("l_extendedprice"), 2).alias("top_price"),
    )


# ── q100: aggregated-IN subquery (TPC-H Q18 shape) ──────────────────────────

_Q100_SQL = """
    SELECT c.c_name, o.o_orderkey, o.o_totalprice
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    WHERE o.o_orderkey IN (SELECT l_orderkey
                           FROM lineitem
                           GROUP BY l_orderkey
                           HAVING SUM(l_quantity) > 120)
"""


@register(
    "q100_big_order_customers",
    _Q100_SQL,
    doc="TPC-H Q18 shape: IN over an aggregated-HAVING subquery (large-"
    "volume orders) joined back to customers — Catalyst plans the "
    "subquery as an aggregate + left-semi join.",
)
def q100_big_order_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: the HAVING aggregate reduces lineitem to qualifying keys
    before any join; the semi join then prunes orders. Both shuffles are
    on the join key — co-partitioned, no broadcast of the big side."""
    for t in ("customer", "orders", "lineitem"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_Q100_SQL)


# ── q101: streaming session windows ─────────────────────────────────────────


@register(
    "q101_stream_session_window",
    """
    WITH g AS (
      SELECT user_id, ts, event_id,
             CASE WHEN LAG(ts) OVER w IS NULL
                    OR ts >= LAG(ts) OVER w + INTERVAL 12 HOUR THEN 1 ELSE 0 END AS brk
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    s AS (
      SELECT user_id, ts,
             SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS sess
      FROM g
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 12 HOUR AS session_end,
           COUNT(*) AS n_events
    FROM s GROUP BY user_id, sess
    """,
    doc="Structured Streaming session_window (12h gap) over the events "
    "file stream — merging session state maintained by the streaming "
    "engine; oracle is the batch gaps-and-islands twin (q36) with the "
    "window-end = last event + gap convention. Session boundary uses >= "
    "(an event exactly gap after the previous one starts a new session), "
    "matching session_window's half-open [start, last+gap) windows.",
)
def q101_stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: session state is per-key and merges incrementally in the
    state store; complete+availableNow here only because the oracle needs
    the full final result — production uses append mode + watermark so
    closed sessions emit and state is reaped."""
    sdf = _events_stream_shared(spark, sf_dir)
    agg = (
        sdf.groupBy(F.session_window("ts", "12 hours"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )
    from .temporal import run_memory_stream

    return run_memory_stream(spark, agg, "q101", sf_dir, output_mode="complete")


def _events_stream_shared(spark: SparkSession, sf_dir: str):
    from .temporal import _events_stream

    return _events_stream(spark, sf_dir)


# ── q102: keep-latest dedup (CDC compaction shape) ──────────────────────────


@register(
    "q102_keep_latest",
    """
    SELECT user_id, event_id, ts, value
    FROM (SELECT user_id, event_id, ts, value,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY ts DESC, event_id DESC) AS rn
          FROM events)
    WHERE rn = 1
    """,
    doc="Keep-latest-per-key dedup (row_number DESC over event time) — "
    "the CDC/upsert compaction primitive: collapse a change stream to "
    "current state.",
)
def q102_keep_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: Spark plans WindowGroupLimit below the shuffle (rank filter
    pushdown), so each map task forwards only its local latest rows per
    key — shuffle volume is O(keys), not O(events)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        ev.select("user_id", "event_id", "ts", "value")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
