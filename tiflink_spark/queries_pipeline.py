"""Pipeline-shape operators: the composite patterns a production data
pipeline builds from the engine's primitives — sessionization, calendar
spines, document chunking, benchmark-contamination checks, and dup-pair
clustering (connected components).

No reference counterpart (TiFlink delegates its whole query surface to
Flink SQL, README.md:8); these are designed Spark-first for the 100 TB
target:

- ``dedup_connected_components`` is the missing last step of every
  dedup pipeline: LSH emits candidate *pairs*, but dropping duplicates
  needs *clusters* (pick one canonical doc per component). Implemented
  as distributed min-label propagation — every iteration is one
  shuffle-on-key join + groupBy, lineage cut by localCheckpoint, with
  a sum-of-labels fixpoint test (labels only decrease, so the sum is a
  strictly-decreasing convergence measure). Iteration count is bounded
  by the largest component's diameter, which for near-dup clusters is
  tiny; the only driver-side data is the one scalar per iteration.
- ``contamination_check`` is eval hygiene at corpus scale: score every
  corpus doc by how many of its shingles appear in a benchmark set.
  The benchmark gram set is orders of magnitude smaller than the
  corpus, so Catalyst broadcasts it; at extreme scale the same shape
  drops into a bloom-filter semi-join without changing semantics.
- ``doc_chunking`` expands each document into overlapping fixed-size
  chunks (size 200, stride 150) entirely JVM-side (sequence + explode
  + substring) — no Python in the row path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tiflink_spark.queries import _t, register
from tiflink_spark.queries_dataops import _pct_expr
from tiflink_spark.queries_llm import (
    _band_keys_sql,
    _doc_grams,
    _GRAMS_SQL,
    _minhash_sig_sql,
    dedup_minhash_lsh,
)

# ---------------------------------------------------------------------------
# Sessionization (row-level: assign session sequence numbers to events)
# ---------------------------------------------------------------------------

_SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 min


@register(
    "sessionize_events",
    f"""
    WITH g AS (
        SELECT event_id, user_id, ts,
               CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                      OR epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
                         > {_SESSION_GAP_US}
                    THEN 1 ELSE 0 END AS is_new
        FROM events)
    SELECT event_id, user_id,
           CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS session_seq
    FROM g
    """,
    doc=(
        "Gap-based sessionization: a new session starts after a 30-min "
        "silence; session_seq = running count of boundaries per user "
        "(lag + cumulative sum, the gaps-and-islands pattern). Row-level "
        "complement of the session_window aggregate."
    ),
    tags=("window", "sessionize"),
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    t = _t(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    is_new = F.when(gap.isNull() | (gap > _SESSION_GAP_US), 1).otherwise(0)
    run = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return t["events"].select(
        "event_id",
        "user_id",
        F.sum(is_new).over(run).cast("long").alias("session_seq"),
    )


# ---------------------------------------------------------------------------
# Calendar spine + gap fill
# ---------------------------------------------------------------------------


@register(
    "date_spine_gap_fill",
    """
    WITH bounds AS (SELECT CAST(min(ts) AS DATE) AS d0, CAST(max(ts) AS DATE) AS d1
                    FROM events),
    spine AS (SELECT CAST(CAST(d0 + k * INTERVAL 1 DAY AS DATE) AS TIMESTAMP) AS day
              FROM bounds, UNNEST(range(0, date_diff('day', d0, d1) + 1)) AS t(k)),
    types AS (SELECT DISTINCT event_type FROM events),
    daily AS (SELECT CAST(CAST(ts AS DATE) AS TIMESTAMP) AS day, event_type,
                     count(*) AS n, round(sum(value), 2) AS tv
              FROM events GROUP BY 1, 2)
    SELECT s.day, ty.event_type,
           coalesce(d.n, 0) AS n_events,
           coalesce(d.tv, 0.0) AS total_value
    FROM spine s CROSS JOIN types ty
    LEFT JOIN daily d ON d.day = s.day AND d.event_type = ty.event_type
    """,
    doc=(
        "Calendar-spine gap fill: generate every (day, event_type) cell "
        "between min and max event time (sequence + explode), left-join "
        "daily aggregates, zero-fill gaps. The spine sides are "
        "dimension-sized, so the cross join is a broadcast nested loop "
        "over a handful of rows — the fact scan stays single-pass."
    ),
    tags=("spine", "agg"),
)
def date_spine_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    ev = t["events"]
    bounds = ev.agg(
        F.min(F.col("ts").cast("date")).alias("d0"),
        F.max(F.col("ts").cast("date")).alias("d1"),
    )
    # sequence(date, date, day-time interval) yields timestamps in Spark;
    # cast back to date to match the spine's grain.
    spine = bounds.select(
        F.explode(F.expr("sequence(d0, d1, interval 1 day)")).alias("ts_day")
    ).select(F.col("ts_day").cast("date").cast("timestamp").alias("day"))
    types = ev.select("event_type").distinct()
    daily = ev.groupBy(
        F.col("ts").cast("date").cast("timestamp").alias("day"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("tv")
    )
    return (
        spine.crossJoin(types)
        .join(daily, ["day", "event_type"], "left")
        .select(
            "day",
            "event_type",
            F.coalesce(F.col("n"), F.lit(0).cast("long")).alias("n_events"),
            F.coalesce(F.col("tv"), F.lit(0.0)).alias("total_value"),
        )
    )


# ---------------------------------------------------------------------------
# Document chunking (LLM preprocessing: overlapping fixed-size chunks)
# ---------------------------------------------------------------------------

_CHUNK_SIZE = 200
_CHUNK_STRIDE = 150


@register(
    "doc_chunking",
    f"""
    SELECT doc_id,
           CAST(s // {_CHUNK_STRIDE} AS BIGINT) AS chunk_id,
           CAST(s AS BIGINT) AS chunk_start,
           substr(text, s + 1, {_CHUNK_SIZE}) AS chunk_text,
           CAST(length(substr(text, s + 1, {_CHUNK_SIZE})) AS BIGINT) AS chunk_len
    FROM documents,
         UNNEST(range(0, greatest(length(text), 1), {_CHUNK_STRIDE})) AS t(s)
    """,
    doc=(
        f"Overlapping chunking ({_CHUNK_SIZE}-char chunks, {_CHUNK_STRIDE}-char "
        "stride) with character offsets — the standard LLM context-window "
        "prep. sequence + posexplode + substring, fully JVM-side."
    ),
    tags=("llm", "text", "chunk"),
)
def doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    starts = F.sequence(
        F.lit(0),
        F.greatest(F.length("text") - 1, F.lit(0)),
        F.lit(_CHUNK_STRIDE),
    )
    return (
        t["documents"]
        .select("doc_id", "text", F.posexplode(starts).alias("chunk_id", "s"))
        .select(
            "doc_id",
            F.col("chunk_id").cast("long").alias("chunk_id"),
            F.col("s").cast("long").alias("chunk_start"),
            F.expr(f"substring(text, s + 1, {_CHUNK_SIZE})").alias("chunk_text"),
            F.length(F.expr(f"substring(text, s + 1, {_CHUNK_SIZE})"))
            .cast("long")
            .alias("chunk_len"),
        )
    )


# ---------------------------------------------------------------------------
# Benchmark-contamination check
# ---------------------------------------------------------------------------


@register(
    "contamination_check",
    f"""
    WITH {_GRAMS_SQL},
    bench AS (SELECT doc_id FROM documents WHERE {_pct_expr("doc_id", "duck")} < 10),
    bgrams AS (SELECT DISTINCT gram FROM grams
               WHERE doc_id IN (SELECT doc_id FROM bench)),
    cg AS (SELECT doc_id, gram FROM grams
           WHERE doc_id NOT IN (SELECT doc_id FROM bench))
    SELECT cg.doc_id,
           count(*) AS n_grams,
           count(b.gram) AS n_contaminated,
           round(count(b.gram) * 1.0 / count(*), 4) AS contamination
    FROM cg LEFT JOIN bgrams b ON cg.gram = b.gram
    GROUP BY cg.doc_id
    """,
    doc=(
        "Benchmark-contamination score: fraction of each corpus doc's "
        "distinct 3-gram shingles that appear anywhere in the benchmark "
        "split (deterministic 10% hash sample stands in for the benchmark). "
        "The benchmark gram set is small -> broadcast hash join; at "
        "extreme scale the same shape becomes a bloom-filter semi-join."
    ),
    tags=("llm", "dedup", "eval"),
)
def contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    docs = t["documents"]
    pct = F.expr(_pct_expr("doc_id", "spark"))
    # The bench membership is a DETERMINISTIC row-local expression of
    # doc_id, so both sides are plain filters on the corpus — no
    # bench_ids join, no left_anti, and each side's gram explode runs
    # over only ITS docs. The previous shape planned the full
    # gram-explode subtree TWICE (both sides of the membership joins),
    # ~0.9s of the query's 0.96s at sf0.1 (guide §2.4): 200% of the
    # shingling work vs 10% + 90% here.
    bgrams = _doc_grams(docs.filter(pct < 10)).select("gram").distinct()
    cg = _doc_grams(docs.filter(pct >= 10))
    hit = F.broadcast(bgrams.withColumn("__hit", F.lit(1)))
    return (
        cg.join(hit, "gram", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.count("__hit").alias("n_contaminated"),
        )
        .select(
            "doc_id",
            "n_grams",
            "n_contaminated",
            F.round(F.col("n_contaminated") / F.col("n_grams"), 4).alias("contamination"),
        )
    )


# ---------------------------------------------------------------------------
# Connected components over dup pairs (cluster near-duplicates)
# ---------------------------------------------------------------------------

_CC_MAX_ITERS = 50


@register(
    "dedup_connected_components",
    f"""
    WITH RECURSIVE {_GRAMS_SQL},
    {_minhash_sig_sql()},
    {_band_keys_sql()},
    cbands AS (
        SELECT doc_id, band_key FROM bands
        QUALIFY count(*) OVER (PARTITION BY band_key) <= 200),
    pairs AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM cbands a JOIN cbands b
          ON a.band_key = b.band_key AND a.doc_id < b.doc_id),
    edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
              UNION SELECT doc_b, doc_a FROM pairs),
    nodes AS (SELECT DISTINCT src AS node FROM edges),
    walk(node, reach) AS (
        SELECT node, node FROM nodes
        UNION
        SELECT w.node, e.dst FROM walk w JOIN edges e ON w.reach = e.src),
    cc AS (SELECT node, min(reach) AS cluster_id FROM walk GROUP BY node)
    SELECT node AS doc_id, cluster_id,
           count(*) OVER (PARTITION BY cluster_id) AS cluster_size
    FROM cc
    """,
    doc=(
        "Dup-pair clustering: connected components over the MinHash-LSH "
        "candidate pairs via distributed min-label propagation (one "
        "shuffle join + min-agg per iteration, lineage cut per step, "
        "sum-of-labels fixpoint). cluster_id = min doc_id of the "
        "component — the canonical survivor of each near-dup group. "
        "Oracle: DuckDB recursive CTE reachability."
    ),
    tags=("llm", "dedup", "iterative"),
)
def dedup_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    # Both edge directions in ONE pass over the minhash output (inline
    # of a 2-struct array), checkpointed directly off the minhash
    # lineage — the previous pairs-checkpoint + union-of-two-selects
    # planned a second materialization job for the same rows.
    edges = (
        dedup_minhash_lsh(spark, sf_dir)
        .selectExpr(
            "inline(array(struct(doc_a AS src, doc_b AS dst), "
            "struct(doc_b AS src, doc_a AS dst)))"
        )
        .localCheckpoint(eager=True)
    )
    # Initial label == node, so iteration 1's neighbor-min needs no
    # labels join at all: it is min(src) per dst group (edges are
    # symmetric, so every node appears as a dst). This folds the
    # labels-init checkpoint and the first join+groupBy round into one
    # aggregation; LSH buckets emit cliques, so most components are
    # already at their fixpoint here and the loop below runs once to
    # certify it.
    labels = (
        edges.groupBy(F.col("dst").alias("node"))
        .agg(F.min("src").alias("nl"))
        .select("node", F.least(F.col("node"), F.col("nl")).alias("label"))
        .localCheckpoint(eager=True)
    )
    # Labels only decrease, so sum(label) strictly decreases until the
    # fixpoint: a 1-scalar driver-side convergence probe per iteration.
    prev_sum = labels.agg(F.sum("label")).collect()[0][0]
    for _ in range(_CC_MAX_ITERS):
        neigh = (
            edges.join(labels, edges.src == labels.node)
            .groupBy(F.col("dst").alias("node"))
            .agg(F.min("label").alias("nl"))
        )
        labels = (
            labels.join(neigh, "node", "left")
            .select(
                "node",
                F.least(F.col("label"), F.coalesce(F.col("nl"), F.col("label"))).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
        cur_sum = labels.agg(F.sum("label")).collect()[0][0]
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    else:
        raise RuntimeError(f"label propagation did not converge in {_CC_MAX_ITERS} iters")
    w = Window.partitionBy("label")
    return labels.select(
        F.col("node").alias("doc_id"),
        F.col("label").alias("cluster_id"),
        F.count(F.lit(1)).over(w).cast("long").alias("cluster_size"),
    )


@register(
    "dedup_keep_canonical",
    f"""
    WITH RECURSIVE {_GRAMS_SQL},
    {_minhash_sig_sql()},
    {_band_keys_sql()},
    cbands AS (
        SELECT doc_id, band_key FROM bands
        QUALIFY count(*) OVER (PARTITION BY band_key) <= 200),
    pairs AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM cbands a JOIN cbands b
          ON a.band_key = b.band_key AND a.doc_id < b.doc_id),
    edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
              UNION SELECT doc_b, doc_a FROM pairs),
    nodes AS (SELECT DISTINCT src AS node FROM edges),
    walk(node, reach) AS (
        SELECT node, node FROM nodes
        UNION
        SELECT w.node, e.dst FROM walk w JOIN edges e ON w.reach = e.src),
    cc AS (SELECT node, min(reach) AS cluster_id FROM walk GROUP BY node)
    SELECT d.doc_id FROM documents d
    WHERE d.doc_id NOT IN (SELECT node FROM cc WHERE node <> cluster_id)
    ORDER BY d.doc_id
    """,
    doc=(
        "The dedup pipeline's terminal stage: the corpus AFTER near-dup "
        "removal. Each near-dup cluster (connected components over the "
        "MinHash-LSH candidate pairs) keeps only its canonical survivor "
        "(min doc_id); docs in no cluster survive untouched. One left-anti "
        "join of the corpus against the non-canonical members — the shape "
        "that scales: the drop list is cluster-members-only, orders of "
        "magnitude smaller than the corpus."
    ),
    tags=("llm", "dedup"),
)
def dedup_keep_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    cc = dedup_connected_components(spark, sf_dir)
    drop = cc.filter(F.col("doc_id") != F.col("cluster_id")).select("doc_id")
    return t["documents"].join(drop, "doc_id", "left_anti").select("doc_id")


_PREP_MIN_CHARS = 150
_PREP_MAX_REP = 0.7
_PREP_SHARDS = 8
_PREP_CHUNK, _PREP_STRIDE = 32, 24


@register(
    "pipeline_corpus_prep",
    f"""
    WITH canon AS (
        SELECT md5(text) AS h, min(doc_id) AS doc_id
        FROM documents GROUP BY md5(text)),
    survivors AS (
        SELECT d.doc_id, d.text, d.n_chars
        FROM documents d JOIN canon c ON d.doc_id = c.doc_id
        WHERE d.n_chars >= {_PREP_MIN_CHARS}),
    w AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS ws
          FROM survivors),
    g AS (SELECT doc_id, array_to_string(ws[i:i+2], ' ') AS gram
          FROM w, UNNEST(range(1, len(ws) - 1)) AS t(i)
          WHERE len(ws) >= 3),
    rep AS (SELECT doc_id,
                   1 - count(DISTINCT gram) * 1.0 / count(*) AS rep_ratio
            FROM g GROUP BY doc_id),
    clean AS (
        SELECT w.doc_id, w.ws FROM w JOIN rep USING (doc_id)
        WHERE rep.rep_ratio <= {_PREP_MAX_REP}),
    chunks AS (
        SELECT doc_id,
               len(ws[s + 1:s + {_PREP_CHUNK}]) AS n_words
        FROM clean, UNNEST(range(0, greatest(len(ws), 1), {_PREP_STRIDE})) AS t(s)),
    sharded AS (
        SELECT doc_id, n_words,
               {_pct_expr("doc_id", "duck")} % {_PREP_SHARDS} AS shard
        FROM chunks)
    SELECT shard, count(*) AS n_chunks,
           count(DISTINCT doc_id) AS n_docs,
           CAST(sum(n_words) AS BIGINT) AS total_words
    FROM sharded GROUP BY shard
    """,
    doc=(
        "END-TO-END corpus preparation — the full preprocessing chain a "
        "training run needs, composed from the engine's own stages in "
        "one lazy plan: exact dedup (canonical min doc_id per content "
        "hash) -> length filter -> repetition filter (duplicate-3-gram "
        "ratio) -> sliding-window chunking -> deterministic shard "
        "assignment -> per-shard stats. Proves the hygiene operators "
        "compose without materialization barriers; every stage is the "
        "same shuffle-on-key shape it has standalone, so the pipeline "
        "scales exactly as its worst stage does."
    ),
    tags=("llm", "pipeline", "hygiene"),
)
def pipeline_corpus_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tiflink_spark.queries_llm import _doc_grams, _words

    t = _t(spark, sf_dir)
    docs = t["documents"]
    canon = docs.groupBy(F.md5("text").alias("h")).agg(
        F.min("doc_id").alias("doc_id")
    )
    survivors = (
        docs.join(canon.select("doc_id"), "doc_id")
        .filter(F.col("n_chars") >= _PREP_MIN_CHARS)
        .select("doc_id", "text")
    )
    # The repetition ratio is a PER-DOC function of the doc's own gram
    # multiset — computed row-locally from the gram array (the same
    # regex pass _doc_grams uses) instead of explode + groupBy + a
    # join back onto survivors, which planned the whole survivors
    # subtree (documents scan ⋈ canon) twice (guide §2.4). A doc with
    # no grams (< n words) had no rep row and was dropped by the inner
    # join; here its ratio is NULL and the filter drops it the same.
    # count/countDistinct over the exploded rows ≡ size/array_distinct
    # of the array, so the double division is bit-identical.
    norm = F.regexp_replace(F.trim(F.col("text")), r"\s+", " ")
    pat = r"(?<![^ ])(?=(" + " ".join(["[^ ]+"] * 3) + r"))"
    garr = F.regexp_extract_all(norm, F.lit(pat), 1)
    # ANSI mode: guard the zero-gram case (CASE short-circuits, so the
    # division never sees size 0; NULL ratio ≡ the old dropped row)
    rep_ratio = F.when(
        F.size(garr) > 0, 1 - F.size(F.array_distinct(garr)) / F.size(garr)
    )
    clean = survivors.withColumn("rep_ratio", rep_ratio).filter(
        F.col("rep_ratio") <= _PREP_MAX_REP
    )
    ws = _words(F.col("text"))
    n = F.size(ws)
    starts = F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(_PREP_STRIDE))
    chunks = clean.select(
        "doc_id", ws.alias("ws"), F.explode(starts).alias("s")
    ).select(
        "doc_id",
        F.size(F.slice(F.col("ws"), F.col("s") + 1, _PREP_CHUNK)).alias("n_words"),
    )
    shard = (F.expr(_pct_expr("doc_id", "spark")) % _PREP_SHARDS).alias("shard")
    return (
        chunks.select("doc_id", "n_words", shard)
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.countDistinct("doc_id").alias("n_docs"),
            F.sum("n_words").alias("total_words"),
        )
    )
