"""Data-ops pack: the selection/profiling operators a training-data
pipeline runs constantly — deterministic sampling, dataset splits,
stratified per-group selection, column profiling, funnel analysis.

All sampling here is HASH-deterministic (md5 of the key), never RNG:
at 100 TB a sample must be reproducible across reruns, engines, and
partitionings — and the DuckDB oracle verifies exactly that property.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tiflink_spark.queries import _t, register

def _pct_expr(key_sql: str, dialect: str) -> str:
    """Deterministic percentile bucket of a key, 0..99, same on both
    engines: first 4 md5 hex digits -> 16-bit int (nibble math via
    instr, which both dialects share) -> mod 100."""
    md5 = (
        f"md5(cast({key_sql} AS string))"
        if dialect == "spark"
        else f"md5(CAST({key_sql} AS VARCHAR))"
    )
    nibbles = " + ".join(
        f"(instr('0123456789abcdef', substr({md5}, {i + 1}, 1)) - 1) * {16 ** (3 - i)}"
        for i in range(4)
    )
    return f"(({nibbles}) % 100)"


@register(
    "sample_deterministic",
    f"""
    SELECT doc_id, lang FROM documents
    WHERE {_pct_expr("doc_id", "duck")} < 10
    """,
    doc=(
        "Deterministic 10% sample by key hash (md5 prefix mod 100) — "
        "reproducible across reruns/engines/partitionings, unlike RNG "
        "TABLESAMPLE. The selection primitive of a 100 TB data pipeline."
    ),
    tags=("llm", "dataops", "sample"),
)
def sample_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir)
    return spark.sql(
        f"SELECT doc_id, lang FROM documents WHERE {_pct_expr('doc_id', 'spark')} < 10"
    )


@register(
    "dataset_split",
    f"""
    WITH tagged AS (
        SELECT doc_id,
               CASE WHEN {_pct_expr("doc_id", "duck")} < 80 THEN 'train'
                    WHEN {_pct_expr("doc_id", "duck")} < 90 THEN 'val'
                    ELSE 'test' END AS split
        FROM documents)
    SELECT split, count(*) AS n, min(doc_id) AS min_id, max(doc_id) AS max_id
    FROM tagged GROUP BY split
    """,
    doc=(
        "Train/val/test split (80/10/10) by key hash: stable assignment — a "
        "document never migrates between splits as the corpus grows."
    ),
    tags=("llm", "dataops", "sample"),
)
def dataset_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir)
    pct = _pct_expr("doc_id", "spark")
    return spark.sql(
        f"""
        WITH tagged AS (
            SELECT doc_id,
                   CASE WHEN {pct} < 80 THEN 'train'
                        WHEN {pct} < 90 THEN 'val'
                        ELSE 'test' END AS split
            FROM documents)
        SELECT split, count(*) AS n, min(doc_id) AS min_id, max(doc_id) AS max_id
        FROM tagged GROUP BY split
        """
    )


@register(
    "sample_stratified",
    """
    SELECT lang, doc_id FROM (
        SELECT lang, doc_id,
               row_number() OVER (PARTITION BY lang ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
        FROM documents)
    WHERE rn <= 5
    """,
    doc=(
        "Stratified sample: 5 docs per language, chosen by hash order "
        "(deterministic, unbiased w.r.t. insertion order). Per-group "
        "work is one window over the group — no global sort."
    ),
    tags=("llm", "dataops", "sample"),
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    t = _t(spark, sf_dir)
    w = Window.partitionBy("lang").orderBy(F.md5(F.col("doc_id").cast("string").cast("binary")), "doc_id")
    return (
        t["documents"]
        .select("lang", "doc_id", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 5)
        .select("lang", "doc_id")
    )


@register(
    "profile_columns",
    """
    SELECT count(*) AS n_rows,
           count(o_orderstatus) AS status_nonnull,
           count(DISTINCT o_orderstatus) AS status_card,
           count(DISTINCT o_orderpriority) AS prio_card,
           round(min(o_totalprice), 2) AS price_min,
           round(max(o_totalprice), 2) AS price_max,
           round(avg(o_totalprice), 4) AS price_mean,
           CAST(min(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS date_min,
           CAST(max(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS date_max
    FROM orders
    """,
    doc=(
        "Column profiling (the data-quality scan run before any training "
        "job): null counts, cardinalities, numeric and date ranges in ONE "
        "pass over the table."
    ),
    tags=("llm", "dataops", "profile"),
)
def profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    o = t["orders"]
    return o.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("o_orderstatus").alias("status_nonnull"),
        F.countDistinct("o_orderstatus").alias("status_card"),
        F.countDistinct("o_orderpriority").alias("prio_card"),
        F.round(F.min("o_totalprice"), 2).alias("price_min"),
        F.round(F.max("o_totalprice"), 2).alias("price_max"),
        F.round(F.avg("o_totalprice"), 4).alias("price_mean"),
        F.min(F.col("o_orderdate").cast("date")).cast("timestamp").alias("date_min"),
        F.max(F.col("o_orderdate").cast("date")).cast("timestamp").alias("date_max"),
    )


@register(
    "funnel_view_click_purchase",
    """
    SELECT count(*) AS n_converted
    FROM (
        SELECT user_id
        FROM events
        GROUP BY user_id
        HAVING min(CASE WHEN event_type = 'view' THEN ts END)
               < max(CASE WHEN event_type = 'click' THEN ts END)
           AND min(CASE WHEN event_type = 'click' THEN ts END)
               < max(CASE WHEN event_type = 'purchase' THEN ts END)
    )
    """,
    doc=(
        "Funnel analysis: users whose first view precedes a later click "
        "which precedes a later purchase — one grouped pass with "
        "conditional min/max, no self-joins."
    ),
    tags=("dataops", "funnel", "event-time"),
)
def funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    view_min = F.min(F.when(F.col("event_type") == "view", F.col("ts")))
    click_min = F.min(F.when(F.col("event_type") == "click", F.col("ts")))
    click_max = F.max(F.when(F.col("event_type") == "click", F.col("ts")))
    buy_max = F.max(F.when(F.col("event_type") == "purchase", F.col("ts")))
    converted = (
        t["events"]
        .groupBy("user_id")
        .agg(
            view_min.alias("v"), click_min.alias("c1"), click_max.alias("c2"), buy_max.alias("p")
        )
        .filter((F.col("v") < F.col("c2")) & (F.col("c1") < F.col("p")))
    )
    return converted.agg(F.count(F.lit(1)).alias("n_converted"))


def _shard_expr(key_sql: str, dialect: str, n: int = 16) -> str:
    """Deterministic shard id 0..n-1 from the same md5-nibble recipe as
    _pct_expr — stable across runs and engines, no RNG."""
    md5 = (
        f"md5(cast({key_sql} AS string))"
        if dialect == "spark"
        else f"md5(CAST({key_sql} AS VARCHAR))"
    )
    nibbles = " + ".join(
        f"(instr('0123456789abcdef', substr({md5}, {i + 1}, 1)) - 1) * {16 ** (3 - i)}"
        for i in range(4)
    )
    return f"(({nibbles}) % {n})"


@register(
    "dataset_shard_assignment",
    f"""
    SELECT doc_id, CAST({_shard_expr("doc_id", "duck")} AS BIGINT) AS shard
    FROM documents
    """,
    doc=(
        "Deterministic shard routing for training output: every document "
        "maps to one of 16 shards by a key hash — stable across runs, no "
        "RNG. At 100 TB this is the partition expression of the final "
        "write (repartition('shard').write.partitionBy('shard'))."
    ),
    tags=("dataops", "sharding"),
)
def dataset_shard_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    return t["documents"].selectExpr(
        "doc_id", f"CAST({_shard_expr('doc_id', 'spark')} AS BIGINT) AS shard"
    )


@register(
    "pack_sequences",
    """
    WITH ordered AS (
        SELECT doc_id, n_chars,
               sum(n_chars) OVER (ORDER BY doc_id
                                  ROWS UNBOUNDED PRECEDING) AS cum_chars
        FROM documents)
    SELECT doc_id, CAST(floor((cum_chars - n_chars) / 4096) AS BIGINT) AS pack_id
    FROM ordered
    """,
    doc=(
        "Sequence packing for training batches: documents greedily packed "
        "into ~4096-char bins by cumulative length over a deterministic "
        "order (bin = floor(preceding_chars / budget)). At scale the "
        "cumulative sum runs per shard (partitionBy shard) so no global "
        "single-partition window exists; the global form here matches the "
        "gate's single-table scale."
    ),
    tags=("dataops", "packing"),
)
def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    t = _t(spark, sf_dir)
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, 0)
    return t["documents"].select(
        "doc_id",
        F.floor((F.sum("n_chars").over(w) - F.col("n_chars")) / 4096)
        .cast("bigint")
        .alias("pack_id"),
    )


@register(
    "corpus_length_stats",
    """
    SELECT lang,
           count(*) AS n_docs,
           CAST(min(n_chars) AS BIGINT) AS min_chars,
           CAST(max(n_chars) AS BIGINT) AS max_chars,
           round(avg(n_chars), 2) AS avg_chars,
           round(quantile_cont(n_chars, 0.5), 1) AS median_chars
    FROM documents
    GROUP BY lang
    """,
    doc=(
        "Corpus length profile per language: the pre-training data audit "
        "(doc counts, char-length min/max/mean/median) in one grouped pass; "
        "median via percentile (exact at gate scale, approx_percentile at "
        "100 TB)."
    ),
    tags=("dataops", "profiling"),
)
def corpus_length_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    return t["documents"].groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("n_chars").cast("bigint").alias("min_chars"),
        F.max("n_chars").cast("bigint").alias("max_chars"),
        F.round(F.avg("n_chars"), 2).alias("avg_chars"),
        F.round(F.expr("percentile(n_chars, 0.5)"), 1).alias("median_chars"),
    )


_MIX_RATE_SQL = (
    "CASE source WHEN 'src0' THEN 60 WHEN 'src1' THEN 25 ELSE 10 END"
)


@register(
    "sample_mixture_weighted",
    f"""
    SELECT source, count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM documents
    WHERE {_pct_expr("doc_id", "duck")} < {_MIX_RATE_SQL}
    GROUP BY source
    """,
    doc=(
        "Weighted mixture sampling: per-source inclusion rates (the "
        "dataset-mixture knob of every pretraining pipeline — upsample "
        "high-quality sources, downsample the crawl) applied via the "
        "deterministic hash-percent primitive, so the mixture is "
        "reproducible across reruns, engines, and partitionings. One "
        "scan, filter evaluated map-side, partial-agg shuffle by "
        "source only."
    ),
    tags=("llm", "dataops", "sample"),
)
def sample_mixture_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir)
    return spark.sql(
        f"""SELECT source, count(*) AS n_docs, sum(n_chars) AS total_chars
            FROM documents
            WHERE {_pct_expr("doc_id", "spark")} < {_MIX_RATE_SQL}
            GROUP BY source"""
    )


@register(
    "retention_cohorts",
    """
    WITH firsts AS (
        SELECT user_id, min(date_trunc('week', ts)) AS cohort
        FROM events GROUP BY user_id),
    active AS (
        SELECT DISTINCT user_id, date_trunc('week', ts) AS wk FROM events)
    SELECT f.cohort,
           CAST((epoch(a.wk) - epoch(f.cohort)) / 604800 AS BIGINT) AS week_offset,
           count(*) AS n_users
    FROM active a JOIN firsts f ON a.user_id = f.user_id
    GROUP BY f.cohort, week_offset
    """,
    doc=(
        "Retention cohort analysis over the event stream: users grouped "
        "by first-seen week (the cohort), counted in every later week "
        "they stay active — the classic growth-analytics triangle. Week "
        "offsets computed as integer epoch arithmetic so both engines "
        "agree exactly. Two shuffles (per-user min, then "
        "cohort x offset rollup), both keyed and partial-aggregated — "
        "the shape scales to any event volume."
    ),
    tags=("analytics", "events"),
)
def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    ev = t["events"]
    wk = F.date_trunc("week", F.col("ts"))
    firsts = ev.groupBy("user_id").agg(F.min(wk).alias("cohort"))
    active = ev.select("user_id", wk.alias("wk")).distinct()
    offset = (
        (F.unix_timestamp("wk") - F.unix_timestamp("cohort")) / 604800
    ).cast("long")
    return (
        active.join(firsts, "user_id")
        .groupBy("cohort", offset.alias("week_offset"))
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


_HIST_BUCKETS = 16


@register(
    "numeric_histogram",
    f"""
    WITH b AS (SELECT min(l_extendedprice) AS lo, max(l_extendedprice) AS hi
               FROM lineitem)
    SELECT LEAST(CAST(FLOOR((l_extendedprice - lo) * {_HIST_BUCKETS} / (hi - lo))
                      AS BIGINT), {_HIST_BUCKETS - 1}) AS bucket,
           count(*) AS n
    FROM lineitem, b
    GROUP BY 1
    """,
    doc=(
        "Equi-width numeric histogram (distribution profiling for "
        "pipeline health dashboards): bucket index from pure integer "
        "floor arithmetic over the global min/max, computed in one "
        "pre-pass (a 2-row broadcast), then a map-side bucket "
        "assignment and one partial-aggregated shuffle — the classic "
        "two-scan histogram that holds at any scale."
    ),
    tags=("dataops", "profile"),
)
def numeric_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    li = t["lineitem"]
    b = li.agg(
        F.min("l_extendedprice").alias("lo"), F.max("l_extendedprice").alias("hi")
    )
    bucket = F.least(
        F.floor(
            (F.col("l_extendedprice") - F.col("lo"))
            * _HIST_BUCKETS
            / (F.col("hi") - F.col("lo"))
        ).cast("long"),
        F.lit(_HIST_BUCKETS - 1),
    )
    return (
        li.crossJoin(F.broadcast(b))
        .groupBy(bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "heavy_hitters_custkey",
    """
    SELECT o_custkey, count(*) AS n_orders
    FROM orders GROUP BY o_custkey
    ORDER BY n_orders DESC, o_custkey
    LIMIT 20
    """,
    doc=(
        "Exact heavy-hitter report (skew diagnosis before a big join: "
        "the keys that would need salting): per-key counts, "
        "deterministic top-20 under (count DESC, key) total order. One "
        "partial-aggregated shuffle + a driver-side k-row limit."
    ),
    tags=("dataops", "profile", "skew"),
)
def heavy_hitters_custkey(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    return (
        t["orders"]
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy(F.desc("n_orders"), "o_custkey")
        .limit(20)
    )
