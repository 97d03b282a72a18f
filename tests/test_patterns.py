"""MATCH_RECOGNIZE subset: greedy backtracking NFA semantics."""

import pytest

from tiflink_spark.patterns import match_recognize


def _rows(spark, vals):
    # (k, seq, tag, v)
    return spark.createDataFrame(vals, "k int, seq int, tag string, v double")


def _collect(df):
    return [tuple(r) for r in df.orderBy("k", "match_seq").collect()]


def test_greedy_plus_with_backtracking(spark):
    # B := v > 0, C := v > 10 — every C row also satisfies B, so the
    # greedy B+ first swallows the would-be C row and must BACKTRACK
    # to give it up (Flink's greedy semantics).
    df = _rows(spark, [(1, 1, "a", 1.0), (1, 2, "b", 2.0), (1, 3, "b", 20.0)])
    out = match_recognize(
        df,
        partition_by=["k"],
        order_by=["seq"],
        pattern=[("A", "1"), ("B", "+"), ("C", "1")],
        define={"A": "tag = 'a'", "B": "v > 0", "C": "v > 10"},
        measures=[
            ("b_count", "B", None, "count"),
            ("c_v", "C", "v", "first"),
        ],
    )
    assert _collect(out) == [(1, 1, 1, 20.0)]  # B kept one row, C got row 3


def test_skip_past_last_row_never_overlaps(spark):
    # a b a b: two disjoint A B matches; the second attempt starts
    # AFTER the first match's last row.
    df = _rows(
        spark,
        [(1, 1, "a", 0.0), (1, 2, "b", 0.0), (1, 3, "a", 0.0), (1, 4, "b", 0.0)],
    )
    out = match_recognize(
        df,
        partition_by=["k"],
        order_by=["seq"],
        pattern=[("A", "1"), ("B", "1")],
        define={"A": "tag = 'a'", "B": "tag = 'b'"},
        measures=[("a_seq", "A", "seq", "first"), ("b_seq", "B", "seq", "last")],
    )
    assert _collect(out) == [(1, 1, 1, 2), (1, 2, 3, 4)]


def test_failed_attempt_restarts_at_next_row(spark):
    # a a b: the attempt at row 1 fails (a not followed by b) but the
    # attempt at row 2 succeeds — failure advances one row, not past
    # the failed prefix.
    df = _rows(spark, [(1, 1, "a", 0.0), (1, 2, "a", 0.0), (1, 3, "b", 0.0)])
    out = match_recognize(
        df,
        partition_by=["k"],
        order_by=["seq"],
        pattern=[("A", "1"), ("B", "1")],
        define={"A": "tag = 'a'", "B": "tag = 'b'"},
        measures=[("a_seq", "A", "seq", "first")],
    )
    assert _collect(out) == [(1, 1, 2)]


def test_undefined_var_matches_all_and_null_pred_is_false(spark):
    # W has no DEFINE -> matches every row (Flink's rule); a NULL
    # predicate value reads as no-match like SQL WHERE.
    df = _rows(spark, [(1, 1, None, 1.0), (1, 2, "x", 1.0)])
    out = match_recognize(
        df,
        partition_by=["k"],
        order_by=["seq"],
        pattern=[("W", "1"), ("X", "1")],
        define={"X": "tag = 'x'"},  # row 1: NULL = 'x' -> NULL -> False
        measures=[("w_seq", "W", "seq", "first"), ("x_seq", "X", "seq", "first")],
    )
    assert _collect(out) == [(1, 1, 1, 2)]


def test_partitions_are_independent(spark):
    df = _rows(spark, [(1, 1, "a", 0.0), (2, 1, "a", 0.0), (2, 2, "b", 0.0)])
    out = match_recognize(
        df,
        partition_by=["k"],
        order_by=["seq"],
        pattern=[("A", "1"), ("B", "1")],
        define={"A": "tag = 'a'", "B": "tag = 'b'"},
        measures=[("b_seq", "B", "seq", "first")],
    )
    assert _collect(out) == [(2, 1, 2)]  # k=1 has no b -> no match


def test_rejects_bad_specs(spark):
    df = _rows(spark, [(1, 1, "a", 0.0)])
    with pytest.raises(ValueError, match="pattern must be"):
        match_recognize(df, ["k"], ["seq"], [("A", "*")], {}, [])
    with pytest.raises(ValueError, match="not in pattern"):
        match_recognize(df, ["k"], ["seq"], [("A", "1")], {"B": "1=1"}, [])
    with pytest.raises(ValueError, match="needs a field"):
        match_recognize(
            df, ["k"], ["seq"], [("A", "1")], {}, [("m", "A", None, "sum")]
        )


def test_streaming_match_spans_micro_batch_boundary(spark, tmp_path):
    """A single V C+ P match whose rows are SPLIT across two trigger
    files: the first trigger ends mid-candidate (V C), the second
    completes it (C P). Only carried state can produce the match with
    n_clicks=2 — per-batch matching alone would lose it."""
    import os

    from tiflink_spark.patterns import match_recognize_stream

    f1 = spark.createDataFrame(
        [(1, 1, "view", 1.0), (1, 2, "click", 2.0)],
        "k long, seq long, tag string, v double",
    )
    f2 = spark.createDataFrame(
        [(1, 3, "click", 3.0), (1, 4, "purchase", 4.0)],
        "k long, seq long, tag string, v double",
    )
    sdir = tmp_path / "stream"
    sdir.mkdir()
    for i, df in enumerate((f1, f2), start=1):
        tmp = str(tmp_path / f"w{i}")
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = next(
            f for f in os.listdir(tmp) if f.startswith("part-") and f.endswith(".parquet")
        )
        dst = str(sdir / f"chunk{i}.parquet")
        os.rename(os.path.join(tmp, part), dst)
        os.utime(dst, (1_700_000_000 + i, 1_700_000_000 + i))
    stream = (
        spark.readStream.schema("k long, seq long, tag string, v double")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(sdir))
    )
    out = match_recognize_stream(
        stream,
        partition_by=["k"],
        order_by=["seq"],
        pattern=[("V", "1"), ("C", "+"), ("P", "1")],
        define={"V": "tag = 'view'", "C": "tag = 'click'", "P": "tag = 'purchase'"},
        measures=[
            ("n_clicks", "C", None, "count"),
            ("clicks_v", "C", "v", "sum"),
            ("p_seq", "P", "seq", "last"),
        ],
    )
    q = (
        out.writeStream.format("memory")
        .queryName("pattern_span_sink")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = [tuple(r) for r in spark.table("pattern_span_sink").collect()]
    assert rows == [(1, 1, 2, 5.0, 4)]


def test_streaming_pending_state_is_bounded(spark, tmp_path):
    """max_pending_rows evicts a candidate that buffers too long (the
    WITHIN analog): the stuck view+clicks candidate from file1 is
    abandoned once the suffix exceeds the bound, and the resolvable
    match in file2 still emits correctly."""
    import os

    from tiflink_spark.patterns import match_recognize_stream

    f1 = spark.createDataFrame(
        [(1, 1, "view", 1.0), (1, 2, "click", 1.0), (1, 3, "click", 1.0),
         (1, 4, "click", 1.0)],
        "k long, seq long, tag string, v double",
    )
    f2 = spark.createDataFrame(
        [(1, 5, "view", 1.0), (1, 6, "click", 2.0), (1, 7, "purchase", 1.0)],
        "k long, seq long, tag string, v double",
    )
    sdir = tmp_path / "stream"
    sdir.mkdir()
    for i, df in enumerate((f1, f2), start=1):
        tmp = str(tmp_path / f"w{i}")
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = next(
            f for f in os.listdir(tmp) if f.startswith("part-") and f.endswith(".parquet")
        )
        dst = str(sdir / f"chunk{i}.parquet")
        os.rename(os.path.join(tmp, part), dst)
        os.utime(dst, (1_700_000_000 + i, 1_700_000_000 + i))
    stream = (
        spark.readStream.schema("k long, seq long, tag string, v double")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(sdir))
    )
    out = match_recognize_stream(
        stream,
        partition_by=["k"],
        order_by=["seq"],
        pattern=[("V", "1"), ("C", "+"), ("P", "1")],
        define={"V": "tag = 'view'", "C": "tag = 'click'", "P": "tag = 'purchase'"},
        measures=[("n_clicks", "C", None, "count"), ("p_seq", "P", "seq", "last")],
        max_pending_rows=2,
    )
    q = (
        out.writeStream.format("memory")
        .queryName("pattern_evict_sink")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = [tuple(r) for r in spark.table("pattern_evict_sink").collect()]
    assert rows == [(1, 1, 1, 7)]


def test_within_discards_wide_matches(spark):
    """WITHIN (Flink parity): a match whose first->last order span
    exceeds the bound is discarded; a tighter later match still
    emits."""
    from tiflink_spark.patterns import match_recognize

    df = _rows(
        spark,
        # wide candidate: a@1 ... b@50 (span 49); tight one: a@60 b@61
        [(1, 1, "a", 0.0), (1, 50, "b", 0.0), (1, 60, "a", 0.0), (1, 61, "b", 0.0)],
    )
    out = match_recognize(
        df,
        partition_by=["k"],
        order_by=["seq"],
        pattern=[("A", "1"), ("B", "1")],
        define={"A": "tag = 'a'", "B": "tag = 'b'"},
        measures=[("a_seq", "A", "seq", "first"), ("b_seq", "B", "seq", "last")],
        within=10,
    )
    assert _collect(out) == [(1, 1, 60, 61)]


def test_streaming_within_finalizes_stale_candidates(spark, tmp_path):
    """Streaming WITHIN: a blocked candidate older than the bound
    FINALIZES — its held provisional match emits (timeout rule) even
    though a greedier continuation was still theoretically possible."""
    import os

    from tiflink_spark.patterns import match_recognize_stream

    # file1: a@1 b@2 — A B+ held (the b-run touches the data edge);
    # file2: far-future unrelated row pushes the candidate past WITHIN
    f1 = _rows(spark, [(1, 1, "a", 0.0), (1, 2, "b", 0.0)])
    f2 = _rows(spark, [(1, 100, "x", 0.0)])
    sdir = tmp_path / "stream"
    sdir.mkdir()
    for i, df in enumerate((f1, f2), start=1):
        tmp = str(tmp_path / f"w{i}")
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = next(
            f for f in os.listdir(tmp) if f.startswith("part-") and f.endswith(".parquet")
        )
        dst = str(sdir / f"chunk{i}.parquet")
        os.rename(os.path.join(tmp, part), dst)
        os.utime(dst, (1_700_000_000 + i, 1_700_000_000 + i))
    stream = (
        spark.readStream.schema("k int, seq int, tag string, v double")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(sdir))
    )
    out = match_recognize_stream(
        stream,
        partition_by=["k"],
        order_by=["seq"],
        pattern=[("A", "1"), ("B", "+")],
        define={"A": "tag = 'a'", "B": "tag = 'b'"},
        measures=[("n_b", "B", None, "count")],
        within=10,
    )
    q = (
        out.writeStream.format("memory")
        .queryName("pattern_within_sink")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = [tuple(r) for r in spark.table("pattern_within_sink").collect()]
    assert rows == [(1, 1, 1)]
