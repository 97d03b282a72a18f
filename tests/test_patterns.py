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
        match_recognize(df, ["k"], ["seq"], [], {}, [])
    with pytest.raises(ValueError, match="zero rows"):
        match_recognize(df, ["k"], ["seq"], [("A", "*"), ("B", "?")], {}, [])
    with pytest.raises(ValueError, match="unsupported quantifier"):
        match_recognize(df, ["k"], ["seq"], [("A", "++")], {}, [])
    with pytest.raises(ValueError, match="zero rows"):
        # reluctant spellings parse: *? is still zero-matchable
        match_recognize(df, ["k"], ["seq"], [("A", "*?"), ("B", "??")], {}, [])
    with pytest.raises(ValueError, match="AFTER MATCH SKIP"):
        match_recognize(
            df, ["k"], ["seq"], [("A", "1")], {}, [], after_match="to somewhere"
        )
    with pytest.raises(ValueError, match="unknown variable"):
        match_recognize(
            df, ["k"], ["seq"], [("A", "1")], {}, [], after_match="to last B"
        )
    with pytest.raises(ValueError, match="max < min"):
        match_recognize(df, ["k"], ["seq"], [("A", "{3,2}")], {}, [])
    with pytest.raises(ValueError, match="not in pattern"):
        match_recognize(df, ["k"], ["seq"], [("A", "1")], {"B": "1=1"}, [])
    with pytest.raises(ValueError, match="needs a field"):
        match_recognize(
            df, ["k"], ["seq"], [("A", "1")], {}, [("m", "A", None, "sum")]
        )


def test_optional_and_star_quantifiers(spark):
    # A B? C over "a c" (B absent) and "a b c" (B present): both match;
    # A B* C over "a b b c": the star swallows the whole b-run.
    df = _rows(
        spark,
        [(1, 1, "a", 0.0), (1, 2, "c", 0.0),
         (2, 1, "a", 0.0), (2, 2, "b", 0.0), (2, 3, "c", 0.0),
         (3, 1, "a", 0.0), (3, 2, "b", 0.0), (3, 3, "b", 0.0), (3, 4, "c", 0.0)],
    )
    out = match_recognize(
        df,
        partition_by=["k"],
        order_by=["seq"],
        pattern=[("A", "1"), ("B", "*"), ("C", "1")],
        define={"A": "tag = 'a'", "B": "tag = 'b'", "C": "tag = 'c'"},
        measures=[("n_b", "B", None, "count"), ("c_seq", "C", "seq", "first")],
    )
    assert _collect(out) == [(1, 1, 0, 2), (2, 1, 1, 3), (3, 1, 2, 4)]


def test_range_quantifier_bounds_and_backtracks(spark):
    # B{2,3} C: four b-rows then c — the greedy range takes 3 (its max,
    # not the whole run), leaving b@4 unconsumed, so C fails at b@4 and
    # the start fails; with B{2,4} the same rows match (range takes 4).
    rows = [(1, 1, "a", 0.0)] + [(1, s, "b", 0.0) for s in (2, 3, 4, 5)] + [
        (1, 6, "c", 0.0)
    ]
    df = _rows(spark, rows)

    def run(quant):
        return _collect(
            match_recognize(
                df,
                partition_by=["k"],
                order_by=["seq"],
                pattern=[("A", "1"), ("B", quant), ("C", "1")],
                define={"A": "tag = 'a'", "B": "tag = 'b'", "C": "tag = 'c'"},
                measures=[("n_b", "B", None, "count")],
            )
        )

    assert run("{2,3}") == []  # b@5 blocks C; range can't stretch to 4
    assert run("{2,4}") == [(1, 1, 4)]
    assert run("{2,}") == [(1, 1, 4)]


def test_alternation_union_match_and_leftmost_attribution(spark):
    # (A|B)+ C: the run mixes a- and b-rows; measures attribute each
    # row to the FIRST alternative whose DEFINE holds (v>1 rows satisfy
    # both A and B -> credited to A, the leftmost).
    df = _rows(
        spark,
        [(1, 1, "x", 2.0), (1, 2, "x", 0.5), (1, 3, "x", 3.0), (1, 4, "c", -1.0)],
    )
    out = match_recognize(
        df,
        partition_by=["k"],
        order_by=["seq"],
        pattern=[("A|B", "+"), ("C", "1")],
        define={"A": "v > 1", "B": "v > 0", "C": "tag = 'c'"},
        measures=[
            ("n_a", "A", None, "count"),
            ("n_b", "B", None, "count"),
            ("c_seq", "C", "seq", "first"),
        ],
    )
    assert _collect(out) == [(1, 1, 2, 1, 4)]


def test_batch_within_uses_window_bound_assignment(spark):
    """ADVICE r7 (high): WITHIN must bound the greedy search itself,
    not post-filter the unconstrained assignment — the narrower
    within-bound match emits. A+ B+ with A true everywhere, B at rows
    1 and 3, order values 4/9/26/28, within=10: the window around
    row0 holds rows {0,1}, so A(0) B(1) matches; around row2 it holds
    {2,3}, so A(2) B(3) matches — two matches, not one."""
    df = _rows(
        spark,
        [(1, 4, "b", 0.0), (1, 9, "b", 0.0), (1, 26, "x", 0.0), (1, 28, "b", 0.0)],
    )
    out = match_recognize(
        df,
        partition_by=["k"],
        order_by=["seq"],
        pattern=[("A", "+"), ("B", "+")],
        define={"B": "tag = 'b'"},  # A undefined -> true on every row
        measures=[("a_first", "A", "seq", "first"), ("b_last", "B", "seq", "last")],
        within=10,
    )
    assert _collect(out) == [(1, 1, 4, 9), (1, 2, 26, 28)]


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


@pytest.mark.slow
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


@pytest.mark.slow
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


def test_scan_batch_equals_drained_stream_fuzz():
    """ADVICE r7 (high): the streaming scan's held/decided split plus an
    end-of-stream finalize must reproduce the batch answer EXACTLY, for
    every quantifier shape and WITHIN setting, at every chunking of the
    row stream. Pure-Python fuzz over _scan — no Spark session."""
    import random

    import numpy as np

    from tiflink_spark.patterns import _runtime_steps, _scan, _validate

    def drain(flags_full, steps, ovals_full, within, chunk_sizes, skip):
        emitted, b0, pos = [], 0, 0
        for size in chunk_sizes:
            pos += size
            fl = {v: arr[b0:pos] for v, arr in flags_full.items()}
            ov = ovals_full[b0:pos] if within is not None else None
            rt = _runtime_steps(steps, fl)
            ms, pending = _scan(
                rt, pos - b0, streaming=True, ovals=ov, within=within,
                skip=skip, flags=fl,
            )
            emitted += [[(nm, s + b0, e + b0) for nm, s, e in m] for m in ms]
            b0 += pending
        # end of stream: the residual pending buffer is decided with
        # batch (end-of-data-is-final) semantics
        fl = {v: arr[b0:pos] for v, arr in flags_full.items()}
        ov = ovals_full[b0:pos] if within is not None else None
        rt = _runtime_steps(steps, fl)
        ms, _ = _scan(
            rt, pos - b0, streaming=False, ovals=ov, within=within,
            skip=skip, flags=fl,
        )
        emitted += [[(nm, s + b0, e + b0) for nm, s, e in m] for m in ms]
        return emitted

    rng = random.Random(7)
    specs = [
        [("A", "+"), ("B", "+")],
        [("A", "1"), ("B", "*"), ("C", "1")],
        [("A|B", "+"), ("C", "1")],
        [("A", "{1,2}"), ("B", "?"), ("C", "1")],
        [("A", "{2,}"), ("B", "1")],
        # reluctant shapes (round 8): fewest-rows preference must agree
        # between the batch scan and the drained stream too
        [("A", "1"), ("B", "+?"), ("C", "1")],
        [("A", "+?"), ("B", "+")],
        [("A", "1"), ("B", "*?"), ("C", "1")],
        [("A", "{1,3}?"), ("B", "1")],
    ]
    # skip policies safe under random flags: 'to last B' with B a
    # non-first step never resumes at the match's own start row
    skips = [("past", None), ("next", None), ("last", "B")]
    for _ in range(600):
        pattern = rng.choice(specs)
        _, steps = _validate(pattern, {}, [])
        skip = rng.choice(skips)
        if skip[1] is not None and not any(
            skip[1] in names and si > 0 and lo >= 1
            for si, (names, lo, *_rest) in enumerate(steps)
        ):
            # skip-to a var that can go unbound (or sit at the match
            # start) is the standard's runtime error, not a fuzz case
            skip = ("past", None)
        n = rng.randint(1, 14)
        flags = {
            v: np.array([rng.random() < 0.55 for _ in range(n)]) for v in "ABC"
        }
        ovals = np.cumsum([rng.randint(1, 6) for _ in range(n)])
        within = rng.choice([None, 4, 9, 18])
        rt = _runtime_steps(steps, flags)
        batch, _ = _scan(
            rt, n, streaming=False, ovals=ovals, within=within,
            skip=skip, flags=flags,
        )
        # random chunking of the same rows
        sizes, left = [], n
        while left > 0:
            c = rng.randint(1, left)
            sizes.append(c)
            left -= c
        assert drain(flags, steps, ovals, within, sizes, skip) == batch, (
            pattern, within, sizes, skip,
            [list(f.astype(int)) for f in flags.values()], list(ovals),
        )


def test_reluctant_plus_takes_fewest_rows(spark):
    # B+ greedy swallows the whole b-run; B+? reluctant stops at the
    # first C it can hand over to (Flink's reluctant quantifier).
    rows = [(1, 1, "a", 0.0), (1, 2, "b", 0.0), (1, 3, "b", 0.0),
            (1, 4, "b", 0.0), (1, 5, "c", 0.0)]
    base = dict(
        partition_by=["k"],
        order_by=["seq"],
        define={"A": "tag = 'a'", "B": "tag = 'b' OR tag = 'c'",
                "C": "tag = 'c' OR tag = 'b'"},
        measures=[("b_n", "B", None, "count"), ("c_seq", "C", "seq", "first")],
    )
    df = _rows(spark, rows)
    greedy = match_recognize(
        df, pattern=[("A", "1"), ("B", "+"), ("C", "1")], **base
    )
    # greedy: B takes rows 2-4 (and must backtrack off row 5 for C)
    assert _collect(greedy) == [(1, 1, 3, 5)]
    reluctant = match_recognize(
        df, pattern=[("A", "1"), ("B", "+?"), ("C", "1")], **base
    )
    # reluctant: B takes ONE row, C gets row 3 (also a 'b' — C's
    # define admits it), and the scan resumes at row 4 for no match
    assert _collect(reluctant) == [(1, 1, 1, 3)]


def test_reluctant_optional_prefers_absent(spark):
    # A B?? C over "a b c": greedy B? takes the b; reluctant B?? tries
    # zero first — but C can't match the b row, so it backtracks INTO
    # taking B (reluctance is a preference, not a refusal).
    df = _rows(spark, [(1, 1, "a", 0.0), (1, 2, "b", 0.0), (1, 3, "c", 0.0)])
    out = match_recognize(
        df,
        partition_by=["k"],
        order_by=["seq"],
        pattern=[("A", "1"), ("B", "??"), ("C", "1")],
        define={"A": "tag = 'a'", "B": "tag = 'b'", "C": "tag = 'c'"},
        measures=[("b_n", "B", None, "count")],
    )
    assert _collect(out) == [(1, 1, 1)]
    # and where C could ALSO take the b row, reluctant B?? leaves it:
    out2 = match_recognize(
        df,
        partition_by=["k"],
        order_by=["seq"],
        pattern=[("A", "1"), ("B", "??"), ("C", "1")],
        define={"A": "tag = 'a'", "B": "tag = 'b'", "C": "tag IN ('b','c')"},
        measures=[("b_n", "B", None, "count"), ("c_seq", "C", "seq", "first")],
    )
    assert _collect(out2) == [(1, 1, 0, 2)]


def test_prev_next_navigation_compiles_to_lag_lead(spark):
    # The canonical V-shape: DOWN AS v < PREV(v), UP AS v > PREV(v).
    # Row 1 has no PREV -> NULL -> False (SQL WHERE semantics).
    df = _rows(
        spark,
        [(1, 1, "x", 10.0), (1, 2, "x", 8.0), (1, 3, "x", 5.0),
         (1, 4, "x", 7.0), (1, 5, "x", 9.0), (1, 6, "x", 9.0)],
    )
    out = match_recognize(
        df,
        partition_by=["k"],
        order_by=["seq"],
        pattern=[("D", "+"), ("U", "+")],
        define={"D": "v < PREV(v)", "U": "v > PREV(v)"},
        measures=[
            ("bottom", "D", "v", "min"),
            ("peak", "U", "v", "last"),
            ("n_down", "D", None, "count"),
            ("n_up", "U", None, "count"),
        ],
    )
    assert _collect(out) == [(1, 1, 5.0, 9.0, 2, 2)]
    # qualified spelling PREV(B.v) and an explicit offset work too
    out2 = match_recognize(
        df,
        partition_by=["k"],
        order_by=["seq"],
        pattern=[("B", "{2,2}")],
        define={"B": "v < PREV(B.v, 2) + 100"},
        measures=[("n", "B", None, "count")],
    )
    # rows 3..6 have a PREV(...,2); first match takes rows 3,4
    assert _collect(out2)[0][-1] == 2


def test_prev_streaming_contract(spark, tmp_path):
    """Streaming PREV/NEXT (round 10): supported via the run-state
    grammar — plain comparison predicates construct; a nav predicate
    OUTSIDE that grammar (function calls etc., which batch can run
    JVM-side) still refuses loudly rather than approximating."""
    from tiflink_spark.patterns import match_recognize_stream

    df = spark.readStream.format("rate").load()
    # in-grammar: constructs (execution is covered by the nav tests)
    match_recognize_stream(
        df,
        partition_by=["value"],
        order_by=["timestamp"],
        pattern=[("A", "1")],
        define={"A": "value > PREV(value)"},
        measures=[("n", "A", None, "count")],
    )
    # outside the restricted grammar: refuse, don't guess
    with pytest.raises(NotImplementedError):
        match_recognize_stream(
            df,
            partition_by=["value"],
            order_by=["timestamp"],
            pattern=[("A", "1")],
            define={"A": "abs(value) > PREV(value)"},
            measures=[("n", "A", None, "count")],
        )


def test_skip_to_next_row_overlaps(spark):
    # a a a b with A+ B: skip-past emits one match (rows 1-4); skip to
    # next row emits the match at every start: 3 overlapping matches.
    df = _rows(
        spark,
        [(1, 1, "a", 0.0), (1, 2, "a", 0.0), (1, 3, "a", 0.0), (1, 4, "b", 0.0)],
    )
    kw = dict(
        partition_by=["k"],
        order_by=["seq"],
        pattern=[("A", "+"), ("B", "1")],
        define={"A": "tag = 'a'", "B": "tag = 'b'"},
        measures=[("a_first", "A", "seq", "first"), ("a_n", "A", None, "count")],
    )
    past = match_recognize(df, **kw)
    assert _collect(past) == [(1, 1, 1, 3)]
    nxt = match_recognize(df, after_match="to next row", **kw)
    assert _collect(nxt) == [(1, 1, 1, 3), (1, 2, 2, 2), (1, 3, 3, 1)]


def test_skip_to_last_var_resumes_at_that_row(spark):
    # a b b b with A B (A undefined = every row): skip-past gives the
    # disjoint matches (1,2) and (3,4); skip to LAST B re-examines each
    # match's b row as the next start, so the matches CHAIN through the
    # b-run: (1,2) -> resume AT 2 -> (2,3) -> resume AT 3 -> (3,4).
    df = _rows(
        spark,
        [(1, 1, "a", 0.0), (1, 2, "b", 0.0), (1, 3, "b", 0.0), (1, 4, "b", 0.0)],
    )
    kw = dict(
        partition_by=["k"],
        order_by=["seq"],
        pattern=[("A", "1"), ("B", "1")],
        define={"B": "tag = 'b'"},  # A undefined: every row
        measures=[("a_seq", "A", "seq", "first"), ("b_seq", "B", "seq", "first")],
    )
    past = match_recognize(df, **kw)
    assert _collect(past) == [(1, 1, 1, 2), (1, 2, 3, 4)]
    out = match_recognize(df, after_match="to last B", **kw)
    assert _collect(out) == [(1, 1, 1, 2), (1, 2, 2, 3), (1, 3, 3, 4)]


def test_skip_to_first_var_loop_raises(spark):
    # skip to FIRST A resumes at the match's own start row -> the
    # standard's runtime error, surfaced eagerly.
    df = _rows(spark, [(1, 1, "a", 0.0), (1, 2, "b", 0.0)])
    out = match_recognize(
        df,
        partition_by=["k"],
        order_by=["seq"],
        pattern=[("A", "1"), ("B", "1")],
        define={"A": "tag = 'a'", "B": "tag = 'b'"},
        after_match="to first A",
        measures=[("a_seq", "A", "seq", "first")],
    )
    with pytest.raises(Exception, match="loop forever"):
        out.collect()


# --- FIRST/LAST run-state navigation (round 9) -----------------------------


def _prices(spark, vals):
    return spark.createDataFrame(
        [(1, i, float(v)) for i, v in enumerate(vals)], "k int, seq int, price double"
    )


def test_last_universal_nav_v_shape(spark):
    """LAST(price, 1) is the previous row OF THE MATCH — at the first
    row of a DOWN run it sees the STRT row (unlike a bare PREV at a
    partition edge, which sees across match boundaries). Canonical
    Flink idiom: DOWN AS price < LAST(price, 1)."""
    df = _prices(spark, [10, 8, 6, 7, 9, 12, 5, 4, 6])
    out = match_recognize(
        df, ["k"], ["seq"],
        pattern=[("STRT", "1"), ("DOWN", "+"), ("UP", "+")],
        define={"DOWN": "price < LAST(price, 1)", "UP": "price > LAST(price, 1)"},
        measures=[
            ("bottom", "DOWN", "price", "last"),
            ("top", "UP", "price", "last"),
            ("n_down", "DOWN", None, "count"),
            ("n_up", "UP", None, "count"),
        ],
    )
    assert _collect(out) == [(1, 1, 6.0, 12.0, 2, 3), (1, 2, 4.0, 6.0, 1, 1)]


def test_last_qualified_and_running_inclusion(spark):
    """LAST(DOWN.price) inside UP's DEFINE reads the last row the
    running assignment bound to DOWN; LAST(V.price) inside V's OWN
    define includes the current tentative row (SQL RUNNING semantics),
    so `price <= LAST(V.price)` is a tautology while
    `price < LAST(V.price, 1)` reads the previous V row."""
    df = _prices(spark, [10, 7, 5, 11, 2])
    out = match_recognize(
        df, ["k"], ["seq"],
        pattern=[("STRT", "1"), ("DOWN", "+"), ("UP", "1")],
        define={"DOWN": "price < LAST(price, 1)", "UP": "price > LAST(DOWN.price) + 5"},
        measures=[
            ("bottom", "DOWN", "price", "last"),
            ("up_p", "UP", "price", "first"),
        ],
    )
    # DOWN takes 7,5; UP needs > 10 — 11 qualifies
    assert _collect(out) == [(1, 1, 5.0, 11.0)]
    taut = match_recognize(
        df, ["k"], ["seq"],
        pattern=[("V", "+")],
        define={"V": "price <= LAST(V.price)"},  # current row included
        measures=[("n", "V", None, "count")],
    )
    assert _collect(taut) == [(1, 1, 5)]  # one maximal match, all rows


def test_first_navigation_above_start(spark):
    """U AS price > FIRST(price): strictly-above-the-match-start runs —
    NOT expressible as a fixed-offset lag (the distance to the match
    start varies per row)."""
    df = _prices(spark, [5, 7, 6, 4, 9, 10, 3])
    out = match_recognize(
        df, ["k"], ["seq"],
        pattern=[("S", "1"), ("U", "+")],
        define={"U": "price > FIRST(price)"},
        measures=[("s", "S", "seq", "first"), ("n", "U", None, "count")],
    )
    # start 5 (seq0): 7,6 above 5, 4 stops -> n=2; start 4 (seq3):
    # 9,10 above, 3 stops -> n=2; remaining row 3: no following rows
    assert _collect(out) == [(1, 1, 0, 2), (1, 2, 3, 2)]


def test_runstate_null_reads_as_no_match(spark):
    """NULL in a run-state comparison = no-match (SQL WHERE), both for
    a NULL cell and an out-of-range navigation offset."""
    df = spark.createDataFrame(
        [(1, 0, 5.0), (1, 1, None), (1, 2, 7.0)], "k int, seq int, price double"
    )
    out = match_recognize(
        df, ["k"], ["seq"],
        pattern=[("S", "1"), ("U", "+")],
        define={"U": "price > FIRST(price)"},
        measures=[("s", "S", "seq", "first"), ("n", "U", None, "count")],
    )
    # start at 5.0: next row NULL -> U fails; start at NULL: 7 > NULL
    # -> false; no matches from seq1. Only... no match at all (U+ needs
    # one row).
    assert _collect(out) == []
    out2 = match_recognize(
        df, ["k"], ["seq"],
        pattern=[("A", "+")],
        define={"A": "price > LAST(price, 5)"},  # offset beyond the match
        measures=[("n", "A", None, "count")],
    )
    assert _collect(out2) == []


def test_runstate_refusals(spark):
    df = _prices(spark, [1, 2, 3])
    import pytest as _pt

    # run-state var inside an alternation step: attribution would be
    # circular (the JVM flag for a run-state var is always-true)
    with _pt.raises(ValueError, match="alternation"):
        match_recognize(
            df, ["k"], ["seq"],
            pattern=[("A|B", "+")],
            define={"B": "price > FIRST(price)"},
            measures=[("n", "A", None, "count")],
        )
    # outside the documented comparison grammar: refuse, don't guess
    with _pt.raises(NotImplementedError):
        match_recognize(
            df, ["k"], ["seq"],
            pattern=[("A", "+")],
            define={"A": "substr(cast(price as string), 1, 1) = LAST(price)"},
            measures=[("n", "A", None, "count")],
        )


@pytest.mark.slow
def test_runstate_streaming_equals_batch(spark, tmp_path):
    """FIRST/LAST works in the STREAMING entry point (unlike PREV/NEXT
    it never looks outside the match's own buffered rows): drained
    stream == batch on a multi-V-shape series split across triggers."""
    import os

    from tiflink_spark.patterns import match_recognize_stream

    vals = [10, 8, 6, 7, 9, 12, 5, 4, 6, 11, 3, 2, 8]
    rows = [(1, i, float(v)) for i, v in enumerate(vals)]
    src = tmp_path / "src"
    os.makedirs(src)
    # three files -> three micro-batches (maxFilesPerTrigger=1); ONE
    # part-file per chunk, or triggers deliver rows out of order and
    # violate the stream's order contract
    for fi, chunk in enumerate([rows[:4], rows[4:9], rows[9:]]):
        spark.createDataFrame(chunk, "k int, seq int, price double").coalesce(
            1
        ).write.parquet(str(src / f"f{fi}"))
    kwargs = dict(
        partition_by=["k"],
        order_by=["seq"],
        pattern=[("STRT", "1"), ("DOWN", "+"), ("UP", "+")],
        define={"DOWN": "price < LAST(price, 1)", "UP": "price > LAST(price, 1)"},
        measures=[
            ("bottom", "DOWN", "price", "last"),
            ("top", "UP", "price", "last"),
        ],
    )
    batch = _collect(
        match_recognize(spark.createDataFrame(rows, "k int, seq int, price double"), **kwargs)
    )
    stream = (
        spark.readStream.schema("k int, seq int, price double")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/*")
    )
    out = match_recognize_stream(stream, **kwargs)
    q = (
        out.writeStream.format("memory")
        .queryName("rs_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = [tuple(r) for r in spark.sql(
        "SELECT * FROM rs_stream ORDER BY k, match_seq"
    ).collect()]
    # the stream can't see end-of-data, so its last pending candidate
    # never finalizes — batch minus a possible tail match
    assert got == batch[: len(got)] and len(batch) - len(got) <= 1


def test_runstate_scan_batch_equals_drained_stream_fuzz():
    """The decided/held split must stay exact under run-state DEFINEs:
    random price series, random chunkings, FIRST/LAST predicates —
    drained stream == batch, every time."""
    import random

    import numpy as np
    import pandas as pd

    from tiflink_spark.patterns import (
        _bind_runstate,
        _prepare_runstate,
        _runtime_steps,
        _scan,
        _validate,
    )

    def run_scan(vals, steps, rs_compiled, rs_cols, streaming):
        pdf = pd.DataFrame({"price": vals})
        flags = {v: np.ones(len(vals), dtype=bool) for v in "SU"}
        rs = _bind_runstate(rs_compiled, rs_cols, pdf, flags)
        rt = _runtime_steps(steps, flags, rs)
        return _scan(rt, len(vals), streaming=streaming, skip=("past", None), flags=flags)

    rng = random.Random(11)
    defines = [
        {"U": "price > FIRST(price)"},
        {"U": "price < LAST(price, 1)"},
        {"U": "price > LAST(S.price)"},
    ]
    pattern = [("S", "1"), ("U", "+")]
    for _ in range(300):
        define = rng.choice(defines)
        _, steps = _validate(pattern, define, [])
        rs_compiled, rs_cols = _prepare_runstate(define, steps)
        n = rng.randint(1, 12)
        vals = [float(rng.randint(0, 6)) for _ in range(n)]
        batch, _ = run_scan(vals, steps, rs_compiled, rs_cols, streaming=False)
        # drained stream over a random chunking
        emitted, b0 = [], 0
        sizes, left = [], n
        while left:
            c = rng.randint(1, left)
            sizes.append(c)
            left -= c
        pos = 0
        for size in sizes:
            pos += size
            ms, pending = run_scan(vals[b0:pos], steps, rs_compiled, rs_cols, True)
            emitted += [[(nm, s + b0, e + b0) for nm, s, e in m] for m in ms]
            b0 += pending
        ms, _ = run_scan(vals[b0:pos], steps, rs_compiled, rs_cols, False)
        emitted += [[(nm, s + b0, e + b0) for nm, s, e in m] for m in ms]
        assert emitted == batch, (define, vals, sizes)


def test_runstate_string_literal_with_keywords(spark):
    """ADVICE r9 (low): quoted literals are opaque to the run-state
    compiler's keyword/operator rewrites — a tag like 'BUY AND HOLD'
    (embedded AND) or 'SELL=NOW' (embedded =) must compare verbatim."""
    df = spark.createDataFrame(
        [
            (1, 0, 5.0, "BUY AND HOLD"),
            (1, 1, 7.0, "BUY AND HOLD"),
            (1, 2, 9.0, "SELL=NOW"),
        ],
        "k int, seq int, price double, tag string",
    )
    out = match_recognize(
        df, ["k"], ["seq"],
        pattern=[("S", "1"), ("U", "+")],
        define={"U": "price > FIRST(price) AND tag = 'BUY AND HOLD'"},
        measures=[("n", "U", None, "count")],
    )
    # U admits seq1 only (seq2's tag differs); without literal masking
    # the predicate is corrupted to tag == 'BUY and HOLD' -> no match
    assert _collect(out) == [(1, 1, 1)]

    out2 = match_recognize(
        df, ["k"], ["seq"],
        pattern=[("A", "+")],
        define={"A": "tag = 'SELL=NOW' AND price >= FIRST(price)"},
        measures=[("n", "A", None, "count")],
    )
    assert _collect(out2) == [(1, 1, 1)]


@pytest.mark.slow
def test_nav_streaming_equals_batch(spark, tmp_path):
    """VERDICT r9 #6: PREV/NEXT navigation in the STREAMING entry —
    nav-bearing DEFINEs compile through the run-state grammar and the
    nav columns are computed over the cross-batch pending buffer
    (k_prev context tail + k_next hold-back). Drained stream == batch
    on a multi-V-shape series split across triggers at boundaries that
    force PREV to navigate into a previous trigger's rows."""
    import os

    from tiflink_spark.patterns import match_recognize_stream

    vals = [10, 8, 6, 7, 9, 12, 5, 4, 6, 11, 3, 2, 8, 9, 1]
    rows = [(1, i, float(v)) for i, v in enumerate(vals)]
    src = tmp_path / "src"
    os.makedirs(src)
    for fi, chunk in enumerate([rows[:3], rows[3:5], rows[5:9], rows[9:]]):
        spark.createDataFrame(chunk, "k int, seq int, price double").coalesce(
            1
        ).write.parquet(str(src / f"f{fi}"))
    kwargs = dict(
        partition_by=["k"],
        order_by=["seq"],
        pattern=[("STRT", "1"), ("DOWN", "+"), ("UP", "+")],
        define={"DOWN": "price < PREV(price)", "UP": "price > PREV(price)"},
        measures=[
            ("bottom", "DOWN", "price", "last"),
            ("top", "UP", "price", "last"),
        ],
    )
    batch = _collect(
        match_recognize(
            spark.createDataFrame(rows, "k int, seq int, price double"), **kwargs
        )
    )
    stream = (
        spark.readStream.schema("k int, seq int, price double")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/*")
    )
    out = match_recognize_stream(stream, **kwargs)
    q = (
        out.writeStream.format("memory")
        .queryName("nav_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = [tuple(r) for r in spark.sql(
        "SELECT * FROM nav_stream ORDER BY k, match_seq"
    ).collect()]
    # the stream can't see end-of-data -> a possible held tail match
    assert len(batch) >= 2  # the case must exercise multiple matches
    assert got == batch[: len(got)] and len(batch) - len(got) <= 1


@pytest.mark.slow
def test_nav_streaming_next_and_mixed(spark, tmp_path):
    """NEXT in streaming: the hold-back must keep every decision exact
    even when the deciding row arrives a trigger later; mixed
    PREV + FIRST run-state in one DEFINE compiles and agrees with
    batch."""
    import os

    from tiflink_spark.patterns import match_recognize_stream

    vals = [1, 5, 2, 6, 3, 7, 1, 8, 2, 0, 9]
    rows = [(1, i, float(v)) for i, v in enumerate(vals)]
    src = tmp_path / "src"
    os.makedirs(src)
    for fi, chunk in enumerate([rows[:2], rows[2:3], rows[3:7], rows[7:]]):
        spark.createDataFrame(chunk, "k int, seq int, price double").coalesce(
            1
        ).write.parquet(str(src / f"f{fi}"))
    # A = a row followed by a strictly higher row (NEXT), B = the peak
    kwargs = dict(
        partition_by=["k"],
        order_by=["seq"],
        pattern=[("A", "+"), ("B", "1")],
        define={"A": "price < NEXT(price)", "B": "price > FIRST(A.price)"},
        measures=[("n", "A", None, "count"), ("peak", "B", "price", "last")],
    )
    batch = _collect(
        match_recognize(
            spark.createDataFrame(rows, "k int, seq int, price double"), **kwargs
        )
    )
    stream = (
        spark.readStream.schema("k int, seq int, price double")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/*")
    )
    out = match_recognize_stream(stream, **kwargs)
    q = (
        out.writeStream.format("memory")
        .queryName("nav_next_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = [tuple(r) for r in spark.sql(
        "SELECT * FROM nav_next_stream ORDER BY k, match_seq"
    ).collect()]
    assert len(batch) >= 2
    # NEXT hold-back: up to one tail match may stay pending
    assert got == batch[: len(got)] and len(batch) - len(got) <= 1


def test_nav_scan_batch_equals_drained_stream_fuzz():
    """The ctx-tail + NEXT-hold-back arithmetic must keep the
    decided/held split exact under PREV/NEXT DEFINEs: random series,
    random chunkings — drained stream == batch, every time. Mirrors
    match_recognize_stream's update() slicing over the same engine
    primitives (_rewrite_nav → _prepare_runstate(force) → shift →
    _scan(start, n_eff))."""
    import random

    import numpy as np
    import pandas as pd

    from tiflink_spark.patterns import (
        _bind_runstate,
        _prepare_runstate,
        _rewrite_nav,
        _runtime_steps,
        _scan,
        _validate,
    )

    pattern = [("S", "1"), ("U", "+")]
    cases = [
        ({"U": "price > PREV(price)"}, 1, 0),
        ({"U": "price < PREV(price, 2)"}, 2, 0),
        ({"U": "price < NEXT(price)"}, 0, 1),
        ({"U": "price > PREV(price) AND price < NEXT(price)"}, 1, 1),
        ({"U": "price >= FIRST(price) AND price != PREV(price)"}, 1, 0),
    ]

    def prep(define):
        _, steps = _validate(pattern, define, [])
        define_rw, nav_cols = _rewrite_nav(define)
        nav_vars = {
            v
            for v, p in define_rw.items()
            if p is not None and any(nm in p for nm in nav_cols)
        }
        rs_compiled, rs_cols = _prepare_runstate(
            define_rw, steps, force=frozenset(nav_vars)
        )
        return steps, nav_cols, rs_compiled, rs_cols

    def run_scan(vals, prep_out, streaming, start=0, n_eff=None):
        steps, nav_cols, rs_compiled, rs_cols = prep_out
        pdf = pd.DataFrame({"price": [float(v) for v in vals]})
        for name, (fn, col, k) in nav_cols.items():
            pdf[name] = pdf[col].shift(k if fn == "prev" else -k)
        flags = {v: np.ones(len(vals), dtype=bool) for v in "SU"}
        rs = _bind_runstate(rs_compiled, rs_cols, pdf, flags)
        rt = _runtime_steps(steps, flags, rs)
        n = len(vals) if n_eff is None else n_eff
        return _scan(
            rt, n, streaming=streaming, skip=("past", None), flags=flags,
            start=start,
        )

    rng = random.Random(23)
    for trial in range(300):
        define, k_prev, k_next = rng.choice(cases)
        prep_out = prep(define)
        n = rng.randint(1, 14)
        vals = [rng.randint(0, 6) for _ in range(n)]
        batch, _ = run_scan(vals, prep_out, streaming=False)

        # drained stream: buffer = ctx tail + pending + new rows
        emitted = []
        buf_start, ctx = 0, 0  # buf_start: absolute index of buffer head
        sizes, left = [], n
        while left:
            c = rng.randint(1, left)
            sizes.append(c)
            left -= c
        pos = 0
        for size in sizes:
            pos += size
            buf = vals[buf_start:pos]
            bn = len(buf)
            n_eff = max(ctx, bn - k_next)
            ms, pending = run_scan(
                buf, prep_out, streaming=True, start=ctx, n_eff=n_eff
            )
            emitted += [
                [(nm, s + buf_start, e + buf_start) for nm, s, e in m]
                for m in ms
            ]
            cut = max(0, pending - k_prev)
            ctx = pending - cut
            buf_start += cut
        # final drain: batch-mode pass over the remaining buffer (end
        # of data IS final there — NEXT beyond the end reads NULL)
        buf = vals[buf_start:]
        ms, _ = run_scan(buf, prep_out, streaming=False, start=ctx)
        emitted += [
            [(nm, s + buf_start, e + buf_start) for nm, s, e in m] for m in ms
        ]
        assert emitted == batch, (trial, define, vals, sizes)


def test_nav_scan_stream_fuzz_within_and_skip():
    """The nav ctx/hold-back arithmetic composed with WITHIN windows
    and AFTER MATCH SKIP TO NEXT ROW: random series, random chunkings,
    random window widths — drained stream == batch. (The WITHIN edge
    is clamped to the hold-back bound inside _scan; this sweeps that
    interaction.)"""
    import random

    import numpy as np
    import pandas as pd

    from tiflink_spark.patterns import (
        _bind_runstate,
        _prepare_runstate,
        _rewrite_nav,
        _runtime_steps,
        _scan,
        _validate,
    )

    pattern = [("S", "1"), ("U", "+")]
    cases = [
        ({"U": "price > PREV(price)"}, 1, 0),
        ({"U": "price < NEXT(price)"}, 0, 1),
        ({"U": "price >= PREV(price) AND price <= NEXT(price)"}, 1, 1),
    ]

    def prep(define):
        _, steps = _validate(pattern, define, [])
        define_rw, nav_cols = _rewrite_nav(define)
        nav_vars = {
            v
            for v, p in define_rw.items()
            if p is not None and any(nm in p for nm in nav_cols)
        }
        rs_compiled, rs_cols = _prepare_runstate(
            define_rw, steps, force=frozenset(nav_vars)
        )
        return steps, nav_cols, rs_compiled, rs_cols

    def run_scan(vals, base, prep_out, streaming, skip, within,
                 start=0, n_eff=None):
        steps, nav_cols, rs_compiled, rs_cols = prep_out
        pdf = pd.DataFrame({"price": [float(v) for v in vals]})
        for name, (fn, col, k) in nav_cols.items():
            pdf[name] = pdf[col].shift(k if fn == "prev" else -k)
        flags = {v: np.ones(len(vals), dtype=bool) for v in "SU"}
        rs = _bind_runstate(rs_compiled, rs_cols, pdf, flags)
        rt = _runtime_steps(steps, flags, rs)
        n = len(vals) if n_eff is None else n_eff
        ovals = np.arange(base, base + len(vals)) if within is not None else None
        return _scan(
            rt, n, streaming=streaming, ovals=ovals, within=within,
            skip=skip, flags=flags, start=start,
        )

    rng = random.Random(31)
    for trial in range(300):
        define, k_prev, k_next = rng.choice(cases)
        prep_out = prep(define)
        skip = rng.choice([("past", None), ("next", None)])
        within = rng.choice([None, rng.randint(2, 6)])
        n = rng.randint(1, 14)
        vals = [rng.randint(0, 6) for _ in range(n)]
        batch, _ = run_scan(vals, 0, prep_out, False, skip, within)

        emitted = []
        buf_start, ctx = 0, 0
        sizes, left = [], n
        while left:
            c = rng.randint(1, left)
            sizes.append(c)
            left -= c
        pos = 0
        for size in sizes:
            pos += size
            buf = vals[buf_start:pos]
            bn = len(buf)
            n_eff = max(ctx, bn - k_next)
            ms, pending = run_scan(
                buf, buf_start, prep_out, True, skip, within,
                start=ctx, n_eff=n_eff,
            )
            emitted += [
                [(nm, s + buf_start, e + buf_start) for nm, s, e in m]
                for m in ms
            ]
            cut = max(0, pending - k_prev)
            ctx = pending - cut
            buf_start += cut
        buf = vals[buf_start:]
        ms, _ = run_scan(buf, buf_start, prep_out, False, skip, within, start=ctx)
        emitted += [
            [(nm, s + buf_start, e + buf_start) for nm, s, e in m] for m in ms
        ]
        assert emitted == batch, (trial, define, skip, within, vals, sizes)


def test_batch_matcher_group_spans_arrow_batches(spark):
    """run_part streams the partition's Arrow batches group by group,
    carrying an unfinished group across batch boundaries (the whole-
    partition pd.concat it replaced held ~table/cores bytes in one
    Python worker). With maxRecordsPerBatch=7, a 40-row group spans
    6 Arrow batches and several groups share batches — the output must
    be identical to the default batching."""
    rows = []
    # group 1: one long a b+ run spanning many 7-row Arrow batches
    rows.append((1, 0, "a", 1.0))
    rows += [(1, i, "b", 1.0) for i in range(1, 40)]
    # groups 2..6: small groups, several per Arrow batch, with a
    # failing group (no leading 'a') interleaved
    for k in range(2, 7):
        tag0 = "a" if k != 4 else "b"
        rows += [(k, 0, tag0, 1.0), (k, 1, "b", 1.0), (k, 2, "b", 1.0)]

    def run(df):
        return match_recognize(
            df,
            partition_by=["k"],
            order_by=["seq"],
            pattern=[("A", "1"), ("B", "+")],
            define={"A": "tag = 'a'", "B": "tag = 'b'"},
            measures=[
                ("n_b", "B", None, "count"),
                ("first_b", "B", "seq", "first"),
                ("last_b", "B", "seq", "last"),
            ],
        )

    df = _rows(spark, rows)
    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark.conf.get(key)
    try:
        spark.conf.set(key, "7")
        tiny = _collect(run(df))
    finally:
        spark.conf.set(key, old)
    assert tiny == _collect(run(df))
    # group 1's single match swallowed all 39 b-rows despite the carry
    assert (1, 1, 39, 1, 39) in tiny
    # the failing group emitted nothing
    assert not any(r[0] == 4 for r in tiny)
