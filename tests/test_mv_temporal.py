"""Temporal (versioned dim) join MV — FOR SYSTEM_TIME AS OF f.ts.

The engine's analog of Flink SQL's event-time temporal join (in the
reference's surface by delegation, TiFlinkApp.java:270): facts join the
dim VERSION valid as of the fact's own event time, so a late fact row
lands on an old dim version even after the dim has moved on.
"""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from tiflink_spark.app import MVApp
from tiflink_spark.changelog import OP_COL, OP_DELETE, OP_UPDATE, SEQ_COL


def _t(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


_PROF_SCHEMA = "uid int, tier string, updated_at timestamp"
_EV_SCHEMA = "eid int, uid int, ts timestamp, v double"


def _ch(spark, rows, schema, op=OP_UPDATE):
    return (
        spark.createDataFrame(rows, schema)
        .withColumn(OP_COL, F.lit(op))
        .withColumn(SEQ_COL, F.monotonically_increasing_id())
    )


def _build(spark, tmp_path, ev, prof):
    return (
        MVApp.builder(spark)
        .source("ev_t", ev, pk=["eid"])
        .source("prof_t", prof, pk=["uid"], event_time="updated_at")
        .query(
            """SELECT e.eid, e.uid, e.ts, d.tier
               FROM ev_t e JOIN prof_t FOR SYSTEM_TIME AS OF e.ts AS d
                 ON e.uid = d.uid"""
        )
        .target(str(tmp_path / "mv"))
        .num_buckets(4)
        .shuffle_partitions(4)
        .build()
    )


def test_temporal_join_versioned_lookups_converge(spark, tmp_path):
    prof = spark.createDataFrame(
        [(1, "bronze", _t("2024-01-01")), (2, "silver", _t("2024-01-01"))],
        _PROF_SCHEMA,
    )
    ev = spark.createDataFrame(
        [(10, 1, _t("2024-02-01"), 1.0), (11, 2, _t("2024-02-01"), 2.0)],
        _EV_SCHEMA,
    )
    app = _build(spark, tmp_path, ev, prof)
    assert app.maintenance_strategy == "IncrementalTemporalJoinMV"
    app.bootstrap()
    assert {(r.eid, r.tier) for r in app.read().collect()} == {
        (10, "bronze"),
        (11, "silver"),
    }

    # dim version change: uid 1 becomes gold FROM 2024-03-01 — the
    # existing 2024-02-01 event must KEEP bronze (versioned lookup)
    app.refresh(
        {"prof_t": _ch(spark, [(1, "gold", _t("2024-03-01"))], _PROF_SCHEMA)},
        batch_id=1,
    )
    assert {(r.eid, r.tier) for r in app.read().collect()} == {
        (10, "bronze"),
        (11, "silver"),
    }

    # the same fact key space re-arrives across dim versions: a LATE
    # event at 2024-02-15 joins bronze, a post-change event joins gold
    app.refresh(
        {
            "ev_t": _ch(
                spark,
                [(20, 1, _t("2024-02-15"), 3.0), (21, 1, _t("2024-03-15"), 4.0)],
                _EV_SCHEMA,
            )
        },
        batch_id=2,
    )
    assert {(r.eid, r.tier) for r in app.read().collect()} == {
        (10, "bronze"),
        (11, "silver"),
        (20, "bronze"),
        (21, "gold"),
    }

    # dim DELETE closes uid 2's interval at 2024-04-01: events before it
    # keep silver, an event after it finds no version (inner join)
    app.refresh(
        {
            "prof_t": _ch(
                spark, [(2, "silver", _t("2024-04-01"))], _PROF_SCHEMA, op=OP_DELETE
            )
        },
        batch_id=3,
    )
    app.refresh(
        {
            "ev_t": _ch(
                spark,
                [(30, 2, _t("2024-03-20"), 5.0), (31, 2, _t("2024-05-01"), 6.0)],
                _EV_SCHEMA,
            )
        },
        batch_id=4,
    )
    assert {(r.eid, r.tier) for r in app.read().collect()} == {
        (10, "bronze"),
        (11, "silver"),
        (20, "bronze"),
        (21, "gold"),
        (30, "silver"),
    }

    # an event BEFORE the dim's bootstrap valid_from matches nothing
    app.refresh(
        {"ev_t": _ch(spark, [(40, 1, _t("2023-12-01"), 7.0)], _EV_SCHEMA)},
        batch_id=5,
    )
    out = {(r.eid, r.tier) for r in app.read().collect()}
    assert (40, "bronze") not in out and all(e != 40 for e, _ in out)

    # fact churn against a MID-HISTORY version: update event 21 to a
    # pre-change time — its lookup must move gold -> bronze
    app.refresh(
        {"ev_t": _ch(spark, [(21, 1, _t("2024-02-20"), 4.5)], _EV_SCHEMA)},
        batch_id=6,
    )
    assert {(r.eid, r.tier) for r in app.read().collect()} == {
        (10, "bronze"),
        (11, "silver"),
        (20, "bronze"),
        (21, "bronze"),
        (30, "silver"),
    }

    # convergence: the MV equals the batch as-of join over final states
    hist = app._mv.hist_store.read()
    fact = app._mv.fact_store.read()
    expect = (
        fact.join(
            hist,
            (fact["uid"] == hist["uid"])
            & (fact["ts"] >= hist["__valid_from"])
            & (hist["__valid_to"].isNull() | (fact["ts"] < hist["__valid_to"])),
            "inner",
        )
        .select(fact["eid"], fact["uid"], fact["ts"], hist["tier"])
    )
    got = {tuple(r) for r in app.read().collect()}
    assert {tuple(r) for r in expect.collect()} == got


def test_temporal_join_multi_change_batch_builds_version_chain(spark, tmp_path):
    """Several versions of one key in ONE batch: each opens an interval
    closed by the key's next change; a trailing delete closes the last."""
    prof = spark.createDataFrame([(1, "v0", _t("2024-01-01"))], _PROF_SCHEMA)
    ev = spark.createDataFrame([(1, 1, _t("2024-01-10"), 0.0)], _EV_SCHEMA)
    app = _build(spark, tmp_path, ev, prof)
    app.bootstrap()
    batch = (
        spark.createDataFrame(
            [(1, "v1", _t("2024-02-01")), (1, "v2", _t("2024-03-01"))], _PROF_SCHEMA
        )
        .withColumn(OP_COL, F.lit(OP_UPDATE))
        .unionByName(
            spark.createDataFrame(
                [(1, "v2", _t("2024-04-01"))], _PROF_SCHEMA
            ).withColumn(OP_COL, F.lit(OP_DELETE))
        )
        .withColumn(SEQ_COL, F.monotonically_increasing_id())
    )
    app.refresh({"prof_t": batch}, batch_id=1)
    probes = [
        (100, _t("2024-01-15"), "v0"),
        (101, _t("2024-02-15"), "v1"),
        (102, _t("2024-03-15"), "v2"),
        (103, _t("2024-04-15"), None),  # after the delete: no version
    ]
    app.refresh(
        {
            "ev_t": _ch(
                spark, [(e, 1, ts, 0.0) for e, ts, _ in probes], _EV_SCHEMA
            )
        },
        batch_id=2,
    )
    got = {r.eid: r.tier for r in app.read().filter(F.col("eid") >= 100).collect()}
    assert got == {e: tier for e, _, tier in probes if tier is not None}


def test_temporal_join_rejects_out_of_order_dim_change(spark, tmp_path):
    prof = spark.createDataFrame([(1, "v0", _t("2024-06-01"))], _PROF_SCHEMA)
    ev = spark.createDataFrame([(1, 1, _t("2024-07-01"), 0.0)], _EV_SCHEMA)
    app = _build(spark, tmp_path, ev, prof)
    app.bootstrap()
    stale = _ch(spark, [(1, "old", _t("2024-01-01"))], _PROF_SCHEMA)
    with pytest.raises(Exception, match="event-time ordered"):
        app.refresh({"prof_t": stale}, batch_id=1)


def test_temporal_join_requires_event_time_declaration(spark, tmp_path):
    prof = spark.createDataFrame([(1, "v0", _t("2024-01-01"))], _PROF_SCHEMA)
    ev = spark.createDataFrame([(1, 1, _t("2024-02-01"), 0.0)], _EV_SCHEMA)
    with pytest.raises(ValueError, match="event_time"):
        (
            MVApp.builder(spark)
            .source("ev_t", ev, pk=["eid"])
            .source("prof_t", prof, pk=["uid"])  # no event_time
            .query(
                """SELECT e.eid, d.tier
                   FROM ev_t e JOIN prof_t FOR SYSTEM_TIME AS OF e.ts AS d
                     ON e.uid = d.uid"""
            )
            .target(str(tmp_path / "mv2"))
            .build()
        )


def test_temporal_join_composite_dim_pk_converges(spark, tmp_path):
    """Composite dim PK (round 9): the ON conjunction covers both PK
    columns (in crossed order, qualifying the matcher's any-order
    alignment); versioned lookups behave exactly like the single-column
    route."""
    prof = spark.createDataFrame(
        [
            (1, "eu", "bronze", _t("2024-01-01")),
            (1, "us", "silver", _t("2024-01-01")),
        ],
        "uid int, region string, tier string, updated_at timestamp",
    )
    ev = spark.createDataFrame(
        [
            (10, 1, "eu", _t("2024-02-01"), 1.0),
            (11, 1, "us", _t("2024-02-01"), 2.0),
        ],
        "eid int, uid int, reg string, ts timestamp, v double",
    )
    app = (
        MVApp.builder(spark)
        .source("ev_c", ev, pk=["eid"])
        .source("prof_c", prof, pk=["uid", "region"], event_time="updated_at")
        .query(
            """SELECT e.eid, e.uid, e.reg, e.ts, d.tier
               FROM ev_c e JOIN prof_c FOR SYSTEM_TIME AS OF e.ts AS d
                 ON d.region = e.reg AND e.uid = d.uid"""
        )
        .target(str(tmp_path / "mvc"))
        .num_buckets(2)
        .shuffle_partitions(2)
        .build()
    )
    assert app.maintenance_strategy == "IncrementalTemporalJoinMV"
    app.bootstrap()
    assert {(r.eid, r.tier) for r in app.read().collect()} == {
        (10, "bronze"),
        (11, "silver"),
    }
    # version change on ONE composite key: (1, eu) -> gold from 03-01;
    # (1, us) untouched
    app.refresh(
        {
            "prof_c": _ch(
                spark,
                [(1, "eu", "gold", _t("2024-03-01"))],
                "uid int, region string, tier string, updated_at timestamp",
            )
        },
        batch_id=1,
    )
    app.refresh(
        {
            "ev_c": _ch(
                spark,
                [
                    (20, 1, "eu", _t("2024-02-15"), 3.0),  # late: bronze
                    (21, 1, "eu", _t("2024-03-15"), 4.0),  # post: gold
                    (22, 1, "us", _t("2024-03-15"), 5.0),  # other key: silver
                ],
                "eid int, uid int, reg string, ts timestamp, v double",
            )
        },
        batch_id=2,
    )
    assert {(r.eid, r.tier) for r in app.read().collect()} == {
        (10, "bronze"),
        (11, "silver"),
        (20, "bronze"),
        (21, "gold"),
        (22, "silver"),
    }
    # convergence against the batch as-of join over final states
    hist = app._mv.hist_store.read()
    fact = app._mv.fact_store.read()
    expect = fact.join(
        hist,
        (fact["uid"] == hist["uid"])
        & (fact["reg"] == hist["region"])
        & (fact["ts"] >= hist["__valid_from"])
        & (hist["__valid_to"].isNull() | (fact["ts"] < hist["__valid_to"])),
        "inner",
    ).select(fact["eid"], fact["uid"], fact["reg"], fact["ts"], hist["tier"])
    assert {tuple(r) for r in expect.collect()} == {
        tuple(r) for r in app.read().collect()
    }


@pytest.mark.slow
def test_temporal_join_selecting_dim_pk_and_time_col(spark, tmp_path):
    """Selecting the dim's PK or its event-time column through the
    temporal join: the PK rides the history alias, the time column is
    the matched version's __valid_from."""
    prof = spark.createDataFrame(
        [(1, "bronze", _t("2024-01-01"))], _PROF_SCHEMA
    )
    ev = spark.createDataFrame([(10, 1, _t("2024-02-01"), 1.0)], _EV_SCHEMA)
    app = (
        MVApp.builder(spark)
        .source("ev_s", ev, pk=["eid"])
        .source("prof_s", prof, pk=["uid"], event_time="updated_at")
        .query(
            """SELECT e.eid, e.ts, d.tier, d.updated_at
               FROM ev_s e JOIN prof_s FOR SYSTEM_TIME AS OF e.ts AS d
                 ON e.uid = d.uid"""
        )
        .target(str(tmp_path / "mvs"))
        .num_buckets(2)
        .shuffle_partitions(2)
        .build()
    )
    app.bootstrap()
    rows = app.read().collect()
    assert [(r.eid, r.tier, r.updated_at) for r in rows] == [
        (10, "bronze", _t("2024-01-01"))
    ]
    # after a version change, a post-change fact reports the NEW
    # version's effective time
    app.refresh(
        {"prof_s": _ch(spark, [(1, "gold", _t("2024-03-01"))], _PROF_SCHEMA)},
        batch_id=1,
    )
    app.refresh(
        {"ev_s": _ch(spark, [(11, 1, _t("2024-04-01"), 2.0)], _EV_SCHEMA)},
        batch_id=2,
    )
    got = {(r.eid, r.tier, r.updated_at) for r in app.read().collect()}
    assert got == {
        (10, "bronze", _t("2024-01-01")),
        (11, "gold", _t("2024-03-01")),
    }


def test_temporal_join_proctime_routes_to_enrichment(spark, tmp_path):
    """FOR SYSTEM_TIME AS OF PROCTIME() (Flink's processing-time
    temporal join) = join the dim's CURRENT state: for a maintained MV
    that is the lookup-enrichment route — no versioned history, dim
    churn re-derives the matching fact rows."""
    prof = spark.createDataFrame(
        [(1, "bronze", _t("2024-01-01")), (2, "silver", _t("2024-01-01"))],
        _PROF_SCHEMA,
    )
    ev = spark.createDataFrame(
        [(10, 1, _t("2024-02-01"), 1.0), (11, 2, _t("2024-02-01"), 2.0)],
        _EV_SCHEMA,
    )
    app = (
        MVApp.builder(spark)
        .source("ev_p", ev, pk=["eid"])
        .source("prof_p", prof, pk=["uid"])
        .query(
            """SELECT e.eid, e.v, d.tier
               FROM ev_p e JOIN prof_p FOR SYSTEM_TIME AS OF PROCTIME() AS d
                 ON e.uid = d.uid"""
        )
        .target(str(tmp_path / "mvp"))
        .num_buckets(2)
        .shuffle_partitions(2)
        .build()
    )
    # enrichment, not the versioned-history route
    assert app.maintenance_strategy != "IncrementalTemporalJoinMV"
    assert app.maintenance_mode == "incremental"
    app.bootstrap()
    assert {(r.eid, r.tier) for r in app.read().collect()} == {
        (10, "bronze"),
        (11, "silver"),
    }
    # processing-time semantics: a dim change updates EXISTING fact
    # rows (no versioning — current state wins)
    app.refresh(
        {"prof_p": _ch(spark, [(1, "gold", _t("2024-03-01"))], _PROF_SCHEMA)},
        batch_id=1,
    )
    assert {(r.eid, r.tier) for r in app.read().collect()} == {
        (10, "gold"),
        (11, "silver"),
    }


def _build_reorder(spark, tmp_path, ev, prof):
    return (
        MVApp.builder(spark)
        .source("ev_t", ev, pk=["eid"])
        .source("prof_t", prof, pk=["uid"], event_time="updated_at")
        .query(
            """SELECT e.eid, e.uid, e.ts, d.tier
               FROM ev_t e JOIN prof_t FOR SYSTEM_TIME AS OF e.ts AS d
                 ON e.uid = d.uid"""
        )
        .target(str(tmp_path / "mv"))
        .num_buckets(4)
        .shuffle_partitions(4)
        .late_dim("reorder")
        .build()
    )


def test_temporal_late_dim_reorder_splices_versions(spark, tmp_path):
    """VERDICT r9 #8: late_dim='reorder' — an out-of-order dim version
    arriving in a LATER batch is spliced retroactively: the containing
    validity interval splits, and existing events move onto the
    corrected version."""
    prof = spark.createDataFrame(
        [(1, "bronze", _t("2024-01-01")), (2, "silver", _t("2024-01-01"))],
        _PROF_SCHEMA,
    )
    ev = spark.createDataFrame(
        [
            (10, 1, _t("2024-02-01"), 1.0),
            (11, 1, _t("2024-04-01"), 2.0),
            (12, 2, _t("2024-03-01"), 3.0),
        ],
        _EV_SCHEMA,
    )
    app = _build_reorder(spark, tmp_path, ev, prof)
    assert app.maintenance_strategy == "IncrementalTemporalJoinMV"
    app.bootstrap()
    # in-order change first: uid 1 -> gold FROM 2024-05-01
    app.refresh(
        {"prof_t": _ch(spark, [(1, "gold", _t("2024-05-01"))], _PROF_SCHEMA)},
        batch_id=1,
    )
    assert {(r.eid, r.tier) for r in app.read().collect()} == {
        (10, "bronze"),
        (11, "bronze"),
        (12, "silver"),
    }
    # LATE change: uid 1 was actually 'iron' from 2024-03-01 — the
    # bronze interval [2024-01-01, 2024-05-01) splits; event 11
    # (2024-04-01) retroactively moves to iron, event 10 stays bronze
    app.refresh(
        {"prof_t": _ch(spark, [(1, "iron", _t("2024-03-01"))], _PROF_SCHEMA)},
        batch_id=2,
    )
    assert {(r.eid, r.tier) for r in app.read().collect()} == {
        (10, "bronze"),
        (11, "iron"),
        (12, "silver"),
    }
    # replay is exact
    app.refresh(
        {"prof_t": _ch(spark, [(1, "iron", _t("2024-03-01"))], _PROF_SCHEMA)},
        batch_id=2,
    )
    assert {(r.eid, r.tier) for r in app.read().collect()} == {
        (10, "bronze"),
        (11, "iron"),
        (12, "silver"),
    }
    # a late DELETE: uid 2 was gone from 2024-02-15 — event 12 leaves
    app.refresh(
        {
            "prof_t": _ch(
                spark, [(2, None, _t("2024-02-15"))], _PROF_SCHEMA, op=OP_DELETE
            )
        },
        batch_id=3,
    )
    assert {(r.eid, r.tier) for r in app.read().collect()} == {
        (10, "bronze"),
        (11, "iron"),
    }
    # and new facts land on the spliced versions
    app.refresh(
        {
            "ev_t": _ch(
                spark,
                [(13, 1, _t("2024-03-15"), 4.0), (14, 1, _t("2024-06-01"), 5.0)],
                _EV_SCHEMA,
                op=OP_UPDATE,
            )
        },
        batch_id=4,
    )
    assert {(r.eid, r.tier) for r in app.read().collect()} == {
        (10, "bronze"),
        (11, "iron"),
        (13, "iron"),
        (14, "gold"),
    }


def test_temporal_late_dim_default_still_raises(spark, tmp_path):
    prof = spark.createDataFrame([(1, "bronze", _t("2024-03-01"))], _PROF_SCHEMA)
    ev = spark.createDataFrame([(10, 1, _t("2024-04-01"), 1.0)], _EV_SCHEMA)
    app = _build(spark, tmp_path, ev, prof)
    app.bootstrap()
    with pytest.raises(Exception, match="event-time ordered"):
        app.refresh(
            {"prof_t": _ch(spark, [(1, "iron", _t("2024-01-01"))], _PROF_SCHEMA)},
            batch_id=1,
        )


def test_temporal_late_dim_reorder_convergence_fuzz(spark, tmp_path):
    """Random dim-change sequences — arbitrary event times including
    LATE and colliding ones, upserts and deletes — plus fact churn,
    under late_dim='reorder'. After every batch the MV must equal a
    pure-Python as-of resolution over all events seen so far (latest
    event at-or-before each fact row's ts; delete or no event ⇒ the
    row leaves the view)."""
    import random

    rng = random.Random(77)
    uids = [1, 2, 3]
    times = [_t(f"2024-0{m}-01") for m in (1, 2, 3, 4, 5)]
    tiers = ["a", "b", "c", "d"]

    prof = spark.createDataFrame(
        [(u, "base", _t("2024-01-01")) for u in uids], _PROF_SCHEMA
    )
    facts = [
        (100 + i, rng.choice(uids), rng.choice(times), float(i))
        for i in range(8)
    ]
    ev = spark.createDataFrame(facts, _EV_SCHEMA)
    app = _build_reorder(spark, tmp_path, ev, prof)
    app.bootstrap()

    # tracked truth: (uid, time) -> (op, tier); bootstrap rows first
    events: dict = {(u, _t("2024-01-01")): (OP_UPDATE, "base") for u in uids}
    live_facts = {e[0]: e for e in facts}

    def expected():
        out = set()
        for eid, (  # noqa: B007
            _e,
            uid,
            ts,
            _v,
        ) in live_facts.items():
            cand = [
                (tm, op, tier)
                for (u, tm), (op, tier) in events.items()
                if u == uid and tm <= ts
            ]
            if not cand:
                continue
            tm, op, tier = max(cand, key=lambda c: c[0])
            if op != OP_DELETE:
                out.add((eid, tier))
        return out

    next_eid = 200
    for batch in range(1, 7):
        if rng.random() < 0.6:
            # dim batch: 1-3 changes at random (possibly late) times
            rows, seq = [], 0
            for _ in range(rng.randint(1, 3)):
                u, tm = rng.choice(uids), rng.choice(times)
                if rng.random() < 0.25:
                    rows.append((u, None, tm, OP_DELETE, seq))
                    events[(u, tm)] = (OP_DELETE, None)
                else:
                    tier = rng.choice(tiers)
                    rows.append((u, tier, tm, OP_UPDATE, seq))
                    events[(u, tm)] = (OP_UPDATE, tier)
                seq += 1
            ch = spark.createDataFrame(
                rows, f"uid int, tier string, updated_at timestamp, {OP_COL} string, {SEQ_COL} long"
            )
            app.refresh({"prof_t": ch}, batch_id=batch)
        else:
            # fact batch: inserts + an occasional delete
            rows, seq = [], 0
            for _ in range(rng.randint(1, 3)):
                if live_facts and rng.random() < 0.3:
                    eid = rng.choice(sorted(live_facts))
                    e = live_facts.pop(eid)
                    rows.append((*e, OP_DELETE, seq))
                else:
                    e = (next_eid, rng.choice(uids), rng.choice(times), 1.0)
                    next_eid += 1
                    live_facts[e[0]] = e
                    rows.append((*e, OP_UPDATE, seq))
                seq += 1
            ch = spark.createDataFrame(
                rows, f"eid int, uid int, ts timestamp, v double, {OP_COL} string, {SEQ_COL} long"
            )
            app.refresh({"ev_t": ch}, batch_id=batch)
        got = {(r.eid, r.tier) for r in app.read().collect()}
        assert got == expected(), f"batch {batch}: {got} != {expected()}"
