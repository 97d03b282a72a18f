"""Cross-shape randomized convergence fuzz for the maintenance planner.

Per-route property tests pin each maintenance class individually; this
fuzzer exercises the PLANNER'S dispatch surface: random queries drawn
from the supported grammar (aggregates with random measures/filters/
HAVING, join aggregates, projections, distinct, set ops, top-k), built
as MVApps over small synthetic tables, churned with random +I/+U/-D
batches, and checked against `spark.sql` on the final batch state —
whatever route the planner picked. A planner miss must only ever be
slower, never wrong; a planner HIT must converge exactly.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from tiflink_spark.changelog import OP_COL, OP_DELETE, OP_INSERT, OP_UPDATE, SEQ_COL

COLS = ["g", "h", "v", "w", "s"]


def _fact_rows(rng, n, keyspace):
    return {
        k: (
            rng.randrange(5),
            rng.randrange(3),
            round(rng.uniform(0, 100), 2),
            float(rng.randrange(1, 50)),
            rng.choice("abc"),
        )
        for k in rng.sample(range(keyspace), n)
    }


def _fact_df(spark, state):
    return spark.createDataFrame(
        [(k, *v) for k, v in state.items()],
        "id long, g long, h long, v double, w double, s string",
    )


def _churn(spark, rng, state, keyspace):
    """Mutate ``state`` in place; return the changelog batch."""
    rows = []
    for _ in range(rng.randrange(5, 15)):
        k = rng.randrange(keyspace)
        if k in state and rng.random() < 0.35:
            del state[k]
            rows.append((k, 0, 0, 0.0, 0.0, "a", OP_DELETE))
        else:
            v = (
                rng.randrange(5),
                rng.randrange(3),
                round(rng.uniform(0, 100), 2),
                float(rng.randrange(1, 50)),
                rng.choice("abc"),
            )
            op = OP_UPDATE if k in state else OP_INSERT
            state[k] = v
            rows.append((k, *v, op))
    df = spark.createDataFrame(
        rows, "id long, g long, h long, v double, w double, s string, __op string"
    )
    return df.withColumn(SEQ_COL, F.monotonically_increasing_id())


MEASURES = [
    "count(*) AS n",
    "sum(v) AS sv",
    "avg(v) AS av",
    "min(v) AS mv",
    "max(w) AS mw",
    "count(DISTINCT h) AS cdh",
    "sum(DISTINCT w) AS sdw",
    "sum(v * 2 + w) AS expr_m",
    "count(*) FILTER (WHERE v > 50) AS big_n",
]

WHERES = [None, "v > 20", "s <> 'b'", "h = 1 OR v > 80", "w BETWEEN 5 AND 40"]

HAVINGS = [None, "n > 1", "count(*) > 1"]


def _gen_query(rng, table):
    kind = rng.choice(
        [
            "agg", "agg", "proj", "distinct", "global", "topn", "rollup",
            "window", "order_limit",
        ]
    )
    where = rng.choice(WHERES)
    wsql = f" WHERE {where}" if where else ""
    if kind == "rollup":
        roll = rng.random()
        if roll < 0.15:
            # CUBE past the old 4-term cap (r7: |sets| cost bound) —
            # 32 sub-aggregates, expression terms included
            return (
                f"SELECT g, h, s, id % 3 AS i3, w > 25 AS wb, count(*) AS n "
                f"FROM {table}{wsql} "
                f"GROUP BY CUBE (g, h, s, id % 3, w > 25)"
            )
        if roll < 0.3:
            # expression grouping key (derived onto fact rows — r6)
            ms = rng.sample(MEASURES[:5], rng.randrange(1, 3))
            return (
                f"SELECT upper(s) AS su, g, {', '.join(ms)} FROM {table}{wsql} "
                f"GROUP BY ROLLUP (upper(s), g)"
            )
        grouping = rng.choice(
            [
                "ROLLUP(g, h)",
                "CUBE(g, h)",
                "GROUPING SETS ((g, h), g, ())",
            ]
        )
        ms = rng.sample(MEASURES[:5], rng.randrange(1, 3))
        having = rng.choice([None, "count(*) >= 2"])
        hsql = f" HAVING {having}" if having else ""
        # GROUPING flag, or an r7 GROUPING_ID over a SUBSET / reordered
        # args (the expected-side query goes through
        # spark_executable_query — Spark's own grouping_id rejects the
        # subset spelling)
        gsel = rng.choice(
            [
                "",
                ", GROUPING(h) AS gh",
                ", GROUPING_ID(h) AS gidh",
                ", GROUPING_ID(h, g) AS gidr",
            ]
        )
        return (
            f"SELECT g, h, {', '.join(ms)}{gsel} FROM {table}{wsql} "
            f"GROUP BY {grouping}{hsql}"
        )
    if kind == "window":
        # single and COMPOSITE partition keys; per-row items require a
        # total order (covering the PK — trailing or the PK itself)
        item = rng.choice(
            [
                "sum(v) OVER (PARTITION BY g, h ORDER BY v) AS rs",
                "rank() OVER (PARTITION BY g, h ORDER BY v DESC) AS rnk",
                "row_number() OVER (PARTITION BY g, h ORDER BY v DESC, id) AS rn",
                "row_number() OVER (PARTITION BY g ORDER BY id) AS rn",
                "lag(v) OVER (PARTITION BY h ORDER BY id DESC) AS pv",
            ]
        )
        return f"SELECT id, g, h, v, {item} FROM {table}{wsql}"
    if kind == "order_limit":
        # multi-column order specs with per-column directions; the PK
        # may sit anywhere as long as the set covers it
        spec = rng.choice(
            ["v DESC, id", "id", "id DESC", "g DESC, v, id", "s, id DESC, v"]
        )
        return (
            f"SELECT id, g, v, s FROM {table}{wsql} "
            f"ORDER BY {spec} LIMIT {rng.randrange(2, 6)}"
        )
    if kind == "agg":
        keys = rng.choice([["g"], ["g", "h"], ["s"]])
        ms = rng.sample(MEASURES, rng.randrange(1, 4))
        having = rng.choice(HAVINGS)
        if having and not any(m.endswith("AS n") for m in ms):
            ms.append("count(*) AS n")
        hsql = f" HAVING {having}" if having else ""
        return (
            f"SELECT {', '.join(keys)}, {', '.join(ms)} FROM {table}{wsql} "
            f"GROUP BY {', '.join(keys)}{hsql}"
        )
    if kind == "proj":
        return (
            f"SELECT id, g, round(v * 1.5, 2) AS v15, upper(s) AS su "
            f"FROM {table}{wsql}"
        )
    if kind == "distinct":
        return f"SELECT DISTINCT g, h FROM {table}{wsql}"
    if kind == "global":
        ms = rng.sample(MEASURES[:5], 2)
        return f"SELECT {', '.join(ms)} FROM {table}{wsql}"
    # topn — random rank order spec; always covers the PK (total order)
    spec = rng.choice(["v DESC, id", "v DESC, w, id", "id", "id DESC"])
    return (
        f"SELECT g, id, v, rn FROM (SELECT *, ROW_NUMBER() OVER "
        f"(PARTITION BY g ORDER BY {spec}) AS rn FROM {table}{wsql}) t "
        f"WHERE rn <= 3"
    )


@pytest.mark.parametrize(
    "seed",
    [pytest.param(11, marks=pytest.mark.slow),
     pytest.param(23, marks=pytest.mark.slow),
     pytest.param(37, marks=pytest.mark.slow), 51],
)
def test_fuzzed_shapes_converge(spark, tmp_path, seed):
    from tiflink_spark.app import MVApp

    rng = random.Random(seed)
    KEYSPACE = 60
    for case in range(4):
        state = _fact_rows(rng, 35, KEYSPACE)
        table = f"fz_{seed}_{case}"
        q = _gen_query(rng, table)
        app = (
            MVApp.builder(spark)
            .source(table, _fact_df(spark, state), pk=["id"])
            .query(q)
            .target(str(tmp_path / f"{table}"))
            .num_buckets(2)
            .shuffle_partitions(2)
            .build()
        )
        app.bootstrap()
        n_batches = rng.randrange(1, 4)
        for b in range(1, n_batches + 1):
            ch = _churn(spark, rng, state, KEYSPACE)
            app.refresh({table: ch}, batch_id=b)
            if rng.random() < 0.3:  # crash replay mid-script
                app.refresh({table: ch}, batch_id=b)
        _fact_df(spark, state).createOrReplaceTempView(table)
        # subset-GROUPING_ID spellings (r7) need the grouping()
        # arithmetic rewrite on the Spark-batch expected side
        from tiflink_spark.planner import spark_executable_query

        exp = spark.sql(spark_executable_query(q))
        got = app.read()

        def canon(rows):
            # incremental SUM/AVG accumulate delta-by-delta, so they
            # differ from the one-pass batch value in the last ulp —
            # IEEE addition is not associative. Round floats well above
            # that noise, exactly as the oracle gates do. Sort None-safe:
            # ROLLUP/CUBE subtotal rows carry NULL keys.
            return sorted(
                (
                    tuple(
                        round(x, 6) if isinstance(x, float) else x for x in r
                    )
                    for r in rows
                ),
                key=lambda t: tuple(
                    (x is None, 0 if x is None else x) for x in t
                ),
            )

        g = canon(map(tuple, got.collect()))
        e = canon(map(tuple, exp.collect()))
        assert g == e, (
            f"seed={seed} case={case} strategy={app.maintenance_strategy}\n"
            f"query={q}\n got={g[:5]}...\n exp={e[:5]}..."
        )


def _dim_rows(rng, n, keyspace):
    return {
        k: (rng.randrange(4), round(rng.uniform(0, 10), 2))
        for k in rng.sample(range(keyspace), n)
    }


def _dim_df(spark, state):
    return spark.createDataFrame(
        [(k, *v) for k, v in state.items()], "dk long, attr long, u double"
    )


def _dim_churn(spark, rng, state, keyspace):
    rows = []
    for _ in range(rng.randrange(2, 7)):
        k = rng.randrange(keyspace)
        if k in state and rng.random() < 0.4:
            del state[k]
            rows.append((k, 0, 0.0, OP_DELETE))
        else:
            v = (rng.randrange(4), round(rng.uniform(0, 10), 2))
            op = OP_UPDATE if k in state else OP_INSERT
            state[k] = v
            rows.append((k, *v, op))
    return spark.createDataFrame(
        rows, "dk long, attr long, u double, __op string"
    ).withColumn(SEQ_COL, F.monotonically_increasing_id())


def _gen_two_table_query(rng, fact, dim):
    kind = rng.choice(
        ["joinagg", "joinagg", "join", "joinproj", "semi", "notin", "setop",
         "unionall", "theta", "fullouter", "theta_tree", "agg_enriched"]
    )
    where = rng.choice([None, "v > 30", "s <> 'c'"])
    wsql = f" WHERE {where}" if where else ""
    if kind == "fullouter":
        # r7: both sides preserved, optional row-local WHERE over the
        # OUTPUT (coalesce arms exercise NULL-extended columns)
        fow = rng.choice(
            [None, "coalesce(v, 35.0) > 30", "coalesce(attr, 9) <> 2"]
        )
        fow_sql = f" WHERE {fow}" if fow else ""
        return (
            f"SELECT id, g, v, dk, attr FROM {fact} "
            f"FULL OUTER JOIN {dim} ON g = dk{fow_sql}"
        )
    if kind == "theta_tree":
        # r7: theta edge over a routable derived table (cascade split)
        pred = rng.choice(["v15 > u * 8", "v15 BETWEEN u * 2 AND u * 9"])
        return (
            f"SELECT id, v15, dk, attr FROM "
            f"(SELECT id, round(v * 1.5, 2) AS v15 FROM {fact}{wsql}) j "
            f"JOIN {dim} ON {pred}"
        )
    if kind == "agg_enriched":
        # r7: decorated aggregate — agg inner, dim-join outer
        return (
            f"SELECT g, n, attr, u FROM "
            f"(SELECT g, count(*) AS n FROM {fact}{wsql} GROUP BY g) a "
            f"JOIN {dim} ON g = dk"
        )
    if kind == "joinagg":
        ms = rng.sample(
            ["count(*) AS n", "sum(v) AS sv", "min(v) AS mv", "sum(v * u) AS svu"],
            rng.randrange(1, 3),
        )
        return (
            f"SELECT attr, {', '.join(ms)} FROM {fact} "
            f"JOIN {dim} ON g = dk{wsql} GROUP BY attr"
        )
    if kind == "join":
        return (
            f"SELECT id, dk, v, attr FROM {fact} JOIN {dim} ON g = dk{wsql}"
        )
    if kind == "joinproj":
        # enrichment view: only the fact PK selected; LEFT keeps
        # unmatched fact rows with NULL dim payload
        how = rng.choice(["JOIN", "LEFT JOIN"])
        return (
            f"SELECT id, g, v, attr, u FROM {fact} {how} {dim} ON g = dk{wsql}"
        )
    if kind == "semi":
        neg = rng.choice(["", "NOT "])
        pre = f"{where} AND " if where else ""
        return (
            f"SELECT id, g FROM {fact} WHERE {pre}{neg}EXISTS "
            f"(SELECT 1 FROM {dim} WHERE dk = g)"
        )
    if kind == "notin":
        return f"SELECT id, g FROM {fact} WHERE g NOT IN (SELECT dk FROM {dim})"
    if kind == "setop":
        op = rng.choice(
            ["INTERSECT", "EXCEPT", "UNION", "INTERSECT ALL", "EXCEPT ALL"]
        )
        return f"SELECT g FROM {fact} {op} SELECT attr FROM {dim}"
    if kind == "theta":
        # non-equi join: both PKs selected, disjoint names; the WHERE
        # folds into the predicate on the theta route
        pred = rng.choice(["v > u * 8", "v BETWEEN u * 2 AND u * 9"])
        return (
            f"SELECT id, dk, g, attr FROM {fact} JOIN {dim} ON {pred}{wsql}"
        )
    return f"SELECT id, v FROM {fact} UNION ALL SELECT dk, u FROM {dim}"


@pytest.mark.parametrize(
    "seed",
    [7, pytest.param(19, marks=pytest.mark.slow),
     pytest.param(43, marks=pytest.mark.slow)],
)
def test_fuzzed_two_table_shapes_converge(spark, tmp_path, seed):
    from tiflink_spark.app import MVApp

    rng = random.Random(seed)
    KEYSPACE = 60
    DIMSPACE = 8  # small: dim deletes hit fact rows often
    for case in range(4):
        fstate = _fact_rows(rng, 30, KEYSPACE)
        # fact.g doubles as the join key into dim.dk
        dstate = _dim_rows(rng, 4, DIMSPACE)
        fact, dim = f"ff_{seed}_{case}", f"dd_{seed}_{case}"
        q = _gen_two_table_query(rng, fact, dim)
        app = (
            MVApp.builder(spark)
            .source(fact, _fact_df(spark, fstate), pk=["id"])
            .source(dim, _dim_df(spark, dstate), pk=["dk"])
            .query(q)
            .target(str(tmp_path / f"{fact}"))
            .num_buckets(2)
            .shuffle_partitions(2)
            .build()
        )
        app.bootstrap()
        for b in range(1, rng.randrange(2, 4) + 1):
            changes = {}
            if rng.random() < 0.8:
                changes[fact] = _churn(spark, rng, fstate, KEYSPACE)
            if rng.random() < 0.6 or not changes:
                changes[dim] = _dim_churn(spark, rng, dstate, DIMSPACE)
            app.refresh(changes, batch_id=b)
            if rng.random() < 0.3:
                app.refresh(changes, batch_id=b)
        _fact_df(spark, fstate).createOrReplaceTempView(fact)
        _dim_df(spark, dstate).createOrReplaceTempView(dim)
        exp = spark.sql(q)
        got = app.read()

        def canon(rows):
            # None-safe sort: FULL OUTER rows carry NULL-extended keys
            return sorted(
                (
                    tuple(
                        round(x, 6) if isinstance(x, float) else x for x in r
                    )
                    for r in rows
                ),
                key=lambda t: tuple(
                    (x is None, 0 if x is None else x) for x in t
                ),
            )

        g = canon(map(tuple, got.collect()))
        e = canon(map(tuple, exp.collect()))
        assert g == e, (
            f"seed={seed} case={case} strategy={app.maintenance_strategy}\n"
            f"query={q}\n got={g[:6]}\n exp={e[:6]}"
        )


def _band_rows(rng, n, width, domain):
    """Interval table: id -> (lo, hi) bands over ``domain``; bands may
    overlap and gap (theta joins are many-to-many by construction)."""
    return {
        k: (lo := round(rng.uniform(0, domain), 2), round(lo + rng.uniform(1, width), 2))
        for k in rng.sample(range(50), n)
    }


def _band_df(spark, state, pfx):
    return spark.createDataFrame(
        [(k, lo, hi) for k, (lo, hi) in state.items()],
        f"{pfx}id long, {pfx}lo double, {pfx}hi double",
    )


def _band_churn(spark, rng, state, width, domain, pfx):
    rows = []
    for _ in range(rng.randrange(1, 4)):
        k = rng.randrange(50)
        if k in state and rng.random() < 0.4:
            del state[k]
            rows.append((k, 0.0, 0.0, OP_DELETE))
        else:
            lo = round(rng.uniform(0, domain), 2)
            v = (lo, round(lo + rng.uniform(1, width), 2))
            op = OP_UPDATE if k in state else OP_INSERT
            state[k] = v
            rows.append((k, *v, op))
    return spark.createDataFrame(
        rows, f"{pfx}id long, {pfx}lo double, {pfx}hi double, __op string"
    ).withColumn(SEQ_COL, F.monotonically_increasing_id())


@pytest.mark.slow
@pytest.mark.parametrize("seed", [29])
def test_fuzzed_multi_theta_trees_converge(spark, tmp_path, seed):
    """Round 10: flat N-table trees with MULTIPLE theta edges (and a
    theta-first variant with no equi edge at all) route through the
    recursive cascade-chain rewrite and converge under churn on every
    table, including replays. The planner must route these as nested
    CascadeMV chains — a recompute fallback here would hide a rewrite
    regression, so the routing itself is asserted."""
    from tiflink_spark.app import MVApp, CascadeMV

    rng = random.Random(seed)
    KEYSPACE, DIMSPACE = 40, 8
    for case in range(3):
        fstate = _fact_rows(rng, 25, KEYSPACE)
        dstate = _dim_rows(rng, 4, DIMSPACE)
        cstate = _band_rows(rng, 4, 40, 100)   # bands over fact.v (0..100)
        estate = _band_rows(rng, 3, 4, 8)      # bands over fact.g (0..4)
        fact, dim = f"mf_{seed}_{case}", f"md_{seed}_{case}"
        cb, eb = f"mc_{seed}_{case}", f"me_{seed}_{case}"
        shape = rng.choice(["equi_theta_theta", "theta_theta", "equi_theta_theta_where"])
        if shape == "theta_theta":
            q = (
                f"SELECT id, g, v, cid, eid FROM {fact} "
                f"JOIN {cb} ON v >= clo AND v < chi "
                f"JOIN {eb} ON g >= elo AND g < ehi"
            )
            srcs = {fact: None, cb: None, eb: None}
        else:
            wsql = " WHERE v > 10" if shape.endswith("_where") else ""
            q = (
                f"SELECT id, g, v, attr, cid, eid FROM {fact} "
                f"JOIN {dim} ON g = dk "
                f"JOIN {cb} ON v >= clo AND v < chi "
                f"JOIN {eb} ON u >= elo AND u < ehi{wsql}"
            )
            srcs = {fact: None, dim: None, cb: None, eb: None}
        b = MVApp.builder(spark).source(fact, _fact_df(spark, fstate), pk=["id"])
        if dim in srcs:
            b = b.source(dim, _dim_df(spark, dstate), pk=["dk"])
        b = b.source(cb, _band_df(spark, cstate, "c"), pk=["cid"])
        b = b.source(eb, _band_df(spark, estate, "e"), pk=["eid"])
        app = (
            b.query(q)
            .target(str(tmp_path / f"mt_{seed}_{case}"))
            .num_buckets(2)
            .shuffle_partitions(2)
            .build()
        )
        assert isinstance(app._mv, CascadeMV), (
            f"seed={seed} case={case} shape={shape}: expected a cascade "
            f"chain, got {app.maintenance_strategy}\nquery={q}"
        )
        app.bootstrap()
        for bi in range(1, rng.randrange(2, 4) + 1):
            changes = {}
            if rng.random() < 0.8:
                changes[fact] = _churn(spark, rng, fstate, KEYSPACE)
            if dim in srcs and rng.random() < 0.5:
                changes[dim] = _dim_churn(spark, rng, dstate, DIMSPACE)
            if rng.random() < 0.5 or not changes:
                changes[cb] = _band_churn(spark, rng, cstate, 40, 100, "c")
            if rng.random() < 0.4:
                changes[eb] = _band_churn(spark, rng, estate, 4, 8, "e")
            app.refresh(changes, batch_id=bi)
            if rng.random() < 0.3:
                app.refresh(changes, batch_id=bi)  # replay idempotence
        _fact_df(spark, fstate).createOrReplaceTempView(fact)
        if dim in srcs:
            _dim_df(spark, dstate).createOrReplaceTempView(dim)
        _band_df(spark, cstate, "c").createOrReplaceTempView(cb)
        _band_df(spark, estate, "e").createOrReplaceTempView(eb)
        exp = spark.sql(q)
        got = app.read()

        def canon(rows):
            return sorted(
                (
                    tuple(
                        round(x, 6) if isinstance(x, float) else x for x in r
                    )
                    for r in rows
                ),
                key=lambda t: tuple(
                    (x is None, 0 if x is None else x) for x in t
                ),
            )

        g = canon(map(tuple, got.collect()))
        e = canon(map(tuple, exp.collect()))
        assert g == e, (
            f"seed={seed} case={case} shape={shape} "
            f"strategy={app.maintenance_strategy}\nquery={q}\n"
            f" got={g[:6]}\n exp={e[:6]}"
        )
