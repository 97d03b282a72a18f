"""Randomized-churn convergence for the round-3 semi/anti-join and
OVER-window maintenance routes, including simulated crash replays:
whatever the interleaving, the incremental view must converge to the
batch answer of the final states — the property the reference's
consistency machinery exists to guarantee (README.md:18-22,
roll-forward FlinkTikvProducer.java:211-230).
"""

from __future__ import annotations

import pytest

from tiflink_spark.changelog import OP_COL, OP_DELETE, OP_INSERT, OP_UPDATE, SEQ_COL


class TestSemiJoinRandomizedConvergence:
    @pytest.mark.parametrize("anti", [False, True])
    def test_two_sided_random_churn_with_crash_replay(self, spark, tmp_path, anti):
        import random

        from tiflink_spark.mv import IncrementalSemiJoinMV

        rng = random.Random(31 if anti else 13)
        N_FACT, N_KEYS = 40, 8

        fact_state = {k: rng.randrange(N_KEYS) for k in range(N_FACT)}
        # a few NULL-keyed fact rows: never in the semi view, always in
        # the anti view, and untouched by other-side churn
        fact_state[N_FACT] = None
        fact_state[N_FACT + 1] = None
        other_state = {ok: rng.randrange(N_KEYS) for ok in range(6)}

        fact_df = spark.createDataFrame(
            [(k, fk) for k, fk in fact_state.items()], "k long, fk long"
        )
        other_df = spark.createDataFrame(
            [(ok, kv) for ok, kv in other_state.items()], "ok long, kv long"
        )
        mv = IncrementalSemiJoinMV(
            spark,
            fact=fact_df,
            fact_pk=["k"],
            other=other_df,
            other_pk=["ok"],
            fact_key="fk",
            other_key="kv",
            out_cols=["k", "fk"],
            work_dir=str(tmp_path / "sj_rand"),
            anti=anti,
            num_buckets=4,
            shuffle_partitions=4,
        )
        mv.bootstrap()

        for i in range(1, 5):
            side = rng.choice(["f", "o", "both"])
            fc = oc = None
            if side in ("f", "both"):
                rows = []
                for seq in range(10):
                    k = rng.randrange(N_FACT + 12)
                    op = rng.choice([OP_INSERT, OP_UPDATE, OP_DELETE])
                    if op == OP_DELETE:
                        rows.append((k, None, OP_DELETE, seq))
                        fact_state.pop(k, None)
                    else:
                        fk = rng.choice([None, *range(N_KEYS)])
                        rows.append((k, fk, op, seq))
                        fact_state[k] = fk
                fc = spark.createDataFrame(
                    rows, f"k long, fk long, {OP_COL} string, {SEQ_COL} long"
                )
            if side in ("o", "both"):
                rows = []
                for seq in range(4):
                    ok = rng.randrange(8)
                    op = rng.choice([OP_UPDATE, OP_UPDATE, OP_DELETE])
                    if op == OP_DELETE:
                        rows.append((ok, None, OP_DELETE, seq))
                        other_state.pop(ok, None)
                    else:
                        kv = rng.randrange(N_KEYS)
                        rows.append((ok, kv, op, seq))
                        other_state[ok] = kv
                oc = spark.createDataFrame(
                    rows, f"ok long, kv long, {OP_COL} string, {SEQ_COL} long"
                )
            # every second batch: crash after the source merges, before
            # the target commit — the replay must land on the same state
            if i % 2 == 0:
                if fc is not None:
                    mv.fact_store.merge(fc, batch_id=i)
                if oc is not None:
                    mv.other_store.merge(oc, batch_id=i)
            mv.refresh(fc, oc, batch_id=i)

        present = set(other_state.values())
        if anti:
            want = {
                (k, fk) for k, fk in fact_state.items() if fk is None or fk not in present
            }
        else:
            want = {
                (k, fk)
                for k, fk in fact_state.items()
                if fk is not None and fk in present
            }
        got = {(r.k, r.fk) for r in mv.read().collect()}
        assert got == want


class TestWindowRandomizedConvergence:
    def test_random_churn_with_crash_replay(self, spark, tmp_path):
        import random

        from tiflink_spark.mv import IncrementalWindowMV

        rng = random.Random(42)
        N, N_GRP = 45, 6

        state = {
            k: (rng.choice([None, *range(N_GRP)]), round(rng.uniform(0, 50), 2))
            for k in range(N)
        }
        fact_df = spark.createDataFrame(
            [(k, g, v) for k, (g, v) in state.items()], "k long, g long, v double"
        )
        items = [
            "k",
            "g",
            "v",
            "sum(v) OVER (PARTITION BY g ORDER BY v) AS rs",
            "rank() OVER (PARTITION BY g ORDER BY v DESC) AS rnk",
            "row_number() OVER (PARTITION BY g ORDER BY v DESC, k) AS rn",
        ]
        mv = IncrementalWindowMV(
            spark,
            fact=fact_df,
            fact_pk=["k"],
            group_key="g",
            select_items=items,
            work_dir=str(tmp_path / "w_rand"),
            num_buckets=4,
            shuffle_partitions=4,
        )
        mv.bootstrap()

        for i in range(1, 5):
            rows = []
            for seq in range(12):
                k = rng.randrange(N + 15)
                op = rng.choice([OP_INSERT, OP_UPDATE, OP_UPDATE, OP_DELETE])
                if op == OP_DELETE:
                    rows.append((k, None, None, OP_DELETE, seq))
                    state.pop(k, None)
                else:
                    g = rng.choice([None, *range(N_GRP)])
                    v = round(rng.uniform(0, 50), 2)
                    rows.append((k, g, v, op, seq))
                    state[k] = (g, v)
            ch = spark.createDataFrame(
                rows, f"k long, g long, v double, {OP_COL} string, {SEQ_COL} long"
            )
            if i % 2 == 0:  # crash replay: fact pre-merged, then refresh
                mv.fact_store.merge(ch, batch_id=i)
            mv.refresh(ch, batch_id=i)

        final = spark.createDataFrame(
            [(k, g, v) for k, (g, v) in state.items()], "k long, g long, v double"
        )
        want = {tuple(r) for r in final.selectExpr(*items).collect()}
        got = {tuple(r) for r in mv.read().collect()}
        assert got == want
