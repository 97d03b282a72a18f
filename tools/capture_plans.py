"""Capture .explain("formatted") for headline queries into plans/r<N>/.

Usage: python tools/capture_plans.py <suffix> [query ...]
  suffix: 'before' or 'after' (file name becomes <query>_<suffix>.txt)
  queries default to the bench HEADLINE list.

Plans are captured at the bench scale factor ($SPARK_GRAFT_SF_DIR,
default sf0.1) on the same session config the bench uses, so Exchange
counts / join strategies / PushedFilters match what the bench times.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE  # noqa: E402
from tiflink_spark.queries import get_registry  # noqa: E402
from tiflink_spark.session import get_spark  # noqa: E402


def main() -> int:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or HEADLINE
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           "plans", os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r11"))
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("capture_plans")
    registry = get_registry()
    for name in names:
        if name not in registry:
            print(f"SKIP {name}: not registered")
            continue
        df = registry[name].fn(spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(f"# {name} @ {sf_dir} ({suffix})\n")
            f.write(buf.getvalue())
        txt = buf.getvalue()
        n_ex = txt.count("Exchange")
        joins = [
            j for j in ("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin",
                        "BroadcastNestedLoopJoin", "CartesianProduct")
            if j in txt
        ]
        pyn = [p for p in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas",
                           "MapInArrow", "FlatMapGroupsInPandas", "Cogroup") if p in txt]
        print(f"WROTE {path}: Exchange={n_ex} joins={joins} python={pyn}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
