"""Registry-wide timing sweep: every batch query, noop sink, warm JVM.

Usage: python tools/sweep_timings.py [sf_dir] [out.json] [query ...]

For each registry query (or the given subset): one unmeasured warm run,
then min-of-2 timed runs against the noop sink. Prints a JSON dict
sorted slowest-first. This is the measurement pass of guide §1 applied
to the WHOLE declared surface, not just the bench HEADLINE — the
checklist input for the optimization rounds.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tiflink_spark.queries import get_registry  # noqa: E402
from tiflink_spark.session import get_spark, load_tables  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    out_path = sys.argv[2] if len(sys.argv) > 2 else None
    names = sys.argv[3:]
    spark = get_spark("sweep_timings")
    registry = get_registry()
    if not names:
        names = list(registry)
        if os.environ.get("SWEEP_SKIP_EAGER") == "1":
            # Building an eager query's DataFrame runs a whole MV /
            # streaming lifecycle — time those with their dedicated
            # probes (tools/probe_refresh.py, probe_cadence.py), not a
            # registry sweep.
            import inspect

            markers = ("localCheckpoint", "_run_stream_to_df", ".save(", ".start(",
                       ".collect()", ".write")
            names = [
                n for n in names
                if not any(m in inspect.getsource(registry[n].fn) for m in markers)
            ]
    # Warm: page cache, codegen, python workers (same as bench).
    for df in load_tables(spark, sf_dir).values():
        df.write.format("noop").mode("overwrite").save()
    spark.range(1000).mapInPandas(lambda b: b, schema="id long").write.format(
        "noop"
    ).mode("overwrite").save()

    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name in names:
        spec = registry.get(name)
        if spec is None:
            continue
        try:
            spark.sparkContext.setJobDescription(f"sweep: {name}")
            spec.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs = []
            for _ in range(2):
                t0 = time.perf_counter()
                spec.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                runs.append(time.perf_counter() - t0)
            timings[name] = round(min(runs), 3)
            print(f"{name}: {timings[name]}", flush=True)
        except Exception as e:  # noqa: BLE001 — sweep must survive one bad query
            errors[name] = f"{type(e).__name__}: {e}"[:300]
            print(f"ERR {name}: {errors[name]}", flush=True)
        finally:
            spark.sparkContext.setJobDescription(None)
    ranked = dict(sorted(timings.items(), key=lambda kv: -kv[1]))
    rec = {"sf_dir": sf_dir, "total": round(sum(timings.values()), 3),
           "timings": ranked, "errors": errors}
    print("SWEEP " + json.dumps(rec))
    if out_path:
        with open(out_path, "w") as f:
            json.dump(rec, f, indent=1)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
