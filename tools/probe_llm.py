"""sf10 scale probe for the LLM-pipeline battery.

Usage: python tools/make_sf.py /tmp/sf1 10 && python tools/make_sf.py /tmp/sf10 100,
then python tools/probe_llm.py. Committed so the probe is reproducible
across rounds (r6 ran sf1 only, from an ad-hoc script).

Runs each query at sf0.1, sf1, sf10 (same process, min-of-2 warm) and
prints per-decade scaling exponents: exp = log10(t_hi/t_lo).
exp ~ 1.0 = linear, < 1 sub-linear, > 1 super-linear.
"""
import sys, time, json
sys.path.insert(0, "/root/repo")
from tiflink_spark.session import get_spark
from tiflink_spark.queries import get_registry

QUERIES = [
    "dedup_exact", "dedup_minhash_lsh", "dedup_ngram_jaccard",
    "dedup_keep_canonical", "embedding_ann_lsh", "embedding_ann_ivf",
    "embedding_cosine_topk", "text_quality_score", "text_token_count",
    "text_fingerprint", "pipeline_corpus_prep",
]
DIRS = {"sf0.1": "/root/testdata/sf0.1", "sf1": "/tmp/sf1", "sf10": "/tmp/sf10"}

spark = get_spark("llm_probe")
reg = get_registry()
out = {}
for name in QUERIES:
    fn = reg[name].fn
    rec = {}
    for sf, d in DIRS.items():
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            n = fn(spark, d).count()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        rec[sf] = round(best, 2)
        rec[f"rows_{sf}"] = n
    import math
    rec["exp_01_to_1"] = round(math.log10(max(rec["sf1"], 1e-3) / max(rec["sf0.1"], 1e-3)), 2)
    rec["exp_1_to_10"] = round(math.log10(max(rec["sf10"], 1e-3) / max(rec["sf1"], 1e-3)), 2)
    out[name] = rec
    print(name, json.dumps(rec), flush=True)
print("FINAL " + json.dumps(out))
spark.stop()
