"""User-function surface: vectorized (Arrow) pandas UDF batteries.

The reference registers no catalog functions of its own
(TiFlinkCatalog.java:286-300 returns empty) — the UDF surface it
exposes is Flink's. Ours is Spark's, re-exported here with the engine's
conventions: **every UDF is an Arrow-batched pandas UDF** (never
row-at-a-time Python) so the slow path stays ~10-100x faster than naive
UDFs and the hot path stays JVM-side built-ins.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DoubleType, LongType, StringType

TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


@F.pandas_udf(LongType())
def token_count(text: pd.Series) -> pd.Series:
    """BPE-ish regex token count, vectorized over an Arrow batch."""
    return text.str.count(TOKEN_RE).astype("int64")


@F.pandas_udf(StringType())
def normalize_text(text: pd.Series) -> pd.Series:
    """Lowercase, collapse whitespace, strip — the canonical pre-dedup
    normalization pass."""
    return text.str.lower().str.replace(r"\s+", " ", regex=True).str.strip()


@F.pandas_udf(DoubleType())
def cosine_sim(a: pd.Series, b: pd.Series) -> pd.Series:
    """Pairwise cosine similarity of two embedding columns."""
    am = np.array(list(a), dtype=np.float64)
    bm = np.array(list(b), dtype=np.float64)
    na = np.linalg.norm(am, axis=1)
    nb = np.linalg.norm(bm, axis=1)
    denom = na * nb
    denom[denom == 0] = 1.0
    return pd.Series((am * bm).sum(axis=1) / denom)


# Grouped-aggregate pandas UDFs (UDAF surface): Spark detects the
# Series -> scalar signature and runs one Arrow batch per group.
@F.pandas_udf(DoubleType())
def median_udaf(v: pd.Series) -> float:
    """Exact median per group (no built-in exact form in Spark)."""
    return float(np.median(v))


@F.pandas_udf(DoubleType())
def p90_udaf(v: pd.Series) -> float:
    """Exact p90 (linear interpolation, matches DuckDB quantile_cont)."""
    return float(np.quantile(v, 0.9))


@F.pandas_udf(ArrayType(DoubleType()))
def l2_normalize(v: pd.Series) -> pd.Series:
    """L2-normalize an embedding column."""
    m = np.array(list(v), dtype=np.float64)
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return pd.Series(list(m / n))
