"""Local stand-in for the driver's correctness gate.

Runs every registry query on Spark and its oracle on DuckDB over the
same parquet tables, then compares row count, column names, and values
(columns sorted by name, rows sorted). Floats are compared exactly AND
with tolerance so float-jitter risk is visible before the driver sees
it.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time
import traceback

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo")

from tiflink_spark.queries import get_registry  # noqa: E402
from tiflink_spark.session import TABLES, get_spark  # noqa: E402


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


_NONSCALAR = (list, dict, set, tuple, np.ndarray)


def _nonscalar_cols(df: pd.DataFrame) -> list[str]:
    """Columns whose cells the driver's canonicalizer cannot hash/sort.

    The driver sorts RAW cell values with pandas; list/dict/array cells
    crash its ``sort_values`` → ``factorize`` path (the r8 ``array_ops``
    red). Any query emitting such a column must serialize it
    (``array_join`` / ``to_json``) on BOTH the Spark and oracle sides.
    """
    bad = []
    for c in df.columns:
        if df[c].dtype == object:
            col = df[c].dropna()
            if len(col) and col.map(lambda v: isinstance(v, _NONSCALAR)).any():
                bad.append(c)
    return bad


def canon(df: pd.DataFrame) -> pd.DataFrame:
    # Harness parity: the driver sorts on RAW cell values (no
    # pre-stringification), so do the same here — divergence hid the
    # array_ops class of failure until the driver saw it.
    df = df[sorted(df.columns)].copy()
    return df.sort_values(by=list(df.columns), na_position="first").reset_index(drop=True)


def compare(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> tuple[bool, str]:
    if len(spark_pdf) != len(duck_pdf):
        return False, f"rowcount spark={len(spark_pdf)} duck={len(duck_pdf)}"
    scols, dcols = sorted(spark_pdf.columns), sorted(duck_pdf.columns)
    if scols != dcols:
        return False, f"columns spark={scols} duck={dcols}"
    bad = sorted(set(_nonscalar_cols(spark_pdf)) | set(_nonscalar_cols(duck_pdf)))
    if bad:
        return False, (
            f"NON-SCALAR output columns {bad} (driver-hash crash risk) — "
            "serialize arrays/maps/structs with array_join/to_json on both sides"
        )
    s, d = canon(spark_pdf), canon(duck_pdf)
    # Dtype-parity lint (the r6 driver red): the driver hashes VALUES
    # WITH THEIR DTYPE, so Spark int64 vs DuckDB float64 (e.g. an
    # un-cast sum(BIGINT) -> HUGEINT -> float64) hash-mismatches even
    # when every value is equal. The float-coercion below would hide
    # that, so fail loudly on int-vs-float divergence first.
    for c in s.columns:
        si = np.issubdtype(s[c].dtype, np.integer)
        di = np.issubdtype(d[c].dtype, np.integer)
        sf = np.issubdtype(s[c].dtype, np.floating)
        df_ = np.issubdtype(d[c].dtype, np.floating)
        if (si and df_) or (sf and di):
            return False, (
                f"col {c}: DTYPE-DIVERGENCE (driver-hash risk) "
                f"spark={s[c].dtype} duck={d[c].dtype} — CAST the oracle "
                "aggregate (DuckDB sum(INT)->HUGEINT lands as float64)"
            )
    for c in s.columns:
        sv, dv = s[c], d[c]
        if np.issubdtype(sv.dtype, np.floating) or np.issubdtype(dv.dtype, np.floating):
            sv = pd.to_numeric(sv, errors="coerce").astype(float)
            dv = pd.to_numeric(dv, errors="coerce").astype(float)
            both_nan = sv.isna() & dv.isna()
            exact = ((sv == dv) | both_nan).all()
            if not exact:
                close = (np.isclose(sv, dv, rtol=1e-9, atol=1e-9, equal_nan=True) | both_nan).all()
                if close:
                    return False, f"col {c}: FLOAT-JITTER (close but not exact)"
                bad = (~((sv == dv) | both_nan)).idxmax()
                return False, f"col {c}: value mismatch at row {bad}: {sv[bad]!r} vs {dv[bad]!r}"
        else:
            sv2 = sv.map(lambda v: None if v is None or (isinstance(v, float) and np.isnan(v)) else str(v))
            dv2 = dv.map(lambda v: None if v is None or (isinstance(v, float) and np.isnan(v)) else str(v))
            if not sv2.equals(dv2):
                neq = (sv2.fillna("\0") != dv2.fillna("\0"))
                if not neq.any():
                    # Series.equals is False on dtype alone (e.g. an
                    # empty int32 vs int64 column at a tiny SF), but
                    # every VALUE matches — same int-width tolerance
                    # the non-empty path gives via str() comparison.
                    continue
                bad = neq.idxmax()
                return False, f"col {c}: value mismatch at row {bad}: {sv2[bad]!r} vs {dv2[bad]!r}"
    return True, "ok"


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    reg = get_registry()
    spark = get_spark("check_oracle")
    con = duck_con(sf_dir)
    n_pass = n_fail = n_skip = 0
    for name, spec in reg.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = spec.fn(spark, sf_dir).toPandas()
        except Exception:
            print(f"FAIL {name}: spark raised\n{traceback.format_exc()}")
            n_fail += 1
            continue
        if spec.oracle is None:
            print(f"SKIP {name}: no oracle (rows={len(sdf)}) [{time.time()-t0:.1f}s]")
            n_skip += 1
            continue
        try:
            ddf = con.execute(spec.oracle).df()
        except Exception:
            print(f"FAIL {name}: duckdb raised\n{traceback.format_exc()}")
            n_fail += 1
            continue
        ok, msg = compare(sdf, ddf)
        status = "PASS" if ok else "FAIL"
        print(f"{status} {name}: {msg} (rows={len(sdf)}) [{time.time()-t0:.1f}s]")
        n_pass += ok
        n_fail += not ok
    print(f"\n{n_pass} pass, {n_fail} fail, {n_skip} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
