"""compare() edge cases in the local oracle-gate stand-in.

Pinned after a full sf0.001 sweep aborted mid-run: a 0-row result whose
empty columns differ only in integer width (Spark year() -> int32,
DuckDB -> int64) made ``Series.equals`` False on dtype alone, and the
mismatch diagnostic crashed on ``idxmax()`` of the empty mask.
"""

import sys

import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo/tools")

from check_oracle import compare  # noqa: E402


def _pdf(**cols):
    return pd.DataFrame({k: pd.Series(v[0], dtype=v[1]) for k, v in cols.items()})


def test_empty_frames_with_int_width_divergence_pass():
    s = _pdf(nation=([], "object"), l_year=([], "int32"), revenue=([], "float64"))
    d = _pdf(nation=([], "object"), l_year=([], "int64"), revenue=([], "float64"))
    ok, msg = compare(s, d)
    assert ok, msg


def test_int_width_divergence_with_rows_passes():
    s = _pdf(l_year=([1995, 1996], "int32"))
    d = _pdf(l_year=([1995, 1996], "int64"))
    ok, msg = compare(s, d)
    assert ok, msg


def test_value_mismatch_still_reported():
    s = _pdf(k=(["a", "b"], "object"))
    d = _pdf(k=(["a", "c"], "object"))
    ok, msg = compare(s, d)
    assert not ok and "value mismatch" in msg


def test_int_vs_float_dtype_divergence_still_fails():
    s = _pdf(v=([1, 2], "int64"))
    d = _pdf(v=([1.0, 2.0], "float64"))
    ok, msg = compare(s, d)
    assert not ok and "DTYPE-DIVERGENCE" in msg


def test_float_rows_still_exact_compare():
    s = _pdf(v=([0.1, float(np.nan)], "float64"))
    d = _pdf(v=([0.1, float(np.nan)], "float64"))
    ok, msg = compare(s, d)
    assert ok, msg
