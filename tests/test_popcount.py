"""Pin the r10 simhash pair-expansion popcount table.

``dedup_simhash_neardup`` computes hamming distances two ways by
bucket size: an arithmetic SWAR popcount for small buckets and a
65536-entry lookup table (``_pop16_table``) for buckets >= 256 docs.
The small scale factors never produce a large bucket, so the table
path's equivalence is pinned here directly — for EVERY 16-bit value,
and for the 64-bit four-band composition both paths compute inside the
matcher.
"""

from __future__ import annotations

import numpy as np

from tiflink_spark.queries_ext import _pop16_table


def _popcnt16_arith(x):
    # the generator's small-bucket path, verbatim
    x = x - ((x >> 1) & 0x5555)
    x = (x & 0x3333) + ((x >> 2) & 0x3333)
    x = (x + (x >> 4)) & 0x0F0F
    return (x + (x >> 8)) & 0x1F


def test_pop16_table_matches_bit_count_everywhere():
    table = _pop16_table()
    assert table.shape == (65536,)
    assert table.dtype == np.uint8
    vals = np.arange(65536, dtype=np.int64)
    assert (table[vals] == _popcnt16_arith(vals)).all()
    # spot-check endpoints against Python's own popcount
    for v in (0, 1, 0x8000, 0xAAAA, 0x5555, 0xFFFF):
        assert table[v] == bin(v).count("1")


def test_four_band_hamming_agrees_across_paths():
    rng = np.random.default_rng(7)
    table = _pop16_table()
    b = [rng.integers(0, 65536, 512) for _ in range(4)]
    i, j = np.triu_indices(512, 1)
    # table path on uint16 (the >=256 branch)
    b16 = [a.astype(np.uint16) for a in b]
    x16 = [b16[k][i] ^ b16[k][j] for k in range(4)]
    ham_tab = table[x16[0]].astype(np.int64)
    for k in range(1, 4):
        ham_tab += table[x16[k]]
    # arithmetic path on int64 (the small-bucket branch)
    xors = [b[k][i] ^ b[k][j] for k in range(4)]
    ham_arith = np.zeros(len(i), dtype=np.int64)
    for k in range(4):
        ham_arith += _popcnt16_arith(xors[k])
    assert (ham_tab == ham_arith).all()
    # the keep mask and first-band dedup guard agree too
    assert ((ham_tab <= 3) == (ham_arith <= 3)).all()
    assert ((x16[0] != 0) == (xors[0] != 0)).all()
