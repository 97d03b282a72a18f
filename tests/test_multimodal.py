"""Multimodal stand-in determinism: the fake decode/resize/feature
functions are pure functions of the bytes — the property that lets the
DuckDB oracle mirror the Arrow-batched pipeline byte-exactly."""

import hashlib

from tiflink_spark.multimodal import (
    FEATURE_PRIMES,
    fake_decode_meta,
    fake_feature_extract,
    fake_resize_meta,
)


def test_fake_decode_is_pure_and_plausible():
    data = b"some media bytes"
    a, b = fake_decode_meta(data), fake_decode_meta(data)
    assert a == b
    assert a["width"] >= 64 and a["height"] >= 64
    assert 1 <= a["n_channels"] <= 3
    assert a["checksum"] == hashlib.md5(data).hexdigest()


def test_fake_resize_scale_is_exact_integer_math():
    data = b"hello world, this is a media blob"
    d = fake_decode_meta(data)
    m = fake_resize_meta(data, 224, 224)
    assert (m["width"], m["height"]) == (d["width"], d["height"])
    assert m["scale_pm"] == min(10000 * 224 // d["width"], 10000 * 224 // d["height"])
    chained = f"{d['checksum']}x224x224"
    assert m["checksum"] == hashlib.md5(chained.encode()).hexdigest()


def test_fake_features_are_length_residues():
    data = b"x" * 12345
    feats = fake_feature_extract(data)
    assert feats == [12345 % p for p in FEATURE_PRIMES]
    assert len(feats) == len(FEATURE_PRIMES)
