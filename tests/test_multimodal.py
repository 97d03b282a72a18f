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


class TestStdlibCodecs:
    def test_png_roundtrip_gray_and_rgb(self):
        from tiflink_spark.multimodal import decode_png, encode_png

        px = bytes((x + 3 * y) % 256 for y in range(6) for x in range(5))
        d = decode_png(encode_png(5, 6, px, 1))
        assert (d["width"], d["height"], d["n_channels"]) == (5, 6, 1)
        assert d["pixel_sum"] == sum(px)
        rgb = bytes((x * 7 + c) % 256 for y in range(4) for x in range(3) for c in range(3))
        d2 = decode_png(encode_png(3, 4, rgb, 3))
        assert d2["n_channels"] == 3 and d2["pixel_sum"] == sum(rgb)

    def test_png_unfilters_all_filter_types(self):
        """Hand-build a PNG whose rows use filters 1-4 (the encoder only
        writes 0): the decoder must invert Sub/Up/Average/Paeth exactly."""
        import struct
        import zlib

        from tiflink_spark.multimodal import decode_png

        w, h = 4, 5
        rows = [[(x * 11 + y * 29) % 256 for x in range(w)] for y in range(h)]

        def filt(ftype, cur, prev):
            out = []
            for x in range(w):
                a = cur[x - 1] if x >= 1 else 0
                b = prev[x]
                c = prev[x - 1] if x >= 1 else 0
                if ftype == 0:
                    pred = 0
                elif ftype == 1:
                    pred = a
                elif ftype == 2:
                    pred = b
                elif ftype == 3:
                    pred = (a + b) // 2
                else:
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                out.append((cur[x] - pred) & 0xFF)
            return out

        raw = b""
        prev = [0] * w
        for y, ftype in zip(range(h), (0, 1, 2, 3, 4)):
            raw += bytes([ftype]) + bytes(filt(ftype, rows[y], prev))
            prev = rows[y]

        def chunk(ctype, payload):
            crc = zlib.crc32(ctype + payload) & 0xFFFFFFFF
            return struct.pack(">I", len(payload)) + ctype + payload + struct.pack(">I", crc)

        png = (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(raw))
            + chunk(b"IEND", b"")
        )
        d = decode_png(png)
        assert d["pixel_sum"] == sum(sum(r) for r in rows)

    def test_wav_roundtrip_and_auto_dispatch(self):
        from tiflink_spark.multimodal import decode_media_auto, decode_wav, encode_wav

        samples = [((i * 13) % 200 - 100) * 50 for i in range(100)]
        data = encode_wav(samples, 16000)
        d = decode_wav(data)
        assert (d["sample_rate"], d["n_frames"], d["n_channels"]) == (16000, 100, 1)
        assert d["sample_abs_sum"] == sum(abs(s) for s in samples)
        assert decode_media_auto(data)["n_frames"] == 100

    def test_auto_dispatch_unknown_format_keeps_contract(self):
        # JPEG now has a real decoder; a format with no stdlib decoder
        # (MP3) must still raise the documented NotImplementedError
        import pytest as _pytest

        from tiflink_spark.multimodal import decode_media_auto

        with _pytest.raises(NotImplementedError):
            decode_media_auto(b"ID3\x03\x00 not a decodable format")

    def test_resize_png_nearest_neighbor(self):
        from tiflink_spark.multimodal import decode_png, encode_png, resize_png

        w, h = 6, 4
        px = bytes((x * 10 + y) % 256 for y in range(h) for x in range(w))
        m = resize_png(encode_png(w, h, px, 1), 3, 2)
        assert (m["width"], m["height"]) == (3, 2)
        expect = sum(
            px[(ty * h // 2) * w + (tx * w // 3)] for ty in range(2) for tx in range(3)
        )
        assert m["pixel_sum"] == expect
        # re-encoded bytes decode back to the same pixels
        assert decode_png(m["data"])["pixel_sum"] == expect

    def test_paletted_png_rejected(self):
        import struct
        import zlib

        import pytest as _pytest

        from tiflink_spark.multimodal import decode_png

        def chunk(ctype, payload):
            crc = zlib.crc32(ctype + payload) & 0xFFFFFFFF
            return struct.pack(">I", len(payload)) + ctype + payload + struct.pack(">I", crc)

        png = (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 1, 8, 3, 0, 0, 0))
            + chunk(b"PLTE", b"\xff\x00\x00\x00\xff\x00")
            + chunk(b"IDAT", zlib.compress(b"\x00\x00\x01"))
            + chunk(b"IEND", b"")
        )
        with _pytest.raises(NotImplementedError, match="paletted"):
            decode_png(png)


class TestJpegCodec:
    """Baseline-sequential JPEG, stdlib+numpy only: the encoder carries
    its canonical Huffman tables in DHT, so decode(encode(x)) exercises
    marker walk, Huffman, dequantize, zigzag, IDCT and color transform
    end to end. JPEG is lossy — assertions bound the error on smooth
    content (a wrong table/zigzag/IDCT produces errors orders of
    magnitude larger)."""

    def test_gray_roundtrip_smooth(self):
        import numpy as np

        from tiflink_spark.multimodal import decode_jpeg, encode_jpeg

        w, h = 64, 48
        px = bytes(min(255, x * 2 + y) for y in range(h) for x in range(w))
        m = decode_jpeg(encode_jpeg(w, h, px, 1))
        assert (m["width"], m["height"], m["n_channels"]) == (w, h, 1)
        a = np.frombuffer(px, dtype=np.uint8).astype(int)
        b = np.frombuffer(m["pixels"], dtype=np.uint8).astype(int)
        assert np.abs(a - b).max() <= 4

    def test_rgb_roundtrip_smooth(self):
        import numpy as np

        from tiflink_spark.multimodal import decode_jpeg, encode_jpeg

        w, h = 24, 17  # non-multiple-of-8 edges exercise padding
        px = bytes(
            min(255, x * 3 + y * 2 + 20 * c)
            for y in range(h)
            for x in range(w)
            for c in range(3)
        )
        m = decode_jpeg(encode_jpeg(w, h, px, 3))
        assert (m["width"], m["height"], m["n_channels"]) == (w, h, 3)
        a = np.frombuffer(px, dtype=np.uint8).astype(int)
        b = np.frombuffer(m["pixels"], dtype=np.uint8).astype(int)
        assert np.abs(a - b).max() <= 8

    def test_flat_block_near_exact(self):
        import numpy as np

        from tiflink_spark.multimodal import decode_jpeg, encode_jpeg

        px = bytes([77]) * (16 * 16)
        m = decode_jpeg(encode_jpeg(16, 16, px, 1))
        b = np.frombuffer(m["pixels"], dtype=np.uint8).astype(int)
        assert np.abs(b - 77).max() <= 1

    def test_auto_dispatch_sniffs_jpeg(self):
        from tiflink_spark.multimodal import decode_media_auto, encode_jpeg

        data = encode_jpeg(8, 8, bytes(range(64)), 1)
        assert data[:2] == b"\xff\xd8"
        m = decode_media_auto(data)
        assert (m["width"], m["height"]) == (8, 8)

    def test_subsampled_and_progressive_rejected(self):
        import pytest as _pytest

        from tiflink_spark.multimodal import decode_jpeg, encode_jpeg

        data = bytearray(encode_jpeg(8, 8, bytes(64), 1))
        # flip SOF0 (0xC0) to SOF2 (progressive)
        i = data.find(b"\xff\xc0")
        data[i + 1] = 0xC2
        with _pytest.raises(NotImplementedError):
            decode_jpeg(bytes(data))
        # 4:2:0 sampling byte in SOF -> NotImplementedError
        data = bytearray(encode_jpeg(8, 8, bytes(64), 1))
        i = data.find(b"\xff\xc0")
        data[i + 11] = 0x22  # sampling factors of first component
        with _pytest.raises(NotImplementedError):
            decode_jpeg(bytes(data))


class TestAviCodec:
    """Uncompressed-DIB AVI, stdlib-only and LOSSLESS: RIFF walk,
    avih/strf parse, bottom-up BGR '00db' frames with 4-byte row
    padding — frames round-trip byte-exact."""

    def test_roundtrip_exact_with_padding(self):
        from tiflink_spark.multimodal import decode_avi, encode_avi

        w, h = 5, 3  # stride 15 -> 1 pad byte per row
        frames = [
            bytes((x + y * 2 + f * 3 + c) % 256 for y in range(h) for x in range(w) for c in range(3))
            for f in range(4)
        ]
        m = decode_avi(encode_avi(w, h, frames, fps=12))
        assert (m["width"], m["height"], m["n_frames"], m["fps"]) == (w, h, 4, 12)
        assert m["frames"] == frames
        assert m["frame_sums"] == [sum(f) for f in frames]

    def test_auto_dispatch_and_compressed_rejected(self):
        import pytest as _pytest

        from tiflink_spark.multimodal import decode_avi, decode_media_auto, encode_avi

        data = encode_avi(4, 2, [bytes(24)], fps=5)
        m = decode_media_auto(data)
        assert m["n_frames"] == 1
        # compressed frame chunk ('00dc') -> NotImplementedError
        broken = bytearray(data)
        i = broken.find(b"00db")
        broken[i : i + 4] = b"00dc"
        with _pytest.raises(NotImplementedError):
            decode_avi(bytes(broken))
