"""LZ4 block codec + TfFastCompression framing + Usd integer codec
(models/crate_codec.py) — including hand-computed wire-format goldens so
the byte layout matches the published formats and can't silently drift
(reference analogue: the lz4/integer codecs inside the USD SDK that
BasicRenderer/src/Import/USDLoader.cpp relies on)."""

import numpy as np
import pytest

from basicrenderer_tpu.models import crate_codec as cc


# --- LZ4 block format goldens (computed by hand from the spec) -----------

def test_lz4_decode_known_block():
    # token 0x54: 5 literals, match len 4+4=8; offset 5 -> overlapping copy
    # of "abcde" -> "abcdeabc".
    block = bytes([0x54]) + b"abcde" + bytes([0x05, 0x00])
    # A final literals-only sequence is required by the format.
    block += bytes([0x20]) + b"!!"
    out = cc.lz4_decompress_block(block, 64)
    assert out == b"abcde" + b"abcdeabc"[:8] + b"!!"
    assert cc._py_lz4_decompress(block, 64) == out


def test_lz4_decode_extended_lengths():
    # 15+255+3 = 273 literals via extension bytes.
    lits = bytes(273)
    block = bytes([0xF0, 255, 3]) + lits
    assert cc.lz4_decompress_block(block, 300) == lits


def test_lz4_malformed_raises():
    with pytest.raises(cc.Lz4Error):
        cc.lz4_decompress_block(bytes([0x10]), 4)       # truncated literal
    with pytest.raises(cc.Lz4Error):
        # Match offset beyond output start.
        cc.lz4_decompress_block(
            bytes([0x14]) + b"a" + bytes([9, 0]) + bytes([0x00]), 64)


def test_lz4_round_trip_both_impls():
    rng = np.random.default_rng(0)
    for data in (b"", b"x", b"hello world " * 200,
                 rng.integers(0, 4, 5000, np.uint8).tobytes(),
                 rng.integers(0, 256, 5000, np.uint8).tobytes()):
        for comp in (cc.lz4_compress_block, cc._py_lz4_compress):
            c = comp(data)
            assert cc.lz4_decompress_block(c, len(data)) == data
            assert cc._py_lz4_decompress(c, len(data)) == data


def test_lz4_compresses_repetitive_data():
    data = b"abcdefgh" * 4096
    assert len(cc.lz4_compress_block(data)) < len(data) // 50


def test_tf_framing_single_chunk():
    data = b"tokens\0more\0"
    framed = cc.tf_compress(data)
    assert framed[0] == 0                  # single whole-buffer chunk
    assert cc.tf_decompress(framed, len(data)) == data


# --- Usd integer codec ----------------------------------------------------

def test_intcodec_encoded_layout():
    """Lock the raw (pre-lz4) layout: commonValue, 2-bit codes (low bits
    first), then packed deltas."""
    vals = np.asarray([10, 20, 30, 31, 500], np.int32)
    enc = cc.encode_ints(vals)
    # Deltas: 10,10,10,1,469. Common = 10 (3 times).
    assert np.frombuffer(enc, np.int32, 1)[0] == 10
    # Codes: [0,0,0,1,2] packed 2 bits each little-end first:
    # byte0 = 0|0<<2|0<<4|1<<6 = 0x40, byte1 = 2 = 0x02.
    assert enc[4] == 0x40 and enc[5] == 0x02
    # Payload: int8(1), int16(469).
    assert enc[6] == 1
    assert np.frombuffer(enc, np.int16, 1, offset=7)[0] == 469
    assert len(enc) == 9
    out = cc.decode_ints(enc, 5)
    np.testing.assert_array_equal(out, vals)


def test_intcodec_round_trips():
    rng = np.random.default_rng(1)
    cases = [
        np.arange(10000, dtype=np.int32),
        rng.integers(-2**31, 2**31, 777).astype(np.int32),
        np.zeros(3, np.int32),
        np.asarray([-1, -1, -1], np.int32),     # 0xFFFFFFFF terminators
    ]
    for vals in cases:
        buf = cc.compress_ints(vals)
        np.testing.assert_array_equal(cc.decompress_ints(buf, len(vals)),
                                      vals)
    wide = rng.integers(-2**62, 2**62, 333)
    buf = cc.compress_ints(wide, wide=True)
    np.testing.assert_array_equal(cc.decompress_ints(buf, 333, wide=True),
                                  wide)


def test_intcodec_wide_classes():
    """64-bit codec size classes are int16/int32/int64."""
    vals = np.asarray([0, 100, 100 + 70000, 100 + 70000 + (1 << 40)],
                      np.int64)
    enc = cc.encode_ints(vals, wide=True)
    out = cc.decode_ints(enc, 4, wide=True)
    np.testing.assert_array_equal(out, vals)


def test_intcodec_monotone_compresses_well():
    """Sorted index streams (the SPECS/FIELDSETS case) shrink a lot."""
    vals = np.arange(100000, dtype=np.int32)
    buf = cc.compress_ints(vals)
    assert len(buf) < 2000                  # ~constant deltas -> tiny
