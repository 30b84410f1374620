"""Independent twins for the REAL PNG codec (ops.multimodal.encode_png /
decode_png_bytes / decode_png): chunk-frame golden checks against the
spec's byte layout, a brute-force pixel recompute across sizes, proof
that all five scanline filters (None/Sub/Up/Average/Paeth) are actually
present in the encoded stream AND reconstructed, per-filter
hand-reconstruction twins, CRC / interlace / truncation rejection, and
the distributed mapInPandas round trip."""

import random
import struct
import zlib

import pytest
from pyspark.sql import Row

from manufacturing_data_integration_tool_spark.ops.multimodal import (
    _paeth,
    decode_png,
    decode_png_bytes,
    encode_png,
)


def _px(width, height, seed=3):
    rng = random.Random(seed)
    return [
        (rng.randrange(256), rng.randrange(256), rng.randrange(256))
        for _ in range(width * height)
    ]


def _chunks(data):
    """Walk (type, payload) pairs off a PNG byte string."""
    pos, out = 8, []
    while pos + 8 <= len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        typ = data[pos + 4 : pos + 8]
        out.append((typ, data[pos + 8 : pos + 8 + length]))
        pos += 12 + length
    return out


def test_encode_png_chunk_framing_and_header():
    w, h = 6, 5
    data = encode_png(_px(w, h), w, h)
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    chunks = _chunks(data)
    assert [t for t, _ in chunks] == [b"IHDR", b"IDAT", b"IEND"]
    width, height, depth, ctype, comp, filt, interlace = struct.unpack(
        ">IIBBBBB", chunks[0][1]
    )
    assert (width, height, depth, ctype) == (w, h, 8, 2)
    assert (comp, filt, interlace) == (0, 0, 0)
    # every chunk's CRC-32 trailer verifies
    pos = 8
    for typ, payload in chunks:
        end = pos + 8 + len(payload)
        (crc,) = struct.unpack_from(">I", data, end)
        assert zlib.crc32(typ + payload) & 0xFFFFFFFF == crc
        pos = end + 4


def test_all_five_filter_types_present_and_roundtrip():
    # height 5+ => the encoder's row % 5 cycle emits every filter type;
    # a decoder missing any of them cannot reproduce the brute force
    w, h = 6, 5
    px = _px(w, h, seed=11)
    data = encode_png(px, w, h)
    raw = zlib.decompress(_chunks(data)[1][1])
    stride = 3 * w
    filters = [raw[r * (1 + stride)] for r in range(h)]
    assert filters == [0, 1, 2, 3, 4]
    got = decode_png_bytes(data)
    assert got["sum_r"] == sum(p[0] for p in px)
    assert got["sum_g"] == sum(p[1] for p in px)
    assert got["sum_b"] == sum(p[2] for p in px)
    assert got["wsum_r"] == sum((k + 1) * p[0] for k, p in enumerate(px))


@pytest.mark.parametrize("w,h", [(1, 1), (6, 8), (3, 7), (16, 11), (2, 2)])
def test_decode_roundtrip_matches_brute_force(w, h):
    px = _px(w, h, seed=w * 31 + h)
    got = decode_png_bytes(encode_png(px, w, h))
    assert (got["width"], got["height"], got["n_px"]) == (w, h, w * h)
    assert got["sum_r"] == sum(p[0] for p in px)
    assert got["sum_g"] == sum(p[1] for p in px)
    assert got["sum_b"] == sum(p[2] for p in px)
    assert got["wsum_r"] == sum((k + 1) * p[0] for k, p in enumerate(px))


@pytest.mark.parametrize("ft", [0, 1, 2, 3, 4])
def test_single_filter_hand_built_stream(ft):
    # hand-build a 2-row PNG where BOTH rows carry one fixed filter type
    # and reconstruct with an independent straight-from-the-spec loop —
    # pins each filter's decode arithmetic in isolation
    w, h = 4, 2
    px = _px(w, h, seed=17 + ft)
    stride = 3 * w
    flat = [c for p in px for c in p]
    raw = bytearray()
    prev = [0] * stride
    for row in range(h):
        cur = flat[row * stride : (row + 1) * stride]
        raw.append(ft)
        for i in range(stride):
            left = cur[i - 3] if i >= 3 else 0
            up = prev[i]
            upleft = prev[i - 3] if i >= 3 else 0
            pred = (
                0 if ft == 0
                else left if ft == 1
                else up if ft == 2
                else (left + up) // 2 if ft == 3
                else _paeth(left, up, upleft)
            )
            raw.append((cur[i] - pred) % 256)
        prev = cur

    def chunk(typ, payload):
        return (
            struct.pack(">I", len(payload)) + typ + payload
            + struct.pack(">I", zlib.crc32(typ + payload) & 0xFFFFFFFF)
        )

    data = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )
    got = decode_png_bytes(data)
    assert got["sum_r"] == sum(p[0] for p in px)
    assert got["wsum_r"] == sum((k + 1) * p[0] for k, p in enumerate(px))


def test_multiple_idat_chunks_are_concatenated():
    # the IDAT stream may be split at any byte boundary (PNG spec §5.6)
    w, h = 6, 5
    px = _px(w, h, seed=23)
    data = encode_png(px, w, h)
    chunks = _chunks(data)
    idat = chunks[1][1]
    cut = len(idat) // 2

    def chunk(typ, payload):
        return (
            struct.pack(">I", len(payload)) + typ + payload
            + struct.pack(">I", zlib.crc32(typ + payload) & 0xFFFFFFFF)
        )

    split = (
        data[:8]
        + chunk(b"IHDR", chunks[0][1])
        + chunk(b"IDAT", idat[:cut])
        + chunk(b"IDAT", idat[cut:])
        + chunk(b"IEND", b"")
    )
    assert decode_png_bytes(split) == decode_png_bytes(data)


def test_rejects_garbage_crc_interlace_and_truncation():
    with pytest.raises(ValueError):
        decode_png_bytes(b"not a png at all")
    good = encode_png(_px(6, 5), 6, 5)
    # flip one IDAT byte: CRC must catch it
    bad = bytearray(good)
    bad[8 + 25 + 8 + 4] ^= 0xFF  # inside IDAT payload
    with pytest.raises(ValueError, match="CRC"):
        decode_png_bytes(bytes(bad))
    # interlaced header must be rejected, not mis-decoded
    ihdr = struct.pack(">IIBBBBB", 6, 5, 8, 2, 0, 0, 1)
    crc = struct.pack(">I", zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF)
    interlaced = (
        good[:8]
        + struct.pack(">I", len(ihdr)) + b"IHDR" + ihdr + crc
        + good[8 + 25 :]
    )
    with pytest.raises(ValueError, match="interlaced"):
        decode_png_bytes(interlaced)
    # truncated scanline stream must be rejected
    with pytest.raises(ValueError):
        decode_png_bytes(good[: len(good) - 20])
    # unsupported color type (grayscale)
    ihdr_g = struct.pack(">IIBBBBB", 6, 5, 8, 0, 0, 0, 0)
    crc_g = struct.pack(">I", zlib.crc32(b"IHDR" + ihdr_g) & 0xFFFFFFFF)
    gray = (
        good[:8]
        + struct.pack(">I", len(ihdr_g)) + b"IHDR" + ihdr_g + crc_g
        + good[8 + 25 :]
    )
    with pytest.raises(ValueError, match="unsupported"):
        decode_png_bytes(gray)
    # corrupt deflate stream must surface as ValueError (the codec's
    # single error contract), not leak zlib.error to the Spark kernel

    def chunk(typ, payload):
        return (
            struct.pack(">I", len(payload)) + typ + payload
            + struct.pack(">I", zlib.crc32(typ + payload) & 0xFFFFFFFF)
        )

    ihdr_ok = struct.pack(">IIBBBBB", 6, 5, 8, 2, 0, 0, 0)
    bad_deflate = (
        good[:8]
        + chunk(b"IHDR", ihdr_ok)
        + chunk(b"IDAT", b"\x00not deflate data")
        + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="deflate"):
        decode_png_bytes(bad_deflate)


def test_decode_png_distributed_matches_local(spark):
    rows, expect = [], {}
    for i in range(4):
        w, h = 6, 5 + i
        payload = encode_png(_px(w, h, seed=i), w, h)
        rows.append(Row(doc_id=i, payload=bytearray(payload)))
        expect[i] = decode_png_bytes(payload)
    out = decode_png(
        spark.createDataFrame(rows, "doc_id bigint, payload binary")
    ).collect()
    assert len(out) == 4
    for r in out:
        e = expect[r["doc_id"]]
        for fld in ("width", "height", "n_px", "sum_r", "sum_g", "sum_b",
                    "wsum_r"):
            assert r[fld] == e[fld]
