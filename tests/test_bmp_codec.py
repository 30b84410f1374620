"""Independent twins for the REAL BMP codec (ops.multimodal.encode_bmp /
decode_bmp_bytes / decode_bmp): byte-level golden checks against
hand-computed header fields, a brute-force pixel recompute, the
top-down (negative biHeight) variant the synthesizer never emits, and
the distributed mapInPandas round trip."""

import struct

import pytest
from pyspark.sql import Row

from manufacturing_data_integration_tool_spark.ops.multimodal import (
    decode_bmp,
    decode_bmp_bytes,
    encode_bmp,
)


def _px(width, height, seed=3):
    return [
        ((seed * k + 7) % 256, (2 * k + 1) % 256, (5 * k + 11) % 256)
        for k in range(width * height)
    ]


def test_encode_bmp_header_and_padding_bytes():
    w, h = 7, 2  # stride 21 -> padded to 24
    data = encode_bmp(_px(w, h), w, h)
    assert data[:2] == b"BM"
    assert struct.unpack_from("<I", data, 2)[0] == len(data) == 54 + 24 * h
    assert struct.unpack_from("<I", data, 10)[0] == 54  # bfOffBits
    hdr, width, height = struct.unpack_from("<Iii", data, 14)
    assert (hdr, width, height) == (40, w, h)
    planes, bpp, comp = struct.unpack_from("<HHI", data, 26)
    assert (planes, bpp, comp) == (1, 24, 0)
    # padding bytes are zero at the end of each 24-byte scanline
    for row in range(h):
        assert data[54 + row * 24 + 21 : 54 + (row + 1) * 24] == b"\x00\x00\x00"
    # bottom-up + BGR: the FIRST stored pixel is logical pixel (h-1, 0)
    r, g, b = _px(w, h)[(h - 1) * w]
    assert data[54 : 54 + 3] == bytes((b, g, r))


@pytest.mark.parametrize("w,h", [(7, 3), (4, 5), (1, 1), (3, 2)])
def test_decode_roundtrip_matches_brute_force(w, h):
    px = _px(w, h, seed=w + h)
    got = decode_bmp_bytes(encode_bmp(px, w, h))
    assert (got["width"], got["height"], got["n_px"]) == (w, h, w * h)
    assert got["sum_r"] == sum(p[0] for p in px)
    assert got["sum_g"] == sum(p[1] for p in px)
    assert got["sum_b"] == sum(p[2] for p in px)
    assert got["wsum_r"] == sum((k + 1) * p[0] for k, p in enumerate(px))


def test_decode_top_down_variant():
    # negative biHeight = top-down scanlines; hand-build it and check the
    # positional checksum still refers to the logical top-left order
    w, h = 3, 2
    px = _px(w, h, seed=9)
    bottom_up = encode_bmp(px, w, h)
    # flip to top-down: negate height, reorder scanlines
    stride = (w * 3 + 3) // 4 * 4
    body = bottom_up[54:]
    rows = [body[i * stride : (i + 1) * stride] for i in range(h)]
    top_down = (
        bottom_up[:14]
        + struct.pack("<Iii", 40, w, -h)
        + bottom_up[26:54]
        + b"".join(reversed(rows))
    )
    assert decode_bmp_bytes(top_down) == decode_bmp_bytes(bottom_up)


def test_decode_rejects_garbage_and_wrong_variants():
    with pytest.raises(ValueError):
        decode_bmp_bytes(b"not a bitmap at all, nope")
    good = encode_bmp(_px(2, 2), 2, 2)
    with pytest.raises(ValueError):  # 8 bpp
        decode_bmp_bytes(good[:28] + struct.pack("<H", 8) + good[30:])
    with pytest.raises(ValueError):  # truncated body
        decode_bmp_bytes(good[:-4])


def test_decode_bmp_distributed_matches_local(spark):
    rows = []
    expect = {}
    for i, (w, h) in enumerate([(7, 1), (7, 4), (5, 3)]):
        px = _px(w, h, seed=i + 2)
        rows.append(Row(doc_id=i, payload=bytearray(encode_bmp(px, w, h))))
        expect[i] = decode_bmp_bytes(encode_bmp(px, w, h))
    out = decode_bmp(
        spark.createDataFrame(rows, "doc_id bigint, payload binary")
    ).collect()
    assert len(out) == 3
    for r in out:
        e = expect[r["doc_id"]]
        for fld in ("width", "height", "n_px", "sum_r", "sum_g", "sum_b", "wsum_r"):
            assert r[fld] == e[fld], (r["doc_id"], fld)
