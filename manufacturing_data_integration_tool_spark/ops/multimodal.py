"""Multimodal column handling: opaque binary payloads + typed metadata.

Greenfield LLM-pipeline capability (SURVEY.md §7.0). The pattern at 100 TB:

* media lives in a ``binary`` column (or a pointer column to object
  storage) with a typed metadata struct beside it — Spark shuffles/spills
  binary columns fine as long as per-row payloads stay well under the
  2 GB array limit;
* decode / feature-extraction runs as Arrow-batched ``mapInPandas`` so the
  Python boundary is crossed per-batch, not per-row, and the cluster
  parallelism is the partition count;
* this container has no image/audio codecs, so the generic decode kernel is
  STUBBED (deterministic fake, clearly marked) — the Spark-side plumbing
  (schema, partitioning, UDF signature, batch shape) is real and tested.
  Exceptions: 24-bit uncompressed BMP, 16-bit PCM WAV, and the RIFF/AVI
  container need no external library, so ``encode_bmp``/``decode_bmp``,
  ``encode_wav``/``decode_wav`` and ``encode_avi``/``decode_avi`` at the
  bottom of this module are REAL codec pairs (image, audio, video
  container) running through the same Arrow-batched kernel shape.
"""

from __future__ import annotations

from typing import Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

__all__ = [
    "media_schema",
    "assemble_multimodal",
    "decode_binary_column",
    "extract_features",
    "resize_media",
    "sample_frames",
    "encode_bmp",
    "decode_bmp_bytes",
    "decode_bmp",
    "encode_png",
    "decode_png_bytes",
    "decode_png",
    "encode_wav",
    "decode_wav_bytes",
    "decode_wav",
    "encode_avi",
    "decode_avi_bytes",
    "decode_avi",
]


def media_schema() -> T.StructType:
    """Canonical multimodal row: payload + typed metadata + embedding."""
    return T.StructType(
        [
            T.StructField("payload", T.BinaryType()),
            T.StructField(
                "meta",
                T.StructType(
                    [
                        T.StructField("media_type", T.StringType()),
                        T.StructField("n_bytes", T.LongType()),
                        T.StructField("lang", T.StringType()),
                        T.StructField("source", T.StringType()),
                    ]
                ),
            ),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
        ]
    )


def assemble_multimodal(
    documents: DataFrame,
    embeddings: DataFrame,
    *,
    doc_id: str = "doc_id",
    vec_id: str = "vec_id",
) -> DataFrame:
    """Join text + metadata + embedding into one multimodal frame.

    The join key is the document id; the embedding side is typically the
    smaller projection (id + vector), and the join is a plain equi-join
    Catalyst can broadcast or shuffle as sizes dictate. The payload column
    here encodes the text as binary — standing in for image/audio bytes.
    """
    emb = embeddings.select(F.col(vec_id).alias(doc_id), F.col("embedding"), F.col("label"))
    joined = documents.join(emb, doc_id, "inner")
    return joined.select(
        F.col(doc_id),
        F.struct(
            F.encode(F.col("text"), "UTF-8").alias("payload"),
            F.struct(
                F.lit("text/plain").alias("media_type"),
                F.length(F.col("text")).cast("long").alias("n_bytes"),
                F.col("lang"),
                F.col("source"),
            ).alias("meta"),
            F.col("embedding"),
        ).alias("media"),
        F.col("label"),
    )


def _require_stub_codecs(real_codecs: bool, what: str) -> None:
    """Fail fast on the DRIVER, at plan-build time: raising inside the
    Arrow kernel would surface as an executor task failure at action time
    (and partitions with zero batches would never raise at all)."""
    if real_codecs:
        raise NotImplementedError(
            f"real {what} requires media codecs not present in this "
            "environment; pass real_codecs=False for the deterministic stub"
        )


def decode_binary_column(
    df: DataFrame,
    *,
    media_col: str = "media",
    id_col: str = "doc_id",
    real_codecs: bool = False,
) -> DataFrame:
    """Decode/feature-extract media payloads via Arrow-batched mapInPandas.

    The kernel signature and batch shape are production-real; the decode
    itself is a STUB: ``real_codecs=True`` raises ``NotImplementedError``
    eagerly (no image/audio libraries in this container), otherwise it
    emits a deterministic fake (payload byte-sum as the "feature", fixed
    64x64 "dimensions") so the distributed plumbing is testable end-to-end.
    The id column keeps its input name in the output schema.
    """
    _require_stub_codecs(real_codecs, "media decoding")
    flat = df.select(
        F.col(id_col),
        F.col(f"{media_col}.payload").alias("payload"),
        F.col(f"{media_col}.meta.media_type").alias("media_type"),
    )
    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("media_type", T.StringType()),
            T.StructField("n_bytes", T.LongType()),
            T.StructField("feature_hash", T.LongType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
        ]
    )

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].astype("int64"),
                    "media_type": pdf["media_type"],
                    "n_bytes": payloads.map(len).astype("int64"),
                    # deterministic fake feature: byte sum
                    "feature_hash": payloads.map(lambda b: int(sum(b))).astype("int64"),
                    "width": 64,
                    "height": 64,
                }
            )

    return flat.mapInPandas(kernel, schema=schema)


def extract_features(
    df: DataFrame,
    *,
    media_col: str = "media",
    dim: int = 8,
    real_codecs: bool = False,
) -> DataFrame:
    """Append a feature vector per media payload via a scalar Pandas UDF.

    This is the vectorized-scalar path (``@pandas_udf`` on one column, Arrow
    batch in / Arrow batch out) — the right shape when features attach to
    existing rows, vs ``mapInPandas`` when the output relation changes. The
    featurizer is a STUB: a normalized byte-value histogram standing in for
    a real image/audio encoder (deterministic, so tests and oracles can pin
    it); ``real_codecs=True`` raises ``NotImplementedError``.
    """
    from pyspark.sql.functions import pandas_udf

    _require_stub_codecs(real_codecs, "feature extraction")

    @pandas_udf(T.ArrayType(T.FloatType()))
    def featurize(payloads: pd.Series) -> pd.Series:
        import numpy as np

        def hist(b) -> list:
            if b is None or len(b) == 0:
                return [0.0] * dim
            arr = np.frombuffer(bytes(b), dtype=np.uint8)
            counts = np.bincount(arr % dim, minlength=dim).astype("float32")
            return (counts / counts.sum()).tolist()

        return pd.Series([hist(b) for b in payloads])

    return df.withColumn("features", featurize(F.col(f"{media_col}.payload")))


def resize_media(
    df: DataFrame,
    *,
    media_col: str = "media",
    id_col: str = "doc_id",
    target_bytes: int = 256,
    real_codecs: bool = False,
) -> DataFrame:
    """Resize payloads to a fixed byte budget via mapInPandas (binary in,
    binary out) — the batch-transform shape of a real image resize.

    STUB kernel: truncate-or-zero-pad to ``target_bytes`` (deterministic);
    a real deployment swaps in an actual resampler per Arrow batch. The
    output keeps the multimodal struct shape with updated ``n_bytes`` so
    downstream operators are agnostic to whether a resize ran; the id
    column keeps its input name.
    """
    _require_stub_codecs(real_codecs, "media resizing")
    flat = df.select(
        F.col(id_col),
        F.col(f"{media_col}.payload").alias("payload"),
        F.col(f"{media_col}.meta.media_type").alias("media_type"),
    )
    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("media_type", T.StringType()),
            T.StructField("payload", T.BinaryType()),
            T.StructField("n_bytes", T.LongType()),
        ]
    )

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            def fit(b) -> bytes:
                b = bytes(b or b"")
                return b[:target_bytes] if len(b) >= target_bytes else b + b"\x00" * (
                    target_bytes - len(b)
                )

            out = pdf["payload"].map(fit)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].astype("int64"),
                    "media_type": pdf["media_type"],
                    "payload": out,
                    "n_bytes": out.map(len).astype("int64"),
                }
            )

    return flat.mapInPandas(kernel, schema=schema)


def sample_frames(
    df: DataFrame,
    *,
    media_col: str = "media",
    id_col: str = "doc_id",
    frame_bytes: int = 64,
    every_n: int = 4,
    real_codecs: bool = False,
) -> DataFrame:
    """Sample every n-th fixed-size frame from each payload — the 1-to-N
    mapInPandas shape of video frame extraction (one input row fans out to
    multiple frame rows inside the same Arrow batch; no explode/shuffle).

    STUB framing: the payload is treated as concatenated ``frame_bytes``
    chunks; a real deployment demuxes with an actual codec. Frame indices
    are global per doc so downstream dedup/similarity over frames keys on
    (id, frame_idx) deterministically; the id column keeps its input name.
    """
    _require_stub_codecs(real_codecs, "frame sampling")
    flat = df.select(F.col(id_col), F.col(f"{media_col}.payload").alias("payload"))
    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("frame", T.BinaryType()),
        ]
    )

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            ids, idxs, frames = [], [], []
            for doc, payload in zip(pdf[id_col], pdf["payload"]):
                b = bytes(payload or b"")
                n_frames = len(b) // frame_bytes
                for i in range(0, n_frames, every_n):
                    ids.append(int(doc))
                    idxs.append(i)
                    frames.append(b[i * frame_bytes : (i + 1) * frame_bytes])
            yield pd.DataFrame(
                {id_col: pd.Series(ids, dtype="int64"),
                 "frame_idx": pd.Series(idxs, dtype="int32"),
                 "frame": frames}
            )

    return flat.mapInPandas(kernel, schema=schema)


# ---------------------------------------------------------------------------
# Real codec path: uncompressed 24-bit BMP (no external library needed)
# ---------------------------------------------------------------------------
#
# The container ships no image/audio codecs, so decode_binary_column /
# extract_features stub their kernels. BMP (BITMAPINFOHEADER, 24 bpp,
# BI_RGB) needs only the stdlib: a 14-byte file header, a 40-byte info
# header, then bottom-up scanlines of BGR triples padded to 4-byte
# boundaries. encode_bmp/decode_bmp below are REAL codecs for that
# format — the decode walks the actual header offsets, stride padding,
# scanline direction (bottom-up for positive biHeight, top-down for
# negative) and BGR channel order, so a parser bug changes the published
# numbers. This retires the "plumbing real, kernel stubbed" caveat for
# one honest format while the Arrow-batched mapInPandas shape stays
# identical to the stubbed kernels above.


def encode_bmp(pixels: list, width: int, height: int) -> bytes:
    """Pack row-major top-left-origin RGB tuples into a real BMP file
    (24-bit uncompressed, positive biHeight => bottom-up scanlines,
    stride padded to 4 bytes). Pure stdlib; the inverse of decode_bmp."""
    import struct

    if len(pixels) != width * height:
        raise ValueError(f"need {width * height} pixels, got {len(pixels)}")
    stride = (width * 3 + 3) // 4 * 4
    img_size = stride * height
    off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", off + img_size, 0, 0, off)
    info = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, img_size, 2835, 2835, 0, 0
    )
    rows = []
    pad = b"\x00" * (stride - width * 3)
    for row in range(height - 1, -1, -1):  # bottom-up storage order
        line = bytearray()
        for col in range(width):
            r, g, b = pixels[row * width + col]
            line += bytes((b & 0xFF, g & 0xFF, r & 0xFF))  # BGR on disk
        rows.append(bytes(line) + pad)
    return header + info + b"".join(rows)


def decode_bmp_bytes(data: bytes) -> dict:
    """Parse one 24-bit uncompressed BMP: validate the magic/bpp/
    compression fields, honor bfOffBits, stride padding and scanline
    direction, and return header fields plus exact channel aggregates
    over the LOGICAL top-left row-major pixel order:

    ``sum_r/sum_g/sum_b`` (order-invariant) and ``wsum_r`` =
    sum over pixels of ``(k + 1) * r_k`` with k the logical index —
    the positional checksum that catches a decoder that forgot the
    bottom-up storage order or the BGR byte order."""
    import struct

    if len(data) < 54 or data[:2] != b"BM":
        raise ValueError("not a BMP payload")
    off = struct.unpack_from("<I", data, 10)[0]
    hdr_size, width, height = struct.unpack_from("<Iii", data, 14)
    planes, bpp, compression = struct.unpack_from("<HHI", data, 26)
    if hdr_size < 40 or bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP variant (bpp={bpp}, comp={compression})")
    bottom_up = height > 0
    height = abs(height)
    stride = (width * 3 + 3) // 4 * 4
    if off + stride * height > len(data):
        raise ValueError("truncated BMP payload")
    sum_r = sum_g = sum_b = wsum_r = 0
    for row in range(height):  # logical rows, top to bottom
        phys = (height - 1 - row) if bottom_up else row
        base = off + phys * stride
        for col in range(width):
            i = base + col * 3
            b, g, r = data[i], data[i + 1], data[i + 2]
            k = row * width + col
            sum_r += r
            sum_g += g
            sum_b += b
            wsum_r += (k + 1) * r
    return {
        "width": width,
        "height": height,
        "n_px": width * height,
        "sum_r": sum_r,
        "sum_g": sum_g,
        "sum_b": sum_b,
        "wsum_r": wsum_r,
    }


def decode_bmp(
    df: DataFrame,
    *,
    payload_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """REAL decode over a binary BMP column via Arrow-batched mapInPandas
    — the production multimodal shape (per-batch Python boundary, scale
    from the partition count) with an actual codec in the kernel. One
    output row per input row: header fields + exact channel aggregates
    (see decode_bmp_bytes)."""
    flat = df.select(F.col(id_col), F.col(payload_col).alias("payload"))
    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("width", T.LongType()),
            T.StructField("height", T.LongType()),
            T.StructField("n_px", T.LongType()),
            T.StructField("sum_r", T.LongType()),
            T.StructField("sum_g", T.LongType()),
            T.StructField("sum_b", T.LongType()),
            T.StructField("wsum_r", T.LongType()),
        ]
    )

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            out = []
            for doc, payload in zip(pdf[id_col], pdf["payload"]):
                rec = decode_bmp_bytes(bytes(payload))
                rec[id_col] = int(doc)
                out.append(rec)
            yield pd.DataFrame(
                out,
                columns=[id_col, "width", "height", "n_px",
                         "sum_r", "sum_g", "sum_b", "wsum_r"],
            )

    return flat.mapInPandas(kernel, schema=schema)


# ---------------------------------------------------------------------------
# Real codec path #4: PNG (zlib inflate + per-scanline filters 0-4)
# ---------------------------------------------------------------------------


def _paeth(a: int, b: int, c: int) -> int:
    """The Paeth predictor (PNG spec §9, filter type 4): pick whichever
    of left/up/up-left is closest to a + b - c, ties left > up > up-left."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def encode_png(pixels: list, width: int, height: int) -> bytes:
    """Pack row-major top-left-origin RGB tuples into a real PNG file
    (8-bit truecolor, non-interlaced) using only stdlib ``struct`` +
    ``zlib``: big-endian chunk framing with CRC-32 trailers, IHDR, one
    zlib-deflated IDAT, IEND. Each scanline is filtered with type
    ``row % 5`` — cycling None/Sub/Up/Average/Paeth — so any decoder
    of this output must implement ALL FIVE filter reconstructions, not
    just the trivial one. Pure stdlib; the inverse of decode_png."""
    import struct
    import zlib

    if len(pixels) != width * height:
        raise ValueError(f"need {width * height} pixels, got {len(pixels)}")

    def chunk(typ: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload))
            + typ
            + payload
            + struct.pack(">I", zlib.crc32(typ + payload) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    raw = bytearray()
    prev = bytes(3 * width)  # conceptual all-zero row above row 0
    for row in range(height):
        cur = bytearray()
        for col in range(width):
            r, g, b = pixels[row * width + col]
            cur += bytes((r & 0xFF, g & 0xFF, b & 0xFF))
        ft = row % 5
        raw.append(ft)
        for i in range(3 * width):
            left = cur[i - 3] if i >= 3 else 0
            up = prev[i]
            upleft = prev[i - 3] if i >= 3 else 0
            if ft == 0:
                v = cur[i]
            elif ft == 1:
                v = (cur[i] - left) % 256
            elif ft == 2:
                v = (cur[i] - up) % 256
            elif ft == 3:
                v = (cur[i] - (left + up) // 2) % 256
            else:
                v = (cur[i] - _paeth(left, up, upleft)) % 256
            raw.append(v)
        prev = bytes(cur)
    sig = b"\x89PNG\r\n\x1a\n"
    return (
        sig
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def decode_png_bytes(data: bytes) -> dict:
    """Parse one PNG for real, stdlib only: validate the 8-byte
    signature, walk the big-endian chunk stream VERIFYING every chunk's
    CRC-32, require 8-bit truecolor (color type 2) with compression 0 /
    filter method 0 and REJECT interlaced images (Adam7 needs a
    different scanline geometry), concatenate + zlib-inflate the IDAT
    stream, then reconstruct every scanline through the full filter
    set — None, Sub, Up, Average (floor of left+up over 2) and the
    Paeth predictor. Returns header fields plus the same exact channel
    aggregates as ``decode_bmp_bytes`` (``sum_r/sum_g/sum_b`` and the
    positional checksum ``wsum_r`` = sum (k+1)*r_k over logical
    top-left row-major order) — wrong under any filter-reconstruction,
    chunk-walk or byte-order bug."""
    import struct
    import zlib

    sig = b"\x89PNG\r\n\x1a\n"
    if len(data) < 8 or data[:8] != sig:
        raise ValueError("not a PNG payload")
    pos = 8
    width = height = None
    idat = bytearray()
    saw_iend = False
    while pos + 8 <= len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        typ = data[pos + 4 : pos + 8]
        payload_end = pos + 8 + length
        if payload_end + 4 > len(data):
            raise ValueError("chunk overruns the payload")
        payload = data[pos + 8 : payload_end]
        (crc,) = struct.unpack_from(">I", data, payload_end)
        if zlib.crc32(typ + payload) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC on {typ!r} chunk")
        if typ == b"IHDR":
            width, height, depth, ctype, comp, filt, interlace = (
                struct.unpack(">IIBBBBB", payload)
            )
            if depth != 8 or ctype != 2:
                raise ValueError(
                    f"unsupported PNG variant (depth={depth}, color={ctype})"
                )
            if comp != 0 or filt != 0:
                raise ValueError("nonstandard compression/filter method")
            if interlace != 0:
                raise ValueError("interlaced (Adam7) PNG not supported")
        elif typ == b"IDAT":
            if width is None:
                raise ValueError("IDAT before IHDR")
            idat += payload
        elif typ == b"IEND":
            saw_iend = True
            break
        pos = payload_end + 4
    if width is None or not saw_iend:
        raise ValueError("missing IHDR or IEND")
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as exc:
        # keep the codec's single ValueError contract — a corrupt
        # deflate stream must not leak zlib.error to the kernel
        raise ValueError(f"corrupt IDAT deflate stream: {exc}") from exc
    stride = 3 * width
    if len(raw) != height * (1 + stride):
        raise ValueError("inflated scanline stream has the wrong length")
    sum_r = sum_g = sum_b = wsum_r = 0
    prev = bytes(stride)
    off = 0
    for row in range(height):
        ft = raw[off]
        off += 1
        line = raw[off : off + stride]
        off += stride
        cur = bytearray(stride)
        for i in range(stride):
            left = cur[i - 3] if i >= 3 else 0
            up = prev[i]
            upleft = prev[i - 3] if i >= 3 else 0
            if ft == 0:
                v = line[i]
            elif ft == 1:
                v = (line[i] + left) % 256
            elif ft == 2:
                v = (line[i] + up) % 256
            elif ft == 3:
                v = (line[i] + (left + up) // 2) % 256
            elif ft == 4:
                v = (line[i] + _paeth(left, up, upleft)) % 256
            else:
                raise ValueError(f"unknown filter type {ft}")
            cur[i] = v
        for col in range(width):
            r, g, b = cur[col * 3], cur[col * 3 + 1], cur[col * 3 + 2]
            k = row * width + col
            sum_r += r
            sum_g += g
            sum_b += b
            wsum_r += (k + 1) * r
        prev = bytes(cur)
    return {
        "width": int(width),
        "height": int(height),
        "n_px": int(width * height),
        "sum_r": sum_r,
        "sum_g": sum_g,
        "sum_b": sum_b,
        "wsum_r": wsum_r,
    }


def decode_png(
    df: DataFrame,
    *,
    payload_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """REAL PNG decode over a binary column via Arrow-batched
    mapInPandas — same production multimodal shape as decode_bmp, with
    the zlib-inflate + filter-reconstruction codec in the kernel."""
    flat = df.select(F.col(id_col), F.col(payload_col).alias("payload"))
    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("width", T.LongType()),
            T.StructField("height", T.LongType()),
            T.StructField("n_px", T.LongType()),
            T.StructField("sum_r", T.LongType()),
            T.StructField("sum_g", T.LongType()),
            T.StructField("sum_b", T.LongType()),
            T.StructField("wsum_r", T.LongType()),
        ]
    )

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            out = []
            for doc, payload in zip(pdf[id_col], pdf["payload"]):
                rec = decode_png_bytes(bytes(payload))
                rec[id_col] = int(doc)
                out.append(rec)
            yield pd.DataFrame(
                out,
                columns=[id_col, "width", "height", "n_px",
                         "sum_r", "sum_g", "sum_b", "wsum_r"],
            )

    return flat.mapInPandas(kernel, schema=schema)


# ---------------------------------------------------------------------------
# Real codec path #2: 16-bit PCM WAV via the stdlib `wave` module
# ---------------------------------------------------------------------------


def encode_wav(samples: list, *, sample_rate: int = 8000) -> bytes:
    """Pack signed 16-bit mono PCM samples into a real RIFF/WAVE file
    using the stdlib ``wave`` writer — the audio twin of encode_bmp."""
    import io
    import struct
    import wave

    buf = io.BytesIO()
    w = wave.open(buf, "wb")
    try:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(struct.pack(f"<{len(samples)}h", *samples))
    finally:
        w.close()
    return buf.getvalue()


def decode_wav_bytes(data: bytes) -> dict:
    """Parse one RIFF/WAVE payload with the stdlib ``wave`` reader (a
    REAL format parser: RIFF chunk walk, fmt validation, frame count
    from the data chunk) and return exact integer aggregates over the
    signed 16-bit mono samples: ``sum_s``, ``sum_abs`` and the
    positional checksum ``wsum = sum (k+1)*s_k`` that catches byte-order
    or frame-offset parser bugs."""
    import io
    import struct
    import wave

    try:
        r = wave.open(io.BytesIO(data), "rb")
    except (wave.Error, EOFError) as exc:
        raise ValueError(f"not a WAV payload: {exc}") from exc
    try:
        if r.getnchannels() != 1 or r.getsampwidth() != 2:
            raise ValueError(
                f"unsupported WAV variant (channels={r.getnchannels()}, "
                f"sampwidth={r.getsampwidth()})"
            )
        n = r.getnframes()
        rate = r.getframerate()
        samples = struct.unpack(f"<{n}h", r.readframes(n))
    finally:
        r.close()
    sum_s = sum_abs = wsum = 0
    for k, s in enumerate(samples):
        sum_s += s
        sum_abs += s if s >= 0 else -s
        wsum += (k + 1) * s
    return {
        "sample_rate": rate,
        "n_samples": n,
        "sum_s": sum_s,
        "sum_abs": sum_abs,
        "wsum": wsum,
    }


def decode_wav(
    df: DataFrame,
    *,
    payload_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """REAL audio decode over a binary WAV column via Arrow-batched
    mapInPandas — same production batch shape as decode_bmp, stdlib
    parser in the kernel. One output row per input row."""
    flat = df.select(F.col(id_col), F.col(payload_col).alias("payload"))
    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("sample_rate", T.LongType()),
            T.StructField("n_samples", T.LongType()),
            T.StructField("sum_s", T.LongType()),
            T.StructField("sum_abs", T.LongType()),
            T.StructField("wsum", T.LongType()),
        ]
    )

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            out = []
            for doc, payload in zip(pdf[id_col], pdf["payload"]):
                rec = decode_wav_bytes(bytes(payload))
                rec[id_col] = int(doc)
                out.append(rec)
            yield pd.DataFrame(
                out,
                columns=[id_col, "sample_rate", "n_samples",
                         "sum_s", "sum_abs", "wsum"],
            )

    return flat.mapInPandas(kernel, schema=schema)


# ---------------------------------------------------------------------------
# Real codec path #3: AVI container (RIFF chunk walk) — video frames
# ---------------------------------------------------------------------------


def encode_avi(frames: list, width: int, height: int, *, fps: int = 10) -> bytes:
    """Pack raw 8-bit gray frames (``width*height`` bytes each) into a
    real minimal RIFF/AVI container: LIST hdrl (avih + LIST strl with a
    'vids'/'DIB ' stream header and a BITMAPINFOHEADER strf) followed by
    LIST movi with one '00db' chunk per frame, every chunk padded to the
    RIFF word boundary. Pure stdlib; the inverse of decode_avi_bytes."""
    import struct

    def chunk(fourcc: bytes, payload: bytes) -> bytes:
        pad = b"\x00" if len(payload) % 2 else b""
        return fourcc + struct.pack("<I", len(payload)) + payload + pad

    def lst(listtype: bytes, payload: bytes) -> bytes:
        return chunk(b"LIST", listtype + payload)

    n = len(frames)
    frame_bytes = width * height
    for f in frames:
        if len(f) != frame_bytes:
            raise ValueError(f"frame must be {frame_bytes} bytes, got {len(f)}")
    avih = struct.pack(
        "<14I",
        1_000_000 // fps,  # dwMicroSecPerFrame
        frame_bytes * fps,  # dwMaxBytesPerSec
        0,  # dwPaddingGranularity
        0x10,  # dwFlags (AVIF_HASINDEX off, interleaved off; 0x10=HASINDEX is
        # conventional but optional — our parser does not require idx1)
        n,  # dwTotalFrames
        0,  # dwInitialFrames
        1,  # dwStreams
        frame_bytes,  # dwSuggestedBufferSize
        width,
        height,
        0, 0, 0, 0,  # dwReserved
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIIIhhhh",
        b"vids", b"DIB ", 0, 0, 0, 0,
        1, fps,  # dwScale / dwRate
        0, n, frame_bytes, 0, 0,
        0, 0, width, height,  # rcFrame
    )
    strf = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 8, 0, frame_bytes,
        2835, 2835, 0, 0,
    )
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi = lst(b"movi", b"".join(chunk(b"00db", bytes(f)) for f in frames))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + __import__("struct").pack("<I", len(body)) + body


def decode_avi_bytes(data: bytes) -> dict:
    """Walk one RIFF/AVI container for real: validate the RIFF/'AVI '
    magic, iterate top-level chunks honoring declared sizes and the
    word-padding rule, read (width, height, dwTotalFrames) out of the
    'avih' header inside LIST hdrl, collect every '00db'/'00dc' frame
    inside LIST movi (including frames wrapped in standard 'rec '
    grouping lists nested under movi), and cross-check the frame count
    against the header. Returns exact aggregates: ``sum_all`` over every frame byte
    and the per-frame positional checksum ``wsum_frame`` =
    sum (f+1) * framesum_f — wrong under any chunk-walk bug that skips,
    splits or reorders frames."""
    import struct

    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not an AVI payload")
    declared = struct.unpack_from("<I", data, 4)[0]
    if declared + 8 > len(data):
        raise ValueError("truncated AVI payload")

    width = height = total = None
    frames: list = []

    def walk(pos: int, end: int, inside: bytes | None) -> None:
        nonlocal width, height, total
        while pos + 8 <= end:
            fourcc = data[pos : pos + 4]
            size = struct.unpack_from("<I", data, pos + 4)[0]
            payload_start = pos + 8
            payload_end = payload_start + size
            if payload_end > end:
                raise ValueError("chunk overruns its parent")
            if fourcc == b"LIST":
                listtype = data[payload_start : payload_start + 4]
                # standard 'rec ' grouping lists nested under movi are
                # transparent: their '00db'/'00dc' children are movi
                # frames (common muxers emit them; r10 ADVICE)
                if listtype == b"rec " and inside == b"movi":
                    listtype = b"movi"
                walk(payload_start + 4, payload_end, listtype)
            elif fourcc == b"avih":
                (total,) = struct.unpack_from("<I", data, payload_start + 16)
                width, height = struct.unpack_from(
                    "<II", data, payload_start + 32
                )
            elif fourcc in (b"00db", b"00dc") and inside == b"movi":
                frames.append(data[payload_start:payload_end])
            pos = payload_end + (size % 2)  # RIFF word padding

    walk(12, 8 + declared, None)
    if width is None or total is None:
        raise ValueError("missing avih header")
    if len(frames) != total:
        raise ValueError(
            f"header declares {total} frames, movi carries {len(frames)}"
        )
    sum_all = wsum_frame = 0
    for f_idx, frame in enumerate(frames):
        fs = sum(frame)
        sum_all += fs
        wsum_frame += (f_idx + 1) * fs
    return {
        "width": int(width),
        "height": int(height),
        "n_frames": len(frames),
        "sum_all": sum_all,
        "wsum_frame": wsum_frame,
    }


def decode_avi(
    df: DataFrame,
    *,
    payload_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """REAL video-container decode over a binary AVI column via
    Arrow-batched mapInPandas — the frame-extraction shape of
    sample_frames with an actual RIFF walker in the kernel."""
    flat = df.select(F.col(id_col), F.col(payload_col).alias("payload"))
    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("width", T.LongType()),
            T.StructField("height", T.LongType()),
            T.StructField("n_frames", T.LongType()),
            T.StructField("sum_all", T.LongType()),
            T.StructField("wsum_frame", T.LongType()),
        ]
    )

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            out = []
            for doc, payload in zip(pdf[id_col], pdf["payload"]):
                rec = decode_avi_bytes(bytes(payload))
                rec[id_col] = int(doc)
                out.append(rec)
            yield pd.DataFrame(
                out,
                columns=[id_col, "width", "height", "n_frames",
                         "sum_all", "wsum_frame"],
            )

    return flat.mapInPandas(kernel, schema=schema)
