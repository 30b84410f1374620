"""Independent brute-force twins for the round-10 additions: the WAV
codec (ops.multimodal.encode_wav/decode_wav), lag-1 Granger causality
(ops.timeseries.granger_lag1), the Pettitt changepoint test
(ops.timeseries.pettitt_test), the AVI container codec
(ops.multimodal.encode_avi/decode_avi), Stuart-Maxwell marginal
homogeneity (ops.evaluation.stuart_maxwell) and the Diebold-Mariano
equal-accuracy test (ops.timeseries.diebold_mariano). Driver-scale
parity against DuckDB lives in tools/parity_check.py (q387-q392)."""

import datetime as dt
import math
import random
import struct

import pytest
from pyspark.sql import Row

from manufacturing_data_integration_tool_spark.ops.multimodal import (
    decode_wav,
    decode_wav_bytes,
    encode_wav,
)
from manufacturing_data_integration_tool_spark.ops.timeseries import (
    granger_lag1,
    pettitt_test,
)


# ---------------------------------------------------------------- WAV --


def _samples(m, seed=7):
    rng = random.Random(seed)
    return [rng.randint(-32768, 32767) for _ in range(m)]


def test_encode_wav_is_a_real_riff_file():
    s = _samples(50)
    data = encode_wav(s, sample_rate=8000)
    assert data[:4] == b"RIFF" and data[8:12] == b"WAVE"
    # canonical 44-byte header: fmt fields at fixed offsets
    assert struct.unpack_from("<H", data, 22)[0] == 1  # channels
    assert struct.unpack_from("<I", data, 24)[0] == 8000  # rate
    assert struct.unpack_from("<H", data, 34)[0] == 16  # bits/sample
    # the sample payload is the little-endian int16 stream, verbatim
    assert data[-100:] == struct.pack("<50h", *s)


def test_decode_wav_matches_brute_force():
    s = _samples(77, seed=3)
    got = decode_wav_bytes(encode_wav(s, sample_rate=16000))
    assert got["sample_rate"] == 16000
    assert got["n_samples"] == 77
    assert got["sum_s"] == sum(s)
    assert got["sum_abs"] == sum(abs(v) for v in s)
    assert got["wsum"] == sum((k + 1) * v for k, v in enumerate(s))


def test_decode_wav_rejects_garbage_and_stereo():
    with pytest.raises(ValueError):
        decode_wav_bytes(b"RIFFxxxxNOPE" + b"\x00" * 64)
    # hand-build a stereo header: flip nchannels to 2
    data = bytearray(encode_wav(_samples(8), sample_rate=8000))
    struct.pack_into("<H", data, 22, 2)
    with pytest.raises(ValueError):
        decode_wav_bytes(bytes(data))


def test_decode_wav_distributed_matches_local(spark):
    rows, expect = [], {}
    for i, m in enumerate([10, 33, 64]):
        s = _samples(m, seed=i)
        payload = encode_wav(s, sample_rate=8000)
        rows.append(Row(doc_id=i, payload=bytearray(payload)))
        expect[i] = decode_wav_bytes(payload)
    out = decode_wav(
        spark.createDataFrame(rows, "doc_id bigint, payload binary")
    ).collect()
    assert len(out) == 3
    for r in out:
        e = expect[r["doc_id"]]
        for fld in ("sample_rate", "n_samples", "sum_s", "sum_abs", "wsum"):
            assert r[fld] == e[fld], (r["doc_id"], fld)


# ------------------------------------------------------------- Granger --


def _brute_granger(ys, xs):
    """Pure-Python partial-correlation recompute on the lag pairs."""
    z = ys[1:]
    a = ys[:-1]
    b = xs[:-1]
    m = len(z)

    def corr(u, v):
        su, sv = sum(u), sum(v)
        cuv = m * sum(x * y for x, y in zip(u, v)) - su * sv
        cuu = m * sum(x * x for x in u) - su * su
        cvv = m * sum(x * x for x in v) - sv * sv
        return cuv / math.sqrt(cuu * cvv)

    r_za, r_zb, r_ab = corr(z, a), corr(z, b), corr(a, b)
    rp = (r_zb - r_za * r_ab) / math.sqrt(
        (1 - r_za**2) * (1 - r_ab**2)
    )
    f = rp * rp * (m - 3) / (1 - rp * rp)
    return m, rp, f


def _daily_rows(ys, xs):
    d0 = dt.date(2021, 1, 1)
    return [
        Row(d=d0 + dt.timedelta(days=t), y=ys[t], x=xs[t])
        for t in range(len(ys))
    ]


def test_granger_lag1_matches_brute_force(spark):
    rng = random.Random(11)
    # x genuinely leads y: y_t = x_{t-1} + noise
    xs = [rng.randint(50, 150) for _ in range(120)]
    ys = [rng.randint(0, 20)] + [
        3 * xs[t - 1] + rng.randint(-10, 10) for t in range(1, 120)
    ]
    out = granger_lag1(
        spark.createDataFrame(_daily_rows(ys, xs)), "d", "y", "x"
    ).collect()[0]
    m, rp, f = _brute_granger(ys, xs)
    assert out["n_pairs"] == m
    assert abs(out["r_partial_x1e6"] - math.floor(rp * 1e6 + 0.5)) <= 1
    assert abs(out["f_x1e6"] - math.floor(f * 1e6 + 0.5)) <= 2
    # and the causal direction is detected: F should be large
    assert out["f_x1e6"] > 10_000_000


def test_granger_lag1_null_cases(spark):
    # constant predictor -> zero variance -> NULL stats
    rows = _daily_rows([5] * 20, [k for k in range(20)])
    row = granger_lag1(spark.createDataFrame(rows), "d", "y", "x").collect()[0]
    assert row["r_partial_x1e6"] is None and row["f_x1e6"] is None
    # too short (m < 4)
    rows = _daily_rows([1, 5, 2, 9], [4, 1, 3, 2])[:4]
    row = granger_lag1(spark.createDataFrame(rows), "d", "y", "x").collect()[0]
    assert row["n_pairs"] == 3 and row["f_x1e6"] is None


# ------------------------------------------------------------- Pettitt --


def _brute_pettitt(xs):
    n = len(xs)

    def sign(v):
        return (v > 0) - (v < 0)

    best_k, best_t = -1, None
    for t in range(1, n):
        u = sum(
            sign(xs[i] - xs[j]) for i in range(t) for j in range(t, n)
        )
        if abs(u) > best_k:
            best_k, best_t = abs(u), t
    return best_t, best_k


def test_pettitt_matches_brute_force_with_ties_and_shift(spark):
    rng = random.Random(23)
    # level shift at t=60, coarse lattice to force ties
    xs = [rng.randint(10, 20) for _ in range(60)] + [
        rng.randint(16, 26) for _ in range(55)
    ]
    d0 = dt.date(2022, 3, 1)
    rows = [
        Row(d=d0 + dt.timedelta(days=t), x=xs[t]) for t in range(len(xs))
    ]
    out = pettitt_test(spark.createDataFrame(rows), "d", "x").collect()[0]
    t_star, k = _brute_pettitt(xs)
    n = len(xs)
    assert out["n_days"] == n
    assert out["k_stat"] == k
    assert out["t_star"] == t_star
    stat = 6.0 * k * k / (n**3 + n**2)
    assert out["stat_x1e6"] == math.floor(stat * 1e6 + 0.5)
    # the located change is near the planted shift
    assert 45 <= out["t_star"] <= 75


def test_pettitt_degenerate(spark):
    one = spark.createDataFrame([Row(d=dt.date(2022, 1, 1), x=7)])
    row = pettitt_test(one, "d", "x").collect()[0]
    assert row["k_stat"] is None and row["stat_x1e6"] is None
    empty = spark.createDataFrame([], "d date, x long")
    row = pettitt_test(empty, "d", "x").collect()[0]
    assert row["n_days"] == 0 and row["k_stat"] is None


# ----------------------------------------------------------------- AVI --


from manufacturing_data_integration_tool_spark.ops.multimodal import (  # noqa: E402
    decode_avi,
    decode_avi_bytes,
    encode_avi,
)
from manufacturing_data_integration_tool_spark.ops.evaluation import (  # noqa: E402
    stuart_maxwell,
)
from manufacturing_data_integration_tool_spark.ops.timeseries import (  # noqa: E402
    diebold_mariano,
)


def _frames(n, w, h, seed=5):
    rng = random.Random(seed)
    return [bytes(rng.randrange(256) for _ in range(w * h)) for _ in range(n)]


def test_avi_roundtrip_matches_brute_force():
    for n, w, h in [(1, 5, 3), (4, 5, 3), (3, 4, 4), (2, 1, 1)]:
        fr = _frames(n, w, h, seed=n + w)
        got = decode_avi_bytes(encode_avi(fr, w, h))
        assert (got["width"], got["height"], got["n_frames"]) == (w, h, n)
        assert got["sum_all"] == sum(sum(f) for f in fr)
        assert got["wsum_frame"] == sum(
            (i + 1) * sum(f) for i, f in enumerate(fr)
        )


def test_avi_odd_frame_chunks_are_padded_and_walked():
    # 15-byte frames -> odd chunk sizes -> the RIFF pad byte matters:
    # a walker that forgets padding misparses the NEXT chunk header
    fr = _frames(4, 5, 3, seed=9)
    data = encode_avi(fr, 5, 3)
    # pad bytes present: each 00db chunk occupies 8 + 15 + 1 bytes
    assert data.count(b"00db") == 4
    got = decode_avi_bytes(data)
    assert got["n_frames"] == 4


def test_avi_rec_grouping_lists_are_transparent():
    # common muxers wrap interleaved frames in LIST 'rec ' groups under
    # movi; the walker must treat their 00db/00dc children as movi
    # frames (r10 ADVICE) — rebuild an encode_avi payload with every
    # frame chunk wrapped in its own rec list and expect identical
    # aggregates
    fr = _frames(3, 4, 4, seed=13)
    base = decode_avi_bytes(encode_avi(fr, 4, 4))

    def chunk(fourcc, payload):
        return (
            fourcc
            + struct.pack("<I", len(payload))
            + payload
            + (b"\x00" if len(payload) % 2 else b"")
        )

    def lst(listtype, payload):
        return chunk(b"LIST", listtype + payload)

    plain = encode_avi(fr, 4, 4)
    movi_at = plain.index(b"LIST" + struct.pack(
        "<I", struct.unpack_from(
            "<I", plain, plain.index(b"movi") - 4)[0]) + b"movi")
    head = plain[12:movi_at]  # hdrl (skip RIFF header)
    movi = lst(b"movi", b"".join(
        lst(b"rec ", chunk(b"00db", bytes(f))) for f in fr))
    body = b"AVI " + head + movi
    wrapped = b"RIFF" + struct.pack("<I", len(body)) + body
    got = decode_avi_bytes(wrapped)
    assert got == base
    # a rec list NOT under movi must still not contribute frames
    stray = lst(b"rec ", chunk(b"00db", bytes(fr[0])))
    body2 = b"AVI " + head + stray + movi
    wrapped2 = b"RIFF" + struct.pack("<I", len(body2)) + body2
    assert decode_avi_bytes(wrapped2) == base


def test_avi_rejects_garbage_and_frame_count_mismatch():
    with pytest.raises(ValueError):
        decode_avi_bytes(b"RIFF\x10\x00\x00\x00WAVExxxxxxxx")
    good = bytearray(encode_avi(_frames(2, 5, 3), 5, 3))
    # corrupt dwTotalFrames inside avih (offset: find 'avih' + 8 + 16)
    at = bytes(good).index(b"avih") + 8 + 16
    struct.pack_into("<I", good, at, 9)
    with pytest.raises(ValueError):
        decode_avi_bytes(bytes(good))


def test_decode_avi_distributed_matches_local(spark):
    rows, expect = [], {}
    for i in range(3):
        fr = _frames(2 + i, 5, 3, seed=i)
        payload = encode_avi(fr, 5, 3)
        rows.append(Row(doc_id=i, payload=bytearray(payload)))
        expect[i] = decode_avi_bytes(payload)
    out = decode_avi(
        spark.createDataFrame(rows, "doc_id bigint, payload binary")
    ).collect()
    assert len(out) == 3
    for r in out:
        e = expect[r["doc_id"]]
        for fld in ("width", "height", "n_frames", "sum_all", "wsum_frame"):
            assert r[fld] == e[fld]


# -------------------------------------------------------- Stuart-Maxwell --


def test_stuart_maxwell_matches_brute_force(spark):
    rng = random.Random(31)
    cats = ("a", "b", "c")
    # biased classifier: over-calls 'a'
    rows = []
    for _ in range(400):
        t = rng.choice(cats)
        p = "a" if rng.random() < 0.25 else rng.choice(cats)
        rows.append(Row(t=t, p=p))
    out = stuart_maxwell(
        spark.createDataFrame(rows), "t", "p", cats
    ).collect()[0]
    # brute force
    n = {(a, b): 0 for a in cats for b in cats}
    for r in rows:
        n[(r["t"], r["p"])] += 1
    row = {a: sum(n[(a, b)] for b in cats) for a in cats}
    col = {b: sum(n[(a, b)] for a in cats) for b in cats}
    d1, d2 = row["a"] - col["a"], row["b"] - col["b"]
    s11 = row["a"] + col["a"] - 2 * n[("a", "a")]
    s22 = row["b"] + col["b"] - 2 * n[("b", "b")]
    s12 = -(n[("a", "b")] + n[("b", "a")])
    chi2 = (d1 * d1 * s22 - 2 * d1 * d2 * s12 + d2 * d2 * s11) / (
        s11 * s22 - s12 * s12
    )
    assert out["n_obs"] == 400
    assert out["d1"] == d1 and out["d2"] == d2
    assert out["chi2_x1e6"] == math.floor(chi2 * 1e6 + 0.5)
    assert out["chi2_x1e6"] > 5_991_465  # chi2_{2,0.95}: the bias is detected


def test_stuart_maxwell_degenerate(spark):
    # perfect agreement: off-diagonals empty -> det = 0 -> NULL
    rows = [Row(t=c, p=c) for c in ("a", "b", "c") for _ in range(5)]
    out = stuart_maxwell(
        spark.createDataFrame(rows), "t", "p", ("a", "b", "c")
    ).collect()[0]
    assert out["n_obs"] == 15 and out["chi2_x1e6"] is None
    # rows outside the trio are excluded
    rows.append(Row(t="x", p="a"))
    out = stuart_maxwell(
        spark.createDataFrame(rows), "t", "p", ("a", "b", "c")
    ).collect()[0]
    assert out["n_obs"] == 15


# ------------------------------------------------------- Diebold-Mariano --


def test_diebold_mariano_matches_brute_force(spark):
    rng = random.Random(41)
    # strongly weekly-seasonal series: seasonal-naive should win
    xs = [
        100_000 + 40_000 * ((t % 7) in (0, 6)) + rng.randint(-3000, 3000)
        for t in range(150)
    ]
    d0 = dt.date(2023, 1, 2)
    rows = [
        Row(d=d0 + dt.timedelta(days=t), x=xs[t]) for t in range(len(xs))
    ]
    out = diebold_mariano(
        spark.createDataFrame(rows), "d", "x", season=7, err_lattice=100
    ).collect()[0]
    ds = []
    for t in range(7, len(xs)):
        e1 = math.floor((xs[t] - xs[t - 7]) / 100.0)
        e2 = math.floor((xs[t] - xs[t - 1]) / 100.0)
        ds.append(e1 * e1 - e2 * e2)
    n = len(ds)
    sd = sum(ds)
    varnum = n * sum(d * d for d in ds) - sd * sd
    dm = sd * math.sqrt((n - 1) / varnum)
    assert out["n_pairs"] == n
    assert out["sum_d"] == sd
    assert abs(out["dm_x1e6"] - math.floor(dm * 1e6 + 0.5)) <= 1
    # seasonal-naive wins decisively on a seasonal series
    assert out["dm_x1e6"] < -1_960_000


def test_diebold_mariano_degenerate(spark):
    # constant series: both forecasters are exact -> zero variance -> NULL
    d0 = dt.date(2023, 1, 2)
    rows = [Row(d=d0 + dt.timedelta(days=t), x=500) for t in range(30)]
    out = diebold_mariano(spark.createDataFrame(rows), "d", "x").collect()[0]
    assert out["n_pairs"] == 23 and out["dm_x1e6"] is None
