"""Independent brute-force twins for the round-10 additions: the WAV
codec (ops.multimodal.encode_wav/decode_wav), lag-1 Granger causality
(ops.timeseries.granger_lag1) and the Pettitt changepoint test
(ops.timeseries.pettitt_test). Driver-scale parity against DuckDB lives
in tools/parity_check.py (q387-q389)."""

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
