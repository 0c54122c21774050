"""Processor / ProcessingChain unit tests, mirroring the reference's
operator-level strategy (tests/test_abstract.py:36-101: tiny literal
inputs, exact expected outputs, chain composition + info propagation)
with numpy as the semantic oracle for the DSP stages.
"""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from dabstract_spark.dataset import Dataset
from dabstract_spark.processing import (
    FFT,
    Aggregation,
    ExpandDims,
    Filterbank,
    FIRFilter,
    Framing,
    Logarithm,
    Normalizer,
    ProcessingChain,
    Resample,
    Scaler,
    Windowing,
)
from dabstract_spark.processing.processors import firwin, mel_filterbank, window_values


def _pylist(x):
    """np array -> plain python floats (createDataFrame rejects np.float64)."""
    return [float(v) for v in x]


def _one_col(spark, values, dtype="array<double>"):
    return spark.createDataFrame([(v,) for v in values], f"x {dtype}")


def _apply(spark, proc_or_chain, values, dtype="array<double>", info=None):
    chain = (
        proc_or_chain
        if isinstance(proc_or_chain, ProcessingChain)
        else ProcessingChain().add(proc_or_chain)
    )
    df = _one_col(spark, values, dtype)
    out = chain.process_df(df, "x", info=info)
    return [r.x for r in out.collect()]


def test_scaler_roundtrip(spark):
    vals = [[1024.0, -2048.0, 0.0]]
    got = _apply(spark, Scaler(type="int16"), vals)
    np.testing.assert_allclose(got[0], np.array(vals[0]) / (2**15 - 1))
    # inverse recovers input
    chain = ProcessingChain().add(Scaler(type="int16"))
    df = _one_col(spark, vals)
    inv = df.withColumn("x", chain.inv_expr(chain.expr("x", {"dtype": "array<double>"}), {"dtype": "array<double>"}))
    np.testing.assert_allclose(inv.collect()[0].x, vals[0], rtol=1e-12)


def test_logarithm_base10_and_inverse(spark):
    vals = [[1.0, 10.0, 100.0]]
    got = _apply(spark, Logarithm(type="base10"), vals)
    np.testing.assert_allclose(got[0], 20 * np.log10(vals[0]))
    chain = ProcessingChain().add(Logarithm(type="base10"))
    info = {"dtype": "array<double>"}
    df = _one_col(spark, vals)
    rt = df.withColumn("x", chain.inv_expr(chain.expr("x", info), info))
    np.testing.assert_allclose(rt.collect()[0].x, vals[0], rtol=1e-12)


def test_windowing_matches_numpy(spark):
    x = np.arange(1.0, 9.0)
    got = _apply(spark, Windowing(window_func="hamming"), [_pylist(x)])
    np.testing.assert_allclose(got[0], x * window_values("hamming", 8, periodic=True), rtol=1e-12)


def test_expand_dims(spark):
    got0 = _apply(spark, ExpandDims(axis=0), [[1.0, 2.0]])
    assert got0[0] == [[1.0, 2.0]]
    got1 = _apply(spark, ExpandDims(axis=-1), [[1.0, 2.0]])
    assert got1[0] == [[1.0], [2.0]]


def test_aggregation_mean_std_kurtosis(spark):
    x = np.array([1.0, 2.0, 3.0, 4.0, 10.0])
    got = _apply(spark, Aggregation(methods=["mean", "std", "kurtosis"]), [_pylist(x)])
    mu, sd = x.mean(), x.std()
    kurt = ((x - mu) ** 4).mean() / ((x - mu) ** 2).mean() ** 2 - 3
    np.testing.assert_allclose(got[0], [mu, sd, kurt], rtol=1e-10)


def test_aggregation_2d_axis0(spark):
    m = np.array([[1.0, 2.0], [3.0, 4.0], [5.0, 9.0]])
    got = _apply(
        spark,
        Aggregation(methods=["mean", "std"], combine="concat"),
        [[_pylist(r) for r in m]],
        dtype="array<array<double>>",
    )
    expect = np.concatenate([m.mean(axis=0), m.std(axis=0)])
    np.testing.assert_allclose(got[0], expect, rtol=1e-10)


def test_normalizer_minmax_fit_transform_inverse(spark):
    vals = [[0.0, 5.0], [10.0, 2.5]]
    df = _one_col(spark, vals)
    proc = Normalizer(type="minmax", feature_range=(0.0, 1.0))
    chain = ProcessingChain().add(proc)
    chain.fit(df, "x")
    assert proc.fitted == {"min": [0.0], "max": [10.0]}
    got = [r.x for r in chain.process_df(df, "x").collect()]
    np.testing.assert_allclose(got, [[0.0, 0.5], [1.0, 0.25]])
    info = {"dtype": "array<double>"}
    rt = df.withColumn("x", chain.inv_expr(chain.expr("x", info), info))
    np.testing.assert_allclose([r.x for r in rt.collect()], vals, rtol=1e-12)


def test_normalizer_standard_global(spark):
    data = np.array([[1.0, 2.0], [3.0, 6.0]])
    df = _one_col(spark, [_pylist(r) for r in data])
    proc = Normalizer(type="standard")
    proc.fit(df, F.col("x"), {"dtype": "array<double>"})
    flat = data.ravel()
    np.testing.assert_allclose(proc.fitted["mean"], [flat.mean()], rtol=1e-12)
    np.testing.assert_allclose(proc.fitted["std"], [flat.std()], rtol=1e-12)


def test_normalizer_2d_per_feature(spark):
    rows = [[[1.0, 10.0], [3.0, 20.0]], [[5.0, 30.0], [7.0, 40.0]]]
    df = _one_col(spark, rows, dtype="array<array<double>>")
    proc = Normalizer(type="minmax")
    proc.fit(df, F.col("x"), {"dtype": "array<array<double>>"})
    assert proc.fitted == {"min": [1.0, 10.0], "max": [7.0, 40.0]}
    out = proc.expr(F.col("x"), {"dtype": "array<array<double>>"})[0]
    got = df.withColumn("x", out).collect()[0].x
    np.testing.assert_allclose(got[0], [0.0, 0.0])
    np.testing.assert_allclose(got[1], [1 / 3, 1 / 3])


def test_fft_magnitude_matches_numpy(spark):
    x = np.sin(np.arange(16) * 0.7) + 0.3
    got = _apply(spark, FFT(type="real", nfft="nextpow2"), [_pylist(x)])
    np.testing.assert_allclose(got[0], np.abs(np.fft.rfft(x, 16)), rtol=1e-10)


def test_fft_nextpow2_padding_and_dc_reset(spark):
    x = np.ones(12)  # nextpow2 -> 16
    got = _apply(spark, FFT(type="real", format="power", dc_reset=True), [_pylist(x)])
    expect = np.abs(np.fft.rfft(x, 16)) ** 2
    expect[0] = 0.0
    assert len(got[0]) == 9
    np.testing.assert_allclose(got[0], expect, rtol=1e-10)


def test_chain_fft_filterbank_log_info_propagation(spark):
    """The canonical audio chain (reference tests/test_abstract.py:36-101
    shape): FFT → Filterbank (nfft flows via chain info) → Logarithm."""
    rng = np.random.default_rng(7)
    x = rng.standard_normal(64)
    chain = (
        ProcessingChain()
        .add(FFT(type="real", format="power"))
        .add(Filterbank(n_bands=4, scale="mel", fs=16000))
        .add(Logarithm(type="base10"))
    )
    got = _apply(spark, chain, [_pylist(x)], info={"fs": 16000, "n_samples": 64})
    spec = np.abs(np.fft.rfft(x, 64)) ** 2
    fb = mel_filterbank(4, 64, 16000, scale="mel")
    expect = spec @ fb.T
    expect = np.where(expect == 0, np.finfo(float).eps, expect)
    expect = 20 * np.log10(expect)
    np.testing.assert_allclose(got[0], expect, rtol=1e-8)


def test_filterbank_nfft_mismatch_fails_at_build(spark):
    chain = (
        ProcessingChain()
        .add(FFT(type="real"))
        .add(Filterbank(n_bands=4, nfft=128, fs=8000))
    )
    df = _one_col(spark, [[1.0] * 64])
    with pytest.raises(ValueError, match="nfft mismatch"):
        chain.process_df(df, "x", info={"fs": 8000, "n_samples": 64})


def test_firwin_lowpass_properties():
    h = firwin(21, 1000.0, fs=8000.0, pass_zero=True)
    # unity DC gain, symmetric (linear phase)
    assert abs(h.sum() - 1.0) < 1e-12
    np.testing.assert_allclose(h, h[::-1], rtol=1e-12)
    # attenuates at Nyquist
    assert abs(np.sum(h * np.cos(np.pi * np.arange(-10, 11)))) < 1e-2


def test_fir_filter_is_causal_convolution(spark):
    x = np.sin(np.arange(32) * 0.3)
    proc = FIRFilter(type="lowpass", f=1000.0, taps=9, fs=8000.0)
    got = _apply(spark, proc, [_pylist(x)])
    h = proc.coefficients(8000.0)
    expect = np.convolve(x, h, mode="full")[:32]
    np.testing.assert_allclose(got[0], expect, rtol=1e-10)


def test_resample_halves_length(spark):
    x = np.sin(2 * np.pi * np.arange(32) / 32)
    got = _apply(spark, Resample(target_fs=4000, fs=8000), [_pylist(x)])
    assert len(got[0]) == 16
    # a pure low-frequency tone survives FFT resampling almost exactly
    expect = np.sin(2 * np.pi * np.arange(16) / 16)
    np.testing.assert_allclose(got[0], expect, atol=1e-10)


def test_framing_processor_matches_reference_shape(spark):
    x = np.arange(1.0, 11.0)
    proc = Framing(windowsize=4.0, stepsize=2.0, window_func="none", fs=1.0)
    got = _apply(spark, proc, [_pylist(x)])
    # frame_len 4, step 2, n 10 -> 4 frames
    assert [list(fr) for fr in got[0]] == [
        [1, 2, 3, 4], [3, 4, 5, 6], [5, 6, 7, 8], [7, 8, 9, 10]
    ]


def test_chain_save_load_roundtrip(spark, tmp_path):
    df = _one_col(spark, [[0.0, 4.0], [2.0, 8.0]])
    chain = ProcessingChain().add(Scaler(type="wav_2_01")).add(
        Normalizer(type="minmax")
    )
    chain.fit(df, "x")
    path = str(tmp_path / "chain")
    chain.save(path)
    assert ProcessingChain.exists(path)
    loaded = ProcessingChain.load(path)
    a = [r.x for r in chain.process_df(df, "x").collect()]
    b = [r.x for r in loaded.process_df(df, "x").collect()]
    np.testing.assert_allclose(a, b, rtol=1e-12)


def test_chain_with_external_callable_and_registry_name(spark):
    chain = ProcessingChain().add(lambda c: F.transform(c, lambda x: F.abs(x))).add(
        "Logarithm", {"type": "natural"}
    )
    got = _apply(spark, chain, [[-math.e, math.e]])
    np.testing.assert_allclose(got[0], [1.0, 1.0], rtol=1e-12)


def test_add_map_accepts_chain_and_name(spark):
    df = _one_col(spark, [[2.0, -4.0]]).withColumn("row_id", F.lit(0))
    ds = Dataset(df, name="t")
    out = ds.add_map("x", ProcessingChain().add(Scaler(type="wav_2_01")), new_key="y")
    assert out.full_df.select("y").collect()[0].y == [1.5, -1.5]
    out2 = ds.add_map("x", [{"name": "Scaler", "parameters": {"type": "wav_2_01"}}], new_key="z")
    assert out2.full_df.select("z").collect()[0].z == [1.5, -1.5]


def test_ivf_refine_improves_objective(spark):
    """One Lloyd iteration on the fixture must not worsen the summed
    best-centroid similarity (deterministic fixture -> stable check)."""
    from dabstract_spark.operators import similarity as sim

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    c0 = sim.ivf_centroids(emb, n_centroids=4)
    c1 = sim.ivf_refine(emb, c0, iters=1)
    assert len(c1) == 4 and all(len(v) == 64 for _, v in c1)

    def objective(cents):
        sims = sim._centroid_rank_exprs("`embedding`", cents)
        best = F.array_max(F.array(*[F.expr(s) for _, s in sims]))
        return emb.select(F.sum(best)).first()[0]

    assert objective(c1) >= objective(c0) - 1e-9


def test_filterbank_native_matches_udf_fallback(spark, monkeypatch):
    """The sparse-unrolled JVM path and the Arrow-UDF matmul fallback
    must agree (up to float summation order)."""
    rng = np.random.default_rng(3)
    vals = [_pylist(rng.standard_normal(33))]
    native = _apply(
        spark,
        Filterbank(n_bands=4, scale="mel", nfft=64, fs=8000),
        vals,
        info={"fs": 8000, "nfft": 64},
    )
    monkeypatch.setattr(Filterbank, "MAX_NATIVE_NNZ", 0)
    udf = _apply(
        spark,
        Filterbank(n_bands=4, scale="mel", nfft=64, fs=8000),
        vals,
        info={"fs": 8000, "nfft": 64},
    )
    np.testing.assert_allclose(native[0], udf[0], rtol=1e-10)


def test_fir_empty_and_short_arrays(spark):
    """Empty input -> empty output (np.convolve parity), short input ->
    same length out; the sequence(1, 0) descending trap must not emit
    spurious elements."""
    fir = FIRFilter(type="lowpass", f=1000.0, taps=9, fs=8000.0)
    got = _apply(spark, fir, [[], [1.0, 2.0]], info={"fs": 8000.0})
    assert got[0] == []
    assert len(got[1]) == 2
    h = fir.coefficients(8000.0)
    np.testing.assert_allclose(got[1], np.convolve([1.0, 2.0], h)[:2], rtol=1e-12)


def test_aggregation_2d_kurtosis_matches_numpy(spark):
    rng = np.random.default_rng(11)
    mat = rng.standard_normal((12, 5))
    agg = Aggregation(methods=["mean", "std", "kurtosis"], axis=0)
    got = _apply(
        spark,
        agg,
        [[list(map(float, row)) for row in mat]],
        dtype="array<array<double>>",
        info={"dtype": "array<array<double>>"},
    )[0]
    mu = mat.mean(axis=0)
    m2 = ((mat - mu) ** 2).mean(axis=0)
    m4 = ((mat - mu) ** 4).mean(axis=0)
    np.testing.assert_allclose(got[0], mu, rtol=1e-12)
    np.testing.assert_allclose(got[1], np.sqrt(m2), rtol=1e-12)
    np.testing.assert_allclose(got[2], m4 / m2**2 - 3.0, rtol=1e-12)


def test_aggregation_2d_axis_minus1_per_row(spark):
    rng = np.random.default_rng(12)
    mat = rng.standard_normal((4, 6))
    agg = Aggregation(methods=["mean", "std"], axis=-1)
    got = _apply(
        spark,
        agg,
        [[list(map(float, row)) for row in mat]],
        dtype="array<array<double>>",
        info={"dtype": "array<array<double>>"},
    )[0]
    assert len(got) == 4
    np.testing.assert_allclose(
        got, np.stack([mat.mean(axis=1), mat.std(axis=1)], axis=1), rtol=1e-12
    )


# --------------------------------------------------------------------- #
# SQL-twin equality (optimization r12): every Processor.sql() must build
# the same expression tree as its expr() — pinned by exact result
# equality (repr captures float bits) on ragged/edge inputs. The string
# input engages the one-parse SQL path; the Column input forces the
# Column path.
# --------------------------------------------------------------------- #
_TWIN_CHAINS = {
    "scaler_uint16": [("Scaler", {"type": "uint16"})],
    "scaler_wav": [("Scaler", {"type": "wav_2_01"})],
    "log_base10": [("Logarithm", {"type": "base10"})],
    "log_natural": [("Logarithm", {"type": "natural"})],
    "window_hamming": [("Windowing", {"window_func": "hamming"})],
    "window_hann_sym": [("Windowing", {"window_func": "hann", "symmetry": False})],
    "window_blackman": [("Windowing", {"window_func": "blackman"})],
    "expand_rows": [("ExpandDims", {"axis": 0})],
    "expand_cols": [("ExpandDims", {"axis": -1})],
    "agg_1d": [("Aggregation", {"methods": ["mean", "std", "kurtosis"]})],
    "framing": [("Framing", {"windowsize": 0.002, "stepsize": 0.001, "fs": 8000.0})],
    "framing_agg_axis0": [
        ("Framing", {"windowsize": 0.002, "stepsize": 0.001, "fs": 8000.0}),
        ("Aggregation", {"methods": ["mean", "std"], "axis": 0, "combine": "concat"}),
    ],
    "framing_agg_rows": [
        ("Framing", {"windowsize": 0.002, "stepsize": 0.001, "fs": 8000.0}),
        ("Aggregation", {"methods": ["mean", "std", "kurtosis"], "axis": -1}),
    ],
    "filterbank": [("Filterbank", {"n_bands": 8, "scale": "mel", "nfft": 126, "fs": 8000.0})],
    "fir_lowpass": [("FIRFilter", {"type": "lowpass", "f": 1000.0, "taps": 15, "fs": 8000.0})],
    "fir_bandpass": [
        ("FIRFilter", {"type": "bandpass", "f": [500.0, 1500.0], "taps": 21, "fs": 8000.0})
    ],
    "mixed_scalar_chain": [
        ("Scaler", {"type": "wav_2_01"}),
        ("Logarithm", {"type": "base10"}),
        ("ExpandDims", {"axis": 0}),
    ],
}


@pytest.mark.parametrize("name", sorted(_TWIN_CHAINS))
def test_sql_twin_matches_column_path(spark, name):
    ch = ProcessingChain()
    for pname, params in _TWIN_CHAINS[name]:
        ch.add(pname, params)
    # ragged lengths, zeros (eps-floor legs), negatives, a constant
    # array (kurtosis NULL leg), and an empty array (FIR boundary)
    vals = [
        [float(i) / 7.0 - 0.4 for i in range(64)],
        [0.0] * 64,
        [1.5] * 64,
        [-1.0, 2.0, -3.0, 4.0] * 16,
    ]
    df = _one_col(spark, vals)
    info = {"dtype": "array<double>"}
    got_sql = df.select(ch.expr("x", dict(info)).alias("v")).collect()
    got_col = df.select(ch.expr(F.col("x"), dict(info)).alias("v")).collect()
    assert [repr(r.v) for r in got_sql] == [repr(r.v) for r in got_col]


def test_sql_twin_path_actually_engages(spark):
    """The one-parse path must be live for a pure-native chain (a silent
    permanent fallback would quietly reintroduce the chatter)."""
    ch = ProcessingChain().add("Filterbank", {"n_bands": 8, "scale": "mel", "nfft": 126, "fs": 8000.0})
    got = ch._chain[0].sql("`x`", {"dtype": "array<double>"})
    assert got is not None and got[0].startswith("element_at(transform(array(")
