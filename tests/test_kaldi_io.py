"""Kaldi binary I/O roundtrip tests: basic types, transition model, nnet3."""

import io

import numpy as np

from rhasspy_speech_tpu.io import (
    ComponentSpec,
    KaldiReader,
    KaldiTransitionModel,
    KaldiWriter,
    NodeSpec,
    Nnet3Spec,
    parse_descriptor,
    read_am_nnet3,
    read_nnet3,
    write_nnet3,
)
from rhasspy_speech_tpu.io.nnet3_file import descriptor_to_string


def test_basic_roundtrip():
    buf = io.BytesIO()
    w = KaldiWriter(buf)
    w.write_token("<Hello>")
    w.write_int(-42)
    w.write_float(3.5)
    w.write_bool(True)
    w.write_bool(False)
    w.write_int_vector([1, -2, 3])
    w.write_vector(np.array([1.5, -2.5], dtype=np.float32))
    w.write_matrix(np.arange(6, dtype=np.float32).reshape(2, 3))
    w.write_double(1.25)

    buf.seek(0)
    r = KaldiReader(buf)
    assert r.read_token() == "<Hello>"
    assert r.read_int() == -42
    assert r.read_float() == 3.5
    assert r.read_bool() is True
    assert r.read_bool() is False
    np.testing.assert_array_equal(r.read_int_vector(), [1, -2, 3])
    np.testing.assert_array_equal(r.read_vector(), [1.5, -2.5])
    np.testing.assert_array_equal(
        r.read_matrix(), np.arange(6, dtype=np.float32).reshape(2, 3)
    )
    assert r.read_float() == 1.25  # double width


def test_transition_model_roundtrip():
    tm = KaldiTransitionModel.from_monophone_chain(5)
    buf = io.BytesIO()
    tm.write(KaldiWriter(buf))
    buf.seek(0)
    tm2 = KaldiTransitionModel.read(KaldiReader(buf))

    np.testing.assert_array_equal(tm.tuples, tm2.tuples)
    np.testing.assert_allclose(tm.log_probs, tm2.log_probs)
    np.testing.assert_array_equal(tm.id2pdf, tm2.id2pdf)
    assert tm2.num_pdfs == 10
    # chain topology: self-loop transition maps to self-loop pdf
    # tuple for phone 1: tids 1 (self, dst==0) and 2 (forward)
    # topology transitions are [(0, .5), (1, .5)]: first is self-loop
    assert tm2.id2self_loop[1]
    assert not tm2.id2self_loop[2]
    assert tm2.id2pdf[1] == 1  # self-loop pdf
    assert tm2.id2pdf[2] == 0  # forward pdf


def test_descriptor_parse():
    d = parse_descriptor(
        "Append(Offset(input, -2), input, Offset(input, 2), "
        "ReplaceIndex(ivector, t, 0))"
    )
    assert d[0] == "append"
    assert d[1][0] == ("offset", ("node", "input"), -2)
    assert d[1][1] == ("node", "input")
    assert d[1][3] == ("replace_index", ("node", "ivector"), "t", 0)
    # roundtrip through string form
    assert parse_descriptor(descriptor_to_string(d)) == d

    d2 = parse_descriptor("Sum(Scale(-1.0, lstm.c), IfDefined(Offset(x, -3)))")
    assert d2 == (
        "sum",
        [
            ("scale", -1.0, ("node", "lstm.c")),
            ("ifdefined", ("offset", ("node", "x"), -3)),
        ],
    )


def _synthetic_tdnnf_spec(rng) -> Nnet3Spec:
    """Small TDNN-F-shaped net: lda -> affine+relu+batchnorm -> tdnn pair ->
    output, with ivector appended at the input."""
    feat, ivec, hid, bottleneck, out = 16, 8, 32, 12, 20
    comps = {
        "lda": ComponentSpec(
            "lda",
            "FixedAffineComponent",
            {
                "LinearParams": rng.randn(feat * 3 + ivec, feat * 3 + ivec).astype(np.float32),
                "BiasParams": rng.randn(feat * 3 + ivec).astype(np.float32),
            },
        ),
        "tdnn1.affine": ComponentSpec(
            "tdnn1.affine",
            "NaturalGradientAffineComponent",
            {
                "LearningRate": 0.001,
                "LinearParams": rng.randn(hid, feat * 3 + ivec).astype(np.float32),
                "BiasParams": rng.randn(hid).astype(np.float32),
                "RankIn": 20,
                "RankOut": 80,
                "UpdatePeriod": 4,
                "NumSamplesHistory": 2000.0,
                "Alpha": 4.0,
            },
        ),
        "tdnn1.relu": ComponentSpec(
            "tdnn1.relu",
            "RectifiedLinearComponent",
            {
                "Dim": hid,
                "ValueAvg": np.zeros(hid, dtype=np.float32),
                "DerivAvg": np.zeros(hid, dtype=np.float32),
                "Count": 0.0,
            },
        ),
        "tdnn1.batchnorm": ComponentSpec(
            "tdnn1.batchnorm",
            "BatchNormComponent",
            {
                "Dim": hid,
                "BlockDim": hid,
                "Epsilon": 0.001,
                "TargetRms": 1.0,
                "TestMode": True,
                "Count": 100.0,
                "StatsMean": rng.randn(hid).astype(np.float32) * 0.1,
                "StatsVar": (1 + 0.1 * rng.rand(hid)).astype(np.float32),
            },
        ),
        "tdnnf2.linear": ComponentSpec(
            "tdnnf2.linear",
            "TdnnComponent",
            {
                "LearningRate": 0.001,
                "TimeOffsets": np.array([-1, 0], dtype=np.int64),
                "LinearParams": rng.randn(bottleneck, hid * 2).astype(np.float32),
                "BiasParams": np.zeros(0, dtype=np.float32),
                "OrthonormalConstraint": -1.0,
                "UseNaturalGradient": True,
                "NumSamplesHistory": 2000.0,
                "AlphaInOut": (4.0, 4.0),
                "RankInOut": (20, 80),
            },
        ),
        "tdnnf2.affine": ComponentSpec(
            "tdnnf2.affine",
            "TdnnComponent",
            {
                "LearningRate": 0.001,
                "TimeOffsets": np.array([0, 1], dtype=np.int64),
                "LinearParams": rng.randn(hid, bottleneck * 2).astype(np.float32),
                "BiasParams": rng.randn(hid).astype(np.float32),
                "OrthonormalConstraint": 0.0,
                "UseNaturalGradient": True,
                "NumSamplesHistory": 2000.0,
                "AlphaInOut": (4.0, 4.0),
                "RankInOut": (20, 80),
            },
        ),
        "output.affine": ComponentSpec(
            "output.affine",
            "NaturalGradientAffineComponent",
            {
                "LearningRate": 0.001,
                "LinearParams": rng.randn(out, hid).astype(np.float32),
                "BiasParams": rng.randn(out).astype(np.float32),
                "RankIn": 20,
                "RankOut": 80,
                "UpdatePeriod": 4,
                "NumSamplesHistory": 2000.0,
                "Alpha": 4.0,
            },
        ),
    }
    nodes = [
        NodeSpec(kind="input", name="ivector", dim=ivec),
        NodeSpec(kind="input", name="input", dim=feat),
        NodeSpec(
            kind="component",
            name="lda",
            component="lda",
            input=parse_descriptor(
                "Append(Offset(input, -1), input, Offset(input, 1), "
                "ReplaceIndex(ivector, t, 0))"
            ),
        ),
        NodeSpec(kind="component", name="tdnn1.affine", component="tdnn1.affine",
                 input=parse_descriptor("lda")),
        NodeSpec(kind="component", name="tdnn1.relu", component="tdnn1.relu",
                 input=parse_descriptor("tdnn1.affine")),
        NodeSpec(kind="component", name="tdnn1.batchnorm",
                 component="tdnn1.batchnorm",
                 input=parse_descriptor("tdnn1.relu")),
        NodeSpec(kind="component", name="tdnnf2.linear", component="tdnnf2.linear",
                 input=parse_descriptor("tdnn1.batchnorm")),
        NodeSpec(kind="component", name="tdnnf2.affine", component="tdnnf2.affine",
                 input=parse_descriptor("tdnnf2.linear")),
        NodeSpec(kind="component", name="output.affine", component="output.affine",
                 input=parse_descriptor("tdnnf2.affine")),
        NodeSpec(kind="output", name="output",
                 input=parse_descriptor("output.affine")),
    ]
    return Nnet3Spec(nodes=nodes, components=comps, left_context=2, right_context=2)


def test_nnet3_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    spec = _synthetic_tdnnf_spec(rng)

    buf = io.BytesIO()
    write_nnet3(buf, spec)
    buf.seek(0)
    spec2 = read_nnet3(KaldiReader(buf))

    assert [n.name for n in spec2.nodes] == [n.name for n in spec.nodes]
    assert spec2.node("tdnn1.affine").input == spec.node("tdnn1.affine").input
    assert set(spec2.components) == set(spec.components)
    np.testing.assert_allclose(
        spec2.components["tdnnf2.linear"].attrs["LinearParams"],
        spec.components["tdnnf2.linear"].attrs["LinearParams"],
    )
    np.testing.assert_array_equal(
        spec2.components["tdnnf2.linear"].attrs["TimeOffsets"], [-1, 0]
    )
    assert spec2.components["tdnn1.batchnorm"].attrs["TestMode"] is True
    assert spec2.components["output.affine"].input_dim == 32
    assert spec2.components["output.affine"].output_dim == 20
    assert spec2.input_dim == 16
    assert spec2.ivector_dim == 8


def test_am_nnet3_full_mdl(tmp_path):
    rng = np.random.RandomState(1)
    spec = _synthetic_tdnnf_spec(rng)
    tm = KaldiTransitionModel.from_monophone_chain(10)  # 20 pdfs = output dim

    path = str(tmp_path / "final.mdl")
    with open(path, "wb") as f:
        write_nnet3(f, spec, transition_model=tm)

    tm2, spec2 = read_am_nnet3(path)
    assert tm2.num_pdfs == 20
    assert spec2.left_context == 2
    assert spec2.right_context == 2
    np.testing.assert_array_equal(tm2.id2pdf, tm.id2pdf)
    assert set(spec2.components) == set(spec.components)


def test_compressed_matrix_roundtrip():
    rng = np.random.RandomState(5)
    mat = (rng.randn(30, 7) * 3.0).astype(np.float32)

    for method, tol in (("CM2", 3e-4), ("CM", 0.12)):
        buf = io.BytesIO()
        w = KaldiWriter(buf)
        w.write_compressed_matrix(mat, method=method)
        buf.seek(0)
        got = KaldiReader(buf).read_matrix()
        assert got.shape == mat.shape
        # quantized: CM2 is 16-bit linear; CM is 8-bit piecewise
        err = np.abs(got - mat).max() / (mat.max() - mat.min())
        assert err < tol, (method, err)


def test_compressed_matrix_small_rows():
    mat = np.array([[1.0, 2.0], [3.0, 4.0]], dtype=np.float32)
    buf = io.BytesIO()
    KaldiWriter(buf).write_compressed_matrix(mat, method="CM")
    buf.seek(0)
    got = KaldiReader(buf).read_matrix()
    assert np.abs(got - mat).max() < 0.2


def test_compressed_matrix_saturated_headers_monotonic():
    """Columns whose upper percentiles saturate at 65535 (always when
    rows < 5) must still get strictly increasing CM headers — uint16
    wraparound previously produced [a, a+1, 0, 65535] and garbage decode."""
    import warnings

    # column max == global max -> percentile_100 quantizes to 65535 for
    # every column; with rows < 5 percentile_75 also hits the max value
    mat = np.array([[0.0, 5.0], [5.0, 5.0], [5.0, 0.0]], dtype=np.float32)
    buf = io.BytesIO()
    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)
        KaldiWriter(buf).write_compressed_matrix(mat, method="CM")
    raw = buf.getvalue()
    # headers follow "\0B" + "CM " + <ffii> global header
    off = 2 + len("CM ") + 16
    headers = np.frombuffer(raw[off : off + 2 * 4 * 2], dtype="<u2").reshape(
        2, 4
    )
    for col in headers:
        assert (np.diff(col.astype(np.int64)) > 0).all(), col
    buf.seek(0)
    got = KaldiReader(buf).read_matrix()
    assert np.abs(got - mat).max() < 0.25, got
