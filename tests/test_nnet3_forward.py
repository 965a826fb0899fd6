"""nnet3 forward compiler tests vs a hand-written NumPy evaluation."""

import io

import numpy as np

import jax
import jax.numpy as jnp

from rhasspy_speech_tpu.io import KaldiReader, read_nnet3, write_nnet3
from rhasspy_speech_tpu.models import compile_nnet3
from tests.test_kaldi_io import _synthetic_tdnnf_spec


def _relu(x):
    return np.maximum(x, 0.0)


def _manual_forward(spec, feats, ivec, out_ts):
    """Independent NumPy evaluation of the synthetic tdnnf spec at absolute
    input times out_ts. feats is indexed by absolute time (0-based array);
    caller guarantees needed context exists."""
    c = spec.components
    lda_w = c["lda"].attrs["LinearParams"]
    lda_b = c["lda"].attrs["BiasParams"]
    a1_w = c["tdnn1.affine"].attrs["LinearParams"]
    a1_b = c["tdnn1.affine"].attrs["BiasParams"]
    bn = c["tdnn1.batchnorm"].attrs
    bn_scale = bn["TargetRms"] / np.sqrt(bn["StatsVar"] + bn["Epsilon"])
    lin_w = c["tdnnf2.linear"].attrs["LinearParams"]
    aff_w = c["tdnnf2.affine"].attrs["LinearParams"]
    aff_b = c["tdnnf2.affine"].attrs["BiasParams"]
    out_w = c["output.affine"].attrs["LinearParams"]
    out_b = c["output.affine"].attrs["BiasParams"]

    def lda(t):
        x = np.concatenate([feats[t - 1], feats[t], feats[t + 1], ivec])
        return lda_w @ x + lda_b

    def bn1(t):
        h = _relu(a1_w @ lda(t) + a1_b)
        return (h - bn["StatsMean"]) * bn_scale

    def lin(t):
        return lin_w @ np.concatenate([bn1(t - 1), bn1(t)])

    def aff(t):
        return aff_w @ np.concatenate([lin(t), lin(t + 1)]) + aff_b

    return np.stack([out_w @ aff(t) + out_b for t in out_ts])


def test_context_computation():
    rng = np.random.RandomState(0)
    spec = _synthetic_tdnnf_spec(rng)
    model = compile_nnet3(spec, num_out_frames=4, subsampling=3)
    # lda: +-1; tdnnf2.linear: -1; tdnnf2.affine: +1  => left 2+1=3? No:
    # left = 1 (lda) + 1 (linear offset -1) = 2; right = 1 (lda) + 1 (affine +1) = 2
    assert model.left_context == 2
    assert model.right_context == 2
    assert model.num_input_frames == 2 + (3 * 3 + 1) + 2  # lo..last_t+rc


def test_forward_matches_manual():
    rng = np.random.RandomState(3)
    spec = _synthetic_tdnnf_spec(rng)
    model = compile_nnet3(spec, num_out_frames=4, subsampling=3)

    B = 2
    T_in = model.num_input_frames
    feats = rng.randn(B, T_in, 16).astype(np.float32)
    ivec = rng.randn(B, 8).astype(np.float32)

    got = np.asarray(model.forward(jnp.asarray(feats), jnp.asarray(ivec)))
    assert got.shape == (B, 4, 20)

    # Manual evaluation: absolute array index of output time t is
    # t + left_context
    lc = model.left_context
    out_ts = [t * 3 + lc for t in range(4)]
    for b in range(B):
        want = _manual_forward(spec, feats[b].astype(np.float64),
                               ivec[b].astype(np.float64), out_ts)
        np.testing.assert_allclose(got[b], want, rtol=1e-4, atol=1e-4)


def test_forward_after_file_roundtrip():
    """Parse-from-bytes model produces identical outputs."""
    rng = np.random.RandomState(4)
    spec = _synthetic_tdnnf_spec(rng)
    buf = io.BytesIO()
    write_nnet3(buf, spec)
    buf.seek(0)
    spec2 = read_nnet3(KaldiReader(buf))

    m1 = compile_nnet3(spec, num_out_frames=3, subsampling=3)
    m2 = compile_nnet3(spec2, num_out_frames=3, subsampling=3)
    B = 1
    feats = rng.randn(B, m1.num_input_frames, 16).astype(np.float32)
    ivec = rng.randn(B, 8).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(m1.forward(jnp.asarray(feats), jnp.asarray(ivec))),
        np.asarray(m2.forward(jnp.asarray(feats), jnp.asarray(ivec))),
        rtol=1e-6,
    )


def test_forward_jit():
    rng = np.random.RandomState(5)
    spec = _synthetic_tdnnf_spec(rng)
    model = compile_nnet3(spec, num_out_frames=4, subsampling=3)
    fwd = jax.jit(model.forward)
    B = 3
    feats = jnp.asarray(rng.randn(B, model.num_input_frames, 16).astype(np.float32))
    ivec = jnp.asarray(rng.randn(B, 8).astype(np.float32))
    out1 = np.asarray(fwd(feats, ivec))
    out2 = np.asarray(model.forward(feats, ivec))
    np.testing.assert_allclose(out1, out2, rtol=1e-5, atol=1e-5)


def test_subsampling_one():
    rng = np.random.RandomState(6)
    spec = _synthetic_tdnnf_spec(rng)
    model = compile_nnet3(spec, num_out_frames=5, subsampling=1)
    assert model.num_input_frames == 5 + 4  # chunk + lc + rc
    feats = jnp.asarray(rng.randn(1, model.num_input_frames, 16).astype(np.float32))
    ivec = jnp.asarray(rng.randn(1, 8).astype(np.float32))
    out = model.forward(feats, ivec)
    assert out.shape == (1, 5, 20)


def test_recurrent_graph_rejected():
    """LSTM-style back-edges raise NotImplementedError, not silent garbage."""
    import pytest

    from rhasspy_speech_tpu.io import ComponentSpec, NodeSpec, Nnet3Spec, parse_descriptor

    spec = Nnet3Spec(
        nodes=[
            NodeSpec(kind="input", name="input", dim=4),
            NodeSpec(
                kind="component", name="a", component="a",
                # references 'b', which is defined after 'a': recurrence
                input=parse_descriptor("Sum(input, IfDefined(Offset(b, -1)))"),
            ),
            NodeSpec(kind="component", name="b", component="b",
                     input=parse_descriptor("a")),
            NodeSpec(kind="output", name="output", input=parse_descriptor("b")),
        ],
        components={
            "a": ComponentSpec("a", "NoOpComponent", {"Dim": 4}),
            "b": ComponentSpec("b", "NoOpComponent", {"Dim": 4}),
        },
    )
    with pytest.raises(NotImplementedError, match="recurrent"):
        compile_nnet3(spec, num_out_frames=2, subsampling=1)
