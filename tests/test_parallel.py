"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from rhasspy_speech_tpu.parallel import make_stream_mesh, shard_streams


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices("cpu")) < 8:
        pytest.skip("needs 8 virtual CPU devices")
    return make_stream_mesh(8)


def test_mesh_shape(mesh):
    assert mesh.shape == {"streams": 8}


def test_shard_streams_placement(mesh):
    x = np.random.randn(16, 4).astype(np.float32)
    xs = shard_streams(mesh, x)
    assert xs.sharding.spec == P("streams", None)
    np.testing.assert_array_equal(np.asarray(xs), x)


def test_sharded_decode_equals_unsharded(mesh):
    """The full decode program gives identical results when the stream batch
    is sharded across the mesh (pure data parallelism, no collectives)."""
    from tests.test_decoder import _random_graph
    from rhasspy_speech_tpu.ops.decoder import (
        DeviceGraph,
        traces_to_words_batch,
        viterbi_decode,
    )

    rng = np.random.RandomState(0)
    graph = _random_graph(rng)
    dev = DeviceGraph.from_dense(graph)
    B, T = 16, 10
    lp = np.log(rng.dirichlet(np.ones(graph.num_pdfs), size=(B, T))).astype(
        np.float32
    )

    f = jax.jit(lambda x: viterbi_decode(dev, x))
    plain = [np.asarray(v) for v in f(jnp.asarray(lp))]

    lp_sharded = shard_streams(mesh, lp)
    sharded = [np.asarray(v) for v in f(lp_sharded)]

    np.testing.assert_allclose(plain[2], sharded[2], rtol=1e-6)
    w1 = traces_to_words_batch(graph, *plain)
    w2 = traces_to_words_batch(graph, *sharded)
    assert [w for w, _ in w1] == [w for w, _ in w2]


def test_sharded_am_forward(mesh):
    """TDNN-F forward under batch sharding matches the replicated run."""
    from rhasspy_speech_tpu.models import compile_nnet3
    from rhasspy_speech_tpu.testing.tdnnf import build_tdnnf_spec

    spec = build_tdnnf_spec(num_pdfs=12, input_dim=8, hidden_dim=32,
                            bottleneck_dim=8, num_tdnnf_layers=2)
    model = compile_nnet3(spec, num_out_frames=4, subsampling=3)
    rng = np.random.RandomState(1)
    feats = rng.randn(8, model.num_input_frames, 8).astype(np.float32)

    f = jax.jit(model.forward)
    plain = np.asarray(f(jnp.asarray(feats)))
    sharded = np.asarray(f(shard_streams(mesh, feats)))
    np.testing.assert_allclose(plain, sharded, rtol=1e-5, atol=1e-5)
