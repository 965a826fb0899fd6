"""Delta feature tests vs a naive per-frame implementation."""

import numpy as np

import jax.numpy as jnp

from rhasspy_speech_tpu.ops.deltas import add_deltas, delta_kernels


def test_kernel_first_order():
    k = delta_kernels(order=1, window=2)[1]
    # classic [-2 -1 0 1 2] / 10
    np.testing.assert_allclose(k, np.array([-2, -1, 0, 1, 2]) / 10.0)


def test_add_deltas_matches_naive():
    rng = np.random.RandomState(0)
    feats = rng.randn(2, 12, 3).astype(np.float32)
    got = np.asarray(add_deltas(jnp.asarray(feats), order=2, window=2))
    assert got.shape == (2, 12, 9)

    kernels = delta_kernels(2, 2)
    T = 12
    for b in range(2):
        for t in range(T):
            row = []
            for kernel in kernels:
                offset = (kernel.shape[0] - 1) // 2
                acc = np.zeros(3)
                for i, c in enumerate(kernel):
                    tt = int(np.clip(t + i - offset, 0, T - 1))
                    acc += c * feats[b, tt]
                row.append(acc)
            np.testing.assert_allclose(
                got[b, t], np.concatenate(row), rtol=1e-5, atol=1e-5
            )


def test_order_zero_identity():
    feats = jnp.asarray(np.random.randn(1, 5, 2).astype(np.float32))
    out = add_deltas(feats, order=0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(feats))
