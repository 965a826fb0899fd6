"""Cost model for the windowed multi-vreg Pallas decode relaxation.

Mosaic's ``tpu.dynamic_gather`` only supports a single source vreg along
the gather axis, so the clean full-width tier kernel
(ops/pallas_decoder.py) cannot compile at flagship scale (S_pad=14208 =
111 vregs). The viable multi-vreg decomposition is *windowed relaxation*:
every arc is bucketed into a (dest 128-block, source 128-window) step;
per step the kernel slices the 128-aligned source window out of the
VMEM-resident alpha, gathers within the vreg with local indices, and
merges (cost, arc-id)-lexicographically into the destination block.

This script measures that step loop at flagship scale with synthetic
step tables — the steps are random, but the per-step cost is what's
being measured and it is index-content-independent. Measured on a real
v5e chip (2026-08-19, B=512, T=116, S_pad=14208, P=3072):

- NSTEP=1280 (the realistic per-frame step count for the flagship graph
  after hub-contiguous + source-sorted round packing): **176 ms** per
  full decode vs the XLA dense scan's **198 ms** (examples/
  pallas_decode_bench.py) — ~11%, bounded by ~70 cycles/step of loop
  and dynamic-index overhead, not bandwidth.
- An 8-wide unrolled variant with [G, 8, 128]-blocked tables exceeded
  9 minutes of Mosaic compile time and was abandoned.

Conclusion (recorded in ops/pallas_decoder.py): the fused-VMEM kernel
does not beat the XLA scan by enough to carry its complexity; the dense
XLA layouts remain the production decode path. Re-evaluate if Mosaic
gains multi-vreg gathers or cheaper dynamic lane slicing.

Usage: python examples/pallas_windowed_cost.py [NSTEP] [BT]
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

S_pad = 14208
P = 3072
NSTEP = int(sys.argv[1]) if len(sys.argv) > 1 else 1280
BT = int(sys.argv[2]) if len(sys.argv) > 2 else 32
T = 116
B = 512


def main():
    rng = np.random.RandomState(0)
    dbase = (rng.randint(0, S_pad // 128, NSTEP) * 128).astype(np.int32)
    sbase = (rng.randint(0, S_pad // 128, NSTEP) * 128).astype(np.int32)
    idx = rng.randint(0, 128, (NSTEP, 128)).astype(np.int32)
    w = rng.rand(NSTEP, 128).astype(np.float32)
    arc = rng.randint(0, 37658, (NSTEP, 128)).astype(np.int32)

    def kernel(dbase_ref, sbase_ref, am_ref, idx_ref, w_ref, arc_ref,
               alpha_ref, bp_ref, bc_ref, bi_ref):
        t = pl.program_id(1)

        @pl.when(t == 0)
        def _():
            alpha_ref[:] = jnp.zeros((BT, S_pad), jnp.float32)

        bc_ref[:] = alpha_ref[:] + 0.5
        bi_ref[:] = jnp.zeros((BT, S_pad), jnp.int32)

        def body(i, _):
            db = pl.multiple_of(dbase_ref[i], 128)
            sb = pl.multiple_of(sbase_ref[i], 128)
            srcwin = alpha_ref[:, pl.ds(sb, 128)]
            ii = jnp.broadcast_to(idx_ref[i][None, :], (BT, 128))
            cand = jnp.take_along_axis(srcwin, ii, axis=1) + w_ref[i][None, :]
            aid = jnp.broadcast_to(arc_ref[i][None, :], (BT, 128))
            bc = bc_ref[:, pl.ds(db, 128)]
            bi = bi_ref[:, pl.ds(db, 128)]
            take = (cand < bc) | ((cand == bc) & (aid < bi))
            bc_ref[:, pl.ds(db, 128)] = jnp.where(take, cand, bc)
            bi_ref[:, pl.ds(db, 128)] = jnp.where(take, aid, bi)
            return 0

        jax.lax.fori_loop(0, NSTEP, body, 0)
        # next-frame am fold stand-in (the real fold's window steps are
        # counted inside NSTEP)
        alpha_ref[:] = bc_ref[:]
        bp_ref[0] = bi_ref[:].astype(jnp.uint16)

    grid = (B // BT, T)
    am = jnp.asarray(rng.randn(T, BT, P).astype(np.float32))

    fn = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, BT, P), lambda b, t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((BT, S_pad), lambda b, t: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BT, S_pad), lambda b, t: (t, b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, S_pad), jnp.float32),
            jax.ShapeDtypeStruct((T, B, S_pad), jnp.uint16),
        ],
        scratch_shapes=[
            pltpu.VMEM((BT, S_pad), jnp.float32),
            pltpu.VMEM((BT, S_pad), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
    )

    jfn = jax.jit(lambda a: fn(jnp.asarray(dbase), jnp.asarray(sbase), a,
                               jnp.asarray(idx), jnp.asarray(w),
                               jnp.asarray(arc)))
    t0 = time.time()
    out = jfn(am)
    jax.block_until_ready(out)
    print(f"compile+run {time.time() - t0:.1f}s")
    times = []
    for _ in range(5):
        t1 = time.time()
        out = jfn(am)
        jax.block_until_ready(out)
        times.append(time.time() - t1)
    ms = min(times) * 1000
    per_step_us = ms / T / (B // BT) / NSTEP * 1e6
    print(f"NSTEP={NSTEP} B={B} BT={BT} T={T}: {ms:.1f} ms "
          f"({per_step_us:.3f} us/step)")


if __name__ == "__main__":
    main()
