"""Isolate the fused serving tick's DEVICE execute time from transport.

The streaming bench measures wall time per tick, which folds together
host bookkeeping, H2D uploads, tunnel dispatch latency, device execute,
and D2H harvests. This probe separates them at flagship scale:

  A. fused-program throughput: M back-to-back dispatches of
     ``_batch_chunk_fused`` with rethreaded donated state, one block at
     the end -> device execute per tick (dispatch overhead pipelined)
  B. H2D upload cost: device_put of the tick's two uploads, blocked
  C. tunnel round trip: tiny transfer, blocked

Usage: python examples/tick_device_profile.py [lanes] [M]
(env knobs from bench.py apply: BENCH_CHUNK_OUT, BENCH_PDFS, ...)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import bench  # noqa: E402  (repo-root bench.py: graph + flagship builders)


def main():
    lanes = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    M = int(sys.argv[2]) if len(sys.argv) > 2 else 30

    import jax

    bench._init_devices_or_die(600.0)
    from rhasspy_speech_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()

    import shutil
    import tempfile

    from rhasspy_speech_tpu.ops.decoder import make_decode_graph
    from rhasspy_speech_tpu.pipeline.artifacts import LangArtifacts
    from rhasspy_speech_tpu.pipeline.endpoint import EndpointConfig
    from rhasspy_speech_tpu.pipeline.scheduler import StreamScheduler
    from rhasspy_speech_tpu.testing.flagship import write_flagship_model_dir

    graph, g_fuzzy, lang, tree_pdfs = bench.build_graph_and_fuzzy()
    graph.num_pdfs = max(bench.NUM_PDFS, tree_pdfs)
    make_decode_graph(graph)

    workdir = tempfile.mkdtemp(prefix="rstpu_prof_")
    try:
        max_phone = max(
            pid for (p, pid) in lang.phones if pid != 0 and not p.startswith("#")
        )
        model_dir = write_flagship_model_dir(
            os.path.join(workdir, "model"),
            num_pdfs=graph.num_pdfs,
            max_phone=max_phone,
            hidden_dim=bench.HIDDEN,
            num_tdnnf_layers=bench.LAYERS,
            ivector_dim=bench.IVEC_DIM,
            ubm_gauss=bench.UBM_GAUSS,
        )
        graph_dir = os.path.join(workdir, "graph")
        LangArtifacts(
            words=lang.words, g_fuzzy=g_fuzzy, graph=graph, phones=lang.phones
        ).save(graph_dir)

        chunk_out = int(os.environ.get("BENCH_CHUNK_OUT", "7"))
        wire = os.environ.get("BENCH_WIRE", "i16")
        # BENCH_ENDPOINT=0 compiles the tick without the endpoint lane
        # (no per-state trailing-silence DP, smaller packed row) — the
        # exec delta attributes the endpoint lane's device cost
        ep = (
            EndpointConfig()
            if os.environ.get("BENCH_ENDPOINT", "1") != "0"
            else None
        )
        CHUNK = chunk_out * 3 * 160
        sched = StreamScheduler(
            model_dir,
            graph_dir,
            max_streams=lanes,
            max_fuzzy_cost=1.0,
            pool_capacity_samples=int(16000 * (bench.SECONDS + 2)),
            chunk_out_frames=chunk_out,
            endpointing=ep,
            wire=wire,
        )
        assert sched._device_feats, "probe assumes the fused device tick"
        rng = np.random.RandomState(1)
        pcm = np.round(1000.0 * rng.randn(CHUNK)).astype(np.float32)
        for _ in range(lanes):
            sid = sched.open_stream()
            sched.feed(sid, pcm)
            sched.feed(sid, pcm)
        # warm: compile the fused program + feature feed
        for i in range(4):
            for sid in range(lanes):
                sched.feed(sid, pcm)
            sched.step()
        jax.block_until_ready(sched._alpha)

        from rhasspy_speech_tpu.pipeline.scheduler import _pcm_bucket

        N = sched.max_streams
        width = _pcm_bucket(CHUNK + 320, sched._drain_cap)
        row = np.round(1000.0 * rng.randn(CHUNK)).astype(np.int16)
        if wire == "mulaw":
            from rhasspy_speech_tpu.ops.mulaw import encode_i16

            pcm_batch = np.zeros(
                (N, width + sched._meta_cols), dtype=np.uint8
            )
            pcm_batch[:, :CHUNK] = np.tile(encode_i16(row), (N, 1))
        else:
            pcm_batch = np.zeros(
                (N, width + sched._meta_cols), dtype=np.int16
            )
            pcm_batch[:, :CHUNK] = np.tile(row, (N, 1))
        meta = np.zeros((N, 7), dtype=np.int32)
        meta[:, 0] = chunk_out  # n_valid: every lane decodes a full chunk
        meta[:, 2] = 8  # t0
        meta[:, 3] = 64  # have
        meta[:, 4] = 40  # feat-ring write offset
        meta[:, 5] = 1  # has_new
        meta[:, 6] = sched._chunk_in
        sched._write_meta_cols(pcm_batch, meta)

        # --- C. tunnel round trip (tiny transfer, blocked) ---------------
        import jax.numpy as jnp

        tiny = jnp.zeros((4,), jnp.float32) + 1.0
        jax.block_until_ready(tiny)
        t0 = time.time()
        for _ in range(10):
            jax.block_until_ready(tiny + 1.0)
        rtt_ms = (time.time() - t0) / 10 * 1000.0

        # --- B. H2D upload cost ------------------------------------------
        t0 = time.time()
        for _ in range(10):
            pd = jax.device_put(pcm_batch)
            jax.block_until_ready(pd)
        h2d_ms = (time.time() - t0) / 10 * 1000.0

        # --- A. fused-program device throughput ---------------------------
        pcm_dev = jax.device_put(pcm_batch)
        jax.block_until_ready(pcm_dev)
        state = (
            sched._alpha, sched._iv_gamma, sched._iv_X,
            sched._iv_carry if sched._iv_inline else sched._iv_dummy,
            sched._am_state, sched._ring, sched._feats_ring, sched._offs,
            sched._sw_w, sched._cum_ring, sched._pcm_ring,
        )

        def dispatch(st, pcm_in=None):
            (alpha, gamma, X, ivw, am_state, ring, feats_ring, offs,
             sw_w, cum_ring, pcm_ring) = st
            out = sched._batch_chunk_fused(
                alpha,
                pcm_dev if pcm_in is None else pcm_in,
                gamma, X, ivw, am_state, ring,
                feats_ring, offs, sw_w, cum_ring, pcm_ring,
            )
            (alpha, _bps, gamma, X, am_state, ring, offs, iv_carry,
             packed, sw_w, feats_ring, cum_ring, pcm_ring) = out
            ivw2 = iv_carry if sched._iv_inline else sched._iv_dummy
            sw2 = sw_w if sched._sw_device else sched._sw_w
            return (
                (alpha, gamma, X, ivw2, am_state, ring, feats_ring, offs,
                 sw2, cum_ring, pcm_ring),
                packed,
            )

        # warm this exact call signature (donation pattern identical)
        state, packed = dispatch(state)
        jax.block_until_ready(state[0])
        t0 = time.time()
        for _ in range(M):
            state, packed = dispatch(state)
        jax.block_until_ready(state[0])
        exec_ms = (time.time() - t0) / M * 1000.0

        # --- A2: same but pull the packed rows (trace + folded endpoint
        # stats — the serving tick's one D2H) each tick, in threads
        import threading

        def fetch(arr, box, i):
            box[i] = np.asarray(arr)

        t0 = time.time()
        threads = []
        for _ in range(M):
            state, packed = dispatch(state)
            box = [None]
            th1 = threading.Thread(
                target=fetch, args=(packed, box, 0), daemon=True
            )
            th1.start()
            threads.append(th1)
        jax.block_until_ready(state[0])
        for th1 in threads:
            th1.join()
        exec_fetch_ms = (time.time() - t0) / M * 1000.0

        # --- B2: pipelined upload + exec — fresh PCM device_put each
        # tick, dispatch immediately, block only at the end. If the
        # transport overlaps H2D with device compute this converges to
        # max(upload, exec); if it serializes, to upload + exec.
        bufs = [
            np.ascontiguousarray(
                (pcm_batch + pcm_batch.dtype.type(i % 3)).astype(
                    pcm_batch.dtype
                )
            )
            for i in range(4)
        ]
        t0 = time.time()
        for i in range(M):
            pd = jax.device_put(bufs[i % 4])
            state, packed = dispatch(state, pd)
        jax.block_until_ready(state[0])
        pipe_ms = (time.time() - t0) / M * 1000.0

        # --- B3: serving-loop order — upload issued, join oldest fetch,
        # dispatch, fetch THIS tick's packed immediately (what the
        # scheduler does today). If the blocked D2H request occupies the
        # serial tunnel while waiting on exec, the next H2D can't ride
        # during device compute and this degrades to upload + exec.
        import collections

        from rhasspy_speech_tpu.pipeline.scheduler import _AsyncFetch

        inflight = collections.deque()
        t0 = time.time()
        for i in range(M):
            pd = jax.device_put(bufs[i % 4])
            while len(inflight) >= 2:
                inflight.popleft().get()
            state, packed = dispatch(state, pd)
            inflight.append(_AsyncFetch(packed))
        while inflight:
            inflight.popleft().get()
        serve_now_ms = (time.time() - t0) / M * 1000.0

        # --- B4: deferred-fetch order — tick N's packed D2H request is
        # only issued AFTER tick N+1's upload is on the wire, so the
        # channel order is H2D(N+1) -> D2H(N, exec long done) and the
        # upload overlaps exec instead of queueing behind a waiting D2H.
        inflight = collections.deque()
        pend = None
        t0 = time.time()
        for i in range(M):
            pd = jax.device_put(bufs[i % 4])
            if pend is not None:
                inflight.append(_AsyncFetch(pend))
            while len(inflight) >= 2:
                inflight.popleft().get()
            state, packed = dispatch(state, pd)
            pend = packed
        if pend is not None:
            inflight.append(_AsyncFetch(pend))
        while inflight:
            inflight.popleft().get()
        serve_defer_ms = (time.time() - t0) / M * 1000.0

        # --- B5/B6: isolate the upload API and buffer freshness. The
        # scheduler's single-chip branch uses jnp.asarray on a FRESH
        # numpy batch each tick; the probes above use jax.device_put on
        # four reused buffers. If either difference stops the H2D from
        # overlapping device exec, serving degrades to upload + exec.
        def serve_loop(make_buf, put):
            inflight2 = collections.deque()
            nonlocal state
            t0 = time.time()
            for i in range(M):
                pd = put(make_buf(i))
                while len(inflight2) >= 2:
                    inflight2.popleft().get()
                state, packed2 = dispatch(state, pd)
                inflight2.append(_AsyncFetch(packed2))
            while inflight2:
                inflight2.popleft().get()
            return (time.time() - t0) / M * 1000.0

        import jax.numpy as _jnp

        asarray_reused_ms = serve_loop(lambda i: bufs[i % 4], _jnp.asarray)
        devput_fresh_ms = serve_loop(
            lambda i: (pcm_batch + pcm_batch.dtype.type(i % 3)).astype(
                pcm_batch.dtype
            ),
            jax.device_put,
        )

        # reused buffers, content mutated in place each tick: separates
        # pointer/registration caching (reuse fixes it) from content
        # dedupe (nothing fixes it — real PCM changes every tick)
        def mutate(i):
            b = bufs[i % 4]
            b[:, : b.shape[1] // 2] += b.dtype.type(1 + (i & 7))
            return b

        mutated_reused_ms = serve_loop(mutate, jax.device_put)

        chunk_sec = CHUNK / 16000.0
        print(
            f"lanes={lanes} chunk_out={chunk_out} chunk={chunk_sec*1000:.0f}ms  "
            f"rtt={rtt_ms:.1f}ms  h2d(pcm_meta)={h2d_ms:.1f}ms\n"
            f"fused exec/tick: {exec_ms:.1f} ms  (device-bound chunk-RTF "
            f"{exec_ms/1000/chunk_sec:.3f}, {lanes*chunk_sec*1000/exec_ms:.0f} xRT)\n"
            f"fused exec + bg fetch (packed): {exec_fetch_ms:.1f} ms\n"
            f"pipelined fresh-upload + exec: {pipe_ms:.1f} ms  "
            f"(overlap if ~max(upload, exec); serial if ~sum)\n"
            f"serving order, fetch-now: {serve_now_ms:.1f} ms "
            f"({lanes*chunk_sec*1000/serve_now_ms:.0f} xRT)\n"
            f"serving order, fetch-deferred: {serve_defer_ms:.1f} ms "
            f"({lanes*chunk_sec*1000/serve_defer_ms:.0f} xRT)\n"
            f"serving order, jnp.asarray reused buf: {asarray_reused_ms:.1f} ms\n"
            f"serving order, device_put fresh buf: {devput_fresh_ms:.1f} ms\n"
            f"serving order, device_put reused buf mutated in place: "
            f"{mutated_reused_ms:.1f} ms"
        )
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


if __name__ == "__main__":
    main()
