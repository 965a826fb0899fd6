"""4-bit block-ADPCM serving-wire tests: codec contract (stability,
causality, quality), numpy==device==native parity, and end-to-end
scheduler transcripts over the wire."""

import numpy as np
import pytest

from rhasspy_speech_tpu.ops import adpcm

from tests.test_pipeline import profile_and_train  # fixture reuse  # noqa: F401

BLOCK = 160


def _encode(x: np.ndarray, block: int = BLOCK):
    """One-lane helper: pad to whole blocks, return (bytes, recon)."""
    n = x.shape[0]
    w = -(-n // block) * block
    samples = np.zeros((1, w), dtype=np.float32)
    samples[0, :n] = x
    out = np.zeros((1, (w // block) * adpcm.block_bytes(block)), np.uint8)
    adpcm.encode_blocks(samples, np.array([n]), block, out)
    return out, samples  # recon in place


def test_codec_quality_and_exact_integers():
    """Speech-scale signal reconstructs with usable SNR; recon values
    are exact integers (f32-representable int16 range)."""
    rng = np.random.RandomState(0)
    t = np.arange(16000, dtype=np.float32) / 16000.0
    x = (
        6000 * np.sin(2 * np.pi * 220 * t)
        + 2500 * np.sin(2 * np.pi * 800 * t + 1.0)
        + 400 * rng.randn(16000)
    ).astype(np.float32)
    enc, recon = _encode(x)
    r = recon[0, : x.shape[0]]
    assert (r == np.rint(r)).all()
    err = x - r
    snr = 10 * np.log10(float(np.mean(x**2)) / float(np.mean(err**2)))
    assert snr > 18.0, snr
    # numpy decode of the wire bytes == the encoder's reconstruction
    dec = adpcm.decode_blocks(enc, BLOCK)
    np.testing.assert_array_equal(dec, recon)


def test_stability_reencode_recon():
    """THE wire contract: re-encoding decoded values reproduces both the
    bytes and the decoded values (frame-overlap tails re-encoded across
    ticks never drift) — including clipping-range extremes."""
    rng = np.random.RandomState(1)
    sigs = [
        (rng.randn(5 * BLOCK) * 3000).astype(np.float32),
        # slams the int16 rails: predictor clipping engaged
        np.clip(
            np.cumsum(rng.randn(5 * BLOCK)) * 9000, -40000, 40000
        ).astype(np.float32),
        np.zeros(2 * BLOCK, dtype=np.float32),
        np.full(2 * BLOCK, 32767.0, dtype=np.float32),
        np.full(2 * BLOCK, -32768.0, dtype=np.float32),
    ]
    for x in sigs:
        enc1, recon1 = _encode(x)
        enc2, recon2 = _encode(recon1[0])
        np.testing.assert_array_equal(recon2, recon1)
        np.testing.assert_array_equal(enc2, enc1)


def test_causality_partial_block_extension():
    """Nibbles already emitted for a partially-filled block don't change
    when the block fills next tick (zero-padded first pass)."""
    rng = np.random.RandomState(2)
    x = (rng.randn(3 * BLOCK) * 4000).astype(np.float32)
    for k in (BLOCK + 1, BLOCK + 37, 2 * BLOCK + 159):
        _enc_k, recon_k = _encode(x[:k])
        _enc_f, recon_f = _encode(x)
        np.testing.assert_array_equal(recon_f[0, :k], recon_k[0, :k])


def test_device_decode_matches_numpy():
    import jax

    rng = np.random.RandomState(3)
    x = (rng.randn(4, 5 * BLOCK) * 5000).astype(np.float32)
    samples = x.copy()
    nb = samples.shape[1] // BLOCK
    out = np.zeros((4, nb * adpcm.block_bytes(BLOCK)), np.uint8)
    adpcm.encode_blocks(
        samples, np.array([5 * BLOCK, 3 * BLOCK + 17, 0, BLOCK]), BLOCK, out
    )
    dev = jax.jit(adpcm.decode_blocks_jnp, static_argnums=1)(out, BLOCK)
    np.testing.assert_array_equal(
        np.asarray(dev), adpcm.decode_blocks(out, BLOCK)
    )


def test_native_encode_matches_python():
    """The native drain encoder must agree byte-for-byte (and recon-
    for-recon) with ops.adpcm — the device decodes the native bytes."""
    from rhasspy_speech_tpu.native import runtime as rt

    lib = rt.get_runtime().lib
    if lib is None or not hasattr(lib, "rss_adpcm_encode_blocks"):
        pytest.skip("native runtime without adpcm encoder")
    rng = np.random.RandomState(4)
    W = 6 * BLOCK
    samples = (rng.randn(3, W) * 6000).astype(np.float32)
    samples[1] = np.clip(np.cumsum(rng.randn(W)) * 9000, -40000, 40000)
    lens = np.array([W, 4 * BLOCK + 31, 0], dtype=np.int64)
    nb = W // BLOCK
    ref_s = samples.copy()
    ref_o = np.zeros((3, nb * adpcm.block_bytes(BLOCK) + 5), np.uint8)
    adpcm.encode_blocks(ref_s, lens, BLOCK, ref_o[:, :-5])
    nat_s = samples.copy()
    nat_o = np.zeros_like(ref_o)
    rt.adpcm_encode_into(nat_s, lens, BLOCK, nat_o[:, :-5])
    np.testing.assert_array_equal(nat_o, ref_o)
    np.testing.assert_array_equal(nat_s, ref_s)


def test_scheduler_adpcm_wire(profile_and_train):  # noqa: F811
    """End-to-end over the 4-bit wire: interleaved feeding, exact
    transcripts, steady ticks still dispatch ONE device program."""
    from rhasspy_speech_tpu.const import LangSuffix
    from rhasspy_speech_tpu.pipeline import lang_dir_name
    from rhasspy_speech_tpu.pipeline.scheduler import StreamScheduler
    from rhasspy_speech_tpu.testing import synthesize_sentence

    profile, train_dir = profile_and_train
    sched = StreamScheduler(
        profile.model_dir,
        train_dir / lang_dir_name(LangSuffix.GRAMMAR),
        max_streams=4,
        wire="adpcm",
    )
    assert sched._wire_adpcm, "adpcm wire requires the fused device path"

    texts = ["turn on the light", "never mind", "turn off the fan"]
    pcms = [
        synthesize_sentence(profile, t, seed=500 + i)
        for i, t in enumerate(texts)
    ]
    sids = [sched.open_stream() for _ in texts]
    offsets = [0] * len(texts)
    steady_ticks = 0
    steady_dispatches = 0
    while any(offsets[i] < pcms[i].shape[0] for i in range(len(texts))):
        for i, sid in enumerate(sids):
            if offsets[i] < pcms[i].shape[0]:
                sched.feed(sid, pcms[i][offsets[i] : offsets[i] + 4096])
                offsets[i] += 4096
        before = sched.device_dispatches
        lanes = sched.step()
        if lanes:
            steady_ticks += 1
            steady_dispatches += sched.device_dispatches - before
    for sid in sids:
        sched.finish(sid)
    for _ in range(200):
        if all(sched.poll(sid) is not None for sid in sids):
            break
        sched.step()
    for i, sid in enumerate(sids):
        assert sched.poll(sid) == [texts[i]], (i, sched.poll(sid))
    assert steady_ticks > 0
    assert steady_dispatches <= steady_ticks


def test_scheduler_adpcm_arrival_invariance(profile_and_train):  # noqa: F811
    """THE wire property end-to-end: arrival timing must not change
    transcripts. Random dribbles/bursts move the per-tick drain
    boundaries, so frame-overlap tails are re-encoded at different
    cut points — the stability contract says the decoded stream (and
    therefore every transcript) is identical to all-at-once feeding."""
    from rhasspy_speech_tpu.const import LangSuffix
    from rhasspy_speech_tpu.pipeline import lang_dir_name
    from rhasspy_speech_tpu.pipeline.scheduler import StreamScheduler
    from rhasspy_speech_tpu.testing import synthesize_sentence

    profile, train_dir = profile_and_train
    graph_dir = train_dir / lang_dir_name(LangSuffix.GRAMMAR)
    texts = ["turn on the light", "never mind"]
    pcms = {
        t: synthesize_sentence(profile, t, seed=700 + i)
        for i, t in enumerate(texts)
    }

    def once(feed_plan):
        sched = StreamScheduler(
            profile.model_dir, graph_dir, max_streams=2, wire="adpcm"
        )
        sids = {t: sched.open_stream() for t in texts}
        offs = {t: 0 for t in texts}
        rng = np.random.RandomState(feed_plan)
        for _ in range(600):
            for t in texts:
                pcm = pcms[t]
                if offs[t] < len(pcm):
                    n = (
                        len(pcm)
                        if feed_plan is None
                        else int(rng.choice([400, 1024, 3360, 20000]))
                    )
                    sched.feed(sids[t], pcm[offs[t] : offs[t] + n])
                    offs[t] += n
                    if offs[t] >= len(pcm):
                        sched.finish(sids[t])
            sched.step()
            if all(sched.poll(sids[t]) is not None for t in texts):
                break
        return {t: sched.poll(sids[t]) for t in texts}

    want = once(None)  # all-at-once
    assert want == {t: [t] for t in texts}, want
    for seed in (11, 12):
        assert once(seed) == want, seed


def test_scheduler_adpcm_pitch_ivector(tmp_path):
    """The 4-bit wire coexists with the on-tick pitch lane + inline
    i-vector (the decoded PCM feeds the device pitch history ring)."""
    from rhasspy_speech_tpu.pipeline.scheduler import StreamScheduler
    from rhasspy_speech_tpu.testing import synthesize_sentence

    from tests.test_stream_ivector import _train

    profile, graph_dir = _train(
        tmp_path, with_ivector=True, with_pitch=True, with_context=True
    )
    sched = StreamScheduler(
        profile.model_dir, graph_dir, max_streams=4, wire="adpcm"
    )
    assert sched._wire_adpcm and sched._pitch_device
    texts = ["turn on light", "turn off light"]
    sids = []
    for i, t in enumerate(texts):
        pcm = synthesize_sentence(profile, t, seed=60 + i)
        sid = sched.open_stream()
        sched.feed(sid, pcm)
        sched.finish(sid)
        sids.append(sid)
    sched.run_until_idle()
    for sid, want in zip(sids, texts):
        assert sched.poll(sid) == [want]
