"""G.711 mu-law serving-wire tests: codec contract, native encode
parity, and end-to-end scheduler transcripts over the 8-bit wire."""

import numpy as np
import pytest

from rhasspy_speech_tpu.ops import mulaw

from tests.test_pipeline import profile_and_train  # fixture reuse  # noqa: F401


def test_codec_contract():
    x = np.arange(-32768, 32768, dtype=np.int16)
    enc = mulaw.encode_i16(x)
    dec = mulaw.decode_u8(enc)

    # truncating-quantizer error bound: below one segment step inside
    # the clip range (Sun g711.c layout: bias 0x84, clip 32635)
    mag = np.minimum(np.abs(x.astype(np.int32)), 32635) + 0x84
    exp = (np.floor(np.log2(mag)).astype(np.int32) - 7).clip(0, 7)
    step = (1 << (exp + 3)).astype(np.float32)
    inr = np.abs(x) <= 32635
    assert (np.abs(dec - x)[inr] < step[inr]).all()

    # decoded-value stability: re-encoding a decoded sample reproduces
    # the same decoded value for EVERY codeword (frame overlaps carried
    # across ticks never drift) — the one codeword collision is -0
    b = np.arange(256, dtype=np.uint8)
    d1 = mulaw.decode_u8(b)
    assert (mulaw.decode_u8(mulaw.encode_f32(d1)) == d1).all()
    flips = b[mulaw.encode_f32(d1) != b]
    assert flips.tolist() == [0x7F]  # -0 re-encodes as +0

    # sign symmetry and zero
    assert mulaw.decode_u8(mulaw.encode_i16(np.int16(0).reshape(1)))[0] == 0.0
    assert (
        mulaw.decode_u8(mulaw.encode_i16(np.int16(-1000).reshape(1)))[0]
        == -mulaw.decode_u8(mulaw.encode_i16(np.int16(1000).reshape(1)))[0]
    )


def test_device_decode_matches_numpy():
    import jax

    b = np.arange(256, dtype=np.uint8).reshape(2, 128)
    dev = jax.jit(mulaw.decode_u8_jnp)(b)
    np.testing.assert_array_equal(np.asarray(dev), mulaw.decode_u8(b))


def test_native_encode_matches_python():
    """The native drain's in-copy G.711 encoder must agree byte-for-byte
    with ops.mulaw (the device decodes with ops.mulaw's table)."""
    from rhasspy_speech_tpu.native.runtime import StreamPool, get_runtime

    lib = get_runtime().lib
    if lib is None or not hasattr(lib, "rss_pool_read_all_mulaw"):
        pytest.skip("native runtime without mulaw drain")
    pool = StreamPool(2, capacity_samples=16000)
    a = pool.open()
    b = pool.open()
    rng = np.random.RandomState(3)
    pcm_a = (rng.randn(4000) * 8000).astype(np.int16)
    pcm_b = (rng.randn(3000) * 300).astype(np.float32)  # non-exact floats
    pool.feed(a, pcm_a)
    pool.feed(b, pcm_b)
    out = np.zeros((2, 4100), dtype=np.uint8)
    pool.read_into(
        out,
        np.array([7, 0], dtype=np.int64),
        np.array([4000, 3000], dtype=np.int64),
    )
    np.testing.assert_array_equal(out[0, 7:4007], mulaw.encode_i16(pcm_a))
    np.testing.assert_array_equal(out[1, :3000], mulaw.encode_f32(pcm_b))
    assert (out[0, :7] == 0).all() and (out[0, 4007:] == 0).all()


def test_scheduler_mulaw_wire(profile_and_train):  # noqa: F811
    """End-to-end over the 8-bit wire: interleaved feeding, exact
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
        wire="mulaw",
    )
    assert sched._wire_mulaw, "mulaw wire requires the fused device path"

    texts = ["turn on the light", "never mind", "turn off the fan"]
    pcms = [
        synthesize_sentence(profile, t, seed=300 + i)
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
    # the wire must not add dispatches: one fused program per decode tick
    assert steady_ticks > 0
    assert steady_dispatches <= steady_ticks


def test_scheduler_mulaw_pitch_ivector(tmp_path):
    """The 8-bit wire coexists with the on-tick pitch lane + inline
    i-vector (the decoded PCM feeds the device pitch history ring)."""
    from rhasspy_speech_tpu.pipeline.scheduler import StreamScheduler
    from rhasspy_speech_tpu.testing import synthesize_sentence

    from tests.test_stream_ivector import _train

    profile, graph_dir = _train(
        tmp_path, with_ivector=True, with_pitch=True, with_context=True
    )
    sched = StreamScheduler(
        profile.model_dir, graph_dir, max_streams=4, wire="mulaw"
    )
    assert sched._wire_mulaw and sched._pitch_device
    texts = ["turn on light", "turn off light"]
    sids = []
    for i, t in enumerate(texts):
        pcm = synthesize_sentence(profile, t, seed=40 + i)
        sid = sched.open_stream()
        sched.feed(sid, pcm)
        sched.finish(sid)
        sids.append(sid)
    sched.run_until_idle()
    for sid, want in zip(sids, texts):
        assert sched.poll(sid) == [want]


def test_scheduler_mulaw_invalid_wire(profile_and_train):  # noqa: F811
    from rhasspy_speech_tpu.const import LangSuffix
    from rhasspy_speech_tpu.pipeline import lang_dir_name
    from rhasspy_speech_tpu.pipeline.scheduler import StreamScheduler

    profile, train_dir = profile_and_train
    with pytest.raises(ValueError, match="wire"):
        StreamScheduler(
            profile.model_dir,
            train_dir / lang_dir_name(LangSuffix.GRAMMAR),
            max_streams=1,
            wire="opus",
        )
