"""Batched streaming scheduler tests."""

import numpy as np

from rhasspy_speech_tpu.const import LangSuffix
from rhasspy_speech_tpu.pipeline import lang_dir_name
from rhasspy_speech_tpu.pipeline.scheduler import StreamScheduler
from rhasspy_speech_tpu.testing import synthesize_sentence

from tests.test_pipeline import profile_and_train  # fixture reuse  # noqa: F401


def test_scheduler_many_streams(profile_and_train):  # noqa: F811
    profile, train_dir = profile_and_train
    sched = StreamScheduler(
        profile.model_dir,
        train_dir / lang_dir_name(LangSuffix.GRAMMAR),
        max_streams=8,
    )

    texts = [
        "turn on the light",
        "never mind",
        "turn off the fan",
        "turn on fan",
        "turn off light",
        "never mind",
    ]
    pcms = [synthesize_sentence(profile, t, seed=100 + i) for i, t in enumerate(texts)]
    sids = [sched.open_stream() for _ in texts]
    assert all(s >= 0 for s in sids)

    # interleaved feeding in 1024-sample chunks (like the reference's online
    # decoder, online2-cli-nnet3-decode-faster.cc:37)
    offsets = [0] * len(texts)
    while any(offsets[i] < pcms[i].shape[0] for i in range(len(texts))):
        for i, sid in enumerate(sids):
            if offsets[i] < pcms[i].shape[0]:
                sched.feed(sid, pcms[i][offsets[i] : offsets[i] + 1024])
                offsets[i] += 1024
        sched.step()
    for sid in sids:
        sched.finish(sid)

    for _ in range(200):
        if all(sched.poll(sid) is not None for sid in sids):
            break
        sched.step()

    for i, sid in enumerate(sids):
        result = sched.poll(sid)
        assert result == [texts[i]], (i, result, texts[i])
        sched.close(sid)

    # slots are recyclable
    sid = sched.open_stream()
    assert sid >= 0
    pcm = synthesize_sentence(profile, "never mind", seed=200)
    sched.feed(sid, pcm)
    sched.finish(sid)
    for _ in range(100):
        if sched.poll(sid) is not None:
            break
        sched.step()
    assert sched.poll(sid) == ["never mind"]


def test_scheduler_admission_limit(profile_and_train):  # noqa: F811
    profile, train_dir = profile_and_train
    sched = StreamScheduler(
        profile.model_dir,
        train_dir / lang_dir_name(LangSuffix.GRAMMAR),
        max_streams=2,
    )
    a = sched.open_stream()
    b = sched.open_stream()
    assert a >= 0 and b >= 0
    assert sched.open_stream() == -1
    sched.close(a)
    assert sched.open_stream() == a


def test_scheduler_endpointing(profile_and_train):  # noqa: F811
    """A stream with trailing silence endpoints without an explicit EOF."""
    from rhasspy_speech_tpu.pipeline.endpoint import EndpointConfig
    from rhasspy_speech_tpu.testing.synthetic import _silence_wave

    profile, train_dir = profile_and_train
    sched = StreamScheduler(
        profile.model_dir,
        train_dir / lang_dir_name(LangSuffix.GRAMMAR),
        max_streams=2,
        endpointing=EndpointConfig(),
    )
    assert sched._silence_pdfs, "silence pdfs must be derived from the model"

    rng = np.random.RandomState(0)
    speech = synthesize_sentence(profile, "never mind", seed=77)
    silence = _silence_wave(16000 * 3, rng)  # 3 s of trailing silence
    pcm = np.concatenate([speech, silence])

    sid = sched.open_stream()
    sched.feed(sid, pcm)
    # never call finish(): the endpoint rules must close the utterance
    for _ in range(100):
        if sched.poll(sid) is not None:
            break
        sched.step()
    result = sched.poll(sid)
    assert result == ["never mind"], result


def test_scheduler_lstm_per_lane_carry(tmp_path):
    """A recurrent (LSTM) chunk model runs in the scheduler with per-lane
    state; a freshly opened lane starts from zero state."""
    import json

    from rhasspy_speech_tpu.graph.dense import DenseGraph
    from rhasspy_speech_tpu.io import write_nnet3
    from rhasspy_speech_tpu.io.transition_model import KaldiTransitionModel
    from rhasspy_speech_tpu.pipeline.artifacts import LangArtifacts
    from rhasspy_speech_tpu.fst.core import SymbolTable
    from tests.test_nnet3_forward import _lstmp_spec

    rng = np.random.RandomState(3)
    spec = _lstmp_spec(rng, D=6, C=5, R=4)  # output dim 3
    tm = KaldiTransitionModel.from_monophone_chain(2)
    (tmp_path / "model" / "model").mkdir(parents=True)
    with open(tmp_path / "model" / "model" / "final.mdl", "wb") as f:
        write_nnet3(f, spec, transition_model=tm)
    with open(tmp_path / "model" / "model" / "frontend.json", "w") as f:
        json.dump({"num_mel_bins": 7, "num_ceps": 6}, f)
    (tmp_path / "model" / "model" / "frame_subsampling_factor").write_text("1")

    # trivial 1-state graph over 3 pdfs (self loops; always final)
    words = SymbolTable()
    graph = DenseGraph(
        num_states=1,
        arc_src=np.zeros(3, np.int32),
        arc_dst=np.zeros(3, np.int32),
        arc_pdf=np.arange(3, dtype=np.int32),
        arc_wseq=np.zeros(3, np.int32),
        arc_weight=np.zeros(3, np.float32),
        final_weight=np.zeros(1, np.float32),
        final_wseq=np.zeros(1, np.int32),
        init_weight=np.zeros(1, np.float32),
        init_wseq=np.zeros(1, np.int32),
        word_seqs=[()],
        num_pdfs=3,
    )
    lang_dir = tmp_path / "lang"
    LangArtifacts(words=words, graph=graph).save(lang_dir)

    # AcousticModel default subsampling is 3 but this LSTM has delay 1
    from rhasspy_speech_tpu.pipeline import scheduler as sched_mod

    sched = StreamScheduler(tmp_path / "model", lang_dir, max_streams=2)
    assert sched._recurrent
    sid = sched.open_stream()
    pcm = (1000 * np.random.RandomState(0).randn(16000)).astype(np.float32)
    sched.feed(sid, pcm)
    sched.finish(sid)
    for _ in range(50):
        if sched.poll(sid) is not None:
            break
        sched.step()
    assert sched.poll(sid) is not None


def test_scheduler_larger_chunks_same_transcripts(profile_and_train):  # noqa: F811
    """chunk_out_frames=14 (half the ticks, less context-overlap recompute)
    decodes the same transcripts as the default 7."""
    profile, train_dir = profile_and_train
    sched = StreamScheduler(
        profile.model_dir,
        train_dir / lang_dir_name(LangSuffix.GRAMMAR),
        max_streams=4,
        chunk_out_frames=14,
    )
    texts = ["turn on the light", "never mind", "turn off the fan"]
    pcms = [synthesize_sentence(profile, t, seed=300 + i) for i, t in enumerate(texts)]
    sids = [sched.open_stream() for _ in texts]
    for i, sid in enumerate(sids):
        sched.feed(sid, pcms[i])
        sched.finish(sid)
    for _ in range(200):
        if all(sched.poll(sid) is not None for sid in sids):
            break
        sched.step()
    assert [sched.poll(sid) for sid in sids] == [[t] for t in texts]


def test_scheduler_reopen_resets_device_state(profile_and_train):  # noqa: F811
    """A recycled slot (close -> open, reset folded into the next chunk
    program) decodes exactly like a fresh scheduler — stale alpha from the
    previous occupant must not leak."""
    profile, train_dir = profile_and_train
    lang = train_dir / lang_dir_name(LangSuffix.GRAMMAR)
    sched = StreamScheduler(profile.model_dir, lang, max_streams=1)

    def run(text, seed):
        sid = sched.open_stream()
        assert sid == 0
        sched.feed(sid, synthesize_sentence(profile, text, seed=seed))
        sched.finish(sid)
        for _ in range(100):
            if sched.poll(sid) is not None:
                break
            sched.step()
        out = sched.poll(sid)
        sched.close(sid)
        return out

    assert run("turn on the light", 41) == ["turn on the light"]
    assert run("never mind", 42) == ["never mind"]
    assert run("turn off the fan", 43) == ["turn off the fan"]


def test_device_endpoint_signals_match_host_walk(profile_and_train):  # noqa: F811
    """The device endpoint lane maintains trailing-silence / contains-
    nonsilence as per-state DP columns inside the decode scan; its per-
    tick [N, 3] signals must equal the host backpointer walk
    (endpoint.trailing_silence_frames) over the same decoded prefix, and
    endpointing must keep the device-resident fast path enabled."""
    from rhasspy_speech_tpu.ops.decoder import viterbi
    from rhasspy_speech_tpu.pipeline.endpoint import (
        EndpointConfig,
        EndpointRule,
        trailing_silence_frames,
    )
    from rhasspy_speech_tpu.pipeline.transcribe import AcousticModel
    from rhasspy_speech_tpu.testing.synthetic import _silence_wave

    profile, train_dir = profile_and_train
    lang = train_dir / lang_dir_name(LangSuffix.GRAMMAR)
    # rules that can never fire: observe the signals over the whole stream
    cfg = EndpointConfig(
        rules=(EndpointRule(False, 1e9, float("inf"), 1e9),)
    )
    sched = StreamScheduler(
        profile.model_dir, lang, max_streams=2, endpointing=cfg
    )
    assert sched._ep_device, "endpointing must ride the device lane"
    assert sched._device_bp and sched._device_feats, (
        "endpointing must no longer force the host backpointer path"
    )
    assert sched._silence_pdfs

    speech = synthesize_sentence(profile, "never mind", seed=5)
    silence = _silence_wave(16000, np.random.RandomState(1))
    pcm = np.concatenate([speech, silence])

    # reference: batch decode of the same audio (stream == batch is pinned
    # elsewhere), host-walked per prefix
    am = AcousticModel(profile.model_dir)
    feats = am.features(pcm[None])
    n_out = feats.shape[1] // am.subsampling
    lp = am.log_probs(feats, n_out)
    graph = sched.graph

    sid = sched.open_stream()
    sched.feed(sid, pcm)
    checked = 0
    for _ in range(60):
        if sched.slots[sid].done:
            break
        sched.step()
        if not sched._ep_stats_pending:
            continue
        entry = sched._ep_stats_pending[-1]  # newest tick's stats
        stats = entry[0].get()  # join + decode to the [N, 3] rows
        T = int(entry[2][sid])
        if T <= 0 or T > n_out:
            continue
        _alpha, bp = viterbi(sched.device_graph, lp[:, :T])
        bp = np.asarray(bp)[:, 0, :]  # [T, S]
        alpha_T = np.asarray(_alpha)[0]
        totals = alpha_T + np.asarray(graph.final_weight)
        if totals.min() < 1.0e29:
            best_state = int(np.argmin(totals))
        else:
            best_state = int(np.argmin(alpha_T))
        want_trail, want_nonsil = trailing_silence_frames(
            [bp], best_state, graph.arc_pdf, graph.arc_src,
            sched._silence_pdfs, max_back=10**9,
        )
        assert int(stats[sid, 0]) == want_trail, (T, stats[sid], want_trail)
        assert bool(stats[sid, 1] > 0.5) == want_nonsil, (T, stats[sid])
        checked += 1
    assert checked >= 5, "must have compared several prefixes"


def test_burst_fed_stream_drains_capped(profile_and_train):  # noqa: F811
    """A whole multi-second utterance fed in ONE push exceeds the
    per-tick drain cap; the leftover drains over later ticks and
    run_until_idle keeps going until the scheduler has consumed
    everything it owns."""
    from rhasspy_speech_tpu.pipeline.scheduler import _DRAIN_CAP

    profile, train_dir = profile_and_train
    sched = StreamScheduler(
        profile.model_dir,
        train_dir / lang_dir_name(LangSuffix.GRAMMAR),
        max_streams=2,
        pool_capacity_samples=16000 * 8,
    )
    pcm = synthesize_sentence(profile, "turn on the light", seed=9)
    pcm = np.tile(pcm, 2)[: 16000 * 5]  # ensure > _DRAIN_CAP samples
    assert pcm.shape[0] > _DRAIN_CAP
    sid = sched.open_stream()
    assert sched.feed(sid, pcm) == pcm.shape[0]
    sched.finish(sid)
    sched.run_until_idle()
    # the result exists (the loop did not stop on a features-only tick
    # with pool leftover) and no audio is left unconsumed
    assert sched.poll(sid) is not None
    assert sched.pool.available(sid) == 0


def test_overlong_stream_quarantined_not_fatal(profile_and_train):  # noqa: F811
    """A single stream outliving the device rings (sized from
    pool_capacity_samples) must NOT raise out of the shared serving tick:
    the offending lane is force-finalized with error() set while every
    other in-flight lane keeps decoding to a correct transcript."""
    profile, train_dir = profile_and_train
    sched = StreamScheduler(
        profile.model_dir,
        train_dir / lang_dir_name(LangSuffix.GRAMMAR),
        max_streams=2,
        pool_capacity_samples=16000 * 2,  # 2 s rings
    )
    long_pcm = np.tile(
        synthesize_sentence(profile, "turn on the light", seed=11), 6
    )
    assert long_pcm.shape[0] > 16000 * 4  # well past the ring capacity
    short_pcm = synthesize_sentence(profile, "never mind", seed=12)

    a = sched.open_stream()
    b = sched.open_stream()
    offs = {a: 0, b: 0}
    pcms = {a: long_pcm, b: short_pcm}
    # interleaved 1024-sample feeds, honoring partial accepts from the
    # bounded pool
    for _ in range(3000):
        fed_any = False
        for sid in (a, b):
            off, pcm = offs[sid], pcms[sid]
            if off < pcm.shape[0]:
                got = sched.feed(sid, pcm[off : off + 1024])
                offs[sid] = off + got
                fed_any = True
        sched.step()
        if sched.slots[a].done and not fed_any:
            break
        if not fed_any:
            for sid in (a, b):
                if not sched.pool.is_finished(sid):
                    sched.finish(sid)
    for sid in (a, b):
        if not sched.pool.is_finished(sid):
            sched.finish(sid)
    for _ in range(300):
        if all(sched.poll(sid) is not None for sid in (a, b)):
            break
        sched.step()

    # the overlong lane was quarantined, not raised
    assert sched.error(a) is not None
    assert "pool_capacity_samples" in sched.error(a)
    assert sched.poll(a) is not None  # partial (possibly empty) result
    # the well-behaved lane is unaffected
    assert sched.error(b) is None
    assert sched.poll(b) == ["never mind"]


def test_close_ticket_result_survives_recycle(profile_and_train):  # noqa: F811
    """A done lane closed BEFORE its async finalize trace lands must
    still deliver its transcript — via close()'s (sid, gen) ticket and
    take_result — and the slot must be immediately reusable by a new
    stream that decodes exactly (serving loops recycle lanes the moment
    the endpoint fires instead of idling them until the trace D2H)."""
    profile, train_dir = profile_and_train
    lang = train_dir / lang_dir_name(LangSuffix.GRAMMAR)
    sched = StreamScheduler(profile.model_dir, lang, max_streams=1)

    first = "turn on the light"
    sid = sched.open_stream()
    sched.feed(sid, synthesize_sentence(profile, first, seed=71))
    sched.finish(sid)
    # step until the lane is DONE (finalize dispatched) but do not poll:
    # the trace may still be in flight
    for _ in range(100):
        sched.step()
        if sched.slots[sid].done:
            break
    assert sched.slots[sid].done
    ticket = sched.close(sid)

    # recycle immediately: the second stream decodes exactly
    second = "never mind"
    sid2 = sched.open_stream()
    assert sid2 == sid  # single slot: genuinely recycled
    sched.feed(sid2, synthesize_sentence(profile, second, seed=72))
    sched.finish(sid2)
    for _ in range(100):
        if sched.poll(sid2) is not None:
            break
        sched.step()
    assert sched.poll(sid2) == [second]

    # the first stream's result is redeemable exactly once
    got = sched.take_result(ticket, block=True)
    assert got == [first], got
    assert sched.take_result(ticket) is None


def test_close_ticket_result_already_landed(profile_and_train):  # noqa: F811
    """close() after the result landed snapshots it into the retired
    store: the ticket still redeems (uniform serving-loop flow whether
    or not the trace won the race with close)."""
    profile, train_dir = profile_and_train
    lang = train_dir / lang_dir_name(LangSuffix.GRAMMAR)
    sched = StreamScheduler(profile.model_dir, lang, max_streams=2)
    text = "turn off the fan"
    sid = sched.open_stream()
    sched.feed(sid, synthesize_sentence(profile, text, seed=73))
    sched.finish(sid)
    for _ in range(100):
        if sched.poll(sid) is not None:
            break
        sched.step()
    assert sched.poll(sid) == [text]
    ticket = sched.close(sid)
    assert sched.take_result(ticket) == [text]
    assert sched.take_result(ticket) is None
