"""Cross-path dispatch-count regression guards (VERDICT r4 item 8).

The r4 tick rework added optimization barriers for streaming and the
batch RTF drifted in the same round with nothing catching it until the
end-of-round capture. These tests pin the NUMBER of device programs each
path runs, on CPU with the small synthetic profile — a structural change
that adds a per-lane, per-stage, or per-frame dispatch (each one a full
round trip on remote-dispatch transports) fails here immediately.
"""

import numpy as np

from rhasspy_speech_tpu.const import LangSuffix
from rhasspy_speech_tpu.pipeline import lang_dir_name
from rhasspy_speech_tpu.pipeline.scheduler import StreamScheduler
from rhasspy_speech_tpu.testing import synthesize_sentence

from tests.test_pipeline import profile_and_train  # fixture reuse  # noqa: F401


class _ExecCounter:
    """Counts XLA executable invocations via pxla.ExecuteReplicated."""

    def __init__(self):
        self.count = 0

    def __enter__(self):
        from jax._src.interpreters import pxla

        self._pxla = pxla
        self._orig = pxla.ExecuteReplicated.__call__
        counter = self

        def patched(exe_self, *a, **k):
            counter.count += 1
            return counter._orig(exe_self, *a, **k)

        pxla.ExecuteReplicated.__call__ = patched
        return self

    def __exit__(self, *exc):
        self._pxla.ExecuteReplicated.__call__ = self._orig
        return False


def test_serving_tick_is_one_dispatch(profile_and_train):  # noqa: F811
    """A steady-state serving tick on the fused device-feats path must
    dispatch EXACTLY ONE device program (PCM + meta in, packed out)."""
    profile, train_dir = profile_and_train
    sched = StreamScheduler(
        profile.model_dir,
        train_dir / lang_dir_name(LangSuffix.GRAMMAR),
        max_streams=4,
    )
    assert sched._device_feats, "fused path must be active"
    pcm = np.tile(synthesize_sentence(profile, "turn on the light", seed=3), 20)
    chunk = sched._chunk_in * 160
    sids = [sched.open_stream() for _ in range(4)]
    offs = [0] * 4
    # prime every lane well past the AM window lookahead (2 chunks/tick
    # builds surplus) so the measured ticks are all decode-ready
    for _ in range(4):
        for i, sid in enumerate(sids):
            sched.feed(sid, pcm[offs[i] : offs[i] + 2 * chunk])
            offs[i] += 2 * chunk
        sched.step()
    before = sched.device_dispatches
    n = 4
    for _ in range(n):
        for i, sid in enumerate(sids):
            sched.feed(sid, pcm[offs[i] : offs[i] + chunk])
            offs[i] += chunk
        sched.step()
    assert sched.device_dispatches - before == n, (
        "steady serving tick must stay ONE device dispatch, got "
        f"{(sched.device_dispatches - before) / n} per tick"
    )


def test_batch_transcribe_dispatch_count(profile_and_train):  # noqa: F811
    """The batch WAV path runs a bounded number of XLA executions per
    call: features+AM (1 per pitch stage at most 3: mfcc, pitch, fwd)
    and one decode program, plus the on-device backtrace folded into
    decode. Pin a generous structural bound — a per-frame or per-stream
    dispatch regression blows far past it."""
    from rhasspy_speech_tpu.pipeline import Nnet3WavTranscriber

    profile, train_dir = profile_and_train
    t = Nnet3WavTranscriber(
        profile.model_dir, train_dir / lang_dir_name(LangSuffix.GRAMMAR)
    )
    pcms = [
        synthesize_sentence(profile, "turn on the light", seed=11),
        synthesize_sentence(profile, "never mind", seed=12),
        synthesize_sentence(profile, "turn off the fan", seed=13),
        synthesize_sentence(profile, "turn on the light", seed=14),
    ]
    t.transcribe_pcm_batch(pcms)  # compile warm-up
    with _ExecCounter() as c:
        out = t.transcribe_pcm_batch(pcms)
    assert len(out) == 4 and all(o for o in out)
    # measured today: a handful of programs (front, AM, decode, small
    # host-side conversions). 12 = headroom for dtype/layout helpers,
    # NOT for per-stream or per-frame dispatch loops (4 streams x T
    # frames would be hundreds).
    assert c.count <= 12, f"batch transcribe dispatched {c.count} programs"
