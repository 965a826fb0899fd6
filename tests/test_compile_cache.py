"""Persistent compilation cache: a second serving process reuses the first
process's compiled XLA programs (VERDICT r2 item 4 — kill the cold start).

The reference's decoder is AOT-compiled C++ (no per-process compile cost);
the TPU-native equivalent is persisting XLA executables across processes.
"""

import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

DRIVE = r"""
import logging, sys, time
sys.path.insert(0, {repo!r})
logging.basicConfig(stream=sys.stderr, level=logging.INFO)
for name in ("jax._src.lru_cache", "jax._src.compilation_cache"):
    logging.getLogger(name).setLevel(logging.DEBUG)

# The axon TPU plugin overrides JAX_PLATFORMS=cpu at interpreter start;
# re-pin the selection (NOT just the default device) so jax.devices()
# never initializes the tunnel backend — a dead tunnel would hang here.
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_device", jax.devices("cpu")[0])

from rhasspy_speech_tpu.const import LangSuffix
from rhasspy_speech_tpu.pipeline import Nnet3WavTranscriber, lang_dir_name
from rhasspy_speech_tpu.pipeline.train import train_model_sync
from rhasspy_speech_tpu.testing import build_synthetic_profile, synthesize_sentence

root = {root!r}
lexicon = {{"turn": ["t", "er", "n"], "on": ["aa", "n"], "light": ["l", "ay", "t"]}}
profile = build_synthetic_profile(root + "/m", lexicon)
train_model_sync(
    "en",
    {{"language": "en",
      "intents": {{"M": {{"data": [{{"sentences": ["turn on light"]}}]}}}}}},
    root + "/t", profile.model_dir, lang_suffixes=[LangSuffix.GRAMMAR],
)
t0 = time.time()
t = Nnet3WavTranscriber(
    profile.model_dir, root + "/t/" + lang_dir_name(LangSuffix.GRAMMAR)
)
pcm = synthesize_sentence(profile, "turn on light", seed=1)
assert t.transcribe_pcm_batch([pcm])[0] == ["turn on light"]
print("TTFT", time.time() - t0)
"""


def _run(tmp_path, cache_dir):
    env = dict(os.environ)
    env.update(
        JAX_PLATFORMS="cpu",
        RSTPU_COMPILE_CACHE_DIR=str(cache_dir),
        # The cache self-disables on a CPU backend (XLA:CPU AOT reload is
        # unreliable); force it here — a private tmp dir written and read
        # by two identically-configured processes — purely to exercise the
        # persistence machinery without a TPU.
        RSTPU_COMPILE_CACHE_CPU="1",
    )
    env.pop("RSTPU_NO_COMPILE_CACHE", None)
    script = DRIVE.format(repo=str(REPO), root=str(tmp_path))
    proc = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True,
        text=True,
        env=env,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    return proc.stdout + proc.stderr


def test_second_process_hits_persistent_cache(tmp_path):
    cache_dir = tmp_path / "xla_cache"
    out1 = _run(tmp_path / "p1", cache_dir)
    entries = list(cache_dir.glob("*"))
    assert entries, "first process persisted no compiled programs"
    assert "Cache hit for key" not in out1  # fresh dir: all misses

    out2 = _run(tmp_path / "p2", cache_dir)
    assert "Cache hit for key" in out2, out2[-4000:]
