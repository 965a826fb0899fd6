"""CLI tests (in-process main())."""

import json

import numpy as np
import yaml

from rhasspy_speech_tpu.cli import main
from rhasspy_speech_tpu.testing import build_synthetic_profile, synthesize_sentence


def test_cli_train_and_transcribe(tmp_path, capsys):
    lexicon = {"open": ["ow", "p"], "door": ["d", "ao", "r"]}
    profile = build_synthetic_profile(tmp_path / "model", lexicon)

    sentences = tmp_path / "sentences.yaml"
    sentences.write_text(yaml.safe_dump({
        "language": "en",
        "intents": {"M": {"data": [{"sentences": ["open [door]"]}]}},
    }))

    rc = main([
        "train", "--language", "en", "--sentences", str(sentences),
        "--model-dir", str(tmp_path / "model"),
        "--train-dir", str(tmp_path / "train"),
        "--lang-suffixes", "grammar",
    ])
    assert rc == 0
    assert (tmp_path / "train" / "lang_grammar" / "graph.npz").exists()

    import wave

    pcm = synthesize_sentence(profile, "open door", seed=1)
    wav = tmp_path / "u.wav"
    with wave.open(str(wav), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(pcm.astype(np.int16).tobytes())

    capsys.readouterr()
    rc = main([
        "transcribe", str(wav),
        "--model-dir", str(tmp_path / "model"),
        "--graph-dir", str(tmp_path / "train" / "lang_grammar"),
    ])
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()[-1]
    record = json.loads(out)
    assert record["text"] == "open door"


def test_cli_warmup(tmp_path, capsys):
    lexicon = {"open": ["ow", "p"], "door": ["d", "ao", "r"]}
    build_synthetic_profile(tmp_path / "model", lexicon)
    sentences = tmp_path / "sentences.yaml"
    sentences.write_text(yaml.safe_dump({
        "language": "en",
        "intents": {"M": {"data": [{"sentences": ["open door"]}]}},
    }))
    assert main([
        "train", "--language", "en", "--sentences", str(sentences),
        "--model-dir", str(tmp_path / "model"),
        "--train-dir", str(tmp_path / "train"),
        "--lang-suffixes", "grammar",
    ]) == 0
    rc = main([
        "warmup",
        "--model-dir", str(tmp_path / "model"),
        "--graph-dir", str(tmp_path / "train" / "lang_grammar"),
        "--batch", "2", "--seconds", "1.0",
    ])
    assert rc == 0
    blobs = list((tmp_path / "train" / "lang_grammar" / "aot").glob(
        "*.jaxexport"
    ))
    assert len(blobs) >= 3, blobs
