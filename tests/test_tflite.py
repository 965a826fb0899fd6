"""TFLite flatbuffer reader + Coqui model converter (VERDICT item 7).

Round-trips real flatbuffers (built by the spec-faithful fixture writer)
through the reader, maps DeepSpeech-named weights onto the CTC layout, and
drives a model.tflite-only Coqui dir through the full transcriber.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from rhasspy_speech_tpu.io.tflite import (
    build_tflite,
    convert_coqui_tflite,
    coqui_params_from_tflite,
    read_tflite,
)
from rhasspy_speech_tpu.models.ctc import CtcModel


def test_flatbuffer_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    weights = {
        "layer_1/weights": rng.randn(26, 16).astype(np.float32),
        "layer_1/bias": rng.randn(16).astype(np.float32),
        "some/int/tensor": np.arange(12, dtype=np.int32).reshape(3, 4),
    }
    blob = build_tflite(weights, input_shape=[1, 8, 19, 26], alphabet="ab\n")
    path = tmp_path / "m.tflite"
    path.write_bytes(blob)

    model = read_tflite(path)
    named = model.by_name()
    for name, arr in weights.items():
        got = named[name]
        assert got.shape == arr.shape
        np.testing.assert_array_equal(got.data, arr)
    assert named["input_node"].shape == (1, 8, 19, 26)
    assert named["input_node"].data is None  # empty buffer
    assert model.inputs == [len(weights) + 1]  # after the alphabet tensor
    assert named["metadata_alphabet"].data.tobytes() == b"ab\n"


def test_reader_rejects_non_tflite(tmp_path):
    bad = tmp_path / "bad.tflite"
    bad.write_bytes(b"\x00\x00\x00\x00NOPE rest of file")
    with pytest.raises(ValueError, match="TFL3"):
        read_tflite(bad)


def _deepspeech_weights(rng, n_input=26, context=4, hidden=12, labels=7):
    d_in = n_input * (2 * context + 1)
    w = {
        "layer_1/weights": rng.randn(d_in, hidden).astype(np.float32),
        "layer_1/bias": rng.randn(hidden).astype(np.float32),
        "layer_2/weights": rng.randn(hidden, hidden).astype(np.float32),
        "layer_2/bias": rng.randn(hidden).astype(np.float32),
        "layer_3/weights": rng.randn(hidden, hidden).astype(np.float32),
        "layer_3/bias": rng.randn(hidden).astype(np.float32),
        "cudnn_lstm/rnn/multi_rnn_cell/cell_0/cudnn_compatible_lstm_cell/kernel":
            rng.randn(2 * hidden, 4 * hidden).astype(np.float32),
        "cudnn_lstm/rnn/multi_rnn_cell/cell_0/cudnn_compatible_lstm_cell/bias":
            rng.randn(4 * hidden).astype(np.float32),
        "layer_5/weights": rng.randn(hidden, hidden).astype(np.float32),
        "layer_5/bias": rng.randn(hidden).astype(np.float32),
        "layer_6/weights": rng.randn(hidden, labels).astype(np.float32),
        "layer_6/bias": rng.randn(labels).astype(np.float32),
    }
    return w, d_in


def test_coqui_param_mapping(tmp_path):
    rng = np.random.RandomState(1)
    weights, _ = _deepspeech_weights(rng, context=4)
    blob = build_tflite(
        weights, input_shape=[1, 16, 9, 26], alphabet="a\nb\nc\n"
    )
    path = tmp_path / "model.tflite"
    path.write_bytes(blob)

    params, context, alphabet = coqui_params_from_tflite(read_tflite(path))
    assert context == 4
    assert alphabet == "a\nb\nc\n"
    np.testing.assert_array_equal(params["dense1_w"], weights["layer_1/weights"])
    np.testing.assert_array_equal(params["dense3_b"], weights["layer_3/bias"])
    np.testing.assert_array_equal(params["post1_w"], weights["layer_5/weights"])
    np.testing.assert_array_equal(params["out_w"], weights["layer_6/weights"])
    assert params["lstm_kernel"].shape == (24, 48)
    assert float(params["lstm_forget_bias"]) == 0.0  # cudnn-baked biases


def test_converted_forward_matches_manual(tmp_path):
    """The converted CtcModel's forward equals a hand-assembled one."""
    rng = np.random.RandomState(2)
    weights, _d_in = _deepspeech_weights(rng, context=3, hidden=10, labels=5)
    path = tmp_path / "model.tflite"
    path.write_bytes(build_tflite(weights, input_shape=[1, 12, 7, 26]))

    npz = tmp_path / "model.npz"
    converted = convert_coqui_tflite(path, npz_path=npz)
    reloaded = CtcModel.load(str(npz))

    manual = CtcModel(
        params={
            "dense1_w": jnp.asarray(weights["layer_1/weights"]),
            "dense1_b": jnp.asarray(weights["layer_1/bias"]),
            "dense2_w": jnp.asarray(weights["layer_2/weights"]),
            "dense2_b": jnp.asarray(weights["layer_2/bias"]),
            "dense3_w": jnp.asarray(weights["layer_3/weights"]),
            "dense3_b": jnp.asarray(weights["layer_3/bias"]),
            "lstm_kernel": jnp.asarray(
                weights[
                    "cudnn_lstm/rnn/multi_rnn_cell/cell_0/"
                    "cudnn_compatible_lstm_cell/kernel"
                ]
            ),
            "lstm_bias": jnp.asarray(
                weights[
                    "cudnn_lstm/rnn/multi_rnn_cell/cell_0/"
                    "cudnn_compatible_lstm_cell/bias"
                ]
            ),
            "lstm_forget_bias": jnp.asarray(0.0),
            "post1_w": jnp.asarray(weights["layer_5/weights"]),
            "post1_b": jnp.asarray(weights["layer_5/bias"]),
            "out_w": jnp.asarray(weights["layer_6/weights"]),
            "out_b": jnp.asarray(weights["layer_6/bias"]),
        },
        num_labels=5,
        context=3,
        has_lstm=True,
    )

    feats = jnp.asarray(rng.randn(2, 12, 26).astype(np.float32))
    want = np.asarray(manual.forward(feats))
    np.testing.assert_allclose(np.asarray(converted.forward(feats)), want, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(reloaded.forward(feats)), want, rtol=1e-6)
    assert reloaded.context == 3 and reloaded.has_lstm


def test_transcriber_loads_tflite_only_model_dir(tmp_path):
    """A Coqui dir shipping only model.tflite + alphabet.txt transcribes
    identically to the npz form (the reference's export layout,
    stt_onlyprobs.cpp:12-84)."""
    from rhasspy_speech_tpu.grammar import Intents, compile_intents
    from rhasspy_speech_tpu.lexicon import LexiconDatabase
    from rhasspy_speech_tpu.pipeline.coqui import (
        CoquiSttTrainer,
        CoquiSttTranscriber,
    )
    from rhasspy_speech_tpu.testing.synthetic import (
        build_synthetic_ctc_profile,
        synthesize_ctc_text,
    )
    import io as _io

    chars = sorted(set("turn of light") - {" "})
    profile = build_synthetic_ctc_profile(tmp_path / "model", chars)

    intents = Intents.from_dict(
        {
            "language": "en",
            "intents": {
                "M": {"data": [{"sentences": ["turn (on|off) light"]}]}
            },
        }
    )
    ctx = compile_intents(intents, _io.StringIO(), LexiconDatabase())
    trainer = CoquiSttTrainer(profile.model_dir)
    trainer.train(ctx, tmp_path / "train")

    t_npz = CoquiSttTranscriber(profile.model_dir, tmp_path / "train")
    pcm = synthesize_ctc_text(profile, "turn off light", seed=3)
    want = t_npz.transcribe_pcm(pcm)
    assert want == "turn off light"

    # Re-express model.npz as a flatbuffer-only model dir
    data = np.load(profile.model_dir / "model.npz")
    blob = build_tflite(
        {
            "layer_1/weights": data["out_w"],
            "layer_1/bias": data["out_b"],
        },
        input_shape=[1, 16, 1, int(data["out_w"].shape[0])],
    )
    tfl_dir = tmp_path / "model_tfl"
    tfl_dir.mkdir()
    (tfl_dir / "model.tflite").write_bytes(blob)
    for name in ("alphabet.txt", "frontend.json"):
        src = profile.model_dir / name
        if src.exists():
            (tfl_dir / name).write_bytes(src.read_bytes())

    t_tfl = CoquiSttTranscriber(tfl_dir, tmp_path / "train")
    assert t_tfl.transcribe_pcm(pcm) == want
    assert (tfl_dir / "model.npz").exists()  # conversion cached
