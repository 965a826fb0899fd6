"""CTC acoustic model: batched JAX forward producing per-frame char probs.

Replaces the Coqui STT TFLite prob server (reference:
coqui_stt/native_client/stt_onlyprobs.cpp:12-84 + stt.cc:36-138
StreamingState): a DeepSpeech-shaped net — dense+relu x3 over spliced
context windows, a unidirectional LSTM, dense, softmax over
alphabet+blank — evaluated as one jitted program over [streams, frames].

Weights load from an .npz (converted models or synthetic profiles); the
Gaussian-classifier degenerate form (single affine + softmax) used by the
hermetic tests is the same code path with zero LSTM layers.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict

import numpy as np

import jax
import jax.numpy as jnp


@dataclass
class CtcModel:
    """Parameters + static shape info for the CTC forward."""

    params: Dict[str, jnp.ndarray]
    num_labels: int  # alphabet size + blank
    context: int = 0  # frames of +-context spliced into the input
    has_lstm: bool = False

    @staticmethod
    def load(path: str) -> "CtcModel":
        data = np.load(path)
        params = {k: jnp.asarray(v) for k, v in data.items()}
        has_lstm = "lstm_kernel" in params
        out_key = "out_w"
        num_labels = int(params[out_key].shape[-1])
        context = int(data["context"]) if "context" in data else 0
        return CtcModel(
            params=params,
            num_labels=num_labels,
            context=context,
            has_lstm=has_lstm,
        )

    def save(self, path: str) -> None:
        np.savez_compressed(
            path,
            context=np.asarray(self.context),
            **{k: np.asarray(v) for k, v in self.params.items()},
        )

    @property
    def lstm_hidden(self) -> int:
        return (
            int(self.params["lstm_bias"].shape[0]) // 4
            if self.has_lstm
            else 0
        )

    def init_state(self, batch: int = 1, dtype=jnp.float32):
        """Zero LSTM carry (empty tuple for stateless models). ``dtype``
        must match the activations feeding the scan (the carry type is
        part of lax.scan's contract)."""
        if not self.has_lstm:
            return ()
        H = self.lstm_hidden
        return (
            jnp.zeros((batch, H), dtype),
            jnp.zeros((batch, H), dtype),
        )

    def forward(self, feats: jnp.ndarray) -> jnp.ndarray:
        """[B, T, D] features -> [B, T, num_labels] label probabilities."""
        x = feats
        if self.context > 0:
            T = x.shape[1]
            parts = []
            for off in range(-self.context, self.context + 1):
                idx = np.clip(np.arange(T) + off, 0, T - 1)
                parts.append(x[:, idx])
            x = jnp.concatenate(parts, axis=-1)
        probs, _state = self.forward_stream(
            x, self.init_state(int(feats.shape[0]), dtype=x.dtype)
        )
        return probs

    def forward_stream(self, spliced: jnp.ndarray, state):
        """Stateful window forward for streaming: PRE-SPLICED features
        [B, W, D*(2*context+1)] + LSTM carry -> ([B, W, num_labels],
        carry'). The batch forward is this with zero carry over the whole
        utterance, so mid-stream windows reproduce it exactly (the caller
        splices with true neighbors; edge clamping matches the batch
        path's np.clip)."""
        x = spliced
        p = self.params
        i = 1
        while f"dense{i}_w" in p:
            x = x @ p[f"dense{i}_w"] + p[f"dense{i}_b"]
            x = jnp.minimum(jnp.maximum(x, 0.0), 20.0)  # DeepSpeech relu clip
            i += 1

        new_state = state
        if self.has_lstm:
            kernel = p["lstm_kernel"]  # [D + H, 4H]
            bias = p["lstm_bias"]  # [4H]
            # BasicLSTMCell adds 1.0 to the forget gate at run time;
            # CudnnCompatible exports (real Coqui models) bake it into the
            # bias, so converted weights carry lstm_forget_bias = 0.
            forget_bias = p.get("lstm_forget_bias", 1.0)

            def cell(carry, x_t):
                h, c = carry
                z = jnp.concatenate([x_t, h], axis=-1) @ kernel + bias
                i_g, c_g, f_g, o_g = jnp.split(z, 4, axis=-1)
                c = jax.nn.sigmoid(f_g + forget_bias) * c + jax.nn.sigmoid(
                    i_g
                ) * jnp.tanh(c_g)
                h = jax.nn.sigmoid(o_g) * jnp.tanh(c)
                return (h, c), h

            new_state, hs = jax.lax.scan(cell, state, jnp.swapaxes(x, 0, 1))
            x = jnp.swapaxes(hs, 0, 1)

        # Post-LSTM dense chain (DeepSpeech's layer_5)
        i = 1
        while f"post{i}_w" in p:
            x = x @ p[f"post{i}_w"] + p[f"post{i}_b"]
            x = jnp.minimum(jnp.maximum(x, 0.0), 20.0)
            i += 1

        logits = x @ p["out_w"] + p["out_b"]
        return jax.nn.softmax(logits, axis=-1), new_state
