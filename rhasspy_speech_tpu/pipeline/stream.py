"""Streaming transcription: chunked PCM -> frame-synchronous decode.

Replaces the reference's long-lived decoder subprocess
(rhasspy_speech/transcribe_stream.py:38-129: PCM chunks written to
online2-cli-nnet3-decode-faster stdin, lattice on EOF) with an in-process
streaming state machine:

- sample ring: carries the (frame_length - frame_shift) overlap samples,
- feature ring: carries the model's left/right context frames,
- device alpha [S]: Viterbi state carried across chunks, one jitted chunk
  program reused for the whole stream (compile once, then ~O(ms) per chunk),
- per-chunk backpointers accumulate on host; final backtrace on EOF.

Chunking mirrors the reference decodable defaults: 21 input frames per
chunk with frame_subsampling_factor 3 -> 7 output frames per step
(nnet3/decodable-simple-looped.h:46-59).
"""

from __future__ import annotations

import asyncio
import logging
from pathlib import Path
from typing import AsyncIterable, List, Optional, Union

import numpy as np

import jax
import jax.numpy as jnp

from ..grammar.fst import decode_meta
from ..models.nnet3 import compile_nnet3
from ..ops.decoder import (
    NEG_INF_F32,
    backtrace_nbest,
    backtrace_words,
    decode_step,
    kbest_step,
    make_decode_graph,
)
from .artifacts import LangArtifacts
from .fuzzy import get_fuzzy_text
from .streaming_features import (
    StreamFeaturizer,
    silence_weights_from_chunk,
    stage_ivector_window,
)
from .transcribe import AcousticModel

_LOGGER = logging.getLogger(__name__)

CHUNK_OUT_FRAMES = 7  # 21 input frames / subsampling 3


class StreamingDecoderState:
    """Per-stream state: sample/feature rings + device alpha + host bps."""

    def __init__(self, feat_dim: int):
        self.feats = np.zeros((0, feat_dim), dtype=np.float32)
        self.feat_state = None  # StreamFeatState (mfcc/pitch assembly)
        self.frames_consumed = 0  # input frames fed to the AM so far
        self.alpha: Optional[jnp.ndarray] = None
        self.am_state: dict = {}  # recurrent-model scan carry across chunks
        self.bps: List[np.ndarray] = []  # [chunk][Tc, S]
        self.started = False
        self.out_frames = 0
        # streaming i-vector: accumulated stats + the previous chunk's
        # pending contribution (accumulated one chunk late so decoder-
        # traceback silence weights can apply, matching the lag between
        # OnlineSilenceWeighting and the stats it modifies,
        # online2bin/online2-wav-nnet3-latgen-faster.cc:260-266)
        self.iv_gamma: Optional[jnp.ndarray] = None
        self.iv_X: Optional[jnp.ndarray] = None
        self.iv_pending_win: Optional[np.ndarray] = None
        self.iv_pending_w: Optional[np.ndarray] = None


class Nnet3StreamTranscriber:
    """Reference-compatible streaming transcriber
    (transcribe_stream.py:25-129)."""

    def __init__(
        self,
        model_dir: Union[str, Path],
        graph_dir: Union[str, Path],
        tools: Optional[object] = None,
        max_active: int = 7000,
        lattice_beam: float = 8.0,
        acoustic_scale: float = 1.0,
        beam: float = 24.0,
        nbest: int = 1,
        silence_weight: Optional[float] = None,
    ):
        self.model_dir = Path(model_dir)
        self.graph_dir = Path(graph_dir)
        self.acoustic_scale = acoustic_scale
        self.lattice_beam = lattice_beam
        self.nbest = max(1, nbest)
        self.silence_weight = silence_weight

        self.am = AcousticModel(self.model_dir)
        self.artifacts = LangArtifacts.load(self.graph_dir)
        assert self.artifacts.graph is not None
        self.device_graph = make_decode_graph(self.artifacts.graph)
        self._featurizer = StreamFeaturizer(self.am)

        if self.am.spec is None:
            # GMM chunk model: deltas + delta-deltas over the window,
            # per-pdf log-likelihoods — identical math to the batch GMM
            # path, chunked (the reference's own GMM streaming is dead
            # code, transcribe_wav.py:238-484)
            from ..models.gmm import GmmChunkModel

            self._chunk_model = GmmChunkModel(self.am.gmm, CHUNK_OUT_FRAMES)
        else:
            self._chunk_model = compile_nnet3(
                self.am.spec, CHUNK_OUT_FRAMES, subsampling=self.am.subsampling
            )
        self._lc = self._chunk_model.left_context
        self._rc = self._chunk_model.right_context
        self._chunk_in = CHUNK_OUT_FRAMES * self.am.subsampling

        graph = self.device_graph

        k = self.nbest

        recurrent = self._chunk_model.recurrent
        self._has_ivector = self.am._has_ivector
        ivp = self.am.ivector_params if self._has_ivector else None
        self._ivp = ivp
        chunk_in = self._chunk_in

        def chunk_step(alpha, feats_window, n_valid, gamma, X, iv_win, iv_w, am_state):
            """One streaming step: fold the PREVIOUS chunk's i-vector stats
            into the carried (gamma, X), solve the current i-vector estimate
            (online-ivector-feature.h:256 semantics at chunk granularity),
            AM forward on the context window, then up to 7 Viterbi frames
            (frames >= n_valid are no-ops). Recurrent models thread their
            scan carry (am_state) across chunks.

            nbest == 1: alpha [S] -> (alpha' [S], bp [7, S]).
            nbest > 1 (K-best track merge for the rescore path,
            transcribe_stream.py:131-274): alpha [S, K] -> bp [7, S, K]."""
            from ..ops.ivector import (
                apply_lda,
                gmm_log_likes,
                gselect_posteriors,
                solve_ivector,
                splice_frames,
            )

            ivec = None
            new_gamma, new_X = gamma, X
            if self._has_ivector:
                if ivp is not None:
                    sl, sr = ivp.splice_left, ivp.splice_right
                    spliced = splice_frames(iv_win[None], sl, sr)[
                        :, sl : sl + chunk_in
                    ]
                    lda_feats = apply_lda(spliced, ivp)
                    ll = gmm_log_likes(lda_feats, ivp)
                    post = gselect_posteriors(ll, ivp) * iv_w[None, :, None]
                    new_gamma = gamma + jnp.sum(post[0], axis=0)
                    new_X = X + jnp.einsum("ti,td->id", post[0], lda_feats[0])
                    ivec = solve_ivector(new_gamma[None], new_X[None], ivp)
                else:
                    ivec = jnp.zeros(
                        (1, self.am.spec.ivector_dim), dtype=jnp.float32
                    )
            new_am_state = am_state
            if recurrent:
                log_probs, new_am_state = self._chunk_model.forward_with_state(
                    feats_window[None], am_state, ivec
                )
                log_probs = log_probs[0]
            elif ivec is None:
                log_probs = self._chunk_model.forward(feats_window[None])[0]
            else:
                log_probs = self._chunk_model.forward(feats_window[None], ivec)[0]
            am_costs = -self.acoustic_scale * log_probs  # [7, P]
            ts = jnp.arange(CHUNK_OUT_FRAMES, dtype=jnp.int32)

            if k == 1:
                def step(a, xs):
                    am_t, t = xs
                    new_alpha, bp = decode_step(graph, a[None], am_t[None])
                    active = t < n_valid
                    return (
                        jnp.where(active, new_alpha[0], a),
                        jnp.where(active, bp[0], -3),
                    )
            else:
                def step(a, xs):
                    am_t, t = xs
                    new_alpha, bp = kbest_step(graph, a[None], am_t[None], k)
                    active = t < n_valid
                    return (
                        jnp.where(active, new_alpha[0], a),
                        jnp.where(active, bp[0], -3),
                    )

            new_alpha, bps = jax.lax.scan(step, alpha, (am_costs, ts))
            return new_alpha, bps, new_gamma, new_X, new_am_state

        self._chunk_fn = jax.jit(chunk_step)
        self._lang_cache = {}
        self._silence_pdf_arr: Optional[np.ndarray] = None

    # -- streaming core ------------------------------------------------------

    def start_stream(self) -> StreamingDecoderState:
        state = StreamingDecoderState(self._featurizer.feat_dim)
        state.feat_state = self._featurizer.new_state()
        init = jnp.asarray(self.artifacts.graph.init_weight)
        if self.nbest == 1:
            state.alpha = init
        else:
            alpha = jnp.full(
                (init.shape[0], self.nbest), jnp.float32(NEG_INF_F32)
            )
            state.alpha = alpha.at[:, 0].set(init)
        if self._chunk_model.recurrent:
            state.am_state = self._chunk_model.init_state(1)
        ivp = self._ivp
        if ivp is not None:
            num_gauss = int(ivp.gconsts.shape[0])
            lda_dim = int(ivp.lda.shape[0])
            state.iv_gamma = jnp.zeros((num_gauss,), dtype=jnp.float32)
            state.iv_X = jnp.zeros((num_gauss, lda_dim), dtype=jnp.float32)
            win = ivp.splice_left + self._chunk_in + ivp.splice_right
            state.iv_pending_win = np.zeros(
                (win, self.am.frontend_config.num_ceps), dtype=np.float32
            )
            state.iv_pending_w = np.zeros(self._chunk_in, dtype=np.float32)
        else:
            # dummies so the jitted signature stays fixed
            state.iv_gamma = jnp.zeros((1,), dtype=jnp.float32)
            state.iv_X = jnp.zeros((1, 1), dtype=jnp.float32)
            state.iv_pending_win = np.zeros((1, 1), dtype=np.float32)
            state.iv_pending_w = np.zeros(self._chunk_in, dtype=np.float32)
        return state

    def _extract_feats(self, state: StreamingDecoderState, pcm: np.ndarray) -> None:
        rows = self._featurizer.push(state.feat_state, pcm)
        if rows.shape[0]:
            state.feats = np.concatenate([state.feats, rows], axis=0)

    def _silence_pdfs_arr(self) -> np.ndarray:
        if self._silence_pdf_arr is None:
            from ..fst.core import SymbolTable
            from .endpoint import silence_pdfs_from_model

            pdfs: set = set()
            phones_path = self.am._resolved_model_dir / "model" / "phones.txt"
            if phones_path.exists():
                with open(phones_path, "r", encoding="utf-8") as f:
                    model_phones = SymbolTable.read_text(f)
                pdfs = set(
                    silence_pdfs_from_model(
                        self.am.transition_model, model_phones
                    )
                )
            self._silence_pdf_arr = np.fromiter(pdfs, dtype=np.int64) if pdfs else np.zeros(0, np.int64)
        return self._silence_pdf_arr

    def _stage_ivector_stats(
        self,
        state: StreamingDecoderState,
        t0: int,
        have: int,
        bp_np: np.ndarray,
    ) -> None:
        """Prepare this chunk's (window, weights) to be folded into the
        i-vector stats at the NEXT chunk step."""
        ivp = self._ivp
        num_ceps = self.am.frontend_config.num_ceps
        win, w = stage_ivector_window(
            state.feats[:, :num_ceps],
            t0,
            self._chunk_in,
            have,
            ivp.splice_left,
            ivp.splice_right,
            getattr(self.am, "ivector_cmvn_stats", None),
        )
        if self.silence_weight is not None and self.silence_weight != 1.0:
            graph = self.artifacts.graph
            flags = silence_weights_from_chunk(
                bp_np,
                np.asarray(state.alpha),
                graph.arc_pdf,
                graph.arc_src,
                self._silence_pdfs_arr(),
                k_best=self.nbest,
            )
            if flags is not None and flags.shape[0]:
                sub = self.am.subsampling
                out_idx = np.minimum(
                    np.arange(self._chunk_in) // sub, flags.shape[0] - 1
                )
                w = np.where(
                    flags[out_idx], w * float(self.silence_weight), w
                )
        state.iv_pending_win = win
        state.iv_pending_w = w

    def _run_chunks(self, state: StreamingDecoderState, flush: bool) -> None:
        """Consume buffered features in fixed chunks while enough context."""
        while True:
            t0 = state.frames_consumed
            need_hi = t0 + self._chunk_in + self._rc
            have = state.feats.shape[0]
            if have < need_hi and not flush:
                return
            if flush and t0 >= have:
                return
            # window rows: input times [t0 - lc, t0 + chunk + rc), clamped
            lo, hi = self._chunk_model.ranges["input"]
            idx = np.arange(t0 + lo, t0 + hi)
            idx = np.clip(idx, 0, max(have - 1, 0))
            window = state.feats[idx]
            # frames past the real feature end are invalid when flushing
            real_out = min(
                CHUNK_OUT_FRAMES,
                max(0, -(-(have - t0) // self.am.subsampling)),
            )
            alpha, bp, gamma, X, am_state = self._chunk_fn(
                state.alpha, jnp.asarray(window), jnp.int32(real_out),
                state.iv_gamma, state.iv_X,
                jnp.asarray(state.iv_pending_win),
                jnp.asarray(state.iv_pending_w),
                state.am_state,
            )
            state.alpha = alpha
            state.am_state = am_state
            state.iv_gamma, state.iv_X = gamma, X
            bp_np = np.asarray(bp)[:real_out]
            if bp_np.shape[0]:
                state.bps.append(bp_np)
                state.out_frames += bp_np.shape[0]
            if self._ivp is not None:
                self._stage_ivector_stats(state, t0, have, bp_np)
            state.frames_consumed += self._chunk_in
            if flush and state.frames_consumed >= have:
                return

    def process_chunk(self, state: StreamingDecoderState, pcm: np.ndarray) -> None:
        self._extract_feats(state, pcm)
        self._run_chunks(state, flush=False)

    def finish_nbest(
        self, state: StreamingDecoderState
    ) -> List[tuple]:
        """Flush and return the n-best [(word ids, cost)] list."""
        rows = self._featurizer.push(
            state.feat_state, np.zeros(0, dtype=np.float32), flush=True
        )
        if rows.shape[0]:
            state.feats = np.concatenate([state.feats, rows], axis=0)
        self._run_chunks(state, flush=True)
        if not state.bps:
            return []
        if self.nbest == 1:
            bp = np.concatenate(state.bps, axis=0)[:, None, :]
            alpha = np.asarray(state.alpha)[None, :]
            words, cost = backtrace_words(
                self.artifacts.graph, alpha, bp, 0, num_frames=bp.shape[0]
            )
            return [] if words is None else [(words, cost)]
        bp = np.concatenate(state.bps, axis=0)[:, None, :, :]  # [T, 1, S, K]
        alpha = np.asarray(state.alpha)[None, :, :]
        return backtrace_nbest(
            self.artifacts.graph, alpha, bp, 0, n=self.nbest,
            num_frames=bp.shape[0],
        )

    def finish_stream_rescore(
        self,
        state: StreamingDecoderState,
        old_lang_dir: Union[str, Path],
        new_lang_dir: Union[str, Path],
        nbest: Optional[int] = None,
        max_fuzzy_cost: Optional[float] = None,
        require_fuzzy: bool = False,
    ) -> List[str]:
        """Dual-graph stream rescore (transcribe_stream.py:131-274): flush
        the stream, rebuild the utterance's pruned lattice from the
        accumulated features (the reference's online binary also emits one
        final lattice after EOF), and remap it through the new lang dir's
        lexicon + LM (pipeline/rescore.py). Falls back to the n-best LM
        swap — which cannot leave the first pass's hypotheses — only for
        artifacts that predate lattice metadata."""
        from .rescore import rescore_tail

        n = nbest if nbest is not None else max(self.nbest, 5)
        old_lang = self._load_lang(old_lang_dir)
        new_lang = self._load_lang(new_lang_dir)
        graph = self.artifacts.graph

        first_pass = self.finish_nbest(state)  # flushes state.feats fully
        lattice_capable = (
            graph is not None
            and graph.has_phone_info
            and new_lang.ldet is not None
            and state.feats.shape[0] > 0
        )
        if lattice_capable:
            hyp_list = self._rescore_from_feats(state, graph, new_lang, n)
        else:
            from .fuzzy import rescore_nbest

            _LOGGER.warning(
                "Artifacts lack lattice rescore metadata — stream rescore "
                "falls back to an n-best LM swap. Retrain to fix."
            )
            if not first_pass:
                return []
            assert old_lang.g_fst is not None and new_lang.g_fst is not None
            hyp_list = rescore_nbest(
                first_pass, old_lang.g_fst, new_lang.g_fst, self.artifacts.words
            )

        return rescore_tail(
            hyp_list, old_lang, new_lang, max_fuzzy_cost, require_fuzzy
        )

    def _rescore_from_feats(self, state, graph, new_lang, n: int):
        """Whole-utterance lattice over the stream's accumulated features,
        remapped through the new lang (the second pass of stream rescore)."""
        import jax.numpy as jnp

        from ..ops.lattice import build_lattice, forward_backward
        from .rescore import rescore_lattice

        feats = jnp.asarray(state.feats[None])  # [1, T, D]
        T = state.feats.shape[0]
        n_out = max(1, -(-T // self.am.subsampling))
        log_probs = self.am.log_probs(
            feats, n_out, feat_lengths=jnp.asarray([T], dtype=jnp.int32)
        )
        alphas, betas = forward_backward(
            self.device_graph, log_probs, self.acoustic_scale
        )
        # one batched D2H: each np.asarray of a device array is a
        # separate blocking round-trip on a remote-dispatch transport
        alphas, betas, log_probs = jax.device_get(
            (alphas, betas, log_probs)
        )
        lat = build_lattice(
            graph,
            alphas,
            betas,
            log_probs,
            0,
            lattice_beam=self.lattice_beam,
            acoustic_scale=self.acoustic_scale,
        )
        if lat is None:
            return []
        return rescore_lattice(lat, graph, self.artifacts.phones, new_lang, nbest=n)

    def _load_lang(self, lang_dir: Union[str, Path]) -> LangArtifacts:
        key = str(lang_dir)
        if key not in self._lang_cache:
            self._lang_cache[key] = LangArtifacts.load(lang_dir)
        return self._lang_cache[key]

    def finish_stream(
        self,
        state: StreamingDecoderState,
        lang_dir: Optional[Union[str, Path]] = None,
        max_fuzzy_cost: Optional[float] = None,
        require_fuzzy: bool = False,
    ) -> List[str]:
        nbest = self.finish_nbest(state)
        if not nbest:
            return []
        words, cost = nbest[0]
        _LOGGER.debug("stream decode cost %.3f", cost)

        lang = self.artifacts if lang_dir is None else self._load_lang(lang_dir)

        if lang.g_fuzzy is not None and max_fuzzy_cost is not None:
            fuzzy = get_fuzzy_text(
                [ids for ids, _ in nbest], lang.g_fuzzy, lang.words
            )
            if fuzzy is not None and fuzzy[1] <= max_fuzzy_cost:
                return [decode_meta(fuzzy[0])]
            if require_fuzzy:
                return []
        text_words = []
        for wid in words:
            sym = self.artifacts.words.find_id(wid)
            if sym and sym not in ("<eps>", "#0", "<s>", "</s>"):
                text_words.append(sym)
        return [decode_meta(" ".join(text_words))]

    # -- public API ------------------------------------------------------------

    async def async_transcribe(
        self,
        audio_stream: AsyncIterable[bytes],
        lang_dir: Optional[Union[str, Path]] = None,
        max_fuzzy_cost: Optional[float] = None,
        require_fuzzy: bool = False,
    ) -> List[str]:
        """Feed s16le PCM chunks; decode on EOF (transcribe_stream.py:38-129)."""
        state = self.start_stream()
        async for chunk in audio_stream:
            if not chunk:
                continue
            pcm = np.frombuffer(chunk, dtype=np.int16).astype(np.float32)
            await asyncio.to_thread(self.process_chunk, state, pcm)
        return await asyncio.to_thread(
            lambda: self.finish_stream(
                state,
                lang_dir=lang_dir,
                max_fuzzy_cost=max_fuzzy_cost,
                require_fuzzy=require_fuzzy,
            )
        )

    async def async_transcribe_rescore(
        self,
        audio_stream: AsyncIterable[bytes],
        old_lang_dir: Union[str, Path],
        new_lang_dir: Union[str, Path],
        nbest: int = 1,
        max_fuzzy_cost: Optional[float] = None,
        require_fuzzy: bool = False,
    ) -> List[str]:
        """Stream + dual-graph rescore (transcribe_stream.py:131-274)."""
        state = self.start_stream()
        async for chunk in audio_stream:
            if not chunk:
                continue
            pcm = np.frombuffer(chunk, dtype=np.int16).astype(np.float32)
            await asyncio.to_thread(self.process_chunk, state, pcm)
        return await asyncio.to_thread(
            lambda: self.finish_stream_rescore(
                state,
                old_lang_dir,
                new_lang_dir,
                nbest=nbest,
                max_fuzzy_cost=max_fuzzy_cost,
                require_fuzzy=require_fuzzy,
            )
        )

    def transcribe_pcm(
        self,
        pcm: np.ndarray,
        chunk_samples: int = 1024,
        **kwargs,
    ) -> List[str]:
        """Synchronous helper: stream a PCM array in fixed chunks
        (online2-cli-nnet3-decode-faster reads 1024-sample chunks,
        online2bin/online2-cli-nnet3-decode-faster.cc:37)."""
        state = self.start_stream()
        for off in range(0, pcm.shape[0], chunk_samples):
            self.process_chunk(state, pcm[off : off + chunk_samples])
        return self.finish_stream(state, **kwargs)
