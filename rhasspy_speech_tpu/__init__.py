"""rhasspy_speech_tpu: TPU-native template-grammar speech-to-text.

A from-scratch JAX/XLA/Pallas framework with the capabilities of
rhasspy-speech (template grammars -> decode graphs; MFCC + nnet3 TDNN
acoustic model + WFST beam search -> transcripts), redesigned for TPU:
batched streams, fused feature kernels, dense Viterbi decoding.
"""

from .const import LangSuffix, ModelType, WordCasing

__version__ = "0.1.0"

__all__ = ["LangSuffix", "ModelType", "WordCasing", "__version__"]
