"""Test/bench fixtures: synthetic acoustic models and audio synthesis.

The reference's end-to-end tests require pre-trained models downloaded from
HuggingFace (README.md:23,36) — unavailable here. This package builds a
fully functional synthetic profile instead: per-phone spectral signatures
define both an audio synthesizer and a matching nnet3 acoustic model
(a Gaussian classifier expressed as one affine layer), so the whole
wav -> MFCC -> nnet3 -> HCLG Viterbi -> text path is exercised with real
numerics end to end.
"""

from .synthetic import (
    SyntheticProfile,
    build_synthetic_profile,
    synthesize_sentence,
)

__all__ = [
    "SyntheticProfile",
    "build_synthetic_profile",
    "synthesize_sentence",
]
