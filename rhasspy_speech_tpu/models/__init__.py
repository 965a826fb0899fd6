"""Acoustic models: nnet3 graph compiler -> batched JAX forward."""

from .nnet3 import CompiledNnet3, compile_nnet3

__all__ = ["CompiledNnet3", "compile_nnet3"]
