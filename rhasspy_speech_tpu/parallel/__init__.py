"""Multi-chip scaling: stream-parallel decode over a jax.sharding.Mesh."""

from .sharding import (
    make_stream_mesh,
    shard_streams,
    sharded_decode_fn,
)
from .transcriber import ShardedWavTranscriber

__all__ = [
    "ShardedWavTranscriber",
    "make_stream_mesh",
    "shard_streams",
    "sharded_decode_fn",
]
