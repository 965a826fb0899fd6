"""Ahead-of-time program store: serve without re-tracing the pipeline.

The persistent XLA compilation cache (utils/compile_cache.py) removes the
*compile* cost of a warm start, but a fresh serving process still pays
JAX tracing + StableHLO lowering for every flagship program (~10 s for
the decode scan alone, BENCH r3 notes). ``jax.export`` snapshots the
lowered StableHLO to disk; deserializing it restores a callable with NO
Python tracing or lowering — the first call costs only a (cached) XLA
compile. Reference analogue: Kaldi binaries are ahead-of-time compiled
C++, so a second `online2-wav-nnet3-latgen-faster` start pays no
compilation at all; this store gives the JAX pipeline the same property.

Blobs are keyed by program name + input shapes/dtypes + jax version +
backend platform, so a shape or environment change falls back to normal
tracing (never a wrong program). Serialization is StableHLO (portable),
NOT an XLA:CPU executable — the unsafe-CPU-AOT caveat in
compile_cache.py does not apply here.
"""

from __future__ import annotations

import hashlib
import logging
import os
from pathlib import Path
from typing import Callable, Optional, Sequence, Tuple

import jax

_LOGGER = logging.getLogger(__name__)


def _arg_specs(args: Sequence) -> Tuple:
    """ShapeDtypeStruct pytrees mirroring ``args`` (each element may be an
    array or a pytree of arrays, e.g. the scheduler's am_state dict)."""
    return tuple(
        jax.tree.map(lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), a)
        for a in args
    )


def effective_platform() -> str:
    """Where programs actually compile: the pinned default device's
    platform when one is set (a TPU plugin can register itself even under
    JAX_PLATFORMS=cpu, so default_backend() alone misreports)."""
    dev = getattr(jax.config, "jax_default_device", None)
    if dev is None:
        return jax.default_backend()
    if isinstance(dev, str):
        return dev
    return getattr(dev, "platform", jax.default_backend())


class AotStore:
    """Directory of serialized ``jax.export`` programs.

    ``load(name, args)`` returns a jitted callable restored from disk (or
    None when absent/mismatched); ``save(name, fn, args)`` exports ``fn``
    for the given example args and writes the blob. The in-memory cache
    makes repeated load() calls free.
    """

    def __init__(self, directory) -> None:
        self.dir = Path(directory)
        self._loaded: dict = {}

    # bumped whenever an exported program's OUTPUT contract changes (the
    # hash below only sees input specs, so a stale blob with the old
    # outputs would otherwise restore and fail at unpack time):
    # 2 = round-5 packed serving tick (u16 trace + folded endpoint stats)
    _FORMAT = "2"

    def _path(self, name: str, specs) -> Path:
        h = hashlib.sha256()
        h.update(self._FORMAT.encode())
        h.update(jax.__version__.encode())
        h.update(effective_platform().encode())
        leaves, treedef = jax.tree.flatten(specs)
        h.update(str(treedef).encode())
        for s in leaves:
            h.update(str(s.shape).encode())
            h.update(str(s.dtype).encode())
        return self.dir / f"{name}-{h.hexdigest()[:16]}.jaxexport"

    def load(
        self, name: str, args: Sequence, donate_argnums: Tuple[int, ...] = ()
    ) -> Optional[Callable]:
        specs = _arg_specs(args)
        path = self._path(name, specs)
        key = str(path)  # the path hash already encodes name+specs
        if key in self._loaded:
            return self._loaded[key]
        fn = None
        if path.is_file():
            try:
                from jax import export as jax_export

                exp = jax_export.deserialize(path.read_bytes())
                # donation is a property of the CALLING jit, so the
                # restored program keeps the original's buffer reuse
                fn = jax.jit(exp.call, donate_argnums=donate_argnums)
                _LOGGER.debug("AOT program %s loaded from %s", name, path)
            except Exception as exc:  # wrong jax/backed version etc.
                _LOGGER.warning(
                    "AOT program %s at %s unusable (%s); re-tracing",
                    name, path, exc,
                )
                fn = None
        self._loaded[key] = fn
        return fn

    def save(
        self,
        name: str,
        fn: Callable,
        args: Sequence,
        donate_argnums: Tuple[int, ...] = (),
    ) -> Path:
        """Export ``fn`` (traceable; jitted or not) at ``args``' shapes."""
        from jax import export as jax_export

        specs = _arg_specs(args)
        path = self._path(name, specs)
        self.dir.mkdir(parents=True, exist_ok=True)
        wrapped = fn if isinstance(fn, jax.stages.Wrapped) else jax.jit(fn)
        # export for the platform programs actually run on — under a
        # pinned default device jax.export would otherwise record the
        # plugin's default backend and refuse to execute
        exp = jax_export.export(wrapped, platforms=[effective_platform()])(
            *specs
        )
        # atomic publish: a serving process loading this store while a
        # warmup is writing must never read a truncated blob (deserialize
        # failure degrades to re-tracing, silently forfeiting the AOT win)
        tmp = path.with_name(path.name + f".tmp.{os.getpid()}")
        tmp.write_bytes(exp.serialize())
        os.replace(tmp, path)
        self._loaded[str(path)] = jax.jit(
            exp.call, donate_argnums=donate_argnums
        )
        _LOGGER.info("AOT program %s exported to %s", name, path)
        return path
