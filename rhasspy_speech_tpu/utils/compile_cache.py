"""Persistent XLA compilation cache for serving processes.

The flagship programs cost 24-88 s of XLA compilation per batch shape
(BENCH_r02); within one process the shape buckets bound recompiles, but a
fresh serving process used to re-pay every compile. Enabling JAX's
persistent compilation cache keyed under a stable directory makes the
second process's time-to-first-transcript seconds instead of minutes.

The reference has no equivalent concern (Kaldi binaries are AOT C++); this
is the TPU-native counterpart of "the decoder binary is already compiled".

Enabled automatically by the serving entry points (AcousticModel /
StreamScheduler); opt out with RSTPU_NO_COMPILE_CACHE=1 or point the
directory elsewhere with RSTPU_COMPILE_CACHE_DIR.
"""

from __future__ import annotations

import logging
import os
from pathlib import Path
from typing import Optional, Union

_LOGGER = logging.getLogger(__name__)

_enabled_dir: Optional[str] = None


def _host_fingerprint() -> str:
    """CPU-feature fingerprint: XLA:CPU AOT results are machine-specific
    (loading an executable compiled with other CPU features logs SIGILL
    warnings and can misexecute), so each distinct host gets its own cache
    subdirectory. TPU executables key on the accelerator, which JAX's own
    cache key covers."""
    import hashlib

    flags = ""
    try:
        with open("/proc/cpuinfo", "r", encoding="utf-8") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    flags = line
                    break
    except OSError:
        import platform

        flags = platform.processor() or platform.machine()
    return hashlib.sha1(flags.encode()).hexdigest()[:12]


def default_cache_dir() -> Path:
    env = os.environ.get("RSTPU_COMPILE_CACHE_DIR")
    if env:
        return Path(env)
    base = os.environ.get("XDG_CACHE_HOME") or str(Path.home() / ".cache")
    return Path(base) / "rhasspy_speech_tpu" / "xla_cache" / _host_fingerprint()


def enable_compilation_cache(
    cache_dir: Optional[Union[str, Path]] = None,
) -> Optional[str]:
    """Turn on JAX's persistent compilation cache (idempotent).

    Returns the active cache directory, or None when disabled via
    RSTPU_NO_COMPILE_CACHE. Safe to call before or after JAX backends
    initialize; programs compiled after the call are persisted and
    reloaded across processes (same program fingerprint + compile options
    + platform).
    """
    global _enabled_dir
    if os.environ.get("RSTPU_NO_COMPILE_CACHE"):
        return None
    path = str(Path(cache_dir) if cache_dir is not None else default_cache_dir())
    if _enabled_dir == path:
        return path

    import jax

    try:
        Path(path).mkdir(parents=True, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # Persist everything: the serving programs worth caching range from
        # sub-second chunk steps to minute-long flagship compiles, and a
        # cache miss on any of them stalls the first transcript.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception as exc:  # pragma: no cover - best-effort on odd backends
        _LOGGER.warning("persistent compilation cache unavailable: %s", exc)
        return None
    _enabled_dir = path
    _LOGGER.debug("persistent compilation cache at %s", path)
    return path
