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
import time
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

    import jax

    # XLA:CPU AOT deserialization is not trustworthy: entries recorded on
    # this very host reload with "machine feature +prefer-no-scatter /
    # +prefer-no-gather not supported" (cpu_aot_loader.cc) — XLA-internal
    # pseudo-features the loader's host check doesn't model — and the
    # resulting executables have misexecuted (observed: wrong streaming
    # transcripts under tests' JAX_PLATFORMS=cpu). The cache exists to
    # kill the TPU cold start; skip it entirely when compute lands on the
    # CPU backend unless explicitly forced. The effective platform is the
    # pinned default device's when one is set (a TPU plugin can register
    # itself even under JAX_PLATFORMS=cpu, so default_backend() alone
    # misreports where programs actually compile).
    dev = getattr(jax.config, "jax_default_device", None)
    if dev is None:
        platform = jax.default_backend()
    elif isinstance(dev, str):
        platform = dev
    else:
        platform = getattr(dev, "platform", jax.default_backend())
    if platform == "cpu" and not os.environ.get("RSTPU_COMPILE_CACHE_CPU"):
        _LOGGER.debug(
            "persistent compilation cache skipped on the CPU backend "
            "(XLA:CPU AOT reload is unreliable; set RSTPU_COMPILE_CACHE_CPU=1 "
            "to force)"
        )
        return None

    # Respect an embedding application's own cache configuration: if the
    # process already points jax_compilation_cache_dir somewhere (and it
    # wasn't us), leave every cache knob alone.
    existing = getattr(jax.config, "jax_compilation_cache_dir", None)
    if existing and existing != _enabled_dir:
        _LOGGER.debug(
            "persistent compilation cache already configured at %s; "
            "leaving it untouched",
            existing,
        )
        return existing

    path = str(Path(cache_dir) if cache_dir is not None else default_cache_dir())
    if _enabled_dir == path:
        return path

    try:
        Path(path).mkdir(parents=True, exist_ok=True)
        _trim_cache_dir(Path(path))
        jax.config.update("jax_compilation_cache_dir", path)
        # Persist any program whose compile took noticeable time (the
        # serving programs range from ~1 s chunk steps to minute-long
        # flagship compiles); the 0.2 s floor keeps throwaway
        # sub-millisecond programs from unrelated JAX code in the same
        # process out of the cache.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception as exc:  # pragma: no cover - best-effort on odd backends
        _LOGGER.warning("persistent compilation cache unavailable: %s", exc)
        return None
    _enabled_dir = path
    _LOGGER.debug("persistent compilation cache at %s", path)
    return path


def _trim_cache_dir(path: Path) -> None:
    """Bound the on-disk cache: JAX never evicts, so a long-lived host
    would otherwise grow the directory without limit. Oldest-first
    removal down to RSTPU_COMPILE_CACHE_MAX_GB (default 10); best-effort.

    Recency is max(mtime, atime): JAX touches atime (not mtime) on cache
    reads, so entries a concurrent serving process is actively reusing
    rank as fresh. Entries newer than a grace period (default 24 h,
    RSTPU_COMPILE_CACHE_TRIM_GRACE_HOURS) are never evicted, so
    process-start trims in one process can't evict an entry another
    process wrote moments ago and is about to reuse."""
    try:
        limit = float(os.environ.get("RSTPU_COMPILE_CACHE_MAX_GB", "10"))
        grace_h = float(
            os.environ.get("RSTPU_COMPILE_CACHE_TRIM_GRACE_HOURS", "24")
        )
        now = time.time()
        entries = []
        for f in path.iterdir():
            if not f.is_file():
                continue
            st = f.stat()
            entries.append((max(st.st_mtime, st.st_atime), st.st_size, f))
        total = sum(size for _m, size, _f in entries)
        budget = limit * (1 << 30)
        if total <= budget:
            return
        for recency, size, f in sorted(entries):
            if now - recency < grace_h * 3600.0:
                break  # sorted oldest-first: everything left is fresher
            try:
                f.unlink()
                total -= size
            except OSError:
                continue
            if total <= budget:
                break
        _LOGGER.info(
            "trimmed persistent compilation cache at %s to %.1f GiB",
            path,
            total / (1 << 30),
        )
    except OSError:  # pragma: no cover
        pass
