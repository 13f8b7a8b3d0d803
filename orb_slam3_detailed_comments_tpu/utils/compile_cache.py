"""Persistent XLA compilation cache.

First compilation of the frame pipeline costs 15-60 s (and each
local-mapping bucket shape compiles on first use); the jax persistent
cache amortizes that across processes — measured 15.8 s -> 4.4 s for the
extractor program through the axon remote compiler. Enabled by System's
constructor unless the user configured a cache themselves or set
ORB_TPU_NO_COMPILE_CACHE=1.
"""
from __future__ import annotations

import os

_done = False


def _host_tag() -> str:
    """Fingerprint the host CPU so AOT artifacts never cross machines.

    XLA:CPU's cache key does not cover the exact target-machine feature
    set; an artifact compiled on an AMX-capable build host loaded on a
    leaner machine warns 'could lead to execution errors such as SIGILL'.
    Keying the cache directory by a hash of the CPU flags makes reuse
    strictly same-microarchitecture. TPU artifacts are unaffected (same
    tag on the same host)."""
    import hashlib
    import platform
    feats = platform.machine()
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    feats += " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:
        pass
    return hashlib.sha1(feats.encode()).hexdigest()[:12]


def enable(cache_dir: str | None = None) -> None:
    global _done
    if _done or os.environ.get("ORB_TPU_NO_COMPILE_CACHE") == "1":
        return
    _done = True
    import jax
    try:
        if jax.config.jax_compilation_cache_dir:
            return  # user already configured one
    except AttributeError:  # pragma: no cover - very old jax
        return
    path = cache_dir or os.path.join(
        os.path.expanduser("~"), ".cache", "tpu_slam_xla", _host_tag())
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:  # pragma: no cover - cache is best-effort
        pass
