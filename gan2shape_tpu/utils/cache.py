"""Persistent XLA compilation cache — compile once per (graph, shapes),
reuse across processes.  Critical on remote-compile TPU setups where a large
training-step graph can take minutes to compile."""

import hashlib
import logging
import os

log = logging.getLogger(__name__)
_enabled = False


def _cpu_feature_fingerprint():
    """Stable hash of this host's CPU feature flags (ISA extensions).

    CPU AOT artifacts are machine-specific: a cache entry compiled on a host
    with AVX-512 SIGILLs on one without.  Keying the cache directory by the
    flag set makes reuse safe — a different host simply gets its own cache."""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    flags = " ".join(sorted(line.split(":", 1)[1].split()))
                    return hashlib.sha256(flags.encode()).hexdigest()[:16]
    except OSError:
        pass
    import platform as _platform
    return hashlib.sha256(
        (_platform.machine() + _platform.processor()).encode()
    ).hexdigest()[:16]


def enable_compilation_cache(path=None):
    global _enabled
    if _enabled:
        return
    import jax

    platform = jax.default_backend()
    suffix = platform
    if platform == "cpu":
        # key the cache by CPU features so artifacts never cross hosts with
        # different ISAs (the SIGILL concern that previously disabled this)
        suffix = f"cpu_{_cpu_feature_fingerprint()}"

    path = path or os.environ.get(
        "G2S_COMPILE_CACHE",
        os.path.expanduser(f"~/.cache/g2s_jax_cache_{suffix}"))
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    try:
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass
    _enabled = True
    log.info("compilation cache at %s", path)
