"""Persistent XLA compilation cache — compile once per (graph, shapes),
reuse across processes.  Critical on remote-compile TPU setups where a large
training-step graph can take minutes to compile."""

import logging
import os

log = logging.getLogger(__name__)
_enabled = False


def enable_compilation_cache(path=None):
    global _enabled
    if _enabled:
        return
    import jax

    platform = jax.default_backend()
    if platform == "cpu":
        # CPU AOT artifacts are machine-specific; in this environment the
        # cache may hold remote-compiled results whose CPU features don't
        # match the host (SIGILL risk) — keep CPU runs cache-free
        _enabled = True
        return

    path = path or os.environ.get(
        "G2S_COMPILE_CACHE",
        os.path.expanduser(f"~/.cache/g2s_jax_cache_{platform}"))
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    try:
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass
    _enabled = True
    log.info("compilation cache at %s", path)
