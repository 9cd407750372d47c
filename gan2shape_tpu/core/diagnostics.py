"""Gradient-flow diagnostics and profiling.

The reference's `--debug` mode wraps each net in an identity autograd
Function that logs on backward (debug_grad_updates.py:7-56) — a host-side
print inside the hot loop.  The TPU-native equivalent computes per-net
gradient norms IN-GRAPH (a few reductions, fused into the step) and returns
them as step outputs, so "did net X receive gradients in step N?" becomes a
logged scalar instead of a side effect.
"""

import contextlib
import logging

import jax
import jax.numpy as jnp

log = logging.getLogger(__name__)


def grad_norms(grads):
    """Per-top-level-key global L2 norm of a gradient pytree: the in-graph
    analogue of the reference's AlertView/AlertDepth/... backward logs."""
    out = {}
    for name, tree in grads.items():
        leaves = jax.tree_util.tree_leaves(tree)
        if leaves:
            out[name] = jnp.sqrt(sum(jnp.sum(l.astype(jnp.float32) ** 2)
                                     for l in leaves))
    return out


def report_grad_norms(norms, step_name=""):
    """Host-side logging of the norms returned by a step (values may be
    per-iteration arrays from a scan)."""
    import numpy as np
    for name, v in norms.items():
        v = np.asarray(v)
        last = float(v.reshape(-1)[-1])
        if last == 0.0:
            log.warning("%s: net %r received ZERO gradient", step_name, name)
        else:
            log.info("%s: |grad %s| = %.3e", step_name, name, last)


@contextlib.contextmanager
def profile_trace(logdir="results/profile", enabled=True):
    """jax.profiler trace context (SURVEY.md §5: the reference has no
    profiling at all; here a TensorBoard-compatible trace is one flag away).
    """
    if not enabled:
        yield
        return
    import jax.profiler
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        log.info("profile trace written to %s", logdir)


class StepTimer:
    """Lightweight per-block wall-clock timing (the reference's only timing
    is tqdm progress bars)."""

    def __init__(self):
        self.records = []

    @contextlib.contextmanager
    def time(self, name, n_iters=1):
        import time
        t0 = time.perf_counter()
        yield
        dt = time.perf_counter() - t0
        self.records.append(
            {"name": name, "seconds": dt, "iters": n_iters,
             "iters_per_sec": n_iters / dt if dt > 0 else float("inf")})

    def summary(self):
        return self.records
