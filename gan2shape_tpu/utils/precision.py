"""Global matmul/conv precision policy.

TPU MXU native arithmetic is bf16; f32 runs as 3-pass (HIGH) or 6-pass
(HIGHEST) bf16 decompositions.  Golden-parity tests (CPU) are precision-
independent; on TPU the policy trades fidelity for speed:

  'highest' — exact f32
  'high'    — 3-pass bf16 (default; ~f32 fidelity for these magnitudes)
  'default' — single-pass bf16 (fastest, lowest precision)

Set via the model config key `matmul_precision`, the G2S_MATMUL_PRECISION
env var, or `set_matmul_precision()`.  Geometry math (renderer) always stays
at HIGHEST — pixel coordinates at bf16 would corrupt rasterization.
"""

import os

import jax.numpy as jnp
from jax import lax

_MAP = {
    "default": lax.Precision.DEFAULT,
    "high": lax.Precision.HIGH,
    "highest": lax.Precision.HIGHEST,
}

# default 'default' (single-pass bf16): the whole conv/matmul stack runs at
# MXU native rate — measured 17.4 -> 23.6 steps/s on the full step mix vs
# 'high', with loss trajectories tracking the exact-f32 run (see
# tools/check_precision.py, PRECISION_CHECK.json).  Geometry (renderer,
# resize) stays pinned at HIGHEST regardless; CPU executes exact f32
# regardless, so all CPU golden-parity tests are precision-independent.
_current = _MAP[os.environ.get("G2S_MATMUL_PRECISION", "default")]


def set_matmul_precision(name):
    global _current
    _current = _MAP[str(name)]


def matmul_precision():
    return _current


# ---------------------------------------------------------------------------
# Activation dtype for the FROZEN conv stacks (StyleGAN2 generator /
# discriminator, LPIPS VGG).  The matmul-precision policy above already runs
# the MXU passes in bf16; storing the activations in bf16 additionally halves
# the HBM traffic of every conv/blur/elementwise fusion in those stacks —
# they are bandwidth-bound at 128px.  Only frozen networks are eligible: they
# have no weight gradients, so truncation only perturbs the activation-grad
# chain (gated by tools/check_precision.py like the matmul policy).  Geometry
# (renderer, rasterizer) and the trainable nets always stay f32.
#
# Default 'auto': bf16 on TPU, f32 everywhere else (CPU tests / dryruns).
# Gated flip (r3): the TPU A/B measured step2 51.8 / step3 17.2 ms/iter vs
# 59.7 / 19.2 at f32 activations, and tools/check_precision.py pinned the
# loss trajectories within the PRECISION_CHECK.json envelope for the
# shipping bf16+NHWC policy.  Override via config key `act_dtype` or the
# G2S_ACT_DTYPE env var.
_ACT_MAP = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}


def _check_act_name(name):
    """Validate BEFORE assigning — an invalid name must not poison the
    global policy state (and must fail here, not mid-trace)."""
    if name is not None and name != "auto" and name not in _ACT_MAP:
        raise ValueError(
            f"act_dtype must be one of {sorted(_ACT_MAP)}, 'auto', or "
            f"None, got {name!r}")
    return name


_act_name = _check_act_name(os.environ.get("G2S_ACT_DTYPE", "auto"))


def set_act_dtype(name):
    global _act_name
    _act_name = _check_act_name(None if name is None else str(name))


def act_dtype():
    if _act_name == "auto":
        # bf16 on TPU, exact f32 everywhere else (CPU tests / dryruns).
        # Resolved lazily at trace time — the backend is already up there.
        import jax
        return (jnp.bfloat16 if jax.default_backend() == "tpu"
                else jnp.float32)
    if _act_name is not None:
        return _ACT_MAP[_act_name]
    return jnp.float32
