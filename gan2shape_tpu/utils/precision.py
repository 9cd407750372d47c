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
