"""LPIPS perceptual distance (net-lin / VGG16) — the reference's vendored
lpips package (/root/reference/.../stylegan2-pytorch/lpips/) re-designed as a
single pure flax module.

Structure (parity with lpips/networks_basic.py:27-101):
  ScalingLayer (fixed shift/scale constants) -> VGG16 slices at
  relu1_2/relu2_2/relu3_3/relu4_3/relu5_3 -> per-layer unit-normalization ->
  squared difference -> learned 1x1 "lin" heads (no bias) -> spatial mean ->
  sum over the 5 layers.

Weights (ImageNet VGG16 + the lpips v0.1 linear heads) are converted from the
reference checkpoints with convert/torch2jax.py when available; random init is
used otherwise (tests, and environments without the assets).
"""

import os
from typing import Sequence

import jax.numpy as jnp
from jax import lax
import flax.linen as nn

from gan2shape_tpu.models.layers import Conv2d, max_pool2d


def _use_remat():
    """Rematerialize the VGG trunk in the backward pass (PERF ledger item 4):
    trades one extra trunk forward for not storing ~5 tap pyramids of
    activations — a win only if the backward is HBM-spill-bound, so it ships
    default-off pending a TPU A/B.  Read at trace time so tests can toggle."""
    return os.environ.get("G2S_LPIPS_REMAT", "0") == "1"

# fixed normalization constants (lpips/networks_basic.py:94-101)
_SHIFT = (-0.030, -0.088, -0.188)
_SCALE = (0.458, 0.448, 0.450)

# VGG16 conv plan and the slice boundaries used by LPIPS
_VGG_CFG = (64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
            512, 512, 512, "M", 512, 512, 512)
_SLICE_AFTER = (2, 4, 7, 10, 13)  # relu indices (counting convs) per slice end
_CHNS = (64, 128, 256, 512, 512)


class VGG16Features(nn.Module):
    """VGG16 feature trunk returning the 5 LPIPS tap activations."""

    @nn.compact
    def __call__(self, x):
        taps = []
        conv_idx = 0
        c_in = 3
        tap_set = set(_SLICE_AFTER)
        for item in _VGG_CFG:
            if item == "M":
                x = max_pool2d(x, 2, 2)
            else:
                x = Conv2d(c_in, item, 3, 1, 1, name=f"conv{conv_idx}")(x)
                x = jnp.maximum(x, 0)
                c_in = item
                conv_idx += 1
                if conv_idx in tap_set:
                    taps.append(x)
        return taps


class LPIPS(nn.Module):
    """Learned perceptual distance.  Returns per-sample (B, 1, 1, 1) values
    like the reference (spatial_average keepdim=True)."""
    lpips_heads: bool = True

    @nn.compact
    def __call__(self, in0, in1):
        from gan2shape_tpu.utils.precision import act_dtype

        shift = jnp.asarray(_SHIFT, in0.dtype).reshape(1, 3, 1, 1)
        scale = jnp.asarray(_SCALE, in0.dtype).reshape(1, 3, 1, 1)
        # nn.remat preserves the param tree ("vgg/...") — checkpoints and
        # converters are remat-agnostic
        net_cls = nn.remat(VGG16Features) if _use_remat() else VGG16Features
        net = net_cls(name="vgg")

        # frozen VGG trunk runs at the activation-policy dtype (bf16 on TPU,
        # see utils/precision.py); the unit-norm / diff / head math below is
        # done in f32 (channel reductions of up to 512 squared terms)
        adt = act_dtype()
        f0 = net(((in0 - shift) / scale).astype(adt))
        f1 = net(((in1 - shift) / scale).astype(adt))

        val = 0.0
        for k in range(5):
            fk0 = f0[k].astype(jnp.float32)
            fk1 = f1[k].astype(jnp.float32)
            # reference normalize_tensor: x / (||x||_c + 1e-10)
            n0 = fk0 / (jnp.sqrt(
                jnp.sum(fk0 ** 2, axis=1, keepdims=True)) + 1e-10)
            n1 = fk1 / (jnp.sqrt(
                jnp.sum(fk1 ** 2, axis=1, keepdims=True)) + 1e-10)
            diff = (n0 - n1) ** 2
            if self.lpips_heads:
                d = Conv2d(_CHNS[k], 1, 1, 1, 0, use_bias=False,
                           name=f"lin{k}")(diff)
            else:
                d = jnp.sum(diff, axis=1, keepdims=True)
            val = val + jnp.mean(d, axis=(2, 3), keepdims=True)
        return val
