"""LPIPS perceptual distance — the reference's vendored lpips package
(/root/reference/.../stylegan2-pytorch/lpips/) re-designed as pure flax
modules.

Structure (parity with lpips/networks_basic.py:27-101):
  ScalingLayer (fixed shift/scale constants) -> backbone feature slices ->
  per-layer unit-normalization -> squared difference -> learned 1x1 "lin"
  heads (no bias) -> spatial mean -> sum over the layers.

Backbones (lpips/pretrained_networks.py:1-181): VGG16 (5 taps at
relu1_2/relu2_2/relu3_3/relu4_3/relu5_3 — the live GAN2Shape path),
AlexNet (5 taps, one after each conv's relu) and SqueezeNet 1.1 (7 taps).
`perceptual_distance` exposes the reference PerceptualLoss surface
(lpips/__init__.py:12-39 + dist_model.py:28-84): model 'net-lin' (learned
heads), 'net' (unit-weight feature distance), 'L2' and 'DSSIM' in RGB or
Lab colorspace.

Weights (ImageNet backbones + the lpips v0.1 linear heads) are converted
from the reference checkpoints with convert/torch2jax.py when available;
random init is used otherwise (tests, and environments without the assets).
"""

import os

import jax.numpy as jnp
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

# per-backbone tap channel counts (lpips/networks_basic.py:44-56)
BACKBONE_CHNS = {
    "vgg": (64, 128, 256, 512, 512),
    "alex": (64, 192, 384, 256, 256),
    "squeeze": (64, 128, 256, 384, 384, 512, 512),
}


class VGG16Features(nn.Module):
    """VGG16 feature trunk returning the 5 LPIPS tap activations
    (lpips/pretrained_networks.py:96-141 slice boundaries)."""

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


class AlexFeatures(nn.Module):
    """AlexNet feature trunk, 5 taps — one after each conv's relu
    (lpips/pretrained_networks.py:59-94; torchvision alexnet.features)."""

    @nn.compact
    def __call__(self, x):
        taps = []
        plan = (  # (c_in, c_out, kernel, stride, pad, pool_before)
            (3, 64, 11, 4, 2, False),
            (64, 192, 5, 1, 2, True),
            (192, 384, 3, 1, 1, True),
            (384, 256, 3, 1, 1, False),
            (256, 256, 3, 1, 1, False),
        )
        for i, (ci, co, k, s, p, pool) in enumerate(plan):
            if pool:
                x = max_pool2d(x, 3, 2)
            x = Conv2d(ci, co, k, s, p, name=f"conv{i}")(x)
            x = jnp.maximum(x, 0)
            taps.append(x)
        return taps


class SqueezeFeatures(nn.Module):
    """SqueezeNet 1.1 feature trunk, 7 taps
    (lpips/pretrained_networks.py:6-57; torchvision squeezenet1_1.features:
    taps after features[1, 4, 7, 9, 10, 11, 12])."""

    @nn.compact
    def __call__(self, x):
        def fire(x, cin, sq, ex, idx):
            s = jnp.maximum(
                Conv2d(cin, sq, 1, 1, 0, name=f"fire{idx}_squeeze")(x), 0)
            e1 = jnp.maximum(
                Conv2d(sq, ex, 1, 1, 0, name=f"fire{idx}_expand1")(s), 0)
            e3 = jnp.maximum(
                Conv2d(sq, ex, 3, 1, 1, name=f"fire{idx}_expand3")(s), 0)
            return jnp.concatenate([e1, e3], 1)

        taps = []
        x = jnp.maximum(Conv2d(3, 64, 3, 2, 0, name="conv0")(x), 0)
        taps.append(x)                                   # relu1 (64)
        x = max_pool2d(x, 3, 2, ceil_mode=True)
        x = fire(x, 64, 16, 64, 2)
        x = fire(x, 128, 16, 64, 3)
        taps.append(x)                                   # relu2 (128)
        x = max_pool2d(x, 3, 2, ceil_mode=True)
        x = fire(x, 128, 32, 128, 4)
        x = fire(x, 256, 32, 128, 5)
        taps.append(x)                                   # relu3 (256)
        x = max_pool2d(x, 3, 2, ceil_mode=True)
        x = fire(x, 256, 48, 192, 6)
        taps.append(x)                                   # relu4 (384)
        x = fire(x, 384, 48, 192, 7)
        taps.append(x)                                   # relu5 (384)
        x = fire(x, 384, 64, 256, 8)
        taps.append(x)                                   # relu6 (512)
        x = fire(x, 512, 64, 256, 9)
        taps.append(x)                                   # relu7 (512)
        return taps


_TRUNKS = {"vgg": VGG16Features, "alex": AlexFeatures,
           "squeeze": SqueezeFeatures}


class LPIPS(nn.Module):
    """Learned perceptual distance.  Returns per-sample (B, 1, 1, 1) values
    like the reference (spatial_average keepdim=True).

    backbone 'vgg' (the live GAN2Shape path), 'alex' or 'squeeze';
    lpips_heads=False gives the reference's model='net' mode (unit-weight
    sum over normalized feature differences, dist_model.py:77-78)."""
    lpips_heads: bool = True
    backbone: str = "vgg"

    @nn.compact
    def __call__(self, in0, in1):
        from gan2shape_tpu.utils.precision import act_dtype

        shift = jnp.asarray(_SHIFT, in0.dtype).reshape(1, 3, 1, 1)
        scale = jnp.asarray(_SCALE, in0.dtype).reshape(1, 3, 1, 1)
        # nn.remat preserves the param tree ("vgg/...") — checkpoints and
        # converters are remat-agnostic
        cls = _TRUNKS[self.backbone]
        net_cls = nn.remat(cls) if _use_remat() else cls
        net = net_cls(name=self.backbone)
        chns = BACKBONE_CHNS[self.backbone]

        # frozen trunk runs at the activation-policy dtype (bf16 on TPU,
        # see utils/precision.py); the unit-norm / diff / head math below is
        # done in f32 (channel reductions of up to 512 squared terms)
        adt = act_dtype()
        f0 = net(((in0 - shift) / scale).astype(adt))
        f1 = net(((in1 - shift) / scale).astype(adt))

        val = 0.0
        for k in range(len(chns)):
            fk0 = f0[k].astype(jnp.float32)
            fk1 = f1[k].astype(jnp.float32)
            # reference normalize_tensor: x / (||x||_c + 1e-10)
            n0 = fk0 / (jnp.sqrt(
                jnp.sum(fk0 ** 2, axis=1, keepdims=True)) + 1e-10)
            n1 = fk1 / (jnp.sqrt(
                jnp.sum(fk1 ** 2, axis=1, keepdims=True)) + 1e-10)
            diff = (n0 - n1) ** 2
            if self.lpips_heads:
                d = Conv2d(chns[k], 1, 1, 1, 0, use_bias=False,
                           name=f"lin{k}")(diff)
            else:
                d = jnp.sum(diff, axis=1, keepdims=True)
            val = val + jnp.mean(d, axis=(2, 3), keepdims=True)
        return val


# ---------------- non-network distance modes (dist_model.py:79-84) --------


def rgb2lab(x):
    """sRGB [-1, 1] NCHW -> CIELAB (D65).  Pure-jnp port of the skimage
    conversion the reference's L2/DSSIM-in-Lab modes route through
    (lpips/__init__.py:49-53)."""
    rgb = jnp.clip((x + 1.0) * 0.5, 0.0, 1.0)
    lin = jnp.where(rgb > 0.04045, ((rgb + 0.055) / 1.055) ** 2.4,
                    rgb / 12.92)
    r, g, b = lin[:, 0], lin[:, 1], lin[:, 2]
    xx = 0.412453 * r + 0.357580 * g + 0.180423 * b
    yy = 0.212671 * r + 0.715160 * g + 0.072169 * b
    zz = 0.019334 * r + 0.119193 * g + 0.950227 * b
    white = (0.95047, 1.0, 1.08883)

    def f(t):
        d = 6.0 / 29.0
        return jnp.where(t > d ** 3, jnp.cbrt(t), t / (3 * d * d) + 4.0 / 29)

    fx, fy, fz = f(xx / white[0]), f(yy / white[1]), f(zz / white[2])
    lab = jnp.stack([116.0 * fy - 16.0, 500.0 * (fx - fy),
                     200.0 * (fy - fz)], 1)
    return lab


def l2_distance(in0, in1, colorspace="RGB"):
    """dist_model 'L2' mode (networks_basic L2.forward): per-sample mean
    squared difference; Lab routes through rgb2lab with the reference's
    range-100 scaling (lpips/__init__.py l2: .5*mean((p0/r - p1/r)^2))."""
    if colorspace.lower() == "lab":
        a, b = rgb2lab(in0) / 100.0, rgb2lab(in1) / 100.0
        return 0.5 * jnp.mean((a - b) ** 2, axis=(1, 2, 3))
    return jnp.mean((in0 - in1) ** 2, axis=(1, 2, 3))


def _ssim(p0, p1, drange, sigma=1.5):
    """Gaussian-windowed SSIM (Wang et al.), matching skimage
    compare_ssim(gaussian_weights=True, multichannel=True) semantics:
    11-tap truncated-gaussian window, K1=0.01, K2=0.03, sample covariance
    normalization, channel-mean."""
    radius = 5  # skimage: int(truncate * sigma + 0.5) with truncate=3.5
    t = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    g = jnp.exp(-0.5 * (t / sigma) ** 2)
    g = g / g.sum()

    def blur(x):
        # separable valid-mode gaussian filter per channel
        b, c, h, w = x.shape
        xr = x.reshape(b * c, 1, h, w)
        import jax.lax as lax
        kh = g.reshape(1, 1, -1, 1)
        kw = g.reshape(1, 1, 1, -1)
        y = lax.conv_general_dilated(xr, kh, (1, 1), "VALID")
        y = lax.conv_general_dilated(y, kw, (1, 1), "VALID")
        return y.reshape(b, c, y.shape[-2], y.shape[-1])

    c1 = (0.01 * drange) ** 2
    c2 = (0.03 * drange) ** 2
    mu0 = blur(p0)
    mu1 = blur(p1)
    # skimage cov_norm = n / (n - 1) (sample covariance)
    n = (2 * radius + 1) ** 2
    cov_norm = n / (n - 1.0)
    s00 = cov_norm * (blur(p0 * p0) - mu0 * mu0)
    s11 = cov_norm * (blur(p1 * p1) - mu1 * mu1)
    s01 = cov_norm * (blur(p0 * p1) - mu0 * mu1)
    num = (2 * mu0 * mu1 + c1) * (2 * s01 + c2)
    den = (mu0 ** 2 + mu1 ** 2 + c1) * (s00 + s11 + c2)
    return jnp.mean(num / den, axis=(1, 2, 3))


def dssim_distance(in0, in1, colorspace="RGB"):
    """dist_model 'DSSIM' mode: (1 - SSIM) / 2 on 0-255 RGB or on Lab
    (lpips/__init__.py dssim + networks_basic DSSIM.forward)."""
    if colorspace.lower() == "lab":
        return (1.0 - _ssim(rgb2lab(in0), rgb2lab(in1), 100.0)) / 2.0
    p0 = (in0 + 1.0) * 127.5
    p1 = (in1 + 1.0) * 127.5
    return (1.0 - _ssim(p0, p1, 255.0)) / 2.0


def perceptual_distance(params, in0, in1, model="net-lin", net="vgg",
                        colorspace="RGB", normalize=False):
    """The reference PerceptualLoss surface (lpips/__init__.py:12-39) as a
    pure function.  `params` are LPIPS module params for the net/net-lin
    modes (None for L2/DSSIM).  normalize=True rescales [0,1] -> [-1,1]
    inputs like the reference flag."""
    if normalize:
        in0 = 2 * in0 - 1
        in1 = 2 * in1 - 1
    m = model.lower()
    if m == "net-lin":
        return LPIPS(lpips_heads=True, backbone=net).apply(
            {"params": params}, in0, in1)
    if m == "net":
        return LPIPS(lpips_heads=False, backbone=net).apply(
            {"params": params}, in0, in1)
    if m == "l2":
        return l2_distance(in0, in1, colorspace)
    if m in ("dssim", "ssim"):
        return dssim_distance(in0, in1, colorspace)
    raise ValueError(f"unknown perceptual model {model!r}")
