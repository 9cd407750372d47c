"""Non-leaking adaptive discriminator augmentation (ADA) — TPU-native.

Behavioral parity target: the reference's vendored augmentation pipeline
(/root/reference/GAN2Shape/stylegan2/stylegan2-pytorch/non_leaking.py:1-467,
the Karras et al. 2020 "training GANs with limited data" augmentations),
which is BROKEN in-repo (imports a missing `distributed` module,
non_leaking.py:8).  This implementation is a working pure-JAX redesign:

  * every random transform is an explicit-key batched matrix sample — the
    whole geometric pipeline composes eight 3x3 transforms per sample
    (flip / 90-rotate / integer translate / iso scale / pre-rotate /
    aniso scale / post-rotate / fractional translate,
    non_leaking.py:194-250) and the color pipeline five 4x4 transforms
    (brightness / contrast / luma flip / hue rotate / saturation,
    non_leaking.py:253-284), each applied with probability p via a
    bernoulli select (non_leaking.py:186-191);
  * the geometric warp is applied through the reference's anti-aliased
    resampling sandwich (reflect-pad -> SYM6 2x wavelet upsample ->
    affine grid-sample -> SYM6 downsample, non_leaking.py:389-439), with
    ONE deviation: the reflect padding is the STATIC maximum (w-1, h-1)
    instead of the per-batch dynamic padding of non_leaking.py:302-337 —
    XLA requires static shapes, and the reference clamps its dynamic pad
    to the same maximum anyway.  Values are identical whenever the
    reference's dynamic pad covers the transformed corners (its design
    intent); under extreme transforms where its clamp kicks in, the
    reference reads zeros where this reads (still-valid) reflected
    content.
  * AdaptiveAugment keeps the reference's controller semantics
    (non_leaking.py:13-49): r_t = E[sign(D(real))] drives p toward
    ada_target with step n_pred/ada_len every `update_every` D steps.
    The sign-sum is computed in-graph (see stylegan2_train) so the
    controller itself never forces a device sync beyond the metrics
    fetch the trainer already does.

Everything is jittable with p as a TRACED scalar, so tuning p does not
retrigger compilation.
"""

import math
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from gan2shape_tpu.ops.upfirdn2d import upfirdn2d

# sym6 wavelet coefficients (non_leaking.py:52-65) — used UNNORMALIZED, as
# the reference does (up-gain sqrt(2) per axis cancels against the flipped
# down pass)
SYM6 = np.array([
    0.015404109327027373, 0.0034907120842174702, -0.11799011114819057,
    -0.048311742585633, 0.4910559419267466, 0.787641141030194,
    0.3379294217276218, -0.07263752278646252, -0.021060292512300564,
    0.04472490177066578, 0.0017677118642428036, -0.007800708325034148,
], dtype=np.float32)


# --------------------------------------------------------------------------
# matrix builders (batched; non_leaking.py:68-160)
# --------------------------------------------------------------------------

def translate_mat(t_x, t_y):
    b = t_x.shape[0]
    m = jnp.tile(jnp.eye(3, dtype=jnp.float32), (b, 1, 1))
    m = m.at[:, 0, 2].set(t_x)
    return m.at[:, 1, 2].set(t_y)


def rotate_mat(theta):
    b = theta.shape[0]
    c, s = jnp.cos(theta), jnp.sin(theta)
    m = jnp.tile(jnp.eye(3, dtype=jnp.float32), (b, 1, 1))
    m = m.at[:, 0, 0].set(c).at[:, 0, 1].set(-s)
    return m.at[:, 1, 0].set(s).at[:, 1, 1].set(c)


def scale_mat(s_x, s_y):
    b = s_x.shape[0]
    m = jnp.tile(jnp.eye(3, dtype=jnp.float32), (b, 1, 1))
    return m.at[:, 0, 0].set(s_x).at[:, 1, 1].set(s_y)


def translate3d_mat(t_x, t_y, t_z):
    b = t_x.shape[0]
    m = jnp.tile(jnp.eye(4, dtype=jnp.float32), (b, 1, 1))
    return m.at[:, :3, 3].set(jnp.stack([t_x, t_y, t_z], 1))


def scale3d_mat(s_x, s_y, s_z):
    b = s_x.shape[0]
    m = jnp.tile(jnp.eye(4, dtype=jnp.float32), (b, 1, 1))
    return (m.at[:, 0, 0].set(s_x).at[:, 1, 1].set(s_y)
            .at[:, 2, 2].set(s_z))


def rotate3d_mat(axis, theta):
    """Rodrigues rotation about `axis` (python 3-tuple), embedded in 4x4
    (non_leaking.py:110-128)."""
    b = theta.shape[0]
    u_x, u_y, u_z = axis
    eye = jnp.eye(3, dtype=jnp.float32)
    cross = jnp.array([(0, -u_z, u_y), (u_z, 0, -u_x), (-u_y, u_x, 0)],
                      jnp.float32)
    a = jnp.asarray(axis, jnp.float32)
    outer = a[:, None] * a[None, :]
    s = jnp.sin(theta)[:, None, None]
    c = jnp.cos(theta)[:, None, None]
    rot = c * eye + s * cross + (1 - c) * outer
    m = jnp.tile(jnp.eye(4, dtype=jnp.float32), (b, 1, 1))
    return m.at[:, :3, :3].set(rot)


def luma_flip_mat(axis, i):
    """Householder reflection about the luma axis, gated by i in {0,1}
    (non_leaking.py:142-149)."""
    b = i.shape[0]
    a = jnp.asarray(tuple(axis) + (0.0,), jnp.float32)
    eye = jnp.tile(jnp.eye(4, dtype=jnp.float32), (b, 1, 1))
    return eye - 2.0 * (a[:, None] * a[None, :]) * i[:, None, None]


def saturation_mat(axis, i):
    """(non_leaking.py:152-160)"""
    b = i.shape[0]
    a = jnp.asarray(tuple(axis) + (0.0,), jnp.float32)
    ao = a[:, None] * a[None, :]
    eye = jnp.tile(jnp.eye(4, dtype=jnp.float32), (b, 1, 1))
    return ao + (eye - ao) * i[:, None, None]


# --------------------------------------------------------------------------
# random parameter sampling (non_leaking.py:163-191)
# --------------------------------------------------------------------------

def _lognormal(key, size, std):
    return jnp.exp(jax.random.normal(key, (size,)) * std)


def _category(key, size, categories):
    cats = jnp.asarray(categories, jnp.float32)
    idx = jax.random.randint(key, (size,), 0, len(categories))
    return cats[idx]


def _random_apply(key, p, transform, prev, eye):
    """Apply `transform` with probability p, else identity, then compose
    (non_leaking.py:186-191).  p may be a traced scalar."""
    size = transform.shape[0]
    sel = jax.random.bernoulli(key, p, (size,)).astype(jnp.float32)
    sel = sel[:, None, None]
    return (sel * transform + (1 - sel) * eye) @ prev


def sample_affine(key, p, size, height, width):
    """Batch of 3x3 geometric transforms in centered-pixel coordinates
    (non_leaking.py:194-250)."""
    eye = jnp.tile(jnp.eye(3, dtype=jnp.float32), (size, 1, 1))
    G = eye
    ks = jax.random.split(key, 16)

    # flip
    param = _category(ks[0], size, (0, 1))
    G = _random_apply(ks[1], p,
                      scale_mat(1 - 2.0 * param, jnp.ones(size)), G, eye)
    # 90 rotate
    param = _category(ks[2], size, (0, 3))
    G = _random_apply(ks[3], p, rotate_mat(-math.pi / 2 * param), G, eye)
    # integer translate
    param = jax.random.uniform(ks[4], (2, size), minval=-0.125, maxval=0.125)
    G = _random_apply(ks[5], p,
                      translate_mat(jnp.round(param[1] * width),
                                    jnp.round(param[0] * height)), G, eye)
    # isotropic scale
    param = _lognormal(ks[6], size, 0.2 * math.log(2))
    G = _random_apply(ks[7], p, scale_mat(param, param), G, eye)

    p_rot = 1 - jnp.sqrt(jnp.clip(1 - p, 0.0, 1.0))

    # pre-rotate
    param = jax.random.uniform(ks[8], (size,), minval=-math.pi,
                               maxval=math.pi)
    G = _random_apply(ks[9], p_rot, rotate_mat(-param), G, eye)
    # anisotropic scale
    param = _lognormal(ks[10], size, 0.2 * math.log(2))
    G = _random_apply(ks[11], p, scale_mat(param, 1 / param), G, eye)
    # post-rotate
    param = jax.random.uniform(ks[12], (size,), minval=-math.pi,
                               maxval=math.pi)
    G = _random_apply(ks[13], p_rot, rotate_mat(-param), G, eye)
    # fractional translate
    param = jax.random.normal(ks[14], (2, size)) * 0.125
    G = _random_apply(ks[15], p,
                      translate_mat(param[1] * width, param[0] * height),
                      G, eye)
    return G


def sample_color(key, p, size):
    """Batch of 4x4 color transforms (non_leaking.py:253-284)."""
    eye = jnp.tile(jnp.eye(4, dtype=jnp.float32), (size, 1, 1))
    C = eye
    axis_val = 1 / math.sqrt(3)
    axis = (axis_val, axis_val, axis_val)
    ks = jax.random.split(key, 10)

    # brightness
    param = jax.random.normal(ks[0], (size,)) * 0.2
    C = _random_apply(ks[1], p, translate3d_mat(param, param, param), C, eye)
    # contrast
    param = _lognormal(ks[2], size, 0.5 * math.log(2))
    C = _random_apply(ks[3], p, scale3d_mat(param, param, param), C, eye)
    # luma flip
    param = _category(ks[4], size, (0, 1))
    C = _random_apply(ks[5], p, luma_flip_mat(axis, param), C, eye)
    # hue rotation
    param = jax.random.uniform(ks[6], (size,), minval=-math.pi,
                               maxval=math.pi)
    C = _random_apply(ks[7], p, rotate3d_mat(axis, param), C, eye)
    # saturation
    param = _lognormal(ks[8], size, 1.0 * math.log(2))
    C = _random_apply(ks[9], p, saturation_mat(axis, param), C, eye)
    return C


# --------------------------------------------------------------------------
# geometric application (non_leaking.py:287-439)
# --------------------------------------------------------------------------

def _scale_single(s_x, s_y):
    return jnp.array([[s_x, 0, 0], [0, s_y, 0], [0, 0, 1]], jnp.float32)


def _translate_single(t_x, t_y):
    return jnp.array([[1, 0, t_x], [0, 1, t_y], [0, 0, 1]], jnp.float32)


def _affine_grid_ac_false(theta, out_h, out_w):
    """torch F.affine_grid(..., align_corners=False): output pixel centers
    at (2j+1)/W - 1 mapped through theta (b, 2, 3)."""
    xs = (2 * jnp.arange(out_w, dtype=jnp.float32) + 1) / out_w - 1
    ys = (2 * jnp.arange(out_h, dtype=jnp.float32) + 1) / out_h - 1
    gx = jnp.broadcast_to(xs[None, :], (out_h, out_w))
    gy = jnp.broadcast_to(ys[:, None], (out_h, out_w))
    base = jnp.stack([gx, gy, jnp.ones_like(gx)], -1)  # (H, W, 3)
    # grid[b, h, w, :] = theta[b] @ base[h, w]
    return jnp.einsum("bij,hwj->bhwi", theta, base)


def _grid_sample_ac_false(x, grid):
    """Bilinear sample, align_corners=False, zero padding (the reference's
    double-backward-capable grid_sample wrapper, non_leaking.py:340-378 —
    JAX gets higher-order gradients for free)."""
    b, c, h, w = x.shape
    _, hg, wg, _ = grid.shape
    gx = ((grid[..., 0] + 1) * w - 1) * 0.5
    gy = ((grid[..., 1] + 1) * h - 1) * 0.5
    gx = gx.reshape(b, hg * wg)
    gy = gy.reshape(b, hg * wg)

    x0 = jnp.floor(gx)
    y0 = jnp.floor(gy)
    wx1 = gx - x0
    wy1 = gy - y0
    ix0 = x0.astype(jnp.int32)
    iy0 = y0.astype(jnp.int32)

    xf = x.reshape(b, c, h * w)
    out = jnp.zeros((b, c, hg * wg), x.dtype)
    for a, wy in ((0, 1 - wy1), (1, wy1)):
        for bb, wx in ((0, 1 - wx1), (1, wx1)):
            ii = iy0 + a
            jj = ix0 + bb
            valid = (ii >= 0) & (ii <= h - 1) & (jj >= 0) & (jj <= w - 1)
            idx = jnp.clip(ii, 0, h - 1) * w + jnp.clip(jj, 0, w - 1)
            tap = jnp.take_along_axis(xf, idx[:, None, :], axis=2)
            out = out + tap * ((wy * wx) * valid.astype(x.dtype))[:, None, :]
    return out.reshape(b, c, hg, wg)


def apply_affine(img, G, antialiasing_kernel=SYM6):
    """Warp `img` (B, 3, H, W) by the INVERSE-transform batch `G` through the
    anti-aliased resampling sandwich (non_leaking.py:389-439), with static
    maximum reflect padding (see module docstring)."""
    kernel = jnp.asarray(antialiasing_kernel, img.dtype)
    len_k = int(kernel.shape[0])
    kernel_flip = jnp.flip(kernel, (0,))

    b, c, h, w = img.shape
    # static symmetric pad = the reference's clamp ceiling
    # (non_leaking.py:318: pad.min([w-1, h-1]))
    pad_x = w - 1
    pad_y = h - 1
    img_pad = jnp.pad(img, ((0, 0), (0, 0), (pad_y, pad_y), (pad_x, pad_x)),
                      mode="reflect")

    # symmetric padding => the reference's (pad_x1-pad_x2)/2 centering
    # translate (non_leaking.py:401-404) is identity
    G_inv = G

    # 2x wavelet upsample: two separable passes.  upfirdn2d here takes
    # up=(y, x) and pad=(y0, y1, x0, x1); the reference's pad tuples are
    # x-major — translated accordingly (non_leaking.py:405-412).
    up_pad = ((len_k + 2 - 1) // 2, (len_k - 2) // 2)
    img_2x = upfirdn2d(img_pad, kernel.reshape(1, len_k), up=(1, 2),
                       pad=(0, 0, up_pad[0], up_pad[1]))
    img_2x = upfirdn2d(img_2x, kernel.reshape(len_k, 1), up=(2, 1),
                       pad=(up_pad[0], up_pad[1], 0, 0))

    # normalized-coordinate algebra identical to non_leaking.py:413-422
    G_inv = _scale_single(2, 2) @ G_inv @ _scale_single(0.5, 0.5)
    G_inv = (_translate_single(-0.5, -0.5) @ G_inv
             @ _translate_single(0.5, 0.5))
    pad_k = len_k // 4
    out_h = (h + pad_k * 2) * 2
    out_w = (w + pad_k * 2) * 2
    h2x, w2x = img_2x.shape[2], img_2x.shape[3]
    G_inv = (_scale_single(2 / w2x, 2 / h2x) @ G_inv
             @ _scale_single(1 / (2 / out_w), 1 / (2 / out_h)))

    grid = _affine_grid_ac_false(G_inv[:, :2, :], out_h, out_w)
    img_affine = _grid_sample_ac_false(img_2x, grid)

    d_p = -pad_k * 2
    down_pad = (d_p + (len_k - 2 + 1) // 2, d_p + (len_k - 2) // 2)
    img_down = upfirdn2d(img_affine, kernel_flip.reshape(1, len_k),
                         down=(1, 2), pad=(0, 0, down_pad[0], down_pad[1]))
    img_down = upfirdn2d(img_down, kernel_flip.reshape(len_k, 1),
                         down=(2, 1), pad=(down_pad[0], down_pad[1], 0, 0))
    return img_down


def apply_color(img, mat):
    """(non_leaking.py:442-450)"""
    mat_mul = mat[:, :3, :3]
    mat_add = mat[:, :3, 3]
    out = jnp.einsum("boi,bihw->bohw", mat_mul, img)
    return out + mat_add[:, :, None, None]


def augment(key, img, p, transforms=None):
    """Geometric + color augmentation with per-transform probability `p`
    (non_leaking.py:462-466).  `p` may be a traced scalar; `transforms`
    optionally fixes (G, C) for deterministic replay (the reference's
    transform_matrix argument).  Returns (img_aug, (G, C))."""
    b = img.shape[0]
    kg, kc = jax.random.split(key)
    G = C = None
    if transforms is not None:
        G, C = transforms
    if G is None:
        G = jnp.linalg.inv(sample_affine(kg, p, b, img.shape[2],
                                         img.shape[3]))
    if C is None:
        C = sample_color(kc, p, b)
    img = apply_affine(img, G)
    img = apply_color(img, C)
    return img, (G, C)


# --------------------------------------------------------------------------
# adaptive controller (non_leaking.py:13-49)
# --------------------------------------------------------------------------

class AdaptiveAugment:
    """Host-side ADA probability controller.  Feed it the IN-GRAPH sign-sum
    of D(real) per step (a single scalar in the step metrics — no extra
    device sync); every `update_every` updates it moves p toward keeping
    E[sign(D(real))] at `ada_aug_target`, step n_pred/ada_aug_len, clamped
    to [0, 1] — the reference controller exactly (non_leaking.py:24-49,
    with the all-reduce replaced by the caller summing across hosts if
    data-parallel)."""

    def __init__(self, ada_aug_target=0.6, ada_aug_len=500 * 1000,
                 update_every=8):
        self.ada_aug_target = ada_aug_target
        self.ada_aug_len = ada_aug_len
        self.update_every = update_every
        self.ada_update = 0
        self.sign_sum = 0.0
        self.n_pred = 0.0
        self.r_t_stat = 0.0
        self.ada_aug_p = 0.0

    def tune(self, real_pred_sign_sum, batch_size):
        self.sign_sum += float(real_pred_sign_sum)
        self.n_pred += float(batch_size)
        self.ada_update += 1
        if self.ada_update % self.update_every == 0:
            self.r_t_stat = self.sign_sum / self.n_pred
            sign = 1 if self.r_t_stat > self.ada_aug_target else -1
            self.ada_aug_p += sign * self.n_pred / self.ada_aug_len
            self.ada_aug_p = min(1.0, max(0.0, self.ada_aug_p))
            self.sign_sum = 0.0
            self.n_pred = 0.0
            self.ada_update = 0
        return self.ada_aug_p
