"""StyleGAN2 stack tests: the activation-modulation reformulation against a
direct per-sample weight-modulation oracle, mapping-network partial-execution
semantics, inversion roundtrips, and discriminator feature taps."""

import math

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
import pytest

from gan2shape_tpu.models.stylegan2 import (
    Generator, Discriminator, ModulatedConv2d, EqualLinear, pixel_norm,
)
from gan2shape_tpu.ops.upfirdn2d import setup_filter, upfirdn2d


def _direct_modconv(x, weight, style, scale, demodulate, kernel_size):
    """Oracle: explicit per-sample modulated weights, one conv per sample
    (the formulation the reference implements with grouped convs)."""
    b = x.shape[0]
    outs = []
    for i in range(b):
        w = scale * weight[0] * style[i][None, :, None, None]  # (O,I,k,k)
        if demodulate:
            demod = 1.0 / jnp.sqrt(jnp.sum(w ** 2, axis=(1, 2, 3)) + 1e-8)
            w = w * demod[:, None, None, None]
        out = lax.conv_general_dilated(
            x[i:i + 1], w, (1, 1),
            ((kernel_size // 2,) * 2, (kernel_size // 2,) * 2),
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            precision=lax.Precision.HIGHEST)
        outs.append(out)
    return jnp.concatenate(outs, 0)


def _direct_modconv_up(x, weight, style, scale, demodulate):
    """Oracle for the upsample path: per-sample transposed conv + blur."""
    b, in_c, h, w_sz = x.shape
    k = weight.shape[-1]
    kern, kern1 = setup_filter([1, 3, 3, 1], gain=4)
    p = (4 - 2) - (k - 1)
    pad = ((p + 1) // 2 + 2 - 1, p // 2 + 1)
    outs = []
    for i in range(b):
        w = scale * weight[0] * style[i][None, :, None, None]
        if demodulate:
            demod = 1.0 / jnp.sqrt(jnp.sum(w ** 2, axis=(1, 2, 3)) + 1e-8)
            w = w * demod[:, None, None, None]
        # torch conv_transpose2d(stride=2, padding=0) with weight (I,O,k,k)
        rhs = jnp.flip(w, (2, 3))  # (O,I,k,k) correlate-form
        out = lax.conv_general_dilated(
            x[i:i + 1], rhs, (1, 1), ((k - 1, k - 1), (k - 1, k - 1)),
            lhs_dilation=(2, 2),
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            precision=lax.Precision.HIGHEST)
        outs.append(out)
    out = jnp.concatenate(outs, 0)
    return upfirdn2d(out, kern, pad=pad, kernel_1d=kern1)


def _apply_nchw(mod, params, x, s):
    """Drive a module whose activations use the INTERNAL layout with NCHW
    test data (transparent in the default layout)."""
    from gan2shape_tpu.models import stylegan2 as sg
    return sg._from_internal(mod.apply(params, sg._to_internal(x), s))


@pytest.mark.parametrize("demodulate", [True, False])
def test_modulated_conv_matches_direct(rng, demodulate):
    mod = ModulatedConv2d(8, 12, 3, 16, demodulate=demodulate)
    x = jnp.asarray(rng.standard_normal((3, 8, 10, 10)).astype(np.float32))
    s = jnp.asarray(rng.standard_normal((3, 16)).astype(np.float32))
    from gan2shape_tpu.models import stylegan2 as sg
    params = mod.init(jax.random.PRNGKey(0), sg._to_internal(x), s)
    got = _apply_nchw(mod, params, x, s)

    # recompute the modulation affine exactly as the module does
    p = params["params"]
    w_lin = p["modulation"]["weight"] * (1.0 / math.sqrt(16))
    style = jnp.matmul(s, w_lin.T) + p["modulation"]["bias"]
    scale = 1.0 / math.sqrt(8 * 9)
    want = _direct_modconv(x, p["weight"], style, scale, demodulate, 3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_modulated_conv_upsample_matches_direct(rng):
    mod = ModulatedConv2d(8, 12, 3, 16, upsample=True)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 8)).astype(np.float32))
    s = jnp.asarray(rng.standard_normal((2, 16)).astype(np.float32))
    from gan2shape_tpu.models import stylegan2 as sg
    params = mod.init(jax.random.PRNGKey(0), sg._to_internal(x), s)
    got = _apply_nchw(mod, params, x, s)
    assert got.shape == (2, 12, 16, 16)

    p = params["params"]
    w_lin = p["modulation"]["weight"] * (1.0 / math.sqrt(16))
    style = jnp.matmul(s, w_lin.T) + p["modulation"]["bias"]
    scale = 1.0 / math.sqrt(8 * 9)
    want = _direct_modconv_up(x, p["weight"], style, scale, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


# helper: deterministic zero noise without threading a key through tests
def _zero_noise(gen):
    noises = []
    for i in range(gen.num_layers):
        res = 2 ** ((i + 5) // 2)
        noises.append(jnp.zeros((1, 1, res, res)))
    return noises


def test_generator_forward_shapes(rng):
    gen = Generator(size=64, style_dim=64, n_mlp=4, channel_multiplier=1)
    noise = _zero_noise(gen)
    w = jnp.asarray(rng.standard_normal((2, 64)).astype(np.float32))
    params = gen.init(jax.random.PRNGKey(0), [w], noise, input_is_w=True)
    img, _ = gen.apply(params, [w], noise, input_is_w=True)
    assert img.shape == (2, 3, 64, 64)
    assert gen.apply(params, [w], noise, input_is_w=True,
                     return_features=True)[1][-1].shape[1] == 256  # chans[64]


def test_style_forward_partial_composition(rng):
    gen = Generator(size=64, style_dim=64, n_mlp=4)
    noise = _zero_noise(gen)
    z = jnp.asarray(rng.standard_normal((2, 64)).astype(np.float32))
    params = gen.init(jax.random.PRNGKey(0), [z], noise, input_is_w=False)

    full = gen.apply(params, z, method="style_forward")
    head = gen.apply(params, z, depth=3, method="style_forward")
    tail = gen.apply(params, head, skip=3, method="style_forward")
    np.testing.assert_allclose(np.asarray(tail), np.asarray(full), atol=1e-5)


def test_style_invert_roundtrip(rng):
    # 2 layers: each inversion of a random equalized-LR matrix amplifies
    # rounding error by ~cond(W) in f32 (identical behavior in the torch
    # reference); deep roundtrips are ill-conditioned by construction and
    # style_invert is not in the training path.
    gen = Generator(size=64, style_dim=64, n_mlp=2)
    noise = _zero_noise(gen)
    z = jnp.asarray(rng.standard_normal((2, 64)).astype(np.float32))
    params = gen.init(jax.random.PRNGKey(0), [z], noise, input_is_w=False)
    w = gen.apply(params, z, method="style_forward")
    z_rec = gen.apply(params, w, method="style_invert")
    np.testing.assert_allclose(np.asarray(z_rec),
                               np.asarray(pixel_norm(z)), atol=2e-2)


def test_generator_truncation(rng):
    gen = Generator(size=64, style_dim=64, n_mlp=4)
    noise = _zero_noise(gen)
    w = jnp.asarray(rng.standard_normal((1, 64)).astype(np.float32))
    params = gen.init(jax.random.PRNGKey(0), [w], noise, input_is_w=True)
    mean = jnp.zeros((1, 64))
    img_t, _ = gen.apply(params, [w], noise, input_is_w=True,
                         truncation=0.5, truncation_latent=mean)
    img_h, _ = gen.apply(params, [0.5 * w], noise, input_is_w=True)
    np.testing.assert_allclose(np.asarray(img_t), np.asarray(img_h), atol=1e-4)


def test_generator_invert(rng):
    gen = Generator(size=64, style_dim=64, n_mlp=4)
    noise = _zero_noise(gen)
    w = jnp.asarray(rng.standard_normal((1, 64)).astype(np.float32))
    params = gen.init(jax.random.PRNGKey(0), [w], noise, input_is_w=True)
    offset = jnp.ones((1, 64))
    img, off = gen.apply(params, (offset, w), noise=noise, method="invert")
    assert img.shape == (1, 3, 64, 64)
    assert float(jnp.max(img)) <= 1.0 and float(jnp.min(img)) >= -1.0
    np.testing.assert_array_equal(np.asarray(off), np.asarray(offset))


def test_discriminator_shapes_and_ftr_num(rng):
    disc = Discriminator(size=64, channel_multiplier=1)
    x = jnp.asarray(rng.standard_normal((4, 3, 64, 64)).astype(np.float32))
    params = disc.init(jax.random.PRNGKey(0), x)
    out, feats = disc.apply(params, x)
    assert out.shape == (4, 1)
    assert len(feats) == 5  # log2(64)-2 resblocks + final_conv
    _, feats4 = disc.apply(params, x, ftr_num=4)
    assert len(feats4) == 4
    for a, b in zip(feats4, feats[:4]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)


def test_mean_latent(rng):
    gen = Generator(size=64, style_dim=64, n_mlp=4)
    noise = _zero_noise(gen)
    w = jnp.zeros((1, 64))
    params = gen.init(jax.random.PRNGKey(0), [w], noise, input_is_w=False)
    m = gen.apply(params, jax.random.PRNGKey(7), 256, method="mean_latent")
    assert m.shape == (1, 64)
    assert np.isfinite(np.asarray(m)).all()


@pytest.mark.slow
def test_bf16_activation_policy(rng):
    """The frozen-stack activation-dtype policy (utils/precision.act_dtype):
    under 'bfloat16' the generator synthesis and discriminator run their
    activations in bf16 but return f32 outputs that track the f32 run within
    bf16 tolerance, and gradients through the frozen stack stay f32."""
    from gan2shape_tpu.utils.precision import set_act_dtype

    gen = Generator(size=64, style_dim=64, n_mlp=4, channel_multiplier=1)
    disc = Discriminator(size=64, channel_multiplier=1)
    noise = _zero_noise(gen)
    w = jnp.asarray(rng.standard_normal((2, 64)).astype(np.float32))
    gp = gen.init(jax.random.PRNGKey(0), [w], noise, input_is_w=True)
    img32, _ = gen.apply(gp, [w], noise, input_is_w=True)
    dp = disc.init(jax.random.PRNGKey(1), img32)

    def loss(wv):
        img, _ = gen.apply(gp, [wv], noise, input_is_w=True)
        _, feats = disc.apply(dp, img, ftr_num=3)
        return sum(jnp.mean(jnp.abs(f)) for f in feats)

    l32, g32 = jax.value_and_grad(loss)(w)
    set_act_dtype("bfloat16")
    try:
        img16, _ = gen.apply(gp, [w], noise, input_is_w=True)
        l16, g16 = jax.value_and_grad(loss)(w)
    finally:
        set_act_dtype(None)

    assert img16.dtype == jnp.float32 and g16.dtype == jnp.float32
    # bf16 has ~2-3 significant decimal digits; images live in [-1, 1]
    assert float(jnp.max(jnp.abs(img16 - img32))) < 0.1
    assert float(jnp.abs(l16 - l32) / (jnp.abs(l32) + 1e-8)) < 0.05
    cos = jnp.sum(g16 * g32) / (jnp.linalg.norm(g16) *
                                jnp.linalg.norm(g32) + 1e-12)
    assert float(cos) > 0.95


def test_bf16_activation_policy_lpips(rng):
    from gan2shape_tpu.models.lpips import LPIPS
    from gan2shape_tpu.utils.precision import set_act_dtype

    m = LPIPS()
    a = jnp.asarray(rng.uniform(-1, 1, (2, 3, 64, 64)).astype(np.float32))
    b = jnp.asarray(rng.uniform(-1, 1, (2, 3, 64, 64)).astype(np.float32))
    params = m.init(jax.random.PRNGKey(0), a, b)
    d32 = m.apply(params, a, b)
    set_act_dtype("bfloat16")
    try:
        d16 = m.apply(params, a, b)
    finally:
        set_act_dtype(None)
    assert d16.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(d16), np.asarray(d32),
                               rtol=0.05, atol=1e-4)


def test_lpips_remat_is_identity(rng, monkeypatch):
    """G2S_LPIPS_REMAT=1 (PERF ledger item 4) reruns the VGG trunk in the
    backward instead of storing taps — same param tree, same value, same
    gradients (rematerialization is numerically a no-op)."""
    from gan2shape_tpu.models.lpips import LPIPS

    m = LPIPS()
    # 32²: remat-is-identity is size-independent; the VGG backward compile
    # dominates this test on a cold 1-core host
    a = jnp.asarray(rng.uniform(-1, 1, (2, 3, 32, 32)).astype(np.float32))
    b = jnp.asarray(rng.uniform(-1, 1, (2, 3, 32, 32)).astype(np.float32))
    params = m.init(jax.random.PRNGKey(0), a, b)

    def loss(x):
        return jnp.sum(m.apply(params, x, b))

    v0, g0 = jax.value_and_grad(loss)(a)
    monkeypatch.setenv("G2S_LPIPS_REMAT", "1")
    params_r = m.init(jax.random.PRNGKey(0), a, b)
    v1, g1 = jax.value_and_grad(loss)(a)
    assert jax.tree.structure(params_r) == jax.tree.structure(params)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v0),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0),
                               rtol=1e-5, atol=1e-7)


def test_nhwc_internal_layout_matches_nchw(rng, monkeypatch):
    """G2S_CONV_LAYOUT=nhwc changes only the INTERNAL activation layout of
    generator/discriminator (PERF_NOTES item 7) — outputs, feature taps, and
    the discriminator score must match the NCHW mode on identical params."""
    gen = Generator(size=32, style_dim=32, n_mlp=2, channel_multiplier=1)
    noise = _zero_noise(gen)
    w = jnp.asarray(rng.standard_normal((4, 32)).astype(np.float32))
    params = gen.init(jax.random.PRNGKey(0), [w], noise, input_is_w=True)
    disc = Discriminator(size=32, channel_multiplier=1)
    img0, _ = gen.apply(params, [w], noise, input_is_w=True)
    dparams = disc.init(jax.random.PRNGKey(1), img0)

    def run():
        img, feats = gen.apply(params, [w], noise, input_is_w=True,
                               return_features=True)
        score, dfeats = disc.apply(dparams, img)
        return img, feats, score, dfeats

    monkeypatch.delenv("G2S_CONV_LAYOUT", raising=False)
    img_a, feats_a, score_a, dfeats_a = run()
    monkeypatch.setenv("G2S_CONV_LAYOUT", "nhwc")
    img_b, feats_b, score_b, dfeats_b = run()

    np.testing.assert_allclose(np.asarray(img_b), np.asarray(img_a),
                               rtol=0, atol=2e-5)
    np.testing.assert_allclose(np.asarray(score_b), np.asarray(score_a),
                               rtol=1e-5, atol=1e-5)
    for fa, fb in zip(feats_a, feats_b):
        assert fa.shape == fb.shape
        np.testing.assert_allclose(np.asarray(fb), np.asarray(fa),
                                   rtol=0, atol=2e-5)
    for fa, fb in zip(dfeats_a, dfeats_b):
        assert fa.shape == fb.shape
        np.testing.assert_allclose(np.asarray(fb), np.asarray(fa),
                                   rtol=0, atol=2e-5)


def test_act_dtype_policy_validation_and_auto():
    """Invalid names must fail WITHOUT poisoning the policy state; 'auto'
    resolves to f32 on non-TPU backends (bf16 only on TPU)."""
    from gan2shape_tpu.utils import precision as p

    with pytest.raises(ValueError, match="act_dtype"):
        p.set_act_dtype("bf16")  # typo for bfloat16
    assert p.act_dtype() == jnp.float32  # state unchanged

    p.set_act_dtype("auto")
    try:
        assert p.act_dtype() == jnp.float32  # CPU backend under tests
    finally:
        p.set_act_dtype(None)
