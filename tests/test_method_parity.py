"""METHOD-LEVEL trajectory parity vs the reference PyTorch implementation.

Module goldens (test_parity_torch.py) pin each net; this pins the COMPOSED
method: N iterations of the step-1 (albedo) and step-3 (joint) Adam loops,
run side by side in the reference implementation (on CPU) and in this
framework with converted weights, asserting the loss trajectories track and
the final depth maps agree (the BASELINE.md depth-MAD fidelity metric).

Bridging notes (documented deviations of the harness, not the framework):
  * the reference hard-requires CUDA and the external CUDA `neural_renderer`
    — both absent here.  `.cuda()` is monkeypatched to identity and
    `neural_renderer` is replaced by a pure-torch differentiable z-buffer
    implementing the same math as ops/rasterize.py's exact 'scatter' mode
    (packed min z-buffer + perspective-correct barycentric interpolation),
    so the rasterizer itself is *common* to both sides; its own correctness
    is covered by tests/test_renderer.py and tests/test_rasterize_grid.py.
  * torchvision's VGG16 is instantiated randomly (no weight download here)
    and the SAME random VGG is converted for our LPIPS.
  * step 2's pseudo-sample SAMPLING cannot be cross-matched (its
    randomness is internal: torch global RNG vs JAX keys — SURVEY.md §7
    'Randomness'), so the step-2 test injects ONE identical pseudo-sample
    pool into both sides (monkeypatched `sample_pseudo_imgs` on the torch
    side, direct `step2_loss` on ours); given the pool, the GAN-inversion
    loss (reference model.py:193-223) is deterministic and its trajectory
    is matched exactly like steps 1/3.

Reference call sites mirrored: trainer.py:99-108 (per-step Adam loops),
model.py:95-173 (step1), model.py:225-280 (step3).
"""

import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

_SENT64 = 2 ** 63 - 1  # above any (f32-bits << 32 | id) key (bits < 2^31)


def _torch_render_depth(vertices, faces, K, h, w, near, far, window=5):
    """Differentiable torch z-buffer over projected grid-mesh vertices —
    the same winner-pass + interpolation math as ops/rasterize.py
    ('scatter' mode), so both frameworks rasterize identically.

    Ranking matches `_winner_pass` exactly: EXACT-f32 nearest depth with
    lowest-face-id ties, via the int64 lexicographic key
    (float32 bits of z << 32) | id — positive floats' IEEE bits are
    order-isomorphic to their int32 patterns, so this equals the JAX
    side's two-pass (depth-bits, id) segment-min bit for bit."""
    b, n, _ = vertices.shape
    proj = vertices @ K.T
    z = proj[..., 2].clamp(min=1e-6)
    xs = proj[..., 0] / z
    ys = proj[..., 1] / z
    zs = vertices[..., 2]

    f = faces.shape[0]
    with torch.no_grad():
        fx = xs[:, faces]  # (B, F, 3)
        fy = ys[:, faces]
        fz = zs[:, faces]
        bx = torch.floor(fx.min(-1).values).int()
        by = torch.floor(fy.min(-1).values).int()
        face_ids = torch.arange(f, dtype=torch.int32)[None].expand(b, f)
        buf = torch.full((b * h * w,), _SENT64, dtype=torch.int64)
        for oy in range(window):
            for ox in range(window):
                px_i = bx + ox
                py_i = by + oy
                px = px_i.float()
                py = py_i.float()
                x0, x1, x2 = fx[..., 0], fx[..., 1], fx[..., 2]
                y0, y1, y2 = fy[..., 0], fy[..., 1], fy[..., 2]
                denom = (y1 - y2) * (x0 - x2) + (x2 - x1) * (y0 - y2)
                safe = torch.where(denom.abs() > 1e-12, denom,
                                   torch.ones_like(denom))
                l0 = ((y1 - y2) * (px - x2) + (x2 - x1) * (py - y2)) / safe
                l1 = ((y2 - y0) * (px - x2) + (x0 - x2) * (py - y2)) / safe
                l2 = 1.0 - l0 - l1
                eps = -1e-5
                zf = 1.0 / (l0 / fz[..., 0] + l1 / fz[..., 1]
                            + l2 / fz[..., 2]).clamp(min=1e-12)
                ok = ((l0 >= eps) & (l1 >= eps) & (l2 >= eps)
                      & (denom.abs() > 1e-12) & (zf > 0)
                      & (px_i >= 0) & (px_i < w) & (py_i >= 0) & (py_i < h))
                zbits = zf.float().view(torch.int32).long()
                packed = (zbits << 32) | face_ids.long()
                packed = torch.where(ok, packed,
                                     torch.full_like(packed,
                                                     _SENT64))
                pix = (py_i.clamp(0, h - 1) * w
                       + px_i.clamp(0, w - 1)).long()
                seg = (pix + torch.arange(b)[:, None] * (h * w)).reshape(-1)
                buf = buf.scatter_reduce(0, seg, packed.reshape(-1),
                                         reduce="amin")
        winner = torch.where(buf == _SENT64, torch.full_like(buf, -1),
                             buf & 0xFFFFFFFF).reshape(b, h * w)
        covered = winner >= 0
        tri = faces[winner.clamp(min=0)].long()  # (B, P, 3)

    def gather(v):
        return torch.gather(v.unsqueeze(-1).expand(b, n, 3), 1, tri)

    tx, ty, tz = gather(xs), gather(ys), gather(zs)
    gy, gx = torch.meshgrid(torch.arange(h, dtype=torch.float32),
                            torch.arange(w, dtype=torch.float32),
                            indexing="ij")
    px = gx.reshape(1, -1).expand(b, h * w)
    py = gy.reshape(1, -1).expand(b, h * w)
    x0, x1, x2 = tx[..., 0], tx[..., 1], tx[..., 2]
    y0, y1, y2 = ty[..., 0], ty[..., 1], ty[..., 2]
    denom = (y1 - y2) * (x0 - x2) + (x2 - x1) * (y0 - y2)
    safe = torch.where(denom.abs() > 1e-12, denom, torch.ones_like(denom))
    l0 = ((y1 - y2) * (px - x2) + (x2 - x1) * (py - y2)) / safe
    l1 = ((y2 - y0) * (px - x2) + (x0 - x2) * (py - y2)) / safe
    l2 = 1.0 - l0 - l1
    zf = 1.0 / (l0 / tz[..., 0] + l1 / tz[..., 1]
                + l2 / tz[..., 2]).clamp(min=1e-12)
    return torch.where(covered, zf,
                       torch.full_like(zf, far)).reshape(b, h, w)


class _FakeNRRenderer:
    """Stand-in for `neural_renderer.Renderer` (projection mode)."""

    def __init__(self, K=None, R=None, t=None, near=0.1, far=10.0,
                 image_size=64, **kwargs):
        self.K = K[0] if K is not None and K.dim() == 3 else K
        self.near = float(near)
        self.far = float(far)
        self.image_size = int(image_size)

    def render_depth(self, vertices, faces):
        h = w = self.image_size
        return _torch_render_depth(vertices, faces[0].long(), self.K, h, w,
                                   self.near, self.far)


@pytest.fixture(scope="module")
def ref_env(tmp_path_factory):
    """Import the reference package CPU-safe: fake neural_renderer, no-op
    .cuda(), download-free torchvision VGG, synthesized checkpoint assets."""
    tmp = tmp_path_factory.mktemp("ref_assets")

    fake_nr = types.ModuleType("neural_renderer")
    fake_nr.Renderer = _FakeNRRenderer
    sys.modules["neural_renderer"] = fake_nr

    if "skimage" not in sys.modules:  # lpips imports it; unused in our path
        fake_skimage = types.ModuleType("skimage")
        fake_skimage.__path__ = []  # mark as package
        for sub in ("color", "transform", "measure"):
            mod = types.ModuleType(f"skimage.{sub}")
            setattr(fake_skimage, sub, mod)
            sys.modules[f"skimage.{sub}"] = mod
        sys.modules["skimage"] = fake_skimage

    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self

    # the reference targets torch 1.2, where grid_sample used
    # align_corners=True; modern torch silently defaults to False —
    # restore the semantics the reference was written for (this framework
    # implements align_corners=True, renderer.py:19)
    _orig_gs = F.grid_sample

    def _gs_torch12(input, grid, mode="bilinear", padding_mode="zeros",
                    align_corners=None):
        return _orig_gs(input, grid, mode=mode, padding_mode=padding_mode,
                        align_corners=True if align_corners is None
                        else align_corners)

    torch.nn.functional.grid_sample = _gs_torch12

    torch.manual_seed(0)  # before ANY weight creation (incl. the fake VGG)

    # torchvision is not installed in this image; the reference's lpips
    # pretrained_networks only needs `tv.vgg16(pretrained=...).features`
    # with torchvision's cfg-D Sequential indexing — provide exactly that
    # (randomly initialized; the SAME instance is converted for our side).
    def _vgg16_features():
        cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
               512, 512, 512, "M", 512, 512, 512, "M"]
        layers, cin = [], 3
        for v in cfg:
            if v == "M":
                layers.append(torch.nn.MaxPool2d(2, 2))
            else:
                layers.append(torch.nn.Conv2d(cin, v, 3, padding=1))
                layers.append(torch.nn.ReLU(inplace=True))
                cin = v
        return torch.nn.Sequential(*layers)

    class _FakeVGG(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.features = _vgg16_features()

    vgg_random = _FakeVGG()
    try:
        import torchvision.models as tvm
        tvm.vgg16 = lambda *a, **k: vgg_random
    except ImportError:
        fake_tv = types.ModuleType("torchvision")
        fake_models = types.ModuleType("torchvision.models")
        fake_models.vgg16 = lambda *a, **k: vgg_random
        fake_tv.models = fake_models
        sys.modules["torchvision"] = fake_tv
        sys.modules["torchvision.models"] = fake_models

    for p in ("/root/reference",
              "/root/reference/GAN2Shape/stylegan2/stylegan2-pytorch"):
        if p not in sys.path:
            sys.path.append(p)

    import GAN2Shape.losses as tlosses
    _OrigPerc = tlosses.PerceptualLoss

    class _CPUPerc(_OrigPerc):
        def __init__(self, *a, **k):
            k.update(use_gpu=False, gpu_ids=[])
            super().__init__(*a, **k)

    tlosses.PerceptualLoss = _CPUPerc

    import GAN2Shape.model as tgmodel
    tgmodel.PerceptualLoss = _CPUPerc

    gan_size, z_dim = 32, 64
    import model as tsg  # reference stylegan2 model.py
    g = tsg.Generator(gan_size, z_dim, 8, channel_multiplier=1)
    d = tsg.Discriminator(gan_size, channel_multiplier=1)
    gan_ckpt = tmp / "gan.pth"
    torch.save({"g_ema": g.state_dict(), "d": d.state_dict()}, gan_ckpt)

    view_mean = torch.tensor([0.02, -0.05, 0.01, 0.005, -0.003, 0.01])
    light_mean = torch.tensor([0.1, 0.3, -0.05, 0.02])
    torch.save({"mean": view_mean, "cov": torch.eye(6) * 0.04},
               tmp / "view_mvn.pth")
    torch.save({"mean": light_mean, "cov": torch.eye(4) * 0.04},
               tmp / "light_mvn.pth")

    config = {
        "z_dim": z_dim, "gan_size": gan_size, "channel_multiplier": 1,
        "image_size": 128, "gan_ckpt_path": str(gan_ckpt),
        "view_mvn_path": str(tmp / "view_mvn.pth"),
        "light_mvn_path": str(tmp / "light_mvn.pth"),
        "rot_center_depth": 1.0, "fov": 10, "category": "face",
        # our side must use the exact z-buffer — the same math the fake
        # neural_renderer implements (the torch side ignores this key)
        "raster_mode": "scatter",
    }
    ref = tgmodel.GAN2Shape(config)
    return ref, config, vgg_random


@pytest.fixture(scope="module")
def ref_env512(ref_env, tmp_path_factory):
    """z_dim=512 sibling of ref_env (environment patching shared): the
    reference's OffsetEncoder hardcodes a 512-dim latent offset
    (reference networks.py:182-209), so step 2 only composes at z_dim=512."""
    tmp = tmp_path_factory.mktemp("ref_assets_512")
    _, config64, vgg_random = ref_env

    torch.manual_seed(1)
    gan_size, z_dim = 32, 512
    import model as tsg
    g = tsg.Generator(gan_size, z_dim, 8, channel_multiplier=1)
    d = tsg.Discriminator(gan_size, channel_multiplier=1)
    gan_ckpt = tmp / "gan.pth"
    torch.save({"g_ema": g.state_dict(), "d": d.state_dict()}, gan_ckpt)

    # the gan_size=32 discriminator has exactly 3 conv features before its
    # mb-stddev/final path, which only accepts gan_size inputs — step 2
    # feeds image_size inputs, so both sides early-exit at 3 features
    config = dict(config64, z_dim=z_dim, gan_size=gan_size,
                  gan_ckpt_path=str(gan_ckpt), disc_ftr_num=3)
    import GAN2Shape.model as tgmodel
    ref = tgmodel.GAN2Shape(config)
    ref.discriminator_loss.ftr_num = 3
    return ref, config, vgg_random


def _convert_all(ref, config, vgg_random):
    """Reference nets (random-initialized) -> this framework's pytrees."""
    from gan2shape_tpu.core.model import GAN2Shape
    from gan2shape_tpu.convert import torch2jax as cv

    model = GAN2Shape(config)
    model.set_samplers(
        {"mean": ref.view_light_sampler.view_mean.numpy(),
         "cov": np.eye(6, dtype=np.float32) * 0.04},
        {"mean": ref.view_light_sampler.light_mean.numpy(),
         "cov": np.eye(4, dtype=np.float32) * 0.04})

    params = {
        "lighting": cv.convert_encoder_net(ref.lighting_net.state_dict()),
        "viewpoint": cv.convert_encoder_net(ref.viewpoint_net.state_dict()),
        "depth": cv.convert_encoder_decoder_net(ref.depth_net.state_dict()),
        "albedo": cv.convert_encoder_decoder_net(
            ref.albedo_net.state_dict()),
        "offset_encoder": cv.convert_offset_encoder(
            ref.offset_encoder_net.state_dict(), config["image_size"]),
    }
    gen_params, noise = cv.convert_generator(ref.generator.state_dict())
    lpips_net = ref.perceptual_loss.model.net
    frozen = {
        "generator": gen_params,
        "noise": [jnp.asarray(n) for n in noise],
        "discriminator": cv.convert_discriminator(
            ref.discriminator.state_dict()),
        "lpips": cv.convert_lpips(vgg_random.state_dict(),
                                  lpips_net.state_dict()),
    }
    return model, params, frozen


@pytest.mark.slow
def test_step1_trajectory_parity(ref_env, rng):
    ref, config, vgg_random = ref_env
    model, params, frozen = _convert_all(ref, config, vgg_random)
    n_iters = 8

    image_np = rng.uniform(-1, 1, (1, 3, 128, 128)).astype(np.float32)
    t_img = torch.from_numpy(image_np)
    j_img = jnp.asarray(image_np)

    # ---- reference: step-1 Adam loop (trainer.py:40-41, 99-108) ----
    opt = torch.optim.Adam(ref.albedo_net.parameters(), lr=1e-4,
                           betas=(0.9, 0.999), weight_decay=5e-4)
    ref_losses = []
    for _ in range(n_iters):
        opt.zero_grad()
        loss, _ = ref.forward_step1(t_img, None, None, step1=True)
        loss.backward()
        opt.step()
        ref_losses.append(float(loss))

    # ---- ours: same loop through the pure-function step ----
    from gan2shape_tpu.core.trainer import default_optimizer, _split, \
        STEP_SUBSETS
    optimizer = default_optimizer()
    sub, rest = _split(params, STEP_SUBSETS[1])
    opt_state = optimizer.init(sub)

    @jax.jit
    def step(sub, opt_state):
        def loss_fn(sub):
            return model.forward_step1({**rest, **sub}, frozen, j_img)[0]
        loss, grads = jax.value_and_grad(loss_fn)(sub)
        updates, opt_state = optimizer.update(grads, opt_state, sub)
        return optax.apply_updates(sub, updates), opt_state, loss

    our_losses = []
    for _ in range(n_iters):
        sub, opt_state, loss = step(sub, opt_state)
        our_losses.append(float(loss))

    np.testing.assert_allclose(our_losses, ref_losses, rtol=2e-3, atol=2e-3)

    # iteration-0 forward must be near-exact (pure function parity; the
    # looser trajectory tolerance only absorbs optimizer-noise amplification)
    assert abs(our_losses[0] - ref_losses[0]) < 1e-4

    # final albedo maps agree to the optimizer-divergence bound: per-leaf
    # gradient parity is ~1e-3 relative (measured), but Adam normalizes
    # updates so relative gradient noise compounds into the weights
    with torch.no_grad():
        want = ref.albedo_net(t_img).numpy()
    got = np.asarray(model.albedo_net.apply(sub["albedo"], j_img))
    assert np.abs(got - want).mean() < 5e-2


@pytest.mark.slow
def test_step2_trajectory_parity(ref_env512, rng):
    """Composed step-2 GAN-inversion optimization (offset encoder +
    style_forward projection + invert + discriminator feature loss +
    offset regularization, reference model.py:175-223) against the torch
    reference, with one identical pseudo-sample pool injected into both
    sides."""
    ref, config, vgg_random = ref_env512
    model, params, frozen = _convert_all(ref, config, vgg_random)
    n_iters = 6
    n_proj = 2
    s = config["image_size"]

    image_np = rng.uniform(-1, 1, (1, 3, s, s)).astype(np.float32)
    latent_np = rng.standard_normal((1, config["z_dim"])).astype(np.float32)
    pseudo_np = rng.uniform(-1, 1, (n_proj, 3, s, s)).astype(np.float32)
    mask_np = np.ones((n_proj, 1, s, s), np.float32)

    # ---- reference: inject the fixed pool, run the step-2 Adam loop
    # (trainer.py:42-43, 252-277) ----
    ref.sample_pseudo_imgs = lambda *a, **k: (
        torch.from_numpy(pseudo_np.copy()), torch.from_numpy(mask_np.copy()))
    # collected is only consumed by the patched sampler; shapes are moot
    dummy = torch.zeros(1)
    coll_t = (dummy, dummy, dummy, dummy, dummy, None)
    t_lat = torch.from_numpy(latent_np.copy())

    opt = torch.optim.Adam(ref.offset_encoder_net.parameters(), lr=1e-4,
                           betas=(0.9, 0.999), weight_decay=5e-4)
    ref_losses = []
    ref_grad0 = None
    for it in range(n_iters):
        opt.zero_grad()
        loss, _ = ref.forward_step2(torch.from_numpy(image_np), t_lat,
                                    coll_t, n_proj_samples=n_proj)
        loss.backward()
        if it == 0:
            ref_grad0 = {k: (p.grad.detach().clone()
                             if p.grad is not None else torch.zeros_like(p))
                         for k, p in
                         ref.offset_encoder_net.named_parameters()}
        opt.step()
        ref_losses.append(float(loss))

    # ---- ours: same loop through step2_loss with the same pool ----
    from gan2shape_tpu.core.trainer import default_optimizer, _split, \
        STEP_SUBSETS
    from gan2shape_tpu.convert import torch2jax as cv

    optimizer = default_optimizer()
    sub, rest = _split(params, STEP_SUBSETS[2])
    opt_state = optimizer.init(sub)
    j_lat = jnp.asarray(latent_np)
    pseudo_j = jnp.asarray(pseudo_np)
    mask_j = jnp.asarray(mask_np)
    invariants = model.step2_invariants(frozen, j_lat)

    @jax.jit
    def step(sub, opt_state):
        def loss_fn(sub):
            return model.step2_loss({**rest, **sub}, frozen, j_lat,
                                    pseudo_j, mask_j, invariants)[0]
        loss, grads = jax.value_and_grad(loss_fn)(sub)
        updates, opt_state = optimizer.update(grads, opt_state, sub)
        return optax.apply_updates(sub, updates), opt_state, loss, grads

    our_losses = []
    our_grad0 = None
    for it in range(n_iters):
        sub, opt_state, loss, grads = step(sub, opt_state)
        if it == 0:
            our_grad0 = grads
        our_losses.append(float(loss))

    np.testing.assert_allclose(our_losses, ref_losses, rtol=3e-3, atol=3e-3)
    assert abs(our_losses[0] - ref_losses[0]) < 1e-4

    # iteration-0 offset-encoder gradient parity: convert the torch grads
    # with the same state_dict->pytree converter used for the weights
    # (buffers that have no grad enter as zeros and are compared as zeros)
    full = {k: ref_grad0.get(k, torch.zeros_like(v))
            for k, v in ref.offset_encoder_net.state_dict().items()}
    want = cv.convert_offset_encoder(full, config["image_size"])
    got = our_grad0["offset_encoder"]
    w_leaves, w_tree = jax.tree_util.tree_flatten(want)
    g_leaves, g_tree = jax.tree_util.tree_flatten(got)
    assert w_tree == g_tree
    num = sum(float(np.abs(np.asarray(a) - np.asarray(b)).sum())
              for a, b in zip(g_leaves, w_leaves))
    den = sum(float(np.abs(np.asarray(b)).sum()) for b in w_leaves) + 1e-12
    rel = num / den
    print(f"step2 iteration-0 offset-encoder grad rel-L1: {rel:.2e}")
    assert rel < 5e-3, rel


@pytest.mark.slow
def test_step3_trajectory_and_depth_mad(ref_env, rng):
    ref, config, vgg_random = ref_env
    model, params, frozen = _convert_all(ref, config, vgg_random)
    n_iters = 5
    n_proj = 2

    image_np = rng.uniform(-1, 1, (1, 3, 128, 128)).astype(np.float32)
    proj_np = rng.uniform(-1, 1, (n_proj, 3, 128, 128)).astype(np.float32)
    masks_np = np.ones((n_proj, 1, 128, 128), np.float32)

    t_img = torch.from_numpy(image_np)
    coll_t = (torch.from_numpy(proj_np.copy()),
              torch.from_numpy(masks_np.copy()))

    nets = [ref.lighting_net, ref.viewpoint_net, ref.depth_net,
            ref.albedo_net]
    opt = torch.optim.Adam([p for net in nets for p in net.parameters()],
                           lr=1e-4, betas=(0.9, 0.999), weight_decay=5e-4)
    ref_losses = []
    for _ in range(n_iters):
        opt.zero_grad()
        loss, _ = ref.forward_step3(t_img, None, coll_t)
        loss.backward()
        opt.step()
        ref_losses.append(float(loss))

    from gan2shape_tpu.core.trainer import default_optimizer, _split, \
        STEP_SUBSETS
    optimizer = default_optimizer()
    sub, rest = _split(params, STEP_SUBSETS[3])
    opt_state = optimizer.init(sub)
    j_img = jnp.asarray(image_np)
    coll_j = (jnp.asarray(proj_np), jnp.asarray(masks_np))

    @jax.jit
    def step(sub, opt_state):
        def loss_fn(sub):
            return model.forward_step3({**rest, **sub}, frozen, j_img,
                                       None, coll_j)[0]
        loss, grads = jax.value_and_grad(loss_fn)(sub)
        updates, opt_state = optimizer.update(grads, opt_state, sub)
        return optax.apply_updates(sub, updates), opt_state, loss

    our_losses = []
    for _ in range(n_iters):
        sub, opt_state, loss = step(sub, opt_state)
        our_losses.append(float(loss))

    np.testing.assert_allclose(our_losses, ref_losses, rtol=3e-3, atol=3e-3)
    assert abs(our_losses[0] - ref_losses[0]) < 1e-4

    # depth-MAD (the BASELINE.md fidelity metric) after joint training.
    # The r5 exact-f32 winner ranking makes the rasterizer itself
    # near-bit-equal across frameworks (forward depth 2.4e-7 max, grad
    # 3.7e-5 relative, measured torch-vs-jax on identical inputs); the
    # remaining envelope is OPTIMIZER SIGN NOISE: Adam's normalized update
    # moves every near-zero-gradient weight by ~lr in the direction of
    # sign(grad), and sub-1e-7 framework noise flips those signs.  The
    # floor is MEASURED below by running OUR side twice with a 1e-7
    # relative gradient perturbation — the torch-vs-jax MAD must stay
    # within a small multiple of that self-noise floor.
    def depth_of(sub):
        raw = model.depth_net.apply(sub["depth"], j_img)[:, 0]
        return np.asarray(model.rescale_depth(jnp.tanh(
            raw - jnp.mean(raw, axis=(1, 2), keepdims=True))))

    with torch.no_grad():
        d_raw = ref.depth_net(t_img).squeeze(1)
        centered = d_raw - d_raw.reshape(1, -1).mean()
        want = ref.rescale_depth(centered.tanh()).numpy()
    got = depth_of(sub)
    mad = np.abs(got - want).mean()
    print(f"step3 {n_iters}-iteration depth MAD vs torch: {mad:.2e}")

    # self-noise floor: identical math, gradients perturbed by 1e-7 rel
    sub_n, _ = _split(params, STEP_SUBSETS[3])
    opt_state_n = optimizer.init(sub_n)
    key = jax.random.PRNGKey(42)

    @jax.jit
    def step_noisy(sub, opt_state, key):
        def loss_fn(sub):
            return model.forward_step3({**rest, **sub}, frozen, j_img,
                                       None, coll_j)[0]
        loss, grads = jax.value_and_grad(loss_fn)(sub)
        leaves, tdef = jax.tree_util.tree_flatten(grads)
        keys = jax.random.split(key, len(leaves))
        leaves = [g * (1.0 + 1e-7 * jax.random.normal(k, g.shape))
                  for g, k in zip(leaves, keys)]
        grads = jax.tree_util.tree_unflatten(tdef, leaves)
        updates, opt_state = optimizer.update(grads, opt_state, sub)
        return optax.apply_updates(sub, updates), opt_state, loss

    for i in range(n_iters):
        key, k = jax.random.split(key)
        sub_n, opt_state_n, _ = step_noisy(sub_n, opt_state_n, k)
    floor = np.abs(depth_of(sub_n) - got).mean()
    print(f"step3 {n_iters}-iteration Adam sign-noise MAD floor "
          f"(1e-7 rel grad perturbation, same framework): {floor:.2e}")
    assert mad < 2.5e-2, f"depth MAD {mad:.2e}"
    assert mad < max(4.0 * floor, 5e-3), (mad, floor)
