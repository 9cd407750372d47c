"""Golden parity tests: run the REFERENCE PyTorch implementation on CPU
(random-initialized), convert its state dict with convert/torch2jax.py, and
require numerically matching outputs from our TPU-native modules.

This is the strongest correctness evidence available without the reference's
checkpoint assets: it pins the full StyleGAN2 synthesis pipeline, the mapping
network, the discriminator feature taps, and all five trainable nets."""

import sys

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import torch

sys.path.append("/root/reference")
sys.path.append("/root/reference/GAN2Shape/stylegan2/stylegan2-pytorch")

tmodel = pytest.importorskip("model")  # reference stylegan2 model.py

from gan2shape_tpu.models.stylegan2 import Generator, Discriminator
from gan2shape_tpu.models import networks as jnets
from gan2shape_tpu.convert.torch2jax import (
    convert_generator, convert_discriminator, convert_encoder_net,
    convert_encoder_decoder_net, convert_offset_encoder,
)

torch.manual_seed(0)


@pytest.fixture(scope="module")
def torch_gen():
    g = tmodel.Generator(64, 64, 4, channel_multiplier=1)
    g.eval()
    return g


def test_generator_synthesis_parity(torch_gen, rng):
    w = rng.standard_normal((2, 64)).astype(np.float32)
    with torch.no_grad():
        want, _ = torch_gen([torch.from_numpy(w)], input_is_w=True,
                            randomize_noise=False)

    params, noise = convert_generator(torch_gen.state_dict(), n_mlp=4)
    gen = Generator(size=64, style_dim=64, n_mlp=4, channel_multiplier=1)
    got, _ = gen.apply(params, [jnp.asarray(w)],
                       [jnp.asarray(n) for n in noise], input_is_w=True)
    np.testing.assert_allclose(np.asarray(got), want.numpy(),
                               atol=2e-4, rtol=1e-3)


def test_style_forward_parity(torch_gen, rng):
    z = rng.standard_normal((3, 64)).astype(np.float32)
    params, _ = convert_generator(torch_gen.state_dict(), n_mlp=4)
    gen = Generator(size=64, style_dim=64, n_mlp=4, channel_multiplier=1)
    with torch.no_grad():
        want = torch_gen.style_forward(torch.from_numpy(z))
        want_part = torch_gen.style_forward(torch.from_numpy(z), skip=2,
                                            depth=4)
    got = gen.apply(params, jnp.asarray(z), method="style_forward")
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=1e-5)
    got_part = gen.apply(params, jnp.asarray(z), skip=2, depth=4,
                         method="style_forward")
    np.testing.assert_allclose(np.asarray(got_part), want_part.numpy(),
                               atol=1e-5)


def test_discriminator_parity(rng):
    d = tmodel.Discriminator(64, channel_multiplier=1)
    d.eval()
    x = rng.standard_normal((4, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        want_out, want_feats = d(torch.from_numpy(x), 100)

    params = convert_discriminator(d.state_dict())
    disc = Discriminator(size=64, channel_multiplier=1)
    got_out, got_feats = disc.apply(params, jnp.asarray(x))
    assert len(got_feats) == len(want_feats)
    for gf, wf in zip(got_feats, want_feats):
        np.testing.assert_allclose(np.asarray(gf), wf.numpy(), atol=2e-4,
                                   rtol=1e-3)
    np.testing.assert_allclose(np.asarray(got_out), want_out.numpy(),
                               atol=2e-3, rtol=1e-3)


@pytest.mark.parametrize("name", ["viewpoint", "lighting"])
def test_encoder_nets_parity(rng, name):
    from GAN2Shape import networks as tnets
    cls = tnets.ViewpointNet if name == "viewpoint" else tnets.LightingNet
    jcls = (jnets.ViewpointNet if name == "viewpoint"
            else jnets.LightingNet)
    tnet = cls(128)
    tnet.eval()
    x = rng.standard_normal((2, 3, 128, 128)).astype(np.float32)
    with torch.no_grad():
        want = tnet(torch.from_numpy(x))
    params = convert_encoder_net(tnet.state_dict())
    got = jcls(128).apply(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=1e-5)


@pytest.mark.parametrize("name", ["depth", "albedo"])
def test_encoder_decoder_nets_parity(rng, name):
    from GAN2Shape import networks as tnets
    cls = tnets.DepthNet if name == "depth" else tnets.AlbedoNet
    jcls = jnets.DepthNet if name == "depth" else jnets.AlbedoNet
    tnet = cls(128)
    tnet.eval()
    x = rng.standard_normal((1, 3, 128, 128)).astype(np.float32)
    with torch.no_grad():
        want = tnet(torch.from_numpy(x))
    params = convert_encoder_decoder_net(tnet.state_dict())
    got = jcls(128).apply(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=1e-4)


def test_offset_encoder_parity(rng):
    from GAN2Shape import networks as tnets
    tnet = tnets.OffsetEncoder(128)
    tnet.eval()
    x = rng.standard_normal((2, 3, 128, 128)).astype(np.float32)
    with torch.no_grad():
        want = tnet(torch.from_numpy(x))
    params = convert_offset_encoder(tnet.state_dict(), 128)
    got = jnets.OffsetEncoder(128).apply(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=1e-4)
