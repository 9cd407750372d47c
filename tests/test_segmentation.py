"""Segmentation-net parity vs the reference torch implementations (random
init, eval mode, converted weights must produce matching logits)."""

import sys

import numpy as np
import jax.numpy as jnp
import pytest
import torch

sys.path.append("/root/reference")

from gan2shape_tpu.models.segmentation import PSPNet, BiSeNet
from gan2shape_tpu.convert.torch2jax import convert_pspnet, convert_bisenet


def test_pspnet_parity(rng):
    from GAN2Shape.networks import PSPNet as TorchPSPNet
    tnet = TorchPSPNet(layers=50, classes=21, pretrained=False)
    tnet.eval()
    # randomize BN running stats so the test is non-trivial
    for m in tnet.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.normal_(0, 0.05)
            m.running_var.uniform_(0.6, 1.4)
    x = rng.standard_normal((1, 3, 89, 89)).astype(np.float32)
    with torch.no_grad():
        want = tnet(torch.from_numpy(x))
    params = convert_pspnet(tnet.state_dict())
    got = PSPNet(classes=21).apply(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=5e-3,
                               rtol=1e-3)


def test_bisenet_parity(rng):
    from GAN2Shape.networks import BiSeNet as TorchBiSeNet
    tnet = TorchBiSeNet(n_classes=19)
    tnet.eval()
    for m in tnet.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.normal_(0, 0.05)
            m.running_var.uniform_(0.6, 1.4)
    x = rng.standard_normal((1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        want = tnet(torch.from_numpy(x))
    params = convert_bisenet(tnet.state_dict())
    got = BiSeNet(n_classes=19).apply(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=2e-3,
                               rtol=1e-3)
