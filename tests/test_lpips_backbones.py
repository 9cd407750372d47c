"""LPIPS alternate backbones (alex/squeeze) and the non-network distance
modes (reference lpips/pretrained_networks.py + dist_model.py:77-84).

Oracles: hand-built torch Sequentials with torchvision's exact
alexnet.features / squeezenet1_1.features layout (torchvision itself is not
in this image), randomly initialized, converted with torch2jax — the same
pattern test_method_parity.py uses for the fake VGG16."""

import numpy as np
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

from gan2shape_tpu.convert import torch2jax as cv  # noqa: E402
from gan2shape_tpu.models import lpips as L  # noqa: E402


def _torch_alexnet_features():
    nn = torch.nn
    return nn.Sequential(
        nn.Conv2d(3, 64, 11, 4, 2), nn.ReLU(True),        # 0, 1
        nn.MaxPool2d(3, 2),                               # 2
        nn.Conv2d(64, 192, 5, 1, 2), nn.ReLU(True),       # 3, 4
        nn.MaxPool2d(3, 2),                               # 5
        nn.Conv2d(192, 384, 3, 1, 1), nn.ReLU(True),      # 6, 7
        nn.Conv2d(384, 256, 3, 1, 1), nn.ReLU(True),      # 8, 9
        nn.Conv2d(256, 256, 3, 1, 1), nn.ReLU(True),      # 10, 11
    )


class _Fire(torch.nn.Module):
    def __init__(self, cin, sq, ex):
        super().__init__()
        nn = torch.nn
        self.squeeze = nn.Conv2d(cin, sq, 1)
        self.squeeze_activation = nn.ReLU(True)
        self.expand1x1 = nn.Conv2d(sq, ex, 1)
        self.expand1x1_activation = nn.ReLU(True)
        self.expand3x3 = nn.Conv2d(sq, ex, 3, padding=1)
        self.expand3x3_activation = nn.ReLU(True)

    def forward(self, x):
        x = self.squeeze_activation(self.squeeze(x))
        return torch.cat([
            self.expand1x1_activation(self.expand1x1(x)),
            self.expand3x3_activation(self.expand3x3(x))], 1)


def _torch_squeezenet_features():
    nn = torch.nn
    return nn.Sequential(
        nn.Conv2d(3, 64, 3, 2), nn.ReLU(True),            # 0, 1
        nn.MaxPool2d(3, 2, ceil_mode=True),               # 2
        _Fire(64, 16, 64), _Fire(128, 16, 64),            # 3, 4
        nn.MaxPool2d(3, 2, ceil_mode=True),               # 5
        _Fire(128, 32, 128), _Fire(256, 32, 128),         # 6, 7
        nn.MaxPool2d(3, 2, ceil_mode=True),               # 8
        _Fire(256, 48, 192), _Fire(384, 48, 192),         # 9, 10
        _Fire(384, 64, 256), _Fire(512, 64, 256),         # 11, 12
    )


def _torch_taps(features, x, tap_idx):
    taps = []
    h = x
    for i, m in enumerate(features):
        h = m(h)
        if i in tap_idx:
            taps.append(h.detach().numpy())
    return taps


@pytest.mark.parametrize("size", [128, 67])
def test_alex_features_parity(size):
    torch.manual_seed(0)
    feats = _torch_alexnet_features()
    x = np.random.default_rng(0).uniform(
        -1, 1, (2, 3, size, size)).astype(np.float32)
    want = _torch_taps(feats, torch.from_numpy(x), {1, 4, 7, 9, 11})

    params = cv.convert_alexnet(feats.state_dict(), prefix="")
    # state_dict keys are "0.weight" etc. with the empty prefix -> strip dot
    params = {k: v for k, v in params.items()}
    got = L.AlexFeatures().apply({"params": params}, jnp.asarray(x))
    assert len(got) == len(want) == 5
    for g, t in zip(got, want):
        assert g.shape == t.shape
        np.testing.assert_allclose(np.asarray(g), t, atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("size", [128, 67])
def test_squeeze_features_parity(size):
    torch.manual_seed(1)
    feats = _torch_squeezenet_features()
    x = np.random.default_rng(1).uniform(
        -1, 1, (2, 3, size, size)).astype(np.float32)
    want = _torch_taps(feats, torch.from_numpy(x),
                       {1, 4, 7, 9, 10, 11, 12})

    params = cv.convert_squeezenet(feats.state_dict(), prefix="")
    got = L.SqueezeFeatures().apply({"params": params}, jnp.asarray(x))
    assert len(got) == len(want) == 7
    for g, t in zip(got, want):
        assert g.shape == t.shape
        np.testing.assert_allclose(np.asarray(g), t, atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("backbone,n_heads",
                         [("alex", 5), ("squeeze", 7)])
def test_lpips_netlin_heads_and_net_mode(backbone, n_heads):
    """net-lin applies the converted v0.1-style heads; 'net' mode sums
    unit-weight normalized differences (dist_model.py:77-78)."""
    torch.manual_seed(2)
    feats = (_torch_alexnet_features() if backbone == "alex"
             else _torch_squeezenet_features())
    heads_sd = {
        f"lin{k}.model.1.weight": torch.rand(
            1, L.BACKBONE_CHNS[backbone][k], 1, 1)
        for k in range(n_heads)}
    # the bare Sequential has no "features." prefix — convert directly
    params = {backbone: (cv.convert_alexnet if backbone == "alex"
                         else cv.convert_squeezenet)(
        feats.state_dict(), prefix="")}
    params.update(cv.convert_lpips_heads(heads_sd, n_heads))

    rng = np.random.default_rng(3)
    a = jnp.asarray(rng.uniform(-1, 1, (2, 3, 64, 64)).astype(np.float32))
    b = jnp.asarray(rng.uniform(-1, 1, (2, 3, 64, 64)).astype(np.float32))

    d = L.perceptual_distance(params, a, b, model="net-lin", net=backbone)
    assert d.shape == (2, 1, 1, 1)
    assert np.all(np.asarray(d) > 0)
    # identical inputs -> exactly zero
    d0 = L.perceptual_distance(params, a, a, model="net-lin", net=backbone)
    np.testing.assert_allclose(np.asarray(d0), 0, atol=1e-7)

    dn = L.perceptual_distance(params, a, b, model="net", net=backbone)
    assert np.all(np.asarray(dn) > 0)


def test_l2_and_dssim_modes():
    rng = np.random.default_rng(4)
    a = jnp.asarray(rng.uniform(-1, 1, (2, 3, 64, 64)).astype(np.float32))
    noise = jnp.asarray(
        rng.normal(0, 0.05, (2, 3, 64, 64)).astype(np.float32))
    b = jnp.clip(a + noise, -1, 1)

    # L2 RGB: plain per-sample MSE
    d = L.perceptual_distance(None, a, b, model="L2", colorspace="RGB")
    np.testing.assert_allclose(
        np.asarray(d), np.mean(np.asarray((a - b) ** 2), axis=(1, 2, 3)),
        rtol=1e-6)
    # Lab variant positive, zero at identity
    dl = L.perceptual_distance(None, a, b, model="L2", colorspace="Lab")
    assert np.all(np.asarray(dl) > 0)
    np.testing.assert_allclose(np.asarray(
        L.perceptual_distance(None, a, a, model="L2", colorspace="Lab")),
        0, atol=1e-9)

    # DSSIM: 0 at identity, grows with noise, bounded in [0, 1]
    d0 = L.perceptual_distance(None, a, a, model="DSSIM")
    np.testing.assert_allclose(np.asarray(d0), 0, atol=1e-5)
    d1 = L.perceptual_distance(None, a, b, model="DSSIM")
    d2 = L.perceptual_distance(
        None, a, jnp.clip(a + 4 * noise, -1, 1), model="DSSIM")
    assert np.all(np.asarray(d1) > 0)
    assert np.all(np.asarray(d2) > np.asarray(d1))
    assert np.all(np.asarray(d2) < 1.0)

    # normalize=True rescales [0,1] inputs to [-1,1]
    dn = L.perceptual_distance(None, (a + 1) / 2, (b + 1) / 2, model="L2",
                               normalize=True)
    np.testing.assert_allclose(np.asarray(dn), np.asarray(d), rtol=1e-5)


def test_rgb2lab_known_values():
    """White -> L=100, a=b=0; black -> L=0 (CIELAB definition)."""
    white = jnp.ones((1, 3, 1, 1))
    black = -jnp.ones((1, 3, 1, 1))
    lw = np.asarray(L.rgb2lab(white))[0, :, 0, 0]
    lb = np.asarray(L.rgb2lab(black))[0, :, 0, 0]
    np.testing.assert_allclose(lw, [100.0, 0.0, 0.0], atol=2e-2)
    np.testing.assert_allclose(lb, [0.0, 0.0, 0.0], atol=2e-2)
