"""PyTorch-checkpoint -> JAX-pytree converters for every frozen asset and for
reference-trained instances of the five trainable nets.

The reference consumes: StyleGAN2 checkpoints ('g_ema'/'d' keys,
model.py:31-35), view/light MVN stats (.pth dicts with 'mean'/'cov',
model.py:449-453), LPIPS linear heads (lpips/weights/v0.1/vgg.pth) over
torchvision VGG16 features, segmentation backbones, and its own per-net
training checkpoints (model.py:385-445).  All converters take plain
state-dict-like mappings (str -> array), so they work on torch tensors or
numpy arrays and never require torch at import time.
"""

import logging

import numpy as np

log = logging.getLogger(__name__)


def _np(t):
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    # always COPY: torch `.numpy()` shares the tensor's buffer, so without
    # a copy the converted weights would silently track later in-place
    # mutation of the torch module (e.g. its optimizer steps)
    return np.array(t, np.float32, copy=True)


def load_torch_file(path):
    import torch
    obj = torch.load(path, map_location="cpu", weights_only=False)
    return obj


# ---------------- StyleGAN2 (stylegan2 model.py naming) ----------------

def convert_generator(sd, n_mlp=8):
    """torch Generator state dict -> (flax params-dict, noise list).

    Mapping: style.{i} -> style_{i-1} (style.0 is the parameterless
    PixelNorm); conv1/to_rgb1/convs.{i}/to_rgbs.{i} keep their structure with
    FusedLeakyReLU biases surfacing as `act_bias`; blur/upsample FIR kernels
    are static constants on our side and are skipped."""
    p = {}
    for i in range(n_mlp):
        p[f"style_{i}"] = {"weight": _np(sd[f"style.{i + 1}.weight"]),
                           "bias": _np(sd[f"style.{i + 1}.bias"])}
    p["input"] = _np(sd["input.input"])

    def styled_conv(prefix):
        return {
            "conv": {
                "weight": _np(sd[f"{prefix}.conv.weight"]),
                "modulation": {
                    "weight": _np(sd[f"{prefix}.conv.modulation.weight"]),
                    "bias": _np(sd[f"{prefix}.conv.modulation.bias"]),
                },
            },
            "noise": {"weight": _np(sd[f"{prefix}.noise.weight"])},
            "act_bias": _np(sd[f"{prefix}.activate.bias"]),
        }

    def to_rgb(prefix):
        return {
            "conv": {
                "weight": _np(sd[f"{prefix}.conv.weight"]),
                "modulation": {
                    "weight": _np(sd[f"{prefix}.conv.modulation.weight"]),
                    "bias": _np(sd[f"{prefix}.conv.modulation.bias"]),
                },
            },
            "bias": _np(sd[f"{prefix}.bias"]),
        }

    p["conv1"] = styled_conv("conv1")
    p["to_rgb1"] = to_rgb("to_rgb1")
    i = 0
    while f"convs.{i}.conv.weight" in sd:
        p[f"convs_{i}"] = styled_conv(f"convs.{i}")
        i += 1
    j = 0
    while f"to_rgbs.{j}.conv.weight" in sd:
        p[f"to_rgbs_{j}"] = to_rgb(f"to_rgbs.{j}")
        j += 1

    noise = []
    k = 0
    while f"noises.noise_{k}" in sd:
        noise.append(_np(sd[f"noises.noise_{k}"]))
        k += 1
    return {"params": p}, noise


def convert_discriminator(sd):
    """torch Discriminator state dict -> flax params."""
    p = {"convs_0": {"conv": {"weight": _np(sd["convs.0.0.weight"])},
                     "act_bias": _np(sd["convs.0.1.bias"])}}
    i = 1
    while f"convs.{i}.conv1.0.weight" in sd:
        p[f"convs_{i}"] = {
            "conv1": {"conv": {"weight": _np(sd[f"convs.{i}.conv1.0.weight"])},
                      "act_bias": _np(sd[f"convs.{i}.conv1.1.bias"])},
            "conv2": {"conv": {"weight": _np(sd[f"convs.{i}.conv2.1.weight"])},
                      "act_bias": _np(sd[f"convs.{i}.conv2.2.bias"])},
            "skip": {"conv": {"weight": _np(sd[f"convs.{i}.skip.1.weight"])}},
        }
        i += 1
    p["final_conv"] = {"conv": {"weight": _np(sd["final_conv.0.weight"])},
                       "act_bias": _np(sd["final_conv.1.bias"])}
    p["final_linear_0"] = {"weight": _np(sd["final_linear.0.weight"]),
                           "bias": _np(sd["final_linear.0.bias"])}
    p["final_linear_1"] = {"weight": _np(sd["final_linear.1.weight"]),
                           "bias": _np(sd["final_linear.1.bias"])}
    return {"params": p}


def convert_gan_checkpoint(path, n_mlp=8):
    """Reference GAN checkpoint ('g_ema' + 'd' keys, model.py:31-35) ->
    (generator params, noise list, discriminator params)."""
    ckpt = load_torch_file(path)
    gen, noise = convert_generator(ckpt["g_ema"], n_mlp=n_mlp)
    disc = convert_discriminator(ckpt["d"])
    return gen, noise, disc


# ---------------- trainable nets (networks.py Sequential naming) ----------------

_ENCODER_CONVS = {0: "conv0", 2: "conv1", 4: "conv2", 6: "conv3",
                  8: "conv4", 10: "conv5", 12: "conv6"}


def convert_encoder_net(sd):
    """ViewpointNet / LightingNet (reference keys network.{i}.weight)."""
    p = {}
    for idx, name in _ENCODER_CONVS.items():
        p[name] = {"weight": _np(sd[f"network.{idx}.weight"])}
    return {"params": {"encoder": p}}


_ED_CONVS = {0: "down0", 3: "down1", 6: "down2", 9: "down3",
             11: "bottleneck", 13: "up0", 15: "up0b", 17: "up1", 20: "up1b",
             23: "up2", 26: "up2b", 29: "up3", 32: "up3b", 36: "up4",
             39: "up5", 42: "head"}
_ED_GNS = {1: "down0_gn", 4: "down1_gn", 7: "down2_gn", 18: "up1_gn",
           21: "up1b_gn", 24: "up2_gn", 27: "up2b_gn", 30: "up3_gn",
           33: "up3b_gn", 37: "up4_gn", 40: "up5_gn"}


def convert_encoder_decoder_net(sd):
    """DepthNet / AlbedoNet."""
    p = {}
    for idx, name in _ED_CONVS.items():
        p[name] = {"weight": _np(sd[f"network.{idx}.weight"])}
    for idx, name in _ED_GNS.items():
        p[name] = {"scale": _np(sd[f"network.{idx}.weight"]),
                   "bias": _np(sd[f"network.{idx}.bias"])}
    return {"params": {"net": p}}


def convert_offset_encoder(sd, image_size=128):
    def conv(prefix):
        return {"weight": _np(sd[f"{prefix}.weight"]),
                "bias": _np(sd[f"{prefix}.bias"])}

    def block(i):
        return {"res0": conv(f"network.{i}.res_path.1"),
                "res1": conv(f"network.{i}.res_path.3"),
                "idn": conv(f"network.{i}.identity_path.1")}

    p = {"stem": conv("network.0"),
         "block0": block(2), "block1": block(3), "block2": block(4)}
    if image_size == 128:
        p["block3"] = block(5)
        p["penult"] = conv("network.6")
        p["head"] = conv("network.8")
    else:
        p["penult"] = conv("network.5")
        p["head"] = conv("network.7")
    return {"params": p}


NET_CONVERTERS = {
    "viewpoint": convert_encoder_net,
    "lighting": convert_encoder_net,
    "depth": convert_encoder_decoder_net,
    "albedo": convert_encoder_decoder_net,
    "offset_encoder": convert_offset_encoder,
}


# ---------------- LPIPS / VGG ----------------

_VGG16_FEATURE_IDX = (0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28)


def convert_vgg16(sd, prefix="features"):
    """torchvision VGG16 `features.*` weights -> VGG16Features params."""
    p = {}
    for i, idx in enumerate(_VGG16_FEATURE_IDX):
        p[f"conv{i}"] = {"weight": _np(sd[f"{prefix}.{idx}.weight"]),
                         "bias": _np(sd[f"{prefix}.{idx}.bias"])}
    return p


def convert_alexnet(sd, prefix="features"):
    """torchvision AlexNet `features.*` conv weights -> AlexFeatures params
    (reference lpips/pretrained_networks.py:59-94 slices)."""
    pre = f"{prefix}." if prefix else ""
    p = {}
    for i, idx in enumerate((0, 3, 6, 8, 10)):
        p[f"conv{i}"] = {"weight": _np(sd[f"{pre}{idx}.weight"]),
                         "bias": _np(sd[f"{pre}{idx}.bias"])}
    return p


def convert_squeezenet(sd, prefix="features"):
    """torchvision SqueezeNet 1.1 `features.*` weights -> SqueezeFeatures
    params (reference lpips/pretrained_networks.py:6-57 slices)."""
    pre = f"{prefix}." if prefix else ""
    p = {"conv0": {"weight": _np(sd[f"{pre}0.weight"]),
                   "bias": _np(sd[f"{pre}0.bias"])}}
    # torchvision fire-module feature indices -> our fire2..fire9 naming
    for fire_i, idx in enumerate((3, 4, 6, 7, 9, 10, 11, 12), start=2):
        for ours, theirs in (("squeeze", "squeeze"),
                             ("expand1", "expand1x1"),
                             ("expand3", "expand3x3")):
            p[f"fire{fire_i}_{ours}"] = {
                "weight": _np(sd[f"{pre}{idx}.{theirs}.weight"]),
                "bias": _np(sd[f"{pre}{idx}.{theirs}.bias"])}
    return p


def convert_lpips_heads(sd, n_heads=5):
    """lpips v0.1 {vgg,alex,squeeze}.pth linear heads
    (keys lin{k}.model.1.weight; squeeze has 7)."""
    p = {}
    for k in range(n_heads):
        w = _np(sd[f"lin{k}.model.1.weight"])
        p[f"lin{k}"] = {"weight": w}
    return p


_BACKBONE_CONVERTERS = {"vgg": convert_vgg16, "alex": convert_alexnet,
                        "squeeze": convert_squeezenet}


def convert_lpips(backbone_sd, heads_sd, backbone="vgg"):
    """LPIPS params from a torchvision backbone state dict + the lpips v0.1
    linear-head state dict (reference dist_model.py:63-75 loading)."""
    from gan2shape_tpu.models.lpips import BACKBONE_CHNS
    p = {backbone: _BACKBONE_CONVERTERS[backbone](backbone_sd)}
    p.update(convert_lpips_heads(heads_sd, len(BACKBONE_CHNS[backbone])))
    return {"params": p}


# ---------------- segmentation nets ----------------

def _bn(sd, prefix):
    return {"scale": _np(sd[f"{prefix}.weight"]),
            "bias": _np(sd[f"{prefix}.bias"]),
            "running_mean": _np(sd[f"{prefix}.running_mean"]),
            "running_var": _np(sd[f"{prefix}.running_var"])}


def _conv(sd, prefix, bias=False):
    out = {"weight": _np(sd[f"{prefix}.weight"])}
    if bias and f"{prefix}.bias" in sd:
        out["bias"] = _np(sd[f"{prefix}.bias"])
    return out


def _strip_module(sd):
    return {(k[7:] if k.startswith("module.") else k): v
            for k, v in sd.items()}


def convert_pspnet(sd, layers=(3, 4, 6, 3)):
    """PSPNet-50 VOC checkpoint (reference model.py:487-491; torch naming
    from networks.py:273-327) -> flax params."""
    sd = _strip_module(sd)
    bk = {"conv1": _conv(sd, "layer0.0"), "bn1": _bn(sd, "layer0.1"),
          "conv2": _conv(sd, "layer0.3"), "bn2": _bn(sd, "layer0.4"),
          "conv3": _conv(sd, "layer0.6"), "bn3": _bn(sd, "layer0.7")}
    for L, n_blocks in enumerate(layers, start=1):
        for i in range(n_blocks):
            t = f"layer{L}.{i}"
            blk = {}
            for j in (1, 2, 3):
                blk[f"conv{j}"] = _conv(sd, f"{t}.conv{j}")
                blk[f"bn{j}"] = _bn(sd, f"{t}.bn{j}")
            if f"{t}.downsample.0.weight" in sd:
                blk["downsample_0"] = _conv(sd, f"{t}.downsample.0")
                blk["downsample_1"] = _bn(sd, f"{t}.downsample.1")
            bk[f"layer{L}_{i}"] = blk
    p = {"backbone": bk}
    for i in range(4):
        p[f"ppm_{i}_conv"] = _conv(sd, f"ppm.features.{i}.1")
        p[f"ppm_{i}_bn"] = _bn(sd, f"ppm.features.{i}.2")
    p["cls_conv"] = _conv(sd, "cls.0")
    p["cls_bn"] = _bn(sd, "cls.1")
    p["cls_head"] = _conv(sd, "cls.4", bias=True)
    return {"params": p}


def convert_bisenet(sd):
    """BiSeNet face parser (reference model.py:484-485; torch naming from
    networks.py:357-586) -> flax params."""
    sd = _strip_module(sd)

    def cbr(prefix):
        return {"conv": _conv(sd, f"{prefix}.conv"),
                "bn": _bn(sd, f"{prefix}.bn")}

    def arm(prefix):
        return {"conv": cbr(f"{prefix}.conv"),
                "conv_atten": _conv(sd, f"{prefix}.conv_atten"),
                "bn_atten": _bn(sd, f"{prefix}.bn_atten")}

    rn = {"conv1": _conv(sd, "cp.resnet.conv1"),
          "bn1": _bn(sd, "cp.resnet.bn1")}
    for L in range(1, 5):
        for i in range(2):
            t = f"cp.resnet.layer{L}.{i}"
            blk = {"conv1": _conv(sd, f"{t}.conv1"),
                   "bn1": _bn(sd, f"{t}.bn1"),
                   "conv2": _conv(sd, f"{t}.conv2"),
                   "bn2": _bn(sd, f"{t}.bn2")}
            if f"{t}.downsample.0.weight" in sd:
                blk["downsample_0"] = _conv(sd, f"{t}.downsample.0")
                blk["downsample_1"] = _bn(sd, f"{t}.downsample.1")
            rn[f"layer{L}_{i}"] = blk

    p = {"cp_resnet": rn,
         "cp_conv_avg": cbr("cp.conv_avg"),
         "cp_arm32": arm("cp.arm32"),
         "cp_arm16": arm("cp.arm16"),
         "cp_conv_head32": cbr("cp.conv_head32"),
         "cp_conv_head16": cbr("cp.conv_head16"),
         "ffm": {"convblk": cbr("ffm.convblk"),
                 "conv1": _conv(sd, "ffm.conv1"),
                 "conv2": _conv(sd, "ffm.conv2")},
         "conv_out": {"conv": cbr("conv_out.conv"),
                      "conv_out": _conv(sd, "conv_out.conv_out")}}
    return {"params": p}


# ---------------- view/light MVN ----------------

def convert_mvn(path):
    d = load_torch_file(path)
    return {"mean": _np(d["mean"]), "cov": _np(d["cov"])}


# ---------------- one-call frozen bundle ----------------

def build_frozen(model, gan_ckpt_path=None, vgg_path=None, lpips_path=None,
                 key=None):
    """Assemble the frozen-params dict for core.model.GAN2Shape, converting
    whatever assets exist and random-initializing the rest."""
    import jax

    key = key if key is not None else jax.random.PRNGKey(0)
    frozen = model.init_frozen(key)
    if gan_ckpt_path:
        gen, noise, disc = convert_gan_checkpoint(gan_ckpt_path)
        frozen["generator"], frozen["noise"] = gen, [
            np.asarray(n) for n in noise]
        frozen["discriminator"] = disc
        log.info("converted GAN checkpoint %s", gan_ckpt_path)
    if vgg_path and lpips_path:
        vgg_sd = load_torch_file(vgg_path)
        heads_sd = load_torch_file(lpips_path)
        frozen["lpips"] = convert_lpips(vgg_sd, heads_sd)
        log.info("converted LPIPS weights")
    if model.truncation < 1 and gan_ckpt_path:
        frozen["mean_latent"] = model.generator.apply(
            frozen["generator"], jax.random.PRNGKey(42), 4096,
            method="mean_latent")
    return frozen
