"""Auxiliary subsystem tests: gradient diagnostics, tensor utils, the
working StyleGAN2 training step, priors, config merge, checkpoint naming."""

import numpy as np
import jax
import jax.numpy as jnp
import torch
import pytest

from gan2shape_tpu.core.diagnostics import grad_norms, StepTimer
from gan2shape_tpu.utils.tensor_utils import (
    mm_normalize, rand_range, rand_posneg_range, get_grid, get_mask_range,
)
from gan2shape_tpu.core.priors import PriorGenerator, FallbackMasker
from gan2shape_tpu.utils.config import load_config, DEFAULTS


def test_grad_norms_and_timer():
    g = {"albedo": {"w": jnp.ones((2, 2))}, "depth": {"w": jnp.zeros(3)}}
    norms = grad_norms(g)
    assert float(norms["albedo"]) == 2.0
    assert float(norms["depth"]) == 0.0
    t = StepTimer()
    with t.time("block", n_iters=10):
        pass
    assert t.summary()[0]["name"] == "block"


def test_tensor_utils(rng):
    x = jnp.asarray(rng.standard_normal((5, 5)).astype(np.float32))
    n = mm_normalize(x, 0, 1)
    assert float(n.min()) == 0.0 and abs(float(n.max()) - 1.0) < 1e-6

    key = jax.random.PRNGKey(0)
    r = rand_range(key, (1000,), 2.0, 3.0)
    assert float(r.min()) >= 2.0 and float(r.max()) <= 3.0
    rp = rand_posneg_range(key, (1000,), 0.5, 1.0)
    assert (np.abs(np.asarray(rp)) >= 0.5 - 1e-6).all()

    grid = get_grid(2, 4, 6, normalize=True)
    assert grid.shape == (2, 4, 6, 2)
    # torch parity of the (x, y) ordering
    h_range = torch.linspace(-1, 1, 4)
    w_range = torch.linspace(-1, 1, 6)
    tg = torch.stack(torch.meshgrid([h_range, w_range],
                                    indexing="ij"), -1).flip(2)
    np.testing.assert_allclose(np.asarray(grid[0]), tg.numpy(), atol=1e-6)

    mask = np.zeros((8, 8), bool)
    mask[2:5, 3:7] = True
    max_y, min_y, max_x, min_x = get_mask_range(jnp.asarray(mask))
    assert (int(max_y), int(min_y), int(max_x), int(min_x)) == (4, 2, 6, 3)


def test_all_priors_run(rng):
    img = rng.uniform(-1, 1, (3, 32, 32)).astype(np.float32)
    for name in ("box", "masked_box", "smoothed_box", "ellipsoid",
                 "confidence", "smoothed_confidence"):
        pg = PriorGenerator(32, "face", name,
                            masking_model=FallbackMasker(32))
        prior = pg(img)
        assert prior.shape == (1, 32, 32), name
        assert np.isfinite(prior).all(), name
        if name in ("ellipsoid", "smoothed_box", "smoothed_confidence"):
            # depth-valued priors stay in the near/far band; box variants
            # are 0/1-flavored like the reference (priors.py:26-45)
            assert prior.min() >= 0.85 and prior.max() <= 1.1, name


def test_config_merge(tmp_path):
    cfg = load_config(overrides={"image_size": 64})
    assert cfg["image_size"] == 64
    assert cfg["prior_name"] == DEFAULTS["prior_name"]


def _tiny_params(seed=0):
    from gan2shape_tpu.core.checkpoint import NETS
    rng = np.random.default_rng(seed)
    return {net: {"w": jnp.asarray(rng.standard_normal(4).astype(np.float32))}
            for net in NETS}


def test_checkpoint_latest_is_temporal_not_lexical(tmp_path):
    """Multi-image + stage>=10 ordering: the lexical filename sort would put
    manifest_image_10_stage_11_... BEFORE manifest_image_2_stage_1_... —
    'latest' must follow save time (tie-broken by stage/total_it), reference
    resume semantics main.py:106-114."""
    from gan2shape_tpu.core.checkpoint import CheckpointManager
    mgr = CheckpointManager(str(tmp_path / "ckpts"))
    older = _tiny_params(1)
    newer = _tiny_params(2)
    mgr.save(older, img_idx=2, stage=1, total_it=100, category="face")
    mgr.save(newer, img_idx=10, stage=11, total_it=50, category="face")

    template = _tiny_params(9)
    got = mgr.load_latest_general("face", template)
    np.testing.assert_array_equal(np.asarray(got["depth"]["w"]),
                                  np.asarray(newer["depth"]["w"]))


def test_checkpoint_selectors_and_per_image(tmp_path):
    """stage/iteration/time glob selectors (reference main.py:111-113,
    model.py:426-428) + per-image latest selection."""
    from gan2shape_tpu.core.checkpoint import CheckpointManager
    mgr = CheckpointManager(str(tmp_path / "ckpts"))
    p_s0 = _tiny_params(1)
    p_s1 = _tiny_params(2)
    p_img1 = _tiny_params(3)
    mgr.save(p_s0, img_idx=0, stage=0, total_it=10, category="cat")
    mgr.save(p_s1, img_idx=0, stage=1, total_it=20, category="cat")
    mgr.save(p_img1, img_idx=1, stage=0, total_it=10, category="cat")

    template = _tiny_params(9)
    # resume from a specific stage even when a later one exists (two stage-0
    # saves may share a timestamp — either is a valid "latest", but the
    # stage-1 save must be excluded)
    got = mgr.load_latest_general("cat", template, stage="0")
    w = np.asarray(got["depth"]["w"])
    assert (np.array_equal(w, np.asarray(p_s0["depth"]["w"]))
            or np.array_equal(w, np.asarray(p_img1["depth"]["w"])))
    assert not np.array_equal(w, np.asarray(p_s1["depth"]["w"]))
    assert len(mgr.select("cat", stage="0")) == 2

    # time selector: exact stamp of the stage-1 save narrows to it
    stamp = [m for m in mgr.manifests("cat")
             if m["stage"] == 1][0]["time"]
    got = mgr.load_latest_general("cat", template, time=stamp)
    np.testing.assert_array_equal(np.asarray(got["depth"]["w"]),
                                  np.asarray(p_s1["depth"]["w"]))

    # unmatched selector errors like a missing checkpoint dir
    with pytest.raises(FileNotFoundError):
        mgr.load_latest_general("cat", template, stage="7")

    # per-image iteration yields each image's (temporally) latest
    pairs = dict(mgr.load_per_image("cat", template))
    assert sorted(pairs) == ["0", "1"]
    np.testing.assert_array_equal(np.asarray(pairs["0"]["depth"]["w"]),
                                  np.asarray(p_s1["depth"]["w"]))
    np.testing.assert_array_equal(np.asarray(pairs["1"]["depth"]["w"]),
                                  np.asarray(p_img1["depth"]["w"]))


def test_make_gallery(tmp_path, rng):
    """Gallery assembly from per-image artifacts (reference docs/index.html
    contract: one entry per instance embedding the interactive viewer)."""
    from gan2shape_tpu.utils.plotting import write_3d_html, make_gallery
    res = tmp_path / "results"
    (res / "htmls").mkdir(parents=True)
    (res / "plots").mkdir()
    z = rng.standard_normal((8, 8)).astype(np.float32)
    for i in range(2):
        write_3d_html(z, None, str(res / "htmls" / f"depth_{i}.html"))
    out = make_gallery(str(res))
    assert out and out.endswith("index.html")
    html = open(out).read()
    assert "htmls/depth_0.html" in html and "htmls/depth_1.html" in html
    # empty dir -> graceful None
    assert make_gallery(str(tmp_path / "nowhere")) is None


@pytest.mark.slow
def test_stylegan2_train_step(rng):
    """Main alternating step + EMA accumulation math + lazy R1 + lazy
    path-length regularization (reference train.py:126-268 feature set)."""
    from gan2shape_tpu.models.stylegan2_train import StyleGAN2Trainer
    t = StyleGAN2Trainer(size=32, style_dim=64, n_mlp=2,
                         channel_multiplier=1)
    state = t.init(jax.random.PRNGKey(0), batch_size=2)
    ema0 = jax.tree_util.tree_map(np.asarray, state.g_ema)
    real = jnp.asarray(rng.uniform(-1, 1, (2, 3, 32, 32)).astype(np.float32))
    state, metrics = t.train_step(state, real, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["d_loss"]))
    assert np.isfinite(float(metrics["g_loss"]))
    assert abs(float(metrics["real_sign_sum"])) <= 2.0

    # EMA: exactly decay*old + (1-decay)*new on every leaf (train.py:50-55)
    leaves_e, treedef = jax.tree_util.tree_flatten(state.g_ema)
    leaves_p = treedef.flatten_up_to(state.g_params)
    leaves_0 = treedef.flatten_up_to(ema0)
    for e, p, z in zip(leaves_e, leaves_p, leaves_0):
        np.testing.assert_allclose(
            np.asarray(e), z * t.ema_decay + np.asarray(p)
            * (1 - t.ema_decay), rtol=1e-5, atol=1e-6)

    # lazy R1 step updates D and returns a finite penalty
    state, r1 = t.d_reg_step(state, real, jax.random.PRNGKey(2))
    assert np.isfinite(float(r1))

    # lazy path-length step updates G and the running mean path length
    state, pmetrics = t.g_reg_step(state, jax.random.PRNGKey(3))
    assert np.isfinite(float(pmetrics["path_loss"]))
    assert float(pmetrics["mean_path_length"]) > 0

    # a second main step must also run (optimizer states thread through)
    state, metrics = t.train_step(state, real, jax.random.PRNGKey(4))
    assert np.isfinite(float(metrics["g_loss"]))


@pytest.mark.slow
def test_stylegan2_train_resume_and_ema_sampling(rng, tmp_path):
    """Full-state checkpoint/resume (train.py:313-329, 473-490) + EMA
    sampling + augmented training with a traced ada_p."""
    from gan2shape_tpu.models.stylegan2_train import StyleGAN2Trainer
    from gan2shape_tpu.models.augment import AdaptiveAugment
    t = StyleGAN2Trainer(size=16, style_dim=32, n_mlp=2,
                         channel_multiplier=1, use_augment=True)
    state = t.init(jax.random.PRNGKey(0), batch_size=2)
    real = jnp.asarray(rng.uniform(-1, 1, (2, 3, 16, 16)).astype(np.float32))
    ada = AdaptiveAugment(update_every=2, ada_aug_len=10)
    ada_p = 0.0
    for i in range(3):
        state, metrics = t.train_step(state, real, jax.random.PRNGKey(i),
                                      jnp.float32(ada_p))
        ada_p = ada.tune(metrics["real_sign_sum"], real.shape[0])
    assert np.isfinite(float(metrics["d_loss"]))

    path = str(tmp_path / "gan" / "000003.msgpack")
    t.save_checkpoint(state, path, iteration=3, ada_p=ada_p)
    state2, it, ada_p2 = t.load_checkpoint(path, batch_size=2)
    assert it == 3 and abs(ada_p2 - ada_p) < 1e-8
    for a, b in zip(jax.tree_util.tree_leaves(state.g_ema),
                    jax.tree_util.tree_leaves(state2.g_ema)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_allclose(float(state2.mean_path_length),
                               float(state.mean_path_length))

    z = jnp.asarray(rng.standard_normal((2, 32)).astype(np.float32))
    img = t.sample_ema(state2, z)
    assert img.shape == (2, 3, 16, 16)
    assert np.isfinite(np.asarray(img)).all()


@pytest.mark.slow
def test_stylegan2_train_data_parallel_mesh(rng):
    """The same step with the real batch sharded over the 8-virtual-device
    mesh — XLA inserts the gradient all-reduces (the reference's broken
    DDP/NCCL path, train.py:435-506, replaced by sharding)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from gan2shape_tpu.models.stylegan2_train import StyleGAN2Trainer

    devs = np.array(jax.devices()[:8])
    mesh = Mesh(devs, ("data",))
    t = StyleGAN2Trainer(size=16, style_dim=32, n_mlp=2,
                         channel_multiplier=1)
    state = t.init(jax.random.PRNGKey(0), batch_size=8)
    real = jnp.asarray(rng.uniform(-1, 1, (8, 3, 16, 16)).astype(np.float32))
    real = jax.device_put(real, NamedSharding(mesh, P("data")))
    state = jax.device_put(state, NamedSharding(mesh, P()))
    state, metrics = t.train_step(state, real, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["d_loss"]))
    assert np.isfinite(float(metrics["g_loss"]))
