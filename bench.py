"""Benchmark: render+invert optimization steps/sec/chip at face 128².

Runs the full three-step GAN2Shape stage loop (the hot path of instance
training) on one chip with the face config (image 128², GAN 128,
n_proj_samples=16 — configs/face.yml in the reference) and reports
steady-state optimization steps per second.

vs_baseline: the reference publishes no numbers (BASELINE.json published={});
the north-star target is the full instance schedule (1000 prior + 4900 step
iterations) in <= 5 minutes on one chip, i.e. 19.67 steps/sec.  vs_baseline is
measured steps/sec divided by that target rate — >= 1.0 means the north star
is met.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import argparse
import json
import time

import numpy as np

NORTH_STAR_STEPS_PER_SEC = (1000 + 4900) / 300.0  # 19.67


def bench_instances(k):
    """Instance-batched throughput on ONE chip: K instances trained
    simultaneously through InstanceParallelTrainer (1-device mesh, vmap
    branch).  Reports AGGREGATE optimization steps/sec (each scanned step
    advances all K instances).  PERF ledger: single-chip utilization lever
    for the tiny per-instance convs."""
    import jax
    from gan2shape_tpu.parallel import InstanceParallelTrainer
    from gan2shape_tpu.parallel.mesh import make_mesh

    config = {
        "image_size": 128, "gan_size": 128, "z_dim": 512,
        "channel_multiplier": 1, "category": "face",
        "n_proj_samples": 16, "n_epochs_prior": 10,
        "learning_rate": 1e-4, "prior_name": "box",
        "rot_center_depth": 1.0, "fov": 10,
    }
    mesh = make_mesh(1)
    trainer = InstanceParallelTrainer(config, n_instances=k, mesh=mesh)
    rng = np.random.default_rng(0)
    images = rng.uniform(-1, 1, (k, 3, 128, 128)).astype(np.float32)
    latents = rng.standard_normal((k, 512)).astype(np.float32)
    priors = np.full((k, 128, 128), 1.0, np.float32)
    n = 15
    stage = [{"step1": n, "step2": n, "step3": n}]

    trainer.fit(images, latents, priors, stages=stage)  # compile + warmup
    t0 = time.perf_counter()
    n_blocks = 2
    for _ in range(n_blocks):
        trainer.fit(images, latents, priors=None, stages=stage)
    dt = time.perf_counter() - t0
    agg = n_blocks * 3 * n * k / dt
    print(json.dumps({
        "metric": f"gan2shape_face128_instance_batched_steps_per_sec_x{k}",
        "value": round(agg, 3),
        "unit": f"aggregate optimization steps/sec ({k} instances, 1 chip)",
        "vs_baseline": round(agg / NORTH_STAR_STEPS_PER_SEC, 3),
    }))


def main(raster_window=None):
    import jax
    import jax.numpy as jnp
    from gan2shape_tpu.core.trainer import Trainer

    config = {
        "image_size": 128, "gan_size": 128, "z_dim": 512,
        "channel_multiplier": 1, "category": "face",
        "n_proj_samples": 16, "n_epochs_prior": 100,
        "learning_rate": 1e-4, "prior_name": "box",
        "rot_center_depth": 1.0, "fov": 10,
    }
    if raster_window is not None:  # A/B knob, shipping default when None
        config["raster_window"] = raster_window
    trainer = Trainer(config)
    rng = np.random.default_rng(0)
    image = jnp.asarray(rng.uniform(-1, 1, (1, 3, 128, 128))
                        .astype(np.float32))
    latent = jnp.asarray(rng.standard_normal((1, 512)).astype(np.float32))

    n1 = n2 = n3 = 25  # per-block iterations; measured over repeated blocks

    def run_block():
        p, trainer.opt_states[1], coll, l1 = trainer._run_step1(
            trainer.params, trainer.opt_states[1], trainer.frozen, image,
            n_iters=n1)
        trainer.params = p
        p, trainer.opt_states[2], coll2, l2 = trainer._run_step2(
            trainer.params, trainer.opt_states[2], trainer.frozen, image,
            latent, coll, trainer._next_key(), n_iters=n2, n_proj=16)
        trainer.params = p
        p, trainer.opt_states[3], l3 = trainer._run_step3(
            trainer.params, trainer.opt_states[3], trainer.frozen, image,
            latent, coll2, n_iters=n3)
        trainer.params = p
        return l3

    # compile + warmup
    jax.block_until_ready(run_block())

    n_blocks = 4
    t0 = time.perf_counter()
    for _ in range(n_blocks):
        out = run_block()
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    steps = n_blocks * (n1 + n2 + n3)
    steps_per_sec = steps / dt
    print(json.dumps({
        "metric": "gan2shape_face128_steps_per_sec_per_chip",
        "value": round(steps_per_sec, 3),
        "unit": "optimization steps/sec (step1+2+3 mix, n_proj=16)",
        "vs_baseline": round(steps_per_sec / NORTH_STAR_STEPS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--instances", type=int, default=0,
                    help="bench K instance-batched training on one chip")
    ap.add_argument("--raster-window", type=int, default=None,
                    help="override the grid rasterizer window (A/B)")
    args = ap.parse_args()
    if args.instances > 0:
        bench_instances(args.instances)
    else:
        main(raster_window=args.raster_window)
