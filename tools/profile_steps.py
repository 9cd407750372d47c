"""Per-step TPU timing of the GAN2Shape hot loops.

Times run_prior / run_step1 / run_step2 / run_step3 individually (n-iter
jitted scans, inputs re-randomized between repeats so the runtime can't
dedupe identical executions — see PERF_NOTES.md) and prints ms/iter.

    G2S_MATMUL_PRECISION=default python tools/profile_steps.py [--iters 25]
"""

import argparse
import os
import sys
import time

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=25)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--n-proj", type=int, default=16)
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--raster-window", type=int, default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from gan2shape_tpu.core.trainer import Trainer

    s = args.size
    config = {
        "image_size": s, "gan_size": s, "z_dim": 512,
        "channel_multiplier": 1, "category": "face",
        "n_proj_samples": args.n_proj, "n_epochs_prior": 100,
        "learning_rate": 1e-4, "prior_name": "box",
        "rot_center_depth": 1.0, "fov": 10,
    }
    if args.raster_window is not None:
        config["raster_window"] = args.raster_window
    trainer = Trainer(config)
    rng = np.random.default_rng(0)
    n = args.iters

    def fresh_image():
        return jnp.asarray(rng.uniform(-1, 1, (1, 3, s, s))
                           .astype(np.float32))

    latent = jnp.asarray(rng.standard_normal((1, 512)).astype(np.float32))
    prior = jnp.asarray(np.full((s, s), 1.0, np.float32))

    def timed(name, fn):
        fn()  # compile + warmup
        ts = []
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            jax.block_until_ready(fn())
            ts.append(time.perf_counter() - t0)
        ms = min(ts) / n * 1000
        print(f"{name:10s} {ms:8.2f} ms/iter  (best of {args.repeats})")
        return ms

    def prior_fn():
        img = fresh_image()
        p, st, losses = trainer._run_prior(
            trainer.params["depth"], trainer.optimizers[1].init(
                trainer.params["depth"]), img, prior, n_iters=n)
        trainer.params["depth"] = p
        return losses

    def step1_fn():
        img = fresh_image()
        p, trainer.opt_states[1], coll, l1 = trainer._run_step1(
            trainer.params, trainer.opt_states[1], trainer.frozen, img,
            n_iters=n)
        trainer.params = p
        step1_fn.coll = coll
        step1_fn.img = img
        return l1

    def step2_fn():
        p, trainer.opt_states[2], coll2, l2 = trainer._run_step2(
            trainer.params, trainer.opt_states[2], trainer.frozen,
            step1_fn.img, latent, step1_fn.coll, trainer._next_key(),
            n_iters=n, n_proj=args.n_proj)
        trainer.params = p
        step2_fn.coll2 = coll2
        return l2

    def step3_fn():
        p, trainer.opt_states[3], l3 = trainer._run_step3(
            trainer.params, trainer.opt_states[3], trainer.frozen,
            step1_fn.img, latent, step2_fn.coll2, n_iters=n)
        trainer.params = p
        return l3

    print(f"device={jax.devices()[0]} precision="
          f"{os.environ.get('G2S_MATMUL_PRECISION', 'default')} size={s} "
          f"n_proj={args.n_proj} iters={n}")
    m_p = timed("prior", prior_fn)
    m_1 = timed("step1", step1_fn)
    m_2 = timed("step2", step2_fn)
    m_3 = timed("step3", step3_fn)
    mix = 3000.0 / (m_1 + m_2 + m_3)
    sched = (1000 * m_p + 1300 * m_1 + 2200 * m_2 + 1800 * m_3) / 1000
    print(f"bench-mix steps/s = {mix:.2f} | full instance schedule = "
          f"{sched:.1f}s (target 300s)")


if __name__ == "__main__":
    main()
