"""Run ONE full reference instance schedule on the real chip and time it.

The BASELINE.md north star: full 3-stage face-128² shape recovery — 1000
prior epochs + stages [{700,700,600}, 3x{200,500,400}] = 5900 optimization
iterations — in <= 5 minutes on one chip.  This runs exactly that schedule
through the Trainer and writes FULL_RUN.json with wall-clock (first run
includes compilation of the 7 distinct (step, n_iters) modules; the steady
-state number times a second instance through the already-compiled steps,
which is what a multi-image run pays per instance).

    python tools/full_instance_run.py
"""

import json
import os
import sys
import time

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)


def main():
    import jax
    import jax.numpy as jnp
    from gan2shape_tpu.core.trainer import Trainer

    config = {
        "image_size": 128, "gan_size": 128, "z_dim": 512,
        "channel_multiplier": 1, "category": "face",
        "n_proj_samples": 16, "n_epochs_prior": 1000,
        "learning_rate": 1e-4, "prior_name": "box",
        "rot_center_depth": 1.0, "fov": 10,
    }
    if "--no-chunk" in sys.argv:
        config["compile_chunk"] = 0  # the round-2 behavior: 7 distinct jits
    for a in sys.argv[1:]:
        if a.startswith("--chunk="):  # chunk-size sweep (PERF_NOTES item 8)
            config["compile_chunk"] = int(a.split("=", 1)[1])
    stages = [{"step1": 700, "step2": 700, "step3": 600}] + \
        [{"step1": 200, "step2": 500, "step3": 400}] * 3
    n_steps = 1000 + sum(sum(s.values()) for s in stages)

    trainer = Trainer(config)
    entries0 = _cache_entries()
    rng = np.random.default_rng(0)

    def instance(seed):
        r = np.random.default_rng(seed)
        return [(jnp.asarray(r.uniform(-1, 1, (3, 128, 128))
                             .astype(np.float32)),
                 jnp.asarray(r.standard_normal(512).astype(np.float32)), 0)]

    t0 = time.perf_counter()
    h1 = trainer.fit(instance(0), stages=stages)
    first_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    h2 = trainer.fit(instance(1), stages=stages)
    steady_s = time.perf_counter() - t0

    result = {
        "schedule": "1000 prior + [{700,700,600}] + 3x[{200,500,400}]",
        "total_optimization_steps": n_steps,
        "first_instance_s": round(first_s, 1),
        "steady_state_instance_s": round(steady_s, 1),
        "steady_state_steps_per_sec": round(n_steps / steady_s, 2),
        "north_star_s": 300,
        "meets_north_star": steady_s <= 300,
        # records also carry full per-iteration curves under losses_* since
        # the observability rework; report just the final scalars here
        "final_losses": {k: round(float(v), 4)
                         for k, v in h2[-1].items()
                         if k.startswith("loss_")},
        "device": str(jax.devices()[0]),
        "compile_chunk": trainer.compile_chunk,
        "persistent_cache_entries_at_start": entries0,
    }
    out = "FULL_RUN.json"
    for a in sys.argv[1:]:
        if a.startswith("--out="):
            out = a.split("=", 1)[1]
    with open(os.path.join(_ROOT, out), "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result, indent=1))


def _cache_entries():
    """How many persistent-compilation-cache artifacts existed when we
    started (0 => this run's first_instance_s is a true cold number)."""
    import jax
    path = jax.config.jax_compilation_cache_dir
    try:
        return len(os.listdir(path)) if path else 0
    except OSError:
        return 0


if __name__ == "__main__":
    main()
