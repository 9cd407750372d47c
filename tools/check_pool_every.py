"""Fidelity study for `pseudo_pool_every` (PERF ledger #2, VERDICT r2 item 1a).

The reference regenerates the step-2 pseudo-sample pool EVERY iteration
(reference model.py:186-191).  Regenerating every K iterations was measured
23% faster for step 2 (61.1 -> 47.3 ms/iter at K=4) but shipped default-off
"pending a fidelity study".  This is that study: for K in {1, 2, 4} it runs
the FULL reference instance schedule (1000 prior + {700,700,600} +
3x{200,500,400}) from the same init with the same PRNG streams, then
compares the produced DEPTH MAPS (the method's deliverable, BASELINE.md
depth-MAD metric) and loss-trajectory tails of K>1 against K=1.

Pass criteria per K: foreground depth-MAD vs K=1 below the torch-oracle
parity envelope recorded in PARITY.md (the two implementations' own
divergence bound — if K=4 sits inside it, its effect is smaller than the
framework-vs-reference chaos), finite + decreasing losses, step-2/step-3
tail deviation within the PRECISION_CHECK bounds.

    python tools/check_pool_every.py            # full schedule (TPU, ~15 min)
    python tools/check_pool_every.py --fast     # smoke sizes (any backend)

Writes POOL_EVERY_CHECK.json.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
for _p in (_ROOT, os.path.join(_ROOT, "tools")):
    if _p not in sys.path:
        sys.path.insert(0, _p)

from compare_depth import depth_mad  # noqa: E402

# same envelopes as check_precision.py, same justification: step 2's loss is
# stochastic by construction; the deliverable metric is the depth map
MAX_TAIL_DEV = {"step1": 0.05, "step2": 0.15, "step3": 0.05}
DEPTH_MAD_BOUND = 2.5e-2  # torch-oracle composed-parity envelope (PARITY.md)


def run_one(K, fast):
    import jax
    import jax.numpy as jnp
    from gan2shape_tpu.core.trainer import Trainer

    s = 128
    config = {
        "image_size": s, "gan_size": s, "z_dim": 512,
        "channel_multiplier": 1, "category": "face",
        "n_proj_samples": 16, "n_epochs_prior": 50 if fast else 1000,
        "learning_rate": 1e-4, "prior_name": "box",
        "rot_center_depth": 1.0, "fov": 10,
        "pseudo_pool_every": K,
    }
    stages = ([{"step1": 20, "step2": 30, "step3": 30}] if fast
              else [{"step1": 700, "step2": 700, "step3": 600}]
              + [{"step1": 200, "step2": 500, "step3": 400}] * 3)

    trainer = Trainer(config, seed=0)
    rng = np.random.default_rng(0)
    data = [(rng.uniform(-1, 1, (3, s, s)).astype(np.float32),
             rng.standard_normal(512).astype(np.float32), 0)]

    t0 = time.perf_counter()
    history = trainer.fit(data, stages=stages)
    wall = time.perf_counter() - t0

    image = jnp.asarray(data[0][0])[None]
    recon_im, recon_depth = trainer.evaluate(image)
    losses = {k: np.concatenate([np.asarray(rec[f"losses_{k}"])
                                 for rec in history])
              for k in ("step1", "step2", "step3")}
    return {"wall_s": wall, "depth": np.asarray(recon_depth)[0],
            "losses": losses}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fast", action="store_true")
    ap.add_argument("--ks", type=int, nargs="+", default=[1, 2, 4])
    args = ap.parse_args()

    runs = {}
    for K in args.ks:
        print(f"running K={K} ...", file=sys.stderr)
        runs[K] = run_one(K, args.fast)
        print(f"K={K}: {runs[K]['wall_s']:.1f}s", file=sys.stderr)

    base = runs[args.ks[0]]
    results = {"ok": True, "fast": args.fast, "baseline_K": args.ks[0],
               "wall_s": {str(k): round(r["wall_s"], 1)
                          for k, r in runs.items()},
               "depth_mad_bound": DEPTH_MAD_BOUND,
               "ks": {}}
    for K in args.ks[1:]:
        r = runs[K]
        mad = depth_mad(r["depth"], base["depth"])
        entry = {"depth_mad_vs_base": mad["mad"],
                 "depth_p95_vs_base": mad["p95_ad"]}
        ok = mad["mad"] < DEPTH_MAD_BOUND
        for step in ("step1", "step2", "step3"):
            lo = np.asarray(r["losses"][step])
            hi = np.asarray(base["losses"][step])
            tail_lo = float(np.mean(lo[-20:]))
            tail_hi = float(np.mean(hi[-20:]))
            rel = abs(tail_lo - tail_hi) / max(abs(tail_hi), 1e-6)
            step_ok = (np.isfinite(lo).all() and lo[-1] < lo[0]
                       and rel <= MAX_TAIL_DEV[step])
            entry[step] = {"tail_base": tail_hi, "tail_K": tail_lo,
                           "tail_rel_dev": round(rel, 4),
                           "bound": MAX_TAIL_DEV[step],
                           "pass": bool(step_ok)}
            ok = ok and step_ok
        entry["pass"] = bool(ok)
        results["ks"][str(K)] = entry
        results["ok"] = results["ok"] and ok

    passing = [int(k) for k, v in results["ks"].items() if v["pass"]]
    results["recommended_default"] = max(passing) if passing else args.ks[0]

    with open(os.path.join(_ROOT, "POOL_EVERY_CHECK.json"), "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results, indent=1))
    sys.exit(0 if results["ok"] else 1)


if __name__ == "__main__":
    main()
