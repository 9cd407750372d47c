"""Capture a jax.profiler trace of one step's scan and print the top TPU ops.

    python tools/trace_step.py --step 3 [--iters 5] [--out /tmp/jaxtrace3]
"""

import argparse
import collections
import glob
import gzip
import json
import os
import sys

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)


def summarize(tracedir, n_iters, top=30):
    files = glob.glob(f"{tracedir}/**/*.trace.json.gz", recursive=True)
    files.sort(key=os.path.getmtime)
    with gzip.open(files[-1]) as f:
        data = json.load(f)
    events = data["traceEvents"]
    pids = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pids[e["pid"]] = e["args"].get("name", "")
    durs = collections.Counter()
    srcs = {}
    for e in events:
        if (e.get("ph") == "X" and "dur" in e
                and pids.get(e.get("pid")) == "/device:TPU:0"):
            name = e["name"]
            durs[name] += e["dur"]
            a = e.get("args", {})
            if "source" in a and name not in srcs:
                srcs[name] = (a.get("source", ""),
                              a.get("hlo_category", ""),
                              a.get("long_name", "")[:140])
    print(f"--- top TPU ops (us total over {n_iters} iters) ---")
    shown = 0
    for name, d in durs.most_common(200):
        if name in ("2",) or name.startswith("jit_") or name.startswith(
                "while"):
            continue
        src, cat, long = srcs.get(name, ("", "", ""))
        print(f"{d / n_iters / 1e3:8.2f} ms/it  {name[:28]:28s} {cat:18s} "
              f"{src}")
        if long and shown < 12:
            print(f"            {long}")
        shown += 1
        if shown >= top:
            break


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--step", type=int, default=3)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--n-proj", type=int, default=16)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    out = args.out or f"/tmp/jaxtrace_step{args.step}"

    import jax
    import jax.numpy as jnp
    from gan2shape_tpu.core.trainer import Trainer

    s = 128
    config = {
        "image_size": s, "gan_size": s, "z_dim": 512,
        "channel_multiplier": 1, "category": "face",
        "n_proj_samples": args.n_proj, "n_epochs_prior": 10,
        "learning_rate": 1e-4, "prior_name": "box",
        "rot_center_depth": 1.0, "fov": 10,
    }
    t = Trainer(config)
    rng = np.random.default_rng(0)
    image = jnp.asarray(rng.uniform(-1, 1, (1, 3, s, s)).astype(np.float32))
    latent = jnp.asarray(rng.standard_normal((1, 512)).astype(np.float32))
    p, t.opt_states[1], coll, _ = t._run_step1(
        t.params, t.opt_states[1], t.frozen, image, n_iters=2)
    t.params = p
    n = args.iters

    if args.step == 1:
        def run(k):
            out4 = t._run_step1(t.params, t.opt_states[1], t.frozen,
                                image, n_iters=n)
            t.params, t.opt_states[1] = out4[0], out4[1]
            return out4[-1]
    elif args.step == 2:
        def run(k):
            out4 = t._run_step2(t.params, t.opt_states[2], t.frozen, image,
                                latent, coll, k, n_iters=n,
                                n_proj=args.n_proj)
            t.params, t.opt_states[2] = out4[0], out4[1]
            run.coll2 = out4[2]
            return out4[-1]
    else:
        p2, _, coll2, _ = t._run_step2(
            t.params, t.opt_states[2], t.frozen, image, latent, coll,
            jax.random.PRNGKey(5), n_iters=1, n_proj=args.n_proj)
        t.params = p2

        def run(k):
            out3 = t._run_step3(t.params, t.opt_states[3], t.frozen, image,
                                latent, coll2, n_iters=n)
            t.params, t.opt_states[3] = out3[0], out3[1]
            return out3[-1]

    jax.block_until_ready(run(jax.random.PRNGKey(0)))  # compile
    with jax.profiler.trace(out):
        jax.block_until_ready(run(jax.random.PRNGKey(1)))
    summarize(out, n)


if __name__ == "__main__":
    main()
