#!/usr/bin/env python3
"""Sweep the blocked-factorization panel width (GPISMAP_CHOL_PW).

The base cases of ops/blocked_chol.py run n/PW sequential panel steps per
128-wide diagonal block; wider panels mean fewer loop steps but a larger
unrolled body. This times blocked_factor + blocked_linv at the two
production shapes (2D retrain [B,384,384], 3D retrain [B,1280,1280]) for
each PW by reloading the module with the env var set.

Usage: python tools/pw_sweep.py [--pws 4 8 16 32] [--reps K] [--cpu]
"""
import argparse
import importlib
import json
import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pws", type=int, nargs="*", default=[4, 8, 16, 32])
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/gpismap_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from gpismap_tpu.ops import blocked_chol as bc

    rng = np.random.default_rng(0)

    def spd(b, n):
        a = rng.normal(size=(b, n, n)).astype(np.float32) / np.sqrt(n)
        k = a @ np.swapaxes(a, -1, -2) + 0.1 * np.eye(n, dtype=np.float32)
        return jax.device_put(jnp.asarray(k))

    shapes = {"2d_retrain": (64, 384), "3d_retrain": (32, 1280),
              "obs_fit_base": (3072, 64)}
    ks = {name: spd(b, n) for name, (b, n) in shapes.items()}

    out = {"backend": jax.default_backend(), "reps": args.reps, "rows": {}}
    for pw in args.pws:
        os.environ["GPISMAP_CHOL_PW"] = str(pw)
        importlib.reload(bc)
        row = {}
        for name, k in ks.items():
            n = k.shape[-1]
            if n % bc.PW:
                continue
            if n >= 128:
                def fn(k_):
                    l, wd = bc.blocked_factor(k_)
                    return bc.blocked_linv(l, wd)
                fn = jax.jit(fn)
            else:
                def fn(k_):
                    l = bc._chol_base(k_)
                    return bc._inv_base(l)
                fn = jax.jit(fn)
            # timing via a scalar pull: on the tunneled backend
            # block_until_ready can resolve before remote execution
            # completes; fetching a reduction of the result forces the
            # full serial queue to drain (RTT ~0.5 ms, subtracted)
            sumj = jax.jit(lambda r_: jnp.sum(r_))
            s = sumj(fn(k))
            jax.device_get(s)
            t0 = time.time()
            for _ in range(3):
                jax.device_get(s)
            rtt = (time.time() - t0) / 3
            t0 = time.time()
            for _ in range(args.reps):
                r = fn(k)
            jax.device_get(sumj(r))
            row[name] = round(
                (time.time() - t0 - rtt) / args.reps * 1e3, 2)
            print(f"# PW={pw} {name}: {row[name]} ms", file=sys.stderr,
                  flush=True)
        out["rows"][pw] = row
    print(json.dumps(out))


if __name__ == "__main__":
    main()
