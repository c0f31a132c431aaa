#!/usr/bin/env python3
"""Stage breakdown of the cluster-GP fit/factorize pipeline on-device.

Separates the retrain dispatch (VERDICT: the update-loop bottleneck) into
its constituents at production shapes: covariance build, batched Cholesky,
alpha solve, factor inverse — so the Pallas effort (SURVEY §7 stage 7)
targets the right stage.

Usage: python tools/fit_breakdown.py [--dim 2|3] [--b N] [--reps K] [--cpu]
"""
import argparse
import json
import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)


def _bench(fn, reps):
    import jax
    import jax.numpy as jnp

    def drain(o):
        # scalar result pull: on the tunneled backend block_until_ready
        # can resolve before remote execution completes
        leaves = [x for x in jax.tree.leaves(o)
                  if hasattr(x, "dtype") and hasattr(x, "ravel")]
        if leaves:
            jax.device_get(jnp.sum(leaves[0].ravel()[:1]))

    out = fn()
    jax.block_until_ready(out)
    drain(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn()
    drain(out)
    return (time.time() - t0) / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dim", type=int, default=2)
    ap.add_argument("--b", type=int, default=64)
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/gpismap_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from gpismap_tpu.config import CAPACITY_2D, CAPACITY_3D
    from gpismap_tpu.ops import gp, kernels

    d = args.dim
    cap = CAPACITY_2D if d == 2 else CAPACITY_3D
    m = cap.gp_support
    mp = m * (1 + d)
    b = args.b
    scale = 0.2 if d == 2 else 0.04
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, (b, m, d)), jnp.float32)
    g = rng.normal(size=(b, m, d)).astype(np.float32)
    g = jnp.asarray(g / np.linalg.norm(g, axis=-1, keepdims=True))
    val = jnp.full((b, m), -0.2, jnp.float32)
    sig = jnp.full((b, m), 0.05, jnp.float32)
    valid = jnp.ones((b, m), bool)
    gradflag, sigx = gp.ongpis_prepare(g, sig, sig, valid)

    build = jax.jit(lambda: kernels.matern32_deriv_train_cov(
        x, sigx, sig, gradflag, valid, scale))
    k = build()
    chol = jax.jit(jnp.linalg.cholesky)
    l = chol(k)
    y = jnp.concatenate([val] + [g[..., i] for i in range(d)], -1)[..., None]
    import jax.scipy.linalg as jsl
    solve = jax.jit(lambda l_, y_: jsl.cho_solve((l_, True), y_))
    tri = jax.jit(lambda l_: jsl.solve_triangular(
        l_, jnp.broadcast_to(jnp.eye(mp, dtype=l_.dtype), l_.shape),
        lower=True))
    fit_full = jax.jit(lambda: gp.fit_ongpis(x, g, val, sig, sig, valid,
                                             scale).alpha)

    out = {
        "dim": d, "B": b, "M": m, "MP": mp,
        "backend": jax.default_backend(),
        "build_cov_ms": round(_bench(build, args.reps) * 1e3, 3),
        "cholesky_ms": round(_bench(lambda: chol(k), args.reps) * 1e3, 3),
        "alpha_solve_ms": round(_bench(lambda: solve(l, y),
                                       args.reps) * 1e3, 3),
        "tri_inverse_ms": round(_bench(lambda: tri(l), args.reps) * 1e3, 3),
        "fit_full_ms": round(_bench(fit_full, args.reps) * 1e3, 3),
    }
    chol_tf = b * (mp ** 3) / 3.0 / (out["cholesky_ms"] / 1e3) / 1e12
    out["cholesky_tflops"] = round(chol_tf, 3)

    if jax.default_backend() == "tpu":
        from gpismap_tpu.ops.pallas_chol import chol_pallas, linv_pallas
        try:
            out["pallas_chol_ms"] = round(
                _bench(lambda: chol_pallas(k), args.reps) * 1e3, 3)
            out["pallas_chol_tflops"] = round(
                b * (mp ** 3) / 3.0 / (out["pallas_chol_ms"] / 1e3) / 1e12,
                3)
            out["pallas_linv_ms"] = round(
                _bench(lambda: linv_pallas(l), args.reps) * 1e3, 3)
            lp = np.asarray(chol_pallas(k))
            out["pallas_chol_max_err"] = float(
                np.nanmax(np.abs(lp - np.asarray(l))))
        except Exception as e:               # report, don't die
            out["pallas_error"] = repr(e)

        os.environ["GPISMAP_PALLAS_CHOL"] = "1"
        fit_pl = jax.jit(lambda: gp.fit_ongpis(x, g, val, sig, sig, valid,
                                               scale).alpha)
        try:
            out["fit_full_pallas_ms"] = round(
                _bench(fit_pl, args.reps) * 1e3, 3)
        except Exception as e:
            out["fit_pallas_error"] = repr(e)
        os.environ["GPISMAP_PALLAS_CHOL"] = "auto"
    print(json.dumps(out))


if __name__ == "__main__":
    main()
