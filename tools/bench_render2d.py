#!/usr/bin/env python3
"""2D render benchmark: rays/s fwd and fwd+bwd on the full gazebo map.

The 2D twin of tools/bench_render.py (LiDAR-style rays from the last
demo pose; backward = gradients of summed hit depth w.r.t. store alphas
AND the kernel scale). Same ray count forward and backward.

Usage: python tools/bench_render2d.py [--rays N] [--reps K] [--cpu]
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



def _drain(out):
    """Scalar result pull — on the tunneled backend block_until_ready can
    resolve before remote execution completes; this serializes behind the
    whole queue."""
    import jax
    import jax.numpy as jnp
    leaves = [x for x in jax.tree.leaves(out)
              if hasattr(x, "dtype") and hasattr(x, "ravel")]
    if leaves:
        jax.device_get(jnp.sum(leaves[0].ravel()[:1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=16384)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--steps", type=int, default=48)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/gpismap_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from gpismap_tpu import datasets, render
    from gpismap_tpu.api import GPisMap2D

    m = GPisMap2D()
    m.update_batch([(fr.thetas, fr.ranges, fr.pose)
                    for fr in datasets.gazebo_frames()])
    cfg = render.config_from_mapper(m, n_steps=args.steps)
    factors = m._get_factors()
    pose = list(datasets.gazebo_frames())[-1].pose
    tr = np.asarray(pose[:2], np.float32)
    ang = np.linspace(-np.pi, np.pi, args.rays,
                      endpoint=False).astype(np.float32)
    d = np.stack([np.cos(ang), np.sin(ang)], -1)
    o = np.broadcast_to(tr, d.shape).astype(np.float32)
    o_d, d_d = jax.device_put((jnp.asarray(o), jnp.asarray(d)))

    out = render.sphere_trace(m.store, m.grid, o_d, d_d, cfg, factors)
    jax.block_until_ready(out)
    _drain(out)
    t0 = time.time()
    for _ in range(args.reps):
        out = render.sphere_trace(m.store, m.grid, o_d, d_d, cfg, factors)
    _drain(out)
    fwd_s = (time.time() - t0) / args.reps
    hit = float(np.asarray(out["hit"]).mean())

    def loss(alpha, scale, store, grid, factors_, o_, d_):
        st = store._replace(alpha=alpha)
        r = render.sphere_trace(st, grid, o_, d_, cfg, factors_,
                                render.hyper_from_scale(scale, 2))
        return jnp.sum(jnp.where(r["hit"], r["t"], 0.0))

    gfun = jax.jit(jax.grad(loss, argnums=(0, 1)))
    sc = jnp.float32(m.p.map_scale_param)
    bwd_s = dscale = bwd_err = None
    try:
        g = gfun(m.store.alpha, sc, m.store, m.grid, factors, o_d, d_d)
        jax.block_until_ready(g)
        _drain(g)
        t0 = time.time()
        for _ in range(args.reps):
            g = gfun(m.store.alpha, sc, m.store, m.grid, factors, o_d,
                     d_d)
        _drain(g)
        bwd_s = round((time.time() - t0) / args.reps, 4)
        dscale = float(g[1])
    except Exception as e:  # noqa: BLE001
        bwd_err = repr(e)[:300]
        print(f"# backward failed: {bwd_err}", file=sys.stderr, flush=True)

    out = {
        "metric": "render2d_rays_per_s_per_chip",
        "value": round(args.rays / fwd_s, 1),
        "unit": "rays/s",
        "vs_baseline": None,
        "extra": {
            "n_rays": args.rays, "n_steps": args.steps,
            "hit_fraction": round(hit, 4),
            "forward_s": round(fwd_s, 4),
            "forward_backward_s": bwd_s,
            "forward_backward_rays_per_s": (
                round(args.rays / bwd_s, 1) if bwd_s else None),
            "backward_error": bwd_err,
            "grad_wrt_scale": dscale,
            "n_nodes": int(m.num_nodes),
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
