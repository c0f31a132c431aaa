#!/usr/bin/env python3
"""Phase-level device timings INSIDE the 2D map_test program.

map_test = candidate search -> 3-argmin -> pair compaction (unique /
searchsorted) -> tile planning (argsort/bincount) -> tile evaluation ->
blend. The tile evaluation is the only FLOP-heavy phase; everything else
is gathers, reductions and SORTS — and TPU sorts are slow. This tool
times each phase as its own jitted program on the REAL post-sequence
map state (28-frame gazebo build) so optimization effort lands where the
device time actually is.

Usage: python tools/phase_profile.py [--reps K] [--cpu]
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
    """Force the device queue to drain: on the tunneled backend
    block_until_ready can resolve before remote execution completes
    (verified 2026-08-21); fetching a tiny on-device reduction of the
    result serializes behind everything enqueued."""
    import jax
    import jax.numpy as jnp
    leaves = [x for x in jax.tree.leaves(out)
              if hasattr(x, "dtype") and hasattr(x, "ravel")]
    if leaves:
        jax.device_get(jnp.sum(leaves[0].ravel()[:1]))


def _timed(fn, reps, *a):
    import jax
    out = fn(*a)
    jax.block_until_ready(out)
    _drain(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*a)
    _drain(out)
    return (time.time() - t0) / reps, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/gpismap_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from gpismap_tpu import datasets
    from gpismap_tpu.api import GPisMap2D
    from gpismap_tpu.models import cluster
    from gpismap_tpu.ops import segmented

    m = GPisMap2D()
    for fr in datasets.gazebo_frames():
        m.update(fr.thetas, fr.ranges, fr.pose)
    xtest, _ = datasets.gazebo_test_grid()
    m.test(xtest)                      # warm + fill factor cache
    res = {"n_nodes": int(m.num_nodes), "backend": jax.default_backend()}

    # the real padded query batch, device-resident
    nq = 1 << int(np.ceil(np.log2(len(xtest))))
    q = np.zeros((nq, 2), np.float32)
    q[:len(xtest)] = xtest
    q = jax.device_put(jnp.asarray(q))
    store, grid = m.store, m.grid
    linv_buf, uniq = m._get_factors()
    p = m.p
    cell = np.float32(m.cell_size)
    sh = np.float32(m._search_half)
    noff = m._noff
    max_active = linv_buf.shape[0]
    tile = m.cap.test_tile

    @jax.jit
    def phase_candidates(q_):
        slots, sqd, ok = cluster._grid_candidates(
            grid, q_, cell, m.grid_half, noff, sh, store.trained)
        sqd_m = jnp.where(ok, sqd, jnp.inf)
        cols = jnp.arange(sqd_m.shape[-1], dtype=jnp.int32)
        cur, tops = sqd_m, []
        for _ in range(3):
            i = jnp.argmin(cur, axis=-1).astype(jnp.int32)
            tops.append(i)
            cur = jnp.where(cols[None, :] == i[:, None], jnp.inf, cur)
        top_idx = jnp.stack(tops, axis=-1)
        top_slot = jnp.take_along_axis(slots, top_idx, axis=-1)
        top_ok = jnp.take_along_axis(ok, top_idx, axis=-1)
        n_cand = jnp.sum(ok, axis=-1)
        top_ok = top_ok & (jnp.arange(3)[None, :] < n_cand[:, None])
        return jnp.where(top_ok, top_slot, -1).reshape(-1)

    t, pair_seg = _timed(phase_candidates, args.reps, q)
    res["candidates_argmin_ms"] = round(t * 1e3, 2)

    big = jnp.iinfo(jnp.int32).max

    @jax.jit
    def phase_compact(pair_seg_):
        comp = jnp.searchsorted(uniq, pair_seg_)
        comp = jnp.clip(comp, 0, max_active - 1)
        hit = (pair_seg_ >= 0) & (uniq[comp] == pair_seg_)
        return jnp.where(hit, comp, -1).astype(jnp.int32)

    t, pair_comp = _timed(phase_compact, args.reps, pair_seg)
    res["compact_searchsorted_ms"] = round(t * 1e3, 2)

    @jax.jit
    def phase_plan(pair_comp_):
        return segmented.plan_tiles(pair_comp_, max_active, tile)

    t, plan = _timed(phase_plan, args.reps, pair_comp)
    res["plan_tiles_ms"] = round(t * 1e3, 2)
    res["n_tiles_used"] = int(plan.n_tiles)
    res["n_tiles_static"] = int(plan.tile_seg.shape[0])

    slot_of = jnp.where(uniq < big, uniq, -1).astype(jnp.int32)

    @jax.jit
    def phase_eval(plan_, q_, store_, linv_, slot_of_):
        # device arrays ride as ARGUMENTS (closures bake them into the
        # HLO as constants -> remote-compile 413 over the tunnel)
        def eval_tile(segs, pids):
            qt = q_[jnp.clip(pids, 0) // 3]
            # identical constants to api.test() (api.py:474-475) so the
            # profiled program is the production tile-eval, not a drift
            return cluster._ongpis_eval_tile(
                store_, linv_, slot_of_, segs, qt, p.map_scale_param,
                1.01, p.three_over_scale + 0.1)
        out0 = (jnp.zeros((3 * q_.shape[0],), q_.dtype),
                jnp.zeros((3 * q_.shape[0], 2), q_.dtype),
                jnp.full((3 * q_.shape[0],), jnp.inf, q_.dtype),
                jnp.zeros((3 * q_.shape[0], 2), q_.dtype))
        return segmented.segmented_eval(plan_, eval_tile, out0)

    t, _ = _timed(phase_eval, args.reps, plan, q, store, linv_buf,
                  slot_of)
    res["tile_eval_xla_scan_ms"] = round(t * 1e3, 2)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
