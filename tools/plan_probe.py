#!/usr/bin/env python3
"""map_test planning-stage microbenchmark (round-4 headroom #4).

Times the query path's planning stages in isolation at the 2D bench
shape (65 536 queries, demo-scale map): candidate row gather, top-3
selection (current 3-pass argmin vs a single variadic-reduce pass),
LUT compaction + tile planning, and the full map_test, on the current
backend. Verifies the single-pass top-3 is bit-identical before timing.

Usage: python tools/plan_probe.py [--cpu] [--reps 20]
"""
import argparse
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def _timeit(fn, args, reps):
    import jax
    r = fn(*args)
    jax.block_until_ready(r)
    t0 = time.time()
    for _ in range(reps):
        r = fn(*args)
    jax.block_until_ready(r)
    return (time.time() - t0) / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--frames", type=int, default=10)
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
    frames = list(datasets.gazebo_frames())[:args.frames]
    m.update_batch([(fr.thetas, fr.ranges, fr.pose) for fr in frames])
    xtest, _ = datasets.gazebo_test_grid()
    m.test(xtest)            # warm caches (factors + table)
    kw = m._test_kwargs()
    qp = 1 << (len(xtest) - 1).bit_length()
    xq = np.full((qp, 2), 1e6, np.float32)
    xq[:len(xtest)] = xtest
    q = jax.device_put(jnp.asarray(xq))
    nbrs = m._nbrs
    factors = m._get_factors()
    out = {"backend": jax.default_backend(), "nq": int(qp),
           "n_nodes": int(m.num_nodes)}

    # ---- stage 1: candidates ----
    @jax.jit
    def cands(nbrs, q):
        return cluster._table_candidates(nbrs, q, kw["cell_size"],
                                         kw["grid_half"], kw["noff"],
                                         kw["search_half"], m._nbr_dense)

    out["candidates_ms"] = round(_timeit(cands, (nbrs, q), args.reps) * 1e3,
                                 3)
    slots, sqd, ok = cands(nbrs, q)

    # ---- stage 2a: 3-pass argmin (current) ----
    @jax.jit
    def top3_argmin(slots, sqd, ok):
        sqd_m = jnp.where(ok, sqd, jnp.inf)
        kw_ = sqd_m.shape[-1]
        cols = jnp.arange(kw_, dtype=jnp.int32)
        cur = sqd_m
        tops = []
        for _ in range(3):
            i = jnp.argmin(cur, axis=-1).astype(jnp.int32)
            tops.append(i)
            cur = jnp.where(cols[None, :] == i[:, None], jnp.inf, cur)
        top_idx = jnp.stack(tops, axis=-1)
        return (jnp.take_along_axis(slots, top_idx, axis=-1),
                jnp.take_along_axis(ok, top_idx, axis=-1), top_idx)

    out["top3_argmin_ms"] = round(
        _timeit(top3_argmin, (slots, sqd, ok), args.reps) * 1e3, 3)

    # ---- stage 3: compaction + tile plan ----
    top_slot, top_ok, _ = top3_argmin(slots, sqd, ok)

    @jax.jit
    def compact_and_plan(top_slot, top_ok, uniq):
        seg3 = jnp.where(top_ok, top_slot, -1)
        big = jnp.iinfo(jnp.int32).max
        lut = jnp.full((kw["max_cells"] + 1,), -1, jnp.int32)
        lut = lut.at[jnp.where(uniq < big, uniq, kw["max_cells"])].set(
            jnp.arange(kw["max_active"], dtype=jnp.int32), mode='drop')
        seg = seg3.reshape(-1)
        in_range = (seg >= 0) & (seg < kw["max_cells"])
        comp = jnp.where(in_range,
                         lut[jnp.clip(seg, 0, kw["max_cells"] - 1)], -1)
        return segmented.plan_tiles(comp, kw["max_active"], kw["tile"])

    out["compact_plan_ms"] = round(
        _timeit(compact_and_plan, (top_slot, top_ok, factors[1]),
                args.reps) * 1e3, 3)

    # ---- plan_tiles internals: the packed-key sort alone ----
    p_ = int(top_slot.size)
    key = jax.device_put(jnp.asarray(
        np.random.default_rng(0).integers(0, 1 << 27, p_, np.int32)))
    out["sort_only_ms"] = round(
        _timeit(jax.jit(jnp.sort), (key,), args.reps) * 1e3, 3)

    # ---- transposed-layout candidates + top3 (if present) ----
    if hasattr(cluster, "_candidates_top3"):
        @jax.jit
        def fused_t(nbrs, q):
            return cluster._candidates_top3(
                nbrs, q, kw["cell_size"], kw["grid_half"], kw["noff"],
                kw["search_half"], m._nbr_dense)

        ts, to, nc = fused_t(nbrs, q)
        a_slot, a_ok, _ = top3_argmin(slots, sqd, ok)
        # the two-stage reference applies the rank < n_cand mask in
        # map_test, after take_along_axis — apply it here too
        ok_ref = np.asarray(a_ok) & (np.arange(3)[None] <
                                     np.asarray(jnp.sum(ok, -1))[:, None])
        same = (np.array_equal(np.asarray(ts)[ok_ref],
                               np.asarray(a_slot)[ok_ref])
                and np.array_equal(np.asarray(to), ok_ref))
        out["fused_t_equal"] = bool(same)
        out["fused_t_ms"] = round(
            _timeit(fused_t, (nbrs, q), args.reps) * 1e3, 3)

    # ---- full map_test ----
    run = functools.partial(
        cluster.map_test, use_pallas=m._use_pallas(), nbrs=nbrs,
        nbr_dense=m._nbr_dense, **kw)

    out["map_test_ms"] = round(
        _timeit(lambda s, g, q, f: run(s, g, q, factors=f),
                (m.store, m.grid, q, factors), args.reps) * 1e3, 3)
    out["map_test_qps"] = round(len(xtest) / (out["map_test_ms"] / 1e3), 1)
    out["map_test_two_phase_ms"] = round(
        _timeit(lambda s, g, q, f: run(s, g, q, factors=f,
                                       two_phase=True),
                (m.store, m.grid, q, factors), args.reps) * 1e3, 3)

    # tile-size sensitivity: T=256 halves the Pallas grid steps (per-tile
    # fixed cost) at the price of more per-cell remainder padding
    kw256 = dict(kw, tile=256)
    run256 = functools.partial(
        cluster.map_test, use_pallas=m._use_pallas(), nbrs=nbrs,
        nbr_dense=m._nbr_dense, **kw256)
    r128 = jax.device_get(run(m.store, m.grid, q, factors=factors)[:4])
    r256 = jax.device_get(run256(m.store, m.grid, q, factors=factors)[:4])
    out["tile256_equal"] = bool(all(
        np.allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5)
        for a, b in zip(r128, r256)))
    out["map_test_tile256_ms"] = round(
        _timeit(lambda s, g, q, f: run256(s, g, q, factors=f),
                (m.store, m.grid, q, factors), args.reps) * 1e3, 3)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
