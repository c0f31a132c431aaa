#!/usr/bin/env python3
"""Fine-grained device timings of the TABLE-path map_test sub-phases.

phase_profile.py times the window-path phases; this tool times the
production (candidate-table) path at finer granularity — row gather,
the 3 argmin passes, pair compaction (searchsorted vs dense-LUT), tile
planning (argsort vs packed-key sort), and the tile evaluation at
full-3-rank vs rank-0-only pair sets — to locate where the remaining
map_test milliseconds sit and what a two-phase schedule would save.

The built 28-frame map state is snapshotted to --state (npz) on first
run so iterating on this tool skips the sequence rebuild.

Usage: python tools/prof_table.py [--reps K] [--cpu] [--state PATH]
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


def build_state(path):
    from gpismap_tpu import datasets
    from gpismap_tpu.api import GPisMap2D

    os.environ.setdefault("GPISMAP_NBR_TABLE", "1")
    m = GPisMap2D()
    for fr in datasets.gazebo_frames():
        m.update(fr.thetas, fr.ranges, fr.pose)
    xtest, _ = datasets.gazebo_test_grid()
    m.test(xtest)                      # warm + fill factor + nbr caches
    import jax
    linv_buf, uniq = m._get_factors()
    store = jax.device_get(m.store)
    nbrs = jax.device_get(m._nbrs)
    blob = {
        "grid": np.asarray(m.grid), "linv": np.asarray(linv_buf),
        "uniq": np.asarray(uniq), "xtest": xtest,
        "nbr_keys": np.asarray(nbrs.keys),
        "nbr_packed": np.asarray(nbrs.packed),
        "nbr_dense": np.asarray(m._nbr_dense),
        "kw_num": np.asarray([m.cell_size, m._search_half,
                              m.p.map_scale_param, 1.01,
                              m.p.three_over_scale + 0.1,
                              m.p.test_var_thre,
                              1.0 + m.p.map_noise_param], np.float32),
        "kw_int": np.asarray([m.grid_half, m._noff, m.cap.test_tile,
                              m.cap.max_cells, m.cap.test_active_cells],
                             np.int32),
    }
    for f in store._fields:
        blob[f"store_{f}"] = np.asarray(getattr(store, f))
    np.savez_compressed(path, **blob)
    return blob


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--state", default="/tmp/map2d_state.npz")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/gpismap_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from gpismap_tpu.models import cluster
    from gpismap_tpu.ops import segmented

    if os.path.exists(args.state):
        blob = dict(np.load(args.state))
        if "nbr_packed" not in blob:      # stale pre-packed-table cache
            blob = build_state(args.state)
    else:
        blob = build_state(args.state)

    store = cluster.ClusterStore(*[
        jnp.asarray(blob[f"store_{f}"]) for f in cluster.ClusterStore._fields])
    nbrs = cluster.NeighborTable(
        keys=jnp.asarray(blob["nbr_keys"]),
        packed=jnp.asarray(blob["nbr_packed"]),
        n_overflow=jnp.asarray(0, jnp.int32))
    nbr_dense = bool(blob["nbr_dense"])
    linv_buf = jnp.asarray(blob["linv"])
    uniq = jnp.asarray(blob["uniq"])
    cell, sh, scale, val_const, grad_const, var_thre, default_var = [
        np.float32(v) for v in blob["kw_num"]]
    grid_half, noff, tile, max_cells, max_active = [
        int(v) for v in blob["kw_int"]]
    xtest = blob["xtest"]
    grid = jnp.asarray(blob["grid"])

    nq = 1 << int(np.ceil(np.log2(len(xtest))))
    q = np.full((nq, 2), 1e6, np.float32)
    q[:len(xtest)] = xtest
    q = jax.device_put(jnp.asarray(q))
    res = {"backend": jax.default_backend(), "nq": nq}

    # --- 1. candidate row gather -------------------------------------
    @jax.jit
    def tbl_gather(q_, nbrs_):
        return cluster._table_candidates(nbrs_, q_, cell, grid_half,
                                         noff, sh, nbr_dense)

    t, cand = _timed(tbl_gather, args.reps, q, nbrs)
    res["tbl_gather_ms"] = round(t * 1e3, 2)

    # --- 2. top-3 argmin selection -----------------------------------
    @jax.jit
    def argmin3(slots, sqd, ok):
        n_cand = jnp.sum(ok, axis=-1)
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
        top_ok = top_ok & (jnp.arange(3)[None, :] < n_cand[:, None])
        return jnp.where(top_ok, top_slot, -1), n_cand

    t, (top_slot3, n_cand) = _timed(argmin3, args.reps, *cand)
    res["argmin3_ms"] = round(t * 1e3, 2)

    @jax.jit
    def argmin1(slots, sqd, ok):
        sqd_m = jnp.where(ok, sqd, jnp.inf)
        i = jnp.argmin(sqd_m, axis=-1).astype(jnp.int32)
        s = jnp.take_along_axis(slots, i[:, None], axis=-1)[:, 0]
        o = jnp.take_along_axis(ok, i[:, None], axis=-1)[:, 0]
        return jnp.where(o, s, -1)

    t, _ = _timed(argmin1, args.reps, *cand)
    res["argmin1_ms"] = round(t * 1e3, 2)

    pair_seg = jnp.reshape(top_slot3, (-1,))
    big = jnp.iinfo(jnp.int32).max

    # --- 3. compaction: searchsorted vs dense LUT --------------------
    @jax.jit
    def compact_ss(ps):
        comp = jnp.clip(jnp.searchsorted(uniq, ps), 0, max_active - 1)
        hit = (ps >= 0) & (uniq[comp] == ps)
        return jnp.where(hit, comp, -1).astype(jnp.int32)

    t, pc_ss = _timed(compact_ss, args.reps, pair_seg)
    res["compact_searchsorted_ms"] = round(t * 1e3, 2)

    @jax.jit
    def compact_lut(ps):
        lut = jnp.full((max_cells + 1,), -1, jnp.int32)
        sl = jnp.where(uniq < big, uniq, max_cells)
        lut = lut.at[sl].set(jnp.arange(max_active, dtype=jnp.int32),
                             mode='drop')
        return lut[jnp.clip(ps, 0, max_cells - 1)] | jnp.where(
            ps >= 0, 0, -1)

    t, pc_lut = _timed(compact_lut, args.reps, pair_seg)
    res["compact_lut_ms"] = round(t * 1e3, 2)
    assert np.array_equal(np.asarray(pc_ss), np.asarray(pc_lut))

    # --- 4. tile planning: argsort vs packed-key ---------------------
    @jax.jit
    def plan_cur(pc):
        return segmented.plan_tiles(pc, max_active, tile)

    t, plan3 = _timed(plan_cur, args.reps, pc_ss)
    res["plan_tiles3_ms"] = round(t * 1e3, 2)
    res["n_tiles3"] = int(plan3.n_tiles)

    p1 = pc_ss.reshape(-1, 3)[:, 0]

    t, plan1 = _timed(plan_cur, args.reps, p1)
    res["plan_tiles1_ms"] = round(t * 1e3, 2)
    res["n_tiles1"] = int(plan1.n_tiles)

    def plan_packed(pc):
        p = pc.shape[0]
        p2 = 1 << (p - 1).bit_length()
        valid = pc >= 0
        segc = jnp.where(valid, pc, max_active).astype(jnp.int32)
        key = segc * p2 + jnp.arange(p, dtype=jnp.int32)
        skey = jnp.sort(key)
        order = skey & (p2 - 1)
        sorted_seg = skey >> int(np.log2(p2))
        return order, sorted_seg

    t, _ = _timed(jax.jit(plan_packed), args.reps, pc_ss)
    res["sort_packed3_ms"] = round(t * 1e3, 2)

    @jax.jit
    def sort_argsort(pc):
        segc = jnp.where(pc >= 0, pc, max_active).astype(jnp.int32)
        order = jnp.argsort(segc, stable=True)
        return order, segc[order]

    t, _ = _timed(sort_argsort, args.reps, pc_ss)
    res["sort_argsort3_ms"] = round(t * 1e3, 2)

    # --- 5. tile evaluation ------------------------------------------
    slot_of = jnp.where(uniq < big, uniq, -1).astype(jnp.int32)

    def mk_eval(div):
        @jax.jit
        def phase_eval(plan_, q_, store_, linv_, slot_of_):
            def eval_tile(segs, pids):
                qt = q_[jnp.clip(pids, 0) // div]
                return cluster._ongpis_eval_tile(
                    store_, linv_, slot_of_, segs, qt, scale,
                    val_const, grad_const)
            n = plan_.pair_ids.shape[0] * plan_.pair_ids.shape[1]
            npair = q_.shape[0] * div
            out0 = (jnp.zeros((npair,), q_.dtype),
                    jnp.zeros((npair, 2), q_.dtype),
                    jnp.full((npair,), jnp.inf, q_.dtype),
                    jnp.zeros((npair, 2), q_.dtype))
            return segmented.segmented_eval(plan_, eval_tile, out0)
        return phase_eval

    t, _ = _timed(mk_eval(3), args.reps, plan3, q, store, linv_buf, slot_of)
    res["eval_xla3_ms"] = round(t * 1e3, 2)
    t, out1 = _timed(mk_eval(1), args.reps, plan1, q, store, linv_buf,
                     slot_of)
    res["eval_xla1_ms"] = round(t * 1e3, 2)

    if jax.default_backend() == "tpu":
        from gpismap_tpu.ops.gp import ongpis_prepare
        from gpismap_tpu.ops.pallas_tile import tile_eval_pallas

        def mk_pallas(div):
            @jax.jit
            def pal(plan_, q_, store_, linv_, slot_of_):
                slc = jnp.clip(slot_of_, 0, store_.x.shape[0] - 1)
                cvalid = store_.valid[slc] & (slot_of_ >= 0)[:, None]
                gf_c, _ = ongpis_prepare(store_.grad[slc], store_.sigx[slc],
                                         store_.siggrad[slc], cvalid)
                xt = jnp.swapaxes(store_.x[slc], -1, -2)
                qt = jnp.swapaxes(q_[jnp.clip(plan_.pair_ids, 0) // div],
                                  -1, -2)
                return tile_eval_pallas(
                    plan_.tile_seg, linv_, xt, store_.alpha[slc],
                    gf_c.astype(q_.dtype), cvalid.astype(q_.dtype), qt,
                    d=2, scale=scale, val_const=val_const,
                    grad_const=grad_const)
            return pal

        t, _ = _timed(mk_pallas(3), args.reps, plan3, q, store, linv_buf,
                      slot_of)
        res["eval_pallas3_ms"] = round(t * 1e3, 2)
        t, _ = _timed(mk_pallas(1), args.reps, plan1, q, store, linv_buf,
                      slot_of)
        res["eval_pallas1_ms"] = round(t * 1e3, 2)

    # --- 6. uncertain fraction (what phase 2 would evaluate) ---------
    f0, _, vf0, _ = jax.device_get(out1)
    vf0 = np.where(np.asarray(p1) >= 0, vf0, np.inf)
    ncand = np.asarray(n_cand)
    unc = (ncand >= 2) & (vf0 > float(var_thre))
    res["n_queries_with_cand"] = int((ncand > 0).sum())
    res["n_uncertain"] = int(unc.sum())
    res["uncertain_frac"] = round(float(unc.mean()), 4)

    # --- 7. full map_test for reference ------------------------------
    kw = dict(cell_size=cell, grid_half=grid_half, noff=noff,
              search_half=sh, scale=scale, val_const=val_const,
              grad_const=grad_const, var_thre=var_thre,
              default_var=default_var, tile=tile, max_cells=max_cells,
              max_active=max_active)
    use_pallas = jax.default_backend() == "tpu"

    def full(q_):
        return cluster.map_test(store, grid, q_, factors=(linv_buf, uniq),
                                nbrs=nbrs, nbr_dense=nbr_dense,
                                use_pallas=use_pallas, **kw)

    t, _ = _timed(full, args.reps, q)
    res["map_test_full_ms"] = round(t * 1e3, 2)

    # --- end-to-end variants (cost attribution by differencing) -------
    # var_thre is TRACED: +inf empties phase 2 without a recompile, so
    # full - novar = the marginal cost of the uncertain-query phase
    kw_nv = dict(kw, var_thre=np.float32(1e9))

    def full_novar(q_):
        return cluster.map_test(store, grid, q_, factors=(linv_buf, uniq),
                                nbrs=nbrs, nbr_dense=nbr_dense,
                                use_pallas=use_pallas, **kw_nv)

    t, _ = _timed(full_novar, args.reps, q)
    res["map_test_phase2_empty_ms"] = round(t * 1e3, 2)

    def full_single(q_):
        return cluster.map_test(store, grid, q_, factors=(linv_buf, uniq),
                                nbrs=nbrs, nbr_dense=nbr_dense,
                                use_pallas=use_pallas, two_phase=False,
                                **kw)

    t, _ = _timed(full_single, args.reps, q)
    res["map_test_singlephase_ms"] = round(t * 1e3, 2)

    kw256 = dict(kw, tile=256)

    def full_t256(q_):
        return cluster.map_test(store, grid, q_, factors=(linv_buf, uniq),
                                nbrs=nbrs, nbr_dense=nbr_dense,
                                use_pallas=use_pallas, **kw256)

    t, _ = _timed(full_t256, args.reps, q)
    res["map_test_tile256_ms"] = round(t * 1e3, 2)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
