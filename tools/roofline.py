#!/usr/bin/env python3
"""Roofline / MFU analysis for the framework's hot device ops.

Measures, at the REAL production shapes (config.CAPACITY_2D/3D):
  * tile evaluation — the headline-metric hot loop (cross-cov build +
    [MP,MP]x[MP,T(1+D)] variance matmul; models/cluster._ongpis_eval_tile
    and the Pallas twin ops/pallas_tile.tile_eval_pallas)
  * per-cell factorization — Cholesky + triangular inverse
    (models/cluster._factorize_cells; the test-path factor cache fill)
  * cluster-GP fit — the retrain hot loop (ops/gp.fit_ongpis; the batched
    equivalent of the reference's per-cell Eigen llt, GPisMap.cpp:574-594)

For each op: analytic FLOPs (the model is printed), measured time,
achieved TFLOP/s, and fraction of the MXU peak. Peak defaults to the
bf16-pass f32 matmul peak of the detected chip (TPU v5e: 197 TFLOP/s;
f32 inputs at default precision execute as bf16 passes on the MXU).

Usage: python tools/roofline.py [--dim 2|3|0] [--reps K] [--cpu]
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

PEAKS_TFLOPS = {           # matmul peak for f32-in (bf16 MXU passes)
    "TPU v5 lite": 197.0,
    "TPU v5e": 197.0,
    "TPU v4": 275.0,
    "TPU v6 lite": 918.0,
    "cpu": 0.5,            # nominal, so % peak stays meaningful-ish
}
HBM_GBPS = {"TPU v5 lite": 819.0, "TPU v5e": 819.0, "TPU v4": 1228.0,
            "TPU v6 lite": 1640.0, "cpu": 50.0}


def _bench(fn, reps, *args):
    """Time a jitted fn. Device arrays ride as ARGUMENTS — closing over
    them bakes them into the HLO as constants, which blows the remote
    compiler's request-size limit over the TPU tunnel (HTTP 413)."""
    import jax
    import jax.numpy as jnp

    def drain(o):
        leaves = [x for x in jax.tree.leaves(o)
                  if hasattr(x, "dtype") and hasattr(x, "ravel")]
        if leaves:
            jax.device_get(jnp.sum(leaves[0].ravel()[:1]))

    out = fn(*args)
    jax.block_until_ready(out)
    drain(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    drain(out)
    return (time.time() - t0) / reps


def _make_cells(rng, s, m, d, scale):
    """S trained cells with full support (worst-case production shape)."""
    import jax.numpy as jnp
    from gpismap_tpu.ops import gp

    x = rng.uniform(-1, 1, (s, m, d)).astype(np.float32)
    g = rng.normal(size=(s, m, d)).astype(np.float32)
    g /= np.linalg.norm(g, axis=-1, keepdims=True)
    val = np.full((s, m), -0.2, np.float32)
    sig = np.full((s, m), 0.05, np.float32)
    valid = np.ones((s, m), bool)
    st = gp.fit_ongpis(jnp.asarray(x), jnp.asarray(g), jnp.asarray(val),
                       jnp.asarray(sig), jnp.asarray(sig),
                       jnp.asarray(valid), scale)
    linv = gp.linv_from_chol(st.l)
    return x, g, val, sig, valid, st, linv


def run_dim(d, reps, peak_tf, hbm_gbps):
    import jax
    import jax.numpy as jnp

    from gpismap_tpu.config import CAPACITY_2D, CAPACITY_3D
    from gpismap_tpu.models import cluster
    from gpismap_tpu.ops import gp, kernels

    cap = CAPACITY_2D if d == 2 else CAPACITY_3D
    m, t = cap.gp_support, cap.test_tile
    mp = m * (1 + d)
    scale = 0.2 if d == 2 else 0.04
    rng = np.random.default_rng(0)
    results = {}

    # ---- tile evaluation (headline hot loop) ----
    s = 64                       # distinct cells
    nt = 512 if d == 2 else 128  # tiles
    x, g, val, sig, valid, st, linv = _make_cells(rng, s, m, d, scale)
    store = cluster.ClusterStore(
        x=jnp.asarray(x), grad=jnp.asarray(g), val=jnp.asarray(val),
        sigx=jnp.asarray(sig), siggrad=jnp.asarray(sig),
        valid=jnp.asarray(valid), alpha=st.alpha,
        trained=jnp.ones(s, bool))
    segs = jnp.arange(nt, dtype=jnp.int32) % s
    slot_of = jnp.arange(s, dtype=jnp.int32)
    q = jnp.asarray(rng.uniform(-1, 1, (nt, t, d)), jnp.float32)
    vc, gc = 1.01, 3.0 / scale**2 + 0.1

    eval_jit = jax.jit(lambda store_, linv_, segs_, q_:
                       cluster._ongpis_eval_tile(
                           store_, linv_, slot_of, segs_, q_, scale, vc,
                           gc))
    t_xla = _bench(eval_jit, reps, store, linv, segs, q)
    # FLOPs/tile: variance matmul 2*MP^2*T(1+D) + mean 2*MP*T(1+D)
    flops_tile = 2.0 * mp * mp * t * (1 + d) + 2.0 * mp * t * (1 + d)
    bytes_tile = mp * mp * 4.0       # the per-tile factor gather dominates
    results[f"tile_eval_xla_{d}d"] = {
        "tiles": nt, "MP": mp, "T": t,
        "ms": round(t_xla * 1e3, 3),
        "tflops": round(nt * flops_tile / t_xla / 1e12, 2),
        "pct_peak": round(100 * nt * flops_tile / t_xla / 1e12 / peak_tf, 1),
        "gbps_factor_gather": round(nt * bytes_tile / t_xla / 1e9, 1),
        "pct_hbm": round(100 * nt * bytes_tile / t_xla / 1e9 / hbm_gbps, 1),
        "queries_per_s_equiv": round(nt * t / 3 / t_xla, 1),
    }

    if jax.default_backend() == "tpu":
        from gpismap_tpu.ops.pallas_tile import tile_eval_pallas
        gradflag, _ = gp.ongpis_prepare(store.grad, store.sigx,
                                        store.siggrad, store.valid)
        xt = jnp.swapaxes(store.x, -1, -2)
        qt = jnp.swapaxes(q, -1, -2)
        pl_jit = jax.jit(lambda segs_, linv_, xt_, al_, gf_, vl_, qt_:
                         tile_eval_pallas(
                             segs_, linv_, xt_, al_, gf_, vl_, qt_, d=d,
                             scale=scale, val_const=vc, grad_const=gc))
        t_pl = _bench(pl_jit, reps, segs, linv, xt, store.alpha,
                      gradflag.astype(jnp.float32),
                      store.valid.astype(jnp.float32), qt)
        results[f"tile_eval_pallas_{d}d"] = {
            "tiles": nt, "MP": mp, "T": t,
            "ms": round(t_pl * 1e3, 3),
            "tflops": round(nt * flops_tile / t_pl / 1e12, 2),
            "pct_peak": round(100 * nt * flops_tile / t_pl / 1e12
                              / peak_tf, 1),
            "gbps_factor_gather": round(nt * bytes_tile / t_pl / 1e9, 1),
            "pct_hbm": round(100 * nt * bytes_tile / t_pl / 1e9
                             / hbm_gbps, 1),
            "queries_per_s_equiv": round(nt * t / 3 / t_pl, 1),
            "speedup_vs_xla": round(t_xla / t_pl, 2),
        }

        # bf16-multiplicand variance matmul (GPISMAP_PALLAS_BF16): the
        # MXU's native rate; f32 passes run at ~1/4 of it
        pl16_jit = jax.jit(lambda segs_, linv_, xt_, al_, gf_, vl_, qt_:
                           tile_eval_pallas(
                               segs_, linv_, xt_, al_, gf_, vl_, qt_, d=d,
                               scale=scale, val_const=vc, grad_const=gc,
                               bf16=True))
        t_pl16 = _bench(pl16_jit, reps, segs, linv, xt, store.alpha,
                        gradflag.astype(jnp.float32),
                        store.valid.astype(jnp.float32), qt)
        results[f"tile_eval_pallas_bf16_{d}d"] = {
            "tiles": nt, "MP": mp, "T": t,
            "ms": round(t_pl16 * 1e3, 3),
            "tflops": round(nt * flops_tile / t_pl16 / 1e12, 2),
            "pct_peak": round(100 * nt * flops_tile / t_pl16 / 1e12
                              / peak_tf, 1),
            "queries_per_s_equiv": round(nt * t / 3 / t_pl16, 1),
            "speedup_vs_f32_pallas": round(t_pl / t_pl16, 2),
        }

    # ---- factorization (test-path cache fill) ----
    sf = 256 if d == 2 else 128
    xf, gf, valf, sigf, validf, stf, _ = _make_cells(rng, sf, m, d, scale)
    storef = cluster.ClusterStore(
        x=jnp.asarray(xf), grad=jnp.asarray(gf), val=jnp.asarray(valf),
        sigx=jnp.asarray(sigf), siggrad=jnp.asarray(sigf),
        valid=jnp.asarray(validf), alpha=stf.alpha,
        trained=jnp.ones(sf, bool))
    slots = jnp.arange(sf, dtype=jnp.int32)
    fac_jit = jax.jit(lambda storef_, slots_:
                      cluster._factorize_cells(storef_, slots_, scale))
    t_fac = _bench(fac_jit, reps, storef, slots)
    # useful FLOPs/cell: K build ~ c*MP^2 (VPU), chol MP^3/3, tri-inv MP^3/3
    flops_cell = 2.0 * (mp ** 3) / 3.0
    results[f"factorize_{d}d"] = {
        "cells": sf, "MP": mp,
        "ms": round(t_fac * 1e3, 3),
        "us_per_cell": round(t_fac / sf * 1e6, 1),
        "tflops": round(sf * flops_cell / t_fac / 1e12, 2),
        "pct_peak": round(100 * sf * flops_cell / t_fac / 1e12 / peak_tf, 1),
    }

    # ---- retrain fit (update-path hot loop) ----
    b = cap.retrain_batch
    xr, gr, valr, sigr, validr, _, _ = _make_cells(rng, b, m, d, scale)
    fit_jit = jax.jit(lambda x_, g_, v_, s_, vd_: gp.fit_ongpis(
        x_, g_, v_, s_, s_, vd_, scale).alpha)
    t_fit = _bench(fit_jit, reps, jnp.asarray(xr), jnp.asarray(gr),
                   jnp.asarray(valr), jnp.asarray(sigr),
                   jnp.asarray(validr))
    flops_fit = (mp ** 3) / 3.0 + 2.0 * mp * mp
    results[f"retrain_fit_{d}d"] = {
        "cells": b, "MP": mp,
        "ms": round(t_fit * 1e3, 3),
        "us_per_cell": round(t_fit / b * 1e6, 1),
        "tflops": round(b * flops_fit / t_fit / 1e12, 2),
        "pct_peak": round(100 * b * flops_fit / t_fit / 1e12 / peak_tf, 1),
    }
    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dim", type=int, default=0, help="2, 3, or 0=both")
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--peak-tflops", type=float, default=None)
    args = ap.parse_args()
    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/gpismap_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    kind = (jax.devices()[0].device_kind
            if jax.default_backend() == "tpu" else "cpu")
    peak = args.peak_tflops or PEAKS_TFLOPS.get(kind, 197.0)
    hbm = HBM_GBPS.get(kind, 819.0)
    out = {"device": kind, "peak_tflops_assumed": peak,
           "hbm_gbps_assumed": hbm, "backend": jax.default_backend()}
    dims = [2, 3] if args.dim == 0 else [args.dim]
    for d in dims:
        out.update(run_dim(d, args.reps, peak, hbm))
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
