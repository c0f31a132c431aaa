#!/usr/bin/env python3
"""Stage-level device timings INSIDE the 3D frame update.

frame_compute_3d (113 ms, BASELINE.md) = preprocess + ObsGP2D fit +
newmeas (which runs obsgp2d_test over ~76.8k gate points and ~460k probe
points). This tool times each stage as its own jitted program on a REAL
mid-sequence map state so the optimization lands where the time is —
the 3D twin of tools/fit_breakdown.py.

Usage: python tools/profile3d_stages.py [--frame N] [--reps K] [--cpu]
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
    ap.add_argument("--frame", type=int, default=20)
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    import functools

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/gpismap_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from gpismap_tpu import datasets
    from gpismap_tpu.api3d import GPisMap3D
    from gpismap_tpu.models import mapper3d, obsgp

    m = GPisMap3D()
    frames = list(datasets.bigbird_frames())
    fi = min(args.frame, len(frames) - 1)
    for fr in frames[:fi]:
        m.set_camera(fr.cam_id, "bigbird")
        m.update(fr.depth, fr.pose)
        print(f"# replay {m.frame - 1}: nodes={m.num_nodes}",
              file=sys.stderr, flush=True)

    fr = frames[fi]
    m.set_camera(fr.cam_id, "bigbird")
    pose = np.asarray(fr.pose, np.float32).reshape(-1)
    depth = jax.device_put(np.asarray(fr.depth, np.float32))
    tr = jax.device_put(pose[:3])
    rot = jax.device_put(pose[3:12].reshape(3, 3, order="F"))
    res = {"backend": jax.default_backend(), "frame": fi,
           "n_nodes": int(m.num_nodes)}

    # ---- stage 1: preprocess ----
    pre_jit = functools.partial(mapper3d.preprocess_3d, cam=m.cam, mp=m.p)
    t, prep = _timed(pre_jit, args.reps, depth, tr, rot)
    res["preprocess_ms"] = round(t * 1e3, 2)

    # ---- stage 2: ObsGP2D fit ----
    @jax.jit
    def fit(v, u, zinv):
        return obsgp.fit_obsgp2d(v, u, zinv, m.op)

    t, obs = _timed(fit, args.reps, prep.v, prep.u, prep.zinv)
    res["fit_obsgp2d_ms"] = round(t * 1e3, 2)
    res["obs_cells"] = int(obs.trained.shape[0])
    res["obs_m"] = int(obs.x.shape[1])

    # ---- stage 3: the two posterior sweeps inside newmeas ----
    mm, nn = prep.valid.shape
    vu0 = jnp.stack([jnp.broadcast_to(prep.v[:, None], (mm, nn)),
                     jnp.broadcast_to(prep.u[None, :], (mm, nn))],
                    -1).reshape(-1, 2)

    @jax.jit
    def gate_test(o, q):
        return obsgp.obsgp2d_test(o, q, m.op, 4096)

    t, _ = _timed(gate_test, args.reps, obs, vu0)
    res["obs_test_gate_ms"] = round(t * 1e3, 2)
    res["gate_points"] = int(vu0.shape[0])

    pert = jnp.asarray([[1., 0., 0.], [-1., 0., 0.], [0., 1., 0.],
                        [0., -1., 0.], [0., 0., 1.], [0., 0., -1.]],
                       jnp.float32) * m.p.delx
    ppos = prep.xyz_local[:, :, None, :] + pert[None, None]
    pz = jnp.where(jnp.abs(ppos[..., 2]) > 1e-12, ppos[..., 2], 1e-12)
    pvu = jnp.stack([ppos[..., 1] / pz, ppos[..., 0] / pz],
                    -1).reshape(-1, 2)
    t, _ = _timed(gate_test, args.reps, obs, pvu)
    res["obs_test_probes_ms"] = round(t * 1e3, 2)
    res["probe_points"] = int(pvu.shape[0])

    # ---- whole fused stages ----
    fc = functools.partial(mapper3d.frame_compute_3d, cam=m.cam, mp=m.p,
                           op=m.op)
    t, (_, obs2, nm) = _timed(fc, args.reps, depth, tr, rot)
    res["frame_compute_3d_ms"] = round(t * 1e3, 2)

    # ---- fused reeval at the real frame state ----
    cells, _ = m.index.query_cluster_cells(pose[:3], 4.0, cap=65536)
    if len(cells):
        lists = [m.index.cell_nodes(c) for c in cells]
        node_ids = np.concatenate(lists)
        n = len(node_ids)
        k = 1 << int(np.ceil(np.log2(max(n, 1))))
        kc = min(max(1 << int(np.ceil(np.log2(
            2 * max(len(li) for li in lists)))), 512), k)
        sel = np.full(k, -1, np.int32)
        sel[:n] = node_ids
        d = m.index.get_nodes(sel)
        valid = np.zeros(k, bool)
        valid[:n] = True
        centers, _, _ = m.index.cell_info(cells)
        coords = np.floor(centers / m.cell_size).astype(np.int32)
        cpad = max(8, 1 << int(np.ceil(np.log2(len(cells)))))
        cc = np.zeros((cpad, 3), np.int32)
        cc[:len(cells)] = coords
        cok = np.zeros(cpad, bool)
        cok[:len(cells)] = True

        rargs = (obs2, jax.device_put(d["pos"]), jax.device_put(d["grad"]),
                 jax.device_put(d["pos_sig"]),
                 jax.device_put(d["grad_sig"]), jax.device_put(valid),
                 jax.device_put(cc), jax.device_put(cok), tr, rot,
                 jnp.float32(m.cell_size))
        rs = functools.partial(
            mapper3d.reeval_scan_3d, mp=m.p, op=m.op,
            compat=m.compat_reloc, kc=kc)
        t, _ = _timed(rs, args.reps, *rargs)
        res["reeval_scan_ms"] = round(t * 1e3, 2)
        rh = functools.partial(
            mapper3d.reeval_hybrid_3d, mp=m.p, op=m.op,
            compat=m.compat_reloc)
        t, (_, hdrop) = _timed(rh, args.reps, *rargs)
        res["reeval_hybrid_ms"] = round(t * 1e3, 2)
        res["reeval_hybrid_drop"] = int(hdrop)
        res["reeval_cells"] = int(len(cells))
        res["reeval_nodes"] = int(n)
        res["reeval_kc"] = int(kc)

    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
