#!/usr/bin/env python3
"""Sweep the ObsGP2D posterior chunk size for the 3D frame stages.

frame_compute_3d is the largest 3D device cost (113 ms, BASELINE.md device
table); most of it is obsgp2d_test over ~537k probe points in sequential
chunks of `chunk` (models/obsgp.py:gpou_posterior_gather via lax.map).
Bigger chunks mean fewer sequential steps but a larger gather footprint
([chunk, 64, 64] per step). This sweep measures the real frame stage at a
mid-sequence map state to pick the production default.

Usage: python tools/chunk_sweep.py [--frame N] [--reps K] [--cpu]
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frame", type=int, default=20)
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--chunks", type=int, nargs="*",
                    default=[4096, 8192, 16384, 32768])
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/gpismap_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from gpismap_tpu import datasets
    from gpismap_tpu.api3d import GPisMap3D
    from gpismap_tpu.models import mapper3d

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

    rows = {}
    for ch in args.chunks:
        out = mapper3d.frame_compute_3d(depth, tr, rot, m.cam, m.p, m.op,
                                        chunk=ch)
        jax.block_until_ready(out)
        t0 = time.time()
        for _ in range(args.reps):
            out = mapper3d.frame_compute_3d(depth, tr, rot, m.cam, m.p,
                                            m.op, chunk=ch)
        jax.block_until_ready(out)
        rows[ch] = round((time.time() - t0) / args.reps * 1e3, 2)
        print(f"# chunk {ch}: {rows[ch]} ms", file=sys.stderr, flush=True)

    print(json.dumps({"backend": jax.default_backend(), "frame": fi,
                      "frame_compute_3d_ms_by_chunk": rows}))


if __name__ == "__main__":
    main()
