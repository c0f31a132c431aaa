#!/usr/bin/env python3
"""Parity diagnostic: run the TPU-native mapper over the bundled sequences
and compare SDF/grad/var fields against the captured reference goldens.

Usage: python tools/parity_report.py 2d [--frames N] [--sub K]
"""
import argparse
import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)


def report(name, ours, ref, mask=None):
    d = np.abs(ours - ref)
    if mask is not None:
        d = d[mask]
    if d.size == 0:
        print(f"  {name:10s}: (no points)")
        return
    print(f"  {name:10s}: mean|d|={d.mean():.4f} med={np.median(d):.4f} "
          f"p95={np.percentile(d, 95):.4f} max={d.max():.4f}")


def _load_golden(stem, n_frames):
    """golden_{stem}_fN.npz, falling back to the full-run golden_{stem}.npz
    (28 frames 2D / 40 frames 3D)."""
    p = os.path.join(REPO, "tests", "goldens", f"golden_{stem}_f{n_frames}.npz")
    if not os.path.exists(p):
        p = os.path.join(REPO, "tests", "goldens", f"golden_{stem}.npz")
    g = np.load(p)
    assert len(g["frames"]) == n_frames, (
        f"{p} holds {len(g['frames'])} frames, wanted {n_frames}")
    return g


def run_2d(n_frames, sub):
    from gpismap_tpu import datasets
    from gpismap_tpu.api import GPisMap2D

    g = _load_golden("2d", n_frames)
    xtest = g["xtest"][::sub]
    ref = g["res"][::sub]

    m = GPisMap2D()
    frames = list(datasets.gazebo_frames())[:n_frames]
    t0 = time.time()
    for i, fr in enumerate(frames):
        t1 = time.time()
        m.update(fr.thetas, fr.ranges, fr.pose)
        print(f"frame {i}: nodes={m.num_nodes} dt={time.time()-t1:.2f}s",
              flush=True)
    print(f"update total {time.time()-t0:.1f}s")
    t1 = time.time()
    res = m.test(xtest)
    print(f"test {len(xtest)} pts in {time.time()-t1:.2f}s")

    # reference sentinel: unmapped -> var 1+noise
    mapped_ref = ref[:, 3] < 1.0
    mapped_ours = res[:, 3] < 1.0
    agree = mapped_ref == mapped_ours
    print(f"mapped-point agreement: {agree.mean()*100:.2f}% "
          f"(ref {mapped_ref.sum()}, ours {mapped_ours.sum()})")
    both = mapped_ref & mapped_ours
    # confident region (where the demo draws the surface): var < 0.4
    conf = both & (ref[:, 3] < 0.4)
    print(f"both-mapped: {both.sum()}; confident(ref var<0.4): {conf.sum()}")
    print("all both-mapped points:")
    report("f", res[:, 0], ref[:, 0], both)
    report("gx", res[:, 1], ref[:, 1], both)
    report("gy", res[:, 2], ref[:, 2], both)
    report("varf", res[:, 3], ref[:, 3], both)
    print("confident points:")
    report("f", res[:, 0], ref[:, 0], conf)
    report("gx", res[:, 1], ref[:, 1], conf)
    report("gy", res[:, 2], ref[:, 2], conf)
    report("varf", res[:, 3], ref[:, 3], conf)
    return res, ref, xtest


def run_3d(n_frames, sub):
    from gpismap_tpu import datasets
    from gpismap_tpu.api3d import GPisMap3D

    g = _load_golden("3d", n_frames)
    xtest = g["xtest"][::sub]
    ref = g["res"][::sub]

    m = GPisMap3D()
    frames = list(datasets.bigbird_frames())[:n_frames]
    t0 = time.time()
    for i, fr in enumerate(frames):
        t1 = time.time()
        m.set_camera(fr.cam_id, "bigbird")
        m.update(fr.depth, fr.pose)
        print(f"frame {i}: nodes={m.num_nodes} dt={time.time()-t1:.2f}s",
              flush=True)
    print(f"update total {time.time()-t0:.1f}s")
    t1 = time.time()
    res = m.test(xtest)
    print(f"test {len(xtest)} pts in {time.time()-t1:.2f}s")

    mapped_ref = ref[:, 4] < 1.0
    mapped_ours = res[:, 4] < 1.0
    agree = mapped_ref == mapped_ours
    print(f"mapped-point agreement: {agree.mean()*100:.2f}% "
          f"(ref {mapped_ref.sum()}, ours {mapped_ours.sum()})")
    both = mapped_ref & mapped_ours
    conf = both & (ref[:, 4] < 0.5)
    print(f"both-mapped: {both.sum()}; confident: {conf.sum()}")
    print("all both-mapped points:")
    for i, nm in enumerate(["f", "gx", "gy", "gz", "varf"]):
        report(nm, res[:, i], ref[:, i], both)
    print("confident points:")
    for i, nm in enumerate(["f", "gx", "gy", "gz", "varf"]):
        report(nm, res[:, i], ref[:, i], conf)
    return res, ref, xtest


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["2d", "3d"])
    ap.add_argument("--frames", type=int, default=4)
    ap.add_argument("--sub", type=int, default=8)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (env vars are ignored here)")
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    if args.mode == "2d":
        run_2d(args.frames, args.sub)
    else:
        run_3d(args.frames, args.sub)
