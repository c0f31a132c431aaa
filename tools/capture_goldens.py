#!/usr/bin/env python3
"""Capture golden outputs + timing floor from the reference C++ core.

Builds tools/ref_baseline/ref_driver (reference sources + Eigen headers
bundled with tensorflow), feeds it the bundled demo workloads, stores
goldens under tests/goldens/ as .npz for the parity tests, and prints the
reference CPU timings for BASELINE.md.

Usage: python tools/capture_goldens.py [2d|3d|all] [--frames N] [--out DIR]
"""
import argparse
import glob
import os
import struct
import subprocess
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)

from gpismap_tpu import datasets  # noqa: E402

DRIVER = os.path.join(HERE, "ref_baseline", "ref_driver")
EIGEN = "/opt/venv/lib/python3.12/site-packages/tensorflow/include"
REF = "/root/reference/cpp"


def build_driver():
    src = os.path.join(HERE, "ref_baseline", "ref_driver.cpp")
    if (os.path.exists(DRIVER)
            and os.path.getmtime(DRIVER) > os.path.getmtime(src)):
        return
    cmd = (["g++", "-O2", "-std=c++14", "-pthread",
            f"-I{REF}/include", f"-I{EIGEN}", src]
           + sorted(glob.glob(f"{REF}/src/*.cpp"))
           + ["-o", DRIVER])
    subprocess.run(cmd, check=True, capture_output=True)


def capture_2d(out_dir: str, max_frames: int | None = None):
    frames = list(datasets.gazebo_frames())
    if max_frames:
        frames = frames[:max_frames]
    xtest, shape = datasets.gazebo_test_grid()
    nb = len(frames[0].thetas)

    in_path = os.path.join(out_dir, "ref2d_in.bin")
    with open(in_path, "wb") as f:
        f.write(struct.pack("<iii", nb, len(frames), len(xtest)))
        frames[0].thetas.astype("<f4").tofile(f)
        for fr in frames:
            fr.pose.astype("<f4").tofile(f)
            fr.ranges.astype("<f4").tofile(f)
        xtest.astype("<f4").reshape(-1).tofile(f)

    out_path = os.path.join(out_dir, "ref2d_out.bin")
    subprocess.run([DRIVER, "2d", in_path, out_path], check=True)
    raw = np.fromfile(out_path, "<f4")
    upd_t = raw[:len(frames)]
    test_t = raw[len(frames)]
    res = raw[len(frames) + 1:].reshape(len(xtest), 6)
    name = "golden_2d.npz" if max_frames is None else \
        f"golden_2d_f{len(frames)}.npz"
    np.savez_compressed(
        os.path.join(out_dir, name),
        res=res, xtest=xtest, grid_shape=shape,
        update_seconds=upd_t, test_seconds=test_t,
        frames=np.asarray([fr.frame for fr in frames]))
    print(f"2D: {len(frames)} frames; ref update {upd_t.mean():.3f}s/frame "
          f"(total {upd_t.sum():.2f}s); test {test_t:.3f}s for "
          f"{len(xtest)} pts -> {len(xtest)/test_t:.0f} q/s")
    os.remove(in_path)
    os.remove(out_path)


def capture_3d(out_dir: str, max_frames: int | None = None):
    from gpismap_tpu.config import BIGBIRD_CAMS
    frames = list(datasets.bigbird_frames())
    if max_frames:
        frames = frames[:max_frames]
    xtest, shape = datasets.bigbird_test_grid()
    h, w = frames[0].depth.shape

    in_path = os.path.join(out_dir, "ref3d_in.bin")
    with open(in_path, "wb") as f:
        f.write(struct.pack("<iiii", w, h, len(frames), len(xtest)))
        for fr in frames:
            cam = BIGBIRD_CAMS[fr.cam_id - 1]
            np.asarray([cam.fx, cam.fy, cam.cx, cam.cy],
                       "<f4").tofile(f)
            fr.pose.astype("<f4").tofile(f)
            # column-major flatten: k = col*height + row
            fr.depth.T.astype("<f4").reshape(-1).tofile(f)
        xtest.astype("<f4").reshape(-1).tofile(f)

    out_path = os.path.join(out_dir, "ref3d_out.bin")
    subprocess.run([DRIVER, "3d", in_path, out_path], check=True)
    raw = np.fromfile(out_path, "<f4")
    upd_t = raw[:len(frames)]
    test_t = raw[len(frames)]
    nres = len(xtest) * 8
    res = raw[len(frames) + 1:len(frames) + 1 + nres].reshape(len(xtest), 8)
    rest = raw[len(frames) + 1 + nres:]
    nodes = np.zeros((0, 3), np.float32)
    if len(rest):
        npts = rest[:1].view(np.int32)[0]
        nodes = rest[1:1 + 3 * npts].reshape(npts, 3)
    name = "golden_3d.npz" if max_frames is None else \
        f"golden_3d_f{len(frames)}.npz"
    np.savez_compressed(
        os.path.join(out_dir, name),
        res=res, xtest=xtest, grid_shape=shape,
        update_seconds=upd_t, test_seconds=test_t, nodes=nodes,
        frames=np.asarray([fr.frame for fr in frames]))
    print(f"3D: {len(frames)} frames; ref update {upd_t.mean():.3f}s/frame "
          f"(total {upd_t.sum():.2f}s); test {test_t:.3f}s for "
          f"{len(xtest)} pts -> {len(xtest)/test_t:.0f} q/s")
    os.remove(in_path)
    os.remove(out_path)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", nargs="?", default="all",
                    choices=["2d", "3d", "all"])
    ap.add_argument("--frames", type=int, default=None)
    ap.add_argument("--out", default=os.path.join(REPO, "tests", "goldens"))
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    build_driver()
    if args.mode in ("2d", "all"):
        capture_2d(args.out, args.frames)
    if args.mode in ("3d", "all"):
        capture_3d(args.out, args.frames)
