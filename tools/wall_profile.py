#!/usr/bin/env python3
"""Wall-clock stage budget of the pipelined 2D update loop.

device_profile.py measures pure device time; the driver-visible
update fps also pays uploads, dispatch enqueueing, the one blocking
pull per frame and the host tree replay. This prints the per-frame
wall table accumulated by api.update_batch (wall_stats) so the gap
between device fps and wall fps is attributable line by line.

Usage: python tools/wall_profile.py [--cpu] [--frames N] [--reps K]
"""
import argparse
import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--frames", type=int, default=0)
    ap.add_argument("--reps", type=int, default=2,
                    help="full-sequence repetitions; rep >= 1 re-runs on "
                    "a FRESH mapper with all programs compiled (the "
                    "steady-state number)")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/gpismap_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from gpismap_tpu import datasets
    from gpismap_tpu.api import GPisMap2D

    frames = [(fr.thetas, fr.ranges, fr.pose)
              for fr in datasets.gazebo_frames()]
    if args.frames:
        frames = frames[:args.frames]

    res = {"backend": jax.default_backend(), "n_frames": len(frames)}
    for rep in range(args.reps):
        m = GPisMap2D()
        t0 = time.time()
        m.update_batch(frames)
        total = time.time() - t0
        w = dict(m.wall_stats)
        n = max(w.pop("n_frames", len(frames)), 1)
        table = {k: round(v / n * 1e3, 2) for k, v in sorted(w.items())}
        table["TOTAL_measured"] = round(sum(w.values()) / n * 1e3, 2)
        table["TOTAL_wall"] = round(total / n * 1e3, 2)
        table["fps"] = round(n / total, 1)
        res[f"rep{rep}_ms_per_frame"] = table
    res["n_nodes"] = int(m.num_nodes)
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
