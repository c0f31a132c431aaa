#!/usr/bin/env python3
"""Benchmark: 2D gazebo workload, matched to the reference protocol.

Builds the map from the demo frame schedule (matlab/demo_gpisMap.m:37-40)
and times the batched SDF+gradient query on the demo test grid
(49 551 points). Prints ONE JSON line:
  {"metric": ..., "value": qps, "unit": "queries/s", "vs_baseline": x}

Baseline: reference C++ on the container CPU = 72 772 queries/s
(BASELINE.md, captured via tools/capture_goldens.py).
"""
import json
import sys
import time

import numpy as np

REF_QPS = 72772.0
N_FRAMES = 28            # full demo schedule


def main():
    import jax
    # persistent compile cache: the tunneled TPU pays minutes per compile;
    # repeat bench runs should pay none
    jax.config.update("jax_compilation_cache_dir", "/tmp/gpismap_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from gpismap_tpu import datasets
    from gpismap_tpu.api import GPisMap2D

    m = GPisMap2D()
    frames = list(datasets.gazebo_frames())[:N_FRAMES]
    raw = [(fr.thetas, fr.ranges, fr.pose) for fr in frames]
    # warm the per-frame programs (first run pays one-time XLA compiles —
    # minutes over the tunnel, cached persistently), then measure the
    # pipelined ingestion: update_batch dispatches every frame's
    # tree-independent program up front so device compute + argument
    # upload overlap the one blocking round trip per frame.
    t0 = time.time()
    m.update_batch(raw)
    warm_wall = time.time() - t0
    print(f"# warm pass: {warm_wall:.1f}s nodes={m.num_nodes}",
          file=sys.stderr, flush=True)
    m.reset()
    t0 = time.time()
    m.update_batch(raw)
    batch_wall = time.time() - t0
    t_upd = [batch_wall / len(frames)] * len(frames)
    print(f"# measured pass: {batch_wall:.2f}s "
          f"({len(frames) / batch_wall:.1f} fps) nodes={m.num_nodes}",
          file=sys.stderr, flush=True)

    xtest, _ = datasets.gazebo_test_grid()
    # warm-up (compile) at the benchmark shape, then measure
    m.test(xtest)
    reps = 3
    import contextlib
    import os as _os
    prof_dir = _os.environ.get("GPISMAP_PROFILE")
    ctx = (jax.profiler.trace(prof_dir) if prof_dir
           else contextlib.nullcontext())
    with ctx:
        t0 = time.time()
        for _ in range(reps):
            res = m.test(xtest)
        dt_call = (time.time() - t0) / reps

    # STREAMED throughput (the headline): R batches dispatched
    # back-to-back, results pulled afterwards — device compute overlaps
    # result transfer exactly as a serving deployment would pipeline.
    # The per-call number above pays the tunnel's full RTT + 1.6 MB pull
    # per batch, i.e. it measures tunnel weather (BASELINE.md
    # tunnel-weather disclaimer), not the chip.
    sreps = 6
    t0 = time.time()
    handles = [m._test_dispatch(xtest)[0] for _ in range(sreps)]
    pulled = jax.device_get([h[:4] for h in handles])
    dt = (time.time() - t0) / sreps
    qps = len(xtest) / dt
    del pulled

    # device-only: the production query program re-dispatched on a
    # PRE-UPLOADED batch, one scalar drain (re-uploading per rep would
    # measure the tunnel's ~14 MB/s, not the chip)
    import jax.numpy as jnp
    from gpismap_tpu.models import cluster

    qp = 1 << (len(xtest) - 1).bit_length()
    xq = np.full((qp, 2), 1e6, np.float32)
    xq[:len(xtest)] = xtest
    xq_d = jax.device_put(jnp.asarray(xq))
    if m._nbrs is None:
        m._build_nbrs()

    def dev_dispatch():
        return cluster.map_test(
            m.store, m.grid, xq_d, factors=m._get_factors(),
            use_pallas=m._use_pallas(), nbrs=m._nbrs,
            nbr_dense=m._nbr_dense, **m._test_kwargs())

    h = dev_dispatch()
    jax.block_until_ready(h)
    jax.device_get(jnp.sum(h[0].ravel()[:1]))
    t0 = time.time()
    for _ in range(sreps):
        h = dev_dispatch()
    jax.device_get(jnp.sum(h[0].ravel()[:1]))
    dt_dev = (time.time() - t0) / sreps
    qps_dev = len(xtest) / dt_dev

    # steady-state update rate: whole-sequence wall of the measured
    # (post-compile) pipelined pass
    fps = len(frames) / max(batch_wall, 1e-9)
    fps_mean = len(frames) / max(warm_wall, 1e-9)

    out = {
        "metric": "2d_sdf_grad_queries_per_s_per_chip",
        # headline = device-only throughput: the tunnel's RTT/bandwidth
        # swings by >5x between sessions (BASELINE.md tunnel-weather
        # disclaimer; measured 570k vs 105k q/s STREAMED for identical
        # code hours apart), so wall numbers measure the network, not
        # the chip. Wall figures are reported in extra.
        "value": round(qps_dev, 1),
        "unit": "queries/s",
        # measurement definition of `value` (advisor r4): rounds 1-3
        # reported streamed-wall here; r4+ report device-only — compare
        # historical JSONs via this field, not the metric name alone
        "measurement": "device_only",
        "vs_baseline": round(qps_dev / REF_QPS, 3),
        "extra": {
            "update_frames_per_s": round(fps, 2),
            "update_fps_first_pass_incl_compiles": round(fps_mean, 2),
            "ref_update_frames_per_s": round(1.0 / 0.009, 1),
            "n_frames": len(frames),
            "n_nodes": int(m.num_nodes),
            "n_test_points": int(len(xtest)),
            "test_s_streamed": round(dt, 4),
            "queries_per_s_streamed_wall": round(qps, 1),
            "test_s_percall": round(dt_call, 4),
            "queries_per_s_percall_wall": round(len(xtest) / dt_call, 1),
            "test_s_device_only": round(dt_dev, 4),
        },
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
