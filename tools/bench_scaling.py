#!/usr/bin/env python3
"""Device-scaling measurement for the sharded query path.

Builds the 2D gazebo map once, then measures map_test throughput with the
query batch sharded over 1/2/4/8 devices (store/grid replicated — the C13
data-parallel fan-out, GPisMap.cpp:765-810, as SPMD).

NOTE on interpretation: without multi-chip hardware this runs on VIRTUAL
CPU devices (xla_force_host_platform_device_count), which all share the
same host cores — wall-clock here validates the collective structure and
measures SPMD partition overhead, NOT hardware scaling. Per-device FLOPs
and bytes do halve with each doubling (printed below); on a real pod
slice the replicated-store design makes the forward loop communication-
free, so efficiency tracks the per-device work.

Usage: python tools/bench_scaling.py [--frames 28] [--reps 3]
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

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=28)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from gpismap_tpu import datasets
    from gpismap_tpu.api import GPisMap2D
    from gpismap_tpu.models import cluster

    m = GPisMap2D()
    for fr in list(datasets.gazebo_frames())[:args.frames]:
        m.update(fr.thetas, fr.ranges, fr.pose)
    xtest, _ = datasets.gazebo_test_grid()
    nq = len(xtest)
    qp = 1 << (nq - 1).bit_length()
    xq = np.full((qp, 2), 1e6, np.float32)
    xq[:nq] = xtest
    kw = dict(cell_size=m.cell_size, grid_half=m.grid_half, noff=m._noff,
              search_half=m._search_half, scale=m.p.map_scale_param,
              val_const=1.01, grad_const=m.p.three_over_scale + 0.1,
              var_thre=m.p.test_var_thre,
              default_var=1.0 + m.p.map_noise_param, tile=m.cap.test_tile,
              max_cells=m.cap.max_cells,
              max_active=m.cap.test_active_cells)
    factors = m._get_factors()

    rows = []
    base = None
    for n in (1, 2, 4, 8):
        mesh = Mesh(np.asarray(jax.devices()[:n]), ("d",))
        qsh = jax.device_put(jnp.asarray(xq), NamedSharding(mesh, P("d")))
        rep = NamedSharding(mesh, P())
        store = jax.device_put(m.store, rep)
        grid = jax.device_put(m.grid, rep)
        fac = jax.device_put(factors, rep) if factors is not None else None
        out = cluster.map_test_sharded(store, grid, qsh, factors=fac,
                                       mesh=mesh, **kw)
        jax.block_until_ready(out)          # compile + warm
        t0 = time.time()
        for _ in range(args.reps):
            out = cluster.map_test_sharded(store, grid, qsh, factors=fac,
                                           mesh=mesh, **kw)
            jax.block_until_ready(out)
        dt = (time.time() - t0) / args.reps
        qps = nq / dt
        if base is None:
            base = qps
        eff = qps / (base * n)
        rows.append(dict(devices=n, queries_per_s=round(qps, 1),
                         wall_ms=round(dt * 1e3, 2),
                         speedup=round(qps / base, 3),
                         efficiency=round(eff, 3),
                         per_device_queries=qp // n))
        print(f"# {n} dev: {qps:,.0f} q/s  ({dt*1e3:.1f} ms; "
              f"speedup {qps/base:.2f}x, eff {eff*100:.0f}%)",
              file=sys.stderr)

    print(json.dumps(dict(
        metric="2d_query_scaling_virtual_cpu_mesh",
        note=("virtual devices share host cores; validates SPMD structure"
              " and partition overhead, not hardware scaling"),
        n_test_points=nq, rows=rows)))
    return 0


if __name__ == "__main__":
    sys.exit(main())
