#!/usr/bin/env python3
"""N>=2-host scaling: the sharded query path across OS-process boundaries.

Spawns --procs jax.distributed controllers (Gloo collectives), each owning
--devices-per-proc virtual CPU devices, and times cluster.map_test_sharded
on the global mesh with a 49.5k-query 2D workload (the demo grid size).
Virtual CPU devices share the host cores, so the number measures SPMD +
cross-process overhead, not hardware scaling — the cross-process structure
(collectives over the process boundary) is what real pods add on top of
tools/bench_scaling.py's single-process mesh.

Usage: python tools/bench_multihost.py [--procs 2] [--devices-per-proc 4]
"""
import argparse
import json
import os
import socket
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)

_WORKER = r"""
import json, os, sys, time
pid = int(sys.argv[1]); port = sys.argv[2]; nproc = int(sys.argv[3])
nq_env = int(os.environ.get('GPISMAP_BENCH_NQ', 65536))
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax.numpy as jnp

sys.path.insert(0, os.environ["GPISMAP_REPO"])
sys.path.insert(0, os.path.join(os.environ["GPISMAP_REPO"], "tests"))
from gpismap_tpu.parallel import multihost
from gpismap_tpu.models import cluster
from test_parallel import _circle_map

multihost.initialize(coordinator_address=f"127.0.0.1:{port}",
                     num_processes=nproc, process_id=pid)
mesh = multihost.global_data_mesh()
store, grid, kw = _circle_map()

nq_total = nq_env
rows = nq_total // nproc
rng = np.random.default_rng(0)
q = np.asarray(rng.uniform(-2, 2, (nq_total, 2)), np.float32)
local_q = q[pid * rows:(pid + 1) * rows]

g_store, g_grid = multihost.replicate(mesh, (store, grid))
g_q = multihost.global_query_array(mesh, local_q)

out = cluster.map_test_sharded(g_store, g_grid, g_q, mesh=mesh, **kw)
jax.block_until_ready(out)
reps = 3
t0 = time.time()
for _ in range(reps):
    out = cluster.map_test_sharded(g_store, g_grid, g_q, mesh=mesh, **kw)
jax.block_until_ready(out)
dt = (time.time() - t0) / reps
if pid == 0:
    print(json.dumps({"procs": nproc, "devices": len(jax.devices()),
                      "nq": nq_total, "wall_s": round(dt, 4),
                      "qps": round(nq_total / dt, 1)}), flush=True)
"""


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--procs", type=int, default=2)
    ap.add_argument("--devices-per-proc", type=int, default=4)
    args = ap.parse_args()

    worker = os.path.join(REPO, "tests", "_multihost_bench_worker.py")
    with open(worker, "w") as fh:
        fh.write(_WORKER)
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = str(s.getsockname()[1])

    env = dict(os.environ)
    env["XLA_FLAGS"] = (f"--xla_force_host_platform_device_count="
                        f"{args.devices_per_proc}")
    env["GPISMAP_REPO"] = REPO
    procs = [subprocess.Popen(
        [sys.executable, worker, str(pid), port, str(args.procs)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
        text=True) for pid in range(args.procs)]
    for pid, p in enumerate(procs):
        out, _ = p.communicate(timeout=900)
        if p.returncode != 0:
            print(f"worker {pid} failed", file=sys.stderr)
            sys.exit(1)
        if out.strip():
            print(out.strip())


if __name__ == "__main__":
    main()
