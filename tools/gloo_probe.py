#!/usr/bin/env python3
"""Bare cross-process collective cost probe (round-4 BASELINE headroom #3).

Round 4 measured the 2-process sharded query path at ~2.1 s/call vs
0.39 s single-process for the identical program, attributing ~0.45 s to
each tiny Gloo collective and leaving ~1.7 s/call unexplained. This tool
isolates the collective layer: 2 jax.distributed controllers on one host,
NO framework code — just psum / all-gather over a global CPU mesh, with
and without per-process core pinning (os.sched_setaffinity), at 1 and 4
virtual devices per process.

Usage: python tools/gloo_probe.py [--reps 20]
Writes one JSON line per configuration.
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
ndev = int(sys.argv[4]); pin = int(sys.argv[5]); reps = int(sys.argv[6])
if pin:
    ncpu = os.cpu_count()
    os.sched_setaffinity(0, {pid % ncpu})
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + f" --xla_force_host_platform_device_count={ndev}")
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map as _sm
import functools
try:
    _sm(lambda: None, mesh=None, in_specs=(), out_specs=None,
        check_vma=False)
    shard_map = functools.partial(_sm, check_vma=False)
except TypeError:
    shard_map = functools.partial(_sm, check_rep=False)
except Exception:
    shard_map = functools.partial(_sm, check_vma=False)

jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=nproc, process_id=pid)
devs = np.array(jax.devices())
mesh = Mesh(devs, ("d",))

@jax.jit
def psum_scalar(x):
    return shard_map(lambda v: jax.lax.psum(v, "d"), mesh=mesh,
                     in_specs=P("d"), out_specs=P())(x)

@jax.jit
def psum_vec3(x):
    return shard_map(lambda v: jax.lax.psum(v, "d"), mesh=mesh,
                     in_specs=P("d", None), out_specs=P(None))(x)

@jax.jit
def allgather_1mb(x):
    return shard_map(lambda v: jax.lax.all_gather(v, "d", tiled=True),
                     mesh=mesh, in_specs=P("d"), out_specs=P())(x)

def timeit(fn, x):
    r = fn(x); jax.block_until_ready(r)
    t0 = time.time()
    for _ in range(reps):
        r = fn(x)
    jax.block_until_ready(r)
    return (time.time() - t0) / reps

n = len(devs)
xs = jax.make_array_from_process_local_data(
    jax.NamedSharding(mesh, P("d")), np.ones(ndev, np.float32))
xv = jax.make_array_from_process_local_data(
    jax.NamedSharding(mesh, P("d", None)), np.ones((ndev, 3), np.float32))
xg = jax.make_array_from_process_local_data(
    jax.NamedSharding(mesh, P("d")),
    np.ones(262144 * ndev, np.float32))   # 1 MB/process
res = {
    "psum_scalar_ms": round(timeit(psum_scalar, xs) * 1e3, 2),
    "psum_vec3_ms": round(timeit(psum_vec3, xv) * 1e3, 2),
    "allgather_1mb_ms": round(timeit(allgather_1mb, xg) * 1e3, 2),
}
if pid == 0:
    print(json.dumps(res), flush=True)
"""


def run_config(nproc, ndev, pin, reps):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    procs = []
    env = dict(os.environ, GPISMAP_REPO=REPO)
    env.pop("XLA_FLAGS", None)
    for pid in range(nproc):
        procs.append(subprocess.Popen(
            [sys.executable, "-c", _WORKER, str(pid), str(port),
             str(nproc), str(ndev), str(int(pin)), str(reps)],
            stdout=subprocess.PIPE if pid == 0 else subprocess.DEVNULL,
            stderr=subprocess.DEVNULL, env=env, cwd=REPO))
    out, _ = procs[0].communicate(timeout=600)
    for p in procs[1:]:
        p.wait(timeout=60)
    line = out.decode().strip().splitlines()[-1] if out else "{}"
    res = json.loads(line)
    res.update(procs=nproc, devices_per_proc=ndev, pinned=bool(pin))
    print(json.dumps(res), flush=True)
    return res


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=20)
    args = ap.parse_args()
    for nproc, ndev in ((1, 8), (2, 4), (2, 1)):
        for pin in (False, True):
            if nproc == 1 and pin:
                continue
            try:
                run_config(nproc, ndev, pin, args.reps)
            except Exception as e:  # noqa: BLE001 - report and continue
                print(json.dumps({"procs": nproc, "devices_per_proc": ndev,
                                  "pinned": pin, "error": repr(e)}),
                      flush=True)


if __name__ == "__main__":
    main()
