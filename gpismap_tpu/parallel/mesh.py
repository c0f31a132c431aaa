"""Multi-chip sharding for the GPIS pipeline.

The reference's only parallelism is a std::thread fan-out over query chunks
and cluster cells with a join barrier (reference: GPisMap.cpp:596-663,
765-810 — C13 in SURVEY.md). The TPU-native equivalent is data-parallel
sharding over a jax.sharding.Mesh:

  * test(): query points sharded over the mesh, cluster-GP store and grid
    replicated — zero cross-chip traffic in the hot loop, exactly the
    moral equivalent of test_kernel chunking.
  * update(): beams/nodes/retrain-cells sharded; the observation GP is
    replicated (it is tiny); scalar frame statistics all-reduce over ICI.

Shardings are expressed with NamedSharding + jax.jit so XLA inserts the
collectives; no hand-written NCCL-style code.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import (CAPACITY_2D, MAPPER_2D, OBSGP_1D, CapacityParam,
                      MapperParam, ObsGPParam)
from ..models import cluster, mapper2d, obsgp


def data_mesh(devices=None, axis: str = "d") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def sharded_map_test(store: cluster.ClusterStore, grid: jnp.ndarray,
                     q: jnp.ndarray, mesh: Mesh, **kw):
    """map_test with queries sharded over the mesh, store replicated."""
    axis = mesh.axis_names[0]
    qsh = NamedSharding(mesh, P(axis))
    rep = NamedSharding(mesh, P())
    q = jax.device_put(q, qsh)
    store = jax.device_put(store, rep)
    grid = jax.device_put(grid, rep)
    return cluster.map_test(store, grid, q, **kw)


@functools.partial(jax.jit, static_argnames=("mp", "op", "g_max"))
def _update_compute(theta, rng, tr, rot, node_pos, node_grad, node_ps,
                    node_gs, node_valid, sup_x, sup_grad, sup_val, sup_ps,
                    sup_gs, sup_valid, mp: MapperParam, op: ObsGPParam,
                    g_max: int):
    """One fused frame-update compute: preprocess + obs fit + reeval +
    newmeas + cluster retrain. Pure function of sharded inputs — the
    host-side tree replay sits between calls in the real pipeline; this
    fused form is what the multi-chip dry-run compiles."""
    prep = mapper2d.preprocess_2d(theta, rng, tr, rot, mp)
    obs = obsgp.fit_obsgp1d(prep.theta, prep.f, prep.valid, op, g_max=g_max)
    rv = mapper2d.reeval_2d(obs, node_pos, node_grad, node_ps, node_gs,
                            node_valid, tr, rot, mp, op, chunk=256)
    nm = mapper2d.newmeas_2d(obs, prep, rot, mp, op, chunk=256)
    from ..ops import gp as gpops
    st = gpops.fit_ongpis(sup_x, sup_grad, sup_val, sup_ps, sup_gs,
                          sup_valid, mp.map_scale_param)
    stats = jnp.stack([jnp.sum(nm.insert_ok.astype(jnp.float32)),
                       jnp.sum((rv.action == 3).astype(jnp.float32)),
                       prep.range_obs_max])
    return rv, nm, st.alpha, stats


def dryrun_update_step(mesh: Mesh, nbeams: int = 64, nnodes: int = 64,
                       ncells: int = 8, support: int = 8):
    """Compile + run one sharded update step on tiny shapes.

    Beams/nodes replicated-small here would defeat the check, so every
    heavy axis is sharded: reeval nodes, newmeas beams, retrain cells.
    """
    axis = mesh.axis_names[0]
    sh = NamedSharding(mesh, P(axis))
    rep = NamedSharding(mesh, P())
    rng = np.random.default_rng(0)

    theta = np.sort(rng.uniform(-2, 2, nbeams)).astype(np.float32)
    ranges = rng.uniform(1.0, 5.0, nbeams).astype(np.float32)
    tr = np.zeros(2, np.float32)
    rot = np.eye(2, dtype=np.float32)
    npos = rng.uniform(-3, 3, (nnodes, 2)).astype(np.float32)
    ngrad = rng.normal(size=(nnodes, 2)).astype(np.float32)
    ngrad /= np.linalg.norm(ngrad, axis=1, keepdims=True)
    nps = np.full(nnodes, 0.05, np.float32)
    ngs = np.full(nnodes, 0.05, np.float32)
    nval = np.ones(nnodes, bool)
    sx = rng.uniform(-3, 3, (ncells, support, 2)).astype(np.float32)
    sg = rng.normal(size=(ncells, support, 2)).astype(np.float32)
    sg /= np.linalg.norm(sg, axis=-1, keepdims=True)
    sv = np.full((ncells, support), -0.2, np.float32)
    sps = np.full((ncells, support), 0.05, np.float32)
    sgs = np.full((ncells, support), 0.05, np.float32)
    svalid = np.ones((ncells, support), bool)

    put = jax.device_put
    args = (put(theta, sh), put(ranges, sh), put(tr, rep), put(rot, rep),
            put(npos, sh), put(ngrad, sh), put(nps, sh), put(ngs, sh),
            put(nval, sh), put(sx, sh), put(sg, sh), put(sv, sh),
            put(sps, sh), put(sgs, sh), put(svalid, sh))
    rv, nm, alpha, stats = _update_compute(
        *args, mp=MAPPER_2D, op=OBSGP_1D, g_max=nbeams // 20 + 2)
    jax.block_until_ready((rv, nm, alpha, stats))
    return stats
