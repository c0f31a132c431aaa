"""Sharded execution on the 8-virtual-device CPU mesh."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest


def _need_devices(n):
    if len(jax.devices()) < n:
        pytest.skip(f"need {n} devices")


def test_dryrun_update_step_8dev():
    _need_devices(8)
    from gpismap_tpu.parallel import data_mesh, dryrun_update_step

    mesh = data_mesh(jax.devices()[:8])
    stats = dryrun_update_step(mesh, nbeams=64, nnodes=64, ncells=8,
                               support=8)
    assert np.isfinite(np.asarray(stats)).all()


def test_sharded_map_test_matches_single():
    _need_devices(8)
    from gpismap_tpu.config import CapacityParam, TREE_2D
    from gpismap_tpu.models import cluster
    from gpismap_tpu.parallel import data_mesh, sharded_map_test
    from gpismap_tpu.runtime import SpatialIndex

    cap = CapacityParam(gp_support=16, retrain_batch=8, max_cells=64,
                        max_nodes=512, test_tile=16, test_active_cells=16,
                        max_beams=64)
    idx = SpatialIndex(2, TREE_2D, max_slots=cap.max_cells)
    ang = np.linspace(0, 2 * np.pi, 40, endpoint=False)
    pts = np.stack([np.cos(ang), np.sin(ang)], -1).astype(np.float32)
    ids = idx.try_insert(pts)
    ok = ids >= 0
    normals = pts[ok] / np.linalg.norm(pts[ok], axis=1, keepdims=True)
    idx.set_node_data(ids[ok], np.full(ok.sum(), -0.2, np.float32),
                      np.full(ok.sum(), 0.02, np.float32), normals,
                      np.full(ok.sum(), 0.02, np.float32))
    rt = idx.collect_retrain(4.0, cap.gp_support, cap.max_cells)
    d = idx.dump_nodes()
    sup = rt["support"]
    supc = np.clip(sup, 0, None)
    store = cluster.make_store(cap, 2)
    store = cluster.retrain_cells(
        store, jnp.asarray(rt["slots"]), jnp.asarray(rt["slots"] >= 0),
        jnp.asarray(d["pos"][supc]), jnp.asarray(d["grad"][supc]),
        jnp.asarray(d["val"][supc]), jnp.asarray(d["pos_sig"][supc]),
        jnp.asarray(d["grad_sig"][supc]), jnp.asarray(sup >= 0), 1.2)
    cells = idx.all_cluster_cells()
    centers, _, slots = idx.cell_info(cells)
    grid = cluster.build_grid(np.floor(centers / 1.6).astype(np.int64),
                              slots, 2, 128)

    q = np.asarray(np.random.default_rng(0).uniform(-2, 2, (64, 2)),
                   np.float32)
    kw = dict(cell_size=1.6, grid_half=128, noff=4, search_half=4.8,
              scale=1.2, val_const=1.01, grad_const=3.0 / 1.44 + 0.1,
              var_thre=0.4, default_var=1.01, tile=cap.test_tile,
              max_cells=cap.max_cells, max_active=cap.test_active_cells)

    f1, g1, v1, _, _ = cluster.map_test(store, grid, jnp.asarray(q), **kw)
    mesh = data_mesh(jax.devices()[:8])
    f8, g8, v8, _, _ = sharded_map_test(store, grid, jnp.asarray(q), mesh,
                                        **kw)
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f8), rtol=1e-5,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v8), rtol=1e-5,
                               atol=1e-5)
