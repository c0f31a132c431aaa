"""plan_tiles gather formulation == the round-4 scatter reference,
exactly (same pair placement, same padding, same tile segments)."""
import numpy as np
import jax.numpy as jnp

from gpismap_tpu.ops import segmented


def _check(seg, n_segments, tile):
    a = segmented.plan_tiles(jnp.asarray(seg, jnp.int32), n_segments, tile)
    b = segmented._plan_tiles_scatter_ref(jnp.asarray(seg, jnp.int32),
                                          n_segments, tile)
    np.testing.assert_array_equal(np.asarray(a.pair_ids),
                                  np.asarray(b.pair_ids))
    np.testing.assert_array_equal(np.asarray(a.tile_seg),
                                  np.asarray(b.tile_seg))
    assert int(a.n_tiles) == int(b.n_tiles)
    # invariants: every valid pair appears exactly once, in its segment
    pid = np.asarray(a.pair_ids)
    ts = np.asarray(a.tile_seg)
    flat = pid[pid >= 0]
    valid_ids = np.nonzero(np.asarray(seg) >= 0)[0]
    np.testing.assert_array_equal(np.sort(flat), np.sort(valid_ids))
    for t in range(pid.shape[0]):
        ids = pid[t][pid[t] >= 0]
        if len(ids):
            assert ts[t] >= 0
            assert (np.asarray(seg)[ids] == ts[t]).all()


def test_plan_tiles_matches_scatter_reference():
    rng = np.random.default_rng(0)
    for trial in range(8):
        p = int(rng.integers(1, 700))
        ns = int(rng.integers(1, 20))
        tile = int(rng.choice([4, 16, 128]))
        seg = rng.integers(-1, ns, p)
        _check(seg, ns, tile)
    # edge cases: all invalid, one segment, exact tile multiples
    _check(np.full(64, -1), 8, 16)
    _check(np.zeros(64, np.int32), 8, 16)
    _check(np.repeat(np.arange(4), 16), 8, 16)


def test_plan_tiles_bench_shape_smoke():
    """The packed-key path at a bench-like shape (P=3*65536, S=512)."""
    rng = np.random.default_rng(1)
    seg = rng.integers(-1, 400, 3 * 4096)
    _check(seg, 512, 128)


def test_plan_tiles_unpacked_fallback():
    """(S+1)*P2 >= 2^31 forces the argsort+bincount fallback (the
    packed int32 key would overflow); it must produce the same plan."""
    rng = np.random.default_rng(2)
    ns = 40_000                       # 40001 * 65536 > 2^31
    p = 33_000                        # P2 = 65536
    seg = rng.integers(-1, 200, p)    # few live segments, huge id space
    a = segmented.plan_tiles(jnp.asarray(seg, jnp.int32), ns, 128)
    b = segmented._plan_tiles_scatter_ref(jnp.asarray(seg, jnp.int32),
                                          ns, 128)
    np.testing.assert_array_equal(np.asarray(a.pair_ids),
                                  np.asarray(b.pair_ids))
    np.testing.assert_array_equal(np.asarray(a.tile_seg),
                                  np.asarray(b.tile_seg))
    assert int(a.n_tiles) == int(b.n_tiles)
