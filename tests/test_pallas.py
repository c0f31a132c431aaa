"""Pallas tile kernel vs the XLA path (interpret mode on CPU)."""
import numpy as np
import jax
import jax.numpy as jnp

from gpismap_tpu.ops.pallas_tile import tile_eval_pallas
from gpismap_tpu.models.cluster import _ongpis_eval_tile, ClusterStore
from gpismap_tpu.ops.gp import ongpis_prepare, linv_from_chol
from gpismap_tpu.ops import kernels


def test_pallas_tile_matches_xla():
    rng = np.random.default_rng(0)
    S, M, D, T, NT = 4, 16, 2, 8, 6
    MP = M*(1+D)
    x = rng.uniform(-1, 1, (S, M, D)).astype(np.float32)
    grad = rng.normal(size=(S, M, D)).astype(np.float32)
    grad /= np.linalg.norm(grad, axis=-1, keepdims=True)
    val = np.full((S, M), -0.2, np.float32)
    sigx = np.full((S, M), 0.05, np.float32)
    siggrad = np.full((S, M), 0.05, np.float32)
    valid = rng.uniform(size=(S, M)) > 0.2

    store = ClusterStore(x=jnp.asarray(x), grad=jnp.asarray(grad), val=jnp.asarray(val),
                         sigx=jnp.asarray(sigx), siggrad=jnp.asarray(siggrad),
                         valid=jnp.asarray(valid),
                         alpha=jnp.asarray(rng.normal(size=(S, MP)).astype(np.float32)),
                         trained=jnp.ones(S, bool))
    gf, sx = ongpis_prepare(store.grad, store.sigx, store.siggrad, store.valid)
    K = kernels.matern32_deriv_train_cov(store.x, sx, store.siggrad, gf, store.valid, 1.2)
    linv = linv_from_chol(jnp.linalg.cholesky(K))

    segs = np.asarray(rng.integers(0, S, NT), np.int32)
    segs[-1] = -1           # inactive tile: skipped in-kernel, output garbage
    segs = jnp.asarray(segs)
    q = jnp.asarray(rng.uniform(-1, 1, (NT, T, D)), jnp.float32)

    slot_of = jnp.arange(S, dtype=jnp.int32)
    f0, g0, vf0, vg0 = _ongpis_eval_tile(store, linv, slot_of,
                                         jnp.maximum(segs, 0), q,
                                         1.2, 1.01, 3/1.44+0.1)

    f1, g1t, vf1, vg1t = tile_eval_pallas(segs, linv, jnp.swapaxes(store.x, -1, -2),
        store.alpha, gf.astype(jnp.float32), store.valid.astype(jnp.float32),
        jnp.swapaxes(q, -1, -2), d=D, scale=1.2, val_const=1.01,
        grad_const=3/1.44+0.1, interpret=True)
    g1 = jnp.swapaxes(g1t, -1, -2)
    vg1 = jnp.swapaxes(vg1t, -1, -2)

    act = np.asarray(segs) >= 0          # compare active tiles only
    for name, a, b in [("f", f0, f1), ("g", g0, g1), ("vf", vf0, vf1), ("vg", vg0, vg1)]:
        err = float(jnp.max(jnp.abs(a - b)[act]))
        print(f"{name}: max err {err:.2e}")
        assert err < 1e-4, name

    # multi-panel factor blocking (the 3D VMEM path)
    f2, g2t, vf2, vg2t = tile_eval_pallas(
        segs, linv, jnp.swapaxes(store.x, -1, -2), store.alpha,
        gf.astype(jnp.float32), store.valid.astype(jnp.float32),
        jnp.swapaxes(q, -1, -2), d=D, scale=1.2, val_const=1.01,
        grad_const=3 / 1.44 + 0.1, interpret=True, panel_override=16)
    assert float(jnp.max(jnp.abs(f2 - f0)[act])) < 1e-4
    assert float(jnp.max(jnp.abs(vf2 - vf0)[act])) < 1e-4
    assert float(jnp.max(
        jnp.abs(jnp.swapaxes(vg2t, -1, -2) - vg0)[act])) < 1e-4

    # bf16 variance mode (GPISMAP_PALLAS_BF16): mean path untouched
    # (exactly equal), variance within the documented ~1e-2 envelope
    f3, g3t, vf3, vg3t = tile_eval_pallas(
        segs, linv, jnp.swapaxes(store.x, -1, -2), store.alpha,
        gf.astype(jnp.float32), store.valid.astype(jnp.float32),
        jnp.swapaxes(q, -1, -2), d=D, scale=1.2, val_const=1.01,
        grad_const=3 / 1.44 + 0.1, interpret=True, bf16=True)
    assert float(jnp.max(jnp.abs(f3 - f1)[act])) == 0.0
    assert float(jnp.max(jnp.abs(g3t - g1t)[act])) == 0.0
    assert float(jnp.max(jnp.abs(vf3 - vf0)[act])) < 2e-2
    assert float(jnp.max(
        jnp.abs(jnp.swapaxes(vg3t, -1, -2) - vg0)[act])) < 5e-2


def _tiny_mapper():
    from gpismap_tpu.api import GPisMap2D
    from gpismap_tpu.config import CapacityParam

    cap = CapacityParam(gp_support=16, retrain_batch=8, max_cells=64,
                        max_nodes=512, test_tile=16, test_active_cells=16,
                        max_beams=64)
    m = GPisMap2D(cap=cap)
    th = np.linspace(-1.0, 1.0, 64, dtype=np.float32)
    rg = np.full(64, 3.0, np.float32)
    m.update(th, rg, np.array([0, 0, 1, 0, 0, 1], np.float32))
    return m


def test_pallas_failure_is_visible(monkeypatch):
    """A Pallas compile/run failure must (a) fall back to the XLA path,
    (b) leave the error in stats — never degrade silently (api.py test)."""
    import gpismap_tpu.ops.pallas_tile as pt

    m = _tiny_mapper()
    q = np.asarray([[3.0, 0.0], [0.0, 0.0]], np.float32)
    ref = m.test(q)

    def boom(*a, **kw):
        raise jax.errors.JaxRuntimeError("injected pallas failure")

    monkeypatch.setattr(pt, "tile_eval_pallas", boom)
    monkeypatch.setattr(type(m), "_use_pallas", lambda self: True)
    out = m.test(q)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)
    assert "injected pallas failure" in m.stats.get("pallas_error", "")
    assert m._pallas_ok is False        # sticky fallback engaged


def test_non_pallas_errors_propagate(monkeypatch):
    """Plumbing bugs (TypeError etc.) must NOT be swallowed by the
    fallback."""
    import pytest

    import gpismap_tpu.ops.pallas_tile as pt

    m = _tiny_mapper()

    def boom(*a, **kw):
        raise TypeError("argument plumbing bug")

    monkeypatch.setattr(pt, "tile_eval_pallas", boom)
    monkeypatch.setattr(type(m), "_use_pallas", lambda self: True)
    with pytest.raises(TypeError):
        m.test(np.asarray([[3.0, 0.0]], np.float32))



def _spd_batch(rng, b, mp):
    a = rng.normal(size=(b, mp, mp)).astype(np.float32) / np.sqrt(mp)
    k = a @ np.swapaxes(a, -1, -2) + 2.0 * np.eye(mp, dtype=np.float32)
    return jnp.asarray(k)


def test_pallas_chol_matches_xla():
    """Blocked Pallas Cholesky == XLA (interpret mode), incl. identity-
    masked rows as produced by the masked kernel builders."""
    from gpismap_tpu.ops.pallas_chol import chol_pallas

    rng = np.random.default_rng(1)
    k = _spd_batch(rng, 4, 384)
    # identity-mask a few rows/cols the way ops/kernels.py pads
    kn = np.array(k)
    for b, i in [(0, 5), (0, 380), (2, 100)]:
        kn[b, i, :] = 0.0
        kn[b, :, i] = 0.0
        kn[b, i, i] = 1.0
    k = jnp.asarray(kn)

    l_ref = np.asarray(jnp.linalg.cholesky(k))
    l_pl = np.asarray(chol_pallas(k, interpret=True))
    np.testing.assert_allclose(l_pl, l_ref, rtol=2e-4, atol=2e-4)
    # strict upper must be exact zeros
    iu = np.triu_indices(384, k=1)
    assert (l_pl[:, iu[0], iu[1]] == 0).all()


def test_pallas_linv_matches_xla():
    from gpismap_tpu.ops.gp import linv_from_chol
    from gpismap_tpu.ops.pallas_chol import linv_pallas

    rng = np.random.default_rng(2)
    k = _spd_batch(rng, 2, 256)
    l = jnp.linalg.cholesky(k)
    w_ref = np.asarray(
        jax.lax.linalg.triangular_solve(
            l, jnp.broadcast_to(jnp.eye(256, dtype=l.dtype), l.shape),
            left_side=True, lower=True))
    w_pl = np.asarray(linv_pallas(l, interpret=True))
    np.testing.assert_allclose(w_pl, w_ref, rtol=2e-4, atol=2e-4)


def test_pallas_chol_env_switch_fit_equivalence(monkeypatch):
    """fit_ongpis through the Pallas factor path == the XLA path on a real
    masked cluster-GP system (GPISMAP_PALLAS_CHOL=1 in interpret mode)."""
    from gpismap_tpu.ops import gp

    rng = np.random.default_rng(3)
    b, m, d = 2, 128, 2            # MP = 384: the production 2D shape
    x = rng.uniform(-1, 1, (b, m, d)).astype(np.float32)
    g = rng.normal(size=(b, m, d)).astype(np.float32)
    g /= np.linalg.norm(g, axis=-1, keepdims=True)
    val = np.full((b, m), -0.2, np.float32)
    sig = np.full((b, m), 0.05, np.float32)
    valid = rng.uniform(size=(b, m)) > 0.3

    def fit():
        st = gp.fit_ongpis(jnp.asarray(x), jnp.asarray(g), jnp.asarray(val),
                           jnp.asarray(sig), jnp.asarray(sig),
                           jnp.asarray(valid), 0.2)
        return np.asarray(st.alpha), np.asarray(gp.linv_from_chol(st.l))

    monkeypatch.setenv("GPISMAP_PALLAS_CHOL", "0")
    a_ref, w_ref = fit()
    monkeypatch.setenv("GPISMAP_PALLAS_CHOL", "1")
    a_pl, w_pl = fit()
    np.testing.assert_allclose(a_pl, a_ref, rtol=5e-3, atol=5e-3)
    np.testing.assert_allclose(w_pl, w_ref, rtol=5e-3, atol=5e-3)


def test_blocked_chol_matches_xla():
    """The 128-blocked pure-JAX factorization/solves/inverse (the path TPU
    defaults to) == the native XLA ops."""
    from gpismap_tpu.ops import blocked_chol as bc

    rng = np.random.default_rng(4)
    k = _spd_batch(rng, 3, 384)
    l_ref = np.asarray(jnp.linalg.cholesky(k))
    l, wd = jax.jit(bc.blocked_factor)(k)
    np.testing.assert_allclose(np.asarray(l), l_ref, rtol=2e-4, atol=2e-4)
    iu = np.triu_indices(384, k=1)
    assert (np.asarray(l)[:, iu[0], iu[1]] == 0).all()

    rhs = jnp.asarray(rng.normal(size=(3, 384, 2)).astype(np.float32))
    y_ref = np.asarray(jax.lax.linalg.triangular_solve(
        jnp.asarray(l_ref), rhs, left_side=True, lower=True))
    y = np.asarray(bc.blocked_solve_lower(l, wd, rhs))
    np.testing.assert_allclose(y, y_ref, rtol=2e-4, atol=2e-4)

    import jax.scipy.linalg as jsl
    x_ref = np.asarray(jsl.cho_solve((jnp.asarray(l_ref), True), rhs))
    x = np.asarray(bc.blocked_solve_chol(l, wd, rhs))
    np.testing.assert_allclose(x, x_ref, rtol=2e-3, atol=2e-3)

    w_ref = np.asarray(jax.lax.linalg.triangular_solve(
        jnp.asarray(l_ref),
        jnp.broadcast_to(jnp.eye(384, dtype=jnp.float32), l_ref.shape),
        left_side=True, lower=True))
    w = np.asarray(bc.blocked_linv(l, wd))
    np.testing.assert_allclose(w, w_ref, rtol=2e-3, atol=2e-3)


def test_blocked_chol_env_switch_fit_equivalence(monkeypatch):
    """fit_ongpis + linv_from_chol through the blocked path == native on a
    real masked cluster-GP system."""
    from gpismap_tpu.ops import gp

    rng = np.random.default_rng(5)
    b, m, d = 2, 128, 2
    x = rng.uniform(-1, 1, (b, m, d)).astype(np.float32)
    g = rng.normal(size=(b, m, d)).astype(np.float32)
    g /= np.linalg.norm(g, axis=-1, keepdims=True)
    val = np.full((b, m), -0.2, np.float32)
    sig = np.full((b, m), 0.05, np.float32)
    valid = rng.uniform(size=(b, m)) > 0.3

    def fit():
        st = gp.fit_ongpis(jnp.asarray(x), jnp.asarray(g), jnp.asarray(val),
                           jnp.asarray(sig), jnp.asarray(sig),
                           jnp.asarray(valid), 0.2)
        return np.asarray(st.alpha), np.asarray(gp.linv_from_chol(st.l))

    monkeypatch.setenv("GPISMAP_BLOCKED_CHOL", "0")
    a_ref, w_ref = fit()
    monkeypatch.setenv("GPISMAP_BLOCKED_CHOL", "1")
    a_bl, w_bl = fit()
    np.testing.assert_allclose(a_bl, a_ref, rtol=5e-3, atol=5e-3)
    np.testing.assert_allclose(w_bl, w_ref, rtol=5e-3, atol=5e-3)


def test_blocked_chol_panel_widths(monkeypatch):
    """The panelized base cases are PW-invariant: every supported panel
    width produces the same factorization (GPISMAP_CHOL_PW tunes the
    sequential-depth/body-size trade on TPU; numerics must not move)."""
    import importlib

    from gpismap_tpu.ops import blocked_chol as bc

    rng = np.random.default_rng(11)
    k = _spd_batch(rng, 2, 256)
    l_ref = np.asarray(jnp.linalg.cholesky(k))
    for pw in (4, 8, 16):
        monkeypatch.setattr(bc, "PW", pw)
        l, wd = jax.jit(bc.blocked_factor)(k)
        np.testing.assert_allclose(np.asarray(l), l_ref, rtol=2e-4,
                                   atol=2e-4, err_msg=f"PW={pw}")
        w = np.asarray(bc.blocked_linv(l, wd))
        eye = np.einsum('bij,bjk->bik', np.asarray(l, np.float64),
                        np.asarray(w, np.float64))
        np.testing.assert_allclose(
            eye, np.broadcast_to(np.eye(256), eye.shape), atol=5e-4,
            err_msg=f"PW={pw}")


def test_blocked_base_small_gpou_equivalence(monkeypatch):
    """fit_gpou + linv_from_chol at the ObsGP cell size (M=64, below the
    128-block threshold) through the panelized base cases == native."""
    from gpismap_tpu.ops import gp

    rng = np.random.default_rng(7)
    b, m = 8, 64
    x = rng.uniform(-0.3, 0.3, (b, m, 2)).astype(np.float32)
    f = rng.uniform(0.3, 2.0, (b, m)).astype(np.float32)
    valid = rng.uniform(size=(b, m)) > 0.4
    valid[0] = False                     # fully-masked group

    def fit():
        st = gp.fit_gpou(jnp.asarray(x), jnp.asarray(f),
                         jnp.asarray(valid), 0.5, 0.01)
        return (np.asarray(st.alpha), np.asarray(st.l),
                np.asarray(gp.linv_from_chol(st.l)),
                np.asarray(st.trained))

    monkeypatch.setenv("GPISMAP_BLOCKED_CHOL", "0")
    a_ref, l_ref, w_ref, t_ref = fit()
    monkeypatch.setenv("GPISMAP_BLOCKED_CHOL", "1")
    a_bl, l_bl, w_bl, t_bl = fit()
    np.testing.assert_array_equal(t_bl, t_ref)
    np.testing.assert_allclose(l_bl, l_ref, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(a_bl, a_ref, rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(w_bl, w_ref, rtol=1e-3, atol=1e-3)


def test_map_test_pallas_path_matches_xla(monkeypatch):
    """The full map_test Pallas branch — tile plan, in-kernel skip of
    padding tiles, and the ONE packed result scatter — must match the
    XLA path end-to-end (interpret mode on CPU; covers the packed
    [f, vf, g, vg] scatter layout, not just the kernel)."""
    import functools

    import jax.numpy as jnp
    import numpy as np

    from gpismap_tpu.models import cluster
    from gpismap_tpu.ops import pallas_tile
    from test_parallel import _circle_map

    monkeypatch.setattr(
        pallas_tile, "tile_eval_pallas",
        functools.partial(pallas_tile.tile_eval_pallas, interpret=True))

    store, grid, kw = _circle_map()
    rng = np.random.default_rng(11)
    q = jnp.asarray(rng.uniform(-3, 3, (256, 2)), jnp.float32)
    ref = cluster.map_test(store, grid, q, use_pallas=False, **kw)
    out = cluster.map_test(store, grid, q, use_pallas=True, **kw)
    for a, b, name in zip(ref[:4], out[:4], ("f", "g", "vf", "vg")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-5, err_msg=name)
