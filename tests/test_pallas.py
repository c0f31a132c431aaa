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

