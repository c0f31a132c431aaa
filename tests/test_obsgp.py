"""Partitioned observation GP vs a naive per-group oracle that follows the
reference partition rules literally (ObsGP.cpp:85-187, :204-463)."""
import numpy as np
import jax.numpy as jnp

from gpismap_tpu.config import OBSGP_1D, OBSGP_2D
from gpismap_tpu.models import obsgp
from naive_oracle import gpou_fit_test

RNG = np.random.default_rng(3)


def naive_obsgp1d(theta, f, q, p):
    """Literal transcription of the 1D partition + lookup logic."""
    n = len(theta)
    gs, ov = p.group_size, p.overlap
    n_group = n // gs + 1
    groups = []        # (x, f) slices
    rng = [theta[0]]
    nn = 0
    while nn < n_group - 1:
        if nn < n_group - 2:
            i1 = nn * gs
            i2 = i1 + gs + ov
            rng.append(theta[i2 - ov // 2])
            groups.append((theta[i1:i1 + gs + ov], f[i1:i1 + gs + ov]))
        else:
            i1 = nn * gs
            i2 = i1 + (n - i1) // 2 + ov
            rng.append(theta[i2 - ov // 2])
            groups.append((theta[i1:i2 + 1], f[i1:i2 + 1]))
            nn += 1
            i1b = i1 + (n - i1) // 2
            i2b = n - 1
            rng.append(theta[i2b])
            groups.append((theta[i1b:i2b + 1], f[i1b:i2b + 1]))
        nn += 1
    mean = np.zeros(len(q))
    var = np.full(len(q), 1e6)
    if n_group < 2:
        return mean, var
    liml, limr = rng[0] + p.margin, rng[-1] - p.margin
    for k, x in enumerate(q):
        if x < liml or x > limr:
            continue
        for j in range(len(rng) - 1):
            if rng[j] < x < rng[j + 1]:
                gx, gf = groups[j]
                m, v = gpou_fit_test(gx[:, None], gf, p.scale, p.noise,
                                     np.array([[x]]))
                mean[k], var[k] = m[0], v[0]
                break
    return mean, var


def test_obsgp1d_matches_naive():
    n = 67
    theta = np.sort(RNG.uniform(-2, 2, n))
    f = np.sin(theta) + 0.05 * RNG.normal(size=n)
    q = RNG.uniform(-2.2, 2.2, 200)

    m_ref, v_ref = naive_obsgp1d(theta, f, q, OBSGP_1D)

    st = obsgp.fit_obsgp1d(jnp.asarray(theta, jnp.float32),
                           jnp.asarray(f, jnp.float32),
                           jnp.ones(n, bool), OBSGP_1D)
    m, v = obsgp.obsgp1d_test(st, jnp.asarray(q, jnp.float32), OBSGP_1D,
                              chunk=64)
    m, v = np.asarray(m), np.asarray(v)
    inval_ref = v_ref >= 1e5
    inval = v >= 1e5
    np.testing.assert_array_equal(inval, inval_ref)
    ok = ~inval
    np.testing.assert_allclose(m[ok], m_ref[ok], rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(v[ok], v_ref[ok], rtol=2e-3, atol=2e-3)


def test_obsgp1d_with_invalid_beams():
    n = 80
    theta = np.sort(RNG.uniform(-2, 2, n))
    f = np.cos(theta)
    valid = RNG.uniform(size=n) > 0.3
    q = RNG.uniform(-2, 2, 50)

    m_ref, v_ref = naive_obsgp1d(theta[valid], f[valid], q, OBSGP_1D)
    st = obsgp.fit_obsgp1d(jnp.asarray(theta, jnp.float32),
                           jnp.asarray(f, jnp.float32),
                           jnp.asarray(valid), OBSGP_1D)
    m, v = obsgp.obsgp1d_test(st, jnp.asarray(q, jnp.float32), OBSGP_1D,
                              chunk=64)
    m, v = np.asarray(m), np.asarray(v)
    np.testing.assert_array_equal(v >= 1e5, v_ref >= 1e5)
    ok = v < 1e5
    np.testing.assert_allclose(m[ok], m_ref[ok], rtol=2e-3, atol=2e-3)


def test_obsgp1d_too_few_samples():
    # n < group_size -> nGroup == 1 -> nothing trained (ObsGP.cpp:91-139)
    n = 12
    theta = np.sort(RNG.uniform(-1, 1, n))
    st = obsgp.fit_obsgp1d(jnp.asarray(theta, jnp.float32),
                           jnp.ones(n, jnp.float32), jnp.ones(n, bool),
                           OBSGP_1D)
    m, v = obsgp.obsgp1d_test(st, jnp.asarray(theta, jnp.float32), OBSGP_1D,
                              chunk=16)
    assert np.all(np.asarray(v) >= 1e5)


def naive_obsgp2d(vc, uc, f, q, p):
    """Literal 2D partition + per-cell GPou (ObsGP.cpp:204-463)."""
    ni, nj = len(vc), len(uc)
    gs, ov = p.group_size, p.overlap
    ng0 = (ni - ov) // gs + 1
    ng1 = (nj - ov) // gs + 1
    val_i = [vc[0]] + [vc[g * gs + gs + ov - 1 - ov // 2]
                       if g < ng0 - 1 else vc[ni - 1] for g in range(ng0)]
    val_j = [uc[0]] + [uc[g * gs + gs + ov - 1 - ov // 2]
                       if g < ng1 - 1 else uc[nj - 1] for g in range(ng1)]
    cells = {}
    for a in range(ng0):
        i0, i1 = a * gs, (a * gs + gs + ov - 1) if a < ng0 - 1 else ni - 1
        for b in range(ng1):
            j0, j1 = b * gs, (b * gs + gs + ov - 1) if b < ng1 - 1 else nj - 1
            xs, fs = [], []
            for i in range(i0, i1 + 1):
                for j in range(j0, j1 + 1):
                    if f[i, j] > 0:
                        xs.append([vc[i], uc[j]])
                        fs.append(f[i, j])
            if xs:
                cells[(a, b)] = (np.array(xs), np.array(fs))
    mean = np.zeros(len(q))
    var = np.full(len(q), 1e6)
    for k, (v, u) in enumerate(q):
        if (v < val_i[0] + p.margin or v > val_i[-1] - p.margin
                or u < val_j[0] + p.margin or u > val_j[-1] - p.margin):
            continue
        a = 0
        for t in val_i[1:]:
            if v < t:
                break
            a += 1
        b = 0
        for t in val_j[1:]:
            if u < t:
                break
            b += 1
        a, b = min(a, ng0 - 1), min(b, ng1 - 1)
        if (a, b) in cells:
            xs, fs = cells[(a, b)]
            m_, v_ = gpou_fit_test(xs, fs, p.scale, p.noise,
                                   np.array([[v, u]]))
            mean[k], var[k] = m_[0], v_[0]
    return mean, var


def test_obsgp2d_matches_naive():
    ni, nj = 18, 23
    vc = np.linspace(-0.4, 0.4, ni)
    uc = np.linspace(-0.5, 0.5, nj)
    f = 1.0 + 0.2 * RNG.normal(size=(ni, nj))
    f[RNG.uniform(size=(ni, nj)) < 0.3] = -1.0   # invalid pixels
    q = np.stack([RNG.uniform(-0.45, 0.45, 300),
                  RNG.uniform(-0.55, 0.55, 300)], -1)

    m_ref, v_ref = naive_obsgp2d(vc, uc, f, q, OBSGP_2D)
    st = obsgp.fit_obsgp2d(jnp.asarray(vc, jnp.float32),
                           jnp.asarray(uc, jnp.float32),
                           jnp.asarray(f, jnp.float32), OBSGP_2D)
    m, v = obsgp.obsgp2d_test(st, jnp.asarray(q, jnp.float32), OBSGP_2D,
                              chunk=128)
    m, v = np.asarray(m), np.asarray(v)
    np.testing.assert_array_equal(v >= 1e5, v_ref >= 1e5)
    ok = v < 1e5
    np.testing.assert_allclose(m[ok], m_ref[ok], rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(v[ok], v_ref[ok], rtol=2e-3, atol=2e-3)
