"""Isosurface extraction sanity (marching tetrahedra)."""
import numpy as np

from gpismap_tpu.viz import marching_tetrahedra


def test_sphere_isosurface():
    n = 20
    xs = np.linspace(-1.3, 1.3, n)
    x, y, z = np.meshgrid(xs, xs, xs, indexing="ij")
    f = np.sqrt(x * x + y * y + z * z) - 1.0
    sp = (xs[1] - xs[0],) * 3
    verts, faces = marching_tetrahedra(f, 0.0, spacing=sp,
                                       origin=(xs[0],) * 3)
    assert len(verts) > 500
    assert len(faces) > 1000
    r = np.linalg.norm(verts, axis=1)
    assert abs(r.mean() - 1.0) < 0.02
    assert r.std() < 0.02
    assert faces.max() < len(verts)


def test_empty_and_nan_fields():
    f = np.full((4, 4, 4), 1.0)
    v, fc = marching_tetrahedra(f, 0.0)
    assert len(v) == 0 and len(fc) == 0
    f[1, 1, 1] = np.nan
    v, fc = marching_tetrahedra(f, 0.0)
    assert len(v) == 0
    f = np.full((4, 4, 4), 1.0)
    f[1:3, 1:3, 1:3] = -1.0
    v, fc = marching_tetrahedra(f, 0.0)
    assert len(v) > 0
