"""Batched Cholesky + lower-triangular inverse as Pallas TPU kernels.

The update loop's dominant device cost is fitting many medium cluster GPs:
jnp.linalg.cholesky at [B, MP, MP] with MP = M(1+D) in {384, 1280} — the
batched form of the reference's per-cell Eigen llt (GPisMap.cpp:574-594).
XLA's batched Cholesky reaches well under 1% of MXU peak at these shapes
(tools/fit_breakdown.py), because it vectorizes a scalar recursion over the
batch through HBM. Here each program keeps a chunk of matrices resident in
VMEM and runs a 128-blocked right-looking factorization: panel updates are
MXU matmuls; the 128-wide base case is a sublane-friendly column recursion
(dynamic sublane reads, one-hot lane writes — lane-dynamic indexing is the
expensive direction on TPU).

`linv_pallas` is the matching blocked forward-substitution inverse used by
the test path's factor-cache fill (models/cluster._factorize_cells).

Equivalence vs the XLA reference path is gated in interpret mode by
tests/test_pallas.py; numerics differ only in f32 rounding order (the same
class of deviation as XLA-vs-Eigen, PARITY.md).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NB = 128          # block size: MXU native tile


def _onehot_lane(j, n, dtype):
    """[1, n] one-hot along the lane dimension (2D iota: TPU requirement)."""
    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
    return (lanes == j).astype(dtype)


_BMM = (((2,), (1,)), ((0,), (0,)))     # [C,a,k] @ [C,k,b] -> [C,a,b]


def _row(mat, oh):
    """Row j of every matrix in [C, n, n] as a one-hot contraction [C, n].
    Mosaic has no dynamic_slice on VALUES (and only parses full 3D batched
    matmuls), so all dynamic indexing in the base cases is one-hot
    batched-matmul contractions."""
    c, n, _ = mat.shape
    ohc = jnp.broadcast_to(oh[None], (c, 1, n))            # [C, 1, n]
    return jax.lax.dot_general(ohc, mat, _BMM,
                               preferred_element_type=jnp.float32)[:, 0, :]


def _chol_base(d):
    """Unblocked Cholesky of [C, NB, NB] SPD blocks, vectorized over C.

    Column recursion: row j of the symmetric input stands in for column j;
    reads are one-hot contractions, the column write is a one-hot
    outer-product accumulate (no lane-dynamic stores).
    """
    c, n, _ = d.shape
    rows = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)  # lane ids

    def body(j, l):
        oh = _onehot_lane(j, n, d.dtype)                   # [1, n]
        lrow_j = _row(l, oh)
        # s_i = sum_k L[i,k] L[j,k]; columns >= j of l are still zero
        s = jax.lax.dot_general(l, lrow_j[:, :, None], _BMM,
                                preferred_element_type=jnp.float32)[..., 0]
        drow_j = _row(d, oh)
        djj = jnp.sum(drow_j * oh, axis=-1)                # [C]
        sjj = jnp.sum(s * oh, axis=-1)
        ljj = jnp.sqrt(jnp.maximum(djj - sjj, 1e-30))
        col = (drow_j - s) / ljj[:, None]
        below = (rows > j).astype(d.dtype)                 # strict lower
        col = col * below + ljj[:, None] * oh
        return l + col[:, :, None] * oh[None]              # write column j

    return jax.lax.fori_loop(0, n, body, jnp.zeros_like(d))


def _inv_lower_base(l):
    """W = L^-1 for [C, NB, NB] lower-triangular blocks (row recursion,
    one-hot indexing throughout)."""
    c, n, _ = l.shape

    def body(i, w):
        oh = _onehot_lane(i, n, l.dtype)
        lrow = _row(l, oh)
        lii = jnp.sum(lrow * oh, axis=-1)                  # [C]
        # acc_j = sum_k L[i,k] W[k,j]; rows >= i of w are still zero
        acc = jax.lax.dot_general(lrow[:, None, :], w, _BMM,
                                  preferred_element_type=jnp.float32)[:, 0]
        wrow = (oh - acc) / lii[:, None]
        return w + oh[None].swapaxes(1, 2) * wrow[:, None, :]  # write row i

    return jax.lax.fori_loop(0, n, body, jnp.zeros_like(l))


def _chol_kernel(a_ref, l_ref):
    """Blocked right-looking Cholesky of one VMEM-resident [C, MP, MP]
    chunk. Panels ride the MXU; diagonal blocks use _chol_base."""
    mp = a_ref.shape[-1]
    nb = mp // NB

    def _abt(a, b):                     # batched A @ B^T (Mosaic-safe dims)
        return jax.lax.dot_general(a, jnp.swapaxes(b, 1, 2), _BMM,
                                   preferred_element_type=jnp.float32)

    l_ref[:] = jnp.zeros_like(l_ref)
    for kb in range(nb):
        ko = kb * NB
        d = a_ref[:, ko:ko + NB, ko:ko + NB]
        if kb:
            p = l_ref[:, ko:ko + NB, :ko]
            d = d - _abt(p, p)
        lkk = _chol_base(d)
        l_ref[:, ko:ko + NB, ko:ko + NB] = lkk
        if kb < nb - 1:
            wkk = _inv_lower_base(lkk)
            b = a_ref[:, ko + NB:, ko:ko + NB]
            if kb:
                b = b - _abt(l_ref[:, ko + NB:, :ko],
                             l_ref[:, ko:ko + NB, :ko])
            # L[i,k] = B inv(Lkk)^T
            l_ref[:, ko + NB:, ko:ko + NB] = _abt(b, wkk)


def _linv_kernel(l_ref, w_ref):
    """Blocked forward-substitution inverse of one [C, MP, MP] chunk of
    lower-triangular factors: W L = I."""
    mp = l_ref.shape[-1]
    nb = mp // NB
    dn_nt = _BMM                          # batched A @ B

    w_ref[:] = jnp.zeros_like(w_ref)
    # diagonal inverses first
    for ib in range(nb):
        o = ib * NB
        w_ref[:, o:o + NB, o:o + NB] = _inv_lower_base(
            l_ref[:, o:o + NB, o:o + NB])
    # below-diagonal blocks, column block by column block
    for kb in range(nb):
        ko = kb * NB
        for ib in range(kb + 1, nb):
            io = ib * NB
            # S = sum_{j=kb..ib-1} L[ib,j] W[j,kb]
            s = jax.lax.dot_general(
                l_ref[:, io:io + NB, ko:io],
                w_ref[:, ko:io, ko:ko + NB], dn_nt,
                preferred_element_type=jnp.float32)
            w_ref[:, io:io + NB, ko:ko + NB] = -jax.lax.dot_general(
                w_ref[:, io:io + NB, io:io + NB], s, dn_nt,
                preferred_element_type=jnp.float32)


def _chunk(b, mp):
    """Matrices per program: the pallas pipeline double-buffers grid
    blocks, so in+out chunks must stay within ~half of the 16 MB VMEM."""
    per = 2 * mp * mp * 4
    c = max(1, (5 << 20) // per)
    while b % c:
        c -= 1
    return c


@functools.partial(jax.jit, static_argnames=("interpret",))
def chol_pallas(k: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """Batched lower Cholesky factor of SPD k [B, MP, MP] (MP % 128 == 0).

    Drop-in for jnp.linalg.cholesky on the cluster-GP fit path
    (ops/gp.fit_ongpis); strict upper triangle returned as exact zeros.
    """
    b, mp, _ = k.shape
    c = _chunk(b, mp)
    return pl.pallas_call(
        _chol_kernel,
        out_shape=jax.ShapeDtypeStruct(k.shape, k.dtype),
        grid=(b // c,),
        in_specs=[pl.BlockSpec((c, mp, mp), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((c, mp, mp), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(k)


@functools.partial(jax.jit, static_argnames=("interpret",))
def linv_pallas(l: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """Batched L^-1 of lower-triangular l [B, MP, MP] (MP % 128 == 0).

    Drop-in for the triangular-solve-vs-identity in ops/gp.linv_from_chol
    (the test path's factor-cache fill)."""
    b, mp, _ = l.shape
    c = _chunk(b, mp)
    return pl.pallas_call(
        _linv_kernel,
        out_shape=jax.ShapeDtypeStruct(l.shape, l.dtype),
        grid=(b // c,),
        in_specs=[pl.BlockSpec((c, mp, mp), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((c, mp, mp), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(l)
