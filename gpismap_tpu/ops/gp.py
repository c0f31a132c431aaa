"""Batched masked GP fit / posterior for the two GP families.

 - GPou: tiny OU-kernel regressor used by the observation GPs
   (reference: cpp/src/ObsGP.cpp:32-62)
 - OnGPIS: Matern-3/2 SDF GP with gradient observations, one per cluster
   cell (reference: cpp/src/OnGPIS.cpp)

Everything is expressed as capacity-padded batches: [B, M, ...] with a
`valid` mask. Cholesky + triangular solves run batched through XLA (MXU);
padded rows are identity-masked by the kernel builders (see ops/kernels.py)
so the factorization of the padded system is exact.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.lax.linalg import triangular_solve

from . import kernels


def _use_pallas_chol(mp: int) -> bool:
    """GPISMAP_PALLAS_CHOL=1 routes factorizations through the Pallas
    kernels (ops/pallas_chol.py). OFF by default: measured SLOWER than XLA
    at production shapes (its grid serializes the base-case recursion per
    VMEM chunk — see ops/blocked_chol.py, the approach that works)."""
    import os
    if os.environ.get("GPISMAP_PALLAS_CHOL") not in ("1", "on"):
        return False
    return mp % 128 == 0 and 0 < mp <= 512


def _use_blocked_chol(mp: int) -> bool:
    """Route factorization/solves through the 128-blocked pure-JAX path
    (ops/blocked_chol.py): batch-vectorized base case + MXU panels; ~MP/128
    sequential block steps per solve instead of MP. Default: TPU only
    (keeps CPU golden numerics bit-stable); GPISMAP_BLOCKED_CHOL=0/1
    overrides."""
    import os
    v = os.environ.get("GPISMAP_BLOCKED_CHOL", "auto")
    if v in ("0", "off"):
        return False
    if mp % 128 or mp == 0:
        return False
    if v in ("1", "on"):
        return True
    return jax.default_backend() == "tpu"


def _use_blocked_base(n: int) -> bool:
    """Small-matrix (n <= 128) panelized base cases for shapes the
    128-blocked path can't take (the ObsGP cell size 64). Same gate and
    rationale as _use_blocked_chol: XLA's native cholesky/triangular
    solve pay per-column sequential latency; the PW-wide panel recursion
    vectorized over the batch pays n/PW loop steps for the whole batch."""
    import os
    v = os.environ.get("GPISMAP_BLOCKED_CHOL", "auto")
    if v in ("0", "off"):
        return False
    from .blocked_chol import PW
    if n == 0 or n > 128 or n % PW:
        return False
    if v in ("1", "on"):
        return True
    return jax.default_backend() == "tpu"


def _chol(k: jnp.ndarray) -> jnp.ndarray:
    if k.ndim == 3 and _use_pallas_chol(k.shape[-1]):
        from .pallas_chol import chol_pallas
        return chol_pallas(k, interpret=jax.default_backend() != "tpu")
    if k.ndim == 3 and _use_blocked_chol(k.shape[-1]):
        from .blocked_chol import blocked_factor
        return blocked_factor(k)[0]
    if k.ndim == 3 and _use_blocked_base(k.shape[-1]):
        from .blocked_chol import _chol_base
        return _chol_base(k)
    return jnp.linalg.cholesky(k)


def _solve_lower(l: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """L^-1 b with L lower triangular; batched."""
    return triangular_solve(l, b, left_side=True, lower=True,
                            transpose_a=False)


def _solve_chol(l: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(L L^T)^-1 b; batched (the two solveInPlace calls, ObsGP.cpp:43-44)."""
    y = _solve_lower(l, b)
    return triangular_solve(l, y, left_side=True, lower=True,
                            transpose_a=True)


class GPouState(NamedTuple):
    """Batched trained GPou groups (ObsGP.cpp:32-48)."""

    x: jnp.ndarray        # [B, M, D] inputs
    valid: jnp.ndarray    # [B, M] bool
    l: jnp.ndarray        # [B, M, M] Cholesky factor
    alpha: jnp.ndarray    # [B, M]
    trained: jnp.ndarray  # [B] bool — group has >0 samples


def fit_gpou(x: jnp.ndarray, f: jnp.ndarray, valid: jnp.ndarray,
             scale: float, noise: float) -> GPouState:
    """Train a batch of GPou units (reference: ObsGP.cpp:32-48).

    x: [B, M, D], f: [B, M], valid: [B, M].
    """
    f = jnp.where(valid, f, 0.0)
    k = kernels.ou_train_cov(x, noise, valid, scale)
    l = _chol(k)
    if l.ndim == 3 and _use_blocked_base(l.shape[-1]) \
            and not _use_blocked_chol(l.shape[-1]):
        # alpha through the explicit inverse: W^T (W f). The obs fit's
        # callers need W = L^-1 anyway (linv_from_chol) — XLA CSEs the
        # two _inv_base computations inside one program, so the
        # latency-bound native triangular solves vanish entirely.
        w = linv_from_chol(l)
        y = jnp.einsum('bmn,bn->bm', w, f, precision='highest')
        alpha = jnp.einsum('bnm,bn->bm', w, y, precision='highest')
    else:
        alpha = _solve_chol(l, f[..., None])[..., 0]
    return GPouState(x=x, valid=valid, l=l, alpha=alpha,
                     trained=jnp.any(valid, axis=-1))


def gpou_test(state: GPouState, xt: jnp.ndarray, scale: float, noise: float):
    """Posterior mean/variance at xt [B, Q, D] (reference: ObsGP.cpp:50-62).

    Returns (mean [B, Q], var [B, Q]); var = 1 + noise - sum((L^-1 k*)^2).
    """
    ks = kernels.ou_cross_cov(state.x, state.valid, xt, scale)  # [B, M, Q]
    mean = jnp.einsum('...mq,...m->...q', ks, state.alpha)
    v = _solve_lower(state.l, ks)
    var = 1.0 + noise - jnp.sum(v * v, axis=-2)
    return mean, var


def linv_from_chol(l: jnp.ndarray) -> jnp.ndarray:
    """Explicit L^-1 from a (masked) Cholesky factor.

    Turning the per-query triangular solve of the reference
    (ObsGP.cpp:56-59) into one precomputed inverse + per-query matvecs keeps
    the test path pure-matmul (MXU) instead of many tiny solves, while the
    variance ||L^-1 k||^2 stays the reference's numerically-stable form
    (better conditioned than k^T K^-1 k with an explicit K^-1).
    """
    m = l.shape[-1]
    if l.ndim == 3 and _use_pallas_chol(m):
        from .pallas_chol import linv_pallas
        return linv_pallas(l, interpret=jax.default_backend() != "tpu")
    if l.ndim == 3 and _use_blocked_chol(m):
        from .blocked_chol import NB, _inv_base, blocked_linv
        wd = jnp.stack([_inv_base(l[:, o:o + NB, o:o + NB])
                        for o in range(0, m, NB)], axis=1)
        return blocked_linv(l, wd)
    if l.ndim == 3 and _use_blocked_base(m):
        from .blocked_chol import _inv_base
        return _inv_base(l)
    eye = jnp.broadcast_to(jnp.eye(m, dtype=l.dtype), l.shape)
    return triangular_solve(l, eye, left_side=True, lower=True)


def gpou_posterior_gather(x: jnp.ndarray, alpha: jnp.ndarray,
                          linv: jnp.ndarray, valid: jnp.ndarray,
                          trained: jnp.ndarray, cell_idx: jnp.ndarray,
                          q: jnp.ndarray, scale: float, noise: float,
                          chunk: int = 4096):
    """Evaluate many single-point GPou posteriors, one (small) GP per query.

    This is the TPU equivalent of the reference's threaded per-point group
    lookup + GPou::test (ObsGP.cpp:352-463): each query gathers its group's
    state and evaluates mean/var with batched matvecs, chunked to bound the
    gather footprint.

    x:        [S, M, D] per-group inputs
    alpha:    [S, M]
    linv:     [S, M, M] precomputed L^-1 (see linv_from_chol)
    valid:    [S, M]
    trained:  [S] bool
    cell_idx: [Q] int32 group id per query (clipped to [0, S))
    q:        [Q, D]
    Returns (mean [Q], var [Q]); untrained groups give (0, 1e6) matching the
    reference sentinel (ObsGP.cpp:161,363).
    """
    nq = q.shape[0]
    pad = (-nq) % chunk
    cell_p = jnp.concatenate([cell_idx, jnp.zeros(pad, cell_idx.dtype)])
    q_p = jnp.concatenate([q, jnp.zeros((pad,) + q.shape[1:], q.dtype)])
    cell_p = cell_p.reshape(-1, chunk)
    q_p = q_p.reshape(-1, chunk, q.shape[-1])

    def eval_chunk(args):
        ci, qc = args
        xs = x[ci]                     # [C, M, D]
        al = alpha[ci]
        li = linv[ci]
        vl = valid[ci]
        diff = xs - qc[:, None, :]
        r = jnp.sqrt(jnp.sum(diff * diff, axis=-1))
        ks = jnp.where(vl, jnp.exp(-r / scale), 0.0)   # [C, M]
        mean = jnp.sum(ks * al, axis=-1)
        v = jnp.einsum('cmn,cn->cm', li, ks)           # L^-1 k*
        var = 1.0 + noise - jnp.sum(v * v, axis=-1)
        tr = trained[ci]
        return jnp.where(tr, mean, 0.0), jnp.where(tr, var, 1e6)

    mean, var = jax.lax.map(eval_chunk, (cell_p, q_p))
    return mean.reshape(-1)[:nq], var.reshape(-1)[:nq]


class OnGPISState(NamedTuple):
    """Batched trained cluster GPs (OnGPIS.cpp:34-149)."""

    x: jnp.ndarray         # [B, M, D]
    valid: jnp.ndarray     # [B, M] bool
    gradflag: jnp.ndarray  # [B, M] bool
    l: jnp.ndarray         # [B, M*(1+D), M*(1+D)]
    alpha: jnp.ndarray     # [B, M*(1+D)]
    trained: jnp.ndarray   # [B]


def ongpis_prepare(grad: jnp.ndarray, sigx: jnp.ndarray,
                   siggrad: jnp.ndarray, valid: jnp.ndarray):
    """Gradient-validity rule (reference: OnGPIS.cpp:63-65,122-124).

    A node contributes gradient rows unless its gradient noise exceeds
    0.1001 or its gradient is (numerically) zero; such nodes get value
    noise bumped to 2.0.
    Returns (gradflag [B, M] bool, sigx_adjusted [B, M]).
    """
    no_grad = (siggrad > 0.1001) | jnp.all(jnp.abs(grad) < 1e-6, axis=-1)
    gradflag = valid & (~no_grad)
    sigx = jnp.where(valid & no_grad, 2.0, sigx)
    return gradflag, sigx


def fit_ongpis(x: jnp.ndarray, grad: jnp.ndarray, val: jnp.ndarray,
               sigx: jnp.ndarray, siggrad: jnp.ndarray, valid: jnp.ndarray,
               scale: float) -> OnGPISState:
    """Train a batch of cluster SDF GPs (reference: OnGPIS.cpp:34-89).

    x: [B, M, D] node positions; grad: [B, M, D] unit normals;
    val: [B, M] SDF targets (-fbias at surface hits); sigx/siggrad: [B, M]
    noises; valid: [B, M].
    Target layout y = [f; gx; gy(; gz)] (OnGPIS.cpp:75-76,135-136) with
    masked rows set to 0.
    """
    d = x.shape[-1]
    gradflag, sigx = ongpis_prepare(grad, sigx, siggrad, valid)
    k = kernels.matern32_deriv_train_cov(x, sigx, siggrad, gradflag, valid,
                                         scale)
    gmaskf = gradflag.astype(x.dtype)
    y = jnp.concatenate(
        [jnp.where(valid, val, 0.0)]
        + [grad[..., i] * gmaskf for i in range(d)], axis=-1)
    mp = k.shape[-1]
    if _use_blocked_chol(mp) and not _use_pallas_chol(mp):
        from .blocked_chol import blocked_factor, blocked_solve_chol
        l, wd = blocked_factor(k)
        alpha = blocked_solve_chol(l, wd, y[..., None])[..., 0]
    else:
        l = _chol(k)
        alpha = _solve_chol(l, y[..., None])[..., 0]
    return OnGPISState(x=x, valid=valid, gradflag=gradflag, l=l, alpha=alpha,
                       trained=jnp.any(valid, axis=-1))


def ongpis_test(state: OnGPISState, xt: jnp.ndarray, scale: float,
                val_const: float, grad_const: float):
    """Posterior SDF value/gradient + variances at xt [B, Q, D].

    Parity: OnGPIS.cpp:218-263 (test2Dpoint: val_const=1.01,
    grad_const=3/l^2+0.1) and :177-216 (testSinglePoint 3D branch:
    val_const=1.001, grad_const=3/l^2+0.001).

    Returns (f [B, Q], grad [B, Q, D], varf [B, Q], vargrad [B, Q, D]).
    """
    d = xt.shape[-1]
    q = xt.shape[-2]
    ks = kernels.matern32_deriv_cross_cov(state.x, state.gradflag,
                                          state.valid, xt, scale)
    res = jnp.einsum('...mq,...m->...q', ks, state.alpha)  # [B, (1+D)Q]
    f = res[..., :q]
    grad = jnp.stack([res[..., (1 + i) * q:(2 + i) * q] for i in range(d)],
                     axis=-1)
    v = _solve_lower(state.l, ks)
    vsum = jnp.sum(v * v, axis=-2)
    varf = val_const - vsum[..., :q]
    vargrad = jnp.stack(
        [grad_const - vsum[..., (1 + i) * q:(2 + i) * q] for i in range(d)],
        axis=-1)
    return f, grad, varf, vargrad
