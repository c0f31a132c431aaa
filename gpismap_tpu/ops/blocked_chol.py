"""128-blocked batched Cholesky / solves / inverse in pure JAX.

XLA's native jnp.linalg.cholesky and triangular_solve are latency-bound at
the cluster-GP shapes ([B, MP, MP], MP in {384, 1280}): ~5.5 ms and
~3.2 ms at B=64/MP=384 regardless of batch (tools/fit_breakdown.py) —
they dominate the 2D device update budget (BASELINE.md device table).

This module restructures the same math so the sequential depth is paid
ONCE for the whole batch:

  * the diagonal-block recursions (128-wide Cholesky + triangular inverse)
    run vectorized over [B, 128, 128] — 128 steps of batch-wide VPU work
    instead of XLA's per-column internal loops;
  * every panel/Schur update and every solve step is a large batched
    matmul on the MXU;
  * solves use the precomputed diagonal-block inverses, so a triangular
    solve is MP/128 sequential block steps (3 in 2D) instead of MP.

The Pallas variant of this idea (ops/pallas_chol.py) measured SLOWER than
XLA because its grid serializes the base-case recursion per VMEM chunk;
keeping the blocking at the XLA level lets the batch dimension carry the
parallelism. Numerics: same factorization, f32 rounding differs from the
native op by O(1e-3) on production systems — gated to TPU by default
(GPISMAP_BLOCKED_CHOL=0/1 overrides), CPU golden paths stay bit-stable.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

NB = 128

def _ein(spec, *ops):
    """All contractions at HIGHEST precision: TPU default f32 matmuls run
    as single-pass bf16, which is too loose for factorizing
    ill-conditioned kernel matrices (the native cholesky op computes in
    full f32 internally). The matmuls are a minor cost here — the win of
    this module is latency structure, not matmul throughput."""
    return jnp.einsum(spec, *ops, precision='highest')



import os as _os

# Base-case panel width (sequential loop steps = n / PW). 16 measured
# best on TPU v5e (8/16/32 sweep with queue-draining scalar-pull timing,
# tools/pw_sweep.py 2026-08-21: 2D retrain 4.98/3.80/3.79 ms, 3D
# 11.36/9.70/9.57 — 32 buys nothing over 16 and doubles the unrolled
# body). GPISMAP_CHOL_PW overrides for tuning. Read ONCE at import (the
# base cases close over it as a static trip count); set before import.
PW = int(_os.environ.get("GPISMAP_CHOL_PW", "16"))
if not (1 <= PW <= 128) or 128 % PW != 0:
    raise ValueError(
        f"GPISMAP_CHOL_PW={PW} invalid: the base cases run over 128-wide "
        "diagonal blocks in n/PW panel steps, so PW must divide 128 "
        "(1,2,4,8,16,32,64,128); other values silently leave trailing "
        "columns unfactorized.")


def _chol_base(d):
    """Batched unblocked Cholesky of SPD [B, n, n], vectorized over the
    batch, panelized over columns: n/PW loop steps, each computing a
    PW-wide column panel (cross terms from finished columns in one batched
    matmul; the within-panel recursion unrolled inside the body). The
    sequential *loop* depth — the latency driver on TPU, where each while
    iteration costs ~10 us of overhead — drops PW-fold vs a per-column
    recursion."""
    b, n, _ = d.shape
    lanes = jnp.arange(n)[None, :]

    def body(p, l):
        j = p * PW
        # rows j..j+PW of L so far (columns < j finished; rest zero)
        lrows = jax.lax.dynamic_slice_in_dim(l, j, PW, axis=1)  # [B,PW,n]
        s = _ein('bik,bpk->bip', l, lrows)                      # [B,n,PW]
        dcols = jax.lax.dynamic_slice_in_dim(d, j, PW, axis=2)  # [B,n,PW]
        r = dcols - s
        cols = []
        for t in range(PW):
            c = j + t
            rc = r[:, :, t]
            if cols:
                prev = jnp.stack(cols, axis=2)               # [B,n,t]
                at_c = jax.lax.dynamic_slice_in_dim(prev, c, 1,
                                                    axis=1)[:, 0]  # [B,t]
                rc = rc - _ein('bnt,bt->bn', prev, at_c)
            dc = jax.lax.dynamic_slice_in_dim(rc, c, 1, axis=1)[:, 0]
            ljj = jnp.sqrt(jnp.maximum(dc, 1e-30))
            col = rc / ljj[:, None]
            col = jnp.where(lanes > c, col, 0.0) \
                + jnp.where(lanes == c, ljj[:, None], 0.0)
            cols.append(col)
        panel = jnp.stack(cols, axis=2)                      # [B,n,PW]
        return jax.lax.dynamic_update_slice_in_dim(l, panel, j, axis=2)

    # n <= 64 (the ObsGP cell size): fully unroll — constant-index slices
    # fuse far better than the fori_loop's dynamic ones (measured 13.7 ->
    # 6.1 ms at [3072,64,64], tools/pw_sweep.py). At n == 128 (the
    # blocked-path diagonal blocks) unrolling measured ~1.6x SLOWER —
    # keep the loop there.
    if n <= 64:
        l = jnp.zeros_like(d)
        for p in range(n // PW):
            l = body(p, l)
        return l
    return jax.lax.fori_loop(0, n // PW, body, jnp.zeros_like(d))


def _inv_base(l):
    """Batched W = L^-1 of lower-triangular [B, n, n] (row recursion,
    panelized like _chol_base: n/PW loop steps)."""
    b, n, _ = l.shape
    lanes = jnp.arange(n)[None, :]

    def body(p, w):
        j = p * PW
        lrows = jax.lax.dynamic_slice_in_dim(l, j, PW, axis=1)  # [B,PW,n]
        acc = _ein('bpk,bkj->bpj', lrows, w)                    # [B,PW,n]
        rows = []
        for t in range(PW):
            i = j + t
            a = acc[:, t]
            if rows:
                prev = jnp.stack(rows, axis=1)               # [B,t,n]
                lrow = lrows[:, t]                           # [B,n]
                lin = jax.lax.dynamic_slice_in_dim(lrow, j, PW,
                                                   axis=1)[:, :t]  # [B,t]
                a = a + _ein('bt,btj->bj', lin, prev)
            lii = jax.lax.dynamic_slice_in_dim(lrows[:, t], i, 1,
                                               axis=1)
            e = (lanes == i).astype(l.dtype)
            rows.append((e - a) / lii)
        panel = jnp.stack(rows, axis=1)                      # [B,PW,n]
        return jax.lax.dynamic_update_slice_in_dim(w, panel, j, axis=1)

    if n <= 64:                               # see _chol_base
        w = jnp.zeros_like(l)
        for p in range(n // PW):
            w = body(p, w)
        return w
    return jax.lax.fori_loop(0, n // PW, body, jnp.zeros_like(l))


def blocked_factor(k: jnp.ndarray):
    """L, Wdiag for SPD k [B, MP, MP] (MP % 128 == 0).

    L is the lower Cholesky factor (exact zeros above the diagonal);
    Wdiag [B, nb, 128, 128] holds inv(L_kk) per diagonal block — the
    reusable ingredient of the blocked solves/inverse below."""
    b, mp, _ = k.shape
    nb = mp // NB
    l = jnp.zeros_like(k)
    wd = []
    for kb in range(nb):
        o = kb * NB
        d = k[:, o:o + NB, o:o + NB]
        if kb:
            p = l[:, o:o + NB, :o]
            d = d - _ein('bik,bjk->bij', p, p)
        lkk = _chol_base(d)
        wkk = _inv_base(lkk)
        wd.append(wkk)
        l = l.at[:, o:o + NB, o:o + NB].set(lkk)
        if kb < nb - 1:
            t = k[:, o + NB:, o:o + NB]
            if kb:
                t = t - _ein('bik,bjk->bij', l[:, o + NB:, :o],
                                   l[:, o:o + NB, :o])
            l = l.at[:, o + NB:, o:o + NB].set(
                _ein('bik,bjk->bij', t, wkk))
    return l, jnp.stack(wd, axis=1)


def blocked_solve_lower(l, wdiag, rhs):
    """y = L^-1 rhs, rhs [B, MP, R] — nb sequential block steps, each an
    MXU matmul against the precomputed diagonal inverses."""
    mp = l.shape[-1]
    nb = mp // NB
    ys = []
    for kb in range(nb):
        o = kb * NB
        t = rhs[:, o:o + NB]
        if kb:
            yprev = jnp.concatenate(ys, axis=1)
            t = t - _ein('bij,bjr->bir', l[:, o:o + NB, :o], yprev)
        ys.append(_ein('bij,bjr->bir', wdiag[:, kb], t))
    return jnp.concatenate(ys, axis=1)


def blocked_solve_upper_t(l, wdiag, rhs):
    """x = L^-T rhs — the backward half of the cho_solve pair."""
    mp = l.shape[-1]
    nb = mp // NB
    xs = [None] * nb
    for kb in reversed(range(nb)):
        o = kb * NB
        t = rhs[:, o:o + NB]
        if kb < nb - 1:
            xnext = jnp.concatenate(xs[kb + 1:], axis=1)
            # (L^T)[kb, j>kb] = L[j>kb, kb]^T
            t = t - _ein('bji,bjr->bir', l[:, o + NB:, o:o + NB],
                               xnext)
        xs[kb] = _ein('bji,bjr->bir', wdiag[:, kb], t)
    return jnp.concatenate(xs, axis=1)


def blocked_solve_chol(l, wdiag, rhs):
    """(L L^T)^-1 rhs (the two solveInPlace calls, ObsGP.cpp:43-44)."""
    return blocked_solve_upper_t(l, wdiag, blocked_solve_lower(
        l, wdiag, rhs))


def blocked_linv(l, wdiag):
    """Full W = L^-1 [B, MP, MP]: pure block matmuls (no recursion beyond
    what blocked_factor already paid) — replaces the latency-bound
    triangular_solve-vs-identity of the factor-cache fill."""
    b, mp, _ = l.shape
    nb = mp // NB
    w = jnp.zeros_like(l)
    for kb in range(nb):
        o = kb * NB
        w = w.at[:, o:o + NB, o:o + NB].set(wdiag[:, kb])
    for kb in range(nb):            # column block
        ko = kb * NB
        for ib in range(kb + 1, nb):  # row blocks below, top to bottom
            io = ib * NB
            s = _ein('bik,bkj->bij', l[:, io:io + NB, ko:io],
                           w[:, ko:io, ko:ko + NB])
            w = w.at[:, io:io + NB, ko:ko + NB].set(
                -_ein('bik,bkj->bij', wdiag[:, ib], s))
    return w
