"""Pallas TPU kernel for the segmented cluster-GP tile evaluation.

The map query's hot loop evaluates tiles of T query points against their
cluster's GP: build the Matern-3/2 cross-covariance K* [M', T*(1+D)],
mean = alpha^T K*, variance cols = const - ||L^-1 K*||^2. The XLA scan
version pays ~1 ms of per-step overhead; this kernel runs ONE grid step
per tile with the cell's L^-1 block selected by scalar-prefetch indexing
(Pallas double-buffers the HBM->VMEM DMA pipeline automatically), keeping
the big matmul on the MXU.

Block-shape constraints (last two dims divisible by (8, 128) or equal to
the array dims) dictate the layouts:
  linv  [S, MP, MP]        block (1, MP, MP)
  xt    [S, D, M]          block (1, D, M)   (axis-major positions)
  alpha [S, MP, 1]         block (1, MP, 1)  (column vector)
  gf/vl [S, M, 1]          block (1, M, 1)   (column masks)
  qt    [NT, D, T]         block (1, D, T)
  f/vf  [NT, 1, T]         block (1, 1, T)
  g/vg  [NT, D, T]         block (1, D, T)

Numerical parity: identical formulas to ops/kernels.py and
models/cluster._ongpis_eval_tile (validated to ~1e-6).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SQRT3 = 1.7320508075688772


def _make_kernel(d, n_panels, bf16=False):
    def kernel(seg_ref, hyp_ref, linv_ref, xt_ref, alpha_ref, gf_ref,
               vl_ref, qt_ref, f_ref, g_ref, vf_ref, vg_ref, ks_ref):
        # hyperparameters live in SMEM (hyp = [scale, val_const,
        # grad_const]) so they are runtime values, not compile-time
        # constants — scale changes don't recompile and stay traceable
        a = _SQRT3 / hyp_ref[0]
        val_const = hyp_ref[1]
        grad_const = hyp_ref[2]
        # grid = (tiles, panels); the L^-1 row-panel is the only input
        # blocked along the panel axis. ks is built once per tile (panel 0)
        # into VMEM scratch and reused; variance accumulates across panels
        # into the revisited output blocks.
        t = qt_ref.shape[-1]
        i = pl.program_id(0)
        p = pl.program_id(1)
        # inactive tiles (seg < 0: static padding past n_tiles) skip all
        # compute; their output blocks hold garbage and are dropped by the
        # caller's masked scatter
        active = seg_ref[i] >= 0

        @pl.when(active & (p == 0))
        def _build():
            diffs = [xt_ref[0, i, :][:, None] - qt_ref[0, i, :][None, :]
                     for i in range(d)]                   # d x [M, T]
            r2 = diffs[0] * diffs[0]
            for i in range(1, d):
                r2 = r2 + diffs[i] * diffs[i]
            r = jnp.sqrt(r2)
            e = jnp.exp(-a * r)
            kf = (1.0 + a * r) * e
            inv_r = jnp.where(r > 0, 1.0 / jnp.where(r > 0, r, 1.0), 0.0)
            kf1 = [(a * a) * diffs[i] * e for i in range(d)]

            valid = vl_ref[0, :, :]                       # [M, 1]
            gmask = gf_ref[0, :, :] * valid               # [M, 1]

            rows = [jnp.concatenate([kf] + kf1, axis=1) * valid]
            for i in range(d):
                grow = [-kf1[i]]
                for j in range(d):
                    delta = 1.0 if i == j else 0.0
                    grow.append(
                        (a * a)
                        * (delta - a * diffs[i] * diffs[j] * inv_r) * e)
                rows.append(jnp.concatenate(grow, axis=1) * gmask)
            ks = jnp.concatenate(rows, axis=0)            # [MP, T*(1+d)]
            ks_ref[:] = ks

            alpha = alpha_ref[0, :, :]                    # [MP, 1]
            res = jnp.sum(ks * alpha, axis=0)             # [T*(1+d)]
            f_ref[0, 0, :] = res[:t]
            vf_ref[0, 0, :] = jnp.full((t,), val_const, jnp.float32)
            for i in range(d):
                g_ref[0, i, :] = res[(1 + i) * t:(2 + i) * t]
                vg_ref[0, i, :] = jnp.full((t,), grad_const, jnp.float32)

        @pl.when(active)
        def _variance():
            if bf16:
                # bf16 multiplicands, f32 accumulation: the MXU's native
                # rate (f32 passes run at ~1/4 of it). Relative variance
                # error ~1e-3 — opt-in via GPISMAP_PALLAS_BF16, parity-
                # gated (tests/test_pallas.py)
                v = jnp.dot(linv_ref[0].astype(jnp.bfloat16),
                            ks_ref[:].astype(jnp.bfloat16),
                            preferred_element_type=jnp.float32)
            else:
                v = jnp.dot(linv_ref[0], ks_ref[:],
                            preferred_element_type=jnp.float32)
            vs = jnp.sum(v * v, axis=0)                   # [T(1+d)]
            vf_ref[0, 0, :] = vf_ref[0, 0, :] - vs[:t]
            for j in range(d):
                vg_ref[0, j, :] = (vg_ref[0, j, :]
                                   - vs[(1 + j) * t:(2 + j) * t])

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("d", "interpret", "panel_override", "bf16"))
def tile_eval_pallas(tile_seg: jnp.ndarray, linv_buf: jnp.ndarray,
                     xt_cells: jnp.ndarray, alpha_cells: jnp.ndarray,
                     gradflag_cells: jnp.ndarray, valid_cells: jnp.ndarray,
                     qt_tiles: jnp.ndarray, d: int, scale,
                     val_const, grad_const,
                     interpret: bool = False,
                     panel_override: int | None = None,
                     bf16: bool = False):
    """Evaluate all tiles; per-tile cell blocks selected by scalar-prefetch.

    tile_seg:   [NT] int32 compact cell index per tile; -1 = inactive tile
                (skipped entirely — output block left as garbage)
    linv_buf:   [S, MP, MP]
    xt_cells:   [S, D, M] axis-major support positions
    alpha_cells:[S, MP] (reshaped internally to [S, MP, 1])
    gradflag_cells/valid_cells: [S, M] float32 0/1 (reshaped to [S, M, 1])
    qt_tiles:   [NT, D, T] axis-major tile queries
    scale/val_const/grad_const: runtime scalars (traced; SMEM in-kernel)

    Returns (f [NT, T], g_t [NT, D, T], vf [NT, T], vg_t [NT, D, T]).
    """
    nt = qt_tiles.shape[0]
    t = qt_tiles.shape[-1]
    s, mp, _ = linv_buf.shape
    m = xt_cells.shape[-1]

    # row-panel the factor so its block fits VMEM (3D: MP = 1280)
    panel = panel_override or (mp if mp <= 512 else 256)
    n_panels = mp // panel
    assert panel * n_panels == mp

    alpha3 = alpha_cells[..., None]
    gf3 = gradflag_cells[..., None]
    vl3 = valid_cells[..., None]
    hyp = jnp.stack([jnp.asarray(scale, jnp.float32),
                     jnp.asarray(val_const, jnp.float32),
                     jnp.asarray(grad_const, jnp.float32)])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nt, n_panels),
        in_specs=[
            # inactive tiles (seg -1) read block 0 (cheap, never computed on)
            pl.BlockSpec((1, panel, mp),
                         lambda i, p, seg, h: (jnp.maximum(seg[i], 0), p, 0)),
            pl.BlockSpec((1, d, m),
                         lambda i, p, seg, h: (jnp.maximum(seg[i], 0), 0, 0)),
            pl.BlockSpec((1, mp, 1),
                         lambda i, p, seg, h: (jnp.maximum(seg[i], 0), 0, 0)),
            pl.BlockSpec((1, m, 1),
                         lambda i, p, seg, h: (jnp.maximum(seg[i], 0), 0, 0)),
            pl.BlockSpec((1, m, 1),
                         lambda i, p, seg, h: (jnp.maximum(seg[i], 0), 0, 0)),
            pl.BlockSpec((1, d, t), lambda i, p, seg, h: (i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, t), lambda i, p, seg, h: (i, 0, 0)),
            pl.BlockSpec((1, d, t), lambda i, p, seg, h: (i, 0, 0)),
            pl.BlockSpec((1, 1, t), lambda i, p, seg, h: (i, 0, 0)),
            pl.BlockSpec((1, d, t), lambda i, p, seg, h: (i, 0, 0)),
        ],
        scratch_shapes=[pltpu.VMEM((mp, t * (1 + d)), jnp.float32)],
    )

    f, g, vf, vg = pl.pallas_call(
        _make_kernel(d, n_panels, bf16=bf16),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((nt, 1, t), jnp.float32),
            jax.ShapeDtypeStruct((nt, d, t), jnp.float32),
            jax.ShapeDtypeStruct((nt, 1, t), jnp.float32),
            jax.ShapeDtypeStruct((nt, d, t), jnp.float32),
        ],
        interpret=interpret,
    )(tile_seg, hyp, linv_buf, xt_cells, alpha3, gf3, vl3, qt_tiles)
    return f[:, 0, :], g, vf[:, 0, :], vg
