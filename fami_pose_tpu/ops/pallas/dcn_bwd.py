"""Fused Pallas backward kernel for the windowed modulated deformable conv.

The training bottleneck: differentiating the scan-based
``deform_conv2d_windowed`` through ``jax.vjp`` costs ~160 ms per DCN at
FAMI-Pose scale (~80% of the train step). This kernel computes all five
gradients in one pass over the same window structure as the forward:

  out(p, co) = sum_k W_k[c, co] * m_k(p, g) * S_k(p, c)
  S_k(p, c)  = sum_{dy, dx} haty(ty-dy) hatx(tx-dx) x(p + base_k + (dy, dx), c)

  dW_k   = (m * S)_k^T @ gout            (per-tap MXU matmul, grid-accumulated)
  dbias  = sum_p gout                    (computed in XLA outside)
  dcol_k = gout @ W_k^T
  dmask  = sum_cg S * dcol
  dty    = sum_{d} haty' hatx (sum_cg x_s * dcol) * m     (clip subgradient)
  dtx    = symmetric
  dx(q)  = sum_k sum_d [haty hatx m dcol]_k(q - base_k - d)   (shift adjoint)

Layout identical to the forward kernels (flat row-per-128-lane tiles,
group-minor channels). offsets/mask/gout are staged ONCE as row+lane
zero-padded whole images shared by BOTH kernels (full-image BlockSpecs, the
same pattern the forward kernel uses for ``x``): the dx adjoint reads its
halo rows out of the padded image directly (zero dcol in the pad rows kills
any pad-row weight contribution), which replaces the earlier per-row-block
halo *duplication* (2x the rows re-materialized in HBM per array) plus a
second no-halo block copy for the fwd-side kernel — about 60% of the
backward's staging traffic.

Verified against ``jax.vjp(deform_conv2d_windowed)`` in tests.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


def _bwd_fwdside_kernel(
    x_ref, off_ref, msk_ref, w_ref, g_ref, doff_ref, dmsk_ref, dw_ref,
    *, kh, kw, dil, pad, d_max, groups, cg, tr, c_in, c_out, margin,
):
    """dW / dmask / doffset: block-rows only (no halos).

    Both window loops run the TIGHT support 2D+1 (same proof as the forward
    v3 kernel, ops/pallas/dcn.py:_dcn_kernel_v3): with the clamped offset in
    [-D, D], the hat weight at the D+1 cell is identically zero (hat(-1) = 0
    at the boundary) and so is its derivative factor (|u| >= 1 kills the
    (|u| < 1) gate), so the dropped iteration contributed exact zeros to
    every accumulator — bit-identical output, (2D+1)^2/(2D+2)^2 of the work.

    off/msk/gout refs are the row+lane padded WHOLE images (shared with the
    dx kernel); this kernel slices its block rows at ``margin + row0``.
    """
    s_win = 2 * d_max + 1
    row0 = pl.program_id(1) * tr
    trwp = tr * LANE
    base = (margin + row0) * LANE

    first = (pl.program_id(0) == 0) & (pl.program_id(1) == 0)

    @pl.when(first)
    def _():
        dw_ref[...] = jnp.zeros_like(dw_ref)

    gout_blk = g_ref[0, :, pl.ds(base, trwp)].astype(jnp.float32)  # (Co, TRWP)

    for a in range(kh):
        for b in range(kw):
            t = a * kw + b
            sy0 = a * dil - pad
            sx0 = b * dil - pad

            dcol = jax.lax.dot_general(
                w_ref[t], gout_blk,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (C, TRWP)
            dcol3 = dcol.reshape(cg, groups, trwp)

            ty_raw = off_ref[
                0, (t * 2 + 0) * groups : (t * 2 + 1) * groups,
                pl.ds(base, trwp),
            ].astype(jnp.float32)
            tx_raw = off_ref[
                0, (t * 2 + 1) * groups : (t * 2 + 2) * groups,
                pl.ds(base, trwp),
            ].astype(jnp.float32)
            ty = jnp.clip(ty_raw, -d_max, d_max)
            tx = jnp.clip(tx_raw, -d_max, d_max)
            m = msk_ref[
                0, t * groups : (t + 1) * groups, pl.ds(base, trwp)
            ].astype(jnp.float32)

            def body(dyi, carry):
                s_acc, dmsk_acc, dty_acc, dtx_acc = carry
                dy = dyi - d_max
                uy = ty - dy.astype(jnp.float32)
                wy = jnp.maximum(0.0, 1.0 - jnp.abs(uy))
                dhaty = -jnp.sign(uy) * (jnp.abs(uy) < 1.0)

                row_start = (margin + row0 + sy0 + dy) * LANE
                xrow = x_ref[0, :, pl.ds(row_start, trwp)]

                for dxi in range(s_win):
                    dx_ = dxi - d_max
                    sx = sx0 + dx_
                    ux = tx - dx_
                    wx = jnp.maximum(0.0, 1.0 - jnp.abs(ux))
                    dhatx = -jnp.sign(ux) * (jnp.abs(ux) < 1.0)
                    w2 = wy * wx
                    xs = pltpu.roll(xrow, (-sx) % trwp, axis=1)
                    xs3 = xs.reshape(cg, groups, trwp)
                    s_acc = s_acc + xs3 * w2[None]
                    common = jnp.sum(xs3 * dcol3, axis=0)
                    dmsk_acc = dmsk_acc + w2 * common
                    dty_acc = dty_acc + dhaty * wx * common * m
                    dtx_acc = dtx_acc + wy * dhatx * common * m
                return (s_acc, dmsk_acc, dty_acc, dtx_acc)

            init = (
                jnp.zeros((cg, groups, trwp), jnp.float32),
                jnp.zeros((groups, trwp), jnp.float32),
                jnp.zeros((groups, trwp), jnp.float32),
                jnp.zeros((groups, trwp), jnp.float32),
            )
            s_acc, dmsk_acc, dty_acc, dtx_acc = jax.lax.fori_loop(
                0, s_win, body, init
            )

            col = (s_acc * m[None]).reshape(c_in, trwp)
            dw_ref[t] += jax.lax.dot_general(
                col, gout_blk,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

            dty_final = dty_acc * (
                (ty_raw >= -d_max) & (ty_raw <= d_max)
            ).astype(jnp.float32)
            dtx_final = dtx_acc * (
                (tx_raw >= -d_max) & (tx_raw <= d_max)
            ).astype(jnp.float32)
            doff_ref[0, (t * 2 + 0) * groups : (t * 2 + 1) * groups, :] = (
                dty_final.astype(doff_ref.dtype)
            )
            doff_ref[0, (t * 2 + 1) * groups : (t * 2 + 2) * groups, :] = (
                dtx_final.astype(doff_ref.dtype)
            )
            dmsk_ref[0, t * groups : (t + 1) * groups, :] = dmsk_acc.astype(
                dmsk_ref.dtype
            )


def _bwd_fwdside_kernel_v9(
    x_ref, off_ref, msk_ref, w_ref, g_ref, doff_ref, dmsk_ref, dw_ref,
    *, kh, kw, dil, pad, d_max, groups, cg, tr, c_in, c_out, margin,
):
    """Strip-rolled dW/dmask/doffset (the v9 forward algebra applied to the
    backward, VERDICT r3 #4).

    The baseline kernel rolls the x row-window once per support cell —
    ``kh*kw*(2D+1)^2`` whole-block rolls. Here ONE slice pulls the strip of
    rows this block can touch and each distinct horizontal displacement
    ``sx = b*dil - pad + dx`` is ONE whole-strip roll (2(pad+D)+1 total,
    hoisted out of every loop); every (tap, dy, dx) contribution is then a
    *static* row-slice of a rolled strip. The wrap-around rows/lanes only
    touch discarded margin columns (|sx| <= pad+D < margin, the same v2/v9
    invariant). Per-cell math is identical to the baseline up to f32
    re-association (the accumulation order is sx-grouped instead of
    dy-major), so gradients match within test tolerance, not bitwise.
    """
    row0 = pl.program_id(1) * tr
    trwp = tr * LANE
    base = (margin + row0) * LANE
    k = kh * kw
    win = list(range(-d_max, d_max + 1))

    first = (pl.program_id(0) == 0) & (pl.program_id(1) == 0)

    @pl.when(first)
    def _():
        dw_ref[...] = jnp.zeros_like(dw_ref)

    gout_blk = g_ref[0, :, pl.ds(base, trwp)].astype(jnp.float32)  # (Co, TRWP)

    tys, txs, ty_raws, tx_raws, ms, dcols = [], [], [], [], [], []
    for t in range(k):
        ty_raw = off_ref[
            0, (t * 2 + 0) * groups : (t * 2 + 1) * groups, pl.ds(base, trwp)
        ].astype(jnp.float32)
        tx_raw = off_ref[
            0, (t * 2 + 1) * groups : (t * 2 + 2) * groups, pl.ds(base, trwp)
        ].astype(jnp.float32)
        ty_raws.append(ty_raw)
        tx_raws.append(tx_raw)
        tys.append(jnp.clip(ty_raw, -d_max, d_max))
        txs.append(jnp.clip(tx_raw, -d_max, d_max))
        ms.append(
            msk_ref[
                0, t * groups : (t + 1) * groups, pl.ds(base, trwp)
            ].astype(jnp.float32)
        )
        dcols.append(
            jax.lax.dot_general(
                w_ref[t], gout_blk,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).reshape(cg, groups, trwp)
        )

    s_accs = [jnp.zeros((cg, groups, trwp), jnp.float32) for _ in range(k)]
    dmsk_accs = [jnp.zeros((groups, trwp), jnp.float32) for _ in range(k)]
    dty_accs = [jnp.zeros((groups, trwp), jnp.float32) for _ in range(k)]
    dtx_accs = [jnp.zeros((groups, trwp), jnp.float32) for _ in range(k)]

    sr = tr + (kh - 1) * dil + 2 * d_max  # strip rows this block touches
    srwp = sr * LANE
    sbase = margin + row0 - pad - d_max
    xwin = x_ref[0, :, pl.ds(sbase * LANE, srwp)]

    for sx in range(-pad - d_max, (kw - 1) * dil - pad + d_max + 1):
        users = [
            (b, sx - (b * dil - pad))
            for b in range(kw)
            if abs(sx - (b * dil - pad)) <= d_max
        ]
        if not users:
            continue
        xs = pltpu.roll(xwin, (-sx) % srwp, axis=1)
        for b, dx_ in users:
            for a in range(kh):
                t = a * kw + b
                ux = txs[t] - dx_
                wx = jnp.maximum(0.0, 1.0 - jnp.abs(ux))
                dhatx = -jnp.sign(ux) * (jnp.abs(ux) < 1.0)
                for dy in win:
                    # output row r samples strip row r + a*dil + dy + d_max
                    r0 = (a * dil + dy + d_max) * LANE
                    xs3 = xs[:, r0 : r0 + trwp].reshape(cg, groups, trwp)
                    uy = tys[t] - dy
                    wy = jnp.maximum(0.0, 1.0 - jnp.abs(uy))
                    dhaty = -jnp.sign(uy) * (jnp.abs(uy) < 1.0)
                    w2 = wy * wx
                    s_accs[t] = s_accs[t] + xs3 * w2[None]
                    common = jnp.sum(xs3 * dcols[t], axis=0)  # (G, TRWP)
                    cm = common * ms[t]
                    dmsk_accs[t] = dmsk_accs[t] + w2 * common
                    dty_accs[t] = dty_accs[t] + dhaty * wx * cm
                    dtx_accs[t] = dtx_accs[t] + wy * dhatx * cm

    for t in range(k):
        col = (s_accs[t] * ms[t][None]).reshape(c_in, trwp)
        dw_ref[t] += jax.lax.dot_general(
            col, gout_blk,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dty_final = dty_accs[t] * (
            (ty_raws[t] >= -d_max) & (ty_raws[t] <= d_max)
        ).astype(jnp.float32)
        dtx_final = dtx_accs[t] * (
            (tx_raws[t] >= -d_max) & (tx_raws[t] <= d_max)
        ).astype(jnp.float32)
        doff_ref[0, (t * 2 + 0) * groups : (t * 2 + 1) * groups, :] = (
            dty_final.astype(doff_ref.dtype)
        )
        doff_ref[0, (t * 2 + 1) * groups : (t * 2 + 2) * groups, :] = (
            dtx_final.astype(doff_ref.dtype)
        )
        dmsk_ref[0, t * groups : (t + 1) * groups, :] = dmsk_accs[t].astype(
            dmsk_ref.dtype
        )


def _bwd_dx_kernel(
    off_ref, msk_ref, w_ref, g_ref, dx_ref, bscratch_ref,
    *, kh, kw, dil, pad, d_max, groups, cg, tr, c_in, c_out, margin,
):
    """dx shift-adjoint: needs halo rows of gout/offsets/mask, not x.

    dx(q) = sum_{k, d} [wy wx m dcol]_k(q - s), s = base_k + d. The row part
    of the shift is a (dy-dependent) lane-aligned slice of per-tap-staged
    dcol and of the offset/mask REFS; the sub-tile column part is one roll
    of the final product — no per-term scratch round-trips.

    off/msk/gout refs are the row+lane padded whole images (shared with the
    fwd-side kernel): the halo rows this block needs are simply phys rows
    ``[row0, row0 + tr + 2*margin)`` of the padded image, so no duplicated
    halo staging exists in HBM.

    Tight 2D+1 window on both loops (see _bwd_fwdside_kernel docstring):
    wy/wx vanish identically at the D+1 cell, so dropping it is bit-exact.
    """
    s_win = 2 * d_max + 1
    row0 = pl.program_id(1) * tr
    trwp = tr * LANE
    thw = (tr + 2 * margin) * LANE

    # this block's halo rows: phys [row0, row0 + tr + 2M) of the padded image
    gout_halo = g_ref[0, :, pl.ds(row0 * LANE, thw)].astype(jnp.float32)
    dx_acc = jnp.zeros((c_in, trwp), jnp.float32)
    for a in range(kh):
        for b in range(kw):
            t = a * kw + b
            sy0 = a * dil - pad
            sx0 = b * dil - pad

            # stage dcol for this tap ONCE (the only scratch write)
            bscratch_ref[...] = jax.lax.dot_general(
                w_ref[t], gout_halo,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (C, THW)

            def body(dyi, dxk):
                dy = dyi - d_max
                start = (margin - sy0 - dy) * LANE
                dcol_p = bscratch_ref[:, pl.ds(start, trwp)]
                dcol_p3 = dcol_p.reshape(cg, groups, trwp)
                ty_p = off_ref[
                    0, (t * 2 + 0) * groups : (t * 2 + 1) * groups,
                    pl.ds(row0 * LANE + start, trwp),
                ]
                tx_p = off_ref[
                    0, (t * 2 + 1) * groups : (t * 2 + 2) * groups,
                    pl.ds(row0 * LANE + start, trwp),
                ]
                m_p = msk_ref[
                    0, t * groups : (t + 1) * groups,
                    pl.ds(row0 * LANE + start, trwp),
                ].astype(jnp.float32)
                ty_p = jnp.clip(ty_p.astype(jnp.float32), -d_max, d_max)
                tx_p = jnp.clip(tx_p.astype(jnp.float32), -d_max, d_max)
                wy_p = jnp.maximum(
                    0.0, 1.0 - jnp.abs(ty_p - dy.astype(jnp.float32))
                ) * m_p  # (G, TRWP)
                for dxi in range(s_win):
                    dx_ = dxi - d_max
                    sx = sx0 + dx_
                    wx_p = jnp.maximum(0.0, 1.0 - jnp.abs(tx_p - dx_))
                    w2 = wy_p * wx_p
                    prod = (dcol_p3 * w2[None]).reshape(c_in, trwp)
                    dxk = dxk + pltpu.roll(prod, sx % trwp, axis=1)
                return dxk

            dx_acc = dx_acc + jax.lax.fori_loop(
                0, s_win, body, jnp.zeros((c_in, trwp), jnp.float32)
            )
    dx_ref[0] = dx_acc.astype(dx_ref.dtype)


def _bwd_dx_kernel_v9(
    off_ref, msk_ref, w_ref, g_ref, dx_ref, bscratch_ref,
    *, kh, kw, dil, pad, d_max, groups, cg, tr, c_in, c_out, margin,
):
    """Shift-adjoint dx with rolls grouped by horizontal displacement.

    The baseline rolls the (C, TRWP) product once per support cell —
    ``kh*kw*(2D+1)^2`` rolls (729 at D=4), and the roll is ~a third of each
    cell's work. The roll is linear, so all products sharing the same
    ``sx = b*dil - pad + dx`` are accumulated UNROLLED into one per-``sx``
    accumulator and rolled ONCE at the end: 2(pad+D)+1 rolls total. The row
    part of the shift stays a static slice of the per-tap-staged dcol (and
    of the padded offset/mask images), exactly like the baseline. Identical
    math up to f32 re-association (sx-grouped accumulation order).
    """
    row0 = pl.program_id(1) * tr
    trwp = tr * LANE
    thw = (tr + 2 * margin) * LANE
    win = list(range(-d_max, d_max + 1))
    sxs = sorted(
        {
            b * dil - pad + dx_
            for b in range(kw)
            for dx_ in win
        }
    )

    gout_halo = g_ref[0, :, pl.ds(row0 * LANE, thw)].astype(jnp.float32)
    accs = {sx: jnp.zeros((c_in, trwp), jnp.float32) for sx in sxs}

    for a in range(kh):
        for b in range(kw):
            t = a * kw + b
            sy0 = a * dil - pad
            sx0 = b * dil - pad

            # stage dcol for this tap ONCE (the only scratch write)
            bscratch_ref[...] = jax.lax.dot_general(
                w_ref[t], gout_halo,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (C, THW)

            for dy in win:
                start = (margin - sy0 - dy) * LANE
                dcol_p3 = bscratch_ref[:, start : start + trwp].reshape(
                    cg, groups, trwp
                )
                ty_p = off_ref[
                    0, (t * 2 + 0) * groups : (t * 2 + 1) * groups,
                    pl.ds(row0 * LANE + start, trwp),
                ]
                tx_p = off_ref[
                    0, (t * 2 + 1) * groups : (t * 2 + 2) * groups,
                    pl.ds(row0 * LANE + start, trwp),
                ]
                m_p = msk_ref[
                    0, t * groups : (t + 1) * groups,
                    pl.ds(row0 * LANE + start, trwp),
                ].astype(jnp.float32)
                ty_p = jnp.clip(ty_p.astype(jnp.float32), -d_max, d_max)
                tx_p = jnp.clip(tx_p.astype(jnp.float32), -d_max, d_max)
                wy_p = jnp.maximum(
                    0.0, 1.0 - jnp.abs(ty_p - float(dy))
                ) * m_p  # (G, TRWP)
                for dx_ in win:
                    wx_p = jnp.maximum(0.0, 1.0 - jnp.abs(tx_p - dx_))
                    w2 = wy_p * wx_p
                    prod = (dcol_p3 * w2[None]).reshape(c_in, trwp)
                    accs[sx0 + dx_] = accs[sx0 + dx_] + prod

    dx_acc = jnp.zeros((c_in, trwp), jnp.float32)
    for sx in sxs:
        dx_acc = dx_acc + pltpu.roll(accs[sx], sx % trwp, axis=1)
    dx_ref[0] = dx_acc.astype(dx_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("padding", "dilation", "offset_groups", "max_offset",
                     "row_block", "interpret", "aux_channel_first",
                     "kernel_version"),
)
def deform_conv2d_windowed_bwd_pallas(
    x, offset, mask, weight, gout, *, padding=3, dilation=3,
    offset_groups=12, max_offset=4, row_block=16, interpret=None,
    aux_channel_first: bool = False, kernel_version: int = 3,
):
    """Gradients (dx, doffset, dmask, dweight, dbias) of the windowed DCN.

    ``kernel_version``: 3 = the per-cell-roll baseline kernels, 9 = the
    strip-rolled / sx-grouped variants (one roll per distinct horizontal
    displacement instead of one per support cell; same math up to f32
    re-association).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    v9 = int(kernel_version) == 9
    n, h, w, c = x.shape
    kh, kw, wc, c_out = weight.shape
    k = kh * kw
    g = offset_groups
    cg = c // g
    d_max = int(max_offset)
    dil = int(dilation)
    pad = int(padding)
    margin = d_max + 1 + dil * (kh // 2)
    tr = int(row_block)
    assert h % tr == 0 and w + 2 * margin <= LANE
    pad_right = LANE - w - margin
    hp = h + 2 * margin + 1

    perm = np.arange(c).reshape(g, cg).T.reshape(-1)
    inv_perm = np.argsort(perm)

    x_pad = jnp.pad(
        x[..., perm].astype(jnp.float32),
        ((0, 0), (margin, margin + 1), (margin, pad_right), (0, 0)),
    )
    x_flat = x_pad.transpose(0, 3, 1, 2).reshape(n, c, hp * LANE)

    n_rb = h // tr
    thw_rows = tr + 2 * margin
    hp2 = h + 2 * margin  # shared row+lane padded staging height

    def stage_padded(arr, channels):
        """(N, ch, H, W) -> (N, ch, (H+2M)*LANE): ONE row+lane zero-pad per
        array, read by BOTH kernels as full-image blocks. Replaces the
        per-row-block halo duplication (2x rows rewritten to HBM) plus the
        fwd-side kernel's separate no-halo block copy. Arrays keep their
        input dtype (bf16 in the flagship model); the kernels convert
        per-tile."""
        a = jnp.pad(
            arr, ((0, 0), (0, 0), (margin, margin), (margin, pad_right))
        )  # (N, ch, H+2M, LANE)
        return a.reshape(n, channels, hp2 * LANE)

    if aux_channel_first:
        # offsets/mask already (N, 2GK/GK, H, W), kernel-major channel order
        off_r = offset
        msk_r = (
            jnp.ones((n, g * k, h, w), x.dtype) if mask is None else mask
        )
    else:
        off_r = offset.reshape(n, h, w, g, k, 2).transpose(0, 4, 5, 3, 1, 2)
        off_r = off_r.reshape(n, 2 * g * k, h, w)
        if mask is None:
            msk_r = jnp.ones((n, g * k, h, w), x.dtype)
        else:
            msk_r = (
                mask.reshape(n, h, w, g, k).transpose(0, 4, 3, 1, 2)
                .reshape(n, g * k, h, w)
            )
    off_p = stage_padded(off_r, 2 * g * k)
    msk_p = stage_padded(msk_r, g * k)
    gout_p = stage_padded(gout.transpose(0, 3, 1, 2), c_out)

    w_k = weight.reshape(k, c, c_out)[:, perm, :].astype(jnp.float32)

    common = dict(
        kh=kh, kw=kw, dil=dil, pad=pad, d_max=d_max, groups=g, cg=cg, tr=tr,
        c_in=c, c_out=c_out, margin=margin,
    )
    kernel_fwdside = functools.partial(
        _bwd_fwdside_kernel_v9 if v9 else _bwd_fwdside_kernel, **common
    )
    kernel_dx = functools.partial(
        _bwd_dx_kernel_v9 if v9 else _bwd_dx_kernel, **common
    )

    thw = thw_rows * LANE
    # full padded images in VMEM (~16 MB at C=96 with double-buffering)
    cparams = pltpu.CompilerParams(vmem_limit_bytes=48 * 1024 * 1024)
    doff_f, dmsk_f, dw = pl.pallas_call(
        kernel_fwdside,
        grid=(n, n_rb),
        in_specs=[
            pl.BlockSpec((1, c, hp * LANE), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * g * k, hp2 * LANE), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, g * k, hp2 * LANE), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c_out, hp2 * LANE), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 2 * g * k, tr * LANE), lambda b, i: (b, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, g * k, tr * LANE), lambda b, i: (b, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, c, c_out), lambda b, i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            # doff/dmask in the offset dtype (bf16 in the flagship): the
            # final grads are cast there anyway, and the f32 output blocks
            # were what pushed the tr=16 kernel over the VMEM limit
            jax.ShapeDtypeStruct((n, 2 * g * k, h * LANE), offset.dtype),
            jax.ShapeDtypeStruct((n, g * k, h * LANE), offset.dtype),
            jax.ShapeDtypeStruct((k, c, c_out), jnp.float32),
        ],
        interpret=bool(interpret),
        compiler_params=cparams,
    )(x_flat, off_p, msk_p, w_k, gout_p)

    dx_f = pl.pallas_call(
        kernel_dx,
        grid=(n, n_rb),
        in_specs=[
            pl.BlockSpec((1, 2 * g * k, hp2 * LANE), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, g * k, hp2 * LANE), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c_out, hp2 * LANE), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, c, tr * LANE), lambda b, i: (b, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, c, h * LANE), jnp.float32),
        scratch_shapes=[pltpu.VMEM((c, thw), jnp.float32)],
        interpret=bool(interpret),
        compiler_params=cparams,
    )(off_p, msk_p, w_k, gout_p)

    # un-stage: flat row tiles -> (N, H, W, ch)
    def unstage(flat, channels):
        out = flat.reshape(n, channels, h, LANE)[:, :, :, margin : margin + w]
        return out.transpose(0, 2, 3, 1)

    dx = unstage(dx_f, c)[..., inv_perm].astype(x.dtype)
    if aux_channel_first:
        # cotangents in the primal (N, ch, H, W) kernel-major layout:
        # just the lane un-pad, no transposes
        doff = (
            doff_f.reshape(n, 2 * g * k, h, LANE)[..., margin : margin + w]
            .astype(offset.dtype)
        )
        dmsk = (
            dmsk_f.reshape(n, g * k, h, LANE)[..., margin : margin + w]
            .astype(offset.dtype)
        )
    else:
        doff_r = unstage(doff_f, 2 * g * k)  # (N,H,W, [k][dyx][g])
        doff = (
            doff_r.reshape(n, h, w, k, 2, g).transpose(0, 1, 2, 5, 3, 4)
            .reshape(n, h, w, 2 * g * k).astype(offset.dtype)
        )
        dmsk_r = unstage(dmsk_f, g * k)  # [k][g]
        dmsk = (
            dmsk_r.reshape(n, h, w, k, g).transpose(0, 1, 2, 4, 3)
            .reshape(n, h, w, g * k).astype(offset.dtype)
        )
    dweight = dw[:, inv_perm, :].reshape(kh, kw, c, c_out).astype(weight.dtype)
    dbias = jnp.sum(gout.astype(jnp.float32), axis=(0, 1, 2)).astype(
        weight.dtype
    )
    return dx, doff, (None if mask is None else dmsk), dweight, dbias
