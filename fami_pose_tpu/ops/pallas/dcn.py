"""Fused Pallas TPU kernel for the modulated deformable convolution.

The centerpiece kernel (BASELINE.json: "fused Pallas bilinear-gather +
modulated-conv kernel"). Same bounded-offset semantics as
``ops.deform_conv.deform_conv2d_windowed`` — exact bilinear DCNv2 for
offsets within ``[-D, D]``, clamped beyond — but executed as ONE kernel:

  * the padded input image lives in VMEM for a whole batch element in a
    flat ``(C, Hp*128)`` layout: each image row is padded to exactly one
    128-lane tile, so a vertical displacement is a *lane-aligned* dynamic
    slice (``dy`` rows = ``dy*128`` lanes) and a horizontal displacement is
    a ``pltpu.roll`` whose wrap-around only ever touches the discarded
    margin columns;
  * hat-function bilinear weights and mask modulation run on the VPU over
    full 128-lane tiles (lanes = flattened spatial, sublanes = channels);
  * each kernel tap finishes with one MXU matmul ``W_k^T @ col_k`` into an
    f32 accumulator — nothing round-trips to HBM between the sampling and
    the convolution.

The XLA ``deform_conv2d_windowed`` (scan-based) computes the identical
function; it is the correctness reference in tests and provides the backward
pass (``make_deform_conv_fn`` wires a ``custom_vjp`` that differentiates
through it — exact, since both compute the same function).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


def _dcn_kernel(
    x_ref, off_ref, msk_ref, w_ref, o_ref, *, kh, kw, dil, pad,
    d_max, groups, cg, tr, c_in, c_out, margin,
):
    trwp = tr * LANE
    s_win = 2 * d_max + 2
    row0 = pl.program_id(1) * tr  # first output row of this block

    acc = jnp.zeros((c_out, trwp), jnp.float32)
    for a in range(kh):
        # per-tap offset fields for this kernel row (b = 0..kw-1)
        tys, txs, ms = [], [], []
        for b in range(kw):
            t = a * kw + b
            tys.append(
                jnp.clip(
                    off_ref[0, (t * 2 + 0) * groups : (t * 2 + 1) * groups, :]
                    .astype(jnp.float32),
                    -d_max, d_max,
                )
            )
            txs.append(
                jnp.clip(
                    off_ref[0, (t * 2 + 1) * groups : (t * 2 + 2) * groups, :]
                    .astype(jnp.float32),
                    -d_max, d_max,
                )
            )
            ms.append(
                msk_ref[0, t * groups : (t + 1) * groups, :]
                .astype(jnp.float32)
            )

        def body(dyi, cols):
            dy = dyi - d_max
            # one lane-aligned dynamic slice per (kernel row, dy), shared by
            # the kw taps of this row
            row_start = (margin + row0 + a * dil - pad + dy) * LANE
            xrow = x_ref[0, :, pl.ds(row_start, trwp)]
            # mask-modulated vertical hat weights per tap
            wys = [
                jnp.maximum(0.0, 1.0 - jnp.abs(tys[b] - dy.astype(jnp.float32)))
                * ms[b]
                for b in range(kw)
            ]
            new_cols = list(cols)
            # distinct horizontal shifts sx = b*dil - pad + dx; each roll is
            # shared by every tap whose (b, dx) lands on it
            for sx in range(-pad - d_max, (kw - 1) * dil - pad + d_max + 2):
                users = [
                    b for b in range(kw)
                    if -d_max <= sx - (b * dil - pad) <= d_max + 1
                ]
                if not users:
                    continue
                xs = pltpu.roll(xrow, (-sx) % trwp, axis=1)
                # sublane view (Cg, G, TRWP): group-minor channel order makes
                # the per-group weight a broadcast, no repeat copy needed
                xs3 = xs.reshape(cg, groups, trwp)
                for b in users:
                    dx = sx - (b * dil - pad)
                    wx = jnp.maximum(0.0, 1.0 - jnp.abs(txs[b] - dx))
                    w2 = wys[b] * wx  # (G, TRWP)
                    new_cols[b] = new_cols[b] + xs3 * w2[None]
            return tuple(new_cols)

        init = tuple(
            jnp.zeros((cg, groups, trwp), jnp.float32) for _ in range(kw)
        )
        cols = jax.lax.fori_loop(0, s_win, body, init)
        for b in range(kw):
            t = a * kw + b
            acc = acc + jax.lax.dot_general(
                w_ref[t].astype(jnp.float32),
                cols[b].reshape(c_in, trwp),
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    o_ref[0] = acc.astype(o_ref.dtype)


def _dcn_kernel_v4(
    x_ref, off_ref, msk_ref, w_ref, o_ref, *, kh, kw, dil, pad,
    d_max, groups, cg, tr, c_in, c_out, margin,
):
    """v3 with the per-output-pixel factors hoisted out of the window loop.

    The x-gathers must stay inside the vertical window loop (each ``dy``
    samples a different image row), but the fractional x-blend weight ``fx``
    and the modulation mask are per-*output*-pixel quantities independent of
    ``dy`` — so the two bilinear corner streams are accumulated separately
    inside the loop (one fused multiply-add each) and blended/modulated once
    per tap afterwards. Cuts the loop body from ``2 gathers + ~5`` to
    ``2 gathers + 2`` VPU ops, with identical math up to f32 re-association.
    """
    s_win = 2 * d_max + 2
    row0 = pl.program_id(1) * tr

    acc = jnp.zeros((c_out, tr * LANE), jnp.float32)
    col_iota = jax.lax.broadcasted_iota(jnp.int32, (c_in, LANE), 1)

    for a in range(kh):
        row_pieces = [[None] * tr for _ in range(kw)]
        for r in range(tr):
            # per-tap horizontal gather indices / fracs and y-window inputs
            idx0, fx_r, m_r, ty_r = [], [], [], []
            for b in range(kw):
                t = a * kw + b
                tx = off_ref[
                    0, (t * 2 + 1) * groups : (t * 2 + 2) * groups,
                    r * LANE : (r + 1) * LANE,
                ].astype(jnp.float32)
                tx = jnp.clip(tx, -d_max, d_max)
                x0 = jnp.floor(tx)
                fx = (tx - x0).astype(jnp.float32)
                x0c = pltpu.repeat(x0.astype(jnp.int32), cg, axis=0)
                idx0.append(
                    jnp.clip(col_iota + (b * dil - pad) + x0c, 0, LANE - 1)
                )
                fx_r.append(pltpu.repeat(fx, cg, axis=0))  # (C, LANE)
                ty = off_ref[
                    0, (t * 2 + 0) * groups : (t * 2 + 1) * groups,
                    r * LANE : (r + 1) * LANE,
                ].astype(jnp.float32)
                ty_r.append(jnp.clip(ty, -d_max, d_max))
                m_r.append(
                    msk_ref[
                        0, t * groups : (t + 1) * groups,
                        r * LANE : (r + 1) * LANE,
                    ].astype(jnp.float32)
                )

            def body(dyi, corners):
                dy = dyi - d_max
                row_start = (margin + row0 + r + a * dil - pad + dy) * LANE
                xrow = x_ref[0, :, pl.ds(row_start, LANE)]  # (C, LANE)
                out = []
                for b in range(kw):
                    # pure y-hat weight; the mask is applied after the loop
                    wy = jnp.maximum(
                        0.0, 1.0 - jnp.abs(ty_r[b] - dy.astype(jnp.float32))
                    )  # (G, LANE)
                    g0 = jnp.take_along_axis(xrow, idx0[b], axis=1)
                    g1 = jnp.take_along_axis(
                        xrow, jnp.minimum(idx0[b] + 1, LANE - 1), axis=1
                    )
                    a0, a1 = corners[b]
                    # group-minor channels: (C, L) -> (Cg, G, L) makes the
                    # per-group weight a broadcast (no repeat copy)
                    out.append((
                        a0 + g0.reshape(cg, groups, LANE) * wy[None],
                        a1 + g1.reshape(cg, groups, LANE) * wy[None],
                    ))
                return tuple(out)

            init = tuple(
                (
                    jnp.zeros((cg, groups, LANE), jnp.float32),
                    jnp.zeros((cg, groups, LANE), jnp.float32),
                )
                for _ in range(kw)
            )
            corners = jax.lax.fori_loop(0, s_win, body, init)
            for b in range(kw):
                a0 = corners[b][0].reshape(c_in, LANE)
                a1 = corners[b][1].reshape(c_in, LANE)
                blend = a0 * (1.0 - fx_r[b]) + a1 * fx_r[b]
                mc = pltpu.repeat(m_r[b], cg, axis=0)  # (C, LANE)
                row_pieces[b][r] = blend * mc

        for b in range(kw):
            t = a * kw + b
            col = jnp.concatenate(row_pieces[b], axis=1)  # (C, TRWP)
            acc = acc + jax.lax.dot_general(
                w_ref[t].astype(jnp.float32), col,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    o_ref[0] = acc.astype(o_ref.dtype)


def _dcn_kernel_v5(
    x_ref, off_ref, msk_ref, w_ref, o_ref, col_ref, *, kh, kw, dil, pad,
    d_max, groups, cg, tr, c_in, c_out, margin,
):
    """v3 sampling + ONE tap-batched im2col matmul.

    v3 finishes each tap with its own ``(C_out, C) @ (C, TRWP)`` dot — at
    C = 48 that is K = M = 48, i.e. ~14% MXU utilization, and the 9 dots are
    roughly half the kernel's runtime at FAMI scale. Here the sampled tap
    columns are written into one ``(K*C, TRWP)`` VMEM scratch (sublane strip
    per tap, lane strip per image row) and contracted against the stacked
    ``(K*C, C_out)`` weight in a single MXU call: K = 432 against the 128-wide
    contraction tiles is ~84% utilized, ~4x the per-tap dots.
    """
    s_win = 2 * d_max + 2
    row0 = pl.program_id(1) * tr
    col_iota = jax.lax.broadcasted_iota(jnp.int32, (c_in, LANE), 1)

    for a in range(kh):
        for r in range(tr):
            # per-(tap, row) horizontal gather indices / fracs / wy inputs
            idx0, fx_r, wy_in = [], [], []
            for b in range(kw):
                t = a * kw + b
                tx = off_ref[
                    0, (t * 2 + 1) * groups : (t * 2 + 2) * groups,
                    r * LANE : (r + 1) * LANE,
                ].astype(jnp.float32)
                tx = jnp.clip(tx, -d_max, d_max)
                x0 = jnp.floor(tx)
                fx = (tx - x0).astype(jnp.float32)
                x0c = pltpu.repeat(x0.astype(jnp.int32), cg, axis=0)
                idx0.append(
                    jnp.clip(col_iota + (b * dil - pad) + x0c, 0, LANE - 1)
                )
                fx_r.append(pltpu.repeat(fx, cg, axis=0))  # (C, LANE)
                ty = off_ref[
                    0, (t * 2 + 0) * groups : (t * 2 + 1) * groups,
                    r * LANE : (r + 1) * LANE,
                ].astype(jnp.float32)
                m = msk_ref[
                    0, t * groups : (t + 1) * groups,
                    r * LANE : (r + 1) * LANE,
                ].astype(jnp.float32)
                wy_in.append((jnp.clip(ty, -d_max, d_max), m))

            def body(dyi, cols3):
                dy = dyi - d_max
                row_start = (margin + row0 + r + a * dil - pad + dy) * LANE
                xrow = x_ref[0, :, pl.ds(row_start, LANE)]  # (C, LANE)
                out = []
                for b in range(kw):
                    ty, m = wy_in[b]
                    wy = jnp.maximum(
                        0.0, 1.0 - jnp.abs(ty - dy.astype(jnp.float32))
                    ) * m  # (G, LANE)
                    g0 = jnp.take_along_axis(xrow, idx0[b], axis=1)
                    g1 = jnp.take_along_axis(
                        xrow, jnp.minimum(idx0[b] + 1, LANE - 1), axis=1
                    )
                    samp = g0 * (1.0 - fx_r[b]) + g1 * fx_r[b]
                    out.append(
                        cols3[b] + samp.reshape(cg, groups, LANE) * wy[None]
                    )
                return tuple(out)

            init = tuple(
                jnp.zeros((cg, groups, LANE), jnp.float32) for _ in range(kw)
            )
            cols3 = jax.lax.fori_loop(0, s_win, body, init)
            for b in range(kw):
                t = a * kw + b
                col_ref[
                    t * c_in : (t + 1) * c_in, r * LANE : (r + 1) * LANE
                ] = cols3[b].reshape(c_in, LANE)

    # one tap-batched contraction: (K*C, C_out)^T-contract (K*C, TRWP)
    o_ref[0] = jax.lax.dot_general(
        w_ref[:].reshape(kh * kw * c_in, c_out).astype(jnp.float32),
        col_ref[:],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)


def _dcn_kernel_v6(
    x_ref, off_ref, msk_ref, w_ref, o_ref, col_ref, *, kh, kw, dil, pad,
    d_max, groups, cg, tr, c_in, c_out, margin,
):
    """Row-stacked big-tile kernel: ``tr`` image rows per vector instruction.

    v3 issues its window-loop ops on (C, 128) tiles — at C = 48 each
    instruction does ~6 cycles of work, so per-instruction overhead dominates
    (measured: the kernel runs ~5x above its elementwise VPU floor). v6
    changes the VMEM layout to *row-stacked*: ``x`` is (H*C, 128) with
    sublane = row*C + channel (channels in natural group-major order), so one
    dynamic sublane slice yields ``tr`` rows = a (tr*C, 128) tile and every
    gather/FMA in the window loop runs on 16x bigger operands — same total
    element work, ~16x fewer instructions. Offsets/masks arrive pre-stacked
    as (K, 2, H*G, 128) / (K, H*G, 128); the per-group quantities broadcast
    over the channels-per-group axis via one ``(tr*G, cg, 128)`` reshape
    (sublane order (row, group, cg) matches the stacked x exactly), and the
    per-tap columns are written through a (tr, C, 128) -> (C, tr*128)
    relayout into the tap-batched matmul scratch of v5.
    """
    del kw  # kw == 3 assumed only through tap indexing below (t = a*3 + b)
    kw = 3
    s_win = 2 * d_max + 2
    row0 = pl.program_id(1) * tr
    trc = tr * c_in
    col_iota = jax.lax.broadcasted_iota(jnp.int32, (trc, LANE), 1)

    for a in range(kh):
        idx0, fxc, wy_in = [], [], []
        for b in range(kw):
            t = a * kw + b
            tx = jnp.clip(off_ref[0, t, 1], -d_max, d_max)  # (tr*G, LANE)
            x0 = jnp.floor(tx)
            fx = (tx - x0).astype(jnp.float32)
            x0c = jnp.repeat(x0.astype(jnp.int32), cg, axis=0)  # (trc, LANE)
            idx0.append(
                jnp.clip(col_iota + (b * dil - pad) + x0c, 0, LANE - 1)
            )
            fxc.append(jnp.repeat(fx, cg, axis=0))
            wy_in.append(
                (jnp.clip(off_ref[0, t, 0], -d_max, d_max), msk_ref[0, t])
            )

        def body(dyi, cols):
            dy = dyi - d_max
            start = (margin + row0 + a * dil - pad + dy) * c_in
            xwin = x_ref[0, pl.ds(start, trc), :]  # (tr*C, LANE)
            out = []
            for b in range(kw):
                ty, m = wy_in[b]
                wy = jnp.maximum(
                    0.0, 1.0 - jnp.abs(ty - dy.astype(jnp.float32))
                ) * m  # (tr*G, LANE)
                g0 = jnp.take_along_axis(xwin, idx0[b], axis=1)
                g1 = jnp.take_along_axis(
                    xwin, jnp.minimum(idx0[b] + 1, LANE - 1), axis=1
                )
                samp = g0 * (1.0 - fxc[b]) + g1 * fxc[b]
                out.append(
                    cols[b]
                    + samp.reshape(tr * groups, cg, LANE) * wy[:, None, :]
                )
            return tuple(out)

        init = tuple(
            jnp.zeros((tr * groups, cg, LANE), jnp.float32) for _ in range(kw)
        )
        cols = jax.lax.fori_loop(0, s_win, body, init)
        for b in range(kw):
            t = a * kw + b
            piece = (
                cols[b]
                .reshape(tr, c_in, LANE)
                .transpose(1, 0, 2)
                .reshape(c_in, tr * LANE)
            )
            col_ref[t * c_in : (t + 1) * c_in, :] = piece

    o_ref[0] = jax.lax.dot_general(
        w_ref[:].reshape(kh * kw * c_in, c_out).astype(jnp.float32),
        col_ref[:],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)


def _deform_conv2d_pallas_v6(
    x, offset, mask, weight, bias, *, padding, dilation, offset_groups,
    max_offset, row_block, interpret,
):
    """Prep + launch for the row-stacked kernel (stride 1, kh = kw = 3)."""
    n, h, w, c = x.shape
    kh, kw, _, c_out = weight.shape
    # _dcn_kernel_v6's tap indexing (t = a*3 + b) hardcodes a 3x3 kernel;
    # reject anything else rather than silently computing a wrong output
    assert (kh, kw) == (3, 3), (kh, kw)
    k = kh * kw
    g = offset_groups
    cg = c // g
    d_max = int(max_offset)
    dil = int(dilation)
    pad = int(padding)
    tr = int(row_block)
    assert h % tr == 0, (h, tr)
    margin = pad + d_max + 1  # covers every row/col displacement
    assert w + 2 * margin <= LANE, (w, margin)
    hx = h + 2 * margin

    # x: (N, Hx*C, 128) row-stacked, natural (group-major) channel order
    x6 = jnp.pad(
        x.astype(jnp.float32),
        ((0, 0), (margin, margin), (margin, LANE - w - margin), (0, 0)),
    )
    x6 = x6.transpose(0, 1, 3, 2).reshape(n, hx * c, LANE)

    # offsets: (N, K, 2, H*G, 128); channel order [g][k][dy/dx] -> [k][dy/dx][g]
    off = offset.reshape(n, h, w, g, k, 2).transpose(0, 4, 5, 1, 3, 2)
    off = jnp.pad(
        off, ((0, 0),) * 4 + ((0, 0), (margin, LANE - w - margin))
    )
    off6 = off.reshape(n, k, 2, h * g, LANE).astype(jnp.float32)

    if mask is None:
        msk = jnp.ones((n, h, w, g, k), x.dtype)
    else:
        msk = mask.reshape(n, h, w, g, k)
    msk = msk.transpose(0, 4, 1, 3, 2)
    msk = jnp.pad(msk, ((0, 0),) * 3 + ((0, 0), (margin, LANE - w - margin)))
    msk6 = msk.reshape(n, k, h * g, LANE).astype(jnp.float32)

    w_k = weight.reshape(k, c, c_out)

    kernel = functools.partial(
        _dcn_kernel_v6, kh=kh, kw=kw, dil=dil, pad=pad, d_max=d_max,
        groups=g, cg=cg, tr=tr, c_in=c, c_out=c_out, margin=margin,
    )
    flops = 2 * n * h * w * (k * c * (2 * d_max + 2) + k * c * c_out)
    out_flat = pl.pallas_call(
        kernel,
        grid=(n, h // tr),
        in_specs=[
            pl.BlockSpec(
                (1, hx * c, LANE), lambda b, i: (b, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, k, 2, tr * g, LANE), lambda b, i: (b, 0, 0, i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, k, tr * g, LANE), lambda b, i: (b, 0, i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, c_out, tr * LANE), lambda b, i: (b, 0, i),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n, c_out, h * LANE), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=x.size * 4 + offset.size * 4,
            transcendentals=0,
        ),
        scratch_shapes=[pltpu.VMEM((k * c, tr * LANE), jnp.float32)],
        interpret=bool(interpret),
    )(x6, off6, msk6, w_k)

    out = out_flat.reshape(n, c_out, h, LANE)[:, :, :, margin : margin + w]
    out = out.transpose(0, 2, 3, 1).astype(x.dtype)
    if bias is not None:
        out = out + bias
    return out


def _dcn_kernel_v3(
    x_ref, off_ref, msk_ref, w_ref, o_ref, *, kh, kw, dil, pad,
    d_max, groups, cg, tr, c_in, c_out, margin,
):
    """x-dimension via true 128-lane gather (2 corners), y via hat window.

    Mosaic's dynamic gather works on (rows, 128) tiles only, so the kernel
    processes one padded image row (= one lane tile) at a time inside the
    vertical window loop: per (tap-row a, dy, image row r) one lane-aligned
    slice, then per tap-col b two gathers + a bilinear blend — 2 terms on
    the x axis instead of 2D+2.

    The y window is the TIGHT support 2D+1: hat(ty - dy) with the clamped
    ty in [-D, D] is zero for dy = D+1 everywhere (at the boundary ty = D
    the flanking weight hat(-1) is itself exactly 0), so the (2D+2)-row
    window the other variants run wastes a full iteration of gathers+FMA —
    25% of the loop at the D=1 serving window (measured: ~-17% per call).
    """
    s_win = 2 * d_max + 1
    row0 = pl.program_id(1) * tr
    trwp = tr * LANE

    acc = jnp.zeros((c_out, trwp), jnp.float32)
    col_iota = jax.lax.broadcasted_iota(jnp.int32, (c_in, LANE), 1)

    for a in range(kh):
        row_pieces = [[None] * tr for _ in range(kw)]
        for r in range(tr):
            # per-(tap, row) horizontal gather indices / fracs / wy inputs
            idx0, fx_r, wy_in = [], [], []
            for b in range(kw):
                t = a * kw + b
                tx = off_ref[
                    0, (t * 2 + 1) * groups : (t * 2 + 2) * groups,
                    r * LANE : (r + 1) * LANE,
                ].astype(jnp.float32)
                tx = jnp.clip(tx, -d_max, d_max)
                x0 = jnp.floor(tx)
                fx = (tx - x0).astype(jnp.float32)
                x0c = pltpu.repeat(x0.astype(jnp.int32), cg, axis=0)
                idx0.append(
                    jnp.clip(col_iota + (b * dil - pad) + x0c, 0, LANE - 1)
                )
                fx_r.append(pltpu.repeat(fx, cg, axis=0))  # (C, LANE)
                ty = off_ref[
                    0, (t * 2 + 0) * groups : (t * 2 + 1) * groups,
                    r * LANE : (r + 1) * LANE,
                ].astype(jnp.float32)
                m = msk_ref[
                    0, t * groups : (t + 1) * groups,
                    r * LANE : (r + 1) * LANE,
                ].astype(jnp.float32)
                wy_in.append((jnp.clip(ty, -d_max, d_max), m))

            def body(dyi, cols3):
                dy = dyi - d_max
                row_start = (margin + row0 + r + a * dil - pad + dy) * LANE
                xrow = x_ref[0, :, pl.ds(row_start, LANE)]  # (C, LANE)
                out = []
                for b in range(kw):
                    ty, m = wy_in[b]
                    wy = jnp.maximum(
                        0.0, 1.0 - jnp.abs(ty - dy.astype(jnp.float32))
                    ) * m  # (G, LANE)
                    g0 = jnp.take_along_axis(xrow, idx0[b], axis=1)
                    g1 = jnp.take_along_axis(
                        xrow, jnp.minimum(idx0[b] + 1, LANE - 1), axis=1
                    )
                    samp = g0 * (1.0 - fx_r[b]) + g1 * fx_r[b]
                    # group-minor channels: (C, L) -> (Cg, G, L) makes the
                    # per-group weight a broadcast (no repeat copy)
                    out.append(
                        cols3[b] + samp.reshape(cg, groups, LANE) * wy[None]
                    )
                return tuple(out)

            init = tuple(
                jnp.zeros((cg, groups, LANE), jnp.float32) for _ in range(kw)
            )
            cols3 = jax.lax.fori_loop(0, s_win, body, init)
            for b in range(kw):
                row_pieces[b][r] = cols3[b].reshape(c_in, LANE)

        for b in range(kw):
            t = a * kw + b
            col = jnp.concatenate(row_pieces[b], axis=1)  # (C, TRWP)
            acc = acc + jax.lax.dot_general(
                w_ref[t].astype(jnp.float32), col,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    o_ref[0] = acc.astype(o_ref.dtype)


def _dcn_kernel_v10(
    x_ref, off_ref, msk_ref, w_ref, o_ref, *, kh, kw, dil, pad,
    d_max, groups, cg, tr, c_in, c_out, margin,
):
    """Row-stacked wide-gather kernel: the whole y window in ONE gather.

    v3's wall is instruction issue: per (row, dy, tap) it gathers/blends on
    narrow (C, 128) operands — ``tr * kh * (2D+1) * kw`` small instructions
    per block. The fix v6 attempted (stack the dy rows on sublanes so one
    instruction does the whole window) died because reshaping v3's
    lane-major staging (C, s_win*128) -> (s_win*C, 128) is a Mosaic
    relayout. v10 changes the STAGING instead: x is staged row-major,
    ``(N, hp*C, 128)`` with each padded image row a contiguous C-sublane
    block, so the window's rows ``(s_win*C, 128)`` are ONE aligned dynamic
    slice — a free view, like v7's batch-pair stacking (pair dim outer).
    Per (tap-row a, image row r, tap-col b) the kernel then issues:

      * TWO wide lane-gathers (g0/g1 bilinear corners) on (s_win*C, 128)
        with per-sublane indices (the 2-D gather form v7 proved Mosaic
        supports),
      * one wide x-blend, one wide hat-weight multiply on the 4-D view
        (s_win, Cg, G, 128) x (s_win, 1, G, 128),
      * a log-tree reduction over the s_win axis.

    ~an order of magnitude fewer VPU instructions than v3 at D=4 for the
    same arithmetic. Numerics: identical sampling math to v3 (clamped
    offsets, corner clip, hat weights); only the dy-accumulation order
    changes (tree vs sequential) => f32 re-association within test
    tolerance. Shootout + auto-select rule in docs/PERFORMANCE.md.
    """
    s_win = 2 * d_max + 1
    row0 = pl.program_id(1) * tr
    trwp = tr * LANE
    swc = s_win * c_in

    acc = jnp.zeros((c_out, trwp), jnp.float32)
    col_iota = jax.lax.broadcasted_iota(jnp.int32, (swc, LANE), 1)
    # dy per sublane-block of the stacked window (int iota: Mosaic's
    # tpu.iota is integer-only), as an f32 constant
    dy_stack = (
        jax.lax.broadcasted_iota(jnp.int32, (s_win, 1, 1, 1), 0) - d_max
    ).astype(jnp.float32)

    for a in range(kh):
        row_pieces = [[None] * tr for _ in range(kw)]
        for r in range(tr):
            # first stacked sublane of the rows this (a, r) samples
            row_base = row0 + r + margin + a * dil - pad - d_max
            xs = x_ref[0, pl.ds(row_base * c_in, swc), :]  # (s_win*C, 128)
            for b in range(kw):
                t = a * kw + b
                tx = off_ref[
                    0, (t * 2 + 1) * groups : (t * 2 + 2) * groups,
                    r * LANE : (r + 1) * LANE,
                ].astype(jnp.float32)
                tx = jnp.clip(tx, -d_max, d_max)
                x0 = jnp.floor(tx)
                fx = (tx - x0).astype(jnp.float32)  # (G, LANE)
                idx_g = jnp.clip(
                    jax.lax.broadcasted_iota(jnp.int32, (groups, LANE), 1)
                    + (b * dil - pad) + x0.astype(jnp.int32),
                    0, LANE - 1,
                )
                idx = jnp.broadcast_to(
                    idx_g[None, None], (s_win, cg, groups, LANE)
                ).reshape(swc, LANE)
                fxw = jnp.broadcast_to(
                    fx[None, None], (s_win, cg, groups, LANE)
                ).reshape(swc, LANE)
                g0 = jnp.take_along_axis(xs, idx, axis=1)
                g1 = jnp.take_along_axis(
                    xs, jnp.minimum(idx + 1, LANE - 1), axis=1
                )
                samp = g0 * (1.0 - fxw) + g1 * fxw  # (s_win*C, LANE)

                ty = off_ref[
                    0, (t * 2 + 0) * groups : (t * 2 + 1) * groups,
                    r * LANE : (r + 1) * LANE,
                ].astype(jnp.float32)
                m = msk_ref[
                    0, t * groups : (t + 1) * groups,
                    r * LANE : (r + 1) * LANE,
                ].astype(jnp.float32)
                ty = jnp.clip(ty, -d_max, d_max)
                # hat(ty - dy) * mask for ALL dy at once: (s_win, 1, G, L)
                wym = jnp.maximum(
                    0.0, 1.0 - jnp.abs(ty[None, None] - dy_stack)
                ) * m[None, None]
                col4 = samp.reshape(s_win, cg, groups, LANE) * wym
                row_pieces[b][r] = jnp.sum(col4, axis=0).reshape(c_in, LANE)

        for b in range(kw):
            t = a * kw + b
            col = jnp.concatenate(row_pieces[b], axis=1)  # (C, TRWP)
            acc = acc + jax.lax.dot_general(
                w_ref[t].astype(jnp.float32), col,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    o_ref[0] = acc.astype(o_ref.dtype)


def _dcn_kernel_v9(
    x_ref, off_ref, msk_ref, w_ref, o_ref, *, kh, kw, dil, pad,
    d_max, groups, cg, tr, c_in, c_out, margin,
):
    """Strip-rolled, gather-free, fully-static tight-window kernel.

    Built for SMALL serving windows (the D=1/D=2 int8 serving path, where
    the 4 DCN calls are ~48% of the streaming step): at small ``D`` the
    tight support is tiny — ``(2D+1)^2`` cells per tap — so the sampling
    can be *fully static*: no lane gathers, no dynamic slices inside the
    window loop, no ``fori_loop`` at all.

      * ONE lane-aligned dynamic slice pulls the strip of image rows this
        output block can ever touch (``tr + (kh-1)*dil + 2D`` rows).
      * Each distinct horizontal displacement ``sx = b*dil - pad + dx``
        (``dx`` in the tight ``[-D, D]`` — the hat weight at ``|dx| = D+1``
        is identically zero for clamped offsets, same proof as the row
        window) is ONE whole-strip ``pltpu.roll``; 2(pad+D)+1 rolls total,
        hoisted out of every loop. Wrap-around only touches discarded
        margin columns (|sx| <= pad+D < margin, the v2 invariant).
      * Every (tap, dy, dx) contribution is then a *static* row-slice of a
        rolled strip times a hat-product weight: one multiply + one FMA on
        full (C, tr*128) operands — 16x wider than v3's per-row tiles, so
        per-instruction overhead (v3's measured wall: ~5x its VPU floor)
        amortizes away. ~(kh*kw)*(2D+1)^2 FMAs/block vs v3's
        ~tr*kh*(2D+1)*kw*5 small-tile instructions.

    Semantics identical to v3 / ``deform_conv2d_windowed`` (exact bilinear
    DCNv2 with offsets clamped to [-D, D]; zero-padded borders): the hat
    form sums hat(ty-dy)*hat(tx-dx)*mask*x over the support cells, which
    is the bilinear blend v3 computes via floor/gather. Parity-tested in
    tests/test_pallas_dcn.py; shootout in docs/PERFORMANCE.md.
    """
    trwp = tr * LANE
    row0 = pl.program_id(1) * tr
    k = kh * kw
    sr = tr + (kh - 1) * dil + 2 * d_max  # strip rows this block touches
    srwp = sr * LANE
    base = margin + row0 - pad - d_max  # first strip row (padded image)

    # per-tap hat weights over the tight window, on (G, tr*128) tiles:
    # wx[t][dxi], wym[t][dyi] (the mask folds into the y factor once)
    win = range(-d_max, d_max + 1)
    wxs, wyms = [], []
    for t in range(k):
        tx = jnp.clip(
            off_ref[0, (t * 2 + 1) * groups : (t * 2 + 2) * groups, :]
            .astype(jnp.float32),
            -d_max, d_max,
        )
        ty = jnp.clip(
            off_ref[0, (t * 2 + 0) * groups : (t * 2 + 1) * groups, :]
            .astype(jnp.float32),
            -d_max, d_max,
        )
        m = msk_ref[0, t * groups : (t + 1) * groups, :].astype(jnp.float32)
        wxs.append(
            [jnp.maximum(0.0, 1.0 - jnp.abs(tx - dx)) for dx in win]
        )
        wyms.append(
            [jnp.maximum(0.0, 1.0 - jnp.abs(ty - dy)) * m for dy in win]
        )

    cols = [jnp.zeros((cg, groups, trwp), jnp.float32) for _ in range(k)]
    xwin = x_ref[0, :, pl.ds(base * LANE, srwp)]  # (C, SR*128)
    for sx in range(-pad - d_max, (kw - 1) * dil - pad + d_max + 1):
        users = [
            (b, sx - (b * dil - pad))
            for b in range(kw)
            if abs(sx - (b * dil - pad)) <= d_max
        ]
        if not users:
            continue
        xs = pltpu.roll(xwin, (-sx) % srwp, axis=1)
        for b, dx in users:
            for a in range(kh):
                t = a * kw + b
                for dyi, dy in enumerate(win):
                    # output row r samples strip row r + a*dil + dy + d_max
                    r0 = (a * dil + dy + d_max) * LANE
                    sl = xs[:, r0 : r0 + trwp]  # static slice
                    w2 = wxs[t][dx + d_max] * wyms[t][dyi]  # (G, TRWP)
                    cols[t] = cols[t] + sl.reshape(cg, groups, trwp) * w2[None]

    acc = jnp.zeros((c_out, trwp), jnp.float32)
    for t in range(k):
        acc = acc + jax.lax.dot_general(
            w_ref[t].astype(jnp.float32),
            cols[t].reshape(c_in, trwp),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    o_ref[0] = acc.astype(o_ref.dtype)


def _dcn_kernel_v7(
    x_ref, off_ref, msk_ref, w_ref, o_ref, *, kh, kw, dil, pad,
    d_max, groups, cg, tr, c_in, c_out, margin,
):
    """v3 with ``P`` batch images stacked on the sublane axis.

    v3's VPU ops run on (C=48, 128) operands — ~6 native-tile cycles of work
    per issued instruction, so per-instruction overhead dominates (the v6
    row-stacking attempt to fix this died on Mosaic's 2-D-gather limit).
    Stacking along the BATCH axis needs no cross-row gathers: the pair
    dimension is OUTER in every ref, so ``x_ref[:, :, ds]`` yields a
    (P*C, 128) operand as a free contiguous view, the per-tap gathers stay
    2-D lane gathers (per-sublane indices), and every blend/FMA instruction
    does P times the work. Only the final MXU dots split back per image
    (slice on the leading axis, same total MAC count as v3). Staging is
    IDENTICAL to v3 — the launch just reshapes (N, ...) -> (N/P, P, ...).
    """
    p = x_ref.shape[0]
    s_win = 2 * d_max + 2
    row0 = pl.program_id(1) * tr
    col_iota = jax.lax.broadcasted_iota(jnp.int32, (p * c_in, LANE), 1)

    accs = [jnp.zeros((c_out, tr * LANE), jnp.float32) for _ in range(p)]
    for a in range(kh):
        row_pieces = [
            [[None] * tr for _ in range(kw)] for _ in range(p)
        ]
        for r in range(tr):
            idx0, fx_r, wy_in = [], [], []
            for b in range(kw):
                t = a * kw + b
                tx = off_ref[
                    :, (t * 2 + 1) * groups : (t * 2 + 2) * groups,
                    r * LANE : (r + 1) * LANE,
                ].astype(jnp.float32)  # (P, G, LANE)
                tx = jnp.clip(tx, -d_max, d_max)
                x0 = jnp.floor(tx)
                fx = (tx - x0).astype(jnp.float32)
                # (P, G, L) -> (P*C, L) with row = img*C + cg_idx*G + g
                x0c = jnp.broadcast_to(
                    x0.astype(jnp.int32)[:, None], (p, cg, groups, LANE)
                ).reshape(p * c_in, LANE)
                fxc = jnp.broadcast_to(
                    fx[:, None], (p, cg, groups, LANE)
                ).reshape(p * c_in, LANE)
                idx0.append(
                    jnp.clip(col_iota + (b * dil - pad) + x0c, 0, LANE - 1)
                )
                fx_r.append(fxc)
                ty = off_ref[
                    :, (t * 2 + 0) * groups : (t * 2 + 1) * groups,
                    r * LANE : (r + 1) * LANE,
                ].astype(jnp.float32)
                m = msk_ref[
                    :, t * groups : (t + 1) * groups,
                    r * LANE : (r + 1) * LANE,
                ].astype(jnp.float32)
                wy_in.append((jnp.clip(ty, -d_max, d_max), m))

            def body(dyi, cols3):
                dy = dyi - d_max
                row_start = (margin + row0 + r + a * dil - pad + dy) * LANE
                # (P, C, LANE) -> (P*C, LANE): free contiguous view
                xrow = x_ref[:, :, pl.ds(row_start, LANE)].reshape(
                    p * c_in, LANE
                )
                out = []
                for b in range(kw):
                    ty, m = wy_in[b]
                    wy = jnp.maximum(
                        0.0, 1.0 - jnp.abs(ty - dy.astype(jnp.float32))
                    ) * m  # (P, G, LANE)
                    g0 = jnp.take_along_axis(xrow, idx0[b], axis=1)
                    g1 = jnp.take_along_axis(
                        xrow, jnp.minimum(idx0[b] + 1, LANE - 1), axis=1
                    )
                    samp = g0 * (1.0 - fx_r[b]) + g1 * fx_r[b]  # (P*C, L)
                    # 4-D view + broadcast (no materialized copies, like
                    # v3's w2[None] trick): (P, cg, G, L) * (P, 1, G, L)
                    out.append(
                        cols3[b]
                        + samp.reshape(p, cg, groups, LANE) * wy[:, None]
                    )
                return tuple(out)

            init = tuple(
                jnp.zeros((p, cg, groups, LANE), jnp.float32)
                for _ in range(kw)
            )
            cols3 = jax.lax.fori_loop(0, s_win, body, init)
            for b in range(kw):
                per_img = cols3[b].reshape(p, c_in, LANE)
                for i in range(p):
                    row_pieces[i][b][r] = per_img[i]
            del cols3

        for b in range(kw):
            t = a * kw + b
            for i in range(p):
                col = jnp.concatenate(row_pieces[i][b], axis=1)  # (C, TRWP)
                accs[i] = accs[i] + jax.lax.dot_general(
                    w_ref[t].astype(jnp.float32), col,
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
    for i in range(p):
        o_ref[i] = accs[i].astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("padding", "dilation", "offset_groups", "max_offset",
                     "row_block", "interpret", "kernel_version",
                     "aux_channel_first"),
)
def deform_conv2d_pallas(
    x,
    offset,
    mask,
    weight,
    bias=None,
    *,
    padding=3,
    dilation=3,
    offset_groups: int = 12,
    max_offset: int = 4,
    row_block: int = 16,
    interpret: bool = None,
    kernel_version: int = 3,
    aux_channel_first: bool = False,
):
    """Drop-in fused equivalent of ``deform_conv2d_windowed`` (stride 1)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if int(kernel_version) == 6:
        assert not aux_channel_first, "v6 supports NHWC aux only"
        return _deform_conv2d_pallas_v6(
            x, offset, mask, weight, bias, padding=padding, dilation=dilation,
            offset_groups=offset_groups, max_offset=max_offset,
            row_block=row_block, interpret=interpret,
        )
    n, h, w, c = x.shape
    kh, kw, wc, c_out = weight.shape
    k = kh * kw
    g = offset_groups
    cg = c // g
    d_max = int(max_offset)
    dil = int(dilation)
    pad = int(padding)
    margin = d_max + 1 + dil * (kh // 2)  # covers max |shift| = pad + D + 1
    tr = int(row_block)
    assert h % tr == 0, (h, tr)
    assert w + 2 * margin <= LANE, (w, margin)

    # each padded image row occupies exactly one 128-lane tile
    pad_right = LANE - w - margin
    hp = h + 2 * margin + 1  # +1 row absorbs the last block's max up-shift

    # pltpu.repeat is a tile-repeat (whole-array concat), so weights expanded
    # with it map lane-row c to group c % G; permute channels to the matching
    # group-minor order (c' = cg_idx * G + g). The conv weight rows get the
    # same permutation, so the contraction is unchanged.
    perm = np.arange(c).reshape(g, cg).T.reshape(-1)
    # Mosaic (remote-compile) rejects the bf16 roll/slice mix in this
    # kernel; stage everything f32 — at FAMI-Pose scale the extra VMEM is
    # ~1 MB and the kernel accumulates in f32 anyway
    x_pad = jnp.pad(
        x[..., perm].astype(jnp.float32),
        ((0, 0), (margin, margin + 1), (margin, pad_right), (0, 0)),
    )
    if int(kernel_version) in (10, 11):
        # row-major staging: each padded image row is a contiguous block of
        # C sublanes, so the kernel's y window (s_win*C, 128) is one free
        # aligned dynamic slice (see _dcn_kernel_v10). v11 = v10 with the
        # INPUT dtype kept (bf16 staging halves x bandwidth/VMEM; the
        # f32-stage workaround above was for the roll/slice mix of the
        # lane-major kernels — v10/v11 only gather, never roll)
        if int(kernel_version) == 11:
            x_pad = x_pad.astype(x.dtype)
        x_flat = x_pad.transpose(0, 1, 3, 2).reshape(n, hp * c, LANE)
    else:
        x_flat = x_pad.transpose(0, 3, 1, 2).reshape(n, c, hp * LANE)

    if aux_channel_first:
        # offsets/mask arrive (N, 2GK, H, W) / (N, GK, H, W) already in the
        # kernel-major [k][dy/dx][g] channel order (the producing convs fold
        # the permutation into their weights — ops.deform_conv.aux_cf_perms):
        # staging is just a lane pad, no 6-D transpose relayout
        off = jnp.pad(offset, ((0, 0), (0, 0), (0, 0), (margin, pad_right)))
        off_flat = off.reshape(n, 2 * g * k, h * LANE)
        if mask is None:
            msk = jnp.ones((n, g * k, h, w), x.dtype)
        else:
            msk = mask
        msk = jnp.pad(msk, ((0, 0), (0, 0), (0, 0), (margin, pad_right)))
        msk_flat = msk.reshape(n, g * k, h * LANE)
    else:
        # offsets (N,H,W,2GK), channel order [g][k][dy/dx] -> [k][dy/dx][g]
        off = offset.reshape(n, h, w, g, k, 2).transpose(0, 4, 5, 3, 1, 2)
        off = off.reshape(n, 2 * g * k, h, w)
        off = jnp.pad(off, ((0, 0), (0, 0), (0, 0), (margin, pad_right)))
        # keep the input dtype (bf16 in the flagship): the padded/transposed
        # staging copies halve, and the kernels convert per-(G,128) tile
        off_flat = off.reshape(n, 2 * g * k, h * LANE)

        if mask is None:
            msk = jnp.ones((n, h, w, g, k), x.dtype)
        else:
            msk = mask.reshape(n, h, w, g, k)
        msk = msk.transpose(0, 4, 3, 1, 2).reshape(n, g * k, h, w)
        msk = jnp.pad(msk, ((0, 0), (0, 0), (0, 0), (margin, pad_right)))
        msk_flat = msk.reshape(n, g * k, h * LANE)

    w_k = weight.reshape(k, c, c_out)[:, perm, :]

    kfn = {
        2: _dcn_kernel, 3: _dcn_kernel_v3, 4: _dcn_kernel_v4,
        5: _dcn_kernel_v5, 7: _dcn_kernel_v7, 9: _dcn_kernel_v9,
        10: _dcn_kernel_v10, 11: _dcn_kernel_v10,  # v11 = bf16-staged v10
    }[int(kernel_version)]
    scratch = (
        [pltpu.VMEM((k * c, tr * LANE), jnp.float32)]
        if int(kernel_version) == 5
        else []
    )
    kernel = functools.partial(
        kfn, kh=kh, kw=kw, dil=dil, pad=pad, d_max=d_max, groups=g,
        cg=cg, tr=tr, c_in=c, c_out=c_out, margin=margin,
    )
    n_row_blocks = h // tr
    flops = 2 * n * h * w * (k * c * (2 * d_max + 2) ** 2 + k * c * c_out)
    if int(kernel_version) == 7:
        # pair-stacked: same staged arrays, reshaped (N, ...) -> (N/2, 2, ...)
        # so the pair dim lands OUTER in every block (free in-kernel views)
        P = 2
        assert n % P == 0, (n, P)
        out_flat = pl.pallas_call(
            kernel,
            grid=(n // P, n_row_blocks),
            in_specs=[
                pl.BlockSpec(
                    (P, c, hp * LANE), lambda b, i: (b, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (P, 2 * g * k, tr * LANE), lambda b, i: (b, 0, i),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (P, g * k, tr * LANE), lambda b, i: (b, 0, i),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (P, c_out, tr * LANE), lambda b, i: (b, 0, i),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct((n, c_out, h * LANE), jnp.float32),
            cost_estimate=pl.CostEstimate(
                flops=flops, bytes_accessed=x.size * 2 + offset.size * 4,
                transcendentals=0,
            ),
            # two whole padded images + streamed offset/mask/out blocks sit
            # ~1 MB over the default 16 MB scoped-vmem limit; v5e has far
            # more physical VMEM, so raise the cap for this kernel
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=48 * 1024 * 1024
            ),
            interpret=bool(interpret),
        )(x_flat, off_flat, msk_flat, w_k)
    else:
        # v9 keeps (2D+1)^2 hat-weight tiles + per-tap columns live at once;
        # raise the scoped-vmem cap like v7 (v5e has far more physical VMEM)
        ckw = (
            dict(
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=48 * 1024 * 1024
                )
            )
            if int(kernel_version) == 9
            else {}
        )
        x_spec = (
            pl.BlockSpec(
                (1, hp * c, LANE), lambda b, i: (b, 0, 0),
                memory_space=pltpu.VMEM,
            )
            if int(kernel_version) in (10, 11)
            else pl.BlockSpec(
                (1, c, hp * LANE), lambda b, i: (b, 0, 0),
                memory_space=pltpu.VMEM,
            )
        )
        out_flat = pl.pallas_call(
            kernel,
            grid=(n, n_row_blocks),
            in_specs=[
                x_spec,
                pl.BlockSpec(
                    (1, 2 * g * k, tr * LANE), lambda b, i: (b, 0, i),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, g * k, tr * LANE), lambda b, i: (b, 0, i),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, c_out, tr * LANE), lambda b, i: (b, 0, i),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct((n, c_out, h * LANE), jnp.float32),
            cost_estimate=pl.CostEstimate(
                flops=flops, bytes_accessed=x.size * 2 + offset.size * 4,
                transcendentals=0,
            ),
            scratch_shapes=scratch,
            interpret=bool(interpret),
            **ckw,
        )(x_flat, off_flat, msk_flat, w_k)

    out = out_flat.reshape(n, c_out, h, LANE)[:, :, :, margin : margin + w]
    out = out.transpose(0, 2, 3, 1).astype(x.dtype)
    if bias is not None:
        out = out + bias
    return out


def _best_row_block(h: int, target: int = 16) -> int:
    for rb in range(min(target, h), 0, -1):
        if h % rb == 0:
            return rb
    return 1


def make_deform_conv_fn(
    *, padding: int, dilation: int, offset_groups: int, max_offset: int,
    use_pallas: bool, aux_channel_first: bool = False,
    kernel_version: int = None, bwd_kernel_version: int = None,
):
    """Factory returning a differentiable DCN: fused Pallas forward with the
    XLA windowed implementation as the backward (they compute the same
    function, so the VJP is exact).

    With ``aux_channel_first`` the offsets/mask arguments are (N, 2GK, H, W)
    / (N, GK, H, W) in kernel-major channel order — the layout the Pallas
    kernels stage to — skipping the 6-D transpose relayouts on both the
    forward and backward prep (only valid with ``use_pallas``).

    ``kernel_version=None`` auto-selects: the gather-free strip-rolled v9
    for the D=1 serving window (measures ~16% faster op-level and its
    (2D+1)^2 unroll stays small), v3 for every larger window
    (docs/PERFORMANCE.md shootouts; v9 loses from D=2 up and its scoped
    vmem grows with the squared window).
    """
    from fami_pose_tpu.ops.deform_conv import deform_conv2d_windowed

    import os as _os

    if kernel_version is None:
        # FAMI_DCN_KERNEL overrides for shootouts (tools/bench_train_step.py)
        # v9 only at D=1: the r4 on-chip shootout (tools/probe_v9_vmem.py,
        # docs/PERFORMANCE.md) measured v9/v3 = 9.8/11.6 ms at D=1 but
        # 17.3/15.9 at D=2 and 43.1/24.2 at D=4 — the (2D+1)^2 static
        # window's FMA count outgrows v3's gather form past D=1, and its
        # Mosaic scoped-vmem stack (~cells*row_block) OOMs co-resident in
        # large programs at D>=2 (the r4 eval regression)
        kernel_version = int(_os.environ.get("FAMI_DCN_KERNEL", "0")) or (
            9 if int(max_offset) <= 1 else 3
        )
    kernel_version = int(kernel_version)
    if bwd_kernel_version is None:
        # v9 (sx-grouped rolls) vs v3 (per-cell rolls): shootout in
        # docs/PERFORMANCE.md; FAMI_DCN_BWD_KERNEL overrides
        bwd_kernel_version = int(
            _os.environ.get("FAMI_DCN_BWD_KERNEL", "3")
        )
    bwd_kernel_version = int(bwd_kernel_version)

    def windowed(x, offset, mask, weight, bias):
        return deform_conv2d_windowed(
            x, offset, mask, weight, bias, padding=padding, dilation=dilation,
            offset_groups=offset_groups, max_offset=max_offset,
        )

    if not use_pallas:
        assert not aux_channel_first, "channel-first aux requires the " \
            "Pallas path"
        return windowed

    @jax.custom_vjp
    def fn(x, offset, mask, weight, bias):
        return deform_conv2d_pallas(
            x, offset, mask, weight, bias, padding=padding, dilation=dilation,
            offset_groups=offset_groups, max_offset=max_offset,
            row_block=_best_row_block(x.shape[1]),
            aux_channel_first=aux_channel_first,
            kernel_version=kernel_version,
        )

    def fwd(x, offset, mask, weight, bias):
        return fn(x, offset, mask, weight, bias), (x, offset, mask, weight, bias)

    def bwd(res, g):
        x, offset, mask, weight, bias = res
        from fami_pose_tpu.ops.pallas.dcn_bwd import (
            deform_conv2d_windowed_bwd_pallas,
        )

        dx, doff, dmsk, dw, db = deform_conv2d_windowed_bwd_pallas(
            x, offset, mask, weight, g, padding=padding, dilation=dilation,
            offset_groups=offset_groups, max_offset=max_offset,
            # smaller row block: the backward holds halo copies of
            # gout/offsets/mask plus the shift-adjoint scratch in VMEM;
            # shrink further for wide windows (halo rows = tr + 2*(D+4)).
            # (tr=16 compiles with the bf16 staging but measured SLOWER:
            # 524.5 vs 514.4 ms/step at batch 8 — VMEM pressure wins.)
            row_block=_best_row_block(
                x.shape[1], target=8 if max_offset <= 4 else 4
            ),
            aux_channel_first=aux_channel_first,
            kernel_version=bwd_kernel_version,
        )
        if bias is None:
            db = None
        if mask is None:
            dmsk = None
        return dx, doff, dmsk, dw, db

    fn.defvjp(fwd, bwd)
    return fn
