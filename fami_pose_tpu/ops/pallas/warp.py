"""Fused Pallas kernel for the global-alignment translation warp.

``ops.warp.warp_translate`` (the kornia ``warp_affine`` replacement for the
pure-translation case the model uses, ``Alignment_V15.py:133-135``) lowers
its per-image integer shift to vmapped ``dynamic_slice``s — XLA emits
per-image while loops costing ~37 ms/call at eval batch 128 (trace,
docs/PERFORMANCE.md). This kernel does the whole warp in one pass:

  * the padded image lives in VMEM as ``(C, Hp, 128)`` — one 128-lane row
    register per image row (the DCN kernels' layout), so the integer row
    shift is a dynamic slice on the sublane axis;
  * the integer column shift is a dynamic ``pltpu.roll`` along the last
    (lane) axis — a per-register lane rotate: for kept lanes ``x < W`` the
    source index ``x + m - tx0`` stays inside the 128-lane register
    (``W + 2(max_shift+1) <= 128`` by construction), so the cyclic wrap
    never contaminates kept lanes;
  * bilinear separability lets the whole warp be 2 rolls + 2 slices: the
    column blend runs once over the FULL padded array (dynamic roll by
    ``sx`` + static roll by 1 — the per-register wrap at lane 0 lands on
    ``127 + sx ≡ sx - 1 (mod 128)``, exactly the wanted column), is stored
    to scratch, and the row blend takes two dynamic sublane slices of it.

On-chip Mosaic hazards (probed 2026-08-17; both forms are fine in
interpret mode — keep the on-chip layout exactly as written):

  * a flat ``(C, Hp*128)`` layout with a dynamic roll over the multi-tile
    axis MISCOMPILES (matches neither full-axis-cyclic nor per-register
    semantics). Keep rolls on a 128-wide last axis.
  * a dynamic sublane slice feeding a dynamic lane roll FAULTS the TPU
    worker (kernel fault, worker restart) — each primitive is fine alone.
    Rolling first and storing to scratch before the dynamic slice (the
    structure below) is the workaround.

Zero-padding semantics match ``warp_translate`` exactly for translations
within ``±max_shift`` (both clamp; the default 26 covers the global
head's range — translations are between ADJACENT frames at 1/4 resolution).

The kernel takes the UNPADDED image and zero-pads in VMEM: an earlier
variant that padded/transposed on the XLA side moved 2.3 GB of (N, C, Hp,
128) staging per batch-512 call at strided-copy speed (~600 ms in-graph —
3.5x the entire win). XLA-side staging is one minor-dim transpose each way.

Measured on-chip (v5e, batch 512, bf16, FAMI feature scale 96x72x48):
7.90 ms/call vs 42.93 ms for the XLA dynamic-slice path (5.4x), staging
included; f32 bit-exact vs ``warp_translate``.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


def _warp_kernel(off_ref, x_ref, o_ref, xf_ref, xc_ref, *, h, w, m, c):
    # off_ref: SMEM, whole (N, 2) array [tx, ty]; x/o blocks are per-image
    # UNPADDED (1, C, H, W) — zero-padding happens here in VMEM (an
    # XLA-side pad+transpose of the padded array materializes 2.3 GB at
    # strided-copy speed and costs ~600 ms/batch-512 in-graph; in-kernel
    # padding moves only the unpadded bytes).
    # xf_ref: f32 VMEM scratch — the rotate is 32-bit-only AND packed bf16
    # tiles reject unaligned dynamic sublane slices ("index in dimension 2
    # is a multiple of 8"), so the image is converted once on write and
    # all dynamic slicing happens on f32 copies.
    # xc_ref: column-blended full-height scratch. The store between the
    # dynamic roll and the dynamic sublane slices is LOAD-BEARING: the
    # fused slice->roll form faults the chip (see module docstring).
    xf_ref[...] = jnp.zeros_like(xf_ref)
    xf_ref[:, m:m + h, m:m + w] = x_ref[0].astype(jnp.float32)
    b = pl.program_id(0)
    tx = off_ref[b, 0]
    ty = off_ref[b, 1]
    tx0 = jnp.floor(tx)
    ty0 = jnp.floor(ty)
    fx = (tx - tx0).astype(jnp.float32)
    fy = (ty - ty0).astype(jnp.float32)

    # integer origin of the s11 corner (see ops.warp.warp_translate)
    oy = (m - ty0).astype(jnp.int32)
    sx = (m - tx0).astype(jnp.int32)  # column shift within each lane tile

    # column blend over the full padded height: rolled[x] = xf[x + sx];
    # roll(rolled, 1)[x] = xf[x + sx - 1] (at x=0 the per-register wrap
    # reads rolled[127] = xf[(127 + sx) mod 128] = xf[sx - 1] — correct).
    rolled = pltpu.roll(xf_ref[...], -sx, axis=2)
    xc_ref[...] = rolled * (1 - fx) + pltpu.roll(rolled, 1, axis=2) * fx

    # row blend: two dynamic sublane slices of the column-blended scratch
    out = (
        xc_ref[:, pl.ds(oy - 1, h), :] * fy
        + xc_ref[:, pl.ds(oy, h), :] * (1 - fy)
    )
    o_ref[0] = out[:, :, :w].astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("max_shift", "interpret")
)
def warp_translate_pallas(images, offsets, max_shift: int = 26,
                          interpret: bool = None):
    """Fused equivalent of ``ops.warp.warp_translate`` (same clamp+blend
    semantics at ``max_shift``). images (N, H, W, C); offsets (N, 2)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    n, h, w, c = images.shape
    m = int(max_shift) + 1
    assert w + m + max_shift + 1 <= LANE, (w, max_shift)
    hp = h + 2 * m

    t = jnp.clip(offsets.astype(jnp.float32), -max_shift, max_shift)

    # unpadded (N, C, H, W) — the minor-dim transpose is the ONLY XLA-side
    # staging (zero-padding and the 128-lane expansion happen in VMEM)
    x_rows = images.transpose(0, 3, 1, 2)

    out_rows = pl.pallas_call(
        functools.partial(_warp_kernel, h=h, w=w, m=m, c=c),
        grid=(n,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (1, c, h, w), lambda b: (b, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, c, h, w), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n, c, h, w), images.dtype),
        scratch_shapes=[
            pltpu.VMEM((c, hp, LANE), jnp.float32),
            pltpu.VMEM((c, hp, LANE), jnp.float32),
        ],
        # two full-height f32 scratches + roll temporaries overflow the
        # default 16M scoped-vmem cap at FAMI scale
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=48 * 1024 * 1024
        ),
        interpret=bool(interpret),
    )(t, x_rows)

    return out_rows.transpose(0, 2, 3, 1).astype(images.dtype)


def make_warp_translate_fn(max_shift: int = 26):
    """Differentiable fused warp: Pallas forward, exact VJP through the XLA
    ``warp_translate`` (identical function at the same clamp). Feature maps
    too wide for the 128-lane register budget fall back to the XLA path
    (shapes are static at trace time)."""
    from fami_pose_tpu.ops.warp import warp_translate

    def xla(images, offsets):
        return warp_translate(images, offsets, max_shift=max_shift)

    @jax.custom_vjp
    def fn(images, offsets):
        return warp_translate_pallas(images, offsets, max_shift=max_shift)

    def fwd(images, offsets):
        return fn(images, offsets), (images, offsets)

    def bwd(res, g):
        images, offsets = res
        _, vjp = jax.vjp(xla, images, offsets)
        return vjp(g)

    fn.defvjp(fwd, bwd)

    def dispatch(images, offsets):
        w = images.shape[2]
        if w + 2 * (max_shift + 1) > LANE:
            return xla(images, offsets)
        return fn(images, offsets)

    return dispatch
