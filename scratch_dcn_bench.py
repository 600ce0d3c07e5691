"""Micro-bench of DCN gather formulations on TPU (scratch; not shipped)."""
import time
import jax
import jax.numpy as jnp
import numpy as np

B, H, W, C, G, K = 8, 96, 72, 48, 12, 9
Cg = C // G
P = H * W


def timeit(f, *args, iters=3, label=""):
    out = f(*args)
    np.asarray(out).ravel()[:1]
    t0 = time.perf_counter()
    outs = [f(*args) for _ in range(iters)]
    for o in outs:
        np.asarray(o).ravel()[:1]
    dt = (time.perf_counter() - t0) / iters
    print(f"{label}: {dt*1e3:.2f} ms")
    return out


rng = np.random.RandomState(0)
x = jnp.asarray(rng.rand(B, H, W, C), jnp.bfloat16)
# per (pixel, group, tap) integer gather indices into HW (already clipped)
idx = jnp.asarray(rng.randint(0, P, (B, H, W, G, K)), jnp.int32)
wbi = jnp.asarray(rng.rand(B, H, W, G, K, 4), jnp.bfloat16)  # bilinear wts
msk = jnp.asarray(rng.rand(B, H, W, G, K), jnp.bfloat16)
wgt = jnp.asarray(rng.rand(3, 3, C, C) * 0.1, jnp.bfloat16)


# -- variant 1: grouped take_along_axis (current impl core) -------------------
@jax.jit
def v1(x, idx, msk, wgt):
    xf = x.reshape(B, P, G, Cg).transpose(0, 2, 1, 3)  # (B,G,P,Cg)
    cols = []
    for k in range(K):
        i = idx[..., k].reshape(B, P, G).transpose(0, 2, 1)  # (B,G,P)
        v = jnp.take_along_axis(xf, i[..., None], axis=2)  # (B,G,P,Cg)
        v = v.transpose(0, 2, 1, 3).reshape(B, H, W, C)
        cols.append(v * msk[..., 0, k, None])
    col = jnp.stack(cols, 3).reshape(B * P, K * C)
    return col @ wgt.reshape(K * C, C)


# -- variant 2: full-row gather (48ch rows), select group slice ---------------
@jax.jit
def v2(x, idx, msk, wgt):
    xf = x.reshape(B, P, C)
    cols = []
    for k in range(K):
        vs = []
        for g in range(G):
            i = idx[..., g, k].reshape(B, P)
            v = jnp.take_along_axis(xf, i[..., None], axis=1)  # (B,P,C)
            vs.append(v[..., g * Cg : (g + 1) * Cg])
        v = jnp.concatenate(vs, -1).reshape(B, H, W, C)
        cols.append(v * msk[..., 0, k, None])
    col = jnp.stack(cols, 3).reshape(B * P, K * C)
    return col @ wgt.reshape(K * C, C)


# -- variant 3: one-hot matmul ------------------------------------------------
@jax.jit
def v3(x, idx, msk, wgt):
    xg = x.reshape(B, P, G, Cg).transpose(0, 2, 1, 3)  # (B,G,P,Cg)
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, P, 1), 2)
    outs = []
    for k in range(K):
        i = idx[..., k].reshape(B, P, G).transpose(0, 2, 1)  # (B,G,P)
        onehot = (i[..., None] == iota).astype(jnp.bfloat16)  # (B,G,P,P)
        v = jnp.einsum("bgpq,bgqc->bgpc", onehot, xg)
        v = v.transpose(0, 2, 1, 3).reshape(B, H, W, C)
        outs.append(v * msk[..., 0, k, None])
    col = jnp.stack(outs, 3).reshape(B * P, K * C)
    return col @ wgt.reshape(K * C, C)


# -- variant 4: gather with lax.gather, batched over B*G ----------------------
@jax.jit
def v4(x, idx, msk, wgt):
    xf = x.reshape(B, P, G, Cg).transpose(0, 2, 1, 3).reshape(B * G, P, Cg)
    cols = []
    for k in range(K):
        i = idx[..., k].reshape(B, P, G).transpose(0, 2, 1).reshape(B * G, P)
        dn = jax.lax.GatherDimensionNumbers(
            offset_dims=(2,), collapsed_slice_dims=(1,),
            start_index_map=(1,), operand_batching_dims=(0,),
            start_indices_batching_dims=(0,),
        )
        v = jax.lax.gather(
            xf, i[..., None], dn, slice_sizes=(1, 1, Cg),
            mode=jax.lax.GatherScatterMode.CLIP,
        )  # (BG, P, Cg)
        v = v.reshape(B, G, P, Cg).transpose(0, 2, 1, 3).reshape(B, H, W, C)
        cols.append(v * msk[..., 0, k, None])
    col = jnp.stack(cols, 3).reshape(B * P, K * C)
    return col @ wgt.reshape(K * C, C)


r1 = timeit(v1, x, idx, msk, wgt, label="v1 take_along grouped")
r2 = timeit(v2, x, idx, msk, wgt, label="v2 full-row gather")
r4 = timeit(v4, x, idx, msk, wgt, label="v4 lax.gather batched")
r3 = timeit(v3, x, idx, msk, wgt, label="v3 one-hot matmul")
print("v2 matches v1:", bool(jnp.allclose(r1, r2, atol=1e-2)))
print("v4 matches v1:", bool(jnp.allclose(r1, r4, atol=1e-2)))
print("v3 matches v1:", bool(jnp.allclose(r1, r3, atol=1e-2)))
