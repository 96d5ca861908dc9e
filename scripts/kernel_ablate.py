"""Ablation study of the resident warp+NCC kernel on the real TPU.

Variants isolate cost centers (numbers feed the kernel design, they are NOT
product code):
  base    — the shipped resident kernel (hi+lo bf16 matmul, dense hats)
  bf16    — single bf16 weight matmul (no lo half)
  nobuild — weights replaced by a constant (bounds the hat-build cost)
  tile16  — TILE_B = 16
"""
from __future__ import annotations

import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def make_variant(M, S, n_real, WIN_H, WIN_W, TILE_B, mode):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    NCC_MIN_DENOM = 0.1

    def kernel(row0_ref, x0_ref, xs_ref, ys_ref, images_ref, out_ref, tex_ref):
        col_ids = jax.lax.broadcasted_iota(
            jnp.int32, (M * S, WIN_W), 1
        ).astype(jnp.float32)
        row_ids = jax.lax.broadcasted_iota(
            jnp.int32, (M * S, WIN_H), 1
        ).astype(jnp.float32)
        n = jnp.float32(n_real)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, S), 1)
        smask = (lane < n_real).astype(jnp.float32)

        for i in range(TILE_B):
            xs = xs_ref[i]
            ys = ys_ref[i]
            if mode == "nobuild":
                wx_hi = jnp.full((M * S, WIN_W), 0.01, jnp.bfloat16)
                wy = jnp.full((M * S, WIN_H), 0.01, jnp.float32)
                wx_lo = None
            else:
                wx = jnp.maximum(0.0, 1.0 - jnp.abs(xs[:, None] - col_ids))
                wx_hi = wx.astype(jnp.bfloat16)
                wx_lo = (
                    None
                    if mode in ("bf16", "tile16")
                    else (wx - wx_hi.astype(jnp.float32)).astype(jnp.bfloat16)
                )
                wy = jnp.maximum(0.0, 1.0 - jnp.abs(ys[:, None] - row_ids))
            for m in range(M):
                row0 = pl.multiple_of(row0_ref[i, m], 8)
                x0 = pl.multiple_of(x0_ref[i, m], 128)
                roi_bf = images_ref[
                    pl.ds(row0, WIN_H), pl.ds(x0, WIN_W)
                ].astype(jnp.bfloat16)
                dims = (((1,), (1,)), ((), ()))
                if wx_lo is None:
                    prof = jax.lax.dot_general(
                        wx_hi[m * S:(m + 1) * S], roi_bf, dims,
                        preferred_element_type=jnp.float32,
                    )
                else:
                    wcat = jnp.concatenate(
                        [wx_hi[m * S:(m + 1) * S], wx_lo[m * S:(m + 1) * S]], 0
                    )
                    prof2 = jax.lax.dot_general(
                        wcat, roi_bf, dims, preferred_element_type=jnp.float32
                    )
                    prof = prof2[:S] + prof2[S:]
                tex_ref[m, :] = jnp.sum(wy[m * S:(m + 1) * S] * prof, axis=1)

            tex = tex_ref[:, :] * smask
            anchor = tex[0:1, :]
            am = jnp.sum(anchor, axis=1, keepdims=True) / n
            tm = jnp.sum(tex, axis=1, keepdims=True) / n
            ca = (anchor - am) * smask
            ct = (tex - tm) * smask
            cov = jnp.sum(ca * ct, axis=1) / n
            va = jnp.sum(ca * ca, axis=1) / n
            vt = jnp.sum(ct * ct, axis=1) / n
            denom = jnp.maximum(jnp.sqrt(va) * jnp.sqrt(vt), NCC_MIN_DENOM)
            out_ref[i, :] = cov / denom

    return kernel


def run_variant(mode, tile_b=8):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    WIN_H, WIN_W = 56, 128
    num_views, H, W = 8, 480, 640
    B, M, k = 4096, 8, 11
    S = 128
    reps = 20
    rng = np.random.default_rng(0)

    P = 2 * num_views
    Hp = H
    images = rng.uniform(0, 255, (P, Hp, W)).astype(np.float32)
    flat = jnp.asarray(images.reshape(P * Hp, W))
    y0 = rng.integers(0, (H - WIN_H) // 8, (B, M)).astype(np.int32) * 8
    views = rng.integers(0, P, (B, M)).astype(np.int32)
    row0 = jnp.asarray(views * Hp + y0)
    x0 = jnp.asarray(
        rng.integers(0, (W - WIN_W) // 128, (B, M)).astype(np.int32) * 128
    )
    xs = jnp.asarray(rng.uniform(10, 110, (B, M * S)).astype(np.float32))
    ys = jnp.asarray(rng.uniform(5, 50, (B, M * S)).astype(np.float32))

    kernel = make_variant(M, S, k * k, WIN_H, WIN_W, tile_b, mode)
    smem_spec = pl.BlockSpec((tile_b, M), lambda i: (i, 0), memory_space=pltpu.SMEM)
    coord_spec = pl.BlockSpec(
        (tile_b, M * S), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, M), jnp.float32),
        grid=(B // tile_b,),
        in_specs=[
            smem_spec,
            smem_spec,
            coord_spec,
            coord_spec,
            pl.BlockSpec((P * Hp, W), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tile_b, M), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.VMEM((M, S), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )

    def run(xs, seed):
        def body(i, acc):
            x = xs + (seed + i.astype(jnp.float32)) * 1e-3
            out = call(row0, x0, x, ys, flat)
            return acc + jnp.sum(out) * 1e-6
        return jax.lax.fori_loop(0, reps, body, 0.0)

    f = jax.jit(run)
    float(f(xs, 0.0))
    t = time.perf_counter()
    float(f(xs, 1.0))
    dt = (time.perf_counter() - t) / reps
    print(f"{mode:8s} tile_b={tile_b:2d}: {dt*1e3:7.2f} ms/call")


def main():
    run_variant("base")
    run_variant("bf16")
    run_variant("nobuild")
    run_variant("tile16", tile_b=16)


if __name__ == "__main__":
    main()
