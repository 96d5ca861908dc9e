"""Ablation study of the resident warp+NCC kernel on the real TPU.

Variants isolate cost centers (numbers feed the kernel design, they are NOT
product code). Baseline `onehot` mirrors the SHIPPED resident kernel
(one-hot E/E2 matmuls, f32 x-blend); the others probe MXU orientation:

  onehot     — shipped design: Em @ roi^T per slot (streams S=128 rows for a
               56-wide output -> ~44% of the MXU idle per pass)
  transposed — roi @ Em^T (streams WIN_H=56 rows for a 128-wide output)
  fused      — roi @ [Em|E2m]^T: one dot per slot, 256-wide output
  nobuild    — one-hot builds replaced by constants (bounds the VPU cost)
  tile16     — fused with TILE_B = 16
  hat32      — WIN_H = 32 sensitivity probe (window-slack tradeoff)
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def make_variant(M, S, n_real, WIN_H, WIN_W, TILE_B, mode):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    NCC_MIN_DENOM = 0.1
    dims = (((1,), (1,)), ((), ()))

    def kernel(row0_ref, x0_ref, xs_ref, ys_ref, images_ref, out_ref, tex_ref):
        col_ids = jax.lax.broadcasted_iota(
            jnp.int32, (M * S, WIN_W), 1
        ).astype(jnp.float32)
        n = jnp.float32(n_real)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, S), 1)
        smask = (lane < n_real).astype(jnp.float32)
        transposed = mode in ("transposed", "fused", "tile16", "hat32", "nobuild")
        if transposed:
            rows_h = jax.lax.broadcasted_iota(
                jnp.int32, (WIN_H, M * S), 0
            ).astype(jnp.float32)
        else:
            row_ids = jax.lax.broadcasted_iota(
                jnp.int32, (M * S, WIN_H), 1
            ).astype(jnp.float32)

        for i in range(TILE_B):
            xs = xs_ref[i]
            ys = ys_ref[i]
            ix = jnp.floor(xs)
            fx = xs - ix
            if mode == "nobuild":
                E = jnp.full((M * S, WIN_W), 0.01, jnp.bfloat16)
                E2 = E
                wyT = jnp.full((WIN_H, M * S), 0.01, jnp.float32)
            else:
                E = (col_ids == ix[:, None]).astype(jnp.bfloat16)
                E2 = (col_ids == ix[:, None] + 1.0).astype(jnp.bfloat16)
                if transposed:
                    wyT = jnp.maximum(0.0, 1.0 - jnp.abs(ys[None, :] - rows_h))
                else:
                    wy = jnp.maximum(0.0, 1.0 - jnp.abs(ys[:, None] - row_ids))
            for m in range(M):
                row0 = pl.multiple_of(row0_ref[i, m], 8)
                x0 = pl.multiple_of(x0_ref[i, m], 128)
                roi = images_ref[pl.ds(row0, WIN_H), pl.ds(x0, WIN_W)]
                Em = E[m * S:(m + 1) * S]
                E2m = E2[m * S:(m + 1) * S]
                if not transposed:
                    left = jax.lax.dot_general(
                        Em, roi, dims, preferred_element_type=jnp.float32
                    )  # (S, WIN_H)
                    right = jax.lax.dot_general(
                        E2m, roi, dims, preferred_element_type=jnp.float32
                    )
                    fxm = fx[m * S:(m + 1) * S][:, None]
                    prof = left + fxm * (right - left)
                    tex_ref[m, :] = jnp.sum(
                        wy[m * S:(m + 1) * S] * prof, axis=1
                    )
                else:
                    if mode in ("fused", "tile16", "hat32"):
                        cat = jnp.concatenate([Em, E2m], axis=0)  # (2S, W)
                        both = jax.lax.dot_general(
                            roi, cat, dims, preferred_element_type=jnp.float32
                        )  # (WIN_H, 2S)
                        left = both[:, :S]
                        right = both[:, S:]
                    else:
                        left = jax.lax.dot_general(
                            roi, Em, dims, preferred_element_type=jnp.float32
                        )  # (WIN_H, S)
                        right = jax.lax.dot_general(
                            roi, E2m, dims, preferred_element_type=jnp.float32
                        )
                    fxm = fx[m * S:(m + 1) * S].reshape(1, S)
                    prof = left + fxm * (right - left)  # (WIN_H, S)
                    tex_ref[m, :] = jnp.sum(
                        wyT[:, m * S:(m + 1) * S] * prof, axis=0
                    )

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


def make_grad_variant(M, S, n_real, WIN_H, WIN_W, TILE_B, skip=()):
    """Transposed matmuls + horizontal-gradient image stack.

    right-left == (ROI column diff) @ E^T, so a precomputed gradient image
    replaces the E2 build entirely; E itself is built with bf16 compares
    (col ids and floor(x) are small integers — exact in bf16, and 16-bit
    packed VPU ops halve the build cost).
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    NCC_MIN_DENOM = 0.1
    dims = (((1,), (1,)), ((), ()))

    def kernel(row0_ref, x0_ref, xs_ref, ys_ref, img_ref, gimg_ref,
               out_ref, tex_ref):
        col_ids = jax.lax.broadcasted_iota(
            jnp.int32, (M * S, WIN_W), 1
        ).astype(jnp.float32)
        col_ids_bf = col_ids.astype(jnp.bfloat16)
        rows_h = jax.lax.broadcasted_iota(
            jnp.int32, (WIN_H, M * S), 0
        ).astype(jnp.float32)
        n = jnp.float32(n_real)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, S), 1)
        smask = (lane < n_real).astype(jnp.float32)

        for i in range(TILE_B):
            xs = xs_ref[i]
            ys = ys_ref[i]
            ix = jnp.floor(xs)
            fx = xs - ix
            E2 = None
            if "E" in skip:
                E = jnp.full((M * S, WIN_W), 0.01, jnp.bfloat16)
            elif "e2hat" in skip:
                # Both one-hots via the bf16 hat; no gradient image needed
                # (exact left/right columns like the shipped E/E2 design).
                xb = ix[:, None].astype(jnp.bfloat16)
                d = xb - col_ids_bf
                E = jnp.maximum(
                    jnp.bfloat16(0.0), jnp.bfloat16(1.0) - jnp.abs(d)
                )
                E2 = jnp.maximum(
                    jnp.bfloat16(0.0),
                    jnp.bfloat16(1.0) - jnp.abs(d + jnp.bfloat16(1.0)),
                )
            elif "bf16hat" in skip:
                # One-hot as a bf16 hat at integer points: ix and col ids
                # are small integers (exact in bf16), so max(0, 1 - |d|) is
                # the exact one-hot with NO compare and NO f32->bf16 cast
                # relayout (the measured dominant cost of the compare path).
                xb = ix[:, None].astype(jnp.bfloat16)
                E = jnp.maximum(
                    jnp.bfloat16(0.0),
                    jnp.bfloat16(1.0) - jnp.abs(xb - col_ids_bf),
                )
            else:
                E = (col_ids == ix[:, None]).astype(jnp.bfloat16)
            if "wy" in skip:
                wyT = jnp.full((WIN_H, M * S), 0.01, jnp.float32)
            else:
                wyT = jnp.maximum(0.0, 1.0 - jnp.abs(ys[None, :] - rows_h))
            for m in range(M):
                row0 = pl.multiple_of(row0_ref[i, m], 8)
                x0 = pl.multiple_of(x0_ref[i, m], 128)
                roi = img_ref[pl.ds(row0, WIN_H), pl.ds(x0, WIN_W)]
                groi = gimg_ref[pl.ds(row0, WIN_H), pl.ds(x0, WIN_W)]
                Em = E[m * S:(m + 1) * S]
                left = jax.lax.dot_general(
                    roi, Em, dims, preferred_element_type=jnp.float32
                )  # (WIN_H, S)
                if "grad" in skip:
                    prof = left
                elif E2 is not None:
                    right = jax.lax.dot_general(
                        roi, E2[m * S:(m + 1) * S], dims,
                        preferred_element_type=jnp.float32,
                    )
                    fxm = fx[m * S:(m + 1) * S].reshape(1, S)
                    prof = left + fxm * (right - left)
                else:
                    grad = jax.lax.dot_general(
                        groi, Em, dims, preferred_element_type=jnp.float32
                    )
                    fxm = fx[m * S:(m + 1) * S].reshape(1, S)
                    prof = left + fxm * grad
                if "sum" in skip:
                    tex_ref[m, :] = prof[0, :]
                else:
                    tex_ref[m, :] = jnp.sum(
                        wyT[:, m * S:(m + 1) * S] * prof, axis=0
                    )

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


def run_grad_variant(tile_b=8, win_h=56, skip=()):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    WIN_H, WIN_W = win_h, 128
    num_views, H, W = 8, 480, 640
    B, M, k = 4096, 8, 11
    S = 128
    reps = 20
    rng = np.random.default_rng(0)

    P = 2 * num_views
    Hp = H
    images = rng.uniform(0, 255, (P, Hp, W)).astype(np.float32)
    grad = np.concatenate(
        [images[:, :, 1:] - images[:, :, :-1], np.zeros((P, Hp, 1), np.float32)],
        axis=2,
    )
    flat = jnp.asarray(images.reshape(P * Hp, W)).astype(jnp.bfloat16)
    gflat = jnp.asarray(grad.reshape(P * Hp, W)).astype(jnp.bfloat16)
    y0 = rng.integers(0, (H - WIN_H) // 8, (B, M)).astype(np.int32) * 8
    views = rng.integers(0, P, (B, M)).astype(np.int32)
    row0 = jnp.asarray(views * Hp + y0)
    x0 = jnp.asarray(
        rng.integers(0, (W - WIN_W) // 128, (B, M)).astype(np.int32) * 128
    )
    xs = jnp.asarray(rng.uniform(10, 110, (B, M * S)).astype(np.float32))
    ys = jnp.asarray(
        rng.uniform(2, WIN_H - 6, (B, M * S)).astype(np.float32)
    )

    kernel = make_grad_variant(M, S, k * k, WIN_H, WIN_W, tile_b, skip)
    smem_spec = pl.BlockSpec((tile_b, M), lambda i: (i, 0), memory_space=pltpu.SMEM)
    coord_spec = pl.BlockSpec(
        (tile_b, M * S), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    img_spec = pl.BlockSpec(
        (P * Hp, W), lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, M), jnp.float32),
        grid=(B // tile_b,),
        in_specs=[smem_spec, smem_spec, coord_spec, coord_spec,
                  img_spec, img_spec],
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
            out = call(row0, x0, x, ys, flat, gflat)
            return acc + jnp.sum(out) * 1e-6
        return jax.lax.fori_loop(0, reps, body, 0.0)

    f = jax.jit(run)
    float(f(xs, 0.0))
    t = time.perf_counter()
    float(f(xs, 1.0))
    dt = (time.perf_counter() - t) / reps
    label = "grad" + ("-" + "-".join(skip) if skip else "")
    print(f"{label:16s} tile_b={tile_b:2d} win_h={WIN_H:2d}: {dt*1e3:7.2f} ms/call")


def run_variant(mode, tile_b=8, win_h=56):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    WIN_H, WIN_W = win_h, 128
    num_views, H, W = 8, 480, 640
    B, M, k = 4096, 8, 11
    S = 128
    reps = 20
    rng = np.random.default_rng(0)

    P = 2 * num_views
    Hp = H
    images = rng.uniform(0, 255, (P, Hp, W)).astype(np.float32)
    flat = jnp.asarray(images.reshape(P * Hp, W)).astype(jnp.bfloat16)
    y0 = rng.integers(0, (H - WIN_H) // 8, (B, M)).astype(np.int32) * 8
    views = rng.integers(0, P, (B, M)).astype(np.int32)
    row0 = jnp.asarray(views * Hp + y0)
    x0 = jnp.asarray(
        rng.integers(0, (W - WIN_W) // 128, (B, M)).astype(np.int32) * 128
    )
    xs = jnp.asarray(rng.uniform(10, 110, (B, M * S)).astype(np.float32))
    ys = jnp.asarray(
        rng.uniform(2, WIN_H - 6, (B, M * S)).astype(np.float32)
    )

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
    print(f"{mode:10s} tile_b={tile_b:2d} win_h={WIN_H:2d}: {dt*1e3:7.2f} ms/call")


def main():
    run_variant("onehot")
    run_variant("transposed")
    run_variant("fused")
    run_variant("nobuild")
    run_variant("tile16", tile_b=16)
    run_variant("hat32", win_h=32)


if __name__ == "__main__":
    main()
