"""Ablation of the PAGED kernel's inner compute on the real TPU.

Round-4 standing (KERNEL_r04.json): 0.074-0.118 of the issued-flop MXU
roofline. Analysis: each slot issues two serial (WIN_H=56,128)x(128,128)
dots — N=128 engages ~one MXU pipe of the chip's ~6.4 (197e12 / one
128x128 MXU's 30.8e12 at 940 MHz), so the kernel's cap with this dot
shape is ~0.15 no matter how tight the rest gets. Wider dots are the
lever. Variants (timing-only mirrors of ops/warp_ncc_paged.py's step
kernel; same data movement, synthetic slot geometry):

  shipped — the round-4/5 inner loop: 2 dots/slot, N=128 each
  fused   — one dot/slot with RHS [E|E2] (N=256)
  pack2   — 2 slots/dot: LHS [roi_a|roi_b] (56,256), block-diag RHS
            (2S x 2*WIN_W per one-hot pair) -> N=512, K=256
  pack4   — 4 slots/dot -> N=1024, K=512 (zeros cost issued flops but
            engage all MXU pipes)
  nobuild — `fused` with constant hats (bounds the VPU hat-build cost)

Reports ms/eval and fraction of the USEFUL-flop roofline (the KERNEL_r04
model: 2 one-hot matmuls x 2*WIN_H*WIN_W*S per real slot) at the bench
and expand shapes. Writes KERNEL_ABLATE_r05.json.
"""
from __future__ import annotations

import functools
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

WIN_H = 56
WIN_W = 128
GROUP = 16
STEP_ROWS = 8
STEP = GROUP * STEP_ROWS


def make_call(mode: str, nsteps: int, R: int, S: int, k: int):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_real = k * k
    dims = (((1,), (1,)), ((), ()))

    def kernel(tbl_ref, row0_ref, xs_ref, ys_ref, page_ref, ctex_ref):
        step_live = tbl_ref[pl.program_id(0)] >= 0
        col_ids_bf = jax.lax.broadcasted_iota(
            jnp.int32, (GROUP * S, WIN_W), 1
        ).astype(jnp.float32).astype(jnp.bfloat16)
        rows_h = jax.lax.broadcasted_iota(
            jnp.int32, (WIN_H, GROUP * S), 0
        ).astype(jnp.float32)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, S), 1)
        smask = (lane < n_real).astype(jnp.float32)
        n = jnp.float32(n_real)
        zeroS = jnp.zeros((S, WIN_W), jnp.bfloat16)

        def finish(j, i, tex):
            m = jnp.sum(tex) / n
            ctex_ref[j * GROUP + i, :] = ((tex - m) * smask).reshape(S)

        def run_rows():
            for j in range(STEP_ROWS):
                xs = xs_ref[j]
                ys = ys_ref[j]
                ix = jnp.floor(xs)
                fx = xs - ix
                if mode == "nobuild":
                    E = jnp.full((GROUP * S, WIN_W), 0.01, jnp.bfloat16)
                    E2 = E
                else:
                    d = ix[:, None].astype(jnp.bfloat16) - col_ids_bf
                    E = jnp.maximum(
                        jnp.bfloat16(0.0), jnp.bfloat16(1.0) - jnp.abs(d)
                    )
                    E2 = jnp.maximum(
                        jnp.bfloat16(0.0),
                        jnp.bfloat16(1.0) - jnp.abs(d + jnp.bfloat16(1.0)),
                    )
                wyT = jnp.maximum(0.0, 1.0 - jnp.abs(ys[None, :] - rows_h))

                if mode == "shipped":
                    for i in range(GROUP):
                        row0 = pl.multiple_of(row0_ref[j, i], 8)
                        roi = page_ref[pl.ds(row0, WIN_H), :]
                        left = jax.lax.dot_general(
                            roi, E[i * S : (i + 1) * S], dims,
                            preferred_element_type=jnp.float32,
                        )
                        right = jax.lax.dot_general(
                            roi, E2[i * S : (i + 1) * S], dims,
                            preferred_element_type=jnp.float32,
                        )
                        fxm = fx[i * S : (i + 1) * S].reshape(1, S)
                        prof = left + fxm * (right - left)
                        tex = jnp.sum(
                            wyT[:, i * S : (i + 1) * S] * prof, axis=0
                        ).reshape(1, S) * smask
                        finish(j, i, tex)
                elif mode in ("fused", "nobuild"):
                    for i in range(GROUP):
                        row0 = pl.multiple_of(row0_ref[j, i], 8)
                        roi = page_ref[pl.ds(row0, WIN_H), :]
                        rhs = jnp.concatenate(
                            [E[i * S : (i + 1) * S], E2[i * S : (i + 1) * S]],
                            axis=0,
                        )  # (2S, WIN_W)
                        both = jax.lax.dot_general(
                            roi, rhs, dims,
                            preferred_element_type=jnp.float32,
                        )  # (WIN_H, 2S)
                        left = both[:, :S]
                        right = both[:, S:]
                        fxm = fx[i * S : (i + 1) * S].reshape(1, S)
                        prof = left + fxm * (right - left)
                        tex = jnp.sum(
                            wyT[:, i * S : (i + 1) * S] * prof, axis=0
                        ).reshape(1, S) * smask
                        finish(j, i, tex)
                elif mode in ("pack2", "pack4"):
                    p = 2 if mode == "pack2" else 4
                    for i0 in range(0, GROUP, p):
                        rois = [
                            page_ref[
                                pl.ds(
                                    pl.multiple_of(row0_ref[j, i0 + t], 8),
                                    WIN_H,
                                ),
                                :,
                            ]
                            for t in range(p)
                        ]
                        lhs = jnp.concatenate(rois, axis=1)  # (WIN_H, p*128)
                        # Block-diagonal RHS: slot t's [E; E2] occupies
                        # K-columns t*128:(t+1)*128, N-rows t*2S:(t+1)*2S.
                        blocks = []
                        for t in range(p):
                            sl = slice((i0 + t) * S, (i0 + t + 1) * S)
                            pair = jnp.concatenate([E[sl], E2[sl]], axis=0)
                            row = jnp.concatenate(
                                [pair if u == t else
                                 jnp.concatenate([zeroS, zeroS], axis=0)
                                 for u in range(p)],
                                axis=1,
                            )  # (2S, p*WIN_W)
                            blocks.append(row)
                        rhs = jnp.concatenate(blocks, axis=0)  # (p*2S, p*128)
                        out = jax.lax.dot_general(
                            lhs, rhs, dims,
                            preferred_element_type=jnp.float32,
                        )  # (WIN_H, p*2S)
                        for t in range(p):
                            i = i0 + t
                            left = out[:, t * 2 * S : t * 2 * S + S]
                            right = out[:, t * 2 * S + S : (t + 1) * 2 * S]
                            fxm = fx[i * S : (i + 1) * S].reshape(1, S)
                            prof = left + fxm * (right - left)
                            tex = jnp.sum(
                                wyT[:, i * S : (i + 1) * S] * prof, axis=0
                            ).reshape(1, S) * smask
                            finish(j, i, tex)
                else:
                    raise ValueError(mode)

        pl.when(step_live)(run_rows)

    npad = nsteps * STEP
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nsteps,),
        in_specs=[
            pl.BlockSpec(
                (STEP_ROWS, GROUP), lambda g, tbl: (g, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec((STEP_ROWS, GROUP * S), lambda g, tbl: (g, 0)),
            pl.BlockSpec((STEP_ROWS, GROUP * S), lambda g, tbl: (g, 0)),
            pl.BlockSpec(
                (None, R, 128), lambda g, tbl: (jnp.maximum(tbl[g], 0), 0, 0)
            ),
        ],
        out_specs=pl.BlockSpec((STEP, S), lambda g, tbl: (g, 0)),
    )
    return functools.partial(
        pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((npad, S), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
        )
    )


def run_shape(name, n_slots, V, R, k, reps=30):
    import jax
    import jax.numpy as jnp

    S = -(-(k * k) // 128) * 128
    nsteps = -(-n_slots // STEP)
    npad = nsteps * STEP
    rng = np.random.default_rng(0)
    pages = jnp.asarray(
        rng.uniform(0, 255, (V, R, 128)).astype(np.float32)
    ).astype(jnp.bfloat16)
    tbl = jnp.asarray(
        (np.arange(nsteps) * V // nsteps).astype(np.int32)
    )
    row0 = jnp.asarray(
        (rng.integers(0, (R - WIN_H) // 8, (nsteps * STEP_ROWS, GROUP)) * 8)
        .astype(np.int32)
    )
    xs = jnp.asarray(
        rng.uniform(0, WIN_W - 1.01, (nsteps * STEP_ROWS, GROUP * S))
        .astype(np.float32)
    )
    ys = jnp.asarray(
        rng.uniform(0, WIN_H - 1.01, (nsteps * STEP_ROWS, GROUP * S))
        .astype(np.float32)
    )

    # Useful-flop roofline (KERNEL_r04 model): 2 one-hot matmuls per slot.
    t_mxu = npad * 2 * (2 * WIN_H * WIN_W * S) / 197e12

    # Harness floor: measure an empty fori_loop at the same fetch size.
    def floor_fn(seed):
        def body(i, acc):
            return acc + seed + jnp.float32(i)
        return jax.lax.fori_loop(0, reps, body, 0.0)

    ffn = jax.jit(floor_fn)
    float(ffn(0.0))
    t0 = time.perf_counter()
    float(ffn(1.0))
    floor = (time.perf_counter() - t0) / reps

    out = {}
    ref = None
    for mode in ("shipped", "fused", "pack2", "pack4", "nobuild"):
        call = make_call(mode, nsteps, R, S, k)

        def rep_fn(xs, ys, seed):
            def body(i, acc):
                x = xs + (seed + i.astype(jnp.float32)) * 1e-6
                ctex = call(tbl, row0, x, ys, pages)
                return acc + jnp.sum(ctex[:, 0]) * 1e-6
            return jax.lax.fori_loop(0, reps, body, 0.0)

        fn = jax.jit(rep_fn)
        try:
            tc = time.perf_counter()
            float(fn(xs, ys, 0.0))
            compile_s = time.perf_counter() - tc
            t0 = time.perf_counter()
            float(fn(xs, ys, 1.0))
            dt = (time.perf_counter() - t0) / reps - floor
            # Correctness vs shipped (one un-jittered eval).
            got = np.asarray(call(tbl, row0, xs, ys, pages))
            if mode == "shipped":
                ref = got
            err = (
                float(np.max(np.abs(got - ref))) if ref is not None else -1.0
            )
            out[mode] = {
                "ms_per_eval": round(dt * 1e3, 3),
                "ns_per_slot": round(dt / npad * 1e9, 1),
                "fraction_of_useful_roofline": round(t_mxu / dt, 3),
                "max_abs_err_vs_shipped": err,
                "compile_s": round(compile_s, 1),
            }
        except Exception as e:  # noqa: BLE001 - report and continue
            out[mode] = {"error": str(e)[:300]}
        print(name, mode, out[mode], flush=True)
    return {
        "shape": name, "slots": npad, "views": V, "texture": k,
        "floor_ms": round(floor * 1e3, 3), "modes": out,
    }


def main():
    results = [
        run_shape("bench_b4096_v8", 4096 * 7, 8, 512, 11),
        run_shape("expand_b4096_v50", 4096 * 25, 50, 1216, 11),
    ]
    path = (
        pathlib.Path(__file__).resolve().parent.parent
        / "KERNEL_ABLATE_r05.json"
    )
    path.write_text(json.dumps({"device": "TPU v5 lite", "shapes": results},
                               indent=1))
    print(json.dumps(results))


if __name__ == "__main__":
    main()
