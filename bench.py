"""Headline benchmark: photometric patch-refinement throughput on one chip.

Prints ONE JSON line:
  {"metric": "patches_per_sec", "value": N, "unit": "patches/s",
   "vs_baseline": R}

The metric is end-to-end refine throughput — batched Nelder-Mead over
(depth, roll, pitch) with the full warp+NCC objective (texture 11, 30 NM
iterations, 8 views per patch) — the work the reference does per patch in
`OptimizationOpenCV::Optimize` (optimization_opencv.cpp:44-78), measured in
patches/second.

Measurement protocol: the remote-tunnel runtime memoizes identical calls
and completes dispatches lazily, so REPS repetitions run INSIDE one jitted
fori_loop with per-iteration input perturbation, and a scalar derived from
every repetition's output is fetched to the host to force completion.

The reference publishes no numbers (BASELINE.md), so vs_baseline is
measured against a fixed nominal target of 10_000 patches/s/chip (the
BASELINE.json ladder's entry bar); values > 1 beat it.
"""
from __future__ import annotations

import json
import time

import numpy as np

NOMINAL_BASELINE_PATCHES_PER_SEC = 10_000.0


def main():
    import jax
    import jax.numpy as jnp

    from densepoints_tpu.config import OptimizeConfig
    from densepoints_tpu.core.cameras import Cameras
    from densepoints_tpu.pmvs.optimize import optimize_patches
    from densepoints_tpu.pmvs.patch import PatchState

    rng = np.random.default_rng(0)
    num_views, H, W = 8, 480, 640
    num_patches = 4096
    texture_size = 11
    nm_iters = 30
    reps = 4

    K = np.array([[500.0, 0, W / 2], [0, 500.0, H / 2], [0, 0, 1]])
    Ps = []
    for i in range(num_views):
        ang = (i - (num_views - 1) / 2) * 0.12
        C = np.array([6.0 * np.sin(ang), 0.2 * np.sin(2 * i), -6.0 * np.cos(ang)])
        z = -C / np.linalg.norm(C)
        x = np.cross([0.0, 1.0, 0.0], z)
        x /= np.linalg.norm(x)
        y = np.cross(z, x)
        R = np.stack([x, y, z])
        Ps.append(K @ np.concatenate([R, (-R @ C)[:, None]], 1))
    cams = Cameras.from_projection_matrices(np.stack(Ps), widths=W, heights=H)
    images = jnp.asarray(rng.uniform(0, 255, (num_views, H, W)).astype(np.float32))

    xy = rng.uniform(-1.0, 1.0, (num_patches, 2))
    position = np.concatenate([xy, np.zeros((num_patches, 1))], 1).astype(np.float32)
    normal = np.tile([0.0, 0.0, 1.0], (num_patches, 1)).astype(np.float32)
    refs = np.zeros((num_patches,), np.int32)
    vis = np.ones((num_patches, num_views), bool)
    vis[:, 0] = False
    state = PatchState.create(position, normal, refs, vis)
    cfg = OptimizeConfig(max_iterations=nm_iters)

    import dataclasses

    # images/cameras are jit OPERANDS (closure-captured arrays embed as
    # constants in the program the tunnel ships to its remote compiler).
    def run(images, cams, state, seed):
        def body(i, acc):
            jitter = (seed + i.astype(jnp.float32)) * 1e-4
            s = dataclasses.replace(
                state, position=state.position + jitter
            )
            out = optimize_patches(images, cams, s, texture_size, cfg)
            return acc + jnp.sum(out.position) * 1e-9
        return jax.lax.fori_loop(0, reps, body, 0.0)

    fn = jax.jit(run)
    float(fn(images, cams, state, 0.0))  # compile + first run
    start = time.perf_counter()
    # Different seed -> different call signature for the runtime's memo
    # cache; the scalar fetch forces completion of all reps.
    float(fn(images, cams, state, 1.0))
    elapsed = time.perf_counter() - start

    pps = num_patches * reps / elapsed

    # --- kernel roofline fraction (VERDICT r2 task 4) -------------------
    # Time the fused kernel alone at the refine shape and compare against
    # the analytic issue bounds (same model as scripts/kernel_roofline.py:
    # MXU = one-hot gather matmuls at 197 TFLOP/s bf16; the VPU estimate
    # covers the hat builds/blends the matmuls depend on).
    from densepoints_tpu.ops.warp_ncc import WIN_H, WIN_W, warp_ncc_scores

    M = 8
    S = -(-(texture_size * texture_size) // 128) * 128
    images2 = jnp.concatenate(
        [images, jnp.pad(images[:, :, 64:], ((0, 0), (0, 0), (0, 64)))],
        axis=0,
    )
    kr = np.random.default_rng(1)
    y0 = jnp.asarray(kr.integers(0, (H - WIN_H) // 8,
                                 (num_patches, M)).astype(np.int32) * 8)
    m64 = kr.integers(0, (W - WIN_W) // 64, (num_patches, M)).astype(np.int32)
    x0 = jnp.asarray(64 * (m64 - m64 % 2))
    views = jnp.asarray(
        kr.integers(0, num_views, (num_patches, M)).astype(np.int32)
        + (m64 % 2) * num_views
    )
    coords = jnp.asarray(
        kr.uniform(10, 40, (num_patches, M, 2, S)).astype(np.float32)
    )

    def kbody(images2, y0, x0, views, coords, seed):
        def body(i, acc):
            c = coords + (seed + i.astype(jnp.float32)) * 1e-3
            out = warp_ncc_scores(
                images2, y0, x0, views, c, texture_size * texture_size
            )
            return acc + jnp.sum(out) * 1e-6
        return jax.lax.fori_loop(0, 20, body, 0.0)

    kfn = jax.jit(kbody)
    float(kfn(images2, y0, x0, views, coords, 0.0))
    t = time.perf_counter()
    float(kfn(images2, y0, x0, views, coords, 1.0))
    kdt = (time.perf_counter() - t) / 20
    flops = num_patches * M * 2 * (2 * WIN_H * WIN_W * S)
    t_mxu = flops / 197e12
    vpu_ops = num_patches * (
        8 * M * S * WIN_W + 4 * WIN_H * M * S + M * 5 * WIN_H * S
        + 10 * M * S
    )
    t_vpu = vpu_ops / 4e12

    # Emit the headline line NOW: the densify section below adds minutes
    # of stage compiles, and if an external timeout cuts the run short the
    # tail still carries a parseable result (the full line re-prints last).
    print(
        json.dumps(
            {
                "metric": "patches_per_sec",
                "value": round(pps, 1),
                "unit": "patches/s",
                "vs_baseline": round(pps / NOMINAL_BASELINE_PATCHES_PER_SEC, 3),
                "kernel_ms_per_call": round(kdt * 1e3, 3),
                "fraction_of_roofline": round(t_mxu / kdt, 3),
                "fraction_of_compute_bound": round((t_mxu + t_vpu) / kdt, 3),
            }
        ),
        flush=True,
    )

    # --- end-to-end densify throughput (VERDICT r2 weak #5) -------------
    # Seeded textured plane through refine -> expand -> insert -> filter
    # (detection skipped: seed_points injected, keeping the bench bounded;
    # the kernel path above is the same one seeding exercises).
    import pathlib
    import sys as _sys

    _sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent / "tests"))
    from synthetic import TexturedPlaneScene

    from densepoints_tpu.config import load_config
    from densepoints_tpu.io.scene import Scene

    sc = TexturedPlaneScene(rng, num_views=5, width=320, height=240)
    dcams = Cameras.from_projection_matrices(
        sc.P, widths=sc.width, heights=sc.height
    )
    dscene = Scene(cameras=dcams, images=sc.render_all(), colors=None)
    g = np.linspace(-0.6, 0.6, 32)
    gx, gy = np.meshgrid(g, g)
    seeds = np.stack(
        [gx.ravel(), gy.ravel(), np.zeros(gx.size)], 1
    ).astype(np.float32)
    dcfg = load_config(
        {"expand": {"max_rounds": 3}, "optimize": {"max_iterations": 60}}
    )
    from densepoints_tpu.pmvs.pipeline import _densify_from
    from densepoints_tpu.pmvs.seed import create_patches_from_points
    from densepoints_tpu.pmvs.optimize import (
        filter_by_error,
        optimize_patches,
    )
    from densepoints_tpu.utils import StageMetrics

    def one_densify(jitter):
        # Per-run input perturbation: the remote tunnel memoizes identical
        # dispatches, so a byte-identical warm run would be free.
        t = time.perf_counter()
        dimages = jnp.asarray(dscene.images)
        st = create_patches_from_points(
            dcams, seeds + jitter, dcfg.optimize, dcfg.seed
        )
        st = filter_by_error(
            dimages, dcams, st, dcfg.seed.texture_size, dcfg.optimize
        ).compact()
        st = optimize_patches(
            dimages, dcams, st, dcfg.seed.texture_size, dcfg.optimize
        )
        result = _densify_from(
            dimages, dcams, dscene, dcfg, StageMetrics(), st,
            "seeds_optimized",
        )
        return result, time.perf_counter() - t

    result, ddt_cold = one_densify(0.0)  # includes all stage compiles
    result, ddt = one_densify(1e-4)  # warm: the actual throughput number
    n_final = result.patches.capacity

    print(
        json.dumps(
            {
                "metric": "patches_per_sec",
                "value": round(pps, 1),
                "unit": "patches/s",
                "vs_baseline": round(pps / NOMINAL_BASELINE_PATCHES_PER_SEC, 3),
                "kernel_ms_per_call": round(kdt * 1e3, 3),
                "kernel_bound_ms": {
                    "mxu": round(t_mxu * 1e3, 3),
                    "vpu_model": round(t_vpu * 1e3, 3),
                },
                "fraction_of_roofline": round(t_mxu / kdt, 3),
                "fraction_of_compute_bound": round((t_mxu + t_vpu) / kdt, 3),
                "densify_seconds": round(ddt, 2),
                "densify_cold_seconds": round(ddt_cold, 2),
                "densify_patches_final": n_final,
                "densify_patches_per_sec": round(n_final / ddt, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
