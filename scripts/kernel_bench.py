"""Microbenchmark the fused warp+NCC kernel and the objective eval on TPU.

Times three levels of the hot path at bench.py shapes (B=4096, V=8, k=11):
  1. warp_ncc_scores        — the Pallas kernel alone
  2. patch_ncc_scores_fused — kernel + XLA geometry (projections, frames)
  3. one full objective eval inside the NM loop shape

Protocol: REPS inside one jitted fori_loop with per-iteration perturbation
(the tunnel memoizes identical dispatches); a scalar from all outputs is
fetched to force completion.
"""
from __future__ import annotations

import sys, time
sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from densepoints_tpu.core.cameras import Cameras
    from densepoints_tpu.ops.warp_ncc import (
        WIN_H,
        WIN_W,
        patch_ncc_scores_fused,
        warp_ncc_scores,
    )

    rng = np.random.default_rng(0)
    num_views, H, W = 8, 480, 640
    B, M, k = 4096, 8, 11
    S = -(-(k * k) // 128) * 128
    reps = 20

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
    images2 = jnp.concatenate(
        [images, jnp.pad(images[:, :, 64:], ((0, 0), (0, 0), (0, 64)))], axis=0
    )

    # --- level 1: kernel alone --------------------------------------------
    y0 = jnp.asarray(
        rng.integers(0, (H - WIN_H) // 8, (B, M)).astype(np.int32) * 8
    )
    m64 = rng.integers(0, (W - WIN_W) // 64, (B, M)).astype(np.int32)
    phase = m64 % 2
    x0 = jnp.asarray(64 * (m64 - phase))
    views = jnp.asarray(
        rng.integers(0, num_views, (B, M)).astype(np.int32) + phase * num_views
    )
    coords = jnp.asarray(
        rng.uniform(10, 40, (B, M, 2, S)).astype(np.float32)
    )

    def run_kernel(coords, seed):
        def body(i, acc):
            c = coords + (seed + i.astype(jnp.float32)) * 1e-3
            out = warp_ncc_scores(images2, y0, x0, views, c, k * k)
            return acc + jnp.sum(out) * 1e-6
        return jax.lax.fori_loop(0, reps, body, 0.0)

    f1 = jax.jit(run_kernel)
    float(f1(coords, 0.0))
    t = time.perf_counter()
    float(f1(coords, 1.0))
    dt1 = (time.perf_counter() - t) / reps
    print(f"kernel alone:       {dt1*1e3:8.2f} ms/call  "
          f"({B*M/dt1/1e6:.1f}M slot-scores/s)")

    # --- level 2: full scoring pass (geometry + kernel) -------------------
    xy = rng.uniform(-1.0, 1.0, (B, 2))
    position = jnp.asarray(
        np.concatenate([xy, np.zeros((B, 1))], 1).astype(np.float32)
    )
    normal = jnp.asarray(np.tile([0.0, 0.0, 1.0], (B, 1)).astype(np.float32))
    refs = jnp.zeros((B,), jnp.int32)
    vis = np.ones((B, num_views), bool)
    vis[:, 0] = False
    vis = jnp.asarray(vis)

    def run_full(position, seed):
        def body(i, acc):
            p = position + (seed + i.astype(jnp.float32)) * 1e-4
            s, _, _ = patch_ncc_scores_fused(
                images, cams, p, normal, refs, vis, k, max_score_views=M
            )
            return acc + jnp.sum(s) * 1e-6
        return jax.lax.fori_loop(0, reps, body, 0.0)

    f2 = jax.jit(run_full)
    float(f2(position, 0.0))
    t = time.perf_counter()
    float(f2(position, 1.0))
    dt2 = (time.perf_counter() - t) / reps
    print(f"full scoring pass:  {dt2*1e3:8.2f} ms/call  "
          f"(XLA geometry overhead {max(dt2-dt1,0)*1e3:.2f} ms)")

    # roofline context
    flops = B * M * 2 * (2 * S * WIN_W * WIN_H)  # hi+lo matmuls
    dma = B * M * WIN_H * WIN_W * 4
    print(f"per-call matmul work: {flops/1e9:.1f} GFLOP bf16 "
          f"(ideal ~{flops/197e12*1e3:.2f} ms), window DMA {dma/1e6:.0f} MB "
          f"(ideal ~{dma/819e9*1e3:.2f} ms)")


if __name__ == "__main__":
    main()
