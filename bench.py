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

    def run(state, seed):
        def body(i, acc):
            jitter = (seed + i.astype(jnp.float32)) * 1e-4
            s = dataclasses.replace(
                state, position=state.position + jitter
            )
            out = optimize_patches(images, cams, s, texture_size, cfg)
            return acc + jnp.sum(out.position) * 1e-9
        return jax.lax.fori_loop(0, reps, body, 0.0)

    fn = jax.jit(run)
    float(fn(state, 0.0))  # compile + first run
    start = time.perf_counter()
    # Different seed -> different call signature for the runtime's memo
    # cache; the scalar fetch forces completion of all reps.
    float(fn(state, 1.0))
    elapsed = time.perf_counter() - start

    pps = num_patches * reps / elapsed
    print(
        json.dumps(
            {
                "metric": "patches_per_sec",
                "value": round(pps, 1),
                "unit": "patches/s",
                "vs_baseline": round(pps / NOMINAL_BASELINE_PATCHES_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
