"""Headline benchmark: END-TO-END densification throughput on one chip.

Prints ONE JSON line (the last line wins; an identical-schema early line
is emitted before the slow e2e section so driver timeouts still carry a
parseable result):

  {"metric": "e2e_patches_per_sec", "value": N, "unit": "patches/s",
   "vs_baseline": R, ...}

vs_baseline compares against the 100 patches/s end-to-end bar set by the
round-3 verdict ("e2e >= 100 patches/s"); the reference itself publishes
no numbers (BASELINE.md) and cannot run at all (its pipeline is
unfinished, reference README.md:3).

Components measured (all on the real chip):
  * refine_patches_per_sec — batched Nelder-Mead refinement throughput at
    the classic bench shape (8 views, 4096 patches, texture 11, 30 NM
    iters): the round-1..3 headline, kept for cross-round comparability
    (old nominal: 10k patches/s).
  * kernel — the round-4 paged warp+NCC kernel at the same shape:
    ms per all-views scoring pass and fraction of the issued-flop MXU
    roofline (see scripts/kernel_roofline.py for the bound model).
  * e2e — seed points -> refine -> expand -> filter -> color on a
    textured-sphere scene (12 views, 512x384), warm-run timed with stage
    breakdown; compile overhead = cold minus warm.

Measurement protocol: the remote-tunnel runtime memoizes identical calls
and completes dispatches lazily, so repetitions run INSIDE one jitted
fori_loop with per-iteration input perturbation, and a scalar derived
from every repetition's output is fetched to force completion.
"""
from __future__ import annotations

import json
import time

import numpy as np

E2E_BASELINE_PATCHES_PER_SEC = 100.0  # VERDICT r3 task 1 bar
REFINE_NOMINAL_PATCHES_PER_SEC = 10_000.0  # rounds 1-3 ladder entry bar


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
    float(fn(images, cams, state, 1.0))
    refine_pps = num_patches * reps / (time.perf_counter() - start)

    # --- paged kernel: one all-views scoring pass at the refine shape ---
    from densepoints_tpu.ops.warp_ncc_paged import paged_all_scores

    kreps = 20

    # Bucketed payload-slot bound, as the production _sliced path passes
    # (without it the plan sizes to B*V and pads the kernel grid).
    nslots_bound = 512
    while nslots_bound < int(vis.sum()):
        nslots_bound *= 2

    def krun(images, position, normal, refs, vis, seed):
        from densepoints_tpu.pmvs.optimize import _paged_loop_invariants

        pages, plan, plan_a = _paged_loop_invariants(
            images, vis, nslots_bound
        )

        def body(i, acc):
            p = position + (seed + i.astype(jnp.float32)) * 1e-4
            scores, _, _ = paged_all_scores(
                images, cams, p, normal, refs, vis, texture_size,
                pages=pages, plan=plan, plan_a=plan_a,
            )
            return acc + jnp.sum(scores) * 1e-6

        return jax.lax.fori_loop(0, kreps, body, 0.0)

    kfn = jax.jit(krun)
    args = (
        images,
        jnp.asarray(position),
        jnp.asarray(normal),
        jnp.asarray(refs),
        jnp.asarray(vis),
    )
    float(kfn(*args, 0.0))
    t = time.perf_counter()
    float(kfn(*args, 1.0))
    kdt = (time.perf_counter() - t) / kreps
    n_slots = int(vis.sum()) + num_patches  # payload + anchor passes
    # Issued-flop MXU bound (two one-hot matmuls per slot, bf16).
    from densepoints_tpu.ops.warp_ncc import WIN_H, WIN_W

    S = -(-(texture_size * texture_size) // 128) * 128
    flops = n_slots * 2 * (2 * WIN_H * WIN_W * S)
    t_mxu = flops / 197e12

    early = {
        "metric": "e2e_patches_per_sec",
        "value": None,  # filled by the full line below
        "unit": "patches/s",
        "vs_baseline": None,
        "refine_patches_per_sec": round(refine_pps, 1),
        "refine_vs_10k_nominal": round(
            refine_pps / REFINE_NOMINAL_PATCHES_PER_SEC, 3
        ),
        "kernel_ms_per_pass": round(kdt * 1e3, 3),
        "kernel_slot_scores_per_sec": round(n_slots / kdt, 0),
        "fraction_of_roofline": round(t_mxu / kdt, 3),
    }
    # Early insurance line: if the e2e section is cut short by an external
    # timeout, the tail still carries the kernel/refine numbers. Emitted
    # under its OWN metric name (refine throughput vs its own nominal) so
    # a truncated run can never be mistaken for an e2e result.
    early_line = dict(early)
    early_line["metric"] = "refine_patches_per_sec"
    early_line["unit"] = "patches/s"
    early_line["value"] = round(refine_pps, 1)
    early_line["vs_baseline"] = round(
        refine_pps / REFINE_NOMINAL_PATCHES_PER_SEC, 3
    )
    early_line["note"] = "early line: e2e section pending"
    print(json.dumps(early_line), flush=True)

    # --- end-to-end densify throughput --------------------------------
    # Textured sphere (the DTU-scale scene family at bench size) from
    # seed points through refine -> expand -> filter -> color; the warm
    # run is the throughput number, cold-warm the compile overhead.
    import pathlib
    import sys as _sys

    _sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent / "tests"))
    from synthetic import TexturedSphereScene

    from densepoints_tpu.config import load_config
    from densepoints_tpu.io.scene import Scene
    from densepoints_tpu.pmvs.pipeline import _densify_from
    from densepoints_tpu.pmvs.seed import create_patches_from_points
    from densepoints_tpu.pmvs.optimize import filter_by_error
    from densepoints_tpu.utils import StageMetrics

    # The DENSE regime at bench size: the object fills ~60% of the frame
    # (patch throughput is what the framework is for; a tiny object makes
    # fixed per-stage costs dominate and measures nothing).
    sc = TexturedSphereScene(
        rng, num_views=12, width=512, height=384, focal=450.0,
        radius=150.0, cam_radius=500.0, tex_size=2048, layout="grid",
        yaw_span=0.9, pitch_span=0.45,
    )
    dcams = Cameras.from_projection_matrices(
        sc.P, widths=sc.width, heights=sc.height
    )
    dscene = Scene(cameras=dcams, images=sc.render_all(), colors=None)
    g_rng = np.random.default_rng(7)
    seeds = g_rng.standard_normal((3000, 3)).astype(np.float32)
    seeds *= 150.0 / np.linalg.norm(seeds, axis=1, keepdims=True)
    dcfg = load_config(
        {
            "profile": "scan",
            "expand": {"max_rounds": 4, "max_iterations": 40},
            "optimize": {"max_iterations": 120},
            "organizer": {"grid_scale": 4},
        }
    )

    def one_densify(jitter):
        t0 = time.perf_counter()
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
        metrics = StageMetrics()
        result = _densify_from(
            dimages, dcams, dscene, dcfg, metrics, st, "seeds_optimized"
        )
        return result, metrics, time.perf_counter() - t0

    _, _, ddt_cold = one_densify(0.0)  # includes all stage compiles
    result, metrics, ddt = one_densify(1e-4)  # warm: the throughput run
    n_final = result.patches.capacity
    e2e_pps = n_final / ddt

    full = dict(early)
    full["value"] = round(e2e_pps, 1)
    full["vs_baseline"] = round(e2e_pps / E2E_BASELINE_PATCHES_PER_SEC, 3)
    full.update(
        {
            "densify_seconds": round(ddt, 2),
            "densify_cold_seconds": round(ddt_cold, 2),
            "compile_overhead_seconds": round(ddt_cold - ddt, 2),
            "densify_patches_final": n_final,
            "stage_seconds": {
                k: round(v, 2) for k, v in metrics.times.items()
            },
            "e2e_scene": {
                "views": 12, "width": 512, "height": 384,
                "object_frame_fill": "~60%", "grid_scale": 4,
            },
        }
    )
    print(json.dumps(full), flush=True)


if __name__ == "__main__":
    main()
