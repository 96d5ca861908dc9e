"""Paged (view-sorted) kernel vs the round-3 chunked fused path, on-chip.

Measures "score every visible view of B patches against the anchor" —
the unit of work one filter pass / one NM objective evaluation performs —
for the OLD path (anchor-pinned chunks of the DMA/resident fused kernel,
exactly what _filter_by_error_jit dispatches) and the NEW paged path
(ops/warp_ncc_paged.paged_all_scores).

Protocol per the axon-tunnel rules: operands not closures; REPS inside a
jitted fori_loop with per-iteration position perturbation; scalar fetch
forces completion. One shape at a time (the tunnel serializes jobs).
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def make_scene(rng, num_views, H, W, spread=0.12):
    from densepoints_tpu.core.cameras import Cameras

    K = np.array([[0.8 * W, 0, W / 2], [0, 0.8 * W, H / 2], [0, 0, 1.0]])
    Ps = []
    for i in range(num_views):
        ang = (i - (num_views - 1) / 2) * spread
        C = np.array(
            [6.0 * np.sin(ang), 0.25 * np.sin(2.1 * i), -6.0 * np.cos(ang)]
        )
        z = -C / np.linalg.norm(C)
        x = np.cross([0.0, 1.0, 0.0], z)
        x /= np.linalg.norm(x)
        y = np.cross(z, x)
        R = np.stack([x, y, z])
        Ps.append(K @ np.concatenate([R, (-R @ C)[:, None]], 1))
    cams = Cameras.from_projection_matrices(np.stack(Ps), widths=W, heights=H)
    images = rng.uniform(0, 255, (num_views, H, W)).astype(np.float32)
    return cams, images


def mxu_peak_flops() -> float:
    """bf16 MXU peak of the attached device (fallback: v5e)."""
    import jax

    kind = jax.devices()[0].device_kind.lower()
    peaks = {
        "v4": 275e12,
        "v5 lite": 197e12,
        "v5e": 197e12,
        "v5p": 459e12,
        "v5": 459e12,
        "v6 lite": 918e12,
        "v6e": 918e12,
    }
    for tag, p in peaks.items():
        if tag in kind:
            return p
    return 197e12


def measure_floor(reps):
    """Per-eval overhead of the fori_loop harness itself (the tunnel's
    dispatch+fetch cost divided by reps) — subtracted from every number.
    An empty body measured 3.9 ms/eval at reps=10, which silently
    dominated early measurements."""
    import jax
    import jax.numpy as jnp
    import time

    x = jnp.zeros((8, 128), jnp.float32)

    def run(x, seed):
        def body(i, acc):
            return acc + jnp.sum(x) * (seed + i.astype(jnp.float32)) * 1e-9
        return jax.lax.fori_loop(0, reps, body, 0.0)

    f = jax.jit(run)
    float(f(x, 0.0))
    ts = []
    for s in (1.0, 2.0):
        t = time.perf_counter()
        float(f(x, s))
        ts.append((time.perf_counter() - t) / reps)
    return min(ts)


def bench(name, num_views, H, W, B, k, vis_frac, reps, paths, max_score_views,
          floor_s=0.0):
    import jax
    import jax.numpy as jnp

    from densepoints_tpu.config import OptimizeConfig
    from densepoints_tpu.ops.warp_ncc_paged import paged_all_scores
    from densepoints_tpu.pmvs.optimize import _anchor_chunks, patch_ncc_scores

    rng = np.random.default_rng(0)
    cams, images_np = make_scene(rng, num_views, H, W)
    images = jnp.asarray(images_np)
    xy = rng.uniform(-0.4, 0.4, (B, 2))
    position = jnp.asarray(
        np.concatenate([xy, np.zeros((B, 1))], 1).astype(np.float32)
    )
    normal = jnp.asarray(
        np.tile([0.0, 0.0, 1.0], (B, 1)).astype(np.float32)
    )
    refs = jnp.asarray(np.zeros((B,), np.int32))
    vis_np = rng.uniform(size=(B, num_views)) < vis_frac
    vis_np[:, 0] = False  # ref view excluded
    vis_np[:, 1] = True  # ensure an anchor exists
    vis = jnp.asarray(vis_np)
    n_slots = int(vis_np.sum())

    out = {
        "shape": name,
        "views": num_views,
        "image": [H, W],
        "B": B,
        "texture": k,
        "visible_slots": n_slots,
    }

    def run_paged(images, position, normal, refs, vis, seed):
        # Plans/pages are NM-loop invariants: build once outside the loop
        # (argsort does NOT get hoisted out of fori_loop by XLA).
        from densepoints_tpu.ops.warp_ncc_paged import build_pages, make_plan

        pages = build_pages(images)
        anchor = jnp.argmax(vis, axis=1).astype(jnp.int32)
        has = jnp.any(vis, axis=1)
        cols = jax.lax.broadcasted_iota(jnp.int32, vis.shape, 1)
        plan_a = make_plan(has[:, None] & (cols == anchor[:, None]))
        plan = make_plan(vis & (cols != anchor[:, None]))

        def body(i, acc):
            p = position + (seed + i.astype(jnp.float32)) * 1e-4
            scores, _, _ = paged_all_scores(
                images, cams, p, normal, refs, vis, k,
                pages=pages, plan=plan, plan_a=plan_a,
            )
            return acc + jnp.sum(scores) * 1e-6

        return jax.lax.fori_loop(0, reps, body, 0.0)

    def run_chunked(images, position, normal, refs, vis, seed):
        chunks = _anchor_chunks(vis, max_score_views)

        def body(i, acc):
            p = position + (seed + i.astype(jnp.float32)) * 1e-4
            for chunk_ids, chunk_ok in chunks:
                scores, _, _ = patch_ncc_scores(
                    images, cams, p, normal, refs, vis, k,
                    impl="fused", view_ids=chunk_ids, ok=chunk_ok,
                )
                acc = acc + jnp.sum(scores) * 1e-6
            return acc

        return jax.lax.fori_loop(0, reps, body, 0.0)

    # Issued-flop MXU roofline for the real slots (two bf16 one-hot
    # matmuls per slot; the model of scripts/kernel_roofline.py).
    from densepoints_tpu.ops.warp_ncc import WIN_H, WIN_W

    S = -(-(k * k) // 128) * 128
    t_mxu_s = n_slots * 2 * (2 * WIN_H * WIN_W * S) / mxu_peak_flops()

    for label, fn in (("paged", run_paged), ("chunked", run_chunked)):
        if label not in paths:
            continue
        f = jax.jit(fn)
        t0 = time.perf_counter()
        float(f(images, position, normal, refs, vis, 0.0))
        compile_s = time.perf_counter() - t0
        ts = []
        for s in (1.0, 2.0):
            t = time.perf_counter()
            float(f(images, position, normal, refs, vis, s))
            ts.append((time.perf_counter() - t) / reps)
        dt = max(min(ts) - floor_s, 1e-9)
        out[label] = {
            "ms_per_eval": round(dt * 1e3, 3),
            "slot_scores_per_sec": round(n_slots / dt, 0),
            "fraction_of_roofline": round(t_mxu_s / dt, 3),
            "compile_s": round(compile_s, 1),
        }
        print(json.dumps({k2: out[k2] for k2 in ("shape", label)}), flush=True)
    return out


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="/tmp/KERNEL_PAGED.json")
    p.add_argument("--reps", type=int, default=10)
    p.add_argument("--shapes", default="dtu,bench,expand")
    p.add_argument("--paths", default="paged,chunked")
    p.add_argument("--msv", type=int, default=16, help="chunk width M")
    args = p.parse_args(argv)
    paths = args.paths.split(",")

    import jax

    floor_s = measure_floor(args.reps)
    print(json.dumps({"harness_floor_ms_per_eval": round(floor_s * 1e3, 3)}),
          flush=True)
    results = []
    specs = {
        # DTU filter-like: B=512 all-views
        "dtu": ("dtu_b512", 49, 1200, 1600, 512, 11, 1.0),
        # bench.py refine-like
        "bench": ("bench_b4096", 8, 480, 640, 4096, 11, 1.0),
        # expansion-like: big batch, partial visibility
        "expand": ("expand_b4096_v50", 49, 1200, 1600, 4096, 11, 0.5),
    }
    for s in args.shapes.split(","):
        name, V, H, W, B, k, vf = specs[s]
        results.append(
            bench(name, V, H, W, B, k, vf, args.reps, paths, args.msv,
                  floor_s=floor_s)
        )
    artifact = {
        "device": str(jax.devices()[0].device_kind),
        "mxu_peak_bf16_tflops": round(mxu_peak_flops() / 1e12, 1),
        "harness_floor_ms_per_eval": round(floor_s * 1e3, 3),
        "note": (
            "ms_per_eval = one full all-views scoring pass (anchor + "
            "payload, geometry included) minus the harness floor; "
            "fraction_of_roofline uses the issued-flop MXU bound over "
            "REAL visible slots only (padded/wasted slots count against "
            "the path that schedules them)."
        ),
        "shapes": results,
    }
    with open(args.out, "w") as f:
        json.dump(artifact, f, indent=1)
    print("wrote", args.out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
