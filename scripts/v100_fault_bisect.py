"""Minimize the 100-view full-res TPU fault (VERDICT r3 #4).

Round-3 finding (docs/ROUND3_NOTES.md known issue #1): at 100 views x
1600x1200 the TPU worker crashes deterministically in seed_optimize —
but ONLY when the seed front-end ran earlier in the same process; the
exact captured pre-optimize state replays clean in a fresh process.

This script bisects WHICH front-end stage poisons the process:
  --stage none        render + optimize a synthetic patch batch only
  --stage detect      + detection over all views
  --stage match       + descriptor matching over the pair graph
  --stage tracks      + track assembly / triangulation (full front-end)
then runs the same optimize_patches workload. Run each stage value in a
FRESH process (the poisoning is process-local):

  for s in none detect match tracks; do
      python scripts/v100_fault_bisect.py --stage $s || echo "CRASH at $s"
  done

Exit code 0 = optimize survived; a worker crash kills the process.
"""
from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tests"))


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--stage", default="tracks",
                   choices=["none", "detect", "match", "tracks"])
    p.add_argument("--views", type=int, default=100)
    p.add_argument("--width", type=int, default=1600)
    p.add_argument("--height", type=int, default=1200)
    p.add_argument("--patches", type=int, default=8192)
    args = p.parse_args(argv)

    import jax.numpy as jnp

    from synthetic import TexturedSphereScene

    from densepoints_tpu.config import MatchingConfig, OptimizeConfig
    from densepoints_tpu.core.cameras import Cameras
    from densepoints_tpu.pmvs.optimize import optimize_patches
    from densepoints_tpu.pmvs.patch import PatchState

    rng = np.random.default_rng(0)
    t0 = time.perf_counter()
    sc = TexturedSphereScene(
        rng, num_views=args.views, width=args.width, height=args.height,
        focal=2900.0, radius=60.0, cam_radius=650.0, tex_size=4096,
        layout="grid", yaw_span=1.0, pitch_span=0.5,
    )
    cams = Cameras.from_projection_matrices(
        sc.P, widths=args.width, heights=args.height
    )
    images = jnp.asarray(sc.render_all())
    print(f"rendered in {time.perf_counter() - t0:.0f}s", flush=True)

    mc = MatchingConfig(max_keypoints_per_view=4096, max_pairs_per_view=10)
    if args.stage == "detect":
        # Detection ONLY (the match/tracks stages run their own detection
        # inside the front-end; running it twice would change the
        # process's dispatch history from the real pipeline's).
        from densepoints_tpu.features.detector import detect_keypoints

        t = time.perf_counter()
        out_d = detect_keypoints(
            images,
            cell_size=mc.keypoint_cell_size,
            max_per_cell=mc.max_keypoints_per_cell,
            max_keypoints=mc.max_keypoints_per_view,
            k=mc.harris_k,
            method=mc.detector,
            fast_threshold=mc.fast_threshold,
        )
        import jax

        jax.block_until_ready(out_d)
        print(f"detect: {time.perf_counter() - t:.0f}s", flush=True)
    elif args.stage == "match":
        # Detection + descriptors + pairwise matching, WITHOUT track
        # assembly / triangulation.
        import jax

        from densepoints_tpu.features.descriptors import (
            brief_pattern,
            compute_descriptors,
        )
        from densepoints_tpu.features.detector import detect_keypoints
        from densepoints_tpu.features.matching import match_pair

        t = time.perf_counter()
        xy, resp, valid = detect_keypoints(
            images,
            cell_size=mc.keypoint_cell_size,
            max_per_cell=mc.max_keypoints_per_cell,
            max_keypoints=mc.max_keypoints_per_view,
            k=mc.harris_k,
            method=mc.detector,
            fast_threshold=mc.fast_threshold,
        )
        pattern = brief_pattern(
            mc.descriptor_bits, mc.descriptor_patch_radius
        )
        desc = compute_descriptors(images, xy, pattern)
        tot = 0.0
        for v in range(min(args.views - 1, 20)):
            idx, dist = match_pair(
                desc[v], desc[v + 1], valid[v], valid[v + 1],
                lowe_ratio=mc.lowe_ratio,
            )
            tot += float(jax.numpy.sum((idx >= 0).astype(jax.numpy.int32)))
        print(f"match: {time.perf_counter() - t:.0f}s ({tot:.0f} matches)",
              flush=True)
    elif args.stage == "tracks":
        # The FULL seeding front-end (the round-3 crash precondition).
        from densepoints_tpu.pmvs.seed import generate_seed_points

        t = time.perf_counter()
        points, obs, obs_mask = generate_seed_points(images, cams, mc)
        print(
            f"front-end: {time.perf_counter() - t:.0f}s, "
            f"{len(points)} seed points",
            flush=True,
        )

    # The optimize workload that crashed in round 3.
    B = args.patches
    pts = rng.standard_normal((B, 3)).astype(np.float32)
    pts *= 60.0 / np.linalg.norm(pts, axis=1, keepdims=True)
    nrm = (pts / np.linalg.norm(pts, axis=1, keepdims=True)).astype(np.float32)
    refs = np.zeros((B,), np.int32)
    vis = np.zeros((B, args.views), bool)
    vis[:, 1:26] = True  # DTU-like visibility width
    state = PatchState.create(pts, nrm, refs, vis)
    t = time.perf_counter()
    out = optimize_patches(
        images, cams, state, 16, OptimizeConfig(max_iterations=120)
    )
    np.asarray(out.position)  # force completion
    print(f"optimize: {time.perf_counter() - t:.0f}s — SURVIVED", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
