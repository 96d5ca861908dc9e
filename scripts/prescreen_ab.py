"""A/B the expansion occupancy pre-screen: off vs free vs claim.

Runs the bench e2e scene (12 views, 512x384 textured sphere, grid_scale 4)
through refine -> expand -> filter once per mode on the real chip and
reports per-mode wall, accepted patches, and final patches — the evidence
for ExpandConfig.prescreen's default (VERDICT r4 #2).

Output: PRESCREEN_r05.json
"""
from __future__ import annotations

import dataclasses
import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent / "tests"))


def main():
    import jax.numpy as jnp

    from densepoints_tpu.config import load_config
    from densepoints_tpu.core.cameras import Cameras
    from densepoints_tpu.io.scene import Scene
    from densepoints_tpu.pmvs.optimize import filter_by_error, optimize_patches
    from densepoints_tpu.pmvs.pipeline import _densify_from
    from densepoints_tpu.pmvs.seed import create_patches_from_points
    from densepoints_tpu.utils import StageMetrics
    from synthetic import TexturedSphereScene

    rng = np.random.default_rng(0)
    sc = TexturedSphereScene(
        rng, num_views=12, width=512, height=384, focal=450.0,
        radius=150.0, cam_radius=500.0, tex_size=2048, layout="grid",
        yaw_span=0.9, pitch_span=0.45,
    )
    cams = Cameras.from_projection_matrices(
        sc.P, widths=sc.width, heights=sc.height
    )
    scene = Scene(cameras=cams, images=sc.render_all(), colors=None)
    g = np.random.default_rng(7)
    seeds = g.standard_normal((3000, 3)).astype(np.float32)
    seeds *= 150.0 / np.linalg.norm(seeds, axis=1, keepdims=True)

    dimages = jnp.asarray(scene.images)
    results = {}
    for mode in ("claim", "free", "off"):
        cfg = load_config(
            {
                "profile": "scan",
                "expand": {
                    "max_rounds": 4, "max_iterations": 40,
                    "prescreen": mode,
                },
                "optimize": {"max_iterations": 120},
                "organizer": {"grid_scale": 4},
            }
        )

        def one(jitter):
            t0 = time.perf_counter()
            st = create_patches_from_points(
                cams, seeds + jitter, cfg.optimize, cfg.seed
            )
            st = filter_by_error(
                dimages, cams, st, cfg.seed.texture_size, cfg.optimize
            ).compact()
            st = optimize_patches(
                dimages, cams, st, cfg.seed.texture_size, cfg.optimize
            )
            metrics = StageMetrics()
            res = _densify_from(
                dimages, cams, scene, cfg, metrics, st, "seeds_optimized"
            )
            return res, metrics, time.perf_counter() - t0

        _, _, cold = one(0.0)
        res, metrics, warm = one(1e-4)
        results[mode] = {
            "densify_seconds_warm": round(warm, 2),
            "densify_seconds_cold": round(cold, 2),
            "patches_after_expand": metrics.counters.get(
                "patches_after_expand"
            ),
            "patches_final": res.patches.capacity,
            "e2e_patches_per_sec": round(res.patches.capacity / warm, 1),
            "stage_seconds": {
                k: round(v, 2) for k, v in metrics.times.items()
            },
        }
        print(mode, results[mode], flush=True)

    out = {
        "scene": "bench e2e (12 views 512x384 sphere, grid_scale 4)",
        "modes": results,
    }
    path = pathlib.Path(__file__).resolve().parent.parent / "PRESCREEN_r05.json"
    path.write_text(json.dumps(out, indent=1))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
