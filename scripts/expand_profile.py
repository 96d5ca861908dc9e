"""Phase-level profile of ONE expansion round on the real TPU.

The A/B rounds cost ~23 s each at the bench-scene shape while the kernel
cost model predicts ~3-5 s — this script times each phase of
`expand_patches`'s round loop with explicit syncs to find the missing
time. Writes EXPAND_PROFILE_r05.json.
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
    import jax
    import jax.numpy as jnp

    from densepoints_tpu.config import load_config
    from densepoints_tpu.core.cameras import Cameras
    from densepoints_tpu.io.scene import Scene
    from densepoints_tpu.pmvs.expand import (
        _pad_bucket,
        make_expansion_candidates,
    )
    from densepoints_tpu.pmvs.optimize import (
        filter_by_error,
        optimize_patches,
    )
    from densepoints_tpu.pmvs.organizer import (
        bulk_try_insert,
        candidate_cells,
        make_grids,
        prescreen_candidates,
    )
    from densepoints_tpu.pmvs.patch import PatchState
    from densepoints_tpu.pmvs.seed import create_patches_from_points
    from densepoints_tpu.pmvs.visibility import classify_views
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
    images = jnp.asarray(sc.render_all())
    g = np.random.default_rng(7)
    seeds = g.standard_normal((3000, 3)).astype(np.float32)
    seeds *= 150.0 / np.linalg.norm(seeds, axis=1, keepdims=True)
    cfg = load_config(
        {
            "profile": "scan",
            "expand": {"max_rounds": 4, "max_iterations": 40},
            "optimize": {"max_iterations": 120},
            "organizer": {"grid_scale": 4},
        }
    )
    # Seed-refine to get a realistic frontier.
    st = create_patches_from_points(cams, seeds, cfg.optimize, cfg.seed)
    st = filter_by_error(
        images, cams, st, cfg.seed.texture_size, cfg.optimize
    ).compact()
    st = optimize_patches(
        images, cams, st, cfg.seed.texture_size, cfg.optimize
    )
    grids = make_grids(cams, cfg.organizer.grid_scale,
                       cfg.organizer.max_patches_per_cell)
    cells = candidate_cells(
        grids, cams, st.position, st.vis, cfg.organizer.grid_scale
    )
    acc, grids = bulk_try_insert(
        grids, cells, st.alive,
        jnp.arange(st.capacity, dtype=jnp.int32),
        cfg.organizer.min_grids_to_accept,
    )
    frontier = st.masked(acc).compact()
    print(f"frontier: {frontier.capacity}", flush=True)

    expand_opt = dataclasses.replace(
        cfg.optimize, max_iterations=cfg.expand.max_iterations
    )

    def phase(name, fn, timings, warm):
        t0 = time.perf_counter()
        out = fn()
        jax.block_until_ready(jax.tree.leaves(out))
        dt = time.perf_counter() - t0
        timings[name] = round(dt, 3)
        print(("warm " if warm else "cold ") + name, round(dt, 3), flush=True)
        return out

    results = {}
    for run in ("cold", "warm"):
        t = {}
        warm = run == "warm"
        cand0 = phase(
            "make_candidates",
            lambda: make_expansion_candidates(
                cams, frontier, cfg.organizer.grid_scale
            ),
            t, warm,
        )
        cand = phase(
            "pad_bucket",
            lambda: _pad_bucket(
                cand0, quantum=cfg.optimize.max_refine_batch
            ),
            t, warm,
        )
        pre_cells = phase(
            "candidate_cells",
            lambda: candidate_cells(
                grids, cams, cand.position, cand.vis,
                cfg.organizer.grid_scale,
            ),
            t, warm,
        )
        keep = phase(
            "prescreen",
            lambda: prescreen_candidates(
                grids, pre_cells, cand.alive,
                cfg.organizer.min_grids_to_accept, "free",
            ),
            t, warm,
        )
        candc = phase(
            "compact",
            lambda: cand.masked(keep & cand.alive).compact(), t, warm,
        )
        candp = phase(
            "pad_bucket2",
            lambda: _pad_bucket(
                candc, quantum=cfg.optimize.max_refine_batch
            ),
            t, warm,
        )
        opt = phase(
            "optimize_nm",
            lambda: optimize_patches(
                images, cams, candp, cfg.expand.texture_size, expand_opt
            ),
            t, warm,
        )
        vis_cand = phase(
            "classify_views",
            lambda: classify_views(
                cams, opt.position, opt.normal, opt.ref,
                cfg.optimize.visible_angle, cfg.optimize.candidate_angle,
            ),
            t, warm,
        )
        opt2 = dataclasses.replace(opt, vis=vis_cand[0], cand=vis_cand[1])
        filt = phase(
            "filter_by_error",
            lambda: filter_by_error(
                images, cams, opt2, cfg.expand.texture_size, expand_opt
            ),
            t, warm,
        )
        cells2 = phase(
            "candidate_cells2",
            lambda: candidate_cells(
                grids, cams, filt.position, filt.vis,
                cfg.organizer.grid_scale,
            ),
            t, warm,
        )
        phase(
            "bulk_try_insert",
            lambda: bulk_try_insert(
                grids, cells2, filt.alive,
                jnp.arange(filt.capacity, dtype=jnp.int32),
                cfg.organizer.min_grids_to_accept,
            ),
            t, warm,
        )
        t["TOTAL"] = round(sum(v for k, v in t.items() if k != "TOTAL"), 2)
        results[run] = t

    out = pathlib.Path(__file__).resolve().parent.parent / "EXPAND_PROFILE_r05.json"
    out.write_text(json.dumps(results, indent=1))
    print(json.dumps(results))


if __name__ == "__main__":
    main()
