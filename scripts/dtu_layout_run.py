"""End-to-end densification from a FAITHFUL ON-DISK DTU layout.

VERDICT r3 missing #1/#5: every prior artifact fed in-memory arrays to the
pipeline. This run exercises the real-dataset path the way a user of the
reference would (programs/densify/main.cpp:12-40): a DTU-layout directory
tree on disk (Calibration/pos_XXX.txt + Rectified/rect_XXX_max_r5000.png)
-> io.datasets.dtu_to_scene_json -> io.scene.load_scene -> densify, with
PHOTOMETRIC NUISANCES baked into the PNGs so the photometric stages face
realistic non-idealities instead of clean renders:

  * per-view gain/bias (exposure differences between views),
  * radial vignetting,
  * a view-dependent specular lobe (breaks photometric constancy),
  * a textureless surface region (consistent across views),
  * sensor noise + 8-bit quantization (PNG round-trip).

The artifact reports accuracy/completeness on the same analytic-sphere
protocol as scripts/dtu_scale_run.py, so the delta vs the clean-render
artifact quantifies the nuisance cost.

Usage: python scripts/dtu_layout_run.py [--out DTU_LAYOUT_r04.json]
       [--views 21] [--width 800] [--height 600] [--clean]
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tests"))


def add_nuisances(images, scene_gen, rng, radius):
    """Per-view photometric non-idealities, in place on f32 images."""
    V, H, W = images.shape
    yy, xx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    r2 = ((xx - W / 2) / (W / 2)) ** 2 + ((yy - H / 2) / (H / 2)) ** 2
    vignette = 1.0 - 0.25 * r2  # ~25% corner falloff
    pole = np.array([0.0, 0.0, float(radius)])  # textureless surface spot
    for v in range(V):
        img = images[v]
        gain = float(rng.normal(1.0, 0.06))
        bias = float(rng.normal(0.0, 4.0))
        img *= gain * vignette
        img += bias
        # View-dependent specular lobe: a Gaussian highlight at the
        # sphere point whose normal bisects view direction and a fixed
        # light — approximated by the projection of a point that slides
        # with the camera azimuth (photometric-constancy violation).
        C = scene_gen.C[v]
        toward = -C / np.linalg.norm(C)
        spec_pt = -radius * 0.9 * toward + np.array([0.0, 0.0, 0.1 * radius])
        P = scene_gen.P[v]
        h = P @ np.append(spec_pt, 1.0)
        if h[2] > 0:
            sx, sy = h[0] / h[2], h[1] / h[2]
            d2 = (xx - sx) ** 2 + (yy - sy) ** 2
            img += 60.0 * np.exp(-0.5 * d2 / (0.03 * W) ** 2)
        # Textureless region: flatten a disk around the pole's projection
        # toward its local mean (the same SURFACE region in every view).
        hp = P @ np.append(pole, 1.0)
        if hp[2] > 0:
            px, py = hp[0] / hp[2], hp[1] / hp[2]
            mask = (xx - px) ** 2 + (yy - py) ** 2 < (0.05 * W) ** 2
            if mask.any():
                img[mask] = 0.9 * img[mask].mean() + 0.1 * img[mask]
        # Sensor noise.
        img += rng.normal(0.0, 2.0, img.shape)
    np.clip(images, 0, 255, out=images)
    return images


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", default="DTU_LAYOUT_r04.json")
    p.add_argument("--views", type=int, default=21)
    p.add_argument("--width", type=int, default=800)
    p.add_argument("--height", type=int, default=600)
    p.add_argument("--kp", type=int, default=2048)
    p.add_argument("--focal", type=float, default=1450.0)
    p.add_argument("--radius", type=float, default=60.0)
    p.add_argument("--cam-radius", type=float, default=650.0)
    p.add_argument("--max-rounds", type=int, default=6)
    p.add_argument("--impl", default="paged", choices=["auto", "paged"])
    p.add_argument("--expand-nm-iters", type=int, default=40)
    p.add_argument("--clean", action="store_true",
                   help="skip the nuisances (delta baseline)")
    p.add_argument("--layout-dir", default="")
    p.add_argument("--threshold-mm", type=float, default=2.0)
    args = p.parse_args(argv)

    from PIL import Image

    from synthetic import TexturedSphereScene

    from densepoints_tpu.config import load_config
    from densepoints_tpu.io.datasets import dtu_to_scene_json
    from densepoints_tpu.io.scene import load_scene
    from densepoints_tpu.pmvs.pipeline import densify
    from densepoints_tpu.utils.metrics import accuracy_completeness

    from densepoints_tpu.utils.cache import enable_compilation_cache

    # Same persistent compile cache the production entry points use
    # (utils/cache.py): repeat runs skip the one-time tunnel compiles.
    enable_compilation_cache()

    rng = np.random.default_rng(0)
    scene_gen = TexturedSphereScene(
        rng,
        num_views=args.views,
        width=args.width,
        height=args.height,
        focal=args.focal,
        radius=args.radius,
        cam_radius=args.cam_radius,
        tex_size=4096,
        layout="grid",
        yaw_span=1.0,
        pitch_span=0.5,
    )
    images = scene_gen.render_all().astype(np.float32)
    if not args.clean:
        images = add_nuisances(images, scene_gen, rng, args.radius)

    # Write the on-disk DTU layout (1-indexed, DTU file naming).
    tag = "clean" if args.clean else "nuisance"
    root = Path(
        args.layout_dir
        or f"/tmp/dtu_layout_{tag}_{args.views}x{args.width}x{args.height}"
    )
    calib = root / "Calibration"
    rect = root / "Rectified"
    calib.mkdir(parents=True, exist_ok=True)
    rect.mkdir(parents=True, exist_ok=True)
    for i in range(args.views):
        np.savetxt(calib / f"pos_{i + 1:03d}.txt", scene_gen.P[i])
        Image.fromarray(
            np.clip(images[i], 0, 255).astype(np.uint8)
        ).save(rect / f"rect_{i + 1:03d}_max_r5000.png")
    scene_json = dtu_to_scene_json(calib, rect, root / "scene.json")
    print(f"wrote DTU layout + {scene_json}", flush=True)

    # The real-dataset entry path: files -> scene -> densify.
    scene = load_scene(scene_json)
    config = load_config(
        {
            "profile": "scan",
            "matching": {
                "max_keypoints_per_view": args.kp,
            },
            "optimize": {
                "max_iterations": 120,
                "sampling_impl": args.impl,
            },
            "expand": {
                "max_rounds": args.max_rounds,
                "max_iterations": args.expand_nm_iters,
            },
            "runtime": {
                "checkpoint_dir": str(root / "ckpt"),
                "resume": True,
            },
        }
    )
    t1 = time.perf_counter()
    result = densify(scene, config)
    t_densify = time.perf_counter() - t1

    cloud = result.positions
    gt_rng = np.random.default_rng(1)
    pts = gt_rng.standard_normal((200_000, 3)).astype(np.float32)
    pts *= args.radius / np.linalg.norm(pts, axis=1, keepdims=True)
    n_in = -pts / args.radius
    vis_count = np.zeros(len(pts), np.int32)
    for C in scene_gen.C:
        d = pts - C.astype(np.float32)
        cosang = np.sum(d * n_in, axis=1) / np.linalg.norm(d, axis=1)
        vis_count += (np.arccos(np.clip(cosang, -1, 1)) < 0.78)
    gt = pts[vis_count >= 3]
    metrics = accuracy_completeness(
        cloud, gt, threshold=args.threshold_mm, max_dist=20.0
    )
    acc_exact = (
        np.abs(np.linalg.norm(cloud, axis=1) - args.radius)
        if len(cloud)
        else np.array([np.nan])
    )
    print(metrics.summary(), flush=True)

    artifact = {
        "scene": {
            "kind": f"on_disk_dtu_layout_{tag}",
            "layout_dir": str(root),
            "views": args.views,
            "width": args.width,
            "height": args.height,
            "nuisances": (
                []
                if args.clean
                else [
                    "per_view_gain_bias",
                    "vignetting_25pct",
                    "view_dependent_specular_lobe",
                    "textureless_pole_region",
                    "sensor_noise_sigma2",
                    "8bit_png_quantization",
                ]
            ),
        },
        "config": {
            "profile": "scan",
            "sampling_impl": args.impl,
            "expand_nm_iterations": args.expand_nm_iters,
            "max_rounds": args.max_rounds,
        },
        "patches": int(cloud.shape[0]),
        "densify_seconds": round(t_densify, 2),
        "stage_seconds": {
            k: round(v, 2) for k, v in result.metrics.times.items()
        },
        "quality_mm": {
            "threshold_mm": args.threshold_mm,
            "accuracy_mean": round(metrics.accuracy_mean, 4),
            "accuracy_median": round(metrics.accuracy_median, 4),
            "completeness_median": round(metrics.completeness_median, 4),
            "accuracy_frac_under": round(metrics.accuracy_frac_under, 4),
            "completeness_frac_under": round(
                metrics.completeness_frac_under, 4
            ),
            "accuracy_exact_mean": round(float(np.mean(acc_exact)), 4),
            "accuracy_exact_median": round(float(np.median(acc_exact)), 4),
        },
    }
    with open(args.out, "w") as f:
        json.dump(artifact, f, indent=1)
    print("wrote", args.out, flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
