"""Component breakdown of one production paged scoring pass on the TPU.

KERNEL_ABLATE_r05: the raw Pallas kernel runs at 73-78 ns/slot, but the
production `paged_all_scores` pass measures ~181-194 ns/slot — this
script times the pass's components separately (floor-subtracted, inside
one jitted fori_loop each) to locate the XLA-side gap:

  full        — paged_all_scores with precomputed pages/plans
  kernels     — the two pallas_call invocations only (fixed xs/ys/geom)
  geometry    — dense_geometry (the one real matmul + packing)
  slot_coords — xs/ys materialization for both passes
  gathers     — packed-row gather + anchor-texture expansion ca[pb]
  ncc_tail    — cov/den reduction + inverse-permutation placement

Writes PAGED_BREAKDOWN_r05.json.
"""
from __future__ import annotations

import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def bench_shape(name, num_views, H, W, B, vis_frac, k, reps=20):
    import jax
    import jax.numpy as jnp

    from densepoints_tpu.core.cameras import Cameras
    from densepoints_tpu.ops import warp_ncc_paged as P
    from densepoints_tpu.ops.warp import patch_frames

    rng = np.random.default_rng(0)
    Km = np.array([[500.0, 0, W / 2], [0, 500.0, H / 2], [0, 0, 1]])
    Ps = []
    for i in range(num_views):
        ang = (i - (num_views - 1) / 2) * (1.0 / max(num_views, 2))
        C = np.array(
            [6.0 * np.sin(ang), 0.2 * np.sin(2 * i), -6.0 * np.cos(ang)]
        )
        z = -C / np.linalg.norm(C)
        x = np.cross([0.0, 1.0, 0.0], z)
        x /= np.linalg.norm(x)
        y = np.cross(z, x)
        R = np.stack([x, y, z])
        Ps.append(Km @ np.concatenate([R, (-R @ C)[:, None]], 1))
    cams = Cameras.from_projection_matrices(np.stack(Ps), widths=W, heights=H)
    images = jnp.asarray(rng.uniform(0, 255, (num_views, H, W)).astype(np.float32))
    xy = rng.uniform(-1.0, 1.0, (B, 2))
    pos = jnp.asarray(
        np.concatenate([xy, np.zeros((B, 1))], 1).astype(np.float32)
    )
    nrm = jnp.asarray(np.tile([0.0, 0.0, 1.0], (B, 1)).astype(np.float32))
    refs = jnp.zeros((B,), jnp.int32)
    vis_np = rng.random((B, num_views)) < vis_frac
    vis_np[:, 0] = True  # anchor
    vis = jnp.asarray(vis_np)

    pages = P.build_pages(images)
    anchor = jnp.argmax(vis, axis=1).astype(jnp.int32)
    has = jnp.any(vis, axis=1)
    cols = jax.lax.broadcasted_iota(jnp.int32, (B, num_views), 1)
    plan_a = P.make_plan(has[:, None] & (cols == anchor[:, None]), max_slots=B)
    # Bucketed payload bound, as the production _sliced path passes.
    bound = 512
    while bound < int(np.sum(vis_np)):
        bound *= 2
    plan = P.make_plan(vis & (cols != anchor[:, None]), max_slots=bound)
    n_slots = int(np.sum(vis_np)) + 0  # payload+anchor ~ sum(vis)

    Hp, Wp, nxb = P.page_dims(images.shape)
    sx, sy = patch_frames(cams, pos, nrm, refs, k)
    packed_d = P.dense_geometry(cams, (Hp, nxb), pos, sx, sy, k)
    S = -(-(k * k) // 128) * 128

    def slots_of(p):
        ok = p.sid >= 0
        sid = jnp.where(ok, p.sid, 0)
        pb = sid // num_views
        pv = sid % num_views
        packed = packed_d[pv * B + pb]
        row0 = packed[:, 9].astype(jnp.int32)
        return ok, pb, packed, row0

    ok_p, pb_p, packed_p, row0_p = slots_of(plan)
    ok_a, pb_a, packed_a, row0_a = slots_of(plan_a)
    xs_p, ys_p = P._slot_coords(packed_p, k, S)
    xs_a, ys_a = P._slot_coords(packed_a, k, S)
    ctex_p0 = P.paged_centered_textures(pages, plan.page, row0_p, packed_p, k)
    ctex_a0 = P.paged_centered_textures(
        pages, plan_a.page, row0_a, packed_a, k
    )

    def loop(body, *args):
        def f(seed, *a):
            def it(i, acc):
                return acc + body(seed + i.astype(jnp.float32), *a)
            return jax.lax.fori_loop(0, reps, it, 0.0)
        return jax.jit(f), args

    variants = {}

    def measure(name, fn, args):
        jfn, a = loop(fn, *args)
        float(jfn(0.0, *a))
        t = time.perf_counter()
        float(jfn(1.0, *a))
        dt = (time.perf_counter() - t) / reps
        variants[name] = dt
        print(name, round(dt * 1e3, 3), "ms", flush=True)

    # floor
    measure("floor", lambda s: s, ())

    # Big buffers ride as jit OPERANDS: closure-captured arrays embed as
    # constants in the program the tunnel ships to its remote compiler
    # (a 400 MB page stack at scan shapes overflows the request limit).
    measure(
        "full",
        lambda s, pos, pages: P.paged_all_scores(
            images, cams, pos + s * 1e-4, nrm, refs, vis, k,
            pages=pages, plan=plan, plan_a=plan_a,
        )[0].sum() * 1e-6,
        (pos, pages),
    )
    measure(
        "kernels",
        lambda s, pages, packed_p, packed_a: (
            P.paged_centered_textures(
                pages, plan.page, row0_p, packed_p + s * 1e-6, k
            )[:, 0].sum()
            + P.paged_centered_textures(
                pages, plan_a.page, row0_a, packed_a + s * 1e-6, k
            )[:, 0].sum()
        ) * 1e-6,
        (pages, packed_p, packed_a),
    )
    measure(
        "geometry",
        lambda s, pos: P.dense_geometry(
            cams, (Hp, nxb), pos + s * 1e-4, sx, sy, k
        ).sum() * 1e-9,
        (pos,),
    )
    measure(
        "slot_coords",
        lambda s, packed_p, packed_a: (
            P._slot_coords(packed_p + s * 1e-6, k, S)[0].sum()
            + P._slot_coords(packed_a + s * 1e-6, k, S)[0].sum()
        ) * 1e-9,
        (packed_p, packed_a),
    )

    def gathers(s, packed_d, ctex_a):
        ok = plan.sid >= 0
        sid = jnp.where(ok, plan.sid, 0)
        pb = sid // num_views
        pv = sid % num_views
        packed = (packed_d + s * 1e-6)[pv * B + pb]
        ca = (ctex_a + s * 1e-6)[
            jnp.clip(plan_a.inv[anchor[pb] + pb * 0], 0, plan_a.n_slots - 1)
        ]
        return packed.sum() * 1e-9 + ca.sum() * 1e-9

    measure("gathers", gathers, (packed_d, ctex_a0))

    def ncc_tail(s, ctex_p, ctex_a):
        ctex_p = ctex_p + s * 1e-6
        n = float(k * k)
        inv_a = plan_a.inv[jnp.arange(B, dtype=jnp.int32) * num_views + anchor]
        safe_a = jnp.clip(inv_a, 0, plan_a.n_slots - 1)
        ca_all = ctex_a[safe_a]
        sa = jnp.sqrt(jnp.sum(ca_all * ca_all, axis=1) / n)
        ca = ca_all[pb_p]
        sig = jnp.sqrt(jnp.sum(ctex_p * ctex_p, axis=1) / n)
        cov = jnp.sum(ctex_p * ca, axis=1) / n
        den = jnp.maximum(sa[pb_p] * sig, 0.1)
        sscore = cov / den
        safe_p = jnp.clip(plan.inv, 0, plan.n_slots - 1)
        return sscore[safe_p].sum() * 1e-6

    measure("ncc_tail", ncc_tail, (ctex_p0, ctex_a0))

    floor = variants.pop("floor")
    out = {
        "shape": name, "B": B, "views": num_views,
        "payload_slots": int(plan.n_slots), "anchor_slots": int(plan_a.n_slots),
        "floor_ms": round(floor * 1e3, 3),
        "components_ms": {
            kk: round((vv - floor) * 1e3, 3) for kk, vv in variants.items()
        },
    }
    return out


def main():
    results = [
        bench_shape("bench_b4096_v8", 8, 480, 640, 4096, 0.875, 11),
        bench_shape("expand_b4096_v50", 50, 1200, 1600, 4096, 0.5, 11),
    ]
    p = pathlib.Path(__file__).resolve().parent.parent / "PAGED_BREAKDOWN_r05.json"
    p.write_text(json.dumps({"shapes": results}, indent=1))
    print(json.dumps(results))


if __name__ == "__main__":
    main()
