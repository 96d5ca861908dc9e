"""Real-TPU Mosaic compile/run smoke tests for every Pallas kernel.

Interpret-mode tests validate numerics but not Mosaic lowering — round 1
shipped a kernel (`pltpu.roll` on bf16) that passed every interpret test and
failed to compile on hardware. These tests run each kernel NON-interpreted
and pin its output against the XLA reference path.

Run with `DENSEPOINTS_TEST_TPU=1 python -m pytest tests/ops/test_tpu_smoke.py`
on a machine with a TPU; they skip on the CPU CI backend.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    jax.devices()[0].platform != "tpu",
    reason="requires a real TPU (set DENSEPOINTS_TEST_TPU=1)",
)


def _scene(rng):
    from densepoints_tpu.core import Cameras
    from tests.synthetic import TexturedPlaneScene

    scene = TexturedPlaneScene(rng, num_views=5, width=200, height=160)
    cams = Cameras.from_projection_matrices(
        scene.P, widths=scene.width, heights=scene.height
    )
    return cams, jnp.asarray(scene.render_all())


def _patches(cams, rng, n):
    xy = rng.uniform(-0.5, 0.5, (n, 2))
    position = np.concatenate([xy, np.zeros((n, 1))], 1).astype(np.float32)
    normal = np.tile([0.0, 0.0, 1.0], (n, 1)).astype(np.float32)
    refs = np.zeros((n,), np.int32)
    vis = np.ones((n, cams.num_views), bool)
    vis[:, 0] = False
    return (
        jnp.asarray(position),
        jnp.asarray(normal),
        jnp.asarray(refs),
        jnp.asarray(vis),
    )


def test_ncc_pairs_kernel_compiles(rng):
    from densepoints_tpu.core.scores import ncc_score
    from densepoints_tpu.ops.ncc import ncc_pairs_pallas

    a = jnp.asarray(rng.uniform(0, 255, (100, 121)).astype(np.float32))
    b = jnp.asarray(rng.uniform(0, 255, (100, 121)).astype(np.float32))
    mask = jnp.asarray(rng.uniform(size=(100, 121)) > 0.2)
    got = np.asarray(ncc_pairs_pallas(a, b, mask))
    want = np.asarray(ncc_score(a, b, mask))
    np.testing.assert_allclose(got, want, atol=1e-5)
    got2 = np.asarray(ncc_pairs_pallas(a, b))
    want2 = np.asarray(ncc_score(a, b))
    np.testing.assert_allclose(got2, want2, atol=1e-5)


def test_warp_ncc_resident_kernel_compiles(rng):
    """The default (resident) fused kernel vs the XLA path, on hardware."""
    from densepoints_tpu.ops import warp_ncc
    from densepoints_tpu.ops.warp_ncc import patch_ncc_scores_fused
    from densepoints_tpu.pmvs.optimize import patch_ncc_scores

    cams, images = _scene(rng)
    pos, nrm, refs, vis = _patches(cams, rng, 12)
    assert images.size * 2 <= warp_ncc._resident_limit()
    ref_scores, _, _ = patch_ncc_scores(images, cams, pos, nrm, refs, vis, 11)
    fused_scores, _, _ = patch_ncc_scores_fused(
        images, cams, pos, nrm, refs, vis, 11
    )
    np.testing.assert_allclose(
        np.asarray(fused_scores), np.asarray(ref_scores), atol=2e-3
    )


def test_warp_ncc_streaming_kernel_compiles(rng, monkeypatch):
    """The DMA (streaming) kernel, forced via the resident threshold."""
    from densepoints_tpu.ops import warp_ncc
    from densepoints_tpu.ops.warp_ncc import patch_ncc_scores_fused
    from densepoints_tpu.pmvs.optimize import patch_ncc_scores

    monkeypatch.setattr(warp_ncc, "RESIDENT_LIMIT_BYTES", 0)
    cams, images = _scene(rng)
    pos, nrm, refs, vis = _patches(cams, rng, 12)
    ref_scores, _, _ = patch_ncc_scores(images, cams, pos, nrm, refs, vis, 11)
    fused_scores, _, _ = patch_ncc_scores_fused(
        images, cams, pos, nrm, refs, vis, 11
    )
    np.testing.assert_allclose(
        np.asarray(fused_scores), np.asarray(ref_scores), atol=2e-3
    )


def test_accept_decisions_match_across_impls(rng):
    """Scores sit against a hard 0.6 accept threshold (optimization.h:16).

    Pin the accept/reject DECISIONS (not just score closeness) between the
    fused kernel and the XLA path so near-threshold patches cannot silently
    flip between implementations.
    """
    from densepoints_tpu.ops.warp_ncc import patch_ncc_scores_fused
    from densepoints_tpu.pmvs.optimize import patch_ncc_scores

    cams, images = _scene(rng)
    pos, nrm, refs, vis = _patches(cams, rng, 64)
    ref_scores, _, _ = patch_ncc_scores(images, cams, pos, nrm, refs, vis, 11)
    fused_scores, _, _ = patch_ncc_scores_fused(
        images, cams, pos, nrm, refs, vis, 11
    )
    r = np.asarray(ref_scores)
    f = np.asarray(fused_scores)
    # Exclude scores within the impl tolerance band of the threshold: those
    # are genuinely ambiguous; everything else must agree exactly.
    decisive = np.abs(r - 0.6) > 5e-3
    np.testing.assert_array_equal((r >= 0.6)[decisive], (f >= 0.6)[decisive])


def test_scan_scale_scores_match_numpy_oracle(rng):
    """bf16-geometry regression guard at SCAN-scale coordinates.

    Round 4's headline find: the TPU default matmul precision lowered f32
    geometry matmuls to bf16 on the MXU, which at 1600x1200 / focal ~2900
    moved window corners by whole pixels (~10% of accept decisions
    flipped) — and the 200x160 smoke scenes above can never see it. This
    test runs BOTH TPU scoring paths (paged kernel + XLA) on a scan-scale
    scene and pins them against a float64 NUMPY oracle that shares no JAX
    matmul code. Reverting the package precision default
    (densepoints_tpu/__init__.py) or the per-site HIGHEST pins
    (dense_geometry, cameras.project) fails this on hardware.
    """
    from densepoints_tpu.core import Cameras
    from densepoints_tpu.core.scores import NCC_MIN_DENOM
    from densepoints_tpu.ops.warp_ncc_paged import (
        allview_scores_xla,
        paged_all_scores,
    )
    from tests.synthetic import TexturedPlaneScene

    scene = TexturedPlaneScene(
        rng, num_views=4, width=1600, height=1200, focal=2900.0,
        radius=600.0, plane_half_extent=170.0, tex_size=2048,
    )
    cams = Cameras.from_projection_matrices(
        scene.P, widths=scene.width, heights=scene.height
    )
    images_np = scene.render_all().astype(np.float32)
    images = jnp.asarray(images_np)

    B = 64
    xy = rng.uniform(-60.0, 60.0, (B, 2))  # wide spread: large pixel coords
    position = np.concatenate([xy, np.zeros((B, 1))], 1).astype(np.float32)
    normal = np.tile([0.0, 0.0, 1.0], (B, 1)).astype(np.float32)
    refs = np.zeros((B,), np.int32)
    vis = np.ones((B, cams.num_views), bool)
    vis[:, 0] = False
    k = 11

    # ---- float64 numpy oracle (no JAX matmuls anywhere) ----------------
    K = np.asarray(cams.K, np.float64)
    E = np.asarray(cams.E, np.float64)
    C = np.asarray(cams.C, np.float64)
    x_axis = np.asarray(cams.x_axis, np.float64)
    V, H, W = images_np.shape
    pos64 = position.astype(np.float64)
    nrm64 = normal.astype(np.float64)

    def project(pts):  # (..., 3) -> (V, ..., 2) pixel coords
        rel = pts[None, ...] - C.reshape((V,) + (1,) * (pts.ndim - 1) + (3,))
        cam = np.einsum("vij,v...j->v...i", E[:, :, :3], rel)
        pix = np.einsum("vij,v...j->v...i", K, cam)
        return pix[..., :2] / pix[..., 2:3]

    xa = x_axis[refs]
    ya = np.cross(nrm64, xa)
    p0 = project(pos64)[refs[0]]  # ref = 0 for all patches
    p1 = project(pos64 + xa)[refs[0]]
    dx = np.linalg.norm(p1 - p0, axis=-1)
    scale = (k // 2) / np.maximum(dx, 1e-12)
    sx = scale[:, None] * xa
    sy = scale[:, None] * ya

    coords = (2.0 * np.arange(k) / k) - 1.0
    tt, ss = np.meshgrid(coords, coords, indexing="ij")
    world = (
        pos64[:, None, None, :]
        + ss[None, :, :, None] * sx[:, None, None, :]
        + tt[None, :, :, None] * sy[:, None, None, :]
    )  # (B, k, k, 3)
    corners = pos64[:, None, :] + np.stack(
        [-sx - sy, sx - sy, sx + sy, -sx + sy], axis=1
    )
    pix_w = project(world)  # (V, B, k, k, 2)
    pix_c = project(corners)  # (V, B, 4, 2)
    inside = (
        (pix_c[..., 0] > 0) & (pix_c[..., 0] < W)
        & (pix_c[..., 1] > 0) & (pix_c[..., 1] < H)
    )
    valid = np.all(inside, axis=-1).T & vis  # (B, V)

    def bilinear(img, xyv):  # clamp-to-edge, matching ops/warp.py
        x = np.clip(xyv[..., 0], 0.0, W - 1.0)
        y = np.clip(xyv[..., 1], 0.0, H - 1.0)
        x0 = np.clip(np.floor(x).astype(int), 0, W - 2)
        y0 = np.clip(np.floor(y).astype(int), 0, H - 2)
        fx, fy = x - x0, y - y0
        im = img.astype(np.float64)
        return (
            im[y0, x0] * (1 - fx) * (1 - fy)
            + im[y0, x0 + 1] * fx * (1 - fy)
            + im[y0 + 1, x0] * (1 - fx) * fy
            + im[y0 + 1, x0 + 1] * fx * fy
        )

    tex = np.stack([bilinear(images_np[v], pix_w[v]) for v in range(V)], 1)
    flat = tex.reshape(B, V, k * k)
    n = float(k * k)
    anchor = np.argmax(vis, axis=1)
    bidx = np.arange(B)
    a = flat[bidx, anchor]
    a_ok = valid[bidx, anchor]
    ac = a - a.mean(axis=1, keepdims=True)
    sa = np.sqrt(np.sum(ac * ac, axis=1) / n)
    ct = flat - flat.mean(axis=2, keepdims=True)
    st = np.sqrt(np.sum(ct * ct, axis=2) / n)
    cov = np.sum(ct * ac[:, None, :], axis=2) / n
    den = np.maximum(sa[:, None] * st, NCC_MIN_DENOM)
    payload = vis & (np.arange(V)[None, :] != anchor[:, None])
    want = np.where(payload & valid & a_ok[:, None], cov / den, -1.0)

    # ---- both TPU paths vs the oracle ----------------------------------
    args = (
        images, cams, jnp.asarray(position), jnp.asarray(normal),
        jnp.asarray(refs), jnp.asarray(vis),
    )
    got_paged = np.asarray(paged_all_scores(*args, k)[0])
    got_xla = np.asarray(allview_scores_xla(*args, k)[0])
    scored = want > -1.0
    # The corruption being guarded against is 0.13 MEAN error; the
    # legitimate quantization floor (bf16 image pages + f32 sampling) is
    # an order of magnitude below this tolerance.
    np.testing.assert_allclose(
        got_xla[scored], want[scored], atol=1.5e-2, rtol=0
    )
    np.testing.assert_allclose(
        got_paged[scored], want[scored], atol=1.5e-2, rtol=0
    )
    # Accept decisions at the 0.6 threshold must agree outside the
    # tolerance band (the r4 corruption flipped ~10% of these).
    decisive = np.abs(want - 0.6) > 1.5e-2
    for got in (got_xla, got_paged):
        np.testing.assert_array_equal(
            (want >= 0.6)[scored & decisive], (got >= 0.6)[scored & decisive]
        )
