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
