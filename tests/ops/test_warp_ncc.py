"""Fused warp+NCC kernel vs the XLA reference path (interpret mode)."""
import jax.numpy as jnp
import numpy as np

from densepoints_tpu.core import Cameras
from densepoints_tpu.ops.warp_ncc import patch_ncc_scores_fused
from densepoints_tpu.pmvs.optimize import patch_ncc_scores
from tests.synthetic import TexturedPlaneScene


def _setup(rng, num_views=5, width=200, height=160):
    scene = TexturedPlaneScene(rng, num_views=num_views, width=width, height=height)
    cams = Cameras.from_projection_matrices(
        scene.P, widths=scene.width, heights=scene.height
    )
    images = jnp.asarray(scene.render_all())
    return scene, cams, images


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


def test_fused_matches_xla_path(rng):
    scene, cams, images = _setup(rng)
    pos, nrm, refs, vis = _patches(cams, rng, 12)
    ref_scores, ref_ids, ref_ok = patch_ncc_scores(
        images, cams, pos, nrm, refs, vis, 11
    )
    fused_scores, ids, ok = patch_ncc_scores_fused(
        images, cams, pos, nrm, refs, vis, 11, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(ids), np.asarray(ref_ids))
    np.testing.assert_array_equal(np.asarray(ok), np.asarray(ref_ok))
    # Central-footprint patches: sampling must agree to float tolerance.
    np.testing.assert_allclose(
        np.asarray(fused_scores), np.asarray(ref_scores), atol=2e-3
    )


def test_fused_texture16(rng):
    scene, cams, images = _setup(rng)
    pos, nrm, refs, vis = _patches(cams, rng, 4)
    ref_scores, _, _ = patch_ncc_scores(images, cams, pos, nrm, refs, vis, 16)
    fused_scores, _, _ = patch_ncc_scores_fused(
        images, cams, pos, nrm, refs, vis, 16, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(fused_scores), np.asarray(ref_scores), atol=2e-3
    )


def test_fused_invalid_patches_sentinel(rng):
    scene, cams, images = _setup(rng)
    pos, nrm, refs, vis = _patches(cams, rng, 2)
    pos = pos.at[1].set(jnp.asarray([50.0, 50.0, 0.0]))  # far off-frustum
    fused_scores, _, ok = patch_ncc_scores_fused(
        images, cams, pos, nrm, refs, vis, 11, interpret=True
    )
    assert np.all(np.asarray(fused_scores)[1] == -1.0)


def test_streaming_path_matches_xla(rng, monkeypatch):
    """Force the DMA (streaming) kernel: every test scene is far below
    RESIDENT_LIMIT_BYTES, so without this the streaming variant would have
    zero interpret-mode coverage (ADVICE r1)."""
    from densepoints_tpu.ops import warp_ncc

    monkeypatch.setattr(warp_ncc, "RESIDENT_LIMIT_BYTES", 0)
    scene, cams, images = _setup(rng)
    pos, nrm, refs, vis = _patches(cams, rng, 12)
    ref_scores, _, _ = patch_ncc_scores(images, cams, pos, nrm, refs, vis, 11)
    fused_scores, _, _ = patch_ncc_scores_fused(
        images, cams, pos, nrm, refs, vis, 11, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(fused_scores), np.asarray(ref_scores), atol=2e-3
    )
