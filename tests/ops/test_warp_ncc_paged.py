"""View-sorted paged warp+NCC kernel vs XLA references (interpret mode)."""
import jax.numpy as jnp
import numpy as np

from densepoints_tpu.core import Cameras
from densepoints_tpu.ops.warp_ncc_paged import (
    STEP,
    allview_scores_xla,
    make_plan,
    paged_all_scores,
)
from densepoints_tpu.pmvs.optimize import patch_ncc_scores
from tests.synthetic import TexturedPlaneScene


def _setup(rng, num_views=5, width=200, height=160):
    scene = TexturedPlaneScene(rng, num_views=num_views, width=width, height=height)
    cams = Cameras.from_projection_matrices(
        scene.P, widths=scene.width, heights=scene.height
    )
    images = jnp.asarray(scene.render_all())
    return scene, cams, images


def _patches(cams, rng, n, mixed=False):
    xy = rng.uniform(-0.5, 0.5, (n, 2))
    position = np.concatenate([xy, np.zeros((n, 1))], 1).astype(np.float32)
    normal = np.tile([0.0, 0.0, 1.0], (n, 1)).astype(np.float32)
    V = cams.num_views
    if mixed:
        refs = rng.integers(0, V, (n,)).astype(np.int32)
        vis = rng.uniform(size=(n, V)) > 0.3
        vis[np.arange(n), refs] = False
        vis[0] = False  # a patch with no visible views at all
    else:
        refs = np.zeros((n,), np.int32)
        vis = np.ones((n, V), bool)
        vis[:, 0] = False
    return (
        jnp.asarray(position),
        jnp.asarray(normal),
        jnp.asarray(refs),
        jnp.asarray(vis),
    )


def test_make_plan_invariants(rng):
    B, V = 13, 5
    mask = rng.uniform(size=(B, V)) > 0.4
    plan = make_plan(jnp.asarray(mask))
    sid = np.asarray(plan.sid)
    page = np.asarray(plan.page)
    # Every True slot appears exactly once; empties are -1.
    real = sid[sid >= 0]
    expect = np.nonzero(mask.reshape(-1))[0]
    assert sorted(real.tolist()) == sorted(expect.tolist())
    # Steps are view-homogeneous and match the page table.
    assert len(page) * STEP == len(sid)
    for g in range(len(page)):
        grp = sid[g * STEP : (g + 1) * STEP]
        views = {int(s) % V for s in grp if s >= 0}
        assert len(views) <= 1
        if views:
            assert views == {int(page[g])}


def test_xla_allviews_matches_chunked_slots(rng):
    """The (B, V) score grid must agree with the existing compacted-slot
    XLA path (pmvs.optimize.patch_ncc_scores) wherever both score."""
    scene, cams, images = _setup(rng)
    pos, nrm, refs, vis = _patches(cams, rng, 10)
    grid, anchor, aok = allview_scores_xla(
        images, cams, pos, nrm, refs, vis, 11
    )
    slot_scores, view_ids, ok = patch_ncc_scores(
        images, cams, pos, nrm, refs, vis, 11, impl="xla"
    )
    grid = np.asarray(grid)
    slot_scores = np.asarray(slot_scores)
    view_ids = np.asarray(view_ids)
    ok = np.asarray(ok)
    for b in range(grid.shape[0]):
        for m in range(1, view_ids.shape[1]):  # slot 0 = anchor
            if ok[b, m]:
                np.testing.assert_allclose(
                    grid[b, view_ids[b, m]],
                    slot_scores[b, m],
                    rtol=1e-4,
                    atol=1e-4,
                )


def test_paged_matches_xla_allviews(rng):
    scene, cams, images = _setup(rng)
    pos, nrm, refs, vis = _patches(cams, rng, 12)
    ref_grid, ref_anchor, ref_aok = allview_scores_xla(
        images, cams, pos, nrm, refs, vis, 11
    )
    grid, anchor, aok = paged_all_scores(
        images, cams, pos, nrm, refs, vis, 11, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(anchor), np.asarray(ref_anchor))
    np.testing.assert_array_equal(np.asarray(aok), np.asarray(ref_aok))
    np.testing.assert_allclose(
        np.asarray(grid), np.asarray(ref_grid), atol=2e-3
    )


def test_paged_mixed_visibility(rng):
    scene, cams, images = _setup(rng)
    pos, nrm, refs, vis = _patches(cams, rng, 16, mixed=True)
    ref_grid, _, ref_aok = allview_scores_xla(
        images, cams, pos, nrm, refs, vis, 11
    )
    grid, _, aok = paged_all_scores(
        images, cams, pos, nrm, refs, vis, 11, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(aok), np.asarray(ref_aok))
    np.testing.assert_allclose(
        np.asarray(grid), np.asarray(ref_grid), atol=2e-3
    )
    # The no-visibility patch scores -1 everywhere.
    assert np.all(np.asarray(grid)[0] == -1.0)


def test_paged_texture16(rng):
    scene, cams, images = _setup(rng)
    pos, nrm, refs, vis = _patches(cams, rng, 6)
    ref_grid, _, _ = allview_scores_xla(images, cams, pos, nrm, refs, vis, 16)
    grid, _, _ = paged_all_scores(
        images, cams, pos, nrm, refs, vis, 16, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(grid), np.asarray(ref_grid), atol=2e-3
    )


def test_paged_off_frustum_sentinel(rng):
    scene, cams, images = _setup(rng)
    pos, nrm, refs, vis = _patches(cams, rng, 3)
    pos = pos.at[1].set(jnp.asarray([50.0, 50.0, 0.0]))
    grid, _, aok = paged_all_scores(
        images, cams, pos, nrm, refs, vis, 11, interpret=True
    )
    assert np.all(np.asarray(grid)[1] == -1.0)
    assert not np.asarray(aok)[1]


def test_paged_objective_matches_chunked(rng):
    """The all-views objective must equal the anchor-pinned-chunk
    objective (both XLA on CPU) for every simplex point."""
    import jax.numpy as jnp2

    from densepoints_tpu.pmvs.optimize import (
        photometric_objective,
        photometric_objective_paged,
    )

    scene, cams, images = _setup(rng)
    pos, nrm, refs, vis = _patches(cams, rng, 9, mixed=True)
    f_chunk = photometric_objective(
        images, cams, pos, nrm, refs, vis, 11, impl="xla", max_score_views=3
    )
    f_paged = photometric_objective_paged(
        images, cams, pos, nrm, refs, vis, 11
    )
    params = jnp2.asarray(
        rng.uniform(-0.05, 0.05, (9, 4, 3)).astype(np.float32)
    )
    np.testing.assert_allclose(
        np.asarray(f_paged(params)),
        np.asarray(f_chunk(params)),
        rtol=1e-4,
        atol=5e-4,
    )


def _chunked_filter_reference(images, cams, state, texture_size, config):
    """The retired round-3 chunked filter, rebuilt from the parity pieces
    (_anchor_chunks + patch_ncc_scores) — an independent derivation of
    optimization.cpp:98-132 that the production paged path must match."""
    import dataclasses

    import jax.numpy as jnp2

    from densepoints_tpu.pmvs.optimize import _anchor_chunks, patch_ncc_scores

    B, V = state.vis.shape
    new_vis = jnp2.zeros((B, V), bool)
    n_scorable = jnp2.zeros((B,), jnp2.int32)
    for chunk_ids, chunk_ok in _anchor_chunks(
        state.vis, config.max_score_views
    ):
        scores, view_ids, ok = patch_ncc_scores(
            images, cams, state.position, state.normal, state.ref,
            state.vis, texture_size, config.max_score_views,
            impl="xla", view_ids=chunk_ids, ok=chunk_ok,
        )
        keep_slot = ok & (
            (jnp2.arange(ok.shape[1])[None, :] == 0)
            | (scores >= config.score_threshold)
        )
        flat_idx = (
            jnp2.arange(B, dtype=jnp2.int32)[:, None] * V + view_ids
        ).reshape(-1)
        new_vis = new_vis | (
            jnp2.zeros((B * V,), bool)
            .at[flat_idx]
            .max(keep_slot.reshape(-1))
        ).reshape(B, V)
        n_scorable = n_scorable + jnp2.sum(ok.at[:, 0].set(False), axis=1)
    n_after = jnp2.sum(new_vis, axis=1)
    alive = (
        state.alive
        & (n_scorable > 0)
        & (n_after >= config.min_visible_views)
    )
    return dataclasses.replace(state, vis=new_vis, alive=alive)


def test_paged_filter_matches_chunked(rng):
    from densepoints_tpu.config import OptimizeConfig
    from densepoints_tpu.pmvs.optimize import filter_by_error
    from densepoints_tpu.pmvs.patch import PatchState

    scene, cams, images = _setup(rng)
    pos, nrm, refs, vis = _patches(cams, rng, 14, mixed=True)
    state = PatchState.create(
        np.asarray(pos), np.asarray(nrm), np.asarray(refs), np.asarray(vis)
    )
    out_chunk = _chunked_filter_reference(
        images, cams, state, 11, OptimizeConfig(max_score_views=3)
    )
    out_paged = filter_by_error(
        images, cams, state, 11, OptimizeConfig(sampling_impl="paged")
    )
    np.testing.assert_array_equal(
        np.asarray(out_paged.alive), np.asarray(out_chunk.alive)
    )
    np.testing.assert_array_equal(
        np.asarray(out_paged.vis), np.asarray(out_chunk.vis)
    )
