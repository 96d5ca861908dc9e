"""Regression tests for the f32-geometry matmul-precision contract.

Failure mode being pinned (round 4's most expensive find): on TPU, f32
matmuls/einsums route through the MXU in bfloat16 under the default matmul
precision. Projection matrices multiplied in bf16 put window corners whole
pixels off at scan-scale coordinates (1600x1200, focal ~2900) — measured
0.13 mean NCC error and ~10% of accept decisions flipped at the 0.6
threshold, silently corrupting every round-3 TPU scoring path.

Two independent guards, each with its own test so reverting either one
fails the suite (VERDICT r4 next-step #4):

  1. the package-wide default (`densepoints_tpu/__init__.py`): importing
     the package sets `jax_default_matmul_precision=highest` when the
     application has not chosen its own;
  2. per-site pins: every pixel-coordinate-producing matmul passes
     `precision=HIGHEST` explicitly, so geometry stays correct even under
     a caller's own precision context (ADVICE r4 medium).

The on-hardware end of this contract (TPU scores vs a numpy f64 oracle at
scan-scale coordinates) lives in tests/ops/test_tpu_smoke.py.
"""
import re

import jax
import jax.numpy as jnp
import numpy as np

import densepoints_tpu  # noqa: F401  (import applies the global default)
from densepoints_tpu.core.cameras import Cameras


def _scan_scale_cameras(n=3):
    """The DTU_r04 camera family: 1600x1200, focal ~2900 — coordinates
    large enough that bf16 rounding moves pixel positions by whole px."""
    rng = np.random.default_rng(0)
    K = np.array([[2900.0, 0, 800.0], [0, 2900.0, 600.0], [0, 0, 1.0]])
    Ps = []
    for i in range(n):
        ang = (i - (n - 1) / 2) * 0.15
        C = np.array([600 * np.sin(ang), 40.0 * i, -600 * np.cos(ang)])
        z = -C / np.linalg.norm(C)
        x = np.cross([0.0, 1.0, 0.0], z)
        x /= np.linalg.norm(x)
        y = np.cross(z, x)
        R = np.stack([x, y, z])
        Ps.append(K @ np.concatenate([R, (-R @ C)[:, None]], 1))
    return Cameras.from_projection_matrices(
        np.stack(Ps), widths=1600, heights=1200
    )


def test_package_import_sets_global_highest():
    # Reverting densepoints_tpu/__init__.py's config.update line fails
    # here. The test environment never sets its own default, so the
    # non-clobbering guard must have applied the package default.
    assert jax.config.jax_default_matmul_precision == "highest", (
        "package import must default f32 matmuls to HIGHEST: the TPU "
        "default lowers f32 geometry matmuls to bf16 on the MXU, which "
        "corrupts pixel coordinates (r4: ~10% of accept decisions flipped)"
    )


def _lowered_precisions(fn, *args):
    with jax.default_matmul_precision("bfloat16"):
        txt = jax.jit(fn).lower(*args).as_text()
    return set(re.findall(r"precision = \[(\w+)", txt))


def test_camera_projection_pinned_highest():
    # Reverting the per-site `precision=HIGHEST` pins in
    # core/cameras.py:project fails here: under an application's bf16
    # context the lowered program would carry DEFAULT precision.
    cams = _scan_scale_cameras()
    prec = _lowered_precisions(
        lambda c, p: c.project(p), cams, jnp.zeros((8, 3))
    )
    assert prec == {"HIGHEST"}, prec


def test_dense_geometry_projection_pinned_highest():
    # ops/warp_ncc_paged.dense_geometry:209's matmul computes every window
    # corner for the paged kernel; it must stay HIGHEST under any context.
    from densepoints_tpu.ops.warp import patch_frames
    from densepoints_tpu.ops.warp_ncc_paged import dense_geometry, page_dims

    cams = _scan_scale_cameras()
    B = 8
    pos = jnp.zeros((B, 3))
    nrm = jnp.tile(jnp.asarray([0.0, 0.0, 1.0]), (B, 1))
    ref = jnp.zeros((B,), jnp.int32)

    def f(cams, pos, nrm, ref):
        sx, sy = patch_frames(cams, pos, nrm, ref, 11)
        Hp, _, nxb = page_dims((cams.num_views, 1200, 1600))
        return dense_geometry(cams, (Hp, nxb), pos, sx, sy, 11)

    prec = _lowered_precisions(f, cams, pos, nrm, ref)
    # The one-hot sampling matmuls inside the kernel are bf16 BY DESIGN;
    # dense_geometry itself must only ever emit HIGHEST dots.
    assert "DEFAULT" not in prec and "HIGHEST" in prec, prec


def test_patch_frames_pinned_highest():
    from densepoints_tpu.ops.warp import patch_frames

    cams = _scan_scale_cameras()
    B = 8
    prec = _lowered_precisions(
        lambda c, p, n, r: patch_frames(c, p, n, r, 11),
        cams,
        jnp.zeros((B, 3)),
        jnp.tile(jnp.asarray([0.0, 0.0, 1.0]), (B, 1)),
        jnp.zeros((B,), jnp.int32),
    )
    assert prec == {"HIGHEST"}, prec
