"""Surface extraction: TSDF fusion of oriented points + marching tetrahedra.

The reference's `modules/surface/` is an EMPTY directory (0-byte
CMakeLists); BASELINE.json config 5 requires surface extraction. Design:

  * TSDF: the oriented point cloud is splatted into a voxel grid — every
    point updates the voxels in a (2r+1)^3 window around it with the signed
    distance along its normal (a local plane approximation), weighted by
    distance; all points scatter in one jitted op.
  * meshing: marching TETRAHEDRA over the fused grid — unlike marching
    cubes it needs no 256-entry case tables (each cube splits into 6
    tetrahedra with trivial 16-case logic), which keeps the implementation
    first-party and testable. Vertex positions are linearly interpolated
    zero crossings.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from densepoints_tpu.config import SurfaceConfig

__all__ = ["fuse_tsdf", "marching_tetrahedra", "extract_surface"]


@functools.partial(jax.jit, static_argnames=("resolution", "window"))
def fuse_tsdf(
    positions: jax.Array,
    normals: jax.Array,
    origin: jax.Array,
    voxel_size: jax.Array,
    resolution: int,
    truncation: jax.Array,
    window: int = 2,
):
    """Fuse oriented points into a (R, R, R) TSDF + weight grid."""
    R = resolution
    vox = (positions - origin) / voxel_size  # fractional voxel coords
    base = jnp.floor(vox).astype(jnp.int32)

    tsdf = jnp.zeros((R * R * R + 1,), jnp.float32)
    weight = jnp.zeros((R * R * R + 1,), jnp.float32)
    offs = jnp.arange(-window, window + 1)
    for dz in range(-window, window + 1):
        for dy in range(-window, window + 1):
            for dx in range(-window, window + 1):
                idx = base + jnp.asarray([dx, dy, dz])
                ok = jnp.all((idx >= 0) & (idx < R), axis=-1)
                center = (idx.astype(jnp.float32) - vox) * voxel_size
                # Signed distance to the point's tangent plane.
                sdf = jnp.sum(center * normals, axis=-1)
                # Weight by tangential proximity (within the splat radius).
                tang2 = jnp.sum(center * center, axis=-1) - sdf * sdf
                w = jnp.exp(
                    -0.5 * tang2 / jnp.maximum(voxel_size * window, 1e-9) ** 2
                )
                ok = ok & (jnp.abs(sdf) <= truncation)
                flat = jnp.where(
                    ok,
                    (idx[:, 2] * R + idx[:, 1]) * R + idx[:, 0],
                    R * R * R,
                )
                clipped = jnp.clip(sdf, -truncation, truncation)
                tsdf = tsdf.at[flat].add(jnp.where(ok, w * clipped, 0.0))
                weight = weight.at[flat].add(jnp.where(ok, w, 0.0))
    tsdf = tsdf[:-1] / jnp.maximum(weight[:-1], 1e-9)
    has = weight[:-1] > 1e-6
    # Unobserved voxels get +truncation (outside) so surfaces close around
    # the observed crust.
    tsdf = jnp.where(has, tsdf, truncation)
    return (
        tsdf.reshape(R, R, R),
        weight[:-1].reshape(R, R, R),
    )


# The 6 tetrahedra of a cube (indices into the 8 cube corners).
_TETS = np.array(
    [
        [0, 5, 1, 6],
        [0, 1, 2, 6],
        [0, 2, 3, 6],
        [0, 3, 7, 6],
        [0, 7, 4, 6],
        [0, 4, 5, 6],
    ]
)
# Corner offsets (x, y, z) of a unit cube, standard binary order:
_CORNERS = np.array(
    [
        [0, 0, 0],
        [1, 0, 0],
        [1, 1, 0],
        [0, 1, 0],
        [0, 0, 1],
        [1, 0, 1],
        [1, 1, 1],
        [0, 1, 1],
    ],
    dtype=np.float64,
)


def marching_tetrahedra(tsdf: np.ndarray, origin, voxel_size, valid=None):
    """Triangulate the zero level set. Host-side numpy (mesh assembly is
    pointer-chasing, not array math). Returns (vertices (N,3), faces (M,3)).

    `valid` (R,R,R) bool marks OBSERVED voxels: cubes touching unobserved
    voxels are skipped. Without it, the +truncation fill of unobserved
    space behind the crust flips sign against the crust's negative band
    and triangulates a phantom inner shell ~truncation behind the real
    surface (measured 1.3 mm median error on a perfect sphere cloud vs
    0.2 mm with the mask)."""
    tsdf = np.asarray(tsdf)
    R = tsdf.shape[0]
    origin = np.asarray(origin, np.float64)
    vs = float(voxel_size)

    verts: list = []
    faces: list = []
    vert_cache: dict = {}

    def edge_vertex(p0, p1, v0, v1):
        key = (tuple(p0), tuple(p1)) if tuple(p0) < tuple(p1) else (tuple(p1), tuple(p0))
        cached = vert_cache.get(key)
        if cached is not None:
            return cached
        t = v0 / (v0 - v1)
        pos = origin + vs * (np.asarray(p0) + t * (np.asarray(p1) - np.asarray(p0)))
        idx = len(verts)
        verts.append(pos)
        vert_cache[key] = idx
        return idx

    # Only iterate cubes that straddle the surface (and, with `valid`,
    # whose 8 corners were all observed).
    sign = tsdf < 0
    straddles = _cube_straddles(sign)
    if valid is not None:
        straddles &= _cube_all_valid(np.asarray(valid))
    cz, cy, cx = np.nonzero(straddles)
    for z, y, x in zip(cz, cy, cx):
        cube_pos = np.array([x, y, z], np.float64)
        corner_vals = np.array(
            [tsdf[z + int(c[2]), y + int(c[1]), x + int(c[0])] for c in _CORNERS]
        )
        for tet in _TETS:
            vals = corner_vals[tet]
            inside = vals < 0
            n_in = int(inside.sum())
            if n_in == 0 or n_in == 4:
                continue
            pts = [cube_pos + _CORNERS[c] for c in tet]
            if n_in == 1 or n_in == 3:
                # One corner isolated -> one triangle.
                iso = int(np.argmax(inside if n_in == 1 else ~inside))
                others = [i for i in range(4) if i != iso]
                tri = [
                    edge_vertex(pts[iso], pts[o], vals[iso], vals[o])
                    for o in others
                ]
                if n_in == 3:
                    tri = tri[::-1]
                faces.append(tri)
            else:  # 2-2 split -> quad -> two triangles
                ins = [i for i in range(4) if inside[i]]
                outs = [i for i in range(4) if not inside[i]]
                q = [
                    edge_vertex(pts[ins[0]], pts[outs[0]], vals[ins[0]], vals[outs[0]]),
                    edge_vertex(pts[ins[0]], pts[outs[1]], vals[ins[0]], vals[outs[1]]),
                    edge_vertex(pts[ins[1]], pts[outs[1]], vals[ins[1]], vals[outs[1]]),
                    edge_vertex(pts[ins[1]], pts[outs[0]], vals[ins[1]], vals[outs[0]]),
                ]
                faces.append([q[0], q[1], q[2]])
                faces.append([q[0], q[2], q[3]])
    if not verts:
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int32)
    return np.asarray(verts, np.float32), np.asarray(faces, np.int32)


def _cube_all_valid(valid: np.ndarray) -> np.ndarray:
    """(R-1)^3 bool: all 8 cube corners are observed voxels."""
    out = np.ones(np.array(valid.shape) - 1, bool)
    for dz in (0, 1):
        for dy in (0, 1):
            for dx in (0, 1):
                out &= valid[
                    dz : valid.shape[0] - 1 + dz,
                    dy : valid.shape[1] - 1 + dy,
                    dx : valid.shape[2] - 1 + dx,
                ]
    return out


def _cube_straddles(sign: np.ndarray) -> np.ndarray:
    """(R-1)^3 bool: cube has both inside and outside corners."""
    s = sign
    all_in = np.ones(np.array(s.shape) - 1, bool)
    any_in = np.zeros(np.array(s.shape) - 1, bool)
    for dz in (0, 1):
        for dy in (0, 1):
            for dx in (0, 1):
                c = s[
                    dz : s.shape[0] - 1 + dz,
                    dy : s.shape[1] - 1 + dy,
                    dx : s.shape[2] - 1 + dx,
                ]
                all_in &= c
                any_in |= c
    return any_in & ~all_in


def extract_surface(
    positions: np.ndarray,
    normals: np.ndarray,
    config: SurfaceConfig = SurfaceConfig(),
):
    """Point cloud -> (vertices, faces) via TSDF + marching tetrahedra."""
    positions = np.asarray(positions, np.float32)
    normals = np.asarray(normals, np.float32)
    if len(positions) == 0:
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int32)
    lo = positions.min(axis=0)
    hi = positions.max(axis=0)
    pad = 0.05 * float(np.max(hi - lo) or 1.0)
    lo, hi = lo - pad, hi + pad
    R = config.voxel_resolution
    voxel = float(np.max(hi - lo)) / (R - 1)
    trunc = config.truncation_voxels * voxel
    tsdf, weight = fuse_tsdf(
        jnp.asarray(positions),
        jnp.asarray(normals),
        jnp.asarray(lo),
        jnp.asarray(voxel, jnp.float32),
        R,
        jnp.asarray(trunc, jnp.float32),
    )
    return marching_tetrahedra(
        np.asarray(tsdf),
        lo,
        voxel,
        valid=np.asarray(weight) > max(config.min_weight, 1e-6),
    )
