"""Batched, masked direct linear triangulation (DLT).

Reference parity: `modules/geometry/triangulation.cpp:6-34` — N-view DLT
stacking rows (x P_2 - P_0, y P_2 - P_1) and taking the SVD nullspace
(H-Z p.312). Redesigned for TPU:

  * one call triangulates a whole batch of tracks: observations are padded to
    a fixed max-views-per-track with a validity mask; invalid rows are zeroed
    (they contribute nothing to A^T A, so the solution is the masked DLT);
  * instead of an SVD of each (2V, 4) A we take the eigenvector of the
    smallest eigenvalue of the 4x4 normal matrix A^T A — a fixed-size
    symmetric eigenproblem that XLA batches well on TPU;
  * Hartley-style preconditioning: each view's rows are scaled to unit norm,
    which keeps A^T A well-conditioned in f32 even with the reference's
    1e6-magnitude projection entries.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["triangulate", "triangulate_pair"]


def _dlt_rows(P: jax.Array, obs: jax.Array) -> jax.Array:
    """Two DLT rows per observation. P: (..., 3, 4); obs: (..., 2) -> (..., 2, 4)."""
    x = obs[..., 0:1]
    y = obs[..., 1:2]
    r0 = x * P[..., 2, :] - P[..., 0, :]
    r1 = y * P[..., 2, :] - P[..., 1, :]
    return jnp.stack([r0, r1], axis=-2)


def triangulate(
    P: jax.Array, observations: jax.Array, mask: jax.Array | None = None
) -> jax.Array:
    """Triangulate B tracks with up to V views each.

    P: (B, V, 3, 4) or (V, 3, 4) projection matrices per observation.
    observations: (B, V, 2) pixel coords.
    mask: optional (B, V) validity (>=2 true entries required for a
      meaningful solution).
    Returns (B, 3) world points.
    """
    if P.ndim == 3:
        P = jnp.broadcast_to(P[None], observations.shape[:1] + P.shape)
    rows = _dlt_rows(P, observations)  # (B, V, 2, 4)
    # Row normalization (precondition): unit-norm each DLT row.
    norms = jnp.linalg.norm(rows, axis=-1, keepdims=True)
    rows = rows / jnp.maximum(norms, 1e-12)
    if mask is not None:
        rows = rows * mask[..., None, None].astype(rows.dtype)
    A = rows.reshape(rows.shape[0], -1, 4)  # (B, 2V, 4)
    AtA = jnp.einsum("bri,brj->bij", A, A)  # (B, 4, 4)
    # Eigenvector of the smallest eigenvalue (eigh returns ascending order).
    _, vecs = jnp.linalg.eigh(AtA)
    X = vecs[..., 0]  # (B, 4)
    return X[..., :3] / X[..., 3:4]


def triangulate_pair(
    P1: jax.Array, x1: jax.Array, P2: jax.Array, x2: jax.Array
) -> jax.Array:
    """Two-view convenience wrapper. x1, x2: (B, 2) -> (B, 3)."""
    P = jnp.stack([jnp.broadcast_to(P1, (x1.shape[0], 3, 4)),
                   jnp.broadcast_to(P2, (x2.shape[0], 3, 4))], axis=1)
    obs = jnp.stack([x1, x2], axis=1)
    return triangulate(P, obs)
