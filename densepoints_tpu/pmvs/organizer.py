"""Per-view occupancy grids as dense device arrays + bulk insertion.

Reference parity: `PatchGrid` / `PatchOrganizer` (patch_organizer.h/.cpp):
one grid per view at `grid_scale` px/cell, `max_patches_per_cell` = 1; a
patch is accepted iff it lands in >= 2 view grids (TryInsert,
patch_organizer.cpp:42-65). The reference stores raw pointers into cells
(with the dangling-pointer and end()-off-by-one bugs SURVEY.md §2.5 flags —
not replicated here).

TPU redesign: grids are ONE dense (V, Hg, Wg) int32 array of global patch
ids (-1 = empty). Insertion of a whole batch of candidates is a two-phase
scatter: (1) scatter-min of candidate priority into contested cells,
(2) gather-back to find winners; a candidate is accepted iff it wins >= 2
cells, and only accepted candidates are written. Priority = candidate index,
making contention resolution deterministic (the queue-order races of the
OpenMP reference become a fixed total order).
"""
from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from densepoints_tpu.config import OrganizerConfig
from densepoints_tpu.core.cameras import Cameras

__all__ = ["OccupancyGrids", "make_grids", "candidate_cells", "bulk_try_insert"]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class OccupancyGrids:
    """cells: (V, Hg, Wg) int32 global patch ids, -1 empty.

    cols/rows: (V,) int32 per-view valid grid extents (floor(W/scale),
    floor(H/scale) — the reference's integer division,
    patch_organizer.cpp:34-36).
    """

    cells: jax.Array
    cols: jax.Array
    rows: jax.Array

    @property
    def num_views(self) -> int:
        return self.cells.shape[0]


def make_grids(cameras: Cameras, grid_scale: int) -> OccupancyGrids:
    cols = cameras.width // grid_scale
    rows = cameras.height // grid_scale
    Hg = int(jnp.max(rows))
    Wg = int(jnp.max(cols))
    cells = jnp.full((cameras.num_views, Hg, Wg), -1, jnp.int32)
    return OccupancyGrids(cells=cells, cols=cols, rows=rows)


def candidate_cells(
    grids: OccupancyGrids,
    cameras: Cameras,
    position: jax.Array,
    vis: jax.Array,
    grid_scale: int,
):
    """Flat cell ids (B, V) for each patch in each view; -1 where invalid.

    A slot is valid where the view is in the patch's visible mask and the
    projected cell lies inside that view's grid bounds.
    """
    V, Hg, Wg = grids.cells.shape
    pix = cameras.project(position)  # (V, B, 2)
    col = jnp.floor(pix[..., 0] / grid_scale).astype(jnp.int32).T  # (B, V)
    row = jnp.floor(pix[..., 1] / grid_scale).astype(jnp.int32).T
    ok = (
        vis
        & (col >= 0)
        & (col < grids.cols[None, :])
        & (row >= 0)
        & (row < grids.rows[None, :])
    )
    view_ids = jnp.arange(V)[None, :]
    flat = view_ids * (Hg * Wg) + row * Wg + col
    return jnp.where(ok, flat, -1)


@functools.partial(jax.jit, static_argnames=("min_grids",))
def bulk_try_insert(
    grids: OccupancyGrids,
    cell_ids: jax.Array,
    candidate_alive: jax.Array,
    global_ids: jax.Array,
    min_grids: int = 2,
):
    """Insert a batch of candidates with deterministic contention resolution.

    cell_ids: (B, V) from `candidate_cells` (-1 invalid).
    candidate_alive: (B,) candidates eligible for insertion.
    global_ids: (B,) the patch ids accepted candidates will occupy cells as.
    Returns (accepted (B,) bool, new_grids).
    """
    V, Hg, Wg = grids.cells.shape
    flat = grids.cells.reshape(-1)
    B = cell_ids.shape[0]
    n_cells = flat.shape[0]

    active = candidate_alive[:, None] & (cell_ids >= 0)
    safe_cells = jnp.where(active, cell_ids, n_cells)  # dump slot
    occupied = jnp.concatenate([flat >= 0, jnp.ones((1,), bool)])[safe_cells]
    active = active & ~occupied
    safe_cells = jnp.where(active, cell_ids, n_cells)

    # Phase 1: scatter-min candidate priority (its batch index).
    prio = jnp.broadcast_to(jnp.arange(B, dtype=jnp.int32)[:, None], (B, V))
    claim = jnp.full((n_cells + 1,), B, jnp.int32)
    claim = claim.at[safe_cells.reshape(-1)].min(prio.reshape(-1))

    # Phase 2: winners and acceptance.
    won = active & (claim[safe_cells] == prio)
    accepted = jnp.sum(won, axis=1) >= min_grids

    # Phase 3: write accepted winners.
    write = won & accepted[:, None]
    wcells = jnp.where(write, cell_ids, n_cells).reshape(-1)
    values = jnp.broadcast_to(
        global_ids.astype(jnp.int32)[:, None], (B, V)
    ).reshape(-1)
    new_flat = jnp.concatenate([flat, jnp.zeros((1,), jnp.int32)])
    new_flat = new_flat.at[wcells].set(values)  # non-writes land in the dump slot
    new_grids = dataclasses.replace(
        grids, cells=new_flat[:-1].reshape(V, Hg, Wg)
    )
    return accepted, new_grids
