"""Pixel-to-grid-cell index arithmetic.

Reference parity: `modules/core/grid.h:5-36` / `grid.cpp` — a tiny class
mapping pixel coordinates to cell indices for a cell size. Here just free
functions over (batched) integer arrays, usable inside jitted kernels.
"""
from __future__ import annotations

import jax.numpy as jnp

__all__ = ["grid_dims", "cell_x", "cell_y", "cell_xy"]


def grid_dims(width: int, height: int, cell_size: int):
    """(columns, rows) of the cell grid covering a width x height image.

    Ceil division, like the reference Grid constructor.
    """
    cols = -(-width // cell_size)
    rows = -(-height // cell_size)
    return cols, rows


def cell_x(x, cell_size):
    return jnp.asarray(x, jnp.int32) // cell_size


def cell_y(y, cell_size):
    return jnp.asarray(y, jnp.int32) // cell_size


def cell_xy(x, y, columns, cell_size):
    """Flat cell index: (y // s) * columns + x // s (grid.cpp:31-35)."""
    return cell_y(y, cell_size) * columns + cell_x(x, cell_size)
