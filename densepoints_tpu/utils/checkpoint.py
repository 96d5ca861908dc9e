"""Stage-boundary checkpoint / resume.

The reference has no persistence at all (SURVEY.md §5.4 — each run is
monolithic). Here every pipeline stage boundary (seeds, optimized seeds,
per-round expansion state, BA state) can snapshot its PatchState + metadata
to a single .npz and resume from it — cheap insurance for long DTU/T&T runs
and the restart point for elastic multi-host scheduling.
"""
from __future__ import annotations

import dataclasses
import json
from pathlib import Path

import jax.numpy as jnp
import numpy as np

from densepoints_tpu.pmvs.patch import PatchState

__all__ = ["save_checkpoint", "load_checkpoint", "latest_checkpoint"]

_FIELDS = ("position", "normal", "ref", "vis", "cand", "alive", "color")


def save_checkpoint(
    path,
    state: PatchState,
    stage: str,
    extra: dict | None = None,
    cameras=None,
):
    """Snapshot patch state (+ optionally the cameras that produced it).

    Cameras matter when bundle adjustment refined the extrinsics: a resumed
    run must reconstruct with the SAME geometry the patches were optimized
    against, not the scene file's original cameras.
    """
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    arrays = {f: np.asarray(getattr(state, f)) for f in _FIELDS}
    if cameras is not None:
        arrays["__cam_P__"] = np.asarray(cameras.P, np.float64)
        arrays["__cam_w__"] = np.asarray(cameras.width)
        arrays["__cam_h__"] = np.asarray(cameras.height)
    meta = {"stage": stage, "capacity": state.capacity}
    if extra:
        meta.update(extra)
    np.savez_compressed(path, __meta__=json.dumps(meta), **arrays)


def load_checkpoint(path):
    """Returns (PatchState, meta dict, Cameras-or-None)."""
    from densepoints_tpu.core.cameras import Cameras

    with np.load(path, allow_pickle=False) as data:
        meta = json.loads(str(data["__meta__"]))
        state = PatchState(
            **{f: jnp.asarray(data[f]) for f in _FIELDS}
        )
        cameras = None
        if "__cam_P__" in data:
            cameras = Cameras.from_projection_matrices(
                data["__cam_P__"],
                widths=data["__cam_w__"],
                heights=data["__cam_h__"],
            )
    return state, meta, cameras


def latest_checkpoint(directory):
    """Most recent .npz checkpoint in a directory, or None."""
    directory = Path(directory)
    if not directory.is_dir():
        return None
    candidates = sorted(
        directory.glob("*.npz"), key=lambda p: p.stat().st_mtime
    )
    return candidates[-1] if candidates else None
