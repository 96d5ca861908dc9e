"""Multi-HOST distribution: jax.distributed entry point + global-mesh driver.

The reference is single-process OpenMP (SURVEY.md §2.7/§5.8 — no MPI/NCCL/
sockets anywhere); this layer is the TPU-native multi-host design:

  * `initialize_multihost` wraps `jax.distributed.initialize` (DCN
    coordination service). On TPU pods the topology is auto-detected; for
    CI the same entry point runs N CPU processes with virtual devices and
    gloo collectives (tests/parallel/test_multihost.py).
  * one GLOBAL 1-D mesh over all hosts' devices. Patch work shards over it
    exactly as on a single host (the patch axis spans ICI within a slice
    and DCN across hosts — patch refinement has ZERO collectives, so DCN
    only carries the tiny insertion votes and the output all-gathers).
  * occupancy grids are VIEW-sharded (each device owns a slice of views'
    grids, `viewsharded_insert`): insertion claims route to the owning
    device and the >=2-grids acceptance rule is a (P,)-int32 psum — no
    V*Hg*Wg replication or min-merge anywhere.
  * host orchestration (round loop, compaction, seeding, export) runs
    IDENTICALLY on every process from the same deterministic inputs; jitted
    stages return fully-REPLICATED outputs (out_shardings) so each host
    reads them locally without cross-process gathers.

Determinism: all contention is resolved by global candidate ids
(scatter-min), so the N-host cloud equals the 1-host cloud — asserted by
the multi-process CPU test.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from densepoints_tpu.config import PipelineConfig
from densepoints_tpu.core.cameras import Cameras
from densepoints_tpu.parallel.distributed import (
    pad_views,
    refine_step_impl,
    viewsharded_insert,
)
from densepoints_tpu.parallel.mesh import PATCH_AXIS, replicate
from densepoints_tpu.pmvs.expand import make_expansion_candidates
from densepoints_tpu.pmvs.filter import run_filters
from densepoints_tpu.pmvs.organizer import candidate_cells, make_grids
from densepoints_tpu.pmvs.patch import PatchState
from densepoints_tpu.pmvs.pipeline import DensifyResult
from densepoints_tpu.pmvs.seed import (
    create_patches_from_points,
    generate_seed_points,
)
from densepoints_tpu.pmvs.visibility import compute_color
from densepoints_tpu.utils import StageMetrics, log

__all__ = [
    "initialize_multihost",
    "global_mesh",
    "densify_multihost",
]


def initialize_multihost(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
    platform: str | None = None,
):
    """Join (or form) the multi-host job. Returns (process_id, n_processes).

    On TPU pods all arguments are auto-detected from the environment
    (jax.distributed's cloud detection); pass them explicitly for manual
    layouts or CPU simulation. `platform="cpu"` additionally selects gloo
    collectives so CI can run real multi-process programs without chips.
    """
    if platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    log.info(
        "multihost: process %d/%d, %d global devices (%d local)",
        jax.process_index(),
        jax.process_count(),
        len(jax.devices()),
        len(jax.local_devices()),
    )
    return jax.process_index(), jax.process_count()


def global_mesh():
    """1-D mesh over ALL devices of ALL processes (patch axis)."""
    from jax.sharding import Mesh

    return Mesh(np.asarray(jax.devices()), (PATCH_AXIS,))


def _put_replicated(tree, mesh):
    rep = replicate(mesh)
    return jax.tree.map(lambda a: jax.device_put(jnp.asarray(a), rep), tree)


def _refine_replicated(mesh, images, cameras, state, texture_size, cfg):
    """Sharded refine with replicated outputs (host-readable everywhere)."""
    fn = jax.jit(
        refine_step_impl,
        static_argnames=("texture_size", "optimize_config"),
        in_shardings=(
            replicate(mesh),
            replicate(mesh),
            NamedSharding(mesh, P(PATCH_AXIS)),
        ),
        out_shardings=replicate(mesh),
    )
    n = mesh.devices.size
    pad = (-state.capacity) % n
    if pad:
        state = jax.tree.map(
            lambda a: jnp.concatenate(
                [jnp.asarray(a), jnp.zeros((pad,) + a.shape[1:], a.dtype)],
                axis=0,
            ),
            state,
        )
    sharded = jax.tree.map(
        lambda a: jax.device_put(
            jnp.asarray(a), NamedSharding(mesh, P(PATCH_AXIS))
        ),
        state,
    )
    return fn(images, cameras, sharded, texture_size, cfg)


def _host_state(state: PatchState) -> PatchState:
    """Materialize a (replicated) device state as host numpy."""
    return jax.tree.map(lambda a: np.asarray(a), state)


def _host_compact(state: PatchState) -> PatchState:
    keep = np.asarray(state.alive)
    return jax.tree.map(lambda a: np.asarray(a)[keep], state)


def densify_multihost(
    scene,
    config: PipelineConfig = PipelineConfig(),
    mesh=None,
    seed_points: np.ndarray | None = None,
) -> DensifyResult:
    """End-to-end densification over a (hosts x devices) global mesh.

    Every process calls this with the SAME scene/config and receives the
    SAME result. `seed_points` short-circuits the seeding front-end (used
    by tests and by callers that bring their own sparse reconstruction).
    """
    if mesh is None:
        mesh = global_mesh()
    metrics = StageMetrics()
    cameras = scene.cameras
    n_dev = mesh.devices.size
    log.info(
        "multihost densify: %d devices over %d processes",
        n_dev,
        jax.process_count(),
    )
    images_rep = _put_replicated(jnp.asarray(scene.images), mesh)
    cams_rep = _put_replicated(cameras, mesh)

    with metrics.stage("seed"):
        if seed_points is None:
            points, obs, obs_mask = generate_seed_points(
                jnp.asarray(scene.images), cameras, config.matching
            )
            if config.ba.enable and len(points) >= 8:
                from densepoints_tpu.pmvs.pipeline import _bundle_adjust

                cameras, points, rmse = _bundle_adjust(
                    cameras, points, obs, obs_mask, config.ba, mesh=mesh
                )
                cams_rep = _put_replicated(cameras, mesh)
                metrics.count("ba_rmse_px", rmse)
        else:
            points = seed_points
        state = _host_state(
            create_patches_from_points(
                cameras, points, config.optimize, config.seed
            )
        )

    with metrics.stage("seed_refine"):
        refined = _refine_replicated(
            mesh, images_rep, cams_rep, state,
            config.seed.texture_size, config.optimize,
        )
        state = _host_compact(_host_state(refined))
    metrics.count("seeds_after_refine", state.position.shape[0])
    log.info("multihost: %d seeds after refine", state.position.shape[0])

    # View-sharded occupancy: spec grids (replicated, never written) give
    # the candidate-cell layout; the padded cells array is the sharded
    # occupancy state.
    scale = config.organizer.grid_scale
    min_grids = config.organizer.min_grids_to_accept
    spec = make_grids(cameras, scale)
    V = spec.cells.shape[0]
    gpad = pad_views(spec, n_dev)
    Vp = gpad.cells.shape[0]
    gpad = dataclasses.replace(
        gpad,
        cells=jax.device_put(
            gpad.cells, NamedSharding(mesh, P(PATCH_AXIS))
        ),
    )

    def _insert(st: PatchState, gpad, gids):
        cells = candidate_cells(
            spec, cams_rep, jnp.asarray(st.position), jnp.asarray(st.vis),
            scale,
        )
        cells_pad = jnp.pad(
            cells, ((0, 0), (0, Vp - V)), constant_values=-1
        )
        accepted, new_grids = viewsharded_insert(
            mesh, gpad, cells_pad, jnp.asarray(st.alive),
            jnp.asarray(gids), min_grids,
        )
        return np.asarray(accepted), new_grids

    ids0 = np.arange(state.position.shape[0], dtype=np.int32)
    accepted, gpad = _insert(state, gpad, ids0)
    state = _host_compact(
        dataclasses.replace(state, alive=state.alive & accepted)
    )
    frontier = state
    log.info("multihost: %d seeds inserted", state.position.shape[0])

    with metrics.stage("expand"):
        for round_idx in range(config.expand.max_rounds):
            total = state.position.shape[0]
            if (
                frontier.position.shape[0] == 0
                or total >= config.expand.max_patches
            ):
                break
            expandable = frontier.alive & (
                np.sum(frontier.vis, axis=1)
                >= config.expand.min_visible_views_to_expand
            )
            frontier = _host_compact(
                dataclasses.replace(frontier, alive=expandable)
            )
            if frontier.position.shape[0] == 0:
                break
            cand = _host_state(
                make_expansion_candidates(cameras, frontier, scale)
            )
            cand_refined = _refine_replicated(
                mesh, images_rep, cams_rep, cand,
                config.expand.texture_size, config.optimize,
            )
            cand = _host_state(cand_refined)
            gids = total + np.arange(cand.position.shape[0], dtype=np.int32)
            accepted, gpad = _insert(cand, gpad, gids)
            new_patches = _host_compact(
                dataclasses.replace(cand, alive=cand.alive & accepted)
            )
            n_new = new_patches.position.shape[0]
            log.info(
                "multihost round %d: frontier=%d accepted=%d total=%d",
                round_idx,
                frontier.position.shape[0],
                n_new,
                total + n_new,
            )
            if n_new == 0:
                break
            state = jax.tree.map(
                lambda a, b: np.concatenate([a, b], axis=0),
                state,
                new_patches,
            )
            frontier = new_patches
    metrics.count("patches_after_expand", state.position.shape[0])

    with metrics.stage("filter"):
        final = run_filters(
            cameras,
            jax.tree.map(jnp.asarray, state),
            config.filter,
            config.optimize,
            scale,
        )
        final = final.compact()
    metrics.count("patches_final", final.capacity)

    with metrics.stage("color"):
        if scene.colors is not None and final.capacity:
            color = compute_color(
                cameras, jnp.asarray(scene.colors), final.position
            )
            final = dataclasses.replace(final, color=color)

    log.info("multihost densify done: %s", metrics.summary())
    return DensifyResult(patches=final, metrics=metrics)
