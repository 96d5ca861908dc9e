"""Pallas TPU kernel: batched masked NCC over texture pairs.

The innermost op of the whole pipeline (SURVEY.md §2.1 "Pallas kernel #1"):
given flattened texture pairs (N, L) it computes the reference's NCC —
population statistics, cov / max(sigma_a * sigma_b, 0.1) — for every row.

Kernel design: rows are tiled (TILE_N, L) into VMEM; each tile computes the
fused mean/var/cov reductions along the lane axis in one pass (5 running
sums evaluated as one fused multiply/add chain on the VPU), writing one
score per row. L is padded to the 128-lane boundary with a mask so the
statistics only see real texels. Everything stays in f32 (texture values are
[0, 255] grayscale — bf16 would cost precision in the variance terms).

`ncc_pairs` dispatches to the kernel on TPU and to the identical XLA
implementation (core/scores.py) elsewhere; both are tested to agree.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from densepoints_tpu.core.scores import NCC_MIN_DENOM, ncc_score

__all__ = ["ncc_pairs", "ncc_pairs_pallas"]

# 1024 rows/tile: matches the XLA {0:T(1024)} layout of the flat f32 output
# (Mosaic requires the out block to align) and keeps 3 x (1024, 128) f32
# input tiles ~1.5 MB — comfortable double-buffered VMEM residency.
_TILE_N = 1024


def _ncc_kernel_nomask(a_ref, b_ref, out_ref):
    a = a_ref[:]  # (TILE_N, L)
    b = b_ref[:]
    L = a.shape[1]
    n = jnp.asarray(float(L), a.dtype)
    am = jnp.sum(a, axis=1, keepdims=True) / n
    bm = jnp.sum(b, axis=1, keepdims=True) / n
    ca = a - am
    cb = b - bm
    cov = jnp.sum(ca * cb, axis=1) / n
    va = jnp.sum(ca * ca, axis=1) / n
    vb = jnp.sum(cb * cb, axis=1) / n
    denom = jnp.maximum(jnp.sqrt(va) * jnp.sqrt(vb), NCC_MIN_DENOM)
    out_ref[:] = cov / denom


def _ncc_kernel(a_ref, b_ref, mask_ref, out_ref):
    a = a_ref[:]  # (TILE_N, L)
    b = b_ref[:]
    m = mask_ref[:]
    n = jnp.sum(m, axis=1, keepdims=True)  # (TILE_N, 1)
    n_safe = jnp.maximum(n, 1.0)
    am = jnp.sum(a * m, axis=1, keepdims=True) / n_safe
    bm = jnp.sum(b * m, axis=1, keepdims=True) / n_safe
    ca = (a - am) * m
    cb = (b - bm) * m
    cov = jnp.sum(ca * cb, axis=1) / n_safe[:, 0]
    va = jnp.sum(ca * ca, axis=1) / n_safe[:, 0]
    vb = jnp.sum(cb * cb, axis=1) / n_safe[:, 0]
    denom = jnp.maximum(jnp.sqrt(va) * jnp.sqrt(vb), NCC_MIN_DENOM)
    score = cov / denom
    out_ref[:] = jnp.where(n[:, 0] > 0, score, -1.0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def ncc_pairs_pallas(
    a: jax.Array,
    b: jax.Array,
    mask: jax.Array | None = None,
    interpret: bool = False,
) -> jax.Array:
    """(N, L) texture pairs -> (N,) NCC scores via the Pallas kernel.

    Only the row count is padded (to the 1024-row output tile); Mosaic
    handles the non-128 minor dimension with masked loads, so no HBM-side
    lane-padding copy is paid. Maskless inputs use a 3-operand kernel.
    """
    N, L = a.shape
    Np = -(-N // _TILE_N) * _TILE_N
    pad = lambda x: jnp.pad(x.astype(jnp.float32), ((0, Np - N), (0, 0)))
    spec = pl.BlockSpec((_TILE_N, L), lambda i: (i, 0), memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((_TILE_N,), lambda i: (i,), memory_space=pltpu.VMEM)
    if mask is None:
        out = pl.pallas_call(
            _ncc_kernel_nomask,
            out_shape=jax.ShapeDtypeStruct((Np,), jnp.float32),
            grid=(Np // _TILE_N,),
            in_specs=[spec, spec],
            out_specs=out_spec,
            interpret=interpret,
        )(pad(a), pad(b))
    else:
        out = pl.pallas_call(
            _ncc_kernel,
            out_shape=jax.ShapeDtypeStruct((Np,), jnp.float32),
            grid=(Np // _TILE_N,),
            in_specs=[spec, spec, spec],
            out_specs=out_spec,
            interpret=interpret,
        )(pad(a), pad(b), pad(mask.astype(jnp.float32)))
    return out[:N]


def ncc_pairs(a: jax.Array, b: jax.Array, mask: jax.Array | None = None):
    """Backend dispatch: Pallas kernel on TPU, XLA reference elsewhere.

    Resolved at LOWERING time per target platform (lax.platform_dependent),
    so a CPU mesh works even when a TPU plugin owns the default backend.
    """
    if mask is None:
        return jax.lax.platform_dependent(
            a,
            b,
            tpu=lambda a, b: ncc_pairs_pallas(a, b),
            default=lambda a, b: ncc_score(a, b).astype(jnp.float32),
        )
    return jax.lax.platform_dependent(
        a,
        b,
        mask,
        tpu=lambda a, b, m: ncc_pairs_pallas(a, b, m),
        default=lambda a, b, m: ncc_score(a, b, m).astype(jnp.float32),
    )
