"""Fused warp + NCC Pallas kernel — the framework's headline TPU kernel.

Why: the photometric objective evaluates, per candidate, every patch's
texture in every visible view (bilinear samples at homography-warped
coordinates) and NCC-scores it against the anchor texture. In XLA the
sampling lowers to scalarized gathers (~1e8 samples/s on v5e — the
measured pipeline bottleneck at ~27k scoring passes/s for 4096 patches).

Kernel design (one grid step = TILE_B patches x M view slots):
  * per-slot window corners (y0, x0) and view ids arrive as SMEM inputs
    blocked per grid step (NOT scalar-prefetch: prefetch pins the FULL
    (B, M) arrays in the 1 MB SMEM and fails to compile past ~4k patches;
    blocked SMEM slices are a few hundred bytes per step) and drive async
    DMAs of fixed (WIN_H, WIN_W) image windows HBM -> VMEM — the only HBM
    traffic is ~WIN_H*WIN_W*4 bytes per slot, replacing millions of
    scalar gathers;
  * bilinear sampling is reformulated per sample s as a separable bilinear
    form  tex[s] = wy[s,:] @ ROI @ wx[s,:]^T  with hat-function weights
    built in-kernel from broadcasted iota — evaluated as ONE MXU matmul
    B = Wx @ ROI^T (S x WIN_W x WIN_H) plus a VPU contraction
    tex = sum(Wy * B, axis=-1). No gathers anywhere;
  * NCC (population stats, 0.1 denom clamp, masked to the k*k real
    texels) against slot 0 happens in-register; only (B, M) scores reach
    HBM.

Semantics notes:
  * samples are clamped to the window interior; as long as a texture's
    footprint fits the window (footprint ~ k px in the reference view by
    construction; WIN gives ~4x slack for perspective stretch in other
    views) this equals clamp-to-edge bilinear sampling. Validity (corner
    outside image) is computed by the XLA caller exactly as before.
  * anchor = slot 0 (the first visible view), matching optimization.cpp's
    textures[0].
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from densepoints_tpu.core.scores import NCC_MIN_DENOM

__all__ = ["warp_ncc_scores", "patch_ncc_scores_fused", "WIN_H", "WIN_W"]

# Window sizes are chosen so corners can snap to the f32 HBM tile grid
# (y0 % 8 == 0, x0 % 128 == 0 — Mosaic requires DMA slices tile-aligned)
# while still guaranteeing slack around the patch center. The lane axis
# gets EFFECTIVE 64-px snapping from two phase-shifted image copies
# (caller stacks I and I<<64px; odd 64-px corners read the shifted copy at
# a 128-aligned offset), so the window is 128 wide with the center 32..96
# px in. y0 = floor8(cy - 24) puts the center 24..32 rows in. Both leave
# >= 24/32 px of slack — enough for a texture footprint stretched ~4x from
# its k-pixel reference-view size (samples beyond it clamp to the box
# edge, as the window-interior clamp always did).
WIN_H = 56
WIN_W = 128
TILE_B = 8  # patches per grid step
# Images up to this many bytes are pinned whole in VMEM (the "resident"
# kernel): window reads become dynamic VMEM slices feeding the MXU directly,
# eliminating all per-slot DMA issue/wait overhead (the measured dominant
# cost of the DMA kernel at bench shapes). Larger image sets stream windows
# from HBM with per-slot async copies. The default is derived from the
# device generation's VMEM capacity (minus workspace for the kernel's
# weights/profiles); DENSEPOINTS_RESIDENT_LIMIT overrides it.


RESIDENT_LIMIT_BYTES: int | None = None  # None = derive lazily per device


def _resident_limit() -> int:
    """Resolve the resident threshold (lazy: touching jax.devices() at
    import time would break jax.distributed.initialize ordering)."""
    import os

    if RESIDENT_LIMIT_BYTES is not None:
        return RESIDENT_LIMIT_BYTES
    env = os.environ.get("DENSEPOINTS_RESIDENT_LIMIT")
    if env is not None:
        return int(env)
    try:
        kind = jax.devices()[0].device_kind.lower()
    except Exception:
        return 8 * 1024 * 1024
    # 128 MiB VMEM parts (v4/v5e/v5p/v6e) can pin 64 MiB of images and
    # still leave half for weights/profiles; older/unknown parts with
    # 16-32 MiB VMEM get a conservative 8 MiB and stream the rest. The
    # CPU interpret path keeps the TPU default so tests cover the
    # resident kernel.
    big_vmem = ("v4", "v5", "v6", "lite", "cpu")
    if any(t in kind for t in big_vmem):
        return 64 * 1024 * 1024
    return 8 * 1024 * 1024


def _kernel_factory(M: int, S: int, n_real: int, resident: bool):
    """Kernel over TILE_B patches with M slots of S samples (n_real live).

    ONE compute design serves both memory regimes; only the window access
    differs:
      * resident=True: the whole (bf16, row-flattened) image stack sits in
        VMEM and a slot's window is a dynamic VMEM slice feeding the MXU
        directly — no DMA issue/wait overhead (the measured dominant cost
        of the streaming variant at bench shapes);
      * resident=False (streaming — scenes too big for VMEM, e.g. a DTU
        scan): windows arrive as per-slot async bf16 DMAs from the SAME
        row-flattened HBM layout. All TILE_B x M copies are issued up
        front and waited per patch, so later patches' transfers overlap
        earlier patches' matmuls; a wait interleaved between matmuls
        stalls the MXU pipeline (measured 21 ms vs 7.7 ms per call).

    Shared compute (design points measured in scripts/kernel_ablate.py on
    v5e, first landed on the resident variant in round 2 and ported to the
    streaming variant in round 3 so >VMEM scenes hit the same MXU path):
      * matmul orientation is TRANSPOSED — roi @ E^T streams WIN_H rows
        through the MXU for an S-wide output instead of S rows for a
        WIN_H-wide one (WIN_H=56 < S=128, so the non-transposed form left
        ~44% of the systolic array idle): 11.6 -> 5.1 ms/call;
      * the x one-hots are built as bf16 HATS, E = max(0, 1 - |ix - c|):
        ix and the column ids are small integers (exact in bf16, WIN_W-1
        <= 127 < 2^8 mantissa), so the hat IS the exact one-hot — with no
        f32 compare and no f32->bf16 cast relayout (the measured dominant
        VPU cost of the compare build): 5.1 -> 4.1 ms/call.
    The fractional x-blend happens in f32 on the small (WIN_H, S) profile,
    so precision equals exact-weight x bf16-image sampling. No lane rotate
    anywhere (Mosaic cannot rotate non-32-bit vectors — the round-1 bench
    failure).
    """

    def kernel(row0_ref, x0_ref, xs_ref, ys_ref, images_ref, out_ref,
               *scratch):
        if resident:
            (tex_ref,) = scratch
        else:
            roi_ref, tex_ref, sems = scratch
            # Start all DMAs for this step's TILE_B x M windows.
            for i in range(TILE_B):
                for m in range(M):
                    row0 = pl.multiple_of(row0_ref[i, m], 8)
                    x0 = pl.multiple_of(x0_ref[i, m], 128)
                    pltpu.make_async_copy(
                        images_ref.at[pl.ds(row0, WIN_H), pl.ds(x0, WIN_W)],
                        roi_ref.at[i, m],
                        sems.at[i, m],
                    ).start()

        col_ids_bf = jax.lax.broadcasted_iota(
            jnp.int32, (M * S, WIN_W), 1
        ).astype(jnp.float32).astype(jnp.bfloat16)
        rows_h = jax.lax.broadcasted_iota(
            jnp.int32, (WIN_H, M * S), 0
        ).astype(jnp.float32)
        n = jnp.float32(n_real)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, S), 1)
        smask = (lane < n_real).astype(jnp.float32)  # (1, S)
        dims = (((1,), (1,)), ((), ()))

        for i in range(TILE_B):
            if not resident:
                # Wait for ALL of patch i's windows before any matmul.
                for m in range(M):
                    pltpu.make_async_copy(
                        images_ref.at[pl.ds(0, WIN_H), pl.ds(0, WIN_W)],
                        roi_ref.at[i, m],
                        sems.at[i, m],
                    ).wait()
            xs = xs_ref[i]  # (M*S,)
            ys = ys_ref[i]
            ix = jnp.floor(xs)
            fx = xs - ix
            # Exact one-hots as bf16 hats (see docstring). E2 selects column
            # ix+1 (samples are clamped below WIN_W - 1, so it's in range).
            d = ix[:, None].astype(jnp.bfloat16) - col_ids_bf
            E = jnp.maximum(
                jnp.bfloat16(0.0), jnp.bfloat16(1.0) - jnp.abs(d)
            )
            E2 = jnp.maximum(
                jnp.bfloat16(0.0),
                jnp.bfloat16(1.0) - jnp.abs(d + jnp.bfloat16(1.0)),
            )
            wyT = jnp.maximum(0.0, 1.0 - jnp.abs(ys[None, :] - rows_h))
            for m in range(M):
                if resident:
                    row0 = pl.multiple_of(row0_ref[i, m], 8)
                    x0 = pl.multiple_of(x0_ref[i, m], 128)
                    roi = images_ref[pl.ds(row0, WIN_H), pl.ds(x0, WIN_W)]
                else:
                    roi = roi_ref[i, m]
                left = jax.lax.dot_general(
                    roi, E[m * S:(m + 1) * S], dims,
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.DEFAULT,
                )  # (WIN_H, S)
                right = jax.lax.dot_general(
                    roi, E2[m * S:(m + 1) * S], dims,
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.DEFAULT,
                )
                fxm = fx[m * S:(m + 1) * S].reshape(1, S)
                prof = left + fxm * (right - left)  # (WIN_H, S)
                tex_ref[m, :] = jnp.sum(
                    wyT[:, m * S:(m + 1) * S] * prof, axis=0
                )

            tex = tex_ref[:, :] * smask  # (M, S)
            anchor = tex[0:1, :]
            am = jnp.sum(anchor, axis=1, keepdims=True) / n
            tm = jnp.sum(tex, axis=1, keepdims=True) / n
            ca = (anchor - am) * smask
            ct = (tex - tm) * smask
            cov = jnp.sum(ca * ct, axis=1) / n
            va = jnp.sum(ca * ca, axis=1) / n
            vt = jnp.sum(ct * ct, axis=1) / n
            denom = jnp.maximum(jnp.sqrt(va) * jnp.sqrt(vt), NCC_MIN_DENOM)
            out_ref[i, :] = cov / denom

    return kernel


@functools.partial(
    jax.jit, static_argnames=("n_real", "interpret", "resident")
)
def warp_ncc_scores(
    images: jax.Array,
    y0: jax.Array,
    x0: jax.Array,
    view_ids: jax.Array,
    coords: jax.Array,
    n_real: int,
    interpret: bool = False,
    resident: bool | None = None,
) -> jax.Array:
    """Fused sampling + NCC for all patches.

    images: (V, H, W) f32 (H >= WIN_H, W >= WIN_W).
    y0/x0/view_ids: (B, M) int32 window corners (pre-clamped to valid
      ranges) and view page per slot.
    coords: (B, M, 2, S) f32 sample positions RELATIVE to the window corner
      (row 0 = x, row 1 = y), padded to S lanes; only the first n_real are
      texels.
    Returns (B, M) NCC of slot m against slot 0.
    """
    B, M = y0.shape
    S = coords.shape[-1]
    Bp = -(-B // TILE_B) * TILE_B
    if Bp != B:
        padb = lambda a, fill=0: jnp.concatenate(
            [a, jnp.full((Bp - B,) + a.shape[1:], fill, a.dtype)], axis=0
        )
        y0, x0, view_ids, coords = (
            padb(y0), padb(x0), padb(view_ids), padb(coords)
        )
    # Slot-stacked 2-D coordinate layout (see _kernel_factory).
    xs = coords[:, :, 0, :].reshape(Bp, M * S)
    ys = coords[:, :, 1, :].reshape(Bp, M * S)

    # The path choice is a STATIC jit arg (part of the cache key): deciding
    # from module state inside the trace would let a cached trace of the
    # other path be silently reused for identical shapes.
    if resident is None:
        resident = images.size * 2 <= _resident_limit()  # bf16-resident bytes

    # Both regimes share the row-flattened bf16 layout: pages stacked into
    # rows so a slot read/DMA is a single 2-D slice at row0 = view*Hp + y0
    # (both multiples of 8 -> row0 % 8 == 0).
    P, H, W = images.shape
    Hp = -(-H // 8) * 8
    if Hp != H:
        images = jnp.pad(images, ((0, 0), (0, Hp - H), (0, 0)))
    flat = images.reshape(P * Hp, W).astype(jnp.bfloat16)
    row0 = view_ids * Hp + y0

    kernel = _kernel_factory(M, S, n_real, resident)
    smem_spec = pl.BlockSpec(
        (TILE_B, M), lambda i: (i, 0), memory_space=pltpu.SMEM
    )
    coord_spec = pl.BlockSpec(
        (TILE_B, M * S), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    if resident:
        # Whole image stack in VMEM, fetched once (constant index map).
        images_spec = pl.BlockSpec(
            (P * Hp, W), lambda i: (0, 0), memory_space=pltpu.VMEM
        )
        scratch = [pltpu.VMEM((M, S), jnp.float32)]
    else:
        # Images stay in HBM; windows stream via per-slot async copies.
        images_spec = pl.BlockSpec(memory_space=pl.ANY)
        scratch = [
            pltpu.VMEM((TILE_B, M, WIN_H, WIN_W), jnp.bfloat16),
            pltpu.VMEM((M, S), jnp.float32),
            pltpu.SemaphoreType.DMA((TILE_B, M)),
        ]
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((Bp, M), jnp.float32),
        grid=(Bp // TILE_B,),
        in_specs=[
            smem_spec,  # row0
            smem_spec,  # x0
            coord_spec,  # xs
            coord_spec,  # ys
            images_spec,
        ],
        out_specs=pl.BlockSpec(
            (TILE_B, M), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=scratch,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(row0, x0, xs, ys, flat)
    return out[:B]


def patch_ncc_scores_fused(
    images: jax.Array,
    cameras,
    position: jax.Array,
    normal: jax.Array,
    ref: jax.Array,
    vis: jax.Array,
    texture_size: int,
    max_score_views: int = 16,
    interpret: bool = False,
    view_ids: jax.Array | None = None,
    ok: jax.Array | None = None,
):
    """Drop-in fused equivalent of pmvs.optimize.patch_ncc_scores.

    Computes the same per-slot geometry as ops/warp.py
    `patch_textures_indexed` (tangent-frame texel grid, 4-corner validity),
    then runs sampling + NCC entirely in the Pallas kernel. Returns
    (scores (B, M), view_ids (B, M), ok (B, M)) with -1 where the pair is
    invalid, exactly like the XLA path. Explicit `view_ids`/`ok` override
    the default compaction (used by the chunked all-views filter).
    """
    from densepoints_tpu.ops.warp import compact_visible, patch_frames

    k = texture_size
    V, H, W = images.shape
    if view_ids is None:
        view_ids, ok = compact_visible(vis, max_score_views)
    B, M = view_ids.shape
    sx, sy = patch_frames(cameras, position, normal, ref, k)

    coords1d = (2.0 * jnp.arange(k, dtype=position.dtype) / k) - 1.0
    tt, ss = jnp.meshgrid(coords1d, coords1d, indexing="ij")
    world = (
        position[:, None, None, :]
        + ss[None, :, :, None] * sx[:, None, None, :]
        + tt[None, :, :, None] * sy[:, None, None, :]
    ).reshape(B, k * k, 3)
    corners = (
        position[:, None, :]
        + jnp.stack([-sx - sy, sx - sy, sx + sy, -sx + sy], axis=1)
    )

    K = cameras.K[view_ids]
    E = cameras.E[view_ids]
    C = cameras.C[view_ids]
    w = cameras.width.astype(position.dtype)[view_ids]
    h = cameras.height.astype(position.dtype)[view_ids]

    def _proj(pts):  # (B, n, 3) -> (B, M, n, 2)
        rel = pts[:, None, :, :] - C[:, :, None, :]
        cam = jnp.einsum("bmij,bmnj->bmni", E[..., :3], rel)
        pix = jnp.einsum("bmij,bmnj->bmni", K, cam)
        return pix[..., :2] / pix[..., 2:3]

    pix_corners = _proj(corners)
    inside = (
        (pix_corners[..., 0] > 0)
        & (pix_corners[..., 0] < w[..., None])
        & (pix_corners[..., 1] > 0)
        & (pix_corners[..., 1] < h[..., None])
    )
    valid = jnp.all(inside, axis=-1) & ok  # (B, M)

    pix = _proj(world)  # (B, M, k*k, 2)
    # Window corners centered on the patch center's projection, clamped so
    # the fixed-size window stays inside the image.
    center = _proj(position[:, None, :])[:, :, 0, :]  # (B, M, 2)
    # Pad images up to the window size if needed (tiny test scenes). The
    # phase stack is built in bf16 — the kernel samples bf16 anyway, and
    # keeping the (2V, H, W) intermediate f32 doubled the largest
    # allocation of the scoring path (3 GB at 100 full-res views).
    Hp = max(H, WIN_H)
    Wp = max(W, 2 * WIN_W)
    images = images.astype(jnp.bfloat16)
    if (Hp, Wp) != (H, W):
        images = jnp.pad(images, ((0, 0), (0, Hp - H), (0, Wp - W)))
    # Two phase-shifted copies give the lane axis 64-px snapping: phase 1
    # is the image shifted left 64 px, so an odd 64-px corner 64m is the
    # 128-aligned corner 64(m-1) of the shifted copy. The kernel reads
    # "view" ph*V + v. Garbage in the shifted copy's last 64 columns is
    # never addressed (64m <= Wp - 128 keeps windows in-image).
    images2 = jnp.concatenate(
        [images, jnp.pad(images[:, :, 64:], ((0, 0), (0, 0), (0, 64)))],
        axis=0,
    )
    cx = jnp.floor(center[..., 0]).astype(jnp.int32)
    cy = jnp.floor(center[..., 1]).astype(jnp.int32)
    m64 = jnp.clip((cx - 32) // 64, 0, (Wp - WIN_W) // 64)
    phase = m64 % 2
    x0 = 64 * (m64 - phase)  # 128-aligned within the phase image
    xwin = 64 * m64  # window corner in ORIGINAL image coordinates
    y0 = jnp.clip(((cy - 24) // 8) * 8, 0, ((Hp - WIN_H) // 8) * 8)
    relx = jnp.clip(
        pix[..., 0] - xwin[..., None].astype(pix.dtype), 0.0, WIN_W - 1.001
    )
    rely = jnp.clip(
        pix[..., 1] - y0[..., None].astype(pix.dtype), 0.0, WIN_H - 1.001
    )
    S = -(-(k * k) // 128) * 128
    pad = ((0, 0), (0, 0), (0, S - k * k))
    coords = jnp.stack(
        [jnp.pad(relx, pad), jnp.pad(rely, pad)], axis=2
    )  # (B, M, 2, S)

    safe_view = jnp.where(ok, view_ids, 0) + phase * V
    scores = warp_ncc_scores(
        images2, y0, x0, safe_view, coords, k * k, interpret=interpret,
        resident=bool(images2.size * 2 <= _resident_limit()),
    )
    pair_valid = valid & valid[:, :1]
    scores = jnp.where(pair_valid, scores, -1.0)
    return scores, view_ids, ok
