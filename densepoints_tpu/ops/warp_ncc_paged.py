"""View-sorted page-resident warp+NCC kernel (v2 of the headline TPU op).

Round-3 roofline accounting (KERNEL_r03.json) showed the streaming kernel
at real-scan shapes spends most of its time ISSUING per-slot window DMAs
(B*M scalar-core DMA issues per call), re-warps the anchor texture once
per scoring chunk, and pays for padded view slots whether or not a view is
visible. This module is the TPU-native fix — sorted streaming instead of
random access:

  * slots (patch, view) are SORTED BY VIEW in XLA and chopped into
    view-homogeneous groups of G; the kernel grid walks the groups and
    Mosaic keeps the group's IMAGE PAGE resident in VMEM (scalar-prefetch
    indexed BlockSpec — consecutive groups of the same view never refetch).
    There are ~V big page DMAs per call instead of B*M small window DMAs;
  * the projective warp moves INTO the kernel: a slot is 9 floats
    (window-folded homogeneous projection of the patch origin/axes) plus
    two window corners, not a (2, S) coordinate block — per-slot HBM
    traffic drops ~40x and the XLA-side projection of every sample point
    disappears;
  * the kernel emits CENTERED textures + their sigma; the anchor is
    computed ONCE per patch by a first pass over anchor slots, and the
    NCC against each payload texture is one cheap XLA dot + clamp
    (optimization.cpp:98-132 semantics preserved: population stats,
    denom clamp 0.1);
  * slots exist only for VISIBLE views — work scales with sum(vis), not
    B * max_score_views, and arbitrary V fits in ONE call (no
    anchor-pinned chunking, pmvs/optimize.py _anchor_chunks).

Sampling semantics match ops/warp_ncc.py: bf16 image pages, exact bf16
hat one-hots on the integer x-neighbors, f32 fractional blend, hat-weight
y contraction, window-interior clamp (== clamp-to-edge while the footprint
fits the window), 4-corner strict-bounds validity computed in XLA
(patch.cpp:132-135).
"""
from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from densepoints_tpu.core.scores import NCC_MIN_DENOM
from densepoints_tpu.ops.warp import patch_frames
from densepoints_tpu.ops.warp_ncc import WIN_H, WIN_W

__all__ = [
    "GROUP",
    "build_pages",
    "make_plan",
    "paged_all_scores",
    "allview_scores_xla",
]

GROUP = 16  # slots per coordinate row (one hat batch)
STEP_ROWS = 8  # coordinate rows per grid step (Mosaic sublane unit)
STEP = STEP_ROWS * GROUP  # slots per grid step / per page-padding unit


def page_dims(images_shape):
    """(Hp, Wp, nxb) page geometry for an (V, H, W) image stack."""
    _, H, W = images_shape
    Hp = max(-(-H // 8) * 8, WIN_H)
    Wp = max(-(-W // 128) * 128, 2 * WIN_W)
    return Hp, Wp, Wp // 128


def build_pages(images: jax.Array):
    """(V, H, W) f32 -> (V, 2 * nxb * Hp, 128) bf16 column-blocked pages.

    Two phase copies (the image and its 64-px-left-shift) are split into
    128-column blocks and stacked along ROWS, so a sampling window is a
    pure sublane-dynamic slice `page[row:row+WIN_H, :]` — no dynamic LANE
    slicing anywhere (a dynamic lane slice makes Mosaic touch the full
    row width: measured 4.5x per-slot slowdown at 1664-px scans).
    A 64-aligned window corner 64*m is column block m//2 of phase m%2.
    """
    V, H, W = images.shape
    Hp, Wp, nxb = page_dims(images.shape)
    img = images.astype(jnp.bfloat16)
    if (Hp, Wp) != (H, W):
        img = jnp.pad(img, ((0, 0), (0, Hp - H), (0, Wp - W)))
    shifted = jnp.pad(img[:, :, 64:], ((0, 0), (0, 0), (0, 64)))

    def blocks(ph):  # (V, Hp, Wp) -> (V, nxb, Hp, 128)
        return ph.reshape(V, Hp, nxb, 128).transpose(0, 2, 1, 3)

    page = jnp.concatenate([blocks(img), blocks(shifted)], axis=1)
    return page.reshape(V, 2 * nxb * Hp, 128)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PagedPlan:
    """View-sorted slot schedule for one (mask (B, V)) pattern.

    sid:  (Npad,) int32 flat slot id b * V + v, -1 for empty lanes.
    page: (Ng,) int32 image page per step (0 for all-empty steps).
    inv:  (B * V,) int32 slot position of each (b, v), Npad if unscheduled
          — the inverse permutation, so per-eval result placement is a
          GATHER (XLA TPU scatters serialize; gathers stream).
    """

    sid: jax.Array
    page: jax.Array
    inv: jax.Array

    @property
    def n_slots(self) -> int:
        return self.sid.shape[0]


def make_plan(
    mask: jax.Array, group: int = STEP, max_slots: int | None = None
) -> PagedPlan:
    """Schedule the True slots of mask (B, V) into view-homogeneous groups.

    Pure function of the visibility mask — loop-invariant across
    Nelder-Mead iterations, so XLA hoists it out of the solver loop.

    `max_slots` bounds the STATIC schedule capacity (default B * V, the
    worst case): pass a tighter bound when the mask's population is
    known (e.g. B for an anchor one-hot) — slots beyond the bound would
    be silently dropped, so only pass guarantees. Steps with no real
    slots carry page -1 and are skipped by the kernel.
    """
    B, V = mask.shape
    N = B * V
    # Static capacity: every view's run padded up to a full grid STEP
    # (the page-homogeneity unit).
    cap = N if max_slots is None else min(max_slots, N)
    npad = -(-(cap + V * (group - 1)) // group) * group
    flat = mask.reshape(-1)
    v_of = jax.lax.broadcasted_iota(jnp.int32, (B, V), 1).reshape(-1)
    key = jnp.where(flat, v_of, V)
    order = jnp.argsort(key, stable=True).astype(jnp.int32)  # slot ids
    sorted_valid = flat[order]
    sorted_v = v_of[order]
    counts = jnp.sum(mask, axis=0).astype(jnp.int32)  # (V,)
    cum = jnp.cumsum(counts)
    starts = jnp.concatenate([jnp.zeros((1,), jnp.int32), cum[:-1]])
    padded = -(-counts // group) * group
    pcum = jnp.cumsum(padded)
    poff = jnp.concatenate([jnp.zeros((1,), jnp.int32), pcum[:-1]])
    rank = jnp.arange(N, dtype=jnp.int32) - starts[sorted_v]
    dest = jnp.where(sorted_valid, poff[sorted_v] + rank, npad)
    sid = (
        jnp.full((npad + 1,), -1, jnp.int32).at[dest].set(order)[:npad]
    )
    view_fill = (
        jnp.full((npad + 1,), -1, jnp.int32)
        .at[dest]
        .set(jnp.where(sorted_valid, sorted_v, -1))[:npad]
    )
    # Page per step; -1 = all-empty step (kernel skips its compute).
    page = jnp.max(view_fill.reshape(-1, group), axis=1)
    inv = (
        jnp.full((N,), npad, jnp.int32)
        .at[order]
        .set(jnp.where(sorted_valid, dest, npad).astype(jnp.int32))
    )
    return PagedPlan(sid=sid, page=page, inv=inv)


def dense_geometry(cameras, page_meta, position, sx, sy, texture_size):
    """Window placement + folded projection + validity for ALL (b, v).

    Computed DENSELY over the (B, V) grid as one real matmul plus
    elementwise math — no per-slot gathers, no tiny batched einsums
    (measured 2.7 ms/eval of pure XLA overhead at bench shapes when done
    per-slot). Both kernel passes (anchor + payload) share one result.

    Returns packed (V*B, 16) f32 in VIEW-MAJOR v * B + b order (the
    plans' view-sorted slots then gather near-sequential rows): cols 0-8
    the folded projections [a0 | ax | ay] (texel (s, t) maps to
    window-relative pixels as (a0 + s*ax + t*ay) -> (x/z, y/z)), col 9
    the window page-row as an exact f32 value, col 11 the validity flag.
    """
    Hp, nxb = page_meta
    Wp = nxb * 128
    B = position.shape[0]
    f32 = jnp.float32
    Pm = cameras.P.astype(f32)  # (V, 3, 4)
    V = Pm.shape[0]

    # Seven homogeneous points per patch: center, 4 corners (w=1) and the
    # two tangent axes (w=0) — one (B*7, 4) @ (4, V*3) matmul projects
    # everything into every view at once.
    ones = jnp.ones((B, 1), f32)
    zeros = jnp.zeros((B, 1), f32)
    pts = jnp.stack(
        [
            jnp.concatenate([position, ones], 1),
            jnp.concatenate([position - sx - sy, ones], 1),
            jnp.concatenate([position + sx - sy, ones], 1),
            jnp.concatenate([position + sx + sy, ones], 1),
            jnp.concatenate([position - sx + sy, ones], 1),
            jnp.concatenate([sx, zeros], 1),
            jnp.concatenate([sy, zeros], 1),
        ],
        axis=1,
    )  # (B, 7, 4)
    Pall = Pm.transpose(2, 0, 1).reshape(4, V * 3)
    # HIGHEST precision: the TPU default would run this projection on the
    # MXU in bf16, corrupting pixel coordinates by whole pixels (measured
    # 0.16 mean NCC error at scan scenes — window corners land wrong).
    H = jnp.matmul(
        pts.reshape(B * 7, 4), Pall,
        precision=jax.lax.Precision.HIGHEST,
    ).reshape(B, 7, V, 3)
    hc = H[:, 0]  # (B, V, 3) center
    hax = H[:, 5]
    hay = H[:, 6]

    zc = jnp.where(jnp.abs(hc[..., 2]) < 1e-12, 1e-12, hc[..., 2])
    cx = jnp.nan_to_num(hc[..., 0] / zc)
    cy = jnp.nan_to_num(hc[..., 1] / zc)
    m64 = jnp.clip(
        jnp.floor((cx - 32.0) / 64.0).astype(jnp.int32),
        0,
        (Wp - WIN_W) // 64,
    )
    phase = m64 % 2
    xwin = (64 * m64).astype(f32)  # window corner, image coords
    y0 = jnp.clip(
        ((jnp.floor(cy).astype(jnp.int32) - 24) // 8) * 8, 0, Hp - WIN_H
    )
    # Page row of the window: column block m64//2 of phase copy m64%2
    # (build_pages layout) — the window is then page[row0:row0+WIN_H, :].
    row0 = (phase * nxb + m64 // 2) * Hp + y0
    y0f = y0.astype(f32)

    # Fold the window origin: row0' = row0 - corner * row2, elementwise.
    def fold(h):  # (B, V, 3) -> 3 folded components
        return (
            h[..., 0] - xwin * h[..., 2],
            h[..., 1] - y0f * h[..., 2],
            h[..., 2],
        )

    a0 = fold(hc)
    ax = fold(hax)
    ay = fold(hay)
    geom = jnp.stack(list(a0) + list(ax) + list(ay), axis=-1)  # (B, V, 9)

    # 4-corner strict-bounds validity (patch.cpp:132-135; no cheirality
    # term, matching the XLA path and the reference's IsPointInside).
    w = cameras.width.astype(f32)[None, :]
    h2d = cameras.height.astype(f32)[None, :]
    valid = jnp.ones((B, V), bool)
    for c in range(1, 5):
        hcrn = H[:, c]
        z = jnp.where(jnp.abs(hcrn[..., 2]) < 1e-12, 1e-12, hcrn[..., 2])
        px = hcrn[..., 0] / z
        py = hcrn[..., 1] / z
        valid &= (px > 0) & (px < w) & (py > 0) & (py < h2d)

    # Pack row0 and validity alongside the projection so the per-pass
    # slot extraction is ONE row gather, not four — and lay the table
    # out VIEW-MAJOR (v * B + b): the plans' slots are sorted by view
    # with ascending b inside a run, so the gather walks the table
    # near-sequentially instead of at stride V (a stride-V 64-byte row
    # gather is latency-bound: measured ~2x the whole kernel's cost).
    #
    # row0 is stored as a plain f32 VALUE, never a bitcast: int32 bits
    # reinterpreted as f32 are DENORMALS (row0 < ~8.4e6), and XLA:TPU's
    # transpose lowering flushes denormals to zero at most shapes —
    # round 4 shipped the bitcast and every scoring pass at non-bench
    # shapes read window row 0 for every slot (caught round 5 by the
    # scan-scale numpy-oracle smoke test). Page rows are < 2^24 at any
    # plausible image (2 * nxb * Hp), so the float value is exact.
    packed = jnp.concatenate(
        [
            geom,
            row0.astype(f32)[..., None],
            jnp.zeros((B, V, 1), f32),  # (spare; was the lane offset)
            valid.astype(f32)[..., None],
            jnp.zeros((B, V, 4), f32),
        ],
        axis=-1,
    )  # (B, V, 16)
    return packed.transpose(1, 0, 2).reshape(V * B, 16)


def _paged_kernel_factory(k: int, S: int, group: int, rows: int):
    """Kernel over one view-homogeneous STEP of rows*group slots.

    Near-verbatim port of the PROVEN ops/warp_ncc.py resident compute
    (flat lane-major coordinate rows, hats batched per row of `group`
    slots, transposed one-hot matmuls, f32 fractional blend) — the only
    new mechanics are the scalar-prefetch-indexed image page and the
    centered-texture output. Slot (j, i) of a step is row j's lane block
    i; its window is a dynamic VMEM slice of the page.
    """
    n_real = k * k
    dims = (((1,), (1,)), ((), ()))

    def kernel(tbl_ref, row0_ref, xs_ref, ys_ref, page_ref, ctex_ref):
        # Steps whose page is -1 hold no real slots (static-capacity
        # padding): skip their compute entirely.
        step_live = tbl_ref[pl.program_id(0)] >= 0
        col_ids_bf = jax.lax.broadcasted_iota(
            jnp.int32, (group * S, WIN_W), 1
        ).astype(jnp.float32).astype(jnp.bfloat16)
        rows_h = jax.lax.broadcasted_iota(
            jnp.int32, (WIN_H, group * S), 0
        ).astype(jnp.float32)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, S), 1)
        smask = (lane < n_real).astype(jnp.float32)  # (1, S)
        n = jnp.float32(n_real)

        one_bf = jnp.bfloat16(1.0)
        zero_bf = jnp.bfloat16(0.0)

        def run_rows():
            for j in range(rows):
               xs = xs_ref[j]  # (group * S,) flat slot coordinates
               ys = ys_ref[j]
               ix = jnp.floor(xs)
               fx = xs - ix
               # Exact one-hots as bf16 hats for the whole row of slots
               # (ix and column ids are small integers, exact in bf16);
               # E2 selects column ix + 1. NOTE the hat BUILD, not the
               # dots, dominates the kernel (nobuild ablation bound:
               # 11-16 ns/slot vs 73-78 shipped, KERNEL_ABLATE_r05.json);
               # cheaper constructions tried and rejected by Mosaic on
               # this target: bf16 equality selects ("Target does not
               # support this comparison") and lane-rolling E into E2
               # ("Rotate with non-32-bit data").
               d = ix[:, None].astype(jnp.bfloat16) - col_ids_bf
               E = jnp.maximum(
                   zero_bf, one_bf - jnp.abs(d)
               )
               E2 = jnp.maximum(
                   zero_bf,
                   one_bf - jnp.abs(d + one_bf),
               )
               wyT = jnp.maximum(0.0, 1.0 - jnp.abs(ys[None, :] - rows_h))
               for i in range(group):
                   row0 = pl.multiple_of(row0_ref[j, i], 8)
                   roi = page_ref[pl.ds(row0, WIN_H), :]
                   left = jax.lax.dot_general(
                       roi, E[i * S : (i + 1) * S], dims,
                       preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.DEFAULT,
                   )  # (WIN_H, S)
                   right = jax.lax.dot_general(
                       roi, E2[i * S : (i + 1) * S], dims,
                       preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.DEFAULT,
                   )
                   fxm = fx[i * S : (i + 1) * S].reshape(1, S)
                   prof = left + fxm * (right - left)
                   tex = jnp.sum(
                       wyT[:, i * S : (i + 1) * S] * prof, axis=0
                   ).reshape(1, S) * smask
                   m = jnp.sum(tex) / n
                   ctex_ref[j * group + i, :] = ((tex - m) * smask).reshape(S)

        pl.when(step_live)(run_rows)

    return kernel


def _slot_coords(geom: jax.Array, texture_size: int, S: int):
    """Window-relative sample coordinates from folded projections (XLA).

    geom: (N, >=9) f32 [a0 | ax | ay]; returns xs, ys (N, S) f32 clipped
    to the window interior. Lanes beyond k*k are don't-care (masked in
    the kernel); empty slots (zero geometry) resolve to 0.
    """
    k = texture_size
    j = jnp.arange(S, dtype=jnp.float32)
    jr = jnp.floor(j * (1.0 / k))
    ss = (2.0 / k) * (j - jr * k) - 1.0  # (S,)
    tt = (2.0 / k) * jr - 1.0
    def comp(c):  # (N, S) homogeneous component c
        return (
            geom[:, c : c + 1]
            + geom[:, c + 3 : c + 4] * ss[None, :]
            + geom[:, c + 6 : c + 7] * tt[None, :]
        )

    hz = comp(2)
    hz = jnp.where(jnp.abs(hz) < 1e-12, 1e-12, hz)
    inv = 1.0 / hz
    xs = jnp.clip(comp(0) * inv, 0.0, WIN_W - 1.001)
    ys = jnp.clip(comp(1) * inv, 0.0, WIN_H - 1.001)
    return xs, ys


@functools.partial(jax.jit, static_argnames=("texture_size", "interpret"))
def paged_centered_textures(
    pages: jax.Array,
    page_tbl: jax.Array,
    row0: jax.Array,
    geom: jax.Array,
    texture_size: int,
    interpret: bool = False,
) -> jax.Array:
    """Centered textures for a view-sorted slot list.

    pages: (V, 2*nxb*Hp, 128) bf16 from `build_pages`; page_tbl:
    (Npad/STEP,) int32 page per grid step; row0: (Npad,) int32 window
    page-rows (8-aligned, column block folded in); geom: (Npad, >=9) f32
    folded projections. Returns (Npad, S) f32 mean-centered masked
    textures (S = k*k padded to a lane multiple).
    """
    k = texture_size
    S = -(-(k * k) // 128) * 128
    npad = row0.shape[0]
    assert npad % STEP == 0 and page_tbl.shape[0] == npad // STEP
    nsteps = npad // STEP
    V, R, _ = pages.shape
    xs, ys = _slot_coords(geom, k, S)  # (Npad, S)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nsteps,),
        in_specs=[
            pl.BlockSpec(
                (STEP_ROWS, GROUP),
                lambda g, tbl: (g, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec((STEP_ROWS, GROUP * S), lambda g, tbl: (g, 0)),
            pl.BlockSpec((STEP_ROWS, GROUP * S), lambda g, tbl: (g, 0)),
            # None drops the page dim: the kernel sees a rank-2 ref; the
            # lane dim is exactly WIN_W so windows are pure sublane slices.
            # Empty steps carry page -1 (compute skipped): clamp to 0 for
            # the fetch.
            pl.BlockSpec(
                (None, R, 128),
                lambda g, tbl: (jnp.maximum(tbl[g], 0), 0, 0),
            ),
        ],
        out_specs=pl.BlockSpec((STEP, S), lambda g, tbl: (g, 0)),
    )
    return pl.pallas_call(
        _paged_kernel_factory(k, S, GROUP, STEP_ROWS),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((npad, S), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(
        page_tbl,
        row0.reshape(nsteps * STEP_ROWS, GROUP),
        xs.reshape(nsteps * STEP_ROWS, GROUP * S),
        ys.reshape(nsteps * STEP_ROWS, GROUP * S),
        pages,
    )


def paged_all_scores(
    images: jax.Array,
    cameras,
    position: jax.Array,
    normal: jax.Array,
    ref: jax.Array,
    vis: jax.Array,
    texture_size: int,
    interpret: bool = False,
    pages: jax.Array | None = None,
    plan: PagedPlan | None = None,
    plan_a: PagedPlan | None = None,
):
    """All-views NCC against the anchor in two kernel passes.

    Returns (scores (B, V) f32, anchor_view (B,) int32, anchor_ok (B,)
    bool). scores[b, v] is NCC(anchor texture, view-v texture) for every
    VISIBLE non-anchor view with a valid warp, else -1; the anchor's own
    column stays -1 (callers treat the anchor specially, matching
    textures[0] semantics in optimization.cpp:98-132).

    `pages`/`plan`/`plan_a` are Nelder-Mead loop invariants (functions of
    images/vis only) — callers inside solver loops should precompute them
    once and pass them in.
    """
    B, V = vis.shape
    k = texture_size
    n = float(k * k)
    if pages is None:
        pages = build_pages(images)
    sx, sy = patch_frames(cameras, position, normal, ref, k)
    anchor = jnp.argmax(vis, axis=1).astype(jnp.int32)
    has = jnp.any(vis, axis=1)
    cols = jax.lax.broadcasted_iota(jnp.int32, (B, V), 1)
    if plan_a is None:
        # At most ONE anchor slot per patch: bound the static schedule.
        plan_a = make_plan(
            has[:, None] & (cols == anchor[:, None]), max_slots=B
        )
    if plan is None:
        plan = make_plan(vis & (cols != anchor[:, None]))

    # One dense geometry pass shared by both kernel passes (view-major).
    Hp, _, nxb = page_dims(images.shape)
    packed_d = dense_geometry(cameras, (Hp, nxb), position, sx, sy, k)

    def run_pass(p: PagedPlan):
        ok = p.sid >= 0
        sid = jnp.where(ok, p.sid, 0)
        pb = sid // V
        pv = sid % V
        # View-major index: near-sequential within each view run.
        packed = packed_d[pv * B + pb]  # the ONE per-slot gather
        # row0 rides the table as an exact f32 value (NOT a bitcast — see
        # dense_geometry: TPU transposes flush denormal bit patterns).
        row0 = packed[:, 9].astype(jnp.int32)
        validg = packed[:, 11] > 0.5
        ctex = paged_centered_textures(
            pages, p.page, row0, packed, k, interpret=interpret
        )
        sig = jnp.sqrt(jnp.sum(ctex * ctex, axis=1) / n)
        return ok, pb, ctex, sig, ok & validg

    # Anchor pass: one slot per patch with any visibility. Per-patch
    # placement is a GATHER via the plan's inverse permutation (slot of
    # patch b's anchor), never a scatter.
    ok_a, _, ctex_a, sig_a, valid_a = run_pass(plan_a)
    inv_a = plan_a.inv[jnp.arange(B, dtype=jnp.int32) * V + anchor]
    npad_a = plan_a.n_slots
    safe_a = jnp.where(inv_a < npad_a, inv_a, 0)
    found_a = inv_a < npad_a
    ca = jnp.where(found_a[:, None], ctex_a[safe_a], 0.0)  # (B, S)
    sa = jnp.where(found_a, sig_a[safe_a], 0.0)
    aok = found_a & jnp.where(found_a, valid_a[safe_a], False)

    # Payload pass: every visible non-anchor slot, scored in slot order.
    ok_p, pb_p, ctex_p, sig_p, valid_p = run_pass(plan)
    cov = jnp.sum(ctex_p * ca[pb_p], axis=1) / n
    den = jnp.maximum(sa[pb_p] * sig_p, NCC_MIN_DENOM)
    s = jnp.where(valid_p & aok[pb_p], cov / den, -1.0)
    # Grid placement = gather by the inverse permutation (sentinel -1).
    npad_p = plan.n_slots
    safe_p = jnp.where(plan.inv < npad_p, plan.inv, 0)
    found_p = plan.inv < npad_p
    scores = jnp.where(found_p, s[safe_p], -1.0).reshape(B, V)
    scores = jnp.where(vis & (cols != anchor[:, None]), scores, -1.0)
    return scores, anchor, aok & has


def allview_scores_xla(
    images: jax.Array,
    cameras,
    position: jax.Array,
    normal: jax.Array,
    ref: jax.Array,
    vis: jax.Array,
    texture_size: int,
):
    """Pure-XLA reference with identical (B, V) score semantics.

    Gather-based sampling via ops.warp.patch_textures — the CPU/parity
    path for `paged_all_scores` (bilinear against the FULL image, so
    windows-vs-image clamp differences only appear when a footprint
    leaves the window's slack, which validity already rejects).
    """
    from densepoints_tpu.ops.warp import patch_textures

    B, V = vis.shape
    k = texture_size
    n = float(k * k)
    tex, valid = patch_textures(
        images, cameras, position, normal, ref, vis, k
    )  # (B, V, k, k), valid = corner-valid & vis
    flat = tex.reshape(B, V, k * k).astype(jnp.float32)
    anchor = jnp.argmax(vis, axis=1).astype(jnp.int32)
    has = jnp.any(vis, axis=1)
    bidx = jnp.arange(B)
    aflat = flat[bidx, anchor]  # (B, k*k)
    aok = valid[bidx, anchor] & has
    am = jnp.mean(aflat, axis=1, keepdims=True)
    cam_ = aflat - am
    sa = jnp.sqrt(jnp.sum(cam_ * cam_, axis=1) / n)
    m = jnp.mean(flat, axis=2, keepdims=True)
    ct = flat - m
    st = jnp.sqrt(jnp.sum(ct * ct, axis=2) / n)
    cov = jnp.sum(ct * cam_[:, None, :], axis=2) / n
    den = jnp.maximum(sa[:, None] * st, NCC_MIN_DENOM)
    cols = jax.lax.broadcasted_iota(jnp.int32, (B, V), 1)
    payload = vis & (cols != anchor[:, None])
    scores = jnp.where(
        payload & valid & aok[:, None], cov / den, -1.0
    )
    return scores, anchor, aok
