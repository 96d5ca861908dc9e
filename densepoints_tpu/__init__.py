"""densepoints-tpu: a TPU-native multi-view-stereo densification framework.

A from-scratch JAX/XLA/Pallas re-design of the capability set of the reference
C++ project `manlito/densepoints` (PMVS-style patch-based MVS densification:
seed -> optimize -> expand -> filter -> export), plus the stages the reference
left unfinished: the PMVS filter pass, multi-scale pyramids, Schur-complement
bundle adjustment, surface extraction, and multi-host distribution.

Layout (bottom-up):
  core/       batched cameras, photometric scores, grid index math
  geometry/   fundamental matrices, epipolar lines, batched DLT triangulation
  ops/        Pallas TPU kernels + XLA reference implementations (NCC, warp,
              Hamming matching, batched Nelder-Mead)
  features/   TPU-native detector / descriptors / matching / tracks (seeding)
  pmvs/       the PMVS method: patch SoA, visibility, optimization, expansion,
              filtering, pipeline driver
  io/         scene JSON reader (reference-compatible schema), images, PLY
  parallel/   device mesh, shardings, multi-host pipeline
  ba/         bundle adjustment (Schur complement, batched Jacobians)
  surface/    TSDF fusion + marching cubes surface extraction
  multiscale/ image pyramids, coarse-to-fine densification
"""

__version__ = "0.1.0"

# Geometry correctness contract: f32 matmuls/einsums must be computed at
# f32 accuracy. On TPU the default matmul precision routes f32 operands
# through the MXU in bfloat16, which corrupts projective geometry (camera
# einsums, DLT, BA normal equations) by whole pixels — measured 0.13 mean
# NCC error at scan scenes (round 4; the round-3 scoring paths carried
# this silently). The compute-heavy kernels are unaffected: they feed the
# MXU bf16 operands EXPLICITLY by design (one-hot sampling matmuls,
# Hamming descriptor matmuls).
#
# The contract is enforced at TWO levels (tests/core/test_precision_contract
# pins both):
#   1. every pixel-coordinate-producing matmul site pins
#      `precision=jax.lax.Precision.HIGHEST` explicitly (core/cameras.py,
#      ops/warp.py, ops/warp_ncc_paged.py, geometry/homography.py,
#      ba/ba.py) — correct even under a caller's own precision context;
#   2. the PACKAGE-WIDE default below covers everything else (DLT/QR/BA
#      linear algebra and future call sites). This is a deliberate global:
#      a geometry framework whose f32 linear algebra silently runs in
#      bf16 is wrong, not slow. It is applied only when the embedding
#      application has NOT chosen its own default, so user configuration
#      is never clobbered.
import jax as _jax

if _jax.config.jax_default_matmul_precision is None:
    _jax.config.update("jax_default_matmul_precision", "highest")
