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
