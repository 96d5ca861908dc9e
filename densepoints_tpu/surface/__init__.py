from densepoints_tpu.surface.tsdf import (
    extract_surface,
    fuse_tsdf,
    marching_tetrahedra,
)
