"""Hand-shaped TPU compute primitives (the framework's "kernel" layer).

Every op here was born from a device-trace hotspot and reshaped until XLA
lowers it onto the MXU/VPU cleanly; they live next to their consumers and are
re-exported here as the framework's op inventory:

- ``spd_inverse`` — unrolled Gauss-Jordan inverse for batched 18x18 SPD mass
  matrices.  Replaces ``cholesky`` + ``triangular_solve``, which lower to a
  serialized loop of tiny ops on TPU (70x slower at this size).
- ``extract_patches_batched`` — per-env 32x32 terrain window extraction as
  two one-hot matmul contractions.  Replaces vmapped ``dynamic_slice``,
  which lowers to a serialized ``while`` loop per env.
- ``sample_patch_bilinear`` / ``sample_patch_nearest`` — batched height
  queries as separable interpolation-weight matmuls (Wx @ patch @ Wy^T)
  instead of scalar element gathers.
- ``quat_apply`` / ``quat_apply_yaw_inverse`` (utils.quat) — closed-form
  component arithmetic; no 3x3 matrix materialization, no padded
  ``dot_general``.

Pallas kernels were evaluated for each of these; the one-hot/matmul forms
above matched or beat the handwritten kernels at the framework's operating
sizes (the MXU is already saturated by the batched contractions), so the
XLA-shaped versions ship.  Revisit if per-op shapes grow past ~128x128.
"""

from ..physics.dynamics import spd_inverse
from ..terrain.heightfield import (extract_patch, extract_patches_batched,
                                   sample_patch_bilinear, sample_patch_nearest)
from ..utils.quat import quat_apply, quat_apply_yaw_inverse

__all__ = [
    "spd_inverse",
    "extract_patch",
    "extract_patches_batched",
    "sample_patch_bilinear",
    "sample_patch_nearest",
    "quat_apply",
    "quat_apply_yaw_inverse",
]
