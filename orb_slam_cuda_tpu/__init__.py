"""orb_slam_cuda_tpu — a TPU-native ORB-SLAM2-class visual SLAM engine.

A from-scratch re-design of the capabilities of falfab/orb_slam_cuda
(ORB-SLAM2 + VisionWorks/CUDA front-end + PBA CUDA bundle adjustment) for
TPUs: the entire compute path is JAX/XLA/Pallas, the map is a
struct-of-arrays PyTree with static capacities, and every per-keypoint loop
of the reference becomes a batched array op.

Layer map (mirrors reference SURVEY.md §1, re-architected):

  engine/   System facade, tracking / local-mapping / loop-closing engines
  slam_map/ Map state PyTree (keyframes, map points, observations, covis)
  solvers/  LM optimizers: pose-only, local/global BA (Schur), Sim3 pose
            graph, EPnP RANSAC, Sim3 Horn RANSAC, H/F initializer
  matching/ batched Hamming search (projection / BoW / epipolar / fuse)
  vocab/    BoW vocabulary as arrays (replaces DBoW2)
  frontend/ ORB extraction graph (pyramid, FAST, IC-angle, rBRIEF)
  ops/      low-level kernels (Pallas + jnp): popcount Hamming, FAST, blur
  geometry/ SE3/Sim3 manifold ops, camera models, triangulation
  io/       dataset readers (KITTI/TUM/EuRoC), trajectory writers, config
  parallel/ device mesh, sharded global BA over ICI collectives
  utils/    timing CSVs (reference schema), checkpointing
"""

__version__ = "0.1.0"

import jax as _jax

# SLAM is geometry-dominated: the many small (3x3 / 4x4 / 6x6) matmuls in
# pose chains and BA normal equations need full f32, and on TPU the default
# MXU matmul runs bf16-accumulate. Make 'highest' the package default;
# throughput-critical large matmuls (BoW scoring, Hamming popcount paths)
# opt back into lower precision explicitly at the call site.
_jax.config.update("jax_default_matmul_precision", "highest")
