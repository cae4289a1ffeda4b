"""lc_crf_slam_tpu — TPU-native dynamic RGB-D SLAM.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
Zhengjun-Du/LC-CRF-SLAM (an ORB-SLAM2-derived RGB-D SLAM for dynamic scenes
that labels map points static/dynamic with CRF mean-field inference over
long-term track consistency; see SURVEY.md).

Layout:
  geometry/  SE3/Sim3 Lie ops, pinhole camera, Umeyama/Horn alignment
  ops/       compute kernels (JAX/Pallas): pyramid, FAST, ORB, Hamming
             matching, LK flow, Schur-complement BA blocks, CRF messages
  models/    pipeline stages: frame front-end, map state, tracking,
             mapping, CRF labeler, loop closing, system facade
  parallel/  device mesh, shardings, distributed BA / CRF
  utils/     config, TUM IO, ATE/RPE evaluation, synthetic sequences,
             logging, checkpointing
"""

__version__ = "0.1.0"
