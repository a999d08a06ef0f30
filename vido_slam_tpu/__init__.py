"""vido_slam_tpu — TPU-native rebuild of VIDO-SLAM (bxh1/VIDO-SLAM).

A visual-inertial dynamic-object SLAM framework implemented idiomatically for
TPU in JAX/XLA/Pallas/pjit:

- ``geometry``   : SO(3)/SE(3) Lie-group ops and the pinhole camera model.
- ``io``         : dataset loaders (KAIST/KITTI), .flo reader, result writers.
- ``frontend``   : feature sampling, flow association, mask propagation,
                   scene flow, dynamic-object segmentation/tracking.
- ``estimation`` : batched P3P-RANSAC, Levenberg–Marquardt engines for camera
                   pose, object motion, joint flow variants, sliding-window
                   bundle adjustment with sparse Schur complement, inertial
                   initialization (replaces the reference's g2o backend).
- ``imu``        : IMU preintegration as a ``lax.scan``.
- ``models``     : MonoDepth2, LiteFlowNet, Mask R-CNN in JAX/Flax-free pure
                   functional form, fused into one jitted perception graph.
- ``ops``        : Pallas TPU kernels + XLA-friendly vision ops (cost volume,
                   bilinear warp, NMS, ROIAlign).
- ``parallel``   : device-mesh sharding helpers and the multi-chip training
                   step (dp/tp over ``jax.sharding.Mesh``).
- ``system``     : the public ``System`` facade mirroring the reference's
                   ``libvido_slam.so`` API (Init / TrackRGBD /
                   SaveResultsIJRR2020; reference vido_slam/include/System.h).
"""

__version__ = "0.1.0"

from vido_slam_tpu.config import Config, load_config  # noqa: F401
