"""lis_slam_tpu — TPU-native semantic LiDAR-inertial SLAM engine.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of LIS-SLAM
(EPSC-LOAM). See SURVEY.md at the repo root for the reference layer map this
framework covers.
"""

import jax

# Geometry everywhere in this engine is float32 and correctness-critical:
# point-cloud transforms, Jacobians, and 6x6 normal-equation solves all run
# through matmuls. On TPU the default matmul precision is bfloat16, which
# injects ~3e-3 relative error — enough to break ICP convergence. Force full
# f32 precision globally; neural-net code opts into bf16 via explicit dtypes.
jax.config.update("jax_default_matmul_precision", "highest")

__version__ = "0.1.0"
