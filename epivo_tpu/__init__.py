"""epivo_tpu: TPU-native visual odometry + bundle adjustment framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of the
reference epipolar-geometry VO engine (Ronnypetson/epivo): feature
detection/tracking/matching, robust essential-matrix pose estimation,
closed-form epipolar-depth triangulation, analytic SE(3) Jacobians, and
windowed Levenberg-Marquardt bundle adjustment, scaled over TPU meshes.
"""

__version__ = "0.1.0"
