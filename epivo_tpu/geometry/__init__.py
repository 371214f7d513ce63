from epivo_tpu.geometry import se3, camera, epipolar  # noqa: F401
