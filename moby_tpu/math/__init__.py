from . import quaternion, so3, spatial, linalg  # noqa: F401
