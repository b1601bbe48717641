"""Camera/geometry math (Lie maps, poses, Procrustes, rays, conventions)."""
from . import conventions, lie, pose, procrustes, quaternion, rays  # noqa: F401
