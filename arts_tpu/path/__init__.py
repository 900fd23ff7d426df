from .geometry import (  # noqa: F401
    PathGeometry,
    PathGeometry3D,
    geometric_path_1d,
    geometric_path_3d,
)
