from .field import Atmosphere1D, AtmPointData  # noqa: F401
from .field3d import Atmosphere3D  # noqa: F401
