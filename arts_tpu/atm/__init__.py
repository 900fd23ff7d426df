from .field import Atmosphere1D, AtmPointData  # noqa: F401
