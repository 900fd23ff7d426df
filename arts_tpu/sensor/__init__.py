from .obsel import SensorArray, gaussian_channels  # noqa: F401
