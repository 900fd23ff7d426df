from .brdf import SurfaceBrdf, hapke_brdf, rpv_brdf, surface_brdf_modes  # noqa: F401
from .solver import DisortInput, DisortOutput, disort  # noqa: F401
