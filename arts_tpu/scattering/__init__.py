from .hg import HenyeyGreenstein  # noqa: F401
from .psd import BinnedPSD, MGDSingleMoment, mgd_psd  # noqa: F401
from .habit import ParticleHabit, ScatteringHabit  # noqa: F401
from .aro import (  # noqa: F401
    SingleScatteringDataARO,
    bulk_aro_properties,
    load_legacy_aro,
    rayleigh_spheroid_aro,
)
