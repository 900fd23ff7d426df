from .hg import HenyeyGreenstein  # noqa: F401
from .psd import BinnedPSD, MGDSingleMoment, mgd_psd  # noqa: F401
from .habit import ParticleHabit, ScatteringHabit  # noqa: F401
