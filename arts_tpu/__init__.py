"""arts_tpu: TPU-native atmospheric radiative transfer.

Public API surface (the pyarts3-equivalent user layer):

Scenes & operators
    ClearskyScene, simulate_clearsky, simulate_clearsky_bt
    ZeemanScene, simulate_clearsky_polarized
    AllskyScene, HabitProfile, simulate_allsky
    recipe.AtmosphericFlux, recipe.SingleSpeciesAbsorption

State
    atm.Atmosphere1D / field3d.Atmosphere3D / surface.SurfaceField /
    subsurface.SubsurfaceField, atm.standard.standard_atmosphere

Spectroscopy
    lbl.catalog, lbl.voigt, lbl.zeeman, lbl.nlte, lbl.cia, lbl.lookup,
    lbl.xsec_fit, predefined.*

Retrieval
    retrieval.oem, retrieval.StateMapping, sensor.*

IO
    io.artsxml (ARTS XML + binary), io.hitran (.par, native fast path),
    io.ssd (legacy scattering data)
"""

from . import constants  # noqa: F401
from .fwd import (  # noqa: F401
    ClearskyScene,
    ZeemanScene,
    simulate_clearsky,
    simulate_clearsky_bt,
    simulate_clearsky_polarized,
)
from .fwd_allsky import AllskyScene, HabitProfile, simulate_allsky  # noqa: F401

__version__ = "0.1.0"
