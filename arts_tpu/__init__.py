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

import os as _os

import jax as _jax

# Radiance-grade matmuls everywhere: the TPU MXU's DEFAULT matmul
# precision is bfloat16 inputs, which is catastrophic for radiative
# transfer — measured u0 errors up to 520% through the XLA DISORT path
# on heterogeneous layers (native/eigh_tpu_repro.py; the round-4
# "XLA eigh is unreliable" finding decomposed into bf16 matmuls [5.2 ->
# 0.146] + the f32 eigh custom call [0.146 -> 0.0014]).  Hot Pallas
# kernels request their precision explicitly and are unaffected; the
# bench headline showed no measurable cost.  Opt out (or pick another
# level) with ARTS_TPU_MATMUL_PRECISION=default|high|highest.
_prec = _os.environ.get("ARTS_TPU_MATMUL_PRECISION", "highest")
if _prec != "default":
    _jax.config.update("jax_default_matmul_precision", _prec)

from . import constants  # noqa: F401,E402
from .fwd import (  # noqa: F401
    ClearskyScene,
    ZeemanScene,
    simulate_clearsky,
    simulate_clearsky_bt,
    simulate_clearsky_polarized,
)
from .fwd_allsky import AllskyScene, HabitProfile, simulate_allsky  # noqa: F401

__version__ = "0.1.0"
