"""All-sky (scattering) forward operator: gas LBL + particles -> DISORT.

Parity reference: the meta-method chain `disort_spectral_rad_fieldProfile`
(src/workspace_meta_methods.cpp:104-116; expanded in SURVEY.md 3.4):
vertical profile path -> gas absorption -> particle bulk TRO properties ->
DisortSettings (optical thickness from <K> dr, single-scattering albedo,
Legendre coefficients, linear-in-tau thermal source, CMB top, surface) ->
per-frequency DISORT solve (OpenMP loop at m_disort.cc:37-47).

TPU-native: one traced function; the per-frequency loop is a vmap of the
batched DISORT solver; gas absorption reuses the LBL kernel over path
points x frequencies.
"""

import dataclasses
import functools

import jax
import jax.numpy as jnp

from . import constants as const
from .atm import Atmosphere1D
from .disort import DisortInput, disort
from .lbl.catalog import LineCatalog
from .lbl.partfun import PartFunTable
from .lbl.voigt import absorption
from .ops.planck import planck
from .scattering import HenyeyGreenstein, ScatteringHabit


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class HabitProfile:
    """A scattering habit with a mass-content profile on the atm z-grid."""

    habit_psd: ScatteringHabit
    wc: jax.Array  # [Z] mass density on scene.atm.z [kg/m^3]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class AllskyScene:
    atm: Atmosphere1D
    cat: LineCatalog | None
    pf: PartFunTable | None
    scatterers: tuple  # HenyeyGreenstein | HabitProfile entries
    surface_temperature: jax.Array = dataclasses.field(
        default_factory=lambda: jnp.asarray(288.0)
    )
    surface_albedo: jax.Array = dataclasses.field(
        default_factory=lambda: jnp.asarray(0.0)
    )
    # static config: predefined absorption models and the species tags
    # naming the rows of atm.vmr (parity: abs_speciesSet + agendaAuto,
    # src/m_abs.cc:234-300 assembling AddLines + AddPredefined)
    predef: tuple = dataclasses.field(metadata=dict(static=True), default=())
    species_names: tuple = dataclasses.field(
        metadata=dict(static=True), default=()
    )


def _scatterer_profiles(sc, f_grid, z, t, nleg):
    """(k_ext [F, Z], k_sca [F, Z], leg [F, Z, NLeg]) for one scatterer.

    Scatterer profile arrays live on scene.atm.z (ascending altitude); the
    caller's level order is TOA-first, so profiles are flipped here.
    """
    F, Z = f_grid.shape[0], z.shape[0]
    if isinstance(sc, HenyeyGreenstein):
        k_ext, k_sca, leg = sc.bulk_properties(nleg)
        flip = lambda a: a[..., ::-1] if a.ndim and a.shape[-1] == Z else a
        return (
            jnp.broadcast_to(k_ext[..., ::-1], (F, Z)),
            jnp.broadcast_to(k_sca[..., ::-1], (F, Z)),
            jnp.broadcast_to(leg[..., ::-1, :], (F, Z, nleg)),
        )
    if isinstance(sc, HabitProfile):
        fn = jax.vmap(
            jax.vmap(
                lambda f, wc, tt: sc.habit_psd.bulk_properties(f, wc, tt, nleg),
                in_axes=(None, 0, 0),
            ),
            in_axes=(0, None, None),
        )
        return fn(f_grid, sc.wc[::-1], t)
    raise TypeError(f"unknown scatterer {type(sc)}")


@functools.partial(
    jax.jit, static_argnames=("block", "backend", "lbl_tuning")
)
def gas_absorption_profile(scene: AllskyScene, f_grid, block: int = 256,
                           backend: str = "xla",
                           lbl_tuning: tuple | None = None):
    """Gas absorption on the scene's levels, TOA-first: [F, Z].

    Separate jit so huge pipelines can compile absorption and the DISORT
    solve independently (the fused whole-pipeline XLA compile grows
    superlinearly).  lbl_tuning: optional static
    (tf, tl, max_visits, mp_terms, mp_kappa) for the pallas backend, from
    lbl.voigt.tune_lbl_kernel on the concrete scene."""
    z = scene.atm.z[::-1]
    pts = scene.atm.at(z)

    def gas_abs(t, p, v):
        # shared assembly (fwd.species_absorption): catalog via the
        # requested backend ("xla_realpair" is the only LBL formulation
        # the TPU x64 rewriter can compile) + predefined models
        from .fwd import species_absorption

        return species_absorption(
            scene, f_grid, t, p, v, block=block, backend=backend,
            lbl_tuning=lbl_tuning,
        )

    with jax.named_scope("propmat"):  # ARTS_TIME_REPORT scope parity
        return jnp.moveaxis(jax.vmap(gas_abs)(pts.t, pts.p, pts.vmr), 0, 1)


@functools.partial(
    jax.jit,
    static_argnames=(
        "nquad", "nleg", "nfourier", "mu0", "phis", "block", "backend",
        "fast_linalg", "thermal", "intensity_correction", "phi0",
    ),
)
def simulate_allsky(
    scene: AllskyScene,
    f_grid,
    nquad: int = 16,
    nleg: int | None = None,
    nfourier: int | None = None,
    mu0: float = 0.0,
    fbeam=0.0,
    phi0: float = 0.0,
    phis: tuple = (),
    block: int = 256,
    backend: str = "xla",
    fast_linalg: bool | None = None,
    k_gas=None,
    thermal: bool = True,
    intensity_correction: bool = False,
):
    """DISORT radiance/flux field for a vertical profile of scene.atm.

    Returns a DisortOutput with leading frequency axis; levels ordered
    TOA -> surface (level L = surface), matching DISORT conventions.
    k_gas: optional precomputed [F, Z] gas absorption (TOA-first; from
    gas_absorption_profile) to split the compile.
    """
    nleg = nleg or nquad
    # levels: atm grid descending in pressure = ascending altitude; DISORT
    # wants TOA first
    z = scene.atm.z[::-1]  # [Z] TOA..surface
    pts = scene.atm.at(z)
    F = f_grid.shape[0]
    Z = z.shape[0]

    if k_gas is None:
        k_gas = gas_absorption_profile.__wrapped__(
            scene, f_grid, block=block, backend=backend
        )

    k_ext = k_gas
    k_sca = jnp.zeros_like(k_gas)
    leg_w = jnp.zeros(k_gas.shape + (nleg,))
    for sc in scene.scatterers:
        e, s, lg = _scatterer_profiles(sc, f_grid, z, pts.t, nleg)
        k_ext = k_ext + e
        k_sca = k_sca + s
        leg_w = leg_w + lg

    dz = -jnp.diff(z)  # [Z-1] positive layer thickness
    lay = lambda a: 0.5 * (a[..., 1:] + a[..., :-1])
    tau = lay(k_ext) * dz  # [F, L]
    ksca_l = lay(k_sca) * dz
    omega = jnp.where(tau > 0, ksca_l / jnp.maximum(tau, 1e-300), 0.0)
    legl = lay(jnp.moveaxis(leg_w, -1, 0)) * dz  # [NLeg, F, L]
    leg = jnp.moveaxis(
        jnp.where(ksca_l > 0, legl / jnp.maximum(ksca_l, 1e-300), 0.0), 0, -1
    )  # [F, L, NLeg]
    leg = leg.at[..., 0].set(1.0)

    if thermal:
        b_levels = planck(f_grid[:, None], pts.t[None, :])  # [F, Z]
        b_surf = planck(f_grid, scene.surface_temperature)
        b_top = planck(
            f_grid, jnp.asarray(const.cosmic_microwave_background_temperature)
        )
    else:
        # solar-band run (the Czarnecki split: thermal emission handled by
        # a separate thermal-band call)
        b_levels = jnp.zeros((F, Z), f_grid.dtype)
        b_surf = jnp.zeros((F,), f_grid.dtype)
        b_top = jnp.zeros((F,), f_grid.dtype)

    fbeam_arr = jnp.broadcast_to(jnp.asarray(fbeam, f_grid.dtype), (F,))
    zerF = jnp.zeros((F,), f_grid.dtype)

    inp = DisortInput(
        tau=tau,
        omega=omega,
        leg=leg,
        f=jnp.zeros_like(tau),  # NoFractionalScattering default (ARTS chain)
        b_levels=b_levels,
        fbeam=fbeam_arr,
        fisot=zerF,
        albedo=jnp.broadcast_to(scene.surface_albedo, (F,)),
        b_surf=b_surf,
        b_top=b_top,
    )
    run = jax.vmap(
        lambda i: disort(
            i, nquad=nquad, nleg=nleg, nfourier=nfourier, mu0=mu0,
            phi0=phi0, phis=phis,
            fast_linalg=fast_linalg,
            intensity_correction=intensity_correction,
        )
    )
    return run(inp)
