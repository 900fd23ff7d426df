"""High-level forward operators: pure functions of (state, geometry, freq).

Parity reference: the reference's workspace-free operator layer
/root/reference/src/core/fwd/fwd_spectral_radiance.h (SpectralRadianceOperator
— per-path radiance integration bypassing the Workspace) and the meta-method
`spectral_radClearskyEmission` (src/workspace_meta_methods.cpp:166-181) whose
10-step chain becomes one traced function here:

  path -> atm points -> LBL propmat -> Planck source -> layer transmittances
       -> backward emission recursion (+ background)

Everything inside `simulate_clearsky` is jit/vmap/grad-able; Jacobians wrt
any Scene leaf (T/VMR profiles, surface T, catalog parameters...) replace
the reference's hand-built jacobian targets machinery (src/core/jacobian/).
"""

import dataclasses
import functools

import jax
import jax.numpy as jnp

from . import constants as const
from .atm import Atmosphere1D, Atmosphere3D
from .lbl.catalog import LineCatalog
from .lbl.partfun import PartFunTable
from .lbl.voigt import absorption
from .ops.planck import planck
from .rtepack.emission import (
    emission_unpolarized,
    emission_unpolarized_linprop,
    emission_unpolarized_linsrc,
)


def _emission_fn(rte_option: str):
    """Scalar emission recursion for an rte_option (TransmittanceOption)."""
    from .options import RteOption, check_option

    return {
        "constant": emission_unpolarized,
        "lintau": emission_unpolarized_linsrc,
        "linprop": emission_unpolarized_linprop,
    }[check_option(RteOption, rte_option)]


# static lbl_tuning tuple ordering (lbl.voigt.tune_lbl_kernel's dict keys)
LBL_TUNING_KEYS = (
    "tf", "tl", "max_visits", "mp_terms", "mp_kappa", "nsub",
    "coarse", "coarse_k",
)


def species_absorption(
    scene, fg, t, p, v, block: int = 256, backend: str = "xla",
    lbl_tuning: tuple | None = None,
):
    """Per-point gas absorption assembly shared by every forward
    operator: line catalog (XLA / realpair / Pallas backends) +
    predefined continuum models + ECS line-mixing bands (when the scene
    carries them).  One definition keeps the clearsky, 3D, level-cache
    and allsky operators in sync (spectral_propmat_agendaAuto parity,
    src/m_abs.cc:234-300)."""
    a = jnp.zeros_like(fg)
    if scene.cat is not None and scene.cat.n_lines > 0:
        if backend == "pallas":
            from .lbl.voigt import absorption_pallas

            tune = (
                dict(zip(LBL_TUNING_KEYS, lbl_tuning)) if lbl_tuning else {}
            )
            a = a + absorption_pallas(
                fg, scene.cat, scene.pf, t, p, v, **tune
            )
        else:
            # realpair None = auto (f64 on a non-CPU backend selects the
            # complex-free formulation — the TPU x64 rewriter cannot
            # compile c128); forcing False there SIGABRTs the compile
            a = a + absorption(
                fg, scene.cat, scene.pf, t, p, v, block=block,
                realpair=(True if backend == "xla_realpair" else None),
            )
    if scene.predef:
        from .predefined import predefined_absorption

        vmrs = {tag: v[i] for i, tag in enumerate(scene.species_names)}
        a = a + predefined_absorption(scene.predef, fg, t, p, vmrs)
    for band, sidx, iidx, irat in getattr(scene, "ecs_bands", ()):
        from .lbl.ecs import ecs_absorption

        a = a + ecs_absorption(fg, band, scene.pf, iidx, t, p, v[sidx], irat)
    return a


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ClearskyScene:
    """Frozen scene state for clear-sky emission simulations."""

    atm: Atmosphere1D
    cat: LineCatalog | None
    pf: PartFunTable | None
    surface_temperature: jax.Array = dataclasses.field(
        default_factory=lambda: jnp.asarray(288.0)
    )
    surface_emissivity: jax.Array = dataclasses.field(
        default_factory=lambda: jnp.asarray(1.0)
    )
    # static: predefined absorption models + species tags naming atm.vmr
    # rows (spectral_propmat_agendaAuto parity, src/m_abs.cc:234-300)
    predef: tuple = dataclasses.field(metadata=dict(static=True), default=())
    species_names: tuple = dataclasses.field(
        metadata=dict(static=True), default=()
    )
    # full-band ECS line-mixing bands: ((EcsBand, spec_idx, iso_idx,
    # iso_ratio), ...); evaluated per path point like the line catalog
    ecs_bands: tuple = ()
    # non-LTE band: population-ratio profiles + the band's own line
    # catalog (lbl_fwd.h:14 nlte line storage; rtepack_source.cc:40
    # J = B + K^-1 S)
    nlte: object | None = None


@functools.partial(
    jax.jit,
    static_argnames=(
        "background", "block", "rte_option", "scattered_sun",
        "depolarization", "sun_refraction",
    ),
)
def simulate_clearsky(
    scene: ClearskyScene,
    f_grid,
    path_alt,
    path_dr,
    background: str = "space",
    block: int = 256,
    path_za=None,
    path_aa=None,
    rte_option: str = "constant",
    sun=None,
    sun_za=None,
    sun_aa=0.0,
    scattered_sun: bool = False,
    depolarization: float = 0.0,
    sun_refraction: bool = False,
):
    """Clear-sky spectral radiance [W/(m^2 Hz sr)] seen by the observer.

    path_alt: [np] altitudes ordered observer -> background end;
    path_dr: [np-1] layer lengths. background: "space" | "surface".
    Zero-length segments are exact no-ops, so batched paths may be padded.
    path_za/path_aa: per-point LOS angles [deg]; with scene.atm.wind set,
    absorption is evaluated on the per-point Doppler-shifted grid
    (parity: freq_grid_pathFromPath, src/m_frequency_grid.cc).
    rte_option: layer discretization, "constant" | "lintau" | "linprop"
    (the reference's rte_option WSV / TransmittanceOption enum).

    Sun in the pencil beam (parity: spectral_radSunOrCosmicBackground,
    workspace_methods.cpp:4858, and the first-order-Rayleigh scattered
    sun, m_sun.cc:306-436 spectral_rad_scat_pathSunsFirstOrderRayleigh):
    pass `sun` (sun.Sun) with its local direction (sun_za, sun_aa)
    [deg, direction TO the sun].  With background "space" and path_za
    given, the path background becomes the solar photosphere radiance
    when the viewing direction at the path end hits the solar disk.
    `scattered_sun=True` adds the single-Rayleigh-scattering solar source
    along the path — the sun leg is attenuated along its true
    spherical-shell geometric path per scatter point (sun_leg_tau; the
    reference's find_sun_path, geometric variant) — plus the Rayleigh
    air extinction on the main path.
    """
    pts = scene.atm.at(path_alt)  # batched over path points

    if scene.atm.wind is not None and path_za is not None:
        za = jnp.deg2rad(jnp.asarray(path_za))
        aa = jnp.deg2rad(
            jnp.zeros_like(za) if path_aa is None else jnp.asarray(path_aa)
        )
        # propagation direction (x=E, y=N, z=Up); v_los = wind . k
        khat = jnp.stack(
            [jnp.sin(za) * jnp.sin(aa), jnp.sin(za) * jnp.cos(aa), jnp.cos(za)],
            axis=-1,
        )
        v_los = jnp.sum(pts.wind * khat, axis=-1)  # [np]
        dshift = 1.0 - v_los / const.c
    else:
        dshift = jnp.ones(path_alt.shape, f_grid.dtype)

    def point_abs(t, p, v, d):
        return species_absorption(scene, f_grid * d, t, p, v, block=block)

    with jax.named_scope("propmat"):  # ARTS_TIME_REPORT scope parity
        k = jax.vmap(point_abs)(pts.t, pts.p, pts.vmr, dshift)  # [np, F]

    with jax.named_scope("srcvec"):
        J = planck(f_grid[None, :], pts.t[:, None])  # [np, F]

    if scene.nlte is not None:
        # NLTE band: per-line populations add absorption to K and an
        # emission excess S; the source becomes J = B + S/K with K the
        # FULL absorption (rtepack_source.cc:40, level_nlte).
        from .lbl.nlte import nlte_absorption_source

        ru, rl = scene.nlte.at(path_alt)  # [np, L]

        def point_nlte(t, p, v, d, ru_, rl_):
            return nlte_absorption_source(
                f_grid * d, scene.nlte.cat, t, p, v, ru_, rl_, block=block
            )

        a_n, s_n = jax.vmap(point_nlte)(
            pts.t, pts.p, pts.vmr, dshift, ru, rl
        )  # [np, F] each
        k = k + a_n
        k_safe = jnp.where(jnp.abs(k) > 1e-30, k, 1.0)
        J = J + s_n / k_safe

    if sun is not None and scattered_sun:
        # first-order Rayleigh scattered sun (m_sun.cc:306-436): per path
        # point, the transmitted solar radiance scatters into the LOS.
        # Sun-leg attenuation follows the true spherical-shell geometric
        # path to the sun per scatter point (the reference's
        # find_sun_path, src/sun_methods.cc:178-239): below-horizon legs
        # with a positive tangent altitude still see the sun (twilight),
        # where plane-parallel exp(-tau/mu) breaks; the scattering
        # operator is the Rayleigh phase matrix's intensity row and
        # AirSimple air.
        from .rtepack.scattering import (
            rayleigh_scat_airsimple,
            rayleigh_scattering,
        )

        zg = scene.atm.z  # ascending levels
        lv = scene.atm.at(zg)
        k_lvl = jax.vmap(point_abs)(
            lv.t, lv.p, lv.vmr, jnp.ones(zg.shape, f_grid.dtype)
        )  # [Z, F]
        k_ray_lvl = jax.vmap(
            lambda pp, tt: rayleigh_scat_airsimple(f_grid, pp, tt)
        )(lv.p, lv.t)
        kx = k_lvl + k_ray_lvl
        k_mid = 0.5 * (kx[1:] + kx[:-1])  # [Z-1, F]
        n_lvl = None
        if sun_refraction:
            # traced Smith-Weintraub refractivity on the levels (the
            # reference's refracted sun paths via
            # ray_point_back_propagation_agenda); H2O VMR from the named
            # species row when present
            from .path.refraction import microwave_refractivity

            h2o = (
                lv.vmr[:, scene.species_names.index("H2O")]
                if "H2O" in scene.species_names
                else jnp.zeros_like(lv.p)
            )
            n_lvl = 1.0 + microwave_refractivity(lv.p, lv.t, h2o)
        tau_p, visible = sun_leg_tau(
            zg, k_mid, jnp.asarray(path_alt, f_grid.dtype),
            jnp.asarray(sun_za, f_grid.dtype), n_levels=n_lvl,
        )
        t_sun = jnp.where(visible[:, None], jnp.exp(-tau_p), 0.0)  # [np, F]

        k_ray_p = jax.vmap(
            lambda pp, tt: rayleigh_scat_airsimple(f_grid, pp, tt)
        )(pts.p, pts.t)  # [np, F]
        za_p = jnp.asarray(path_za, f_grid.dtype)
        aa_p = (
            jnp.zeros_like(za_p)
            if path_aa is None
            else jnp.asarray(path_aa, f_grid.dtype)
        )
        los_in = jnp.stack(
            [jnp.broadcast_to(jnp.asarray(sun_za, f_grid.dtype), za_p.shape),
             jnp.broadcast_to(jnp.asarray(sun_aa, f_grid.dtype), za_p.shape)],
            -1,
        )
        los_out = jnp.stack([za_p, aa_p], -1)
        phase = rayleigh_scattering(los_in, los_out, depolarization)[
            ..., 0, 0
        ]  # [np]
        r2i = jnp.pi * sun.sin_alpha_squared()  # radiance -> irradiance
        scat = (
            k_ray_p
            * (phase / (4.0 * jnp.pi))[:, None]
            * r2i
            * sun.spectrum[None, :]
            * t_sun
        )  # [np, F]
        k = k + k_ray_p  # scattering extinction on the main path too
        k_safe2 = jnp.where(jnp.abs(k) > 1e-30, k, 1.0)
        J = J + scat / k_safe2  # srcvec += K^-1 scat (m_sun.cc:269-304)

    r = jnp.asarray(path_dr)
    cmb = planck(
        f_grid, jnp.asarray(const.cosmic_microwave_background_temperature)
    ) * jnp.ones_like(f_grid)
    if sun is not None and background == "space" and path_za is not None:
        # sun-or-CMB at the end of the pencil beam
        from .sun import hit_sun_los, sun_background_radiance

        za_end = jnp.asarray(path_za)[-1]
        aa_end = (
            jnp.asarray(0.0) if path_aa is None else jnp.asarray(path_aa)[-1]
        )
        _, hit = hit_sun_los(sun, za_end, aa_end, sun_za, sun_aa)
        cmb = sun_background_radiance(sun, f_grid, hit, cmb)
    if background == "surface":
        b_surf = planck(f_grid, scene.surface_temperature)
        I0 = scene.surface_emissivity * b_surf + (
            1.0 - scene.surface_emissivity
        ) * cmb
    elif background == "surface_reflect":
        # Reflecting surface (spectral_radSurfaceReflectance parity,
        # src/m_surface.cc:140-240, with spectral_surf_reflFlatScalar): the
        # downwelling radiance arriving at the surface from the specular
        # direction is computed by re-running the emission recursion over
        # the SAME layer stack reversed — exact for a horizontally
        # homogeneous 1D atmosphere, replacing the reference's re-entrant
        # observer-agenda call (same rte_option discretization on both
        # legs, as the reference applies rte_option along every path);
        # then I0 = R I_down + (1 - R) B(T_surf).
        b_surf = planck(f_grid, scene.surface_temperature)
        I_down = _emission_fn(rte_option)(k[::-1], J[::-1], r[::-1], cmb)
        refl = 1.0 - scene.surface_emissivity
        I0 = refl * I_down + scene.surface_emissivity * b_surf
    else:
        from .options import PathBackground, check_option

        check_option(PathBackground, background)
        I0 = cmb

    with jax.named_scope("rte_emission"):
        return _emission_fn(rte_option)(k, J, r, I0)


@functools.partial(
    jax.jit, static_argnames=("block", "backend", "lbl_tuning")
)
def gas_absorption_levels(
    scene: ClearskyScene,
    f_grid,
    block: int = 256,
    backend: str = "xla",
    lbl_tuning: tuple | None = None,
):
    """Gas absorption on the scene's own level grid, ascending: [Z, F].

    The level-cache primitive for many-geometry measurement batches: in a
    1D atmosphere every path samples the same vertical state, so the LBL
    stage is computed ONCE here and each geometry interpolates (the
    reference's per-path-point cache in fwd_spectral_radiance.h:40-85,
    hoisted to a whole-profile precompute that feeds the Pallas kernel a
    single big launch).  backend="pallas" uses the block-skip Voigt
    kernel (lbl.voigt.absorption_pallas).

    Unsupported scene features fail loudly rather than silently
    producing LTE radiances: NLTE scenes need the per-point source
    term (use simulate_clearsky); wind scenes need per-point Doppler
    grids (no shared level cache exists)."""
    if scene.nlte is not None:
        raise ValueError(
            "gas_absorption_levels has no NLTE source term — NLTE "
            "scenes must use simulate_clearsky (per-point evaluation)"
        )
    if scene.atm.wind is not None:
        raise ValueError(
            "gas_absorption_levels cannot cache a wind (Doppler) scene: "
            "the per-point frequency shift breaks the shared level grid"
        )
    pts = scene.atm.at(scene.atm.z)

    def point_abs(t, p, v):
        return species_absorption(
            scene, f_grid, t, p, v, block=block, backend=backend,
            lbl_tuning=lbl_tuning,
        )

    with jax.named_scope("propmat_levels"):
        return jax.vmap(point_abs)(pts.t, pts.p, pts.vmr)


@functools.partial(
    jax.jit, static_argnames=("background", "rte_option")
)
def simulate_clearsky_from_levels(
    k_levels,
    scene: ClearskyScene,
    f_grid,
    path_alt,
    path_dr,
    background: str = "space",
    rte_option: str = "constant",
):
    """Clear-sky radiance with absorption interpolated from a level cache.

    k_levels: [Z, F] from gas_absorption_levels (scene.atm.z, ascending).
    Per path point, k interpolates linearly in altitude — exact at level
    altitudes, O(dz^2) between them (the same order as the linear T/VMR
    interpolation the direct path applies before the lineshape).  No
    Doppler wind support (a per-point frequency shift breaks the shared
    level grid); use simulate_clearsky for wind scenes.  Differentiable
    wrt k_levels and every scene leaf the source/boundary terms touch."""
    z = scene.atm.z
    alt = jnp.asarray(path_alt)
    i1 = jnp.clip(jnp.searchsorted(z, alt), 1, z.shape[0] - 1)
    i0 = i1 - 1
    w = jnp.clip((alt - z[i0]) / (z[i1] - z[i0]), 0.0, 1.0)
    k = k_levels[i0] * (1.0 - w)[:, None] + k_levels[i1] * w[:, None]

    pts = scene.atm.at(alt)
    J = planck(f_grid[None, :], pts.t[:, None])
    r = jnp.asarray(path_dr)
    cmb = planck(
        f_grid, jnp.asarray(const.cosmic_microwave_background_temperature)
    ) * jnp.ones_like(f_grid)
    if background == "surface":
        b_surf = planck(f_grid, scene.surface_temperature)
        I0 = scene.surface_emissivity * b_surf + (
            1.0 - scene.surface_emissivity
        ) * cmb
    elif background == "surface_reflect":
        b_surf = planck(f_grid, scene.surface_temperature)
        I_down = _emission_fn(rte_option)(k[::-1], J[::-1], r[::-1], cmb)
        refl = 1.0 - scene.surface_emissivity
        I0 = refl * I_down + scene.surface_emissivity * b_surf
    else:
        from .options import PathBackground, check_option

        check_option(PathBackground, background)
        I0 = cmb
    return _emission_fn(rte_option)(k, J, r, I0)


def sun_leg_tau(z_levels, k_mid, alt, sun_za_deg, radius=None,
                n_levels=None):
    """Optical depth along the (optionally refracted) sun leg.

    The spherical-shell analogue of the reference's find_sun_path
    (src/sun_methods.cc:178-239): from a point at ``alt`` with local sun
    zenith angle ``sun_za_deg``, the ray has Bouguer invariant
    p = n(alt) (R + alt) sin(za); within shell j (refractive index n_j
    constant) its slant coordinate is S_j(r) = sqrt((n_j r)^2 - p^2)/n_j,
    so per-shell slant lengths are S_j-differences and tau is one
    [np, Z-1] @ [Z-1, F] contraction.  Rays with za > 90 descend to the
    tangent radius (n r = p) first: when that clears the surface the sun
    is still visible (twilight geometry, where plane-parallel
    exp(-tau/mu) is 0 or diverges) and tau = 2 tau_full - tau_up; when
    it does not, the planet blocks the leg.

    n_levels: optional [Z] refractive index at the levels (e.g. from
    path.refraction.refractivity_profile); None = geometric (n = 1).
    Refraction matters exactly in the za ~ 90 twilight regime this
    function advertises (~0.5 deg of extra bending at the horizon).
    Assumes n r increasing outward (no ducting).

    z_levels: [Z] ascending; k_mid: [Z-1, F] mid-layer extinction;
    alt: [np]; sun_za_deg: scalar or [np].
    Returns (tau [np, F], visible [np] bool).
    """
    if radius is None:
        from .path.geometry import EARTH_RADIUS as radius
    za = jnp.deg2rad(jnp.broadcast_to(jnp.asarray(sun_za_deg), alt.shape))
    r_a = radius + alt
    r_l = radius + z_levels  # [Z]
    if n_levels is None:
        n_mid = jnp.ones(z_levels.shape[0] - 1, za.dtype)
        n_at = jnp.ones_like(alt)
        n_bot = 1.0
    else:
        n_levels = jnp.asarray(n_levels, za.dtype)
        n_mid = 0.5 * (n_levels[1:] + n_levels[:-1])  # [Z-1]
        n_at = jnp.interp(alt, z_levels, n_levels)
        n_bot = n_levels[0]
    p_inv = n_at * r_a * jnp.sin(za)  # [np] Bouguer invariant

    def S_of(r, nj):  # [np, Z-1] slant coordinate at radius r in shell j
        return (
            jnp.sqrt(jnp.maximum((nj * r) ** 2 - p_inv[:, None] ** 2, 0.0))
            / nj
        )

    S_lo = S_of(r_l[None, :-1], n_mid[None, :])
    S_hi = S_of(r_l[None, 1:], n_mid[None, :])
    Sa = S_of(r_a[:, None], n_mid[None, :])  # start clamp, per shell
    seg_up = jnp.maximum(S_hi - jnp.maximum(S_lo, Sa), 0.0)  # [np, Z-1]
    seg_full = jnp.maximum(S_hi - S_lo, 0.0)
    tau_up = seg_up @ k_mid  # [np, F]
    tau_full = seg_full @ k_mid
    desc = za > jnp.pi / 2
    tau = jnp.where(desc[:, None], 2.0 * tau_full - tau_up, tau_up)
    visible = (~desc) | (p_inv > n_bot * radius)
    return tau, visible


def simulate_clearsky_bt(scene, f_grid, path_alt, path_dr, background="space"):
    """Planck brightness-temperature version (unit transform operator parity:
    src/core/operators/spectral_radiance_transform_operator.cc)."""
    from .ops.planck import inv_planck

    I = simulate_clearsky(scene, f_grid, path_alt, path_dr, background=background)
    return inv_planck(I, f_grid)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ZeemanScene:
    """Clear-sky scene with Zeeman-split polarized absorption.

    Parity: the reference's zeeman example (examples/2-clearsky-radiative-
    transfer/2-zeeman) — spectral_propmatAddLines with Zeeman polarization
    + polarized rte_emission.
    """

    atm: "Atmosphere1D"
    zcat: object  # ZeemanCatalog
    pf: PartFunTable
    surface_temperature: jax.Array = dataclasses.field(
        default_factory=lambda: jnp.asarray(288.0)
    )
    # scalar power reflectance for background="surface_reflect"
    # (spectral_surf_reflFlatScalar parity, src/m_surface.cc:89-138)
    surface_reflectance: jax.Array = dataclasses.field(
        default_factory=lambda: jnp.asarray(0.0)
    )
    # optional non-LTE band (unpolarized lines on top of the Zeeman
    # background): J = B e1 + K^-1 S (rtepack_source.cc level_nlte)
    nlte: object | None = None


def _emission_fn_polarized(rte_option: str):
    """Polarized emission recursion for an rte_option (the reference's
    TransmittanceOption; rtepack_rtestep.cc dispatches the same three
    discretizations for Stokes radiances)."""
    from .options import RteOption, check_option
    from .rtepack.emission import (
        emission_polarized,
        emission_polarized_linprop,
        emission_polarized_linsrc,
    )

    return {
        "constant": emission_polarized,
        "lintau": emission_polarized_linsrc,
        "linprop": emission_polarized_linprop,
    }[check_option(RteOption, rte_option)]


@functools.partial(
    jax.jit, static_argnames=("background", "block", "rte_option")
)
def simulate_clearsky_polarized(
    scene: ZeemanScene,
    f_grid,
    path_alt,
    path_za,
    path_dr,
    background: str = "space",
    block: int = 256,
    rte_option: str = "constant",
):
    """Polarized (full Stokes) clear-sky radiance [F, 4] at the observer.

    path_za: per-point line-of-sight zenith angle (degrees) for the
    magnetic geometry; magnetic field from scene.atm.mag.
    rte_option: layer discretization, "constant" | "lintau" | "linprop"
    (parity: the reference's rte_option WSV, applied to polarized
    radiances in tests/core/zeeman/spectral_radiance_jacobian_*.py).
    """
    from .lbl.zeeman import zeeman_propmat
    from .rtepack.propmat import inv as pm_inv, matvec

    emission_polarized = _emission_fn_polarized(rte_option)

    pts = scene.atm.at(path_alt)

    k = jax.vmap(
        lambda t, p, v, m, za: zeeman_propmat(
            f_grid, scene.zcat, scene.pf, t, p, v, m, za, block=block
        )
    )(pts.t, pts.p, pts.vmr, pts.mag, jnp.asarray(path_za))  # [np, F, 7]

    # source: J = B e1 (+ NLTE: J = B e1 + K^-1 S, rtepack_source.cc:40)
    B = planck(f_grid[None, :], pts.t[:, None])  # [np, F]
    J = jnp.zeros(B.shape + (4,), B.dtype).at[..., 0].set(B)

    if scene.nlte is not None:
        from .lbl.nlte import nlte_absorption_source

        ru, rl = scene.nlte.at(path_alt)

        def point_nlte(t, p, v, ru_, rl_):
            return nlte_absorption_source(
                f_grid, scene.nlte.cat, t, p, v, ru_, rl_, block=block
            )

        a_n, s_n = jax.vmap(point_nlte)(pts.t, pts.p, pts.vmr, ru, rl)
        k = k.at[..., 0].add(a_n)
        S = jnp.zeros_like(J).at[..., 0].set(s_n)
        # floor A for the inversion only: where K ~ 0 the excess S is
        # also ~ 0 (same lines), so the contribution vanishes cleanly
        k_inv = k.at[..., 0].set(jnp.maximum(k[..., 0], 1e-30))
        J = J + matvec(pm_inv(k_inv), S)

    r = jnp.asarray(path_dr)
    cmb = planck(
        f_grid, jnp.asarray(const.cosmic_microwave_background_temperature)
    ) * jnp.ones_like(f_grid)
    if background == "surface":
        I0s = planck(f_grid, scene.surface_temperature)
        I0 = jnp.zeros(f_grid.shape + (4,), f_grid.dtype).at[..., 0].set(I0s)
    elif background == "surface_reflect":
        # Polarized reflecting surface: the downwelling Stokes vector is
        # integrated along the mirrored path (zenith angle 180 - za flips
        # the magnetic geometry, so the propagation matrices are
        # recomputed, not reused), then reflected with the V-mirroring
        # scalar reflection (rtepack::flat_scalar_reflection,
        # rtepack_surface.cc:341-346).
        from .rtepack.surface import flat_scalar_reflection

        za_down = 180.0 - jnp.asarray(path_za)[::-1]
        k_down = jax.vmap(
            lambda t, p, v, m, za: zeeman_propmat(
                f_grid, scene.zcat, scene.pf, t, p, v, m, za, block=block
            )
        )(
            pts.t[::-1], pts.p[::-1], pts.vmr[::-1], pts.mag[::-1], za_down
        )  # [np, F, 7]
        I_cmb = jnp.zeros(f_grid.shape + (4,), f_grid.dtype).at[..., 0].set(cmb)
        I_down = emission_polarized(k_down, J[::-1], r[::-1], I_cmb)
        b_surf = planck(f_grid, scene.surface_temperature)
        B = jnp.zeros(f_grid.shape + (4,), f_grid.dtype).at[..., 0].set(b_surf)
        I0 = flat_scalar_reflection(I_down, scene.surface_reflectance, B)
    else:
        I0 = jnp.zeros(f_grid.shape + (4,), f_grid.dtype).at[..., 0].set(cmb)

    return emission_polarized(k, J, r, I0)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Clearsky3DScene:
    """Clear-sky scene over a 3D (alt, lat, lon) atmosphere.

    Parity: fwd::spectral_rad's gridded (alt, lat, lon) atmosphere walked
    per path point with 8-corner interpolation weights
    (src/core/fwd/fwd_spectral_radiance.h:40-85); here the trilinear
    point evaluation is vmapped over the whole path at once.
    """

    atm: Atmosphere3D
    cat: LineCatalog | None
    pf: PartFunTable | None
    surface_temperature: jax.Array = dataclasses.field(
        default_factory=lambda: jnp.asarray(288.0)
    )
    surface_emissivity: jax.Array = dataclasses.field(
        default_factory=lambda: jnp.asarray(1.0)
    )
    predef: tuple = dataclasses.field(metadata=dict(static=True), default=())
    species_names: tuple = dataclasses.field(
        metadata=dict(static=True), default=()
    )
    ecs_bands: tuple = ()


@functools.partial(jax.jit, static_argnames=("background", "block"))
def simulate_clearsky_3d(
    scene: Clearsky3DScene,
    f_grid,
    path_alt,
    path_lat,
    path_lon,
    path_dr,
    background: str = "space",
    block: int = 256,
    path_za=None,
    path_aa=None,
):
    """Clear-sky radiance along a 3D path (observer -> background order).

    Same physics as `simulate_clearsky` with atmospheric state sampled at
    (alt, lat, lon) per point; with scene.atm.wind set and path angles
    given, absorption is evaluated on the per-point Doppler-shifted grid.
    """
    pts = scene.atm.at(path_alt, path_lat, path_lon)

    if scene.atm.wind is not None and path_za is not None:
        za = jnp.deg2rad(jnp.asarray(path_za))
        aa = jnp.deg2rad(
            jnp.zeros_like(za) if path_aa is None else jnp.asarray(path_aa)
        )
        khat = jnp.stack(
            [jnp.sin(za) * jnp.sin(aa), jnp.sin(za) * jnp.cos(aa), jnp.cos(za)],
            axis=-1,
        )
        v_los = jnp.sum(pts.wind * khat, axis=-1)
        dshift = 1.0 - v_los / const.c
    else:
        dshift = jnp.ones(jnp.shape(path_alt), f_grid.dtype)

    def point_abs(t, p, v, d):
        return species_absorption(scene, f_grid * d, t, p, v, block=block)

    k = jax.vmap(point_abs)(pts.t, pts.p, pts.vmr, dshift)
    J = planck(f_grid[None, :], pts.t[:, None])

    r = jnp.asarray(path_dr)
    cmb = planck(
        f_grid, jnp.asarray(const.cosmic_microwave_background_temperature)
    ) * jnp.ones_like(f_grid)
    if background == "surface":
        b_surf = planck(f_grid, scene.surface_temperature)
        I0 = scene.surface_emissivity * b_surf + (
            1.0 - scene.surface_emissivity
        ) * cmb
    elif background == "surface_reflect":
        b_surf = planck(f_grid, scene.surface_temperature)
        I_down = emission_unpolarized(k[::-1], J[::-1], r[::-1], cmb)
        refl = 1.0 - scene.surface_emissivity
        I0 = refl * I_down + scene.surface_emissivity * b_surf
    else:
        from .options import PathBackground, check_option

        check_option(PathBackground, background)
        I0 = cmb

    return emission_unpolarized(k, J, r, I0)
