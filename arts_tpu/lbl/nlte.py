"""Non-LTE line absorption, source functions, and statistical equilibrium.

Parity reference:
  - /root/reference/src/core/lbl/lbl_lineshape_voigt_nlte.cpp —
    per-line NLTE amplitudes (line_strength_calc :25-44):
      k_amp = inv_sqrt_pi inv_gd r x * (rl gu/gl - ru) a / f0^3
      e_amp = 2 h inv_sqrt_pi inv_gd r x (e - k B_part) / c^2,
      B_part = f0^3 / expm1(h f0 / k T),  e = ru a / 1
    with the frequency prefactor scl = N f c^2/(8 pi) (:524-538); the
    absorption goes into the propagation matrix and the emission excess
    into the additional source vector S (J = B + K^-1 S,
    rtepack_source.cc:40).
  - /root/reference/src/core/lbl/lbl_nlte.{h,cpp} + src/m_nlte.cc —
    statistical equilibrium: createAij/Bij/Cij rate matrices, level
    populations from the balanced rate equations.

ru/rl are the per-line upper/lower level population *ratios* (the
reference stores them as QuantumLevelIdentifier keys on the AtmPoint).
"""

import dataclasses

import jax
import jax.numpy as jnp

from .. import constants as const
from ..ops.planck import planck
from .catalog import LineCatalog
from .voigt import _shape_sum, lineshape_params
from .tmodel import ID0, IDV, IG0


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class NlteField:
    """Non-LTE band state carried in a scene: level-population-ratio
    profiles on an altitude grid plus the band's line catalog.

    Parity: the reference stores populations as QuantumLevelIdentifier
    keys on the AtmField (atm_field.h:44, `nlte` data) and evaluates the
    per-line nlte Voigt in lbl_fwd.h:14 / lbl_lineshape_voigt_nlte.cpp;
    here the ratios are a stacked [NZ, NL] profile sampled like any
    other atmospheric field, and up/lo index maps select the per-line
    upper/lower ratios.
    """

    z: jax.Array  # [NZ] altitude grid (ascending)
    r: jax.Array  # [NZ, NL] population ratios per level
    cat: LineCatalog  # the NLTE band's lines (NOT also in the LTE catalog)
    up_idx: jax.Array  # [L] upper-level index per line
    lo_idx: jax.Array  # [L] lower-level index per line

    def at(self, alt):
        """(ru, rl) per-line population ratios at altitudes alt [...]."""
        alt = jnp.asarray(alt)
        i1 = jnp.clip(jnp.searchsorted(self.z, alt), 1, self.z.shape[0] - 1)
        i0 = i1 - 1
        w = jnp.clip((alt - self.z[i0]) / (self.z[i1] - self.z[i0]), 0.0, 1.0)
        r = self.r[i0] * (1.0 - w[..., None]) + self.r[i1] * w[..., None]
        return r[..., self.up_idx], r[..., self.lo_idx]


def nlte_amplitudes(cat: LineCatalog, T, P, vmr, ru, rl):
    """(k_amp, e_amp, f0s, inv_gd, z_imag): per-line NLTE amplitudes.

    Grouped f32-safe like the LTE path: the 1/f0^3, N and c^2/8pi factors
    fold into the amplitudes; the remaining frequency factor is just f.
    """
    ls = lineshape_params(cat, T, P, vmr)
    f0s = cat.f0 + ls[:, ID0] + ls[:, IDV]
    gd_part = jnp.sqrt(const.doppler_broadening_const_squared * T / cat.iso_mass)
    inv_gd = 1.0 / (gd_part * f0s)
    z_imag = ls[:, IG0] * inv_gd

    inv_f0 = 1.0 / cat.f0
    N = P / (const.k * T)
    x = vmr[cat.spec_idx]
    common = const.inv_sqrt_pi * inv_gd * cat.iso_ratio * x

    # absorption: scl * k = N f (c^2/8pi) (rl gu/gl - ru) a / f0^3; the
    # non-f factors grouped f32-safe as in the LTE path
    k_red = (rl * cat.gu / cat.gl - ru) * cat.a
    pref = (N * inv_f0) * ((const.c**2 / (8.0 * jnp.pi)) * inv_f0) * inv_f0
    k_amp = common * k_red * pref

    # source: scl * (2h/c^2)(e - k B_part) with e = ru a and
    # k B_part = (rl gu/gl - ru) a / expm1(h f0/kT); the c^2 cancels:
    #   src = f * N * (2h/8pi) * common * a [ru - (rl gu/gl - ru)/expm1]
    b_red = 1.0 / jnp.expm1(const.h * cat.f0 / (const.k * T))
    e_term = cat.a * (ru - (rl * cat.gu / cat.gl - ru) * b_red)
    e_amp = common * (2.0 * const.h / (8.0 * jnp.pi) * N) * e_term
    return k_amp, e_amp, f0s, inv_gd, z_imag


def nlte_absorption_source(f_grid, cat, T, P, vmr, ru, rl, block: int = 256):
    """(alpha [F] [1/m], src [F] [W/(m^2 Hz sr)/m]) at one point.

    alpha adds to the propagation matrix A; src is the additional source
    vector entry (rtepack_source.cc: J = B + K^-1 S).
    """
    k_amp, e_amp, f0s, inv_gd, z_imag = nlte_amplitudes(cat, T, P, vmr, ru, rl)
    shape_k = _shape_sum(f_grid, k_amp + 0j, f0s, inv_gd, z_imag, cat.cutoff, block)
    shape_e = _shape_sum(f_grid, e_amp + 0j, f0s, inv_gd, z_imag, cat.cutoff, block)
    alpha = f_grid * jnp.real(shape_k)
    src = f_grid * jnp.real(shape_e)
    return alpha, src


def statistical_equilibrium(W, normalize_to=1.0):
    """Steady-state level populations from a rate matrix.

    W[i, j] = transition rate j -> i (i != j), [nl, nl]; diagonal ignored.
    Solves dn/dt = 0 with sum(n) = normalize_to (the reference's
    m_nlte.cc balanced-rates solve).  Batched over leading axes.
    """
    nl = W.shape[-1]
    out_rates = jnp.sum(W, axis=-2) - jnp.einsum("...ii->...i", W)
    M = W - jnp.zeros_like(W).at[..., jnp.arange(nl), jnp.arange(nl)].set(out_rates)
    # replace last row with the closure sum(n) = normalize_to
    M = M.at[..., -1, :].set(1.0)
    b = jnp.zeros(W.shape[:-1]).at[..., -1].set(normalize_to)
    return jnp.linalg.solve(M, b[..., None])[..., 0]


def two_level_rates(A, Bul, Blu, Cul, Clu, Jbar):
    """Rate matrix for a two-level system: returns W with
    W[0,1] (upper->lower: A + Bul Jbar + Cul) and W[1,0] (lower->upper)."""
    W = jnp.zeros(jnp.shape(Jbar) + (2, 2))
    W = W.at[..., 0, 1].set(A + Bul * Jbar + Cul)  # into lower from upper
    W = W.at[..., 1, 0].set(Blu * Jbar + Clu)  # into upper from lower
    return W


def boltzmann_ratios(T, g, E, Q):
    """LTE level population ratios n_level/n_species = g e^{-E/kT}/Q(T).

    Parity: level_density (lbl_nlte.cpp:14).  T [...], g/E [nl] -> [..., nl].
    """
    T = jnp.asarray(T)
    return (
        g * jnp.exp(-jnp.asarray(E) / (const.k * T[..., None]))
        / jnp.asarray(Q)[..., None]
    )


def line_profiles(f_grid, cat: LineCatalog, T, P, vmr):
    """Normalized Voigt profiles phi_l(f) [L, F] at one atmospheric point
    (int phi df = 1); the line-flux integration weight of
    nlte_line_flux_profileIntegrate (m_spectral_flux.cc:233-272)."""
    # real-pair Faddeeva (no complex dtypes): keeps the NLTE forward path
    # compilable at f64 on TPU (x64 rewriter rejects complex128 graphs)
    from ..ops.voigt_kernel import _wofz_parts

    ls = lineshape_params(cat, T, P, vmr)
    f0s = cat.f0 + ls[:, ID0] + ls[:, IDV]
    gd_part = jnp.sqrt(const.doppler_broadening_const_squared * T / cat.iso_mass)
    inv_gd = 1.0 / (gd_part * f0s)
    z_imag = ls[:, IG0] * inv_gd
    zr = inv_gd[:, None] * (f_grid[None, :] - f0s[:, None])
    zi = jnp.broadcast_to(z_imag[:, None], zr.shape)
    n = 24 if jnp.result_type(zr.dtype) == jnp.float32 else 64
    wr, _ = _wofz_parts(zr, zi, n)
    return const.inv_sqrt_pi * inv_gd[:, None] * wr


def mean_intensity_profile(
    f_grid, z_levels, k, J, mus, wmus, t_space, surf_t, surf_eps
):
    """Mean intensity Jbar(z, f) = (1/4pi) oint I dOmega for a 1D
    plane-parallel atmosphere, by Gauss-Legendre zenith quadrature.

    Parity: spectral_flux_profilePseudo2D / FromPathField
    (m_spectral_flux.cc:108-206) — the reference integrates a sorted fan
    of per-altitude pencil beams with trapezoid weights in cos(zen); here
    each quadrature direction's up/down radiances at ALL levels come from
    two cumulative scans (one per direction), batched over (mu, f).

    k, J: [nz, F] (z ascending); mus/wmus: GL nodes on (0, 1], sum w = 1.
    Space boundary is a blackbody at t_space (CMB for Earth scenes);
    surface reflects (1 - eps) of the specular downwelling.
    """
    dz = jnp.diff(z_levels)  # [nz-1]
    k_lay = 0.5 * (k[:-1] + k[1:])
    j_lay = 0.5 * (J[:-1] + J[1:])
    I_space = planck(f_grid, t_space) * jnp.ones_like(f_grid)
    b_surf = planck(f_grid, surf_t) * jnp.ones_like(f_grid)

    def one_mu(mu):
        t = jnp.exp(-k_lay * (dz / mu)[:, None])  # [nz-1, F]

        def step(I, xs):
            t_l, j_l = xs
            In = t_l * (I - j_l) + j_l
            return In, In

        # downwelling: from space at the top, collecting I at levels nz-2..0
        _, ys_dn = jax.lax.scan(step, I_space, (t, j_lay), reverse=True)
        I_dn = jnp.concatenate([ys_dn, I_space[None]], 0)  # [nz, F]
        # upwelling: from the surface, collecting I at levels 1..nz-1
        I0 = surf_eps * b_surf + (1.0 - surf_eps) * I_dn[0]
        _, ys_up = jax.lax.scan(step, I0, (t, j_lay))
        I_up = jnp.concatenate([I0[None], ys_up], 0)
        return I_up + I_dn

    I_sum = jax.vmap(one_mu)(mus)  # [nmu, nz, F]
    return 0.5 * jnp.einsum("m,mzf->zf", wmus, I_sum)


def nlte_fit_profile(
    f_grid,
    z_levels,
    t_prof,
    p_prof,
    vmr_prof,
    cat: LineCatalog,
    n_levels: int,
    up_idx,
    lo_idx,
    Cul,
    Clu,
    r_sum,
    r_init,
    surf_t,
    surf_eps=1.0,
    t_space=const.cosmic_microwave_background_temperature,
    k_bg=None,
    n_mu: int = 8,
    convergence_limit: float = 1e-6,
    iteration_limit: int = 100,
):
    """Fixed-point non-LTE population fit against the radiation field.

    Parity: atm_profileFitNonLTE (src/m_nlte.cc:49-142) — iterate
    {radiation field -> per-line Jbar -> statistical equilibrium} until
    the largest relative population change falls below convergence_limit.
    The reference runs pencil-beam fans per altitude under OpenMP; here
    the field is two lax.scans batched over (mu, f), the per-line flux
    integration one einsum, and the per-altitude SE solves one batched
    jnp.linalg.solve — a single jitted iteration body.

    Einstein coefficients from the catalog per lbl_nlte.cpp:160-203:
    Bul = A c^2/(2 h f0^3), Blu = Bul gu/gl; rates Bul*Jbar with Jbar the
    line-profile-weighted mean intensity.

    Shapes: z/t/p [nz]; vmr_prof [nz, nspec]; up_idx/lo_idx [L] level
    indices per line; Cul/Clu [nz, L] collision rates; r_sum [nz] total
    ratio budget; r_init [nz, nl].  Returns (r [nz, nl], n_iter,
    max_change).
    """
    import numpy as np

    x_np, w_np = np.polynomial.legendre.leggauss(n_mu)
    mus = jnp.asarray(0.5 * (x_np + 1.0))  # map to (0, 1)
    wmus = jnp.asarray(0.5 * w_np)  # sum = 1

    Aul = cat.a
    Bul = cat.a / (2.0 * const.h / const.c**2 * cat.f0**3)
    Blu = Bul * cat.gu / cat.gl
    Bplanck = planck(f_grid[None, :], t_prof[:, None])  # [nz, F]
    if k_bg is None:
        k_bg = jnp.zeros_like(Bplanck)

    @jax.jit
    def body(r):
        ru = r[:, up_idx]  # [nz, L]
        rl = r[:, lo_idx]

        def point(t, p, v, ru_, rl_):
            return nlte_absorption_source(f_grid, cat, t, p, v, ru_, rl_)

        alpha, src = jax.vmap(point)(t_prof, p_prof, vmr_prof, ru, rl)
        k_tot = alpha + k_bg
        safe = jnp.where(jnp.abs(k_tot) > 1e-30, k_tot, 1.0)
        J = Bplanck + src / safe
        Jmean = mean_intensity_profile(
            f_grid, z_levels, k_tot, J, mus, wmus, t_space, surf_t, surf_eps
        )
        phi = jax.vmap(lambda t, p, v: line_profiles(f_grid, cat, t, p, v))(
            t_prof, p_prof, vmr_prof
        )  # [nz, L, F]
        # profile-weighted mean intensity; normalizing by the quadrature of
        # phi itself (analytically 1) cancels the Lorentzian tail mass
        # falling outside f_grid — the reference integrates raw against its
        # line-fitted grid (freq_gridFitNonLTE) and carries that truncation
        phi_mass = jnp.trapezoid(phi, f_grid, axis=-1)  # [nz, L]
        Jbar = jnp.trapezoid(
            phi * Jmean[:, None, :], f_grid, axis=-1
        ) / jnp.maximum(phi_mass, 1e-30)

        nz = r.shape[0]
        W = jnp.zeros((nz, n_levels, n_levels))
        W = W.at[:, lo_idx, up_idx].add(Aul + Bul * Jbar + Cul)
        W = W.at[:, up_idx, lo_idx].add(Blu * Jbar + Clu)
        r_new = statistical_equilibrium(W, r_sum)
        change = jnp.max(
            jnp.abs(r_new - r) / jnp.maximum(jnp.abs(r), 1e-30)
        )
        return r_new, change

    r = r_init
    max_change = jnp.inf
    n_iter = 0
    for n_iter in range(1, iteration_limit + 1):
        r, max_change = body(r)
        if float(max_change) < convergence_limit:
            break
    return r, n_iter, float(max_change)
