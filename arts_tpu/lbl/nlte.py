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

import jax
import jax.numpy as jnp

from .. import constants as const
from .catalog import LineCatalog
from .voigt import _shape_sum, lineshape_params
from .tmodel import ID0, IDV, IG0


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
