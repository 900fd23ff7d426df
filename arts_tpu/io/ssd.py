"""Legacy gridded SingleScatteringData -> ParticleHabit conversion.

Parity reference: /root/reference/src/core/scattering/ — ingestion of
ARTS-2 TRO gridded data (single_scattering_data.h; `to_tro_spectral`
transform path) whose phase function lives on a zenith-angle grid.  The
Legendre (spectral) analysis of the static data is a host-side numpy
precompute (the reference uses SHTns behind a global mutex, sht.cc:12 —
moot here since nothing traced depends on it).
"""

import numpy as np

from ..scattering.habit import ParticleHabit


def legendre_moments(za_deg, z11, nleg):
    """Normalized phase-function Legendre moments g_l from Z11(za).

    g_l = (1/2) int p(mu) P_l(mu) dmu with p = 4 pi Z11 / sca and
    sca = 2 pi int Z11 dmu, so g_0 = 1 exactly.
    Returns (g [nleg], sca_from_phase).
    """
    mu = np.cos(np.deg2rad(za_deg))
    order = np.argsort(mu)
    mu = mu[order]
    z = z11[order]
    sca = 2.0 * np.pi * np.trapezoid(z, mu)
    g = np.empty(nleg)
    for l in range(nleg):
        P = np.polynomial.legendre.Legendre.basis(l)(mu)
        g[l] = 2.0 * np.pi * np.trapezoid(z * P, mu) / sca
    return g, sca


def habit_from_legacy_ssd(ssd_list, meta_list, nleg=32):
    """Build a ParticleHabit from parallel lists of parsed legacy
    SingleScatteringData dicts (io.artsxml) and ScatteringMetaData dicts.

    Requires ptype 'totally_random': pha_mat_data [F, T, za, 1, 1, 1, 6],
    ext_mat_data [F, T, 1, 1, 1], abs_vec_data [F, T, 1, 1, 1].
    """
    import jax.numpy as jnp

    assert len(ssd_list) == len(meta_list) and len(ssd_list) > 0
    f_grid = np.asarray(ssd_list[0]["f_grid"])
    t_grid = np.asarray(ssd_list[0]["T_grid"])
    S, F, T = len(ssd_list), f_grid.size, t_grid.size

    sizes = np.array([m["diameter_volume_equ"] for m in meta_list])
    masses = np.array([m["mass"] for m in meta_list])
    # mass-size fit m = a D^b (least squares in log space)
    valid = (sizes > 0) & (masses > 0)
    b, loga = np.polyfit(np.log(sizes[valid]), np.log(masses[valid]), 1)
    a = float(np.exp(loga))

    ext = np.zeros((S, F, T))
    sca = np.zeros((S, F, T))
    leg = np.zeros((S, F, T, nleg))
    for s, ssd in enumerate(ssd_list):
        assert ssd["ptype"] == "totally_random", ssd["ptype"]
        za = np.asarray(ssd["za_grid"])
        pha = np.asarray(ssd["pha_mat_data"])[:, :, :, 0, 0, 0, 0]  # Z11
        extm = np.asarray(ssd["ext_mat_data"])[:, :, 0, 0, 0]
        absv = np.asarray(ssd["abs_vec_data"])[:, :, 0, 0, 0]
        for i in range(F):
            for j in range(T):
                g, sca_ph = legendre_moments(za, pha[i, j], nleg)
                leg[s, i, j] = g
                sca[s, i, j] = sca_ph
        ext[s] = extm
        # prefer consistency: sca from phase-integral; fall back to ext-abs
        bad = ~np.isfinite(sca[s]) | (sca[s] <= 0)
        sca[s][bad] = (extm - absv)[bad]

    order = np.argsort(sizes)
    return ParticleHabit(
        sizes=jnp.asarray(sizes[order]),
        f_grid=jnp.asarray(f_grid),
        t_grid=jnp.asarray(t_grid),
        ext=jnp.asarray(ext[order]),
        sca=jnp.asarray(sca[order]),
        leg=jnp.asarray(leg[order]),
        a=jnp.asarray(a),
        b=jnp.asarray(b),
    )
