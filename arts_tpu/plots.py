"""Plotting helpers (headless-safe).

Parity reference: python/src/pyarts3/plots/ — one quick-look plotter per
value type (AtmField, PropmatVector, StokvecVector, DisortRadiance,
DisortFlux, AbsorptionBands, CIARecord, ArrayOfPropagationPathPoint,
ArrayOfSensorObsel, MuelmatVector, Sun, MagneticAngles, ...).  Here the
same coverage is provided against this framework's array types: minimal
matplotlib wrappers, all functions accept/return (fig, ax|axs) and never
call show().
"""

import numpy as np

# (label, index) layout of the packed-7 propagation matrix
# (rtepack/propmat.py; reference rtepack_propagation_matrix.h:12)
_PROPMAT_COMPONENTS = ("A", "B", "C", "D", "U", "V", "W")
_STOKES_COMPONENTS = ("I", "Q", "U", "V")


def _ax(ax=None):
    import matplotlib

    matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt

    if ax is None:
        fig, ax = plt.subplots()
    else:
        fig = ax.figure
    return fig, ax


def _axs(n, ax=None, ncols=2):
    import matplotlib

    matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt

    if ax is None:
        nrows = -(-n // ncols)
        fig, axs = plt.subplots(nrows, ncols, squeeze=False)
        axs = axs.ravel()[:n]
    else:
        axs = np.atleast_1d(ax).ravel()
        fig = axs[0].figure
    return fig, axs


def spectral_radiance(f_grid, I, ax=None, label=None, unit="radiance"):
    """Plot a radiance (or brightness-temperature) spectrum."""
    fig, ax = _ax(ax)
    ax.plot(np.asarray(f_grid) / 1e9, np.asarray(I), label=label)
    ax.set_xlabel("Frequency [GHz]")
    ax.set_ylabel(
        "Brightness temperature [K]" if unit == "Tb" else "Spectral radiance [W m$^{-2}$ Hz$^{-1}$ sr$^{-1}$]"
    )
    if label:
        ax.legend()
    return fig, ax


def absorption_spectrum(f_grid, alpha, ax=None, label=None):
    fig, ax = _ax(ax)
    ax.semilogy(np.asarray(f_grid) / 1e9, np.asarray(alpha), label=label)
    ax.set_xlabel("Frequency [GHz]")
    ax.set_ylabel("Absorption coefficient [m$^{-1}$]")
    if label:
        ax.legend()
    return fig, ax


def flux_profile(altitude, up, down, ax=None):
    """Upwelling/downwelling flux against altitude (DisortFlux.py parity)."""
    fig, ax = _ax(ax)
    ax.plot(np.asarray(up), np.asarray(altitude) / 1e3, label="up")
    ax.plot(np.asarray(down), np.asarray(altitude) / 1e3, label="down")
    ax.set_xlabel("Flux [W m$^{-2}$]")
    ax.set_ylabel("Altitude [km]")
    ax.legend()
    return fig, ax


def atm_profiles(atm, keys=None, ax=None):
    """Profiles of an Atmosphere1D: T, p and each VMR on its own panel
    (AtmField.py parity)."""
    z_km = np.asarray(atm.z) / 1e3
    panels = [("Temperature [K]", np.asarray(atm.t), "linear"),
              ("Pressure [Pa]", np.asarray(atm.p), "log")]
    vmr = np.asarray(atm.vmr)
    species = list(getattr(atm, "species", range(vmr.shape[0])))
    for i, sp in enumerate(species):
        if keys is None or sp in keys:
            panels.append((f"{sp} [VMR]", vmr[i], "log"))
    fig, axs = _axs(len(panels), ax)
    for a, (label, prof, scale) in zip(axs, panels):
        a.plot(prof, z_km)
        a.set_xscale(scale)
        a.set_xlabel(label)
        a.set_ylabel("Altitude [km]")
    fig.tight_layout()
    return fig, axs


def propmat_spectrum(f_grid, k, ax=None):
    """Plot a packed-7 propagation-matrix spectrum [F, 7] (or [F] scalar),
    one panel per nonzero component (PropmatVector.py parity)."""
    k = np.asarray(k)
    if k.ndim == 1:
        k = k[:, None]
    active = [i for i in range(k.shape[1]) if np.any(k[:, i] != 0.0)] or [0]
    fig, axs = _axs(len(active), ax)
    f = np.asarray(f_grid) / 1e9
    for a, i in zip(axs, active):
        a.plot(f, k[:, i])
        a.set_xlabel("Frequency [GHz]")
        a.set_ylabel(f"Propmat {_PROPMAT_COMPONENTS[i]} [m$^{{-1}}$]")
    fig.tight_layout()
    return fig, axs


def stokes_spectrum(f_grid, I, ax=None):
    """Stokes-vector spectrum [F, 4], one panel per component
    (StokvecVector.py parity)."""
    I = np.asarray(I)
    fig, axs = _axs(4, ax)
    f = np.asarray(f_grid) / 1e9
    for i, a in enumerate(axs):
        a.plot(f, I[:, i])
        a.set_xlabel("Frequency [GHz]")
        a.set_ylabel(f"Stokes {_STOKES_COMPONENTS[i]}")
    fig.tight_layout()
    return fig, axs


def disort_radiance(mu, levels, u, ax=None, f_idx=0):
    """Heatmap of the DISORT radiance field u[level, mu] at one frequency
    (DisortRadiance.py parity). u: [F, L+1, NQuad] or [L+1, NQuad]."""
    u = np.asarray(u)
    if u.ndim == 3:
        u = u[f_idx]
    fig, ax = _ax(ax)
    m = ax.pcolormesh(np.asarray(mu), np.asarray(levels), u, shading="auto")
    fig.colorbar(m, ax=ax, label="Radiance [W m$^{-2}$ Hz$^{-1}$ sr$^{-1}$]")
    ax.set_xlabel(r"Quadrature $\mu$")
    ax.set_ylabel("Level")
    return fig, ax


def brightness_temperature(f_grid, I, ax=None, label=None):
    """Radiance converted to Planck Tb (SpectralRadianceUnit 'Tb')."""
    from .ops.planck import inv_planck

    tb = np.asarray(inv_planck(np.asarray(I), np.asarray(f_grid)))
    return spectral_radiance(f_grid, tb, ax=ax, label=label, unit="Tb")


def jacobian_rows(f_grid, J, labels=None, ax=None, n_rows=None):
    """Spectral Jacobian rows dI/dx_i against frequency (the reference's
    jacobian quick-looks in examples)."""
    J = np.asarray(J)
    rows = range(J.shape[1] if n_rows is None else min(n_rows, J.shape[1]))
    fig, ax = _ax(ax)
    f = np.asarray(f_grid) / 1e9
    for i in rows:
        ax.plot(f, J[:, i], label=None if labels is None else labels[i])
    ax.set_xlabel("Frequency [GHz]")
    ax.set_ylabel("Jacobian [per state unit]")
    if labels is not None:
        ax.legend(fontsize="x-small")
    return fig, ax


def averaging_kernel(A, grid=None, ax=None):
    """Averaging-kernel rows (OEM diagnostics; m_oem.cc
    measurement_averaging_kernelCalc parity)."""
    A = np.asarray(A)
    y = np.arange(A.shape[0]) if grid is None else np.asarray(grid)
    fig, ax = _ax(ax)
    for i in range(A.shape[0]):
        ax.plot(A[i], y, lw=0.8)
    ax.plot(A.sum(axis=1), y, "k--", label="measurement response")
    ax.set_xlabel("Averaging kernel")
    ax.set_ylabel("State index" if grid is None else "Grid")
    ax.legend()
    return fig, ax


def retrieval_result(x_a, x, grid=None, sigma=None, ax=None):
    """Retrieved state vs prior with optional 1-sigma shading."""
    x_a, x = np.asarray(x_a), np.asarray(x)
    y = np.arange(x.size) if grid is None else np.asarray(grid)
    fig, ax = _ax(ax)
    ax.plot(x_a, y, label="prior $x_a$")
    ax.plot(x, y, label="retrieved $x$")
    if sigma is not None:
        ax.fill_betweenx(y, x - np.asarray(sigma), x + np.asarray(sigma),
                         alpha=0.2)
    ax.set_ylabel("State index" if grid is None else "Grid")
    ax.legend()
    return fig, ax


def sensor_response(f_grid, weights, ax=None, label=None):
    """Channel response weights over frequency (ArrayOfSensorObsel.py
    parity; weights: [F] dense or per-channel list)."""
    fig, ax = _ax(ax)
    f = np.asarray(f_grid) / 1e9
    ws = weights if isinstance(weights, (list, tuple)) else [weights]
    for i, w in enumerate(ws):
        ax.plot(f, np.asarray(w), label=f"channel {i}" if label is None else label)
    ax.set_xlabel("Frequency [GHz]")
    ax.set_ylabel("Response weight")
    ax.legend(fontsize="x-small")
    return fig, ax


def ppath(path_alt, path_dist=None, ax=None):
    """Propagation-path altitude against along-path distance
    (ArrayOfPropagationPathPoint.py parity)."""
    alt = np.asarray(path_alt)
    x = (np.arange(alt.size) if path_dist is None
         else np.concatenate([[0.0], np.cumsum(np.asarray(path_dist))]))
    fig, ax = _ax(ax)
    ax.plot(x / 1e3 if path_dist is not None else x, alt / 1e3)
    ax.set_xlabel("Distance [km]" if path_dist is not None else "Path point")
    ax.set_ylabel("Altitude [km]")
    return fig, ax


def catalog_lines(cat, ax=None):
    """Stick spectrum of a line catalog: strength proxy vs line center
    (AbsorptionBands.py parity)."""
    fig, ax = _ax(ax)
    f0 = np.asarray(cat.f0)
    s = np.abs(np.asarray(cat.a if hasattr(cat, "a") else cat.s0))
    s = np.where(s > 0, s, np.nan)
    ax.vlines(f0 / 1e9, 0.0, s)
    ax.set_yscale("log")
    ax.set_xlabel("Line center [GHz]")
    ax.set_ylabel("Line strength (A or S)")
    return fig, ax


def cia_spectrum(f_grid, xsec, temps=None, ax=None):
    """CIA cross sections vs frequency per temperature (CIARecord.py
    parity). xsec: [T, F] or [F]."""
    xs = np.atleast_2d(np.asarray(xsec))
    fig, ax = _ax(ax)
    f = np.asarray(f_grid) / 1e9
    for i, row in enumerate(xs):
        lbl = None if temps is None else f"{np.asarray(temps)[i]:.0f} K"
        ax.semilogy(f, row, label=lbl)
    ax.set_xlabel("Frequency [GHz]")
    ax.set_ylabel("CIA cross section [m$^5$]")
    if temps is not None:
        ax.legend()
    return fig, ax


def sun_spectrum(f_grid, spectrum, ax=None):
    """Solar source spectrum (Sun.py parity)."""
    fig, ax = _ax(ax)
    ax.loglog(np.asarray(f_grid), np.asarray(spectrum))
    ax.set_xlabel("Frequency [Hz]")
    ax.set_ylabel("Solar spectral radiance")
    return fig, ax


def transmittance_spectrum(f_grid, T, ax=None, label=None):
    """Path transmittance spectrum (MuelmatVector.py parity: the (0,0)
    element if a Mueller stack is passed)."""
    T = np.asarray(T)
    while T.ndim > 1:  # [F, 4, 4] Mueller stack -> (0,0) element
        T = T[..., 0]
    fig, ax = _ax(ax)
    ax.plot(np.asarray(f_grid) / 1e9, T, label=label)
    ax.set_ylim(-0.05, 1.05)
    ax.set_xlabel("Frequency [GHz]")
    ax.set_ylabel("Transmittance")
    if label:
        ax.legend()
    return fig, ax
