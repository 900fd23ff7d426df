"""Plotting helpers (headless-safe).

Parity reference: python/src/pyarts3/plots/ — per-type quick-look plotters
(spectral radiance, flux profiles, absorption spectra).  Minimal matplotlib
wrappers; all functions accept/return (fig, ax) and never call show().
"""

import numpy as np


def _ax(ax=None):
    import matplotlib

    matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt

    if ax is None:
        fig, ax = plt.subplots()
    else:
        fig = ax.figure
    return fig, ax


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
    """Upwelling/downwelling flux against altitude (AtmosphericFlux plots)."""
    fig, ax = _ax(ax)
    ax.plot(np.asarray(up), np.asarray(altitude) / 1e3, label="up")
    ax.plot(np.asarray(down), np.asarray(altitude) / 1e3, label="down")
    ax.set_xlabel("Flux [W m$^{-2}$]")
    ax.set_ylabel("Altitude [km]")
    ax.legend()
    return fig, ax


def atm_profiles(atm, ax=None):
    """Temperature profile quick look for an Atmosphere1D."""
    fig, ax = _ax(ax)
    ax.plot(np.asarray(atm.t), np.asarray(atm.z) / 1e3)
    ax.set_xlabel("Temperature [K]")
    ax.set_ylabel("Altitude [km]")
    return fig, ax
