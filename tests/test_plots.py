"""Smoke tests for the per-type quick-look plotters (headless Agg).

Mirrors the reference's pyarts3.plots coverage (one plotter per value
type); each test drives a plotter with framework-shaped data and checks
a figure with artists comes back.
"""

import matplotlib

matplotlib.use("Agg", force=True)

import numpy as np
import pytest

from arts_tpu import plots


@pytest.fixture()
def fgrid():
    return np.linspace(1e9, 100e9, 64)


def _close(fig):
    import matplotlib.pyplot as plt

    plt.close(fig)


def test_spectral_and_absorption_and_tb(fgrid):
    fig, ax = plots.spectral_radiance(fgrid, np.random.rand(64))
    assert ax.lines
    _close(fig)
    fig, ax = plots.absorption_spectrum(fgrid, np.random.rand(64) + 1e-9)
    assert ax.lines
    _close(fig)
    fig, ax = plots.brightness_temperature(fgrid, 1e-15 * np.ones(64))
    assert ax.lines
    _close(fig)


def test_propmat_and_stokes(fgrid):
    k = np.zeros((64, 7))
    k[:, 0] = 1.0
    k[:, 4] = 0.1
    fig, axs = plots.propmat_spectrum(fgrid, k)
    assert len(axs) == 2  # only nonzero components plotted
    _close(fig)
    fig, axs = plots.stokes_spectrum(fgrid, np.random.rand(64, 4))
    assert len(axs) == 4
    _close(fig)


def test_disort_and_flux():
    fig, ax = plots.disort_radiance(
        np.linspace(-1, 1, 8), np.arange(11), np.random.rand(11, 8)
    )
    assert ax.collections
    _close(fig)
    fig, ax = plots.flux_profile(np.linspace(0, 8e4, 11),
                                 np.random.rand(11), np.random.rand(11))
    assert len(ax.lines) == 2
    _close(fig)


def test_atm_profiles():
    from arts_tpu.atm.standard import standard_atmosphere

    atm = standard_atmosphere(n_levels=20, z_top=8e4, species=("H2O", "O2"))
    fig, axs = plots.atm_profiles(atm)
    assert len(axs) >= 3
    _close(fig)


def test_retrieval_diagnostics(fgrid):
    fig, ax = plots.jacobian_rows(fgrid, np.random.rand(64, 5))
    assert len(ax.lines) == 5
    _close(fig)
    fig, ax = plots.averaging_kernel(np.eye(6) * 0.8)
    assert len(ax.lines) == 7  # 6 rows + measurement response
    _close(fig)
    fig, ax = plots.retrieval_result(np.ones(6), 1.1 * np.ones(6),
                                     sigma=0.1 * np.ones(6))
    assert len(ax.lines) == 2
    _close(fig)


def test_sensor_path_catalog_cia_sun_transmittance(fgrid):
    fig, ax = plots.sensor_response(fgrid, [np.random.rand(64)] * 2)
    assert len(ax.lines) == 2
    _close(fig)
    fig, ax = plots.ppath(np.linspace(8e5, 0, 30), np.full(29, 1e4))
    assert ax.lines
    _close(fig)

    class Cat:
        f0 = np.linspace(2e9, 90e9, 10)
        a = np.random.rand(10) * 1e-6

    fig, ax = plots.catalog_lines(Cat())
    assert ax.collections
    _close(fig)
    fig, ax = plots.cia_spectrum(fgrid, np.random.rand(3, 64) + 1e-12,
                                 temps=[200.0, 250.0, 300.0])
    assert len(ax.lines) == 3
    _close(fig)
    fig, ax = plots.sun_spectrum(fgrid, np.random.rand(64) + 1e-12)
    assert ax.lines
    _close(fig)
    T = np.random.rand(64, 4, 4)
    fig, ax = plots.transmittance_spectrum(fgrid, T)
    assert ax.lines
    _close(fig)
