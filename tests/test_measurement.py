"""Measurement-vector pipeline tests (m_rad.cc HighPerf parity) and line
filtering utilities."""

import numpy as np

import jax.numpy as jnp

from arts_tpu.lbl.catalog import hitran_s, keep_strongest
from arts_tpu.path import geometric_path_1d
from arts_tpu.retrieval import StateMapping
from arts_tpu.sensor import gaussian_channels
from arts_tpu.sensor.measurement import (
    measurement_jacobian,
    measurement_vector,
    stack_paths,
)
from tests.test_clearsky import F_GRID, SCENE
from tests.test_oem import vmr_targets


def make_paths():
    return [
        geometric_path_1d(100e3, 180.0, 0.0, 80e3, 3000.0),
        geometric_path_1d(100e3, 160.0, 0.0, 80e3, 3000.0),
        geometric_path_1d(100e3, 140.0, 0.0, 80e3, 3000.0),
    ]


def test_stack_paths_padding_is_noop():
    paths = make_paths()
    alts, drs, zas, bgs = stack_paths(paths)
    assert alts.shape[0] == 3 and bgs == ["surface"] * 3
    assert zas.shape == alts.shape
    # padded rows end with zero-length segments
    n0 = paths[0].n_points
    assert np.all(np.asarray(drs)[0, n0 - 1 :] == 0.0)


def test_measurement_vector_multi_geometry():
    paths = make_paths()
    f = jnp.asarray(np.asarray(F_GRID)[::10])
    centers = np.linspace(175e9, 235e9, 7)
    sensor = gaussian_channels(
        np.asarray(f), centers=np.tile(centers, 3), fwhm=3e9,
        geo_idx=np.repeat(np.arange(3), 7),
    )
    y = measurement_vector(SCENE, sensor, f, paths)
    y = np.asarray(y)
    assert y.shape == (21,)
    assert np.all(np.isfinite(y)) and np.all(y > 0)
    # slant paths are optically longer -> window channels dimmer-or-equal
    # than nadir at the same frequency (colder emission level)
    y0, y2 = y[:7], y[14:]
    assert np.all(y2 <= y0 * 1.02)


def test_measurement_jacobian_shapes():
    paths = make_paths()[:2]
    f = jnp.asarray(np.asarray(F_GRID)[::20])
    sensor = gaussian_channels(
        np.asarray(f), centers=np.tile(np.linspace(180e9, 230e9, 4), 2),
        fwhm=4e9, geo_idx=np.repeat(np.arange(2), 4),
    )
    mapping = StateMapping(targets=[vmr_targets()], ref_scene=SCENE)
    y, K = measurement_jacobian(SCENE, sensor, f, paths, mapping)
    assert y.shape == (8,)
    assert K.shape == (8, mapping.n_state)
    assert np.all(np.isfinite(np.asarray(K)))
    assert np.abs(np.asarray(K)).max() > 0


def test_keep_strongest():
    s = hitran_s(SCENE.cat, 174.6)
    assert s.shape == (SCENE.cat.n_lines,) and np.all(s > 0)
    cat2 = keep_strongest(SCENE.cat, 174.6, 50.0)
    assert cat2.n_lines <= SCENE.cat.n_lines
    assert cat2.n_lines >= 1


def test_gaussian_zenith_channels():
    from arts_tpu.sensor.obsel import gaussian_zenith_channels

    dzen = np.linspace(-1.0, 1.0, 9)
    sa = gaussian_zenith_channels(dzen, std_zen=0.5, n_freq=3)
    # I[geo, freq] with a linear zenith dependence: the symmetric Gaussian
    # average must recover the center value exactly
    I = jnp.asarray(
        np.broadcast_to(dzen[:, None], (9, 3)) * 2.0
        + np.asarray([10.0, 20.0, 30.0])
    )
    y = np.asarray(sa.apply(I))
    np.testing.assert_allclose(y, [10.0, 20.0, 30.0], rtol=1e-12)


def test_camera_channels():
    from arts_tpu.sensor.obsel import camera_channels, camera_pixels

    pix = camera_pixels(3, 4, ccd_h=0.01, ccd_w=0.02,
                        focal_length=0.05, focus_distance=10.0)
    assert pix.shape == (12, 2)
    # antisymmetry of the pixel grid (lens inversion): top row mirrors
    # bottom row in zenith, left column mirrors right column in azimuth
    zen = pix[:, 0].reshape(3, 4)
    azi = pix[:, 1].reshape(3, 4)
    np.testing.assert_allclose(zen, -zen[::-1, :], atol=1e-12)
    np.testing.assert_allclose(azi, -azi[:, ::-1], atol=1e-12)
    np.testing.assert_allclose(zen[1], 0.0, atol=1e-12)  # odd row count
    # image distance sanity: offsets shrink when focal length shrinks
    pix2 = camera_pixels(3, 4, 0.01, 0.02, 0.01, 10.0)
    assert np.abs(pix2[:, 0]).max() > np.abs(pix[:, 0]).max()

    sa = camera_channels(3, 4, n_freq=2)
    I = jnp.asarray(np.arange(24, dtype=np.float64).reshape(12, 2))
    y = np.asarray(sa.apply(I))
    np.testing.assert_allclose(y, np.arange(24.0), rtol=1e-15)


def test_collect_simulations_dedup():
    """Shared (f_grid, paths) dedup by identity AND by value
    (m_rad.cc:385-400 pointer-cache parity)."""
    from arts_tpu.sensor.measurement import Obsel, collect_simulations

    paths = tuple(make_paths())
    f1 = F_GRID
    f2 = jnp.array(np.asarray(F_GRID))  # equal by value, distinct object
    s = gaussian_channels(
        np.asarray(F_GRID), centers=np.linspace(180e9, 230e9, 5), fwhm=2e9
    )
    obsels = [
        Obsel(sensor=s, f_grid=f1, paths=paths),          # group 0
        Obsel(sensor=s, f_grid=f1, paths=paths),          # identity dup
        Obsel(sensor=s, f_grid=f2, paths=tuple(make_paths())),  # value dup
        Obsel(sensor=s, f_grid=f1[:32], paths=paths),     # new group
    ]
    groups, o2g = collect_simulations(obsels)
    assert len(groups) == 2
    assert o2g == [0, 0, 0, 1]


def test_measurement_vector_from_obsels_matches_per_obsel():
    from arts_tpu.sensor.measurement import (
        Obsel,
        measurement_vector,
        measurement_vector_from_obsels,
    )

    paths = tuple(make_paths())
    s1 = gaussian_channels(
        np.asarray(F_GRID), centers=np.linspace(180e9, 230e9, 5), fwhm=2e9
    )
    s2 = gaussian_channels(
        np.asarray(F_GRID), centers=np.linspace(175e9, 235e9, 7), fwhm=3e9,
        geo_idx=1,
    )
    obsels = [
        Obsel(sensor=s1, f_grid=F_GRID, paths=paths),
        Obsel(sensor=s2, f_grid=F_GRID, paths=paths),
    ]
    y, n_groups = measurement_vector_from_obsels(SCENE, obsels)
    assert n_groups == 1  # one shared simulation batch for both obsels
    y1 = measurement_vector(SCENE, s1, F_GRID, list(paths))
    y2 = measurement_vector(SCENE, s2, F_GRID, list(paths))
    np.testing.assert_allclose(
        np.asarray(y), np.concatenate([np.asarray(y1), np.asarray(y2)]),
        rtol=1e-12,
    )


def test_mixed_background_batch_splits():
    """A geometry batch mixing surface-ending and space-ending paths is
    split per background instead of asserting (the reference splits
    simulations by observer agenda)."""
    from arts_tpu.fwd import simulate_clearsky
    from arts_tpu.sensor import raw_channels
    from arts_tpu.sensor.measurement import measurement_vector, stack_paths

    paths = [
        geometric_path_1d(100e3, 180.0, 0.0, 80e3, 3000.0),   # surface
        geometric_path_1d(0.0, 0.0, 0.0, 80e3, 3000.0),       # upward: space
    ]
    assert {p.background for p in paths} == {"surface", "space"}
    f = F_GRID[:16]
    s = raw_channels(16, geo_idx=0)
    y = measurement_vector(SCENE, s, f, paths)
    alts, drs, _, _ = stack_paths(paths)
    I0 = simulate_clearsky(SCENE, f, alts[0], drs[0], background="surface")
    np.testing.assert_allclose(np.asarray(y), np.asarray(I0), rtol=1e-12)
    s2 = raw_channels(16, geo_idx=1)
    y2 = measurement_vector(SCENE, s2, f, paths)
    I1 = simulate_clearsky(SCENE, f, alts[1], drs[1], background="space")
    np.testing.assert_allclose(np.asarray(y2), np.asarray(I1), rtol=1e-12)


def test_polarized_observer_measurement_vector():
    """Polarized (Zeeman) obsels flow through the same dedup+contraction
    path as scalar ones (VERDICT r2 item 9; observer-agenda parity,
    workspace_agendas.cpp:165)."""
    import dataclasses
    import jax

    from arts_tpu.fwd import ZeemanScene, simulate_clearsky_polarized
    from arts_tpu.sensor.measurement import (
        Obsel,
        measurement_vector_from_obsels,
    )
    from arts_tpu.sensor.observers import polarized_observer
    from test_zeeman import ZCAT, PF, F as FZ

    atm = SCENE.atm
    mag = jnp.broadcast_to(
        jnp.asarray([10e-6, 0.0, 30e-6]), atm.z.shape + (3,)
    )
    zscene = ZeemanScene(
        atm=dataclasses.replace(atm, vmr=atm.vmr[:1], mag=mag),
        zcat=ZCAT,
        pf=PF,
    )
    paths = make_paths()[:2]
    f = FZ[::8]
    centers = np.linspace(float(f[2]), float(f[-3]), 5)
    sensor = gaussian_channels(
        np.asarray(f), centers=np.tile(centers, 2), fwhm=1e6,
        geo_idx=np.repeat(np.arange(2), 5),
    )
    obs = polarized_observer(component=0)
    y, ngroups = measurement_vector_from_obsels(
        zscene,
        [
            Obsel(sensor=sensor, f_grid=f, paths=tuple(paths),
                  observer=obs),
            Obsel(sensor=sensor, f_grid=f, paths=tuple(paths),
                  observer=obs),  # dedups with the first
        ],
    )
    assert ngroups == 1
    y = np.asarray(y)
    assert y.shape == (20,) and np.isfinite(y).all() and (y > 0).all()

    # equals the hand-composed polarized simulation + contraction
    alts, drs, zas, _ = stack_paths(paths)
    I = jax.vmap(
        lambda a, z, d: simulate_clearsky_polarized(
            zscene, f, a, z, d, background="surface"
        )
    )(alts, zas, drs)[..., 0]
    y_ref = np.asarray(sensor.apply(I))
    np.testing.assert_allclose(y[:10], y_ref, rtol=1e-6)
    np.testing.assert_allclose(y[10:], y_ref, rtol=1e-6)


def test_allsky_observer_camera():
    """A DISORT-background 'camera' obsel: one field solve feeds many
    viewing directions through the dedup+contraction path."""
    import jax

    from arts_tpu.fwd_allsky import AllskyScene, simulate_allsky
    from arts_tpu.scattering import HenyeyGreenstein
    from arts_tpu.sensor import raw_channels
    from arts_tpu.sensor.measurement import (
        Obsel,
        measurement_vector_from_obsels,
    )
    from arts_tpu.sensor.observers import allsky_observer

    atm = SCENE.atm
    cloud = HenyeyGreenstein(
        ext=jnp.where((atm.z > 2e3) & (atm.z < 6e3), 2e-4, 0.0),
        ssa=jnp.full(atm.z.shape, 0.8),
        g=jnp.full(atm.z.shape, 0.6),
    )
    ascene = AllskyScene(
        atm=atm, cat=SCENE.cat, pf=SCENE.pf, scatterers=(cloud,),
        surface_temperature=jnp.asarray(288.0),
    )
    f = jnp.asarray(np.asarray(F_GRID)[::20])
    zas = [180.0, 160.0, 140.0]  # satellite camera pixels
    paths = [geometric_path_1d(100e3, za, 0.0, 80e3, 5000.0) for za in zas]
    obs = allsky_observer(nquad=8, level="toa")
    obsels = [
        Obsel(sensor=raw_channels(f.shape[0], geo_idx=i), f_grid=f,
              paths=tuple(paths), observer=obs)
        for i in range(len(paths))
    ]
    y, ngroups = measurement_vector_from_obsels(ascene, obsels)
    assert ngroups == 1  # one DISORT field solve feeds all pixels
    y = np.asarray(y).reshape(len(paths), -1)
    assert np.isfinite(y).all() and (y > 0).all()

    # reference: direct u0 interpolation at the viewing cosines
    out = simulate_allsky(ascene, f, nquad=8, nfourier=1)
    mu_grid = np.asarray(out.mu)
    if mu_grid.ndim == 2:
        mu_grid = mu_grid[0]
    u_toa = np.asarray(out.u0[:, 0, :])
    for i, za in enumerate(zas):
        # the observer interpolates at the LOCAL zenith angle of the
        # first path point (TOA), not the observer's angle (spherical
        # geometry bends the LOS between 100 km and TOA)
        mu_v = -np.cos(np.deg2rad(paths[i].za[0]))
        ref = np.array(
            [np.interp(mu_v, mu_grid, u_toa[j]) for j in range(f.shape[0])]
        )
        np.testing.assert_allclose(y[i], ref, rtol=1e-6)


def test_allsky_observer_azimuth_resolved_sun():
    """Sun-present camera through the azimuth-resolved DISORT observer
    (VERDICT r4 item 5): with a solar beam and nfourier > 1, each
    geometry reads the Fourier-synthesized, TMS/IMS-corrected u at its
    own (mu, phi) — the reference's spectral_radFromDisort interpolation
    (src/m_disort.cc:91).  Radiance must vary with azimuth and match an
    independent single-scattering calculation (exact HG phase + Beer
    attenuation; the optically thin limit) within the multiple-scatter
    residual ~ omega tau."""
    import dataclasses as dc

    import arts_tpu.constants as const
    from arts_tpu.fwd_allsky import AllskyScene
    from arts_tpu.path.geometry import PathGeometry
    from arts_tpu.scattering import HenyeyGreenstein
    from arts_tpu.sensor.observers import allsky_observer
    from arts_tpu.sensor.measurement import (
        _simulate_batch,
        stack_azimuths,
        stack_paths,
    )
    from tests.test_clearsky import SCENE as CK

    # thin HG layer, no gas, no thermal: single scattering dominates
    z = np.asarray(CK.atm.z)
    g = 0.6
    dz = float(z[(z > 2e3) & (z < 6e3)].size * np.diff(z).mean())
    ext = np.where((z > 2e3) & (z < 6e3), 0.01 / dz, 0.0)
    # the optical depth the solver integrates (layer midpoints)
    tau_tot = float((0.5 * (ext[1:] + ext[:-1]) * np.diff(z)).sum())
    cloud = HenyeyGreenstein(
        ext=jnp.asarray(ext),
        ssa=jnp.full(z.shape, 0.5),
        g=jnp.full(z.shape, g),
    )
    scene = AllskyScene(
        atm=CK.atm, cat=None, pf=None, scatterers=(cloud,),
        surface_temperature=jnp.asarray(288.0),
    )
    f = jnp.asarray([220e9])
    mu0, fbeam, phi0 = 0.6, float(np.pi), 0.0

    # satellite camera: fixed oblique view, several azimuths
    za_look = 140.0  # looking down; propagation mu = -cos(za) = 0.766
    azimuths = [0.0, 60.0, 120.0, 180.0]
    paths = [
        PathGeometry(
            alt=np.asarray([80e3, 0.0]), s=np.asarray([0.0, 80e3]),
            za=np.asarray([za_look, za_look]), background="surface",
            aa=a,
        )
        for a in azimuths
    ]
    obs = allsky_observer(
        nquad=16, nfourier=16, nleg=32, mu0=mu0, fbeam=fbeam, phi0=phi0,
        thermal=False,
    )
    assert obs.wants_azimuth
    alts, drs, zas, bgs = stack_paths(paths)
    I = np.asarray(
        _simulate_batch(scene, f, alts, drs, zas, ["surface"] * len(paths),
                        observer=obs, aas=stack_azimuths(paths))
    )[:, 0]

    # independent single-scattering cross-check (test_tms conventions:
    # cos Theta = -mu mu0 + sqrt((1-mu^2)(1-mu0^2)) cos(phi - phi0))
    mu = -np.cos(np.deg2rad(za_look))
    omega = 0.5
    a_sum = 1.0 / mu + 1.0 / mu0
    expect = []
    for aa in azimuths:
        ct = -mu * mu0 + np.sqrt((1 - mu**2) * (1 - mu0**2)) * np.cos(
            np.deg2rad(aa - phi0)
        )
        phase = (1 - g**2) / (1 + g**2 - 2 * g * ct) ** 1.5
        expect.append(
            omega * phase * fbeam / (4 * np.pi * (1 + mu / mu0))
            * (1 - np.exp(-tau_tot * a_sum))
        )
    expect = np.asarray(expect)
    # azimuth variation present and matching the phase function shape
    assert I.std() / I.mean() > 0.1
    np.testing.assert_allclose(I, expect, rtol=0.05)


def test_cached_observer_matches_direct():
    """clearsky_observer_cached (one level-grid LBL evaluation shared by
    all geometries) equals the direct per-path-point observer exactly on
    level-aligned paths, and to O(dz^2) on generic geometric paths."""
    import jax

    from arts_tpu.sensor.observers import (
        clearsky_observer,
        clearsky_observer_cached,
    )

    f = jnp.asarray(np.asarray(F_GRID)[::10])

    # level-aligned paths (downlooking + uplooking over the atm grid)
    z = SCENE.atm.z
    alts = jnp.stack([z[::-1], z])
    drs = jnp.stack([-jnp.diff(z[::-1]), jnp.diff(z)])
    zas = jnp.zeros_like(alts)
    direct = clearsky_observer()
    cached = clearsky_observer_cached()
    I_dir = np.asarray(direct(SCENE, f, alts, drs, zas, "surface"))
    I_cch = np.asarray(cached(SCENE, f, alts, drs, zas, "surface"))
    np.testing.assert_allclose(I_cch, I_dir, rtol=1e-12)

    # generic slant paths: interpolated-k error stays small
    paths = make_paths()
    alts, drs, zas, _ = stack_paths(paths)
    I_dir = np.asarray(direct(SCENE, f, alts, drs, zas, "surface"))
    I_cch = np.asarray(cached(SCENE, f, alts, drs, zas, "surface"))
    np.testing.assert_allclose(I_cch, I_dir, rtol=2e-3)

    # Jacobian flows through the cache: dy/d(T profile) is finite and
    # close to the direct observer's.  The two differ at O(dz) in the
    # CHAIN (cached: d[interp k]/dT evaluates dk/dT at the levels;
    # direct: at the interpolated point), so ~10% of scale on this
    # 1.6 km grid is the expected discretization gap, not a wiring bug
    import dataclasses

    def y_of_t(obs, tprof):
        sc = dataclasses.replace(
            SCENE, atm=dataclasses.replace(SCENE.atm, t=tprof)
        )
        return obs(sc, f, alts, drs, zas, "surface").sum(0)

    g_dir = np.asarray(
        jax.jacrev(lambda t: y_of_t(direct, t))(SCENE.atm.t)
    )
    g_cch = np.asarray(
        jax.jacrev(lambda t: y_of_t(cached, t))(SCENE.atm.t)
    )
    scale = np.abs(g_dir).max()
    assert np.isfinite(g_cch).all()
    np.testing.assert_allclose(g_cch, g_dir, rtol=0.0, atol=0.12 * scale)
