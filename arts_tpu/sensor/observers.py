"""Observer operators for the measurement pipeline.

Parity: the reference's `spectral_rad_observer_agenda`
(/root/reference/src/workspace_agendas.cpp:165) — the pluggable
per-simulation radiance operator that `measurement_vecFromSensor`
(m_rad.cc:406-467) executes per deduped (f_grid, poslos) group.  Here an
observer is a plain function over a stacked geometry batch:

    observer(scene, f_grid, alts [G, NP], drs [G, NP-1], zas [G, NP],
             background) -> I [G, F]

so sensor/measurement.py composes scalar clearsky, polarized (Zeeman)
and DISORT-background observers through one dedup + contraction path.
"""

import jax
import jax.numpy as jnp


def clearsky_observer(**kw):
    """Scalar clear-sky emission observer (the default)."""
    from ..fwd import simulate_clearsky

    def run(scene, f_grid, alts, drs, zas, background):
        sim = jax.vmap(
            lambda a, d, z: simulate_clearsky(
                scene, f_grid, a, d, background=background, path_za=z, **kw
            )
        )
        return sim(alts, drs, zas)

    return run


def clearsky_observer_cached(
    backend: str = "xla", block: int = 256, rte_option: str = "constant",
    lbl_tuning: tuple | None = None,
):
    """Level-cached scalar clear-sky observer for many-geometry batches.

    Computes gas absorption ONCE on the scene's level grid (optionally
    with the Pallas LBL kernel) and interpolates it per path point, so
    the LBL cost is independent of the geometry count — the TPU form of
    the reference's per-path-point cache (fwd_spectral_radiance.h:40-85)
    that its HighPerf measurement kernel (m_rad.cc:380-467) relies on.
    Exact vs clearsky_observer when path points sit on level altitudes;
    O(dz^2) between levels.  Not for wind (Doppler) scenes."""
    from ..fwd import gas_absorption_levels, simulate_clearsky_from_levels

    # identity-keyed memo: a mixed-background batch makes _simulate_batch
    # call run() once per background group with the SAME (scene, f_grid)
    # — without the memo each group would re-run the whole level-grid
    # LBL sweep.  Under an outer jit trace the memo is bypassed (caching
    # a tracer across traces would be invalid; XLA CSE dedups identical
    # subgraphs within one trace); the strong refs in the memo keep the
    # keyed objects alive so their ids cannot be reused.
    memo = {}

    def run(scene, f_grid, alts, drs, zas, background):
        traced = any(
            isinstance(x, jax.core.Tracer)
            for x in jax.tree_util.tree_leaves((scene, f_grid))
        )
        compute = lambda: gas_absorption_levels(
            scene, f_grid, block=block, backend=backend,
            lbl_tuning=lbl_tuning,
        )
        if traced:
            k_lvl = compute()
        else:
            key = (id(scene), id(f_grid))
            if memo.get("key") != key:
                memo.update(key=key, ref=(scene, f_grid), k=compute())
            k_lvl = memo["k"]
        sim = jax.vmap(
            lambda a, d: simulate_clearsky_from_levels(
                k_lvl, scene, f_grid, a, d, background=background,
                rte_option=rte_option,
            )
        )
        return sim(alts, drs)

    return run


def polarized_observer(component: int = 0, **kw):
    """Polarized (Zeeman) observer; the measurement vector takes one
    Stokes component (pass component=None for the full [G, F, 4] field,
    e.g. for custom contractions)."""
    from ..fwd import simulate_clearsky_polarized

    def run(scene, f_grid, alts, drs, zas, background):
        sim = jax.vmap(
            lambda a, z, d: simulate_clearsky_polarized(
                scene, f_grid, a, z, d, background=background, **kw
            )
        )
        I = sim(alts, zas, drs)
        return I if component is None else I[..., component]

    return run


def allsky_observer(nquad: int = 16, nfourier: int = 1, level: str = "toa",
                    fast_linalg: bool | None = None, **kw):
    """DISORT-background observer: ONE radiation-field solve per
    (scene, f_grid) group, interpolated to each geometry's viewing angle
    (the reference's disort_spectral_rad_field + interpolating observer,
    m_disort.cc:37-47 + workspace_agendas.cpp:165).

    level: "toa" (satellite view, upwelling at level 0) or "surface"
    (ground view, downwelling at the bottom level).  The viewing angle is
    each geometry's FIRST path-point zenith angle; the radiance arriving
    from direction za propagates with mu = -cos(za).

    Azimuth resolution (the reference's `spectral_radFromDisort`
    interpolating the full azimuth-resolved, TMS/IMS-corrected field,
    src/m_disort.cc:91 + disort.h:246-330): with a solar beam present
    (fbeam != 0) and nfourier > 1, the solve synthesizes the Fourier
    series at every geometry's line-of-sight azimuth (plus the TMS/IMS
    single-scatter correction) and each geometry reads u at its own
    (mu, phi) instead of the azimuth average u0.  Thermal-only fields
    (nfourier == 1) are azimuth-symmetric, so u0 remains exact there.
    """
    import numpy as np

    from ..fwd_allsky import simulate_allsky

    beam_on = float(np.max(np.abs(np.asarray(kw.get("fbeam", 0.0))))) != 0.0
    resolved = beam_on and (nfourier is None or nfourier > 1)

    def run(scene, f_grid, alts, drs, zas, background, aas=None):
        lvl = 0 if level == "toa" else -1
        mu_v = -jnp.cos(jnp.deg2rad(zas[:, 0]))  # [G]

        if resolved and aas is not None:
            # static azimuth set for the Fourier synthesis: the unique
            # line-of-sight azimuths of this geometry group (host-side,
            # like the reference's per-ray-point field interpolation)
            aa0 = np.round(np.asarray(aas), 6)
            phis = tuple(np.unique(aa0).tolist())
            pidx = jnp.asarray([phis.index(a) for a in aa0.tolist()])
            out = simulate_allsky(
                scene, f_grid, nquad=nquad, nfourier=nfourier,
                fast_linalg=fast_linalg, phis=phis,
                intensity_correction=True, **kw,
            )
            u = out.u[:, lvl, :, :]  # [F, NQuad, nphi]
            mu_grid = jnp.asarray(out.mu)
            if mu_grid.ndim == 2:
                mu_grid = mu_grid[0]

            def at_geo(mu, pi):
                rows = u[:, :, pi]  # [F, NQuad]
                return jax.vmap(lambda row: jnp.interp(mu, mu_grid, row))(
                    rows
                )

            return jax.vmap(at_geo)(mu_v, pidx)  # [G, F]

        out = simulate_allsky(
            scene, f_grid, nquad=nquad, nfourier=nfourier,
            fast_linalg=fast_linalg, **kw
        )
        u_lvl = out.u0[:, lvl, :]  # [F, NQuad], mu ascending
        mu_grid = jnp.asarray(out.mu)
        if mu_grid.ndim == 2:  # vmapped-over-frequency solve duplicates mu
            mu_grid = mu_grid[0]

        def at_mu(mu):
            return jax.vmap(lambda row: jnp.interp(mu, mu_grid, row))(u_lvl)

        return jax.vmap(at_mu)(mu_v)  # [G, F]

    run.wants_azimuth = resolved
    return run
