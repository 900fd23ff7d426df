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
                    fast_linalg: bool = False, **kw):
    """DISORT-background observer: ONE radiation-field solve per
    (scene, f_grid) group, interpolated to each geometry's viewing angle
    (the reference's disort_spectral_rad_field + interpolating observer,
    m_disort.cc:37-47 + workspace_agendas.cpp:165).

    level: "toa" (satellite view, upwelling at level 0) or "surface"
    (ground view, downwelling at the bottom level).  The viewing angle is
    each geometry's FIRST path-point zenith angle; the radiance arriving
    from direction za propagates with mu = -cos(za).
    """
    from ..fwd_allsky import simulate_allsky

    def run(scene, f_grid, alts, drs, zas, background):
        out = simulate_allsky(
            scene, f_grid, nquad=nquad, nfourier=nfourier,
            fast_linalg=fast_linalg, **kw
        )
        lvl = 0 if level == "toa" else -1
        u_lvl = out.u0[:, lvl, :]  # [F, NQuad], mu ascending
        mu_grid = jnp.asarray(out.mu)
        if mu_grid.ndim == 2:  # vmapped-over-frequency solve duplicates mu
            mu_grid = mu_grid[0]
        mu_v = -jnp.cos(jnp.deg2rad(zas[:, 0]))  # [G]

        def at_mu(mu):
            return jax.vmap(lambda row: jnp.interp(mu, mu_grid, row))(u_lvl)

        return jax.vmap(at_mu)(mu_v)  # [G, F]

    return run
