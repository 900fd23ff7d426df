"""Fused Pallas DISORT path (disort/fused_kernel.py) vs the XLA path.

Runs the fused three-kernel solve in interpret mode on CPU against the
plain XLA solve on identical cdisort-golden configurations — covering
thermal-only (1 Fourier mode), beam (16 modes), surface albedo, and
isotropic-top illumination.  The compiled-on-TPU artifact is separately
guarded by bench.py (disort_fused_vs_xla_maxdiff).
"""

import numpy as np
import pytest

import arts_tpu.disort.solver as solver_mod
from test_disort import golden_case, run_case


@pytest.fixture
def force_fused(monkeypatch):
    monkeypatch.setattr(solver_mod, "_FORCE_FUSED_INTERPRET", True)
    solver_mod.disort.clear_cache()
    yield
    solver_mod.disort.clear_cache()


def _run(name, nfourier=None):
    c = golden_case(name)
    out = run_case(c, nfourier=nfourier)
    return {
        "flux_up": np.asarray(out.flux_up),
        "flux_down": np.asarray(out.flux_down_diffuse),
        "u0": np.asarray(out.u0),
        "u": np.asarray(out.u),
    }


@pytest.mark.parametrize(
    "name",
    [
        "thermal_abs",        # thermal emission, absorption only, M=1
        "thermal_scat",       # thermal + scattering
        "hg_beam",            # solar beam, HG phase, 16 Fourier modes
        "thermal_beam_albedo",  # beam + thermal + Lambertian albedo
        "iso_isotropic_top",  # isotropic top illumination
        "hapke_beam",         # BRDF surface through the Rsurf/rhs inputs
    ],
)
def test_fused_matches_xla(name, force_fused, monkeypatch):
    fused = _run(name)
    monkeypatch.setattr(solver_mod, "_FORCE_FUSED_INTERPRET", False)
    solver_mod.disort.clear_cache()
    ref = _run(name)
    for key in ("flux_up", "flux_down", "u0", "u"):
        scale = max(np.abs(ref[key]).max(), 1e-12)
        np.testing.assert_allclose(
            fused[key], ref[key], rtol=2e-5, atol=2e-5 * scale,
            err_msg=f"{name}:{key}",
        )


def test_fused_vmap_batches_into_lanes(force_fused):
    """vmap over frequency collapses into the kernel lane axis and equals
    the per-frequency solve."""
    import jax
    import jax.numpy as jnp

    from arts_tpu.disort import DisortInput, disort

    L = 7
    rng = np.random.default_rng(3)
    B = 3

    def make(i):
        tau = jnp.asarray(rng.uniform(0.05, 0.5, L).astype(np.float32))
        om = jnp.asarray(rng.uniform(0.1, 0.8, L).astype(np.float32))
        g = 0.5
        leg = jnp.asarray(
            (g ** np.arange(8))[None, :] * np.ones((L, 1)), jnp.float32
        )
        return DisortInput(
            tau=tau,
            omega=om,
            leg=leg,
            f=jnp.zeros(L, jnp.float32),
            b_levels=jnp.asarray(
                np.linspace(1.0, 2.0, L + 1).astype(np.float32) * (1.0 + i)
            ),
            fbeam=jnp.float32(0.0),
            fisot=jnp.float32(0.1 * (i + 1)),
            albedo=jnp.float32(0.3),
            b_surf=jnp.float32(2.5),
            b_top=jnp.float32(0.01),
        )

    inps = [make(i) for i in range(B)]
    batch = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *inps)

    run = lambda i: disort(i, nquad=8, nfourier=1, fast_linalg=False)
    out_b = jax.vmap(run)(batch)
    for i in range(B):
        out_i = run(inps[i])
        np.testing.assert_allclose(
            np.asarray(out_b.flux_up[i]), np.asarray(out_i.flux_up),
            rtol=1e-5, atol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(out_b.u0[i]), np.asarray(out_i.u0),
            rtol=1e-5, atol=1e-6,
        )
