"""Layer-discretization (rte_option) tests.

Mirrors /root/reference/tests/core/linsrc/test_linsrc_convergence.py: the
three discretizations (constant, lintau/linsrc, linprop) must converge to
the same radiance as the path is refined, with the higher-order forms
converging from below (the reference asserts lin/lin[0] >= linsrc ratio
and >= linprop ratio elementwise).

Also validates the linprop Dawson-function layer weight against brute-force
quadrature of the exact integral (rtepack_transmission.cc:449-474).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from arts_tpu.ops.planck import planck
from arts_tpu.rtepack.emission import (
    emission_polarized,
    emission_polarized_linsrc,
    emission_unpolarized,
    emission_unpolarized_linprop,
    emission_unpolarized_linsrc,
)


def _run(fn, N, k_profile, scl=1.0):
    # constant-k layer stack, T linear 200 -> 300 K, single frequency
    f = jnp.asarray([100e9])
    k = jnp.asarray(k_profile(N))[:, None] * jnp.ones((1, 1))
    T = jnp.linspace(200.0, 300.0, N)
    J = planck(f[None, :], T[:, None])
    r = jnp.full((N - 1,), scl)
    I0 = planck(f, jnp.asarray(300.0))  # surface blackbody at far end
    return np.asarray(fn(k, J, r, I0))[0]


@pytest.mark.parametrize(
    "k_profile",
    [lambda n: np.full(n, 1e-2), lambda n: np.linspace(1e-2, 1e-4, n)],
    ids=["constant-k", "graded-k"],
)
def test_discretization_convergence(k_profile):
    results = {"constant": [], "lintau": [], "linprop": []}
    N, scl = 2**12, 1.0
    total = 2**12  # fixed total path length
    while N >= 4:
        fns = {
            "constant": emission_unpolarized,
            "lintau": emission_unpolarized_linsrc,
            "linprop": emission_unpolarized_linprop,
        }
        for name, fn in fns.items():
            results[name].append(_run(fn, N, k_profile, scl=total / (N - 1)))
        N //= 2

    const = np.array(results["constant"])
    lin = np.array(results["lintau"])
    linp = np.array(results["linprop"])

    # all three agree at the finest resolution
    assert abs(lin[0] - const[0]) / const[0] < 1e-5
    assert abs(linp[0] - const[0]) / const[0] < 1e-5
    # reference assertion: the constant form drifts at least as much as
    # the linear-source forms as the grid coarsens
    assert np.all(const / const[0] >= lin / lin[0] - 1e-12)
    assert np.all(const / const[0] >= linp / linp[0] - 1e-12)
    # higher-order forms stay much closer to the converged value on the
    # coarsest grid
    assert abs(lin[-1] / lin[0] - 1.0) < abs(const[-1] / const[0] - 1.0)


def test_linprop_weight_vs_quadrature():
    """L = (D(u1) - T D(u0))/(r alpha) == int_0^r e^{-(k1 s + a2 s^2)} K(s) s/r ds + T."""
    rng = np.random.default_rng(3)
    for it in range(16):
        k1 = rng.uniform(1e-4, 1e-1)
        ratio = rng.uniform(1.2, 8.0)
        # alternate increasing / decreasing absorption toward the far end
        k2 = k1 * ratio if it % 2 == 0 else k1 / ratio
        r = rng.uniform(10.0, 3e3)

        s = np.linspace(0.0, r, 200001)
        K = k1 + (k2 - k1) * s / r
        att = np.exp(-(k1 * s + (k2 - k1) / (2 * r) * s**2))
        W = np.trapezoid(att * K * s / r, s)
        T = np.exp(-0.5 * (k1 + k2) * r)
        L_ref = W + T

        k = jnp.asarray([[k1], [k2]], dtype=jnp.float64)
        J0, J1 = 1.0, 0.0  # I = T(I-J0) + L(J0-J1) + J1 with I_far = 0 -> L - T*1
        J = jnp.asarray([[J1], [J0]])
        out = emission_unpolarized_linprop(
            k, J, jnp.asarray([r]), jnp.zeros((1,))
        )
        L_ours = float(out[0]) + T  # out = T(0 - J0) + L(J0) = L - T
        # tolerance set by the trapezoid quadrature of the truth, not by us
        assert abs(L_ours - L_ref) < 1e-6 * max(L_ref, 1e-30), (L_ours, L_ref)


def test_polarized_linsrc_matches_scalar():
    """Unpolarized propmat through the polarized linsrc path == scalar path."""
    N = 40
    f = jnp.asarray([50e9, 150e9])
    k_s = jnp.linspace(1e-5, 1e-3, N)[:, None] * jnp.ones((1, 2))
    T = jnp.linspace(210.0, 290.0, N)
    J_s = planck(f[None, :], T[:, None])
    r = jnp.full((N - 1,), 800.0)
    I0_s = planck(f, jnp.asarray(285.0))

    k_p = jnp.zeros((N, 2, 7)).at[..., 0].set(k_s)
    J_p = jnp.zeros((N, 2, 4)).at[..., 0].set(J_s)
    I0_p = jnp.zeros((2, 4)).at[..., 0].set(I0_s)

    I_scalar = emission_unpolarized_linsrc(k_s, J_s, r, I0_s)
    I_pol = emission_polarized_linsrc(k_p, J_p, r, I0_p)
    np.testing.assert_allclose(np.asarray(I_pol[..., 0]), np.asarray(I_scalar), rtol=1e-10)
    assert np.all(np.abs(np.asarray(I_pol[..., 1:])) < 1e-12)


def test_polarized_linsrc_polarized_consistency():
    """Polarized linsrc converges to the constant form under refinement."""
    from arts_tpu.rtepack.propmat import propmat

    def build(N):
        f = 1
        a = jnp.linspace(2e-4, 8e-4, N)
        k = propmat(
            a=a, b=0.3 * a, c=0.1 * a, u=0.05 * a, v=0.02 * a
        )[:, None, :]
        T = jnp.linspace(220.0, 280.0, N)
        J = jnp.zeros((N, f, 4)).at[..., 0].set(
            planck(jnp.asarray([100e9])[None, :], T[:, None])
        )
        I0 = J[-1]
        return k, J, I0

    total = 60e3
    fine = None
    for N, which in [(2048, "ref"), (24, "coarse")]:
        k, J, I0 = build(N)
        r = jnp.full((N - 1,), total / (N - 1))
        I_c = emission_polarized(k, J, r, I0)
        I_l = emission_polarized_linsrc(k, J, r, I0)
        if which == "ref":
            fine = np.asarray(I_c)
            # both forms are O(h^2)-converged here; compare to the scale of I
            np.testing.assert_allclose(
                np.asarray(I_l), fine, rtol=1e-5, atol=1e-5 * fine[..., 0].max()
            )
        else:
            err_c = np.abs(np.asarray(I_c)[..., 0] - fine[..., 0]).max()
            err_l = np.abs(np.asarray(I_l)[..., 0] - fine[..., 0]).max()
            assert err_l < err_c


def test_linsrc_jacobian_finite_difference():
    """Autodiff through the lintau recursion vs finite differences."""
    N = 12
    f = jnp.asarray([100e9])
    T0 = jnp.linspace(200.0, 300.0, N)
    r = jnp.full((N - 1,), 1e3)

    def forward(T):
        k = jnp.full((N, 1), 5e-5)
        J = planck(f[None, :], T[:, None])
        I0 = planck(f, T[-1])
        return emission_unpolarized_linsrc(k, J, r, I0)[0]

    g = jax.grad(forward)(T0)
    eps = 1e-3
    for i in [0, 5, 11]:
        fd = (forward(T0.at[i].add(eps)) - forward(T0.at[i].add(-eps))) / (2 * eps)
        np.testing.assert_allclose(g[i], fd, rtol=2e-5, atol=1e-18)


def test_polarized_linprop_substeps():
    """Polarized linprop (substep refinement) beats linsrc on coarse grids
    and matches the exact scalar linprop in the unpolarized limit."""
    from arts_tpu.rtepack.emission import (
        emission_polarized_linprop,
        emission_unpolarized_linprop,
    )

    N = 10
    f = jnp.asarray([100e9])
    k_s = jnp.geomspace(1e-5, 5e-3, N)[:, None]  # strong gradient
    T = jnp.linspace(200.0, 300.0, N)
    J_s = planck(f[None, :], T[:, None])
    r = jnp.full((N - 1,), 5e3)
    I0_s = planck(f, jnp.asarray(300.0))

    k_p = jnp.zeros((N, 1, 7)).at[..., 0].set(k_s)
    J_p = jnp.zeros((N, 1, 4)).at[..., 0].set(J_s)
    I0_p = jnp.zeros((1, 4)).at[..., 0].set(I0_s)

    I_exact = np.asarray(emission_unpolarized_linprop(k_s, J_s, r, I0_s))[0]
    I_lin = np.asarray(emission_polarized_linsrc(k_p, J_p, r, I0_p))[0, 0]
    I_sub = np.asarray(emission_polarized_linprop(k_p, J_p, r, I0_p, substeps=8))[0, 0]
    assert abs(I_sub - I_exact) < abs(I_lin - I_exact)
    assert abs(I_sub - I_exact) / I_exact < 1e-4
