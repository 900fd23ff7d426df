"""Layer-recursion radiative transfer (emission) as scans.

Parity reference: /root/reference/src/core/rtepack/rtepack_rtestep.cc:374
(`rte_emission`, "constant" discretization): starting from the background
radiance at the far end of the path,

    I_i = T_{i+1} (I_{i+1} - Jbar) + Jbar,   Jbar = 0.5 (J_i + J_{i+1})

where T_{i+1} = exp(-0.5 (K_i + K_{i+1}) r_{i+1}) is the transmittance of
the layer between points i and i+1.  The reference runs this serially per
frequency under OpenMP; here the recursion is a `lax.scan` over layers with
the whole frequency axis vectorized per step, plus an equivalent
`associative_scan` form (the doc's cumulative-transmittance product,
doc/arts/concept.radiative_transfer.rst:89-119) that parallelizes over
layers — our "sequence parallelism" along the path.

Jacobians fall out of autodiff through the scan — replacing the reference's
O(np^2) per-point dT bookkeeping (rtepack_rtestep.cc, dI accumulation).

Conventions: path point 0 is the observer; point np-1 is the background
(space/surface).  k: [np, F] or [np, F, 7]; J: [np, F] or [np, F, 4];
r: [np-1] layer lengths (r[i] between points i and i+1); I0: [F] / [F, 4].
"""

import math

import jax
import jax.numpy as jnp

from .propmat import expm, matvec, to_matrix


def emission_unpolarized(k, J, r, I0):
    """Scalar (unpolarized) emission recursion. Returns radiance at point 0 [F]."""
    k_lay = 0.5 * (k[:-1] + k[1:])  # [np-1, F]
    t_lay = jnp.exp(-k_lay * r[:, None])  # [np-1, F]
    j_lay = 0.5 * (J[:-1] + J[1:])

    def step(I, xs):
        t, jbar = xs
        return t * (I - jbar) + jbar, None

    I, _ = jax.lax.scan(step, I0, (t_lay, j_lay), reverse=True)
    return I


def emission_unpolarized_pscan(k, J, r, I0):
    """Same recursion as a parallel prefix over affine maps (a, b):
    I_i = a_i * I_{i+1} + b_i composed with lax.associative_scan."""
    k_lay = 0.5 * (k[:-1] + k[1:])
    t_lay = jnp.exp(-k_lay * r[:, None])
    j_lay = 0.5 * (J[:-1] + J[1:])
    b = (1.0 - t_lay) * j_lay

    def compose(f, g):
        # (f o g)(x) = f(g(x)): the prefix at index i is layer_0 o ... o layer_i,
        # so the full prefix applied to the background I0 is the observer radiance
        af, bf = f
        ag, bg = g
        return af * ag, af * bg + bf

    A, Bc = jax.lax.associative_scan(compose, (t_lay, b))
    return A[-1] * I0 + Bc[-1]


def _linsrc_weight(tau, t):
    """L = (1 - e^-tau)/tau with a series head (== expm1(a)/a, a = -tau).

    Parity: tran::linsrc func_F (rtepack_transmission.cc:207-215).
    """
    small = tau < 1e-6
    safe = jnp.where(small, 1.0, tau)
    series = 1.0 - tau / 2.0 + tau * tau / 6.0
    return jnp.where(small, series, (1.0 - t) / safe)


def emission_unpolarized_linsrc(k, J, r, I0):
    """Emission recursion with the source linear in optical depth per layer.

    Parity: TransmittanceMatrix::linsrc + the linevo step
    I_i = T (I_{i+1} - J_{i+1}) + L (J_{i+1} - J_i) + J_i
    (rtepack_transmission.cc:1030, rtepack_rtestep.cc linevo), the
    reference's "lintau" rte_option.  L = (1 - T)/tau exactly integrates
    a source that varies linearly in tau across the layer.
    """
    k_lay = 0.5 * (k[:-1] + k[1:])
    tau = k_lay * r[:, None]
    t_lay = jnp.exp(-tau)
    L = _linsrc_weight(tau, t_lay)

    def step(I, xs):
        t, Lw, j0, j1 = xs
        return t * (I - j0) + Lw * (j0 - j1) + j1, None

    I, _ = jax.lax.scan(step, I0, (t_lay, L, J[1:], J[:-1]), reverse=True)
    return I


def _wofz_parts(x):
    """(erfcx(x), sqrt(pi)/2 * Im w(x)) for real x >= 0: erfcx and D(x).

    Complex-free evaluation via the real-pair Faddeeva from the Pallas
    helpers (erfcx(x) = Re w(ix); Dawson from Im w(x)): the TPU x64
    rewriter cannot compile complex128 graphs, and these weights sit in
    the f64 lintau/linprop forward paths."""
    from ..ops.voigt_kernel import _wofz_parts as _wp

    xd = x.astype(jnp.float64)
    n = 64 if xd.dtype == jnp.float64 else 24
    zero = jnp.zeros_like(xd)
    erfcx, _ = _wp(zero, xd, n)  # w(i x) is real: erfcx(x)
    _, dawson2 = _wp(xd, zero, n)  # Im w(x) = (2/sqrt(pi)) D(x)
    return erfcx.astype(x.dtype), (
        (0.5 * math.sqrt(math.pi)) * dawson2
    ).astype(x.dtype)


def emission_unpolarized_linprop(k, J, r, I0):
    """Emission recursion with the propagation matrix linear along the layer.

    Parity: tran::linsrc_linprop (rtepack_transmission.cc:449-474), the
    reference's "linprop" rte_option.  With K(s) = k1 + (k2 - k1) s / r
    (k1 at the near point, k2 at the far point, s distance from the near
    point) the attenuation to the near point is quadratic in s, and by
    parts the linear-source weight reduces to
        L = (1/r) int_0^r exp(-(k1 s + alpha^2 s^2)) ds.
    Closed forms (derived here; validated against brute-force quadrature in
    tests/test_linsrc.py::test_linprop_weight_vs_quadrature):
      * k2 > k1 (alpha^2 = (k2-k1)/(2r) > 0):
          L = sqrt(pi) (erfcx(u0) - T erfcx(u1)) / (2 r alpha),
          u_i = k_i/(2 alpha), erfcx via Re w(i u)  (all terms decaying).
      * k2 < k1 (beta^2 = (k1-k2)/(2r)):
          L = (D(q0) - T D(q1)) / (r beta), q_i = k_i/(2 beta),
          Dawson D via Im w(q).
    NOTE: the reference applies its Dawson form with (k1, k2) in the order
    that is exact for a layer whose absorption DEcreases toward the far
    point while gating it to INcreasing layers (rtepack_transmission.cc:
    449-474 with the :1082-1086 call orientation) — an orientation bug its
    ordering-only convergence test (tests/core/linsrc) cannot see.  We
    implement the exact weight for both signs instead.  T = exp(-tau) with
    tau = r (k1 + k2)/2, exact for linear K.
    """
    k1 = k[:-1]  # near end of each layer
    k2 = k[1:]  # far end
    rr = r[:, None]
    tau = 0.5 * (k1 + k2) * rr
    t_lay = jnp.exp(-tau)

    dtau_grad = 0.5 * jnp.abs(k2 - k1) * rr  # |extra depth| from the slope
    # Gate between the closed form (a cancellation e0 - T*e1 of
    # O(sqrt(dtau_grad)) between O(1) wofz terms, losing ~half the digits
    # near the gate) and the linsrc series whose error is O(dtau_grad).
    # At f32 the cancellation costs more than the series error until
    # dtau_grad ~ 1e-3; at f64 1e-6 balances the two.
    gate = 1e-6 if k.dtype == jnp.float64 else 1e-3
    # The closed form assumes k >= 0 (erfcx/Dawson via wofz need
    # Im(z) >= 0); with negative absorption (ECS line-mixing wings) fall
    # back to the linsrc weight, which is exact in tau of either sign.
    graded = (dtau_grad > gate) & (jnp.minimum(k1, k2) >= 0.0)
    a2 = jnp.where(graded, jnp.abs(k2 - k1), 1.0) / (2.0 * rr)
    alpha = jnp.sqrt(a2)
    # clamp so the untaken branch stays in wofz's supported domain
    u0 = jnp.maximum(k1, 0.0) / (2.0 * alpha)
    u1 = jnp.maximum(k2, 0.0) / (2.0 * alpha)
    e0, d0 = _wofz_parts(u0)
    e1, d1 = _wofz_parts(u1)
    L_up = (0.5 * math.sqrt(math.pi)) * (e0 - t_lay * e1) / (rr * alpha)
    L_dn = (d0 - t_lay * d1) / (rr * alpha)
    L = jnp.where(
        graded,
        jnp.where(k2 > k1, L_up, L_dn),
        _linsrc_weight(tau, t_lay),
    )

    def step(I, xs):
        t, Lw, j0, j1 = xs
        return t * (I - j0) + Lw * (j0 - j1) + j1, None

    I, _ = jax.lax.scan(step, I0, (t_lay, L, J[1:], J[:-1]), reverse=True)
    return I


def emission_polarized_linsrc(k, J, r, I0):
    """Polarized linear-in-tau source recursion.

    The matrix source weight is exact: L = (r Kbar)^-1 (I - T) (the matrix
    form of expm1(-tau)/tau; the reference builds the same operator from
    Cayley-Hamilton coefficients l0..l3, rtepack_transmission.cc:207-276).
    A series head I - M/2 + M^2/6 - M^3/24 covers thin layers where the
    solve would lose precision.
    """
    k_lay = 0.5 * (k[:-1] + k[1:])  # [np-1, F, 7]
    T = expm(k_lay, r[:, None])  # [np-1, F, 4, 4]
    M = r[:, None, None, None] * to_matrix(k_lay)  # [np-1, F, 4, 4]
    eye = jnp.eye(4, dtype=k.dtype)

    thin = (r[:, None] * k_lay[..., 0]) < 1e-4  # tau from the A component
    M2 = jnp.einsum("...ij,...jk->...ik", M, M)
    M3 = jnp.einsum("...ij,...jk->...ik", M2, M)
    L_series = eye - M / 2.0 + M2 / 6.0 - M3 / 24.0
    M_safe = jnp.where(thin[..., None, None], eye, M)
    L_solve = jnp.linalg.solve(M_safe, eye - T)
    L = jnp.where(thin[..., None, None], L_series, L_solve)

    def step(I, xs):
        t, Lw, j0, j1 = xs
        return matvec(t, I - j0) + matvec(Lw, j0 - j1) + j1, None

    I, _ = jax.lax.scan(step, I0, (T, L, J[1:], J[:-1]), reverse=True)
    return I


def _refine_path(k, J, r, substeps):
    """Linearly refine each layer into `substeps` sublayers.

    k/J are point quantities [np, ...]; returns (k', J', r') with
    np' = (np-1)*substeps + 1 points, K and J linear within each original
    layer (the linprop/linsrc assumption applied at sub-resolution).
    """
    f = jnp.linspace(0.0, 1.0, substeps + 1)[:-1]  # [S], drop shared right edge

    def refine(x):
        ex = (1.0 - f).reshape((1, -1) + (1,) * (x.ndim - 1))
        fx = f.reshape((1, -1) + (1,) * (x.ndim - 1))
        mid = ex * x[:-1, None] + fx * x[1:, None]  # [np-1, S, ...]
        flat = mid.reshape((-1,) + x.shape[1:])
        return jnp.concatenate([flat, x[-1:]], 0)

    r_sub = jnp.repeat(r / substeps, substeps)
    return refine(k), refine(J), r_sub


def emission_polarized_linprop(k, J, r, I0, substeps: int = 4):
    """Polarized linear-propmat recursion by substep refinement.

    The reference's polarized linsrc_linprop evaluates its scalar Dawson
    closed form with matrix arguments (complex specmat sqrt/inv/dawson,
    rtepack_transmission.cc:449-474) — exact only when K1 and K2 commute
    (and orientation-flipped, see emission_unpolarized_linprop).  Here the
    layer is split into `substeps` sublayers with K and J interpolated
    linearly and the exact-per-sublayer linsrc weight applied: O(1/S^2)
    error with no commutation assumption, and it is just a longer scan —
    the TPU-friendly form of the same discretization.
    """
    k_s, J_s, r_s = _refine_path(k, J, r, substeps)
    return emission_polarized_linsrc(k_s, J_s, r_s, I0)


def emission_polarized(k, J, r, I0):
    """Polarized recursion: k [np, F, 7], J [np, F, 4], I0 [F, 4]."""
    k_lay = 0.5 * (k[:-1] + k[1:])  # [np-1, F, 7]
    T = expm(k_lay, r[:, None])  # [np-1, F, 4, 4]
    j_lay = 0.5 * (J[:-1] + J[1:])

    def step(I, xs):
        t, jbar = xs
        return matvec(t, I - jbar) + jbar, None

    I, _ = jax.lax.scan(step, I0, (T, j_lay), reverse=True)
    return I


def cumulative_transmittance(k, r):
    """Mueller-ordered cumulative transmittance from the observer:
    Pi_i = T_1 T_2 ... T_i (identity at i=0), [np, F, 4, 4].

    Parity: rtepack tramat cumulative products used for
    spectral_rad_jacFromBackground (background Jacobian term)."""
    k_lay = 0.5 * (k[:-1] + k[1:])
    T = expm(k_lay, r[:, None])  # [np-1, F, 4, 4]

    def compose(g, f):
        return jnp.einsum("...ij,...jk->...ik", g, f)

    P = jax.lax.associative_scan(compose, T, axis=0)
    eye = jnp.broadcast_to(jnp.eye(4, dtype=k.dtype), T.shape[1:][:-2] + (4, 4))
    return jnp.concatenate([eye[None], P], axis=0)
