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

import jax
import jax.numpy as jnp

from .propmat import expm, matvec


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
