"""Polarized radiative-transfer algebra on packed arrays.

Parity reference: /root/reference/src/core/rtepack/
  - propmat: 7-component compressed 4x4 propagation matrix (A,B,C,D,U,V,W)
    (rtepack_propagation_matrix.h:12); K expands to
        [[A, B, C, D],
         [B, A, U, V],
         [C,-U, A, W],
         [D,-V,-W, A]]
  - tran: closed-form Cayley-Hamilton matrix exponential of -0.5*r*(K1+K2)
    with eigen-pair (x, y) and coefficients C0..C3 including small-x/y
    limits (rtepack_transmission.cc:22-119).

Everything here is array-shaped [..., 7] / [..., 4, 4] / [..., 4] so it
vmaps over (frequency, layer, geometry) axes and fuses on the VPU.  The
reference's hand-written dT/dK, dT/dr plumbing is replaced by autodiff;
the small-eigenvalue limits below are implemented with series forms that
stay exact under JVP (no 0/0 under differentiation).
"""

import jax.numpy as jnp

# component indices
A, B, C, D, U, V, W = range(7)


def propmat(a=0.0, b=0.0, c=0.0, d=0.0, u=0.0, v=0.0, w=0.0):
    return jnp.stack(jnp.broadcast_arrays(*map(jnp.asarray, (a, b, c, d, u, v, w))), axis=-1)


def to_matrix(k):
    """Expand packed [..., 7] propagation matrix to [..., 4, 4]."""
    a, b, c, d, u, v, w = (k[..., i] for i in range(7))
    z = jnp.zeros_like(a)
    rows = [
        [a, b, c, d],
        [b, a, u, v],
        [c, -u, a, w],
        [d, -v, -w, a],
    ]
    return jnp.stack([jnp.stack(r, axis=-1) for r in rows], axis=-2)


def expm(k, r):
    """Transmittance matrix T = exp(-0.5 * r * (K1 + K2)) for an averaged
    layer propmat; here `k` is already the averaged packed propmat [..., 7]
    and r the path length [...]. Returns [..., 4, 4] Mueller matrix.

    Closed form per rtepack_transmission.cc: with the traceless part K' of
    -r*K having components (b..w), T = exp(a) (C0 I + C1 K' + C2 K'^2 + C3 K'^3).
    """
    a = -r * k[..., A]
    b = -r * k[..., B]
    c = -r * k[..., C]
    d = -r * k[..., D]
    u = -r * k[..., U]
    v = -r * k[..., V]
    w = -r * k[..., W]

    b2, c2, d2 = b * b, c * c, d * d
    u2, v2, w2 = u * u, v * v, w * w

    # eigen-structure: L^4 + Bq L^2 + Cq = 0; the traceless exponent has
    # eigenvalue pairs +-x (real) and +-iy (imaginary) with
    # x^2 = (S-Bq)/2, y^2 = (S+Bq)/2, S = sqrt(Bq^2 - 4 Cq)
    # (verified vs scipy.linalg.expm to machine precision; the reference's
    # literal x2 = sqrt(t1) at rtepack_transmission.cc:67 disagrees with
    # scipy — we use the exact recipe).
    Bq = u2 + v2 + w2 - b2 - c2 - d2
    Cq = -((d * u - c * v + b * w) ** 2)
    disc = jnp.maximum(Bq * Bq - 4.0 * Cq, 0.0)
    # Degenerate limit: disc -> 0 iff x2 + y2 -> 0 (both nonneg). There the
    # sqrt chain has unbounded autodiff slopes, but C0..C3 are entire in
    # (Bq, Cq): use their Taylor heads written directly in Bq, Cq so
    # gradients stay finite (replaces the reference's hand limits and the
    # FIXME at rtepack_transmission.cc:96-115).
    degen = disc < 1e-16
    S = jnp.sqrt(jnp.where(degen, 1.0, disc))
    x2 = jnp.maximum(0.5 * (S - Bq), 0.0)
    y2 = jnp.maximum(0.5 * (S + Bq), 0.0)

    def cos_sqrt(t):
        ts = t < 1e-8
        series = 1.0 - t / 2.0 * (1.0 - t / 12.0)
        return jnp.where(ts, series, jnp.cos(jnp.sqrt(jnp.where(ts, 1.0, t))))

    def sinc_sqrt(t):  # sin(sqrt t)/sqrt t
        ts = t < 1e-8
        series = 1.0 - t / 6.0 * (1.0 - t / 20.0)
        st = jnp.sqrt(jnp.where(ts, 1.0, t))
        return jnp.where(ts, series, jnp.sin(st) / st)

    # Fold exp(a) into the coefficients: for passive media a + x <= 0, so
    # exp(a)*cosh(x) computed as exp(a+x)(1+e^{-2x})/2 never overflows —
    # the reference instead *drops polarization* on overflow
    # (rtepack_transmission.cc:117 fallback); we stay exact.
    x = jnp.sqrt(x2)
    ea = jnp.exp(a)
    eax = jnp.exp(a + x)
    em2x = jnp.exp(-2.0 * x)
    e_cx = eax * 0.5 * (1.0 + em2x)  # e^a cosh x
    xs_small = x2 < 1e-8
    e_shx = jnp.where(  # e^a sinh(x)/x
        xs_small,
        ea * (1.0 + x2 / 6.0 * (1.0 + x2 / 20.0)),
        eax * 0.5 * (1.0 - em2x) / jnp.where(xs_small, 1.0, x),
    )
    e_cy = ea * cos_sqrt(y2)
    e_sny = ea * sinc_sqrt(y2)

    inv_s = 1.0 / jnp.where(degen, 1.0, x2 + y2)
    # Taylor heads in the degenerate limit: x2*y2 = -Cq, x2-y2 = -Bq
    C0 = jnp.where(degen, ea * (1.0 - Cq / 24.0), (e_cy * x2 + e_cx * y2) * inv_s)
    C1 = jnp.where(degen, ea * (1.0 - Cq / 120.0), (e_sny * x2 + e_shx * y2) * inv_s)
    C2 = jnp.where(degen, ea * (0.5 - Bq / 24.0), (e_cx - e_cy) * inv_s)
    C3 = jnp.where(
        degen, ea * (1.0 / 6.0 - Bq / 120.0), (e_shx - e_sny) * inv_s
    )

    C2b = C2 * (c * u + d * v)
    C2c = C2 * (b * u - d * w)
    C2d = C2 * (b * v + c * w)
    C2u = C2 * (b * c - v * w)
    C2v = C2 * (b * d + u * w)
    C2w = C2 * (c * d - u * v)

    C3b = C3 * (b * (Bq - w2) + w * (c * v - d * u))
    C3c = C3 * (c * (v2 - Bq) - v * (d * u + b * w))
    C3d = C3 * (d * (u2 - Bq) - u * (c * v - b * w))
    C3u = C3 * (d * (c * v - b * w) - u * (Bq + d2))
    C3v = C3 * (c * (d * u + b * w) - v * (Bq + c2))
    C3w = C3 * (b * (c * v - d * u) - w * (Bq + b2))

    M00 = C0 + C2 * (b2 + c2 + d2)
    M11 = C0 + C2 * (b2 - u2 - v2)
    M22 = C0 + C2 * (c2 - u2 - w2)
    M33 = C0 + C2 * (d2 - v2 - w2)

    rows = [
        [M00, C1 * b - C2b - C3b, C1 * c + C2c + C3c, C1 * d + C2d + C3d],
        [C1 * b + C2b - C3b, M11, C1 * u + C2u + C3u, C1 * v + C2v + C3v],
        [C1 * c - C2c + C3c, -C1 * u + C2u - C3u, M22, C1 * w + C2w + C3w],
        [C1 * d - C2d + C3d, -C1 * v + C2v - C3v, -C1 * w + C2w - C3w, M33],
    ]
    return jnp.stack([jnp.stack(rr, axis=-1) for rr in rows], axis=-2)


def inv(k):
    """Inverse of the packed 4x4 propagation matrix, as [..., 4, 4].

    Used by the source-vector construction J = B e1 + K^-1 S
    (rtepack_source.cc:40-47).  For the common diagonal case this is 1/A.
    """
    return jnp.linalg.inv(to_matrix(k))


def matvec(m, s):
    """[..., 4, 4] @ [..., 4]."""
    return jnp.einsum("...ij,...j->...i", m, s)


def matmul(m1, m2):
    return jnp.einsum("...ij,...jk->...ik", m1, m2)


def is_polarized(k, tol=0.0):
    return jnp.any(jnp.abs(k[..., 1:]) > tol, axis=-1)
