"""Surface reflection algebra for pencil-beam radiative transfer.

Parity reference: /root/reference/src/core/rtepack/rtepack_surface.{h,cc}
(flat_scalar_reflection, reflection, fresnel_reflectance and its
specular/non-specular frame-rotated variants, specular_radiance) and the
Fresnel amplitude coefficients /root/reference/src/core/physics/
physics_funcs.cc:105-140.  The workspace methods built on these —
spectral_surf_reflFlatScalar / FlatRealFresnel and
spectral_radSurfaceReflectance (/root/reference/src/m_surface.cc:23-240) —
map to `flat_scalar_reflection` / `fresnel` here plus the
`background="surface_reflect"` mode of `fwd.simulate_clearsky*`, which
replaces the agenda recursion (observer agenda re-entered for the specular
direction) with a second emission scan over the same layer stack.

All functions are plain JAX: differentiable wrt reflectance / refractive
index / emission, batched over leading axes.
"""

import jax
import jax.numpy as jnp

_SIGN_V = jnp.array([1.0, 1.0, 1.0, -1.0])


def fresnel(n1, n2, theta_deg):
    """Complex Fresnel AMPLITUDE coefficients (Rv, Rh).

    n1: refractive index of the propagation medium, n2: of the reflecting
    medium (complex or real); theta_deg: incidence angle from the normal
    [deg].  Power reflectance is |R|^2.  Total internal reflection returns
    (1, 1) as in the reference's pair overload (physics_funcs.cc:123-140).
    """
    # c64 on non-CPU backends: the TPU x64 rewriter cannot compile
    # complex128 graphs, and |R|^2 at c64 (~1e-7 rel) is far below any
    # emissivity model error; CPU keeps complex128.
    import jax

    cdtype = (
        jnp.complex128 if jax.default_backend() == "cpu" else jnp.complex64
    )
    n1 = jnp.asarray(n1, cdtype)
    n2 = jnp.asarray(n2, cdtype)
    rdtype = jnp.float64 if cdtype == jnp.complex128 else jnp.float32
    th = jnp.deg2rad(jnp.asarray(theta_deg))
    cos1 = jnp.cos(th)
    sin2 = jnp.real(n1) * jnp.sin(th).astype(rdtype) / jnp.real(n2)
    tir = jnp.abs(sin2) > 1.0
    cos2 = jnp.cos(jnp.arcsin(jnp.clip(sin2, -1.0, 1.0)))
    # cast the real cosines to the complex dtype's real part so the
    # products below do not re-promote c64 to c128 on the TPU path
    cos1 = cos1.astype(rdtype)
    cos2 = cos2.astype(rdtype)
    a, b = n2 * cos1, n1 * cos2
    c, d = n1 * cos1, n2 * cos2
    rv = (a - b) / (a + b)
    rh = (c - d) / (c + d)
    one = jnp.ones_like(rv)
    return jnp.where(tir, one, rv), jnp.where(tir, one, rh)


def fresnel_reflectance(rv, rh):
    """4x4 Mueller reflectance matrix from complex amplitudes (rv, rh).

    Parity: rtepack::fresnel_reflectance (rtepack_surface.cc:12-34).
    Batched over leading axes; returns [..., 4, 4].
    """
    rv = jnp.asarray(rv)
    rh = jnp.asarray(rh)
    pv = jnp.abs(rv) ** 2
    ph = jnp.abs(rh) ** 2
    rmean = 0.5 * (pv + ph)
    rdiff = 0.5 * (pv - ph)
    a = rh * jnp.conj(rv)
    b = rv * jnp.conj(rh)
    c = 0.5 * jnp.real(a + b)
    d = 0.5 * jnp.imag(a - b)
    z = jnp.zeros_like(rmean)
    rows = [
        [rmean, rdiff, z, z],
        [rdiff, rmean, z, z],
        [z, z, c, d],
        [z, z, -d, c],
    ]
    return jnp.stack([jnp.stack(r, axis=-1) for r in rows], axis=-2)


def _pol_basis(k):
    """(v, h) polarization basis for propagation direction k (local z up).

    Parity: pol_basis (rtepack_surface.cc:63-80)."""
    z = jnp.array([0.0, 0.0, 1.0], k.dtype)
    h = jnp.cross(k, jnp.broadcast_to(z, k.shape))
    nh = jnp.linalg.norm(h, axis=-1, keepdims=True)
    h = jnp.where(
        nh < 1e-12, jnp.array([1.0, 0.0, 0.0], k.dtype), h / jnp.where(nh == 0, 1.0, nh)
    )
    v = jnp.cross(h, k)
    return v, h


def _stokes_rotation(cos2psi, sin2psi):
    z = jnp.zeros_like(cos2psi)
    o = jnp.ones_like(cos2psi)
    rows = [
        [o, z, z, z],
        [z, cos2psi, sin2psi, z],
        [z, -sin2psi, cos2psi, z],
        [z, z, z, o],
    ]
    return jnp.stack([jnp.stack(r, axis=-1) for r in rows], axis=-2)


def _stokes_rotation_refl(cos2psi, sin2psi):
    z = jnp.zeros_like(cos2psi)
    o = jnp.ones_like(cos2psi)
    rows = [
        [o, z, z, z],
        [z, cos2psi, -sin2psi, z],
        [z, sin2psi, -cos2psi, z],
        [z, z, z, -o],
    ]
    return jnp.stack([jnp.stack(r, axis=-1) for r in rows], axis=-2)


def _flip_uv(m):
    f = jnp.diag(jnp.array([1.0, 1.0, -1.0, -1.0], m.dtype))
    return f @ m


def fresnel_reflectance_specular(rv, rh, k_inc, n_surface):
    """Frame-rotated specular Fresnel Mueller matrix.

    Parity: rtepack::fresnel_reflectance_specular (rtepack_surface.cc:95-135).
    k_inc points toward the surface; n_surface is the outward normal.
    """
    mf = fresnel_reflectance(rv, rh)
    m = jnp.cross(k_inc, n_surface)
    nm = jnp.linalg.norm(m, axis=-1, keepdims=True)
    normal_inc = (nm < 1e-12)[..., 0]
    msafe = m / jnp.where(nm < 1e-12, 1.0, nm)
    v_i, h_i = _pol_basis(k_inc)
    cp = jnp.sum(h_i * msafe, axis=-1)
    sp = jnp.sum(v_i * msafe, axis=-1)
    c2 = 2.0 * cp * cp - 1.0
    s2 = 2.0 * sp * cp
    rot = _stokes_rotation_refl(c2, -s2) @ mf @ _stokes_rotation(c2, s2)
    return jnp.where(normal_inc[..., None, None], _flip_uv(mf), rot)


def fresnel_reflectance_nonspecular(rv, rh, k_inc, k_out, n_surface):
    """Frame-rotated Fresnel Mueller matrix for independent in/out directions.

    Parity: rtepack::fresnel_reflectance_nonspecular
    (rtepack_surface.cc:146-200)."""
    mf = fresnel_reflectance(rv, rh)
    m = jnp.cross(k_inc, n_surface)
    nm = jnp.linalg.norm(m, axis=-1, keepdims=True)
    normal_inc = (nm < 1e-12)[..., 0]
    msafe = m / jnp.where(nm < 1e-12, 1.0, nm)
    v_i, h_i = _pol_basis(k_inc)
    cp1 = jnp.sum(h_i * msafe, axis=-1)
    sp1 = jnp.sum(v_i * msafe, axis=-1)
    l1 = _stokes_rotation(2 * cp1 * cp1 - 1, 2 * sp1 * cp1)
    v_r, h_r = _pol_basis(k_out)
    cp2 = jnp.sum(msafe * h_r, axis=-1)
    sp2 = jnp.sum(msafe * v_r, axis=-1)
    l2 = _stokes_rotation_refl(2 * cp2 * cp2 - 1, 2 * sp2 * cp2)
    return jnp.where(normal_inc[..., None, None], _flip_uv(mf), l2 @ mf @ l1)


def specular_reflected_direction(k_inc, n_surface):
    """k_out = k_inc - 2 (k.n) n, normalized (rtepack_surface.cc:204-208)."""
    out = k_inc - 2.0 * jnp.sum(k_inc * n_surface, axis=-1, keepdims=True) * n_surface
    return out / jnp.linalg.norm(out, axis=-1, keepdims=True)


def flat_scalar_reflection(I, R, B):
    """[R, R, R, -R] * I + (1 - R) * B with Stokes I [..., 4].

    Parity: rtepack::flat_scalar_reflection (rtepack_surface.cc:341-346):
    scalar reflectance, V mirrored, emissivity (1 - R) keeps R + E = 1.
    """
    R = jnp.asarray(R)[..., None]
    return _SIGN_V.astype(I.dtype) * R * I + (1.0 - R) * B


def reflection(I, R, B):
    """Mueller reflection R I (V mirrored) + (1 - R) B.

    Parity: rtepack::reflection (rtepack_surface.cc:355-360); I, B [..., 4],
    R [..., 4, 4]."""
    ri = jnp.einsum("...ij,...j->...i", R, I) * _SIGN_V.astype(I.dtype)
    eb = B - jnp.einsum("...ij,...j->...i", R, B)
    return ri + eb


def specular_radiance(I_in, J, rv, rh, k_inc, n_surface):
    """I_out = J + R_spec (I_in - J) (rtepack_surface.cc:210-218)."""
    R = fresnel_reflectance_specular(rv, rh, k_inc, n_surface)
    return J + jnp.einsum("...ij,...j->...i", R, I_in - J)


def nonspecular_radiance_from_patches(
    coords_latlon,
    patch_alt,
    sources,
    J,
    rv,
    rh,
    pos_latlon,
    h_pos,
    n_surface,
    k_out,
    radius,
    dlat_deg,
    dlon_deg,
):
    """Accumulate non-specular scattered radiance from visible surface
    patches (rough-terrain reflection).

    Parity: rtepack::nonspecular_radiance_from_patches
    (rtepack_surface.cc:220-320) — discretizes
        L_out = J + (1/pi) sum_j R(k_j, k_out) L_j cos(theta_P) dOmega_j
    with dOmega_j = A_j cos(alpha_j) / r_j^2.  The reference loops over
    patches; here the sum is one batched evaluation (vmap-able, and
    differentiable wrt sources/J/Fresnel amplitudes).

    coords_latlon: [P, 2] patch (lat, lon) [deg]; patch_alt: [P] heights;
    sources: [P, 4] Stokes radiance leaving each patch toward the scatter
    point; J: [4] thermal emission at the scatter point; pos_latlon /
    h_pos: scatter point; n_surface / k_out: [3] unit vectors (ECEF);
    radius: spherical planet radius; dlat/dlon: patch grid spacing [deg].
    """
    lat_j = jnp.deg2rad(coords_latlon[:, 0])
    lon_j = jnp.deg2rad(coords_latlon[:, 1])
    r_j = radius + patch_alt
    pos_j = jnp.stack(
        [
            r_j * jnp.cos(lat_j) * jnp.cos(lon_j),
            r_j * jnp.cos(lat_j) * jnp.sin(lon_j),
            r_j * jnp.sin(lat_j),
        ],
        axis=-1,
    )  # [P, 3]
    lat_p = jnp.deg2rad(pos_latlon[0])
    lon_p = jnp.deg2rad(pos_latlon[1])
    r_p = radius + h_pos
    pos_P = jnp.stack(
        [
            r_p * jnp.cos(lat_p) * jnp.cos(lon_p),
            r_p * jnp.cos(lat_p) * jnp.sin(lon_p),
            r_p * jnp.sin(lat_p),
        ]
    )

    rvec = pos_P[None, :] - pos_j  # [P, 3]
    r = jnp.linalg.norm(rvec, axis=-1)
    ok_r = r > 1.0
    r_safe = jnp.where(ok_r, r, 1.0)
    k_inc = rvec / r_safe[:, None]

    n_j = jnp.stack(
        [
            jnp.cos(lat_j) * jnp.cos(lon_j),
            jnp.cos(lat_j) * jnp.sin(lon_j),
            jnp.sin(lat_j),
        ],
        axis=-1,
    )
    cos_alpha = jnp.sum(n_j * k_inc, axis=-1)  # emission angle at patch j
    cos_theta = -jnp.sum(n_surface[None, :] * k_inc, axis=-1)  # incidence at P
    vis = ok_r & (cos_alpha > 0.0) & (cos_theta > 0.0)

    A_j = (
        r_j * r_j
        * jnp.abs(jnp.deg2rad(dlat_deg) * jnp.deg2rad(dlon_deg))
        * jnp.abs(jnp.cos(lat_j))
    )
    dOmega = A_j * cos_alpha / (r_safe * r_safe)

    R = jax.vmap(
        lambda ki: fresnel_reflectance_nonspecular(rv, rh, ki, k_out, n_surface)
    )(k_inc)  # [P, 4, 4]
    contrib = jnp.einsum("pij,pj->pi", R, sources)
    wgt = jnp.where(vis, cos_theta * dOmega / jnp.pi, 0.0)
    return J + jnp.sum(wgt[:, None] * contrib, axis=0)
