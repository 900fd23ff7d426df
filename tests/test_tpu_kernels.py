"""Interpret-mode coverage for the Pallas TPU kernels (they normally run
only on TPU hardware; interpret=True executes the same kernel logic on
CPU so the suite guards their math).

- voigt_sum: lines x freqs contraction vs the plain-JAX reference path,
  including cutoff windows, block skipping, and the far-wing fast path
- fused_eigen: the fused DISORT eigen stage vs solver._eigen +
  explicit Ek, compared through eigenmode-order-invariant quantities
"""

import numpy as np

import jax
import jax.numpy as jnp

from arts_tpu.disort import solver as S
from arts_tpu.disort.eigen_kernel import fused_eigen
from arts_tpu.ops.voigt_kernel import voigt_sum
from arts_tpu.ops.wofz import wofz


def test_voigt_sum_interpret_matches_reference():
    rng = np.random.default_rng(3)
    L, F = 300, 700
    f = jnp.linspace(-40e9, 40e9, F)
    f0 = jnp.asarray(np.sort(rng.uniform(-60e9, 60e9, L)))
    inv_gd = jnp.asarray(rng.uniform(1e-6, 4e-6, L))
    z_imag = jnp.asarray(rng.uniform(0.5, 2000.0, L))
    s_re = jnp.asarray(rng.normal(size=L))
    s_im = jnp.asarray(0.1 * rng.normal(size=L))
    # mix: finite cutoffs (exercise the window skip + wcut subtraction)
    # and effectively-infinite ones
    cutoff = jnp.asarray(
        np.where(rng.random(L) < 0.5, rng.uniform(2e9, 10e9, L), 1e30)
    )
    wcut = jnp.where(
        cutoff < 1e20, wofz(inv_gd * cutoff + 1j * z_imag), 0.0
    )

    got = voigt_sum(
        f, f0, inv_gd, z_imag, s_re, s_im, cutoff,
        jnp.real(wcut), jnp.imag(wcut),
        tf=256, tl=128, interpret=True,
    )

    # plain-JAX reference
    w = wofz(inv_gd[:, None] * (f[None, :] - f0[:, None]) + 1j * z_imag[:, None])
    w = w - wcut[:, None]
    inside = jnp.abs(f[None, :] - f0[:, None]) <= cutoff[:, None]
    want = jnp.sum(
        jnp.where(inside, s_re[:, None] * jnp.real(w) - s_im[:, None] * jnp.imag(w), 0.0),
        axis=0,
    )
    scale = float(jnp.max(jnp.abs(want)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=5e-7 * scale, rtol=2e-6)


def test_voigt_sum_mid_tier_laurent_accuracy():
    """Blocks whose min |z|^2 sits between the mid gate (36 at f32) and
    the far gate (512) take the 6-term Laurent path; check it against
    the full plain-JAX wofz on a Doppler-dominated config built to land
    there (tiny z_imag, line blocks ~1 freq tile away)."""
    rng = np.random.default_rng(9)
    L, F = 256, 512
    f = jnp.linspace(-5e9, 5e9, F)
    # lines clustered outside the grid: gap * inv_gd lands |z| in [6, 20]
    f0 = jnp.asarray(np.sort(rng.uniform(6e9, 15e9, L)))
    inv_gd = jnp.asarray(rng.uniform(1.0e-9, 1.4e-9, L))
    z_imag = jnp.asarray(rng.uniform(1e-3, 0.3, L))  # far below the gates
    s_re = jnp.asarray(rng.normal(size=L))
    s_im = jnp.asarray(0.1 * rng.normal(size=L))
    cutoff = jnp.full((L,), 1e30)
    wcut = jnp.zeros((L,), jnp.complex64)

    got = voigt_sum(
        f, f0, inv_gd, z_imag, s_re, s_im, cutoff,
        jnp.real(wcut), jnp.imag(wcut),
        tf=256, tl=128, interpret=True,
    )
    w = wofz(inv_gd[:, None] * (f[None, :] - f0[:, None]) + 1j * z_imag[:, None])
    want = jnp.sum(s_re[:, None] * jnp.real(w) - s_im[:, None] * jnp.imag(w), axis=0)
    scale = float(jnp.max(jnp.abs(want)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=5e-7 * scale, rtol=2e-6)


def test_fused_eigen_interpret_matches_xla_path():
    rng = np.random.default_rng(4)
    F, L, nq, M, N = 6, 13, 8, 1, 4
    mu_np, w_np = S.double_gauss(N)
    lam = jnp.asarray(S.lambda_tables(M, nq, N)[0])
    sign = jnp.asarray(S.lambda_tables(M, nq, N)[1])
    mu = jnp.asarray(mu_np)
    w = jnp.asarray(w_np)
    g = rng.uniform(0.0, 0.85, (F, L))
    leg = jnp.asarray(g[..., None] ** np.arange(nq)[None, None, :])
    legs = (2.0 * jnp.arange(nq) + 1.0) * leg
    omega = jnp.asarray(rng.uniform(0.05, 0.95, (F, L)))
    dtau = jnp.asarray(rng.uniform(1e-3, 1.5, (F, L)))

    Pp = jnp.einsum("flk,mki,mkj->fmlij", legs, lam, lam)
    Pm = jnp.einsum("flk,mk,mki,mkj->fmlij", legs, sign, lam, lam)

    k_r, Gp_r, Gm_r = jax.vmap(
        lambda a, b, om: S._eigen(a, b, om, mu, w, False)
    )(Pp, Pm, omega)
    Ek_r = jnp.exp(-k_r * dtau[:, None, :, None])

    k_f, Ek_f, Gp_f, Gm_f = jax.vmap(
        lambda a, b, om, dt: fused_eigen(a, b, om, dt, mu_np, w_np,
                                         sub=1, interpret=True)
    )(Pp, Pm, omega[:, None, :], dtau[:, None, :])

    # eigenmode ORDER differs (fused skips the sort): compare sorted k and
    # order-invariant mode sums  sum_i f(k_i) Gp[:,i] Gm[:,i]^T
    np.testing.assert_allclose(
        np.sort(np.asarray(k_f), -1), np.sort(np.asarray(k_r), -1), rtol=1e-10
    )
    for A_r, B_r, A_f, B_f in ((Gp_r, Gm_r, Gp_f, Gm_f),
                               (Gp_r, Gp_r, Gp_f, Gp_f),
                               (Gm_r, Gm_r, Gm_f, Gm_f)):
        inv_r = jnp.einsum("...i,...ji,...ki->...jk", Ek_r, A_r, B_r)
        inv_f = jnp.einsum("...i,...ji,...ki->...jk", Ek_f, A_f, B_f)
        sc = float(jnp.max(jnp.abs(inv_r)))
        np.testing.assert_allclose(
            np.asarray(inv_f), np.asarray(inv_r), atol=1e-9 * sc, rtol=1e-8
        )


def test_multipole_far_field_matches_direct():
    """The fast-multipole far tier equals the direct evaluation to ~1e-6:
    many narrow-window blocks spread over a wide grid so most
    (tile, block) pairs classify far (tl=32 forces multiple blocks)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from arts_tpu.ops.voigt_kernel import voigt_sum, voigt_sum_pol

    rng = np.random.default_rng(11)
    L = 160
    f0 = np.sort(rng.uniform(-40e9, 40e9, L))
    igd = rng.uniform(2e-6, 4e-6, L)
    zi = rng.uniform(1e2, 1e4, L) * igd  # G0 1e2..1e4 Hz-ish? scale up
    zi = rng.uniform(1e8, 1e9, L) * igd  # pressure-broadened widths
    sr = rng.uniform(0.5, 2.0, L)
    si = rng.uniform(-0.2, 0.2, L)
    cut = np.full(L, 25e9)
    from arts_tpu.ops.wofz import wofz

    wcut = np.asarray(wofz(jnp.asarray(igd * cut + 1j * zi)))
    f = jnp.linspace(-50e9, 50e9, 2048)

    args = [jnp.asarray(x) for x in (f0, igd, zi, sr, si, cut,
                                     wcut.real, wcut.imag)]
    kw = dict(tf=128, tl=16, n=24, interpret=True)
    y_mp = np.asarray(voigt_sum(f, *args, multipole=True, **kw))
    y_dir = np.asarray(voigt_sum(f, *args, multipole=False, **kw))
    scale = np.abs(y_dir).max()
    assert scale > 0
    np.testing.assert_allclose(y_mp, y_dir, atol=3e-6 * scale, rtol=1e-4)
    # and the far classification actually fired (the speed claim)
    from arts_tpu.ops.voigt_kernel import _multipole_far

    nl, tl = 10, 16
    t = np.asarray(f).reshape(16, 128)
    far, _ = _multipole_far(
        f, jnp.asarray(t[:, 0]), jnp.asarray(t[:, -1]), *args[:6],
        jnp.asarray(sr * wcut.real - si * wcut.imag),
        jnp.ones((L, 1)),
        jnp.asarray([igd.min()] * nl), jnp.asarray([zi.min()] * nl),
        nl, tl,
    )
    assert bool(np.asarray(far).any())

    # polarized variant
    pw = jnp.asarray(rng.uniform(-1.0, 1.0, (L, 7)))
    p_mp = np.asarray(voigt_sum_pol(f, *args, pw, multipole=True, **kw))
    p_dir = np.asarray(voigt_sum_pol(f, *args, pw, multipole=False, **kw))
    np.testing.assert_allclose(
        p_mp, p_dir, atol=3e-6 * np.abs(p_dir).max(), rtol=1e-4
    )


def test_coarse_far_field_matches_direct():
    """The coarse-grid far tier (smooth chi/psi blend + Laurent tail on a
    4x coarser grid + cubic Lagrange interpolation) equals the direct
    evaluation to the design budget (~2.8 (h_c/r0)^4 of the local tail),
    including the ByLine cutoff-subtraction edges, which stay in the
    direct tier by construction (NOTES_ROUND4 traps a + b)."""
    from arts_tpu.ops.voigt_kernel import voigt_sum

    rng = np.random.default_rng(17)
    L = 256
    f0 = np.sort(rng.uniform(-40e9, 40e9, L))
    igd = rng.uniform(2e-6, 4e-6, L)
    zi = rng.uniform(1e5, 1e9, L) * igd  # Doppler-ish to broad rows
    sr = rng.uniform(0.5, 2.0, L)
    si = rng.uniform(-0.2, 0.2, L)
    cut = np.where(rng.random(L) < 0.7, 25e9, 1e30)
    wcut = np.where(
        cut < 1e20,
        np.asarray(wofz(jnp.asarray(igd * np.minimum(cut, 1e12) + 1j * zi))),
        0.0,
    )
    f = jnp.linspace(-50e9, 50e9, 4096)

    args = [jnp.asarray(x) for x in (f0, igd, zi, sr, si, cut,
                                     wcut.real, wcut.imag)]
    kw = dict(tf=256, tl=16, n=24, nsub=2, interpret=True)
    y_c = np.asarray(voigt_sum(f, *args, coarse=4, **kw))
    y_dir = np.asarray(voigt_sum(f, *args, multipole=False, **kw))
    scale = np.abs(y_dir).max()
    assert scale > 0
    np.testing.assert_allclose(y_c, y_dir, atol=5e-6 * scale, rtol=1e-4)

    # the far classification must actually fire at this geometry
    from arts_tpu.ops.voigt_kernel import (
        _classify_visits,
        _pad_lines,
    )

    nf, tl_, tf_ = 4096 // 256, 16, 256
    nl = -(-L // tl_)
    padded = _pad_lines(nl, tl_, *args, jnp.ones((L, 1)))
    f0p, igdp, zip_, srp, sip, cutp, wcrp, wcip, pwp = padded
    swc = srp * wcrp - sip * wcip
    visit, _, mp, *_ = _classify_visits(
        f, f0p, igdp, zip_, srp, sip, cutp, swc, pwp,
        nf, tf_, nl, tl_, False, 12, 3.5, 2, coarse=4,
    )
    n_far = nf * nl - int(np.asarray(visit).sum())
    assert n_far > 0, "no (tile, block) pair classified far"
