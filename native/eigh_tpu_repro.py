"""Reduced repro: TPU f32 DISORT through the XLA path is not
radiance-grade — and the cause is TWO-fold, not the eigh custom call
alone as round 4 concluded.

Round-4 finding: routing TPU f32 DISORT through the XLA path produced
u0 errors up to several 100% on heterogeneous layers vs CPU truth,
while the fused Mosaic path stayed at ~1e-3.  Round-5 bisect of that
exact config (tests/test_tpu_compiled.py's random heterogeneous
layers, u0 max-rel error vs CPU LAPACK f32):

    XLA path, default matmul precision            5.20
    XLA path + Jacobi eigh, default precision     5.17
    pure-jnp path (NO custom calls), default      5.16   <- not eigh!
    XLA path, matmul precision=highest            0.146  <- mostly bf16
    XLA path + Jacobi eigh, precision=highest     0.0014 <- eigh is the rest
    pure-jnp fast path, precision=highest         0.0012
    fused Mosaic path                             0.0015

So: (1) the DOMINANT cause is the TPU MXU's default bf16 matmul
precision leaking into every einsum of the solve — `arts_tpu` now sets
`jax_default_matmul_precision="highest"` at import (see __init__.py);
(2) the f32 `jnp.linalg.eigh` custom call still contributes a 100x u0
error on top (0.146 vs 0.0014) and is avoided on every non-CPU backend
(`disort/solver.py::_eigen` routes to the Jacobi sweep).  Note the LU
`jnp.linalg.solve` and `jnp.linalg.cholesky` custom calls are fine at
f32 (the 0.0014 row still uses them).

The script also isolates the eigensolver itself: it builds the exact
batch of symmetric matrices DISORT diagonalizes (Hsym = -L^T H2 L from
a strongly heterogeneous cloud profile, the same construction as
`disort/solver.py::_eigen`), runs `jnp.linalg.eigh` on the default
backend at f32, and scores the DECOMPOSITION residuals against what any
valid eigendecomposition must satisfy:

    recon  = max ||V diag(e) V^T - H|| / ||H||      (reconstruction)
    ortho  = max ||V^T V - I||                       (orthogonality)

plus the eigenvalue error vs CPU f64.  On CPU both residuals sit at
~1e-6 (f32 roundoff); on the TPU backend the custom call has produced
residuals orders of magnitude larger on a subset of layers — which is
the direct cause of the u0 errors, since DISORT trusts V to invert the
modal expansion.  Run with no args:

    timeout 600 python native/eigh_tpu_repro.py          # default backend
    JAX_PLATFORMS=cpu python native/eigh_tpu_repro.py    # CPU control

`arts_tpu` mitigates both causes (import-time matmul precision +
backend-aware eigh routing — regression-tested in
tests/test_disort.py::test_tpu_f32_never_uses_xla_eigh).  This file is
the checked-in evidence for an upstream XLA issue report.
"""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def build_disort_hsym(n_freq=256, nquad=16, dtype=None):
    """The [F, M, L, N, N] symmetric eigenproblem batch of the bench
    scene's DISORT stage (heterogeneous: clear + cloud + near-opaque
    layers), via the same algebra as disort/solver.py::_eigen."""
    import jax.numpy as jnp

    from arts_tpu.disort.quadrature import double_gauss, lambda_tables
    from arts_tpu.fwd_allsky import gas_absorption_profile
    from bench import build_scene

    scene, f_grid = build_scene()
    f_grid = f_grid[:: max(1, f_grid.shape[0] // n_freq)]
    if dtype is not None:
        f_grid = f_grid.astype(dtype)

    # layer (tau, omega, leg) exactly as simulate_allsky builds them
    z = scene.atm.z[::-1]
    pts = scene.atm.at(z)
    k_gas = gas_absorption_profile(scene, f_grid, backend="xla")
    k_ext = k_gas
    k_sca = jnp.zeros_like(k_gas)
    nleg = nquad
    leg_w = jnp.zeros(k_gas.shape + (nleg,))
    from arts_tpu.fwd_allsky import _scatterer_profiles

    for sc in scene.scatterers:
        e, s, lg = _scatterer_profiles(sc, f_grid, z, pts.t, nleg)
        k_ext = k_ext + e
        k_sca = k_sca + s
        leg_w = leg_w + lg
    dz = -jnp.diff(z)
    lay = lambda a: 0.5 * (a[..., 1:] + a[..., :-1])
    tau = lay(k_ext) * dz
    ksca_l = lay(k_sca) * dz
    omega = jnp.where(tau > 0, ksca_l / jnp.maximum(tau, 1e-300), 0.0)
    legl = lay(jnp.moveaxis(leg_w, -1, 0)) * dz
    leg = jnp.moveaxis(
        jnp.where(ksca_l > 0, legl / jnp.maximum(ksca_l, 1e-300), 0.0), 0, -1
    )
    leg = leg.at[..., 0].set(1.0)

    N = nquad // 2
    mu, w = double_gauss(N)
    lam, sign = lambda_tables(1, nquad, N)
    mu = jnp.asarray(mu, tau.dtype)
    w = jnp.asarray(w, tau.dtype)
    lam = jnp.asarray(lam, tau.dtype)
    sign = jnp.asarray(sign, tau.dtype)
    ls = jnp.arange(nquad, dtype=tau.dtype)
    omega_c = jnp.clip(omega, 0.0, 1.0 - 1e-9)
    leg_scaled = (2.0 * ls + 1.0) * leg[..., :nquad]

    def hsym_one(leg_f, om_f):
        Pp = jnp.einsum("lk,mki,mkj->mlij", leg_f, lam, lam)
        Pm = jnp.einsum("lk,mk,mki,mkj->mlij", leg_f, sign, lam, lam)
        c = 0.5 * om_f
        inv_w = 1.0 / w
        Fq = jnp.sqrt(w / mu)
        cPp = c[None, :, None, None] * Pp
        cPm = c[None, :, None, None] * Pm
        S1 = cPp - cPm - jnp.diag(inv_w)
        S2 = cPp + cPm - jnp.diag(inv_w)
        H1 = Fq[:, None] * S1 * Fq[None, :]
        H2 = Fq[:, None] * S2 * Fq[None, :]
        Lc = jnp.linalg.cholesky(-H1)
        return -jnp.einsum("...ji,...jk,...kl->...il", Lc, H2, Lc)

    import jax

    return jax.vmap(hsym_one)(leg_scaled, omega_c)  # [F, M, L, N, N]


def score(H, e, V):
    """(recon, ortho) residuals of the claimed eigendecomposition."""
    H = np.asarray(H, np.float64)
    e = np.asarray(e, np.float64)
    V = np.asarray(V, np.float64)
    recon = np.einsum("...ij,...j,...kj->...ik", V, e, V) - H
    scale = np.abs(H).reshape(H.shape[:-2] + (-1,)).max(-1)
    recon_r = np.abs(recon).max((-2, -1)) / np.maximum(scale, 1e-30)
    eye = np.eye(V.shape[-1])
    ortho = np.abs(np.einsum("...ji,...jk->...ik", V, V) - eye).max((-2, -1))
    return recon_r, ortho


def main():
    import jax
    import jax.numpy as jnp

    backend = jax.default_backend()
    print(f"backend: {backend}")
    H = build_disort_hsym()
    H32 = jnp.asarray(H, jnp.float32)

    e32, V32 = jax.jit(jnp.linalg.eigh)(H32)
    recon, ortho = score(H32, e32, V32)
    print(
        f"xla eigh f32 [{backend}]: recon max={recon.max():.3e} "
        f"p99={np.quantile(recon, 0.99):.3e}; ortho max={ortho.max():.3e}"
    )

    from arts_tpu.ops.eigh_jacobi import eigh_jacobi

    ej, Vj = jax.jit(eigh_jacobi)(H32)
    recon_j, ortho_j = score(H32, ej, Vj)
    print(
        f"jacobi f32 [{backend}]:   recon max={recon_j.max():.3e} "
        f"p99={np.quantile(recon_j, 0.99):.3e}; ortho max={ortho_j.max():.3e}"
    )

    # CPU f64 truth for the eigenvalues
    ecpu = np.linalg.eigvalsh(np.asarray(H, np.float64))
    esc = np.abs(ecpu).max()
    print(
        f"eigenvalue err vs CPU f64: xla={np.abs(np.asarray(e32) - ecpu).max() / esc:.3e} "
        f"jacobi={np.abs(np.asarray(ej) - ecpu).max() / esc:.3e}"
    )
    bad = recon > 10.0 * max(recon_j.max(), 1e-7)
    print(
        f"layers where the XLA custom call is >10x worse than Jacobi: "
        f"{int(bad.sum())} / {bad.size}"
    )

    # end-to-end amplification on the round-4 failing config (random
    # heterogeneous layers): u0 through (a) the library's current XLA
    # path (precision=highest + Jacobi eigh routing — expect ~1e-3) and
    # (b) the hazard forced back on (the f32 eigh custom call; expect
    # ~0.15 even at highest precision; run with
    # ARTS_TPU_MATMUL_PRECISION=default to see the full 5.2).
    import unittest.mock as mock

    import jax

    import arts_tpu.disort.solver as solver
    from arts_tpu.disort import DisortInput, disort

    rng = np.random.default_rng(2)
    Fn, L = 64, 24
    nleg = 16
    f32 = lambda x: np.asarray(x, np.float32)
    inp = DisortInput(
        tau=f32(rng.uniform(0.02, 0.6, (Fn, L))),
        omega=f32(rng.uniform(0.1, 0.9, (Fn, L))),
        leg=f32(np.broadcast_to(0.7 ** np.arange(nleg), (Fn, L, nleg))),
        f=np.zeros((Fn, L), np.float32),
        b_levels=f32(rng.uniform(1e-13, 5e-13, (Fn, L + 1))),
        fbeam=np.zeros((Fn,), np.float32),
        fisot=np.zeros((Fn,), np.float32),
        albedo=np.full((Fn,), 0.3, np.float32),
        b_surf=np.full((Fn,), 5e-13, np.float32),
        b_top=np.zeros((Fn,), np.float32),
    )
    solve = lambda i, fl: disort.__wrapped__(
        i, nquad=16, nleg=nleg, nfourier=1, fast_linalg=fl
    )
    cpu = jax.devices("cpu")[0]
    inp_cpu = jax.tree_util.tree_map(lambda x: jax.device_put(x, cpu), inp)
    with jax.default_device(cpu):
        u0_cpu = np.asarray(
            jax.jit(jax.vmap(lambda i: solve(i, False)))(inp_cpu).u0
        )
    u0_lib = np.asarray(jax.jit(jax.vmap(lambda i: solve(i, False)))(inp).u0)
    force_eigh = lambda A: tuple(jnp.linalg.eigh(A))
    with mock.patch.object(solver, "eigh_jacobi", force_eigh):
        u0_bad = np.asarray(
            jax.jit(jax.vmap(lambda i: solve(i, False)))(inp).u0
        )
    rel = lambda a: np.abs(a - u0_cpu).max() / np.abs(u0_cpu).max()
    print(f"full-DISORT u0 [{backend}] vs CPU, library XLA path: {rel(u0_lib):.3e}")
    print(f"full-DISORT u0 [{backend}] vs CPU, eigh custom call forced: {rel(u0_bad):.3e}")


if __name__ == "__main__":
    main()
