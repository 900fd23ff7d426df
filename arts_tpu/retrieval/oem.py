"""Optimal Estimation (Rodgers MAP) retrieval: Gauss-Newton / Levenberg-
Marquardt driving an autodiff forward model.

Parity reference: /root/reference/src/m_oem.cc:51-240 (`OEM` WSM, methods
"li"/"gn"/"lm" and _cg variants) wrapping invlib's
MAP<...,Formulation::STANDARD>::compute (3rdparty/invlib/src/invlib/map.h:285)
with GN/LM optimizers (invlib/optimization/).  Outputs mirror the WSM:
fitted state, gain matrix, averaging kernel, chi2/diagnostics, lm history.

TPU-native redesign: the forward model is a jitted pure function and J is
jax.jacrev/jacfwd of it — no AgendaWrapper, no hand-mapped Jacobians.  The
normal equations run in jnp (state dims 1e2-1e4: one chip handles the
algebra; y and J arrive sharded over the measurement axis and the JtSeJ /
JtSe_dy contractions reduce with psum over the mesh, the XLA-collective
analogue of invlib's optional MPI row distribution, src/oem_mpi.h:24-38).
"""

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class OEMResult:
    x: jax.Array  # retrieved state
    y_fit: jax.Array  # forward model at x
    converged: bool
    n_iter: int
    cost: float  # total chi2 / n
    cost_y: float
    cost_x: float
    gain: Optional[jax.Array] = None  # G = (JtSeJ+Sa^-1)^-1 Jt Se^-1
    averaging_kernel: Optional[jax.Array] = None  # A = G J
    jac: Optional[jax.Array] = None
    lm_gamma_history: Optional[list] = None


def _solve_spd(Am, b, cg=False):
    if cg:
        # conjugate-gradient variant (invlib's *_cg methods; large n_state)
        x, _ = jax.scipy.sparse.linalg.cg(lambda v: Am @ v, b, maxiter=10 * b.shape[-1])
        return x
    cf = jax.scipy.linalg.cho_factor(Am)
    return jax.scipy.linalg.cho_solve(cf, b)


def oem(
    forward: Callable,
    x_a,
    y_obs,
    S_a,
    S_e,
    method: str = "gn",
    max_iter: int = 20,
    stop_dx: float = 0.01,
    lm_gamma_start: float = 10.0,
    lm_gamma_inc: float = 4.0,
    lm_gamma_dec: float = 5.0,
    lm_gamma_threshold: float = 1e-4,
    jac_mode: str = "auto",
    verbose: bool = False,
    formulation: str = "nform",
) -> OEMResult:
    """Run a MAP retrieval.

    forward: x -> y (jittable). method: "li" (one linear step), "gn", "lm",
    optionally with the invlib "_cg" suffix ("gn_cg"...) to solve the
    normal equations by conjugate gradients.
    stop_dx: convergence when dx' (JtSeJ + Sa^-1) dx / n_state < stop_dx
    (the Rodgers d_i^2 criterion, as invlib).
    formulation: "nform" solves the n x n state-space normal equations;
    "mform" the m x m measurement-space system x = x_a + Sa J^T (J Sa J^T
    + Se)^-1 (dy + J dx_a) — cheaper when m << n (invlib
    Formulation::{NFORM,MFORM} parity, 3rdparty/invlib/src/invlib/map.h).
    LM damping in mform scales Sa -> Sa/(1+gamma) (equivalent to the
    nform H + gamma Sa^-1).
    """
    from ..options import OemMethod, check_option

    check_option(OemMethod, method)
    use_cg = method.endswith("_cg")
    method = method.removesuffix("_cg")
    x_a = jnp.asarray(x_a)
    y_obs = jnp.asarray(y_obs)
    n = x_a.size
    m = y_obs.size

    # 1-D covariances are diagonal (variances): the m-axis algebra stays
    # elementwise, so a measurement vector sharded over the mesh never
    # materializes an m x m matrix — the psum-reduced contraction path
    S_a = jnp.asarray(S_a)
    S_e = jnp.asarray(S_e)
    diag_e = S_e.ndim == 1
    diag_a = S_a.ndim == 1
    Sa_inv = 1.0 / S_a if diag_a else jnp.linalg.inv(S_a)
    Se_inv = 1.0 / S_e if diag_e else jnp.linalg.inv(S_e)

    def SeI(v):  # Se^-1 @ v for vector [m] or matrix [m, k]
        return Se_inv.reshape((m,) + (1,) * (v.ndim - 1)) * v if diag_e else Se_inv @ v

    def SaI(v):
        return Sa_inv * v if diag_a else Sa_inv @ v

    Sa_inv_mat = jnp.diag(Sa_inv) if diag_a else Sa_inv

    if jac_mode == "auto":
        jac_mode = "fwd" if n <= m else "rev"
    jac_fn = jax.jit(
        jax.jacfwd(forward) if jac_mode == "fwd" else jax.jacrev(forward)
    )
    fwd_fn = jax.jit(forward)

    def cost_parts(x, y):
        dy = y - y_obs
        dx = x - x_a
        cy = float(dy @ SeI(dy))
        cx = float(dx @ SaI(dx))
        return cy, cx

    x = x_a
    y = fwd_fn(x)
    cy, cx = cost_parts(x, y)
    cost = (cy + cx) / m
    gamma = lm_gamma_start if method == "lm" else 0.0
    gamma_hist = []
    converged = False
    it = 0
    J = None

    def step_nform(J, JtSe, H, g, gamma):
        Hd = H + gamma * Sa_inv_mat  # Marquardt damping scaled by Sa^-1
        return _solve_spd(Hd, g, use_cg)

    def step_mform(J, y, gamma):
        # x+ = x_a + Sa_g J^T (J Sa_g J^T + Se)^-1 (dy + J (x - x_a)),
        # Sa_g = Sa/(1+gamma): identical to nform H + gamma Sa^-1
        Sa_g = S_a / (1.0 + gamma)
        K = Sa_g[:, None] * J.T if diag_a else Sa_g @ J.T
        rhs = (y_obs - y) + J @ (x - x_a)
        JK_Se = J @ K + (jnp.diag(S_e) if diag_e else S_e)
        lam = _solve_spd(JK_Se, rhs, use_cg)
        return (x_a + K @ lam) - x

    for it in range(1, max_iter + 1):
        J = jac_fn(x)
        JtSe = SeI(J).T  # [n, m]
        H = JtSe @ J + Sa_inv_mat  # curvature (no LM damping)
        g = JtSe @ (y_obs - y) - SaI(x - x_a)

        if method == "lm":
            accepted = False
            while not accepted:
                dx = (
                    step_mform(J, y, gamma)
                    if formulation == "mform"
                    else step_nform(J, JtSe, H, g, gamma)
                )
                x_try = x + dx
                y_try = fwd_fn(x_try)
                cy_t, cx_t = cost_parts(x_try, y_try)
                cost_try = (cy_t + cx_t) / m
                gamma_hist.append(float(gamma))
                if cost_try <= cost or gamma > 1e10:
                    accepted = True
                    gamma = (
                        0.0 if gamma <= lm_gamma_threshold else gamma / lm_gamma_dec
                    )
                else:
                    gamma = max(gamma, lm_gamma_threshold) * lm_gamma_inc
        else:
            dx = (
                step_mform(J, y, 0.0)
                if formulation == "mform"
                else _solve_spd(H, g, use_cg)
            )
            x_try = x + dx
            y_try = fwd_fn(x_try)
            cy_t, cx_t = cost_parts(x_try, y_try)
            cost_try = (cy_t + cx_t) / m

        # Rodgers convergence metric
        d2 = float(dx @ (H @ dx)) / n
        x, y, cy, cx, cost = x_try, y_try, cy_t, cx_t, cost_try
        if verbose:
            print(f"  oem iter {it}: cost={cost:.6e} d2={d2:.3e} gamma={gamma:.2e}")
        if method == "li":
            converged = True
            break
        if d2 < stop_dx:
            converged = True
            break

    # diagnostics at the solution
    J = jac_fn(x)
    JtSe = SeI(J).T
    H = JtSe @ J + Sa_inv_mat
    if formulation == "mform":
        K = S_a[:, None] * J.T if diag_a else S_a @ J.T
        JK_Se = J @ K + (jnp.diag(S_e) if diag_e else S_e)
        G = K @ jnp.linalg.inv(JK_Se)  # gain, measurement-space form
    else:
        G = _solve_spd(H, JtSe)  # gain matrix (measurement_gain_mat parity)
    A = G @ J  # averaging kernel (measurement_averaging_kernelCalc)

    return OEMResult(
        x=x,
        y_fit=y,
        converged=converged,
        n_iter=it,
        cost=cost,
        cost_y=cy / m,
        cost_x=cx / m,
        gain=G,
        averaging_kernel=A,
        jac=J,
        lm_gamma_history=gamma_hist or None,
    )


def smoothing_error_covariance(A, S_a):
    """(A - I) Sa (A - I)^T — Rodgers smoothing error."""
    I = jnp.eye(A.shape[0], dtype=A.dtype)
    return (A - I) @ jnp.asarray(S_a) @ (A - I).T


def retrieval_error_covariance(G, S_e):
    """G Se G^T — measurement-noise-induced retrieval covariance."""
    return G @ jnp.asarray(S_e) @ G.T
