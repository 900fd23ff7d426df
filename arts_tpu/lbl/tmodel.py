"""Line-shape parameter temperature laws, vectorized.

Parity reference: /root/reference/src/core/lbl/lbl_temperature_model.h
(laws T0..T5, AER, DPL, POLY) and lbl_lineshape_model.cpp (pressure scaling
and VMR mixing).  The reference dispatches per-line via virtual maps; here
every (line, perturber, variable) slot carries a law id + up-to-4
coefficients and all laws are evaluated densely with a `jnp.select` — the
TPU-friendly form (no data-dependent control flow, fuses into one VPU pass).

Derivatives: none hand-written — JAX autodiff differentiates the laws.
"""

from enum import IntEnum

import jax.numpy as jnp


class Law(IntEnum):
    NONE = 0  # value 0 (absent variable)
    T0 = 1
    T1 = 2
    T2 = 3
    T3 = 4
    T4 = 5
    T5 = 6
    AER = 7
    DPL = 8
    POLY = 9


def eval_law(law, x, t0, t):
    """Evaluate temperature laws.

    law: int array [...], x: [..., 4] coefficients, t0: [...] reference T,
    t: scalar or broadcastable temperature. Returns [...].
    """
    x0, x1, x2, x3 = x[..., 0], x[..., 1], x[..., 2], x[..., 3]
    tr = t0 / t  # T0/T
    # guard pow against nonpositive/zero bases where unused
    safe_tr = jnp.where(tr > 0, tr, 1.0)
    log_tr = jnp.log(safe_tr)

    v_t0 = x0
    v_t1 = x0 * safe_tr**x1
    v_t2 = x0 * safe_tr**x1 * (1.0 + x2 * (-log_tr))
    v_t3 = x0 + x1 * (t - t0)
    v_t4 = (x0 + x1 * (tr - 1.0)) * safe_tr**x2
    v_t5 = x0 * safe_tr ** (0.25 + 1.5 * x1)
    v_dpl = x0 * safe_tr**x1 + x2 * safe_tr**x3
    v_poly = x0 + t * (x1 + t * (x2 + t * x3))
    # AER: piecewise-linear in T over the (200, 250, 296, 340) K knots
    v_aer = jnp.where(
        t < 250.0,
        x0 + (t - 200.0) * (x1 - x0) / 50.0,
        jnp.where(
            t > 296.0,
            x2 + (t - 296.0) * (x3 - x2) / 44.0,
            x1 + (t - 250.0) * (x2 - x1) / 46.0,
        ),
    )

    law = jnp.asarray(law)
    return jnp.select(
        [
            law == Law.T0,
            law == Law.T1,
            law == Law.T2,
            law == Law.T3,
            law == Law.T4,
            law == Law.T5,
            law == Law.AER,
            law == Law.DPL,
            law == Law.POLY,
        ],
        [v_t0, v_t1, v_t2, v_t3, v_t4, v_t5, v_aer, v_dpl, v_poly],
        default=jnp.zeros_like(v_t0),
    )


# Line-shape variables, order fixed across the catalog arrays.
# Parity: LineShapeModelVariable enum; pressure scaling from
# lbl_lineshape_model.cpp:27-35 (G,DV scale as P^2; ETA as 1; rest as P).
VARS = ("G0", "D0", "G2", "D2", "ETA", "FVC", "Y", "G", "DV")
NV = len(VARS)
IG0, ID0, IG2, ID2, IETA, IFVC, IY, IG, IDV = range(NV)
# exponent of pressure per variable
P_POW = jnp.array([1, 1, 1, 1, 0, 1, 1, 2, 2], dtype=jnp.int32)
