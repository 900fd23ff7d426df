"""Batched symmetric eigendecomposition via parallel cyclic Jacobi.

XLA's `eigh` lowers to a sequential custom call that is very slow for
huge batches of tiny matrices (the DISORT per-layer-per-frequency 8x8
problems: ~240k matrices at 4096 frequencies).  Two tiers here, both
converging to the same residual as jnp.linalg.eigh:

* `eigh_jacobi` (default): struct-of-arrays cyclic Jacobi — the batch is
  moved to the LAST axis so every Givens rotation is an elementwise op
  over the whole batch with static (p, q) indices; a round rebuilds the
  n rows / n columns by stacking [n, B] slices.  No tiny matmuls, no
  scattered rotation-matrix assembly (the original formulation built
  full Q matrices and paid 3 batched n x n matmuls per round — 6x
  slower on TPU and, measured, 10x less accurate in f32).
* `eigh_jacobi_pallas`: the same rotation schedule fused into one Pallas
  TPU kernel — a batch tile of matrices lives in VMEM as [n, n, BT]
  (lanes = batch) across ALL sweeps, so HBM sees each matrix exactly
  once in and once out instead of once per round.

Accuracy: quadratic convergence; `sweeps=6` (f32) / 8 (f64) reaches the
eigh residual for n <= 16.  Ordering matches jnp.linalg.eigh (ascending).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def _tournament(n: int):
    """Round-robin schedule: list of rounds, each a list of disjoint (p,q).

    Odd n uses the standard bye construction — schedule n+1 players and
    drop pairs involving the dummy — so ALL C(n,2) pairs are covered (the
    naive n-1-round circle method silently skips pairs for odd n, which
    left some Jacobi off-diagonals never rotated and stalled convergence).
    """
    if n % 2:
        return [
            [(p, q) for (p, q) in r if p < n and q < n]
            for r in _tournament(n + 1)
        ]
    players = list(range(n))
    rounds = []
    for _ in range(n - 1):
        pairs = [
            (min(players[i], players[n - 1 - i]), max(players[i], players[n - 1 - i]))
            for i in range(n // 2)
        ]
        rounds.append(pairs)
        players = [players[0]] + [players[-1]] + players[1:-1]
    return rounds


def _rot_cs(app, aqq, apq):
    """(c, s) of the Jacobi rotation zeroing apq, division-safe.

    Algebraically identical to the textbook
    t = sign(theta)/(|theta| + sqrt(theta^2 + 1)), theta = d/(2 apq),
    but NEVER divides by apq:
        t = 2 apq sign(d) / (|d| + sqrt(d^2 + 4 apq^2)),  d = aqq - app.
    The old exact-zero guard on apq produced NaN under the TPU x64
    rewriter's double-double f64 emulation, where a subnormal apq
    compares nonzero while 2*apq flushes to zero (theta = d/0 with
    d also flushed -> 0/0); found by the on-chip f64 DISORT probe.
    """
    d = aqq - app
    denom = jnp.abs(d) + jnp.sqrt(d * d + 4.0 * apq * apq)
    safe = jnp.where(denom > 0.0, denom, 1.0)
    t = jnp.where(denom > 0.0, 2.0 * apq * jnp.sign(d) / safe, 0.0)
    c = 1.0 / jnp.sqrt(t * t + 1.0)
    return c, t * c


def _rotation_angles(M, pairs):
    """(c, s) per pair from the current [n, n, B] matrix."""
    return [_rot_cs(M[p, p], M[q, q], M[p, q]) for p, q in pairs]


def _jacobi_round(M, V, pairs):
    """One tournament round of disjoint rotations on [n, n, B] values."""
    n = M.shape[0]
    cs = _rotation_angles(M, pairs)
    rows = list(M)
    for (p, q), (c, s) in zip(pairs, cs):
        rp, rq = rows[p], rows[q]
        rows[p] = c * rp - s * rq
        rows[q] = s * rp + c * rq
    M = jnp.stack(rows, 0)
    cols = [M[:, j] for j in range(n)]
    vcols = [V[:, j] for j in range(n)]
    for (p, q), (c, s) in zip(pairs, cs):
        cp, cq = cols[p], cols[q]
        cols[p] = c * cp - s * cq
        cols[q] = s * cp + c * cq
        vp, vq = vcols[p], vcols[q]
        vcols[p] = c * vp - s * vq
        vcols[q] = s * vp + c * vq
    return jnp.stack(cols, 1), jnp.stack(vcols, 1)


def _default_sweeps(dtype):
    return 6 if dtype == jnp.float32 else 8


def eigh_jacobi(A, sweeps: int | None = None):
    """(w, V) with A = V diag(w) V^T; A: [..., n, n] symmetric.

    Drop-in for jnp.linalg.eigh on small n (ascending eigenvalues).
    Dispatches to the fused Pallas kernel on TPU backends.
    """
    # Mosaic rejects kernels traced under x64 mode (even f32 ones), so
    # f64-on-TPU runs take the portable jnp tier.  The TPU/portable
    # choice is made at LOWERING time (lax.platform_dependent), not from
    # jax.default_backend(): in a TPU session a computation pinned to the
    # CPU device (device_put inputs / jax.default_device) still lowers
    # for cpu, where the Pallas kernel cannot compile.
    if A.shape[-1] <= 16 and not jax.config.jax_enable_x64:
        import functools

        return jax.lax.platform_dependent(
            A,
            tpu=functools.partial(eigh_jacobi_pallas, sweeps=sweeps),
            default=functools.partial(eigh_jacobi_soa, sweeps=sweeps),
        )
    return eigh_jacobi_soa(A, sweeps)


def eigh_jacobi_soa(A, sweeps: int | None = None):
    """Struct-of-arrays cyclic Jacobi (portable JAX tier)."""
    if sweeps is None:
        sweeps = _default_sweeps(A.dtype)
    n = A.shape[-1]
    batch = A.shape[:-2]
    B = int(np.prod(batch)) if batch else 1
    dt = A.dtype
    M = jnp.moveaxis(A.reshape((B, n, n)), 0, -1)  # [n, n, B]
    V = jnp.broadcast_to(jnp.eye(n, dtype=dt)[..., None], (n, n, B))
    rounds = _tournament(n)

    for _ in range(sweeps):
        for pairs in rounds:
            M, V = _jacobi_round(M, V, pairs)

    wdiag = jnp.stack([M[i, i] for i in range(n)], 0)  # [n, B]
    order = jnp.argsort(wdiag, axis=0)
    w = jnp.take_along_axis(wdiag, order, axis=0)
    Vs = jnp.take_along_axis(V, order[None, :, :], axis=1)
    w_out = jnp.moveaxis(w, -1, 0).reshape(batch + (n,))
    V_out = jnp.moveaxis(Vs, -1, 0).reshape(batch + (n, n))
    return w_out, V_out


def _jacobi_kernel(a_ref, w_ref, v_ref, *, n, sweeps):
    """Fully scalarized Jacobi on [n*n, S, 128] vreg tiles.

    Each matrix entry lives as one (S, 128) tile (native VPU register
    shape); every rotation is a handful of elementwise tile ops with
    static indices — no relayouts, gathers, or small matmuls inside the
    sweep loop.
    """
    A = [[a_ref[i * n + j] for j in range(n)] for i in range(n)]
    one = jnp.ones_like(A[0][0])
    zero = jnp.zeros_like(one)
    V = [[one if i == j else zero for j in range(n)] for i in range(n)]
    rounds = _tournament(n)

    def flat(MV):
        M, V = MV
        return tuple(M[i][j] for i in range(n) for j in range(n)) + tuple(
            V[i][j] for i in range(n) for j in range(n)
        )

    def unflat(t):
        return (
            [[t[i * n + j] for j in range(n)] for i in range(n)],
            [[t[n * n + i * n + j] for j in range(n)] for i in range(n)],
        )

    def sweep(_, t):
        M, V = unflat(t)
        for pairs in rounds:
            cs = [_rot_cs(M[p][p], M[q][q], M[p][q]) for p, q in pairs]
            for (p, q), (c, s) in zip(pairs, cs):
                for j in range(n):
                    mp, mq = M[p][j], M[q][j]
                    M[p][j] = c * mp - s * mq
                    M[q][j] = s * mp + c * mq
            for (p, q), (c, s) in zip(pairs, cs):
                for i in range(n):
                    mp, mq = M[i][p], M[i][q]
                    M[i][p] = c * mp - s * mq
                    M[i][q] = s * mp + c * mq
                    vp, vq = V[i][p], V[i][q]
                    V[i][p] = c * vp - s * vq
                    V[i][q] = s * vp + c * vq
        return flat((M, V))

    t = jax.lax.fori_loop(0, sweeps, sweep, flat((A, V)))
    M, V = unflat(t)
    for i in range(n):
        w_ref[i] = M[i][i]
        for j in range(n):
            v_ref[i * n + j] = V[i][j]


@functools.partial(jax.jit, static_argnames=("sweeps", "sub"))
def eigh_jacobi_pallas(A, sweeps: int | None = None, sub: int = 16):
    """Fused single-pass Jacobi: all sweeps execute in VMEM per batch tile.

    sub: sublane count of the batch tile (tile = sub*128 matrices; VMEM
    use ~ 2 * n^2 * sub * 128 * 4 bytes plus temporaries).
    """
    from jax.experimental import pallas as pl

    if sweeps is None:
        sweeps = _default_sweeps(A.dtype)
    n = A.shape[-1]
    batch = A.shape[:-2]
    B = int(np.prod(batch)) if batch else 1
    dt = A.dtype
    bt = sub * 128

    M = jnp.moveaxis(A.reshape((B, n, n)), 0, -1).reshape(n * n, B)
    nb = -(-B // bt)
    padB = nb * bt - B
    if padB:
        # pad with identity matrices to keep rotations well-defined
        eye = jnp.eye(n, dtype=dt).reshape(n * n, 1)
        M = jnp.concatenate([M, jnp.broadcast_to(eye, (n * n, padB))], -1)
    M = M.reshape(n * n, nb * sub, 128)

    w_flat, V_flat = pl.pallas_call(
        functools.partial(_jacobi_kernel, n=n, sweeps=sweeps),
        grid=(nb,),
        in_specs=[pl.BlockSpec((n * n, sub, 128), lambda i: (0, i, 0))],
        out_specs=[
            pl.BlockSpec((n, sub, 128), lambda i: (0, i, 0)),
            pl.BlockSpec((n * n, sub, 128), lambda i: (0, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, nb * sub, 128), dt),
            jax.ShapeDtypeStruct((n * n, nb * sub, 128), dt),
        ],
    )(M)

    wdiag = w_flat.reshape(n, -1)[:, :B]
    V = V_flat.reshape(n, n, -1)[:, :, :B]
    order = jnp.argsort(wdiag, axis=0)
    w = jnp.take_along_axis(wdiag, order, axis=0)
    Vs = jnp.take_along_axis(V, order[None, :, :], axis=1)
    w_out = jnp.moveaxis(w, -1, 0).reshape(batch + (n,))
    V_out = jnp.moveaxis(Vs, -1, 0).reshape(batch + (n, n))
    return w_out, V_out
