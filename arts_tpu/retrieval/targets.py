"""Retrieval targets: map between a flattened state vector and Scene leaves.

Parity reference: /root/reference/src/core/jacobian/jacobian.h —
`JacobianTargets` (AtmTarget/SurfaceTarget/LineTarget/... each owning
x_start/x_size and update_model/update_state maps, with nonlinear
transforms rel/log/logrel/RH in jac_rel.* etc.).

TPU-native redesign: a target is (leaf accessor, transform bijector); the
state vector is the concatenation of transformed leaves.  Model updates
are functional (`dataclasses.replace` on the pytree); Jacobians in model
space come from autodiff of the composed map, so the reference's
update_jac chain-rule bookkeeping disappears.
"""

import dataclasses
from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp


class Transform:
    """Bijector between model space (leaf values) and retrieval space.

    `scene` is the pytree the leaf lives in, for transforms that couple to
    other state (RH needs T and p).  Shape-changing transforms (polyfit)
    are allowed: the state slice takes the shape of `fwd`'s output.
    """

    name = "id"

    def fwd(self, v, ref, scene=None):
        return v

    def inv(self, x, ref, scene=None):
        return x


class LogTransform(Transform):
    name = "log"

    def fwd(self, v, ref, scene=None):
        return jnp.log(v)

    def inv(self, x, ref, scene=None):
        return jnp.exp(x)


class RelTransform(Transform):
    """x = v / v_ref (reference profile), parity: jac_rel."""

    name = "rel"

    def fwd(self, v, ref, scene=None):
        return v / ref

    def inv(self, x, ref, scene=None):
        return x * ref


class LogRelTransform(Transform):
    """x = log(v / v_ref), parity: jac_logrel."""

    name = "logrel"

    def fwd(self, v, ref, scene=None):
        return jnp.log(v / ref)

    def inv(self, x, ref, scene=None):
        return ref * jnp.exp(x)


@dataclasses.dataclass(frozen=True)
class RHTransform(Transform):
    """Relative humidity: x = vmr * p / psat(T).

    Parity: jac_rh (src/core/jacobian/jac_rh.cc:10-95) — rhfwd multiplies
    the VMR by p/psat(T), rhinv by psat(T)/p, optionally clamping at 0.
    T and p are taken from the live scene each evaluation (as the reference
    reads the iterating AtmField), via the `atm` accessor.
    """

    name = "rh"
    psat: Callable[[Any], Any] = None  # T [K] -> saturation pressure [Pa]
    atm: Callable[[Any], Any] = lambda scene: scene.atm  # scene -> (has .t, .p)
    fix_negative: bool = True

    def fwd(self, v, ref, scene=None):
        a = self.atm(scene)
        out = v * a.p / self.psat(a.t)
        return jnp.maximum(out, 0.0) if self.fix_negative else out

    def inv(self, x, ref, scene=None):
        a = self.atm(scene)
        out = x * self.psat(a.t) / a.p
        return jnp.maximum(out, 0.0) if self.fix_negative else out


@dataclasses.dataclass(frozen=True)
class PolyFitTransform(Transform):
    """Additive polynomial over a grid: v = ref + sum_i x_i * t^i.

    Parity: jac_polyfit (src/core/jacobian/jac_polyfit.cc) — the state is
    the (order+1) coefficient vector of a polynomial correction on grid
    `grid` (the reference's `st` vector, e.g. the measurement's f-grid for
    error targets or sensor offsets); fwd is the least-squares fit of the
    deviation from the reference leaf.
    """

    name = "polyfit"
    grid: Any = None  # [N] abscissa (static; normalized internally)
    order: int = 1

    def _vander(self):
        t = jnp.asarray(self.grid)
        # normalize for conditioning (the fit is exactly equivalent in
        # exact arithmetic; the stored coefficients are in normalized t)
        t = (t - t.mean()) / jnp.maximum(jnp.ptp(t) / 2, 1e-300)
        return jnp.stack([t**i for i in range(self.order + 1)], axis=-1)

    def fwd(self, v, ref, scene=None):
        V = self._vander()
        coef, *_ = jnp.linalg.lstsq(V, jnp.ravel(v - ref))
        return coef

    def inv(self, x, ref, scene=None):
        V = self._vander()
        return ref + jnp.reshape(V @ x, jnp.shape(ref))


def saturation_pressure_water(t):
    """Murphy & Koop (2005) saturation vapor pressure over liquid water [Pa]
    (the standard choice for RH retrievals; smooth and differentiable)."""
    t = jnp.asarray(t)
    return jnp.exp(
        54.842763
        - 6763.22 / t
        - 4.210 * jnp.log(t)
        + 0.000367 * t
        + jnp.tanh(0.0415 * (t - 218.8))
        * (53.878 - 1331.22 / t - 9.44523 * jnp.log(t) + 0.014025 * t)
    )


TRANSFORMS = {
    "id": Transform(),
    "log": LogTransform(),
    "rel": RelTransform(),
    "logrel": LogRelTransform(),
    "rh": RHTransform(psat=saturation_pressure_water),
}


@dataclasses.dataclass(frozen=True)
class RetrievalTarget:
    """One retrieved quantity.

    get: scene -> leaf array; set: (scene, leaf) -> scene.
    transform: name in TRANSFORMS or a Transform instance.
    """

    name: str
    get: Callable[[Any], jax.Array]
    set: Callable[[Any, jax.Array], Any]
    transform: Any = "id"

    @property
    def tf(self) -> Transform:
        if isinstance(self.transform, str):
            from ..options import RetrievalTransform, check_option

            return TRANSFORMS[check_option(RetrievalTransform, self.transform)]
        return self.transform


@dataclasses.dataclass(frozen=True)
class StateMapping:
    """Flatten/unflatten a list of targets against a reference scene."""

    targets: Sequence[RetrievalTarget]
    ref_scene: Any  # frozen reference (transform anchors + non-retrieved leaves)

    def _refs(self):
        return [t.get(self.ref_scene) for t in self.targets]

    def _xshapes(self):
        # state-slice shape per target: the fwd image of the reference leaf
        # (equals the leaf shape except for shape-changing transforms such
        # as polyfit, where it is the coefficient vector)
        return [
            jnp.shape(t.tf.fwd(r, r, self.ref_scene))
            for t, r in zip(self.targets, self._refs())
        ]

    @property
    def sizes(self):
        import math

        return [math.prod(s) for s in self._xshapes()]

    @property
    def n_state(self):
        return sum(self.sizes)

    def to_vector(self, scene):
        parts = [
            jnp.ravel(t.tf.fwd(t.get(scene), t.get(self.ref_scene), scene))
            for t in self.targets
        ]
        return jnp.concatenate(parts) if parts else jnp.zeros((0,))

    def to_scene(self, x, scene=None):
        scene = self.ref_scene if scene is None else scene
        off = 0
        for t, sz, xsh in zip(self.targets, self.sizes, self._xshapes()):
            ref = t.get(self.ref_scene)
            leaf = t.tf.inv(jnp.reshape(x[off : off + sz], xsh), ref, scene)
            scene = t.set(scene, leaf)
            off += sz
        return scene
