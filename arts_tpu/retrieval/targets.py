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
    """Bijector between model space (leaf values) and retrieval space."""

    name = "id"

    def fwd(self, v, ref):
        return v

    def inv(self, x, ref):
        return x


class LogTransform(Transform):
    name = "log"

    def fwd(self, v, ref):
        return jnp.log(v)

    def inv(self, x, ref):
        return jnp.exp(x)


class RelTransform(Transform):
    """x = v / v_ref (reference profile), parity: jac_rel."""

    name = "rel"

    def fwd(self, v, ref):
        return v / ref

    def inv(self, x, ref):
        return x * ref


TRANSFORMS = {"id": Transform(), "log": LogTransform(), "rel": RelTransform()}


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
        return (
            TRANSFORMS[self.transform]
            if isinstance(self.transform, str)
            else self.transform
        )


@dataclasses.dataclass(frozen=True)
class StateMapping:
    """Flatten/unflatten a list of targets against a reference scene."""

    targets: Sequence[RetrievalTarget]
    ref_scene: Any  # frozen reference (transform anchors + non-retrieved leaves)

    def _refs(self):
        return [t.get(self.ref_scene) for t in self.targets]

    @property
    def sizes(self):
        return [int(r.size) for r in self._refs()]

    @property
    def n_state(self):
        return sum(self.sizes)

    def to_vector(self, scene):
        parts = [
            jnp.ravel(t.tf.fwd(t.get(scene), t.get(self.ref_scene)))
            for t in self.targets
        ]
        return jnp.concatenate(parts) if parts else jnp.zeros((0,))

    def to_scene(self, x, scene=None):
        scene = self.ref_scene if scene is None else scene
        off = 0
        for t, sz in zip(self.targets, self.sizes):
            ref = t.get(self.ref_scene)
            leaf = t.tf.inv(jnp.reshape(x[off : off + sz], ref.shape), ref)
            scene = t.set(scene, leaf)
            off += sz
        return scene
