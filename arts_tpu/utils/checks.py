"""NaN policing and runtime validation helpers.

Parity reference: the reference's convention-based thread safety and
ARTS_USER_ERROR_IF input validation (src/core/util/debug.h); under jit the
equivalents are jax.debug/checkify.  SURVEY.md section 5: "jit purity makes
[race detection] moot; add jax.debug/checkify for NaN policing instead."
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import checkify


def check_finite(x, name="value"):
    """checkify-able finiteness assertion usable inside jitted code."""
    checkify.check(jnp.all(jnp.isfinite(x)), f"non-finite values in {name}")
    return x


def checked(fn):
    """Wrap a jittable function so NaN/inf in its outputs raise on host.

    Usage: err, out = checked(simulate)(args...); err.throw()
    """

    @functools.wraps(fn)
    def inner(*args, **kwargs):
        def body(*a, **k):
            out = fn(*a, **k)
            leaves = jax.tree_util.tree_leaves(out)
            for i, leaf in enumerate(leaves):
                if jnp.issubdtype(jnp.asarray(leaf).dtype, jnp.floating):
                    check_finite(leaf, f"output[{i}]")
            return out

        return checkify.checkify(body)(*args, **kwargs)

    return inner
