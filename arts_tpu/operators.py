"""Unit-transform operators for spectral radiance.

Parity reference: /root/reference/src/core/operators/
spectral_radiance_transform_operator.cc — `SpectralRadianceTransformOperator`
applying a unit conversion (raw, Planck Tb, Rayleigh-Jeans Tb, W/(m2 sr))
to the radiance *and consistently to its Jacobian* (chain rule).

Here the transform is a differentiable function, so applying it before
autodiff transforms the Jacobian automatically; `transform_with_jacobian`
exists for pre-computed (I, dI) pairs like the reference's signature.
"""

import jax
import jax.numpy as jnp

from .ops.planck import inv_planck, rayleigh_jeans


def spectral_radiance_transform(option: str):
    """Returns f(I, freq) -> transformed radiance. Options as the
    reference's SpectralRadianceUnitType: 'raw', 'Tb' (Planck), 'RJBT'."""
    from .options import SpectralRadianceUnit, check_option

    check_option(SpectralRadianceUnit, option)
    if option in ("raw", "1"):
        return lambda I, f: I
    if option == "Tb":
        return lambda I, f: inv_planck(I, f)
    return lambda I, f: rayleigh_jeans(I, f)


def transform_with_jacobian(option, I, dI, f_grid):
    """(I', dI') with the Jacobian chain rule applied. I: [F]; dI: [NQ, F]
    (per-target rows, the reference's measurement_jac layout)."""
    tf = spectral_radiance_transform(option)
    Iprime = tf(I, f_grid)
    # elementwise chain rule: dT/dI at each frequency
    scale = jax.vmap(jax.grad(lambda x, ff: tf(x, ff)))(I, f_grid)
    return Iprime, dI * scale[None, :]
