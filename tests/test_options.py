"""Central option registry (arts_tpu/options.py) — the reference's
arts_options.cc enum families as str-enums, with uniform error messages
at the dispatch sites."""

import jax.numpy as jnp
import numpy as np
import pytest

from arts_tpu.options import (
    OemMethod,
    RetrievalTransform,
    RteOption,
    SpectralRadianceUnit,
    check_option,
)


def test_check_option_accepts_member_and_string():
    assert check_option(RteOption, "lintau") == "lintau"
    assert check_option(RteOption, RteOption.linprop) == "linprop"


def test_check_option_lists_choices():
    with pytest.raises(ValueError, match="constant, lintau, linprop"):
        check_option(RteOption, "lintua")


def test_emission_dispatch_rejects_typo():
    from arts_tpu.fwd import _emission_fn

    with pytest.raises(ValueError, match="RteOption"):
        _emission_fn("linear")


def test_oem_rejects_unknown_method():
    from arts_tpu.retrieval.oem import oem

    with pytest.raises(ValueError, match="OemMethod"):
        oem(lambda x: x, jnp.zeros(2), jnp.zeros(2),
            jnp.ones(2), jnp.ones(2), method="newton")


def test_unit_transform_rejects_unknown():
    from arts_tpu.operators import spectral_radiance_transform

    with pytest.raises(ValueError, match="SpectralRadianceUnit"):
        spectral_radiance_transform("Kelvin")


def test_retrieval_transform_rejects_unknown():
    from arts_tpu.retrieval.targets import RetrievalTarget

    t = RetrievalTarget(
        name="x", get=lambda s: s, set=lambda s, v: v, transform="lgo"
    )
    with pytest.raises(ValueError, match="RetrievalTransform"):
        _ = t.tf


def test_families_are_strings():
    assert OemMethod.gn == "gn"
    assert SpectralRadianceUnit.Tb == "Tb"
    assert "log" in RetrievalTransform.values()
