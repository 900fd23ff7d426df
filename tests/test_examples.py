"""Every example runs green (the reference registers examples as ctests,
cmake/modules/ArtsTestcases.cmake; same policy here)."""

import pathlib
import runpy
import sys

import pytest

EXAMPLES = sorted(
    (pathlib.Path(__file__).parents[1] / "examples").glob("*.py")
)


@pytest.mark.parametrize("path", EXAMPLES, ids=lambda p: p.stem)
def test_example_runs(path):
    mod = runpy.run_path(str(path))
    mod["main"]()
