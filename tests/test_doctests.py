"""Doctest tier (reference runs pytest --doctest-modules over src)."""
import doctest

import numpy  # noqa: F401
import pytest


@pytest.mark.parametrize("module_name", [
    "lightkurve_tpu.units",
    "lightkurve_tpu.time",
    "lightkurve_tpu.utils",
    "lightkurve_tpu.lightcurve",
    "lightkurve_tpu.periodogram",
])
def test_doctests(module_name):
    import importlib
    mod = importlib.import_module(module_name)
    results = doctest.testmod(mod, optionflags=doctest.ELLIPSIS
                              | doctest.NORMALIZE_WHITESPACE)
    assert results.failed == 0, f"{results.failed} doctest failures in " \
        f"{module_name}"
