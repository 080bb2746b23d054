"""Mirrors reference tests/seismology/test_stellar_estimators.py.

Reference values (a typical red giant): M=1.30±0.09 M☉, R=9.91±0.24 R☉,
logg=2.559±0.009 dex from numax=46.12 µHz, Δν=4.934 µHz, Teff=4531 K.
"""
import numpy as np

from lightkurve_tpu.seismology.stellar_estimators import (
    DELTANU_SOL, G_SOL, NUMAX_SOL, TEFF_SOL, estimate_logg, estimate_mass,
    estimate_radius)
from lightkurve_tpu.units import Quantity, uHz, K

cM = (1.30, 0.09)
cR = (9.91, 0.24)
clogg = (2.559, 0.009)
ceteff = 80
cenumax = 0.75
cedeltanu = 0.012
cteff = 4531
cnumax = 46.12
cdeltanu = 4.934


def assert_correct_answer(quantity, reference):
    assert np.isclose(float(quantity.value), reference[0], atol=reference[1])
    assert np.isclose(float(quantity.error.value), reference[1], atol=0.1)


def test_constants():
    """Solar reference parameters (reference
    stellar_estimators.py:15-18)."""
    assert NUMAX_SOL.n == 3090.0
    assert NUMAX_SOL.s == 30.0
    assert DELTANU_SOL.n == 135.1
    assert DELTANU_SOL.s == 0.1
    assert TEFF_SOL.n == 5772.0
    assert TEFF_SOL.s == 0.8
    assert np.isclose(float(G_SOL.value), 27420)
    assert str(G_SOL.unit) == "cm / s2"


def test_estimate_radius_basic():
    R = estimate_radius(cnumax, cdeltanu, cteff)
    assert str(R.unit) == "solRad"
    assert np.isclose(float(R.value), cR[0], rtol=cR[1])
    # unit-carrying inputs
    R = estimate_radius(Quantity(cnumax, uHz), cdeltanu, cteff)
    assert np.isclose(float(R.value), cR[0], rtol=cR[1])
    R = estimate_radius(cnumax, Quantity(cdeltanu, uHz), cteff)
    assert np.isclose(float(R.value), cR[0], rtol=cR[1])
    R = estimate_radius(cnumax, cdeltanu, Quantity(cteff, K))
    assert np.isclose(float(R.value), cR[0], rtol=cR[1])
    # a random selection of appropriate units
    R = estimate_radius(Quantity(Quantity(cnumax, uHz).to("1/d"), "1/d"),
                        Quantity(Quantity(cdeltanu, uHz).to("Hz"), "Hz"),
                        cteff)
    assert np.isclose(float(R.value), cR[0], rtol=cR[1])


def test_estimate_radius_kwargs():
    R = estimate_radius(cnumax, cdeltanu, cteff, cenumax, cedeltanu, ceteff)
    assert R.error is not None
    # partial errors: input errors are ignored but the solar reference
    # uncertainties still propagate (error is never None)
    t = estimate_radius(cnumax, cdeltanu, cteff, cenumax, cedeltanu)
    assert t.error is not None
    assert str(R.unit) == "solRad"
    assert str(R.error.unit) == "solRad"
    assert_correct_answer(R, cR)
    R = estimate_radius(cnumax, cdeltanu, cteff, Quantity(cenumax, uHz),
                        cedeltanu, ceteff)
    assert_correct_answer(R, cR)
    R = estimate_radius(cnumax, cdeltanu, cteff, cenumax,
                        Quantity(cedeltanu, uHz), ceteff)
    assert_correct_answer(R, cR)
    R = estimate_radius(cnumax, cdeltanu, cteff, cenumax, cedeltanu,
                        Quantity(ceteff, K))
    assert_correct_answer(R, cR)


def test_estimate_mass_basic():
    M = estimate_mass(cnumax, cdeltanu, cteff)
    assert str(M.unit) == "solMass"
    assert np.isclose(float(M.value), cM[0], rtol=cM[1])
    M = estimate_mass(Quantity(cnumax, uHz), cdeltanu, cteff)
    assert np.isclose(float(M.value), cM[0], rtol=cM[1])
    M = estimate_mass(cnumax, Quantity(cdeltanu, uHz), cteff)
    assert np.isclose(float(M.value), cM[0], rtol=cM[1])
    M = estimate_mass(cnumax, cdeltanu, Quantity(cteff, K))
    assert np.isclose(float(M.value), cM[0], rtol=cM[1])


def test_estimate_mass_kwargs():
    M = estimate_mass(cnumax, cdeltanu, cteff, cenumax, cedeltanu, ceteff)
    assert str(M.unit) == "solMass"
    assert str(M.error.unit) == "solMass"
    assert_correct_answer(M, cM)
    M = estimate_mass(cnumax, cdeltanu, cteff, Quantity(cenumax, uHz),
                      cedeltanu, ceteff)
    assert_correct_answer(M, cM)


def test_estimate_logg_basic():
    logg = estimate_logg(cnumax, cteff)
    assert str(logg.unit) == "dex"
    assert np.isclose(float(logg.value), clogg[0], rtol=clogg[1])
    logg = estimate_logg(Quantity(cnumax, uHz), cteff)
    assert np.isclose(float(logg.value), clogg[0], rtol=clogg[1])
    logg = estimate_logg(cnumax, Quantity(cteff, K))
    assert np.isclose(float(logg.value), clogg[0], rtol=clogg[1])


def test_estimate_logg_kwargs():
    logg = estimate_logg(cnumax, cteff, cenumax, ceteff)
    assert str(logg.unit) == "dex"
    assert str(logg.error.unit) == "dex"
    assert_correct_answer(logg, clogg)
    logg = estimate_logg(cnumax, cteff, Quantity(cenumax, uHz), ceteff)
    assert_correct_answer(logg, clogg)
    logg = estimate_logg(cnumax, cteff, cenumax, Quantity(ceteff, K))
    assert_correct_answer(logg, clogg)
