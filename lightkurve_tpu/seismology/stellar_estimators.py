"""Stellar parameter estimation via asteroseismic scaling relations.

Re-implements reference ``seismology/stellar_estimators.py`` (265 LoC).
Solar reference values: NUMAX_SOL = 3090±30 µHz, DELTANU_SOL = 135.1±0.1
µHz (Huber et al. 2011), TEFF_SOL = 5772.0±0.8 K (Prša et al. 2016).
Error propagation uses first-order linearization (replacing the optional
``uncertainties`` package with explicit partial derivatives — the scaling
relations are pure power laws, so this is exact in log space).
"""
from __future__ import annotations

import numpy as np

from ..units import Quantity, uHz, K, solRad, solMass, dex
from .utils import SeismologyQuantity

__all__ = ["estimate_radius", "estimate_mass", "estimate_logg",
           "NUMAX_SOL", "DELTANU_SOL", "TEFF_SOL", "G_SOL"]

NUMAX_SOL = (3090.0, 30.0)       # microhertz | Huber et al. 2011
DELTANU_SOL = (135.1, 0.1)       # microhertz | Huber et al. 2011
TEFF_SOL = (5772.0, 0.8)         # Kelvin     | Prsa et al. 2016
# G·Msun/Rsun² in cm/s²
G_SOL = 27420.011165737313


def _uval(x, unit):
    return float(np.atleast_1d(Quantity(x, unit).value)[0])


def _power_law(terms):
    """Evaluate prod((x_i/ref_i)^p_i) with linear error propagation.

    ``terms`` is a list of (value, err, ref_value, ref_err, power).
    Returns (value, err).
    """
    val = 1.0
    rel_var = 0.0
    for x, xe, r, re, p in terms:
        val *= (x / r) ** p
        rel_var += (p * xe / x) ** 2 + (p * re / r) ** 2
    return val, abs(val) * np.sqrt(rel_var)


def _prepare(numax, deltanu, teff, numax_err, deltanu_err, teff_err):
    numax = _uval(numax, uHz)
    deltanu = _uval(deltanu, uHz)
    teff = _uval(teff, K)
    have_err = all(e is not None for e in (numax_err, deltanu_err, teff_err))
    if have_err:
        numax_err = _uval(numax_err, uHz)
        deltanu_err = _uval(deltanu_err, uHz)
        teff_err = _uval(teff_err, K)
    else:
        numax_err = deltanu_err = teff_err = 0.0
    return numax, deltanu, teff, numax_err, deltanu_err, teff_err, have_err


def estimate_radius(numax, deltanu, teff, numax_err=None, deltanu_err=None,
                    teff_err=None):
    """R/R☉ = (ν/ν☉)(Δν/Δν☉)⁻²(T/T☉)^0.5 (reference ``:21-104``)."""
    nu, dn, t, nue, dne, te, have_err = _prepare(
        numax, deltanu, teff, numax_err, deltanu_err, teff_err)
    val, err = _power_law([
        (nu, nue, *NUMAX_SOL, 1.0),
        (dn, dne, *DELTANU_SOL, -2.0),
        (t, te, *TEFF_SOL, 0.5)])
    return SeismologyQuantity(Quantity(val, solRad), name="radius",
                              error=Quantity(err, solRad) if have_err
                              else None,
                              method="Uncorrected Scaling Relations")


def estimate_mass(numax, deltanu, teff, numax_err=None, deltanu_err=None,
                  teff_err=None):
    """M/M☉ = (ν/ν☉)³(Δν/Δν☉)⁻⁴(T/T☉)^1.5 (reference ``:107-190``)."""
    nu, dn, t, nue, dne, te, have_err = _prepare(
        numax, deltanu, teff, numax_err, deltanu_err, teff_err)
    val, err = _power_law([
        (nu, nue, *NUMAX_SOL, 3.0),
        (dn, dne, *DELTANU_SOL, -4.0),
        (t, te, *TEFF_SOL, 1.5)])
    return SeismologyQuantity(Quantity(val, solMass), name="mass",
                              error=Quantity(err, solMass) if have_err
                              else None,
                              method="Uncorrected Scaling Relations")


def estimate_logg(numax, teff, numax_err=None, teff_err=None):
    """log₁₀ g with g/g☉ = (ν/ν☉)(T/T☉)^0.5 (reference ``:193-265``)."""
    numax = _uval(numax, uHz)
    teff = _uval(teff, K)
    have_err = numax_err is not None and teff_err is not None
    nue = _uval(numax_err, uHz) if have_err else 0.0
    te = _uval(teff_err, K) if have_err else 0.0
    g, g_err = _power_law([
        (numax, nue, *NUMAX_SOL, 1.0),
        (teff, te, *TEFF_SOL, 0.5)])
    g = g * G_SOL
    g_err = g_err * G_SOL
    val = np.log10(g)
    err = g_err / (g * np.log(10))
    return SeismologyQuantity(Quantity(val, dex), name="logg",
                              error=Quantity(err, dex) if have_err else None,
                              method="Uncorrected Scaling Relations")
