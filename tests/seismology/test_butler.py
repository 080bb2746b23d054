"""Mirrors of reference tests/seismology/test_butler.py (the offline
tests): numax/deltanu estimation on the reference's synthetic
solar-like oscillator spectrum, keyword-argument handling, unit
round-trips through 1/day, and the diagnostic plots."""
import matplotlib.pyplot as plt
import numpy as np
import pytest

from lightkurve_tpu.periodogram import SNRPeriodogram
from lightkurve_tpu.units import Quantity, Unit

UHZ = Unit.parse("uHz")
PER_DAY = Unit.parse("1/d")


def deltafn(n, loc):
    out = np.zeros(n)
    out[loc] = 1.0
    return out


def generate_test_spectrum():
    """The reference's synthetic solar-like oscillator
    (reference test_butler.py:25-47)."""
    f = np.arange(0, 4000.0, 0.4)
    p = np.ones(len(f))
    nmx = 2500.0
    fs = f.max() / len(f)
    s = 0.25 * nmx / 2.335
    p *= 10 * np.exp(-0.5 * (f - nmx) ** 2 / s ** 2)
    m = np.zeros(len(f))
    lo = int(np.floor(0.5 * nmx / fs))
    hi = int(np.floor(1.5 * nmx / fs))
    deltanu_true = 0.294 * nmx ** 0.772
    for modeloc in np.arange(lo, hi, deltanu_true / 2, dtype=int):
        m += deltafn(len(f), modeloc)
    p *= m
    p += 1
    return f, p, nmx, deltanu_true


def _snr(f, p, unit=UHZ):
    return SNRPeriodogram(Quantity(f, unit), Quantity(p, None))


def test_estimate_numax_basics():
    f, p, true_numax, _ = generate_test_spectrum()
    snr = _snr(f, p)
    numax = snr.to_seismology().estimate_numax()
    assert np.isclose(true_numax, numax.value, atol=0.1 * true_numax)
    assert str(numax.unit) == "uHz"

    # chopped periodogram still recovers numax
    sel = (snr.frequency.value > 1600) & (snr.frequency.value < 3200)
    rsnr = snr[sel]
    numax = rsnr.to_seismology().estimate_numax()
    assert np.isclose(true_numax, numax.value, atol=0.1 * true_numax)

    # frequencies in 1/day work too
    fday = Quantity(f, UHZ).to(PER_DAY)
    snr_day = SNRPeriodogram(fday, Quantity(p, None))
    numax = snr_day.to_seismology().estimate_numax()
    nmxday = Quantity(np.atleast_1d(true_numax), UHZ).to(PER_DAY).value[0]
    assert np.isclose(nmxday, float(numax.value), atol=0.1 * nmxday)

    # non-uniform frequency grids are rejected
    f2, p2, _, _ = generate_test_spectrum()
    f2 = f2 + np.random.default_rng(0).uniform(size=len(f2))
    with pytest.raises(ValueError, match="uniformly spaced"):
        _snr(f2, p2).to_seismology().estimate_numax()


def test_estimate_numax_kwargs():
    f, p, true_numax, _ = generate_test_spectrum()
    std = 0.25 * true_numax / 2.335
    butler = _snr(f, p).to_seismology()

    numaxs = np.linspace(true_numax - 2 * std, true_numax + 2 * std, 500)
    numax = butler.estimate_numax(numaxs=numaxs)
    assert np.isclose(numax.value, true_numax, atol=0.1 * true_numax)

    # numaxs outside the functional range error
    with pytest.raises(ValueError):
        butler.estimate_numax(numaxs=np.linspace(-5, 5.0))
    with pytest.raises(ValueError):
        butler.estimate_numax(numaxs=np.linspace(1.0, 5000.0))

    # window_width in native units or 1/day
    numax = butler.estimate_numax(window_width=200.0)
    assert np.isclose(numax.value, true_numax, atol=0.1 * true_numax)
    numax = butler.estimate_numax(
        window_width=Quantity(np.atleast_1d(200.0), UHZ).to(PER_DAY))
    assert np.isclose(numax.value, true_numax, atol=0.1 * true_numax)
    for bad in (-5, 1e6, 0.001):
        with pytest.raises(ValueError):
            butler.estimate_numax(window_width=bad)

    # spacing in native units or 1/day
    numax = butler.estimate_numax(spacing=15.0)
    assert np.isclose(numax.value, true_numax, atol=0.1 * true_numax)
    numax = butler.estimate_numax(
        spacing=Quantity(np.atleast_1d(15.0), UHZ).to(PER_DAY))
    assert np.isclose(numax.value, true_numax, atol=0.1 * true_numax)
    for bad in (-5, 1e6, 0.001):
        with pytest.raises(ValueError):
            butler.estimate_numax(spacing=bad)

    # numaxs passed in 1/day still yield native-unit output
    daynumaxs = Quantity(numaxs, UHZ).to(PER_DAY)
    numax = butler.estimate_numax(numaxs=daynumaxs)
    assert np.isclose(numax.value, true_numax, atol=0.1 * true_numax)
    assert str(numax.unit) == "uHz"


def test_plot_numax_diagnostics():
    f, p, true_numax, _ = generate_test_spectrum()
    butler = _snr(f, p).to_seismology()
    numax = butler.estimate_numax()
    butler.diagnose_numax()
    butler.diagnose_numax(numax)
    plt.close("all")


def test_estimate_deltanu_basics():
    f, p, _, true_deltanu = generate_test_spectrum()
    butler = _snr(f, p).to_seismology()
    butler.estimate_numax()
    deltanu = butler.estimate_deltanu()
    assert np.isclose(true_deltanu, deltanu.value, atol=0.25 * true_deltanu)
    assert str(deltanu.unit) == "uHz"

    # sliced periodogram
    snr = _snr(f, p)
    rsnr = snr[(snr.frequency.value > 1600) & (snr.frequency.value < 3200)]
    butler2 = rsnr.to_seismology()
    butler2.estimate_numax()
    butler2.estimate_deltanu()

    # 1/day frequencies
    fday = Quantity(f, UHZ).to(PER_DAY)
    butler3 = SNRPeriodogram(fday, Quantity(p, None)).to_seismology()
    butler3.estimate_numax()
    deltanu_day = butler3.estimate_deltanu()
    true_day = Quantity(np.atleast_1d(true_deltanu), UHZ).to(
        PER_DAY).value[0]
    assert np.isclose(true_day, float(deltanu_day.value),
                      atol=0.25 * true_day)

    # non-uniform grids are rejected
    f2, p2, _, _ = generate_test_spectrum()
    f2 = f2 + np.random.default_rng(1).uniform(size=len(f2))
    with pytest.raises(ValueError, match="uniformly spaced"):
        _snr(f2, p2).to_seismology().estimate_deltanu(numax=100)


def test_estimate_deltanu_kwargs():
    f, p, _, true_deltanu = generate_test_spectrum()
    butler = _snr(f, p).to_seismology()
    numax = butler.estimate_numax()
    deltanu = butler.estimate_deltanu(numax=numax)
    assert np.isclose(deltanu.value, true_deltanu, atol=0.25 * true_deltanu)

    # numax out of range errors
    with pytest.raises(ValueError):
        butler.estimate_deltanu(numax=-5.0)
    with pytest.raises(ValueError):
        butler.estimate_deltanu(numax=5000)

    # numax in 1/day is accepted; output stays in native units
    daynumax = Quantity(np.atleast_1d(numax.value), UHZ).to(PER_DAY)
    deltanu = butler.estimate_deltanu(numax=daynumax)
    assert np.isclose(deltanu.value, true_deltanu, atol=0.25 * true_deltanu)
    assert str(deltanu.unit) == "uHz"


def test_plot_deltanu_diagnostics():
    f, p, _, true_deltanu = generate_test_spectrum()
    butler = _snr(f, p).to_seismology()
    butler.estimate_numax()
    deltanu = butler.estimate_deltanu()
    butler.diagnose_deltanu()
    butler.diagnose_deltanu(deltanu)
    plt.close("all")


def test_plot_echelle():
    f, p, _, _ = generate_test_spectrum()
    butler = _snr(f, p).to_seismology()
    butler.estimate_numax()
    butler.estimate_deltanu()
    ax = butler.plot_echelle()
    assert ax is not None
    plt.close("all")


def test_asteroseismology_chain():
    """Mirror of reference test_butler.py:test_asteroseismology, with a
    synthetic multi-segment solar-like oscillator replacing the
    KIC 11615890 download: normalize → flatten → append → remove_nans →
    psd periodogram → SNR flatten → to_seismology → estimate_numax."""
    from lightkurve_tpu import LightCurve

    rng = np.random.default_rng(7)
    numax_uhz = 2800.0
    sigma = 0.25 * numax_uhz / 2.335
    dnu = 0.294 * numax_uhz ** 0.772
    mode_freqs = np.arange(numax_uhz - 3 * dnu, numax_uhz + 3 * dnu,
                           dnu / 2)
    amps = np.exp(-0.5 * ((mode_freqs - numax_uhz) / sigma) ** 2)

    def make_segment(t0):
        t_days = t0 + np.arange(4000) * (1.0 / 24 / 60)   # 1-min cadence
        t_sec = t_days * 86400.0
        flux = np.ones_like(t_days)
        for f_uhz, a in zip(mode_freqs, amps):
            flux += 2e-4 * a * np.sin(
                2 * np.pi * f_uhz * 1e-6 * t_sec + rng.uniform(0, 2 * np.pi))
        flux += 5e-5 * rng.standard_normal(t_days.size)
        flux[rng.integers(0, t_days.size, 5)] = np.nan    # holes to clean
        return LightCurve(time=t_days, flux=flux)

    data = [make_segment(t0) for t0 in (0.0, 3.0, 6.0)]
    lc = data[0].normalize().flatten()
    for nlc in data[1:]:
        lc = lc.append(nlc.normalize().flatten())
    lc = lc.remove_nans()
    pg = lc.to_periodogram(normalization="psd")
    snr = pg.flatten()
    numax = snr.to_seismology().estimate_numax()
    assert np.isclose(numax.value, numax_uhz, rtol=0.25)
