"""Periodogram-layer tests (mirrors reference tests/test_periodogram.py)."""
import numpy as np
import pytest

import lightkurve_tpu as lk
from lightkurve_tpu import LightCurve
from lightkurve_tpu.periodogram import (BoxLeastSquaresPeriodogram,
                                        LombScarglePeriodogram, Periodogram,
                                        SNRPeriodogram, autoperiod)
from lightkurve_tpu.units import Quantity, one_per_day, uHz, dimensionless


def sine_lc(rng, n=2000, period=2.5, amp=0.01, dt=0.02):
    t = np.arange(n) * dt
    y = 1.0 + amp * np.sin(2 * np.pi * t / period) \
        + 0.001 * rng.standard_normal(n)
    return LightCurve(time=t, flux=y, flux_err=np.full(n, 0.001))


def test_ls_grid_defaults(rng):
    """Grid rules of reference periodogram.py:849-914."""
    lc = sine_lc(rng)
    pg = lc.to_periodogram()
    tv = lc.time.value
    nyquist = 0.5 / np.median(np.diff(tv))
    fs = 1.0 / (tv[-1] - tv[0]) / 5.0       # amplitude default osf=5
    assert np.isclose(pg.frequency.value[0], fs)
    assert np.isclose(np.diff(pg.frequency.value)[0], fs)
    assert pg.frequency.value[-1] <= nyquist
    assert pg.frequency.unit == one_per_day
    # psd default: osf=1, freq unit microhertz
    pg2 = lc.to_periodogram(normalization="psd")
    assert pg2.frequency.unit == uHz
    # nyquist property
    assert np.isclose(pg.nyquist.value, nyquist)


def test_ls_peak_recovery(rng):
    lc = sine_lc(rng, period=2.5)
    pg = lc.to_periodogram(oversample_factor=10)
    assert abs(float(pg.period_at_max_power.value) - 2.5) < 0.05
    # period/frequency keyword exclusivity
    with pytest.raises(ValueError):
        lc.to_periodogram(minimum_period=1, minimum_frequency=1)


def test_ls_amplitude_normalization(rng):
    """amplitude normalization: peak height ~ signal amplitude
    (reference periodogram.py:973-975: sqrt(power)*sqrt(4/N))."""
    lc = sine_lc(rng, amp=0.01, n=5000)
    pg = lc.to_periodogram(normalization="amplitude", oversample_factor=5)
    peak = float(np.max(pg.power.value))
    assert abs(peak - 0.01) / 0.01 < 0.1


def test_ls_psd_normalization_parseval(rng):
    """psd normalization: integral of PSD ≈ variance (Parseval)."""
    n = 4000
    t = np.arange(n) * 0.02
    y = 1 + 0.002 * rng.standard_normal(n)
    lc = LightCurve(time=t, flux=y)
    pg = lc.to_periodogram(normalization="psd", oversample_factor=1)
    total = np.sum(pg.power.value) * np.median(np.diff(pg.frequency.value))
    var = np.var(y)
    assert abs(total - var) / var < 0.2


def test_ls_custom_grids(rng):
    lc = sine_lc(rng)
    pg = lc.to_periodogram(minimum_frequency=0.1, maximum_frequency=2.0)
    assert pg.frequency.value[0] >= 0.1
    assert pg.frequency.value[-1] <= 2.0
    pg = lc.to_periodogram(minimum_period=1.0, maximum_period=5.0)
    assert pg.default_view == "period"
    freqs = np.linspace(0.2, 1.0, 100)
    pg = lc.to_periodogram(frequency=freqs)
    assert len(pg) == 100
    # irregular grid downgrades 'fast' to 'slow'
    irregular = np.sort(np.concatenate([freqs, [0.555]]))
    pg = lc.to_periodogram(frequency=irregular)
    assert pg.ls_method == "slow"
    with pytest.raises(ValueError):
        lc.to_periodogram(minimum_frequency=2.0, maximum_frequency=0.1)


def test_ls_model(rng):
    lc = sine_lc(rng)
    pg = lc.to_periodogram(oversample_factor=10)
    model = pg.model(time=lc.time.value,
                     frequency=pg.frequency_at_max_power)
    resid = lc.normalize().flux.value - model.flux.value
    assert np.std(resid) < 0.5 * np.std(lc.normalize().flux.value)


def test_pg_bin_smooth_flatten(rng):
    lc = sine_lc(rng, n=4000)
    pg = lc.to_periodogram(normalization="psd")
    binned = pg.bin(binsize=10)
    assert len(binned) == len(pg) // 10
    smoothed = pg.smooth(method="boxkernel", filter_width=1.0)
    assert len(smoothed) == len(pg)
    assert np.std(smoothed.power.value) < np.std(pg.power.value)
    bkg = pg.smooth(method="logmedian", filter_width=0.5)
    snr = pg.flatten()
    assert isinstance(snr, SNRPeriodogram)
    # SNR of white noise ~ 1
    assert 0.3 < np.nanmedian(snr.power.value) < 3.0
    with pytest.raises(ValueError):
        pg.smooth(method="boxkernel", filter_width=-1)


def test_pg_props_and_arithmetic(rng):
    lc = sine_lc(rng)
    pg = lc.to_periodogram()
    assert np.isclose(float(pg.period_at_max_power.value),
                      1.0 / float(pg.frequency_at_max_power.value))
    assert float(pg.max_power) == float(np.nanmax(pg.power.value))
    pg2 = pg * 2
    assert np.allclose(pg2.power.value, pg.power.value * 2)
    pg3 = pg + 1
    assert np.allclose(pg3.power.value, pg.power.value + 1)
    sub = pg[0:50]
    assert len(sub) == 50


def test_bls_from_lightcurve(rng):
    n = 3000
    t = np.arange(n) * 0.02
    y = 1.0 + 0.0005 * rng.standard_normal(n)
    P_true, dur, depth = 3.123, 0.15, 0.01
    ph = np.mod(t - 1.0 + P_true / 2, P_true) - P_true / 2
    y[np.abs(ph) < dur / 2] -= depth
    lc = LightCurve(time=t, flux=y, flux_err=np.full(n, 0.0005))
    pg = lc.to_periodogram(method="bls")
    assert isinstance(pg, BoxLeastSquaresPeriodogram)
    # reference accuracy bar: within 5%
    assert abs(float(pg.period_at_max_power.value) - P_true) / P_true < 0.05
    assert abs(float(pg.depth_at_max_power.value) - depth) < 0.005
    # default duration grid and period bounds (reference :1102-1128)
    tv = t
    min_p_expected = max(np.median(np.diff(tv)) * 4,
                         0.33 + np.median(np.diff(tv)))
    assert pg.period.value.min() >= min_p_expected - 1e-6
    # astropy's autoperiod (1 + round(Δf/df) points) may overshoot
    # maximum_period by up to half a frequency step when round() rounds
    # up — allow one period-grid step of slack
    max_p_expected = (tv.max() - tv.min()) / 3
    grid_step = np.diff(pg.period.value)[-1]
    assert pg.period.value.max() <= max_p_expected + grid_step + 1e-6
    # model & mask & stats
    model = pg.get_transit_model()
    assert len(model) == len(lc)
    mask = pg.get_transit_mask()
    assert 0 < mask.sum() < len(lc)
    stats = pg.compute_stats()
    assert stats["snr"] > 5
    # flatten/smooth unsupported
    with pytest.raises(NotImplementedError):
        pg.flatten()
    with pytest.raises(NotImplementedError):
        pg.smooth()


def test_bls_grid_guards(rng):
    lc = sine_lc(rng, n=500)
    with pytest.raises(ValueError):
        lc.to_periodogram(method="bls", duration=[np.nan])
    with pytest.raises(ValueError):
        lc.to_periodogram(method="bls", period=[1.0, np.inf])
    # >1e7 grid points must error (reference :1144-1151)
    with pytest.raises(ValueError):
        lc.to_periodogram(method="bls", frequency_factor=1e-5)


def test_autoperiod():
    duration = np.array([0.1])
    periods = autoperiod(duration, baseline=30.0, minimum_period=1.0,
                         maximum_period=10.0, frequency_factor=10.0)
    assert periods.min() >= 1.0 - 1e-9
    assert periods.max() <= 10.0 + 1e-9
    # evenly spaced in frequency
    f = 1.0 / periods
    assert np.allclose(np.diff(f), np.diff(f)[0])


def test_periodogram_validation():
    with pytest.raises(ValueError):
        Periodogram(Quantity([1.0, 2.0], one_per_day),
                    Quantity([1.0], dimensionless))


def test_interact_bls_static_figure(rng):
    """The bokeh-free stand-in renders the three linked panels."""
    n = 1500
    t = np.arange(n) * 0.02
    y = np.ones(n) + 5e-4 * rng.standard_normal(n)
    ph = np.mod(t - 0.5 + 1.3, 2.6) - 1.3
    y[np.abs(ph) < 0.06] -= 0.01
    lc = LightCurve(time=t, flux=y, flux_err=np.full(n, 5e-4))
    fig = lc.interact_bls()
    assert len(fig.axes) >= 3
    import matplotlib.pyplot as plt
    plt.close("all")


def test_periodogram_slicing_and_scalar_math(rng):
    """Reference tests/test_periodogram.py::test_periodogram_slicing."""
    lc = lk.LightCurve(time=np.arange(1000.0),
                       flux=rng.normal(1, 0.1, 1000),
                       flux_err=np.full(1000, 0.1)).normalize()
    p = lc.to_periodogram()
    assert len(p[0:200].frequency) == 200
    orig = float(np.sum(p.power.value))
    p = p / 2
    assert np.isclose(float(np.sum(p.power.value)), orig / 2)
    p = p * 0
    assert float(np.sum(p.power.value)) == 0
    p = p + 100
    assert np.all(p.power.value >= 100)
    p = p - 100
    assert np.isclose(float(np.sum(p.power.value)), 0)


def test_assign_periods_and_frequencies(rng):
    """Reference tests/test_periodogram.py::test_assign_periods."""
    lc = lk.LightCurve(time=np.arange(1000.0),
                       flux=rng.normal(1, 0.1, 1000),
                       flux_err=np.full(1000, 0.1)).normalize()
    periods = np.arange(1.0, 100.0)
    p = lc.to_periodogram(period=periods)
    assert np.isclose(np.sum(periods - p.period.value), 0)
    freqs = np.linspace(0.01, 0.4, 99)
    p2 = lc.to_periodogram(frequency=freqs)
    assert np.isclose(np.sum(freqs - p2.frequency.value), 0)


def test_nan_flux_periodogram(rng):
    """NaN fluxes are dropped before the LS transform (reference
    regression test test_masked_flux_nans)."""
    flux = rng.normal(1, 0.01, 200)
    flux[::7] = np.nan
    lc = lk.LightCurve(time=np.arange(200.0), flux=flux)
    pg = lc.to_periodogram()
    assert np.isfinite(np.asarray(pg.power.value)).all()


def test_bls_period_recovery_binary_eclipse(rng):
    """Reference test_bls_period: an eclipsing-binary-like signal's
    period is recovered by BLS on a user grid."""
    t = np.arange(0, 30, 2.0 / 60 / 24)
    P_true = 1.3
    ph = np.mod(t + P_true / 2, P_true) - P_true / 2
    f = 1.0 - 0.05 * (np.abs(ph) < 0.05) + 2e-4 * rng.standard_normal(
        len(t))
    lc = lk.LightCurve(time=t, flux=f, flux_err=np.full(len(t), 2e-4))
    pg = lc.to_periodogram(method="bls",
                           period=np.linspace(0.8, 2.0, 400),
                           duration=[0.05, 0.1])
    assert abs(float(pg.period_at_max_power.value) - P_true) < 0.02


# --------------------------------------------------------------------------
# Mirrors of reference tests/test_periodogram.py behaviors not covered above
# --------------------------------------------------------------------------

def _noisy_lc(rng, n=1000):
    return LightCurve(time=np.arange(n),
                      flux=1 + 0.1 * rng.standard_normal(n),
                      flux_err=np.full(n, 0.1))


def test_periodogram_normalization_units(rng):
    """Amplitude power carries the flux unit; PSD carries unit²/freq_unit
    (reference test_periodogram_normalization)."""
    lc = LightCurve(time=np.arange(1000),
                    flux=1 + 0.1 * rng.standard_normal(1000),
                    flux_err=np.full(1000, 0.1), flux_unit="electron/second")
    pg = lc.to_periodogram(normalization="amplitude")
    assert str(pg.power.unit) == "electron / s"
    pg = lc.normalize(unit="ppm").to_periodogram(normalization="amplitude")
    assert str(pg.power.unit) == "ppm"
    pg = lc.to_periodogram(freq_unit=uHz, normalization="psd")
    assert str(pg.power.unit) in ("electron2 / (s2 uHz)",
                                  "(electron / s)2 / uHz",
                                  "electron / s2 / uHz",
                                  str((lc.flux.unit ** 2) / uHz))
    pg2 = lc.normalize(unit="ppm").to_periodogram(freq_unit=uHz,
                                                  normalization="psd")
    assert str(pg2.power.unit) == str((Quantity(1, "ppm").unit ** 2) / uHz)


def test_periodogram_units(rng):
    """Reference test_periodogram_units: unit-carrying properties."""
    lc = LightCurve(time=np.arange(1000),
                    flux=1 + 0.1 * rng.standard_normal(1000),
                    flux_err=np.full(1000, 0.1), flux_unit="electron/second")
    p = lc.to_periodogram(normalization="amplitude")
    assert hasattr(p.frequency, "unit")
    assert str(p.frequency.unit) == "1 / d"
    assert str(p.power.unit) == "electron / s"
    assert str(p.period.unit) == "d"
    assert str(p.frequency_at_max_power.unit) == "1 / d"
    assert str(p.max_power.unit) == "electron / s"


def test_periodogram_can_find_periods(rng):
    """A 100-day sinusoid peaks at 100 d (reference name preserved)."""
    lc = _noisy_lc(rng)
    lc = LightCurve(time=lc.time.value,
                    flux=lc.flux.value + np.sin(
                        lc.time.value / lc.time.value.max() * 20 * np.pi),
                    flux_err=np.full(1000, 0.1)).normalize()
    p = lc.to_periodogram(normalization="amplitude")
    assert np.isclose(float(p.period_at_max_power.value), 100, rtol=1e-3)


def test_index(rng):
    """Boolean-mask indexing of a periodogram."""
    p = _noisy_lc(rng).normalize().to_periodogram()
    fval = p.frequency.value
    mask = (fval > 0.1) & (fval < 0.2)
    assert len(p[mask].frequency) == mask.sum()


def test_error_messages(rng):
    """Reference test_error_messages: constructor + grid guard strings."""
    lc = _noisy_lc(rng)
    with pytest.raises(ValueError):
        lc.to_periodogram(maximum_frequency=0.1, minimum_period=10)
    with pytest.raises(ValueError) as err:
        lc.to_periodogram(maximum_frequency=0.1, minimum_frequency=10)
    assert err.value.args[0] == ("minimum_frequency cannot be larger than "
                                 "maximum_frequency")
    with pytest.raises(ValueError) as err:
        lc.to_periodogram(maximum_period=0.1, minimum_period=10)
    assert err.value.args[0] == ("minimum_period cannot be larger than "
                                 "maximum_period")
    with pytest.raises(ValueError):
        lc.to_periodogram(frequency=np.arange(10), period=np.arange(10))
    with pytest.raises(ValueError) as err:
        Periodogram([0], [1])
    assert err.value.args[0] == \
        "frequency must be an `astropy.units.Quantity` object."
    with pytest.raises(ValueError) as err:
        Periodogram(Quantity([0], "Hz"), [1])
    assert err.value.args[0] == \
        "power must be an `astropy.units.Quantity` object."
    with pytest.raises(ValueError) as err:
        Periodogram(Quantity([0], "Hz"), Quantity([1], "K"))
    assert err.value.args[0] == \
        "frequency and power must have a length greater than 1."
    with pytest.raises(ValueError) as err:
        Periodogram(Quantity([0, 1, 2, 3], "Hz"), Quantity([1, 1], "K"))
    assert err.value.args[0] == \
        "frequency and power must have the same length."
    with pytest.raises(ValueError) as err:
        Periodogram(Quantity([0, 1, 2], "K"), Quantity([1, 1, 1], "K"))
    assert err.value.args[0] == "Frequency must be in units of 1/time."
    with pytest.raises(ValueError) as err:
        Periodogram(Quantity([0, 1, 2], "Hz"),
                    Quantity([1, 1, 1], "K")).bin(binsize=-2)
    assert err.value.args[0] == "binsize must be larger than or equal to 1"
    with pytest.raises(ValueError) as err:
        Periodogram(Quantity([0, 1, 2], "Hz"),
                    Quantity([1, 1, 1], "K")).bin(method="not-implemented")
    assert "method 'not-implemented' is not supported" in err.value.args[0]
    with pytest.raises(ValueError) as err:
        Periodogram(Quantity([0, 1, 2], "Hz"),
                    Quantity([1, 1, 1], "K")).smooth(method="not-implemented")
    assert "method 'not-implemented' is not supported" in err.value.args[0]


def test_smooth_pitfalls(rng):
    """Reference test_smooth error branches + logmedian consistency."""
    np.random.seed(42)
    lc = LightCurve(time=np.arange(1000),
                    flux=np.random.normal(1, 0.1, 1000),
                    flux_err=np.full(1000, 0.1)).normalize()
    p = lc.to_periodogram(normalization="psd", freq_unit=uHz)
    assert np.all(p.smooth(method="boxkernel").frequency.value
                  == p.frequency.value)
    assert np.all(p.smooth(method="logmedian").frequency.value
                  == p.frequency.value)
    assert str(p.smooth().power.unit) == str(p.power.unit)
    # logmedian-smoothed mean tracks the raw mean
    assert np.isclose(np.mean(p.smooth(method="logmedian").power.value),
                      np.mean(p.power.value),
                      atol=0.05 * np.mean(p.power.value))
    with pytest.raises(ValueError):
        p.smooth(method="boxkernel", filter_width=-5.0)
    with pytest.raises(ValueError) as err:
        p.smooth(method="boxkernel", filter_width=Quantity(5.0, "d"))
    assert err.value.args[0] == \
        "the `filter_width` parameter must have frequency units."
    # non-evenly-spaced frequencies can't be box-smoothed
    with pytest.raises(ValueError):
        lc.to_periodogram(period=np.arange(1, 100)).smooth()
    # logmedian rejects unit-carrying widths
    with pytest.raises(ValueError):
        p.smooth(method="logmedian", filter_width=Quantity(5.0, "d"))


def test_bls_warnings_and_types(rng, caplog):
    """Reference test_bls: no-arg compute_stats/get_transit_model warn and
    fall back to max-power parameters; typed at-max-power properties."""
    import logging
    from lightkurve_tpu.time import Time
    lc = LightCurve(time=np.linspace(0, 10, 200),
                    flux=np.random.normal(100, 0.1, 200),
                    flux_err=np.full(200, 0.1))
    p = lc.to_periodogram(method="bls")
    for key in ["period", "power", "duration", "transit_time", "depth",
                "snr"]:
        assert key in dir(p)
    lc.to_periodogram(method="bls", minimum_period=0.2, duration=0.1,
                      maximum_period=0.5)
    with pytest.raises(ValueError):
        lc.to_periodogram(method="bls", frequency_factor=0.00001)
    with caplog.at_level(logging.WARNING):
        p.compute_stats()
    assert "No period specified." in caplog.text
    n_before = len(caplog.records)
    stats = p.compute_stats(1, 0.1, 0)
    assert len(caplog.records) == n_before
    assert isinstance(stats, dict)
    model = p.get_transit_model(1, 0.1, 0)
    assert isinstance(model, LightCurve)
    assert np.isin(model.time.value, lc.time.value).all()
    mask = p.get_transit_mask(1, 0.1, 0)
    assert isinstance(mask, np.ndarray)
    assert mask.dtype == bool
    assert mask.sum() < (~mask).sum()
    assert isinstance(p.period_at_max_power, Quantity)
    assert isinstance(p.duration_at_max_power, Quantity)
    assert isinstance(p.transit_time_at_max_power, Time)
    assert isinstance(p.depth_at_max_power, (Quantity, float))


def test_bls_period_regression_514():
    """Reference regression #514: explicit period grids round-trip, and
    NaN periods raise a message naming `period`."""
    lc = LightCurve(time=[1, 2, 3], flux=[4, 5, 6])
    period = [1, 2, 3, 4, 5]
    pg = lc.to_periodogram(method="bls", period=period)
    np.testing.assert_array_equal(pg.period.value, period)
    with pytest.raises(ValueError) as err:
        lc.to_periodogram(method="bls", period=[1, 2, 3, np.nan, 4])
    assert "period" in err.value.args[0]


def test_masked_flux_nans():
    """Reference regression #1162: NaN flux rows drop out and a constant
    remainder yields zero power."""
    lc = LightCurve(time=[1, 2, 3, 4], flux=[1.0, np.nan, 1.0, 1.0])
    pg = lc.to_periodogram()
    pw = np.asarray(pg.power.value)
    assert not np.isnan(pw).all()
    np.testing.assert_allclose(pw, 0.0, atol=1e-20)


def _beta_lyr_lc():
    t = np.arange(0, 30, 0.1)
    f = np.sin(t * 2 + np.pi / 2) + np.sin(t) + 1
    return LightCurve(time=t, flux=f).normalize()


@pytest.mark.parametrize("ls_method, nterms, expected_period, downgraded", [
    ("fast", 1, np.pi, "slow"),
    ("fastchi2", 2, 2 * np.pi, "chi2"),
    ("fastnifty", 1, np.pi, "slow"),
    ("fastnifty_chi2", 2, 2 * np.pi, "chi2"),
])
def test_ls_method_uneven_freq_grid(ls_method, nterms, expected_period,
                                    downgraded):
    """Reference test_ls_method_uneven_freq_grid: uneven grids downgrade
    fast methods, and pg.nterms / pg.ls_method record the result."""
    lc = _beta_lyr_lc()
    freq_grid = 1.0 / np.arange(1, 10, 0.01)
    pg = lc.to_periodogram(method="ls", ls_method=ls_method, nterms=nterms,
                           frequency=freq_grid)
    assert np.isclose(float(pg.period_at_max_power.value), expected_period,
                      atol=0.05)
    assert pg.nterms == nterms
    assert pg.ls_method == downgraded


def test_ls_period_bounds_with_psd_units(rng):
    """Review finding: period bounds must convert into the psd default
    frequency unit (uHz); leaving them in 1/day built grids off by the
    unit scale."""
    t = np.linspace(0, 30, 2000)
    f = 1 + 0.01 * np.sin(2 * np.pi * t / 2.5) \
        + 0.001 * rng.standard_normal(2000)
    lc = LightCurve(time=t, flux=f)
    pg = lc.to_periodogram(normalization="psd", minimum_period=1.0,
                           maximum_period=5.0)
    p = 1.0 / pg.frequency.to("1/d").value
    assert p.min() >= 1.0 - 1e-6
    assert p.max() <= 5.0 + 1e-6
    # the injected 2.5-day signal is recovered inside the bounds
    assert abs(float((1.0 / pg.frequency_at_max_power.to("1/d")).value)
               - 2.5) < 0.2


def test_smooth_logmedian_validation():
    """Review finding: zero/negative filter_width hung forever; scaled
    dimensionless Quantities silently dropped their scale."""
    t = np.linspace(0, 30, 500)
    lc = LightCurve(time=t, flux=1 + 0.01 * np.sin(2 * np.pi * t / 2.5))
    pg = lc.to_periodogram()
    with pytest.raises(ValueError, match="larger than 0"):
        pg.smooth(method="logmedian", filter_width=0.0)
    with pytest.raises(ValueError, match="larger than 0"):
        pg.smooth(method="logmedian", filter_width=-1.0)
    from lightkurve_tpu.units import ppm as _ppm
    with pytest.raises(ValueError, match="dimensionless"):
        pg.smooth(method="logmedian", filter_width=Quantity(0.4, _ppm))


def test_bls_slicing_keeps_companion_arrays(rng):
    """Review finding: slicing a BLS periodogram must slice the
    per-period duration/depth/transit_time arrays too."""
    t = np.arange(0, 30, 0.02)
    f = np.ones_like(t)
    ph = np.mod(t - 1.0 + 1.5, 3.0) - 1.5
    f[np.abs(ph) < 0.1] -= 0.01
    lc = LightCurve(time=t, flux=f + 0.001 * rng.standard_normal(len(t)))
    pg = lc.to_periodogram(method="bls",
                           period=np.linspace(2.0, 4.0, 200),
                           duration=[0.2])
    sub = pg[50:150]
    i = int(np.nanargmax(np.asarray(sub.power.value)))
    assert len(np.asarray(sub.duration)) == len(sub.power.value)
    # the companion value at the sliced argmax equals the full-array
    # value at the corresponding unsliced index
    np.testing.assert_allclose(
        np.asarray(sub.transit_time)[i],
        np.asarray(pg.transit_time)[50 + i])


def test_unknown_kwargs_and_methods_raise(rng):
    t = np.linspace(0, 30, 1000)
    lc = LightCurve(time=t, flux=1 + 0.01 * np.sin(2 * np.pi * t / 2.5))
    with pytest.raises(TypeError, match="unexpected keyword"):
        lc.to_periodogram(oversample_facto=10)
    with pytest.raises(TypeError, match="unexpected keyword"):
        lc.to_periodogram(method="bls", frequecy_factor=100)
    with pytest.raises(ValueError):
        lc.to_periodogram(ls_method="fastt")


def _create_beta_lyr_like_lc(dtype=np.float64):
    """Beta-Lyrae-like curve (reference test_periodogram.py:460-465)."""
    from lightkurve_tpu.time import Time
    t = np.arange(0, 30, 0.1)
    f = np.array(np.sin(t * 2 + np.pi / 2) + np.sin(t) + 1, dtype=dtype)
    return LightCurve(time=Time(t + 2457000, format="jd"),
                      flux=f).normalize()


@pytest.mark.parametrize("flux_dtype, ls_method, nterms, expected_period", [
    (np.float64, "fast", 1, np.pi),
    (np.float64, "fastchi2", 2, np.pi * 2),
    # fastnifty requires nifty-ls in the reference; the repo's dispatch
    # downgrades it to 'fast' (reference periodogram.py:917-930)
    (np.float32, "fast", 1, np.pi),
])
def test_ls_method_basics(flux_dtype, ls_method, nterms, expected_period):
    """Reference test_ls_method_basics: period recovery across methods,
    plus the #1567 nterms passthrough."""
    lc = _create_beta_lyr_like_lc(dtype=flux_dtype)
    pg = lc.to_periodogram(method="ls", ls_method=ls_method, nterms=nterms)
    np.testing.assert_almost_equal(pg.period_at_max_power.to("d").value,
                                   expected_period, decimal=1)
    assert pg.nterms == nterms
