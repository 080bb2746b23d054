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
    assert pg.period.value.max() <= (tv.max() - tv.min()) / 3 + 1e-6
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
