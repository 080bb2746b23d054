"""Units and time foundation tests."""
import numpy as np
import pytest

from lightkurve_tpu.units import (Quantity, Unit, UnitConversionError, day,
                                  dimensionless, hour, percent, ppm, ppt, uHz,
                                  one_per_day, electron_per_second)
from lightkurve_tpu.time import Time, TimeDelta, TIME_FORMAT_OFFSETS


def test_relative_flux_units():
    q = Quantity([1.0, 2.0], ppm)
    assert np.allclose(q.to(ppt).value, [0.001, 0.002])
    assert np.allclose(q.to(percent).value, [1e-4, 2e-4])
    assert np.allclose(q.to(dimensionless).value, [1e-6, 2e-6])


def test_unit_parse():
    assert Unit.parse("ppm") == ppm
    assert Unit.parse("electron / s") == electron_per_second
    assert Unit.parse("").bases == {}
    with pytest.raises(UnitConversionError):
        Unit.parse("furlongs")


def test_frequency_conversion():
    q = Quantity(1.0, one_per_day)
    # 1 cycle/day = 1e6/86400 uHz
    assert np.isclose(q.to(uHz).value, 1e6 / 86400)


def test_time_conversion():
    q = Quantity(1.0, day)
    assert np.isclose(q.to(hour).value, 24.0)


def test_quantity_arithmetic():
    a = Quantity([2.0], day)
    b = Quantity([24.0], hour)
    assert np.isclose((a + b).value, 3.0)
    assert np.isclose((a * 2).value, 4.0)
    assert (a / b).unit.bases == {}
    with pytest.raises(UnitConversionError):
        a + Quantity([1.0], ppm)


def test_bkjd_btjd_offsets():
    # reference time.py:25,43
    assert TIME_FORMAT_OFFSETS["bkjd"] == 2454833.0
    assert TIME_FORMAT_OFFSETS["btjd"] == 2457000.0
    t = Time([100.0, 200.0], format="bkjd")
    assert np.allclose(t.jd, [2454933.0, 2455033.0])
    assert np.allclose(t.btjd, [100.0 - 2167.0, 200.0 - 2167.0])
    assert np.allclose(t.value, [100.0, 200.0])


def test_time_arithmetic():
    t = Time([10.0, 20.0], format="btjd")
    dt = t[1] - t[0]
    assert isinstance(dt, TimeDelta)
    assert np.isclose(dt.value, 10.0)
    t2 = t + 1.5
    assert np.allclose(t2.value, [11.5, 21.5])
    t3 = t + Quantity(12.0, hour)
    assert np.allclose(t3.value, [10.5, 20.5])
    assert (t < 15.0).tolist() == [True, False]


def test_time_precision():
    # bkjd epoch + offset keeps sub-ms precision
    t = Time([1000.123456789], format="bkjd")
    assert abs(t.bkjd[0] - 1000.123456789) < 1e-9
