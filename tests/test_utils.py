"""Mirrors reference tests/test_utils.py (channel lookup, quality flags,
running_mean, validate_method, bkjd/btjd helpers, quadratic centroids)."""
import numpy as np
import pytest
from numpy.testing import assert_almost_equal, assert_array_equal

from lightkurve_tpu.utils import (KeplerQualityFlags, TessQualityFlags,
                                  bkjd_to_astropy_time, btjd_to_astropy_time,
                                  centroid_quadratic,
                                  channel_to_module_output,
                                  module_output_to_channel, running_mean,
                                  show_citation_instructions,
                                  validate_method)


def test_channel_to_module_output():
    # reference tests/test_utils.py::test_channel_to_module_output
    assert channel_to_module_output(1) == (2, 1)
    assert channel_to_module_output(42) == (13, 2)
    assert channel_to_module_output(84) == (24, 4)
    assert channel_to_module_output(33) == (11, 1)
    with pytest.raises(ValueError):
        channel_to_module_output(0)


def test_module_output_to_channel():
    assert module_output_to_channel(2, 1) == 1
    assert module_output_to_channel(13, 2) == 42
    assert module_output_to_channel(24, 4) == 84
    assert module_output_to_channel(11, 1) == 33
    with pytest.raises(ValueError):
        module_output_to_channel(0, 1)
    with pytest.raises(ValueError):
        module_output_to_channel(2, 0)


def test_running_mean():
    assert_almost_equal(running_mean([1, 2, 3], window_size=1), [1, 2, 3])
    assert_almost_equal(running_mean([1, 2, 3], window_size=2), [1.5, 2.5])
    assert_almost_equal(running_mean([2, 2, 2], window_size=3), [2])
    assert_almost_equal(running_mean([3, 4, 5], window_size=20), [4])


@pytest.mark.parametrize("cls", [KeplerQualityFlags, TessQualityFlags])
def test_quality_flag_decoding(cls):
    flags = list(cls.STRINGS.items())
    for key, value in flags:
        assert cls.decode(key)[0] == value
    # combinations of flags decode to the individual labels
    assert cls.decode(flags[5][0] + flags[7][0]) == [flags[5][1],
                                                     flags[7][1]]
    assert cls.decode(flags[3][0] + flags[4][0] + flags[5][0]) == [
        flags[3][1], flags[4][1], flags[5][1]]


def test_quality_flag_decoding_quantity_object():
    """Quality values wrapped in a unit-carrying Quantity still decode
    (reference regression #804)."""
    from lightkurve_tpu.units import Quantity
    flags = list(TessQualityFlags.STRINGS.items())
    for key, value in flags[:4]:
        assert TessQualityFlags.decode(Quantity(key))[0] == value


def test_quality_mask():
    quality = np.array([0, 0, 1])
    assert np.all(KeplerQualityFlags.create_quality_mask(quality, bitmask=0))
    assert np.all(KeplerQualityFlags.create_quality_mask(quality,
                                                         bitmask=None))
    assert np.all(KeplerQualityFlags.create_quality_mask(quality,
                                                         bitmask="none"))
    assert KeplerQualityFlags.create_quality_mask(quality,
                                                  bitmask=1).sum() == 2
    assert KeplerQualityFlags.create_quality_mask(
        quality, bitmask="hardest").sum() == 2
    with pytest.raises(ValueError) as err:
        KeplerQualityFlags.create_quality_mask(quality,
                                               bitmask="invalidoption")
    assert "not supported" in err.value.args[0]


def test_validate_method():
    assert validate_method("foo", ["foo", "bar"]) == "foo"
    assert validate_method("FOO", ["foo", "bar"]) == "foo"
    with pytest.raises(ValueError):
        validate_method("foo", ["bar"])


def test_import():
    """Reference regression #605: lk.utils must be the top-level utils,
    not seismology.utils."""
    from lightkurve_tpu import utils
    assert hasattr(utils, "btjd_to_astropy_time")


def test_btjd_bkjd_input():
    """Reference regression #607: scalar/list/array inputs all work."""
    assert bkjd_to_astropy_time(0).jd[0] == 2454833.0
    for user_input in [[0], np.array([0])]:
        assert_array_equal(bkjd_to_astropy_time(user_input).jd,
                           np.array([2454833.0]))
    assert btjd_to_astropy_time(0).jd[0] == 2457000.0
    for user_input in [[0], np.array([0])]:
        assert_array_equal(btjd_to_astropy_time(user_input).jd,
                           np.array([2457000.0]))


def test_centroid_quadratic():
    data = np.ones((9, 9))
    data[2, 5] = 10
    col, row = centroid_quadratic(data)
    assert np.isclose(row, 2) and np.isclose(col, 5)
    # two equally-bright pixels side by side
    data = np.zeros((9, 9))
    data[5, 1] = 5
    data[5, 2] = 5
    col, row = centroid_quadratic(data)
    assert np.isclose(row, 5) and np.isclose(col, 1.5)


_a_mask = np.full((5, 5), True, dtype=bool)
_a_mask[0:2, :] = False


@pytest.mark.parametrize("data_dtype, mask", [
    (float, None), (float, _a_mask), (int, None), (int, _a_mask)])
def test_centroid_quadratic_robustness(data_dtype, mask):
    """Edge cases: corner maxima, NaNs, all-negative data (reference
    regressions #610, #1401)."""
    data = np.zeros((5, 5), dtype=data_dtype)
    data[0, 0] = 1
    col, row = centroid_quadratic(data, mask=mask)
    if mask is None:
        assert np.isfinite(col) and np.isfinite(row)
    else:
        # the mask removes the only bright pixel: eligible pixels are
        # uniformly zero, so no centroid exists
        assert np.isnan(col) and np.isnan(row)

    data = np.zeros((5, 5), dtype=data_dtype)
    data[-1, -1] = 1
    col, row = centroid_quadratic(data, mask=mask)
    assert np.isfinite(col) and np.isfinite(row)

    if data_dtype is float:
        data = np.zeros((5, 5))
        data[0, 0] = np.nan
        data[-1, -1] = 10
        col, row = centroid_quadratic(data, mask=mask)
        assert np.isfinite(col) and np.isfinite(row)

        data = np.zeros((5, 5))
        data[3, 2] = 10
        data[3, 3] = np.nan
        col, row = centroid_quadratic(data, mask=mask)
        assert np.isfinite(col) and np.isfinite(row)

    data = np.full((5, 5), -9, dtype=data_dtype)
    data[3, 2] = -5
    col, row = centroid_quadratic(data, mask=mask)
    assert np.isfinite(col) and np.isfinite(row)


def test_show_citation_instructions():
    show_citation_instructions()
