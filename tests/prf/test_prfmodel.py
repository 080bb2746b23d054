"""Mirrors of reference tests/prf/test_prfmodel.py.

The reference tests are remote-data gated on the MAST calibration files;
here the analytic :class:`SimpleKeplerPRF`/:class:`GaussianPRF` stand in
(our :class:`KeplerPRF` needs a local ``prf_dir``), so each behavioral
assertion — normalization, concentric consistency, gradient-vs-calculus —
runs offline.
"""
from collections import OrderedDict

import numpy as np
import pytest
from numpy.testing import assert_allclose

from lightkurve_tpu.prf import GaussianPRF, KeplerPRF, SimpleKeplerPRF

import sys
import os
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
from synthetic import make_synthetic_tpf


def test_prf_normalization():
    """Does the PRF model integrate to the requested flux?"""
    for col in [123, 678]:
        for row in [234, 789]:
            shape = (18, 14)
            flux = 100
            prf = SimpleKeplerPRF(channel=1, column=col, row=row,
                                  shape=shape)
            prf_sum = np.asarray(prf.evaluate(
                col + shape[1] / 2, row + shape[0] / 2, flux, 1, 1, 0)).sum()
            assert np.isclose(prf_sum, flux, rtol=0.1)


def test_simple_kepler_prf():
    """Concentric PRFs have the same values."""
    prf_1 = SimpleKeplerPRF(channel=16, shape=[20, 20], column=0, row=0)
    prf_2 = SimpleKeplerPRF(channel=16, shape=[10, 10], column=5, row=5)
    for c in [10, 8, 7]:
        for r in [10, 7]:
            assert_allclose(
                np.asarray(prf_2(center_col=c, center_row=r, flux=1)),
                np.asarray(prf_1(center_col=c, center_row=r,
                                 flux=1))[5:15, 5:15],
                rtol=1e-5, atol=1e-10)


def test_get_model_prf():
    """tpf.get_prf_model() is configured from the TPF's geometry."""
    tpf = make_synthetic_tpf(n_cadences=5, shape=(9, 9), mission="Kepler")
    prf = SimpleKeplerPRF(channel=tpf.channel or 1, shape=tpf.shape[1:],
                          column=tpf.column, row=tpf.row)
    prf_from_tpf = tpf.get_prf_model()
    assert type(prf) is type(prf_from_tpf)
    assert prf.shape == prf_from_tpf.shape
    assert prf.column == prf_from_tpf.column
    assert prf.row == prf_from_tpf.row


def test_keplerprf_missing_calibration():
    """Without a local calibration dir, KeplerPRF raises informatively."""
    with pytest.raises(Exception, match="[Cc]alibration|prf"):
        KeplerPRF(channel=56, shape=(15, 15), column=0, row=0,
                  prf_dir="/nonexistent")


@pytest.mark.parametrize("param_to_test", [
    "center_col", "center_row", "flux", "scale_col", "scale_row",
    "rotation_angle",
])
def test_prf_gradient_against_calculus(param_to_test):
    """Is the autodiff gradient consistent with finite differences?
    (mirrors reference test_keplerprf_gradient_against_calculus,
    tests/prf/test_prfmodel.py:101-140, on the calibration-free PRF)"""
    params = OrderedDict([
        ("center_col", 7.0), ("center_row", 7.0), ("flux", 1000.0),
        ("scale_col", 1.0), ("scale_row", 1.0), ("rotation_angle", 0.0)])
    param_order = OrderedDict(zip(params.keys(), range(6)))
    prf = GaussianPRF(shape=(15, 15), column=0, row=0, sigma=1.0)
    h = 1e-6
    f = prf.evaluate
    inc_params = params.copy()
    inc_params[param_to_test] += h
    diff_prf = (np.asarray(f(**inc_params), float)
                - np.asarray(f(**params), float)) / h
    prf_grad = prf.gradient(**params)
    err = np.max(np.abs(prf_grad[param_order[param_to_test]] - diff_prf)
                 / (1.0 + np.abs(diff_prf)))
    assert err < 1e-3


def test_gradient_shapes():
    """gradient() returns one image per parameter."""
    prf = SimpleKeplerPRF(channel=1, shape=(11, 13), column=0, row=0)
    grads = prf.gradient(center_col=6.0, center_row=5.0, flux=10.0)
    assert len(grads) == 6
    for g in grads:
        assert g.shape == (11, 13)


def _write_synthetic_calibration(prf_dir, channel, sigma=1.5 / 2.3548,
                                 oversample=50, radius=6):
    """Write a kplrMM.O_prf.fits calibration file whose five PRF images
    are the supersampled Gaussian that GaussianPRF uses internally, so a
    KeplerPRF loaded from it evaluates identically to
    GaussianPRF(sigma=sigma, oversample=oversample)."""
    from lightkurve_tpu.io.fits import (Header, HDUList, ImageHDU,
                                        PrimaryHDU)
    from lightkurve_tpu.utils import channel_to_module_output

    n = 2 * radius * oversample + 1
    ax = (np.arange(n) - (n - 1) / 2) / oversample
    xx, yy = np.meshgrid(ax, ax)
    img = np.exp(-(xx ** 2 + yy ** 2) / (2 * sigma ** 2))
    img = (img / img.sum() * oversample ** 2).astype(">f4")
    hdus = [PrimaryHDU(header=Header({"SIMPLE": True}))]
    for crval1, crval2 in [(12, 20), (12, 1044), (1111, 20),
                           (1111, 1044), (550, 532)]:
        hdus.append(ImageHDU(data=img, header=Header(
            {"CRVAL1P": crval1, "CRVAL2P": crval2})))
    module, output = channel_to_module_output(channel)
    path = os.path.join(prf_dir,
                        f"kplr{module:02}.{output}_2011265_prf.fits")
    HDUList(hdus).writeto(path, overwrite=True)
    return path


def test_keplerprf_gradient_against_simplekeplerprf(tmp_path):
    """KeplerPRF's gradient in the shared (col,row,flux) parameters matches
    the analytic model's at identity rotation/scale (reference
    tests/prf/test_prfmodel.py:77-86; the reference loads stsci
    calibration files, we write an equivalent local calibration file)."""
    kwargs = {"shape": (15, 15), "column": 0, "row": 0}
    params = {"center_col": 7.0, "center_row": 7.0, "flux": 1.0}
    _write_synthetic_calibration(str(tmp_path), channel=56)
    analytic = GaussianPRF(sigma=1.5 / 2.3548, oversample=50, **kwargs)
    prf = KeplerPRF(channel=56, prf_dir=str(tmp_path), **kwargs)
    # sanity: the calibration-file PRF evaluates like the analytic one
    np.testing.assert_allclose(
        np.asarray(prf(**params)), np.asarray(analytic(**params)),
        rtol=1e-4, atol=1e-7)
    prf_grad = prf.gradient(rotation_angle=0.0, scale_col=1.0,
                            scale_row=1.0, **params)
    analytic_grad = analytic.gradient(**params)
    for g_full, g_simple in zip(prf_grad[:3], analytic_grad[:3]):
        np.testing.assert_allclose(np.asarray(g_full),
                                   np.asarray(g_simple),
                                   rtol=1e-4, atol=1e-6)


def test_simple_kepler_prf_interpolation_consistency():
    """The evaluated PRF integrates to the requested flux and peaks at the
    requested center — the local analogue of the reference's
    calibration-file consistency check (reference
    tests/prf/test_prfmodel.py:45-57)."""
    sprf = SimpleKeplerPRF(channel=56, shape=(15, 15), column=0, row=0)
    img = np.asarray(sprf(center_col=7.5, center_row=7.5, flux=1.0))
    assert img.shape == (15, 15)
    np.testing.assert_allclose(img.sum(), 1.0, rtol=2e-2)
    peak = np.unravel_index(np.argmax(img), img.shape)
    assert abs(peak[0] - 7.5) <= 1.0 and abs(peak[1] - 7.5) <= 1.0


def test_separable_interp_matches_gather_path():
    """The gather-free matmul interpolation (axis-aligned offsets) is
    numerically identical to the generic rotated-gather path at
    rotation=0, including scales, sub-pixel centers, and off-support
    truncation at the cutout edge."""
    import jax.numpy as jnp
    from lightkurve_tpu.prf.prfmodel import GaussianPRF
    prf = GaussianPRF(shape=(9, 11), column=5, row=3)
    cases = [
        dict(center_col=10.3, center_row=7.6, flux=123.4),
        dict(center_col=5.01, center_row=3.01, flux=1.0),      # corner
        dict(center_col=15.9, center_row=11.9, flux=2.0),      # far edge
        dict(center_col=10.0, center_row=8.0, flux=5.0,
             scale_col=1.2, scale_row=0.8),
    ]
    for kw in cases:
        sep = np.asarray(prf.evaluate(**kw))                  # separable
        gen = np.asarray(prf._interp_device(
            (jnp.asarray(prf.row_coord) - kw["center_row"])[:, None]
            * kw.get("scale_row", 1.0)
            * jnp.ones((1, len(prf.col_coord))),
            (jnp.asarray(prf.col_coord) - kw["center_col"])[None, :]
            * kw.get("scale_col", 1.0)
            * jnp.ones((len(prf.row_coord), 1)))) * kw["flux"]
        np.testing.assert_allclose(sep, gen, rtol=1e-6, atol=1e-12,
                                   err_msg=str(kw))
    # a traced rotation forces the gather path (conservative fallback)
    out = prf.evaluate(10.0, 7.0, 1.0, rotation_angle=jnp.asarray(0.0))
    ref = prf.evaluate(10.0, 7.0, 1.0, rotation_angle=0.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-12)
