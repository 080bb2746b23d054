"""TargetPixelFile tests (mirrors reference tests/test_targetpixelfile.py)."""
import numpy as np
import pytest

from lightkurve_tpu import KeplerLightCurve, TessLightCurve
from lightkurve_tpu.targetpixelfile import (KeplerTargetPixelFile,
                                            TargetPixelFile,
                                            TargetPixelFileFactory,
                                            TessTargetPixelFile)
from synthetic import make_synthetic_tpf, sine_signal, transit_signal


@pytest.fixture(scope="module")
def tpf():
    return make_synthetic_tpf(n_cadences=100, mission="TESS")


def test_basic_properties(tpf):
    assert tpf.shape == (100, 9, 9)
    assert len(tpf) == 100
    assert tpf.column == 100
    assert tpf.row == 200
    assert tpf.mission == "TESS"
    assert tpf.time.format == "btjd"
    assert tpf.pipeline_mask.sum() == 9
    assert tpf.flux.value.shape == (100, 9, 9)
    assert str(tpf.flux.unit) == "electron / s"


def test_slicing(tpf):
    sub = tpf[10:20]
    assert sub.shape == (10, 9, 9)
    assert np.allclose(sub.time.value, tpf.time.value[10:20])
    one = tpf[5]
    assert one.shape[0] == 1
    boolmask = tpf.time.value < tpf.time.value[50]
    sub2 = tpf[boolmask]
    assert sub2.shape[0] == 50


def test_arithmetic(tpf):
    t2 = tpf * 2.0
    np.testing.assert_allclose(t2.flux.value, tpf.flux.value * 2, rtol=1e-6)
    t3 = tpf + 100.0
    np.testing.assert_allclose(t3.flux.value, tpf.flux.value + 100,
                               rtol=1e-6)


def test_aperture_mask_parsing(tpf):
    m = tpf._parse_aperture_mask("all")
    assert m.all()
    m = tpf._parse_aperture_mask("empty")
    assert not m.any()
    m = tpf._parse_aperture_mask("pipeline")
    assert m.sum() == 9
    m = tpf._parse_aperture_mask("threshold")
    assert 0 < m.sum() < 81
    m = tpf._parse_aperture_mask("background")
    assert m.sum() >= 40
    m = tpf._parse_aperture_mask(None)
    assert m.all()
    # integer bitmask style (bit 2 = selected)
    custom = np.zeros((9, 9), dtype=np.int32)
    custom[4, 4] = 3
    m = tpf._parse_aperture_mask(custom)
    assert m.sum() == 1 and m[4, 4]
    with pytest.raises(ValueError):
        tpf._parse_aperture_mask(np.ones((3, 3), dtype=bool))


def test_threshold_mask_picks_star(tpf):
    m = tpf.create_threshold_mask(threshold=3)
    assert m[4, 4]
    assert m.sum() < 30
    # reference_pixel=None returns all regions
    m_all = tpf.create_threshold_mask(threshold=3, reference_pixel=None)
    assert m_all.sum() >= m.sum()


def test_photometry_matches_numpy_oracle(tpf):
    """Device kernel vs nansum oracle (reference :868-932 semantics)."""
    lc = tpf.extract_aperture_photometry(aperture_mask="pipeline")
    assert isinstance(lc, TessLightCurve)
    mask = tpf.pipeline_mask
    want = np.nansum(tpf.flux.value[:, mask], axis=1)
    np.testing.assert_allclose(lc.flux.value, want, rtol=1e-6)
    want_err = np.sqrt(np.nansum(tpf.flux_err.value[:, mask] ** 2, axis=1))
    np.testing.assert_allclose(lc.flux_err.value, want_err, rtol=1e-6)
    assert "centroid_col" in lc.columns
    # flux_method variants
    lc_med = tpf.extract_aperture_photometry(aperture_mask="pipeline",
                                             flux_method="median")
    want_med = np.nanmedian(tpf.flux.value[:, mask], axis=1)
    np.testing.assert_allclose(lc_med.flux.value, want_med, rtol=1e-6)
    lc_mean = tpf.extract_aperture_photometry(aperture_mask="pipeline",
                                              flux_method="mean")
    want_mean = np.nanmean(tpf.flux.value[:, mask], axis=1)
    np.testing.assert_allclose(lc_mean.flux.value, want_mean, rtol=1e-6)


def test_photometry_nan_handling():
    tpf = make_synthetic_tpf(n_cadences=20)
    flux = tpf._columns["FLUX"].copy()
    flux[3] = np.nan                       # all-NaN cadence → NaN
    flux[5] = 0.0                          # all-zero cadence → NaN
    tpf._columns["FLUX"] = flux
    lc = tpf.extract_aperture_photometry(aperture_mask="pipeline")
    assert np.isnan(lc.flux.value[3])
    assert np.isnan(lc.flux.value[5])
    assert np.isfinite(np.delete(lc.flux.value, [3, 5])).all()


def test_centroids(tpf):
    col, row = tpf.estimate_centroids(aperture_mask="pipeline")
    # star is at pixel center (4,4) → absolute (col+4, row+4)
    assert abs(np.median(col.value) - (100 + 4)) < 0.1
    assert abs(np.median(row.value) - (200 + 4)) < 0.1
    col2, row2 = tpf.estimate_centroids(aperture_mask="pipeline",
                                        method="quadratic")
    assert abs(np.median(col2.value) - (100 + 4)) < 0.3
    assert abs(np.median(row2.value) - (200 + 4)) < 0.3


def test_centroid_tracks_motion():
    from synthetic import sawtooth_motion
    tpf = make_synthetic_tpf(n_cadences=150, motion=sawtooth_motion(),
                             noise=0.1)
    col, row = tpf.estimate_centroids(aperture_mask="all")
    dcol = col.value - np.mean(col.value)
    truth, _ = sawtooth_motion()(tpf.time.value)
    truth = truth - truth.mean()
    # reference bar: centroids track injected motion to <0.01 px after fit;
    # we require strong correlation and small residual
    assert np.corrcoef(dcol, truth)[0, 1] > 0.98
    assert np.std(dcol - truth) < 0.05


def test_estimate_background(tpf):
    bkg = tpf.estimate_background()
    # injected constant background = 10 e-/s/pixel
    assert abs(np.median(bkg.flux.value) - 10.0) < 1.0


def test_to_lightcurve_dispatch(tpf):
    lc = tpf.to_lightcurve()
    assert len(lc) == len(tpf)
    with pytest.raises(ValueError):
        tpf.to_lightcurve(method="bogus")


def test_wcs_and_coordinates(tpf):
    ra, dec = tpf.wcs.pixel_to_world(4, 4)
    assert abs(float(ra) - 80.0) < 0.1
    assert abs(float(dec) - (-70.0)) < 0.1
    # world_to_pixel inverts
    x, y = tpf.wcs.world_to_pixel(float(ra), float(dec))
    assert abs(float(x) - 4) < 1e-6
    assert abs(float(y) - 4) < 1e-6
    ra_all, dec_all = tpf.get_coordinates(cadence=0)
    assert ra_all.shape == (9, 9)


def test_cutout(tpf):
    cut = tpf.cutout(size=3)
    assert cut.shape == (100, 3, 3)
    assert cut.column == 100 + 3
    assert cut.row == 200 + 3
    # photometry of full-frame cutout equals aperture photometry
    lc = cut.extract_aperture_photometry(aperture_mask="all")
    assert np.isfinite(lc.flux.value).all()


def test_to_fits_roundtrip(tmp_path, tpf):
    path = str(tmp_path / "tpf.fits")
    tpf.to_fits(path, overwrite=True)
    from lightkurve_tpu.io import open_fits, detect_filetype
    back = TessTargetPixelFile(path, quality_bitmask="none")
    np.testing.assert_allclose(back.flux.value, tpf.flux.value, rtol=1e-6)
    np.testing.assert_allclose(back.time.value, tpf.time.value, atol=1e-9)
    assert back.pipeline_mask.sum() == tpf.pipeline_mask.sum()


def test_factory_from_images(tmp_path):
    """Reference targetpixelfile.py:1619-1867: FFI stack → TPF."""
    from lightkurve_tpu.io.fits import (HDUList, Header, ImageHDU,
                                        PrimaryHDU, write_fits)
    from synthetic import gaussian_star
    rng = np.random.default_rng(3)
    paths = []
    for i in range(10):
        img = 100 + gaussian_star((50, 60), 30.0, 25.0, 5000.0) \
            + rng.standard_normal((50, 60))
        hdr = Header({"TELESCOP": "Kepler", "TIME": 100.0 + i,
                      "CADENCENO": i,
                      "CRPIX1": 30.0, "CRPIX2": 25.0,
                      "CRVAL1": 80.0, "CRVAL2": -70.0,
                      "CDELT1": -0.001, "CDELT2": 0.001})
        p = str(tmp_path / f"ffi{i:02d}.fits")
        write_fits(HDUList([PrimaryHDU(),
                            ImageHDU(data=img.astype(np.float32),
                                     header=hdr)]), p)
        paths.append(p)
    tpf = KeplerTargetPixelFile.from_fits_images(
        paths, position=(80.0, -70.0), size=(11, 11), target_id="ffi-test")
    assert tpf.shape == (10, 11, 11)
    # star centered in the cutout
    med = np.nanmedian(tpf.flux.value, axis=0)
    r, c = np.unravel_index(np.nanargmax(med), med.shape)
    assert abs(r - 5) <= 1 and abs(c - 5) <= 1
    lc = tpf.extract_aperture_photometry(aperture_mask="threshold")
    assert np.isfinite(lc.flux.value).all()


def test_plot_smoke(tpf):
    import matplotlib.pyplot as plt
    tpf.plot()
    tpf.plot(aperture_mask="pipeline")
    small = make_synthetic_tpf(n_cadences=10, shape=(4, 4))
    small.plot_pixels()
    plt.close("all")


def test_pld_corrector_on_synthetic():
    """PLD end-to-end on a motion-systematics TPF
    (reference pldcorrector tests)."""
    from synthetic import sawtooth_motion
    tpf = make_synthetic_tpf(n_cadences=400, mission="K2",
                             motion=sawtooth_motion(amp_col=0.3,
                                                    amp_row=0.15),
                             noise=0.5, seed=5)
    from lightkurve_tpu.correctors import PLDCorrector
    pld = tpf.to_corrector("pld")
    assert isinstance(pld, PLDCorrector)
    corrected = pld.correct(pld_order=2, pca_components=5,
                            restore_trend=True)
    raw = tpf.to_lightcurve(aperture_mask="threshold")
    raw_std = np.std(raw.flux.value / np.median(raw.flux.value))
    cor_std = np.std(corrected.flux.value
                     / np.median(corrected.flux.value))
    assert cor_std < raw_std


def test_extract_prf_photometry():
    tpf = make_synthetic_tpf(n_cadences=12, noise=0.5, star_flux=6000.0,
                             seed=61)
    phot = tpf.extract_prf_photometry()
    assert phot.opt_params.shape[0] == 12
    lc = phot.to_lightcurve(time=tpf.time.value)
    # flux within 30% (generic Gaussian PRF vs the synthetic sigma)
    assert abs(np.median(lc.flux.value) - 6000) / 6000 < 0.3


def test_interact_static_panel(tmp_path, rng):
    """tpf.interact() renders the static pixel-selector stand-in and
    honors the widget's export-to-FITS function."""
    import matplotlib.pyplot as plt
    from lightkurve_tpu.targetpixelfile import TargetPixelFileFactory
    fac = TargetPixelFileFactory(n_cadences=20, n_rows=5, n_cols=5)
    for i in range(20):
        img = rng.normal(10.0, 0.5, (5, 5)).astype(np.float32)
        img[2, 2] += 100.0
        fac.add_cadence(frameno=i, flux=img,
                        flux_err=np.ones((5, 5), np.float32),
                        header={"TIME": i * 0.02})
    tpf = fac.get_tpf()
    out = str(tmp_path / "exported.fits")
    fig = tpf.interact(aperture_mask="threshold", exported_filename=out)
    assert fig is not None
    import os
    assert os.path.exists(out)
    from lightkurve_tpu.io.fits import open_fits
    hdus = open_fits(out)
    assert any(h.header.get("EXTNAME") == "APERTURE" for h in hdus[1:])
    plt.close("all")


def test_fluxmode(tpf):
    """Reference test_fluxmode: median/mean aperture flux methods."""
    lc_n = tpf.extract_aperture_photometry(aperture_mask="all")
    lc_sum = tpf.extract_aperture_photometry(aperture_mask="all",
                                             flux_method="sum")
    lc_med = tpf.extract_aperture_photometry(aperture_mask="all",
                                             flux_method="median")
    lc_mean = tpf.extract_aperture_photometry(aperture_mask="all",
                                              flux_method="mean")
    frame = np.asarray(tpf.flux.value[0])
    assert np.isclose(float(lc_n.flux.value[0]), np.nansum(frame))
    assert np.isclose(float(lc_sum.flux.value[0]), np.nansum(frame))
    assert np.isclose(float(lc_med.flux.value[0]), np.nanmedian(frame))
    assert np.isclose(float(lc_mean.flux.value[0]), np.nanmean(frame))


def test_bkg_lightcurve(tpf):
    """Reference test_bkg_lightcurve: per-cadence background estimate."""
    bkg = tpf.get_bkg_lightcurve()
    assert len(bkg) == len(tpf)
    assert np.isfinite(np.asarray(bkg.flux.value)).all()


def test_get_keyword(tpf):
    assert tpf.get_keyword("TELESCOP", default="x") in ("TESS", "x")
    assert tpf.get_keyword("NOT_A_KEY", default=42) == 42


def test_animate_smoke(tpf):
    import matplotlib.pyplot as plt
    anim = tpf.animate()
    assert anim is not None
    plt.close("all")


def test_pld_with_zero_flux_cadence(tpf):
    """Reference regression #873: a cadence of all-zero flux must not
    break PLDCorrector (division by the pixel-sum normalization)."""
    import jax.numpy as jnp
    from lightkurve_tpu.correctors import PLDCorrector
    flux = np.asarray(tpf.flux.value).copy()
    flux[3] = 0.0
    tpf2 = type(tpf)._from_arrays(
        {**{k: np.asarray(v.value if hasattr(v, "value") else v)
            for k, v in tpf._columns.items()}, "FLUX": flux},
        dict(tpf.meta), ext_header=dict(tpf._ext_header),
        quality_bitmask="none")
    corrected = PLDCorrector(tpf2).correct()
    assert np.isfinite(np.asarray(corrected.flux.value)).sum() > 0


def test_tpf_wcs_from_images(tmp_path):
    """Mirror of reference test_targetpixelfile.py:test_tpf_wcs_from_images:
    positional cutouts require WCS in the image headers, and the product
    TPF carries a working WCS (reference asserts 1CRPX5 is defined)."""
    from lightkurve_tpu.io.fits import (HDUList, Header, ImageHDU,
                                        PrimaryHDU, write_fits)
    from lightkurve_tpu.utils import LightkurveError
    rng = np.random.default_rng(11)
    # no WCS at all → raises
    bare = []
    for i in range(3):
        hdr = Header({"TELESCOP": "TESS", "TIME": 100.0 + i})
        p = str(tmp_path / f"bare{i}.fits")
        write_fits(HDUList([PrimaryHDU(),
                            ImageHDU(data=rng.standard_normal(
                                (30, 30)).astype(np.float32),
                                header=hdr)]), p)
        bare.append(p)
    with pytest.raises(LightkurveError):
        TargetPixelFile.from_fits_images(bare, position=(23.23, 45.23),
                                         size=(3, 3))
    # with a TAN WCS → works and the cutout WCS round-trips
    ra0, dec0 = 23.2334, 45.2333
    paths = []
    for i in range(3):
        hdr = Header({"TELESCOP": "TESS", "TIME": 100.0 + i,
                      "CRPIX1": 15.0, "CRPIX2": 15.0,
                      "CRVAL1": ra0, "CRVAL2": dec0,
                      "CDELT1": -0.001111, "CDELT2": 0.001111,
                      "CTYPE1": "RA---TAN", "CTYPE2": "DEC--TAN"})
        p = str(tmp_path / f"wcs{i}.fits")
        write_fits(HDUList([PrimaryHDU(),
                            ImageHDU(data=rng.standard_normal(
                                (30, 30)).astype(np.float32),
                                header=hdr)]), p)
        paths.append(p)
    tpf = TargetPixelFile.from_fits_images(paths, position=(ra0, dec0),
                                           size=(5, 5))
    assert tpf.get_keyword("1CRPX5", hdu=1) is not None
    # the reference position lands inside the 5x5 cutout
    x, y = tpf.wcs.world_to_pixel(ra0, dec0)
    assert -0.5 <= float(x) <= 4.5
    assert -0.5 <= float(y) <= 4.5
    ra_back, dec_back = tpf.wcs.pixel_to_world(float(x), float(y))
    np.testing.assert_allclose([float(ra_back), float(dec_back)],
                               [ra0, dec0], atol=1e-6)
