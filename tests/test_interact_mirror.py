"""Mirrors of the reference's bokeh-free-testable interact behaviors
(reference tests/test_interact.py) against the static matplotlib panel.
"""
import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

from lightkurve_tpu.interact import get_lightcurve_y_limits  # noqa: E402
from lightkurve_tpu.targetpixelfile import TargetPixelFileFactory  # noqa: E402


@pytest.fixture
def tpf(rng):
    fac = TargetPixelFileFactory(n_cadences=20, n_rows=5, n_cols=5)
    for i in range(20):
        img = rng.normal(10.0, 0.5, (5, 5)).astype(np.float32)
        img[2, 2] += 100.0
        fac.add_cadence(frameno=i, flux=img,
                        flux_err=np.ones((5, 5), np.float32),
                        header={"TIME": i * 0.02})
    return fac.get_tpf()


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def test_custom_aperture_mask(tpf):
    """Boolean / None / 'threshold' masks all render
    (reference test_interact.py:65-79); an empty mask falls back to the
    threshold mask (reference interact.py:1087-1094)."""
    mask = tpf.flux.value[0] == tpf.flux.value[0]
    for m in [mask, None, "threshold", np.zeros((5, 5), bool)]:
        fig = tpf.interact(aperture_mask=m)
        assert fig is not None
        plt.close("all")


def test_custom_exported_filename(tmp_path, tpf):
    """exported_filename is coerced to str and given a .fits suffix
    (reference test_interact.py:83-101, interact.py:1096-1104)."""
    for name, expected in [
        ("demo.fits", "demo.fits"),
        ("string_only", "string_only.fits"),
        ("demo2.FITS", "demo2.FITS"),
        ("demo3.png", "demo3.png.fits"),
        (210690913, "210690913.fits"),
    ]:
        tpf.interact(exported_filename=str(tmp_path / str(name)))
        assert (tmp_path / expected).exists(), expected
        plt.close("all")
    # sliced TPFs still render/export
    tpf[0:2].interact()
    tpf[tpf.time.value == tpf.time.value].interact()
    plt.close("all")


def test_transform_and_ylim_funcs(tpf):
    """transform_func/ylim_func are honored
    (reference test_interact.py:104-115)."""
    tpf.interact(transform_func=lambda lc: lc.normalize())
    tpf.interact(transform_func=lambda lc: lc.flatten().normalize())
    fig = tpf.interact(transform_func=lambda lc: lc,
                       ylim_func=lambda lc: (0, 2))
    ax = fig.axes[1]
    assert ax.get_ylim() == (0.0, 2.0)
    tpf.interact(ylim_func=lambda lc: (0, lc.flux.value.max()))
    plt.close("all")


def test_ylim_with_nans():
    """Regression mirror for reference #679: y limits are never NaN, and
    match the reference's exact values for [-1, nan, 1]
    (reference test_interact.py:290-298)."""
    ymin, ymax = get_lightcurve_y_limits({"flux": [-1, np.nan, 1]})
    assert ymin == pytest.approx(-1.176)
    assert ymax == pytest.approx(1.176)


def test_get_lightcurve_y_limits_basic(rng):
    """Limits bracket the bulk of the flux and ignore 5-sigma outliers
    (reference interact.py:252-270)."""
    flux = rng.normal(1.0, 0.01, 1000)
    flux[0] = 50.0  # extreme outlier must not blow up the limits
    lo, hi = get_lightcurve_y_limits(flux)
    assert 0.9 < lo < 1.0 < hi < 1.1


def test_preprocess_lc():
    """BLS preprocessing removes NaNs and normalizes to dimensionless
    (reference test_interact_bls.py:76-97)."""
    from lightkurve_tpu import LightCurve
    from lightkurve_tpu.interact import _preprocess_lc_for_bls
    from lightkurve_tpu.units import dimensionless

    t = np.linspace(0, 10, 100)
    flux = 1000.0 + np.sin(t)
    flux[5] = np.nan
    lc = LightCurve(time=t, flux=flux,
                    flux_err=np.full(t.size, 0.1))
    clean = _preprocess_lc_for_bls(lc)
    assert not np.isnan(np.asarray(clean.flux.value)).any()
    assert clean.meta.get("NORMALIZED", False)
    assert clean.flux.unit == dimensionless

    # already normalized but in percent: converted back to unscaled
    lc_pct = lc.normalize(unit="percent")
    clean = _preprocess_lc_for_bls(lc_pct)
    assert not np.isnan(np.asarray(clean.flux.value)).any()
    assert clean.meta.get("NORMALIZED", False)
    assert clean.flux.unit == dimensionless
    np.testing.assert_allclose(np.median(np.asarray(clean.flux.value)),
                               1.0, rtol=1e-3)


def test_malformed_notebook_url():
    """Mirrors reference test_interact.py/test_interact_bls.py::
    test_malformed_notebook_url: an empty notebook_url raises the
    'Empty host value' contract (the reference surfaces it from bokeh;
    here finalize_notebook_url validates directly)."""
    import pytest
    from lightkurve_tpu.utils import finalize_notebook_url
    with pytest.raises(ValueError, match="Empty host value"):
        finalize_notebook_url("")
    assert finalize_notebook_url("myhost:9999") == "myhost:9999"
    assert finalize_notebook_url(None) == "localhost:8888"


def test_graceful_exit_outside_notebook():
    """Mirrors reference test_graceful_exit_outside_notebook: invoking
    the interact widget outside a notebook must not crash (the reference
    returns None from the bokeh app; the redesigned static panel returns
    its figure handle — the contract is graceful execution)."""
    import matplotlib
    from tests.synthetic import make_synthetic_tpf
    tpf = make_synthetic_tpf(n_cadences=6)
    result = tpf.interact()
    assert result is not None
    matplotlib.pyplot.close("all")


def test_interact_sky_functions_add_nearby_tics():
    """Mirrors reference test_interact_sky_functions_add_nearby_tics:
    merging a nearby-TIC report into the Gaia catalog annotates matched
    Gaia rows with their TIC and appends TIC-only rows with Source=0."""
    import numpy as np
    from lightkurve_tpu.interact import merge_nearby_tics
    gaia = {"source_id": [111, 222, 333],
            "ra": [10.0, 10.001, 10.002],
            "dec": [-5.0, -5.001, -5.002],
            "gmag": [12.0, 13.0, 14.0]}
    tics = [
        {"tic": "900001", "gaia_id": 222, "tmag": 12.8},  # Gaia match
        {"tic": "900002", "ra": 10.003, "dec": -5.003,    # TIC-only
         "tmag": 15.2},
    ]
    cat, extras, tooltips = merge_nearby_tics(gaia, tics)
    src = np.asarray(cat["source_id"])
    tic = np.asarray(cat["tic"])
    # existing Gaia entries annotated with tic data
    assert ((src > 0) & (tic != "")).sum() > 0
    # new TIC-only entries appended with no Gaia id
    assert ((src == 0) & (tic != "")).sum() > 0
    assert "tic" in extras and ("TIC", "@tic") in tooltips
    # position of the appended row carried through
    i = int(np.nonzero(src == 0)[0][0])
    assert cat["ra"][i] == 10.003


def test_interact_sky_functions_add_nearby_tics_weird_dtype():
    """Mirrors reference ..._weird_dtype: id columns arriving as
    strings/objects/None (the pd.Int64Dtype regression) merge without
    error."""
    import numpy as np
    from lightkurve_tpu.interact import merge_nearby_tics
    gaia = {"source_id": np.array(["111", "", None], dtype=object),
            "ra": [1.0, 2.0, 3.0], "dec": [0.0, 0.0, 0.0]}
    tics = [{"tic": "7", "gaia_id": "111"},
            {"tic": "8", "gaia_id": None, "ra": 4.0, "dec": 0.0}]
    cat, _, _ = merge_nearby_tics(gaia, tics)
    tic = np.asarray(cat["tic"])
    assert (tic != "").sum() == 2
    assert cat["tic"][0] == "7"          # matched despite string ids


def test_interact_sky_functions_case_nearby_tics_failed(tmp_path):
    """Mirrors reference ..._case_nearby_tics_failed: when the nearby-TIC
    report is unusable, interact_sky still renders (Gaia-only) with a
    warning instead of raising."""
    import warnings

    import pytest
    from tests.synthetic import make_synthetic_tpf
    from lightkurve_tpu.interact_html import export_interact_sky_html
    from lightkurve_tpu.utils import LightkurveWarning

    class Broken:
        def __iter__(self):
            raise IOError("simulated service unavailable")

        def __bool__(self):
            return True

    tpf = make_synthetic_tpf(n_cadences=5)
    ra0, dec0 = tpf.wcs.pixel_to_world(2.0, 2.0)
    catalog = {"ra": [float(ra0)], "dec": [float(dec0)], "gmag": [12.0],
               "source_id": [77]}
    path = str(tmp_path / "sky_failed_tics.html")
    with pytest.warns(LightkurveWarning, match="nearby-TIC"):
        out = export_interact_sky_html(tpf, path, catalog=catalog,
                                       tic_catalog=Broken())
    assert out == path
    assert "77" in open(path).read()


def test_interact_functions(tmp_path):
    """Mirrors reference test_interact_functions: the interact helpers
    run across mission flavors and aperture masks without error (the
    reference exercises its bokeh datasource/figure builders; here the
    static-panel and HTML exporters are the equivalents)."""
    import matplotlib
    from tests.synthetic import make_synthetic_tpf
    from lightkurve_tpu.interact import show_interact_widget
    from lightkurve_tpu.interact_html import export_interact_sky_html

    for mission in ("Kepler", "TESS"):
        tpf = make_synthetic_tpf(n_cadences=8, mission=mission)
        for mask in ("default", "threshold", "all"):
            fig = show_interact_widget(tpf, aperture_mask=mask)
            assert fig is not None
        # the Gaia-overlay equivalent with and without a magnitude limit
        ra0, dec0 = tpf.wcs.pixel_to_world(2.0, 2.0)
        cat = {"ra": [float(ra0)], "dec": [float(dec0)], "gmag": [21.0],
               "source_id": [5]}
        p1 = export_interact_sky_html(
            tpf, str(tmp_path / f"{mission}_sky.html"), catalog=cat)
        p2 = export_interact_sky_html(
            tpf, str(tmp_path / f"{mission}_sky22.html"), catalog=cat,
            magnitude_limit=22)
        assert p1 != p2
    matplotlib.pyplot.close("all")


def _bls_demo_lc(mission):
    import numpy as np
    from lightkurve_tpu import KeplerLightCurve, TessLightCurve
    rng = np.random.default_rng(11)
    t = np.arange(0, 18, 0.02)
    f = 1.0 + 3e-4 * rng.standard_normal(t.size)
    ph = np.mod(t - 0.7 + 2.2 / 2, 2.2) - 2.2 / 2
    f[np.abs(ph) < 0.06] -= 6e-3
    cls = KeplerLightCurve if mission == "Kepler" else TessLightCurve
    lc = cls(time=t, flux=f, flux_err=np.full(t.size, 3e-4))
    lc.meta["MISSION"] = mission
    return lc.normalize().remove_nans().flatten()


def test_full_widget():
    """Mirrors reference test_interact_bls.py::test_full_widget: the
    interact_bls entry point runs with every keyword form."""
    import matplotlib
    lc = _bls_demo_lc("Kepler")
    assert lc.interact_bls(resolution=400) is not None
    assert lc.interact_bls(minimum_period=1.5, resolution=400) is not None
    assert lc.interact_bls(maximum_period=5, resolution=400) is not None
    matplotlib.pyplot.close("all")


def test_tess_widget(tmp_path):
    """Mirrors reference test_interact_bls.py::test_tess_widget on a
    TESS-flavored curve, including the standalone HTML form."""
    import matplotlib
    lc = _bls_demo_lc("TESS")
    assert lc.interact_bls(resolution=400) is not None
    out = lc.interact_bls(resolution=400,
                          html=str(tmp_path / "bls.html"))
    assert str(out).endswith("bls.html")
    matplotlib.pyplot.close("all")


def test_interact_sky_functions_case_no_target_coordinate():
    """Mirrors reference
    test_interact_sky_functions_case_no_target_coordinate: a TPF without
    a valid coordinate system must raise rather than render a sky
    overlay against an identity WCS."""
    import numpy as np
    import pytest
    from lightkurve_tpu.targetpixelfile import TargetPixelFileFactory
    from lightkurve_tpu.interact_html import export_interact_sky_html
    from lightkurve_tpu.utils import LightkurveError
    fac = TargetPixelFileFactory(n_cadences=4, n_rows=5, n_cols=5)
    for i in range(4):
        fac.add_cadence(frameno=i, flux=np.ones((5, 5), np.float32),
                        header={"TIME": float(i)})
    tpf = fac.get_tpf()
    assert not tpf.has_wcs
    with pytest.raises(LightkurveError, match="coordinate"):
        export_interact_sky_html(tpf, "/tmp/never.html",
                                 catalog={"ra": [1.0], "dec": [1.0]})
