"""Oracle parity for ops.peaks against scipy (test-only oracle).

``find_peaks_mask`` must reproduce ``scipy.signal.find_peaks(x, distance)``
exactly (index sets), including plateau-midpoint and distance-pruning
rules; ``fit_gaussian_lm`` must land on the same weighted-least-squares
optimum as ``scipy.optimize.curve_fit`` on the SFF thruster histograms.
"""
import numpy as np
import pytest

from lightkurve_tpu.ops.peaks import find_peaks_mask, fit_gaussian_lm

scipy_signal = pytest.importorskip("scipy.signal")
scipy_optimize = pytest.importorskip("scipy.optimize")


def _ours(x, distance):
    return np.flatnonzero(np.asarray(find_peaks_mask(x, distance)))


@pytest.mark.parametrize("seed", range(8))
@pytest.mark.parametrize("distance", [1, 2, 5, 17.3])
def test_find_peaks_random_parity(seed, distance):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal(257)
    ref, _ = scipy_signal.find_peaks(x, distance=distance)
    np.testing.assert_array_equal(_ours(x, distance), ref)


def test_find_peaks_plateaus():
    """Runs of equal samples → one peak at the run midpoint."""
    x = np.array([0., 1., 1., 1., 0., 2., 2., 0., 3., 0., 1., 1., 0.5])
    ref, _ = scipy_signal.find_peaks(x)
    np.testing.assert_array_equal(_ours(x, 1), ref)


def test_find_peaks_edges_and_monotone():
    for x in (np.arange(10.0), np.arange(10.0)[::-1], np.zeros(10),
              np.array([1.0, 0.0, 1.0])):
        ref, _ = scipy_signal.find_peaks(x)
        np.testing.assert_array_equal(_ours(x, 1), ref)


def test_find_peaks_acf_like_distance_pruning():
    """A Δν-style ACF with peaks closer than `distance`: the pruning must
    keep the same (highest-first) survivors scipy keeps."""
    lags = np.arange(500) * 0.01
    acf = (np.cos(2 * np.pi * lags / 1.1) ** 2
           + 0.4 * np.cos(2 * np.pi * lags / 0.37)
           + 0.05 * np.sin(lags * 13.7))
    for distance in (3, 25, 60):
        ref, _ = scipy_signal.find_peaks(acf, distance=distance)
        np.testing.assert_array_equal(_ours(acf, distance), ref)


def _gauss(x, amp, mu, sig):
    return amp * np.exp(-0.5 * ((x - mu) / sig) ** 2)


@pytest.mark.parametrize("seed", range(4))
def test_gaussian_lm_matches_curve_fit(seed):
    """The SFF thruster-histogram regime: histogram of near-Gaussian
    accelerations, curve_fit-style sigma weighting."""
    rng = np.random.default_rng(seed)
    accel = 0.008 * rng.standard_normal(4000)
    edges = np.arange(-0.5, 0.5, 0.0001)
    hist, bin_edges = np.histogram(accel, edges, density=True)
    xbins = bin_edges[1:] - np.median(np.diff(bin_edges))
    sigma = 1.0 / np.sqrt(np.maximum(hist, 1e-12))
    ref, _ = scipy_optimize.curve_fit(_gauss, xbins, hist,
                                      p0=[100.0, 0.0, 0.01], sigma=sigma,
                                      maxfev=10000)
    ours = np.asarray(fit_gaussian_lm(xbins, hist, 1.0 / sigma,
                                      np.array([100.0, 0.0, 0.01])))
    # both solve the same weighted LSQ; compare the fitted width (the
    # only parameter SFF consumes).  curve_fit stops a little earlier,
    # so also assert OUR optimum is at least as good in chi².
    assert abs(abs(ours[2]) - abs(ref[2])) / abs(ref[2]) < 1e-5
    # mu's true value is 0; both fits land within ~1e-8 of it, so the
    # comparison needs an absolute floor there
    np.testing.assert_allclose(ours[:2], ref[:2], rtol=1e-4, atol=1e-7)

    def chi2(p):
        return np.sum(((hist - _gauss(xbins, *p)) / sigma) ** 2)

    assert chi2(ours) <= chi2(ref) * (1 + 1e-9)


def test_gaussian_lm_clean_signal_exact():
    x = np.linspace(-3, 3, 301)
    y = _gauss(x, 2.5, 0.3, 0.7)
    ours = np.asarray(fit_gaussian_lm(x, y, np.ones_like(x),
                                      np.array([1.0, 0.0, 1.0])))
    np.testing.assert_allclose(ours, [2.5, 0.3, 0.7], rtol=1e-8)


def test_package_has_no_scipy_estimator_imports():
    """find_peaks/curve_fit must be gone from the estimator pipelines
    (VERDICT r4 item 7)."""
    import pathlib

    import lightkurve_tpu
    pkg = pathlib.Path(lightkurve_tpu.__file__).parent
    offenders = []
    for path in pkg.rglob("*.py"):
        src = path.read_text()
        if "find_peaks" in src and path.name != "peaks.py":
            if "from scipy.signal import find_peaks" in src:
                offenders.append(f"{path}: find_peaks")
        if "curve_fit" in src and "scipy" in src:
            for line in src.splitlines():
                if "import" in line and "curve_fit" in line:
                    offenders.append(f"{path}: curve_fit")
    assert not offenders, offenders
