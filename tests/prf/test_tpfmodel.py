"""Mirrors of reference tests/prf/test_tpfmodel.py.

The reference gates these on oktopus + remote calibration files; here the
scene model runs on the analytic PRFs and the jitted LM fitter, so every
behavioral assertion runs offline.
"""
import numpy as np
import pytest
from numpy.testing import assert_allclose

from lightkurve_tpu.prf import (BackgroundPrior, FixedValuePrior,
                                FocusPrior, GaussianPRF, GaussianPrior,
                                MotionPrior, PRFPhotometry, SimpleKeplerPRF,
                                StarPrior, TPFModel, UniformPrior)


def test_fixedvalueprior():
    fvp = FixedValuePrior(1.5)
    assert fvp.mean == 1.5
    assert fvp(1.5) == 0


def test_starprior():
    """Tests the StarPrior class."""
    col, row, flux = 1, 2, 3
    sp = StarPrior(col=GaussianPrior(mean=col, var=0.1),
                   row=GaussianPrior(mean=row, var=0.1),
                   flux=GaussianPrior(mean=flux, var=0.1))
    assert sp.col.mean == col
    assert sp.row.mean == row
    assert sp.flux.mean == flux
    assert sp.evaluate(col, row, flux) == 0
    # the object is callable
    assert sp(col, row, flux + 0.1) == sp.evaluate(col, row, flux + 0.1)
    # points away from the mean have a larger penalty
    assert sp.evaluate(col, row, flux) < sp.evaluate(col, row, flux + 0.1)
    assert "StarPrior" in str(sp)


def test_backgroundprior():
    """Tests the BackgroundPrior class."""
    flux = 2.0
    bp = BackgroundPrior(flux=flux)
    assert bp.flux.mean == flux
    assert bp(flux) == 0.0
    assert not np.isfinite(float(bp(flux + 0.1)))


def test_tpf_model_simple():
    prf = SimpleKeplerPRF(channel=16, shape=[10, 10], column=15, row=15)
    model = TPFModel(prfmodel=prf)
    assert model.prfmodel.channel == 16


def test_tpf_model():
    col, row, flux, bgflux = 1, 2, 3, 4
    shape = (7, 8)
    model = TPFModel(
        star_priors=[StarPrior(
            col=GaussianPrior(mean=col, var=2 ** 2),
            row=GaussianPrior(mean=row, var=2 ** 2),
            flux=UniformPrior(lb=flux - 0.5, ub=flux + 0.5),
            targetid="TESTSTAR")],
        background_prior=BackgroundPrior(
            flux=GaussianPrior(mean=bgflux, var=bgflux)),
        focus_prior=FocusPrior(
            scale_col=GaussianPrior(mean=1, var=0.0001),
            scale_row=GaussianPrior(mean=1, var=0.0001),
            rotation_angle=UniformPrior(lb=-3.1415, ub=3.1415)),
        motion_prior=MotionPrior(
            shift_col=GaussianPrior(mean=0.0, var=0.01),
            shift_row=GaussianPrior(mean=0.0, var=0.01)),
        prfmodel=GaussianPRF(shape=shape, column=30, row=20),
        fit_background=True, fit_focus=False, fit_motion=False)
    # sanity checks
    assert model.star_priors[0].col.mean == col
    assert model.star_priors[0].targetid == "TESTSTAR"
    # initial guesses
    params = model.get_initial_guesses()
    assert params.stars[0].col == col
    assert params.stars[0].row == row
    assert params.stars[0].flux == flux
    assert params.background.flux == bgflux
    assert len(params.to_array()) == 4  # 4 free parameters
    assert_allclose([col, row, flux, bgflux], params.to_array(), rtol=1e-5)
    # predict returns an image
    assert model.predict().shape == shape
    assert "TESTSTAR" in str(model)


def test_tpf_model_fitting():
    """Is PRF photometry consistent with simple aperture photometry?"""
    shape = (9, 9)
    col, row = 10, 20
    prfmodel = GaussianPRF(shape=shape, column=col, row=row, sigma=1.2)
    true_flux, true_bg = 5000.0, 10.0
    img = np.asarray(prfmodel(col + 4.5, row + 4.5, true_flux)) + true_bg
    fluxsum = float(np.sum(img))

    star_priors = [StarPrior(
        col=UniformPrior(lb=prfmodel.col_coord[0],
                         ub=prfmodel.col_coord[-1]),
        row=UniformPrior(lb=prfmodel.row_coord[0],
                         ub=prfmodel.row_coord[-1]),
        flux=UniformPrior(lb=0.5 * fluxsum, ub=1.5 * fluxsum))]
    background_prior = BackgroundPrior(
        flux=UniformPrior(lb=0.0, ub=3 * true_bg))
    model = TPFModel(star_priors=star_priors,
                     background_prior=background_prior, prfmodel=prfmodel)
    result = model.fit(img)
    assert result.motion.fitted is False
    assert np.isclose(result.stars[0].flux, true_flux, rtol=0.05)
    # can we enable motion fitting?
    model.fit_motion = True
    result = model.fit(img)
    assert result.motion.fitted is True
    # PRFPhotometry class runs without errors
    phot = PRFPhotometry(model)
    phot.run(np.asarray([img]))
    assert len(phot.results) == 1


def test_empty_model():
    """Can we fit the background flux in a model without stars?"""
    shape = (4, 3)
    bgflux = 1.23
    model = TPFModel(
        background_prior=BackgroundPrior(flux=UniformPrior(lb=0, ub=10)),
        prfmodel=GaussianPRF(shape=shape, column=0, row=0),
        fit_background=True)
    background = bgflux * np.ones(shape)
    results = model.fit(background)
    assert np.isclose(results.background.flux, bgflux, rtol=1e-2)


def test_model_with_one_star():
    """Can we recover star + background + focus parameters?"""
    shape = (10, 12)
    starflux, col, row = 1000.0, 60.0, 70.0
    bgflux = 10.0
    scale_col, scale_row, rotation_angle = 1.2, 1.3, 0.2
    prf = GaussianPRF(shape=shape, column=col, row=row, sigma=1.1)
    star_prior = StarPrior(col=GaussianPrior(col + 6, 0.01),
                           row=GaussianPrior(row + 6, 0.01),
                           flux=UniformPrior(lb=0.5 * starflux,
                                             ub=1.5 * starflux))
    model = TPFModel(
        star_priors=[star_prior],
        background_prior=BackgroundPrior(flux=UniformPrior(lb=0, ub=100)),
        focus_prior=FocusPrior(
            scale_col=UniformPrior(lb=0.5, ub=1.5),
            scale_row=UniformPrior(lb=0.5, ub=1.5),
            rotation_angle=UniformPrior(lb=0.0, ub=0.5)),
        prfmodel=prf, fit_background=True, fit_focus=True)
    fake_data = bgflux + np.asarray(prf(
        col + 6, row + 6, starflux, scale_col=scale_col,
        scale_row=scale_row, rotation_angle=rotation_angle))
    results = model.fit(fake_data, tol=1e-12, options={"maxiter": 100},
                        n_iter=200)
    assert np.isclose(results.stars[0].col, col + 6, atol=0.1)
    assert np.isclose(results.stars[0].row, row + 6, atol=0.1)
    assert np.isclose(results.stars[0].flux, starflux, rtol=0.05)
    assert np.isclose(results.background.flux, bgflux, rtol=0.1)
    assert np.isclose(results.focus.scale_col, scale_col, atol=0.05)
    assert np.isclose(results.focus.scale_row, scale_row, atol=0.05)
    assert np.isclose(results.focus.rotation_angle, rotation_angle,
                      atol=0.05)


def test_fixed_background_prior_pins_parameter():
    """A default FixedValuePrior background must stay pinned during the
    fit and leave finite losses (review finding: the exact inf-valued
    prior had zero gradient, letting the background drift and making
    every loss inf)."""
    shape = (7, 7)
    prf = GaussianPRF(shape=shape, column=0, row=0, sigma=1.2)
    img = np.asarray(prf(3.5, 3.5, 1000.0)) + 5.0  # true bkg 5, prior 0
    model = TPFModel(
        star_priors=[StarPrior(col=GaussianPrior(3.5, 0.25),
                               row=GaussianPrior(3.5, 0.25),
                               flux=UniformPrior(100.0, 1e5))],
        background_prior=BackgroundPrior(flux=FixedValuePrior(0.0)),
        prfmodel=prf, fit_background=True)
    phot = PRFPhotometry(model)
    phot.run(np.asarray([img]), n_iter=40)
    # background pinned at the fixed value, not drifting to ~5
    assert abs(phot.results[0].background.flux) < 1e-3
    # losses are finite (the inf prior would poison them)
    assert np.isfinite(phot.losses).all()
    # the user-facing prior probability keeps the reference's inf form
    bp = BackgroundPrior(flux=FixedValuePrior(0.0))
    assert not np.isfinite(float(bp(0.1)))


def test_two_star_scene_recovery():
    """Batched MAP fit separates and recovers a two-star scene (VERDICT
    r2 'Next round' #6 recovery assertion; mirrors the bench companion)."""
    import numpy as np
    from lightkurve_tpu.prf import PRFPhotometry, TPFModel
    from lightkurve_tpu.prf.prfmodel import GaussianPRF
    from lightkurve_tpu.prf.tpfmodel import (BackgroundPrior, StarPrior,
                                             GaussianPrior, UniformPrior)
    prf = GaussianPRF(shape=(9, 9), column=0, row=0)
    stars = [StarPrior(col=GaussianPrior(2.8, 0.5),
                       row=GaussianPrior(3.1, 0.5),
                       flux=UniformPrior(0.0, 2e4)),
             StarPrior(col=GaussianPrior(6.2, 0.5),
                       row=GaussianPrior(5.9, 0.5),
                       flux=UniformPrior(0.0, 2e4))]
    model = TPFModel(star_priors=stars, prfmodel=prf,
                     background_prior=BackgroundPrior(
                         flux=UniformPrior(0.0, 100.0)))
    truth = np.array([2.83, 3.12, 5000.0, 6.17, 5.88, 3000.0, 40.0])
    img = model.predict(truth)
    rng = np.random.default_rng(3)
    cubes = img[None] + 2.0 * rng.standard_normal((16,) + img.shape)
    phot = PRFPhotometry(model)
    fitted = phot.run(cubes, n_iter=25)
    med = np.median(fitted, axis=0)
    # fluxes within 5%, positions within 0.05 px, background within 20%
    assert abs(med[2] - truth[2]) / truth[2] < 0.05
    assert abs(med[5] - truth[5]) / truth[5] < 0.05
    assert abs(med[0] - truth[0]) < 0.05 and abs(med[1] - truth[1]) < 0.05
    assert abs(med[3] - truth[3]) < 0.05 and abs(med[4] - truth[4]) < 0.05
    assert abs(med[6] - truth[6]) / truth[6] < 0.2
