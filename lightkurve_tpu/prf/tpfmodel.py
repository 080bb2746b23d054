"""Scene models and PRF photometry.

Re-implements the reference's ``prf/tpfmodel.py`` (851 LoC) TPU-first:
the scene model (Σ stars × PRF + background, reference ``:529-568``) is a
pure JAX function of a free-parameter vector, and ``PRFPhotometry.run``
fits ALL cadences simultaneously with a vmapped fixed-iteration
Levenberg-Marquardt loop on device — replacing the reference's per-cadence
``scipy``/oktopus fits distributed over a ``multiprocessing`` pool
(``tpfmodel.py:738-795``), the only multi-core code path in the reference.

Priors mirror the reference's vocabulary and calling convention
(``tpfmodel.py:75-244``): priors are callable, returning a negative
log-probability penalty that is 0 at a Gaussian prior's mean; parameter
results come back in the reference's container classes
(``StarParameters``/``BackgroundParameters``/``FocusParameters``/
``MotionParameters``/``TPFModelParameters``, reference ``:246-430``)
with ``to_array``/``from_array`` using the reference's free-parameter
ordering: [col, row, flux] per star, then background, focus, motion.
"""
from __future__ import annotations

import logging
from dataclasses import dataclass, field
from typing import Optional

import numpy as np

from ..lightcurve import LightCurve
from ..units import Quantity, electron_per_second

log = logging.getLogger(__name__)

__all__ = ["UniformPrior", "GaussianPrior", "FixedValuePrior", "StarPrior",
           "BackgroundPrior", "FocusPrior", "MotionPrior",
           "StarParameters", "BackgroundParameters", "FocusParameters",
           "MotionParameters", "TPFModelParameters", "TPFModel",
           "PRFPhotometry"]


# ---------------------------------------------------------------------------
# Priors (reference tpfmodel.py:75-244)
# ---------------------------------------------------------------------------
@dataclass
class UniformPrior:
    lb: float
    ub: float

    @property
    def mean(self):
        return 0.5 * (self.lb + self.ub)

    def penalty(self, x):
        import jax.numpy as jnp
        # smooth barrier: large quadratic outside the box (differentiable,
        # unlike the reference's hard -inf logpdf, so LM steps stay finite)
        below = jnp.maximum(self.lb - x, 0.0)
        above = jnp.maximum(x - self.ub, 0.0)
        return 1e6 * (below ** 2 + above ** 2)

    evaluate = penalty
    __call__ = penalty


@dataclass
class GaussianPrior:
    mean: float
    var: float

    def penalty(self, x):
        return (x - self.mean) ** 2 / (2 * self.var)

    evaluate = penalty
    __call__ = penalty


@dataclass
class FixedValuePrior:
    value: float

    @property
    def mean(self):
        return self.value

    def evaluate(self, x):
        """0 at the fixed value, +inf elsewhere (reference ``:113-121``,
        the user-facing prior probability)."""
        import jax.numpy as jnp
        return jnp.where(jnp.asarray(x) == self.value, 0.0, jnp.inf)

    def penalty(self, x):
        """Optimization-time surrogate: a very steep quadratic that PINS
        the parameter at ``value``.  The exact ±inf form of ``evaluate``
        has zero gradient everywhere, so it could not constrain a fitted
        parameter (and would turn every fit loss into inf)."""
        return 1e12 * (x - self.value) ** 2

    __call__ = evaluate


def _parse_prior(prior):
    """Scalars become FixedValuePrior (reference ``PriorContainer``)."""
    if isinstance(prior, (int, float, np.integer, np.floating)):
        return FixedValuePrior(float(prior))
    return prior


class _PriorContainer:
    def __call__(self, *params):
        return self.evaluate(*params)


@dataclass
class StarPrior(_PriorContainer):
    """Priors on one star's (col, row, flux) (reference ``:136-165``)."""
    col: object
    row: object
    flux: object = field(default_factory=lambda: UniformPrior(0.0, 1e10))
    targetid: Optional[str] = None

    def __post_init__(self):
        self.col = _parse_prior(self.col)
        self.row = _parse_prior(self.row)
        self.flux = _parse_prior(self.flux)

    def evaluate(self, col, row, flux):
        return (self.col.evaluate(col) + self.row.evaluate(row)
                + self.flux.evaluate(flux))


@dataclass
class BackgroundPrior(_PriorContainer):
    """Prior on the per-pixel background flux (reference ``:167-185``)."""
    flux: object = field(default_factory=lambda: FixedValuePrior(0.0))

    def __post_init__(self):
        self.flux = _parse_prior(self.flux)

    def evaluate(self, flux):
        return self.flux.evaluate(flux)


@dataclass
class FocusPrior(_PriorContainer):
    """Priors on the focus parameters (reference ``:187-222``)."""
    scale_col: object = field(default_factory=lambda: GaussianPrior(1, 1e-4))
    scale_row: object = field(default_factory=lambda: GaussianPrior(1, 1e-4))
    rotation_angle: object = field(
        default_factory=lambda: UniformPrior(-3.1415, 3.1415))

    def __post_init__(self):
        self.scale_col = _parse_prior(self.scale_col)
        self.scale_row = _parse_prior(self.scale_row)
        self.rotation_angle = _parse_prior(self.rotation_angle)

    def evaluate(self, scale_col, scale_row, rotation_angle):
        return (self.scale_col.evaluate(scale_col)
                + self.scale_row.evaluate(scale_row)
                + self.rotation_angle.evaluate(rotation_angle))


@dataclass
class MotionPrior(_PriorContainer):
    """Priors on pointing shifts (reference ``:224-244``)."""
    shift_col: object = field(default_factory=lambda: GaussianPrior(0.0, 1.0))
    shift_row: object = field(default_factory=lambda: GaussianPrior(0.0, 1.0))

    def __post_init__(self):
        self.shift_col = _parse_prior(self.shift_col)
        self.shift_row = _parse_prior(self.shift_row)

    def evaluate(self, shift_col, shift_row):
        return (self.shift_col.evaluate(shift_col)
                + self.shift_row.evaluate(shift_row))


# ---------------------------------------------------------------------------
# Parameter containers (reference tpfmodel.py:246-430)
# ---------------------------------------------------------------------------
@dataclass
class StarParameters:
    col: float
    row: float
    flux: float
    err_col: Optional[float] = None
    err_row: Optional[float] = None
    err_flux: Optional[float] = None
    fitted: bool = True


@dataclass
class BackgroundParameters:
    flux: float = 0.0
    err_flux: Optional[float] = None
    fitted: bool = True


@dataclass
class FocusParameters:
    scale_col: float = 1.0
    scale_row: float = 1.0
    rotation_angle: float = 0.0
    fitted: bool = False


@dataclass
class MotionParameters:
    shift_col: float = 0.0
    shift_row: float = 0.0
    fitted: bool = False


class TPFModelParameters:
    """All parameters of a TPFModel (reference ``:312-430``)."""

    def __init__(self, stars=None, background=None, focus=None, motion=None):
        self.stars = list(stars or [])
        self.background = background or BackgroundParameters()
        self.focus = focus or FocusParameters()
        self.motion = motion or MotionParameters()

    def __repr__(self):
        out = [f"<TPFModelParameters: {len(self.stars)} star(s)>"]
        out += [f"  {s}" for s in self.stars]
        out += [f"  {self.background}", f"  {self.focus}", f"  {self.motion}"]
        return "\n".join(out)

    def to_array(self):
        """Free parameters as a flat array in the reference's ordering:
        [col, row, flux] per star, background, focus, motion
        (reference ``:360-388``)."""
        arr = []
        for star in self.stars:
            arr.extend([star.col, star.row, star.flux])
        if self.background.fitted:
            arr.append(self.background.flux)
        if self.focus.fitted:
            arr.extend([self.focus.scale_col, self.focus.scale_row,
                        self.focus.rotation_angle])
        if self.motion.fitted:
            arr.extend([self.motion.shift_col, self.motion.shift_row])
        return np.array(arr, dtype=float).ravel()

    def from_array(self, array):
        """Inverse of ``to_array()`` (reference ``:390-430``)."""
        array = np.asarray(array, dtype=float).ravel()
        idx = 0
        stars = []
        for _ in range(len(self.stars)):
            stars.append(StarParameters(col=array[idx], row=array[idx + 1],
                                        flux=array[idx + 2]))
            idx += 3
        if self.background.fitted:
            background = BackgroundParameters(flux=array[idx], fitted=True)
            idx += 1
        else:
            background = self.background
        if self.focus.fitted:
            focus = FocusParameters(scale_col=array[idx],
                                    scale_row=array[idx + 1],
                                    rotation_angle=array[idx + 2],
                                    fitted=True)
            idx += 3
        else:
            focus = self.focus
        if self.motion.fitted:
            motion = MotionParameters(shift_col=array[idx],
                                      shift_row=array[idx + 1], fitted=True)
        else:
            motion = self.motion
        return TPFModelParameters(stars=stars, background=background,
                                  focus=focus, motion=motion)


class TPFModel:
    """Scene model: Σ stars × PRF(focus, motion) + constant background
    (reference ``tpfmodel.py:446-620``).

    The free-parameter vector follows the reference's ordering
    ([col, row, flux] per star, then background/focus/motion as enabled
    by ``fit_background``/``fit_focus``/``fit_motion``).
    """

    def __init__(self, star_priors=None, background_prior=None, prf=None,
                 focus_prior=None, motion_prior=None, prfmodel=None,
                 fit_background=True, fit_focus=False, fit_motion=False):
        self.star_priors = list(star_priors or [])
        self.background_prior = background_prior or BackgroundPrior()
        self.focus_prior = focus_prior or FocusPrior()
        self.motion_prior = motion_prior or MotionPrior()
        self.prfmodel = prfmodel if prfmodel is not None else prf
        self.fit_background = fit_background
        self.fit_focus = fit_focus
        self.fit_motion = fit_motion

    # ``prf=`` and ``.prf`` are accepted aliases of the reference's
    # ``prfmodel`` vocabulary
    @property
    def prf(self):
        return self.prfmodel

    @prf.setter
    def prf(self, value):
        self.prfmodel = value

    @classmethod
    def from_tpf(cls, tpf, star_priors=None, prf=None, **kwargs):
        """Build a model from a TPF: one star at the brightest pixel with
        flux prior from the median image (reference ``:620-660``)."""
        from .prfmodel import SimpleKeplerPRF, GaussianPRF
        med = np.nanmedian(tpf.flux.value, axis=0)
        if prf is None:
            if tpf.mission in ("Kepler", "K2") and tpf.meta.get("CHANNEL"):
                prf = SimpleKeplerPRF(channel=tpf.meta["CHANNEL"],
                                      shape=tpf.shape[1:],
                                      column=tpf.column, row=tpf.row)
            else:
                prf = GaussianPRF(shape=tpf.shape[1:], column=tpf.column,
                                  row=tpf.row)
        if star_priors is None:
            r, c = np.unravel_index(np.nanargmax(med), med.shape)
            total = float(np.nansum(med))
            star_priors = [StarPrior(
                col=GaussianPrior(tpf.column + c + 0.5, 1.0),
                row=GaussianPrior(tpf.row + r + 0.5, 1.0),
                flux=UniformPrior(0.0, max(10 * total, 1.0)),
                targetid=tpf.targetid)]
        return cls(star_priors=star_priors, prfmodel=prf, **kwargs)

    @property
    def n_stars(self):
        return len(self.star_priors)

    def get_initial_guesses(self):
        """Prior means as a TPFModelParameters (reference ``:496-527``)."""
        stars = [StarParameters(col=sp.col.mean, row=sp.row.mean,
                                flux=sp.flux.mean)
                 for sp in self.star_priors]
        background = BackgroundParameters(
            flux=self.background_prior.flux.mean, fitted=self.fit_background)
        focus = FocusParameters(
            scale_col=self.focus_prior.scale_col.mean,
            scale_row=self.focus_prior.scale_row.mean,
            rotation_angle=self.focus_prior.rotation_angle.mean,
            fitted=self.fit_focus)
        motion = MotionParameters(
            shift_col=self.motion_prior.shift_col.mean,
            shift_row=self.motion_prior.shift_row.mean,
            fitted=self.fit_motion)
        return TPFModelParameters(stars=stars, background=background,
                                  focus=focus, motion=motion)

    def initial_guess(self):
        """Flat free-parameter vector of the prior means."""
        return self.get_initial_guesses().to_array()

    # -- array-parameterized scene (pure JAX) ------------------------------
    def _unpack(self, params):
        """Split a free vector into (cols, rows, fluxes, bkg, focus3,
        motion2), substituting fixed values where not fitted."""
        import jax.numpy as jnp
        S = self.n_stars
        params = jnp.asarray(params)
        cols = params[0:3 * S:3]
        rows = params[1:3 * S:3]
        fluxes = params[2:3 * S:3]
        idx = 3 * S
        if self.fit_background:
            bkg = params[idx]
            idx += 1
        else:
            bkg = self.background_prior.flux.mean
        if self.fit_focus:
            scale_col, scale_row, rot = (params[idx], params[idx + 1],
                                         params[idx + 2])
            idx += 3
        else:
            scale_col = self.focus_prior.scale_col.mean
            scale_row = self.focus_prior.scale_row.mean
            rot = self.focus_prior.rotation_angle.mean
        if self.fit_motion:
            shift_col, shift_row = params[idx], params[idx + 1]
        else:
            shift_col = self.motion_prior.shift_col.mean
            shift_row = self.motion_prior.shift_row.mean
        return (cols, rows, fluxes, bkg, scale_col, scale_row, rot,
                shift_col, shift_row)

    def predict_from_array(self, params):
        """Scene image for one free-parameter vector (pure JAX)."""
        import jax.numpy as jnp
        (cols, rows, fluxes, bkg, scale_col, scale_row, rot,
         shift_col, shift_row) = self._unpack(params)
        img = jnp.zeros(self.prfmodel.shape)
        for s in range(self.n_stars):
            img = img + self.prfmodel.evaluate(
                cols[s] + shift_col, rows[s] + shift_row, fluxes[s],
                scale_col=scale_col, scale_row=scale_row,
                rotation_angle=rot)
        return img + bkg

    def predict(self, params=None):
        """Synthetic image for a TPFModelParameters (or array, or the
        prior means when omitted) — reference ``:529-568``."""
        if params is None:
            params = self.get_initial_guesses()
        if isinstance(params, TPFModelParameters):
            params = params.to_array()
        return np.asarray(self.predict_from_array(np.asarray(params)))

    def logp_prior(self, params):
        """Prior evaluated at a point in parameter space (reference
        ``tpfmodel.py:589-611``; like the reference's oktopus priors,
        ``evaluate`` returns the NEGATIVE log density, so this equals
        :meth:`prior_penalty`)."""
        if isinstance(params, TPFModelParameters):
            params = params.to_array()
        return float(self.prior_penalty(np.asarray(params, dtype=float)))

    def prior_penalty(self, params):
        """Total negative-log-prior of a free vector (pure JAX)."""
        (cols, rows, fluxes, bkg, scale_col, scale_row, rot,
         shift_col, shift_row) = self._unpack(params)
        pen = 0.0
        for s, sp in enumerate(self.star_priors):
            pen = pen + sp.flux.penalty(fluxes[s])
            pen = pen + sp.col.penalty(cols[s])
            pen = pen + sp.row.penalty(rows[s])
        if self.fit_background:
            pen = pen + self.background_prior.flux.penalty(bkg)
        if self.fit_focus:
            pen = (pen + self.focus_prior.scale_col.penalty(scale_col)
                   + self.focus_prior.scale_row.penalty(scale_row)
                   + self.focus_prior.rotation_angle.penalty(rot))
        if self.fit_motion:
            pen = (pen + self.motion_prior.shift_col.penalty(shift_col)
                   + self.motion_prior.shift_row.penalty(shift_row))
        return pen

    def fit(self, data, n_iter=50, damping=1e-3, **kwargs):
        """Fit one image; returns a TPFModelParameters with the fitted
        values (reference ``:570-618``; our engine is the same jitted LM
        used by PRFPhotometry rather than scipy.minimize, so scipy-style
        kwargs like ``tol``/``options`` are accepted and ignored)."""
        phot = PRFPhotometry(self)
        fitted = phot.run(np.asarray(data, dtype=float)[None, ...],
                          n_iter=n_iter, damping=damping)
        return self.get_initial_guesses().from_array(fitted[0])

    def gradient(self, params=None):
        """Gradient images of the scene w.r.t. every free parameter.

        Returns a list of ``(h, w)`` arrays — ∂model/∂θ for each entry of
        the free-parameter vector.  The reference's version
        (``tpfmodel.py:571-587``, marked "UNFINISHED WORK!") approximates
        most entries with ones; ours is the exact jacobian via JAX
        autodiff of :meth:`predict_from_array`.
        """
        import jax
        if params is None:
            params = self.initial_guess()
        if isinstance(params, TPFModelParameters):
            params = params.to_array()
        jac = jax.jacfwd(self.predict_from_array)(
            np.asarray(params, dtype=float))             # (h, w, k)
        jac = np.asarray(jac)
        return [jac[..., i] for i in range(jac.shape[-1])]

    def _extent(self):
        return (self.prfmodel.column,
                self.prfmodel.column + self.prfmodel.shape[1],
                self.prfmodel.row,
                self.prfmodel.row + self.prfmodel.shape[0])

    def plot(self, *params, **kwargs):
        """Image of the model at a point in parameter space (reference
        ``tpfmodel.py:672-686``)."""
        from ..utils import plot_image
        img = self.predict(*params) if params else self.predict()
        return plot_image(img, title="TPF Model", extent=self._extent(),
                          **kwargs)

    def plot_diagnostics(self, data, figsize=(12, 4), *params, **kwargs):
        """Observed / fitted / residual image triptych (reference
        ``tpfmodel.py:687-718``).  Returns the fitted parameters."""
        import matplotlib.pyplot as plt
        from ..utils import plot_image
        fig, ax = plt.subplots(nrows=1, ncols=3, figsize=figsize)
        fit = self.fit(data)
        predicted = self.predict(fit)
        chan = getattr(self.prfmodel, "channel", None)
        extent = self._extent()
        plot_image(np.asarray(data), ax=ax[0],
                   title=f"Observed Data, Channel: {chan}", extent=extent,
                   **kwargs)
        plot_image(predicted, ax=ax[1],
                   title=f"Predicted Image, Channel: {chan}",
                   extent=extent, **kwargs)
        plot_image(np.asarray(data) - predicted, ax=ax[2],
                   title=f"Residual Image, Channel: {chan}", extent=extent,
                   **kwargs)
        return fit

    def __repr__(self):
        out = [f"<TPFModel: {self.n_stars} star(s), "
               f"fit_background={self.fit_background}, "
               f"fit_focus={self.fit_focus}, "
               f"fit_motion={self.fit_motion}>"]
        out += [f"  {sp}" for sp in self.star_priors]
        out += [f"  {self.background_prior}", f"  {self.focus_prior}",
                f"  {self.motion_prior}", f"  {self.prfmodel}"]
        return "\n".join(out)


class PRFPhotometry:
    """Batched MAP PRF photometry (reference ``tpfmodel.py:700-851``).

    ``run`` fits every cadence at once: a vmapped Levenberg-Marquardt
    loop (fixed iterations, jitted) on device.
    """

    def __init__(self, model: TPFModel):
        self.model = model
        self.results = None
        self.opt_params = None
        # jitted (fit, loss) callables keyed on (n_iter, damping): a
        # fresh jax.jit per run() would re-trace AND recompile the whole
        # LM loop every call (measured: compile dominated the reported
        # throughput at B=1000 — ~5x the actual fit time)
        self._fit_cache = {}

    def run(self, flux_cube, cadences=None, n_iter=20, damping=1e-3):
        import jax

        # full-f32 matmuls: TPU DEFAULT precision feeds the MXU bf16, which
        # corrupts the JᵀJ normal equations the LM steps solve
        with jax.default_matmul_precision("highest"):
            return self._run(flux_cube, cadences, n_iter, damping)

    def _fit_fns(self, n_iter, damping):
        """Jitted (vmapped fit, vmapped loss) for this model, cached so
        repeated ``run`` calls re-trace nothing (jax's own jit cache then
        handles per-shape compiles)."""
        key = (int(n_iter), float(damping))
        hit = self._fit_cache.get(key)
        if hit is not None:
            return hit
        import jax
        import jax.numpy as jnp

        p0 = jnp.asarray(self.model.initial_guess())
        k = p0.shape[0]

        def residuals(params, img):
            model = self.model.predict_from_array(params)
            return (model - img).ravel()

        def loss(params, img):
            r = residuals(params, img)
            return 0.5 * jnp.sum(r * r) + self.model.prior_penalty(params)

        jac_fn = jax.jacfwd(residuals)
        prior_grad = jax.grad(self.model.prior_penalty)
        prior_hess = jax.hessian(self.model.prior_penalty)

        def fit_one(img):
            def body(_, p):
                r = residuals(p, img)
                J = jac_fn(p, img)                      # (npix, k)
                g = J.T @ r + prior_grad(p)
                H = J.T @ J + prior_hess(p)
                # Levenberg damping relative to the curvature scale
                H = H + (damping * jnp.diag(jnp.diag(H))
                         + 1e-8 * jnp.eye(k, dtype=p.dtype))
                if k <= 16:
                    # unrolled static Cholesky: jnp.linalg.solve lowers
                    # to scalar LU-pivot loops on TPU (H is SPD — JᵀJ
                    # plus damped diagonal)
                    from ..ops.solve import chol_solve_small
                    delta = chol_solve_small(H, g)
                else:
                    delta = jnp.linalg.solve(H, g)
                # trust region: cap each step relative to the parameter
                # magnitude so the fixed-iteration loop cannot run away
                max_step = 0.5 * (jnp.abs(p) + 1.0)
                delta = jnp.clip(delta, -max_step, max_step)
                return p - delta

            return jax.lax.fori_loop(0, n_iter, body, p0)

        hit = (jax.jit(jax.vmap(fit_one)), jax.jit(jax.vmap(loss)))
        self._fit_cache[key] = hit
        return hit

    def _run(self, flux_cube, cadences, n_iter, damping):
        import jax.numpy as jnp

        cube = np.asarray(flux_cube, dtype=float)
        if cube.ndim == 2:
            cube = cube[None, ...]
        if cadences is not None:
            cube = cube[np.asarray(cadences)]
        data = jnp.asarray(np.nan_to_num(cube))
        fit_fn, loss_fn = self._fit_fns(n_iter, damping)
        fitted = fit_fn(data)
        self.opt_params = np.asarray(fitted)
        # final loss per cadence (diagnostic)
        self.losses = np.asarray(loss_fn(fitted, data))
        # per-cadence structured results, as in the reference's
        # ``PRFPhotometry.results`` list (reference :766-780)
        guesses = self.model.get_initial_guesses()
        self.results = [guesses.from_array(row) for row in self.opt_params]
        return self.opt_params

    def to_lightcurve(self, time=None, star=0):
        """Fitted flux time series of one star."""
        if self.opt_params is None:
            raise ValueError("call run() first")
        flux = self.opt_params[:, 3 * star + 2]
        if time is None:
            time = np.arange(len(flux), dtype=float)
        return LightCurve(time=time,
                          flux=Quantity(flux, electron_per_second))

    def get_residual_image(self, flux_cube, cadence=0):
        model = self.model.predict(self.opt_params[cadence])
        return np.asarray(flux_cube)[cadence] - model

    def plot_results(self, star_idx=0):
        """Plot every fitted model parameter over time (reference
        ``tpfmodel.py:814-840``): per-cadence star flux/col/row, motion,
        background, focus, and the final loss."""
        import matplotlib.pyplot as plt
        if self.results is None:
            raise ValueError("call run() first")
        fig, ax = plt.subplots(10, sharex=True, figsize=(6, 12))
        x = range(len(self.results))
        rows = [
            ("Flux", [r.stars[star_idx].flux for r in self.results]),
            ("Col", [r.stars[star_idx].col for r in self.results]),
            ("Row", [r.stars[star_idx].row for r in self.results]),
            ("Shift col", [r.motion.shift_col for r in self.results]),
            ("Shift row", [r.motion.shift_row for r in self.results]),
            ("Background", [r.background.flux for r in self.results]),
            ("Focus col", [r.focus.scale_col for r in self.results]),
            ("Focus row", [r.focus.scale_row for r in self.results]),
            ("Focus angle", [r.focus.rotation_angle for r in self.results]),
            ("Loss", list(self.losses)),
        ]
        for a, (label, series) in zip(ax, rows):
            a.plot(x, series)
            a.set_ylabel(label)
        return ax
