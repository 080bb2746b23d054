"""Pixel Response Function models.

Re-implements the reference's ``prf/prfmodel.py`` (370 LoC) with a
TPU-first evaluation path: PRFs are evaluated on device via bilinear
interpolation of a supersampled image (replacing scipy's
``RectBivariateSpline``), so scene models can be vmapped over stars and
cadences and differentiated with ``jax.grad`` for fitting.

``KeplerPRF`` loads the per-channel calibration FITS (Bryson 2010,
reference ``prfmodel.py:215-292``) from a local directory — the MAST
download requires network access, unavailable here.  ``SimpleKeplerPRF``
and ``GaussianPRF`` are analytic, calibration-free models
(``SimpleKeplerPRF`` mirrors reference ``prfmodel.py:309-370``).
"""
from __future__ import annotations

import logging
import os

import numpy as np

from ..utils import LightkurveError

log = logging.getLogger(__name__)

__all__ = ["KeplerPRF", "SimpleKeplerPRF", "GaussianPRF"]


class _InterpolatedPRF:
    """Shared machinery: supersampled PRF image + device evaluation."""

    # subclasses set: supersampled_prf (Sy, Sx), oversample factor,
    # col_coord/row_coord arrays, shape, column, row

    def _interp_device(self, rot_row, rot_col):
        """Bilinear interpolation of the supersampled PRF at offsets
        (rows, cols) in pixels from the PRF center."""
        import jax.numpy as jnp
        prf = jnp.asarray(self.supersampled_prf)
        sy, sx = prf.shape
        # PRF image is centered; offsets in pixels → supersampled indices
        fy = rot_row * self.oversample + (sy - 1) / 2.0
        fx = rot_col * self.oversample + (sx - 1) / 2.0
        x0 = jnp.clip(jnp.floor(fx).astype(int), 0, sx - 2)
        y0 = jnp.clip(jnp.floor(fy).astype(int), 0, sy - 2)
        wx = jnp.clip(fx - x0, 0.0, 1.0)
        wy = jnp.clip(fy - y0, 0.0, 1.0)
        inside = (fx >= 0) & (fx <= sx - 1) & (fy >= 0) & (fy <= sy - 1)
        v00 = prf[y0, x0]
        v01 = prf[y0, x0 + 1]
        v10 = prf[y0 + 1, x0]
        v11 = prf[y0 + 1, x0 + 1]
        val = (v00 * (1 - wy) * (1 - wx) + v01 * (1 - wy) * wx
               + v10 * wy * (1 - wx) + v11 * wy * wx)
        return jnp.where(inside, val, 0.0)

    def _interp_separable(self, dr, dc):
        """Bilinear interpolation for AXIS-ALIGNED offsets as two small
        matmuls: ``R @ PRF @ Cᵀ`` with hat-function (bilinear) weight
        matrices R (H, Sy) and C (W, Sx).

        Equivalent to :meth:`_interp_device` on the outer-product grid
        but GATHER-FREE: TPU gathers serialize over indices and
        dominated the batched PRF fit (measured ~86 µs per
        cadence-iteration at 9×9 px); the matmul form rides the MXU and
        batches cleanly under vmap."""
        import jax.numpy as jnp
        prf = jnp.asarray(self.supersampled_prf)
        sy, sx = prf.shape
        fy = dr * self.oversample + (sy - 1) / 2.0           # (H,)
        fx = dc * self.oversample + (sx - 1) / 2.0           # (W,)
        ry = jnp.maximum(0.0, 1.0 - jnp.abs(
            fy[:, None] - jnp.arange(sy)))                   # (H, Sy)
        cx = jnp.maximum(0.0, 1.0 - jnp.abs(
            fx[:, None] - jnp.arange(sx)))                   # (W, Sx)
        # outside the supersampled support the gather path returns 0;
        # the hat weights would keep a partial tail, so mask explicitly
        ry = ry * ((fy >= 0) & (fy <= sy - 1))[:, None]
        cx = cx * ((fx >= 0) & (fx <= sx - 1))[:, None]
        return ry @ prf @ cx.T                               # (H, W)

    @staticmethod
    def _is_identity_focus(scale_col, scale_row, rotation_angle):
        """True iff the focus transform is concretely absent (plain
        Python/numpy scalars at the defaults — i.e. ``fit_focus=False``;
        traced values conservatively return False)."""
        for v, ident in ((rotation_angle, 0.0),):
            if not isinstance(v, (int, float, np.floating, np.integer)) \
                    or float(v) != ident:
                return False
        return True

    def evaluate(self, center_col, center_row, flux=1.0, scale_col=1.0,
                 scale_row=1.0, rotation_angle=0.0):
        """PRF image on the detector grid (reference ``:80-124``):
        coordinates are rotated/scaled about the center, then the
        supersampled model is interpolated."""
        import jax.numpy as jnp
        dc = jnp.asarray(self.col_coord) - center_col        # (W,)
        dr = jnp.asarray(self.row_coord) - center_row        # (H,)
        if self._is_identity_focus(scale_col, scale_row, rotation_angle):
            # no rotation → the sample grid is an outer product and the
            # interpolation separates into gather-free matmuls (scales
            # may still be traced: they act per-axis)
            return flux * self._interp_separable(dr * scale_row,
                                                 dc * scale_col)
        cosa = jnp.cos(rotation_angle)
        sina = jnp.sin(rotation_angle)
        dcol, drow = jnp.meshgrid(dc, dr)
        rot_row = drow * cosa - dcol * sina
        rot_col = drow * sina + dcol * cosa
        return flux * self._interp_device(rot_row * scale_row,
                                          rot_col * scale_col)

    __call__ = evaluate

    def gradient(self, center_col, center_row, flux=1.0, scale_col=1.0,
                 scale_row=1.0, rotation_angle=0.0):
        """Gradients w.r.t. all parameters via jax.jacfwd (replacing the
        reference's hand-derived spline gradients, ``prfmodel.py:126-213``)."""
        import jax

        def f(p):
            return self.evaluate(p[0], p[1], p[2], p[3], p[4], p[5])

        import jax.numpy as jnp
        p = jnp.asarray([center_col, center_row, flux, scale_col, scale_row,
                         rotation_angle], dtype=float)
        jac = jax.jacfwd(f)(p)
        return [np.asarray(jac[..., i]) for i in range(6)]

    def plot(self, ax=None, **kwargs):
        import matplotlib.pyplot as plt
        if ax is None:
            _, ax = plt.subplots()
        img = np.asarray(self.evaluate(
            self.column + self.shape[1] / 2,
            self.row + self.shape[0] / 2))
        im = ax.imshow(img, origin="lower", **kwargs)
        plt.colorbar(im, ax=ax)
        return ax


class GaussianPRF(_InterpolatedPRF):
    """Analytic circular-Gaussian PRF (calibration-free; new in
    lightkurve_tpu, useful for tests and synthetic scenes)."""

    def __init__(self, shape, column=0, row=0, sigma=1.0, oversample=9,
                 radius=6):
        self.shape = tuple(shape)
        self.column = column
        self.row = row
        self.sigma = float(sigma)
        self.oversample = oversample
        n = 2 * radius * oversample + 1
        ax = (np.arange(n) - (n - 1) / 2) / oversample
        xx, yy = np.meshgrid(ax, ax)
        img = np.exp(-(xx ** 2 + yy ** 2) / (2 * sigma ** 2))
        # normalize to a per-detector-pixel flux density so the sampled
        # PRF sums to ~1 over the detector grid
        self.supersampled_prf = img / img.sum() * oversample ** 2
        self.col_coord = column + np.arange(0.5, shape[1] + 0.5)
        self.row_coord = row + np.arange(0.5, shape[0] + 0.5)


class SimpleKeplerPRF(GaussianPRF):
    """Idealized Kepler PRF: a Gaussian with the mission's typical ~1.5-px
    FWHM (mirrors the role of reference ``prfmodel.py:309-370``, which
    interpolates the calibration files without focus/rotation terms)."""

    def __init__(self, channel=1, shape=(11, 11), column=0, row=0):
        self.channel = channel
        super().__init__(shape=shape, column=column, row=row,
                         sigma=1.5 / 2.3548)


class KeplerPRF(_InterpolatedPRF):
    """Kepler PRF from the per-channel calibration files (Bryson 2010).

    Parameters
    ----------
    channel, shape, column, row : as in the reference
        (``prfmodel.py:17-78``).
    prf_dir : str
        Directory holding ``kplr*_prf.fits`` calibration files (the
        reference downloads these from MAST; this environment has no
        network, so a local path is required).
    """

    def __init__(self, channel, shape, column, row, prf_dir=None):
        self.channel = channel
        self.shape = tuple(shape)
        self.column = column
        self.row = row
        self.oversample = 50  # Kepler PRF files are 50x supersampled
        self.col_coord = column + np.arange(0.5, shape[1] + 0.5)
        self.row_coord = row + np.arange(0.5, shape[0] + 0.5)
        self.supersampled_prf = self._load_calibration(prf_dir)

    def _load_calibration(self, prf_dir):
        from ..io.fits import open_fits
        from ..utils import channel_to_module_output
        if prf_dir is None:
            raise LightkurveError(
                "KeplerPRF requires the per-channel calibration FITS files, "
                "which are downloaded from MAST in the reference "
                "(prfmodel.py:215-292). Network is unavailable here; pass "
                "`prf_dir` pointing at local kplr*_prf.fits files, or use "
                "SimpleKeplerPRF / GaussianPRF.")
        module, output = channel_to_module_output(self.channel)
        import glob
        pattern = os.path.join(prf_dir, f"kplr{module:02}.{output}*_prf.fits")
        hits = sorted(glob.glob(pattern))
        if not hits:
            raise LightkurveError(f"No PRF calibration file matching "
                                  f"{pattern}")
        hdul = open_fits(hits[0])
        # The calibration file holds 5 PRF measurements (4 corners +
        # center); the reference interpolates linearly by detector
        # position (prfmodel.py:230-280). We reproduce that weighting.
        prfs = []
        weights = []
        ref_col = self.column + 0.5 * self.shape[1]
        ref_row = self.row + 0.5 * self.shape[0]
        for hdu in hdul[1:]:
            if hdu.data is None or np.ndim(hdu.data) != 2:
                continue
            crval1 = hdu.header.get("CRVAL1P", 0)
            crval2 = hdu.header.get("CRVAL2P", 0)
            prfs.append(np.asarray(hdu.data, dtype=float))
            d = np.hypot(ref_col - crval1, ref_row - crval2)
            weights.append(1.0 / (d + 1e-6))
        if not prfs:
            raise LightkurveError("Calibration file contains no PRF images")
        weights = np.asarray(weights)
        weights /= weights.sum()
        out = np.zeros_like(prfs[0])
        for w, p in zip(weights, prfs):
            out += w * p
        return out
