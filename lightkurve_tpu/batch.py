"""Batched multi-target containers — the TPU-native pipeline layer.

The reference processes one target at a time (its only concurrency is a
``multiprocessing`` pool, SURVEY.md §2.3); this module is the new
first-class batch layer: thousands of light curves packed as fixed-shape
``(B, N)`` arrays + validity masks, on which every hot operation (flatten,
Lomb-Scargle, BLS, photometry) runs as ONE vmapped device program, and
which shards over a device mesh via :mod:`lightkurve_tpu.parallel`.

Variable-length curves are padded to the stack length (bucket-by-length
padding, SURVEY.md §7 hard part (e)); padded samples carry ``mask=False``
and weight zero in every kernel.
"""
from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from .lightcurve import LightCurve
from .time import Time
from .units import Quantity, dimensionless

__all__ = ["LightCurveStack", "TPFStack"]


def _bitceil(n):
    return 1 << (int(n) - 1).bit_length()


@dataclass
class LightCurveStack:
    """A fixed-shape stack of light curves: time/flux/flux_err (B, N) + mask.

    All arrays live on device; ``mask`` is True for valid samples.  Padded
    time entries continue the median cadence so device kernels never see
    non-finite or non-monotonic times.
    """

    time: object          # (B, N) device array, float
    flux: object          # (B, N)
    flux_err: object      # (B, N)
    mask: object          # (B, N) bool
    meta: list = field(default_factory=list)
    time_format: str = "jd"

    # ------------------------------------------------------------------
    @classmethod
    def from_collection(cls, lcs, length=None, dtype=None, pad_to_pow2=True):
        import jax
        import jax.numpy as jnp
        if dtype is None:
            dtype = jnp.float64 if jax.config.jax_enable_x64 \
                else jnp.float32
        n_max = max(len(lc) for lc in lcs)
        if length is None:
            length = _bitceil(n_max) if pad_to_pow2 else n_max
        B = len(lcs)
        t = np.zeros((B, length))
        f = np.zeros((B, length))
        fe = np.ones((B, length))
        m = np.zeros((B, length), dtype=bool)
        metas = []
        for i, lc in enumerate(lcs):
            n = len(lc)
            tv = lc.time.value.astype(np.float64)
            fv = lc.flux.value.astype(np.float64)
            fev = lc.flux_err.value.astype(np.float64)
            t[i, :n] = tv
            f[i, :n] = np.nan_to_num(fv)
            fe[i, :n] = np.where(np.isfinite(fev) & (fev > 0), fev, 1.0)
            m[i, :n] = np.isfinite(fv)
            # pad times continuing the median cadence (kernel-safe)
            if n < length and n > 1:
                dt = np.median(np.diff(tv))
                t[i, n:] = tv[-1] + dt * np.arange(1, length - n + 1)
            metas.append(dict(lc.meta))
        fmt = lcs[0].time.format if len(lcs) else "jd"
        return cls(time=jnp.asarray(t, dtype), flux=jnp.asarray(f, dtype),
                   flux_err=jnp.asarray(fe, dtype),
                   mask=jnp.asarray(m), meta=metas, time_format=fmt)

    @classmethod
    def from_files(cls, paths, time_column="TIME",
                   flux_column="PDCSAP_FLUX",
                   flux_err_column="PDCSAP_FLUX_ERR", dtype=None,
                   nthreads=None):
        """Bulk-load mission FITS files straight into a stack.

        Uses the native multithreaded column loader
        (``csrc/fits_reader.cpp``) when a C++ toolchain is present, falling
        back to the pure-Python FITS reader otherwise.
        """
        import jax
        import jax.numpy as jnp
        from .io import native
        if dtype is None:
            dtype = jnp.float64 if jax.config.jax_enable_x64 \
                else jnp.float32
        if native.available():
            t, _ = native.read_batch(paths, time_column, nthreads=nthreads)
            f, _ = native.read_batch(paths, flux_column, stride=t.shape[1],
                                     nthreads=nthreads)
            try:
                fe, _ = native.read_batch(paths, flux_err_column,
                                          stride=t.shape[1],
                                          nthreads=nthreads)
            except Exception:
                fe = np.full_like(f, np.nan)
        else:
            from .io.fits import open_fits
            cols = []
            for p in paths:
                hdul = open_fits(p)
                d = hdul[1].data
                cols.append((np.asarray(d[time_column], dtype=float),
                             np.asarray(d[flux_column], dtype=float),
                             np.asarray(d[flux_err_column], dtype=float)
                             if flux_err_column in d else None))
            n_max = max(len(c[0]) for c in cols)
            t = np.full((len(paths), n_max), np.nan)
            f = np.full((len(paths), n_max), np.nan)
            fe = np.full((len(paths), n_max), np.nan)
            for i, (tv, fv, fev) in enumerate(cols):
                t[i, : len(tv)] = tv
                f[i, : len(fv)] = fv
                if fev is not None:
                    fe[i, : len(fev)] = fev
        mask = np.isfinite(t) & np.isfinite(f)
        length = _bitceil(t.shape[1])
        pad = length - t.shape[1]
        if pad:
            t = np.pad(t, ((0, 0), (0, pad)), constant_values=np.nan)
            f = np.pad(f, ((0, 0), (0, pad)))
            fe = np.pad(fe, ((0, 0), (0, pad)))
            mask = np.pad(mask, ((0, 0), (0, pad)))
        # kernel-safe padded times: continue the median cadence
        for i in range(t.shape[0]):
            good = np.where(mask[i])[0]
            if len(good) < 2:
                continue
            dt = np.median(np.diff(t[i, good]))
            bad = ~np.isfinite(t[i])
            t[i, bad] = t[i, good[-1]] + dt * np.arange(1, bad.sum() + 1)
            f[i] = np.nan_to_num(f[i])
            fe[i] = np.where(np.isfinite(fe[i]) & (fe[i] > 0), fe[i], 1.0)
        return cls(time=jnp.asarray(t, dtype), flux=jnp.asarray(f, dtype),
                   flux_err=jnp.asarray(fe, dtype), mask=jnp.asarray(mask),
                   meta=[{"FILENAME": p} for p in paths])

    @property
    def shape(self):
        return self.time.shape

    def __len__(self):
        return self.shape[0]

    def __getitem__(self, i):
        """Unpack one member back into a host LightCurve."""
        m = np.asarray(self.mask[i])
        lc = LightCurve(
            time=Time(np.asarray(self.time[i])[m], format=self.time_format),
            flux=Quantity(np.asarray(self.flux[i])[m], dimensionless),
            flux_err=Quantity(np.asarray(self.flux_err[i])[m],
                              dimensionless),
            meta=self.meta[i] if i < len(self.meta) else {})
        return lc

    def _replace(self, **kw):
        d = dict(time=self.time, flux=self.flux, flux_err=self.flux_err,
                 mask=self.mask, meta=self.meta,
                 time_format=self.time_format)
        d.update(kw)
        return LightCurveStack(**d)

    # ------------------------------------------------------------------
    # batched operations
    # ------------------------------------------------------------------
    def normalize(self):
        """Divide each curve by its median (batched)."""
        import jax.numpy as jnp
        from .ops.masked import masked_median
        med = masked_median(self.flux, self.mask)[:, None]
        return self._replace(flux=self.flux / med,
                             flux_err=self.flux_err / jnp.abs(med))

    def flatten(self, window_length=101, polyorder=2, break_tolerance=5,
                niters=3, sigma=3, return_trend=False):
        """Batched SG flatten — one device program over the whole stack."""
        import jax.numpy as jnp
        from .ops.detrend import flatten_batch
        from .ops.savgol import savgol_design_matrix
        H = savgol_design_matrix(window_length, min(polyorder,
                                                    window_length - 1))
        bt = np.nan if break_tolerance is None else float(break_tolerance)
        trend, valid = flatten_batch(
            self.time, self.flux, self.mask,
            jnp.asarray(H, self.flux.dtype),
            jnp.asarray(bt, self.flux.dtype),
            jnp.asarray(float(sigma), self.flux.dtype), niters=int(niters))
        flat = self._replace(flux=self.flux / trend,
                             flux_err=self.flux_err / trend)
        if return_trend:
            return flat, self._replace(flux=trend)
        return flat

    def remove_outliers(self, sigma=5.0, **kwargs):
        """Mask (not delete) outliers, batched."""
        from .ops.stats import sigma_clip_mask
        out = sigma_clip_mask(self.flux, mask=self.mask, sigma=sigma,
                              **kwargs)
        return self._replace(mask=self.mask & ~out)

    def _grid_groups(self, shared=None):
        """Group rows by identical time grids.  Returns (gid, t_host):
        ``gid`` row → group index; ``t_host`` is None when all rows share
        one grid (the common case, detected with a cheap device-side
        check so no (B, N) host pull happens).  Pass ``shared`` when the
        all-equal check has already been evaluated."""
        import jax.numpy as jnp
        if shared is None:
            shared = bool(jnp.all(self.time == self.time[0:1]))
        if shared:
            return np.zeros(len(self), dtype=int), None
        t_host = np.asarray(self.time)
        _, gid = np.unique(t_host, axis=0, return_inverse=True)
        return np.asarray(gid).ravel(), t_host

    def to_periodogram(self, minimum_frequency=None, maximum_frequency=None,
                       oversample_factor=1.0, normalization="psd",
                       sharded=False, mesh=None):
        """Batched fast Lomb-Scargle over a shared frequency grid.

        The frequency grid is derived from the FIRST curve's
        baseline/cadence; stacks mixing a few DISTINCT time grids
        (multi-sector collections) are grouped by grid, each group running
        the batched transform on the same frequency grid.
        ``sharded=True`` runs via ``parallel.sharded_lombscargle`` over a
        device mesh (single-grid stacks only).  Returns
        (frequency (Nf,), power (B, Nf)).
        """
        import jax.numpy as jnp
        from .ops.lombscargle import lombscargle_fast
        t0 = np.asarray(self.time[0], dtype=np.float64)
        nyquist = 0.5 / np.median(np.diff(t0))
        fs = 1.0 / (t0[-1] - t0[0]) / oversample_factor
        f0 = fs if minimum_frequency is None else float(minimum_frequency)
        fmax = nyquist if maximum_frequency is None else \
            float(maximum_frequency)
        Nf = int((fmax - f0) / fs)
        # padded samples get zero weight via dy=inf
        dy = jnp.where(self.mask, self.flux_err,
                       jnp.asarray(np.inf, self.flux.dtype))
        if sharded:
            import jax.numpy as _jnp
            if not bool(_jnp.all(self.time == self.time[0:1])):
                raise ValueError(
                    "sharded=True requires all curves to share one time "
                    "grid; group mixed-grid stacks first (the default "
                    "unsharded path does this automatically)")
            from .parallel import sharded_lombscargle
            power = sharded_lombscargle(self.time[0], self.flux, dy, f0,
                                        fs, Nf, mesh=mesh,
                                        normalization=normalization)
            gid, t_host = np.zeros(len(self), dtype=int), None
        else:
            gid, t_host = self._grid_groups()
        if gid.max() == 0:
            if not sharded:
                power = lombscargle_fast(t0, self.flux, f0, fs, Nf, dy=dy,
                                         normalization=normalization)
        else:
            power = np.zeros((len(self), Nf))
            for g in range(int(gid.max()) + 1):
                rows = np.nonzero(gid == g)[0]
                power[rows] = np.asarray(lombscargle_fast(
                    t_host[rows[0]], self.flux[rows], f0, fs, Nf,
                    dy=dy[rows], normalization=normalization))
        freqs = f0 + fs * np.arange(Nf)
        if normalization == "psd":
            n = np.asarray(self.mask.sum(axis=1))[:, None]
            power = np.asarray(power) * 2.0 / (n * oversample_factor * fs)
        else:
            power = np.asarray(power)
        return freqs, power

    def bls_search(self, periods, durations, oversample=10,
                   objective="likelihood", sharded=False, mesh=None,
                   shared_time=None, method="fast"):
        """Batched BLS over the stack; optionally sharded over a device
        mesh (targets × period-grid), see ``parallel.sharded_bls``.

        When every curve shares one time grid (auto-detected, or forced
        via ``shared_time=True``) the search runs through the MXU-matmul
        kernel (``ops.bls.bls_power_shared_batch``) — orders of magnitude
        faster than per-curve folding.  ``method='exact'`` forces the
        sorted-phase exact kernel instead.
        """
        import jax
        import jax.numpy as jnp
        from .ops.bls import bls_power, bls_power_shared_batch
        periods = jnp.asarray(periods, self.flux.dtype)
        durations = jnp.asarray(durations, self.flux.dtype)
        dy = jnp.where(self.mask, self.flux_err,
                       jnp.asarray(np.inf, self.flux.dtype))
        from .utils import validate_method
        method = validate_method(method, ["fast", "exact"])
        if sharded:
            from .parallel import sharded_bls
            # forward the caller's kernel choices; an explicit
            # method='exact' disables the shared-time MXU path
            return sharded_bls(self.time, self.flux, dy, periods, durations,
                               oversample=oversample, objective=objective,
                               mesh=mesh,
                               shared_time=(False if method == "exact"
                                            else shared_time))
        auto = shared_time is None
        if auto and method == "fast":
            shared_time = bool(jnp.all(self.time == self.time[0:1]))
        if shared_time and method == "fast":
            return bls_power_shared_batch(
                self.time[0], self.flux, dy, periods, durations,
                oversample=oversample, objective=objective)
        if method == "fast" and auto:
            # mixed time grids: real collections hold a few DISTINCT grids
            # (one per sector/quarter) — group rows by grid and run the
            # MXU-matmul kernel per group instead of per-curve folding.
            # An EXPLICIT shared_time=False opts out of the binned shared
            # kernel entirely and takes the per-curve fold below.
            gid, t_host = self._grid_groups(shared=False)
            if gid.max() + 1 < len(self):            # fewer grids than rows
                out = None
                for g in range(int(gid.max()) + 1):
                    rows = np.nonzero(gid == g)[0]
                    sub = bls_power_shared_batch(
                        self.time[rows[0]], self.flux[rows], dy[rows],
                        periods, durations, oversample=oversample,
                        objective=objective)
                    if out is None:
                        out = {k: np.zeros((len(self),) + v.shape[1:],
                                           dtype=np.asarray(v).dtype)
                               for k, v in sub.items()}
                    for k, v in sub.items():
                        out[k][rows] = np.asarray(v)
                    del sub
                return out
        fn = jax.vmap(lambda t, y, d: bls_power(
            t, y, d, periods, durations, oversample=oversample,
            objective=objective))
        return fn(self.time, self.flux, dy)

    def estimate_cdpp_batch(self, transit_duration=13, savgol_window=101,
                            savgol_polyorder=2, sigma=5.0):
        """Batched sgCDPP (ppm), mirroring ``LightCurve.estimate_cdpp``."""
        import jax.numpy as jnp
        from .ops.masked import masked_median, masked_std
        from .ops.stats import running_mean, sigma_clip_mask
        flat = self.flatten(window_length=savgol_window,
                            polyorder=savgol_polyorder)
        out = sigma_clip_mask(flat.flux, mask=flat.mask, sigma=sigma)
        m = flat.mask & ~out
        med = masked_median(flat.flux, m)[:, None]
        norm = (flat.flux / med - 1.0) * 1e6
        # zero out invalid samples: running mean then std over valid windows
        norm = jnp.where(m, norm, 0.0)
        rm = running_mean(norm, transit_duration)
        # windows fully inside the valid prefix
        cnt = running_mean(m.astype(norm.dtype), transit_duration)
        wmask = cnt > 0.999
        return np.asarray(masked_std(rm, wmask))


@dataclass
class TPFStack:
    """A stack of TPF cubes (B, T, H, W) + aperture masks (B, H, W)."""

    flux: object
    flux_err: object
    time: object          # (B, T)
    aperture: object      # (B, H, W) bool
    meta: list = field(default_factory=list)
    time_format: str = "btjd"

    @classmethod
    def from_collection(cls, tpfs, aperture_mask="default", dtype=None):
        import jax
        import jax.numpy as jnp
        if dtype is None:
            dtype = jnp.float64 if jax.config.jax_enable_x64 \
                else jnp.float32
        shapes = {t.shape for t in tpfs}
        if len(shapes) != 1:
            raise ValueError("All TPFs in a stack must share one shape; "
                             f"got {shapes}")
        flux = np.stack([t.flux.value for t in tpfs])
        err = np.stack([t.flux_err.value for t in tpfs])
        time = np.stack([t.time.value for t in tpfs])
        aps = np.stack([t._parse_aperture_mask(aperture_mask)
                        for t in tpfs])
        return cls(flux=jnp.asarray(flux, dtype),
                   flux_err=jnp.asarray(err, dtype),
                   time=jnp.asarray(time, dtype),
                   aperture=jnp.asarray(aps),
                   meta=[dict(t.meta) for t in tpfs],
                   time_format=tpfs[0]._time_format)

    def __len__(self):
        return self.flux.shape[0]

    def extract_aperture_photometry(self):
        """Batched masked-reduction photometry → LightCurveStack."""
        import jax.numpy as jnp
        from .ops.photometry import aperture_photometry_cube
        flux, flux_err = aperture_photometry_cube(
            self.flux, self.flux_err, self.aperture)
        mask = jnp.isfinite(flux)
        return LightCurveStack(
            time=self.time, flux=jnp.nan_to_num(flux),
            flux_err=jnp.where(jnp.isfinite(flux_err), flux_err, 1.0),
            mask=mask, meta=self.meta, time_format=self.time_format)

    def pld_correct(self, pld_order=1, n_pca_terms=3, sigma=5.0, niters=5):
        """Batched PLD systematics removal → corrected LightCurveStack.

        The sector-scale form of :class:`~lightkurve_tpu.correctors.
        PLDCorrector` (reference hot loop ``pldcorrector.py:125-287`` +
        ``targetpixelfile.py:868-932``): per target, flux-normalized
        pixel series are PCA-reduced on device (one vmapped randomized
        SVD), a constant column is appended, and the clipped ridge fit
        runs as a fixed-iteration device program — B targets in one XLA
        program, no per-target Python.

        ``pld_order >= 2`` uses products of the top ``n_pca_terms``
        order-1 components (then includes both orders), a batched
        approximation of the reference's multichoose-then-PCA pipeline;
        use ``PLDCorrector`` per target for full mission fidelity.
        """
        import jax
        import jax.numpy as jnp
        from .ops.solve import (iterative_clipped_regression,
                                randomized_pca)
        lcs = self.extract_aperture_photometry()
        B, T = lcs.flux.shape
        dtype = lcs.flux.dtype
        # NaN pixels (out-of-footprint, gap cadences) must not poison the
        # regressors: NaN * 0-mask is still NaN, so zero them explicitly
        # like ops/photometry does
        finite_flux = jnp.where(jnp.isfinite(self.flux), self.flux,
                                jnp.asarray(0.0, dtype))
        pix = (finite_flux
               * self.aperture[:, None, :, :]).reshape(B, T, -1)
        tot = jnp.sum(pix, axis=2, keepdims=True)
        pixn = pix / jnp.maximum(tot, jnp.asarray(1e-30, dtype))

        def one(pixn_i, y, fe, m):
            # center before the SVD (fbpca raw=False semantics, as the
            # reference's DesignMatrix.pca uses): pixn rows sum to 1, so
            # uncentered components would be collinear with the constant
            # column and leave the ridge system singular
            pc = pixn_i - jnp.mean(pixn_i, axis=0, keepdims=True)
            U, _, _ = randomized_pca(pc, n_pca_terms)        # (T, k)
            cols = [U[:, :n_pca_terms]]
            if pld_order >= 2:
                prods = jnp.einsum("ti,tj->tij", U[:, :n_pca_terms],
                                   U[:, :n_pca_terms]).reshape(T, -1)
                prods = prods - jnp.mean(prods, axis=0, keepdims=True)
                U2, _, _ = randomized_pca(prods, n_pca_terms)
                cols.append(U2[:, :n_pca_terms])
            cols.append(jnp.ones((T, 1), dtype))
            X = jnp.concatenate(cols, axis=1)
            k = X.shape[1]
            w, m_fin, _ = iterative_clipped_regression(
                X, y, fe, m, jnp.zeros(k, dtype),
                jnp.full(k, jnp.inf, dtype), sigma=sigma, niters=niters)
            model = X @ w
            model = model - jnp.median(model)
            return y - model

        corrected = jax.vmap(one)(pixn, lcs.flux, lcs.flux_err, lcs.mask)
        return LightCurveStack(
            time=self.time, flux=corrected, flux_err=lcs.flux_err,
            mask=lcs.mask, meta=self.meta, time_format=self.time_format)
