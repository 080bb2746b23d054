"""Device-side compute kernels (JAX/XLA/Pallas) for lightkurve_tpu.

Every hot loop of the reference library lives here as a pure, jittable,
batchable function over fixed-shape arrays.  Conventions:

- Arrays are ``(..., n)`` with leading batch axes; every op is ``vmap``-safe.
- Missing data is an explicit ``mask`` (True = valid), replacing the
  reference's NaN/row-deletion semantics (SURVEY.md §7 hard part (c)).
- Host wrappers in the API layer convert NaNs ↔ masks at the boundary.
"""
from .masked import (
    nan_to_mask,
    masked_sum,
    masked_mean,
    masked_std,
    masked_median,
    masked_var,
)
from .stats import sigma_clip_mask, running_mean as running_mean_op
from .savgol import savgol_design_matrix, savgol_filter_interp
from .detrend import flatten as flatten_op, flatten_batch
from .fold import fold_phase, transit_mask as transit_mask_op, bin_folded
from .binning import bin_time as bin_time_op
from .lombscargle import (
    lombscargle_direct,
    lombscargle_fast,
    lombscargle_chi2,
    extirpolate,
    trig_sum,
)
from .bls import (bls_power, bls_power_direct, bls_power_binned,
                  bls_objective_single)
from .fft import fft_pair, ifft_pair, rfft_pair
from .solve import (
    solve_regression,
    iterative_clipped_regression,
    randomized_pca,
)
from .acf import autocorrelate_windows, acf2d
from .photometry import (
    aperture_photometry_cube,
    centroid_moments_cube,
    background_estimate_cube,
)
from .interp import interp_linear_extrap, pchip_interpolate

__all__ = [
    "nan_to_mask", "masked_sum", "masked_mean", "masked_std",
    "masked_median", "masked_var",
    "sigma_clip_mask", "running_mean_op",
    "savgol_design_matrix", "savgol_filter_interp",
    "flatten_op", "flatten_batch",
    "fold_phase", "transit_mask_op", "bin_folded", "bin_time_op",
    "lombscargle_direct", "lombscargle_fast", "lombscargle_chi2",
    "extirpolate", "trig_sum",
    "bls_power", "bls_power_direct", "bls_power_binned",
    "bls_objective_single",
    "fft_pair", "ifft_pair", "rfft_pair",
    "solve_regression", "iterative_clipped_regression", "randomized_pca",
    "autocorrelate_windows", "acf2d",
    "aperture_photometry_cube", "centroid_moments_cube",
    "background_estimate_cube",
    "interp_linear_extrap", "pchip_interpolate",
]
