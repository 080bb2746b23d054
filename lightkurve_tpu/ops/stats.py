"""Statistical kernels: sigma-clipping and running statistics.

``sigma_clip_mask`` is the fixed-iteration, mask-based TPU equivalent of
``astropy.stats.sigma_clip`` as used by the reference's ``remove_outliers``
(``lightcurve.py:1519``) and the corrector clip loops
(``regressioncorrector.py:243-273``): center = median, spread = std (ddof=0),
iterate until converged (emulated by a fixed ``maxiters`` loop whose
iterations become no-ops after convergence — identical fixed point).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .masked import masked_median, masked_std, masked_mean

__all__ = ["sigma_clip_mask", "running_mean"]


def sigma_clip_mask(x, mask=None, sigma=5.0, sigma_lower=None,
                    sigma_upper=None, maxiters=5, cenfunc="median",
                    stdfunc="std"):
    """Iterative sigma clipping over the last axis.

    Parameters
    ----------
    x : (..., n) array
    mask : (..., n) bool — True = valid input (NaNs auto-masked).
    sigma, sigma_lower, sigma_upper : clip thresholds (astropy semantics).
    maxiters : static int — number of clip iterations (astropy default 5).
    cenfunc : "median" or "mean".
    stdfunc : currently "std" (ddof=0), matching astropy's default.

    Returns
    -------
    outlier : bool array, True where the point was REJECTED (matches the
        ``.mask`` attribute of astropy's ``sigma_clip`` result for finite
        input; non-finite input points are also flagged True).
    """
    sigma_lower = sigma if sigma_lower is None else sigma_lower
    sigma_upper = sigma if sigma_upper is None else sigma_upper
    finite = jnp.isfinite(x)
    if mask is not None:
        finite = finite & mask
    x0 = jnp.where(finite, x, 0.0)

    cen_fn = masked_median if cenfunc == "median" else masked_mean

    def body(_, valid):
        center = cen_fn(x0, valid)[..., None]
        std = masked_std(x0, valid)[..., None]
        keep = (x0 >= center - sigma_lower * std) & \
               (x0 <= center + sigma_upper * std)
        return valid & keep

    valid = jax.lax.fori_loop(0, maxiters, body, finite)
    return ~valid


def running_mean(x, window_size):
    """Moving average over the last axis via cumulative sums.

    Matches the reference ``utils.running_mean`` (``utils.py:374-387``):
    output length is ``n - window_size + 1``. ``window_size`` is static.
    """
    n = x.shape[-1]
    w = min(int(window_size), n)
    csum = jnp.cumsum(x, axis=-1)
    zero = jnp.zeros(x.shape[:-1] + (1,), dtype=csum.dtype)
    csum = jnp.concatenate([zero, csum], axis=-1)
    return (csum[..., w:] - csum[..., :-w]) / float(w)
