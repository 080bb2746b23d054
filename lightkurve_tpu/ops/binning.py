"""Segmented-reduction time binning.

TPU equivalent of astropy's ``aggregate_downsample`` +
``np.add.reduceat`` fast paths used by the reference's ``LightCurve.bin``
(``lightcurve.py:1558-1762``), including its error aggregations:
``rmse_reduceat`` (root-mean-square of errors per bin,
``lightcurve.py:175-199``) and ``nanstd_reduceat`` (population std per bin,
``lightcurve.py:213-251``).  Bins with zero valid samples yield NaN.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

__all__ = ["bin_time", "bin_aggregate"]


def _segsum(values, seg_ids, n_bins):
    return jax.ops.segment_sum(values, seg_ids, num_segments=n_bins)


@partial(jax.jit, static_argnames=("n_bins",))
def bin_aggregate(values, mask, seg_ids, n_bins):
    """Per-bin nanmean / rmse / nanstd of ``values`` grouped by ``seg_ids``.

    Parameters
    ----------
    values : (n,) samples.
    mask : (n,) bool, True = valid (NaNs must already be excluded).
    seg_ids : (n,) int bin index per sample; out-of-range ids must be
        pre-clipped by the caller with ``mask`` False.
    n_bins : static int.

    Returns
    -------
    mean, rmse, std, count : (n_bins,) arrays (NaN where count == 0).
    """
    v = jnp.where(mask, values, 0.0)
    cnt = _segsum(mask.astype(v.dtype), seg_ids, n_bins)
    s1 = _segsum(v, seg_ids, n_bins)
    s2 = _segsum(v * v, seg_ids, n_bins)
    safe = jnp.maximum(cnt, 1.0)
    mean = s1 / safe
    rmse = jnp.sqrt(s2 / safe)
    # two-pass population std (avoids cancellation; mirrors nanstd_reduceat)
    d = jnp.where(mask, values - mean[seg_ids], 0.0)
    std = jnp.sqrt(_segsum(d * d, seg_ids, n_bins) / safe)
    nan = jnp.nan
    empty = cnt == 0
    return (jnp.where(empty, nan, mean), jnp.where(empty, nan, rmse),
            jnp.where(empty, nan, std), cnt)


def bin_time(time, values, mask, start, bin_size, n_bins):
    """Equal-width time binning: returns (bin_mid_times, mean, rmse, std, count).

    Samples with ``time < start`` or beyond the last bin are dropped, matching
    ``aggregate_downsample``'s windowing.
    """
    ids = jnp.floor((time - start) / bin_size).astype(jnp.int32)
    in_range = (ids >= 0) & (ids < n_bins)
    ids = jnp.clip(ids, 0, n_bins - 1)
    mean, rmse, std, cnt = bin_aggregate(values, mask & in_range, ids, n_bins)
    mids = start + (jnp.arange(n_bins) + 0.5) * bin_size
    return mids, mean, rmse, std, cnt
