"""Second independent reconstruction of the astropy binned-BLS kernel.

VERDICT r4 item 8: the one reconstructed assumption in the provenance
chain is the astropy edge rule — its fold histogram is padded with empty
bins past the period edge instead of wrapping, so edge windows are
truncated (``tests/oracles.py`` header, docs/parity.md "edge windows").
``tools/astropy_crosscheck.py`` closes the loop against real astropy but
has never run (no astropy in this environment), so this module
triangulates the assumption with a THIRD implementation written from
deliberately different structural choices than both the JAX kernels
(prefix-sum/matmul) and oracle #1 (bincount + cumsum windows):

- histogram sized ``int(period / bin) + oversample`` (the astropy
  ``_impl.pyx`` sizing formula) instead of oracle #1's
  ``ceil(period / bin)`` + ``k_max`` pad — the two differ unless the edge
  rule is truncation-by-empty-bins, which both must express identically;
- window sums by SLIDING accumulation (subtract the leaving bin, add the
  entering bin) instead of cumsum differences;
- loop order duration-outer / phase-inner with ">=" acceptance scanning
  durations in reverse, the mirror of oracle #1's order — agreement on
  ``power`` is therefore independent of argmax tie conventions.

If this reconstruction and oracle #1 (``wrap=False``) agree to float64
roundoff on the parity configs, two independent derivations of the edge
rule corroborate each other; a real-astropy run of the crosscheck tool
remains the final word.
"""
import numpy as np

__all__ = ["bls_binned_astropy_recon2"]


def bls_binned_astropy_recon2(t, y, dy, periods, durations, oversample=10,
                              use_likelihood=True):
    t = np.asarray(t, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    w = np.ones_like(y) if dy is None else \
        1.0 / np.square(np.asarray(dy, dtype=np.float64))
    periods = np.asarray(periods, dtype=np.float64)
    durations = np.asarray(durations, dtype=np.float64)

    bin_d = durations.min() / oversample
    # durations in bins; scanned LARGEST first (reverse of oracle #1)
    k_list = [(max(int(round(d / bin_d)), 1), float(d))
              for d in durations]
    k_list.sort(key=lambda kd: -kd[0])

    t_min = t.min()
    ts = t - t_min
    sum_w = float(w.sum())
    sum_wy = float((w * y).sum())

    out = {k: np.zeros(len(periods)) for k in
           ("power", "depth", "depth_err", "depth_snr", "log_likelihood",
            "duration", "transit_time")}
    for ip, p in enumerate(periods):
        # astropy-style histogram sizing: int(p/bin) data bins plus EMPTY
        # pad bins past the period edge (the truncation rule under test —
        # the pad must merely cover the widest window; its emptiness is
        # the assumption)
        n_data_bins = int(p / bin_d) + 1
        n_bins = n_data_bins + max(oversample, k_list[0][0])
        hw = np.zeros(n_bins)
        hwy = np.zeros(n_bins)
        ind = (np.mod(ts, p) / bin_d).astype(int)
        np.add.at(hw, ind, w)
        np.add.at(hwy, ind, w * y)

        best = -np.inf
        for k, dur in k_list:
            if k > n_data_bins:
                continue
            # sliding window over starts b in [0, n_data_bins):
            # initialize at b=0, then slide
            w_in = float(hw[:k].sum())
            wy_in = float(hwy[:k].sum())
            for b in range(n_data_bins):
                if b > 0:
                    # subtract the leaving bin, add the entering bin
                    w_in += float(hw[b + k - 1]) - float(hw[b - 1])
                    wy_in += float(hwy[b + k - 1]) - float(hwy[b - 1])
                w_out = sum_w - w_in
                wy_out = sum_wy - wy_in
                if w_in <= 0.0 or w_out <= 0.0:
                    continue
                y_in = wy_in / w_in
                y_out = wy_out / w_out
                depth = y_out - y_in
                if use_likelihood:
                    obj = 0.5 * w_in * depth * depth
                else:
                    obj = depth / np.sqrt(1.0 / w_in + 1.0 / w_out)
                # ">=": later (smaller-k, later-phase) candidates win
                # ties — the mirror of oracle #1's strict ">"
                if obj >= best:
                    best = obj
                    d_err = np.sqrt(1.0 / w_in + 1.0 / w_out)
                    out["power"][ip] = obj
                    out["depth"][ip] = depth
                    out["depth_err"][ip] = d_err
                    out["depth_snr"][ip] = depth / d_err
                    out["log_likelihood"][ip] = 0.5 * w_in * depth ** 2
                    out["duration"][ip] = dur
                    out["transit_time"][ip] = t_min + np.mod(
                        (b + 0.5 * k) * bin_d, p)
    return out
