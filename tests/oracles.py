"""NumPy/SciPy oracle implementations of the reference numerics.

Since astropy is not available in this environment, these independent
numpy implementations — written from the published algorithms with the
same conventions as astropy/lightkurve — serve as the CPU ground truth
that every JAX kernel must match (SURVEY.md §4: "property/parity tests
comparing every kernel against a CPU reference").
"""
import numpy as np
from scipy.interpolate import interp1d
from scipy.signal import savgol_filter


# ---------------------------------------------------------------------------
# Lomb-Scargle (generalized, floating mean; Zechmeister & Kühr 2009)
# ---------------------------------------------------------------------------
def ls_slow(t, y, freqs, dy=None, normalization="standard", fit_mean=True,
            center_data=True):
    if dy is None:
        dy = np.ones_like(t)
    w = dy ** -2.0
    wsum = w.sum()
    wn = w / wsum
    if fit_mean or center_data:
        y = y - np.dot(wn, y)
    out = np.zeros(len(freqs))
    YY = np.dot(wn, y ** 2)
    for i, f in enumerate(freqs):
        wt = 2 * np.pi * f * t
        sin, cos = np.sin(wt), np.cos(wt)
        S2 = 2 * np.dot(wn, sin * cos)
        C2 = 2 * np.dot(wn, 0.5 - sin ** 2)
        if fit_mean:
            S = np.dot(wn, sin)
            C = np.dot(wn, cos)
            S2 -= 2 * S * C
            C2 -= C * C - S * S
        tan2wt = S2 / C2
        C2w = 1.0 / np.sqrt(1 + tan2wt ** 2)
        S2w = tan2wt * C2w
        Cw = np.sqrt(0.5 * (1 + C2w))
        Sw = np.sqrt(0.5) * np.sign(S2w) * np.sqrt(1 - C2w)
        cos_t = cos * Cw + sin * Sw
        sin_t = sin * Cw - cos * Sw
        YC = np.dot(wn, y * cos_t)
        YS = np.dot(wn, y * sin_t)
        CC = np.dot(wn, cos_t ** 2)
        SS = np.dot(wn, sin_t ** 2)
        if fit_mean:
            CC -= np.dot(wn, cos_t) ** 2
            SS -= np.dot(wn, sin_t) ** 2
        out[i] = YC * YC / CC + YS * YS / SS
    if normalization == "standard":
        return out / YY
    if normalization == "psd":
        return out * 0.5 * wsum
    raise ValueError(normalization)


def extirpolate_np(x, y, N, M=4):
    """Press & Rybicki extirpolation, numpy reference."""
    x, y = np.ravel(x), np.ravel(y)
    result = np.zeros(N, dtype=y.dtype)
    integers = (x % 1 == 0)
    np.add.at(result, x[integers].astype(int), y[integers])
    x, y = x[~integers], y[~integers]
    ilo = np.clip((x - M // 2).astype(int), 0, N - M)
    numerator = y * np.prod(x - ilo - np.arange(M)[:, np.newaxis], axis=0)
    denominator = float(np.math.factorial(M - 1)) if hasattr(np, "math") \
        else float(__import__("math").factorial(M - 1))
    for j in range(M):
        if j > 0:
            denominator *= j / (j - M)
        ind = ilo + (M - 1 - j)
        np.add.at(result, ind, numerator / (denominator * (x - ind)))
    return result


def trig_sum_np(t, h, df, N, f0=0.0, freq_factor=1, oversampling=5, Mfft=4):
    """FFT-based trig sum, numpy reference (Press & Rybicki 1989)."""
    df = df * freq_factor
    f0 = f0 * freq_factor
    Nfft = 1 << int(N * oversampling - 1).bit_length()
    t0 = t.min()
    if f0 > 0:
        h = h * np.exp(2j * np.pi * f0 * (t - t0))
    tnorm = ((t - t0) * Nfft * df) % Nfft
    grid = extirpolate_np(tnorm, h.astype(complex), Nfft, Mfft)
    fftgrid = np.fft.ifft(grid)[:N]
    if t0 != 0:
        f = f0 + df * np.arange(N)
        fftgrid = fftgrid * np.exp(2j * np.pi * t0 * f)
    return Nfft * fftgrid.imag, Nfft * fftgrid.real   # S, C


def ls_fast(t, y, f0, df, Nf, dy=None, normalization="standard",
            fit_mean=True, center_data=True, oversampling=5, Mfft=4):
    """Press-Rybicki fast LS, numpy reference."""
    if dy is None:
        dy = np.ones_like(t)
    w = dy ** -2.0
    ws = np.sum(w)
    if center_data or fit_mean:
        y = y - np.dot(w, y) / ws
    Sh, Ch = trig_sum_np(t, w * y, df, Nf, f0, 1, oversampling, Mfft)
    S2, C2 = trig_sum_np(t, w, df, Nf, f0, 2, oversampling, Mfft)
    if fit_mean:
        S, C = trig_sum_np(t, w, df, Nf, f0, 1, oversampling, Mfft)
        tan2 = (S2 - 2 * S * C / ws) / (C2 - (C * C - S * S) / ws)
    else:
        tan2 = S2 / C2
    C2w = 1 / np.sqrt(1 + tan2 ** 2)
    S2w = tan2 * C2w
    Cw = np.sqrt(0.5) * np.sqrt(1 + C2w)
    Sw = np.sqrt(0.5) * np.sign(S2w) * np.sqrt(1 - C2w)
    YY = np.dot(w, y ** 2)
    YC = Ch * Cw + Sh * Sw
    YS = Sh * Cw - Ch * Sw
    CC = 0.5 * (ws + C2 * C2w + S2 * S2w)
    SS = 0.5 * (ws - C2 * C2w - S2 * S2w)
    if fit_mean:
        CC -= (C * Cw + S * Sw) ** 2 / ws
        SS -= (S * Cw - C * Sw) ** 2 / ws
    power = YC ** 2 / CC + YS ** 2 / SS
    if normalization == "standard":
        return power / YY
    if normalization == "psd":
        return power * 0.5
    raise ValueError(normalization)


# ---------------------------------------------------------------------------
# BLS (definitional, Kovács et al. 2002 objective)
# ---------------------------------------------------------------------------
def bls_point(t, y, w, period, duration, t0_abs):
    """Exact box stats at one (period, duration, mid-transit time)."""
    hp = 0.5 * period
    m = np.abs(np.mod(t - t0_abs + hp, period) - hp) < 0.5 * duration
    w_in, w_out = w[m].sum(), w[~m].sum()
    y_in = (w[m] * y[m]).sum() / w_in
    y_out = (w[~m] * y[~m]).sum() / w_out
    depth = y_out - y_in
    return dict(depth=depth, depth_err=np.sqrt(1 / w_in + 1 / w_out),
                loglike=0.5 * w_in * depth ** 2,
                snr=depth / np.sqrt(1 / w_in + 1 / w_out))


def bls_slow(t, y, w, periods, durations, d_phase, use_likelihood=True):
    """Exhaustive scan over the shared t0 grid (spacing d_phase)."""
    tmin = t.min()
    out = {k: np.zeros(len(periods)) for k in
           ("power", "depth", "depth_err", "depth_snr", "log_likelihood",
            "duration", "transit_time")}
    t0_all = np.arange(int(np.ceil(periods.max() / d_phase)) + 1) * d_phase
    for ip, p in enumerate(periods):
        best = -np.inf
        for d in durations:
            for t0 in t0_all[t0_all < p]:
                s = bls_point(t, y, w, p, d, tmin + t0)
                obj = s["loglike"] if use_likelihood else s["snr"]
                if obj > best:
                    best = obj
                    out["power"][ip] = obj
                    out["depth"][ip] = s["depth"]
                    out["depth_err"][ip] = s["depth_err"]
                    out["depth_snr"][ip] = s["snr"]
                    out["log_likelihood"][ip] = s["loglike"]
                    out["duration"][ip] = d
                    out["transit_time"][ip] = tmin + t0
    return out


# ---------------------------------------------------------------------------
# Binned BLS (the astropy Cython kernel's algorithm family).
#
# The reference's hot loop is astropy's compiled ``bls.power``
# (``/root/reference/src/lightkurve/periodogram.py:1169``).  astropy is not
# installed in this environment and its ``_impl.pyx`` source is not on
# disk, so this oracle is an INDEPENDENT numpy reimplementation of the
# binned algorithm, written with plain per-period python loops (deliberately
# unlike the JAX kernels' prefix-sum/matmul formulation) so the two cannot
# share a structural bug.  Conventions (documented in docs/parity.md):
#
#   bin width    = min(durations) / oversample
#   duration     = round(d / bin) bins (>= 1)
#   fold         = int((t - t_min) mod period / bin); per-period bin count
#                  nbins_p = ceil(period / bin)
#   windows      = every start bin b < nbins_p; "wrap=True" closes windows
#                  circularly past the period edge (the TPU kernels'
#                  default); "wrap=False" lets edge windows read empty bins
#                  (truncated windows — the astropy kernel's convention,
#                  reconstructed: its fold pads the histogram with
#                  `oversample` empty bins rather than wrapping)
#   y_in/y_out   = weighted means in/out; depth = y_out - y_in
#   objective    = 0.5 * w_in * depth^2 ("likelihood") or
#                  depth / sqrt(1/w_in + 1/w_out) ("snr")
#   transit_time = t_min + ((b + 0.5*k) * bin  mod period)
# ---------------------------------------------------------------------------
def bls_binned_reference(t, y, dy, periods, durations, oversample=10,
                         use_likelihood=True, wrap=True):
    t = np.asarray(t, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    if dy is None:
        w = np.ones_like(y)
    else:
        w = 1.0 / np.square(np.asarray(dy, dtype=np.float64))
    periods = np.asarray(periods, dtype=np.float64)
    durations = np.asarray(durations, dtype=np.float64)
    bin_d = durations.min() / oversample
    k_durs = np.maximum(np.round(durations / bin_d).astype(int), 1)
    t_min = t.min()
    ts = t - t_min
    sum_w = w.sum()
    sum_wy = (w * y).sum()

    out = {k: np.zeros(len(periods)) for k in
           ("power", "depth", "depth_err", "depth_snr", "log_likelihood",
            "duration", "transit_time")}
    for ip, p in enumerate(periods):
        nbins_p = int(np.ceil(p / bin_d))
        ind = np.minimum((np.mod(ts, p) / bin_d).astype(int), nbins_p - 1)
        k_max = int(k_durs.max())
        hw = np.bincount(ind, weights=w, minlength=nbins_p + k_max)
        hwy = np.bincount(ind, weights=w * y, minlength=nbins_p + k_max)
        if wrap:
            hw[nbins_p:nbins_p + k_max - 1] += hw[:k_max - 1]
            hwy[nbins_p:nbins_p + k_max - 1] += hwy[:k_max - 1]
        cw = np.concatenate([[0.0], np.cumsum(hw)])
        cwy = np.concatenate([[0.0], np.cumsum(hwy)])

        best = -np.inf
        b_all = np.arange(nbins_p)
        for k, dur in zip(k_durs, durations):
            if k > nbins_p:
                continue
            w_in = cw[b_all + k] - cw[b_all]
            wy_in = cwy[b_all + k] - cwy[b_all]
            w_out = sum_w - w_in
            wy_out = sum_wy - wy_in
            ok = (w_in > 0) & (w_out > 0)
            if not ok.any():
                continue
            y_in = np.where(ok, wy_in / np.where(ok, w_in, 1.0), 0.0)
            y_out = np.where(ok, wy_out / np.where(ok, w_out, 1.0), 0.0)
            depth = y_out - y_in
            if use_likelihood:
                obj = 0.5 * w_in * depth * depth
            else:
                obj = depth / np.sqrt(1.0 / np.where(ok, w_in, 1.0)
                                      + 1.0 / np.where(ok, w_out, 1.0))
            obj = np.where(ok, obj, -np.inf)
            b = int(np.argmax(obj))
            if obj[b] > best:
                best = obj[b]
                d_err = np.sqrt(1.0 / w_in[b] + 1.0 / w_out[b])
                t0 = np.mod((b + 0.5 * k) * bin_d, p)
                out["power"][ip] = obj[b]
                out["depth"][ip] = depth[b]
                out["depth_err"][ip] = d_err
                out["depth_snr"][ip] = depth[b] / d_err
                out["log_likelihood"][ip] = 0.5 * w_in[b] * depth[b] ** 2
                out["duration"][ip] = dur
                out["transit_time"][ip] = t_min + t0
    return out


# ---------------------------------------------------------------------------
# flatten (reference lightcurve.py:943-1078 semantics)
# ---------------------------------------------------------------------------
def flatten_np(time, flux, window_length=101, polyorder=2,
               break_tolerance=5, niters=3, sigma=3, mask=None):
    """Reference-style flatten: returns (trend_over_all_times, final_mask)."""
    time = np.asarray(time, dtype=float)
    flux = np.asarray(flux, dtype=float)
    if mask is None:
        m = np.ones(len(time), dtype=bool)
    else:
        m = ~np.asarray(mask, dtype=bool)
    extra = np.isfinite(flux)
    extra &= np.nan_to_num(np.abs(flux - np.nanmedian(flux))) <= (
        np.nanstd(flux) * sigma)
    m &= extra
    bt = np.nan if break_tolerance is None else break_tolerance
    trend_signal = None
    for _ in range(niters):
        tm = time[m]
        fm = flux[m]
        dt = tm[1:] - tm[:-1]
        with np.errstate(invalid="ignore"):
            cut = np.where(dt > bt * np.nanmedian(dt))[0] + 1
        low = np.append([0], cut)
        high = np.append(cut, len(tm))
        trend = np.zeros(len(tm))
        for lo, hi in zip(low, high):
            if np.any([window_length > (hi - lo), (hi - lo) < bt]):
                trend[lo:hi] = np.nanmedian(fm[lo:hi])
            else:
                trend[lo:hi] = savgol_filter(fm[lo:hi], window_length,
                                             polyorder)
        mask1 = np.nan_to_num(np.abs(fm - trend)) < (
            np.nanstd(fm - trend) * sigma + 1e-14)
        f = interp1d(tm[mask1], trend[mask1], fill_value="extrapolate")
        trend_signal = f(time)
        new_m = np.zeros_like(m)
        new_m[np.where(m)[0][mask1]] = True
        m = new_m
    return trend_signal, m
