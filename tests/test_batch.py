"""Batched multi-target pipeline tests (TPU-native layer; no reference
analogue — the CPU 8-device mesh stands in for the missing cluster tier,
SURVEY.md §4 implication (c))."""
import numpy as np
import pytest

import jax

from lightkurve_tpu import LightCurve
from lightkurve_tpu.batch import LightCurveStack, TPFStack
from lightkurve_tpu.collections import LightCurveCollection
from lightkurve_tpu.parallel import make_mesh, sharded_bls, \
    sharded_lombscargle, best_candidates
from synthetic import make_synthetic_tpf, transit_signal


def make_collection(rng, B=3, n=600):
    lcs = []
    t = np.arange(n) * 0.02
    for i in range(B):
        period = 2.0 + i
        y = 1.0 + 0.004 * np.sin(2 * np.pi * t / period) \
            + 0.001 * rng.standard_normal(n)
        lcs.append(LightCurve(time=t, flux=y, flux_err=np.full(n, 0.001),
                              meta={"TARGETID": i}))
    return LightCurveCollection(lcs)


def test_stack_roundtrip(rng):
    coll = make_collection(rng)
    stack = coll.to_stack()
    assert stack.shape == (3, 1024)       # padded to pow2
    assert np.asarray(stack.mask.sum(axis=1)).tolist() == [600] * 3
    lc0 = stack[0]
    np.testing.assert_allclose(lc0.flux.value,
                               coll[0].normalize().flux.value
                               if False else coll[0].flux.value, rtol=1e-12)
    assert len(lc0) == 600


def test_stack_variable_lengths(rng):
    t1 = np.arange(100) * 0.02
    t2 = np.arange(250) * 0.02
    lcs = LightCurveCollection([
        LightCurve(time=t1, flux=np.ones(100)),
        LightCurve(time=t2, flux=np.ones(250))])
    stack = lcs.to_stack()
    assert stack.shape == (2, 256)
    assert int(stack.mask[0].sum()) == 100
    assert int(stack.mask[1].sum()) == 250


def test_batched_flatten_matches_single(rng):
    coll = make_collection(rng, B=2)
    stack = coll.to_stack()
    flat = stack.flatten(window_length=101)
    single = coll[0].flatten(window_length=101)
    got = flat[0].flux.value
    np.testing.assert_allclose(got, single.flux.value, rtol=1e-7)


def test_batched_ls_periodogram(rng):
    coll = make_collection(rng, B=3)
    stack = coll.to_stack().normalize()
    freqs, power = stack.to_periodogram(oversample_factor=3)
    assert power.shape == (3, len(freqs))
    for i, period in enumerate([2.0, 3.0, 4.0]):
        peak = 1.0 / freqs[np.argmax(power[i])]
        assert abs(peak - period) / period < 0.1


def test_batched_bls_matches_single(rng):
    n = 400
    t = np.arange(n) * 0.02
    y = np.ones(n)
    ph = np.mod(t - 0.5 + 1.15, 2.3) - 1.15
    y[np.abs(ph) < 0.06] -= 0.01
    lc = LightCurve(time=t, flux=y, flux_err=np.full(n, 0.001))
    stack = LightCurveCollection([lc, lc]).to_stack(pad_to_pow2=False)
    periods = np.linspace(1.8, 2.8, 40)
    durations = np.array([0.1, 0.15])
    # auto-detected shared time grid → MXU matmul kernel
    out = stack.bls_search(periods, durations, oversample=5)
    power = np.asarray(out["power"])
    assert power.shape == (2, 40)
    np.testing.assert_allclose(power[0], power[1], rtol=1e-10)
    import jax.numpy as jnp
    from lightkurve_tpu.ops.bls import bls_power, bls_power_shared_batch
    shared = bls_power_shared_batch(
        jnp.asarray(t), jnp.asarray(np.stack([y, y])),
        jnp.asarray(np.full((2, n), 0.001)), jnp.asarray(periods),
        jnp.asarray(durations), oversample=5)
    np.testing.assert_allclose(power, np.asarray(shared["power"]),
                               rtol=1e-8)
    # method='exact' routes through the sorted-phase kernel
    out_exact = stack.bls_search(periods, durations, oversample=5,
                                 method="exact")
    single = bls_power(jnp.asarray(t), jnp.asarray(y),
                       jnp.asarray(np.full(n, 0.001)),
                       jnp.asarray(periods), jnp.asarray(durations),
                       oversample=5)
    np.testing.assert_allclose(np.asarray(out_exact["power"])[0],
                               np.asarray(single["power"]), rtol=1e-6)
    # both kernels agree on the peak
    assert np.argmax(power[0]) == np.argmax(np.asarray(single["power"]))
    best_p, best_pow = best_candidates(power, periods, k=1)
    assert abs(best_p[0, 0] - 2.3) < 0.1


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sharded_bls_matches_unsharded(rng):
    import jax.numpy as jnp
    from lightkurve_tpu.ops.bls import bls_power
    n, B = 300, 3     # deliberately NOT divisible by mesh axes
    t = np.arange(n) * 0.02
    flux = np.ones((B, n)) + 0.001 * rng.standard_normal((B, n))
    ph = np.mod(t - 0.5 + 1.0, 2.0) - 1.0
    flux[:, np.abs(ph) < 0.05] -= 0.01
    dy = np.full((B, n), 0.001)
    periods = np.linspace(1.5, 2.5, 37)   # not divisible by 4 either
    durations = np.array([0.1])
    mesh = make_mesh(n_targets_axis=2, n_grid_axis=4)
    out = sharded_bls(jnp.asarray(np.broadcast_to(t, (B, n))),
                      jnp.asarray(flux), jnp.asarray(dy),
                      jnp.asarray(periods), jnp.asarray(durations),
                      oversample=5, mesh=mesh, chunk=8)
    assert np.asarray(out["power"]).shape == (B, 37)
    # shared grids engage the MXU shared-batch kernel even though B is
    # not a multiple of the targets axis (padding repeats a real time
    # row; the old constant-padding broke detection and silently fell
    # back to the slow exact path — the review-fixed regression)
    from lightkurve_tpu.ops.bls import bls_power_shared_batch
    ref_shared = bls_power_shared_batch(
        jnp.asarray(t), jnp.asarray(flux), np.asarray(dy),
        jnp.asarray(periods), jnp.asarray(durations), oversample=5,
        chunk=8)
    np.testing.assert_allclose(np.asarray(out["power"]),
                               np.asarray(ref_shared["power"]), rtol=1e-6)

    # an explicit shared_time=False pins the exact-kernel path instead
    out_exact = sharded_bls(jnp.asarray(np.broadcast_to(t, (B, n))),
                            jnp.asarray(flux), jnp.asarray(dy),
                            jnp.asarray(periods), jnp.asarray(durations),
                            oversample=5, mesh=mesh, chunk=8,
                            shared_time=False)
    ref = bls_power(jnp.asarray(t), jnp.asarray(flux[0]),
                    jnp.asarray(dy[0]), jnp.asarray(periods),
                    jnp.asarray(durations), oversample=5)
    np.testing.assert_allclose(np.asarray(out_exact["power"])[0],
                               np.asarray(ref["power"]), rtol=1e-6)
    # both kernels recover the injected 2-day signal
    for o in (out, out_exact):
        ib = int(np.argmax(np.asarray(o["power"])[0]))
        assert abs(periods[ib] - 2.0) < 0.1


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sharded_lombscargle(rng):
    import jax.numpy as jnp
    n, B = 500, 5
    t = np.arange(n) * 0.02
    flux = 1.0 + 0.01 * np.sin(2 * np.pi * t[None, :] / 2.5) \
        + 0.001 * rng.standard_normal((B, n))
    dy = np.full((B, n), 0.001)
    power = sharded_lombscargle(t, jnp.asarray(flux), jnp.asarray(dy),
                                0.05, 0.01, 200)
    assert np.asarray(power).shape == (B, 200)
    from lightkurve_tpu.ops.lombscargle import lombscargle_fast
    ref = lombscargle_fast(t, jnp.asarray(flux[0]), 0.05, 0.01, 200,
                           dy=jnp.asarray(dy[0]), normalization="psd")
    np.testing.assert_allclose(np.asarray(power)[0], np.asarray(ref),
                               rtol=1e-8)


def test_tpf_stack_photometry(rng):
    tpfs = [make_synthetic_tpf(n_cadences=50, seed=s) for s in range(3)]
    from lightkurve_tpu.collections import TargetPixelFileCollection
    coll = TargetPixelFileCollection(tpfs)
    stack = coll.to_stack(aperture_mask="pipeline")
    assert len(stack) == 3
    lcs = stack.extract_aperture_photometry()
    assert lcs.shape == (3, 50)
    # matches the single-TPF path
    single = tpfs[0].extract_aperture_photometry(aperture_mask="pipeline")
    np.testing.assert_allclose(np.asarray(lcs.flux[0]),
                               single.flux.value, rtol=1e-5)


def test_batched_cdpp(rng):
    coll = make_collection(rng, B=2)
    stack = coll.to_stack()
    cdpp = stack.estimate_cdpp_batch()
    assert cdpp.shape == (2,)
    single = float(coll[0].estimate_cdpp().value)
    # batched value in ppm should be in the same ballpark
    assert abs(cdpp[0] - single) / single < 0.35


def test_stitch(rng):
    coll = make_collection(rng, B=2)
    stitched = coll.stitch()
    assert len(stitched) == 1200
    assert abs(np.median(stitched.flux.value) - 1.0) < 0.01
    stitched2 = coll.stitch(corrector_func=None)
    assert len(stitched2) == 1200


def test_stack_from_files(tmp_path, rng):
    from tests.io.test_fits import make_tess_lc_file
    paths = []
    for i in range(4):
        p = str(tmp_path / f"lc{i}.fits")
        make_tess_lc_file(p, n=60 + i)
        paths.append(p)
    stack = LightCurveStack.from_files(paths)
    assert stack.shape == (4, 64)
    assert int(stack.mask[0].sum()) == 60
    # values match the single-file reader
    from lightkurve_tpu.io import read
    lc = read(paths[0], quality_bitmask="none")
    got = np.asarray(stack.flux[0])[np.asarray(stack.mask[0])]
    np.testing.assert_allclose(got, lc.flux.value, rtol=1e-6)


def test_bls_search_groups_mixed_time_grids():
    """A stack holding a few DISTINCT time grids (multi-sector) routes each
    grid group through the shared-batch kernel; results must match the
    all-shared and per-curve paths."""
    import jax.numpy as jnp
    import lightkurve_tpu as lk
    from lightkurve_tpu.batch import LightCurveStack

    rng = np.random.default_rng(9)
    n = 512
    grids = [np.arange(n) * 0.01, 2.0 + np.arange(n) * 0.012]
    lcs = []
    P_true = 0.8
    for i in range(6):
        t = grids[i % 2]
        ph = np.mod(t + P_true / 2, P_true) - P_true / 2
        f = 1.0 + 1e-4 * rng.standard_normal(n)
        f[np.abs(ph) < 0.02] -= 2e-3
        lcs.append(lk.LightCurve(time=t, flux=f,
                                 flux_err=np.full(n, 1e-4)))
    stack = LightCurveStack.from_collection(lk.LightCurveCollection(lcs),
                                            pad_to_pow2=False)
    periods = np.linspace(0.5, 1.2, 64)
    durs = np.array([0.03, 0.05])
    out = stack.bls_search(periods, durs)
    pw = np.asarray(out["power"])
    assert pw.shape == (6, 64)
    best = periods[np.argmax(pw, axis=1)]
    assert np.all(np.abs(best - P_true) < 0.03)
    # parity with a single-grid stack for the rows sharing grid 0
    sub = LightCurveStack.from_collection(
        lk.LightCurveCollection([lcs[0], lcs[2], lcs[4]]),
        pad_to_pow2=False)
    out0 = sub.bls_search(periods, durs, shared_time=True)
    np.testing.assert_allclose(pw[[0, 2, 4]], np.asarray(out0["power"]),
                               rtol=1e-6)


def test_ls_periodogram_mixed_time_grids():
    """Mixed-grid stacks run the batched LS per time-grid group on one
    shared frequency grid."""
    import lightkurve_tpu as lk
    from lightkurve_tpu.batch import LightCurveStack

    rng = np.random.default_rng(4)
    n = 1024
    grids = [np.arange(n) * 0.01, 3.0 + np.arange(n) * 0.011]
    lcs = []
    for i in range(4):
        t = grids[i % 2]
        f = 1.0 + 1e-3 * np.sin(2 * np.pi * t / 1.1) \
            + 1e-4 * rng.standard_normal(n)
        lcs.append(lk.LightCurve(time=t, flux=f,
                                 flux_err=np.full(n, 1e-4)))
    stack = LightCurveStack.from_collection(lk.LightCurveCollection(lcs),
                                            pad_to_pow2=False)
    freqs, power = stack.to_periodogram(normalization="standard",
                                        oversample_factor=5)
    best = 1.0 / freqs[np.argmax(power, axis=1)]
    assert np.all(np.abs(best - 1.1) / 1.1 < 0.02)
    # parity with the single-grid path for grid-0 rows
    sub = LightCurveStack.from_collection(
        lk.LightCurveCollection([lcs[0], lcs[2]]), pad_to_pow2=False)
    _, p0 = sub.to_periodogram(normalization="standard",
                               oversample_factor=5)
    np.testing.assert_allclose(power[[0, 2]], p0, rtol=1e-8)


def _synthetic_tpf_stack(rng, B=6, T=200, H=4, W=4):
    """Cubes with a bright pixel + a common-mode pointing systematic."""
    import jax.numpy as jnp
    from lightkurve_tpu.batch import TPFStack
    t = np.arange(T) * 0.02
    sys_trend = 1.0 + 0.02 * np.sin(2 * np.pi * t / 1.7)
    cube = rng.normal(1.0, 0.01, (B, T, H, W))
    # star PSF across a 2x2 core: every pixel scales with the pointing
    # systematic by a DIFFERENT factor, the lever PLD needs
    amps = np.array([[60.0, 35.0], [25.0, 15.0]])
    for di in range(2):
        for dj in range(2):
            cube[:, :, H // 2 + di - 1, W // 2 + dj - 1] += (
                amps[di, dj] * sys_trend[None, :] ** (1 + di + dj))
    ap = np.zeros((B, H, W), bool)
    ap[:, H // 2 - 1:H // 2 + 1, W // 2 - 1:W // 2 + 1] = True
    return TPFStack(flux=jnp.asarray(cube, jnp.float64),
                    flux_err=jnp.asarray(np.full(cube.shape, 0.05),
                                         jnp.float64),
                    time=jnp.asarray(np.broadcast_to(t, (B, T))),
                    aperture=jnp.asarray(ap))


def test_tpfstack_pld_correct_removes_systematic(rng):
    stack = _synthetic_tpf_stack(rng)
    raw = stack.extract_aperture_photometry()
    corr = stack.pld_correct(n_pca_terms=2)
    raw_std = np.std(np.asarray(raw.flux), axis=1)
    corr_std = np.std(np.asarray(corr.flux), axis=1)
    assert (corr_std < 0.35 * raw_std).all(), (raw_std, corr_std)
    # order-2 variant also runs and does no worse
    corr2 = stack.pld_correct(pld_order=2, n_pca_terms=2)
    assert (np.std(np.asarray(corr2.flux), axis=1)
            < 0.5 * raw_std).all()


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sharded_pld_photometry_matches_unsharded(rng):
    from lightkurve_tpu.parallel.grid import sharded_pld_photometry
    stack = _synthetic_tpf_stack(rng, B=6)   # not divisible by 8
    ref = stack.pld_correct(n_pca_terms=2)
    f, e, m = sharded_pld_photometry(stack, n_pca_terms=2)
    assert f.shape == ref.flux.shape
    np.testing.assert_allclose(np.asarray(f), np.asarray(ref.flux),
                               rtol=1e-8)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sharded_flatten_matches_unsharded(rng):
    import jax.numpy as jnp
    from lightkurve_tpu.batch import LightCurveStack
    from lightkurve_tpu.parallel.grid import sharded_flatten
    B, N = 6, 400   # B not divisible by 8
    t = np.arange(N) * 0.02
    flux = (1.0 + 0.05 * np.sin(2 * np.pi * t / 3.0)[None, :]
            + 1e-4 * rng.standard_normal((B, N)))
    stack = LightCurveStack(
        time=jnp.asarray(np.broadcast_to(t, (B, N))),
        flux=jnp.asarray(flux),
        flux_err=jnp.full((B, N), 1e-4),
        mask=jnp.ones((B, N), bool))
    _, ref_trend = stack.flatten(window_length=101, return_trend=True)
    trend, valid = sharded_flatten(stack.time, stack.flux, stack.mask,
                                   window_length=101)
    np.testing.assert_allclose(np.asarray(trend),
                               np.asarray(ref_trend.flux), rtol=1e-10)


def test_tpfstack_pld_with_nan_pixels(rng):
    """NaN pixels in the cube must not poison the batched PLD regressors
    (review finding: NaN * mask-0 is still NaN)."""
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from synthetic import make_synthetic_tpf, sawtooth_motion
    from lightkurve_tpu.batch import TPFStack
    tpfs = [make_synthetic_tpf(n_cadences=80, shape=(5, 5), mission="K2",
                               motion=sawtooth_motion(), seed=s)
            for s in (0, 1)]
    for tpf in tpfs:
        cube = np.asarray(tpf.flux.value).copy()
        cube[:, 0, 0] = np.nan          # dead pixel
        tpf.flux = cube
    stack = TPFStack.from_collection(tpfs)
    corrected = stack.pld_correct(n_pca_terms=3)
    flux = np.asarray(corrected.flux)
    mask = np.asarray(corrected.mask)
    assert np.isfinite(flux[mask]).all()


def test_bls_search_explicit_shared_time_false(rng):
    """An explicit shared_time=False must take the exact per-curve
    kernel even when rows share grids (review finding: the grouped
    binned kernel silently overrode the opt-out)."""
    import jax.numpy as jnp
    from lightkurve_tpu.batch import LightCurveStack
    n = 256
    t = np.arange(n) * 0.02
    flux = 1 + 0.001 * rng.standard_normal((3, n))
    stack = LightCurveStack(
        time=jnp.broadcast_to(jnp.asarray(t), (3, n)),
        flux=jnp.asarray(flux),
        flux_err=jnp.full((3, n), 1e-3),
        mask=jnp.ones((3, n), bool))
    periods = np.linspace(0.8, 1.6, 16)
    durations = np.array([0.1])
    out_false = stack.bls_search(periods, durations, shared_time=False)
    out_auto = stack.bls_search(periods, durations)
    # the exact kernel evaluates un-binned windows: both recover a
    # result dict of the same shape, computed via different kernels
    assert np.asarray(out_false["power"]).shape == \
        np.asarray(out_auto["power"]).shape
