"""StreamingStackLoader: double-buffered file→device pipeline.

Reference behavior being superseded: the reference reads files one at a
time on the calling thread (``io/read.py``); here batches of files stream
through a background parser into fixed-shape device stacks.
"""
import numpy as np
import pytest

import lightkurve_tpu as lk
from lightkurve_tpu.io.pipeline import StreamingStackLoader, \
    assemble_host_stack


@pytest.fixture
def fits_dir(tmp_path):
    rng = np.random.default_rng(7)
    paths = []
    for i in range(10):
        n = 90 + 3 * i                       # ragged lengths
        t = np.arange(n) * 0.02
        f = 1.0 + 1e-3 * rng.standard_normal(n)
        f[5] = np.nan
        lc = lk.LightCurve(time=t, flux=f, flux_err=np.full(n, 1e-3))
        p = tmp_path / f"lc{i:02d}.fits"
        lc.to_fits(path=str(p), overwrite=True, flux_column_name="PDCSAP_FLUX")
        paths.append(str(p))
    return paths


def test_assemble_host_stack_padding():
    t = np.array([[0.0, 1.0, 2.0]])
    f = np.array([[1.0, np.nan, 3.0]])
    tt, ff, fe, m = assemble_host_stack(t, f, None, length=8)
    assert tt.shape == (1, 8)
    assert m.tolist() == [[True, False, True] + [False] * 5]
    assert np.all(np.diff(tt[0]) > 0)        # kernel-safe monotonic times
    assert np.all(np.isfinite(ff)) and np.all(fe > 0)


def test_assemble_host_stack_finite_times_untouched():
    """Rows whose TIME column is fully finite skip the repair loop — the
    real times survive bit-exactly even when every flux is invalid (the
    old per-row path fabricated times wherever flux was NaN)."""
    t = np.arange(16.0)[None, :] * 0.02 + 100.0
    f = np.full((1, 16), np.nan)
    tt, ff, fe, m = assemble_host_stack(t.copy(), f, None, length=16)
    np.testing.assert_array_equal(tt[0], t[0])
    assert not m.any()                       # no valid samples
    assert np.all(np.isfinite(tt[0])) and np.all(np.diff(tt[0]) > 0)
    assert np.all(ff == 0.0) and np.all(fe == 1.0)


def test_streaming_batches(fits_dir):
    loader = StreamingStackLoader(fits_dir, batch_size=4, prefetch=2)
    assert len(loader) == 3
    stacks = list(loader)
    assert len(stacks) == 3
    # every batch shares ONE static shape → a jitted consumer compiles once
    shapes = {tuple(s.shape) for s in stacks}
    assert shapes == {(4, 128)}              # bitceil(117) = 128
    # final batch: 2 real + 2 repeated-padding rows
    assert sum("PADDING" in m for m in stacks[-1].meta) == 2
    # data round-trips against the direct single-file reader
    from lightkurve_tpu.io.fits import open_fits
    d0 = open_fits(fits_dir[0])[1].data
    want = np.asarray(d0["PDCSAP_FLUX"], dtype=float)
    got = np.asarray(stacks[0].flux)[0, :len(want)]
    np.testing.assert_allclose(got, np.nan_to_num(want), rtol=1e-6)
    mask0 = np.asarray(stacks[0].mask)[0]
    assert mask0.sum() == np.isfinite(want).sum()


def test_streaming_map_and_early_exit(fits_dir):
    loader = StreamingStackLoader(fits_dir, batch_size=4)
    meds = loader.map(
        lambda s: (s.flux * s.mask).sum() / s.mask.sum())
    assert len(meds) == 3
    assert all(abs(float(m) - 1.0) < 0.1 for m in meds)
    # abandoning the iterator must not wedge the worker thread
    it = iter(StreamingStackLoader(fits_dir, batch_size=2, prefetch=1))
    next(it)
    it.close()


def test_streaming_bls_consumer(fits_dir):
    """End-to-end: streamed stacks feed the shared-batch BLS kernel."""
    loader = StreamingStackLoader(fits_dir, batch_size=5)
    periods = np.linspace(0.3, 0.6, 16)
    durations = np.array([0.05, 0.1])
    outs = [s.bls_search(periods, durations) for s in loader]
    assert len(outs) == 2
    for out in outs:
        assert np.asarray(out["power"]).shape == (5, 16)
        assert np.all(np.isfinite(np.asarray(out["power"])))


def test_streaming_shared_grid_staging(tmp_path):
    """A sector batch whose files share ONE time grid and a constant
    flux_err column must stage bit-identically to the general path.

    The loader detects row-identical columns and ships one row (or one
    scalar) over the host->device link, broadcasting on device — worth
    ~33 MB/batch through the remote tunnel.  Equality of the RESULT with
    the per-row staging is the contract."""
    rng = np.random.default_rng(3)
    t = np.arange(64) * 0.02 + 10.0
    paths = []
    for i in range(4):
        f = 1.0 + 1e-3 * rng.standard_normal(64)
        lc = lk.LightCurve(time=t, flux=f,
                           flux_err=np.full(64, 2.5e-4))
        p = tmp_path / f"shared{i}.fits"
        lc.to_fits(path=str(p), overwrite=True,
                   flux_column_name="PDCSAP_FLUX")
        paths.append(str(p))
    loader = StreamingStackLoader(paths, batch_size=4, prefetch=1)
    (stack,) = list(loader)
    tt = np.asarray(stack.time)
    fe = np.asarray(stack.flux_err)
    mk = np.asarray(stack.mask)
    # every row identical (shared grid / constant err / all-valid mask);
    # the FITS column is float32, so compare to the f32 rounding
    assert (tt == tt[0]).all() and mk.all()
    assert (fe == np.float32(2.5e-4)).all()
    np.testing.assert_allclose(tt[0, :64], t, rtol=0, atol=1e-7)
    # flux stays per-row (NOT deduped)
    fl = np.asarray(stack.flux)
    assert not (fl[1:] == fl[0]).all()


def test_streaming_assembles_in_device_dtype(fits_dir):
    """The worker assembles in the requested device dtype (float32 on a
    float32 device) so device_put pays no conversion pass; values match
    a float64 assembly rounded to float32."""
    import jax.numpy as jnp
    loader = StreamingStackLoader(fits_dir, batch_size=4, prefetch=1,
                                  dtype=jnp.float32)
    stack = next(iter(loader))
    assert stack.flux.dtype == jnp.float32
    assert stack.time.dtype == jnp.float32
    from lightkurve_tpu.io.fits import open_fits
    d0 = open_fits(fits_dir[0])[1].data
    want = np.nan_to_num(np.asarray(d0["PDCSAP_FLUX"], dtype=np.float64))
    got = np.asarray(stack.flux)[0, :len(want)]
    np.testing.assert_array_equal(got, want.astype(np.float32))
