"""North-star runner batching: RUN_BATCH (curves per device sweep) is
decoupled from the sector generator's fixed 512-file batches.

The device rate of the shared BLS kernel scales with batch size (the
per-chunk one-hot fold matrix is generated once and reused by every
batch row), so the runner sweeps RUN_BATCH-curve stacks assembled from
consecutive generator batches.  Truth bookkeeping must stay aligned:
runner batch ``ib`` holds generator batches ``ib*R .. (ib+1)*R-1``.
"""
import numpy as np
import pytest

from tools import make_sector
from tools import northstar_run as ns


@pytest.fixture
def small_sector(monkeypatch):
    """Shrink the sector geometry so batches build in milliseconds."""
    monkeypatch.setattr(make_sector, "N", 128)
    monkeypatch.setattr(make_sector, "BATCH", 4)
    monkeypatch.setattr(ns, "N", 128)
    monkeypatch.setattr(ns, "BATCH", 4)
    monkeypatch.setattr(ns, "RUN_BATCH", 8)


def test_synthetic_iter_concatenates_generator_batches(small_sector):
    ib, stack = next(iter(ns._stack_iter("synthetic", 0, 1, None)))
    assert ib == 0
    assert stack.flux.shape == (8, 128)
    t = make_sector.time_grid()
    f1, _ = make_sector.batch_flux(1, t)
    np.testing.assert_allclose(np.asarray(stack.flux[4:], np.float64),
                               f1, rtol=0, atol=1e-7)


def test_truth_concat_matches_flux_rows(small_sector):
    # the recovery check compares runner-batch rows against the
    # concatenated generator truths — row g*BATCH+i must carry truth
    # (g, i)
    R = ns.RUN_BATCH // ns.BATCH
    p = np.concatenate([make_sector.batch_truth(g)[0] for g in range(R)])
    t = make_sector.time_grid()
    for g in range(R):
        pg, t0g = make_sector.batch_truth(g)
        np.testing.assert_array_equal(p[g * 4:(g + 1) * 4], pg)
        # truth really matches generation (same rng stream)
        fg, pg2 = make_sector.batch_flux(g, t)
        np.testing.assert_array_equal(pg, pg2)


def test_fits_iter_respects_run_batch(small_sector, tmp_path):
    ib, stack = next(iter(
        ns._stack_iter("fits", 0, 1, str(tmp_path / "sector"))))
    assert ib == 0
    assert stack.flux.shape == (8, 128)
    t = make_sector.time_grid()
    f0, _ = make_sector.batch_flux(0, t)
    f1, _ = make_sector.batch_flux(1, t)
    want = np.concatenate([f0, f1]).astype(np.float32)
    np.testing.assert_allclose(np.asarray(stack.flux), want,
                               rtol=0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(stack.time[3]), t, rtol=0,
                               atol=1e-6)
    assert bool(np.asarray(stack.mask).all())


def test_run_batch_must_divide_generator_batch():
    # module-load guard: LK_NS_BATCH must be a multiple of BATCH; the
    # in-process equivalent is checked here against the live constants
    assert ns.RUN_BATCH % ns.BATCH == 0
