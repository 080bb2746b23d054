"""Native C++ FITS loader vs the pure-Python reader."""
import numpy as np
import pytest

from lightkurve_tpu.io import native
from tests.io.test_fits import make_tess_lc_file

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="no C++ toolchain")


def test_read_column_matches_python(tmp_path):
    path = str(tmp_path / "lc.fits")
    make_tess_lc_file(path, n=77)
    from lightkurve_tpu.io.fits import open_fits
    hdul = open_fits(path)
    want_t = np.asarray(hdul["LIGHTCURVE"].data["TIME"])
    want_f = np.asarray(hdul["LIGHTCURVE"].data["PDCSAP_FLUX"])
    assert native.table_rows(path) == 77
    got_t = native.read_column(path, "TIME")
    got_f = native.read_column(path, "PDCSAP_FLUX")
    np.testing.assert_allclose(got_t, want_t, rtol=0, atol=0)
    np.testing.assert_allclose(got_f, want_f.astype(np.float64), rtol=1e-7)
    # int and named-extension access
    got_q = native.read_column(path, "QUALITY", extname="LIGHTCURVE")
    np.testing.assert_array_equal(got_q,
                                  np.asarray(hdul[1].data["QUALITY"]))
    with pytest.raises(IOError, match="column not found"):
        native.read_column(path, "NOPE")


def test_read_batch_parallel(tmp_path):
    paths = []
    for i in range(6):
        p = str(tmp_path / f"lc{i}.fits")
        make_tess_lc_file(p, n=50 + i)
        paths.append(p)
    out, nrows = native.read_batch(paths, "TIME", nthreads=4)
    assert out.shape == (6, 55)
    assert nrows.tolist() == [50, 51, 52, 53, 54, 55]
    # NaN padding past each file's rows
    assert np.isnan(out[0, 50:]).all()
    from lightkurve_tpu.io.fits import open_fits
    want = np.asarray(open_fits(paths[2])[1].data["TIME"])
    np.testing.assert_allclose(out[2, :52], want)


def test_corrupt_file_error(tmp_path):
    p = str(tmp_path / "bad.fits")
    with open(p, "wb") as f:
        f.write(b"garbage" * 500)
    with pytest.raises(IOError):
        native.read_column(p, "TIME", max_rows=10)
