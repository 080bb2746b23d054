"""Per-product light-curve readers.

Re-implements the 12 product readers of the reference's ``io/`` package
(``io/kepler.py``, ``tess.py``, ``qlp.py``, ``k2sff.py``, ``everest.py``,
``cdips.py``, ``pathos.py``, ``tasoc.py``, ``kepseismic.py``, ``tglc.py``,
``eleanor.py``, ``k2sc.py``, ``folded.py``) — each applies its product's
default flux column, time format, and quality-bitmask filtering on top of
:func:`read_generic_lightcurve`.
"""
from __future__ import annotations

import numpy as np

from ..lightcurve import KeplerLightCurve, LightCurve, TessLightCurve, \
    FoldedLightCurve
from ..utils import KeplerQualityFlags, TessQualityFlags
from .generic import read_generic_lightcurve

__all__ = [
    "read_kepler_lightcurve", "read_tess_lightcurve", "read_qlp_lightcurve",
    "read_k2sff_lightcurve", "read_everest_lightcurve",
    "read_cdips_lightcurve", "read_pathos_lightcurve",
    "read_tasoc_lightcurve", "read_kepseismic_lightcurve",
    "read_tglc_lightcurve", "read_eleanor_lightcurve",
    "read_k2sc_lightcurve", "read_folded_lightcurve",
]


def _apply_quality(lc, flags_cls, quality_bitmask, column="quality"):
    if column not in lc._cols:
        lc[column] = np.zeros(len(lc), dtype=int)
    mask = flags_cls.create_quality_mask(
        quality_array=np.asarray(lc[column]), bitmask=quality_bitmask)
    lc = lc[mask]
    lc.meta["QUALITY_BITMASK"] = quality_bitmask
    lc.meta["QUALITY_MASK"] = mask
    return lc


def read_kepler_lightcurve(filename, flux_column="pdcsap_flux",
                           quality_bitmask="default"):
    """Official Kepler/K2 light curve (reference ``io/kepler.py:10-61``)."""
    lc = read_generic_lightcurve(filename, flux_column=flux_column,
                                 quality_column="sap_quality",
                                 time_format="bkjd")
    if "sap_quality" not in lc._cols and "quality" not in lc._cols:
        lc["quality"] = np.zeros(len(lc), dtype=int)
    lc = _apply_quality(lc, KeplerQualityFlags, quality_bitmask)
    lc.meta["AUTHOR"] = "Kepler"
    lc.meta["TARGETID"] = lc.meta.get("KEPLERID")
    return KeplerLightCurve(data=lc, meta=lc.meta)


def read_tess_lightcurve(filename, flux_column="pdcsap_flux",
                         quality_bitmask="default", time_format="btjd"):
    """Official TESS/SPOC light curve (reference ``io/tess.py:10-75``)."""
    lc = read_generic_lightcurve(filename, flux_column=flux_column,
                                 time_format=time_format)
    lc = _apply_quality(lc, TessQualityFlags, quality_bitmask)
    if isinstance(filename, str) and "tess-spoc" in filename:
        lc.meta["AUTHOR"] = "TESS-SPOC"
    else:
        lc.meta["AUTHOR"] = "SPOC"
    lc.meta["TARGETID"] = lc.meta.get("TICID")
    return TessLightCurve(data=lc, meta=lc.meta)


def read_qlp_lightcurve(filename, flux_column="sap_flux",
                        flux_err_column="kspsap_flux_err",
                        quality_bitmask="default"):
    """MIT QLP light curve (reference ``io/qlp.py:12-66``)."""
    lc = read_generic_lightcurve(filename, flux_column=flux_column,
                                 flux_err_column=flux_err_column,
                                 time_format="btjd")
    lc = _apply_quality(lc, TessQualityFlags, quality_bitmask)
    lc.meta["AUTHOR"] = "QLP"
    lc.meta["TARGETID"] = lc.meta.get("TICID")
    return TessLightCurve(data=lc, meta=lc.meta)


def read_k2sff_lightcurve(filename, ext="BESTAPER", **kwargs):
    """K2SFF (Vanderburg & Johnson) light curve
    (reference ``io/k2sff.py:8-42``)."""
    lc = read_generic_lightcurve(filename, flux_column="fcor",
                                 time_format="bkjd", ext=ext)
    lc.meta["AUTHOR"] = "K2SFF"
    lc.meta["TARGETID"] = lc.meta.get("KEPLERID")
    return KeplerLightCurve(data=lc, meta=lc.meta)


def read_everest_lightcurve(filename, flux_column="flux",
                            quality_bitmask="default", **kwargs):
    """EVEREST K2 light curve (reference ``io/everest.py:8-60``)."""
    lc = read_generic_lightcurve(filename, flux_column=flux_column,
                                 quality_column="quality",
                                 time_format="bkjd")
    lc = _apply_quality(lc, KeplerQualityFlags, quality_bitmask)
    lc.meta["AUTHOR"] = "EVEREST"
    lc.meta["TARGETID"] = lc.meta.get("KEPLERID")
    return KeplerLightCurve(data=lc, meta=lc.meta)


def read_cdips_lightcurve(filename, flux_column="IRM1",
                          quality_column="IRQ1", **kwargs):
    """CDIPS TESS light curve (reference ``io/cdips.py:15-80``)."""
    lc = read_generic_lightcurve(filename, flux_column=flux_column.lower(),
                                 quality_column=quality_column.lower(),
                                 time_format="btjd")
    lc.meta["AUTHOR"] = "CDIPS"
    lc.meta["TARGETID"] = lc.meta.get("TICID")
    return TessLightCurve(data=lc, meta=lc.meta)


def read_pathos_lightcurve(filename, flux_column="PSF_FLUX_COR",
                           quality_bitmask="default"):
    """PATHOS TESS light curve (reference ``io/pathos.py:12-60``)."""
    lc = read_generic_lightcurve(filename, flux_column=flux_column.lower(),
                                 time_format="btjd",
                                 quality_column="dquality")
    lc = _apply_quality(lc, TessQualityFlags, quality_bitmask)
    lc.meta["AUTHOR"] = "PATHOS"
    lc.meta["TARGETID"] = lc.meta.get("TICID")
    return TessLightCurve(data=lc, meta=lc.meta)


def read_tasoc_lightcurve(filename, flux_column="FLUX_CORR",
                          quality_bitmask=None):
    """TASOC TESS light curve (reference ``io/tasoc.py:12-40``)."""
    lc = read_generic_lightcurve(filename, flux_column=flux_column.lower(),
                                 time_format="btjd")
    lc.meta["AUTHOR"] = "TASOC"
    lc.meta["TARGETID"] = lc.meta.get("TICID")
    return TessLightCurve(data=lc, meta=lc.meta)


def read_kepseismic_lightcurve(filename, **kwargs):
    """KEPSEISMIC light curve (reference ``io/kepseismic.py:6-35``)."""
    lc = read_generic_lightcurve(filename, time_format="mjd")
    lc.meta["AUTHOR"] = "KEPSEISMIC"
    lc.meta["TARGETID"] = lc.meta.get("KEPLERID")
    return KeplerLightCurve(data=lc, meta=lc.meta)


def read_tglc_lightcurve(filename, flux_column="cal_psf_flux",
                         quality_bitmask="default"):
    """TGLC TESS light curve (reference ``io/tglc.py:12-70``)."""
    lc = read_generic_lightcurve(filename, flux_column=flux_column.lower(),
                                 quality_column="tess_flags",
                                 time_format="btjd")
    lc = _apply_quality(lc, TessQualityFlags, quality_bitmask)
    lc.meta["AUTHOR"] = "TGLC"
    lc.meta["TARGETID"] = lc.meta.get("TICID")
    return TessLightCurve(data=lc, meta=lc.meta)


def read_eleanor_lightcurve(filename, flux_column="CORR_FLUX",
                            quality_bitmask="default", **kwargs):
    """eleanor / GSFC-ELEANOR-LITE light curve
    (reference ``io/eleanor.py:12-135``).

    eleanor files break two conventions the reader repairs: the
    ``FLUX_ERR`` column is the *raw* flux error (the corrected-flux error
    is rescaled as corr_flux·raw_err/raw_flux), and the ``FFIINDEX``
    cadence numbers are stored as floats."""
    from ..units import Quantity, electron_per_second, percent, pixel, day
    lc = read_generic_lightcurve(filename, flux_column=flux_column.lower(),
                                 time_format="btjd",
                                 quality_column="quality",
                                 centroid_col_column="x_centroid",
                                 centroid_row_column="y_centroid",
                                 cadenceno_column="ffiindex")
    if quality_bitmask == "hardest":
        # eleanor adds 2 quality bits on top of the 16 TESS SPOC bits
        quality_bitmask = (TessQualityFlags.HARDEST_BITMASK
                           | 2 ** 17 | 2 ** 18)
    lc = _apply_quality(lc, TessQualityFlags, quality_bitmask)

    # eleanor FITS files carry no units; re-add the conventional ones
    for colname in ["flux", "flux_err", "raw_flux", "corr_flux",
                    "pca_flux", "psf_flux"]:
        if colname in lc.columns:
            lc[colname] = Quantity(np.asarray(lc[colname], dtype=float),
                                   electron_per_second)
    if "flux_bkg" in lc.columns:
        lc["flux_bkg"] = Quantity(np.asarray(lc["flux_bkg"], dtype=float),
                                  percent)
    for colname in ["centroid_col", "centroid_row", "x_centroid",
                    "y_centroid", "x_com", "y_com"]:
        if colname in lc.columns:
            lc[colname] = Quantity(np.asarray(lc[colname], dtype=float),
                                   pixel)
    if "barycorr" in lc.columns:
        lc["barycorr"] = Quantity(np.asarray(lc["barycorr"], dtype=float),
                                  day)

    # FLUX_ERR belongs to RAW_FLUX; rescale for the selected flux column
    if "flux_err" in lc.columns and "raw_flux" in lc.columns:
        lc["raw_flux_err"] = lc["flux_err"]
        if flux_column.lower() != "raw_flux":
            with np.errstate(divide="ignore", invalid="ignore"):
                lc["flux_err"] = Quantity(
                    lc.flux.value * lc["raw_flux_err"].value
                    / lc["raw_flux"].value, electron_per_second)

    # float FFIINDEX → int cadence numbers
    for colname in ["ffiindex", "cadenceno"]:
        if colname in lc.columns:
            vals = np.asarray(lc[colname])
            if not np.issubdtype(vals.dtype, np.integer):
                lc[colname] = np.asarray(vals, dtype=int)

    if (lc.meta.get("TVERSION") is not None
            and lc.meta.get("GITHUB")
            == "https://github.com/afeinstein20/eleanor"):
        lc.meta["AUTHOR"] = "GSFC-ELEANOR-LITE"
    else:
        lc.meta["AUTHOR"] = "ELEANOR"
    lc.meta["NORMALIZED"] = False
    tic = lc.meta.get("TIC_ID", lc.meta.get("TICID"))
    if tic is not None:
        lc.meta["TARGETID"] = tic
        lc.meta["TICID"] = tic
        lc.meta["OBJECT"] = f"TIC {tic}"
        lc.meta["LABEL"] = f"TIC {tic}"
    return TessLightCurve(data=lc, meta=lc.meta)


def read_k2sc_lightcurve(filename, **kwargs):
    """K2SC light curve (reference ``io/k2sc.py``)."""
    lc = read_generic_lightcurve(filename, flux_column="flux",
                                 time_format="bkjd")
    lc.meta["AUTHOR"] = "K2SC"
    lc.meta["TARGETID"] = lc.meta.get("KEPLERID")
    return KeplerLightCurve(data=lc, meta=lc.meta)


def read_folded_lightcurve(filename, time_format="jd", **kwargs):
    """Folded light curve saved by ``FoldedLightCurve.to_fits()``
    (reference ``io/folded.py:8-40``)."""
    lc = read_generic_lightcurve(filename, flux_column="flux",
                                 time_format=time_format)
    out = FoldedLightCurve(data=dict(lc._cols), meta=lc.meta)
    return out
