"""lightkurve_tpu — a TPU-native light-curve analysis framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
``lightkurve`` (see SURVEY.md): light-curve containers and operations,
Lomb-Scargle / Box-Least-Squares periodograms, regression-based systematics
correctors, target-pixel-file photometry, and asteroseismology — with every
hot loop implemented as a batched, shardable device computation.

Import order mirrors the reference's bottom-up layering
(``__init__.py:104-115`` there): units → time → lightcurve → correctors →
targetpixelfile → collections → io → search.
"""
import logging

__version__ = "0.1.0"

log = logging.getLogger("lightkurve_tpu")

from .config import conf  # noqa: E402
from . import units  # noqa: E402
from .units import Quantity, Unit  # noqa: E402
from .time import Time, TimeDelta  # noqa: E402
from .utils import (  # noqa: E402
    LightkurveError,
    LightkurveWarning,
    LightkurveDeprecationWarning,
    KeplerQualityFlags,
    TessQualityFlags,
)
from . import ops  # noqa: E402
from . import diagnostics  # noqa: E402

# Higher layers are imported lazily as they land; see __getattr__ below.
_LAZY = {
    "LightCurve": ".lightcurve",
    "FoldedLightCurve": ".lightcurve",
    "KeplerLightCurve": ".lightcurve",
    "TessLightCurve": ".lightcurve",
    "LightCurveCollection": ".collections",
    "TargetPixelFileCollection": ".collections",
    "Periodogram": ".periodogram",
    "SNRPeriodogram": ".periodogram",
    "LombScarglePeriodogram": ".periodogram",
    "BoxLeastSquaresPeriodogram": ".periodogram",
    "DesignMatrix": ".correctors",
    "DesignMatrixCollection": ".correctors",
    "RegressionCorrector": ".correctors",
    "PLDCorrector": ".correctors",
    "SFFCorrector": ".correctors",
    "CBVCorrector": ".correctors",
    "TargetPixelFile": ".targetpixelfile",
    "KeplerTargetPixelFile": ".targetpixelfile",
    "TessTargetPixelFile": ".targetpixelfile",
    "TargetPixelFileFactory": ".targetpixelfile",
    "Seismology": ".seismology",
    "read": ".io",
    "open": ".io",
    "search_lightcurve": ".search",
    "search_targetpixelfile": ".search",
    "search_tesscut": ".search",
    "SearchResult": ".search",
    "MASTTransport": ".mast",
    "RecordedMASTTransport": ".mast",
    "HTTPMASTTransport": ".mast_http",
    "LightCurveStack": ".batch",
    "StreamingStackLoader": ".io.pipeline",
    "TPFStack": ".batch",
    "Corrector": ".correctors",
    "SparseDesignMatrix": ".correctors",
    "SparseDesignMatrixCollection": ".correctors",
    "CotrendingBasisVectors": ".correctors",
    "KeplerCotrendingBasisVectors": ".correctors",
    "TessCotrendingBasisVectors": ".correctors",
    "load_kepler_cbvs": ".correctors",
    "load_tess_cbvs": ".correctors",
    "create_spline_matrix": ".correctors",
    "create_sparse_spline_matrix": ".correctors",
    "SeismologyQuantity": ".seismology",
    "KeplerLightCurveFile": ".lightcurvefile",
    "TessLightCurveFile": ".lightcurvefile",
    "validate_method": ".utils",
    "running_mean": ".utils",
    "centroid_quadratic": ".utils",
    "channel_to_module_output": ".utils",
    "module_output_to_channel": ".utils",
    "show_citation_instructions": ".utils",
    "plot_image": ".utils",
    "bkjd_to_time": ".utils",
    "btjd_to_time": ".utils",
    "bkjd_to_astropy_time": ".utils",
    "btjd_to_astropy_time": ".utils",
    "is_notebook": ".utils",
    "finalize_notebook_url": ".utils",
    "remote_jupyter_proxy_url": ".utils",
    "estimate_cdpp": ".convenience",
    "search_lightcurvefile": ".search",
    "estimate_numax_acf2d": ".seismology.numax_estimators",
    "estimate_deltanu_acf2d": ".seismology.deltanu_estimators",
    "diagnose_numax_acf2d": ".seismology.numax_estimators",
    "diagnose_deltanu_acf2d": ".seismology.deltanu_estimators",
    "estimate_radius": ".seismology.stellar_estimators",
    "estimate_mass": ".seismology.stellar_estimators",
    "estimate_logg": ".seismology.stellar_estimators",
    "export_interact_bls_html": ".interact_html",
    "export_interact_html": ".interact_html",
    "export_interact_echelle_html": ".interact_html",
    "export_interact_sky_html": ".interact_html",
    "demo_sky_catalog": ".interact_html",
}


def __getattr__(name):
    if name in _LAZY:
        import importlib
        mod = importlib.import_module(_LAZY[name], __name__)
        return getattr(mod, name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


__all__ = [
    "__version__", "conf", "Quantity", "Unit", "Time", "TimeDelta",
    "LightkurveError", "LightkurveWarning", "KeplerQualityFlags",
    "TessQualityFlags", "ops",
] + list(_LAZY)
