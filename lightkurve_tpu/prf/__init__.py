"""PRF photometry subpackage (reference ``src/lightkurve/prf/``)."""
from .prfmodel import KeplerPRF, SimpleKeplerPRF, GaussianPRF
from .tpfmodel import (UniformPrior, GaussianPrior, FixedValuePrior,
                       StarPrior, BackgroundPrior, FocusPrior, MotionPrior,
                       TPFModel, PRFPhotometry)

__all__ = ["KeplerPRF", "SimpleKeplerPRF", "GaussianPRF", "UniformPrior",
           "GaussianPrior", "FixedValuePrior", "StarPrior",
           "BackgroundPrior", "FocusPrior", "MotionPrior", "TPFModel",
           "PRFPhotometry"]
