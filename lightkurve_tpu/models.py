"""Model-family index.

The reference has no neural "models"; its model families are the PRF scene
models (``prf/``), the systematics design-matrix models (``correctors/``)
and the asteroseismic estimators (``seismology/``).  This module
re-exports them under one roof for discoverability.
"""
from .prf import (GaussianPRF, KeplerPRF, SimpleKeplerPRF, TPFModel,
                  PRFPhotometry, StarPrior, BackgroundPrior, FocusPrior,
                  MotionPrior, UniformPrior, GaussianPrior, FixedValuePrior)
from .correctors import (DesignMatrix, DesignMatrixCollection,
                         RegressionCorrector, SFFCorrector, PLDCorrector,
                         CBVCorrector, CotrendingBasisVectors)
from .seismology import Seismology, SeismologyQuantity

__all__ = [
    "GaussianPRF", "KeplerPRF", "SimpleKeplerPRF", "TPFModel",
    "PRFPhotometry", "StarPrior", "BackgroundPrior", "FocusPrior",
    "MotionPrior", "UniformPrior", "GaussianPrior", "FixedValuePrior",
    "DesignMatrix", "DesignMatrixCollection", "RegressionCorrector",
    "SFFCorrector", "PLDCorrector", "CBVCorrector",
    "CotrendingBasisVectors", "Seismology", "SeismologyQuantity",
]
