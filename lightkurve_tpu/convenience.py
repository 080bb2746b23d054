"""Convenience helpers (reference ``convenience.py``, 30 LoC)."""
import logging

import numpy as np

log = logging.getLogger("lightkurve_tpu")

__all__ = ["log", "show_citation_instructions", "estimate_cdpp"]


def _set_log_level(level):
    log.setLevel(level)


def estimate_cdpp(flux, **kwargs):
    """Convenience wrapper around ``LightCurve.estimate_cdpp()``
    (reference ``convenience.py:11-30``): CDPP of a bare flux array in
    ppm."""
    from .lightcurve import LightCurve
    return LightCurve(time=np.arange(len(flux), dtype=float),
                      flux=flux).estimate_cdpp(**kwargs)


from .utils import show_citation_instructions  # noqa: E402,F401
