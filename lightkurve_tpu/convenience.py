"""Convenience helpers (reference ``convenience.py``, 30 LoC)."""
import logging

log = logging.getLogger("lightkurve_tpu")

__all__ = ["log", "show_citation_instructions"]


def _set_log_level(level):
    log.setLevel(level)


from .utils import show_citation_instructions  # noqa: E402,F401
