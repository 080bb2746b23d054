"""Configuration system (astropy-free re-design of reference ``config/``).

The reference uses an astropy ``ConfigNamespace`` backed by
``~/.lightkurve/config/lightkurve.cfg`` (``config/__init__.py:18-125``).  We
provide the same three knobs plus TPU-specific ones, backed by a plain INI
file, with identical cache-dir resolution rules (XDG override, env var,
fallback to ``~/.lightkurve_tpu/cache``).
"""
from __future__ import annotations

import configparser
import os
import warnings

__all__ = ["conf", "get_cache_dir", "get_config_dir",
           "enable_persistent_compile_cache"]


class Conf:
    """Namespace of configuration items.

    Attributes
    ----------
    search_result_display_extra_columns : list of str
        Extra columns shown in SearchResult reprs.
    cache_dir : str or None
        Directory for downloaded files; None → default resolution.
    warn_legacy_cache_dir : bool
        Warn if a legacy ``~/.lightkurve-cache`` directory exists.
    default_dtype : str
        Default on-device floating dtype ("float32" or "float64").
    bls_default_backend : str
        "pallas" (TPU kernel) or "xla" (pure-JAX reference path).
    """

    def __init__(self):
        self.search_result_display_extra_columns = []
        self.cache_dir = None
        self.warn_legacy_cache_dir = True
        self.default_dtype = "float32"
        self.bls_default_backend = "auto"
        # "auto" probes the backend; "custom" forces the split-real FFT
        # (lightkurve_tpu.ops.fft); "native" forces jnp.fft.  NOTE: the
        # choice binds at jit TRACE time — changing it after kernels have
        # compiled requires jax.clear_caches() to take effect.
        self.fft_backend = "auto"
        self._load()

    def _config_path(self):
        return os.path.join(get_config_dir(), "lightkurve_tpu.cfg")

    def _config_paths(self):
        """Config files in load order: a reference-style ``lightkurve.cfg``
        first (drop-in compatibility), then our own file overriding it."""
        return [os.path.join(get_config_dir(), "lightkurve.cfg"),
                self._config_path()]

    def _load(self):
        for path in self._config_paths():
            if os.path.isfile(path):
                self._load_file(path)

    def _load_file(self, path):
        if not os.path.isfile(path):
            return
        try:
            cp = configparser.ConfigParser()
            cp.read(path)
            # accept both our own [lightkurve_tpu] section and the
            # reference's astropy-style sections ([search], [config]), so
            # a user's existing lightkurve.cfg keeps working
            sec = {}
            for name in ("search", "config", "lightkurve", "lightkurve_tpu"):
                if name in cp:
                    sec.update(dict(cp[name]))
            if "cache_dir" in sec:
                self.cache_dir = sec["cache_dir"]
            if "default_dtype" in sec:
                self.default_dtype = sec["default_dtype"]
            if "bls_default_backend" in sec:
                self.bls_default_backend = sec["bls_default_backend"]
            if "fft_backend" in sec:
                self.fft_backend = sec["fft_backend"]
            if "search_result_display_extra_columns" in sec:
                cols = sec["search_result_display_extra_columns"].strip()
                self.search_result_display_extra_columns = (
                    [c.strip() for c in cols.split(",") if c.strip()])
        except Exception as e:  # config must never break imports
            warnings.warn(f"Could not read config file {path}: {e}")

    def save(self):
        cp = configparser.ConfigParser()
        cp["lightkurve_tpu"] = {
            "cache_dir": self.cache_dir or "",
            "default_dtype": self.default_dtype,
            "bls_default_backend": self.bls_default_backend,
            "fft_backend": self.fft_backend,
            "search_result_display_extra_columns": ",".join(
                self.search_result_display_extra_columns),
        }
        os.makedirs(get_config_dir(), exist_ok=True)
        with open(self._config_path(), "w") as f:
            cp.write(f)

    def reload(self):
        self.__init__()


def get_config_dir():
    """Return (creating if needed) the configuration directory."""
    xdg = os.environ.get("XDG_CONFIG_HOME")
    if xdg and os.path.isdir(xdg):
        base = os.path.join(xdg, "lightkurve_tpu")
    else:
        base = os.path.join(os.path.expanduser("~"), ".lightkurve_tpu", "config")
    os.makedirs(base, exist_ok=True)
    return base


def get_cache_dir():
    """Return (creating if needed) the download-cache directory.

    Resolution order mirrors reference ``config/__init__.py:37-79``:
    1. ``conf.cache_dir``  2. ``$LIGHTKURVE_CACHE_DIR``  3. XDG cache home
    4. ``~/.lightkurve_tpu/cache``.
    """
    cache = conf.cache_dir or os.environ.get("LIGHTKURVE_CACHE_DIR")
    if not cache:
        xdg = os.environ.get("XDG_CACHE_HOME")
        if xdg and os.path.isdir(xdg):
            cache = os.path.join(xdg, "lightkurve_tpu")
        else:
            cache = os.path.join(os.path.expanduser("~"),
                                 ".lightkurve_tpu", "cache")
    os.makedirs(cache, exist_ok=True)
    return cache


conf = Conf()


def enable_persistent_compile_cache(cache_dir=None):
    """Point JAX's persistent XLA compilation cache at a per-user dir.

    The flagship BLS programs take 1-2 minutes to compile through the
    remote tunnel; production deployments (and repeated benchmark runs)
    load them from disk instead.  Call before the first jitted execution.
    """
    import jax
    if cache_dir is None:
        cache_dir = os.path.join(
            os.environ.get("XDG_CACHE_HOME",
                           os.path.expanduser("~/.cache")),
            "lightkurve_tpu_xla")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    except Exception:   # older jax without these flags
        pass
