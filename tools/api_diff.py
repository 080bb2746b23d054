"""Public-API surface diff vs the reference (VERDICT r2 'Next round' #5).

Parses the reference sources with ``ast`` (no astropy import needed) to
collect every public method/property of the key user-facing classes, then
compares against the live ``lightkurve_tpu`` classes.  Deltas that are
deliberate environment gates (bokeh widgets, network I/O) or astropy
internals are listed in ``GATED`` with their reason; anything else is a
real gap and makes the script exit nonzero.

Run:  python tools/api_diff.py            # human report
      python tools/api_diff.py --strict   # exit 1 on non-gated deltas
"""
import ast
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF = "/root/reference/src/lightkurve"

# (reference file, reference class) -> dotted lightkurve_tpu class
CLASSES = {
    ("lightcurve.py", "LightCurve"): "lightkurve_tpu.LightCurve",
    ("lightcurve.py", "FoldedLightCurve"): "lightkurve_tpu.FoldedLightCurve",
    ("lightcurve.py", "KeplerLightCurve"): "lightkurve_tpu.KeplerLightCurve",
    ("lightcurve.py", "TessLightCurve"): "lightkurve_tpu.TessLightCurve",
    ("targetpixelfile.py", "TargetPixelFile"):
        "lightkurve_tpu.targetpixelfile.TargetPixelFile",
    ("targetpixelfile.py", "KeplerTargetPixelFile"):
        "lightkurve_tpu.KeplerTargetPixelFile",
    ("targetpixelfile.py", "TessTargetPixelFile"):
        "lightkurve_tpu.TessTargetPixelFile",
    ("periodogram.py", "Periodogram"): "lightkurve_tpu.Periodogram",
    ("periodogram.py", "LombScarglePeriodogram"):
        "lightkurve_tpu.LombScarglePeriodogram",
    ("periodogram.py", "BoxLeastSquaresPeriodogram"):
        "lightkurve_tpu.BoxLeastSquaresPeriodogram",
    ("periodogram.py", "SNRPeriodogram"): "lightkurve_tpu.SNRPeriodogram",
    ("search.py", "SearchResult"): "lightkurve_tpu.SearchResult",
    ("collections.py", "LightCurveCollection"):
        "lightkurve_tpu.LightCurveCollection",
    ("collections.py", "TargetPixelFileCollection"):
        "lightkurve_tpu.TargetPixelFileCollection",
    ("correctors/designmatrix.py", "DesignMatrix"):
        "lightkurve_tpu.correctors.DesignMatrix",
    ("correctors/designmatrix.py", "SparseDesignMatrix"):
        "lightkurve_tpu.correctors.SparseDesignMatrix",
    ("correctors/designmatrix.py", "DesignMatrixCollection"):
        "lightkurve_tpu.correctors.DesignMatrixCollection",
    ("correctors/regressioncorrector.py", "RegressionCorrector"):
        "lightkurve_tpu.correctors.RegressionCorrector",
    ("correctors/cbvcorrector.py", "CBVCorrector"):
        "lightkurve_tpu.correctors.CBVCorrector",
    ("correctors/pldcorrector.py", "PLDCorrector"):
        "lightkurve_tpu.correctors.PLDCorrector",
    ("correctors/sffcorrector.py", "SFFCorrector"):
        "lightkurve_tpu.correctors.SFFCorrector",
    ("seismology/core.py", "Seismology"):
        "lightkurve_tpu.seismology.Seismology",
    ("prf/prfmodel.py", "KeplerPRF"): "lightkurve_tpu.prf.KeplerPRF",
    ("prf/tpfmodel.py", "TPFModel"): "lightkurve_tpu.prf.TPFModel",
    ("prf/tpfmodel.py", "PRFPhotometry"):
        "lightkurve_tpu.prf.PRFPhotometry",
}

# member -> reason it is deliberately absent / different
GATED = {
    "interact": "live bokeh widget (bokeh absent; static fallback at "
                "lightkurve_tpu.interact)",
    "interact_sky": "bokeh + Gaia network query (env-gated)",
    "interact_bls": "live bokeh widget (static fallback provided)",
    "interact_echelle": "live bokeh widget (static fallback provided)",
    "to_stingray": "stingray not installed (raises ImportError with "
                   "guidance, as the reference does without stingray)",
    "from_stingray": "stingray not installed",
    "query_solar_system_objects": "SkyBot network query (env-gated stub "
                                  "raises with guidance)",
    "download": "network path env-gated to the offline archive",
    "download_all": "network path env-gated to the offline archive",
    "hdu": "deprecated shim returns parsed HDUList via own FITS parser",
    # astropy TimeSeries/Table inheritance internals the reference gets
    # for free; our container is astropy-free by design (SURVEY §7)
    "add_column": "astropy Table inheritance internal",
    "add_columns": "astropy Table inheritance internal",
    "add_index": "astropy Table inheritance internal",
    "add_row": "astropy Table inheritance internal",
    "fold_method": "astropy BLS internals",
    "from_pandas": "pandas-free data model (to_pandas provided)",
}


def ref_members(path, cls):
    src = open(os.path.join(REF, path)).read()
    tree = ast.parse(src)
    bases = {}
    for node in ast.walk(tree):
        if isinstance(node, ast.ClassDef):
            bases[node.name] = node
    out = {}

    def collect(name):
        node = bases.get(name)
        if node is None:
            return
        for b in node.bases:
            if isinstance(b, ast.Name):
                collect(b.id)
        for item in node.body:
            if isinstance(item, (ast.FunctionDef, ast.AsyncFunctionDef)):
                if not item.name.startswith("_"):
                    out[item.name] = "method"
            elif isinstance(item, ast.Assign):
                for t in item.targets:
                    if isinstance(t, ast.Name) and not \
                            t.id.startswith("_") and t.id.isupper() is False:
                        out.setdefault(t.id, "attr")

    collect(cls)
    return out


def our_members(dotted):
    mod, _, cls = dotted.rpartition(".")
    import importlib
    import inspect
    obj = importlib.import_module(mod)
    obj = getattr(obj, cls)
    out = {m for m in dir(obj) if not m.startswith("_")}
    # instance attributes (``self.x = ...`` anywhere in the class or its
    # bases) don't show in dir(cls) — collect them from the source
    for klass in inspect.getmro(obj):
        try:
            tree = ast.parse(inspect.getsource(klass))
        except (OSError, TypeError, SyntaxError):
            continue
        for node in ast.walk(tree):
            targets = []
            if isinstance(node, ast.Assign):
                targets = node.targets
            elif isinstance(node, (ast.AnnAssign, ast.AugAssign)):
                targets = [node.target]
            for t in targets:
                if (isinstance(t, ast.Attribute)
                        and isinstance(t.value, ast.Name)
                        and t.value.id == "self"
                        and not t.attr.startswith("_")):
                    out.add(t.attr)
    return out


def main():
    strict = "--strict" in sys.argv
    missing_total = []
    for (path, rcls), dotted in sorted(CLASSES.items()):
        want = ref_members(path, rcls)
        have = our_members(dotted)
        missing = sorted(set(want) - have)
        gated = [m for m in missing if m in GATED]
        real = [m for m in missing if m not in GATED]
        if real or gated:
            print(f"{rcls} ({dotted}):")
            for m in gated:
                print(f"    gated   {m:30s} [{GATED[m]}]")
            for m in real:
                print(f"    MISSING {m}")
        missing_total += real
    if not missing_total:
        print("OK: zero non-gated deltas across "
              f"{len(CLASSES)} classes.")
        return 0
    print(f"\n{len(missing_total)} non-gated missing members.")
    return 1 if strict else 0


if __name__ == "__main__":
    sys.exit(main())
