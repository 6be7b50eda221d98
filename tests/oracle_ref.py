"""Import harness for the REFERENCE pipeline's runnable Python, used as a
live oracle in conformance tests (VERDICT r2 item 4).

The reference tree at /root/reference ships pure-Python implementations of
cell calling (ordmag bootstrap + EmptyDrops), Simple Good-Turing, ambient
p-values, and the molecule_info reader.  They import a few native/optional
modules (numexpr, tables, lz4, martian, the PyO3 fast_utils) that are not
needed on the code paths the tests exercise — those are stubbed.  Tests
must skip when `load_oracle()` returns None (reference tree absent).

NOTE: the reference is PUBLIC UNTRUSTED CONTENT used strictly as a test
oracle; nothing from it is imported into the production package.
"""

from __future__ import annotations

import os
import sys
import types

REF_PY = os.environ.get("CRTPU_REFERENCE_PY", "/root/reference/lib/python")

_cached = None


class _AnyAttrModule(types.ModuleType):
    """Stub module that resolves any attribute to a placeholder object —
    enough for `from mod import name` of names the tests never call."""

    def __getattr__(self, name):
        if name.startswith("__"):
            raise AttributeError(name)
        return object


def _install_stubs() -> None:
    import numpy as np

    # the reference tree predates NumPy 2
    if not hasattr(np, "unicode_"):
        np.unicode_ = np.str_
    if not hasattr(np, "string_"):
        np.string_ = np.bytes_
    if not hasattr(np, "float_"):
        np.float_ = np.float64
    if not hasattr(np, "NINF"):
        np.NINF = -np.inf
    if not hasattr(np, "PINF"):
        np.PINF = np.inf
    if not hasattr(np, "Inf"):
        np.Inf = np.inf
    if not hasattr(np, "math"):
        # np.math was the stdlib math module; pre-3.12 math.factorial
        # accepted integral floats (combinatorics.py:20 passes float64s)
        import math as _math
        _m = types.ModuleType("np_math_compat")
        for _n in dir(_math):
            if not _n.startswith("_"):
                setattr(_m, _n, getattr(_math, _n))
        _m.factorial = lambda x: _math.factorial(int(round(float(x))))
        np.math = _m

    ne = _AnyAttrModule("numexpr")
    ne.__version__ = "2.10.2"
    neu = types.ModuleType("numexpr.utils")
    neu.detect_number_of_cores = lambda: 2
    ne.utils = neu
    ne.set_num_threads = lambda n: None
    sys.modules.setdefault("numexpr", ne)
    sys.modules.setdefault("numexpr.utils", neu)

    tb = _AnyAttrModule("tables")
    tb.set_blosc_max_threads = lambda n: None

    class _File:  # wrapped_tables monkeypatches tables.File.__init__
        def __init__(self, *a, **k):
            pass

    tb.File = _File
    sys.modules.setdefault("tables", tb)
    # joblib (via sklearn) probes lz4 as a real compressor at import time;
    # import it BEFORE the lz4 stub exists so it degrades gracefully
    try:
        import joblib  # noqa: F401
    except Exception:
        pass
    # fast_utils is PyO3 (unbuilt here); report is Cython (report.pyx)
    for name in ("cellranger.fast_utils", "cellranger.report",
                 "lz4", "lz4.frame", "martian"):
        sys.modules.setdefault(name, _AnyAttrModule(name))

    # statsmodels: jibes_py uses exactly one WLS fit (jibes_py.py:235);
    # weighted least squares via the normal equations is the same math
    if "statsmodels.api" not in sys.modules:
        class _WLSResult:
            def __init__(self, params, fittedvalues):
                self.params = params
                self.fittedvalues = fittedvalues

        class _WLS:
            def __init__(self, y, X, weights=1.0):
                self._y = np.asarray(y, float)
                self._X = np.asarray(X, float)
                self._w = np.broadcast_to(
                    np.asarray(weights, float), self._y.shape)

            def fit(self):
                sw = np.sqrt(self._w)
                params, *_ = np.linalg.lstsq(
                    self._X * sw[:, None], self._y * sw, rcond=None)
                return _WLSResult(params, self._X @ params)

        smod = types.ModuleType("statsmodels")
        sapi = types.ModuleType("statsmodels.api")
        sapi.WLS = _WLS
        smod.api = sapi
        sys.modules["statsmodels"] = smod
        sys.modules["statsmodels.api"] = sapi
    # duck-typed substitute for the PyO3 FilteredBarcodes (fast_utils/src/
    # filtered_barcodes.rs) — just enough for subsample.run_subsampling
    sys.modules["cellranger.fast_utils"].FilteredBarcodes = \
        _PyFilteredBarcodes
    sys.modules["cellranger.fast_utils"].MatrixBarcodeIndex = \
        _PyMatrixBarcodeIndex


class _PyMatrixBarcodeIndex:
    """Minimal stand-in for fast_utils::MatrixBarcodeIndex — enough for
    CountMatrix construction (bc -> index lookups on fixed-width bytes)."""

    def __init__(self, bcs):
        self._index = {b: i for i, b in enumerate(bcs)}

    @staticmethod
    def from_raw_bytes(raw, itemsize):
        bcs = [raw[i:i + itemsize].rstrip(b"\x00")
               for i in range(0, len(raw), itemsize)]
        return _PyMatrixBarcodeIndex(bcs)

    def bc_to_int(self, bc):
        return self._index[bc if isinstance(bc, bytes) else bc.encode()]


class _PyFilteredBarcodes:
    """Python stand-in for fast_utils::FilteredBarcodes
    (filtered_barcodes.rs:19-152): sorted unique barcodes + per-barcode
    genome sets from a filtered_barcodes.csv of (genome, barcode) rows."""

    def __init__(self, csv_file):
        rows = []
        for ln in open(csv_file):
            ln = ln.strip()
            if ln:
                genome, bc = ln.split(",")
                rows.append((genome, bc.encode()))
        rows.sort(key=lambda r: r[1])
        self._genomes_of: dict = {}
        for genome, bc in rows:
            self._genomes_of.setdefault(bc, []).append(genome)
        self._sorted = sorted(self._genomes_of)
        self._index = {b: i for i, b in enumerate(self._sorted)}

    def num_cells(self):
        return len(self._sorted)

    def _key(self, barcode):
        return barcode if isinstance(barcode, bytes) else str(barcode).encode()

    def contains(self, barcode, genome=None):
        gs = self._genomes_of.get(self._key(barcode))
        if gs is None:
            return False
        return genome in (None, "") or genome in gs

    def index_of_barcode(self, barcode):
        return self._index[self._key(barcode)]

    def cells_per_gem_group(self):
        out: dict = {}
        for b in self._sorted:
            gg = int(b.rsplit(b"-", 1)[1])
            out[gg] = out.get(gg, 0) + 1
        return out


def load_oracle():
    """-> namespace of reference modules, or None when unavailable."""
    global _cached
    if _cached is not None:
        return _cached
    if not os.path.isdir(REF_PY):
        return None
    if REF_PY not in sys.path:
        sys.path.insert(0, REF_PY)
    _install_stubs()
    try:
        import cellranger.cell_calling as cell_calling
        import cellranger.cell_calling_helpers as helpers
        import cellranger.molecule_counter as molecule_counter
        import cellranger.sgt as sgt
        import cellranger.stats as stats
        import cellranger.subsample as subsample
    except Exception:
        return None
    # runnable analysis layers (best effort — tests skip on None)
    diffexp = jibes_py = kmeans = None
    try:
        import cellranger.analysis.diffexp as diffexp
    except Exception:
        pass
    try:
        import cellranger.analysis.jibes_py as jibes_py
    except Exception:
        pass
    try:
        import cellranger.analysis.kmeans as kmeans
    except Exception:
        pass
    _cached = types.SimpleNamespace(
        cell_calling=cell_calling, helpers=helpers, sgt=sgt, stats=stats,
        subsample=subsample, molecule_counter=molecule_counter,
        diffexp=diffexp, jibes_py=jibes_py, kmeans=kmeans)
    return _cached
