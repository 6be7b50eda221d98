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
    # fast_utils is PyO3 (unbuilt here); report is Cython (report.pyx)
    for name in ("cellranger.fast_utils", "cellranger.report",
                 "lz4", "lz4.frame", "martian"):
        sys.modules.setdefault(name, _AnyAttrModule(name))


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
    _cached = types.SimpleNamespace(
        cell_calling=cell_calling, helpers=helpers, sgt=sgt, stats=stats,
        subsample=subsample, molecule_counter=molecule_counter)
    return _cached
