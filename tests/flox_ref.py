"""Import the REFERENCE flox (read-only, /root/reference) as a test
oracle, shimming optional dependencies its pure-numpy path never
executes (toolz, scipy.sparse, numpy_groupies — used only by the
dask/cohorts/npg-engine paths).  All shim code here is original.

Usage: ``from tests.flox_ref import flox_groupby_reduce`` — returns
None if the reference can't be imported (tests then skip).
"""

from __future__ import annotations

import importlib.machinery
import itertools
import sys
import types


def _mod(name: str) -> types.ModuleType:
    m = types.ModuleType(name)
    # a real ModuleSpec so importlib.util.find_spec(name) works
    # (pyspark.testing probes scipy this way)
    m.__spec__ = importlib.machinery.ModuleSpec(name, None)
    return m


def _install_shims() -> None:
    if "toolz" not in sys.modules:
        tlz = _mod("toolz")

        def accumulate(fn, seq, initial=None):
            it = iter(seq)
            total = initial if initial is not None else next(it)
            yield total
            for x in it:
                total = fn(total, x)
                yield total

        def groupby(key, seq):
            out: dict = {}
            for x in seq:
                out.setdefault(key(x), []).append(x)
            return out

        def compose(*fns):
            def inner(*a, **k):
                r = fns[-1](*a, **k)
                for f in fns[-2::-1]:
                    r = f(r)
                return r

            return inner

        def partition_all(n, seq):
            it = iter(seq)
            while True:
                chunk = list(itertools.islice(it, n))
                if not chunk:
                    return
                yield chunk

        tlz.accumulate = accumulate
        tlz.groupby = groupby
        tlz.compose = compose
        tlz.last = lambda s: list(s)[-1]
        tlz.partition_all = partition_all
        sys.modules["toolz"] = tlz

    if "scipy" not in sys.modules:
        scipy = _mod("scipy")
        sp = _mod("scipy.sparse")

        class _Unavailable:  # cohort detection only (dask path)
            def __init__(self, *a, **k):
                raise ImportError("scipy stub: not available in tests")

        sp.csc_array = _Unavailable
        sp.csr_array = _Unavailable
        scipy.sparse = sp
        sys.modules["scipy"] = scipy
        sys.modules["scipy.sparse"] = sp

    if "numpy_groupies" not in sys.modules:
        npg = _mod("numpy_groupies")
        agg_np = _mod("numpy_groupies.aggregate_numpy")

        def _unavailable(*a, **k):
            raise ImportError("numpy_groupies stub: use engine='flox'")

        agg_np.aggregate = _unavailable
        npg.aggregate_numpy = agg_np
        npg.aggregate_numba = None
        npg.aggregate = _unavailable
        sys.modules["numpy_groupies"] = npg
        sys.modules["numpy_groupies.aggregate_numpy"] = agg_np


def load_reference():
    """Return the reference's groupby_reduce or None."""
    try:
        _install_shims()
        if "/root/reference" not in sys.path:
            sys.path.insert(0, "/root/reference")
        from flox.core import groupby_reduce  # noqa: PLC0415

        return groupby_reduce
    except Exception:
        return None
