"""Declared-salt grouped reduction for deliberate hot keys.

Spark's map-side partial aggregation already absorbs most key skew
for algebraic reductions: each task pre-collapses its rows to one
partial per key, so the reducer for a hot key receives at most one
row per map task.  Two situations defeat it, and this module is for
those:

- **partial-defeating aggregates**: buffering aggregates
  (``percentile``/``collect_*``-style ObjectHashAggregate paths) ship
  the hot key's entire value multiset to one reducer;
- **pre-shuffled inputs**: when the rows of a hot key are already
  concentrated in few upstream tasks (e.g. right after a
  key-partitioned read or join), the "one partial per map task"
  bound IS the skew.

``groupby_reduce_salted`` splits each group into ``n_salt``
deterministic pseudo-random subgroups, reduces each (keys, salt)
subgroup, then merges the partials with the func's exact combine —
two small shuffles, every reduce task bounded by ~|group|/n_salt
rows.  Exact (bit-identical semantics to ``groupby_reduce``) for the
decomposable funcs listed in ``SALTABLE``; funcs whose combine needs
the full multiset (median/quantile/mode/nunique) are rejected — use
``quantile_impl="sort"`` / the blocked scans for those (SCALE.md).

The salt is ``pmod(xxhash64(monotonically_increasing_id()), n)`` —
deterministic within a job, uniform, and value-independent; the
final result never depends on which subgroup a row landed in.

Reference anchor: flox's tree combine plays the same role for dask
(flox/dask.py:433-518) — partial per block, exact merge; here the
"blocks" are declared salt subgroups sized to tame the reducer.
"""

from __future__ import annotations

from typing import Any, Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from flox_spark.dtypes import NAN, is_missing, to_skip

__all__ = ["groupby_reduce_salted", "SALTABLE"]


def _p_minmax(v: Column, is_max: bool, poison: Column):
    f = F.max if is_max else F.min
    return {"m": f(v), "pz": F.bool_or(poison)}


# func -> (partial aggs: dict[name, Column-builder], merge expr builder)
# partial builders take (v_skip, v_raw, poison); merge builders take
# the partial frame's columns by name (prefixed) and return the final
# expression.  All merges are EXACT (algebraic combine).
def _specs() -> dict[str, tuple[Callable, Callable]]:
    return {
        "count": (
            lambda vs, vr, pz: {"c": F.count(vs)},
            lambda p: F.sum(p("c")),
        ),
        "sum": (  # NaN propagates through double sums on its own
            lambda vs, vr, pz: {"s": F.sum(vr), "pz": F.bool_or(pz)},
            lambda p: F.when(F.bool_or(p("pz")), F.lit(NAN)).otherwise(F.sum(p("s"))),
        ),
        "nansum": (
            lambda vs, vr, pz: {"s": F.sum(vs)},
            lambda p: F.coalesce(F.sum(p("s")), F.lit(0.0)),
        ),
        "prod": (
            lambda vs, vr, pz: {"s": F.product(vr), "pz": F.bool_or(pz)},
            lambda p: F.when(F.bool_or(p("pz")), F.lit(NAN)).otherwise(F.product(p("s"))),
        ),
        "nanprod": (
            lambda vs, vr, pz: {"s": F.product(vs)},
            lambda p: F.coalesce(F.product(p("s")), F.lit(1.0)),
        ),
        "mean": (
            lambda vs, vr, pz: {"s": F.sum(vs), "c": F.count(vs), "pz": F.bool_or(pz)},
            lambda p: F.when(F.bool_or(p("pz")), F.lit(NAN)).otherwise(
                F.sum(p("s")) / F.sum(p("c"))
            ),
        ),
        "nanmean": (  # all-missing group -> NaN (flox empty-reduce fill)
            lambda vs, vr, pz: {"s": F.sum(vs), "c": F.count(vs)},
            lambda p: F.when(
                F.sum(p("c")) > 0, F.sum(p("s")) / F.sum(p("c"))
            ).otherwise(F.lit(NAN)),
        ),
        "min": (
            lambda vs, vr, pz: _p_minmax(vs, False, pz),
            lambda p: F.when(F.bool_or(p("pz")), F.lit(NAN)).otherwise(F.min(p("m"))),
        ),
        "max": (
            lambda vs, vr, pz: _p_minmax(vs, True, pz),
            lambda p: F.when(F.bool_or(p("pz")), F.lit(NAN)).otherwise(F.max(p("m"))),
        ),
        "nanmin": (
            lambda vs, vr, pz: {"m": F.min(vs)},
            lambda p: F.min(p("m")),
        ),
        "nanmax": (
            lambda vs, vr, pz: {"m": F.max(vs)},
            lambda p: F.max(p("m")),
        ),
        "any": (
            lambda vs, vr, pz: {"b": F.bool_or(F.isnan(vr) | (vr != 0.0))},
            lambda p: F.coalesce(F.bool_or(p("b")), F.lit(False)),
        ),
        "all": (
            lambda vs, vr, pz: {"b": F.bool_and(F.isnan(vr) | (vr != 0.0))},
            lambda p: F.coalesce(F.bool_and(p("b")), F.lit(False)),
        ),
    }


SALTABLE = tuple(sorted(_specs()))


def groupby_reduce_salted(
    df: DataFrame,
    *by: str,
    func: str,
    value: str,
    n_salt: int = 32,
    alias: str | None = None,
    sort: bool = True,
) -> DataFrame:
    """Two-phase salted grouped reduction — semantics identical to
    ``groupby_reduce`` for the funcs in ``SALTABLE`` (equality-tested
    in tests/test_salting.py), reducer load bounded by
    ~|hot group| / n_salt."""
    specs = _specs()
    if func not in specs:
        raise ValueError(
            f"salted reduction supports {SALTABLE}, got {func!r}; "
            "non-decomposable funcs (median/quantile/mode/nunique) need the "
            "full multiset — use quantile_impl='sort' or the blocked scans"
        )
    out = alias or func
    vdt = df.schema[value].dataType

    work = df
    for b in by:
        work = work.filter(~is_missing(F.col(b), work.schema[b].dataType))

    v_raw = F.col(value).cast("double")
    v_skip = to_skip(F.col(value), vdt).cast("double")
    poison = is_missing(F.col(value), vdt)
    salt = F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salt))

    p_build, m_build = specs[func]
    partial_aggs = p_build(v_skip, v_raw, poison)
    partial = (
        work.withColumn("__salt", salt)
        .groupBy(*by, "__salt")
        .agg(*[c.alias(f"__p_{n}") for n, c in partial_aggs.items()])
    )
    final = partial.groupBy(*by).agg(
        m_build(lambda n: F.col(f"__p_{n}")).alias(out)
    )
    return final.orderBy(*by) if sort else final
