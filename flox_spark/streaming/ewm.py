"""Streaming EWM mean: per-key exponentially weighted means over a
document/metric FIREHOSE, incremental across micro-batches.

The streaming twin of the r13 blocked-EWM algebra
(``flox_spark.ewm_blocked``): the adjust=True EWM mean is a ratio of
two LINEAR recurrences (num/den with a scalar per-row decay), so a
micro-batch summarizes to ``(A, c)`` with ``state_out = A * state_in
+ c`` — exactly the blocked operator's per-block carry, applied
sequentially instead of prefix-folded.  Training pipelines keep this
shape for running per-source quality/perplexity/latency means that
must update as data arrives.

State design (the 100 TB considerations):

- state is THREE doubles per key — (num, den, last_order) —
  independent of stream length or group size; the per-batch kernel is
  the same vectorized pandas ``ewm.sum`` pair the batch/blocked
  operators trust.
- EWM is an order recurrence, so rows must arrive in non-decreasing
  ``order_by`` per key ACROSS batches (within a batch they are
  sorted).  A regression — a late row older than the key's carried
  frontier — cannot be folded into an already-emitted mean, so the
  operator RAISES rather than silently corrupting the recurrence
  (``last_order`` in the state is the guard).  Buffer/ sort upstream
  (watermark + window) if the source can reorder.

Equivalences pinned in ``tests/test_stream_ewm.py``: a single-batch
replay equals ``groupby_ewm``; a multi-batch stream equals the batch
operator over the concatenated input; state survives a checkpoint
restart.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import DoubleType, StructType

from flox_spark.ewm_blocked import _resolve_alpha

__all__ = ["stream_ewm_mean"]


def stream_ewm_mean(
    df: DataFrame,
    *by: str,
    value: str,
    order_by: str,
    alpha: float | None = None,
    halflife: float | None = None,
    span: float | None = None,
    func: str = "mean",
    adjust: bool = True,
    ignore_na: bool = False,
    out: str | None = None,
) -> DataFrame:
    """Add an EWM column to a streaming frame, carried per
    ``by``-key across micro-batches.

    Same parameter spellings as ``groupby_ewm``.  ``func="mean"``
    supports both ``adjust`` modes (r14 — adjust=False carries the
    blocked operator's ``(avg, gap_rows, seen)`` state and evaluates
    each micro-batch's affine ``lam * seed + mu`` response);
    ``func="var"``/``"std"`` (r14) extend the adjust=True linear
    carry with the second-moment pair (Swx2 decaying by A, Sw2 by
    A^2) — see ``flox_spark.ewm_blocked``'s module docstring for
    both algebras.  Works on batch frames too, but ``groupby_ewm`` /
    ``groupby_ewm_blocked`` are the right tools there."""
    if func not in ("mean", "var", "std"):
        raise ValueError(f"func must be mean|var|std, got {func!r}")
    if func != "mean" and not adjust:
        raise ValueError(
            "stream_ewm_mean var/std support adjust=True only (the "
            "renormalized second moment has no clean affine form)"
        )
    a = _resolve_alpha(alpha, halflife, span)
    base = 1.0 - a
    out = out or f"ewm_{func}"
    kw = (
        {"alpha": alpha}
        if alpha is not None
        else {"halflife": halflife}
        if halflife is not None
        else {"span": span}
    )
    if value not in df.columns or order_by not in df.columns:
        raise ValueError(
            f"stream_ewm_mean: need {value!r} and {order_by!r} columns"
        )
    keys = list(by)
    ign = ignore_na

    out_schema = StructType(list(df.schema.fields)).add(out, DoubleType())
    if not adjust:
        return _stream_ewm_noadjust(
            df, keys, value, order_by, a, base, kw, ign, out, out_schema
        )
    if func != "mean":
        return _stream_ewm_second(
            df, keys, value, order_by, a, base, kw, ign, func, out,
            out_schema,
        )
    state_schema = (
        StructType()
        .add("num", DoubleType())
        .add("den", DoubleType())
        .add("last_o", DoubleType())
    )

    def fn(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state,
    ) -> Iterator[pd.DataFrame]:
        import numpy as np

        if state.exists:
            num_in, den_in, last_o = (
                float(state.get[0]), float(state.get[1]), float(state.get[2])
            )
        else:
            num_in, den_in, last_o = 0.0, 0.0, float("-inf")
        # one key's micro-batch data may arrive as several Arrow
        # chunks with NO cross-chunk order guarantee — concatenate
        # before the total-order sort (an EWM needs the whole batch in
        # order; the key's per-batch data must fit worker memory, the
        # sessionize twins' contract)
        chunks = [p for p in pdfs if len(p)]
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True)
            pdf = pdf.sort_values(order_by, kind="mergesort").reset_index(
                drop=True
            )
            oraw = pdf[order_by].to_numpy()
            if np.issubdtype(oraw.dtype, np.datetime64):
                onum = oraw.astype("datetime64[ns]").astype("int64").astype(
                    "float64"
                )
            else:
                onum = oraw.astype("float64")
            # frontier guard at float64 precision (datetimes: ~100 ns
            # at 2020s epochs) — a GUARD against out-of-order feeds,
            # not part of the arithmetic
            if float(onum[0]) < last_o:
                raise ValueError(
                    f"stream_ewm_mean: key {key} received {order_by}="
                    f"{pdf[order_by].iloc[0]!r} older than the carried "
                    f"frontier; the EWM recurrence cannot fold late rows "
                    "into already-emitted means — sort/buffer upstream"
                )
            x = pdf[value].astype("float64")
            valid = x.notna()
            # zero-init local sums (the blocked operator's identities)
            num_loc = x.ewm(adjust=True, ignore_na=ign, **kw).sum()
            ind = valid.astype("float64").where(valid, np.nan)
            den_loc = ind.ewm(adjust=True, ignore_na=ign, **kw).sum()
            if ign:
                k = valid.cumsum().to_numpy(dtype="float64")
            else:
                k = np.arange(1, len(pdf) + 1, dtype="float64")
            A = np.power(base, k)
            num_g = np.nan_to_num(num_loc.to_numpy(), nan=0.0) + A * num_in
            den_g = np.nan_to_num(den_loc.to_numpy(), nan=0.0) + A * den_in
            res = pdf.copy()
            with np.errstate(invalid="ignore", divide="ignore"):
                res[out] = np.where(den_g > 0, num_g / den_g, np.nan)
            yield res
            num_in, den_in = float(num_g[-1]), float(den_g[-1])
            last_o = float(onum[-1])
        state.update((num_in, den_in, last_o))

    from pyspark.sql.streaming.state import GroupStateTimeout

    return df.groupBy(*keys).applyInPandasWithState(
        fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )


def _stream_ewm_second(
    df, keys, value, order_by, a, base, kw, ign, func, out, out_schema
):
    """adjust=True var/std: the linear carry extended with the
    second-moment pair (Swx2 decay A; Sw2 decay A^2 — an indicator
    ewm at alpha' = 1-(1-a)^2), combined as pandas' bias=False
    ``var = (Sw*Swx2 - Swx^2)/(Sw^2 - Sw2)``.  The per-key ANCHOR
    (first observed value, carried in state) shifts the moments for
    conditioning — variance is shift-invariant."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    a2 = 1.0 - base * base
    state_schema = (
        StructType()
        .add("anch", DoubleType())
        .add("num", DoubleType())
        .add("den", DoubleType())
        .add("sx2", DoubleType())
        .add("s2", DoubleType())
        .add("last_o", DoubleType())
    )

    def fn(key, pdfs, state):
        import numpy as np

        if state.exists:
            anch, num_in, den_in, sx2_in, s2_in, last_o = (
                float(state.get[i]) for i in range(6)
            )
        else:
            anch, num_in, den_in, sx2_in, s2_in, last_o = (
                float("nan"), 0.0, 0.0, 0.0, 0.0, float("-inf")
            )
        chunks = [p for p in pdfs if len(p)]
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True)
            pdf = pdf.sort_values(order_by, kind="mergesort").reset_index(
                drop=True
            )
            oraw = pdf[order_by].to_numpy()
            if np.issubdtype(oraw.dtype, np.datetime64):
                onum = oraw.astype("datetime64[ns]").astype("int64").astype(
                    "float64"
                )
            else:
                onum = oraw.astype("float64")
            if float(onum[0]) < last_o:
                raise ValueError(
                    f"stream_ewm_mean: key {key} received {order_by}="
                    f"{pdf[order_by].iloc[0]!r} older than the carried "
                    f"frontier; the EWM recurrence cannot fold late rows "
                    "into already-emitted means — sort/buffer upstream"
                )
            x = pdf[value].astype("float64")
            valid = x.notna()
            if anch != anch and valid.any():
                anch = float(x[valid].iloc[0])
            xc = x - anch  # NaN anchor only when nothing valid yet
            num_loc = xc.ewm(adjust=True, ignore_na=ign, **kw).sum()
            ind = valid.astype("float64").where(valid, np.nan)
            den_loc = ind.ewm(adjust=True, ignore_na=ign, **kw).sum()
            sx2_loc = (xc * xc).ewm(adjust=True, ignore_na=ign, **kw).sum()
            s2_loc = ind.ewm(adjust=True, ignore_na=ign, alpha=a2).sum()
            if ign:
                k = valid.cumsum().to_numpy(dtype="float64")
            else:
                k = np.arange(1, len(pdf) + 1, dtype="float64")
            A = np.power(base, k)
            num_g = np.nan_to_num(num_loc.to_numpy(), nan=0.0) + A * num_in
            den_g = np.nan_to_num(den_loc.to_numpy(), nan=0.0) + A * den_in
            sx2_g = np.nan_to_num(sx2_loc.to_numpy(), nan=0.0) + A * sx2_in
            s2_g = np.nan_to_num(s2_loc.to_numpy(), nan=0.0) + A * A * s2_in
            res = pdf.copy()
            with np.errstate(invalid="ignore", divide="ignore"):
                dv = den_g * den_g - s2_g
                var = np.where(
                    dv > 0,
                    np.maximum(
                        (den_g * sx2_g - num_g * num_g) / np.where(
                            dv > 0, dv, 1.0
                        ),
                        0.0,
                    ),
                    np.nan,
                )
                res[out] = np.sqrt(var) if func == "std" else var
            yield res
            num_in, den_in = float(num_g[-1]), float(den_g[-1])
            sx2_in, s2_in = float(sx2_g[-1]), float(s2_g[-1])
            last_o = float(onum[-1])
        state.update((anch, num_in, den_in, sx2_in, s2_in, last_o))

    return df.groupBy(*keys).applyInPandasWithState(
        fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )


def _stream_ewm_noadjust(
    df, keys, value, order_by, a, base, kw, ign, out, out_schema
):
    """adjust=False: per-key (avg, gap_rows, seen, last_o) state; each
    micro-batch evaluates the affine (lam, mu) response at the seed
    (the ewm_blocked per-block combine, applied sequentially)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    state_schema = (
        StructType()
        .add("avg", DoubleType())
        .add("gap", DoubleType())
        .add("seen", DoubleType())   # 0/1 flag
        .add("last_o", DoubleType())
    )

    def fn(key, pdfs, state):
        import numpy as np

        if state.exists:
            avg_in, gap_in, seen_f, last_o = (
                float(state.get[0]), float(state.get[1]),
                float(state.get[2]), float(state.get[3]),
            )
            seen = seen_f > 0
        else:
            avg_in, gap_in, seen, last_o = float("nan"), 0.0, False, float("-inf")
        chunks = [p for p in pdfs if len(p)]
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True)
            pdf = pdf.sort_values(order_by, kind="mergesort").reset_index(
                drop=True
            )
            oraw = pdf[order_by].to_numpy()
            if np.issubdtype(oraw.dtype, np.datetime64):
                onum = oraw.astype("datetime64[ns]").astype("int64").astype(
                    "float64"
                )
            else:
                onum = oraw.astype("float64")
            if float(onum[0]) < last_o:
                raise ValueError(
                    f"stream_ewm_mean: key {key} received {order_by}="
                    f"{pdf[order_by].iloc[0]!r} older than the carried "
                    f"frontier; the EWM recurrence cannot fold late rows "
                    "into already-emitted means — sort/buffer upstream"
                )
            x = pdf[value].astype("float64")
            valid = x.notna().to_numpy()
            n = len(pdf)
            res = pdf.copy()
            if valid.any():
                first = int(np.argmax(valid))
                # batch-local affine coefficients: two pandas runs
                # differing only in the first-observation value
                s0 = x.copy(); s0.iloc[first] = 0.0
                s1 = x.copy(); s1.iloc[first] = 1.0
                mu = s0.ewm(adjust=False, ignore_na=ign, **kw).mean().to_numpy()
                lam = (
                    s1.ewm(adjust=False, ignore_na=ign, **kw).mean().to_numpy()
                    - mu
                )
                x1 = float(x.iloc[first])
                if seen:
                    w1 = base if ign else base ** (gap_in + first + 1)
                    seed = (w1 * avg_in + a * x1) / (w1 + a)
                else:
                    seed = x1
                vals = lam * seed + mu
                vals[:first] = avg_in if seen else np.nan
                res[out] = vals
                avg_in = float(vals[-1])
                lastv = int(n - 1 - np.argmax(valid[::-1]))
                gap_in = float(n - 1 - lastv)
                seen = True
            else:
                res[out] = avg_in if seen else np.nan
                gap_in += float(n)
            yield res
            last_o = float(onum[-1])
        state.update((avg_in, gap_in, 1.0 if seen else 0.0, last_o))

    return df.groupBy(*keys).applyInPandasWithState(
        fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )
