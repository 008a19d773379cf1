"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query on sf0.001.
``queries()`` maps each implemented operator (SURVEY.md §2) to a
callable (spark, sf_dir) -> DataFrame built through the flox_spark
engine; ``oracle_sql()`` gives the DuckDB-equivalent SQL for the
driver's differential check.  Aliases match on both sides.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flox_spark import groupby_reduce, groupby_scan
from flox_spark.sources import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: TPC-H Q1-style grouped reduction through the engine."""
    lineitem = _t(spark, "/root/testdata/sf0.001", "lineitem")
    return groupby_reduce(
        lineitem, "l_returnflag", "l_linestatus",
        func="sum", value="l_quantity", alias="sum_qty",
    )


# ---------------------------------------------------------------------------
# per-operator queries (SURVEY.md §2.2 registry coverage)
# ---------------------------------------------------------------------------

def _q_reduce(func: str, table: str, by: list[str], value: str, alias: str, **kw):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        df = _t(spark, sf_dir, table)
        return groupby_reduce(df, *by, func=func, value=value, alias=alias, **kw)

    return run


def q_count(s, d):
    return _q_reduce("count", "lineitem", ["l_returnflag", "l_linestatus"], "l_quantity", "cnt")(s, d)


def q_sum(s, d):
    return _q_reduce("sum", "lineitem", ["l_returnflag", "l_linestatus"], "l_quantity", "sum_qty")(s, d)


def q_nansum(s, d):
    return _q_reduce("nansum", "lineitem", ["l_returnflag", "l_linestatus"], "l_extendedprice", "sum_price")(s, d)


def q_mean(s, d):
    return _q_reduce("nanmean", "lineitem", ["l_returnflag", "l_linestatus"], "l_discount", "avg_disc")(s, d)


def q_min(s, d):
    return _q_reduce("nanmin", "lineitem", ["l_returnflag"], "l_extendedprice", "min_price")(s, d)


def q_max(s, d):
    return _q_reduce("nanmax", "lineitem", ["l_returnflag"], "l_extendedprice", "max_price")(s, d)


def q_var(s, d):
    return _q_reduce("nanvar", "lineitem", ["l_returnflag"], "l_quantity", "var_qty")(s, d)


def q_var_ddof1(s, d):
    return _q_reduce("nanvar", "lineitem", ["l_returnflag"], "l_quantity", "var1_qty",
                     finalize_kwargs={"ddof": 1})(s, d)


def q_std(s, d):
    return _q_reduce("nanstd", "lineitem", ["l_returnflag"], "l_quantity", "std_qty",
                     finalize_kwargs={"ddof": 1})(s, d)


def q_prod(s, d):
    # small groups (lines per order) keep the product in double range
    return _q_reduce("nanprod", "lineitem", ["l_orderkey"], "l_discount", "prod_disc")(s, d)


def q_median(s, d):
    return _q_reduce("nanmedian", "lineitem", ["l_returnflag"], "l_extendedprice", "med_price")(s, d)


def q_quantile(s, d):
    return _q_reduce("nanquantile", "lineitem", ["l_returnflag"], "l_extendedprice", "p90_price",
                     finalize_kwargs={"q": 0.9})(s, d)


def q_first(s, d):
    return _q_reduce("nanfirst", "events", ["user_id"], "value", "first_value", order_by="event_id")(s, d)


def q_last(s, d):
    return _q_reduce("nanlast", "events", ["user_id"], "value", "last_value", order_by="event_id")(s, d)


def q_argmax(s, d):
    return _q_reduce("nanargmax", "events", ["user_id"], "value", "argmax_event", order_by="event_id")(s, d)


def q_argmin(s, d):
    return _q_reduce("nanargmin", "events", ["user_id"], "value", "argmin_event", order_by="event_id")(s, d)


def q_any(s, d):
    df = _t(s, d, "events").withColumn("big", F.col("value") > 100.0)
    return groupby_reduce(df, "event_type", func="any", value="big", alias="any_big")


def q_all(s, d):
    df = _t(s, d, "events").withColumn("pos", F.col("value") > 0.0)
    return groupby_reduce(df, "event_type", func="all", value="pos", alias="all_pos")


def q_mode(s, d):
    return _q_reduce("nanmode", "orders", ["o_orderstatus"], "o_orderpriority", "mode_prio")(s, d)


def q_binned_count(s, d):
    return _q_reduce(
        "count", "lineitem", ["l_quantity"], "l_extendedprice", "cnt",
        isbin=True, expected_groups=[0.0, 10.0, 20.0, 30.0, 50.0], fill_value=0,
    )(s, d)


def q_expected_fill(s, d):
    # full cartesian grid incl. absent combos, filled (flox fill_value)
    return _q_reduce(
        "nansum", "lineitem", ["l_returnflag", "l_linestatus"], "l_quantity", "sum_qty",
        expected_groups=(["A", "N", "R", "Z"], ["F", "O"]), fill_value=0.0,
    )(s, d)


def q_dayofyear_mean(s, d):
    # the flox climatology shape: groupby dayofyear(ts) (ERA5 benchmarks)
    df = _t(s, d, "events").withColumn("doy", F.dayofyear("ts").cast("long"))
    return groupby_reduce(df, "doy", func="nanmean", value="value", alias="avg_value")


def q_multiby_highcard(s, d):
    # compound grouper, higher cardinality (user x event_type)
    return _q_reduce("nansum", "events", ["user_id", "event_type"], "value", "sum_value")(s, d)


# ---- scans ----------------------------------------------------------------

def _with_gaps(df: DataFrame) -> DataFrame:
    # deterministically inject missing values so fills do real work
    return df.withColumn("v", F.when(F.col("event_id") % 7 == 0, F.lit(None)).otherwise(F.col("value")))


def q_scan_cumsum(s, d):
    df = _t(s, d, "events")
    out = groupby_scan(df, "user_id", func="nancumsum", value="value", order_by="event_id")
    return out.select("event_id", "user_id", F.col("nancumsum").alias("cum_value"))


def q_scan_cumcount(s, d):
    df = _with_gaps(_t(s, d, "events"))
    out = groupby_scan(df, "user_id", func="cumcount", value="v", order_by="event_id")
    return out.select("event_id", "user_id", F.col("cumcount").alias("cum_cnt"))


def q_scan_ffill(s, d):
    df = _with_gaps(_t(s, d, "events"))
    out = groupby_scan(df, "user_id", func="ffill", value="v", order_by="event_id")
    return out.select("event_id", "user_id", F.col("ffill").alias("v_filled"))


def q_scan_bfill(s, d):
    df = _with_gaps(_t(s, d, "events"))
    out = groupby_scan(df, "user_id", func="bfill", value="v", order_by="event_id")
    return out.select("event_id", "user_id", F.col("bfill").alias("v_filled"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "count": q_count,
        "sum": q_sum,
        "nansum": q_nansum,
        "mean": q_mean,
        "min": q_min,
        "max": q_max,
        "var": q_var,
        "var_ddof1": q_var_ddof1,
        "std": q_std,
        "prod": q_prod,
        "median": q_median,
        "quantile": q_quantile,
        "first": q_first,
        "last": q_last,
        "argmax": q_argmax,
        "argmin": q_argmin,
        "any": q_any,
        "all": q_all,
        "mode": q_mode,
        "binned_count": q_binned_count,
        "expected_fill": q_expected_fill,
        "dayofyear_mean": q_dayofyear_mean,
        "multiby_highcard": q_multiby_highcard,
        "scan_cumsum": q_scan_cumsum,
        "scan_cumcount": q_scan_cumcount,
        "scan_ffill": q_scan_ffill,
        "scan_bfill": q_scan_bfill,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "count": """
            SELECT l_returnflag, l_linestatus, count(l_quantity) AS cnt
            FROM lineitem GROUP BY l_returnflag, l_linestatus""",
        "sum": """
            SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty
            FROM lineitem GROUP BY l_returnflag, l_linestatus""",
        "nansum": """
            SELECT l_returnflag, l_linestatus, coalesce(sum(l_extendedprice), 0) AS sum_price
            FROM lineitem GROUP BY l_returnflag, l_linestatus""",
        "mean": """
            SELECT l_returnflag, l_linestatus, avg(l_discount) AS avg_disc
            FROM lineitem GROUP BY l_returnflag, l_linestatus""",
        "min": "SELECT l_returnflag, min(l_extendedprice) AS min_price FROM lineitem GROUP BY l_returnflag",
        "max": "SELECT l_returnflag, max(l_extendedprice) AS max_price FROM lineitem GROUP BY l_returnflag",
        "var": "SELECT l_returnflag, var_pop(l_quantity) AS var_qty FROM lineitem GROUP BY l_returnflag",
        "var_ddof1": "SELECT l_returnflag, var_samp(l_quantity) AS var1_qty FROM lineitem GROUP BY l_returnflag",
        "std": "SELECT l_returnflag, stddev_samp(l_quantity) AS std_qty FROM lineitem GROUP BY l_returnflag",
        "prod": "SELECT l_orderkey, coalesce(product(l_discount), 1) AS prod_disc FROM lineitem GROUP BY l_orderkey",
        "median": """
            SELECT l_returnflag, quantile_cont(l_extendedprice, 0.5) AS med_price
            FROM lineitem GROUP BY l_returnflag""",
        "quantile": """
            SELECT l_returnflag, quantile_cont(l_extendedprice, 0.9) AS p90_price
            FROM lineitem GROUP BY l_returnflag""",
        "first": """
            SELECT user_id, first(value ORDER BY event_id) AS first_value
            FROM events WHERE value IS NOT NULL GROUP BY user_id""",
        "last": """
            SELECT user_id, last(value ORDER BY event_id) AS last_value
            FROM events WHERE value IS NOT NULL GROUP BY user_id""",
        "argmax": """
            SELECT user_id, (list(event_id ORDER BY value DESC, event_id ASC))[1] AS argmax_event
            FROM events WHERE value IS NOT NULL GROUP BY user_id""",
        "argmin": """
            SELECT user_id, (list(event_id ORDER BY value ASC, event_id ASC))[1] AS argmin_event
            FROM events WHERE value IS NOT NULL GROUP BY user_id""",
        "any": """
            SELECT event_type, coalesce(bool_or(value > 100.0), FALSE) AS any_big
            FROM events GROUP BY event_type""",
        "all": """
            SELECT event_type, coalesce(bool_and(value > 0.0), FALSE) AS all_pos
            FROM events GROUP BY event_type""",
        "mode": """
            SELECT o_orderstatus, (list(val ORDER BY c DESC, val ASC))[1] AS mode_prio
            FROM (SELECT o_orderstatus, o_orderpriority AS val, count(*) AS c
                  FROM orders WHERE o_orderpriority IS NOT NULL
                  GROUP BY o_orderstatus, o_orderpriority)
            GROUP BY o_orderstatus""",
        "binned_count": """
            WITH binned AS (
              SELECT CASE
                       WHEN l_quantity > 0 AND l_quantity <= 10 THEN 0
                       WHEN l_quantity > 10 AND l_quantity <= 20 THEN 1
                       WHEN l_quantity > 20 AND l_quantity <= 30 THEN 2
                       WHEN l_quantity > 30 AND l_quantity <= 50 THEN 3
                     END AS l_quantity_bin,
                     l_extendedprice
              FROM lineitem)
            SELECT b.l_quantity_bin, coalesce(cnt, 0) AS cnt
            FROM (VALUES (0),(1),(2),(3)) b(l_quantity_bin)
            LEFT JOIN (SELECT l_quantity_bin, count(l_extendedprice) AS cnt
                       FROM binned WHERE l_quantity_bin IS NOT NULL
                       GROUP BY l_quantity_bin) g USING (l_quantity_bin)""",
        "expected_fill": """
            SELECT g.l_returnflag, g.l_linestatus, coalesce(s.sum_qty, 0.0) AS sum_qty
            FROM (SELECT rf.f AS l_returnflag, ls.s AS l_linestatus
                  FROM (VALUES ('A'),('N'),('R'),('Z')) rf(f)
                  CROSS JOIN (VALUES ('F'),('O')) ls(s)) g
            LEFT JOIN (SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty
                       FROM lineitem GROUP BY l_returnflag, l_linestatus) s
            USING (l_returnflag, l_linestatus)""",
        "dayofyear_mean": """
            SELECT dayofyear(ts) AS doy, avg(value) AS avg_value
            FROM events WHERE ts IS NOT NULL GROUP BY 1""",
        "multiby_highcard": """
            SELECT user_id, event_type, sum(value) AS sum_value
            FROM events GROUP BY user_id, event_type""",
        "scan_cumsum": """
            SELECT event_id, user_id,
                   sum(value) OVER (PARTITION BY user_id ORDER BY event_id) AS cum_value
            FROM events""",
        "scan_cumcount": """
            SELECT event_id, user_id,
                   count(CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END)
                     OVER (PARTITION BY user_id ORDER BY event_id) AS cum_cnt
            FROM events""",
        "scan_ffill": """
            SELECT event_id, user_id,
                   last_value(CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END IGNORE NULLS)
                     OVER (PARTITION BY user_id ORDER BY event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_filled
            FROM events""",
        "scan_bfill": """
            SELECT event_id, user_id,
                   first_value(CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END IGNORE NULLS)
                     OVER (PARTITION BY user_id ORDER BY event_id
                           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS v_filled
            FROM events""",
    }
