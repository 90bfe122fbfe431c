"""Time-series plans over the events fixture: gap interpolation, OHLC
bars, and trailing-window anomaly detection.

The reference's only time axis is the incremental watermark
(embeddings-pipeline.py:150-180); an analytics engine over the same
event data needs the standard time-series toolkit.  All three plans are
single-shuffle (one keyed window or aggregation); trailing statistics
use exact integer/decimal sums so the DuckDB oracle matches bit-for-bit
regardless of partial-aggregation order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.registry import load_table
from .catalog import Query, register


# ------------------------------------------------ linear interpolation
# Densify each user's daily series (generated spine, as in t_gap_fill)
# and fill missing days by LINEAR interpolation between the nearest
# known neighbors — two ignore-nulls window walks (previous known /
# next known), no self-join.  Daily values aggregate through exact
# decimals so both engines interpolate from identical anchors.  Edge
# days with only one neighbor stay null ('edge').
def t_interpolate_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "user_id",
        F.datediff(F.to_date("ts"), F.lit("2024-01-01")).alias("d"),
    ).agg(
        (
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double")
            / F.count("*")
        ).alias("v")
    )
    bounds = daily.agg(F.min("d").alias("lo"), F.max("d").alias("hi"))
    users = daily.select("user_id").distinct()
    spine = users.crossJoin(F.broadcast(bounds)).select(
        "user_id", F.explode(F.sequence("lo", "hi")).alias("d")
    )
    joined = spine.join(daily, ["user_id", "d"], "left")

    wp = Window.partitionBy("user_id").orderBy("d").rowsBetween(
        Window.unboundedPreceding, 0
    )
    wn = Window.partitionBy("user_id").orderBy("d").rowsBetween(
        0, Window.unboundedFollowing
    )
    known_d = F.when(F.col("v").isNotNull(), F.col("d"))
    filled = (
        joined.withColumn("pv", F.last("v", ignorenulls=True).over(wp))
        .withColumn("pd", F.last(known_d, ignorenulls=True).over(wp))
        .withColumn("nv", F.first("v", ignorenulls=True).over(wn))
        .withColumn("nd", F.first(known_d, ignorenulls=True).over(wn))
    )
    interp = F.col("pv") + (F.col("nv") - F.col("pv")) * (
        (F.col("d") - F.col("pd")) / (F.col("nd") - F.col("pd"))
    )
    return filled.select(
        "user_id",
        "d",
        F.round(
            F.when(F.col("v").isNotNull(), F.col("v")).otherwise(interp), 6
        ).alias("value_filled"),
        F.when(F.col("v").isNotNull(), F.lit("actual"))
        .when(F.col("pv").isNotNull() & F.col("nv").isNotNull(), F.lit("interp"))
        .otherwise(F.lit("edge"))
        .alias("src"),
    ).orderBy("user_id", "d")


register(
    Query(
        name="t_interpolate_linear",
        build=t_interpolate_linear,
        oracle="""
        WITH daily AS (
            SELECT user_id,
                   datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS d,
                   CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                     / count(*) AS v
            FROM events GROUP BY 1, 2
        ), bounds AS (
            SELECT min(d) AS lo, max(d) AS hi FROM daily
        ), spine AS (
            SELECT u.user_id, s.d
            FROM (SELECT DISTINCT user_id FROM daily) u
            CROSS JOIN (SELECT unnest(range(lo, hi + 1)) AS d FROM bounds) s
        ), joined AS (
            SELECT s.user_id, s.d, daily.v
            FROM spine s LEFT JOIN daily USING (user_id, d)
        ), walked AS (
            SELECT *,
                   last_value(v IGNORE NULLS) OVER wp AS pv,
                   last_value(CASE WHEN v IS NOT NULL THEN d END IGNORE NULLS)
                       OVER wp AS pd,
                   first_value(v IGNORE NULLS) OVER wn AS nv,
                   first_value(CASE WHEN v IS NOT NULL THEN d END IGNORE NULLS)
                       OVER wn AS nd
            FROM joined
            WINDOW wp AS (PARTITION BY user_id ORDER BY d
                          ROWS UNBOUNDED PRECEDING),
                   wn AS (PARTITION BY user_id ORDER BY d
                          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
        )
        SELECT user_id, CAST(d AS INTEGER) AS d,
               round(CASE WHEN v IS NOT NULL THEN v
                          ELSE pv + (nv - pv) * (CAST(d - pd AS DOUBLE)
                                                 / (nd - pd)) END, 6)
                   AS value_filled,
               CASE WHEN v IS NOT NULL THEN 'actual'
                    WHEN pv IS NOT NULL AND nv IS NOT NULL THEN 'interp'
                    ELSE 'edge' END AS src
        FROM walked ORDER BY user_id, d
        """,
        doc="per-key daily densification with linear interpolation between known neighbors (ignore-nulls window walks)",
        tags=("timeseries", "window"),
    )
)


# ------------------------------------------------------------ OHLC bars
# Classic bar aggregation: first/last value by event order (min_by /
# max_by on a composite microsecond+id sort key — deterministic under
# ties) plus extrema, one hash aggregate, no window sort.
_TS_BASE_US = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z in microseconds


def t_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            "event_type",
            F.datediff(F.to_date("ts"), F.lit("2024-01-01")).alias("d"),
        )
        .agg(
            F.count("*").alias("n"),
            F.round(F.expr(f"min_by(value, {_seq_sql()})"), 6).alias("open"),
            F.round(F.max("value"), 6).alias("high"),
            F.round(F.min("value"), 6).alias("low"),
            F.round(F.expr(f"max_by(value, {_seq_sql()})"), 6).alias("close"),
        )
        .orderBy("event_type", "d")
    )


def _seq_sql() -> str:
    return f"(unix_micros(CAST(ts AS TIMESTAMP)) - {_TS_BASE_US}) * 100000 + event_id"


register(
    Query(
        name="t_ohlc_bars",
        build=t_ohlc_bars,
        oracle=f"""
        SELECT event_type,
               CAST(datediff('day', DATE '2024-01-01', CAST(ts AS DATE))
                    AS INTEGER) AS d,
               count(*) AS n,
               round(arg_min(value, (epoch_us(ts) - {_TS_BASE_US}) * 100000
                             + event_id), 6) AS open,
               round(max(value), 6) AS high,
               round(min(value), 6) AS low,
               round(arg_max(value, (epoch_us(ts) - {_TS_BASE_US}) * 100000
                             + event_id), 6) AS close
        FROM events
        GROUP BY event_type, datediff('day', DATE '2024-01-01', CAST(ts AS DATE))
        ORDER BY event_type, d
        """,
        doc="OHLC bar aggregation: order-deterministic min_by/max_by on a composite time+id key, one hash agg",
        tags=("timeseries", "agg"),
    )
)


# -------------------------------------------- trailing z-score anomaly
# Per-series daily volumes scored against their own 7-day trailing
# window (RANGE frame on the integer day index, so calendar gaps don't
# slide the frame).  Mean/std derive from exact integer sums inside the
# frame — (Σx, Σx²) are order-free — so the z-scores are bit-identical
# in both engines.  Windows with fewer than 2 prior days or zero
# variance emit z NULL / no flag.
_Z_FLAG = 2.0


def t_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.datediff(F.to_date("ts"), F.lit("2024-01-01")).alias("d"),
    ).agg(F.count("*").alias("cnt"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("d")
        .rangeBetween(-7, -1)
    )
    scored = (
        daily.withColumn("wn", F.count("cnt").over(w))
        .withColumn("ws", F.sum("cnt").over(w))
        .withColumn("wss", F.sum(F.col("cnt") * F.col("cnt")).over(w))
    )
    mean = F.col("ws").cast("double") / F.col("wn")
    var = (
        F.col("wss").cast("double") - F.col("ws").cast("double") * F.col("ws") / F.col("wn")
    ) / (F.col("wn") - 1)
    z = F.when(
        (F.col("wn") >= 2) & (var > 0), (F.col("cnt") - mean) / F.sqrt(var)
    )
    return scored.select(
        "event_type",
        "d",
        "cnt",
        F.round(F.when(F.col("wn") >= 1, mean), 4).alias("trailing_mean"),
        F.round(z, 4).alias("z"),
        (F.abs(F.coalesce(z, F.lit(0.0))) > _Z_FLAG).cast("int").alias("is_anomaly"),
    ).orderBy("event_type", "d")


register(
    Query(
        name="t_anomaly_zscore",
        build=t_anomaly_zscore,
        oracle=f"""
        WITH daily AS (
            SELECT event_type,
                   datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS d,
                   count(*) AS cnt
            FROM events GROUP BY 1, 2
        ), framed AS (
            SELECT *,
                   count(cnt) OVER w AS wn,
                   sum(cnt) OVER w AS ws,
                   sum(cnt * cnt) OVER w AS wss
            FROM daily
            WINDOW w AS (PARTITION BY event_type ORDER BY d
                         RANGE BETWEEN 7 PRECEDING AND 1 PRECEDING)
        )
        SELECT event_type, CAST(d AS INTEGER) AS d, cnt,
               round(CASE WHEN wn >= 1
                          THEN CAST(ws AS DOUBLE) / wn END, 4) AS trailing_mean,
               round(CASE WHEN wn >= 2
                           AND (CAST(wss AS DOUBLE)
                                - CAST(ws AS DOUBLE) * ws / wn) / (wn - 1) > 0
                          THEN (cnt - CAST(ws AS DOUBLE) / wn)
                               / sqrt((CAST(wss AS DOUBLE)
                                       - CAST(ws AS DOUBLE) * ws / wn)
                                      / (wn - 1)) END, 4) AS z,
               CAST(CASE WHEN wn >= 2
                          AND (CAST(wss AS DOUBLE)
                               - CAST(ws AS DOUBLE) * ws / wn) / (wn - 1) > 0
                          AND abs((cnt - CAST(ws AS DOUBLE) / wn)
                                  / sqrt((CAST(wss AS DOUBLE)
                                          - CAST(ws AS DOUBLE) * ws / wn)
                                         / (wn - 1))) > {_Z_FLAG}
                         THEN 1 ELSE 0 END AS INTEGER) AS is_anomaly
        FROM framed ORDER BY event_type, d
        """,
        doc="trailing 7-day z-score anomaly flags from exact in-frame integer sums (RANGE frame on day index)",
        tags=("timeseries", "window"),
    )
)


# ------------------------------------------------ grouped regression
# Per-series OLS (value ~ day) from the five sufficient statistics
# (n, Σx, Σy, Σxy, Σx², Σy²) — each an exact integer/decimal sum, so
# the whole fit is one hash aggregate with map-side combine and the
# slope/intercept/r² doubles are bit-identical in both engines.  This
# is the distributed-regression shape: sufficient statistics are
# mergeable, the model solve is O(1) per group.
def a_grouped_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    x = F.datediff(F.to_date("ts"), F.lit("2024-01-01"))
    y = F.col("value").cast("decimal(18,6)")
    stats = ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(x).alias("sx"),
        F.sum(x * x).alias("sxx"),
        F.sum(y).alias("sy"),
        F.sum(y * x).alias("sxy"),
        F.sum(y * y).alias("syy"),
    )
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sxx = F.col("sxx").cast("double")
    sy = F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    syy = F.col("syy").cast("double")
    cov_n = n * sxy - sx * sy
    var_x = n * sxx - sx * sx
    var_y = n * syy - sy * sy
    slope = cov_n / var_x
    return stats.select(
        "event_type",
        "n",
        F.round(slope, 6).alias("slope"),
        F.round((sy - slope * sx) / n, 6).alias("intercept"),
        F.round(cov_n * cov_n / (var_x * var_y), 6).alias("r2"),
    ).orderBy("event_type")


register(
    Query(
        name="a_grouped_regression",
        build=a_grouped_regression,
        oracle="""
        WITH stats AS (
            SELECT event_type, count(*) AS n,
                   sum(datediff('day', DATE '2024-01-01', CAST(ts AS DATE))) AS sx,
                   sum(datediff('day', DATE '2024-01-01', CAST(ts AS DATE))
                       * datediff('day', DATE '2024-01-01', CAST(ts AS DATE))) AS sxx,
                   sum(CAST(value AS DECIMAL(18,6))) AS sy,
                   sum(CAST(value AS DECIMAL(18,6))
                       * datediff('day', DATE '2024-01-01', CAST(ts AS DATE))) AS sxy,
                   sum(CAST(value AS DECIMAL(18,6))
                       * CAST(value AS DECIMAL(18,6))) AS syy
            FROM events GROUP BY event_type
        )
        SELECT event_type, n,
               round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                     / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6) AS slope,
               round((CAST(sy AS DOUBLE)
                      - ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                          - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                         / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                            - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
                        * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE), 6) AS intercept,
               round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                     * (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                        - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                     / ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                        * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                           - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6) AS r2
        FROM stats ORDER BY event_type
        """,
        doc="per-group OLS from mergeable sufficient statistics (one hash agg; exact sums, O(1) solve)",
        tags=("timeseries", "agg", "regression"),
    )
)


# ------------------------------------- rolling distinct-user cardinality
# Sliding COUNT DISTINCT has no native window form (distinct state is
# not mergeable along a frame), so the scalable rewrite: reduce to
# distinct (user, day) pairs once, fan each pair out to the <=7 window
# END days it contributes to (generator explode, map-side), and count
# distinct per end day — one extra 7x map fan-out instead of a per-day
# rescans or an O(days²) self-join.
_ROLL_DAYS = 7


def t_rolling_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    pairs = ev.select(
        "user_id",
        F.datediff(F.to_date("ts"), F.lit("2024-01-01")).alias("d"),
    ).distinct()
    bounds = pairs.agg(F.min("d").alias("lo"), F.max("d").alias("hi"))
    fanned = pairs.crossJoin(F.broadcast(bounds)).select(
        "user_id",
        "d",
        F.explode(
            F.sequence(
                F.greatest("d", F.col("lo")),
                F.least(F.col("d") + (_ROLL_DAYS - 1), F.col("hi")),
            )
        ).alias("end_day"),
    )
    daily = pairs.groupBy("d").agg(F.countDistinct("user_id").alias("users_1d"))
    return (
        fanned.groupBy("end_day")
        .agg(F.countDistinct("user_id").alias("users_7d"))
        .join(daily, fanned.end_day == daily.d)
        .select(F.col("end_day").alias("d"), "users_1d", "users_7d")
        .orderBy("d")
    )


register(
    Query(
        name="t_rolling_distinct_users",
        build=t_rolling_distinct_users,
        oracle=f"""
        WITH pairs AS (
            SELECT DISTINCT user_id,
                   datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS d
            FROM events
        ), bounds AS (
            SELECT min(d) AS lo, max(d) AS hi FROM pairs
        ), fanned AS (
            SELECT p.user_id, t.end_day
            FROM pairs p CROSS JOIN bounds b,
                 unnest(range(greatest(p.d, b.lo),
                              least(p.d + {_ROLL_DAYS - 1}, b.hi) + 1))
                     AS t(end_day)
        ), daily AS (
            SELECT d, count(DISTINCT user_id) AS users_1d FROM pairs GROUP BY d
        )
        SELECT f.end_day AS d, daily.users_1d,
               count(DISTINCT f.user_id) AS users_7d
        FROM fanned f JOIN daily ON daily.d = f.end_day
        GROUP BY f.end_day, daily.users_1d
        ORDER BY d
        """,
        doc="trailing 7-day distinct users: generator fan-out rewrite of the non-mergeable sliding COUNT DISTINCT",
        tags=("timeseries", "agg"),
    )
)
