"""TPC-H partsupp pack: Q2, Q9, Q11, Q16, Q20 over a SYNTHESIZED
``partsupp`` relation — closing the last 5 of the 22 TPC-H shapes.

The driver fixtures ship no partsupp table (TESTDATA.md), so both the
Spark plan and the DuckDB oracle derive it deterministically from
``part`` × supplier-count with dbgen's supplier-assignment formula
(TPC-H spec 4.2.3: the i-th of 4 suppliers for part p out of S is
``(p + i*(S/4 + (p-1)/S)) % S + 1``; the wrap-increment term is moved
additive here — ``(p + i*(S/4) + (p-1)/S) % S + 1`` — because the
multiplicative form collides at the sf0.001 fixture's S=10, while the
additive stride floor(S/4) provably yields 4 distinct suppliers for
every S >= 4) and pure-integer pseudo-random ``ps_availqty`` /
``ps_supplycost``.  Identical integer arithmetic on
both sides makes the synthesized relation oracle-exact, so the five
queries get full value-hash checks like every other catalog entry.

Scale notes: partsupp is 4×|part| = 800k rows × SF — at SF 10k that is
8 BILLION rows (hundreds of GB), far past Spark's 8 GB broadcast hard
limit, and part (200k×SF), supplier (10k×SF) and customer (150k×SF)
all scale linearly too.  Therefore NO explicit ``F.broadcast`` hint is
placed on any SF-scaling relation in this pack: the session enables
AQE with a 64 MB autoBroadcast threshold, so at fixture scale Spark
still picks broadcast joins from the ACTUAL runtime sizes, while at
large SF the same plan degrades gracefully to shuffle joins instead of
failing outright on an over-limit forced broadcast.  Explicit hints
are reserved for fixed-cardinality inputs: nation (25 rows), region
(5), and 1-row scalar aggregates (supplier count, national total).
Fact shuffles below are exactly the textbook ones (lineitem in
Q9/Q20); everything else is dim×dim work bounded by |part|.

Column adaptations (fixture schema trims some TPC-H columns, same
convention as plans/tpch_extra.py):

- Q2: no p_mfgr/s_address/s_phone/s_comment → selects p_brand and
  drops the address block; the size predicate alone stands in for
  size + LIKE '%BRASS' (the fixture's 6 p_type values would leave the
  sf0.01 result a single row — too thin to discriminate).
- Q9: p_name LIKE '%red%' (fixture names are 'adjective noun').
- Q16: no s_comment → the excluded-supplier subquery keys on
  s_acctbal < 0 (same NOT IN anti-join shape); p_type NOT IN replaces
  NOT LIKE.
- Q20: no s_address → selects s_acctbal; p_name LIKE '%e%'.

Reference behavior generalized: the reference pipeline's
relational-source surface (embeddings-pipeline.py:118-170) exposes
joined warehouse tables; TPC-H breadth is this engine's stand-in
coverage for that query surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.registry import load_table
from .catalog import Query, register

# Shared DuckDB-side generator, prepended to every oracle below.  The
# arithmetic mirrors synth_partsupp() token for token: BIGINT keys,
# `//` == Spark's `div`, and the DECIMAL(12,2) cents cast.
_PARTSUPP_CTE = """
        WITH s AS (SELECT count(*) AS scount FROM supplier),
        ps_raw AS (
            SELECT p_partkey, i, scount,
                   (p_partkey + i * (scount // 4) + (p_partkey - 1) // scount)
                       % scount + 1 AS ps_suppkey
            FROM part, s, (VALUES (0),(1),(2),(3)) seq(i)
        ),
        partsupp AS (
            SELECT p_partkey AS ps_partkey,
                   ps_suppkey,
                   (p_partkey * 7 + i * 13) % 9999 + 1 AS ps_availqty,
                   CAST(((p_partkey * 31 + ps_suppkey * 17) % 99900 + 100) / 100.0
                        AS DECIMAL(12,2)) AS ps_supplycost
            FROM ps_raw
        )
"""


def synth_partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic partsupp: 4 suppliers per part via the dbgen
    assignment formula, integer-exact availqty/supplycost.

    The supplier count is exact in parquet footer metadata (identical
    by definition to ``count(*)`` over the unfiltered table; the
    engine's manifests carry per-file counts for this at scale), so it
    enters as a LITERAL — r12, same pattern as the PQ candidate pool:
    the footer probe removes the count-aggregate stage and its 1-row
    BroadcastNestedLoopJoin from all five partsupp consumers (q2, q9,
    q11, q16, q20).  The broadcast-aggregate path is kept as the
    fallback for sources without footer metadata."""
    from ..extensions.similarity import corpus_rowcount

    part = load_table(spark, sf_dir, "part")
    n_supp = corpus_rowcount(sf_dir, "supplier")
    if n_supp is not None:
        with_count = part.select(
            "p_partkey", F.lit(int(n_supp)).cast("long").alias("scount")
        )
    else:
        scount = load_table(spark, sf_dir, "supplier").agg(
            F.count("*").alias("scount")
        )
        with_count = part.select("p_partkey").join(F.broadcast(scount))
    base = with_count.select(
        "p_partkey",
        "scount",
        F.explode(F.array(*[F.lit(k) for k in range(4)])).alias("i"),
    )
    suppkey = (
        F.col("p_partkey")
        + F.col("i") * F.expr("scount div 4")
        + F.expr("(p_partkey - 1) div scount")
    ) % F.col("scount") + 1
    return base.select(
        F.col("p_partkey").alias("ps_partkey"),
        suppkey.alias("ps_suppkey"),
        ((F.col("p_partkey") * 7 + F.col("i") * 13) % 9999 + 1).alias(
            "ps_availqty"
        ),
        F.expr(
            "CAST(((p_partkey * 31 + "
            "((p_partkey + i * (scount div 4) + (p_partkey - 1) div scount)"
            " % scount + 1) * 17) % 99900 + 100) / 100.0 AS DECIMAL(12,2))"
        ).alias("ps_supplycost"),
    )


def _disc_price() -> F.Column:
    return (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,4)"
    )


# ------------------------------------------------------------ TPC-H Q2
# Minimum-cost supplier: the correlated min-subquery becomes a groupBy
# min over the region-filtered partsupp + a join back on
# (partkey, cost) — two shuffles over a DIM-sized relation (4×|part|),
# never touching a fact table.  All lookups (supplier⋈nation⋈region)
# broadcast.  Ties at the min cost all surface, exactly like the SQL.
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    ps = synth_partsupp(spark, sf_dir)
    part = load_table(spark, sf_dir, "part")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    europe_supp = (
        supp.join(
            F.broadcast(
                nation.join(
                    F.broadcast(region.filter(F.col("r_name") == "EUROPE")),
                    F.col("n_regionkey") == F.col("r_regionkey"),
                )
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
    ).select("s_suppkey", "s_name", "s_acctbal", "n_name")
    # europe_supp is supplier-derived (10k rows × SF) — no explicit
    # hint; AQE broadcasts it at fixture scale from actual size.
    eligible = ps.join(
        europe_supp, F.col("ps_suppkey") == F.col("s_suppkey")
    )
    min_cost = eligible.groupBy(
        F.col("ps_partkey").alias("mc_partkey")
    ).agg(F.min("ps_supplycost").alias("min_cost"))
    target = part.filter(F.col("p_size") == 15)
    return (
        eligible.join(
            min_cost,
            (F.col("ps_partkey") == F.col("mc_partkey"))
            & (F.col("ps_supplycost") == F.col("min_cost")),
        )
        .join(target, F.col("ps_partkey") == F.col("p_partkey"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_brand")
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


register(
    Query(
        name="q2_min_cost_supplier",
        build=q2_min_cost_supplier,
        oracle=_PARTSUPP_CTE
        + """
        SELECT s_acctbal, s_name, n_name, p_partkey, p_brand
        FROM part, supplier, partsupp, nation, region
        WHERE p_partkey = ps_partkey AND s_suppkey = ps_suppkey
          AND p_size = 15
          AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
          AND r_name = 'EUROPE'
          AND ps_supplycost = (
              SELECT min(ps_supplycost)
              FROM partsupp, supplier, nation, region
              WHERE p_partkey = ps_partkey AND s_suppkey = ps_suppkey
                AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
                AND r_name = 'EUROPE')
        ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100
        """,
        doc=(
            "TPC-H Q2 over synthesized partsupp: correlated min-subquery as "
            "groupBy-min + join-back, all dims broadcast"
        ),
        tags=("tpch", "subquery", "partsupp"),
    )
)


# ------------------------------------------------------------ TPC-H Q9
# Product-type profit: the one genuinely fact-heavy partsupp query.
# lineitem shuffles once on l_orderkey (orders join); part / partsupp /
# supplier scale with SF, so join strategy is left to AQE (broadcast at
# fixture scale, shuffle joins past the 8 GB limit — see the in-body
# note); only the 25-row nation is hinted.  Profit arithmetic is decimal
# end-to-end (quantity is integral in the fixtures) so the sum is
# order-independent across engines.
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    part = load_table(spark, sf_dir, "part")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    ps = synth_partsupp(spark, sf_dir)
    amount = _disc_price() - F.col("ps_supplycost") * F.col("l_quantity").cast(
        "decimal(12,2)"
    )
    return (
        # part / partsupp / supplier all scale with SF (200k / 800k /
        # 10k rows × SF) — no forced broadcast; AQE picks broadcast at
        # fixture scale and degrades to shuffle joins past the 8 GB
        # broadcast limit instead of failing.  nation is 25 rows fixed.
        li.join(
            part.filter(F.col("p_name").like("%red%")),
            li["l_partkey"] == part["p_partkey"],
        )
        .join(
            ps,
            (F.col("l_partkey") == F.col("ps_partkey"))
            & (F.col("l_suppkey") == F.col("ps_suppkey")),
        )
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
            amount.alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(F.round(F.sum("amount"), 2).cast("double").alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


register(
    Query(
        name="q9_product_profit",
        build=q9_product_profit,
        oracle=_PARTSUPP_CTE
        + """
        SELECT nation, o_year,
               CAST(round(sum(amount), 2) AS DOUBLE) AS sum_profit
        FROM (
            SELECT n_name AS nation, year(o_orderdate) AS o_year,
                   CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))
                   - ps_supplycost * CAST(l_quantity AS DECIMAL(12,2)) AS amount
            FROM part, supplier, lineitem, partsupp, orders, nation
            WHERE s_suppkey = l_suppkey
              AND ps_suppkey = l_suppkey AND ps_partkey = l_partkey
              AND p_partkey = l_partkey AND o_orderkey = l_orderkey
              AND s_nationkey = n_nationkey
              AND p_name LIKE '%red%'
        ) profit
        GROUP BY nation, o_year ORDER BY nation, o_year DESC
        """,
        doc=(
            "TPC-H Q9 over synthesized partsupp: 6-table profit rollup, "
            "one fact shuffle, decimal-exact arithmetic"
        ),
        tags=("tpch", "partsupp"),
        bench=True,
    )
)


# ----------------------------------------------------------- TPC-H Q11
# Important stock: per-part value sums over one nation's suppliers,
# kept above a fraction of the national total.  The scalar total is a
# 1-row broadcast; the HAVING compare is integer-exact
# (sum·10000 > total, both exact decimals) so no float-division
# boundary can diverge between engines.
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    ps = synth_partsupp(spark, sf_dir)
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    # the one-nation supplier set is supplier-derived (scales with SF)
    # — unhinted, AQE broadcasts at fixture scale; nation is 25 rows.
    national = ps.join(
        supp.join(
            F.broadcast(nation.filter(F.col("n_name") == "NATION_1")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        ).select("s_suppkey"),
        F.col("ps_suppkey") == F.col("s_suppkey"),
    ).withColumn("part_value", F.col("ps_supplycost") * F.col("ps_availqty"))
    per_part = national.groupBy("ps_partkey").agg(
        F.sum("part_value").alias("value_exact")
    )
    total = national.agg(F.sum("part_value").alias("total_value"))
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("value_exact") * 10000 > F.col("total_value"))
        .select(
            "ps_partkey",
            F.round("value_exact", 2).cast("double").alias("part_value"),
        )
        .orderBy(F.desc("part_value"), "ps_partkey")
    )


register(
    Query(
        name="q11_important_stock",
        build=q11_important_stock,
        oracle=_PARTSUPP_CTE
        + """
        , national AS (
            SELECT ps_partkey, ps_supplycost * ps_availqty AS part_value
            FROM partsupp, supplier, nation
            WHERE ps_suppkey = s_suppkey AND s_nationkey = n_nationkey
              AND n_name = 'NATION_1'
        )
        SELECT ps_partkey,
               CAST(round(sum(part_value), 2) AS DOUBLE) AS part_value
        FROM national
        GROUP BY ps_partkey
        HAVING sum(part_value) * 10000 > (SELECT sum(part_value) FROM national)
        ORDER BY part_value DESC, ps_partkey
        """,
        doc=(
            "TPC-H Q11 over synthesized partsupp: HAVING vs scalar total as "
            "a 1-row broadcast, integer-exact threshold compare"
        ),
        tags=("tpch", "subquery", "partsupp"),
    )
)


# ----------------------------------------------------------- TPC-H Q16
# Parts/supplier relationship: countDistinct suppliers per
# (brand, type, size) with a NOT IN supplier exclusion — expressed as a
# broadcast left-anti join (s_suppkey is non-null so anti ≡ NOT IN).
# Everything is dim-sized; one shuffle on the 3-column group key.
def q16_parts_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    ps = synth_partsupp(spark, sf_dir)
    part = load_table(spark, sf_dir, "part")
    supp = load_table(spark, sf_dir, "supplier")
    excluded = supp.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    target = part.filter(
        (F.col("p_brand") != "Brand#3")
        & ~F.col("p_type").isin("PROMO", "ECONOMY")
        & F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49)
    )
    return (
        # target (filtered part) and excluded (filtered supplier) scale
        # with SF — unhinted; AQE broadcasts them at fixture scale.
        ps.join(target, F.col("ps_partkey") == F.col("p_partkey"))
        .join(
            excluded,
            F.col("ps_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("ps_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


register(
    Query(
        name="q16_parts_supplier",
        build=q16_parts_supplier,
        oracle=_PARTSUPP_CTE
        + """
        SELECT p_brand, p_type, p_size,
               count(DISTINCT ps_suppkey) AS supplier_cnt
        FROM partsupp, part
        WHERE p_partkey = ps_partkey
          AND p_brand <> 'Brand#3'
          AND p_type NOT IN ('PROMO', 'ECONOMY')
          AND p_size IN (1, 4, 9, 16, 25, 36, 49)
          AND ps_suppkey NOT IN
              (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        GROUP BY p_brand, p_type, p_size
        ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
        """,
        doc=(
            "TPC-H Q16 over synthesized partsupp: NOT IN as broadcast "
            "anti-join + countDistinct rollup"
        ),
        tags=("tpch", "subquery", "partsupp"),
    )
)


# ----------------------------------------------------------- TPC-H Q20
# Potential part promotion: suppliers whose stock of promoted parts
# exceeds half a year's shipments.  The correlated sum subquery becomes
# one lineitem shuffle on (l_partkey, l_suppkey); the INNER join to
# partsupp reproduces SQL's NULL-comparison drop for never-shipped
# pairs.  Quantity sums are integral doubles (< 2^53) so the 0.5×
# compare is exact in both engines.
def q20_part_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    ps = synth_partsupp(spark, sf_dir)
    part = load_table(spark, sf_dir, "part")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    li = load_table(spark, sf_dir, "lineitem")
    blue_parts = part.filter(F.col("p_name").like("%e%")).select("p_partkey")
    shipped = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
        )
        .join(blue_parts, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    candidates = (
        ps.join(
            shipped,
            (F.col("ps_partkey") == F.col("l_partkey"))
            & (F.col("ps_suppkey") == F.col("l_suppkey")),
        )
        .filter(F.col("ps_availqty") > 0.5 * F.col("qty"))
        .select("ps_suppkey")
        .distinct()
    )
    return (
        supp.join(
            F.broadcast(
                nation.filter(F.col("n_name") == "NATION_2").select("n_nationkey")
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(
            # candidates is partsupp-derived (scales with SF) — unhinted
            candidates,
            F.col("s_suppkey") == F.col("ps_suppkey"),
            "left_semi",
        )
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )


register(
    Query(
        name="q20_part_promotion",
        build=q20_part_promotion,
        oracle=_PARTSUPP_CTE
        + """
        SELECT s_name, s_acctbal
        FROM supplier, nation
        WHERE s_suppkey IN (
            SELECT ps_suppkey FROM partsupp
            WHERE ps_partkey IN
                  (SELECT p_partkey FROM part WHERE p_name LIKE '%e%')
              AND ps_availqty > (
                  SELECT 0.5 * sum(l_quantity) FROM lineitem
                  WHERE l_partkey = ps_partkey AND l_suppkey = ps_suppkey
                    AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
                    AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'))
          AND s_nationkey = n_nationkey AND n_name = 'NATION_2'
        ORDER BY s_name
        """,
        doc=(
            "TPC-H Q20 over synthesized partsupp: nested IN + correlated sum "
            "as one fact shuffle + semi joins"
        ),
        tags=("tpch", "subquery", "partsupp"),
    )
)
