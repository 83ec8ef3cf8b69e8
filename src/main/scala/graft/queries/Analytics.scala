package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.syntax._

/** Deep-analytics surface beyond the round-1 batteries: correlated
  * subqueries (Catalyst decorrelates them to joins), classic TPC-H-shaped
  * multi-join aggregations, window range-frames and value-window functions,
  * statistical aggregates, and array/map higher-order functions.
  *
  * Everything follows the repo's oracle discipline: money exported as
  * integer cents/e4 basis points, FP-accumulating aggregates rounded on
  * both sides, every result totally ordered with a unique tie-break, and
  * only scalar columns exported (arrays are flattened or joined to CSV so
  * the driver's hash compare works — the q_udaf_topk lesson).
  *
  * Scale notes per query in the scaladocs; the common theme: dimension
  * sides broadcast, fact tables shuffle at most once on a join key, and
  * every aggregation keeps map-side partial aggregation.
  *
  * The SQL-surface queries register fixed-name temp views in the session
  * catalog (the `*_sq` / `*_q21` names): like the driver's Verify/Bench
  * harnesses and the spec suites, they assume queries on one session run
  * SEQUENTIALLY — concurrent invocations with different `dir`s would race
  * the view registration. A concurrent runner should use one session per
  * stream of work (sessions are cheap; `spark.newSession()` shares the
  * catalog-less state safely).
  */
object Analytics {

  /** EXISTS / NOT EXISTS / IN subqueries — written as SQL (the subquery
    * surface), planned by Catalyst as left-semi/left-anti/semi joins, so at
    * scale they behave exactly like the explicit join formulations in
    * [[Relational]] (`q_join_semi`/`q_join_anti`). */
  def qExists(spark: SparkSession, dir: String): DataFrame = {
    Tables.customer(spark, dir).createOrReplaceTempView("c_sq")
    Tables.orders(spark, dir).createOrReplaceTempView("o_sq")
    Tables.nation(spark, dir).createOrReplaceTempView("n_sq")
    spark.sql(
      """SELECT c_custkey, c_name
         FROM c_sq
         WHERE EXISTS (SELECT 1 FROM o_sq
                       WHERE o_custkey = c_custkey AND o_totalprice > 300000)
           AND NOT EXISTS (SELECT 1 FROM o_sq
                           WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
           AND c_nationkey IN (SELECT n_nationkey FROM n_sq WHERE n_regionkey < 2)
         ORDER BY c_custkey""")
  }

  /** Correlated scalar subquery (per-order lineitem count) + uncorrelated
    * scalar subquery threshold. Catalyst rewrites the correlated count to
    * an aggregate + left outer join — the scalable form; the uncorrelated
    * max is a one-row broadcast. The threshold uses max (exact) rather than
    * avg so no FP-summation noise can flip boundary rows. */
  def qScalarSubquery(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir).createOrReplaceTempView("o_ssq")
    Tables.lineitem(spark, dir).createOrReplaceTempView("l_ssq")
    spark.sql(
      """SELECT o_orderkey,
                CAST(round(o_totalprice * 100) AS BIGINT) AS price_c,
                (SELECT count(*) FROM l_ssq WHERE l_orderkey = o_orderkey) AS n_lines
         FROM o_ssq
         WHERE o_totalprice > (SELECT max(o_totalprice) FROM o_ssq) * 0.5""")
  }

  private def revenueE4 =
    sum(round($"l_extendedprice" * (lit(1.0) - $"l_discount") * 10000).cast("long"))

  /** TPC-H Q3 shape (shipping priority): segment-filtered customers ⋈
    * orders ⋈ lineitem, revenue per order, top 10. Scale: the filtered
    * customer dim broadcasts; lineitem (the fact) shuffles once on
    * l_orderkey for the aggregate; top-10 is TakeOrderedAndProject. */
  def qTpchQ3(spark: SparkSession, dir: String): DataFrame = {
    val cutoff = lit("1998-06-01").cast("timestamp")
    Tables.lineitem(spark, dir).filter($"l_shipdate" > cutoff)
      .join(Tables.orders(spark, dir).filter($"o_orderdate" < cutoff),
            $"l_orderkey" === $"o_orderkey")
      .join(broadcast(Tables.customer(spark, dir)
              .filter($"c_mktsegment" === "BUILDING")),
            $"o_custkey" === $"c_custkey")
      .groupBy($"l_orderkey", $"o_orderdate", $"o_orderpriority")
      .agg(revenueE4.as("revenue_e4"))
      .orderBy($"revenue_e4".desc, $"l_orderkey")
      .limit(10)
  }

  /** TPC-H Q5 shape (local supplier volume): revenue by nation where the
    * supplier and the customer share the nation, ASIA only, one year.
    * Scale: region/nation/supplier broadcast; the orders⋈lineitem fact-fact
    * join shuffles on orderkey; everything above is map-side. */
  def qTpchQ5(spark: SparkSession, dir: String): DataFrame = {
    val asiaNations = broadcast(
      Tables.nation(spark, dir)
        .join(broadcast(Tables.region(spark, dir).filter($"r_name" === "ASIA")),
              $"n_regionkey" === $"r_regionkey")
        .select($"n_nationkey", $"n_name"))
    Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir)
              .filter($"o_orderdate" >= lit("1996-01-01").cast("timestamp") &&
                      $"o_orderdate" < lit("1998-01-01").cast("timestamp")),
            $"l_orderkey" === $"o_orderkey")
      .join(broadcast(Tables.customer(spark, dir)), $"o_custkey" === $"c_custkey")
      .join(asiaNations, $"c_nationkey" === $"n_nationkey")
      .join(broadcast(Tables.supplier(spark, dir)),
            $"l_suppkey" === $"s_suppkey" && $"s_nationkey" === $"c_nationkey")
      .groupBy($"n_name")
      .agg(revenueE4.as("revenue_e4"))
      .orderBy($"revenue_e4".desc, $"n_name")
  }

  /** TPC-H Q10 shape (returned items): revenue lost to returns per customer
    * in one quarter, top 20. */
  def qTpchQ10(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir).filter($"l_returnflag" === "R")
      .join(Tables.orders(spark, dir)
              .filter($"o_orderdate" >= lit("1997-01-01").cast("timestamp") &&
                      $"o_orderdate" < lit("1997-07-01").cast("timestamp")),
            $"l_orderkey" === $"o_orderkey")
      .join(broadcast(Tables.customer(spark, dir)), $"o_custkey" === $"c_custkey")
      .join(broadcast(Tables.nation(spark, dir)), $"c_nationkey" === $"n_nationkey")
      .groupBy($"c_custkey", $"c_name", $"n_name")
      .agg(revenueE4.as("revenue_e4"))
      .orderBy($"revenue_e4".desc, $"c_custkey")
      .limit(20)

  private val ProfileNumCols = Seq("l_orderkey", "l_quantity", "l_extendedprice")
  private val ProfileStrCols = Seq("l_returnflag", "l_linestatus")

  /** Column profiling (the data-quality audit every ingest runs): null
    * count, exact distinct count, min/max per column.
    *
    * Plan discipline — every aggregate must stay HASH-based:
    *  - numeric columns: one column-pruned scan, one aggregate with the
    *    multi-`countDistinct` Expand. All buffers are primitive, so the
    *    plan is `HashAggregate` over the expanded rows. (A first draft put
    *    the string min/max in the same aggregate: the string buffer
    *    disqualified hash aggregation and the WHOLE profile became a
    *    `SortAggregate` over the Expand — 8.3 s; this shape is 1.5 s.)
    *  - string columns: min/max/distinct via group-then-summarize — a
    *    string GROUP KEY is hash-friendly even though a string BUFFER is
    *    not, so `groupBy(col)` collapses to the tiny value domain first
    *    and the string min/max sort-agg only ever sees those few rows.
    * At corpus scale the drop-in relaxation for the Expand is
    * `approx_count_distinct` — exact here so the oracle hash-matches.
    * Numeric extremes are emitted in integer cents and string extremes
    * as-is, so every profile row has one fixed schema. */
  def qProfile(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    // Per-column two-level aggregation for the NUMERIC columns too (the
    // string columns always had this shape): a single aggregate with one
    // countDistinct per column plans an Expand — every fact row
    // replicated once per distinct column — whose partial-agg working
    // set spilled 17.5 GB at the 100× curve point. Grouping by the
    // column first dedups map-side (distinct values per partition), the
    // outer agg reads only the distinct keys, and n_null/min/max fold
    // over the grouped frame with identical results (the NULL group
    // carries its row count in `cnt`).
    val numWide = ProfileNumCols.map { c =>
      li.groupBy(col(c)).agg(count(lit(1)).as("cnt"))
        .agg(sum(when(col(c).isNull, $"cnt").otherwise(0L)).as(s"${c}_nn"),
             count(col(c)).as(s"${c}_nd"),
             min(round(col(c) * 100).cast("long")).as(s"${c}_mn"),
             max(round(col(c) * 100).cast("long")).as(s"${c}_mx"))
    }
    val strWide = ProfileStrCols.map { c =>
      li.groupBy(col(c)).agg(count(lit(1)).as("cnt"))
        .agg(sum(when(col(c).isNull, $"cnt").otherwise(0L)).as(s"${c}_nn"),
             count(col(c)).as(s"${c}_nd"),
             min(col(c)).as(s"${c}_ms"),
             max(col(c)).as(s"${c}_xs"))
    }
    val wide = (numWide ++ strWide)
      .foldLeft(li.agg(count(lit(1)).as("n_rows")))(_ crossJoin _)
    val rows = ProfileNumCols.map { c =>
      struct(lit(c).as("col_name"), $"n_rows",
        col(s"${c}_nn").as("n_null"), col(s"${c}_nd").as("n_distinct"),
        col(s"${c}_mn").as("min_num_c"), col(s"${c}_mx").as("max_num_c"),
        lit(null).cast("string").as("min_str"), lit(null).cast("string").as("max_str"))
    } ++ ProfileStrCols.map { c =>
      struct(lit(c).as("col_name"), $"n_rows",
        col(s"${c}_nn").as("n_null"), col(s"${c}_nd").as("n_distinct"),
        lit(null).cast("long").as("min_num_c"), lit(null).cast("long").as("max_num_c"),
        col(s"${c}_ms").as("min_str"), col(s"${c}_xs").as("max_str"))
    }
    wide.select(explode(array(rows: _*)).as("p")).select($"p.*")
      .orderBy($"col_name")
  }

  /** TPC-H Q18 shape (large-volume customers): aggregate the fact table
    * FIRST (sum quantity per order), filter on the aggregate (HAVING), and
    * only then join the few surviving keys to orders/customer. The
    * having-filter runs before any join, so the join input shrinks from
    * |lineitem| to the handful of qualifying orders — at 100 TB the
    * expensive join never sees the fact table, and AQE broadcasts the
    * filtered aggregate side at runtime. Quantities sum as integer cents
    * (order-independent), per the FP-portability recipe. */
  def qTpchQ18(spark: SparkSession, dir: String): DataFrame = {
    val big = Tables.lineitem(spark, dir)
      .groupBy($"l_orderkey")
      .agg(sum(round($"l_quantity" * 100).cast("long")).as("sum_qty_c"))
      .filter($"sum_qty_c" > 30000L)
    Tables.orders(spark, dir)
      .join(big, $"o_orderkey" === $"l_orderkey")
      .join(broadcast(Tables.customer(spark, dir)), $"o_custkey" === $"c_custkey")
      .select($"c_name", $"c_custkey", $"o_orderkey", $"o_orderdate",
              round($"o_totalprice" * 100).cast("long").as("price_c"),
              $"sum_qty_c")
      .orderBy($"price_c".desc, $"o_orderkey")
      .limit(100)
  }

  /** TPC-H Q7 shape (volume shipping): annual trade flow between two fixed
    * nations, both directions, through lineitem ⋈ supplier ⋈ orders ⋈
    * customer ⋈ nation×2. Scale: BOTH nation dims are pre-filtered to the
    * two nations of interest before joining (the pushable superset of the
    * pair disjunction — the disjunction itself only has to exclude the
    * same-nation combinations on the already-tiny joined side), supplier
    * and customer broadcast, and the fact table shuffles once on
    * l_orderkey to meet orders. Revenue is per-row-rounded integer e4, so
    * the aggregate is summation-order-independent. */
  def qTpchQ7(spark: SparkSession, dir: String): DataFrame = {
    val pair = Seq("NATION_3", "NATION_7")
    val n1 = broadcast(Tables.nation(spark, dir)
      .filter($"n_name".isin(pair: _*))
      .select($"n_nationkey".as("s_nk"), $"n_name".as("supp_nation")))
    val n2 = broadcast(Tables.nation(spark, dir)
      .filter($"n_name".isin(pair: _*))
      .select($"n_nationkey".as("c_nk"), $"n_name".as("cust_nation")))
    Tables.lineitem(spark, dir)
      .join(broadcast(Tables.supplier(spark, dir)), $"l_suppkey" === $"s_suppkey")
      .join(Tables.orders(spark, dir), $"l_orderkey" === $"o_orderkey")
      .join(broadcast(Tables.customer(spark, dir)), $"o_custkey" === $"c_custkey")
      .join(n1, $"s_nationkey" === $"s_nk")
      .join(n2, $"c_nationkey" === $"c_nk")
      .filter($"supp_nation" =!= $"cust_nation")
      .groupBy($"supp_nation", $"cust_nation",
               year($"l_shipdate").cast("long").as("l_year"))
      .agg(revenueE4.as("revenue_e4"))
      .orderBy($"supp_nation", $"cust_nation", $"l_year")
  }

  /** TPC-H Q21 shape (suppliers who kept finished orders waiting), adapted
    * to the fixture's columns: on multi-supplier 'F' orders, count per
    * supplier the lineitems that shipped last-or-tied among the other
    * suppliers' lines — a doubly-correlated EXISTS / NOT EXISTS with a
    * non-equi correlated predicate. Catalyst decorrelates to a left-semi
    * join (the EXISTS) and a left-anti join with a composite equi + range
    * condition (the NOT EXISTS) — both shuffle on l_orderkey, the one key
    * the whole query is already partitioned by, so the subqueries cost two
    * co-partitioned joins, never a per-row probe. */
  def qTpchQ21(spark: SparkSession, dir: String): DataFrame = {
    Tables.supplier(spark, dir).createOrReplaceTempView("s_q21")
    Tables.lineitem(spark, dir).createOrReplaceTempView("l_q21")
    Tables.orders(spark, dir).createOrReplaceTempView("o_q21")
    spark.sql(
      """SELECT s_name, count(*) AS numwait
         FROM s_q21, l_q21 l1, o_q21
         WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
           AND o_orderstatus = 'F'
           AND EXISTS (SELECT 1 FROM l_q21 l2
                       WHERE l2.l_orderkey = l1.l_orderkey
                         AND l2.l_suppkey <> l1.l_suppkey)
           AND NOT EXISTS (SELECT 1 FROM l_q21 l3
                           WHERE l3.l_orderkey = l1.l_orderkey
                             AND l3.l_suppkey <> l1.l_suppkey
                             AND l3.l_shipdate > l1.l_shipdate)
         GROUP BY s_name
         ORDER BY numwait DESC, s_name""")
  }

  /** The SCALE form of the Q21 shape — same semantics, ONE fact shuffle.
    *
    * [[qTpchQ21]] keeps the literal doubly-correlated EXISTS / NOT EXISTS
    * (the decorrelation-machinery demonstration): Catalyst plans it as a
    * semi + anti join, which broadcasts the fact at sf0.1 but flips to
    * THREE full SortMergeJoin exchanges of lineitem past the broadcast
    * threshold — measured 6.6× time at 10× data (the scale lane's max;
    * legitimate cost-model behavior, but 3× the fact shuffle a 100-TB job
    * wants to pay). This variant is the rewrite a production pipeline
    * ships: all three correlated quantifiers collapse into per-order
    * window aggregates over a single `repartition(l_orderkey)` —
    *
    *  - `EXISTS (other supplier)` ⟺ the order has ≥2 distinct suppliers;
    *  - `NOT EXISTS (other supplier shipped later)` ⟺ l1.shipdate ≥
    *    max shipdate among OTHER suppliers' lines, which is `max1` (the
    *    order-wide max) unless l1's supplier is the UNIQUE supplier at
    *    max1, where it is `max2` (max over the other suppliers' lines).
    *
    * Every window shares the `l_orderkey` partitioning (one sort, no
    * further exchange; per-order line counts are bounded, so the
    * collect_set's are constant-sized); the orders join arrives
    * co-partitioned on the same key (only the orders side exchanges at
    * scale) and `supplier` broadcasts. Fact exchanges: 1, at every scale —
    * vs 3 for the decorrelated form. Oracle: the SAME doubly-correlated
    * SQL as q_tpch_q21 — DuckDB re-derives the quantifier semantics from
    * first principles, pinning the rewrite's equivalence. */
  def qTpchQ21Win(spark: SparkSession, dir: String): DataFrame = {
    val wo = Window.partitionBy($"l_orderkey")
    val qualifying = Tables.lineitem(spark, dir)
      .select($"l_orderkey", $"l_suppkey", $"l_shipdate")
      .repartition($"l_orderkey")
      .withColumn("max1", max($"l_shipdate").over(wo))
      .withColumn("n_supp", size(collect_set($"l_suppkey").over(wo)))
      .withColumn("atmax", collect_set(
        when($"l_shipdate" === $"max1", $"l_suppkey")).over(wo))
      .withColumn("atmax_sk",
        when(size($"atmax") === 1, element_at($"atmax", 1)))
      .withColumn("max2", max(
        when($"l_suppkey" =!= $"atmax_sk", $"l_shipdate")).over(wo))
      .withColumn("other_max",
        when(size($"atmax") > 1, $"max1")
          .when($"l_suppkey" === $"atmax_sk", $"max2")
          .otherwise($"max1"))
      .filter($"n_supp" >= 2 && $"l_shipdate" >= $"other_max")
    qualifying
      .join(Tables.orders(spark, dir)
              .filter($"o_orderstatus" === "F").select($"o_orderkey"),
            $"l_orderkey" === $"o_orderkey")
      .join(broadcast(Tables.supplier(spark, dir)
              .select($"s_suppkey", $"s_name")),
            $"l_suppkey" === $"s_suppkey")
      .groupBy($"s_name")
      .agg(count(lit(1)).as("numwait"))
      .orderBy($"numwait".desc, $"s_name")
  }

  /** TPC-H Q14 shape (promotion effect): share of one month's revenue from
    * PROMO-type parts, as an integer-e4 ratio of two exact integer-e4
    * revenue sums. Scale: the shipdate month pushes to the lineitem scan,
    * `part` broadcasts (dimension), and the whole month collapses in ONE
    * partial+final aggregate — 3 longs cross the final exchange. */
  def qTpchQ14(spark: SparkSession, dir: String): DataFrame = {
    val rev = round($"l_extendedprice" * (lit(1.0) - $"l_discount") * 10000)
      .cast("long")
    Tables.lineitem(spark, dir)
      .filter($"l_shipdate" >= lit("1997-03-01").cast("timestamp") &&
              $"l_shipdate" < lit("1997-04-01").cast("timestamp"))
      .join(broadcast(Tables.part(spark, dir)
              .select($"p_partkey", $"p_type")),
            $"l_partkey" === $"p_partkey")
      .agg(sum(when($"p_type" === "PROMO", rev).otherwise(0L))
             .as("promo_rev_e4"),
           sum(rev).as("total_rev_e4"))
      .withColumn("promo_share_e4",
        expr("(promo_rev_e4 * 10000) div total_rev_e4"))
  }

  /** TPC-H Q8 shape (national market share) — the last TPC-H query the
    * fixture schema can express (Q2/Q9/Q11/Q16/Q20 need `partsupp`, which
    * the test data does not ship): for PROMO parts sold to ASIA customers
    * over two order-years, the share of revenue supplied by NATION_2, per
    * year. Money follows the repo's integer-e4 discipline and the share is
    * an integer basis-point division exactly like [[qTpchQ14]].
    *
    * Scale: part (filtered), customer, supplier and both nation maps
    * broadcast; lineitem — the only fact at 100 TB — is joined to orders on
    * l_orderkey (one shuffle) and everything else is a broadcast hash join,
    * so the plan shuffles the fact exactly once before a 2-group aggregate. */
  def qTpchQ8(spark: SparkSession, dir: String): DataFrame = {
    val rev = round($"l_extendedprice" * (lit(1.0) - $"l_discount") * 10000)
      .cast("long")
    val custNations = broadcast(
      Tables.nation(spark, dir)
        .join(broadcast(Tables.region(spark, dir).filter($"r_name" === "ASIA")),
              $"n_regionkey" === $"r_regionkey")
        .select($"n_nationkey".as("cust_nk")))
    val suppNations = broadcast(
      Tables.nation(spark, dir)
        .select($"n_nationkey".as("supp_nk"), $"n_name".as("supp_nation")))
    Tables.lineitem(spark, dir)
      .join(broadcast(Tables.part(spark, dir)
              .filter($"p_type" === "PROMO").select($"p_partkey")),
            $"l_partkey" === $"p_partkey")
      .join(Tables.orders(spark, dir)
              .filter($"o_orderdate" >= lit("1996-01-01").cast("timestamp") &&
                      $"o_orderdate" < lit("1998-01-01").cast("timestamp")),
            $"l_orderkey" === $"o_orderkey")
      .join(broadcast(Tables.customer(spark, dir)
              .select($"c_custkey", $"c_nationkey")),
            $"o_custkey" === $"c_custkey")
      .join(custNations, $"c_nationkey" === $"cust_nk")
      .join(broadcast(Tables.supplier(spark, dir)
              .select($"s_suppkey", $"s_nationkey")),
            $"l_suppkey" === $"s_suppkey")
      .join(suppNations, $"s_nationkey" === $"supp_nk")
      .groupBy(year($"o_orderdate").cast("long").as("o_year"))
      .agg(sum(when($"supp_nation" === "NATION_2", rev).otherwise(0L))
             .as("nation_rev_e4"),
           sum(rev).as("total_rev_e4"))
      .withColumn("mkt_share_e4",
        expr("(nation_rev_e4 * 10000) div total_rev_e4"))
      .orderBy($"o_year")
  }

  /** TPC-H Q19 shape (discounted revenue, disjunctive predicates): an OR
    * of three (brand × size-range × quantity-range) branches. The
    * interesting plan property is predicate placement: each branch mixes
    * fact and dimension columns, so the disjunction can only apply AFTER
    * the join — but Catalyst still derives the prunable
    * `p_brand IN (...)` / size envelope onto the broadcast dimension and
    * the quantity envelope onto the scan, so the fact rows surviving to
    * the join are already range-bounded. One broadcast join, one scalar
    * aggregate. */
  def qTpchQ19(spark: SparkSession, dir: String): DataFrame = {
    val rev = round($"l_extendedprice" * (lit(1.0) - $"l_discount") * 10000)
      .cast("long")
    val branch = ($"p_brand" === "Brand#1" && $"p_size".between(1, 15) &&
                    $"l_quantity".between(1, 20)) ||
                 ($"p_brand" === "Brand#13" && $"p_size".between(10, 30) &&
                    $"l_quantity".between(10, 30)) ||
                 ($"p_brand" === "Brand#20" && $"p_size".between(20, 50) &&
                    $"l_quantity".between(20, 40))
    Tables.lineitem(spark, dir)
      .join(broadcast(Tables.part(spark, dir)
              .select($"p_partkey", $"p_brand", $"p_size")),
            $"l_partkey" === $"p_partkey")
      .filter(branch)
      .agg(count(lit(1)).as("n_lines"), sum(rev).as("revenue_e4"))
  }

  /** TPC-H Q6 shape (forecasting revenue change): the pure-scan aggregate —
    * date range + discount band + quantity cap, one scalar result. The
    * entire predicate is scan-pushable (all three columns are fact
    * columns), so the plan is scan → filter → one partial+final aggregate:
    * 2 longs cross the only exchange. The revenue here is price×discount
    * (the discounted slice itself), per the TPC-H definition. */
  def qTpchQ6(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter($"l_shipdate" >= lit("1997-01-01").cast("timestamp") &&
              $"l_shipdate" < lit("1998-01-01").cast("timestamp") &&
              $"l_discount".between(0.05, 0.07) && $"l_quantity" < 24)
      .agg(count(lit(1)).as("n_lines"),
           sum(round($"l_extendedprice" * $"l_discount" * 10000).cast("long"))
             .as("revenue_e4"))

  /** TPC-H Q4 shape (order priority checking), adapted to the fixture's
    * columns: the reference predicate (l_commitdate < l_receiptdate) needs
    * columns the fixture lacks, so "late" here is shipped >60 days after
    * the order date — same decorrelated-EXISTS plan property. Catalyst
    * plans the EXISTS as a left-semi join on l_orderkey with the date
    * conjunct as an extra join predicate: the fact table shuffles once on
    * the key the quarter's orders are already hashed by, never a per-row
    * probe. */
  def qTpchQ4(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .filter($"o_orderdate" >= lit("1997-01-01").cast("timestamp") &&
              $"o_orderdate" < lit("1997-04-01").cast("timestamp"))
    val late = Tables.lineitem(spark, dir).select($"l_orderkey", $"l_shipdate")
    o.join(late,
        $"l_orderkey" === $"o_orderkey" &&
          $"l_shipdate" > $"o_orderdate" + expr("INTERVAL 60 DAYS"),
        "left_semi")
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy($"o_orderpriority")

  }

  /** TPC-H Q13 shape (customer order-count distribution), adapted filter
    * (the fixture has no o_comment, so the excluded class is URGENT
    * orders): LEFT join customers to their qualifying orders — the join
    * predicate carries the exclusion so customers with zero qualifying
    * orders stay, landing in the c_count = 0 bucket — then a two-level
    * aggregate: per-customer count, then the histogram over counts. Scale:
    * orders shuffles once on o_custkey; the second aggregate groups the
    * per-customer frame (one row per customer) on the tiny count domain
    * with map-side partials. */
  def qTpchQ13(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir).select($"c_custkey")
      .join(Tables.orders(spark, dir)
              .filter($"o_orderpriority" =!= "1-URGENT")
              .select($"o_custkey", $"o_orderkey"),
            $"c_custkey" === $"o_custkey", "left")
      .groupBy($"c_custkey")
      .agg(count($"o_orderkey").as("c_count"))
      .groupBy($"c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy($"custdist".desc, $"c_count".desc)

  /** TPC-H Q15 shape (top supplier): quarterly revenue per supplier, keep
    * the max-revenue supplier(s) via an uncorrelated scalar subquery over
    * the same aggregate. Written as SQL so Catalyst plans the max as a
    * scalar subquery (a 1-row broadcast, not a join); the revenue CTE is
    * one partial+final hash aggregate over the date-pruned scan, reused by
    * both the listing and the max through plan-level CTE dedup. Revenue is
    * integer e4, so "equals the max" is exact — no FP-tie ambiguity. */
  def qTpchQ15(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir).createOrReplaceTempView("l_q15")
    Tables.supplier(spark, dir).createOrReplaceTempView("s_q15")
    spark.sql(
      """WITH revenue AS (
           SELECT l_suppkey,
             sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000)
                 AS BIGINT)) AS total_rev_e4
           FROM l_q15
           WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
             AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
           GROUP BY l_suppkey)
         SELECT s_suppkey, s_name, total_rev_e4
         FROM s_q15 JOIN revenue ON s_suppkey = l_suppkey
         WHERE total_rev_e4 = (SELECT max(total_rev_e4) FROM revenue)
         ORDER BY s_suppkey""")
  }

  /** TPC-H Q17 shape (small-quantity-order revenue), adapted selection
    * (the fixture has no p_container, so the part slice is brand + size):
    * lines whose quantity is below 20% of their part's corpus-wide average
    * quantity. The correlated avg is cross-multiplied into integers —
    * `5·qty·n < Σqty` ⟺ `qty < 0.2·avg` — so the boundary is exact in both
    * engines (an FP avg would flip boundary rows in the last ulp). Plan:
    * the per-part aggregate runs over the UNFILTERED fact table (the
    * correlation domain), joins the brand-filtered lines on l_partkey —
    * the one key both sides hash by — and collapses to a scalar; avg
    * yearly is the e4 sum div 7 (the fixture spans 7 ship years). */
  def qTpchQ17(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val perPart = li.groupBy($"l_partkey".as("pp_key"))
      .agg(sum(round($"l_quantity" * 100).cast("long")).as("sum_qc"),
           count(lit(1)).as("n_lines_part"))
    li.join(broadcast(Tables.part(spark, dir)
              .filter($"p_brand" === "Brand#13" && $"p_size" < 10)
              .select($"p_partkey")),
            $"l_partkey" === $"p_partkey")
      .join(perPart, $"l_partkey" === $"pp_key")
      .filter(round($"l_quantity" * 100).cast("long") * 5L * $"n_lines_part" <
        $"sum_qc")
      .agg(count(lit(1)).as("n_lines"),
           sum(round($"l_extendedprice" * 100).cast("long")).as("sum_price_c"))
      .withColumn("avg_yearly_c", expr("sum_price_c div 7"))
  }

  /** Nation-key slice standing in for Q22's phone country codes. */
  private val Q22Nations = Seq(1, 3, 5, 7, 9, 11, 13)

  /** TPC-H Q22 shape (global sales opportunity), adapted to the fixture
    * (no c_phone, so the "country code" is the nation key): customers in
    * seven nations with above-average positive account balance and no
    * orders at all, grouped by nation. The average is compared by integer
    * cross-multiplication (`bal_c·n > Σbal_c` over the positive-balance
    * slice) — exact in both engines. Catalyst plans the uncorrelated
    * aggregate as a scalar subquery (1-row broadcast) and the NOT EXISTS
    * as a left-anti join on o_custkey — both sides shuffle once on the
    * customer key. */
  def qTpchQ22(spark: SparkSession, dir: String): DataFrame = {
    Tables.customer(spark, dir).createOrReplaceTempView("c_q22")
    Tables.orders(spark, dir).createOrReplaceTempView("o_q22")
    val nats = Q22Nations.mkString(", ")
    spark.sql(
      s"""WITH pos AS (
            SELECT sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS s,
                   count(*) AS n
            FROM c_q22
            WHERE c_acctbal > 0.0 AND c_nationkey IN ($nats))
          SELECT c_nationkey AS cntrycode,
                 count(*) AS numcust,
                 sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS totacctbal_c
          FROM c_q22
          WHERE c_nationkey IN ($nats)
            AND CAST(round(c_acctbal * 100) AS BIGINT) * (SELECT n FROM pos)
                > (SELECT s FROM pos)
            AND NOT EXISTS (SELECT 1 FROM o_q22 WHERE o_custkey = c_custkey)
          GROUP BY c_nationkey
          ORDER BY c_nationkey""")
  }

  /** TPC-H Q12 shape (shipping-mode priority audit), adapted: the fixture
    * has no l_shipmode / l_commitdate / l_receiptdate, so the mode slice
    * is the return-flag classes ('R', 'A') and "late" is shipped more
    * than 90 days after the order date. The essential Q12 plan is kept:
    * ONE orders⋈lineitem equi-join on orderkey with the slice + ship-year
    * predicates pushed below the join (only the lateness comparison needs
    * both sides), and a two-way conditional count per class — priority
    * split as integer CASE sums, exact in both engines. */
  def qTpchQ12(spark: SparkSession, dir: String): DataFrame = {
    val urgent = $"o_orderpriority".isin("1-URGENT", "2-HIGH")
    Tables.lineitem(spark, dir)
      .filter($"l_returnflag".isin("R", "A") &&
              $"l_shipdate" >= lit("1997-01-01").cast("timestamp") &&
              $"l_shipdate" < lit("1998-01-01").cast("timestamp"))
      .join(Tables.orders(spark, dir), $"l_orderkey" === $"o_orderkey")
      .filter($"l_shipdate" > $"o_orderdate" + expr("INTERVAL 90 DAYS"))
      .groupBy($"l_returnflag")
      .agg(sum(when(urgent, 1L).otherwise(0L)).as("high_line_count"),
           sum(when(urgent, 0L).otherwise(1L)).as("low_line_count"))
      .orderBy($"l_returnflag")
  }

  // ---- Synthetic partsupp + the five partsupp-dependent TPC-H shapes -----

  /** Session-memoized supplier row count — the one bounded scalar the
    * synthetic partsupp derivation needs on the driver (same contract as
    * the z-order bounds cache in [[Advanced]]).
    *
    * WEAK-keyed by the session so the memo never pins a `SparkSession`
    * past its lifetime — a collected session's entries vanish with it.
    * Assumes the fixture under `dir` is immutable for the duration of a
    * session — the bench/verify harness never rewrites a fixture in
    * place; if data under `dir` changes mid-session the memo would serve
    * the count observed first (the oracle CTE recomputes count(*) live). */
  private val supplierCntCache =
    new java.util.WeakHashMap[SparkSession, scala.collection.mutable.Map[String, Long]]()
  private def supplierCount(spark: SparkSession, dir: String): Long =
    supplierCntCache.synchronized {
      val perDir = Option(supplierCntCache.get(spark)).getOrElse {
        val m = scala.collection.mutable.Map.empty[String, Long]
        supplierCntCache.put(spark, m)
        m
      }
      perDir.getOrElseUpdate(dir, Tables.supplier(spark, dir).count())
    }

  /** Deterministic synthetic `partsupp` relation — the fixture set ships
    * no partsupp.parquet, so the five partsupp-dependent TPC-H shapes
    * (Q2/Q9/Q11/Q16/Q20) derive one from `part` × the supplier count:
    * 4 supplier slots per part, `ps_suppkey = (p·4 + i) mod S + 1`
    * (4 consecutive-mod-S slots — always distinct for S ≥ 4; a
    * simplification of dbgen's strided permutation that keeps the
    * part→supplier fan-out and the supplier load uniform), and integer
    * availqty / supplycost-in-cents formulas over (partkey, suppkey).
    * The SAME arithmetic is emitted in the oracle CTE
    * ([[sqlPartsuppCte]]), so both engines materialize the identical
    * relation and the queries hash-match — the fixture gap costs no
    * correctness coverage.
    *
    * Scale: a narrow projection + 4-way explode of `part` — shuffle-free,
    * codegen'd, nothing but the supplier COUNT (bounded scalar,
    * session-memoized) on the driver. At 100 TB a real partsupp would be
    * a stored table bucketed on ps_partkey; the consuming queries below
    * are written against the relation's columns only, so swapping the
    * derivation for a scan changes no plan above it. */
  private[queries] def partsuppSyn(spark: SparkSession, dir: String): DataFrame = {
    val s = supplierCount(spark, dir)
    Tables.part(spark, dir)
      .select($"p_partkey", explode(array((0L until 4L).map(lit): _*)).as("i"))
      .select($"p_partkey".as("ps_partkey"),
        (($"p_partkey" * 4L + $"i") % s + 1L).as("ps_suppkey"))
      .select($"ps_partkey", $"ps_suppkey",
        (($"ps_partkey" * 37L + $"ps_suppkey" * 17L) % 9999L + 1L)
          .as("ps_availqty"),
        (($"ps_partkey" * 31L + $"ps_suppkey" * 83L) % 99900L + 100L)
          .as("ps_supplycost_c"))
  }

  /** DuckDB twin of [[partsuppSyn]] — two CTEs ending in
    * `partsupp(ps_partkey, ps_suppkey, ps_availqty, ps_supplycost_c)`. */
  private val sqlPartsuppCte: String =
    """ps0 AS (
         SELECT p_partkey AS ps_partkey,
           (p_partkey * 4 + i) % (SELECT count(*) FROM supplier) + 1
             AS ps_suppkey
         FROM part CROSS JOIN (VALUES (0),(1),(2),(3)) gen(i)),
       partsupp AS (
         SELECT ps_partkey, ps_suppkey,
           (ps_partkey * 37 + ps_suppkey * 17) % 9999 + 1 AS ps_availqty,
           (ps_partkey * 31 + ps_suppkey * 83) % 99900 + 100
             AS ps_supplycost_c
         FROM ps0)"""

  /** TPC-H Q2 shape (minimum-cost supplier): for each European-supplied
    * part in a size/type slice, every European supplier whose cost equals
    * that part's regional minimum (ties kept, per the spec). Adapted
    * columns: the fixture has no p_mfgr / s_address / s_phone / s_comment,
    * so the output is the supplier/nation/part identity + the winning
    * cost; acctbal exported in cents. The size slice is a narrow BETWEEN
    * (14..16) rather than TPC-H's single literal so the result is
    * non-empty at every fixture SF (pinned by [[PartsuppSpec]]) and the
    * hash gate exercises the min-cost tie join and LIMIT ordering for
    * real.
    *
    * Scale: region→nation→supplier collapses to ONE broadcast dim;
    * partsupp joins it map-side, then the per-part min aggregate and the
    * min-match self-join both hash on ps_partkey — the one key the data
    * already carries. The part slice is a second broadcast. No fact-sized
    * shuffle happens twice on different keys. */
  def qTpchQ2(spark: SparkSession, dir: String): DataFrame = {
    val eurSupp = broadcast(
      Tables.supplier(spark, dir)
        .join(broadcast(Tables.nation(spark, dir)
            .join(broadcast(Tables.region(spark, dir)
                    .filter($"r_name" === "EUROPE")),
                  $"n_regionkey" === $"r_regionkey")
            .select($"n_nationkey", $"n_name")),
          $"s_nationkey" === $"n_nationkey")
        .select($"s_suppkey", $"s_name", $"s_acctbal", $"n_name"))
    val cost = partsuppSyn(spark, dir)
      .join(eurSupp, $"ps_suppkey" === $"s_suppkey")
    val minCost = cost.groupBy($"ps_partkey".as("mc_key"))
      .agg(min($"ps_supplycost_c").as("min_cost_c"))
    cost
      .join(broadcast(Tables.part(spark, dir)
              .filter($"p_size".between(14, 16) && $"p_type".like("%AR%"))
              .select($"p_partkey", $"p_type")),
            $"ps_partkey" === $"p_partkey")
      .join(minCost,
            $"ps_partkey" === $"mc_key" && $"ps_supplycost_c" === $"min_cost_c")
      .select(round($"s_acctbal" * 100).cast("long").as("s_acctbal_c"),
        $"s_name", $"n_name", $"p_partkey", $"p_type", $"ps_supplycost_c")
      .orderBy($"s_acctbal_c".desc, $"n_name", $"s_name", $"p_partkey")
      .limit(100)
  }

  /** TPC-H Q9 shape (product-type profit): per nation × order year, the
    * profit on 'red' parts — revenue minus supply cost, all in integer e4
    * (revenue via the shared rounding convention; cost = cents × integer
    * centi-quantity, exact in both engines).
    *
    * Scale: the part slice prunes partsupp FIRST (broadcast — the same
    * filtered-part-dim convention as Q17), so the fact join sees only the
    * slice's (part, supp) rows. That join carries NO broadcast hint:
    * partsupp is fact-shaped (4×|part|), so AQE broadcasts the pruned
    * side while it fits and falls back to a composite-key shuffle join at
    * scale — where both sides hash on (partkey, suppkey), the natural
    * bucketing key of a stored partsupp. Supplier/nation broadcast; the
    * only other fact shuffle is lineitem⋈orders on orderkey, the same key
    * Q3/Q5 shuffle on. */
  def qTpchQ9(spark: SparkSession, dir: String): DataFrame = {
    val redPs = partsuppSyn(spark, dir)
      .join(broadcast(Tables.part(spark, dir)
              .filter($"p_name".contains("red")).select($"p_partkey")),
            $"ps_partkey" === $"p_partkey")
      .select($"ps_partkey", $"ps_suppkey", $"ps_supplycost_c")
    Tables.lineitem(spark, dir)
      .join(redPs,
            $"l_partkey" === $"ps_partkey" && $"l_suppkey" === $"ps_suppkey")
      .join(broadcast(Tables.supplier(spark, dir)
              .select($"s_suppkey", $"s_nationkey")),
            $"l_suppkey" === $"s_suppkey")
      .join(broadcast(Tables.nation(spark, dir)
              .select($"n_nationkey", $"n_name")),
            $"s_nationkey" === $"n_nationkey")
      .join(Tables.orders(spark, dir)
              .select($"o_orderkey", year($"o_orderdate").cast("long").as("o_year")),
            $"l_orderkey" === $"o_orderkey")
      .groupBy($"n_name", $"o_year")
      .agg(sum(
        round($"l_extendedprice" * (lit(1.0) - $"l_discount") * 10000).cast("long")
          - $"ps_supplycost_c" * round($"l_quantity" * 100).cast("long"))
        .as("profit_e4"))
      .orderBy($"n_name", $"o_year".desc)
  }

  /** TPC-H Q11 shape (important stock): one nation's stock value per part
    * (cost-in-cents × availqty — pure integers), keeping parts above 0.1%
    * of that nation's total. The uncorrelated total plans as a scalar
    * subquery (1-row broadcast, like Q15/Q22) — never a driver loop.
    * Scale: partsupp ⋈ broadcast(nation's suppliers) map-side, one hash
    * aggregate on ps_partkey, and the ≤|parts|-row value frame is what
    * the scalar subquery and the filter both read. */
  def qTpchQ11(spark: SparkSession, dir: String): DataFrame = {
    partsuppSyn(spark, dir).createOrReplaceTempView("ps_q11")
    Tables.supplier(spark, dir).createOrReplaceTempView("s_q11")
    Tables.nation(spark, dir).createOrReplaceTempView("n_q11")
    spark.sql(
      """WITH v AS (
           SELECT ps_partkey,
             CAST(sum(ps_supplycost_c * ps_availqty) AS BIGINT) AS value_c
           FROM ps_q11
           JOIN s_q11 ON ps_suppkey = s_suppkey
           JOIN n_q11 ON s_nationkey = n_nationkey
           WHERE n_name = 'NATION_7'
           GROUP BY ps_partkey)
         SELECT ps_partkey, value_c FROM v
         WHERE value_c * 1000 > (SELECT CAST(sum(value_c) AS BIGINT) FROM v)
         ORDER BY value_c DESC, ps_partkey""")
  }

  /** TPC-H Q16 shape (supplier count by part attributes): distinct
    * suppliers per (brand, type, size) over a brand/type/size slice,
    * excluding flagged suppliers (the fixture has no s_comment, so the
    * 'complaints' exclusion is adapted to negative account balance —
    * same anti-join shape). Scale: the flagged-supplier set is a
    * broadcast ANTI join (bounded: suppliers are a dim); the part slice
    * broadcasts; one Expand-free distinct aggregate hashed on the 3-col
    * group key. */
  def qTpchQ16(spark: SparkSession, dir: String): DataFrame =
    partsuppSyn(spark, dir)
      .join(broadcast(Tables.supplier(spark, dir)
              .filter($"s_acctbal" < 0).select($"s_suppkey")),
            $"ps_suppkey" === $"s_suppkey", "left_anti")
      .join(broadcast(Tables.part(spark, dir)
              .filter($"p_brand" =!= "Brand#13" && !$"p_type".like("MEDIUM%") &&
                      $"p_size".isin(1, 5, 15, 25, 35, 45))
              .select($"p_partkey", $"p_brand", $"p_type", $"p_size")),
            $"ps_partkey" === $"p_partkey")
      .groupBy($"p_brand", $"p_type", $"p_size")
      .agg(countDistinct($"ps_suppkey").as("supplier_cnt"))
      .orderBy($"supplier_cnt".desc, $"p_brand", $"p_type", $"p_size")

  /** TPC-H Q20 shape (excess-stock suppliers): suppliers in one nation
    * holding more than half a year's shipped quantity of any 'red' part.
    * The half-of-shipped comparison is cross-multiplied into integers
    * (availqty·200 > Σ centi-qty ⟺ availqty > 0.5·Σqty); (part, supp)
    * pairs with NO shipments qualify trivially via COALESCE 0 — the
    * convention is declared identically in the oracle, so the boundary
    * cannot drift between engines.
    *
    * Scale: the part slice broadcasts into BOTH the lineitem aggregate
    * (pre-aggregation pruning — only red parts' lines shuffle) and the
    * partsupp probe; the shipped aggregate and the availqty probe join on
    * the SAME composite key they were hashed by; the surviving supplier
    * ids collapse to a distinct set far smaller than the supplier dim. */
  def qTpchQ20(spark: SparkSession, dir: String): DataFrame = {
    val redParts = broadcast(Tables.part(spark, dir)
      .filter($"p_name".like("red%")).select($"p_partkey"))
    val shipped = Tables.lineitem(spark, dir)
      .filter($"l_shipdate" >= lit("1997-01-01").cast("timestamp") &&
              $"l_shipdate" < lit("1998-01-01").cast("timestamp"))
      .join(redParts, $"l_partkey" === $"p_partkey")
      .groupBy($"l_partkey", $"l_suppkey")
      .agg(sum(round($"l_quantity" * 100).cast("long")).as("sum_qc"))
    val excess = partsuppSyn(spark, dir)
      .join(redParts, $"ps_partkey" === $"p_partkey")
      .join(shipped,
            $"ps_partkey" === $"l_partkey" && $"ps_suppkey" === $"l_suppkey",
            "left")
      .filter($"ps_availqty" * 200L > coalesce($"sum_qc", lit(0L)))
      .select($"ps_suppkey").distinct()
    Tables.supplier(spark, dir)
      .join(excess, $"s_suppkey" === $"ps_suppkey", "left_semi")
      .join(broadcast(Tables.nation(spark, dir)
              .filter($"n_name" === "NATION_3")
              .select($"n_nationkey", $"n_name")),
            $"s_nationkey" === $"n_nationkey")
      .select($"s_suppkey", $"s_name", $"n_name")
      .orderBy($"s_suppkey")
  }

  /** UNPIVOT (melt) — the inverse of the pivot the engine already covers:
    * wide metric columns become (metric, value) rows via Spark's `unpivot`,
    * which plans as an `Expand` (a narrow ×k row multiplication, NO
    * shuffle, no join), then a partial+final hash aggregate summarizes per
    * metric. Values are pre-cast to integer cents so the melted column has
    * one type and the sums are order-independent. */
  def qUnpivot(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select($"l_orderkey",
        round($"l_quantity" * 100).cast("long").as("quantity_c"),
        round($"l_extendedprice" * 100).cast("long").as("price_c"),
        round($"l_tax" * 100).cast("long").as("tax_c"))
      .unpivot(Array($"l_orderkey"),
               Array($"quantity_c", $"price_c", $"tax_c"), "metric", "value_c")
      .groupBy($"metric")
      .agg(count(lit(1)).as("n"), sum($"value_c").as("sum_c"),
           min($"value_c").as("min_c"), max($"value_c").as("max_c"))
      .orderBy($"metric")

  /** Window frames beyond the round-1 battery: a RANGE frame (trailing
    * 30-day revenue per customer on an integer day axis) plus the value
    * window functions (first_value / nth_value / lead / lag). One shuffle
    * on o_custkey; all five functions share the same sort. */
  def qWindowFrames(spark: SparkSession, dir: String): DataFrame = {
    // o_orderdate is TIMESTAMP_NTZ; the integer day axis comes from date
    // arithmetic (exact in both engines) rather than epoch micros.
    val o = Tables.orders(spark, dir)
      .withColumn("day",
        datediff($"o_orderdate".cast("date"), lit("1970-01-01").cast("date")).cast("long"))
      .withColumn("price_c", round($"o_totalprice" * 100).cast("long"))
    val byDay = Window.partitionBy($"o_custkey").orderBy($"day", $"o_orderkey")
    val running = byDay.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val trail30 = Window.partitionBy($"o_custkey").orderBy($"day").rangeBetween(-30, 0)
    o.select($"o_custkey", $"o_orderkey", $"day",
        sum($"price_c").over(trail30).as("trail30_c"),
        first($"price_c").over(running).as("first_c"),
        nth_value($"price_c", 2).over(running).as("second_c"),
        lead($"o_orderkey", 1).over(byDay).as("next_order"),
        lag($"o_orderkey", 1).over(byDay).as("prev_order"))
  }

  /** Statistical aggregates (Welford-style accumulators in both engines);
    * rounded to 4 decimals on both sides so last-ulp accumulation noise
    * cannot flip the hash compare (same discipline as q1_agg's avg). */
  def qStatAggs(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy($"l_returnflag")
      .agg(
        round(stddev_samp($"l_quantity"), 4).as("sd_qty"),
        round(var_samp($"l_quantity"), 4).as("var_qty"),
        round(corr($"l_quantity", $"l_extendedprice"), 4).as("corr_qty_price"),
        round(covar_samp($"l_quantity", $"l_discount"), 4).as("covar_qty_disc"),
        count(lit(1)).as("n"))
      .orderBy($"l_returnflag")

  /** Array higher-order functions over per-order quantity lists: aggregate
    * (fold), filter, transform + array_join — all codegen-friendly
    * built-ins, exported as scalars/CSV so the result is hash-comparable.
    * Scale: one shuffle (the groupBy); the HOFs are per-row projections. */
  def qArrayFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .withColumn("q", round($"l_quantity").cast("long"))
      .groupBy($"l_orderkey")
      .agg(sort_array(collect_list($"q")).as("qs"))
      .select($"l_orderkey",
        size($"qs").cast("long").as("n"),
        aggregate($"qs", lit(0L), (acc, x) => acc + x).as("sum_q"),
        array_max($"qs").as("max_q"),
        size(filter($"qs", _ > 25)).cast("long").as("n_over25"),
        array_join(transform($"qs", x => (x * 2).cast("string")), ",").as("doubled_csv"))

  /** Map functions: per-order map of linenumber → max quantity via
    * map_from_entries, probed with element_at / size. Keys are aggregated
    * unique first (the fixture repeats linenumbers within an order — a
    * duplicate key would fail map construction under Spark's EXCEPTION
    * dedup policy). The oracle computes the same VALUES without map types
    * (conditional aggregates), proving the map semantics against a
    * map-free formulation. */
  def qMapFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy($"l_orderkey", $"l_linenumber")
      .agg(max(round($"l_quantity").cast("long")).as("q"))
      .groupBy($"l_orderkey")
      .agg(map_from_entries(
        sort_array(collect_list(struct($"l_linenumber", $"q")))).as("m"))
      .select($"l_orderkey",
        size($"m").cast("long").as("n_keys"),
        element_at($"m", 1).as("q1"),
        coalesce(element_at($"m", 3), lit(-1L)).as("q3"))

  /** String aggregation (LISTAGG semantics): deterministic sorted-distinct
    * concatenation per group — `collect_set` stays bounded by the value
    * domain, so the aggregate buffer cannot blow up with group size. */
  def qStringAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy($"o_orderpriority")
      .agg(
        array_join(sort_array(collect_set($"o_orderstatus")), ",").as("statuses"),
        countDistinct($"o_orderstatus").as("n_statuses"))
      .orderBy($"o_orderpriority")

  /** unionByName with missing-column tolerance — the schema-evolution-safe
    * append: columns align by NAME (not position) and columns absent from
    * one side null-fill, exactly what appending newer-schema files to an
    * older table needs. */
  def qUnionByName(spark: SparkSession, dir: String): DataFrame = {
    val oldRows = Tables.orders(spark, dir)
      .filter($"o_orderkey" % 100 === 0)
      .select($"o_orderkey", $"o_orderstatus")
    val newRows = Tables.orders(spark, dir)
      .filter($"o_orderkey" % 100 === 1)
      .select($"o_orderstatus", $"o_orderkey", // reordered on purpose
        round($"o_totalprice" * 100).cast("long").as("price_c"))
    oldRows.unionByName(newRows, allowMissingColumns = true)
      .orderBy($"o_orderkey")
  }

  /** The declared foreign-key relationships of the fixture schema:
    * (name, child table, FK column, parent table, PK column). */
  private val FkRelations: Seq[(String, String, String, String, String)] = Seq(
    ("lineitem.orderkey", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem.partkey", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem.suppkey", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders.custkey", "orders", "o_custkey", "customer", "c_custkey"),
    ("customer.nationkey", "customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier.nationkey", "supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation.regionkey", "nation", "n_regionkey", "region", "r_regionkey"))

  /** Referential-integrity audit — the data-quality gate a pipeline runs
    * before trusting any join-shaped metric (an orphaned FK silently drops
    * rows from every inner join downstream): for each declared
    * relationship, child row count, orphan rows (FK value absent from the
    * parent), distinct orphan keys, and the pass verdict.
    *
    * Plan per relationship: the child projects ONE column, LEFT-joins the
    * parent's distinct key (broadcast for the dimension parents; shuffle
    * equi-join for the big-big lineitem→orders pair), and aggregates null
    * hits — one pass per child, no collect. The ≤7-row union is the
    * report. NULL FKs count as orphans here (the fixture schema declares
    * them NOT NULL, so a null IS a violation). */
  /** One relationship's audit row — the frame-parametric core, split out
    * so the spec can prove orphan detection on a fixture that actually
    * CONTAINS violations (the TPC-H-shaped fixture is referentially
    * clean, so the registry run exercises the all-green path). */
  private[graft] def refintRow(
      name: String, child: DataFrame, fk: String,
      parent: DataFrame, pk: String): DataFrame =
    child.select(col(fk).as("__fk"))
      .join(parent.select(col(pk).as("__pk")).distinct(),
            $"__fk" === $"__pk", "left")
      .agg(count(lit(1)).as("n_child"),
           sum(when($"__pk".isNull, 1L).otherwise(0L)).as("n_orphan"),
           countDistinct(when($"__pk".isNull, $"__fk")).as("n_orphan_keys"))
      .select(lit(name).as("rel"), $"n_child", $"n_orphan", $"n_orphan_keys",
        ($"n_orphan" === 0L).as("ok"))

  def qDqRefint(spark: SparkSession, dir: String): DataFrame =
    FkRelations.map { case (name, child, fk, parent, pk) =>
      refintRow(name, Tables(spark, dir, child), fk,
                Tables(spark, dir, parent), pk)
    }.reduce(_ unionAll _)

  val registry: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_dq_refint"       -> qDqRefint _,
    "q_union_by_name"   -> qUnionByName _,
    "q_string_agg"      -> qStringAgg _,
    "q_exists"          -> qExists _,
    "q_scalar_subquery" -> qScalarSubquery _,
    "q_tpch_q3"         -> qTpchQ3 _,
    "q_tpch_q5"         -> qTpchQ5 _,
    "q_tpch_q10"        -> qTpchQ10 _,
    "q_tpch_q18"        -> qTpchQ18 _,
    "q_tpch_q7"         -> qTpchQ7 _,
    "q_tpch_q21"        -> qTpchQ21 _,
    "q_tpch_q21_win"    -> qTpchQ21Win _,
    "q_tpch_q14"        -> qTpchQ14 _,
    "q_tpch_q19"        -> qTpchQ19 _,
    "q_tpch_q4"         -> qTpchQ4 _,
    "q_tpch_q6"         -> qTpchQ6 _,
    "q_tpch_q13"        -> qTpchQ13 _,
    "q_tpch_q15"        -> qTpchQ15 _,
    "q_tpch_q17"        -> qTpchQ17 _,
    "q_tpch_q22"        -> qTpchQ22 _,
    "q_tpch_q8"         -> qTpchQ8 _,
    "q_tpch_q2"         -> qTpchQ2 _,
    "q_tpch_q9"         -> qTpchQ9 _,
    "q_tpch_q11"        -> qTpchQ11 _,
    "q_tpch_q16"        -> qTpchQ16 _,
    "q_tpch_q20"        -> qTpchQ20 _,
    "q_tpch_q12"        -> qTpchQ12 _,
    "q_profile"         -> qProfile _,
    "q_unpivot"         -> qUnpivot _,
    "q_window_frames"   -> qWindowFrames _,
    "q_stat_aggs"       -> qStatAggs _,
    "q_array_funcs"     -> qArrayFuncs _,
    "q_map_funcs"       -> qMapFuncs _,
  )

  private val RevenueSql =
    "CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS BIGINT)"

  /** The doubly-correlated Q21 quantifier SQL — shared verbatim by the
    * decorrelated form and the one-shuffle window rewrite, so the rewrite
    * can never drift from the quantifier semantics. */
  private val TpchQ21OracleSql: String =
    """SELECT s_name, count(*) AS numwait
       FROM supplier, lineitem l1, orders
       WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
         AND o_orderstatus = 'F'
         AND EXISTS (SELECT 1 FROM lineitem l2
                     WHERE l2.l_orderkey = l1.l_orderkey
                       AND l2.l_suppkey <> l1.l_suppkey)
         AND NOT EXISTS (SELECT 1 FROM lineitem l3
                         WHERE l3.l_orderkey = l1.l_orderkey
                           AND l3.l_suppkey <> l1.l_suppkey
                           AND l3.l_shipdate > l1.l_shipdate)
       GROUP BY s_name
       ORDER BY numwait DESC, s_name"""

  val oracles: Map[String, String] = Map(
    "q_dq_refint" -> FkRelations.map { case (name, child, fk, parent, pk) =>
      s"""SELECT '$name' AS rel, count(*) AS n_child,
            CAST(sum(CASE WHEN p.__pk IS NULL THEN 1 ELSE 0 END) AS BIGINT)
              AS n_orphan,
            CAST(count(DISTINCT CASE WHEN p.__pk IS NULL THEN c.$fk END)
              AS BIGINT) AS n_orphan_keys,
            sum(CASE WHEN p.__pk IS NULL THEN 1 ELSE 0 END) = 0 AS ok
          FROM $child c
          LEFT JOIN (SELECT DISTINCT $pk AS __pk FROM $parent) p
            ON c.$fk = p.__pk"""
    }.mkString("\nUNION ALL\n"),
    "q_unpivot" ->
      """WITH m AS (
           SELECT 'quantity_c' AS metric,
             CAST(round(l_quantity * 100) AS BIGINT) AS value_c FROM lineitem
           UNION ALL SELECT 'price_c',
             CAST(round(l_extendedprice * 100) AS BIGINT) FROM lineitem
           UNION ALL SELECT 'tax_c',
             CAST(round(l_tax * 100) AS BIGINT) FROM lineitem)
         SELECT metric, count(*) AS n, CAST(sum(value_c) AS BIGINT) AS sum_c,
           min(value_c) AS min_c, max(value_c) AS max_c
         FROM m GROUP BY 1 ORDER BY 1""",
    "q_profile" -> {
      val numSelects = ProfileNumCols.map { c =>
        s"""SELECT '$c' AS col_name, count(*) AS n_rows,
            CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
            count(DISTINCT $c) AS n_distinct,
            min(CAST(round($c * 100) AS BIGINT)) AS min_num_c,
            max(CAST(round($c * 100) AS BIGINT)) AS max_num_c,
            CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str
            FROM lineitem"""
      }
      val strSelects = ProfileStrCols.map { c =>
        s"""SELECT '$c' AS col_name, count(*) AS n_rows,
            CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
            count(DISTINCT $c) AS n_distinct,
            CAST(NULL AS BIGINT) AS min_num_c, CAST(NULL AS BIGINT) AS max_num_c,
            min($c) AS min_str, max($c) AS max_str
            FROM lineitem"""
      }
      (numSelects ++ strSelects).mkString("SELECT * FROM (\n", "\nUNION ALL\n",
        "\n) ORDER BY col_name")
    },
    "q_tpch_q12" ->
      """SELECT l_returnflag,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         WHERE l_returnflag IN ('R', 'A')
           AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
           AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
           AND l_shipdate > o_orderdate + INTERVAL 90 DAY
         GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q_tpch_q2" ->
      s"""WITH $sqlPartsuppCte,
          eur AS (
            SELECT s_suppkey, s_name, s_acctbal, n_name
            FROM supplier
            JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            WHERE r_name = 'EUROPE'),
          cost AS (
            SELECT ps_partkey, ps_supplycost_c, s_name, s_acctbal, n_name
            FROM partsupp JOIN eur ON ps_suppkey = s_suppkey),
          mc AS (SELECT ps_partkey AS mc_key,
                   min(ps_supplycost_c) AS min_cost_c
                 FROM cost GROUP BY 1)
          SELECT CAST(round(s_acctbal * 100) AS BIGINT) AS s_acctbal_c,
            s_name, n_name, p_partkey, p_type,
            CAST(ps_supplycost_c AS BIGINT) AS ps_supplycost_c
          FROM cost
          JOIN part ON ps_partkey = p_partkey
            AND p_size BETWEEN 14 AND 16 AND p_type LIKE '%AR%'
          JOIN mc ON ps_partkey = mc_key AND ps_supplycost_c = min_cost_c
          ORDER BY s_acctbal_c DESC, n_name, s_name, p_partkey
          LIMIT 100""",
    "q_tpch_q9" ->
      s"""WITH $sqlPartsuppCte,
          red AS (SELECT p_partkey FROM part WHERE p_name LIKE '%red%'),
          j AS (
            SELECT n_name, CAST(year(o_orderdate) AS BIGINT) AS o_year,
              CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)
                - ps_supplycost_c * CAST(round(l_quantity * 100) AS BIGINT)
                AS amount_e4
            FROM lineitem
            JOIN partsupp ON l_partkey = ps_partkey AND l_suppkey = ps_suppkey
            JOIN red ON ps_partkey = red.p_partkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            JOIN orders ON l_orderkey = o_orderkey)
          SELECT n_name, o_year, CAST(sum(amount_e4) AS BIGINT) AS profit_e4
          FROM j GROUP BY 1, 2 ORDER BY n_name, o_year DESC""",
    "q_tpch_q11" ->
      s"""WITH $sqlPartsuppCte,
          v AS (
            SELECT ps_partkey,
              CAST(sum(ps_supplycost_c * ps_availqty) AS BIGINT) AS value_c
            FROM partsupp
            JOIN supplier ON ps_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            WHERE n_name = 'NATION_7'
            GROUP BY ps_partkey)
          SELECT ps_partkey, value_c FROM v
          WHERE value_c * 1000 > (SELECT CAST(sum(value_c) AS BIGINT) FROM v)
          ORDER BY value_c DESC, ps_partkey""",
    "q_tpch_q16" ->
      s"""WITH $sqlPartsuppCte
          SELECT p_brand, p_type, p_size,
            count(DISTINCT ps_suppkey) AS supplier_cnt
          FROM partsupp JOIN part ON ps_partkey = p_partkey
          WHERE p_brand <> 'Brand#13' AND p_type NOT LIKE 'MEDIUM%'
            AND p_size IN (1, 5, 15, 25, 35, 45)
            AND ps_suppkey NOT IN
              (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
          GROUP BY 1, 2, 3
          ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""",
    "q_tpch_q20" ->
      s"""WITH $sqlPartsuppCte,
          red AS (SELECT p_partkey FROM part WHERE p_name LIKE 'red%'),
          shipped AS (
            SELECT l_partkey, l_suppkey,
              CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT)
                AS sum_qc
            FROM lineitem JOIN red ON l_partkey = red.p_partkey
            WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
              AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
            GROUP BY 1, 2),
          excess AS (
            SELECT DISTINCT ps_suppkey
            FROM partsupp
            JOIN red ON ps_partkey = red.p_partkey
            LEFT JOIN shipped
              ON ps_partkey = l_partkey AND ps_suppkey = l_suppkey
            WHERE ps_availqty * 200 > COALESCE(sum_qc, 0))
          SELECT s_suppkey, s_name, n_name
          FROM supplier
          JOIN excess ON s_suppkey = ps_suppkey
          JOIN nation ON s_nationkey = n_nationkey
          WHERE n_name = 'NATION_3'
          ORDER BY s_suppkey""",
    "q_tpch_q7" ->
      """WITH flow AS (
           SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(year(l_shipdate) AS BIGINT) AS l_year,
             CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT) AS rev
           FROM lineitem
           JOIN supplier ON l_suppkey = s_suppkey
           JOIN orders ON l_orderkey = o_orderkey
           JOIN customer ON o_custkey = c_custkey
           JOIN nation n1 ON s_nationkey = n1.n_nationkey
           JOIN nation n2 ON c_nationkey = n2.n_nationkey
           WHERE n1.n_name IN ('NATION_3', 'NATION_7')
             AND n2.n_name IN ('NATION_3', 'NATION_7')
             AND n1.n_name <> n2.n_name)
         SELECT supp_nation, cust_nation, l_year,
           CAST(sum(rev) AS BIGINT) AS revenue_e4
         FROM flow GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""",
    "q_tpch_q8" ->
      """WITH flow AS (
           SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
             n2.n_name AS supp_nation,
             CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)
               AS rev
           FROM lineitem
           JOIN part ON l_partkey = p_partkey
           JOIN orders ON l_orderkey = o_orderkey
           JOIN customer ON o_custkey = c_custkey
           JOIN nation n1 ON c_nationkey = n1.n_nationkey
           JOIN region ON n1.n_regionkey = r_regionkey
           JOIN supplier ON l_suppkey = s_suppkey
           JOIN nation n2 ON s_nationkey = n2.n_nationkey
           WHERE p_type = 'PROMO' AND r_name = 'ASIA'
             AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
             AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00')
         SELECT o_year,
           CAST(sum(CASE WHEN supp_nation = 'NATION_2' THEN rev ELSE 0 END)
             AS BIGINT) AS nation_rev_e4,
           CAST(sum(rev) AS BIGINT) AS total_rev_e4,
           CAST(sum(CASE WHEN supp_nation = 'NATION_2' THEN rev ELSE 0 END)
             * 10000 // sum(rev) AS BIGINT) AS mkt_share_e4
         FROM flow GROUP BY o_year ORDER BY o_year""",
    "q_tpch_q14" ->
      """WITH m AS (
           SELECT CAST(round(l_extendedprice * (1.0 - l_discount) * 10000)
                    AS BIGINT) AS rev, p_type
           FROM lineitem JOIN part ON l_partkey = p_partkey
           WHERE l_shipdate >= TIMESTAMP '1997-03-01 00:00:00'
             AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00')
         SELECT
           CAST(sum(CASE WHEN p_type = 'PROMO' THEN rev ELSE 0 END) AS BIGINT)
             AS promo_rev_e4,
           CAST(sum(rev) AS BIGINT) AS total_rev_e4,
           CAST(sum(CASE WHEN p_type = 'PROMO' THEN rev ELSE 0 END) * 10000
                // sum(rev) AS BIGINT) AS promo_share_e4
         FROM m""",
    "q_tpch_q6" ->
      """SELECT count(*) AS n_lines,
           CAST(sum(CAST(round(l_extendedprice * l_discount * 10000) AS BIGINT))
             AS BIGINT) AS revenue_e4
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
           AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
           AND l_discount BETWEEN 0.05 AND 0.07
           AND l_quantity < 24""",
    "q_tpch_q4" ->
      """SELECT o_orderpriority, count(*) AS order_count
         FROM orders
         WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
           AND o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
           AND EXISTS (SELECT 1 FROM lineitem
                       WHERE l_orderkey = o_orderkey
                         AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
         GROUP BY o_orderpriority
         ORDER BY o_orderpriority""",
    "q_tpch_q13" ->
      """WITH per_cust AS (
           SELECT c_custkey, count(o_orderkey) AS c_count
           FROM customer LEFT JOIN orders
             ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
           GROUP BY c_custkey)
         SELECT c_count, count(*) AS custdist
         FROM per_cust
         GROUP BY c_count
         ORDER BY custdist DESC, c_count DESC""",
    "q_tpch_q15" ->
      """WITH revenue AS (
           SELECT l_suppkey,
             CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000)
                 AS BIGINT)) AS BIGINT) AS total_rev_e4
           FROM lineitem
           WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
             AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
           GROUP BY l_suppkey)
         SELECT s_suppkey, s_name, total_rev_e4
         FROM supplier JOIN revenue ON s_suppkey = l_suppkey
         WHERE total_rev_e4 = (SELECT max(total_rev_e4) FROM revenue)
         ORDER BY s_suppkey""",
    "q_tpch_q17" ->
      """WITH per_part AS (
           SELECT l_partkey AS pp_key,
             CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sum_qc,
             count(*) AS n_lines_part
           FROM lineitem GROUP BY 1),
         m AS (
           SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS price_c
           FROM lineitem
           JOIN part ON l_partkey = p_partkey
           JOIN per_part ON l_partkey = pp_key
           WHERE p_brand = 'Brand#13' AND p_size < 10
             AND CAST(round(l_quantity * 100) AS BIGINT) * 5 * n_lines_part
                 < sum_qc)
         SELECT count(*) AS n_lines,
           CAST(sum(price_c) AS BIGINT) AS sum_price_c,
           CAST(sum(price_c) // 7 AS BIGINT) AS avg_yearly_c
         FROM m""",
    "q_tpch_q22" -> {
      val nats = Q22Nations.mkString(", ")
      s"""WITH pos AS (
            SELECT CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS s,
                   count(*) AS n
            FROM customer
            WHERE c_acctbal > 0.0 AND c_nationkey IN ($nats))
          SELECT c_nationkey AS cntrycode,
                 count(*) AS numcust,
                 CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT)
                   AS totacctbal_c
          FROM customer
          WHERE c_nationkey IN ($nats)
            AND CAST(round(c_acctbal * 100) AS BIGINT) * (SELECT n FROM pos)
                > (SELECT s FROM pos)
            AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
          GROUP BY c_nationkey
          ORDER BY c_nationkey"""
    },
    "q_tpch_q19" ->
      """SELECT count(*) AS n_lines,
           CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 10000)
                    AS BIGINT)) AS BIGINT) AS revenue_e4
         FROM lineitem JOIN part ON l_partkey = p_partkey
         WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
                AND l_quantity BETWEEN 1 AND 20)
            OR (p_brand = 'Brand#13' AND p_size BETWEEN 10 AND 30
                AND l_quantity BETWEEN 10 AND 30)
            OR (p_brand = 'Brand#20' AND p_size BETWEEN 20 AND 50
                AND l_quantity BETWEEN 20 AND 40)""",
    "q_tpch_q21" -> TpchQ21OracleSql,
    // The window rewrite must stay bit-equivalent to the quantifier
    // semantics — same oracle, re-derived from first principles.
    "q_tpch_q21_win" -> TpchQ21OracleSql,
    "q_tpch_q18" ->
      """WITH big AS (
           SELECT l_orderkey,
             CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sum_qty_c
           FROM lineitem GROUP BY 1
           HAVING sum(CAST(round(l_quantity * 100) AS BIGINT)) > 30000)
         SELECT c_name, c_custkey, o_orderkey, o_orderdate,
           CAST(round(o_totalprice * 100) AS BIGINT) AS price_c, sum_qty_c
         FROM orders JOIN big ON o_orderkey = l_orderkey
         JOIN customer ON o_custkey = c_custkey
         ORDER BY price_c DESC, o_orderkey LIMIT 100""",
    "q_union_by_name" ->
      """SELECT * FROM (
           SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderkey % 100 = 0
           UNION ALL BY NAME
           SELECT o_orderstatus, o_orderkey,
                  CAST(round(o_totalprice * 100) AS BIGINT) AS price_c
           FROM orders WHERE o_orderkey % 100 = 1)
         ORDER BY o_orderkey""",
    "q_string_agg" ->
      """SELECT o_orderpriority,
           string_agg(DISTINCT o_orderstatus, ',' ORDER BY o_orderstatus) AS statuses,
           count(DISTINCT o_orderstatus) AS n_statuses
         FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "q_exists" ->
      """SELECT c_custkey, c_name
         FROM customer
         WHERE EXISTS (SELECT 1 FROM orders
                       WHERE o_custkey = c_custkey AND o_totalprice > 300000)
           AND NOT EXISTS (SELECT 1 FROM orders
                           WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
           AND c_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey < 2)
         ORDER BY c_custkey""",
    "q_scalar_subquery" ->
      """SELECT o_orderkey,
                CAST(round(o_totalprice * 100) AS BIGINT) AS price_c,
                (SELECT count(*) FROM lineitem WHERE l_orderkey = o_orderkey) AS n_lines
         FROM orders
         WHERE o_totalprice > (SELECT max(o_totalprice) FROM orders) * 0.5
         ORDER BY o_orderkey""",
    "q_tpch_q3" ->
      s"""SELECT l_orderkey, o_orderdate, o_orderpriority,
                 $RevenueSql AS revenue_e4
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          WHERE c_mktsegment = 'BUILDING'
            AND o_orderdate < TIMESTAMP '1998-06-01 00:00:00'
            AND l_shipdate > TIMESTAMP '1998-06-01 00:00:00'
          GROUP BY 1, 2, 3
          ORDER BY revenue_e4 DESC, l_orderkey
          LIMIT 10""",
    "q_tpch_q5" ->
      s"""SELECT n_name, $RevenueSql AS revenue_e4
          FROM lineitem
          JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN nation ON c_nationkey = n_nationkey
          JOIN region ON n_regionkey = r_regionkey
          JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
          WHERE r_name = 'ASIA'
            AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
            AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
          GROUP BY n_name
          ORDER BY revenue_e4 DESC, n_name""",
    "q_tpch_q10" ->
      s"""SELECT c_custkey, c_name, n_name, $RevenueSql AS revenue_e4
          FROM lineitem
          JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN nation ON c_nationkey = n_nationkey
          WHERE l_returnflag = 'R'
            AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
            AND o_orderdate <  TIMESTAMP '1997-07-01 00:00:00'
          GROUP BY 1, 2, 3
          ORDER BY revenue_e4 DESC, c_custkey
          LIMIT 20""",
    "q_window_frames" ->
      """WITH o AS (
           SELECT o_custkey, o_orderkey,
                  CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS day,
                  CAST(round(o_totalprice * 100) AS BIGINT) AS price_c
           FROM orders)
         SELECT o_custkey, o_orderkey, day,
           CAST(sum(price_c) OVER (PARTITION BY o_custkey ORDER BY day
                RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) AS BIGINT) AS trail30_c,
           first_value(price_c) OVER w AS first_c,
           nth_value(price_c, 2) OVER w AS second_c,
           lead(o_orderkey, 1) OVER (PARTITION BY o_custkey ORDER BY day, o_orderkey) AS next_order,
           lag(o_orderkey, 1) OVER (PARTITION BY o_custkey ORDER BY day, o_orderkey) AS prev_order
         FROM o
         WINDOW w AS (PARTITION BY o_custkey ORDER BY day, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         ORDER BY o_custkey, o_orderkey""",
    "q_stat_aggs" ->
      """SELECT l_returnflag,
           round(stddev_samp(l_quantity), 4) AS sd_qty,
           round(var_samp(l_quantity), 4) AS var_qty,
           round(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price,
           round(covar_samp(l_quantity, l_discount), 4) AS covar_qty_disc,
           count(*) AS n
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q_array_funcs" ->
      """WITH a AS (
           SELECT l_orderkey,
                  list(CAST(round(l_quantity) AS BIGINT)
                       ORDER BY CAST(round(l_quantity) AS BIGINT)) AS qs
           FROM lineitem GROUP BY 1)
         SELECT l_orderkey,
           CAST(len(qs) AS BIGINT) AS n,
           CAST(list_sum(qs) AS BIGINT) AS sum_q,
           CAST(list_max(qs) AS BIGINT) AS max_q,
           CAST(len(list_filter(qs, x -> x > 25)) AS BIGINT) AS n_over25,
           array_to_string(list_transform(qs, x -> CAST(x * 2 AS VARCHAR)), ',') AS doubled_csv
         FROM a ORDER BY l_orderkey""",
    "q_map_funcs" ->
      """SELECT l_orderkey,
           CAST(count(DISTINCT l_linenumber) AS BIGINT) AS n_keys,
           max(CASE WHEN l_linenumber = 1 THEN CAST(round(l_quantity) AS BIGINT) END) AS q1,
           coalesce(max(CASE WHEN l_linenumber = 3 THEN CAST(round(l_quantity) AS BIGINT) END), -1) AS q3
         FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey""",
  )
}
