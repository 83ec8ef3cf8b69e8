package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.syntax._

/** Relational operator surface (SURVEY.md §2.2): aggregation, joins, windows,
  * sorts/limits, set ops, scalar function families.
  *
  * The reference (`/root/reference/`) has none of these (§2.2 "absent" rows);
  * the engine provides them via Spark built-ins so Catalyst keeps pushdown,
  * pruning and whole-stage codegen. Every query here is deterministic and
  * paired with a DuckDB oracle in [[graft.SparkEntry.oracleSql]]:
  *   - aggregates over doubles are `round(_, 2..6)`-ed on both sides so
  *     FP summation-order noise cannot flip the hash compare;
  *   - every result carries a total ORDER BY with a unique tie-break.
  *
  * Scale notes (100 TB thinking, per query in scaladoc below): partial
  * aggregation (map-side combine) is automatic for all `groupBy().agg`;
  * dimension-side joins are explicitly `broadcast()`-ed; fact-fact joins
  * shuffle on their join key only.
  */
object Relational {

  /** TPC-H Q1-style pricing summary. Scale: hash-aggregate on a low-cardinality
    * key (~6 groups) → partial agg collapses virtually all rows map-side; the
    * shuffle moves O(groups × partitions) rows regardless of input size. */
  def q1Agg(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        sum($"l_quantity").as("sum_qty"),
        sum(round($"l_extendedprice" * 100).cast("long")).as("sum_base_price_c"),
        sum(round($"l_extendedprice" * (lit(1.0) - $"l_discount") * 10000).cast("long")).as("sum_disc_price_e4"),
        round(avg($"l_quantity"), 4).as("avg_qty"),
        round(avg($"l_discount"), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")

  /** Filter battery: boolean algebra, BETWEEN, IN, LIKE, comparison ops —
    * all pushed to the parquet scan (PushedFilters). */
  def qFilterComplex(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(
        $"l_shipdate".between(lit("1994-01-01").cast("timestamp"), lit("1995-12-31").cast("timestamp")) &&
        $"l_returnflag".isin("A", "R") &&
        ($"l_quantity" > 25 || $"l_discount" <= 0.02) &&
        !($"l_linestatus" === "O"))
      .select($"l_orderkey", $"l_linenumber", $"l_quantity", $"l_discount", $"l_returnflag")

  /** LIKE / RLIKE predicate battery (the pattern-match members of the
    * filter family; LIKE prefix patterns still push to the scan). */
  def qLike(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir)
      .filter($"p_name".like("%green%") ||
              $"p_type".like("SMALL%") ||
              $"p_brand".rlike("^Brand#[12]3$"))
      .select($"p_partkey", $"p_name", $"p_type", $"p_brand")

  /** Projection battery: computed columns, CASE, nested arithmetic; column
    * pruning keeps the scan at 4 columns. */
  def qProjection(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir)
      .select(
        $"p_partkey",
        upper($"p_brand").as("brand_uc"),
        ($"p_retailprice" * 2).as("price_doubled"),
        when($"p_size" < 10, "small").when($"p_size" < 30, "medium").otherwise("large").as("size_class"),
        ($"p_size".cast("long") * $"p_size".cast("long")).as("size_sq"))

  /** Inner 3-way join: fact (orders) ⋈ dims (customer, nation). Scale: both
    * dim sides are broadcast → no shuffle of the fact table at all; aggregate
    * then groups on a 25-value key. */
  def qJoinInner(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .join(broadcast(Tables.customer(spark, dir)), $"o_custkey" === $"c_custkey")
      .join(broadcast(Tables.nation(spark, dir)), $"c_nationkey" === $"n_nationkey")
      .groupBy($"n_name")
      .agg(sum(round($"o_totalprice" * 100).cast("long")).as("revenue_c"), count(lit(1)).as("n_orders"))
      .orderBy($"n_name")

  /** Left outer join + null-generating side aggregation. */
  def qJoinLeft(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir).filter($"o_totalprice" > 400000)
    Tables.customer(spark, dir)
      .join(o, $"c_custkey" === $"o_custkey", "left")
      .groupBy($"c_custkey", $"c_mktsegment")
      .agg(count($"o_orderkey").as("big_orders"),
           coalesce(sum(round($"o_totalprice" * 100).cast("long")), lit(0L)).as("big_revenue_c"))
  }

  /** Left-semi join (EXISTS). Scale: semi-join keeps only the probe side's
    * columns; broadcast the filter set when small. */
  def qJoinSemi(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir).filter($"o_orderstatus" === "F"),
            $"c_custkey" === $"o_custkey", "left_semi")
      .select($"c_custkey", $"c_name", $"c_mktsegment")

  /** Left-anti join (NOT EXISTS). */
  def qJoinAnti(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir), $"c_custkey" === $"o_custkey", "left_anti")
      .select($"c_custkey", $"c_name", $"c_acctbal")
      .orderBy($"c_custkey")

  /** Full outer join of two aggregated sides (per-nation customer vs supplier
    * counts) — exercises null handling on both sides. */
  def qJoinFull(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir).groupBy($"c_nationkey".as("nationkey"))
      .agg(count(lit(1)).as("n_customers"))
    val s = Tables.supplier(spark, dir).groupBy($"s_nationkey".as("nationkey"))
      .agg(count(lit(1)).as("n_suppliers"))
    c.join(s, Seq("nationkey"), "full")
      .select($"nationkey",
              coalesce($"n_customers", lit(0L)).as("n_customers"),
              coalesce($"n_suppliers", lit(0L)).as("n_suppliers"))
      .orderBy($"nationkey")
  }

  /** Cross join (small × small) — BroadcastNestedLoop; only sane on bounded
    * inputs, which Catalyst verifies via the explicit crossJoin API. */
  def qJoinCross(spark: SparkSession, dir: String): DataFrame =
    Tables.region(spark, dir)
      .crossJoin(Tables.nation(spark, dir))
      .select($"r_regionkey", $"r_name", $"n_nationkey", $"n_name")
      .orderBy($"r_regionkey", $"n_nationkey")

  /** Equi + range (theta) join: lineitem ⋈ part on key AND quantity within a
    * size band. Scale: the equi conjunct keeps this a hash join (range applied
    * as post-join filter), never a nested loop. */
  def qJoinRange(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .join(broadcast(Tables.part(spark, dir)),
            $"l_partkey" === $"p_partkey" &&
            $"l_quantity" >= $"p_size" - 5 && $"l_quantity" <= $"p_size" + 5)
      .groupBy($"p_brand")
      .agg(count(lit(1)).as("n_lines"), sum(round($"l_extendedprice" * 100).cast("long")).as("sum_price_c"))
      .orderBy($"p_brand")

  /** Aggregation with DISTINCT: count distinct + plain counts in one pass. */
  def qAggDistinct(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy($"o_orderstatus")
      .agg(
        countDistinct($"o_custkey").as("n_customers"),
        countDistinct($"o_orderpriority").as("n_priorities"),
        count(lit(1)).as("n_orders"))
      .orderBy($"o_orderstatus")

  /** ROLLUP with grouping() to disambiguate the subtotal rows. */
  def qRollup(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .rollup($"l_returnflag", $"l_linestatus")
      .agg(sum($"l_quantity").as("sum_qty"), count(lit(1)).as("n"),
           grouping($"l_returnflag").cast("long").as("g_rf"),
           grouping($"l_linestatus").cast("long").as("g_ls"))
      .select(
        coalesce($"l_returnflag", lit("ALL")).as("returnflag"),
        coalesce($"l_linestatus", lit("ALL")).as("linestatus"),
        $"g_rf", $"g_ls", $"sum_qty", $"n")
      .orderBy($"returnflag", $"linestatus", $"g_rf", $"g_ls")

  /** CUBE over two dimensions. */
  def qCube(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .cube($"o_orderstatus", $"o_orderpriority")
      .agg(count(lit(1)).as("n"), sum(round($"o_totalprice" * 100).cast("long")).as("revenue_c"),
           grouping($"o_orderstatus").cast("long").as("g_st"),
           grouping($"o_orderpriority").cast("long").as("g_pr"))
      .select(
        coalesce($"o_orderstatus", lit("ALL")).as("status"),
        coalesce($"o_orderpriority", lit("ALL")).as("priority"),
        $"g_st", $"g_pr", $"n", $"revenue_c")
      .orderBy($"status", $"priority", $"g_st", $"g_pr")

  /** Ranking window battery: row_number / rank / dense_rank / lag / lead with
    * a unique tie-break so results are total-order deterministic. */
  def qWindowRank(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy($"o_custkey").orderBy($"o_totalprice".desc, $"o_orderkey")
    Tables.orders(spark, dir)
      .select(
        $"o_custkey", $"o_orderkey", $"o_totalprice",
        row_number().over(w).cast("long").as("rn"),
        rank().over(w).cast("long").as("rnk"),
        dense_rank().over(w).cast("long").as("drnk"),
        coalesce(lag($"o_totalprice", 1).over(w), lit(0.0)).as("prev_price"),
        coalesce(lead($"o_totalprice", 1).over(w), lit(0.0)).as("next_price"))
      .filter($"rn" <= 5)
  }

  /** Distribution window functions: ntile / percent_rank / cume_dist over a
    * unique total order (rational outputs scaled to exact integers). */
  def qWindowNtile(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy($"o_orderpriority").orderBy($"o_totalprice", $"o_orderkey")
    Tables.orders(spark, dir)
      .filter($"o_custkey" <= 100)
      .select(
        $"o_orderpriority", $"o_orderkey", $"o_totalprice",
        ntile(4).over(w).cast("long").as("quartile"),
        floor(percent_rank().over(w) * 1000000L).cast("long").as("pr_e6"),
        floor(cume_dist().over(w) * 1000000L).cast("long").as("cd_e6"))
  }

  /** Running-frame window: cumulative sum/avg per supplier in a deterministic
    * total order (shipdate, orderkey, linenumber is unique). Uses quantity
    * (exact in double) so running sums are FP-order-insensitive. */
  def qWindowRunning(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy($"l_suppkey")
      .orderBy($"l_shipdate", $"l_orderkey", $"l_linenumber")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.lineitem(spark, dir)
      .filter($"l_suppkey" <= 10)
      .select(
        $"l_suppkey", $"l_orderkey", $"l_linenumber",
        sum($"l_quantity").over(w).as("running_qty"),
        count(lit(1)).over(w).as("running_n"))
  }

  /** Global sort + limit → TakeOrderedAndProject (no full sort materialized). */
  def qTopk(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .orderBy($"o_totalprice".desc, $"o_orderkey")
      .select($"o_orderkey", $"o_custkey", $"o_totalprice")
      .limit(10)

  /** Top-k per group: row_number over (group, order, tie-break) then filter. */
  def qTopkPerGroup(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy($"o_custkey").orderBy($"o_totalprice".desc, $"o_orderkey")
    Tables.orders(spark, dir)
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter($"rn" <= 3)
      .select($"o_custkey", $"rn", $"o_orderkey", $"o_totalprice")
  }

  /** UNION (distinct) of two key sets. */
  def qUnion(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir).select($"c_nationkey".cast("long").as("nationkey"))
      .union(Tables.supplier(spark, dir).select($"s_nationkey".cast("long")))
      .distinct()
      .orderBy($"nationkey")

  /** INTERSECT of two key sets. */
  def qIntersect(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir).select($"c_nationkey".cast("long").as("nationkey"))
      .intersect(Tables.supplier(spark, dir).select($"s_nationkey".cast("long")))
      .orderBy($"nationkey")

  /** EXCEPT of two key sets. */
  def qExcept(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir).select($"c_nationkey".cast("long").as("nationkey"))
      .except(Tables.supplier(spark, dir).select($"s_nationkey".cast("long")))
      .orderBy($"nationkey")

  /** EXCEPT ALL / INTERSECT ALL — multiset semantics (duplicates preserved),
    * exercised on per-order (custkey, priority) tuples split by status. */
  def qSetAll(spark: SparkSession, dir: String): DataFrame = {
    val f = Tables.orders(spark, dir).filter($"o_orderstatus" === "F")
      .select($"o_custkey", $"o_orderpriority")
    val o = Tables.orders(spark, dir).filter($"o_orderstatus" === "O")
      .select($"o_custkey", $"o_orderpriority")
    f.exceptAll(o).groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n_except_all"))
      .join(
        f.intersectAll(o).groupBy($"o_orderpriority")
          .agg(count(lit(1)).as("n_intersect_all")),
        Seq("o_orderpriority"), "full")
      .select($"o_orderpriority",
        coalesce($"n_except_all", lit(0L)).as("n_except_all"),
        coalesce($"n_intersect_all", lit(0L)).as("n_intersect_all"))
      .orderBy($"o_orderpriority")
  }

  /** UNION ALL of two differently-filtered slices, then aggregate. */
  def qUnionAll(spark: SparkSession, dir: String): DataFrame = {
    val hi = Tables.orders(spark, dir).filter($"o_totalprice" > 300000)
      .select($"o_orderstatus", lit("high").as("bucket"), $"o_totalprice")
    val lo = Tables.orders(spark, dir).filter($"o_totalprice" < 50000)
      .select($"o_orderstatus", lit("low").as("bucket"), $"o_totalprice")
    hi.union(lo)
      .groupBy($"o_orderstatus", $"bucket")
      .agg(count(lit(1)).as("n"), sum(round($"o_totalprice" * 100).cast("long")).as("revenue_c"))
      .orderBy($"o_orderstatus", $"bucket")
  }

  /** String function battery (all codegen'd built-ins, no UDFs). */
  def qStrFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir)
      .select(
        $"p_partkey",
        lower($"p_name").as("name_lc"),
        upper($"p_brand").as("brand_uc"),
        length($"p_name").cast("long").as("name_len"),
        substring($"p_type", 1, 5).as("type_prefix"),
        element_at(split($"p_name", " "), 1).as("first_word"),
        regexp_extract($"p_brand", "([0-9]+)", 1).as("brand_num"),
        concat($"p_brand", lit("/"), $"p_type").as("brand_type"),
        trim(lit("  pad  ")).as("trimmed"),
        regexp_replace($"p_name", "[aeiou]", "_").as("devoweled"))

  /** Date/time function battery. */
  def qDateFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(
        $"o_orderkey",
        year($"o_orderdate").cast("long").as("yr"),
        month($"o_orderdate").cast("long").as("mo"),
        dayofmonth($"o_orderdate").cast("long").as("dom"),
        date_trunc("month", $"o_orderdate").as("month_start"),
        datediff($"o_orderdate".cast("date"), lit("1995-01-01").cast("date")).cast("long").as("days_from_95"))

  /** Math/scalar battery; transcendentals rounded on both sides. */
  def qMathFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter($"l_orderkey" <= 100)
      .select(
        $"l_orderkey", $"l_linenumber",
        abs($"l_quantity" - 25).as("abs_dev"),
        ceil($"l_discount" * 100).cast("long").as("disc_pct_ceil"),
        floor($"l_extendedprice" / 1000).cast("long").as("price_k_floor"),
        round(sqrt($"l_quantity"), 6).as("qty_sqrt"),
        round(log($"l_extendedprice"), 6).as("price_ln"),
        round(pow($"l_tax" + 1.0, 2), 6).as("tax_sq"),
        greatest($"l_quantity", $"l_discount" * 1000).as("gr"),
        least($"l_quantity", lit(10.0)).as("ls"))
      .orderBy($"l_orderkey", $"l_linenumber")

  /** CASE expressions feeding an aggregation (conditional aggregation). */
  def qCaseAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy($"o_orderpriority")
      .agg(
        sum(when($"o_totalprice" > 200000, 1L).otherwise(0L)).as("n_big"),
        sum(when($"o_totalprice" <= 200000, 1L).otherwise(0L)).as("n_small"),
        round(avg(when($"o_orderstatus" === "F", $"o_totalprice")), 4).as("avg_f_price"))
      .orderBy($"o_orderpriority")

  /** Null-handling battery: coalesce, nullif, null-safe equality (<=>). */
  def qNullFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .select(
        $"c_custkey",
        nullif($"c_mktsegment", lit("BUILDING")).as("seg_or_null"),
        coalesce(nullif($"c_mktsegment", lit("BUILDING")), lit("(default)")).as("seg_coalesced"),
        ($"c_mktsegment" <=> lit("BUILDING")).as("is_building"),
        (nullif($"c_mktsegment", lit("BUILDING")) <=> lit(null).cast("string")).as("nullsafe_null"))

  /** Correlated-subquery-style: per-segment customers above their segment's
    * average balance (expressed as window avg → filter, shuffle once). */
  def qAboveSegmentAvg(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy($"c_mktsegment")
    Tables.customer(spark, dir)
      .withColumn("seg_avg", avg($"c_acctbal").over(w))
      .filter($"c_acctbal" > $"seg_avg")
      .select($"c_custkey", $"c_mktsegment", $"c_acctbal", round($"seg_avg", 4).as("seg_avg"))
  }

  /** Scalar aggregate (no grouping) — single-row result. */
  def qScalarAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .agg(
        count(lit(1)).as("n_rows"),
        countDistinct($"l_orderkey").as("n_orders"),
        sum($"l_quantity").as("total_qty"),
        min($"l_extendedprice").as("min_price"),
        max($"l_extendedprice").as("max_price"))

  /** String aggregation with deterministic ordering: sorted collect_list
    * joined to a single string (matches DuckDB string_agg ORDER BY). */
  def qCollectSorted(spark: SparkSession, dir: String): DataFrame =
    Tables.nation(spark, dir)
      .groupBy($"n_regionkey")
      .agg(array_join(sort_array(collect_list($"n_name")), ",").as("nations"),
           count(lit(1)).as("n"))
      .orderBy($"n_regionkey")

  /** Two-stage SALTED aggregation — the hot-key defense for aggregates
    * whose group count is tiny (here: 3 return flags over the whole fact
    * table, the degenerate case where ALL rows funnel into 3 reduce
    * tasks): stage 1 aggregates on (key, salt = h32(orderkey) % 16) so
    * the heavy key's rows spread over 16 tasks; stage 2 re-aggregates the
    * 16× partial rows on the key alone. Sums/counts/min/max re-associate
    * exactly, so the result is bit-identical to the direct aggregate —
    * which is exactly what the oracle checks (its SQL is the PLAIN
    * single-stage aggregate).
    *
    * (With partial aggregation Spark usually absorbs this particular skew
    * map-side; the registered query exists to keep the salting pattern —
    * required when the aggregate is distinct-based or buffer-heavy, where
    * partials don't collapse — under the correctness gate.) */
  def qAggSalted(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select($"l_returnflag",
        graft.functions.TextHash.h32($"l_orderkey".cast("string"))
          .mod(16L).as("salt"),
        round($"l_quantity" * 100).cast("long").as("qty_c"))
      .groupBy($"l_returnflag", $"salt")
      .agg(count(lit(1)).as("pn"), sum($"qty_c").as("ps"),
           min($"qty_c").as("pmin"), max($"qty_c").as("pmax"))
      .groupBy($"l_returnflag")
      .agg(sum($"pn").as("n"), sum($"ps").as("sum_qty_c"),
           min($"pmin").as("min_qty_c"), max($"pmax").as("max_qty_c"))
      .orderBy($"l_returnflag")

  /** The SQL-text API tier under the oracle gate: the same aggregation
    * join shape expressed as raw `spark.sql` over [[graft.GraftSql]]'s
    * views — proving the SQL surface (views + parser + the same Catalyst
    * pipeline) produces byte-identical results to the typed builders. */
  def qSqlSurface(spark: SparkSession, dir: String): DataFrame =
    graft.GraftSql.sql(spark, dir,
      """SELECT o_orderpriority, count(*) AS n_orders,
                sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS total_c
         FROM orders
         WHERE o_orderstatus = 'O'
         GROUP BY o_orderpriority
         ORDER BY o_orderpriority""")

  /** Name → builder, consumed by [[graft.SparkEntry.queries]]. */
  val registry: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg"              -> q1Agg _,
    "q_agg_salted"        -> qAggSalted _,
    "q_sql_surface"       -> qSqlSurface _,
    "q_filter_complex"    -> qFilterComplex _,
    "q_like"              -> qLike _,
    "q_projection"        -> qProjection _,
    "q_join_inner"        -> qJoinInner _,
    "q_join_left"         -> qJoinLeft _,
    "q_join_semi"         -> qJoinSemi _,
    "q_join_anti"         -> qJoinAnti _,
    "q_join_full"         -> qJoinFull _,
    "q_join_cross"        -> qJoinCross _,
    "q_join_range"        -> qJoinRange _,
    "q_agg_distinct"      -> qAggDistinct _,
    "q_rollup"            -> qRollup _,
    "q_cube"              -> qCube _,
    "q_window_rank"       -> qWindowRank _,
    "q_window_ntile"      -> qWindowNtile _,
    "q_window_running"    -> qWindowRunning _,
    "q_topk"              -> qTopk _,
    "q_topk_per_group"    -> qTopkPerGroup _,
    "q_union"             -> qUnion _,
    "q_intersect"         -> qIntersect _,
    "q_except"            -> qExcept _,
    "q_union_all"         -> qUnionAll _,
    "q_set_all"           -> qSetAll _,
    "q_str_funcs"         -> qStrFuncs _,
    "q_date_funcs"        -> qDateFuncs _,
    "q_math_funcs"        -> qMathFuncs _,
    "q_case_agg"          -> qCaseAgg _,
    "q_null_funcs"        -> qNullFuncs _,
    "q_above_segment_avg" -> qAboveSegmentAvg _,
    "q_scalar_agg"        -> qScalarAgg _,
    "q_collect_sorted"    -> qCollectSorted _,
  )

  /** DuckDB oracle SQL, column-name- and type-aligned with the builders above
    * (driver hash-compares after sorting columns by name). */
  val oracles: Map[String, String] = Map(
    // The salted two-stage aggregate must equal the PLAIN aggregate —
    // that equivalence is the point of the oracle.
    "q_agg_salted" ->
      """SELECT l_returnflag, count(*) AS n,
           CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT)
             AS sum_qty_c,
           CAST(min(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT)
             AS min_qty_c,
           CAST(max(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT)
             AS max_qty_c
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q_sql_surface" ->
      """SELECT o_orderpriority, count(*) AS n_orders,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS total_c
         FROM orders WHERE o_orderstatus = 'O'
         GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
         sum(l_quantity) AS sum_qty,
         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_base_price_c,
         CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 10000) AS BIGINT)) AS BIGINT) AS sum_disc_price_e4,
         round(avg(l_quantity), 4) AS avg_qty,
         round(avg(l_discount), 4) AS avg_disc,
         count(*) AS count_order
         FROM lineitem GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""",
    "q_filter_complex" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_returnflag
         FROM lineitem
         WHERE l_shipdate BETWEEN TIMESTAMP '1994-01-01' AND TIMESTAMP '1995-12-31'
           AND l_returnflag IN ('A','R')
           AND (l_quantity > 25 OR l_discount <= 0.02)
           AND NOT (l_linestatus = 'O')
         ORDER BY l_orderkey, l_linenumber""",
    "q_like" ->
      """SELECT p_partkey, p_name, p_type, p_brand FROM part
         WHERE p_name LIKE '%green%'
            OR p_type LIKE 'SMALL%'
            OR regexp_matches(p_brand, '^Brand#[12]3$')
         ORDER BY p_partkey""",
    "q_projection" ->
      """SELECT p_partkey, upper(p_brand) AS brand_uc,
         p_retailprice * 2 AS price_doubled,
         CASE WHEN p_size < 10 THEN 'small' WHEN p_size < 30 THEN 'medium' ELSE 'large' END AS size_class,
         CAST(p_size AS BIGINT) * CAST(p_size AS BIGINT) AS size_sq
         FROM part ORDER BY p_partkey""",
    "q_join_inner" ->
      """SELECT n_name,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS revenue_c,
         count(*) AS n_orders
         FROM orders JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         GROUP BY n_name ORDER BY n_name""",
    "q_join_left" ->
      """SELECT c_custkey, c_mktsegment,
         count(o_orderkey) AS big_orders,
         coalesce(CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT), 0) AS big_revenue_c
         FROM customer LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 400000) o
           ON c_custkey = o_custkey
         GROUP BY c_custkey, c_mktsegment ORDER BY c_custkey""",
    "q_join_semi" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
         WHERE EXISTS (SELECT 1 FROM orders WHERE o_orderstatus = 'F' AND o_custkey = c_custkey)
         ORDER BY c_custkey""",
    "q_join_anti" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
         ORDER BY c_custkey""",
    "q_join_full" ->
      """SELECT coalesce(c.nationkey, s.nationkey) AS nationkey,
         coalesce(n_customers, 0) AS n_customers,
         coalesce(n_suppliers, 0) AS n_suppliers
         FROM (SELECT c_nationkey AS nationkey, count(*) AS n_customers FROM customer GROUP BY 1) c
         FULL JOIN (SELECT s_nationkey AS nationkey, count(*) AS n_suppliers FROM supplier GROUP BY 1) s
           ON c.nationkey = s.nationkey
         ORDER BY nationkey""",
    "q_join_cross" ->
      """SELECT r_regionkey, r_name, n_nationkey, n_name
         FROM region CROSS JOIN nation
         ORDER BY r_regionkey, n_nationkey""",
    "q_join_range" ->
      """SELECT p_brand, count(*) AS n_lines,
         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_c
         FROM lineitem JOIN part ON l_partkey = p_partkey
           AND l_quantity >= p_size - 5 AND l_quantity <= p_size + 5
         GROUP BY p_brand ORDER BY p_brand""",
    "q_agg_distinct" ->
      """SELECT o_orderstatus,
         count(DISTINCT o_custkey) AS n_customers,
         count(DISTINCT o_orderpriority) AS n_priorities,
         count(*) AS n_orders
         FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    "q_rollup" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
         coalesce(l_linestatus, 'ALL') AS linestatus,
         CAST(grouping(l_returnflag) AS BIGINT) AS g_rf,
         CAST(grouping(l_linestatus) AS BIGINT) AS g_ls,
         sum(l_quantity) AS sum_qty, count(*) AS n
         FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
         ORDER BY returnflag, linestatus, g_rf, g_ls""",
    "q_cube" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
         coalesce(o_orderpriority, 'ALL') AS priority,
         CAST(grouping(o_orderstatus) AS BIGINT) AS g_st,
         CAST(grouping(o_orderpriority) AS BIGINT) AS g_pr,
         count(*) AS n,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS revenue_c
         FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
         ORDER BY status, priority, g_st, g_pr""",
    "q_window_rank" ->
      """SELECT * FROM (
           SELECT o_custkey, o_orderkey, o_totalprice,
             CAST(row_number() OVER w AS BIGINT) AS rn,
             CAST(rank() OVER w AS BIGINT) AS rnk,
             CAST(dense_rank() OVER w AS BIGINT) AS drnk,
             coalesce(lag(o_totalprice, 1) OVER w, 0.0) AS prev_price,
             coalesce(lead(o_totalprice, 1) OVER w, 0.0) AS next_price
           FROM orders
           WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
         ) WHERE rn <= 5 ORDER BY o_custkey, rn""",
    "q_window_ntile" ->
      """SELECT o_orderpriority, o_orderkey, o_totalprice,
         CAST(ntile(4) OVER w AS BIGINT) AS quartile,
         CAST(floor(percent_rank() OVER w * 1000000) AS BIGINT) AS pr_e6,
         CAST(floor(cume_dist() OVER w * 1000000) AS BIGINT) AS cd_e6
         FROM orders WHERE o_custkey <= 100
         WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
         ORDER BY o_orderpriority, o_orderkey""",
    "q_window_running" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber,
         sum(l_quantity) OVER w AS running_qty,
         count(*) OVER w AS running_n
         FROM lineitem WHERE l_suppkey <= 10
         WINDOW w AS (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         ORDER BY l_suppkey, l_orderkey, l_linenumber""",
    "q_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""",
    "q_topk_per_group" ->
      """SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
           SELECT o_custkey, o_orderkey, o_totalprice,
             CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn
           FROM orders
         ) WHERE rn <= 3 ORDER BY o_custkey, rn""",
    "q_union" ->
      """SELECT CAST(c_nationkey AS BIGINT) AS nationkey FROM customer
         UNION SELECT CAST(s_nationkey AS BIGINT) FROM supplier ORDER BY nationkey""",
    "q_intersect" ->
      """SELECT CAST(c_nationkey AS BIGINT) AS nationkey FROM customer
         INTERSECT SELECT CAST(s_nationkey AS BIGINT) FROM supplier ORDER BY nationkey""",
    "q_except" ->
      """SELECT CAST(c_nationkey AS BIGINT) AS nationkey FROM customer
         EXCEPT SELECT CAST(s_nationkey AS BIGINT) FROM supplier ORDER BY nationkey""",
    "q_union_all" ->
      """SELECT o_orderstatus, bucket, count(*) AS n,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS revenue_c
         FROM (
           SELECT o_orderstatus, 'high' AS bucket, o_totalprice FROM orders WHERE o_totalprice > 300000
           UNION ALL
           SELECT o_orderstatus, 'low' AS bucket, o_totalprice FROM orders WHERE o_totalprice < 50000
         ) GROUP BY o_orderstatus, bucket ORDER BY o_orderstatus, bucket""",
    "q_set_all" ->
      """WITH f AS (SELECT o_custkey, o_orderpriority FROM orders WHERE o_orderstatus = 'F'),
         o AS (SELECT o_custkey, o_orderpriority FROM orders WHERE o_orderstatus = 'O'),
         ea AS (SELECT o_orderpriority, count(*) AS n_except_all
                FROM (SELECT * FROM f EXCEPT ALL SELECT * FROM o) GROUP BY 1),
         ia AS (SELECT o_orderpriority, count(*) AS n_intersect_all
                FROM (SELECT * FROM f INTERSECT ALL SELECT * FROM o) GROUP BY 1)
         SELECT coalesce(ea.o_orderpriority, ia.o_orderpriority) AS o_orderpriority,
           coalesce(n_except_all, 0) AS n_except_all,
           coalesce(n_intersect_all, 0) AS n_intersect_all
         FROM ea FULL JOIN ia ON ea.o_orderpriority = ia.o_orderpriority
         ORDER BY o_orderpriority""",
    "q_str_funcs" ->
      """SELECT p_partkey,
         lower(p_name) AS name_lc,
         upper(p_brand) AS brand_uc,
         CAST(length(p_name) AS BIGINT) AS name_len,
         substring(p_type, 1, 5) AS type_prefix,
         string_split(p_name, ' ')[1] AS first_word,
         regexp_extract(p_brand, '([0-9]+)', 1) AS brand_num,
         p_brand || '/' || p_type AS brand_type,
         trim('  pad  ') AS trimmed,
         regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled
         FROM part ORDER BY p_partkey""",
    "q_date_funcs" ->
      """SELECT o_orderkey,
         CAST(year(o_orderdate) AS BIGINT) AS yr,
         CAST(month(o_orderdate) AS BIGINT) AS mo,
         CAST(day(o_orderdate) AS BIGINT) AS dom,
         CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
         CAST(datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS days_from_95
         FROM orders ORDER BY o_orderkey""",
    "q_math_funcs" ->
      """SELECT l_orderkey, l_linenumber,
         abs(l_quantity - 25) AS abs_dev,
         CAST(ceil(l_discount * 100) AS BIGINT) AS disc_pct_ceil,
         CAST(floor(l_extendedprice / 1000) AS BIGINT) AS price_k_floor,
         round(sqrt(l_quantity), 6) AS qty_sqrt,
         round(ln(l_extendedprice), 6) AS price_ln,
         round(pow(l_tax + 1.0, 2), 6) AS tax_sq,
         greatest(l_quantity, l_discount * 1000) AS gr,
         least(l_quantity, 10.0) AS ls
         FROM lineitem WHERE l_orderkey <= 100
         ORDER BY l_orderkey, l_linenumber""",
    "q_case_agg" ->
      """SELECT o_orderpriority,
         CAST(sum(CASE WHEN o_totalprice > 200000 THEN 1 ELSE 0 END) AS BIGINT) AS n_big,
         CAST(sum(CASE WHEN o_totalprice <= 200000 THEN 1 ELSE 0 END) AS BIGINT) AS n_small,
         round(avg(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END), 4) AS avg_f_price
         FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "q_null_funcs" ->
      """SELECT c_custkey,
         nullif(c_mktsegment, 'BUILDING') AS seg_or_null,
         coalesce(nullif(c_mktsegment, 'BUILDING'), '(default)') AS seg_coalesced,
         (c_mktsegment IS NOT DISTINCT FROM 'BUILDING') AS is_building,
         (nullif(c_mktsegment, 'BUILDING') IS NOT DISTINCT FROM NULL) AS nullsafe_null
         FROM customer ORDER BY c_custkey""",
    "q_above_segment_avg" ->
      """SELECT c_custkey, c_mktsegment, c_acctbal, seg_avg FROM (
           SELECT c_custkey, c_mktsegment, c_acctbal,
             avg(c_acctbal) OVER (PARTITION BY c_mktsegment) AS seg_avg_raw,
             round(avg(c_acctbal) OVER (PARTITION BY c_mktsegment), 4) AS seg_avg
           FROM customer
         ) WHERE c_acctbal > seg_avg_raw ORDER BY c_custkey""",
    "q_scalar_agg" ->
      """SELECT count(*) AS n_rows,
         count(DISTINCT l_orderkey) AS n_orders,
         sum(l_quantity) AS total_qty,
         min(l_extendedprice) AS min_price,
         max(l_extendedprice) AS max_price
         FROM lineitem""",
    "q_collect_sorted" ->
      """SELECT n_regionkey,
         string_agg(n_name, ',' ORDER BY n_name) AS nations,
         count(*) AS n
         FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""",
  )
}
