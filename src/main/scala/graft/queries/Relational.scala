package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Relational operator surface (SURVEY.md §2.2-2.8 tabular layer) exercised
  * on the driver's TPC-H-ish tables. Every query here has a DuckDB oracle in
  * [[oracles]]; column names/aliases must match the SQL exactly (the driver
  * sorts columns by name before hashing).
  */
object Relational {
  type Q = (SparkSession, String) => DataFrame

  val defs: Map[String, Q] = Map(
    // canonical hash aggregation (partial+final map-side combine is automatic)
    "q1_agg" -> ((s, dir) => {
      Tables.load(s, dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("sum_disc_price"),
          round(avg("l_quantity"), 6).as("avg_qty"),
          round(avg("l_discount"), 6).as("avg_disc"),
          count(lit(1)).as("count_order"))
    }),

    // multi-way join with small-dimension broadcast + filter pushdown
    "q2_join" -> ((s, dir) => {
      val cust = Tables.load(s, dir, "customer")
      val ord = Tables.load(s, dir, "orders")
      val nat = Tables.load(s, dir, "nation")
      ord.join(cust, ord("o_custkey") === cust("c_custkey"))
        .join(broadcast(nat), cust("c_nationkey") === nat("n_nationkey"))
        .groupBy("n_name")
        .agg(
          round(sum("o_totalprice"), 2).as("total_price"),
          count(lit(1)).as("n_orders"))
    }),

    // filter + projection (predicate pushdown to parquet scan)
    "q3_filter" -> ((s, dir) => {
      Tables.load(s, dir, "lineitem")
        .filter(col("l_discount") >= 0.05 && col("l_quantity") < 25)
        .groupBy("l_returnflag")
        .agg(round(sum(col("l_extendedprice") * col("l_discount")), 2).as("revenue"),
          count(lit(1)).as("n"))
    }),

    // top-k: orderBy + limit → TakeOrderedAndProject
    "q4_topk" -> ((s, dir) => {
      val ord = Tables.load(s, dir, "orders")
      ord.select(col("o_orderkey"), round(col("o_totalprice"), 2).as("price"))
        .orderBy(desc("price"), asc("o_orderkey"))
        .limit(10)
    }),

    // window functions: rank within partition + running aggregate
    "q5_window" -> ((s, dir) => {
      val ord = Tables.load(s, dir, "orders")
      val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      ord.select(
          col("o_orderkey"), col("o_custkey"),
          row_number().over(w).as("rn"),
          round(sum("o_totalprice").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2)
            .as("running_total"))
        .filter(col("rn") <= 3)
    }),

    // semi/anti join (EXISTS / NOT EXISTS)
    "q6_semijoin" -> ((s, dir) => {
      val cust = Tables.load(s, dir, "customer")
      val ord = Tables.load(s, dir, "orders").filter(col("o_totalprice") > 100000)
      cust.join(ord, cust("c_custkey") === ord("o_custkey"), "left_semi")
        .groupBy("c_mktsegment").agg(count(lit(1)).as("n_cust"))
    }),
    "q7_antijoin" -> ((s, dir) => {
      val cust = Tables.load(s, dir, "customer")
      val ord = Tables.load(s, dir, "orders").filter(col("o_totalprice") > 300000)
      cust.join(ord, cust("c_custkey") === ord("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_mktsegment"))
    }),

    // rollup (grouping sets surface; reference lacks it — declared engine surface)
    "q8_rollup" -> ((s, dir) => {
      val nat = Tables.load(s, dir, "nation")
      val cust = Tables.load(s, dir, "customer")
      cust.join(broadcast(nat), cust("c_nationkey") === nat("n_nationkey"))
        .rollup(col("n_regionkey"), col("n_name"))
        .agg(round(sum("c_acctbal"), 2).as("acctbal"), count(lit(1)).as("n"))
    }),

    // distinct aggregation
    "q9_distinct" -> ((s, dir) => {
      Tables.load(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"),
          count(lit(1)).as("n_rows"))
    }),

    // conditional aggregation (sum(case when ...))
    "q10_caseagg" -> ((s, dir) => {
      Tables.load(s, dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
          sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L)).as("n_f"),
          sum(when(col("o_orderstatus") === "O", 1L).otherwise(0L)).as("n_o"),
          round(avg("o_totalprice"), 4).as("avg_price"))
    }),

    // set ops: except / intersect on key domains
    "q11_setops" -> ((s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
      val hi = li.filter(col("l_quantity") > 45).select(col("l_partkey").as("k")).distinct()
      val lo = li.filter(col("l_quantity") < 5).select(col("l_partkey").as("k")).distinct()
      hi.except(lo)
    }),

    // scalar string/date/math functions
    "q12_scalar" -> ((s, dir) => {
      Tables.load(s, dir, "orders")
        .select(
          col("o_orderkey"),
          year(col("o_orderdate")).as("yr"),
          month(col("o_orderdate")).as("mo"),
          upper(substring(col("o_orderpriority"), 1, 1)).as("prio1"),
          length(col("o_orderstatus")).as("status_len"),
          round(sqrt(col("o_totalprice")), 4).as("sqrt_price"),
          round(log(col("o_totalprice") + 1.0), 4).as("log_price"))
    }),

    // grouped sort within groups via window + date bucketing
    "q13_datebucket" -> ((s, dir) => {
      Tables.load(s, dir, "lineitem")
        .groupBy(date_trunc("month", col("l_shipdate")).as("ship_month"))
        .agg(round(sum("l_quantity"), 2).as("qty"), count(lit(1)).as("n"))
    }),

    // correlated-style aggregation: customers above their nation's avg balance
    "q14_aboveavg" -> ((s, dir) => {
      val cust = Tables.load(s, dir, "customer")
      val w = Window.partitionBy("c_nationkey")
      cust.withColumn("nation_avg", avg("c_acctbal").over(w))
        .filter(col("c_acctbal") > col("nation_avg"))
        .groupBy("c_nationkey").agg(count(lit(1)).as("n_above"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        | round(sum(l_quantity),2) AS sum_qty,
        | round(sum(l_extendedprice),2) AS sum_base_price,
        | round(sum(l_extendedprice*(1-l_discount)),2) AS sum_disc_price,
        | round(avg(l_quantity),6) AS avg_qty,
        | round(avg(l_discount),6) AS avg_disc,
        | count(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q2_join" ->
      """SELECT n_name, round(sum(o_totalprice),2) AS total_price, count(*) AS n_orders
        |FROM orders JOIN customer ON o_custkey=c_custkey JOIN nation ON c_nationkey=n_nationkey
        |GROUP BY n_name""".stripMargin,
    "q3_filter" ->
      """SELECT l_returnflag, round(sum(l_extendedprice*l_discount),2) AS revenue, count(*) AS n
        |FROM lineitem WHERE l_discount >= 0.05 AND l_quantity < 25 GROUP BY l_returnflag""".stripMargin,
    "q4_topk" ->
      """SELECT o_orderkey, round(o_totalprice,2) AS price FROM orders
        |ORDER BY price DESC, o_orderkey ASC LIMIT 10""".stripMargin,
    "q5_window" ->
      """SELECT o_orderkey, o_custkey, rn, running_total FROM (
        | SELECT o_orderkey, o_custkey,
        |  row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC) AS rn,
        |  round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),2) AS running_total
        | FROM orders) WHERE rn <= 3""".stripMargin,
    "q6_semijoin" ->
      """SELECT c_mktsegment, count(*) AS n_cust FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey=c_custkey AND o_totalprice > 100000)
        |GROUP BY c_mktsegment""".stripMargin,
    "q7_antijoin" ->
      """SELECT c_custkey, c_mktsegment FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey=c_custkey AND o_totalprice > 300000)""".stripMargin,
    "q8_rollup" ->
      """SELECT n_regionkey, n_name, round(sum(c_acctbal),2) AS acctbal, count(*) AS n
        |FROM customer JOIN nation ON c_nationkey=n_nationkey
        |GROUP BY ROLLUP(n_regionkey, n_name)""".stripMargin,
    "q9_distinct" ->
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
        | count(DISTINCT l_suppkey) AS n_supps, count(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "q10_caseagg" ->
      """SELECT o_orderpriority,
        | sum(CASE WHEN o_orderstatus='F' THEN 1 ELSE 0 END)::BIGINT AS n_f,
        | sum(CASE WHEN o_orderstatus='O' THEN 1 ELSE 0 END)::BIGINT AS n_o,
        | round(avg(o_totalprice),4) AS avg_price
        |FROM orders GROUP BY o_orderpriority""".stripMargin,
    "q11_setops" ->
      """SELECT k FROM (SELECT DISTINCT l_partkey AS k FROM lineitem WHERE l_quantity > 45)
        |EXCEPT SELECT k FROM (SELECT DISTINCT l_partkey AS k FROM lineitem WHERE l_quantity < 5)""".stripMargin,
    "q12_scalar" ->
      """SELECT o_orderkey,
        | year(o_orderdate) AS yr, month(o_orderdate) AS mo,
        | upper(substring(o_orderpriority,1,1)) AS prio1,
        | length(o_orderstatus) AS status_len,
        | round(sqrt(o_totalprice),4) AS sqrt_price,
        | round(ln(o_totalprice+1.0),4) AS log_price
        |FROM orders""".stripMargin,
    "q13_datebucket" ->
      """SELECT date_trunc('month', l_shipdate) AS ship_month,
        | round(sum(l_quantity),2) AS qty, count(*) AS n
        |FROM lineitem GROUP BY 1""".stripMargin,
    "q14_aboveavg" ->
      """SELECT c_nationkey, count(*) AS n_above FROM (
        | SELECT c_nationkey, c_acctbal, avg(c_acctbal) OVER (PARTITION BY c_nationkey) AS nation_avg
        | FROM customer) WHERE c_acctbal > nation_avg GROUP BY c_nationkey""".stripMargin
  )
}
