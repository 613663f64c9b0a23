package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables

/** The full relational surface the reference supports (SURVEY.md section 2:
  * joins 2.3, aggregations 2.4, window/sort/limit/set-ops 2.5, scalar
  * functions 2.6) re-expressed Spark-first. The reference delegates all of
  * this to Trino core (reference: docs/src/operations/dql/select.md); here
  * Catalyst + Spark SQL built-ins supply it, so each query is a declarative
  * DataFrame/SQL program: filters and projections reach the parquet scan,
  * small dimensions are broadcast, and aggregations use partial (map-side)
  * combine automatically.
  *
  * Scale notes (100 TB design intent):
  *  - No `.collect()` anywhere; everything stays distributed.
  *  - Dimension tables (region/nation/part/supplier/customer at TPC-H
  *    ratios) are explicitly `broadcast()` where joined to fact tables.
  *  - Aggregates shuffle once on their grouping keys; AQE coalesces
  *    post-shuffle partitions on a real cluster.
  */
object Relational {
  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  /** `events.ts` as epoch NANOS regardless of the parquet physical type.
    * The driver's generator has shipped the column both ways across
    * rounds: timestamp[ns] (which Spark reads as raw int64 nanos under
    * `spark.sql.legacy.parquet.nanosAsLong`) and timestamp[us] (which
    * reads as TIMESTAMP_NTZ). Queries doing epoch math dispatch on the
    * LOADED type so both representations produce identical buckets —
    * matching DuckDB's `epoch_ns(ts)`, which is equally agnostic.
    * (`unix_micros * 1000` stays well under 2^63 for any real date.) */
  private def tsNanos(df: DataFrame, c: String): org.apache.spark.sql.Column =
    df.schema(c).dataType match {
      case org.apache.spark.sql.types.LongType => col(c)
      case _ => unix_micros(col(c).cast("timestamp")) * lit(1000L)
    }

  val all: Seq[Q] = Seq(

    // ------------------------------------------------------------------
    // Aggregation (A2): TPC-H Q1-style pricing summary. One shuffle on
    // (l_returnflag, l_linestatus); partial aggregation map-side.
    Q("q01_pricing_summary",
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2)                          AS sum_qty,
        |  round(sum(l_extendedprice), 2)                     AS sum_base_price,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2)  AS sum_disc_price,
        |  round(avg(l_quantity), 4)                          AS avg_qty,
        |  round(avg(l_extendedprice), 4)                     AS avg_price,
        |  count(*)                                           AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '2000-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
      "TPC-H Q1 pricing summary: filtered multi-aggregate groupBy") { (s, d) =>
      t(s, d, "lineitem")
        .filter(col("l_shipdate") <= lit("2000-09-02").cast("timestamp_ntz"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
            .as("sum_disc_price"),
          round(avg(col("l_quantity")), 4).as("avg_qty"),
          round(avg(col("l_extendedprice")), 4).as("avg_price"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },

    // ------------------------------------------------------------------
    // Filter + projection pushdown (P1/P3): both the predicate and the
    // 4-column projection reach the parquet scan (PushedFilters/ReadSchema).
    Q("q02_filter_project",
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem
        |WHERE l_quantity BETWEEN 30 AND 40
        |  AND l_returnflag = 'R'
        |  AND l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate <  TIMESTAMP '1998-01-01'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
      "selective filter + narrow projection, fully pushed to the scan") { (s, d) =>
      t(s, d, "lineitem")
        .filter(col("l_quantity").between(30, 40)
          && col("l_returnflag") === "R"
          && col("l_shipdate") >= lit("1997-01-01").cast("timestamp_ntz")
          && col("l_shipdate") < lit("1998-01-01").cast("timestamp_ntz"))
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
        .orderBy("l_orderkey", "l_linenumber")
    },

    // ------------------------------------------------------------------
    // Multi-way join (2.3): fact-fact shuffle join (lineitem x orders) plus
    // broadcast dims (customer is small at TPC-H ratio; nation tiny).
    Q("q03_revenue_by_nation",
      """SELECT n.n_name,
        |  round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem l
        |JOIN orders o   ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey  = c.c_custkey
        |JOIN nation n   ON c.c_nationkey = n.n_nationkey
        |GROUP BY n.n_name
        |ORDER BY n.n_name""".stripMargin,
      "4-way join: shuffle join on fact keys, broadcast dims") { (s, d) =>
      val l = t(s, d, "lineitem")
      val o = t(s, d, "orders")
      val c = t(s, d, "customer")
      val n = t(s, d, "nation")
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
            .as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("n_name"))
    },

    // ------------------------------------------------------------------
    // Broadcast join on a small dim with a pushed dim-side filter.
    Q("q04_promo_part_revenue",
      """SELECT p.p_type,
        |  round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem l
        |JOIN part p ON l.l_partkey = p.p_partkey
        |WHERE p.p_type IN ('PROMO', 'ECONOMY')
        |GROUP BY p.p_type
        |ORDER BY p.p_type""".stripMargin,
      "broadcast dim join with dim-side IN filter") { (s, d) =>
      val l = t(s, d, "lineitem")
      val p = t(s, d, "part").filter(col("p_type").isin("PROMO", "ECONOMY"))
      l.join(broadcast(p), l("l_partkey") === p("p_partkey"))
        .groupBy(col("p_type"))
        .agg(
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
            .as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("p_type"))
    },

    // ------------------------------------------------------------------
    // Semi join (EXISTS): customers with at least one finished order.
    Q("q05_segment_active_customers",
      """SELECT c_mktsegment, count(*) AS n_customers
        |FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey
        |                AND o.o_orderstatus = 'F')
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin,
      "left_semi join (EXISTS) then aggregate") { (s, d) =>
      val c = t(s, d, "customer")
      val o = t(s, d, "orders").filter(col("o_orderstatus") === "F")
        .select(col("o_custkey"))
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_customers"))
        .orderBy(col("c_mktsegment"))
    },

    // ------------------------------------------------------------------
    // Anti join (NOT EXISTS): customers with no orders at all.
    Q("q06_customers_without_orders",
      """SELECT c_custkey, c_mktsegment
        |FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey
        |                    AND o.o_orderstatus = 'P')
        |ORDER BY c_custkey""".stripMargin,
      "left_anti join (NOT EXISTS): customers with no pending orders") { (s, d) =>
      val c = t(s, d, "customer")
      val o = t(s, d, "orders").filter(col("o_orderstatus") === "P")
        .select(col("o_custkey"))
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select("c_custkey", "c_mktsegment")
        .orderBy("c_custkey")
    },

    // ------------------------------------------------------------------
    // Window (W1): rank within partition, deterministic tie-break.
    Q("q07_top_orders_per_customer",
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders)
        |WHERE rn <= 3
        |ORDER BY o_custkey, rn""".stripMargin,
      "row_number window, top-3 per customer") { (s, d) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, d, "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
        .orderBy("o_custkey", "rn")
    },

    // ------------------------------------------------------------------
    // Window (W1): running sum over a fully-ordered frame.
    Q("q08_running_revenue_by_supplier",
      """SELECT l_suppkey, l_orderkey, l_linenumber,
        |  round(sum(l_extendedprice) OVER (
        |    PARTITION BY l_suppkey
        |    ORDER BY l_shipdate, l_orderkey, l_linenumber
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_rev
        |FROM lineitem
        |WHERE l_suppkey <= 10
        |ORDER BY l_suppkey, l_orderkey, l_linenumber""".stripMargin,
      "cumulative windowed sum with total ordering inside partitions") { (s, d) =>
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, d, "lineitem")
        .filter(col("l_suppkey") <= 10)
        .withColumn("running_rev", round(sum(col("l_extendedprice")).over(w), 2))
        .select("l_suppkey", "l_orderkey", "l_linenumber", "running_rev")
        .orderBy("l_suppkey", "l_orderkey", "l_linenumber")
    },

    // ------------------------------------------------------------------
    // DISTINCT (shuffle dedup).
    Q("q09_distinct_status_combos",
      """SELECT DISTINCT l_returnflag, l_linestatus
        |FROM lineitem
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
      "distinct over two low-cardinality columns") { (s, d) =>
      t(s, d, "lineitem")
        .select("l_returnflag", "l_linestatus")
        .distinct()
        .orderBy("l_returnflag", "l_linestatus")
    },

    // ------------------------------------------------------------------
    // Set ops (U1): INTERSECT.
    Q("q10_intersect_custkeys",
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |INTERSECT
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        |ORDER BY o_custkey""".stripMargin,
      "INTERSECT of two filtered projections") { (s, d) =>
      val o = t(s, d, "orders")
      o.filter(col("o_orderstatus") === "F").select("o_custkey")
        .intersect(o.filter(col("o_orderstatus") === "O").select("o_custkey"))
        .orderBy("o_custkey")
    },

    // ------------------------------------------------------------------
    // Set ops (U1): EXCEPT.
    Q("q11_except_custkeys",
      """SELECT c_custkey FROM customer
        |EXCEPT
        |SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'P'
        |ORDER BY c_custkey""".stripMargin,
      "EXCEPT: all customers minus those with pending orders") { (s, d) =>
      t(s, d, "customer").select("c_custkey")
        .except(t(s, d, "orders").filter(col("o_orderstatus") === "P")
          .select(col("o_custkey").as("c_custkey")))
        .orderBy("c_custkey")
    },

    // ------------------------------------------------------------------
    // Top-N (O2/O3): ORDER BY + LIMIT plans as TakeOrderedAndProject —
    // no global sort, per-partition top-N then merge on the driver.
    Q("q12_top10_orders",
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 10""".stripMargin,
      "global top-10 via TakeOrderedAndProject") { (s, d) =>
      t(s, d, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10)
    },

    // ------------------------------------------------------------------
    // HAVING (A2).
    Q("q13_big_customers",
      """SELECT o_custkey, count(*) AS n_orders,
        |  round(sum(o_totalprice), 2) AS total_spend
        |FROM orders
        |GROUP BY o_custkey
        |HAVING count(*) >= 5
        |ORDER BY o_custkey""".stripMargin,
      "groupBy + HAVING post-aggregate filter") { (s, d) =>
      t(s, d, "orders")
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"),
          round(sum(col("o_totalprice")), 2).as("total_spend"))
        .filter(col("n_orders") >= 5)
        .orderBy("o_custkey")
    },

    // ------------------------------------------------------------------
    // ROLLUP grouping sets (A2).
    Q("q14_rollup_counts",
      """SELECT l_returnflag, l_linestatus, count(*) AS n
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
      "ROLLUP grouping sets with subtotal rows") { (s, d) =>
      t(s, d, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first)
    },

    // ------------------------------------------------------------------
    // Scalar functions (2.6): date parts, string ops, CASE — all
    // codegen'd built-ins, no UDFs.
    Q("q15_order_features",
      """SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS INTEGER)  AS order_year,
        |  CAST(month(o_orderdate) AS INTEGER) AS order_month,
        |  substr(o_orderpriority, 1, 1)       AS priority_code,
        |  upper(o_orderstatus)                AS status_uc,
        |  CASE WHEN o_totalprice >= 300000 THEN 'large'
        |       WHEN o_totalprice >= 100000 THEN 'medium'
        |       ELSE 'small' END               AS size_bucket,
        |  concat(o_orderstatus, '-', o_orderpriority) AS status_priority
        |FROM orders
        |WHERE o_orderkey <= 1000
        |ORDER BY o_orderkey""".stripMargin,
      "scalar-function surface: date parts, substr/upper/concat, CASE") { (s, d) =>
      t(s, d, "orders")
        .filter(col("o_orderkey") <= 1000)
        .select(
          col("o_orderkey"),
          year(col("o_orderdate")).as("order_year"),
          month(col("o_orderdate")).as("order_month"),
          substring(col("o_orderpriority"), 1, 1).as("priority_code"),
          upper(col("o_orderstatus")).as("status_uc"),
          when(col("o_totalprice") >= 300000, "large")
            .when(col("o_totalprice") >= 100000, "medium")
            .otherwise("small").as("size_bucket"),
          concat(col("o_orderstatus"), lit("-"), col("o_orderpriority"))
            .as("status_priority"))
        .orderBy("o_orderkey")
    },

    // ------------------------------------------------------------------
    // Scalar subquery (Catalyst decorrelates; subquery result broadcast).
    Q("q16_above_avg_orders",
      """SELECT o_orderpriority, count(*) AS n,
        |  round(avg(o_totalprice), 2) AS avg_price
        |FROM orders
        |WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
      "scalar subquery in WHERE, then aggregate") { (s, d) =>
      Tables.registerViews(s, d)
      s.sql(
        """SELECT o_orderpriority, count(*) AS n,
          |  round(avg(o_totalprice), 2) AS avg_price
          |FROM orders
          |WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)
          |GROUP BY o_orderpriority
          |ORDER BY o_orderpriority""".stripMargin)
    },

    // ------------------------------------------------------------------
    // CTE + join pipeline through plain SQL (full Spark SQL surface).
    Q("q17_cte_top_customers",
      """WITH order_rev AS (
        |  SELECT o.o_custkey, sum(l.l_extendedprice * (1 - l.l_discount)) AS rev
        |  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |  GROUP BY o.o_custkey)
        |SELECT c.c_custkey, c.c_mktsegment, round(r.rev, 2) AS revenue
        |FROM order_rev r JOIN customer c ON c.c_custkey = r.o_custkey
        |ORDER BY r.rev DESC, c.c_custkey
        |LIMIT 20""".stripMargin,
      "CTE + join + top-20, exercised through spark.sql") { (s, d) =>
      Tables.registerViews(s, d)
      s.sql(
        """WITH order_rev AS (
          |  SELECT o.o_custkey, sum(l.l_extendedprice * (1 - l.l_discount)) AS rev
          |  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
          |  GROUP BY o.o_custkey)
          |SELECT c.c_custkey, c.c_mktsegment, round(r.rev, 2) AS revenue
          |FROM order_rev r JOIN customer c ON c.c_custkey = r.o_custkey
          |ORDER BY r.rev DESC, c.c_custkey
          |LIMIT 20""".stripMargin)
    },

    // ------------------------------------------------------------------
    // Correlated EXISTS with a non-equi correlated predicate.
    Q("q18_exists_high_value",
      """SELECT c_custkey, round(c_acctbal, 2) AS acctbal
        |FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey
        |                AND o.o_totalprice > 100 * c.c_acctbal)
        |ORDER BY c_custkey""".stripMargin,
      "correlated EXISTS with inequality correlation") { (s, d) =>
      Tables.registerViews(s, d)
      s.sql(
        """SELECT c_custkey, round(c_acctbal, 2) AS acctbal
          |FROM customer c
          |WHERE EXISTS (SELECT 1 FROM orders o
          |              WHERE o.o_custkey = c.c_custkey
          |                AND o.o_totalprice > 100 * c.c_acctbal)
          |ORDER BY c_custkey""".stripMargin)
    },

    // ------------------------------------------------------------------
    // Event-time bucketing on the events table. Integer bucket math in
    // NANOS so both engines agree bit-for-bit; `tsNanos` dispatches on
    // the loaded type (int64-nanos vs timestamp — the generator has
    // shipped both).
    Q("q19_event_hourly",
      """SELECT CAST(epoch_ns(ts) // 3600000000000 AS BIGINT) * 3600 AS bucket_sec,
        |  event_type, count(*) AS n, round(sum(value), 2) AS total_value
        |FROM events
        |GROUP BY 1, 2
        |ORDER BY bucket_sec, event_type""".stripMargin,
      "hourly event-time buckets via integer epoch math (ts is int64 nanos)") { (s, d) =>
      // NB: `div`, not `/` — epoch nanos exceed 2^53, double division
      // would lose bucket-boundary precision.
      val ev = t(s, d, "events")
      ev
        .withColumn("__ns", tsNanos(ev, "ts"))
        .withColumn("bucket_sec", expr("__ns div 3600000000000") * 3600)
        .groupBy(col("bucket_sec"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))
        .orderBy("bucket_sec", "event_type")
    },

    // ------------------------------------------------------------------
    // Date truncation + daily counts.
    Q("q20_orders_per_day",
      """SELECT CAST(o_orderdate AS DATE) AS order_day, count(*) AS n
        |FROM orders
        |GROUP BY 1
        |ORDER BY order_day""".stripMargin,
      "timestamp-to-date truncation + daily aggregate") { (s, d) =>
      t(s, d, "orders")
        .groupBy(to_date(col("o_orderdate")).as("order_day"))
        .agg(count(lit(1)).as("n"))
        .orderBy("order_day")
    },

    // ------------------------------------------------------------------
    // COUNT(*) (A1): at 100 TB this is served from table-format metadata
    // (see graft.format GraftTable manifest count); over raw parquet Spark
    // already answers it from footer row counts without reading columns.
    Q("q21_count_star",
      "SELECT count(*) AS n FROM lineitem",
      "bare count(*), metadata-only scan") { (s, d) =>
      t(s, d, "lineitem").agg(count(lit(1)).as("n"))
    },

    // ------------------------------------------------------------------
    // Statistical aggregates.
    Q("q22_price_stats",
      """SELECT l_returnflag,
        |  round(min(l_extendedprice), 2)         AS min_price,
        |  round(max(l_extendedprice), 2)         AS max_price,
        |  round(avg(l_extendedprice), 2)         AS avg_price,
        |  round(stddev_samp(l_extendedprice), 2) AS sd_price,
        |  count(DISTINCT l_partkey)              AS n_parts
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
      "min/max/avg/stddev/count-distinct per group") { (s, d) =>
      t(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          round(min(col("l_extendedprice")), 2).as("min_price"),
          round(max(col("l_extendedprice")), 2).as("max_price"),
          round(avg(col("l_extendedprice")), 2).as("avg_price"),
          round(stddev_samp(col("l_extendedprice")), 2).as("sd_price"),
          countDistinct(col("l_partkey")).as("n_parts"))
        .orderBy("l_returnflag")
    },

    // ------------------------------------------------------------------
    // IN-list + LIKE predicates (P3/P4/P5 pushdown shapes).
    Q("q23_in_like_filter",
      """SELECT o_orderpriority, o_orderstatus, count(*) AS n
        |FROM orders
        |WHERE o_orderstatus IN ('F', 'O')
        |  AND o_orderpriority LIKE '1-%'
        |GROUP BY o_orderpriority, o_orderstatus
        |ORDER BY o_orderpriority, o_orderstatus""".stripMargin,
      "IN-list and LIKE prefix predicates") { (s, d) =>
      t(s, d, "orders")
        .filter(col("o_orderstatus").isin("F", "O")
          && col("o_orderpriority").like("1-%"))
        .groupBy(col("o_orderpriority"), col("o_orderstatus"))
        .agg(count(lit(1)).as("n"))
        .orderBy("o_orderpriority", "o_orderstatus")
    },

    // ------------------------------------------------------------------
    // CUBE grouping sets (A2).
    Q("q24_cube_order_matrix",
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n
        |FROM orders
        |GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,
      "CUBE over status x priority") { (s, d) =>
      t(s, d, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("o_orderstatus").asc_nulls_first,
          col("o_orderpriority").asc_nulls_first)
    },

    // ------------------------------------------------------------------
    // Sessionization in batch: 30-minute-gap sessions per user via
    // lag + cumulative window sum (the batch analog of streaming
    // session_window; see graft.streaming for the streaming form).
    Q("q26_sessionize",
      """WITH g AS (
        |  SELECT user_id, ts,
        |    CASE WHEN epoch_ns(ts) - lag(epoch_ns(ts))
        |           OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |           > 1800000000000 OR lag(epoch_ns(ts))
        |           OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
        |         THEN 1 ELSE 0 END AS new_sess
        |  FROM events),
        |sess AS (
        |  SELECT user_id, ts,
        |    sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
        |                        ROWS UNBOUNDED PRECEDING) AS sess_id
        |  FROM g)
        |SELECT user_id, CAST(sess_id AS BIGINT) AS sess_id,
        |  count(*) AS n_events
        |FROM sess GROUP BY user_id, sess_id
        |ORDER BY user_id, sess_id""".stripMargin,
      "gap-based sessionization: lag + cumulative sum windows") { (s, d) =>
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val cumul = Window.partitionBy(col("user_id")).orderBy(col("ts"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val ev = t(s, d, "events")
      ev
        .withColumn("__ns", tsNanos(ev, "ts"))
        .withColumn("prev_ns", lag(col("__ns"), 1).over(byUser))
        .withColumn("new_sess",
          when(col("prev_ns").isNull
            || col("__ns") - col("prev_ns") > 1800000000000L, 1).otherwise(0))
        .withColumn("sess_id", sum(col("new_sess")).over(cumul))
        .groupBy(col("user_id"), col("sess_id"))
        .agg(count(lit(1)).as("n_events"))
        .orderBy("user_id", "sess_id")
    },

    // ------------------------------------------------------------------
    // As-of join (an operator the reference lacks entirely; Spark has no
    // built-in either). Composed from existing ops — union + ordered
    // window with last_value(ignoreNulls) — per the custom-operator
    // preference order: composition beats a custom SparkPlan when the
    // semantics fit. One sort-shuffle total; at scale add a range-bucket
    // pre-partition on time so the window never sees one giant partition.
    Q("q27_asof_join",
      """WITH c AS (
        |  SELECT user_id, event_id, epoch_ns(ts) AS t_ns
        |  FROM events WHERE event_type = 'click'),
        |p AS (
        |  SELECT user_id, event_id, epoch_ns(ts) AS t_ns
        |  FROM events WHERE event_type = 'purchase')
        |SELECT p.event_id AS purchase_id, c.event_id AS last_click_id
        |FROM p ASOF JOIN c
        |  ON p.user_id = c.user_id AND c.t_ns <= p.t_ns
        |ORDER BY purchase_id""".stripMargin,
      "as-of join: latest click at-or-before each purchase, per user") { (s, d) =>
      val ev = t(s, d, "events")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts").as("t_ns"), lit(0).as("kind"),
          col("event_id").as("click_id"),
          lit(null).cast("long").as("purchase_id"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts").as("t_ns"), lit(1).as("kind"),
          lit(null).cast("long").as("click_id"),
          col("event_id").as("purchase_id"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("t_ns"), col("kind"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      clicks.unionAll(purchases)
        .withColumn("last_click_id",
          last(col("click_id"), ignoreNulls = true).over(w))
        .filter(col("kind") === 1 && col("last_click_id").isNotNull)
        .select(col("purchase_id"), col("last_click_id"))
        .orderBy("purchase_id")
    },

    // ------------------------------------------------------------------
    // UNION ALL + re-aggregate (U1).
    Q("q25_union_all_parts",
      """SELECT src, count(*) AS n FROM (
        |  SELECT 'small' AS src FROM part WHERE p_size <= 10
        |  UNION ALL
        |  SELECT 'large' AS src FROM part WHERE p_size > 40)
        |GROUP BY src
        |ORDER BY src""".stripMargin,
      "UNION ALL of two branches then aggregate") { (s, d) =>
      val p = t(s, d, "part")
      p.filter(col("p_size") <= 10).select(lit("small").as("src"))
        .unionAll(p.filter(col("p_size") > 40).select(lit("large").as("src")))
        .groupBy(col("src")).agg(count(lit(1)).as("n"))
        .orderBy("src")
    },

    // ------------------------------------------------------------------
    // LEFT OUTER join with null-extension semantics under aggregation:
    // count(*) counts null-extended rows, count(col) does not.
    Q("q28_left_outer",
      """SELECT c_mktsegment,
        |  count(*) AS n_rows,
        |  CAST(count(o_orderkey) AS BIGINT) AS n_orders,
        |  CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_lonely
        |FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin,
      "left outer join: null-extended rows counted distinctly") { (s, d) =>
      t(s, d, "customer").join(t(s, d, "orders"),
          col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_rows"),
          count(col("o_orderkey")).as("n_orders"),
          sum(when(col("o_orderkey").isNull, 1).otherwise(0))
            .cast("long").as("n_lonely"))
        .orderBy("c_mktsegment")
    },

    // FULL OUTER join of two partial aggregates; coalesce fills the
    // side that has no row for a nation.
    Q("q29_full_outer",
      """SELECT coalesce(s.nk, c.nk) AS nationkey,
        |  CAST(coalesce(s.ns, 0) AS BIGINT) AS n_debt_suppliers,
        |  CAST(coalesce(c.nc, 0) AS BIGINT) AS n_debt_customers
        |FROM (SELECT s_nationkey AS nk, count(*) AS ns FROM supplier
        |      WHERE s_acctbal < -800 GROUP BY 1) s
        |FULL JOIN (SELECT c_nationkey AS nk, count(*) AS nc FROM customer
        |           WHERE c_acctbal < -900 GROUP BY 1) c
        |  ON s.nk = c.nk
        |ORDER BY nationkey""".stripMargin,
      "full outer join of two filtered aggregates") { (s, d) =>
      val sup = t(s, d, "supplier").filter(col("s_acctbal") < -800)
        .groupBy(col("s_nationkey").as("snk"))
        .agg(count(lit(1)).as("ns"))
        .select(col("snk"), col("ns"))
      val cus = t(s, d, "customer").filter(col("c_acctbal") < -900)
        .groupBy(col("c_nationkey").as("cnk"))
        .agg(count(lit(1)).as("nc"))
        .select(col("cnk"), col("nc"))
      sup.join(cus, col("snk") === col("cnk"), "full_outer")
        .select(coalesce(col("snk"), col("cnk")).as("nationkey"),
          coalesce(col("ns"), lit(0L)).as("n_debt_suppliers"),
          coalesce(col("nc"), lit(0L)).as("n_debt_customers"))
        .orderBy("nationkey")
    },

    // ------------------------------------------------------------------
    // Exact quantiles + bivariate statistics (A2 depth): Spark's
    // `percentile` and DuckDB's `quantile_cont` share the same
    // linear-interpolation definition, and corr/covar_samp are the
    // textbook sample statistics in both engines, so the results match
    // to rounding. At 100 TB exact percentile is a per-group sort of
    // that group's values (Spark's TypedImperativeAggregate buffers per
    // group); for corpus-wide quantiles at extreme scale the
    // approx_percentile sketch is the escape hatch — here groups are
    // few and bounded so exact is the right default.
    Q("q31_price_quantiles",
      """SELECT l_returnflag,
        |  round(quantile_cont(l_extendedprice, 0.25), 1) AS p25,
        |  round(quantile_cont(l_extendedprice, 0.50), 1) AS p50,
        |  round(quantile_cont(l_extendedprice, 0.75), 1) AS p75,
        |  round(corr(l_extendedprice, l_quantity), 4)    AS corr_pq,
        |  round(covar_samp(l_extendedprice, l_quantity), 2) AS cov_pq
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
      "exact quartiles + correlation/covariance per return flag") { (s, d) =>
      t(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          // 1dp, not 2: Spark interpolates lower+(upper-lower)*frac,
          // DuckDB lower*(1-frac)+upper*frac — equal in R, one ulp apart
          // in FP, and at sf0.001 that ulp once straddled a cent boundary
          round(expr("percentile(l_extendedprice, 0.25)"), 1).as("p25"),
          round(expr("percentile(l_extendedprice, 0.50)"), 1).as("p50"),
          round(expr("percentile(l_extendedprice, 0.75)"), 1).as("p75"),
          round(corr(col("l_extendedprice"), col("l_quantity")), 4)
            .as("corr_pq"),
          round(covar_samp(col("l_extendedprice"), col("l_quantity")), 2)
            .as("cov_pq"))
        .orderBy("l_returnflag")
    },

    // ------------------------------------------------------------------
    // LIMIT + OFFSET pagination (O3; reference documents both,
    // select.md "LIMIT and OFFSET"). Fully tie-broken ORDER BY so the
    // page is deterministic on any engine; Spark plans offset+limit as
    // one TakeOrdered-style global operation, no full sort collect.
    Q("q30_limit_offset",
      """SELECT o_orderkey, o_totalprice
        |FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 10 OFFSET 10""".stripMargin,
      "pagination: second page of the top orders, deterministic order") {
      (s, d) =>
      t(s, d, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .select(col("o_orderkey"), col("o_totalprice"))
        .offset(10)
        .limit(10)
    }
  )
}
