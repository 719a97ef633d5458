package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Core relational operator surface (SURVEY.md §2: sources S1-S2, projection/
  * filter P1-P3, aggregation A1-A4, window W1, dedup D1-D2, sort/top-k O2-O3,
  * set ops U1, scalar functions F1-F7) re-expressed over the driver test
  * tables, plus the join surface the reference only has implicitly
  * (FK `events.oid__id → tracking.oid__id`, README.md:99) — inner, semi,
  * anti, multi-way star joins.
  *
  * Conventions shared with the DuckDB oracle (see `oracleSql`):
  *   - Double-typed measures are cast per-element to DECIMAL before SUM so
  *     aggregation is exact and order-independent (a parallel double sum is
  *     not associative; at 100 TB the accumulation order is arbitrary).
  *     The final value is cast back to DOUBLE — a deterministic conversion.
  *   - Every query output is a deterministic *set*: no LIMIT without a
  *     total-order tiebreak; window orderings always end in a unique key.
  *   - Timestamps are surfaced as formatted strings at the granularity the
  *     query needs — the events table is nanosecond-precision parquet, which
  *     Spark truncates to microseconds; raw values would hash-mismatch.
  *
  * Scale notes (100 TB design):
  *   - Star joins broadcast the dimension side explicitly (region/nation/
  *     supplier/part stay small at any SF; customer/orders do not — those
  *     go through shuffle joins and AQE).
  *   - Top-k uses orderBy+limit which Spark plans as TakeOrderedAndProject
  *     (per-partition heap + driver merge of k rows, no global sort).
  *   - Window queries partition by a key before ordering — no unpartitioned
  *     global windows except over already-aggregated tiny relations (q14).
  */
object Relational {

  /** Exact, order-independent sum of a double column: elementwise decimal
    * cast → decimal sum → double. Identical semantics in DuckDB. */
  private def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(s"decimal(18,$scale)")).cast("double")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A2/A3: grouped aggregation with exact decimal sums (TPC-H Q1 shape).
    "q01_pricing_summary" -> { (s, d) =>
      import s.implicits._
      Tables.lineitem(s, d)
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          dsum($"l_quantity").as("sum_qty"),
          dsum($"l_extendedprice").as("sum_base_price"),
          dsum($"l_extendedprice" * (lit(1) - $"l_discount"), 4).as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .orderBy($"l_returnflag", $"l_linestatus")
    },

    // P1/P2: filter + projection; predicate and column pruning reach the
    // parquet scan (PushedFilters in explain).
    "q02_filter_project" -> { (s, d) =>
      import s.implicits._
      Tables.lineitem(s, d)
        .filter($"l_shipdate" >= lit("1999-01-01").cast("timestamp") &&
          $"l_quantity" > 45)
        .select($"l_orderkey", $"l_linenumber", $"l_quantity", $"l_returnflag")
    },

    // Join + aggregation: revenue by market segment.
    "q03_join_agg" -> { (s, d) =>
      import s.implicits._
      Tables.customer(s, d)
        .join(Tables.orders(s, d), $"c_custkey" === $"o_custkey")
        .groupBy($"c_mktsegment")
        .agg(dsum($"o_totalprice").as("revenue"), count(lit(1)).as("n_orders"))
    },

    // Star join: region ⋈ nation ⋈ customer ⋈ orders ⋈ lineitem.
    // Dimensions are broadcast; fact-side joins shuffle on the key.
    "q04_multijoin_revenue" -> { (s, d) =>
      import s.implicits._
      Tables.lineitem(s, d)
        .join(Tables.orders(s, d), $"l_orderkey" === $"o_orderkey")
        .join(Tables.customer(s, d), $"o_custkey" === $"c_custkey")
        .join(broadcast(Tables.nation(s, d)), $"c_nationkey" === $"n_nationkey")
        .join(broadcast(Tables.region(s, d)), $"n_regionkey" === $"r_regionkey")
        .groupBy($"r_name", $"n_name")
        .agg(dsum($"l_extendedprice" * (lit(1) - $"l_discount"), 4).as("revenue"),
          count(lit(1)).as("n_items"))
    },

    // O2/O3: top-k with a total-order tiebreak → TakeOrderedAndProject.
    "q05_topk_orders" -> { (s, d) =>
      import s.implicits._
      Tables.orders(s, d)
        .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
        .limit(10)
        .select($"o_orderkey", $"o_custkey", $"o_totalprice")
    },

    // W1 generalized: partitioned ranking window, top-3 per nation.
    "q06_window_rank" -> { (s, d) =>
      import s.implicits._
      val w = Window.partitionBy($"c_nationkey")
        .orderBy($"c_acctbal".desc, $"c_custkey".asc)
      Tables.customer(s, d)
        .withColumn("rn", row_number().over(w))
        .filter($"rn" <= 3)
        .select($"c_nationkey", $"c_custkey", $"c_acctbal", $"rn")
    },

    // Running (prefix) aggregate per key — ROWS frame, unique ordering key
    // (event_id, not ts: the parquet is ns-precision which Spark truncates
    // to µs; ordering by raw ts would diverge from DuckDB on sub-µs ties).
    "q07_running_sum" -> { (s, d) =>
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d)
        .withColumn("run_total",
          sum($"value".cast("decimal(18,2)")).over(w).cast("double"))
        .select($"user_id", $"event_id", $"run_total")
    },

    // Semi join (EXISTS): customers with at least one order.
    "q08_semi_join" -> { (s, d) =>
      import s.implicits._
      Tables.customer(s, d)
        .join(Tables.orders(s, d), $"c_custkey" === $"o_custkey", "left_semi")
        .select($"c_custkey", $"c_name")
    },

    // Anti join (NOT EXISTS): customers with no orders.
    "q09_anti_join" -> { (s, d) =>
      import s.implicits._
      Tables.customer(s, d)
        .join(Tables.orders(s, d), $"c_custkey" === $"o_custkey", "left_anti")
        .select($"c_custkey", $"c_name")
    },

    // D2: DISTINCT (hash-based, shuffle on the pair).
    "q10_distinct_pairs" -> { (s, d) =>
      import s.implicits._
      Tables.events(s, d).select($"user_id", $"event_type").distinct()
    },

    // U1: UNION ALL of two conforming projections.
    "q11_union_all" -> { (s, d) =>
      import s.implicits._
      Tables.customer(s, d)
        .select(lit("C").as("kind"), $"c_name".as("name"), $"c_acctbal".as("acctbal"))
        .unionByName(Tables.supplier(s, d)
          .select(lit("S").as("kind"), $"s_name".as("name"), $"s_acctbal".as("acctbal")))
    },

    // ROLLUP: hierarchical subtotals region → nation → grand total.
    "q12_rollup" -> { (s, d) =>
      import s.implicits._
      Tables.customer(s, d)
        .join(broadcast(Tables.nation(s, d)), $"c_nationkey" === $"n_nationkey")
        .join(broadcast(Tables.region(s, d)), $"n_regionkey" === $"r_regionkey")
        .rollup($"r_name", $"n_name")
        .agg(count(lit(1)).as("n_cust"))
    },

    // A2 (reference Q1 analog, README.md:269-279): events per minute.
    "q13_events_per_minute" -> { (s, d) =>
      import s.implicits._
      Tables.events(s, d)
        .groupBy(date_format(date_trunc("minute", $"ts"), "yyyy-MM-dd HH:mm")
          .as("minute"))
        .agg(count(lit(1)).as("n_events"), dsum($"value").as("sum_value"))
    },

    // A4+W1 (reference Q3 analog, README.md:300-319): rank event types by
    // frequency — unpartitioned window over an already-aggregated tiny
    // relation (safe at any scale: input rows = |distinct event_type|).
    "q14_rank_over_agg" -> { (s, d) =>
      import s.implicits._
      val counts = Tables.events(s, d).groupBy($"event_type")
        .agg(count(lit(1)).as("total_events"))
      counts.withColumn("event_rank",
          rank().over(Window.orderBy($"total_events".desc)))
        .filter($"event_rank" <= 10)
        .select($"event_type", $"total_events", $"event_rank")
    },

    // CASE WHEN bucketing + aggregation.
    "q15_case_bucket" -> { (s, d) =>
      import s.implicits._
      Tables.lineitem(s, d)
        .withColumn("bucket",
          when($"l_quantity" <= 10, "small")
            .when($"l_quantity" <= 30, "medium")
            .otherwise("large"))
        .groupBy($"bucket")
        .agg(count(lit(1)).as("n"), dsum($"l_extendedprice").as("total_price"))
    },

    // String scalar functions: upper/substring/length.
    "q16_string_funcs" -> { (s, d) =>
      import s.implicits._
      Tables.part(s, d)
        .groupBy($"p_brand")
        .agg(count(lit(1)).as("n_parts"),
          min(upper($"p_name")).as("min_upper_name"),
          max(substring($"p_name", 1, 8)).as("max_prefix"),
          sum(length($"p_name")).as("total_name_len"))
    },

    // JSON extraction from a string column (events.props = {"k": n}).
    "q17_json_extract" -> { (s, d) =>
      import s.implicits._
      Tables.events(s, d)
        .withColumn("k", get_json_object($"props", "$.k").cast("bigint"))
        .groupBy($"event_type")
        .agg(sum($"k").as("sum_k"), count($"k").as("n_k"))
    },

    // HAVING: post-aggregation filter.
    "q18_having" -> { (s, d) =>
      import s.implicits._
      Tables.events(s, d)
        .groupBy($"user_id")
        .agg(count(lit(1)).as("n_events"))
        .filter($"n_events" > 70)
    },

    // Scalar subquery via cross join with a 1-row aggregate: orders priced
    // above the mean. Exact arithmetic (decimal × count vs decimal sum) so
    // the comparison boundary is identical in both engines.
    "q19_above_avg_orders" -> { (s, d) =>
      import s.implicits._
      val o = Tables.orders(s, d)
        .withColumn("tp", $"o_totalprice".cast("decimal(18,2)"))
      val tot = o.agg(sum($"tp").as("total_sum"), count(lit(1)).as("n_ord"))
      o.crossJoin(broadcast(tot))
        .filter($"tp" * $"n_ord" > $"total_sum")
        .select($"o_orderkey", $"o_totalprice")
    },

    // D1 (intended keep-last semantics, SURVEY.md §2.8): latest event per
    // user — row_number over a deterministic total order, rn = 1.
    "q20_dedup_keep_last" -> { (s, d) =>
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"event_id".desc)
      Tables.events(s, d)
        .withColumn("rn", row_number().over(w))
        .filter($"rn" === 1)
        .select($"user_id", $"event_id", $"event_type", $"value")
    }
  )

  val oracleSql: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
        |  COUNT(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "q02_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1999-01-01' AND l_quantity > 45""".stripMargin,

    "q03_join_agg" ->
      """SELECT c_mktsegment,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_orders
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_mktsegment""".stripMargin,

    "q04_multijoin_revenue" ->
      """SELECT r_name, n_name,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_items
        |FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name""".stripMargin,

    "q05_topk_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin,

    "q06_window_rank" ->
      """SELECT c_nationkey, c_custkey, c_acctbal, rn FROM (
        |  SELECT c_nationkey, c_custkey, c_acctbal,
        |    ROW_NUMBER() OVER (PARTITION BY c_nationkey
        |      ORDER BY c_acctbal DESC, c_custkey ASC) AS rn
        |  FROM customer) t WHERE rn <= 3""".stripMargin,

    "q07_running_sum" ->
      """SELECT user_id, event_id,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
        |    PARTITION BY user_id ORDER BY event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS run_total
        |FROM events""".stripMargin,

    "q08_semi_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin,

    "q09_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin,

    "q10_distinct_pairs" ->
      "SELECT DISTINCT user_id, event_type FROM events",

    "q11_union_all" ->
      """SELECT 'C' AS kind, c_name AS name, c_acctbal AS acctbal FROM customer
        |UNION ALL
        |SELECT 'S' AS kind, s_name AS name, s_acctbal AS acctbal FROM supplier""".stripMargin,

    "q12_rollup" ->
      """SELECT r_name, n_name, COUNT(*) AS n_cust
        |FROM customer
        |  JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, n_name)""".stripMargin,

    "q13_events_per_minute" ->
      """SELECT strftime(date_trunc('minute', ts), '%Y-%m-%d %H:%M') AS minute,
        |  COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1""".stripMargin,

    "q14_rank_over_agg" ->
      """SELECT event_type, total_events, event_rank FROM (
        |  SELECT event_type, COUNT(*) AS total_events,
        |    RANK() OVER (ORDER BY COUNT(*) DESC) AS event_rank
        |  FROM events GROUP BY event_type) t
        |WHERE event_rank <= 10""".stripMargin,

    "q15_case_bucket" ->
      """SELECT CASE WHEN l_quantity <= 10 THEN 'small'
        |            WHEN l_quantity <= 30 THEN 'medium'
        |            ELSE 'large' END AS bucket,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
        |FROM lineitem GROUP BY 1""".stripMargin,

    "q16_string_funcs" ->
      """SELECT p_brand, COUNT(*) AS n_parts,
        |  MIN(UPPER(p_name)) AS min_upper_name,
        |  MAX(SUBSTRING(p_name, 1, 8)) AS max_prefix,
        |  CAST(SUM(LENGTH(p_name)) AS BIGINT) AS total_name_len
        |FROM part GROUP BY p_brand""".stripMargin,

    "q17_json_extract" ->
      """SELECT event_type,
        |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |  COUNT(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS n_k
        |FROM events GROUP BY event_type""".stripMargin,

    "q18_having" ->
      """SELECT user_id, COUNT(*) AS n_events FROM events
        |GROUP BY user_id HAVING COUNT(*) > 70""".stripMargin,

    "q19_above_avg_orders" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE CAST(o_totalprice AS DECIMAL(18,2)) *
        |      (SELECT COUNT(*) FROM orders) >
        |      (SELECT SUM(CAST(o_totalprice AS DECIMAL(18,2))) FROM orders)""".stripMargin,

    "q20_dedup_keep_last" ->
      """SELECT user_id, event_id, event_type, value FROM (
        |  SELECT user_id, event_id, event_type, value,
        |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
        |  FROM events) t WHERE rn = 1""".stripMargin
  )
}
