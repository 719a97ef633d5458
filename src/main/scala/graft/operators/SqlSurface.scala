package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.Tables

/** Oracle-gated coverage of the SQL-TEXT path (Catalyst parse → analyze →
  * optimize) over the synthetic tables: LATERAL VIEW table generators,
  * correlated subqueries, and CTE + window — the constructs interactive
  * users write that the DataFrame DSL expresses differently.
  */
object SqlSurface {

  private def withViews(s: SparkSession, d: String, names: String*): Unit =
    names.foreach(n => Tables.load(s, d, n).createOrReplaceTempView(n))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // LATERAL VIEW explode (HiveQL-style table generator in SQL text).
    "sql01_lateral_view" -> { (s, d) =>
      withViews(s, d, "documents")
      s.sql("""SELECT token, COUNT(*) AS n
              |FROM documents
              |LATERAL VIEW explode(split(text, ' ')) t AS token
              |GROUP BY token""".stripMargin)
    },

    // Correlated scalar subquery in SQL text.
    "sql02_correlated" -> { (s, d) =>
      withViews(s, d, "customer", "orders")
      s.sql("""SELECT c_custkey, c_name,
              |  (SELECT COUNT(*) FROM orders WHERE o_custkey = c_custkey)
              |    AS n_orders
              |FROM customer
              |WHERE (SELECT COUNT(*) FROM orders WHERE o_custkey = c_custkey) >= 15""".stripMargin)
    },

    // CTE chain + window in SQL text.
    "sql03_cte_window" -> { (s, d) =>
      withViews(s, d, "events")
      s.sql("""WITH per_user AS (
              |  SELECT user_id, event_type, COUNT(*) AS n
              |  FROM events GROUP BY user_id, event_type),
              |ranked AS (
              |  SELECT user_id, event_type, n,
              |    ROW_NUMBER() OVER (PARTITION BY user_id
              |      ORDER BY n DESC, event_type ASC) AS rn
              |  FROM per_user)
              |SELECT user_id, event_type AS top_type, n AS top_n
              |FROM ranked WHERE rn = 1""".stripMargin)
    },

    // Explicit GROUPING SETS — the general form rollup (q12) and cube
    // (q24) specialize; grouping_id disambiguates real NULLs from
    // superaggregate rows (q44 precedent). Decimal-cast sum per dsum.
    "sql04_grouping_sets" -> { (s, d) =>
      withViews(s, d, "orders")
      s.sql("""SELECT o_orderstatus, o_orderpriority,
              |  CAST(grouping(o_orderstatus) AS INT) AS g_status,
              |  CAST(grouping(o_orderpriority) AS INT) AS g_priority,
              |  COUNT(*) AS n,
              |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
              |    AS total
              |FROM orders
              |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
              |  (o_orderstatus), (o_orderpriority), ())""".stripMargin)
    },

    // WITH RECURSIVE (Spark 4 iterative CTE): generate the dense month
    // spine between the first and last order month, then left join the
    // monthly order counts — the canonical zero-filled calendar query.
    //
    // Scale shape: every recursive iteration is a Spark job, so the
    // naive one-month-per-step spine costs O(months) jobs AND — if the
    // bound rides a CTE joined into the recursive term — rescans orders
    // each step (measured 13.5 s at sf0.1). Instead: bounds come off ONE
    // tiny aggregate (driver scalar — the PageRank/BPE-argmax pattern),
    // and the spine doubles per step (binary counting: each row (m, st)
    // emits (m, 2st) and (m+st, 2st), so step k holds exactly the months
    // lo..lo+2^k-1 at stride st=2^k). O(log months) iterations of pure
    // arithmetic on a ~month-count relation — 1.2 s warm, and the depth
    // grows by ONE job per doubling of history, at any data scale. The
    // final filter keeps the last (complete) generation only.
    "sql05_recursive_cte" -> { (s, d) =>
      withViews(s, d, "orders")
      val b = s.sql(
        """SELECT CAST(date_trunc('month', MIN(o_orderdate)) AS DATE) AS lo,
          |       CAST(date_trunc('month', MAX(o_orderdate)) AS DATE) AS hi
          |FROM orders""".stripMargin).head()
      val lo = b.getDate(0).toLocalDate
      val hi = b.getDate(1).toLocalDate
      val nMonths = java.time.temporal.ChronoUnit.MONTHS
        .between(lo.withDayOfMonth(1), hi.withDayOfMonth(1)).toInt + 1
      var fin = 1
      while (fin < nMonths) fin *= 2
      s.sql(s"""WITH RECURSIVE gen(m, st) AS (
               |  SELECT DATE'$lo', 1
               |  UNION ALL
               |  SELECT add_months(m, a), st * 2
               |  FROM (SELECT m, st, explode(array(0, st)) AS a
               |        FROM gen WHERE st < $fin)),
               |monthly AS (
               |  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS m,
               |         COUNT(*) AS n
               |  FROM orders GROUP BY 1)
               |SELECT gen.m AS month_start,
               |       COALESCE(monthly.n, 0) AS n_orders
               |FROM gen LEFT JOIN monthly ON gen.m = monthly.m
               |WHERE gen.st = $fin AND gen.m <= DATE'$hi'""".stripMargin)
    }
  )

  val oracleSql: Map[String, String] = Map(
    "sql01_lateral_view" ->
      """SELECT token, COUNT(*) AS n FROM
        |  (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
        |GROUP BY token""".stripMargin,

    "sql02_correlated" ->
      """SELECT c_custkey, c_name,
        |  (SELECT COUNT(*) FROM orders WHERE o_custkey = c_custkey)
        |    AS n_orders
        |FROM customer
        |WHERE (SELECT COUNT(*) FROM orders WHERE o_custkey = c_custkey) >= 15""".stripMargin,

    "sql03_cte_window" ->
      """WITH per_user AS (
        |  SELECT user_id, event_type, COUNT(*) AS n
        |  FROM events GROUP BY user_id, event_type),
        |ranked AS (
        |  SELECT user_id, event_type, n,
        |    ROW_NUMBER() OVER (PARTITION BY user_id
        |      ORDER BY n DESC, event_type ASC) AS rn
        |  FROM per_user)
        |SELECT user_id, event_type AS top_type, n AS top_n
        |FROM ranked WHERE rn = 1""".stripMargin,

    "sql04_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority,
        |  CAST(grouping(o_orderstatus) AS INT) AS g_status,
        |  CAST(grouping(o_orderpriority) AS INT) AS g_priority,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
        |  (o_orderstatus), (o_orderpriority), ())""".stripMargin,

    "sql05_recursive_cte" ->
      """WITH RECURSIVE bounds AS (
        |  SELECT CAST(date_trunc('month', MIN(o_orderdate)) AS DATE) AS lo,
        |         CAST(date_trunc('month', MAX(o_orderdate)) AS DATE) AS hi
        |  FROM orders),
        |months(m) AS (
        |  SELECT lo FROM bounds
        |  UNION ALL
        |  SELECT CAST(m + INTERVAL 1 MONTH AS DATE)
        |  FROM months JOIN bounds ON m < hi),
        |monthly AS (
        |  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS m,
        |         COUNT(*) AS n
        |  FROM orders GROUP BY 1)
        |SELECT months.m AS month_start,
        |       COALESCE(monthly.n, 0) AS n_orders
        |FROM months LEFT JOIN monthly ON months.m = monthly.m""".stripMargin
  )
}
