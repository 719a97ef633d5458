package graft.etl

import java.sql.DriverManager

import graft.SparkSpec

/** Upsert sink semantics against embedded Derby (in-memory JDBC): create-
  * if-absent, latest-batch-wins per key, and idempotent replay — the three
  * properties the reference sink guarantees (postgres.py:18-38).
  */
class JdbcUpsertSpec extends SparkSpec {
  import spark.implicits._

  private val url = "jdbc:derby:memory:upsertdb;create=true"
  private val colTypes = Some("oid__id VARCHAR(64), payload VARCHAR(64)")

  private def tableRows(table: String): Map[String, String] = {
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      try {
        val rs = st.executeQuery(s"""SELECT "oid__id", "payload" FROM $table""")
        val b = Map.newBuilder[String, String]
        while (rs.next()) b += rs.getString(1) -> rs.getString(2)
        b.result()
      } finally st.close()
    } finally conn.close()
  }

  test("upsert: create, latest-batch-wins, idempotent replay") {
    assume(!isClusterMaster,
      "embedded in-memory Derby is per-JVM: executor tasks would see an " +
      "empty instance; multi-JVM sink coverage lives in the PG15 fixture " +
      "specs (PostgresUpsertSpec / StreamingSpec cluster lane)")
    val t = "tracking_test"
    val batch1 = Seq(("k1", "v1"), ("k2", "v1")).toDF("oid__id", "payload")
    JdbcUpsert.upsert(batch1, url, t, "oid__id",
      createTableColumnTypes = colTypes)
    assert(tableRows(t) === Map("k1" -> "v1", "k2" -> "v1"))

    // overlapping second batch: k2 replaced, k3 added
    val batch2 = Seq(("k2", "v2"), ("k3", "v2")).toDF("oid__id", "payload")
    JdbcUpsert.upsert(batch2, url, t, "oid__id",
      createTableColumnTypes = colTypes)
    assert(tableRows(t) === Map("k1" -> "v1", "k2" -> "v2", "k3" -> "v2"))

    // replaying the same batch converges to the same state (idempotence)
    JdbcUpsert.upsert(batch2, url, t, "oid__id",
      createTableColumnTypes = colTypes)
    assert(tableRows(t) === Map("k1" -> "v1", "k2" -> "v2", "k3" -> "v2"))
  }

  test("null-key rows replay idempotently (latest batch wins for the null group)") {
    assume(!isClusterMaster,
      "embedded in-memory Derby is per-JVM: executor tasks would see an " +
      "empty instance; multi-JVM sink coverage lives in the PG15 fixture " +
      "specs (PostgresUpsertSpec / StreamingSpec cluster lane)")
    val t = "nullkey_test"
    val batch = Seq((Option("k1"), "v1"), (Option.empty[String], "vnull"))
      .toDF("oid__id", "payload")
    JdbcUpsert.upsert(batch, url, t, "oid__id",
      createTableColumnTypes = colTypes)
    JdbcUpsert.upsert(batch, url, t, "oid__id",
      createTableColumnTypes = colTypes)
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      try {
        val rs = st.executeQuery(s"SELECT COUNT(*) FROM $t")
        rs.next()
        assert(rs.getLong(1) === 2L,
          "replaying a batch with a NULL key must not duplicate rows")
      } finally st.close()
    } finally conn.close()
  }

  test("MERGE promotion: latest-batch-wins, idempotent replay, null key — executed on Derby") {
    assume(!isClusterMaster,
      "embedded in-memory Derby is per-JVM: executor tasks would see an " +
      "empty instance; multi-JVM sink coverage lives in the PG15 fixture " +
      "specs (PostgresUpsertSpec / StreamingSpec cluster lane)")
    // Derby implements SQL:2003 MERGE (10.11+), so the merge path runs
    // for real here, not just as a pinned string: same three sink
    // properties as delete+insert, on unique-key-per-batch input
    val t = "merge_test"
    val batch1 = Seq((Option("k1"), "v1"), (Option("k2"), "v1"),
      (Option.empty[String], "vn1")).toDF("oid__id", "payload")
    JdbcUpsert.upsert(batch1, url, t, "oid__id",
      createTableColumnTypes = colTypes, useMerge = true)
    assert(tableRows(t) === Map("k1" -> "v1", "k2" -> "v1", (null: String) -> "vn1"))

    // overlap: k2 replaced, k3 added, the null-key row replaced not duped
    val batch2 = Seq((Option("k2"), "v2"), (Option("k3"), "v2"),
      (Option.empty[String], "vn2")).toDF("oid__id", "payload")
    JdbcUpsert.upsert(batch2, url, t, "oid__id",
      createTableColumnTypes = colTypes, useMerge = true)
    assert(tableRows(t) ===
      Map("k1" -> "v1", "k2" -> "v2", "k3" -> "v2", (null: String) -> "vn2"))

    // idempotent replay
    JdbcUpsert.upsert(batch2, url, t, "oid__id",
      createTableColumnTypes = colTypes, useMerge = true)
    assert(tableRows(t) ===
      Map("k1" -> "v1", "k2" -> "v2", "k3" -> "v2", (null: String) -> "vn2"))
  }

  test("partitioned promotion (promotePartitions=3): value parity with " +
    "single-txn, null key, idempotent replay, ranges>keys degenerate") {
    assume(!isClusterMaster,
      "embedded in-memory Derby is per-JVM: executor tasks would see an " +
      "empty instance; multi-JVM sink coverage lives in the PG15 fixture " +
      "specs (PostgresUpsertSpec / StreamingSpec cluster lane)")
    val single = "range_single"
    val ranged = "range_ranged"
    // 7 keys across 3 ranges, plus a null-key row (own transaction)
    val batch1 = (1 to 7).map(i => (Option(f"k$i%02d"), "v1")) :+
      (Option.empty[String], "vn1")
    val b1 = batch1.toDF("oid__id", "payload")
    JdbcUpsert.upsert(b1, url, single, "oid__id",
      createTableColumnTypes = colTypes)
    JdbcUpsert.upsert(b1, url, ranged, "oid__id",
      createTableColumnTypes = colTypes, promotePartitions = 3)
    assert(tableRows(ranged) === tableRows(single))

    // overlapping second batch: k03/k05 replaced, k08 added, null replaced
    val batch2 = Seq((Option("k03"), "v2"), (Option("k05"), "v2"),
      (Option("k08"), "v2"), (Option.empty[String], "vn2"))
    val b2 = batch2.toDF("oid__id", "payload")
    JdbcUpsert.upsert(b2, url, single, "oid__id",
      createTableColumnTypes = colTypes)
    JdbcUpsert.upsert(b2, url, ranged, "oid__id",
      createTableColumnTypes = colTypes, promotePartitions = 3)
    assert(tableRows(ranged) === tableRows(single))

    // idempotent replay through the ranged path
    JdbcUpsert.upsert(b2, url, ranged, "oid__id",
      createTableColumnTypes = colTypes, promotePartitions = 3)
    assert(tableRows(ranged) === tableRows(single))

    // more ranges than keys: degenerates to fewer ranges, same values
    JdbcUpsert.upsert(b2, url, ranged, "oid__id",
      createTableColumnTypes = colTypes, promotePartitions = 16)
    assert(tableRows(ranged) === tableRows(single))

    // MERGE + ranges is rejected loudly, not silently single-txn'd
    intercept[IllegalArgumentException] {
      JdbcUpsert.upsert(b2, url, ranged, "oid__id",
        createTableColumnTypes = colTypes, useMerge = true,
        promotePartitions = 3)
    }
  }

  test("reading back via JDBC pushes filters into the database") {
    assume(!isClusterMaster,
      "embedded in-memory Derby is per-JVM: executor tasks would see an " +
      "empty instance; multi-JVM sink coverage lives in the PG15 fixture " +
      "specs (PostgresUpsertSpec / StreamingSpec cluster lane)")
    val t = "pushdown_test"
    val df = Seq(("k1", "a.csv"), ("k2", "b.csv"), ("k3", "c.csv"))
      .toDF("oid__id", "fileName")
    JdbcUpsert.upsert(df, url, t, "oid__id",
      createTableColumnTypes = Some("oid__id VARCHAR(64), fileName VARCHAR(64)"))
    val read = spark.read.jdbc(url, t, new java.util.Properties())
      .filter($"fileName" > "a.csv")
    val plan = read.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters:") && plan.contains("GreaterThan(fileName,a.csv)"),
      s"filter must reach the JDBC scan:\n$plan")
    assert(read.count() === 2)
  }

  test("watermark probe: absent table → None, else max(fileName)") {
    assume(!isClusterMaster,
      "embedded in-memory Derby is per-JVM: executor tasks would see an " +
      "empty instance; multi-JVM sink coverage lives in the PG15 fixture " +
      "specs (PostgresUpsertSpec / StreamingSpec cluster lane)")
    assert(JdbcUpsert.lastUploadedFile(spark, url, "nope_missing") === None)
    val t = "wm_test"
    val df = Seq(("k1", "f1.csv"), ("k2", "f2.csv")).toDF("oid__id", "fileName")
    JdbcUpsert.upsert(df, url, t, "oid__id",
      createTableColumnTypes = Some("oid__id VARCHAR(64), fileName VARCHAR(64)"))
    assert(JdbcUpsert.lastUploadedFile(spark, url, t) === Some("f2.csv"))
  }
}
