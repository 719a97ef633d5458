package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EntityMatchSpec extends SparkSpec {

  private def naive(df: org.apache.spark.sql.DataFrame, k: Int) = {
    val names = df.filter(col("name").isNotNull)
      .groupBy(col("name")).agg(count(lit(1)).as("n"))
    names.as("a").join(names.as("b"), col("a.name") < col("b.name"))
      .withColumn("dist", levenshtein(col("a.name"), col("b.name")))
      .filter(col("dist") <= k)
      .select(col("a.name").as("name_a"), col("b.name").as("name_b"),
        col("dist"), col("a.n").as("n_a"), col("b.n").as("n_b"))
  }

  test("fuzzyNamePairs equals the naive quadratic join on a corpus " +
    "with short names, repeats and nulls") {
    import spark.implicits._
    // short pool (<=5 chars), cross short/long near-misses, repeats
    // (support counts), a zero-gram 1-char name, and nulls
    val rows = Seq("small ring", "small king", "smol ring", "small rings",
      "ring", "king", "kin", "x", "ab", "ba", "abcd", "abce",
      "small", "smalls", "small ring", "king",
      "totally different name") ++ Seq.fill(3)("abcd")
    val df = rows.toDF("name")
      .union(Seq.empty[String].toDF("name"))
      .union(spark.sql("SELECT CAST(NULL AS STRING) AS name"))
    val got = EntityMatch.fuzzyNamePairs(df, "name", maxDist = 2)
      .orderBy("name_a", "name_b").collect().toSeq
    val want = naive(df, 2).orderBy("name_a", "name_b").collect().toSeq
    assert(got == want)
    // the planted corpus must actually exercise both paths
    assert(want.exists(r => r.getString(0).length <= 5 &&
      r.getString(1).length <= 5), "no short-pool pair planted")
    assert(want.exists(r => r.getString(0).length > 5), "no long pair")
    // cross pair (one side short, one long): must flow through the gram
    // join, whose soundness bound only needs max(len) >= 6
    assert(want.exists(r =>
      math.min(r.getString(0).length, r.getString(1).length) <= 5 &&
        math.max(r.getString(0).length, r.getString(1).length) >= 6),
      "no cross short/long pair planted")
  }

  test("er01 candidate generation is an equi-join on gram — no " +
    "quadratic path over long names") {
    val df = Tables_part
    val plan = EntityMatch.fuzzyNamePairs(df, "p_name", maxDist = 2)
      .queryExecution.executedPlan.toString
    // the long path must be a hash/sort-merge equi-join on the gram
    // columns; the only nested-loop join allowed is the bounded short
    // pool (empty here: every part name is >= 7 chars)
    assert(plan.contains("gram_a"), "gram join missing from plan")
    val nested = "BroadcastNestedLoopJoin".r.findAllIn(plan).size
    assert(nested <= 1, s"unexpected nested-loop joins:\n$plan")
  }

  private def Tables_part =
    graft.Tables.part(spark, sf("sf0.001"))

  test("resolveEntities closes transitively: a~b~c is ONE entity even " +
    "when ed(a,c) exceeds maxDist") {
    import spark.implicits._
    // chain: widget v1 ~ widget v2x ~ widget v2xyz (ed(v1, v2xyz) = 4 >
    // 2); plus an isolated name and repeated rows for support rollup
    val rows = Seq("widget v1", "widget v2x", "widget v2xyz",
      "widget v1", "unrelated thing")
    val got = EntityMatch.resolveEntities(rows.toDF("name"), "name",
      maxDist = 2).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(got === Set(
      ("widget v1", "widget v1", 2L, 3L, 4L),
      ("widget v2x", "widget v1", 1L, 3L, 4L),
      ("widget v2xyz", "widget v1", 1L, 3L, 4L),
      ("unrelated thing", "unrelated thing", 1L, 1L, 1L)), s"got $got")
    // non-vacuity: the chain endpoints really are beyond maxDist, and
    // each adjacent link really is within it
    val ed = (a: String, b: String) => spark.sql(
      s"SELECT levenshtein('$a', '$b')").head.getInt(0)
    assert(ed("widget v1", "widget v2xyz") > 2)
    assert(ed("widget v1", "widget v2x") <= 2)
    assert(ed("widget v2x", "widget v2xyz") <= 2)
  }

  test("short-pool cap fails loudly instead of going quadratic") {
    import spark.implicits._
    val many = (0 until 50).map(i => f"n$i%03d").toDF("name")
    val ex = intercept[IllegalArgumentException] {
      EntityMatch.fuzzyNamePairs(many, "name", maxDist = 2,
        maxShortPool = 10L)
    }
    assert(ex.getMessage.contains("short-pool cap"))
  }

  test("er03 entity brands: a cross-brand name cluster rolls up both " +
    "brands sorted, singletons keep one") {
    import spark.implicits._
    import org.apache.spark.sql.functions.lit
    // "turquoise widget" ~ "turquoise widgett" (ed 1, cross-brand);
    // "completely different" is its own entity
    val parts = Seq(
      (1L, "turquoise widget", "BrandB"),
      (2L, "turquoise widgett", "BrandA"),
      (3L, "turquoise widget", "BrandB"),
      (4L, "completely different", "BrandC"))
      .toDF("p_partkey", "p_name", "p_brand")
      .withColumn("p_mfgr", lit("m"))
    val dir = java.nio.file.Files.createTempDirectory("er03").toString
    parts.write.mode("overwrite").parquet(s"$dir/part.parquet")
    val got = graft.operators.Advanced.queries("er03_entity_brands")(
        spark, dir)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4)))).toMap
    assert(got === Map(
      "turquoise widget" -> ((2L, 2L, 3L, "BrandA,BrandB")),
      "completely different" -> ((1L, 1L, 1L, "BrandC"))))
  }
}
