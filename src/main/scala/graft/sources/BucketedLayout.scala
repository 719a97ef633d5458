package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Bucketed table layout — co-located joins without a shuffle.
  *
  * `bucketBy(n, key)` pre-shuffles data at WRITE time into n stable hash
  * buckets; two tables bucketed on the same key with the same count join
  * with ZERO exchange at read time (the planner proves co-partitioning
  * from the catalog metadata). At 100 TB this converts every recurring
  * fact⋈fact join on the bucket key from a full-table shuffle into a
  * bucket-local sort-merge — the single biggest recurring-cost lever in a
  * warehouse.
  *
  * Bucketed tables must go through the catalog (`saveAsTable`) — the
  * bucket spec lives in table metadata, not in the files.
  */
object BucketedLayout {

  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
      numBuckets: Int, sortCol: Option[String] = None): Unit = {
    val w = df.write.mode("overwrite")
      .format("parquet")
      .bucketBy(numBuckets, bucketCol)
    sortCol.fold(w)(sc => w.sortBy(sc)).saveAsTable(table)
  }

  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)

  /** True when the physical plan contains no shuffle exchange — the
    * observable proof that a bucketed join was planned co-located. */
  def isShuffleFree(df: DataFrame): Boolean =
    !df.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning")
}
