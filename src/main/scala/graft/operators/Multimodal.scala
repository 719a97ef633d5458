package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads ride through the
  * engine as opaque `binary` columns with typed metadata, exactly like any
  * other column — parquet stores them page-compressed, Tungsten moves
  * pointers not copies, and operators that don't touch the bytes never
  * deserialize them (column pruning).
  *
  * The DECODE step (jpeg→pixels, wav→samples, mp4→frames) is a STUB in
  * this container — no codec libraries ship with it — implemented as a
  * deterministic fake keyed on the content hash, clearly marked below.
  * Everything around it is real and tested: the schema, the byte-range
  * frame sampler, the partition-wise batching, and the feature-vector
  * shape contract.
  *
  * Scale notes: per-blob work is embarrassingly parallel; the only rule at
  * 100 TB is "never shuffle the bytes" — derive features/fingerprints
  * first (map-side), shuffle the small derived columns, and join back only
  * if the bytes are needed again (they usually are not).
  */
object Multimodal {

  /** A decoded media batch row: fixed-size feature vector per blob. */
  final case class MediaFeatures(media_id: Long, media_type: String,
      n_bytes: Long, features: Array[Float])

  /** Demo source: lift any text table into the media schema
    * (id, media_type, content: binary, n_bytes). */
  def fromText(df: DataFrame, idCol: String, textCol: String,
      mediaType: String = "text/plain"): DataFrame =
    df.select(col(idCol).cast("long").as("media_id"),
      lit(mediaType).as("media_type"),
      encode(col(textCol), "UTF-8").as("content"))
      .withColumn("n_bytes", octet_length(col("content")))

  /** Content digest + size — the dedup/partition key for media corpora
    * (hash the bytes once, shuffle the 32-byte digest forever after). */
  def withDigest(df: DataFrame, blobCol: String = "content"): DataFrame =
    df.withColumn("sha256", sha2(col(blobCol), 256))

  /** Byte-range frame sampler: split a blob into fixed-size frames
    * (posexplode → one row per frame, offset carried). Pure column
    * arithmetic — the real codec would replace `substring` with a
    * keyframe index lookup, the plumbing stays identical. */
  def sampleFrames(df: DataFrame, frameBytes: Int,
      blobCol: String = "content"): DataFrame = {
    val nFrames = ceil(octet_length(col(blobCol)).cast("double") / frameBytes)
      .cast("int")
    df.withColumn("__n", greatest(nFrames, lit(1)))
      .select(col("*"),
        posexplode(transform(sequence(lit(0), col("__n") - 1),
          i => substring_index_bytes(col(blobCol), i, frameBytes)))
          .as(Seq("frame_no", "frame_bytes")))
      .drop("__n")
  }

  /** Byte-slice helper: frame i of width w (1-based substr on binary). */
  private def substring_index_bytes(blob: Column, i: Column, w: Int): Column =
    blob.substr(i * w + 1, lit(w))

  /** ======== STUB DECODE ========
    * Deterministic fake "decode + feature extract": `dim` floats derived
    * from xxhash64(content, lane). A real deployment swaps ONLY the body
    * of this function for a codec call (libjpeg/ffmpeg via JNI or a
    * vendored pure-JVM decoder); signature, schema and partition shape are
    * the production ones. Stays in codegen'd built-ins — no UDF. */
  def stubFeatures(df: DataFrame, dim: Int,
      blobCol: String = "content"): DataFrame =
    df.withColumn("features",
      transform(sequence(lit(0), lit(dim - 1)),
        i => (pmod(xxhash64(col(blobCol), i), lit(1000000)).cast("double")
          / 1000000.0).cast("float")))

  /** Partition-wise decode path for codecs that need native buffers:
    * mapPartitions gives one JVM-side batch per partition (amortizes codec
    * init), the fake body marks where the real decoder goes. */
  def decodePartitions(df: DataFrame, dim: Int): Dataset[MediaFeatures] = {
    val enc = Encoders.product[MediaFeatures]
    df.select(col("media_id"), col("media_type"), col("n_bytes"),
        col("content"))
      .mapPartitions { rows =>
        // >>> real impl: init codec ONCE here, decode each blob <<<
        rows.map { r =>
          val bytes = r.getAs[Array[Byte]]("content")
          val seed = java.util.Arrays.hashCode(bytes)
          val feats = Array.tabulate(dim)(i =>
            (((seed * 31 + i) & 0xffff).toFloat) / 65536.0f)
          MediaFeatures(r.getAs[Long]("media_id"),
            r.getAs[String]("media_type"), bytes.length.toLong, feats)
        }
      }(enc)
  }

  val queries: Map[String, (org.apache.spark.sql.SparkSession, String) => DataFrame] = Map(
    // Binary metadata path: encode → octet_length → sha256 (hex).
    "m01_media_meta" -> { (s, d) =>
      val media = fromText(graft.Tables.documents(s, d), "doc_id", "text")
      withDigest(media).select(col("media_id"), col("n_bytes"), col("sha256"))
    },
    // Frame sampling: frames-per-blob from pure byte arithmetic.
    "m02_frame_counts" -> { (s, d) =>
      val media = fromText(graft.Tables.documents(s, d), "doc_id", "text")
      sampleFrames(media, frameBytes = 64)
        .groupBy(col("media_id"))
        .agg(count(lit(1)).as("n_frames"),
          sum(octet_length(col("frame_bytes"))).as("total_bytes"))
    },
    // Stubbed decode features: deterministic, rows-only check (the fake
    // decode is hash-defined, not SQL-portable). The vector is surfaced as
    // a csv of integer-scaled lanes (à la q33's keys_csv) — raw
    // array<float> columns crash pandas-side row comparators.
    "m03_stub_features" -> { (s, d) =>
      val media = fromText(graft.Tables.documents(s, d), "doc_id", "text")
      stubFeatures(media, dim = 8)
        .select(col("media_id"),
          concat_ws(",", transform(col("features"),
            f => round(f.cast("double") * 1000000).cast("long")))
            .as("features_csv"))
    },
    // The mapPartitions decode path surfaced end-to-end: one typed batch
    // per partition (where a real codec would init once), deterministic
    // fake features, csv-surfaced lanes (m03 convention). Rows-only
    // check — the fake decode is JVM-hash-defined, not SQL-portable.
    "m04_batch_decode" -> { (s, d) =>
      val media = fromText(graft.Tables.documents(s, d), "doc_id", "text")
      decodePartitions(media, dim = 8).toDF()
        .select(col("media_id"), col("media_type"), col("n_bytes"),
          concat_ws(",", transform(col("features"),
            f => round(f.cast("double") * 65536).cast("long")))
            .as("features_csv"))
    }
  )

  val oracleSql: Map[String, String] = Map(
    "m01_media_meta" ->
      """SELECT doc_id AS media_id, octet_length(encode(text)) AS n_bytes,
        |  sha256(text) AS sha256
        |FROM documents""".stripMargin,

    "m02_frame_counts" ->
      """SELECT doc_id AS media_id,
        |  greatest(CAST(ceil(octet_length(encode(text)) / 64.0) AS BIGINT), 1)
        |    AS n_frames,
        |  octet_length(encode(text)) AS total_bytes
        |FROM documents""".stripMargin
  )
}
