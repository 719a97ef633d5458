package graft.functions

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.SearchSortedDouble.search_sorted
import graft.functions.TopKPairs.top_k_pairs

class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("top_k_pairs ≡ row_number window (score desc, id asc), any partitioning") {
    // deterministic data with score ties across ids and null scores
    val rows = (0 until 2000).map { i =>
      val g = i % 7
      val score = if (i % 31 == 0) null else java.lang.Double.valueOf((i * 37 % 101) / 10.0)
      (g, score, i.toLong)
    }
    val df = rows.toDF("g", "score", "id")
    val w = Window.partitionBy($"g").orderBy($"score".desc, $"id".asc)
    val expected = df.filter($"score".isNotNull)
      .withColumn("rnk", row_number().over(w))
      .filter($"rnk" <= 5)
      .select($"g", $"score", $"id", $"rnk")
      .collect().map(r => (r.getInt(0), r.getDouble(1), r.getLong(2), r.getInt(3))).toSet
    for (parts <- Seq(1, 3, 8)) {
      val got = df.repartition(parts)
        .groupBy($"g").agg(top_k_pairs($"score", $"id", 5).as("top"))
        .select($"g", posexplode($"top").as(Seq("pos", "e")))
        .select($"g", $"e.score", $"e.id", ($"pos" + 1).as("rnk"))
        .collect().map(r => (r.getInt(0), r.getDouble(1), r.getLong(2), r.getInt(3))).toSet
      assert(got === expected, s"mismatch at numPartitions=$parts")
    }
  }

  test("top_k_pairs with k larger than the group returns the whole group sorted") {
    val df = Seq((1, 3.0, 10L), (1, 1.0, 11L), (1, 3.0, 9L)).toDF("g", "s", "id")
    val got = df.groupBy($"g").agg(top_k_pairs($"s", $"id", 100).as("top"))
      .select(explode($"top").as("e")).select($"e.score", $"e.id")
      .collect().map(r => (r.getDouble(0), r.getLong(1))).toSeq
    assert(got === Seq((3.0, 9L), (3.0, 10L), (1.0, 11L)))
  }

  test("search_sorted = count of splits strictly below, codegen and boundaries") {
    val splits = Array(1.0, 2.0, 2.0, 5.0, 9.5)
    val df = Seq(0.5, 1.0, 1.5, 2.0, 2.5, 5.0, 9.5, 100.0).toDF("v")
      .withColumn("b", search_sorted(typedLit(splits), $"v"))
    val got = df.collect().map(r => (r.getDouble(0), r.getInt(1))).toMap
    val expected = Map(0.5 -> 0, 1.0 -> 0, 1.5 -> 1, 2.0 -> 1, 2.5 -> 3,
      5.0 -> 3, 9.5 -> 4, 100.0 -> 5)
    assert(got === expected)
    // matches the interpreted higher-order-function formulation on a sweep
    val sweep = (0 until 500).map(i => i / 23.7).toDF("v")
      .withColumn("hof", size(filter(typedLit(splits), x => x < $"v")))
      .withColumn("bin", search_sorted(typedLit(splits), $"v"))
    assert(sweep.filter($"hof" =!= $"bin").isEmpty)
  }

  test("dot_double / sq_dist_double are bit-identical to the HOF fold") {
    // the determinism contract: same left-to-right doubles as
    // aggregate(zip_with(...)) — oracles depend on this bit-for-bit
    val vecs = (0 until 200).map { i =>
      (i.toLong, Array.tabulate(64)(j => math.sin(i * 131 + j * 17) * 3.7))
    }
    val df = vecs.toDF("id", "v")
    val pairs = df.as("a").join(df.as("b"),
      col("a.id") < col("b.id") && col("b.id") - col("a.id") <= 3)
    val hofDot = aggregate(zip_with(col("a.v"), col("b.v"), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)
    val hofSq = aggregate(zip_with(col("a.v"), col("b.v"),
      (x, y) => (x - y) * (x - y)), lit(0.0), (acc, x) => acc + x)
    val cmp = pairs.select(
      VectorExprs.dot_double(col("a.v"), col("b.v")).as("nd"),
      hofDot.as("hd"),
      VectorExprs.sq_dist_double(col("a.v"), col("b.v")).as("ns"),
      hofSq.as("hs"))
    // exact equality, not approximate: same summation order, same bits
    assert(cmp.filter(col("nd") =!= col("hd") || col("ns") =!= col("hs")).isEmpty)
    assert(cmp.count() > 0)
  }

  test("array_pairs emits every i<j combination in order; degenerate inputs empty") {
    val df = Seq(
      (1L, Seq(10L, 20L, 30L, 40L)),
      (2L, Seq(5L, 6L)),
      (3L, Seq(7L)),
      (4L, Seq.empty[Long])).toDF("id", "docs")
    val got = df.select($"id",
        ArrayPairs.array_pairs($"docs").as(Seq("a", "b")))
      .as[(Long, Long, Long)].collect().toSet
    val expected = Set(
      (1L, 10L, 20L), (1L, 10L, 30L), (1L, 10L, 40L),
      (1L, 20L, 30L), (1L, 20L, 40L), (1L, 30L, 40L),
      (2L, 5L, 6L))
    assert(got === expected, "ids 3 and 4 must generate nothing")
    // null array behaves like explode of null: no rows
    val withNull = Seq((1L, null: Seq[Long])).toDF("id", "docs")
      .select(ArrayPairs.array_pairs($"docs").as(Seq("a", "b")))
    assert(withNull.isEmpty)
  }

  test("rolling_hash ≡ the HOF ascii-fold, including unicode and empty") {
    val docs = Seq("", "a", "hello world", "ASCII 123 !@#",
      "héllo wörld ünïcode", "日本語テキスト", "a" * 5000)
    val df = docs.toDF("t").select(
      RollingHashLong.rolling_hash($"t").as("native"),
      when(length($"t") === 0, 0L).otherwise(
        aggregate(transform(sequence(lit(1), length($"t")),
            i => ascii($"t".substr(i, lit(1))).cast("long")),
          lit(0L), (acc, x) => (acc * 31 + x) % 1000000007L)).as("hof"))
    assert(df.filter($"native" =!= $"hof").isEmpty)
    assert(df.filter($"native" === $"hof").count() === docs.length)
  }

  test("token_shingles ≡ the HOF transform/slice/distinct form, edge cases included") {
    // edge inventory: empty string (one empty token), single token, exact-n,
    // doubled/leading/trailing spaces (EMPTY tokens are real tokens),
    // repeats (distinct order = first occurrence), unicode
    val docs = Seq("", "one", "a b", "a b c d e", "a  b", " a b ",
      "x y x y x y", "héllo wörld tokens ünïcode", ("tok " * 500).trim)
    for (n <- Seq(1, 2, 3)) {
      val df = docs.toDF("t").select(
        TokenShingles.token_shingles($"t", n).as("native"),
        TokenShingles.token_ngrams($"t", n).as("native_all"),
        {
          val toks = split($"t", " ")
          val grams = transform(sequence(lit(1), size(toks) - (n - 1)),
            i => concat_ws(" ", slice(toks, i, lit(n))))
          array_distinct(when(size(toks) >= n, grams)
            .otherwise(array().cast("array<string>")))
        }.as("hof"),
        {
          val toks = split($"t", " ")
          when(size(toks) >= n, transform(sequence(lit(1), size(toks) - (n - 1)),
            i => concat_ws(" ", slice(toks, i, lit(n)))))
            .otherwise(array().cast("array<string>"))
        }.as("hof_all"))
      assert(df.filter($"native" =!= $"hof" || $"native_all" =!= $"hof_all")
        .isEmpty, s"n=$n mismatch vs HOF form")
      assert(df.count() === docs.length)
    }
    // null text: expression yields null; Text.shingles coalesces to empty
    val nullDf = Seq((1L, null: String)).toDF("id", "t")
    assert(nullDf.select(TokenShingles.token_shingles($"t", 2).as("s"))
      .filter($"s".isNull).count() === 1)
    assert(nullDf.select(Text.shingles($"t", 2).as("s"))
      .filter(size($"s") === 0).count() === 1)
  }

  test("token_shingles on the real corpus matches the HOF shingle set") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val cmp = docs.select(
      TokenShingles.token_shingles($"text", 3).as("native"),
      {
        val toks = split($"text", " ")
        val grams = transform(sequence(lit(1), size(toks) - 2),
          i => concat_ws(" ", slice(toks, i, lit(3))))
        array_distinct(when(size(toks) >= 3, grams)
          .otherwise(array().cast("array<string>")))
      }.as("hof"))
    assert(cmp.filter($"native" =!= $"hof").isEmpty)
    assert(cmp.count() === 500)
  }

  test("token_shingles property: matches the sliding-window reference on random text") {
    import org.apache.spark.unsafe.types.UTF8String
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    // alphabet stresses the split semantics: doubled/leading/trailing
    // spaces (empty tokens), unicode, repeats that exercise distinct
    val textGen = Gen.listOf(Gen.oneOf("a", "bb", "é", "日本", "", " "))
      .map(_.mkString(" "))
    val nGen = Gen.choose(1, 4)
    val prop = Prop.forAll(textGen, nGen) { (t: String, n: Int) =>
      def ref(distinct: Boolean): Seq[String] = {
        val toks = t.split(" ", -1).toSeq
        val grams =
          if (toks.length < n) Seq.empty
          else toks.sliding(n).map(_.mkString(" ")).toSeq
        if (distinct) grams.distinct else grams
      }
      def native(distinct: Boolean): Seq[String] =
        TokenShingles.compute(UTF8String.fromString(t), n, distinct)
          .array.map(_.toString).toSeq
      native(distinct = true) == ref(distinct = true) &&
        native(distinct = false) == ref(distinct = false)
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(500), prop)
    assert(res.passed, res.status.toString)
  }

  test("window_hashes property: rolling ≡ naive per-window fold on random text") {
    import org.apache.spark.unsafe.types.UTF8String
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import graft.functions.{RollingHashLong, RollingWindowHashes}
    // the rolling subtract-multiply-add must equal the direct fold for
    // every window — including unicode (code points, not chars) and
    // strides that skip positions
    val textGen = Gen.listOf(Gen.oneOf(
      Gen.alphaNumChar.map(_.toString), Gen.const("é"), Gen.const("日")))
      .map(_.mkString)
    val prop = Prop.forAll(textGen, Gen.choose(1, 6), Gen.choose(1, 3)) {
      (t: String, w: Int, stride: Int) =>
        val cps = t.codePoints().toArray
        def naive(start: Int): Long = {
          var h = 0L
          var i = start
          while (i < start + w) {
            h = (h * 31 + cps(i)) % RollingHashLong.Mod; i += 1
          }
          h
        }
        val expected = (0 to cps.length - w by stride)
          .map(p => (p, naive(p)))
        val got = RollingWindowHashes(
            org.apache.spark.sql.catalyst.expressions.Literal(
              UTF8String.fromString(t),
              org.apache.spark.sql.types.StringType), w, stride)
          .eval(null).iterator.map(r => (r.getInt(0), r.getLong(1))).toSeq
        got == expected
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(500), prop)
    assert(res.passed, res.status.toString)
  }

  test("window_hashes dual property: h2 rolling ≡ naive fold mod Mod2, h unchanged") {
    import org.apache.spark.unsafe.types.UTF8String
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import graft.functions.{RollingHashLong, RollingWindowHashes}
    // the dual form must (a) leave (pos, h) exactly what the 2-column
    // form emits and (b) roll h2 to the same value as the direct fold
    // mod Mod2 — the d12 pre-verify filter is only sound if both hold
    val textGen = Gen.listOf(Gen.oneOf(
      Gen.alphaNumChar.map(_.toString), Gen.const("é"), Gen.const("日")))
      .map(_.mkString)
    val prop = Prop.forAll(textGen, Gen.choose(1, 6), Gen.choose(1, 3)) {
      (t: String, w: Int, stride: Int) =>
        val cps = t.codePoints().toArray
        def naive(start: Int, m: Long): Long = {
          var h = 0L
          var i = start
          while (i < start + w) { h = (h * 31 + cps(i)) % m; i += 1 }
          h
        }
        val expected = (0 to cps.length - w by stride)
          .map(p => (p, naive(p, RollingHashLong.Mod),
            naive(p, RollingWindowHashes.Mod2)))
        val got = RollingWindowHashes(
            org.apache.spark.sql.catalyst.expressions.Literal(
              UTF8String.fromString(t),
              org.apache.spark.sql.types.StringType), w, stride, dual = true)
          .eval(null).iterator
          .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
        got == expected
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(500), prop)
    assert(res.passed, res.status.toString)
  }

  test("window_hashes dedupPerDoc property: ≡ groupBy(h).min(pos) over the dual stream") {
    import org.apache.spark.unsafe.types.UTF8String
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import graft.functions.RollingWindowHashes
    // the d12 index contract: the dedup form must emit exactly the
    // first-occurrence (≡ min pos — left-to-right scan) row per
    // distinct h, in stream order, with THAT row's h2. Texts are drawn
    // from a 2-letter alphabet so small windows collide constantly and
    // the dedup path is actually exercised.
    val textGen = Gen.listOf(Gen.oneOf("a", "b")).map(_.mkString)
    val prop = Prop.forAll(textGen, Gen.choose(1, 4), Gen.choose(1, 3)) {
      (t: String, w: Int, stride: Int) =>
        def rows(dedup: Boolean): Seq[(Int, Long, Long)] =
          RollingWindowHashes(
              org.apache.spark.sql.catalyst.expressions.Literal(
                UTF8String.fromString(t),
                org.apache.spark.sql.types.StringType),
              w, stride, dual = true, dedupPerDoc = dedup)
            .eval(null).iterator
            .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
        val all = rows(dedup = false)
        val expected = all.foldLeft(
            (Set.empty[Long], Vector.empty[(Int, Long, Long)])) {
          case ((seen, acc), r) =>
            if (seen(r._2)) (seen, acc) else (seen + r._2, acc :+ r)
        }._2
        rows(dedup = true) == expected
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(500), prop)
    assert(res.passed, res.status.toString)
  }

  test("vector_mean ≡ posexplode decimal mean, invariant under repartitioning") {
    import graft.functions.VectorMean.vector_mean
    val vecs = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(($"vec_id" % 7).as("g"),
        graft.operators.Similarity.toDouble($"embedding").as("v"))
    def collectMeans(df: org.apache.spark.sql.DataFrame): Map[Long, Seq[Double]] =
      df.collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val native = collectMeans(
      vecs.groupBy($"g").agg(vector_mean($"v").as("m")))
    // reference: the posexplode + decimal-sum formulation it replaces
    val ref = collectMeans(vecs
      .select($"g", posexplode($"v").as(Seq("dim", "x")))
      .groupBy($"g", $"dim")
      .agg((sum($"x".cast("decimal(38,20)")) / count(lit(1)))
        .cast("double").as("m"))
      .groupBy($"g")
      .agg(transform(array_sort(collect_list(struct($"dim", $"m"))),
        s => s.getField("m")).as("m")))
    assert(native.keySet === ref.keySet)
    native.foreach { case (g, m) =>
      m.zip(ref(g)).zipWithIndex.foreach { case ((a, b), i) =>
        assert(math.abs(a - b) < 1e-12, s"group $g dim $i: $a vs $b")
      }
    }
    // partitioning invariance (the property a double mean does NOT have)
    val repart = collectMeans(vecs.repartition(13)
      .groupBy($"g").agg(vector_mean($"v").as("m")))
    assert(repart === native, "means must be bit-identical under repartitioning")
    // null vectors skipped; all-null group is null; mixed dims throw
    val withNull = Seq((1L, Seq(1.0, 3.0)), (1L, null: Seq[Double]),
      (2L, null: Seq[Double])).toDF("g", "v")
    val rows = withNull.groupBy($"g").agg(vector_mean($"v").as("m"))
      .collect().map(r => r.getLong(0) -> Option(r.getSeq[Double](1))).toMap
    assert(rows(1L).get === Seq(1.0, 3.0))
    assert(rows(2L).isEmpty)
    val mixed = Seq((1L, Seq(1.0)), (1L, Seq(1.0, 2.0))).toDF("g", "v")
    intercept[org.apache.spark.SparkException] {
      mixed.groupBy($"g").agg(vector_mean($"v").as("m")).collect()
    }
  }

  test("vector_mean_rounded ≡ vector_mean(transform(v, e => round(e*d, s))), " +
    "bit-for-bit, invariant under repartitioning") {
    import graft.functions.VectorMean.vector_mean
    import graft.functions.VectorMeanRounded.vector_mean_rounded
    // real embeddings with a per-row multiplier that exercises negative,
    // sub-1, and >1 magnitudes (the PCA projection shape)
    val vecs = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(($"vec_id" % 7).as("g"),
        graft.operators.Similarity.toDouble($"embedding").as("v"),
        (($"vec_id" % 13).cast("double") / 3.0 - 2.0).as("d"))
    def collectMeans(df: org.apache.spark.sql.DataFrame): Map[Long, Seq[Double]] =
      df.collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    for (scale <- Seq(6, 9)) {
      val fused = collectMeans(vecs.groupBy($"g")
        .agg(vector_mean_rounded($"v", $"d", scale).as("m")))
      val composed = collectMeans(vecs.groupBy($"g")
        .agg(vector_mean(
          transform($"v", e => round(e * $"d", scale))).as("m")))
      assert(fused === composed,
        s"scale $scale: fused aggregate must be value-identical")
    }
    // lit(1.0) multiplier ≡ the plain elementwise round (the kmeans form)
    val one = collectMeans(vecs.groupBy($"g")
      .agg(vector_mean_rounded($"v", lit(1.0), 6).as("m")))
    val plain = collectMeans(vecs.groupBy($"g")
      .agg(vector_mean(transform($"v", e => round(e, 6))).as("m")))
    assert(one === plain)
    // partitioning invariance (exact integer lanes, any merge order)
    val repart = collectMeans(vecs.repartition(13).groupBy($"g")
      .agg(vector_mean_rounded($"v", $"d", 9).as("m")))
    val base = collectMeans(vecs.groupBy($"g")
      .agg(vector_mean_rounded($"v", $"d", 9).as("m")))
    assert(repart === base)
    // null vectors skip, null multiplier skips the row, all-null → null
    val withNull = Seq((1L, Seq(1.0, 3.0), Some(1.0)),
      (1L, null: Seq[Double], Some(1.0)), (1L, Seq(9.0, 9.0), None),
      (2L, null: Seq[Double], Some(1.0))).toDF("g", "v", "d")
    val rows = withNull.groupBy($"g")
      .agg(vector_mean_rounded($"v", $"d", 6).as("m"))
      .collect().map(r => r.getLong(0) -> Option(r.getSeq[Double](1))).toMap
    assert(rows(1L).get === Seq(1.0, 3.0))
    assert(rows(2L).isEmpty)
    // mixed dimensionalities fail loudly (the VectorMeanDecimal contract)
    val mixed = Seq((1L, Seq(1.0), 1.0), (1L, Seq(1.0, 2.0), 1.0))
      .toDF("g", "v", "d")
    intercept[org.apache.spark.SparkException] {
      mixed.groupBy($"g")
        .agg(vector_mean_rounded($"v", $"d", 6).as("m")).collect()
    }
    // Long-lane spill: per-term 1e18 unscaled (fits the fast path), 8
    // terms cross 2^62 — the BigInteger lane takes over, value exact
    val big = Seq.fill(8)((1L, Seq(1.0e12, -1.0e12), 1.0))
      .toDF("g", "v", "d")
    val bm = big.groupBy($"g")
      .agg(vector_mean_rounded($"v", $"d", 6).as("m"))
      .collect().head.getSeq[Double](1)
    assert(bm === Seq(1.0e12, -1.0e12))
    // and a single term past the Long contract fails loudly
    val huge = Seq((1L, Seq(9.0e18), 1.0)).toDF("g", "v", "d")
    intercept[org.apache.spark.SparkException] {
      huge.groupBy($"g")
        .agg(vector_mean_rounded($"v", $"d", 0).as("m")).collect()
    }
  }

  test("vector folds null out length-mismatched (corrupt) vectors") {
    val df = Seq((Array(1.0, 2.0), Array(1.0, 2.0, 3.0)))
      .toDF("a", "b")
      .select(VectorExprs.dot_double(col("a"), col("b")).as("d"),
        VectorExprs.sq_dist_double(col("a"), col("b")).as("s"))
    val r = df.collect().head
    assert(r.isNullAt(0) && r.isNullAt(1),
      "a truncated vector must surface as null, never a partial result")
  }

  test("search_sorted is null on null input and monotone in v") {
    val df = Seq(Some(3.0), None).toDF("v")
      .withColumn("b", search_sorted(typedLit(Array(1.0, 4.0)), $"v"))
    val rows = df.collect()
    assert(rows.find(!_.isNullAt(0)).get.getInt(1) === 1)
    assert(rows.find(_.isNullAt(0)).get.isNullAt(1))
  }
}
