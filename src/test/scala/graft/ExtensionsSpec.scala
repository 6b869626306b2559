package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.functions._

import graft.expressions.{SimHash64, WordShingles}
import graft.llmops.Similarity

/** The SQL function surface must evaluate through the same kernels as
  * the Column API — each function is checked SQL-vs-Column on real
  * fixture data.
  */
class ExtensionsSpec extends SparkSpec {

  GraftExtensions.register(spark)

  private lazy val docs = {
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .createOrReplaceTempView("ext_docs")
    spark.table("ext_docs")
  }
  private lazy val emb = {
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .createOrReplaceTempView("ext_emb")
    spark.table("ext_emb")
  }

  test("word_shingles SQL == Column kernel (default and n=1)") {
    docs // force view
    val cmp = spark.sql(
      """SELECT word_shingles(text) AS s3, word_shingles(text, 1) AS s1,
        |  text FROM ext_docs""".stripMargin)
      .withColumn("c3", WordShingles.shingles(col("text")))
      .withColumn("c1", WordShingles.shingles(col("text"), 1))
    assert(cmp.count() > 0)
    assert(cmp.filter(col("s3") =!= col("c3") ||
      col("s1") =!= col("c1")).count() === 0L)
  }

  test("simhash64 and minhash_signature SQL == Column kernels") {
    docs
    val cmp = spark.sql(
      """SELECT text,
        |  simhash64(word_shingles(text, 1)) AS sh,
        |  minhash_signature(array_distinct(word_shingles(text))) AS mh
        |FROM ext_docs""".stripMargin)
      .withColumn("csh", SimHash64.simhash(WordShingles.shingles(col("text"), 1)))
      .withColumn("cmh", graft.expressions.MinHashSignature.signature(
        array_distinct(WordShingles.shingles(col("text"))), 16))
    assert(cmp.filter(col("sh") =!= col("csh") ||
      col("mh") =!= col("cmh")).count() === 0L)
  }

  test("dot_product and winnow_fingerprints SQL == Column kernels") {
    emb
    val d = spark.sql(
      "SELECT dot_product(embedding, embedding) AS dd, embedding FROM ext_emb")
      .withColumn("cd", Similarity.dot(col("embedding"), col("embedding")))
    assert(d.filter(col("dd") =!= col("cd")).count() === 0L)
    docs
    val w = spark.sql(
      "SELECT winnow_fingerprints(word_shingles(text)) AS fp, text FROM ext_docs")
      .withColumn("cfp", graft.expressions.WinnowFingerprints.winnow(
        WordShingles.shingles(col("text")), 4))
    assert(w.filter(col("fp") =!= col("cfp")).count() === 0L)
  }

  test("intersect_count SQL == Column kernel == builtin on shingle sets") {
    docs
    val cmp = spark.sql(
      """SELECT doc_id,
        |  transform(array_distinct(word_shingles(text)), s -> xxhash64(s))
        |    AS sh
        |FROM ext_docs""".stripMargin)
      .select(col("doc_id"), col("sh"),
        reverse(col("sh")).as("rsh"), slice(col("sh"), 1, 5).as("psh"))
    val checked = cmp.select(
      graft.expressions.IntersectCount.intersectCount(col("sh"), col("rsh"))
        .as("self"),
      size(col("sh")).cast("long").as("n"),
      graft.expressions.IntersectCount.intersectCount(col("sh"), col("psh"))
        .as("part"),
      size(array_intersect(col("sh"), col("psh"))).cast("long").as("bpart"))
    // order-insensitive full self-overlap + builtin equivalence
    assert(checked.filter(col("self") =!= col("n") ||
      col("part") =!= col("bpart")).count() === 0L)
    cmp.createOrReplaceTempView("ext_ic")
    val viaSql = spark.sql(
      "SELECT intersect_count(sh, psh) AS s FROM ext_ic")
      .collect().map(_.getLong(0))
    val viaCol = checked.select("part").collect().map(_.getLong(0))
    assert(viaSql.toSeq === viaCol.toSeq)
  }

  test("mode_count SQL == Column kernel == grouped counts") {
    docs
    val cmp = spark.sql(
      """SELECT doc_id, mode_count(word_shingles(text, 2)) AS m, text
        |FROM ext_docs""".stripMargin)
      .withColumn("c", graft.expressions.ModeCount.modeCount(
        graft.expressions.WordShingles.shingles(col("text"), 2)))
    assert(cmp.count() > 0)
    assert(cmp.filter(col("m") =!= col("c")).count() === 0L)
    // mode_count rejects non-string arrays at analysis time
    val e = intercept[Exception] {
      spark.sql("SELECT mode_count(array(1L, 2L)) FROM ext_docs").collect()
    }
    assert(e.getMessage.contains("array<string>"), e.getMessage)
  }

  test("sparse_dot_micros SQL == Column kernel on constructed vectors") {
    import spark.implicits._
    val df = Seq(
      (Seq(1L, 5L, 9L), Seq(1000000L, 2000000L, 500000L),
        Seq(1L, 9L), Seq(3000000L, 4000000L)),
      (Seq(2L), Seq(7L), Seq(3L), Seq(11L))) // disjoint
      .toDF("ak", "av", "bk", "bv")
    df.createOrReplaceTempView("ext_sparse")
    val cmp = spark.sql(
      "SELECT sparse_dot_micros(ak, av, bk, bv) AS s FROM ext_sparse")
      .collect().map(_.getDouble(0))
    val col0 = df.select(graft.expressions.SparseDotMicros
        .sparseDotMicros(col("ak"), col("av"), col("bk"), col("bv")))
      .collect().map(_.getDouble(0))
    assert(cmp.toSeq === col0.toSeq)
    assert(cmp(0) === 5.0) // (1e6·3e6 + 5e5·4e6)·1e-12 = (3e12+2e12)·1e-12
    assert(cmp(1) === 0.0)
  }

  test("intersect_count rejects non-bigint arrays at analysis time") {
    docs
    val e = intercept[Exception] {
      spark.sql("SELECT intersect_count(array(1, 2), array(2, 3)) FROM ext_docs")
        .collect()
    }
    assert(e.getMessage.contains("array<bigint>"), e.getMessage)
  }

  test("non-literal size argument fails loudly") {
    docs
    val e = intercept[Exception] {
      spark.sql("SELECT word_shingles(text, length(text)) FROM ext_docs")
        .collect()
    }
    assert(e.getMessage.toLowerCase.contains("literal"))
  }

  test("the extensions class applies cleanly to a fresh injection point") {
    new GraftExtensions()(new SparkSessionExtensions)
  }
}
