package graft.llmops

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.expressions.MinHashSignature

/** The native MinHashSignature kernel must be bit-identical to the
  * HOF/md5 formulation (which the DuckDB oracle mirrors).
  */
class DedupSpec extends SparkSpec {

  test("native MinHash kernel == HOF md5 formulation on real docs") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .withColumn("toks", Dedup.tokens(col("text")))
      .withColumn("sh",
        array_distinct(Dedup.shinglesFromTokens(col("toks"))))
    val cmp = docs.select(
      Dedup.minhash(col("sh"), 16).as("hof"),
      MinHashSignature.signature(col("sh"), 16).as("native"))
    assert(cmp.count() > 0)
    assert(cmp.filter(col("hof") =!= col("native")).count() === 0L)
  }

  test("native kernel handles edge shapes") {
    import spark.implicits._
    val df = Seq(
      Seq("one shingle only"),
      Seq("a b c", "b c d", "a b c") // duplicates do not affect the min
    ).toDF("sh")
    val r = df.select(
      Dedup.minhash(col("sh"), 4).as("hof"),
      MinHashSignature.signature(col("sh"), 4).as("native")).collect()
    r.foreach { row =>
      assert(row.getSeq[String](0) === row.getSeq[String](1))
    }
  }
}
