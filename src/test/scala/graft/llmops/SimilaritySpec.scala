package graft.llmops

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.expressions.DotProduct

/** The native DotProduct kernel must be bit-identical to the HOF
  * zip_with/aggregate formulation (which the DuckDB oracles unroll).
  */
class SimilaritySpec extends SparkSpec {

  test("native dot kernel == HOF fold on real embeddings (float x float)") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = e.filter(col("vec_id") === 0)
      .select(col("embedding").as("qe"))
    val cmp = e.crossJoin(broadcast(q)).select(
      DotProduct.dot(col("embedding"), col("qe")).as("native"),
      Similarity.dotHof(col("embedding"), col("qe")).as("hof"))
    assert(cmp.count() > 0)
    // bit-exact, not approx: same widening, same fold order
    assert(cmp.filter(col("native") =!= col("hof")).count() === 0L)
  }

  test("native dot kernel == HOF fold against a double-array literal") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val plane = typedLit(Similarity.hyperplane(3, 64))
    val cmp = e.select(
      DotProduct.dot(col("embedding"), plane).as("native"),
      Similarity.dotHof(col("embedding"), plane).as("hof"))
    assert(cmp.filter(col("native") =!= col("hof")).count() === 0L)
  }

  test("length mismatch fails loudly") {
    import spark.implicits._
    val df = Seq((Seq(1.0f, 2.0f), Seq(1.0f))).toDF("a", "b")
    val ex = intercept[Exception] {
      df.select(DotProduct.dot(col("a"), col("b"))).collect()
    }
    assert(ex.getMessage != null)
  }
}
