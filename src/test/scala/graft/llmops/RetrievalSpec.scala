package graft.llmops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Hybrid RRF retrieval (q107): an independent driver-side replication
  * of both channels and the fusion, plus the determinism and plan
  * contracts that make the operator gateable and scalable.
  */
class RetrievalSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def tokensOf(text: String): Set[String] =
    text.toLowerCase.replaceAll("\\s+", " ").split(" ").toSet

  test("q107 == driver brute-force replication (channels + fusion)") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val qids = docs.keys.filter(_ % 100 == 0).toSeq.sorted
    val dids = docs.keys.filter(_ % 100 != 0).toSeq.sorted

    def cos6(a: Array[Float], b: Array[Float]): Double = {
      // same fold order as the DotProduct kernel: sequential ascending
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      val den = math.sqrt(na) * math.sqrt(nb)
      val c = if (den > 0) dot / den else 0.0
      BigDecimal(c).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }

    val expected = qids.flatMap { qid =>
      val qTok = tokensOf(docs(qid))
      val term = dids.map(d => d -> (qTok & tokensOf(docs(d))).size)
        .filter(_._2 > 0)
        .sortBy { case (d, o) => (-o, d) }.take(20)
        .zipWithIndex.map { case ((d, _), i) => d -> (i + 1) }.toMap
      val vec = if (!vecs.contains(qid)) Map.empty[Long, Int] else
        dids.filter(vecs.contains)
          .map(d => d -> cos6(vecs(d), vecs(qid)))
          .sortBy { case (d, c) => (-c, d) }.take(20)
          .zipWithIndex.map { case ((d, _), i) => d -> (i + 1) }.toMap
      val pts = (term.keySet ++ vec.keySet).toSeq.map { d =>
        val p = term.get(d).map(r => 1000000000L / (60 + r)).getOrElse(0L) +
          vec.get(d).map(r => 1000000000L / (60 + r)).getOrElse(0L)
        (d, p, term.contains(d), vec.contains(d))
      }
      pts.sortBy { case (d, p, _, _) => (-p, d) }.take(10)
        .zipWithIndex.map { case ((d, p, t, v), i) =>
          (qid, d, p, if (t) 1 else 0, if (v) 1 else 0, i + 1)
        }
    }

    val got = Retrieval.qHybridRrf(spark, dir).collect().map { r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3),
        r.getInt(4), r.getInt(5))
    }.toSeq
    assert(got === expected)
  }

  test("rrfPoints is the exact integer floor division") {
    val df = spark.range(1, 41).select(
      Retrieval.rrfPoints(col("id"), 60).as("pts"), col("id"))
    val rows = df.collect().map(r => r.getLong(1) -> r.getLong(0)).toMap
    (1L to 40L).foreach { r =>
      assert(rows(r) === 1000000000L / (60L + r))
    }
  }

  test("term channel maxDf prunes stopword-grade tokens from the join") {
    val d = spark.read.parquet(s"$dir/documents.parquet")
    val queries = d.filter(pmod(col("doc_id"), lit(100L)) === 0L)
      .select(col("doc_id").as("qid"), col("text"))
    val corpus = d.filter(pmod(col("doc_id"), lit(100L)) =!= 0L)
      .select(col("doc_id").as("did"), col("text"))
    val full = Retrieval.termChannel(queries, corpus, topN = 20)
    // this corpus draws from a tiny vocabulary: every token is a heavy
    // hitter, so a df floor of 1 empties the channel — the assertion is
    // that pruning reaches the join, not that recall survives here
    val pruned = Retrieval.termChannel(queries, corpus, topN = 20,
      maxDf = 1L)
    assert(full.count() > 0L)
    assert(pruned.count() === 0L)
  }

  test("q107 plan: no cartesian term stage, rank pushdown in windows") {
    val df = Retrieval.qHybridRrf(spark, dir)
    df.collect()
    // final adaptive plan only (toString appends "== Initial Plan ==",
    // which would double-count every node)
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    // the vector channel's broadcast of the QUERY side is the ONE
    // intended nested-loop stage; the term channel must stay an
    // equi-join, and the rank filters must specialize the window sorts
    assert(!p.contains("CartesianProduct"), p)
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size <= 1, p)
    assert(p.contains("WindowGroupLimit"), p)
  }
}
