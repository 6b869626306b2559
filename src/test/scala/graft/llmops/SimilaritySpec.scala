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

  test("IVF index persisted bucketed-by-cell: a probe prunes to its cells") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .withColumn("nrm", Similarity.norm(col("embedding")))
    val seeds = Similarity.ivfSeeds(e)
    val assign = Similarity.ivfAssign(e, seeds)
    val nCells = seeds.count()
    assert(assign.count() === e.count()) // every vector lands in a cell
    // autoBucketedScan only keeps the bucketed layout when it sees a
    // join/agg on the key; a probe is a FILTER on the key, so force the
    // bucketed scan to get bucket pruning (the cluster-side setting for
    // an IVF serving table)
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled",
      "false")
    try {
      graft.operators.Bucketing.writeBucketed(
        assign.withColumnRenamed("embedding", "emb"), // avoid nested-name clash
        "ivf_index", "seed_id", 8)
      val idx = spark.table("ivf_index")
      // probe 2 of the cells: the scan must touch a strict subset of
      // buckets — the "query reads nProbe cells, not the corpus" claim
      val probed = idx.filter(col("seed_id").isin(0L, 97L))
      probed.collect()
      val plan = probed.queryExecution.executedPlan.toString
      val sel = plan.linesIterator
        .find(_.contains("SelectedBucketsCount")).getOrElse("")
      assert(sel.nonEmpty, plan)
      val m = "SelectedBucketsCount: (\\d+) out of (\\d+)".r
        .findFirstMatchIn(sel).get
      assert(m.group(1).toInt < m.group(2).toInt, sel)
      // and the probe result is exactly the two cells' members
      assert(probed.count() ===
        assign.filter(col("seed_id").isin(0L, 97L)).count())
      assert(nCells > 2)
    } finally {
      spark.conf.unset("spark.sql.sources.bucketing.autoBucketedScan.enabled")
      spark.sql("DROP TABLE IF EXISTS ivf_index")
    }
  }

  test("length mismatch fails loudly") {
    import spark.implicits._
    val df = Seq((Seq(1.0f, 2.0f), Seq(1.0f))).toDF("a", "b")
    val ex = intercept[Exception] {
      df.select(DotProduct.dot(col("a"), col("b"))).collect()
    }
    assert(ex.getMessage != null)
  }

  test("ivfSeedsKmeans: trained seeds flatten cell occupancy on a clustered corpus") {
    import spark.implicits._
    // synthetic clustered corpus: 4 orthogonal-ish modes, 60 vectors
    // each, mode = vec_id % 4 (so the Lloyd init — lowest 4 ids — sees
    // one vector per mode). Mode 3's center leans toward mode 2's, so
    // the modulo-97 seeder (ids 0/97/194 → modes 0/1/2) has no seed
    // for mode 3 and its 60 vectors pile into mode 2's cell —
    // occupancy (60, 60, 120). Deterministic sub-1% noise everywhere.
    val dim = 8
    def center(m: Int): Array[Double] = {
      val c = Array.fill(dim)(0.0)
      if (m < 3) c(m) = 1.0
      else { c(2) = 0.9; c(3) = 0.44 } // ~26° off mode 2
      c
    }
    def vec(i: Int): Seq[Double] = {
      val c = center(i % 4)
      (0 until dim).map(j => c(j) + 0.01 * ((i * 31 + j * 17) % 7 - 3) / 3.0)
    }
    val corpus = (0 until 240).map(i => (i.toLong, vec(i)))
      .toDF("vec_id", "embedding")
      .withColumn("nrm", Similarity.norm(col("embedding")))
    def occupancyCv(seeds: org.apache.spark.sql.DataFrame): Double = {
      val counts = Similarity.ivfAssign(corpus, seeds)
        .groupBy("seed_id").count().collect().map(_.getLong(1).toDouble)
      val mean = counts.sum / counts.length
      math.sqrt(counts.map(c => (c - mean) * (c - mean)).sum /
        counts.length) / mean
    }
    val cvModulo = occupancyCv(Similarity.ivfSeeds(corpus))
    val cvTrained = occupancyCv(
      Similarity.ivfSeedsKmeans(corpus, nCells = 4))
    assert(cvTrained < cvModulo,
      s"trained CV $cvTrained should beat modulo CV $cvModulo")
    // and the trained quantizer separates the modes near-perfectly
    assert(cvTrained < 0.05, s"trained CV $cvTrained")
  }

  test("ivfAppend(index, batch) == full rebuild under the stable quantizer") {
    val e = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .withColumn("nrm", Similarity.norm(col("embedding")))
    val seeds = Similarity.ivfSeeds(e) // quantizer fixed at build time
    val landed = e.filter(pmod(col("vec_id"), lit(5)) =!= 0)
    val batch = e.filter(pmod(col("vec_id"), lit(5)) === 0)
    val appended = Similarity.ivfAppend(
      Similarity.ivfAssign(landed, seeds), seeds, batch)
      .select("vec_id", "seed_id")
    val full = Similarity.ivfAssign(e, seeds).select("vec_id", "seed_id")
    assert(appended.count() === full.count())
    assert(appended.exceptAll(full).isEmpty &&
      full.exceptAll(appended).isEmpty)
  }

  test("knnJoin: planted twins come back as each query's rank-1 neighbor") {
    import spark.implicits._
    // corpus on the real embeddings; every query vector gets a twin
    // planted at vec_id + 100000 with a tiny last-dim nudge — the twin
    // must be rank 1 for its query, and k/ordering invariants hold
    val e = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select("vec_id", "embedding")
    val twins = e.filter(pmod(col("vec_id"), lit(53)) === 0)
      .select((col("vec_id") + 100000L).as("vec_id"),
        transform(col("embedding"),
          x => x * lit(1.0001f)).as("embedding"))
    val corpus = e.unionByName(twins)
      .withColumn("nrm", Similarity.norm(col("embedding")))
    val queries = corpus.filter(
      pmod(col("vec_id"), lit(53)) === 0 && col("vec_id") < 100000L)
    val out = Similarity.knnJoin(corpus, queries, k = 3).collect()
    val byQ = out.groupBy(_.getLong(0))
    assert(byQ.nonEmpty)
    byQ.foreach { case (q, rows) =>
      assert(rows.length <= 3)
      // ranks are 1..n and cosine non-increasing in rank
      assert(rows.map(_.getLong(1)).sorted.toSeq ===
        (1L to rows.length.toLong))
      val byRank = rows.sortBy(_.getLong(1))
      assert(byRank.sliding(2).forall(p => p.length < 2 ||
        p(0).getDouble(3) >= p(1).getDouble(3)))
      // the scaled twin is a pure rescale -> cosine 1.0 -> rank 1
      assert(byRank.head.getLong(2) === q + 100000L,
        s"query $q rank-1 was ${byRank.head.getLong(2)}")
    }
  }

  test("randomProject == driver replication; partition-invariant; loud on wrong dim") {
    import spark.implicits._
    val e = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
    // independent driver replication of quantize + signed sum
    val expected = e.select("vec_id", "embedding").collect().flatMap { r =>
      val id = r.getLong(0)
      val xs = r.getSeq[Float](1)
      (1 to 16).map { k =>
        val comp = xs.zipWithIndex.map { case (x, j0) =>
          Similarity.rpSign(j0 + 1, k) *
            math.floor(x.toDouble * 1000000.0 + 0.5).toLong
        }.sum
        (id, k.toLong, comp)
      }
    }.toSet
    val got = Similarity.randomProject(e).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === expected)
    val got7 = Similarity.randomProject(e.repartition(7)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got7 === expected)
    // sign matrix is balanced enough to be a projection, not a sum
    val sgnSum = (1 to 16).map(k =>
      (1 to 64).map(j => Similarity.rpSign(j, k)).sum)
    assert(sgnSum.forall(s => math.abs(s) < 32), sgnSum.toString)
    // a wrong-dimension vector fails loudly, never null-pads
    val bad = Seq((1L, Array(1f, 2f, 3f))).toDF("vec_id", "embedding")
    val ex = intercept[Exception] {
      Similarity.randomProject(bad).collect()
    }
    assert(ex.getMessage.contains("expected 64-dim"),
      ex.getMessage)
  }
}
