package graft.llmops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Product quantization: Lloyd monotonicity, determinism across
  * partitionings, code-size contract, and ADC recall against exact
  * search on the real embeddings table.
  */
class PqSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private lazy val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    .select(col("vec_id"), col("embedding"))

  private lazy val trained = Pq.train(emb, "embedding", dim = 64)

  test("Lloyd iterations never increase the quantization MSE") {
    val (_, trace) = trained
    assert(trace.size === 5)
    trace.sliding(2).foreach { case Seq(a, b) =>
      assert(b <= a + 1e-12, s"MSE rose: $trace")
    }
    assert(trace.last < trace.head, "training did not improve at all")
  }

  test("codebook is deterministic across input partitionings") {
    val (cb1, _) = Pq.train(emb.repartition(7), "embedding", dim = 64,
      iters = 2)
    val (cb2, _) = Pq.train(emb.coalesce(1), "embedding", dim = 64,
      iters = 2)
    (0 until cb1.m).foreach { s =>
      (0 until cb1.k).foreach { c =>
        assert(cb1.codewords(s)(c).toSeq === cb2.codewords(s)(c).toSeq,
          s"sub $s code $c")
      }
    }
  }

  test("codes: m entries in [0, k), one row per vector") {
    val (cb, _) = trained
    val codes = Pq.encode(emb, "embedding", cb)
    assert(codes.count() === emb.count())
    codes.collect().foreach { r =>
      val cs = r.getSeq[Int](1)
      assert(cs.size === cb.m)
      assert(cs.forall(c => c >= 0 && c < cb.k))
    }
  }

  test("shortlist + exact rerank recalls the true top-10") {
    // finer codebook for the recall measurement (the synthetic
    // embeddings have noise-dominated neighbor gaps — 4-dim subspaces
    // quantize them far better than 8-dim ones)
    val (cb, _) = Pq.train(emb, "embedding", dim = 64, m = 16, k = 32,
      iters = 5)
    val codes = Pq.encode(emb, "embedding", cb)
    val q = emb.filter(col("vec_id") === 0)
      .head().getSeq[Float](1).map(_.toDouble).toArray
    // exact L2 top-10 (driver-side, 500 vectors)
    val exactAll = emb.filter(col("vec_id") =!= 0).collect()
      .map { r =>
        val v = r.getSeq[Float](1)
        r.getLong(0) -> v.indices.map(i => math.pow(v(i) - q(i), 2)).sum
      }
    val exact = exactAll.sortBy { case (id, d) => (d, id) }
      .take(10).map(_._1).toSet
    // shortlist at 10% of the corpus catches nearly all of it...
    val short = Pq.adcSearch(codes.filter(col("vec_id") =!= 0), q, cb,
        topK = 50)
      .collect().map(_.getLong(0)).toSet
    val shortRecall = short.intersect(exact).size / 10.0
    assert(shortRecall >= 0.7, s"shortlist recall@10 = $shortRecall")
    // ...and the rerank is EXACT on what the shortlist caught: the
    // reranked result == exact ranking restricted to the shortlist
    val reranked = Pq.searchWithRerank(
        emb.filter(col("vec_id") =!= 0), "embedding",
        codes.filter(col("vec_id") =!= 0), q, cb, topK = 10, pool = 50)
      .collect().map(_.getLong(0)).toSeq
    val expect = exactAll.filter(p => short.contains(p._1))
      .sortBy { case (id, d) => (d, id) }.take(10).map(_._1).toSeq
    assert(reranked === expect)
  }

  test("IVF-PQ composition: probed-cell search == exact search within cells") {
    // the full production index: coarse quantizer prunes cells, ADC
    // scores only the probed cells' codes, rerank restores exactness
    val e = emb.withColumn("nrm", graft.llmops.Similarity.norm(col("embedding")))
    val seeds = graft.llmops.Similarity.ivfSeeds(e)
    val assign = graft.llmops.Similarity.ivfAssign(e, seeds)
    val (cb, _) = Pq.train(emb, "embedding", dim = 64, m = 16, k = 32,
      iters = 5)
    val codes = Pq.encode(emb, "embedding", cb)
    val q = emb.filter(col("vec_id") === 0)
      .head().getSeq[Float](1).map(_.toDouble).toArray
    // probe the query's 2 nearest cells (as q27 does)
    val qvec = e.filter(col("vec_id") === 0)
      .select(col("embedding").as("qe"), col("nrm").as("qn"))
    val probe = qvec.crossJoin(broadcast(seeds))
      .withColumn("cs", graft.llmops.Similarity.cs("qe", "semb", "qn", "snrm"))
      .orderBy(col("cs").desc, col("seed_id"))
      .limit(2).select("seed_id")
    val probedIds = assign.join(broadcast(probe), Seq("seed_id"))
      .filter(col("vec_id") =!= 0)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(probedIds.nonEmpty)
    // generous pool -> the shortlist covers the probed cells' true
    // top-10, so the result must equal exact search within the cells
    val got = Pq.ivfPqSearch(
        emb.filter(col("vec_id") =!= 0), "embedding",
        codes.filter(col("vec_id") =!= 0),
        assign, probe, q, cb, topK = 10,
        pool = probedIds.size)
      .collect().map(_.getLong(0)).toSeq
    val exactInCells = emb.filter(col("vec_id") =!= 0).collect()
      .filter(r => probedIds.contains(r.getLong(0)))
      .map { r =>
        val v = r.getSeq[Float](1)
        r.getLong(0) -> v.indices.map(i => math.pow(v(i) - q(i), 2)).sum
      }
      .sortBy { case (id, d) => (d, id) }.take(10).map(_._1).toSeq
    assert(got === exactInCells)
  }

  test("ADC distance approximates the true distance (rank-preserving)") {
    val (cb, _) = Pq.train(emb, "embedding", dim = 64, m = 16, k = 32,
      iters = 5)
    val codes = Pq.encode(emb, "embedding", cb)
    val q = emb.filter(col("vec_id") === 0)
      .head().getSeq[Float](1).map(_.toDouble).toArray
    val adc = Pq.adcSearch(codes, q, cb, topK = 500)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val exact = emb.collect().map { r =>
      val v = r.getSeq[Float](1)
      r.getLong(0) -> v.indices.map(i => math.pow(v(i) - q(i), 2)).sum
    }.toMap
    // Spearman-ish check: over random pairs, ADC agrees with the true
    // ordering far more often than not
    val rnd = new scala.util.Random(5)
    val ids = exact.keys.toArray
    val trials = (1 to 400).map { _ =>
      val a = ids(rnd.nextInt(ids.length))
      val b = ids(rnd.nextInt(ids.length))
      if (math.abs(exact(a) - exact(b)) < 1e-9) None
      else Some((exact(a) < exact(b)) == (adc(a) < adc(b)))
    }.flatten
    val agree = trials.count(identity).toDouble / trials.size
    assert(agree >= 0.75, s"rank agreement $agree")
  }
}
