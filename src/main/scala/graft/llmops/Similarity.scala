package graft.llmops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two paths, per the standard ANN playbook:
  *  - brute-force cosine top-k (the exact baseline): broadcast the query
  *    vectors, one map stage over the corpus, TakeOrderedAndProject —
  *    scales linearly and shuffles only k rows per query;
  *  - LSH-bucketed (random-hyperplane signs) for the 100 TB path: corpus
  *    and queries are bucketed by sign-pattern key, the join is an
  *    equi-join on the bucket, exact cosine re-ranks within buckets.
  *
  * All vector math is `aggregate`/`zip_with` over array columns — codegen,
  * no UDF.
  */
object Similarity {

  private def emb(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/embeddings.parquet")

  /** Σ aᵢ·bᵢ — the native [[graft.expressions.DotProduct]] kernel
    * (double accumulation, sequential ascending fold — the same
    * deterministic order as the HOF `aggregate(zip_with(...))`
    * formulation it replaced, checked by SimilaritySpec).
    */
  def dot(a: Column, b: Column): Column =
    graft.expressions.DotProduct.dot(a, b)

  /** HOF dot kept as the parity reference for the native kernel. */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = {
    val d = norm(a) * norm(b)
    when(d > 0, dot(a, b) / d).otherwise(lit(0.0))
  }

  /** Cosine from a precomputed pair of norms (attributes — computed once
    * per vector BEFORE a pair join, not once per pair). Per-pair work is
    * one dot-product fold and a division.
    */
  def cosineWithNorms(a: Column, b: Column, normA: Column, normB: Column): Column = {
    val d = normA * normB
    when(d > 0, dot(a, b) / d).otherwise(lit(0.0))
  }

  /** Deterministic pseudo-random hyperplanes: plane p, component j is a
    * fixed function of (p, j) — reproducible across sessions without a
    * stored model. Values in [-1, 1).
    */
  def hyperplane(p: Int, dim: Int): Array[Double] = {
    val rnd = new scala.util.Random(1234L * (p + 1))
    Array.fill(dim)(rnd.nextDouble() * 2 - 1)
  }

  /** Sign-pattern LSH key over `nPlanes` hyperplanes: an int in
    * [0, 2^nPlanes). Vectors with equal keys are "same cone" candidates.
    * `firstPlane` selects which hyperplanes participate — multi-table
    * (banded) LSH uses disjoint plane ranges per table to trade bucket
    * selectivity for recall.
    */
  def lshKey(vec: Column, dim: Int, nPlanes: Int = 8,
      firstPlane: Int = 0): Column = {
    // each projection folds vec against an array LITERAL — a dim-term
    // unrolled expression tree here compiles past the JVM method limit
    // and drops the whole project out of codegen (measured 0.6 ms/row);
    // the native dot kernel keeps the identical left-to-right summation
    // order with O(1) expression nodes and zero per-row allocation
    val bits = (0 until nPlanes).map { p =>
      val plane = typedLit(hyperplane(firstPlane + p, dim))
      val proj = dot(vec, plane)
      when(proj >= 0, lit(1 << p)).otherwise(lit(0))
    }
    bits.reduce(_ + _)
  }

  // ---- queries ----

  /** Per-vector norm + mean (array HOF baseline; deterministic fold). */
  def qVectorStats(spark: SparkSession, dir: String): DataFrame =
    emb(spark, dir)
      .select(col("vec_id"), col("label"),
        round(norm(col("embedding")), 6).as("l2_norm"),
        round(aggregate(col("embedding"), lit(0.0),
          (acc, x) => acc + x.cast("double")) / size(col("embedding")), 6)
          .as("mean_val"))
      .orderBy("vec_id")

  /** Brute-force cosine top-k: the 10 nearest neighbours of vec_id 0
    * (excluding itself). The query vector joins via broadcast (1 row);
    * ranking is top-k, not a global sort.
    */
  def qKnnBrute(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir)
    val q = e.filter(col("vec_id") === 0)
      .select(col("embedding").as("q_embedding"))
    e.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(q))
      .select(col("vec_id"),
        round(cosine(col("embedding"), col("q_embedding")), 6).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(10)
  }

  /** Centroid similarity per label group: mean vector per label (a
    * tree-aggregated elementwise average), then cosine of each label
    * centroid against the global centroid. Exercises grouped vector
    * aggregation — the IVF coarse-quantizer building block.
    */
  def qLabelCentroids(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir)
    val dim = 64
    // elementwise decimal sums keep the reduce order-independent
    val sums = (0 until dim).map { j =>
      sum(element_at(col("embedding"), j + 1).cast("decimal(28,10)"))
        .as(s"s$j")
    }
    val aggs = count(lit(1)).as("n") +: sums
    e.groupBy("label")
      .agg(aggs.head, aggs.tail: _*)
      .select(col("label"), col("n"),
        round(sqrt((0 until dim).map { j =>
          val m = col(s"s$j").cast("double") / col("n")
          m * m
        }.reduce(_ + _)), 6).as("centroid_norm"))
      .orderBy("label")
  }

  /** 6-decimal cosine between prenormed column pairs (oracle rounding). */
  private[llmops] def cs(a: String, b: String, na: String, nb: String) =
    round(cosineWithNorms(col(a), col(b), col(na), col(nb)), 6)

  /** IVF build stage: assign every vector to its nearest seed cell
    * (broadcast the seeds, rank per vector). The returned assignment
    * — (vec_id, embedding, nrm, seed_id) — IS the index; persist it
    * bucketed by `seed_id` ([[graft.operators.Bucketing]]) and a probe
    * reads only its nProbe cells' buckets (SimilaritySpec pins the
    * bucket pruning).
    */
  def ivfAssign(e: DataFrame, seeds: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wAssign = Window.partitionBy("vec_id")
      .orderBy(col("cs").desc, col("seed_id"))
    e.crossJoin(broadcast(seeds))
      .withColumn("cs", cs("embedding", "semb", "nrm", "snrm"))
      .withColumn("rk", row_number().over(wAssign))
      .filter(col("rk") === 1)
      .select(col("vec_id"), col("embedding"), col("nrm"), col("seed_id"))
  }

  /** Deterministic coarse-quantizer seeds (every 97th vector). */
  def ivfSeeds(e: DataFrame): DataFrame =
    e.filter(pmod(col("vec_id"), lit(97)) === 0)
      .select(col("vec_id").as("seed_id"), col("embedding").as("semb"),
        col("nrm").as("snrm"))

  /** Lloyd-TRAINED coarse quantizer — the cell-skew fix for REAL
    * (clustered) embeddings: [[ivfSeeds]]' modulo sampling draws seeds
    * with the data's density, so a dense mode grabs several near-
    * identical seeds while sparse regions get none, and cell occupancy
    * skews — occupancy² being exactly the documented cost knob of the
    * in-cell pair stages (q85/q90) and the probed-cell candidate
    * volume (q98). Training k centroids with
    * [[graft.llmops.Cluster.kmeansCentroids]] places one seed per
    * density mode instead; SimilaritySpec pins the occupancy-CV drop
    * on a clustered synthetic corpus.
    *
    * Returns the same (seed_id, semb, snrm) relation as [[ivfSeeds]]
    * (seed_id = the training vec_id the centroid descended from, semb
    * the de-quantized centroid), so it drops into [[ivfAssign]] /
    * [[knnJoinIndexed]] / semanticDedup unchanged. Like any trained
    * quantizer it must be PERSISTED and reused for incremental ingest
    * (the streaming sinks' stable-quantizer rule) — retraining on a
    * grown corpus moves cell boundaries and invalidates an index.
    * Training cost: `iters` passes over the corpus with k-sized driver
    * state; the default gates keep the modulo seeder.
    */
  def ivfSeedsKmeans(e: DataFrame, nCells: Int, iters: Int = 3,
      quantScale: Double = 1000.0, offset: Long = 1048576L): DataFrame = {
    val spark = e.sparkSession
    val cents = Cluster.kmeansCentroids(
      e.select("vec_id", "embedding"), nCells, iters, quantScale, offset)
    import spark.implicits._
    cents.toSeq
      .map { case (cid, c) =>
        (cid, c.map(v => (v - offset).toDouble / quantScale).toSeq)
      }
      .toDF("seed_id", "semb")
      .withColumn("snrm", norm(col("semb")))
  }

  /** q27 — IVF (inverted-file) ANN: deterministic seed vectors act as
    * the coarse quantizer ([[ivfSeeds]]); every vector is assigned to
    * its nearest seed ([[ivfAssign]]); a query probes its nProbe
    * nearest cells and brute-forces only those. At scale the
    * assignment is written bucketed-by-cell so a query touches nProbe
    * buckets instead of the corpus (SimilaritySpec pins the pruning).
    */
  def qIvfKnn(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir).withColumn("nrm", norm(col("embedding")))
    val seeds = ivfSeeds(e)
    val assign = ivfAssign(e, seeds)
    val qvec = e.filter(col("vec_id") === 0)
      .select(col("embedding").as("qe"), col("nrm").as("qn"))
    val qseeds = qvec.crossJoin(broadcast(seeds))
      .withColumn("cs", cs("qe", "semb", "qn", "snrm"))
      .orderBy(col("cs").desc, col("seed_id"))
      .limit(2)
      .select("seed_id")
    assign.join(broadcast(qseeds), Seq("seed_id"))
      .filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(qvec))
      .select(col("vec_id"),
        cs("embedding", "qe", "nrm", "qn").as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(10)
  }

  /** kNN JOIN — every query vector's top-k corpus neighbors, the
    * BATCH retrieval surface (labeling sweeps, retrieval eval, dedup
    * scoring) that q19/q27's single-query searches don't cover. Same
    * IVF shape as [[qIvfKnn]] generalized to a query SET: corpus
    * assigned to cells once, each query probes its `nProbe` nearest
    * cells (per-query row_number over the broadcast seed relation),
    * candidates are the probed cells' members via ONE seed_id
    * equi-join, exact cosine + per-query rank ≤ k. Determinism is the
    * q27 contract: 6-decimal cosine, seed_id/vec_id tie-breaks.
    *
    * Scale shape: with the assignment persisted bucketed by seed_id
    * ([[graft.operators.Bucketing]]) the candidate join is
    * Exchange-free on the corpus side and a query batch shuffles only
    * (q_id, qe, seed_id) probe rows; per-query cost stays
    * ∝ nProbe/nCells of the corpus. Self-matches (same vec_id) are
    * excluded so a corpus can kNN-join itself.
    */
  def knnJoin(corpus: DataFrame, queries: DataFrame, k: Int,
      nProbe: Int = 2): DataFrame = {
    val seeds = ivfSeeds(corpus)
    knnJoinIndexed(ivfAssign(corpus, seeds), seeds, queries, k, nProbe)
  }

  /** [[knnJoin]] against a PREBUILT index — `assign` is
    * [[ivfAssign]]'s output (persist it bucketed by seed_id at scale)
    * and `seeds` the quantizer it was built with. The build is the
    * one-off 100 TB cost (|corpus| × |seeds| assignment cosines —
    * 120 s for 200k × 2.1k at the 100× soak); this entry point is the
    * RECURRING per-batch cost (probe + candidate join only: 2.4 s for
    * 2k queries against the same index).
    */
  def knnJoinIndexed(assign: DataFrame, seeds: DataFrame,
      queries: DataFrame, k: Int, nProbe: Int = 2): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wProbe = Window.partitionBy("q_id")
      .orderBy(col("cs").desc, col("seed_id"))
    val probes = queries.select(col("vec_id").as("q_id"),
        col("embedding").as("qe"), col("nrm").as("qn"))
      .crossJoin(broadcast(seeds))
      .withColumn("cs", cs("qe", "semb", "qn", "snrm"))
      .withColumn("rk", row_number().over(wProbe))
      .filter(col("rk") <= nProbe)
      .select("q_id", "qe", "qn", "seed_id")
    val wTop = Window.partitionBy("q_id")
      .orderBy(col("cos_sim").desc, col("vec_id"))
    assign.join(probes, Seq("seed_id"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        cs("embedding", "qe", "nrm", "qn").as("cos_sim"))
      .withColumn("rk", row_number().over(wTop))
      .filter(col("rk") <= k)
      .select(col("q_id"), col("rk").cast("long").as("rk"),
        col("vec_id").as("nn_id"), col("cos_sim"))
      .orderBy("q_id", "rk")
  }

  /** APPEND a landing batch to a persisted IVF index — the q46 ingest
    * shape for the index itself: only the batch computes seed cosines
    * (|batch| × |seeds| — the broadcast-seed [[ivfAssign]] map stage);
    * landed assignment rows are read back verbatim and never
    * re-shuffled or re-scored. Under a STABLE quantizer (`seeds`
    * persisted from the original build — the same rule as the
    * streaming sinks) the result is row-identical to rebuilding with
    * ivfAssign(index-vectors ∪ batch) (SimilaritySpec pins the
    * equivalence), so probes via [[knnJoinIndexed]] see an
    * incrementally-grown index indistinguishable from a fresh build.
    * At scale: write the returned rows partitioned/bucketed by seed_id
    * next to the landed files; the landed side of this union is
    * scan-only.
    */
  def ivfAppend(index: DataFrame, seeds: DataFrame,
      batch: DataFrame): DataFrame =
    index.unionByName(ivfAssign(batch, seeds))

  /** q98 — [[knnJoin]]: every 53rd vector as the query batch, top-3
    * probed-cell neighbors each. Mirror generalizes the q27 CTEs to a
    * query set (per-query probe rank, per-query result rank).
    */
  def qKnnJoin(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir).withColumn("nrm", norm(col("embedding")))
    knnJoin(e, e.filter(pmod(col("vec_id"), lit(53)) === 0), k = 3)
  }

  /** q101 — [[ivfAppend]] under the driver gate: build the index on
    * the landed 80% split (vec_id % 5 ≠ 0), append the held-out batch
    * under the SAME quantizer, emit the grown assignment. The mirror
    * computes the q98 assignment over the WHOLE corpus, so the hash
    * match is the append ≡ full-rebuild equivalence certificate in the
    * driver's artifact (SimilaritySpec pins it locally).
    */
  def qIvfAppend(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir).withColumn("nrm", norm(col("embedding")))
    val seeds = ivfSeeds(e)
    ivfAppend(
      ivfAssign(e.filter(pmod(col("vec_id"), lit(5)) =!= 0), seeds),
      seeds,
      e.filter(pmod(col("vec_id"), lit(5)) === 0))
      .select(col("vec_id"), col("seed_id"))
      .orderBy("vec_id")
  }

  /** q102 — the Lloyd-TRAINED quantizer under the driver gate: train
    * [[ivfSeedsKmeans]] (k = 8, 3 iterations — the exact q97
    * recurrence, whose centroids the q97 mirror already replays),
    * assign the corpus, emit the per-cell occupancy profile. The
    * mirror dequantizes the q97 centroid CTE ((c − offset)/scale, one
    * IEEE division) and replays the round-6 cosine argmax, certifying
    * the trained-quantizer path end-to-end against DuckDB.
    */
  def qIvfKmeansCells(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir).withColumn("nrm", norm(col("embedding")))
    val seeds = ivfSeedsKmeans(e, nCells = 8, iters = 3)
    ivfAssign(e, seeds)
      .groupBy("seed_id")
      .agg(count(lit(1)).as("n_members"))
      .orderBy("seed_id")
  }

  /** q47 — int8 embedding quantization quality report: per-vector
    * symmetric scale (absmax/127), round-to-nearest quantization, mean
    * absolute reconstruction error and saturation count. The vector-
    * compression operator of embedding storage at 100 TB — int8 cuts
    * the footprint 4× and this is the per-vector report that decides
    * where that is safe.
    *
    * Engine-reproducibility: round-to-nearest is spelled
    * `floor(x/s + 0.5)` — floor and the divisions are exact IEEE
    * doubles in any engine, while library `round()` half-up/half-even
    * dialects differ. Error sums fold in index order (the q18/q19
    * contract). Pure map stage: no shuffle, full codegen, scales with
    * the scan.
    */
  def qQuantizeInt8(spark: SparkSession, dir: String): DataFrame = {
    val xd = (x: Column) => x.cast("double")
    emb(spark, dir)
      .withColumn("absmax",
        aggregate(col("embedding"), lit(0.0),
          (a, x) => greatest(a, abs(xd(x)))))
      .withColumn("scale", col("absmax") / 127.0)
      .withColumn("qe",
        when(col("absmax") === 0.0,
          transform(col("embedding"), _ => lit(0.0)))
          .otherwise(transform(col("embedding"),
            x => floor(xd(x) / col("scale") + 0.5))))
      .withColumn("err_sum",
        aggregate(
          zip_with(col("embedding"), col("qe"),
            (x, q) => abs(xd(x) - q * col("scale"))),
          lit(0.0), (a, x) => a + x))
      .select(
        col("vec_id"),
        round(col("scale"), 6).as("scale6"),
        round(col("err_sum") / size(col("embedding")), 6)
          .as("mean_abs_err"),
        size(filter(col("qe"), q => abs(q) >= 127.0)).as("n_sat"))
      .orderBy("vec_id")
  }

  /** Deterministic ±1 sign for projection cell (j, k) — the value
    * parity of the first hex digit of md5("rp_<j>_<k>") (j = 1-based
    * input dim, k = 1-based output dim). Computed here with Java's
    * MessageDigest; the q139 DuckDB mirror RECOMPUTES the digest with
    * its own md5 + hex-digit strpos — two independent md5
    * implementations agreeing on every cell is part of the
    * certificate (the q79/feistel shared-DERIVATION pattern, without
    * sharing values).
    */
  def rpSign(j: Int, k: Int): Int = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"rp_${j}_${k}".getBytes("UTF-8"))
    if ((((d(0) >> 4) & 0xF) % 2) == 0) 1 else -1
  }

  /** Johnson–Lindenstrauss random projection with dense ±1 signs
    * (Achlioptas 2003) — the embedding DIMENSIONALITY-compression
    * operator next to q47's precision compression: project `inDim`
    * vectors onto `outDim` pseudorandom ±1 directions, preserving
    * pairwise distances to JL tolerance while cutting every downstream
    * distance computation (clustering, brute re-rank, sim joins) by
    * inDim/outDim. Components are EXACT integers — inputs quantize to
    * micro units (floor(x·1e6 + 0.5), the q47 rounding spelling) and
    * the projection is a ±-signed Long sum (|comp| ≤ 64·|x|max·1e6 ≪
    * 2^63) — so q139 hash-gates every component against DuckDB.
    *
    * Scale shape: a PURE MAP stage — the sign matrix rides as 16
    * literal arrays folded into codegen (outDim·inDim = 1024 constants,
    * no broadcast, no join), each vector is one zip_with/aggregate
    * chain, and nothing shuffles (the gate's total ORDER BY adds the
    * one range exchange; PlanSpec pins zero exchanges below it). A
    * vector of the wrong dimension fails LOUDLY row-level (zip_with
    * would null-pad silently otherwise — the packPassageId precedent).
    */
  def randomProject(vectors: DataFrame, inDim: Int = 64,
      outDim: Int = 16): DataFrame = {
    require(inDim >= 1 && outDim >= 1 && outDim <= inDim,
      s"need 1 <= outDim <= inDim, got in=$inDim out=$outDim")
    val qarr = transform(col("embedding"),
      x => floor(x.cast("double") * 1000000.0 + 0.5).cast("long"))
    val comps = (1 to outDim).map { k =>
      val signs = array((1 to inDim).map(j =>
        lit(rpSign(j, k).toLong)): _*)
      aggregate(zip_with(col("__q"), signs, (q, s) => q * s),
        lit(0L), (a, x) => a + x)
    }
    vectors
      .withColumn("__q",
        when(size(col("embedding")) === inDim, qarr)
          .otherwise(raise_error(concat(
            lit(s"randomProject: expected $inDim-dim embedding, got "),
            size(col("embedding")).cast("string"),
            lit(" for vec_id "), col("vec_id").cast("string")))))
      .select(col("vec_id"),
        posexplode(array(comps: _*)).as(Seq("__k0", "comp")))
      .select(col("vec_id"), (col("__k0") + 1).cast("long").as("k"),
        col("comp"))
  }

  /** q139 — the 64→16 JL projection of every corpus embedding, one row
    * per (vector, output dimension), all-BIGINT. The mirror rebuilds
    * the sign matrix from ITS OWN md5 and replays the quantize +
    * signed sum over the unnested embedding.
    */
  def qRandomProjection(spark: SparkSession, dir: String): DataFrame =
    randomProject(emb(spark, dir)).orderBy("vec_id", "k")

  /** LSH-bucketed ANN: same-bucket candidate pairs with exact cosine
    * re-rank — the scale path (equi-join on bucket key; no cross join).
    * Returns top candidate pairs above threshold.
    */
  def qAnnLshPairs(spark: SparkSession, dir: String): DataFrame = {
    // bucket AND norm are per-vector map-stage work, computed before the
    // pair join; the per-pair loop is one codegen'd dot product
    val e = emb(spark, dir)
      .withColumn("bucket", lshKey(col("embedding"), 64, 8))
      .withColumn("nrm", norm(col("embedding")))
    val a = e.select(col("bucket"), col("vec_id").as("id_a"),
      col("embedding").as("emb_a"), col("nrm").as("nrm_a"))
    val b = e.select(col("bucket"), col("vec_id").as("id_b"),
      col("embedding").as("emb_b"), col("nrm").as("nrm_b"))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(cosineWithNorms(col("emb_a"), col("emb_b"),
          col("nrm_a"), col("nrm_b")), 6).as("cos_sim"))
      .filter(col("cos_sim") >= 0.2)
      .orderBy("id_a", "id_b")
  }
}
