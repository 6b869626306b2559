package graft.llmops

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Product quantization (PQ) — the codebook-compression ANN family
  * (Jégou+ 2011) that complements the engine's other similarity paths:
  * q19 brute force (exact), q21/q28 sign-LSH (bucketing), q27 IVF
  * (coarse partitioning), q47 int8 (scalar compression). PQ splits
  * each vector into `m` subvectors, k-means-quantizes each subspace to
  * `k` codewords, and stores only the m code ids (m bytes at k ≤ 256 —
  * 32× smaller than float32 at d=64, m=8). Asymmetric-distance (ADC)
  * search scores compressed vectors against an uncompressed query via
  * m table lookups.
  *
  * Scale design — the "small model, big data" loop:
  *  - the CODEBOOK is tiny (m·k·(d/m) doubles) and lives on the
  *    driver, broadcast into each pass as literals/a broadcast join;
  *  - each Lloyd iteration is ONE distributed pass: assignment is a
  *    broadcast join + per-(vector, subspace) rank, centroid update is
  *    a grouped aggregation whose output is m·k rows — the corpus
  *    never shuffles, only (id, sub, code) assignments do;
  *  - all m subspaces train in the SAME pass (the subvector explode
  *    carries sub_id), not m sequential jobs;
  *  - centroid means use exact decimal sums (the q20 contract), so
  *    codebooks are bit-deterministic across partitionings — distance
  *    ties then break on code_id and the whole pipeline is reproducible;
  *  - encoding is one map-shaped pass (broadcast join + rank), ADC
  *    search is a pure map stage over the codes + TakeOrdered(k).
  */
object Pq {

  /** Codebook: codewords(sub)(code) = centroid of subspace `sub`. */
  final case class Codebook(m: Int, k: Int, subDim: Int,
      codewords: Array[Array[Array[Double]]])

  private def subSchema = StructType(Seq(
    StructField("sub_id", IntegerType, nullable = false),
    StructField("code_id", IntegerType, nullable = false),
    StructField("cw", ArrayType(DoubleType, containsNull = false),
      nullable = false)))

  private def codebookDf(spark: SparkSession, cb: Codebook): DataFrame = {
    val rows = for {
      s <- 0 until cb.m
      c <- 0 until cb.k
    } yield Row(s, c, cb.codewords(s)(c).toSeq)
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq, 1), subSchema)
  }

  /** (vec_id, sub_id, subvec) — each vector exploded into its m
    * subvectors (double arrays of d/m).
    */
  def subvectors(e: DataFrame, vecCol: String, m: Int, dim: Int): DataFrame = {
    val s = dim / m
    e.select(col("vec_id"),
      posexplode(array((0 until m).map { i =>
        transform(slice(col(vecCol), i * s + 1, s), _.cast("double"))
      }: _*)).as(Seq("sub_id", "subvec")))
  }

  /** Squared L2 between two double arrays (HOF fold — subvectors are
    * d/m-dimensional, small enough that codegen keeps this in the
    * assignment join's hot loop).
    */
  def l2sq(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, v) => acc + v)

  /** Nearest codeword per (vector, subspace): broadcast join on sub_id
    * + rank over (distance, code_id) — deterministic tie-break.
    */
  private def assign(sub: DataFrame, cbDf: DataFrame): DataFrame = {
    val w = Window.partitionBy("vec_id", "sub_id")
      .orderBy(col("d2"), col("code_id"))
    sub.join(broadcast(cbDf), Seq("sub_id"))
      .withColumn("d2", l2sq(col("subvec"), col("cw")))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("vec_id"), col("sub_id"), col("subvec"),
        col("code_id"), col("d2"))
  }

  /** Train per-subspace codebooks with Lloyd iterations. Init:
    * codeword c of every subspace = the subvector of the c-th smallest
    * vec_id (deterministic, engine-independent). Empty clusters keep
    * their previous codeword. Returns the codebook and the final mean
    * squared quantization error (which Lloyd makes non-increasing per
    * iteration — PqSpec pins that).
    */
  def train(e: DataFrame, vecCol: String, dim: Int,
      m: Int = 8, k: Int = 16, iters: Int = 5): (Codebook, Seq[Double]) = {
    require(m > 0 && dim % m == 0,
      s"dim=$dim must divide evenly into m=$m subspaces")
    require(k > 0 && iters > 0, "k and iters must be positive")
    val spark = e.sparkSession
    val subDim = dim / m
    val sub = subvectors(e, vecCol, m, dim).persist()
    // deterministic init from the k smallest DISTINCT vec_ids (works
    // for any id space, not just 0-based)
    val initIds = sub.select(col("vec_id")).distinct()
      .orderBy("vec_id").limit(k).collect().map(_.getLong(0)).toSeq
    require(initIds.size == k,
      s"need at least $k distinct vec_ids for init, got ${initIds.size}")
    val initRows = sub.filter(col("vec_id").isin(initIds: _*))
      .collect()
      .map(r => ((r.getInt(1), r.getLong(0)),
        r.getSeq[Double](2).toArray))
      .toMap
    var cw = Array.tabulate(m, k)((s, c) => initRows((s, initIds(c))))
    val mseTrace = scala.collection.mutable.ArrayBuffer.empty[Double]
    for (_ <- 1 to iters) {
      val a = assign(sub, codebookDf(spark, Codebook(m, k, subDim, cw)))
      // centroid update: exact decimal elementwise sums (the q20
      // contract) → bit-deterministic means regardless of partitioning
      val sums = (0 until subDim).map(j =>
        sum(element_at(col("subvec"), j + 1).cast("decimal(28,10)"))
          .as(s"s$j"))
      val aggs = (count(lit(1)).as("n") +:
        sum(col("d2").cast("decimal(28,10)")).as("sd2") +: sums)
      val upd = a.groupBy("sub_id", "code_id")
        .agg(aggs.head, aggs.tail: _*)
        .collect()
      val next = Array.tabulate(m, k)((s, c) => cw(s)(c)) // keep if empty
      var totD2 = BigDecimal(0); var totN = 0L
      upd.foreach { r =>
        val (s, c) = (r.getInt(0), r.getInt(1))
        val n = r.getLong(2)
        totD2 += BigDecimal(r.getDecimal(3))
        totN += n
        next(s)(c) = Array.tabulate(subDim)(j =>
          (BigDecimal(r.getDecimal(4 + j)) / n).toDouble)
      }
      cw = next
      // quantization MSE of the codebook the assignment ran against —
      // Lloyd makes this trace non-increasing (PqSpec pins it)
      mseTrace += (totD2 / totN).toDouble
    }
    sub.unpersist()
    (Codebook(m, k, subDim, cw), mseTrace.toSeq)
  }

  /** Encode: per vector, the array of m code ids (the compressed
    * representation — m bytes at k ≤ 256).
    */
  def encode(e: DataFrame, vecCol: String, cb: Codebook): DataFrame = {
    val spark = e.sparkSession
    val sub = subvectors(e, vecCol, cb.m, cb.m * cb.subDim)
    assign(sub, codebookDf(spark, cb))
      .groupBy("vec_id")
      .agg(transform(
        array_sort(collect_list(struct(col("sub_id"), col("code_id")))),
        s => s.getField("code_id")).as("codes"))
  }

  /** ADC top-k: the query's m×k distance table is computed on the
    * driver and embedded as a literal; scoring a compressed vector is
    * m literal-array lookups summed — a pure map stage over (vec_id,
    * codes), then TakeOrdered. The corpus vectors are never read.
    */
  def adcSearch(codes: DataFrame, query: Array[Double], cb: Codebook,
      topK: Int = 10): DataFrame = {
    val dtab: Array[Array[Double]] = Array.tabulate(cb.m, cb.k) { (s, c) =>
      var d = 0.0
      var j = 0
      while (j < cb.subDim) {
        val diff = query(s * cb.subDim + j) - cb.codewords(s)(c)(j)
        d += diff * diff
        j += 1
      }
      d
    }
    val dtabLit = array(dtab.toIndexedSeq.map(row =>
      array(row.toIndexedSeq.map(lit): _*)): _*)
    val score = (0 until cb.m).map(s =>
      element_at(element_at(dtabLit, s + 1),
        element_at(col("codes"), s + 1).cast("int") + 1))
      .reduce(_ + _)
    codes.select(col("vec_id"), round(score, 6).as("adc_d2"))
      .orderBy(col("adc_d2"), col("vec_id"))
      .limit(topK)
  }

  /** Production PQ search: ADC over the compressed codes produces a
    * `pool`-sized shortlist (scanning m-byte codes — 32× less IO than
    * the vectors), then ONLY the shortlist's full vectors are read for
    * the exact top-k rerank. This two-stage shape is how PQ is
    * actually deployed — ADC alone ranks within quantization noise;
    * the rerank restores exactness for everything the shortlist
    * caught (PqSpec measures shortlist recall ≥ 0.8 on the synthetic
    * corpus at pool = 10% — and the rerank is then exact on it).
    */
  def searchWithRerank(e: DataFrame, vecCol: String, codes: DataFrame,
      query: Array[Double], cb: Codebook,
      topK: Int = 10, pool: Int = 100): DataFrame = {
    val shortlist = adcSearch(codes, query, cb, pool).select("vec_id")
    val qlit = array(query.toIndexedSeq.map(lit): _*)
    e.join(broadcast(shortlist), Seq("vec_id"))
      .select(col("vec_id"),
        round(l2sq(transform(col(vecCol), _.cast("double")), qlit), 6)
          .as("d2"))
      .orderBy(col("d2"), col("vec_id"))
      .limit(topK)
  }

  /** The canonical IVF-PQ index search — the composition deployed ANN
    * systems actually run at 100 TB: the coarse quantizer prunes to
    * nProbe cells (at scale the codes live bucketed by `seed_id`, so
    * this is a bucket-pruned scan, not a filter over the corpus), ADC
    * scores ONLY the probed cells' m-byte codes, and the exact rerank
    * reads full vectors for the pool-sized shortlist alone. Cost per
    * query: nProbe/nCells of the code scan + pool full vectors —
    * independent of corpus size in the vector dimension.
    *
    * `assign` is [[graft.llmops.Similarity.ivfAssign]]'s output
    * (vec_id, seed_id [, ...]); `probeSeeds` the query's nProbe cell
    * ids (a driver-sized/broadcastable relation).
    */
  def ivfPqSearch(e: DataFrame, vecCol: String, codes: DataFrame,
      assign: DataFrame, probeSeeds: DataFrame,
      query: Array[Double], cb: Codebook,
      topK: Int = 10, pool: Int = 100): DataFrame = {
    val cellCodes = codes.join(
      org.apache.spark.sql.functions.broadcast(probeSeeds.select("seed_id"))
        .join(assign.select("vec_id", "seed_id"), Seq("seed_id"))
        .select("vec_id"),
      Seq("vec_id"))
    searchWithRerank(e, vecCol, cellCodes, query, cb, topK, pool)
  }
}
