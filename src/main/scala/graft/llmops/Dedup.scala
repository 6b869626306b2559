package graft.llmops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines.
  *
  * Scale design (the whole point at 100 TB):
  *  - exact dedup is one hash-shuffle on a 64-bit fingerprint (never on
  *    the raw text — the shuffle carries 8 bytes + doc_id per row);
  *  - MinHash near-dup uses LSH banding so candidate generation is an
  *    equi-join on (band, band_hash) buckets — no O(n²) cross join ever;
  *  - SimHash uses the same bucket trick on 16-bit key chunks;
  *  - verification (exact Jaccard) runs only on bucket-collision pairs.
  */
object Dedup {

  private def docs(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")

  /** Word shingles (n-gram strings) of the normalized text. */
  def shingles(text: Column, n: Int = 3): Column = {
    val toks = split(regexp_replace(lower(text), "\\s+", " "), " ")
    val k = size(toks) - (n - 1)
    when(k > 0,
      transform(sequence(lit(0), k - 1),
        i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
      .otherwise(array(concat_ws(" ", toks)))
  }

  /** MinHash signature: k independent min-hashes of the shingle set.
    * Permutation i is realized as the 64-bit hex prefix of
    * md5(i ++ ":" ++ shingle) — md5 (unlike xxhash64) exists with
    * identical output in every engine, so an external SQL oracle can
    * reproduce the signature bit-for-bit. Lexicographic min of the
    * fixed-width hex strings equals numeric min. One pass over the
    * shingles per row, all inside codegen.
    */
  def minhash(shingleArr: Column, k: Int = 32): Column =
    transform(sequence(lit(0), lit(k - 1)),
      i => array_min(transform(shingleArr,
        s => substring(md5(concat(i.cast("string"), lit(":"), s)), 1, 16))))

  /** LSH band keys: the signature split into `bands` chunks of `rowsPer`,
    * each chunk joined to one band-key string. Two docs collide in a band
    * iff their chunk matches exactly.
    */
  def bandKeys(sig: Column, bands: Int, rowsPer: Int): Column =
    array((0 until bands).map { b =>
      struct(lit(b).as("band"),
        concat_ws("|", slice(sig, b * rowsPer + 1, rowsPer)).as("bh"))
    }: _*)

  /** Exact Jaccard similarity of two shingle arrays (verification step —
    * runs only on LSH candidate pairs).
    */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val uni = size(array_union(a, b)).cast("double")
    when(uni > 0, round(inter / uni, 6)).otherwise(lit(1.0))
  }

  /** 64-bit SimHash over word tokens: bit j of the output is the sign of
    * the sum over tokens of ±1 according to bit j of xxhash64(token).
    */
  def simhash64(text: Column): Column = {
    val toks = split(regexp_replace(lower(text), "\\s+", " "), " ")
    val hashes = transform(toks, t => xxhash64(t))
    // one pass over the tokens: fold into a 64-wide vote vector
    // (±1 per bit), then assemble the sign bits into a long
    def bitVotes(h: Column): Column = array((0 until 64).map { j =>
      when(shiftright(h, j).bitwiseAND(1) === 1, 1).otherwise(-1)
    }: _*)
    val votes = aggregate(hashes,
      array_repeat(lit(0), 64),
      (acc, h) => zip_with(acc, bitVotes(h), (a, v) => a + v))
    val bits = (0 until 64).map { j =>
      when(element_at(votes, j + 1) > 0, lit(1L << j)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  // ---- queries ----

  /** Exact dedup: canonical doc per normalized-text fingerprint.
    * Output: one row per distinct content with the min doc_id and the
    * duplicate count. The shuffle key is the 64-bit fingerprint.
    */
  def qDedupExact(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .select(col("doc_id"), TextOps.fingerprint(col("text")).as("fp"))
      .groupBy("fp")
      .agg(min("doc_id").as("canonical_doc_id"),
        count(lit(1)).as("n_copies"))
      .select("canonical_doc_id", "n_copies")
      .orderBy("canonical_doc_id")

  /** MinHash+LSH near-duplicate pairs: shingle → signature → band
    * buckets → self-equi-join within bucket → exact-Jaccard verify.
    * Returns (doc_a, doc_b, jaccard) with doc_a < doc_b, jaccard ≥ the
    * threshold. At scale this is: one map stage, one explode (×bands),
    * one hash-shuffle on (band, bh), then per-bucket pairs.
    */
  def nearDupPairs(df: DataFrame, threshold: Double = 0.5,
      k: Int = 32, bands: Int = 8): DataFrame = {
    val rowsPer = k / bands
    val withSh = df.withColumn("sh", shingles(col("text")))
    val withBand = withSh
      .withColumn("sig", minhash(col("sh"), k))
      .select(col("doc_id"),
        explode(bandKeys(col("sig"), bands, rowsPer)).as("bk"))
      .select(col("doc_id"),
        col("bk.band").as("band"), col("bk.bh").as("bh"))
    val a = withBand.select(col("band"), col("bh"), col("doc_id").as("doc_a"))
    val b = withBand.select(col("band"), col("bh"), col("doc_id").as("doc_b"))
    // dedup candidate pairs BEFORE the expensive exact-Jaccard verify:
    // the same pair can collide in several bands, and at scale the
    // shuffle should carry (doc_a, doc_b) ids, not shingle arrays
    val cand = a.join(b, Seq("band", "bh"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
    val shA = withSh.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"))
    val shB = withSh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"))
    cand.join(shA, Seq("doc_a")).join(shB, Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  def qNearDupMinhash(spark: SparkSession, dir: String): DataFrame =
    nearDupPairs(docs(spark, dir), threshold = 0.3)
      .orderBy("doc_a", "doc_b")

  /** SimHash fingerprints + bucket-collision candidates on 16-bit chunks:
    * docs sharing any chunk of the 64-bit simhash are near-dup
    * candidates; report hamming distance ≤ 8.
    */
  def qNearDupSimhash(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
      .select(col("doc_id"), simhash64(col("text")).as("sh"))
    val chunked = d.select(col("doc_id"), col("sh"),
      explode(array((0 until 4).map { c =>
        struct(lit(c).as("chunk"),
          shiftright(col("sh"), c * 16).bitwiseAND(0xFFFF).as("ck"))
      }: _*)).as("c"))
      .select(col("doc_id"), col("sh"),
        col("c.chunk").as("chunk"), col("c.ck").as("ck"))
    val a = chunked.select(col("chunk"), col("ck"),
      col("doc_id").as("doc_a"), col("sh").as("sh_a"))
    val b = chunked.select(col("chunk"), col("ck"),
      col("doc_id").as("doc_b"), col("sh").as("sh_b"))
    val hamming = {
      val x = col("sh_a").bitwiseXOR(col("sh_b"))
      (0 until 64).map(j => shiftright(x, j).bitwiseAND(1)).reduce(_ + _)
    }
    a.join(b, Seq("chunk", "ck"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), hamming.as("hamming"))
      .distinct()
      .filter(col("hamming") <= 8)
      .orderBy("doc_a", "doc_b")
  }

  /** N-gram Jaccard dedup without LSH (exact, for modest candidate sets):
    * here demonstrated per-source to bound the pair count — the partition
    * key stands in for any blocking key available at scale.
    */
  def qJaccardWithinSource(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
      .select(col("source"), col("doc_id"), shingles(col("text")).as("sh"))
    val a = d.select(col("source"), col("doc_id").as("doc_a"),
      col("sh").as("sh_a"))
    val b = d.select(col("source"), col("doc_id").as("doc_b"),
      col("sh").as("sh_b"))
    a.join(b, Seq("source"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
      .filter(col("jaccard") >= 0.2)
      .orderBy("doc_a", "doc_b")
  }
}
