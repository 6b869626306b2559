package graft.llmops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators for training-data pipelines: stratified
  * quota sampling, deterministic hash-based splits, and train/eval
  * decontamination. These are the three operations that turn a raw
  * corpus into a training set — and all three are pure DataFrame
  * algebra (window rank per stratum, a digest-derived split label, and
  * the same scalable explode/co-count overlap shape as the near-dup
  * verifies).
  */
object Curation {

  private def docs(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")

  /** q30 — stratified quota sample: the top `quota` documents per
    * (lang, source) stratum by token count, deterministic tie-break on
    * doc_id. The balancing step of corpus assembly ("cap every
    * language×source cell"). One shuffle on the stratum key; the rank
    * window scales with the stratum, never the corpus; skewed strata
    * stop streaming rows past the quota in the per-partition sort.
    */
  def qQuotaSample(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("lang", "source")
      .orderBy(col("n_tokens").desc, col("doc_id"))
    docs(spark, dir)
      .select(col("lang"), col("source"), col("doc_id"),
        TextOps.tokenCount(col("text")).as("n_tokens"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 5)
      .orderBy("lang", "source", "rk")
  }

  /** Deterministic split label from the first md5 hex digit of the
    * document id: 16 buckets → 12 train / 2 val / 2 test. Stable across
    * engines and runs (no RNG state), reproducible by any SQL engine
    * with md5 — the property that matters for a split: membership is a
    * pure function of the id, so re-running assembly never migrates a
    * document between train and eval.
    */
  def splitLabel(docId: Column): Column = {
    val digit = substring(md5(docId.cast("string").cast("binary")), 1, 1)
    when(digit.isin("c", "d"), "val")
      .when(digit.isin("e", "f"), "test")
      .otherwise("train")
  }

  /** q31 — split summary: per-split document/token totals and id range.
    * The assembly report of [[splitLabel]]; a map stage + a 3-group agg.
    */
  def qHashSplit(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .select(splitLabel(col("doc_id")).as("split"), col("doc_id"),
        TextOps.tokenCount(col("text")).as("n_tokens"))
      .groupBy("split")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        min(col("doc_id")).as("min_doc_id"),
        max(col("doc_id")).as("max_doc_id"))
      .orderBy("split")

  /** PII scrubbing: redact emails, phone-shaped numbers, and IPv4
    * addresses with typed placeholders — the text-hygiene pass every
    * training corpus runs before tokenization. Pure `regexp_replace`
    * chain (codegen'd, zero shuffle, scan-speed at 100 TB). ASCII-only
    * patterns; ordering matters — emails first so their user@host
    * digits aren't half-eaten by the phone pattern.
    *
    * The phone pattern is NANP-shaped (3-3-4 groupings with optional
    * country code) — international formats need per-locale patterns,
    * exactly as production scrubbers configure them.
    *
    * (Spec-tested on crafted strings rather than oracle-gated: the
    * synthetic corpus contains no PII, and regex dialects differ
    * between engines — this operator is Java-regex semantics.)
    */
  def redactPii(text: Column): Column = {
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val ipv4 = "\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b"
    val phone = "(?<![0-9])(?:\\+?[0-9]{1,3}[ .-]?)?(?:\\([0-9]{3}\\)[ .-]?|[0-9]{3}[ .-])[0-9]{3}[ .-][0-9]{4}(?![0-9])"
    regexp_replace(
      regexp_replace(
        regexp_replace(text, email, "<EMAIL>"),
        ipv4, "<IP>"),
      phone, "<PHONE>")
  }

  /** Count of PII redactions [[redactPii]] performs on a document —
    * the audit metric (documents over a hit threshold get dropped by
    * policy instead of redacted). Counted as placeholders introduced,
    * so pre-existing literal placeholders in the text don't inflate it.
    */
  def piiHits(text: Column): Column =
    (regexp_count(redactPii(text), lit("<EMAIL>|<IP>|<PHONE>")) -
      regexp_count(text, lit("<EMAIL>|<IP>|<PHONE>"))).cast("long")

  /** Corpus sink: write the (curated) corpus partitioned by (lang,
    * split) with bounded file sizes — the layout downstream training
    * jobs read. `partitionBy` gives hive-style directory pruning on
    * the two columns every consumer filters on (language, train/eval);
    * `maxRecordsPerFile` bounds the largest file so a skewed (lang,
    * split) cell becomes many readable files, not one unsplittable
    * blob; the pre-write `repartition` on the partition columns
    * prevents the classic small-files explosion (without it, every
    * task writes a file into every partition directory —
    * tasks × cells files at 100 TB).
    */
  def writeCorpus(docs: DataFrame, path: String,
      maxRecordsPerFile: Long = 100000L): Unit =
    docs
      .withColumn("split", splitLabel(col("doc_id")))
      .repartition(col("lang"), col("split"))
      .write
      .partitionBy("lang", "split")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .mode("overwrite")
      .parquet(path)

  /** q32 — decontamination: eval-split documents sharing ≥ `minOverlap`
    * distinct word shingles with any train-split document, with the
    * worst-offender overlap. THE pre-training hygiene query (eval
    * examples leaking into train).
    *
    * Shape: one shingle pass (native [[graft.expressions.WordShingles]]
    * kernel), explode the distinct 64-bit shingle hashes, equi-join
    * train×eval on the hash, count per (eval, train) pair, aggregate
    * per eval doc — non-overlapping pairs never materialize, and the
    * shuffle carries (doc_id, hash), never text (the q25 co-count
    * shape; at 100 TB this is the only formulation that works).
    */
  def qDecontaminate(spark: SparkSession, dir: String,
      minOverlap: Int = 5): DataFrame = {
    val d = docs(spark, dir)
      .select(col("doc_id"), splitLabel(col("doc_id")).as("split"),
        Dedup.hashedShingles(
          graft.expressions.WordShingles.shingles(col("text"))).as("shh"))
      .persist() // both sides of the overlap join
    def side(s: String, idCol: String) = d
      .filter(col("split") === (if (s == "eval") lit("val") else lit(s)))
      .select(col("doc_id").as(idCol), explode(col("shh")).as("h"))
    // "eval" = the val split (test stays untouched until final report)
    val ev = side("eval", "eval_doc_id")
    val tr = side("train", "train_doc_id")
    ev.join(tr, Seq("h"))
      .groupBy("eval_doc_id", "train_doc_id")
      .agg(count(lit(1)).as("n_common"))
      .filter(col("n_common") >= minOverlap)
      .groupBy("eval_doc_id")
      .agg(count(lit(1)).as("n_train_matches"),
        max(col("n_common")).as("max_overlap"))
      .orderBy("eval_doc_id")
  }
}
