package graft.llmops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The end-to-end composition: every stage must act on exactly the
  * planted doc, in the production order (quality → scrub → dedup →
  * decontaminate → chunk), with the audit frame naming each drop.
  */
class CorpusPipelineSpec extends SparkSpec {

  // 5-char letter-only words (digit-free — the digit_ratio rule must
  // not fire), plus two "the" stopword tokens: n_tokens 24-25 in
  // [20, 90], mean word length ≈ 4.8-4.96 in [4, 5]
  private def words(prefix: String, n: Int): Seq[String] =
    (0 until n).map(i =>
      prefix + ('a' + i / 26).toChar.toString +
        ('a' + i % 26).toChar.toString + "q")
  private def mk(prefix: String): String =
    (words(prefix, 22) ++ Seq("the", "the")).mkString(" ")

  test("prepare: each stage drops its planted doc; survivors chunk") {
    import spark.implicits._
    val leak = mk("ll")
    val goodB = mk("bb")
    val docs = Seq(
      1L -> mk("aa"),                 // kept
      2L -> mk("aa"),                 // exact dup of 1 → dedup drop
      3L -> goodB,                    // kept (near-dup canonical)
      4L -> (goodB + " extra"),       // near-dup of 3 → dedup drop
      5L -> words("ee", 3).mkString(" "), // too_short → quality drop
      6L -> leak,                     // verbatim eval leak → decontam drop
      7L -> (words("gg", 22) ++ Seq("the", "the") :+ "ab@cd.ef")
        .mkString(" ")                // kept, email scrubbed
    ).toDF("doc_id", "text")
    val evalDocs = Seq(100L -> leak).toDF("doc_id", "text")

    val out = CorpusPipeline.prepare(docs, Some(evalDocs),
      nearDupThreshold = 0.5, chunkTokens = 64, overlapTokens = 16)

    val kept = out.kept.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(kept.keySet === Set(1L, 3L, 7L))
    assert(kept(7L).contains("<EMAIL>") && !kept(7L).contains("@"))

    // one 64-token chunk per survivor; chunk text == the (scrubbed)
    // doc text, so the signature is the doc content digest
    val chunks = out.chunks.collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("chunk_idx"),
        r.getAs[String]("chunk_sig"))).toSeq
    assert(chunks.map(_._1).sorted === Seq(1L, 3L, 7L))
    assert(chunks.forall(_._2 == 0L))
    val sigs = out.kept
      .select(col("doc_id"), md5(regexp_replace(col("text"), "\\s+", " "))
        .as("sig"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    chunks.foreach { case (id, _, sig) => assert(sig === sigs(id)) }

    // audit names every drop with its stage
    val dropped = out.dropped.collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    assert(dropped.keySet === Set(2L, 4L, 5L, 6L))
    assert(dropped(2L)._1 === "dedup")
    assert(dropped(4L)._1 === "dedup")
    assert(dropped(5L) === (("quality", "too_short")))
    assert(dropped(6L) === (("decontaminate", "eval_verbatim_leak")))
    spark.catalog.clearCache() // nearDupPairs persists its shingles
  }

  test("prepare without an eval set skips decontamination only") {
    import spark.implicits._
    val docs = Seq(1L -> mk("aa"), 2L -> mk("zz")).toDF("doc_id", "text")
    val out = CorpusPipeline.prepare(docs, None)
    assert(out.kept.select("doc_id").collect().map(_.getLong(0)).sorted
      === Seq(1L, 2L))
    assert(out.dropped.isEmpty)
    spark.catalog.clearCache()
  }
}
