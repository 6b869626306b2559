package graft.llmops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** BPE training pinned against an independent driver implementation
  * of Sennrich+ 2016 (same tie-break: count desc, then (a, b) asc;
  * same left-to-right non-overlapping merge application).
  */
class BpeSpec extends SparkSpec {

  /** Reference BPE on a word-frequency dict, driver-side. */
  private def referenceBpe(dict: Map[String, Long], nMerges: Int)
      : (Seq[(String, String)], Map[String, Seq[String]]) = {
    var segs: Map[String, (Seq[String], Long)] =
      dict.map { case (w, f) => w -> (w.map(_.toString), f) }
    val merges = scala.collection.mutable.ArrayBuffer[(String, String)]()
    for (_ <- 1 to nMerges) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      for ((_, (syms, f)) <- segs; i <- 0 until syms.length - 1)
        counts((syms(i), syms(i + 1))) =
          counts.getOrElse((syms(i), syms(i + 1)), 0L) + f
      if (counts.nonEmpty) {
        val (pair, _) = counts.toSeq
          .sortBy { case ((a, b), c) => (-c, a, b) }.head
        merges += pair
        segs = segs.map { case (w, (syms, f)) =>
          val out = scala.collection.mutable.ArrayBuffer[String]()
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length &&
                syms(i) == pair._1 && syms(i + 1) == pair._2) {
              out += (pair._1 + pair._2); i += 2
            } else { out += syms(i); i += 1 }
          }
          w -> (out.toSeq, f)
        }
      }
    }
    (merges.toSeq, segs.map { case (w, (s, _)) => w -> s })
  }

  test("distributed BPE reproduces the reference merges and segments") {
    import spark.implicits._
    // the classic Sennrich working example, as a corpus whose token
    // frequencies realize the dict
    val dict = Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L,
      "widest" -> 3L)
    val corpus = dict.toSeq.flatMap { case (w, f) =>
      Seq.fill(f.toInt)(w)
    }.grouped(4).map(_.mkString(" ")).toSeq.toDF("text")
    val (merges, vocab) = Bpe.train(corpus, nMerges = 8)
    val (refMerges, refSegs) = referenceBpe(dict, 8)
    assert(merges === refMerges, s"merge order diverged: $merges")
    val segs = vocab.collect()
      .map(r => r.getString(0) -> r.getString(2).split(" ").toSeq).toMap
    assert(segs === refSegs)
    // the famous first merges: ('e','s') then ('es','t')
    assert(merges.take(2) === Seq(("e", "s"), ("es", "t")))
  }

  test("back-to-back pair occurrences merge left-to-right (banana)") {
    import spark.implicits._
    // 'banana': best pair (a,n) occurs back-to-back — the rewrite must
    // produce 'b an an a' (canonical non-overlapping), never skip the
    // second occurrence because the boundary space was consumed
    val corpus = Seq.fill(3)("banana").toDF("text")
    val (merges, vocab) = Bpe.train(corpus, nMerges = 1)
    assert(merges === Seq(("a", "n")))
    val sym = vocab.filter(col("tok") === "banana")
      .head().getString(2)
    assert(sym === "b an an a", s"got '$sym'")
    // reference agrees end-to-end on repeated-pair tokens
    val (refM, refSegs) = referenceBpe(Map("banana" -> 3L, "aaaa" -> 2L), 3)
    val (dM, dVocab) = Bpe.train(
      (Seq.fill(3)("banana") ++ Seq.fill(2)("aaaa")).toDF("text"),
      nMerges = 3)
    assert(dM === refM)
    val dSegs = dVocab.collect()
      .map(r => r.getString(0) -> r.getString(2).split(" ").toSeq).toMap
    assert(dSegs === refSegs)
  }

  test("BPE on the fixture corpus: merges reduce symbol count monotonically") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val (merges, vocab) = Bpe.train(docs, nMerges = 10)
    assert(merges.size === 10)
    assert(merges.toSet.size === 10) // no merge repeats
    // every merged symbol pair is gone from the final segmentation
    // (padded contains — a raw substring check would false-positive on
    // symbol boundaries, e.g. 'xa b' for pair (a, b))
    val lastPair = merges.last
    assert(vocab.filter(concat(lit(" "), col("sym"), lit(" "))
      .contains(" " + lastPair._1 + " " + lastPair._2 + " "))
      .count() === 0)
    // segmentation stats: pieces cover the corpus (Σ n·len == Σ chars)
    val stats = Bpe.segmentStats(docs, vocab)
    val pieceChars = stats
      .select(sum(length(col("piece")) * col("n"))).head().getLong(0)
    val tokChars = docs.select(explode(
        graft.expressions.WordShingles.shingles(col("text"), 1)).as("t"))
      .select(sum(length(col("t")))).head().getLong(0)
    assert(pieceChars === tokChars)
  }
}
