package graft.llmops

import java.util.regex.Pattern

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** BPE tokenizer TRAINING as distributed dataflow (Sennrich+ 2016 —
  * the algorithm behind GPT/Llama-family tokenizers), structured the
  * way [[Pq.train]] structures Lloyd iterations: the corpus is
  * touched ONCE (the map-side-combined token-frequency aggregation,
  * q74's stage); every merge round then runs on the VOCABULARY
  * DataFrame — thousands of rows, whatever the corpus size — so
  * training cost is O(corpus) + nMerges · O(vocab), the exact shape
  * production BPE trainers use (word-frequency dict first, merges
  * over the dict).
  *
  * Determinism: the argmax merge is tie-broken lexicographically
  * (count desc, pair asc), and symbol rewriting is Java-regex
  * left-to-right non-overlapping replacement — canonical BPE ("a a a"
  * under merge "a a" → "aa a"). Each round `localCheckpoint`s the
  * vocab so the plan stays round-sized (the q61 inlining lesson).
  */
object Bpe {

  /** (merges, finalVocab): `merges` in application order (left symbol,
    * right symbol); `finalVocab` rows (tok, tf, sym) with `sym` the
    * token's space-joined symbol segmentation after all merges.
    */
  def train(docs: DataFrame, textCol: String = "text",
      nMerges: Int = 20): (Seq[(String, String)], DataFrame) = {
    val vocab0 = docs
      .select(explode(
        graft.expressions.WordShingles.shingles(col(textCol), 1)).as("tok"))
      .groupBy("tok")
      .agg(count(lit(1)).as("tf"))
      // initial segmentation: one symbol per character
      .withColumn("sym", concat_ws(" ", split(col("tok"), "(?!^)")))
      .localCheckpoint()

    val merges = scala.collection.mutable.ArrayBuffer[(String, String)]()
    var vocab = vocab0
    var round = 0
    var exhausted = false
    while (round < nMerges && !exhausted) {
      val best = pairCounts(vocab)
        .orderBy(col("weighted_n").desc, col("a"), col("b"))
        .limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val (a, b) = (best(0).getString(0), best(0).getString(1))
        merges += ((a, b))
        // whole-symbol-bounded replacement on the padded string. The
        // TRAILING boundary is a lookahead, not a consumed space:
        // consuming it would skip back-to-back occurrences ("b a n a
        // n a" under (a,n) must give "b an an a", not "b an a n a" —
        // left-to-right non-overlapping over SYMBOLS, which share
        // their boundary space in the string encoding)
        val pat = " " + Pattern.quote(a + " " + b) + "(?= )"
        val rep = java.util.regex.Matcher
          .quoteReplacement(" " + (a + b))
        vocab = vocab.withColumn("sym",
          trim(regexp_replace(concat(lit(" "), col("sym"), lit(" ")),
            pat, rep)))
          .localCheckpoint()
      }
      round += 1
    }
    (merges.toSeq, vocab)
  }

  /** Adjacent-symbol pair counts over a (tf, sym) vocabulary — the
    * per-round statistic (q74 is the round-0 special case where every
    * symbol is one character).
    */
  def pairCounts(vocab: DataFrame): DataFrame =
    vocab
      .filter(size(split(col("sym"), " ")) >= 2)
      .select(col("tf"), explode(expr(
        "transform(sequence(1, size(split(sym, ' ')) - 1), " +
          "i -> struct(element_at(split(sym, ' '), i) AS a, " +
          "element_at(split(sym, ' '), i + 1) AS b))")).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum(col("tf")).as("weighted_n"))

  /** Segment a corpus with a trained vocabulary: corpus tokens join
    * the broadcast (tok → sym) dict, pieces explode out — tokenizer
    * APPLICATION as a broadcast-join map stage (out-of-vocabulary
    * tokens fall back to character pieces, computed inline). Returns
    * corpus-weighted piece frequencies.
    */
  def segmentStats(docs: DataFrame, vocab: DataFrame,
      textCol: String = "text"): DataFrame =
    docs
      .select(explode(
        graft.expressions.WordShingles.shingles(col(textCol), 1)).as("tok"))
      .join(broadcast(vocab.select(col("tok"), col("sym"))), Seq("tok"),
        "left")
      .withColumn("sym", coalesce(col("sym"),
        concat_ws(" ", split(col("tok"), "(?!^)"))))
      .select(explode(split(col("sym"), " ")).as("piece"))
      .groupBy("piece")
      .agg(count(lit(1)).as("n"))
}
