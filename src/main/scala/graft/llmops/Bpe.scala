package graft.llmops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** BPE tokenizer TRAINING (Sennrich+ 2016 — the algorithm behind
  * GPT/Llama-family tokenizers) in the exact shape production BPE
  * trainers use: the corpus is touched ONCE (the map-side-combined
  * token-frequency aggregation, q74's stage), then the merge loop
  * runs DRIVER-LOCAL on the collected word-frequency dict — which is
  * vocabulary-sized by construction (distinct tokens, further capped
  * by `minTf` for web-scale corpora), never corpus-sized. A 30k-merge
  * vocabulary therefore costs one distributed pass plus an in-memory
  * loop, not 30k Spark job round-trips (the round-4 cadence finding).
  *
  * The loop maintains pair counts incrementally with a pair→words
  * index, so each merge touches only the words containing the merged
  * pair. Determinism: the argmax merge is tie-broken
  * lexicographically (count desc, pair asc — ASCII-identical between
  * Java string order and Spark's UTF-8 binary order), and symbol
  * rewriting is left-to-right non-overlapping — canonical BPE
  * ("a a a" under merge "a a" → "aa a").
  */
object Bpe {

  /** (merges, finalVocab): `merges` in application order (left symbol,
    * right symbol); `finalVocab` rows (tok, tf, sym) with `sym` the
    * token's space-joined symbol segmentation after all merges.
    *
    * `minTf` drops rare tokens from the dict BEFORE the collect — the
    * standard vocabulary cap that bounds driver memory on corpora
    * whose long tail of hapaxes dwarfs the useful vocabulary.
    */
  def train(docs: DataFrame, textCol: String = "text",
      nMerges: Int = 20, minTf: Long = 1L)
      : (Seq[(String, String)], DataFrame) = {
    val spark = docs.sparkSession
    // the ONE distributed pass: corpus -> (tok, tf), map-side combined
    val dict = docs
      .select(explode(
        graft.expressions.WordShingles.shingles(col(textCol), 1)).as("tok"))
      .groupBy("tok")
      .agg(count(lit(1)).as("tf"))
      .filter(col("tf") >= minTf)
      .collect().map(r => (r.getString(0), r.getLong(1)))

    final case class W(tok: String, tf: Long, var syms: Array[String])
    val words = dict.map { case (t, f) => W(t, f, t.split("(?!^)")) }
    val counts = scala.collection.mutable.HashMap[(String, String), Long]()
    val index =
      scala.collection.mutable.HashMap[(String, String),
        scala.collection.mutable.Set[Int]]()
    def account(i: Int, sign: Long): Unit = {
      val w = words(i)
      var j = 0
      while (j < w.syms.length - 1) {
        val p = (w.syms(j), w.syms(j + 1))
        val c = counts.getOrElse(p, 0L) + sign * w.tf
        if (c == 0L) counts.remove(p) else counts(p) = c
        if (sign > 0)
          index.getOrElseUpdate(p,
            scala.collection.mutable.Set[Int]()) += i
        j += 1
      }
    }
    words.indices.foreach(account(_, 1L))

    // left-to-right non-overlapping merge of (a, b) in a symbol array
    def applyMerge(syms: Array[String], a: String, b: String)
        : Array[String] = {
      val out = scala.collection.mutable.ArrayBuffer[String]()
      var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
          out += (a + b); i += 2
        } else { out += syms(i); i += 1 }
      }
      out.toArray
    }

    val merges = scala.collection.mutable.ArrayBuffer[(String, String)]()
    var round = 0
    while (round < nMerges && counts.nonEmpty) {
      var best: (String, String) = null
      var bestC = Long.MinValue
      for ((p, c) <- counts)
        if (c > bestC || (c == bestC &&
            (p._1 < best._1 || (p._1 == best._1 && p._2 < best._2)))) {
          best = p; bestC = c
        }
      merges += best
      // the index may hold stale members (words rewritten since they
      // last contained `best`) — account(-1)/rewrite/account(+1) is a
      // no-op for them
      for (i <- index.getOrElse(best, Set.empty[Int]).toArray.sorted) {
        account(i, -1L)
        words(i).syms = applyMerge(words(i).syms, best._1, best._2)
        account(i, 1L)
      }
      round += 1
    }

    import spark.implicits._
    val vocab = words.toSeq
      .map(w => (w.tok, w.tf, w.syms.mkString(" ")))
      .toDF("tok", "tf", "sym")
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
