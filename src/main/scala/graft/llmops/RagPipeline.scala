package graft.llmops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end retrieval SERVING preparation — the [[CorpusPipeline]]
  * counterpart for the read path: the canonical composition a RAG
  * deployment actually runs, from raw documents to the k diverse,
  * snippeted contexts handed to a generator. Every stage is an
  * individually oracle-gated operator; this entry point pins their
  * COMPOSITION (RagPipelineSpec, one planted victim per stage):
  *
  *  1. passage chunking ([[TextOps.chunkDocuments]], q103's stage) —
  *     sliding token windows with stable (doc_id, chunk_idx) identity,
  *     packed into collision-guarded passage ids
  *     ([[Retrieval.packPassageId]], q112's loud-overflow contract);
  *  2. passage index build ([[Retrieval.postingsIndex]], q110/q112) —
  *     persisted under the caller-held-index rule (release with
  *     `clearCache`; written bucketed by `tok` in production);
  *  3. hybrid probe (q107/q119): BM25 term channel over the passage
  *     index ([[Retrieval.bm25Probe]]) + cosine vector channel
  *     ([[Retrieval.vectorChannel]]) fused by reciprocal-rank fusion
  *     ([[Retrieval.rrfFuse]], exact integer points). Passage vectors
  *     INHERIT the parent document's embedding — the seam where a
  *     passage-level embedder plugs in once one has run; the plumbing
  *     (join keys, channel shape, fusion) is identical either way.
  *     Queries or documents without embeddings degrade to term-only,
  *     the q107 mixed-coverage contract. At corpus scale the brute
  *     cosine swaps for the IVF probe (q119's certificate — same
  *     (qid, did, rk) shape);
  *  4. MMR diversification ([[Retrieval.mmrRerank]], q132) — fused
  *     points min–max normalized per query to micro relevance (the
  *     q134 integer normalization, via [[Retrieval.minMaxFuse]] with
  *     one channel), pairwise candidate similarity from the inherited
  *     embeddings, so near-duplicate passages (q.v. same parent or
  *     replicated docs) cannot crowd the context list;
  *  5. KWIC snippets ([[Retrieval.snippetProbe]], q120/q122) — the
  *     query's leading bigram anchored inside the PICKED passages
  *     only (top-k-sized text access, never corpus-sized); contexts
  *     without a verbatim phrase hit keep a null snippet and their
  *     full passage text (the RAG fallback: the passage IS the
  *     context; the snippet is presentation sugar).
  *
  * Scale shape: one corpus-sized chunk/tokenize pass (stages 1–2);
  * probes and fusion touch rank-bounded relations (queries × topC);
  * MMR rounds and snippets touch queries × topC and queries × k rows.
  * The audit frame is a lazy union of per-stage count aggregates —
  * nothing here collects to the driver.
  */
object RagPipeline {

  /** The prepared serving state: `passages` (unpacked identity +
    * text), the caller-held `index`, the fused `run`
    * (qid, did, rrf_pts, in_term, in_vec, fused_rank), the `contexts`
    * handed to generation (qid, doc_id, chunk_idx, pick, mmr_pts,
    * context_text, snippet — `pick` is MMR's selection order), and
    * the per-stage `audit` counts (stage, n).
    */
  final case class Prepared(passages: DataFrame, index: DataFrame,
      run: DataFrame, contexts: DataFrame, audit: DataFrame)

  /** `corpus` = (doc_id, text); `queries` = (qid, text); `vectors` =
    * (vec_id, embedding) covering document and/or query ids (the
    * driver-testdata embeddings shape) — missing coverage degrades
    * that side to term-only.
    */
  def prepare(corpus: DataFrame, queries: DataFrame, vectors: DataFrame,
      chunkTokens: Int = 32, overlapTokens: Int = 8, topC: Int = 12,
      k: Int = 5, ctx: Int = 5, packFactor: Long = 1000L): Prepared = {
    require(k >= 1 && k <= topC,
      s"need 1 <= k <= topC contexts; got k=$k topC=$topC")

    // 1. chunk + collision-guarded passage ids
    val passages = TextOps.chunkDocuments(
        corpus.select("doc_id", "text"), chunkTokens, overlapTokens)
      .select(
        Retrieval.packPassageId(col("doc_id"), col("chunk_idx"),
          packFactor).as("did"),
        col("doc_id"), col("chunk_idx").cast("long").as("chunk_idx"),
        col("chunk_text").as("text"))

    // 2. passage index (caller-held: the persist()-and-clearCache rule)
    val index = Retrieval.postingsIndex(passages.select("did", "text"))
      .persist()

    // 3a. term channel: BM25 over the passage index
    val termRun = Retrieval.bm25Probe(queries, index, topN = topC)
      .select("qid", "did", "rk")
    // 3b. vector channel: inherited parent-doc embeddings
    val qv = queries.join(vectors, col("qid") === col("vec_id"))
      .select(col("qid"), col("embedding").as("qe"))
    val pv = passages.join(vectors, col("doc_id") === col("vec_id"))
      .select(col("did"), col("embedding").as("ce"))
    val vecRun = Retrieval.vectorChannel(qv, pv, topN = topC)
    // 3c. fuse
    val run = Retrieval.rrfFuse(
        Seq("term" -> termRun, "vec" -> vecRun), topK = topC)
      .localCheckpoint(false) // feeds MMR candidates + sims + audit

    // 4. MMR: micro-normalized relevance + inherited-embedding sims
    val cand = Retrieval.minMaxFuse(
        Seq(("rrf", run.select(col("qid"), col("did"),
          col("rrf_pts").as("score")), 1L)), topK = topC)
      .select(col("qid"), col("did"), col("fused_pts").as("rel_micro"))
    val candV = run.select("qid", "did").join(pv, "did")
      .select(col("qid"), col("did"), col("ce"))
    val sims = candV.select(col("qid"), col("did").as("did_a"),
        col("ce").as("ea"))
      .join(candV.select(col("qid").as("qid_y"),
          col("did").as("did_b"), col("ce").as("eb")),
        col("qid") === col("qid_y") && col("did_a") =!= col("did_b"))
      .select(col("qid"), col("did_a"), col("did_b"),
        floor(round(Similarity.cosine(col("ea"), col("eb")), 6)
          * lit(1000000.0) + lit(0.5)).cast("long").as("sim_micro"))
    val picked = Retrieval.mmrRerank(cand, sims, k)

    // 5. snippets anchored in the picked passages only
    val phrases = queries.select(col("qid"),
      element_at(graft.expressions.WordShingles.shingles(col("text"), 2),
        1).as("phrase"))
    val pickedPassages = picked.select("qid", "did")
      .join(passages, "did")
    val snips = Retrieval.snippetProbe(phrases,
        Retrieval.gramPositions(
          pickedPassages.select("did", "text").distinct(), 2),
        pickedPassages.select("did", "text").distinct(),
        n = 2, topN = k, ctx = ctx)
      .select(col("qid"), col("did"), col("snippet"))
    val contexts = picked
      .join(passages.select(col("did"), col("doc_id"),
        col("chunk_idx"), col("text").as("context_text")), "did")
      .join(snips, Seq("qid", "did"), "left")
      .select(col("qid"), col("doc_id"), col("chunk_idx"), col("pick"),
        col("mmr_pts"), col("context_text"), col("snippet"))

    val audit = Seq(
      "passages" -> passages, "index_postings" -> index,
      "term_run" -> termRun, "vec_run" -> vecRun, "fused" -> run,
      "contexts" -> contexts)
      .map { case (s, df) =>
        df.agg(count(lit(1)).as("n")).select(lit(s).as("stage"), col("n"))
      }
      .reduce(_.unionByName(_))

    Prepared(passages, index, run, contexts, audit)
  }
}
