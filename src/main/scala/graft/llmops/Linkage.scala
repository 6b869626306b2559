package graft.llmops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Approximate record linkage: edit-distance similarity self-join with
  * SYMMETRIC-DELETE blocking (the SymSpell/FastSS scheme). The naive
  * formulation — all-pairs `levenshtein(a, b) <= k` — is a cartesian
  * product no engine survives at scale; the deletion-neighborhood
  * identity (ed(a, b) <= k  ⟹  D≤k(a) ∩ D≤k(b) ≠ ∅, where D≤k(s) is
  * every string obtainable from s by deleting at most k characters)
  * turns it into an EQUI-join on deletion variants: each string emits
  * O(L^k) variants (≤ ~70 for two-word names at k = 2), candidates are
  * variant-key collisions, and an exact `levenshtein` verify removes
  * the scheme's false positives (variant intersection only bounds the
  * distance by 2k). The oracle runs the naive all-pairs formulation,
  * so the hash match is a completeness certificate for the blocking.
  *
  * Scale shape: the only shuffle carries (xxhash64(variant), name) —
  * hash collisions merely add candidates for the verify, never lose a
  * pair — and pair verification runs on the DISTINCT name pairs, so
  * cost scales with the name vocabulary, not the row count.
  */
object Linkage {

  /** D≤maxDist(s) as a column of distinct strings (maxDist ∈ {1, 2});
    * includes s itself (deleting zero characters). Pure codegen HOFs;
    * the flat i·L+j pair index keeps the nested deletion loop inside
    * one `transform`/`filter` pair without descending-`sequence`
    * edge cases on short strings.
    */
  def deletionVariants(s: Column, maxDist: Int): Column = {
    require(maxDist == 1 || maxDist == 2,
      s"symmetric-delete blocking supports maxDist 1 or 2, got $maxDist")
    val len = length(s)
    // delete position i (1-based)
    def del1(i: Column): Column =
      concat(s.substr(lit(1), i - 1), s.substr(i + 1, len))
    // delete positions i < j (1-based)
    def del2(i: Column, j: Column): Column =
      concat(s.substr(lit(1), i - 1), s.substr(i + 1, j - i - 1),
        s.substr(j + 1, len))
    val d1 = transform(sequence(lit(1), greatest(len, lit(1))),
      i => when(i <= len, del1(i)))
    val base = concat(array(s), d1)
    val all = if (maxDist == 1) base else {
      // ANSI-safe divisor: the len >= 2 conjunct rejects the guarded
      // cases, but `%`/`/` must still not see a zero
      val safeLen = greatest(len, lit(1))
      val flat = sequence(lit(0), greatest(len * len - 1, lit(0)))
      val pairs = filter(flat, idx =>
        (idx % safeLen) + 1 > (idx.divide(safeLen)).cast("int") + 1 &&
          len >= 2)
      val d2 = transform(pairs, idx =>
        del2((idx.divide(safeLen)).cast("int") + 1, (idx % safeLen) + 1))
      concat(base, d2)
    }
    array_distinct(filter(all, v => v.isNotNull))
  }

  /** Distinct-value fuzzy self-join: every unordered pair of distinct
    * `nameCol` values within Levenshtein distance `maxDist`, with the
    * exact distance. Blocking per the scaladoc above; candidates are
    * deduplicated before the verify so `levenshtein` runs once per
    * candidate pair.
    *
    * `maxLen` bounds the deletion-neighborhood blowup: at maxDist = 2
    * the pair index materializes len² elements per value, so an
    * unguarded multi-KB string would allocate millions of array slots
    * in one row. A value longer than `maxLen` fails LOUDLY
    * (raise_error) rather than silently dropping pairs or OOMing —
    * linkage keys are short by nature; raise the limit deliberately if
    * a vocabulary genuinely needs it.
    */
  def fuzzyNamePairs(df: DataFrame, nameCol: String,
      maxDist: Int = 2, maxLen: Int = 256): DataFrame = {
    val names = df.select(col(nameCol).as("name")).distinct()
      .select(when(length(col("name")) > maxLen,
          raise_error(concat(
            lit(s"fuzzyNamePairs: value exceeds maxLen=$maxLen chars: "),
            col("name").substr(1, 64))))
        .otherwise(col("name")).as("name"))
    val v = names.select(col("name"),
      explode(deletionVariants(col("name"), maxDist)).as("vstr"))
      .select(col("name"), xxhash64(col("vstr")).as("vkey"))
    v.select(col("vkey"), col("name").as("name_a"))
      .join(v.select(col("vkey"), col("name").as("name_b")), Seq("vkey"))
      .filter(col("name_a") < col("name_b"))
      .select("name_a", "name_b").distinct()
      // threshold form: banded O(k·n) DP with a length fast path,
      // returning -1 above the bound (what BoundedEditDistanceRule
      // rewrites user-written `levenshtein(a,b) <= k` into)
      .withColumn("ed", levenshtein(col("name_a"), col("name_b"), maxDist))
      .filter(col("ed") >= 0)
  }

  /** q92 — fuzzy part-name matching: all distinct `p_name` pairs
    * within edit distance 2 (the "cold anvil"/"old anvil" near-misses
    * a catalog-cleaning pass must reconcile), each carrying its part
    * count per side. The DuckDB mirror verifies the SAME pair set via
    * naive all-pairs `levenshtein`, certifying the deletion-variant
    * blocking loses no pair on this vocabulary.
    */
  def qFuzzyJoin(spark: SparkSession, dir: String): DataFrame = {
    val part = spark.read.parquet(s"$dir/part.parquet")
    val counts = part.groupBy(col("p_name").as("name"))
      .agg(count(lit(1)).as("n"))
    fuzzyNamePairs(part, "p_name", maxDist = 2)
      .join(broadcast(counts.withColumnRenamed("name", "name_a")
        .withColumnRenamed("n", "n_parts_a")), Seq("name_a"))
      .join(broadcast(counts.withColumnRenamed("name", "name_b")
        .withColumnRenamed("n", "n_parts_b")), Seq("name_b"))
      .select(col("name_a"), col("name_b"), col("ed"),
        col("n_parts_a"), col("n_parts_b"))
      .orderBy("name_a", "name_b")
  }
}
