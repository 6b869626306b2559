package graft

import graft.llmops.{Similarity, TextOps}

/** DuckDB oracle SQL for every entry in [[SparkEntry.queries]].
  *
  * Each statement is written to be BIT-IDENTICAL to the Spark result on the
  * same parquet tables:
  *  - double sums go through the same DECIMAL cast;
  *  - floating-point folds over arrays are unrolled left-associated, the
  *    exact evaluation order of Spark's `aggregate`/`reduce` chains;
  *  - hashes use md5 (identical hex output in both engines), never
  *    engine-private hash functions;
  *  - every aggregate/computed column carries the same alias as the Spark
  *    side, and every query ends in a total ORDER BY.
  *
  * SQL is generated from the SAME Scala constants the Column builders use
  * (stopword table, LSH hyperplanes), so the two sides cannot drift.
  */
object OracleSql {

  private val D2R = "0.017453292519943295" // math.Pi / 180.0

  private def sumL(terms: Seq[String]): String =
    terms.mkString("(", " + ", ")")

  /** Unrolled left-associated Σ a[i]·b[i] over 1-based list indexes. */
  private def dotSql(a: String, b: String, dim: Int): String =
    sumL((1 to dim).map(j => s"CAST($a[$j] AS DOUBLE) * CAST($b[$j] AS DOUBLE)"))

  private def normSql(a: String, dim: Int): String =
    s"sqrt(${dotSql(a, a, dim)})"

  private def cosineSql(a: String, b: String, dim: Int): String = {
    val den = s"(${normSql(a, dim)} * ${normSql(b, dim)})"
    s"CASE WHEN $den > 0 THEN ${dotSql(a, b, dim)} / $den ELSE 0.0 END"
  }

  /** Flat-embedding CTE: the embeddings table with every dimension
    * extracted ONCE into a plain DOUBLE column x1..x`dim`, plus the
    * per-row L2 norm. Bit-identical to inlining [[cosineSql]] — the
    * same `CAST(embedding[j] AS DOUBLE)` per element, the same
    * left-associated fold, one deterministic sqrt — but downstream
    * pair stages then multiply flat columns instead of re-extracting
    * 64-wide list children on join outputs. The list-re-extraction
    * form is what fragmented DuckDB's allocator into ~60k memory maps
    * (vm.max_map_count 65,530) under the driver's single-process
    * 32-thread sequential harness and cost q90's r12 row; the flat
    * form stays in the low thousands (`tools/oracle_stress.py --seq`
    * replays the driver profile and gates this).
    */
  private def flatEmbCte(name: String, dim: Int): String = {
    val extract = (1 to dim)
      .map(j => s"CAST(embedding[$j] AS DOUBLE) AS x$j").mkString(", ")
    val nrm = s"sqrt(${sumL((1 to dim).map(j => s"x$j * x$j"))})"
    s"""$name AS MATERIALIZED (
       |  SELECT *, $nrm AS nrm FROM (
       |    SELECT vec_id, $extract FROM embeddings) flat_inner)""".stripMargin
  }

  /** Σ a.xj·b.xj over [[flatEmbCte]] aliases — same terms and order as
    * [[dotSql]] after each side's one-time DOUBLE cast.
    */
  private def flatDotSql(a: String, b: String, dim: Int): String =
    sumL((1 to dim).map(j => s"$a.x$j * $b.x$j"))

  /** [[cosineSql]] over [[flatEmbCte]] aliases: numerator term-identical,
    * denominator the same two sqrts (precomputed per row) multiplied in
    * the same order.
    */
  private def flatCosSql(a: String, b: String, dim: Int): String = {
    val den = s"($a.nrm * $b.nrm)"
    s"CASE WHEN $den > 0 THEN ${flatDotSql(a, b, dim)} / $den ELSE 0.0 END"
  }

  /** Haversine separation in degrees, mirroring Astro.angSepDeg term by
    * term (same literal D2R, same operation order, same radicand clamp
    * — see AngularSeparation.compute's near-antipodal note).
    */
  private def angSepSql(ra1: String, dec1: String, ra2: String, dec2: String): String = {
    val dra = s"(($ra2 - $ra1) * $D2R / 2.0)"
    val ddec = s"(($dec2 - $dec1) * $D2R / 2.0)"
    val a = s"(pow(sin($ddec), 2.0) + cos($dec1 * $D2R) * cos($dec2 * $D2R) * pow(sin($dra), 2.0))"
    s"asin(sqrt(least(1.0, $a))) * 2.0 / $D2R"
  }

  /** Word-shingle CTE chunk shared by the dedup oracles: doc_id (+extra
    * cols) with `sh` = 3-gram shingle list of the normalized text.
    */
  private def shinglesCte(extraCols: String = ""): String =
    s"""toks0 AS (
       |  SELECT doc_id$extraCols,
       |    string_split(regexp_replace(lower(text), '\\s+', ' ', 'g'), ' ') AS toks
       |  FROM documents),
       |sh0 AS (
       |  SELECT doc_id$extraCols,
       |    CASE WHEN len(toks) - 2 > 0
       |      THEN list_transform(range(0, len(toks) - 2),
       |             i -> array_to_string(list_slice(toks, i + 1, i + 3), ' '))
       |      ELSE [array_to_string(toks, ' ')] END AS sh
       |  FROM toks0)""".stripMargin

  /** round(|A∩B|/|A∪B|, 6) with Spark's distinct-set semantics. */
  private def jaccardSql(a: String, b: String): String = {
    val inter = s"len(list_filter(list_distinct($a), x -> list_contains($b, x)))"
    val uni = s"len(list_distinct(list_concat($a, $b)))"
    s"CASE WHEN $uni > 0 THEN round(CAST($inter AS DOUBLE) / $uni, 6) ELSE 1.0 END"
  }

  private val q1 =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
      |  count(*) AS count_order,
      |  round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6) AS avg_qty
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  private val q2 =
    """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1996-06-01 00:00:00'
      |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  private val q3 =
    """SELECT n_name,
      |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
      |  count(*) AS n_items
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY n_name
      |ORDER BY n_name""".stripMargin

  private val q4 =
    """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin

  private val q5 =
    """SELECT DISTINCT c_mktsegment, c_nationkey FROM customer
      |ORDER BY c_mktsegment, c_nationkey""".stripMargin

  private val q6 =
    """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    row_number() OVER (PARTITION BY o_custkey
      |                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |  FROM orders) t
      |WHERE rn <= 3
      |ORDER BY o_custkey, rn""".stripMargin

  private val q7 =
    """SELECT l_returnflag,
      |  round(quantile_cont(l_quantity, 0.5), 6) AS median_qty,
      |  round(quantile_cont(l_extendedprice, 0.9), 6) AS p90_price,
      |  count(*) AS n
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  private val q8 =
    """SELECT DISTINCT nationkey FROM (
      |  SELECT c_nationkey AS nationkey FROM customer
      |  UNION ALL
      |  SELECT s_nationkey AS nationkey FROM supplier) t
      |ORDER BY nationkey""".stripMargin

  private val q9 =
    """SELECT event_type,
      |  strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
      |  count(*) AS n_events,
      |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
      |  max(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS max_k
      |FROM events
      |GROUP BY event_type, hour
      |ORDER BY event_type, hour""".stripMargin

  private val q10 =
    """SELECT o_orderpriority, count(*) AS order_count
      |FROM orders
      |WHERE EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey
      |                AND l_shipdate >= TIMESTAMP '1998-09-02 00:00:00')
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  private val q43 =
    """SELECT c_mktsegment,
      |  count(*) AS n_customers,
      |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
      |FROM customer
      |WHERE NOT EXISTS (
      |  SELECT 1 FROM orders
      |  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment""".stripMargin

  private val q11 = {
    val sep = s"round(${angSepSql("ra", "dec", "cra", "cdec")}, 6)"
    s"""WITH ev AS (
       |  SELECT event_id,
       |    ((event_id * 7919) % 3600) / 10.0 AS ra,
       |    ((event_id * 104729) % 1200) / 10.0 - 60.0 AS dec
       |  FROM events),
       |cat AS (
       |  SELECT n_nationkey AS cat_id,
       |    (((n_nationkey + 1) * 7919) % 3600) / 10.0 AS cra,
       |    (((n_nationkey + 1) * 104729) % 1200) / 10.0 - 60.0 AS cdec
       |  FROM nation),
       |m AS (SELECT event_id, $sep AS sep FROM ev, cat)
       |SELECT event_id, count(*) AS n_matches, min(sep) AS min_sep_deg
       |FROM m WHERE sep < 15.0
       |GROUP BY event_id ORDER BY event_id""".stripMargin
  }

  private val q12 =
    """WITH t AS (
      |  SELECT o_totalprice,
      |    CASE WHEN o_totalprice > 400000.0 THEN 1 ELSE 0 END AS fbig,
      |    CASE WHEN o_orderpriority <= '2-HIGH' THEN 1 ELSE 0 END AS furgent,
      |    CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS fdone
      |  FROM orders),
      |c AS (
      |  SELECT o_totalprice,
      |    CASE WHEN fbig + furgent + fdone >= 2 THEN 'Ambiguous'
      |         WHEN fbig = 1 THEN 'BigTicket'
      |         WHEN furgent = 1 THEN 'Urgent'
      |         WHEN fdone = 1 THEN 'Finished'
      |         ELSE 'Unknown' END AS class
      |  FROM t)
      |SELECT class, count(*) AS n,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
      |FROM c GROUP BY class ORDER BY class""".stripMargin

  private val q13 = {
    val head8 = sumL((1 to 8).map(j => s"CAST(embedding[$j] AS DOUBLE)"))
    val tail3 = (62 to 64).map(j => s"CAST(embedding[$j] AS DOUBLE) > -1.0")
      .mkString("(", " AND ", ")")
    s"""SELECT vec_id,
       |  round(CAST(embedding[64] AS DOUBLE), 6) AS last_val,
       |  CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_pos,
       |  CAST($tail3 AS INTEGER) AS tail3_gt_m1,
       |  round($head8, 6) AS head8_sum
       |FROM embeddings ORDER BY vec_id""".stripMargin
  }

  private val q14 =
    """WITH ev AS (
      |  SELECT event_id, user_id, value FROM events
      |  WHERE value IS NOT NULL AND event_type <> 'view'),
      |m AS (SELECT quantile_cont(value, 0.5) AS med FROM ev),
      |f AS (
      |  SELECT event_id, user_id, value,
      |    row_number() OVER (PARTITION BY user_id
      |                       ORDER BY value DESC, event_id) AS rn
      |  FROM ev, m WHERE value > med)
      |SELECT event_id, user_id, round(value, 6) AS value
      |FROM f WHERE rn = 1
      |ORDER BY value DESC, event_id LIMIT 10""".stripMargin

  private val q15 =
    """WITH t AS (
      |  SELECT doc_id, length(text) AS nc,
      |    length(text) - length(replace(text, ' ', '')) + 1 AS nt,
      |    len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS nb,
      |    length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS np,
      |    length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS nd
      |  FROM documents)
      |SELECT doc_id,
      |  CAST(nc AS BIGINT) AS n_chars,
      |  CAST(nt AS BIGINT) AS n_tokens,
      |  CAST(nb AS BIGINT) AS n_bpe_tokens,
      |  round(CAST(nc - (nt - 1) AS DOUBLE) / nt, 6) AS mean_word_len,
      |  round(CAST(np AS DOUBLE) / nc, 6) AS punct_ratio,
      |  round(CAST(nd AS DOUBLE) / nc, 6) AS digit_ratio
      |FROM t ORDER BY doc_id""".stripMargin

  private val q16 =
    """SELECT lang, source, count(*) AS n_docs,
      |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
      |  CAST(sum(length(text) - length(replace(text, ' ', '')) + 1) AS BIGINT) AS total_tokens
      |FROM documents GROUP BY lang, source ORDER BY lang, source""".stripMargin

  /** Stopword-hit count of `words` on the doubled-space copy `dbl`. */
  private def hitsSql(dbl: String, words: Seq[String]): String =
    sumL(words.map { w =>
      val tok = s" $w "
      s"CAST((length($dbl) - length(replace($dbl, '$tok', ''))) / ${tok.length} AS BIGINT)"
    })

  private val q17 = {
    // mirror TextOps.langId: per-language stopword hit sums, then the
    // left-fold argmax (earlier language wins ties), 'und' when all zero
    val langs = TextOps.LangStopwords
    val scoreCols = langs.map { case (code, ws) =>
      s"${hitsSql("dbl", ws)} AS s_$code"
    }.mkString(",\n    ")
    val (c0, _) = langs.head
    val fold = langs.tail.zipWithIndex.map { case ((code, _), i) =>
      val prevS = if (i == 0) s"s_$c0" else s"sc$i"
      val prevL = if (i == 0) s"'$c0'" else s"l$i"
      s"""b${i + 1} AS (SELECT *,
         |  CASE WHEN s_$code > $prevS THEN s_$code ELSE $prevS END AS sc${i + 1},
         |  CASE WHEN s_$code > $prevS THEN '$code' ELSE $prevL END AS l${i + 1}
         |  FROM ${if (i == 0) "s" else s"b$i"})""".stripMargin
    }.mkString(",\n")
    val n = langs.size - 1
    s"""WITH d AS (
       |  SELECT doc_id,
       |    replace(concat(' ', lower(text), ' '), ' ', '  ') AS dbl
       |  FROM documents),
       |s AS (
       |  SELECT doc_id,
       |    $scoreCols
       |  FROM d),
       |$fold
       |SELECT CASE WHEN sc$n > 0 THEN l$n ELSE 'und' END AS pred_lang,
       |  count(*) AS n_docs
       |FROM b$n GROUP BY pred_lang ORDER BY pred_lang""".stripMargin
  }

  private val q18 =
    s"""SELECT vec_id, label,
       |  round(${normSql("embedding", 64)}, 6) AS l2_norm,
       |  round(${sumL((1 to 64).map(j => s"CAST(embedding[$j] AS DOUBLE)"))} / len(embedding), 6) AS mean_val
       |FROM embeddings ORDER BY vec_id""".stripMargin

  /** q47 — int8 quantization mirror: same absmax/127 scale, same
    * floor(x/s + 0.5) round-to-nearest, error terms summed in index
    * order.
    */
  private val q47 = {
    val absmax = (1 to 64).map(j =>
      s"abs(CAST(embedding[$j] AS DOUBLE))").mkString("greatest(", ", ", ")")
    def q(j: Int) = s"floor(CAST(embedding[$j] AS DOUBLE) / scale + 0.5)"
    val errSum = sumL((1 to 64).map(j =>
      s"abs(CAST(embedding[$j] AS DOUBLE) - ${q(j)} * scale)"))
    val nSat = (1 to 64).map(j =>
      s"CASE WHEN abs(${q(j)}) >= 127.0 THEN 1 ELSE 0 END").mkString(" + ")
    s"""WITH s AS (
       |  SELECT vec_id, embedding, $absmax / 127.0 AS scale
       |  FROM embeddings)
       |SELECT vec_id, round(scale, 6) AS scale6,
       |  CASE WHEN scale = 0 THEN 0.0
       |       ELSE round(($errSum) / 64, 6) END AS mean_abs_err,
       |  CASE WHEN scale = 0 THEN 0 ELSE $nSat END AS n_sat
       |FROM s ORDER BY vec_id""".stripMargin
  }

  private val q19 =
    s"""WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
       |SELECT vec_id,
       |  round(${cosineSql("embedding", "qe", 64)}, 6) AS cos_sim
       |FROM embeddings, q WHERE vec_id <> 0
       |ORDER BY cos_sim DESC, vec_id LIMIT 10""".stripMargin

  private val q20 = {
    val sums = (0 until 64).map(j =>
      s"sum(CAST(embedding[${j + 1}] AS DECIMAL(28,10))) AS s$j").mkString(",\n    ")
    val norm = sumL((0 until 64).map(j =>
      s"(CAST(s$j AS DOUBLE) / n) * (CAST(s$j AS DOUBLE) / n)"))
    s"""WITH g AS (
       |  SELECT label, count(*) AS n,
       |    $sums
       |  FROM embeddings GROUP BY label)
       |SELECT label, n, round(sqrt($norm), 6) AS centroid_norm
       |FROM g ORDER BY label""".stripMargin
  }

  private val q21 = {
    // inline the SAME hyperplane constants Similarity.lshKey uses
    val bucket = sumL((0 until 8).map { p =>
      val plane = Similarity.hyperplane(p, 64)
      val proj = sumL((0 until 64).map(j =>
        s"CAST(embedding[${j + 1}] AS DOUBLE) * ${plane(j)}"))
      s"CASE WHEN $proj >= 0 THEN ${1 << p} ELSE 0 END"
    })
    s"""WITH e AS (
       |  SELECT vec_id, embedding, $bucket AS bucket FROM embeddings)
       |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       |  round(${cosineSql("a.embedding", "b.embedding", 64)}, 6) AS cos_sim
       |FROM e a JOIN e b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
       |WHERE round(${cosineSql("a.embedding", "b.embedding", 64)}, 6) >= 0.2
       |ORDER BY id_a, id_b""".stripMargin
  }

  private val q22 =
    """SELECT min(doc_id) AS canonical_doc_id, count(*) AS n_copies
      |FROM documents
      |GROUP BY regexp_replace(lower(text), '\s+', ' ', 'g')
      |ORDER BY canonical_doc_id""".stripMargin

  /** The q23 MinHash-LSH near-dup pair pipeline as a reusable CTE block
    * ending in `pairs(doc_a, doc_b, jaccard)` — shared by q23 (pair
    * report) and q33 (connected components over the same pairs).
    *
    * Mirror of graft.expressions.MinHashSignature: h = the 48-bit value
    * of the first 12 md5 hex chars (digit fold — max 15·16^11 < 2^48,
    * exact in BIGINT), permutation i = (aᵢ·(h mod M) + bᵢ) mod M with
    * the SAME seeded affine coefficients the Scala kernel uses.
    */
  private val minhashPairsCtes: String = {
    val jac = jaccardSql("sa.sh", "sb.sh")
    val m = graft.expressions.MinHashSignature.M
    val digitFold = (1 to 12).map { p =>
      s"(strpos('0123456789abcdef', substr(h, $p, 1)) - 1) * ${1L << (4 * (12 - p))}"
    }.mkString("(", " + ", ")")
    val sigEntries = (0 until 16).map { i =>
      val a = graft.expressions.MinHashSignature.affineA(i)
      val b = graft.expressions.MinHashSignature.affineB(i)
      s"CAST(list_aggregate(list_transform(hm, x -> ($a * x + $b) % $m), 'min') AS VARCHAR)"
    }.mkString("[", ",\n      ", "]")
    s"""${shinglesCte()},
       |hm0 AS (
       |  SELECT doc_id, sh,
       |    list_transform(list_transform(sh, s -> substr(md5(s), 1, 12)),
       |      h -> $digitFold % $m) AS hm
       |  FROM sh0),
       |sig AS (
       |  SELECT doc_id, sh,
       |    $sigEntries AS sig
       |  FROM hm0),
       |bands AS (
       |  SELECT doc_id, t.band AS band,
       |    array_to_string(list_slice(sig, t.band * 2 + 1, t.band * 2 + 2), '|') AS bh
       |  FROM sig, range(0, 8) t(band)),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id),
       |pairs AS (
       |  SELECT doc_a, doc_b, $jac AS jaccard
       |  FROM cand
       |  JOIN sh0 sa ON doc_a = sa.doc_id
       |  JOIN sh0 sb ON doc_b = sb.doc_id
       |  WHERE $jac >= 0.3)""".stripMargin
  }

  private val q23 =
    s"""WITH $minhashPairsCtes
       |SELECT doc_a, doc_b, jaccard FROM pairs
       |ORDER BY doc_a, doc_b""".stripMargin

  /** q33 — transitive closure over the q23 pairs via a recursive CTE;
    * component representative = min reachable vertex (incl. self).
    * The UNION (set) semantics of the recursive member guarantee
    * termination.
    */
  private val q33 =
    s"""WITH RECURSIVE $minhashPairsCtes,
       |edges AS (
       |  SELECT doc_a AS u, doc_b AS v FROM pairs
       |  UNION ALL SELECT doc_b, doc_a FROM pairs),
       |reach(u, v) AS (
       |  SELECT u, v FROM edges
       |  UNION
       |  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
       |    WHERE e.v <> r.u),
       |lab AS (
       |  SELECT u AS doc_id, least(u, min(v)) AS cluster_rep
       |  FROM reach GROUP BY u),
       |sz AS (
       |  SELECT cluster_rep, count(*) AS cluster_size
       |  FROM lab GROUP BY cluster_rep)
       |SELECT doc_id, cluster_rep, cluster_size
       |FROM lab JOIN sz USING (cluster_rep)
       |ORDER BY doc_id""".stripMargin

  private val q24 = {
    // mirror of graft.expressions.SimHash64: h(t) = first 8 md5 bytes as
    // a big-endian u64, recovered here digit-by-digit from the md5 hex
    // string — bit j lives in hex char 16 − j/4 at in-digit position j%4.
    // Bit 63 of the assembled signed long is the sign bit: DuckDB's <<
    // throws on 1::BIGINT << 63, so it is added as the min-long literal
    // (the bit positions are disjoint, so + equals OR).
    def digit(p: Int) = s"(strpos('0123456789abcdef', substr(h, $p, 1)) - 1)"
    val cnts = (0 until 64).map { j =>
      s"list_sum(list_transform(hs, h -> ((${digit(16 - j / 4)} >> ${j % 4}) & 1))) AS c$j"
    }.mkString(",\n    ")
    val bits = ((0 until 63).map { j =>
      s"CASE WHEN 2*c$j > n THEN (1::BIGINT << $j) ELSE 0 END"
    } :+ "CASE WHEN 2*c63 > n THEN -9223372036854775808 ELSE 0 END")
      .mkString("(", "\n    + ", ")")
    val hamming = "CAST(bit_count(xor(a.sh, b.sh)) AS INTEGER)"
    s"""WITH toks0 AS (
       |  SELECT doc_id,
       |    string_split(regexp_replace(lower(text), '\\s+', ' ', 'g'), ' ') AS toks
       |  FROM documents),
       |h0 AS (
       |  SELECT doc_id, list_transform(toks, t -> md5(t)) AS hs, len(toks) AS n
       |  FROM toks0),
       |c0 AS (
       |  SELECT doc_id, n,
       |    $cnts
       |  FROM h0),
       |s0 AS (SELECT doc_id, $bits AS sh FROM c0),
       |chunks AS (
       |  SELECT doc_id, sh, t.chunk AS chunk,
       |    (sh >> (t.chunk * 16)) & 65535 AS ck
       |  FROM s0, range(0, 4) t(chunk))
       |SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |  $hamming AS hamming
       |FROM chunks a JOIN chunks b
       |  ON a.chunk = b.chunk AND a.ck = b.ck AND a.doc_id < b.doc_id
       |WHERE $hamming <= 8
       |ORDER BY doc_a, doc_b""".stripMargin
  }

  private val q25 = {
    val jac = jaccardSql("a.sh", "b.sh")
    s"""WITH ${shinglesCte(", source")}
       |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, $jac AS jaccard
       |FROM sh0 a JOIN sh0 b
       |  ON a.source = b.source AND a.doc_id < b.doc_id
       |WHERE $jac >= 0.2
       |ORDER BY doc_a, doc_b""".stripMargin
  }

  private val q27 = {
    val cosQ = cosineSql("embedding", "qe", 64)
    val cosSeed = cosineSql("embedding", "semb", 64)
    val cosQSeed = cosineSql("qe", "semb", 64)
    s"""WITH e AS (SELECT vec_id, embedding FROM embeddings),
       |seeds AS (
       |  SELECT vec_id AS seed_id, embedding AS semb FROM e
       |  WHERE vec_id % 97 = 0),
       |assign AS (
       |  SELECT vec_id, embedding, seed_id FROM (
       |    SELECT e.vec_id, e.embedding, seeds.seed_id,
       |      row_number() OVER (PARTITION BY e.vec_id
       |        ORDER BY round($cosSeed, 6) DESC, seed_id) AS rk
       |    FROM e, seeds) t WHERE rk = 1),
       |qv AS (SELECT embedding AS qe FROM e WHERE vec_id = 0),
       |qseeds AS (
       |  SELECT seed_id FROM seeds, qv
       |  ORDER BY round($cosQSeed, 6) DESC, seed_id LIMIT 2)
       |SELECT vec_id, round($cosQ, 6) AS cos_sim
       |FROM assign JOIN qseeds USING (seed_id), qv
       |WHERE vec_id <> 0
       |ORDER BY cos_sim DESC, vec_id LIMIT 10""".stripMargin
  }

  private val q28 = {
    // same deterministic hyperplanes as Dedup.qDedupEmbedding: table t
    // uses planes 16+4t .. 16+4t+3, bit p worth 1<<p within the table
    def bucketSql(t: Int): String = sumL((0 until 4).map { p =>
      val plane = Similarity.hyperplane(16 + 4 * t + p, 64)
      val proj = sumL((0 until 64).map(j =>
        s"CAST(embedding[${j + 1}] AS DOUBLE) * ${plane(j)}"))
      s"CASE WHEN $proj >= 0 THEN ${1 << p} ELSE 0 END"
    })
    val cos = cosineSql("ea.embedding", "eb.embedding", 64)
    s"""WITH e AS (SELECT vec_id, embedding FROM embeddings),
       |k AS (
       |  SELECT vec_id,
       |    ${(0 until 4).map(t => s"${bucketSql(t)} AS b$t").mkString(",\n    ")}
       |  FROM e),
       |tb AS (
       |  SELECT vec_id, t.tbl AS tbl,
       |    CASE t.tbl WHEN 0 THEN b0 WHEN 1 THEN b1 WHEN 2 THEN b2 ELSE b3 END AS bucket
       |  FROM k, range(0, 4) t(tbl)),
       |cand AS (
       |  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
       |  FROM tb a JOIN tb b
       |    ON a.tbl = b.tbl AND a.bucket = b.bucket AND a.vec_id < b.vec_id),
       |v AS (
       |  SELECT id_a, id_b, round($cos, 6) AS cos_sim
       |  FROM cand
       |  JOIN e ea ON id_a = ea.vec_id
       |  JOIN e eb ON id_b = eb.vec_id)
       |SELECT id_b AS vec_id, min(id_a) AS canonical_id, count(*) AS n_dups
       |FROM v WHERE cos_sim >= 0.3
       |GROUP BY id_b ORDER BY vec_id""".stripMargin
  }

  private val q29 =
    s"""WITH ${shinglesCte()},
       |h AS (
       |  SELECT doc_id, list_transform(sh, s -> substr(md5(s), 1, 16)) AS hsh
       |  FROM sh0),
       |fp0 AS (
       |  SELECT doc_id,
       |    list_distinct(CASE WHEN len(hsh) - 3 > 0
       |      THEN list_transform(range(0, len(hsh) - 3),
       |             i -> list_aggregate(list_slice(hsh, i + 1, i + 4), 'min'))
       |      ELSE [list_aggregate(hsh, 'min')] END) AS fp
       |  FROM h),
       |ex AS (SELECT doc_id, unnest(fp) AS f FROM fp0)
       |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_shared
       |FROM ex a JOIN ex b ON a.f = b.f AND a.doc_id < b.doc_id
       |GROUP BY a.doc_id, b.doc_id
       |HAVING count(*) >= 2
       |ORDER BY doc_a, doc_b""".stripMargin

  // DuckDB substring() does not accept BLOB: head_hex goes through the
  // (ASCII) string form, and tail_len uses the clamp identity
  // octet_length(substring(b, -16, 16)) == least(octet_length(b), 16).
  // The char-vs-byte equivalence holds only for ASCII text —
  // tools/prevalidate.py asserts documents.text is pure ASCII so any
  // future multi-byte character fails the gate loudly, not silently.
  private val q26 =
    """SELECT doc_id,
      |  octet_length(CAST(text AS BLOB)) AS n_bytes,
      |  hex(substring(text, 1, 8)) AS head_hex,
      |  least(octet_length(CAST(text AS BLOB)), 16) AS tail_len
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Whitespace token count, the q15/q16 length-delta formulation. */
  private val tokSql =
    "CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT)"

  /** Deterministic split from the first md5 hex digit of the id —
    * mirrors [[graft.llmops.Curation.splitLabel]] exactly (md5 of the
    * decimal string form of doc_id in both engines).
    */
  private val splitSql =
    """CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('c', 'd')
      |  THEN 'val'
      |  WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('e', 'f')
      |  THEN 'test' ELSE 'train' END""".stripMargin

  private val q30 =
    s"""SELECT lang, source, doc_id, n_tokens, rk FROM (
       |  SELECT lang, source, doc_id, $tokSql AS n_tokens,
       |    row_number() OVER (PARTITION BY lang, source
       |      ORDER BY $tokSql DESC, doc_id) AS rk
       |  FROM documents) t
       |WHERE rk <= 5
       |ORDER BY lang, source, rk""".stripMargin

  private val q31 =
    s"""WITH lab AS (
       |  SELECT $splitSql AS split, doc_id, $tokSql AS n_tokens
       |  FROM documents)
       |SELECT split, count(*) AS n_docs,
       |  CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       |  min(doc_id) AS min_doc_id, max(doc_id) AS max_doc_id
       |FROM lab GROUP BY split ORDER BY split""".stripMargin

  private val q32 =
    s"""WITH ${shinglesCte()},
       |lab AS (
       |  SELECT doc_id, $splitSql AS split, list_distinct(sh) AS s
       |  FROM sh0 JOIN documents USING (doc_id)),
       |pairs AS (
       |  SELECT ev.doc_id AS eval_doc_id, tr.doc_id AS train_doc_id,
       |    len(list_filter(ev.s, x -> list_contains(tr.s, x))) AS n_common
       |  FROM lab ev, lab tr
       |  WHERE ev.split = 'val' AND tr.split = 'train')
       |SELECT eval_doc_id, count(*) AS n_train_matches,
       |  max(n_common) AS max_overlap
       |FROM pairs WHERE n_common >= 5
       |GROUP BY eval_doc_id ORDER BY eval_doc_id""".stripMargin

  /** q34 — mirror of TextOps.qQualityFilter: identical stat formulas
    * (same integer-subtraction-then-double-division order) and the same
    * ordered CASE, generated from the same stopword constants.
    */
  private val q34 = {
    val en = TextOps.LangStopwords.toMap.apply("en")
    s"""WITH t AS (
       |  SELECT doc_id,
       |    CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT) AS nt,
       |    length(text) AS nc,
       |    length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS nd,
       |    replace(concat(' ', lower(text), ' '), ' ', '  ') AS dbl
       |  FROM documents),
       |s AS (
       |  SELECT doc_id, nt,
       |    CAST(nc - (nt - 1) AS DOUBLE) / nt AS mwl,
       |    CAST(nd AS DOUBLE) / nc AS dr,
       |    ${hitsSql("dbl", en)} AS sw
       |  FROM t),
       |r AS (
       |  SELECT doc_id, nt,
       |    CASE WHEN nt < 20 THEN 'too_short'
       |         WHEN nt > 90 THEN 'too_long'
       |         WHEN mwl < 4.0 OR mwl > 5.0 THEN 'word_shape'
       |         WHEN dr > 0.2 THEN 'digit_heavy'
       |         WHEN sw = 0 THEN 'no_stopword'
       |         ELSE 'ok' END AS reason
       |  FROM s)
       |SELECT doc_id, nt AS n_tokens,
       |  CAST(reason = 'ok' AS INTEGER) AS keep, reason
       |FROM r ORDER BY doc_id""".stripMargin
  }

  /** q35 — the same union-window as-of formulation as the Spark side
    * (NOT DuckDB's ASOF JOIN: the window form pins the tie semantics —
    * order key (ts, event_id) — identically in both engines).
    */
  private val q35 =
    """WITH ev AS (
      |  SELECT event_id, user_id, ts, event_type FROM events
      |  WHERE ts IS NOT NULL AND event_type IN ('click', 'purchase')),
      |w AS (
      |  SELECT event_id, user_id, ts, event_type,
      |    last_value(CASE WHEN event_type = 'click'
      |        THEN struct_pack(cts := ts, cid := event_id) END IGNORE NULLS)
      |      OVER (PARTITION BY user_id ORDER BY ts, event_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS lc
      |  FROM ev)
      |SELECT event_id AS purchase_id, user_id, lc.cid AS click_id,
      |  round((epoch_us(ts) - epoch_us(lc.cts)) / 1000000.0, 6) AS gap_s
      |FROM w WHERE event_type = 'purchase' AND lc IS NOT NULL
      |ORDER BY purchase_id""".stripMargin

  /** q49 — containment pairs over the snippet-augmented corpus: same
    * 3-shingle construction as q25, C = |A∩B| / min(|A|,|B|), emitted
    * when containment ≥ 0.5 but Jaccard < 0.5 (the asymmetric-subset
    * regime). Tie rule: equal sizes keep doc_a as the small side.
    */
  private val q49 =
    """WITH corpus AS (
      |  SELECT source, doc_id, text FROM documents
      |  UNION ALL
      |  SELECT source, doc_id + 5000, substring(text, 1, 120)
      |  FROM documents WHERE doc_id < 50),
      |toks0 AS (
      |  SELECT source, doc_id,
      |    string_split(regexp_replace(lower(text), '\s+', ' ', 'g'), ' ') AS toks
      |  FROM corpus),
      |sh0 AS (
      |  SELECT source, doc_id,
      |    list_distinct(CASE WHEN len(toks) >= 3
      |      THEN [list_aggregate(toks[i:i+2], 'string_agg', ' ')
      |            FOR i IN range(1, len(toks) - 1)]
      |      ELSE [list_aggregate(toks, 'string_agg', ' ')] END) AS sh
      |  FROM toks0),
      |ex AS (SELECT source, doc_id, unnest(sh) AS s FROM sh0),
      |sizes AS (SELECT doc_id, len(sh) AS n FROM sh0),
      |pairs AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
      |  FROM ex a JOIN ex b
      |    ON a.source = b.source AND a.s = b.s AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2),
      |ws AS (
      |  SELECT doc_a, doc_b, inter, sa.n AS na, sb.n AS nb
      |  FROM pairs
      |  JOIN sizes sa ON doc_a = sa.doc_id
      |  JOIN sizes sb ON doc_b = sb.doc_id)
      |SELECT
      |  CASE WHEN na <= nb THEN doc_a ELSE doc_b END AS small_doc,
      |  CASE WHEN na <= nb THEN doc_b ELSE doc_a END AS big_doc,
      |  round(CAST(inter AS DOUBLE) / least(na, nb), 6) AS containment
      |FROM ws
      |WHERE CAST(inter AS DOUBLE) / least(na, nb) >= 0.5
      |  AND CAST(inter AS DOUBLE) / (na + nb - inter) < 0.5
      |ORDER BY small_doc, big_doc""".stripMargin

  /** q50 — event-type transition matrix via the same lead window. */
  private val q50 =
    """WITH t AS (
      |  SELECT event_type,
      |    lead(event_type) OVER (PARTITION BY user_id
      |                           ORDER BY ts, event_id) AS next_type
      |  FROM events WHERE ts IS NOT NULL)
      |SELECT event_type AS from_type, next_type AS to_type,
      |  count(*) AS n
      |FROM t WHERE next_type IS NOT NULL
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** q48 — session funnel: same lag-flag session labeling as q38, then
    * struct min/max per session (lexicographic (ts, event_id) — the
    * same composite order key both engines use) and the per-user
    * rollup.
    */
  private val q48 =
    """WITH s AS (
      |  SELECT event_id, user_id, ts, event_type,
      |    sum(CASE WHEN prev_ts IS NULL
      |          OR epoch_us(ts) - epoch_us(prev_ts) > 21600000000
      |        THEN 1 ELSE 0 END)
      |      OVER (PARTITION BY user_id ORDER BY ts, event_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |      AS session_id
      |  FROM (SELECT *, lag(ts) OVER (PARTITION BY user_id
      |                                ORDER BY ts, event_id) AS prev_ts
      |        FROM events WHERE ts IS NOT NULL)),
      |agg AS (
      |  SELECT user_id, session_id,
      |    min(CASE WHEN event_type = 'click'
      |        THEN struct_pack(ts := ts, event_id := event_id) END) AS fc,
      |    max(CASE WHEN event_type = 'purchase'
      |        THEN struct_pack(ts := ts, event_id := event_id) END) AS lp
      |  FROM s GROUP BY 1, 2)
      |SELECT user_id, count(*) AS n_sessions,
      |  count(fc) AS n_click_sessions,
      |  count(CASE WHEN fc IS NOT NULL AND lp IS NOT NULL
      |    AND (lp.ts > fc.ts OR (lp.ts = fc.ts AND lp.event_id > fc.event_id))
      |    THEN 1 END) AS n_converted
      |FROM agg GROUP BY user_id ORDER BY user_id""".stripMargin

  /** q44 — the bounded interval join, phrased directly as the
    * inequality join (DuckDB plans this fine at oracle scale; the Spark
    * side uses the bucket equi-join + refine shape).
    */
  private val q44 =
    """SELECT p.event_id AS purchase_id, c.event_id AS click_id,
      |  p.user_id,
      |  round((epoch_us(p.ts) - epoch_us(c.ts)) / 1000000.0, 6) AS gap_s
      |FROM events p JOIN events c
      |  ON p.user_id = c.user_id
      | AND p.event_type = 'purchase' AND c.event_type = 'click'
      | AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts <= p.ts
      |ORDER BY purchase_id, click_id""".stripMargin

  /** q46 — incremental ingest dedup: anti-join on the normalized text
    * (the fingerprint preimage — same groups as Spark's xxhash64 of it,
    * the q22 equivalence), then min-id per content within the batch.
    */
  private val q46 =
    """WITH landed AS (
      |  SELECT DISTINCT regexp_replace(lower(text), '\s+', ' ', 'g') AS nt
      |  FROM documents WHERE doc_id < 400),
      |batch AS (
      |  SELECT doc_id + 1000 AS doc_id, upper(text) AS text,
      |    lang, source, n_chars
      |  FROM documents WHERE doc_id < 100
      |  UNION ALL
      |  SELECT doc_id, text, lang, source, n_chars
      |  FROM documents WHERE doc_id >= 400
      |  UNION ALL
      |  SELECT doc_id + 3000, replace(text, ' ', '  '),
      |    lang, source, n_chars
      |  FROM documents WHERE doc_id >= 400),
      |fresh AS (
      |  SELECT doc_id, lang, source, n_chars,
      |    regexp_replace(lower(text), '\s+', ' ', 'g') AS nt
      |  FROM batch
      |  WHERE regexp_replace(lower(text), '\s+', ' ', 'g') NOT IN
      |    (SELECT nt FROM landed)),
      |kept AS (
      |  SELECT doc_id, lang, source, n_chars,
      |    row_number() OVER (PARTITION BY nt ORDER BY doc_id) AS rn
      |  FROM fresh)
      |SELECT doc_id, lang, source, n_chars FROM kept WHERE rn = 1
      |ORDER BY doc_id""".stripMargin

  /** q36 — bigram repetition: same positional 2-shingle construction as
    * the WordShingles kernel (degenerate one-token doc → one "bigram" of
    * the whole text).
    */
  private val q36 =
    """WITH toks0 AS (
      |  SELECT doc_id,
      |    string_split(regexp_replace(lower(text), '\s+', ' ', 'g'), ' ') AS toks
      |  FROM documents),
      |bg0 AS (
      |  SELECT doc_id,
      |    CASE WHEN len(toks) - 1 > 0
      |      THEN list_transform(range(0, len(toks) - 1),
      |             i -> array_to_string(list_slice(toks, i + 1, i + 2), ' '))
      |      ELSE [array_to_string(toks, ' ')] END AS bg
      |  FROM toks0),
      |ex AS (SELECT doc_id, unnest(bg) AS b FROM bg0),
      |c AS (SELECT doc_id, b, count(*) AS c FROM ex GROUP BY doc_id, b)
      |SELECT doc_id,
      |  CAST(sum(c) AS BIGINT) AS n_bigrams,
      |  CAST(max(c) AS BIGINT) AS top_count,
      |  round(CAST(max(c) AS DOUBLE) / CAST(sum(c) AS BIGINT), 6) AS rep_ratio
      |FROM c GROUP BY doc_id ORDER BY doc_id""".stripMargin

  private val q37 =
    """WITH toks0 AS (
      |  SELECT doc_id,
      |    string_split(regexp_replace(lower(text), '\s+', ' ', 'g'), ' ') AS toks
      |  FROM documents),
      |ex AS (SELECT doc_id, unnest(toks) AS term FROM toks0)
      |SELECT term, count(*) AS tf, count(DISTINCT doc_id) AS df
      |FROM ex GROUP BY term
      |ORDER BY df DESC, tf DESC, term LIMIT 20""".stripMargin

  private val q38 =
    """WITH s AS (
      |  SELECT event_id, user_id, ts, value,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |           OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 21600000000
      |         THEN 1 ELSE 0 END AS ns
      |  FROM events WHERE ts IS NOT NULL
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |r AS (
      |  SELECT user_id, ts, value,
      |    CAST(sum(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS session_id
      |  FROM s)
      |SELECT user_id, session_id, count(*) AS n_events,
      |  strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS start_s,
      |  round((epoch_us(max(ts)) - epoch_us(min(ts))) / 1000000.0, 6) AS duration_s,
      |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM r GROUP BY user_id, session_id
      |ORDER BY user_id, session_id""".stripMargin

  private val q39 =
    s"""SELECT coalesce(lang, 'ALL') AS lang,
       |  coalesce(source, 'ALL') AS source,
       |  count(*) AS n_docs,
       |  CAST(sum($tokSql) AS BIGINT) AS total_tokens
       |FROM documents
       |GROUP BY ROLLUP(lang, source)
       |ORDER BY lang, source""".stripMargin

  private val q40 = {
    val cols = Seq("click", "error", "purchase", "signup", "view")
      .map(t => s"count(*) FILTER (event_type = '$t') AS $t")
      .mkString(",\n  ")
    s"""SELECT user_id,
       |  $cols
       |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin
  }

  /** q41 — mirror of TextOps.qTfidfPairs: same 6-decimal idf rounding,
    * same DECIMAL(18,6) weight quantization, exact decimal norm/dot
    * sums, doubles only at the final division.
    */
  private val q41 =
    """WITH toks0 AS (
      |  SELECT lang, source, doc_id,
      |    string_split(regexp_replace(lower(text), '\s+', ' ', 'g'), ' ') AS toks
      |  FROM documents),
      |tf AS (
      |  SELECT lang, source, doc_id, t.term AS term, count(*) AS tf
      |  FROM toks0, unnest(toks) t(term)
      |  GROUP BY lang, source, doc_id, t.term),
      |tot AS (SELECT count(*) AS n_total FROM documents),
      |idf AS (
      |  SELECT term, round(ln(CAST(n_total AS DOUBLE) / df_t), 6) AS idf
      |  FROM (SELECT term, count(DISTINCT doc_id) AS df_t FROM tf GROUP BY term), tot),
      |wts AS (
      |  SELECT lang, source, doc_id, term,
      |    CAST(round(tf * idf, 6) AS DECIMAL(18,6)) AS w
      |  FROM tf JOIN idf USING (term)),
      |nrm AS (
      |  SELECT doc_id, sqrt(CAST(sum(w * w) AS DOUBLE)) AS nrm
      |  FROM wts GROUP BY doc_id),
      |dots AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |    CAST(sum(a.w * b.w) AS DOUBLE) AS dot
      |  FROM wts a JOIN wts b
      |    ON a.lang = b.lang AND a.source = b.source AND a.term = b.term
      |    AND a.doc_id < b.doc_id
      |  GROUP BY a.doc_id, b.doc_id)
      |SELECT doc_a, doc_b,
      |  round(dot / (na.nrm * nb.nrm), 6) AS cos_sim
      |FROM dots
      |JOIN nrm na ON doc_a = na.doc_id
      |JOIN nrm nb ON doc_b = nb.doc_id
      |ORDER BY cos_sim DESC, doc_a, doc_b LIMIT 20""".stripMargin

  /** q45 — top-3 TF-IDF keywords per doc: same weight CTEs as q41, one
    * rank window ordered (w DESC, term).
    */
  private val q45 =
    """WITH toks0 AS (
      |  SELECT lang, source, doc_id,
      |    string_split(regexp_replace(lower(text), '\s+', ' ', 'g'), ' ') AS toks
      |  FROM documents),
      |tf AS (
      |  SELECT lang, source, doc_id, t.term AS term, count(*) AS tf
      |  FROM toks0, unnest(toks) t(term)
      |  GROUP BY lang, source, doc_id, t.term),
      |tot AS (SELECT count(*) AS n_total FROM documents),
      |idf AS (
      |  SELECT term, round(ln(CAST(n_total AS DOUBLE) / df_t), 6) AS idf
      |  FROM (SELECT term, count(DISTINCT doc_id) AS df_t FROM tf GROUP BY term), tot),
      |wts AS (
      |  SELECT doc_id, term,
      |    CAST(round(tf * idf, 6) AS DECIMAL(18,6)) AS w
      |  FROM tf JOIN idf USING (term)),
      |ranked AS (
      |  SELECT doc_id, term, w,
      |    row_number() OVER (PARTITION BY doc_id ORDER BY w DESC, term)
      |      AS rank
      |  FROM wts)
      |SELECT doc_id, rank, term, CAST(w AS DOUBLE) AS weight
      |FROM ranked WHERE rank <= 3
      |ORDER BY doc_id, rank""".stripMargin

  private val q42 =
    """WITH daily AS (
      |  SELECT CAST(ts AS DATE) AS d, event_type,
      |    sum(CAST(value AS DECIMAL(18,2))) AS day_sum_d,
      |    count(*) AS n_events
      |  FROM events WHERE ts IS NOT NULL GROUP BY 1, 2),
      |w AS (
      |  SELECT event_type, d, day_sum_d, n_events,
      |    sum(day_sum_d) OVER win AS ma3_sum,
      |    count(*) OVER win AS ma3_days
      |  FROM daily
      |  WINDOW win AS (PARTITION BY event_type
      |    ORDER BY date_diff('day', DATE '2024-01-01', d)
      |    RANGE BETWEEN 2 PRECEDING AND CURRENT ROW))
      |SELECT event_type, strftime(d, '%Y-%m-%d') AS day,
      |  CAST(day_sum_d AS DOUBLE) AS day_sum, n_events,
      |  round(CAST(ma3_sum AS DOUBLE) / ma3_days, 6) AS ma3_avg
      |FROM w ORDER BY event_type, day""".stripMargin

  /** q51 — per-lang Zipf OLS over top-100 terms: decimal-exact moment
    * sums (log10 rounded to 6 decimals first), closed-form slope and
    * intercept in double at the end — the q41 determinism contract.
    */
  private val q51 =
    """WITH toks0 AS (
      |  SELECT lang,
      |    string_split(regexp_replace(lower(text), '\s+', ' ', 'g'), ' ') AS toks
      |  FROM documents),
      |ex AS (SELECT lang, unnest(toks) AS term FROM toks0),
      |tf AS (SELECT lang, term, count(*) AS tf FROM ex GROUP BY 1, 2),
      |ranked AS (
      |  SELECT lang,
      |    CAST(round(log10(rnk), 6) AS DECIMAL(18,6)) AS x,
      |    CAST(round(log10(tf), 6) AS DECIMAL(18,6)) AS y
      |  FROM (SELECT lang, tf,
      |          row_number() OVER (PARTITION BY lang
      |                             ORDER BY tf DESC, term) AS rnk
      |        FROM tf) t
      |  WHERE rnk <= 100),
      |sums AS (
      |  SELECT lang, count(*) AS n_terms,
      |    sum(x) AS sx, sum(y) AS sy,
      |    sum(x * x) AS sxx, sum(x * y) AS sxy
      |  FROM ranked GROUP BY lang)
      |SELECT lang, n_terms,
      |  CASE WHEN CAST(n_terms AS DOUBLE) * CAST(sxx AS DOUBLE)
      |            - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0 THEN
      |    round((CAST(n_terms AS DOUBLE) * CAST(sxy AS DOUBLE)
      |           - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
      |      / (CAST(n_terms AS DOUBLE) * CAST(sxx AS DOUBLE)
      |         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6) END
      |    AS zipf_slope,
      |  CASE WHEN CAST(n_terms AS DOUBLE) * CAST(sxx AS DOUBLE)
      |            - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0 THEN
      |    round((CAST(sy AS DOUBLE) * CAST(sxx AS DOUBLE)
      |           - CAST(sx AS DOUBLE) * CAST(sxy AS DOUBLE))
      |      / (CAST(n_terms AS DOUBLE) * CAST(sxx AS DOUBLE)
      |         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6) END
      |    AS zipf_intercept
      |FROM sums ORDER BY lang""".stripMargin

  /** q52 — weekly retention cohorts (cohort week from the corpus
    * epoch; retention relative to the cohort's week-0 size).
    */
  private val q52 =
    """WITH ev AS (SELECT user_id, CAST(ts AS DATE) AS d FROM events
      |  WHERE ts IS NOT NULL),
      |cohort AS (SELECT user_id, min(d) AS cohort_d FROM ev GROUP BY 1),
      |cells AS (
      |  SELECT DISTINCT user_id,
      |    CAST(floor(date_diff('day', DATE '2024-01-01', cohort_d) / 7.0)
      |      AS BIGINT) AS cohort_week,
      |    CAST(floor(date_diff('day', cohort_d, d) / 7.0)
      |      AS BIGINT) AS week_offset
      |  FROM ev JOIN cohort USING (user_id)),
      |m AS (
      |  SELECT cohort_week, week_offset, count(*) AS n_users
      |  FROM cells GROUP BY 1, 2)
      |SELECT cohort_week, week_offset, n_users,
      |  round(CAST(n_users AS DOUBLE) /
      |    max(CASE WHEN week_offset = 0 THEN n_users END)
      |      OVER (PARTITION BY cohort_week), 6) AS retention
      |FROM m ORDER BY cohort_week, week_offset""".stripMargin

  /** q53 — bigram-LM scoring: the model's nll is quantized to
    * DECIMAL(18,6) so the per-doc tf-weighted sums are exact; the
    * 2-shingle construction mirrors WordShingles(text, 2) exactly
    * (q49's n=3 form with the window shortened to 2).
    */
  private val q53 =
    """WITH toks0 AS (
      |  SELECT doc_id,
      |    string_split(regexp_replace(lower(text), '\s+', ' ', 'g'), ' ') AS toks
      |  FROM documents),
      |bg0 AS (
      |  SELECT doc_id, CASE WHEN len(toks) >= 2
      |    THEN [list_aggregate(toks[i:i+1], 'string_agg', ' ')
      |          FOR i IN range(1, len(toks))]
      |    ELSE [list_aggregate(toks, 'string_agg', ' ')] END AS bgs
      |  FROM toks0),
      |ex AS (SELECT doc_id, unnest(bgs) AS bg FROM bg0),
      |dtf AS (SELECT doc_id, bg, count(*) AS tf FROM ex GROUP BY 1, 2),
      |c12 AS (SELECT bg, sum(tf) AS c12 FROM dtf GROUP BY 1),
      |model AS (
      |  SELECT bg,
      |    CAST(round(ln(
      |      CAST(sum(c12) OVER (PARTITION BY split_part(bg, ' ', 1))
      |        AS DOUBLE) / CAST(c12 AS DOUBLE)), 6)
      |      AS DECIMAL(18,6)) AS nll
      |  FROM c12)
      |SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_bigrams,
      |  round(CAST(sum(tf * nll) AS DOUBLE) / sum(tf), 6) AS avg_nll
      |FROM dtf JOIN model USING (bg)
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** q54 — bloom-routed exact decontamination. The bloom is a pure
    * routing optimization on the Spark side; the RESULT equals a plain
    * anti-join on the normalized text, which is what this mirrors
    * (the 64-bit fingerprint stands in for the text, as in q22).
    */
  private val q54 =
    s"""WITH lab AS (
       |  SELECT doc_id, lang, source,
       |    regexp_replace(lower(text), '\\s+', ' ', 'g') AS norm,
       |    $splitSql AS split
       |  FROM documents),
       |batch AS (
       |  SELECT doc_id, lang, source, norm FROM lab WHERE split = 'train'
       |  UNION ALL
       |  SELECT doc_id + 7000, lang, source, norm FROM lab
       |  WHERE split IN ('val', 'test') AND doc_id % 2 = 0),
       |ev AS (SELECT DISTINCT norm FROM lab WHERE split IN ('val', 'test'))
       |SELECT doc_id, lang, source FROM batch
       |WHERE norm NOT IN (SELECT norm FROM ev)
       |ORDER BY doc_id""".stripMargin

  /** q55 — decile-boundary length calibration: boundaries via
    * quantile_cont (the q7-proven (n−1)·q convention), bucket = 1 +
    * #(boundaries strictly below the value), then per-bucket stats.
    */
  private val q55 =
    """WITH d AS (
      |  SELECT doc_id, n_chars,
      |    len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]'))
      |      AS n_tokens
      |  FROM documents),
      |b AS (
      |  SELECT
      |    round(quantile_cont(CAST(n_tokens AS DOUBLE), 0.1), 6) AS b1,
      |    round(quantile_cont(CAST(n_tokens AS DOUBLE), 0.2), 6) AS b2,
      |    round(quantile_cont(CAST(n_tokens AS DOUBLE), 0.3), 6) AS b3,
      |    round(quantile_cont(CAST(n_tokens AS DOUBLE), 0.4), 6) AS b4,
      |    round(quantile_cont(CAST(n_tokens AS DOUBLE), 0.5), 6) AS b5,
      |    round(quantile_cont(CAST(n_tokens AS DOUBLE), 0.6), 6) AS b6,
      |    round(quantile_cont(CAST(n_tokens AS DOUBLE), 0.7), 6) AS b7,
      |    round(quantile_cont(CAST(n_tokens AS DOUBLE), 0.8), 6) AS b8,
      |    round(quantile_cont(CAST(n_tokens AS DOUBLE), 0.9), 6) AS b9
      |  FROM d),
      |bucketed AS (
      |  SELECT doc_id, n_chars, n_tokens,
      |    CAST(1 + (CASE WHEN n_tokens > b1 THEN 1 ELSE 0 END)
      |           + (CASE WHEN n_tokens > b2 THEN 1 ELSE 0 END)
      |           + (CASE WHEN n_tokens > b3 THEN 1 ELSE 0 END)
      |           + (CASE WHEN n_tokens > b4 THEN 1 ELSE 0 END)
      |           + (CASE WHEN n_tokens > b5 THEN 1 ELSE 0 END)
      |           + (CASE WHEN n_tokens > b6 THEN 1 ELSE 0 END)
      |           + (CASE WHEN n_tokens > b7 THEN 1 ELSE 0 END)
      |           + (CASE WHEN n_tokens > b8 THEN 1 ELSE 0 END)
      |           + (CASE WHEN n_tokens > b9 THEN 1 ELSE 0 END)
      |      AS BIGINT) AS decile
      |  FROM d, b)
      |SELECT decile, count(*) AS n_docs,
      |  min(n_tokens) AS min_tokens, max(n_tokens) AS max_tokens,
      |  round(CAST(sum(n_tokens) AS DOUBLE) / count(*), 6) AS avg_tokens,
      |  round(CAST(sum(n_chars) AS DOUBLE) / count(*), 6) AS avg_chars
      |FROM bucketed GROUP BY decile ORDER BY decile""".stripMargin

  /** q56 — grouped exact quantiles per (lang, source) stratum. */
  private val q56 =
    """SELECT lang, source, count(*) AS n_docs,
      |  round(quantile_cont(CAST(n_chars AS DOUBLE), 0.25), 6) AS p25_chars,
      |  round(quantile_cont(CAST(n_chars AS DOUBLE), 0.50), 6) AS p50_chars,
      |  round(quantile_cont(CAST(n_chars AS DOUBLE), 0.75), 6) AS p75_chars
      |FROM documents GROUP BY lang, source
      |ORDER BY lang, source""".stripMargin

  /** q57 — mixture-sampling summary. u = the 24-bit value of the first
    * 6 md5 hex chars of the id's decimal string (the q23 digit-fold
    * pattern) / 2^24 — exactly Curation.hashUniform; the rate CASE is
    * generated from the same MixtureRates constant the engine uses.
    */
  private val q57 = {
    val fold6 = (1 to 6).map { p =>
      s"(strpos('0123456789abcdef', substr(h, $p, 1)) - 1) * ${1L << (4 * (6 - p))}"
    }.mkString("(", " + ", ")")
    val rateCase = graft.llmops.Curation.MixtureRates
      .map { case (s, r) => s"WHEN source = '$s' THEN $r" }
      .mkString("CASE ", " ", s" ELSE ${graft.llmops.Curation.MixtureDefaultRate} END")
    s"""WITH d AS (
       |  SELECT source, doc_id, $tokSql AS n_tokens,
       |    substr(md5(CAST(doc_id AS VARCHAR)), 1, 6) AS h,
       |    $rateCase AS rate
       |  FROM documents),
       |c AS (
       |  SELECT source, n_tokens,
       |    CAST(floor(rate) AS BIGINT) +
       |      CASE WHEN $fold6 / 16777216.0 < rate - floor(rate)
       |           THEN 1 ELSE 0 END AS n_copies
       |  FROM d)
       |SELECT source, count(*) AS n_docs,
       |  CAST(sum(n_copies) AS BIGINT) AS n_sampled,
       |  round(CAST(sum(n_copies) AS DOUBLE) / count(*), 6)
       |    AS effective_rate,
       |  CAST(sum(n_copies * n_tokens) AS BIGINT) AS sampled_tokens
       |FROM c GROUP BY source ORDER BY source""".stripMargin
  }

  /** q58 — full outer reconciliation of pre-aggregated sides. */
  private val q58 =
    """WITH c AS (
      |  SELECT CAST(c_nationkey AS INTEGER) AS nk, count(*) AS n_customers
      |  FROM customer GROUP BY 1),
      |s AS (
      |  SELECT CAST(s_nationkey AS INTEGER) AS nk, count(*) AS n_suppliers
      |  FROM supplier GROUP BY 1)
      |SELECT coalesce(c.nk, s.nk) AS nationkey,
      |  coalesce(n_customers, 0) AS n_customers,
      |  coalesce(n_suppliers, 0) AS n_suppliers
      |FROM c FULL OUTER JOIN s ON c.nk = s.nk
      |ORDER BY nationkey""".stripMargin

  /** q79 — the constellation kernel's oracle mirror: identical IAU-76
    * precession algebra (constants shared with the engine via
    * `Constellation.precessionAngles`) and the SAME packaged boundary
    * table, generated into a VALUES join from `ConstellationTable
    * .rows` — first-match-in-table-order via arg_min on the row
    * ordinal. Zero transcription drift by construction.
    */
  private lazy val q79 = {
    val (zeta, z, theta) = graft.astro.Constellation.precessionAngles
    val tbl = graft.astro.ConstellationTable.rows.zipWithIndex.map {
      case (r, i) => s"(${r.raLo}, ${r.raHi}, ${r.decLo}, '${r.abbr}', $i)"
    }.mkString(",\n      |    ").stripMargin
    val names = graft.astro.ConstellationTable.fullNames.toSeq.sorted.map {
      case (a, n) => s"('$a', '$n')"
    }.mkString(", ")
    s"""WITH pts AS (
       |  SELECT event_id,
       |    (CAST(event_id AS DOUBLE) * 137.0) % 360.0 AS ra,
       |    (CAST(event_id AS DOUBLE) * 97.0) % 180.0 - 90.0 AS dec
       |  FROM events),
       |prec AS (
       |  SELECT event_id,
       |    cos(dec * $D2R) * sin(ra * $D2R + $zeta) AS aa,
       |    cos($theta) * cos(dec * $D2R) * cos(ra * $D2R + $zeta)
       |      - sin($theta) * sin(dec * $D2R) AS bb,
       |    sin($theta) * cos(dec * $D2R) * cos(ra * $D2R + $zeta)
       |      + cos($theta) * sin(dec * $D2R) AS cc
       |  FROM pts),
       |p75 AS (
       |  SELECT event_id,
       |    CASE WHEN h < 0 THEN h + 24 WHEN h >= 24 THEN h - 24
       |      ELSE h END AS rah,
       |    asin(greatest(-1.0, least(1.0, cc))) / $D2R AS dec75
       |  FROM (SELECT event_id, (atan2(aa, bb) + $z) / $D2R / 15.0 AS h,
       |    cc FROM prec)),
       |tbl(ra_lo, ra_hi, dec_lo, abbr, ord) AS (VALUES
       |    $tbl),
       |hit AS (
       |  SELECT p.event_id,
       |    coalesce(arg_min(t.abbr, t.ord), 'Oct') AS abbr
       |  FROM p75 p LEFT JOIN tbl t
       |    ON p.dec75 >= t.dec_lo AND p.rah >= t.ra_lo AND p.rah < t.ra_hi
       |  GROUP BY 1),
       |nm(abbr, name) AS (VALUES $names)
       |SELECT nm.name AS constellation, count(*) AS n
       |FROM hit JOIN nm ON hit.abbr = nm.abbr
       |GROUP BY 1 ORDER BY 1""".stripMargin
  }

  /** q78 — ANSI UNPIVOT of the q58 wide report (Spark side: stack). */
  private val q78 =
    """WITH c AS (
      |  SELECT CAST(c_nationkey AS INTEGER) AS nk, count(*) AS n_customers
      |  FROM customer GROUP BY 1),
      |s AS (
      |  SELECT CAST(s_nationkey AS INTEGER) AS nk, count(*) AS n_suppliers
      |  FROM supplier GROUP BY 1),
      |wide AS (
      |  SELECT coalesce(c.nk, s.nk) AS nationkey,
      |    coalesce(n_customers, 0) AS n_customers,
      |    coalesce(n_suppliers, 0) AS n_suppliers
      |  FROM c FULL OUTER JOIN s ON c.nk = s.nk)
      |SELECT nationkey, side, n
      |FROM wide UNPIVOT (n FOR side IN (n_customers, n_suppliers))
      |ORDER BY nationkey, side""".stripMargin

  /** q59 — CUBE grouping sets with ALL labels (q39's rollup + the
    * per-source subtotal slice).
    */
  private val q59 =
    s"""SELECT coalesce(lang, 'ALL') AS lang,
       |  coalesce(source, 'ALL') AS source,
       |  count(*) AS n_docs,
       |  CAST(sum(n_tokens) AS BIGINT) AS total_tokens
       |FROM (SELECT lang, source, $tokSql AS n_tokens FROM documents) t
       |GROUP BY CUBE (lang, source)
       |ORDER BY lang, source""".stripMargin

  /** Scalar argmax over per-language score COLUMNS (earlier language
    * wins ties, 'und' when all zero) — the nested-CASE form of q17's
    * CTE fold, usable inline when scores are plain columns.
    */
  private def langArgmaxSql(scoreCol: String => String): String = {
    val langs = TextOps.LangStopwords
    var bs = scoreCol(langs.head._1)
    var bl = s"'${langs.head._1}'"
    for ((code, _) <- langs.tail) {
      val sc = scoreCol(code)
      val prevBs = bs
      bl = s"CASE WHEN $sc > $prevBs THEN '$code' ELSE $bl END"
      bs = s"CASE WHEN $sc > $prevBs THEN $sc ELSE $prevBs END"
    }
    s"CASE WHEN $bs > 0 THEN $bl ELSE 'und' END"
  }

  /** q61 — code-switch detection over the planted-mix corpus: same
    * half-split + per-half stopword scores + argmax as the engine.
    */
  private val q61 = {
    val langs = TextOps.LangStopwords
    val scoreCols = langs.map { case (code, ws) =>
      s"${hitsSql("d1", ws)} AS h1_$code,\n    ${hitsSql("d2", ws)} AS h2_$code"
    }.mkString(",\n    ")
    val head = langArgmaxSql(c => s"h1_$c")
    val tail = langArgmaxSql(c => s"h2_$c")
    s"""WITH en AS (
       |  SELECT doc_id, text FROM documents WHERE lang = 'en'
       |  ORDER BY doc_id LIMIT 30),
       |mixed AS (
       |  SELECT 9000000 + doc_id AS doc_id,
       |    concat(text, ' ${TextOps.EsMarkerPassage}') AS text
       |  FROM en),
       |corpus AS (
       |  SELECT doc_id, text FROM documents
       |  UNION ALL SELECT doc_id, text FROM mixed),
       |h AS (
       |  SELECT doc_id,
       |    replace(concat(' ', lower(substring(text, 1,
       |      CAST(floor(length(text)/2) AS INT))), ' '), ' ', '  ') AS d1,
       |    replace(concat(' ', lower(substring(text,
       |      CAST(floor(length(text)/2) AS INT) + 1, length(text))), ' '),
       |      ' ', '  ') AS d2
       |  FROM corpus),
       |sc AS (
       |  SELECT doc_id,
       |    $scoreCols
       |  FROM h)
       |SELECT doc_id, $head AS head_lang, $tail AS tail_lang
       |FROM sc
       |WHERE $head <> $tail AND $head <> 'und' AND $tail <> 'und'
       |ORDER BY doc_id""".stripMargin
  }

  /** q60 — df-bounded vocabulary + per-doc OOV fraction. */
  private val q60 =
    """WITH toks0 AS (
      |  SELECT doc_id,
      |    string_split(regexp_replace(lower(text), '\s+', ' ', 'g'), ' ') AS toks
      |  FROM documents),
      |tf AS (
      |  SELECT doc_id, term, count(*) AS tf
      |  FROM (SELECT doc_id, unnest(toks) AS term FROM toks0) e
      |  GROUP BY 1, 2),
      |vocab AS (
      |  SELECT term FROM (SELECT term, count(*) AS df FROM tf GROUP BY 1) d
      |  WHERE df >= 3 AND df <= 400)
      |SELECT doc_id,
      |  CAST(sum(tf) AS BIGINT) AS n_tokens,
      |  CAST(sum(CASE WHEN v.term IS NULL THEN tf ELSE 0 END) AS BIGINT)
      |    AS n_oov,
      |  round(CAST(sum(CASE WHEN v.term IS NULL THEN tf ELSE 0 END)
      |    AS DOUBLE) / sum(tf), 6) AS oov_rate
      |FROM tf LEFT JOIN vocab v ON tf.term = v.term
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** q62 — top-quartile-per-language by percent_rank on the BPE
    * fragmentation score (same (score, doc_id) tie order).
    */
  private val q62 =
    """WITH s AS (
      |  SELECT lang, doc_id,
      |    round(CAST(len(regexp_extract_all(lower(text),
      |      '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS DOUBLE) / n_chars, 6) AS score
      |  FROM documents),
      |r AS (
      |  SELECT lang, score,
      |    percent_rank() OVER (PARTITION BY lang
      |                         ORDER BY score, doc_id) AS pr
      |  FROM s)
      |SELECT lang, count(*) AS n_kept,
      |  round(min(score), 6) AS score_floor,
      |  round(max(score), 6) AS score_ceil
      |FROM r WHERE pr <= 0.25
      |GROUP BY lang ORDER BY lang""".stripMargin

  /** q63 — linear multi-touch attribution over the q44-style interval
    * pairs: per-purchase equal split, credits rounded to 6 decimals in
    * double then summed as decimals.
    */
  private val q63 =
    """WITH clicks AS (
      |  SELECT user_id, event_id AS click_id, ts AS cts
      |  FROM events WHERE event_type = 'click'),
      |purch AS (
      |  SELECT user_id, event_id AS purchase_id, ts AS pts, value AS pvalue
      |  FROM events WHERE event_type = 'purchase'),
      |pairs AS (
      |  SELECT p.purchase_id, p.pvalue, c.cts
      |  FROM purch p JOIN clicks c
      |    ON p.user_id = c.user_id
      |   AND c.cts <= p.pts
      |   AND c.cts >= p.pts - INTERVAL 1 HOUR),
      |credited AS (
      |  SELECT cts,
      |    CAST(round(pvalue / (count(*) OVER (PARTITION BY purchase_id)), 6)
      |      AS DECIMAL(18,6)) AS credit
      |  FROM pairs)
      |SELECT strftime(date_trunc('hour', cts), '%Y-%m-%d %H:%M:%S')
      |    AS click_hour,
      |  count(*) AS n_credited_clicks,
      |  CAST(sum(credit) AS DOUBLE) AS credited_revenue
      |FROM credited
      |GROUP BY 1 ORDER BY click_hour""".stripMargin

  /** q64 — TPC-H Q5 shape (local-supplier revenue per nation). */
  private val q64 =
    """SELECT n_name,
      |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount)
      |    AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
      |  count(*) AS n_items
      |FROM lineitem
      |JOIN orders   ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation   ON c_nationkey = n_nationkey
      |WHERE c_nationkey = s_nationkey
      |GROUP BY n_name ORDER BY n_name""".stripMargin

  /** q65 — correlated-scalar-subquery mirror (same multiplicative
    * exact-decimal threshold).
    */
  private val q65 =
    """SELECT p_brand, count(*) AS n_above,
      |  round(CAST(sum(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE)
      |    / count(*), 6) AS avg_above_price
      |FROM part p
      |WHERE CAST(p_retailprice AS DECIMAL(18,2)) *
      |      (SELECT count(*) FROM part i WHERE i.p_brand = p.p_brand) >
      |      (SELECT sum(CAST(p_retailprice AS DECIMAL(18,2)))
      |       FROM part i WHERE i.p_brand = p.p_brand)
      |GROUP BY p_brand
      |ORDER BY p_brand""".stripMargin

  /** q66 — gaps-and-islands mirror: same `day_ordinal − row_number`
    * island key over distinct (user, day).
    */
  private val q66 =
    """WITH days AS (
      |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
      |  WHERE ts IS NOT NULL),
      |isl AS (
      |  SELECT user_id,
      |    date_diff('day', DATE '2024-01-01', d)
      |      - row_number() OVER (PARTITION BY user_id ORDER BY d)
      |      AS island
      |  FROM days),
      |runs AS (
      |  SELECT user_id, island, count(*) AS len
      |  FROM isl GROUP BY 1, 2)
      |SELECT user_id, max(len) AS best_streak,
      |  count(*) AS n_streaks, CAST(sum(len) AS BIGINT) AS active_days
      |FROM runs GROUP BY user_id HAVING max(len) >= 3
      |ORDER BY user_id""".stripMargin

  /** q67 — INTERSECT / EXCEPT audience-overlap mirror. */
  private val q67 =
    """WITH c AS (
      |  SELECT DISTINCT user_id FROM events WHERE event_type = 'click'),
      |p AS (
      |  SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase')
      |SELECT * FROM (
      |  SELECT 'both' AS cohort, count(*) AS n_users
      |  FROM (SELECT user_id FROM c INTERSECT SELECT user_id FROM p)
      |  UNION ALL
      |  SELECT 'click_only', count(*)
      |  FROM (SELECT user_id FROM c EXCEPT SELECT user_id FROM p)
      |  UNION ALL
      |  SELECT 'purchase_only', count(*)
      |  FROM (SELECT user_id FROM p EXCEPT SELECT user_id FROM c))
      |ORDER BY cohort""".stripMargin

  /** q68 — triangle-count mirror: same sampled bipartite projection,
    * ordered edge list, wedge join + closing-edge check.
    */
  private val q68 =
    """WITH ps AS (
      |  SELECT DISTINCT l_partkey AS part, l_suppkey AS supp
      |  FROM lineitem WHERE l_suppkey % 7 = 0),
      |e AS (
      |  SELECT a.supp AS u, b.supp AS v
      |  FROM ps a JOIN ps b ON a.part = b.part AND a.supp < b.supp
      |  GROUP BY 1, 2 HAVING count(*) >= 2),
      |tri AS (
      |  SELECT e1.u AS a, e2.u AS b, e2.v AS c
      |  FROM e e1
      |  JOIN e e2 ON e1.v = e2.u
      |  JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v)
      |SELECT s_suppkey, count(*) AS n_triangles FROM (
      |  SELECT a AS s_suppkey FROM tri
      |  UNION ALL SELECT b FROM tri
      |  UNION ALL SELECT c FROM tri)
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** q69 — ntile-decile mirror (same composite order key, same
    * exact-decimal mean).
    */
  private val q69 =
    """WITH t AS (
      |  SELECT o_orderpriority AS priority, o_totalprice,
      |    ntile(10) OVER (PARTITION BY o_orderpriority
      |                    ORDER BY o_totalprice, o_orderkey) AS decile
      |  FROM orders)
      |SELECT priority, decile, count(*) AS n_orders,
      |  round(min(o_totalprice), 2) AS lo,
      |  round(max(o_totalprice), 2) AS hi,
      |  round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
      |    / count(*), 6) AS avg_price
      |FROM t GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** q70 — the DIRECT (non-incremental) formulation: the oracle
    * deliberately takes the other evaluation path, so the hash-match
    * proves partial-aggregate mergeability end to end.
    */
  private val q70 =
    """SELECT event_type,
      |  count(*) AS n_events,
      |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
      |  CAST(min(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS min_value,
      |  CAST(max(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS max_value,
      |  count(DISTINCT CAST(ts AS DATE)) AS n_days
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** q71 — same NOT IN statement: DuckDB applies the same three-valued
    * NOT IN semantics, so the two engines agree by the SQL standard.
    */
  private val q71 =
    """SELECT c_nationkey, count(*) AS n_customers
      |FROM customer
      |WHERE c_nationkey NOT IN
      |  (SELECT s_nationkey FROM supplier WHERE s_acctbal < 500.0)
      |GROUP BY c_nationkey
      |ORDER BY c_nationkey""".stripMargin

  /** q72 — the PLAIN join: salting on the Spark side must not change
    * one bit of the aggregate.
    */
  private val q72 =
    """SELECT s_nationkey, count(*) AS n_items,
      |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount)
      |    AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      |GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin

  /** q73 — same q38/q48 session CTE, sequence via ordered string_agg,
    * same regex.
    */
  private val q73 =
    """WITH s AS (
      |  SELECT event_id, user_id, ts, event_type,
      |    sum(CASE WHEN prev_ts IS NULL
      |          OR epoch_us(ts) - epoch_us(prev_ts) > 21600000000
      |        THEN 1 ELSE 0 END)
      |      OVER (PARTITION BY user_id ORDER BY ts, event_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |      AS session_id
      |  FROM (SELECT *, lag(ts) OVER (PARTITION BY user_id
      |                                ORDER BY ts, event_id) AS prev_ts
      |        FROM events WHERE ts IS NOT NULL)),
      |seqs AS (
      |  SELECT user_id, session_id,
      |    string_agg(event_type, ',' ORDER BY ts, event_id) AS seq
      |  FROM s GROUP BY 1, 2)
      |SELECT user_id, count(*) AS n_sessions,
      |  count(*) FILTER (WHERE regexp_matches(seq,
      |    'view.*click.*purchase')) AS n_matched
      |FROM seqs GROUP BY user_id
      |HAVING count(*) FILTER (WHERE regexp_matches(seq,
      |  'view.*click.*purchase')) > 0
      |ORDER BY user_id""".stripMargin

  /** q74 — same vocabulary-first BPE pair count (token dict, then
    * char pairs over the dict).
    */
  private val q74 =
    """WITH toks0 AS (
      |  SELECT string_split(regexp_replace(lower(text), '\s+', ' ', 'g'),
      |    ' ') AS toks
      |  FROM documents),
      |tf AS (
      |  SELECT t AS tok, count(*) AS tf
      |  FROM (SELECT unnest(toks) AS t FROM toks0) GROUP BY 1),
      |p AS (
      |  SELECT tf, unnest(list_transform(range(1, length(tok)),
      |    i -> substr(tok, CAST(i AS INTEGER), 2))) AS pair
      |  FROM tf WHERE length(tok) >= 2)
      |SELECT pair, CAST(sum(tf) AS BIGINT) AS weighted_n,
      |  count(*) AS n_positions
      |FROM p GROUP BY pair
      |ORDER BY weighted_n DESC, pair LIMIT 30""".stripMargin

  /** q75 — the identical recursive CTE (ANSI recursion, both engines). */
  private val q75 =
    """WITH RECURSIVE tree AS (
      |  SELECT s_suppkey, s_acctbal, 0 AS depth
      |  FROM supplier WHERE s_suppkey = 0
      |  UNION ALL
      |  SELECT s.s_suppkey, s.s_acctbal, t.depth + 1
      |  FROM supplier s JOIN tree t
      |    ON CAST(floor((s.s_suppkey - 1) / 2.0) AS BIGINT) = t.s_suppkey
      |  WHERE s.s_suppkey >= 1)
      |SELECT depth, count(*) AS n_nodes,
      |  CAST(sum(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE)
      |    AS total_acctbal,
      |  min(s_suppkey) AS min_key, max(s_suppkey) AS max_key
      |FROM tree GROUP BY depth ORDER BY depth""".stripMargin

  /** q76 — the same values via JSON-text extraction (VARIANT is an
    * engine-side encoding; the data contract is identical).
    */
  private val q76 =
    """SELECT event_type, count(*) AS n,
      |  min(TRY_CAST(json_extract_string(props, '$.k') AS INTEGER)) AS min_k,
      |  max(TRY_CAST(json_extract_string(props, '$.k') AS INTEGER)) AS max_k,
      |  round(CAST(sum(CAST(TRY_CAST(json_extract_string(props, '$.k')
      |      AS INTEGER) AS DECIMAL(18,0))) AS DOUBLE)
      |    / count(TRY_CAST(json_extract_string(props, '$.k') AS INTEGER)), 6)
      |    AS avg_k,
      |  count(TRY_CAST(json_extract_string(props, '$.missing') AS INTEGER))
      |    AS n_missing_present
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** q77 — identical LATERAL statement (ANSI lateral derived table). */
  private val q77 =
    """SELECT n.n_name, s.s_name, s.s_acctbal
      |FROM nation n, LATERAL (
      |  SELECT s_name, s_acctbal FROM supplier
      |  WHERE s_nationkey = n.n_nationkey
      |  ORDER BY s_acctbal DESC, s_name LIMIT 2) s
      |ORDER BY n.n_name, s.s_acctbal DESC, s.s_name""".stripMargin

  // ---- reference-filter goldens over the real ZTF fixture (q80+) ----
  // The SIMBAD class lists are generated from the SAME Scala constants
  // the filters use (the q79 zero-transcription-drift pattern).

  private val ZtfFixture =
    s"${graft.operators.GoldenQueries.FixtureDir}/*.parquet"

  private def sqlList(xs: Seq[String]): String =
    xs.map(s => s"'$s'").mkString(", ")

  /** The sn_candidates predicate re-expressed in SQL
    * (`livestream/filter_sn_candidates/filter.py:86-104`).
    */
  private def snCandidatesPredicate: String = {
    val hosts = sqlList(graft.filters.ztf.SimbadClasses.ExtragalacticHosts)
    s"""(snn_snia_vs_nonia > 0.5 OR snn_sn_vs_all > 0.5)
       |    AND cdsxmatch IN ($hosts)
       |    AND (candidate.jd - candidate.jdstarthist) <= 90
       |    AND candidate.drb > 0.5 AND candidate.classtar > 0.4
       |    AND candidate.ndethist > 1 AND roid <> 3""".stripMargin
  }

  private lazy val q80 =
    s"""SELECT objectId AS object_id, CAST(candidate.jd AS DOUBLE) AS jd
       |FROM '$ZtfFixture'
       |WHERE $snCandidatesPredicate
       |ORDER BY object_id, jd""".stripMargin

  /** The full classification cascade (`classification.py:139-210`) as
    * one CASE over per-filter flag columns; flags coalesce to false on
    * null inputs exactly as the engine's masks do.
    */
  private lazy val q81 = {
    val hosts = sqlList(graft.filters.ztf.SimbadClasses.ExtragalacticHosts)
    s"""WITH flags AS (
       |  SELECT cdsxmatch,
       |    coalesce(mulens > 0.0, false) AS f_mulens,
       |    coalesce($snCandidatesPredicate, false) AS f_sn,
       |    coalesce((snn_snia_vs_nonia > 0.5 OR snn_sn_vs_all > 0.5)
       |      AND cdsxmatch IN ($hosts)
       |      AND candidate.drb > 0.5 AND candidate.classtar > 0.4
       |      AND candidate.ndethist <= 20
       |      AND rf_snia_vs_nonia > 0.5, false) AS f_snearly,
       |    coalesce(rf_kn_vs_nonkn > 0.5
       |      AND candidate.drb > 0.5 AND candidate.classtar > 0.4
       |      AND (candidate.jd - candidate.jdstarthist) < 5
       |      AND roid <> 3 AND candidate.ndethist < 20
       |      AND cdsxmatch IN ($hosts), false) AS f_kn,
       |    coalesce(roid = 2, false) AS f_r2,
       |    coalesce(roid = 3, false) AS f_r3,
       |    coalesce(substr(tracklet, 1, 5) = 'TRCK_', false) AS f_tracklet,
       |    coalesce(NOT cdsxmatch IN
       |        ('Unknown', 'Transient', 'Fail', 'Fail 504')
       |      AND cdsxmatch NOT LIKE 'Fail%'
       |      AND cdsxmatch NOT LIKE 'Galaxy%', false) AS f_simbad
       |  FROM '$ZtfFixture')
       |SELECT CASE
       |    WHEN f_simbad THEN cdsxmatch
       |    WHEN CAST(f_mulens AS INT) + CAST(f_sn AS INT)
       |      + CAST(f_r2 AS INT) + CAST(f_r3 AS INT) > 1 THEN 'Ambiguous'
       |    WHEN f_r3 THEN 'Solar System MPC'
       |    WHEN f_tracklet THEN 'Tracklet'
       |    WHEN f_r2 THEN 'Solar System candidate'
       |    WHEN f_kn THEN 'Kilonova candidate'
       |    WHEN f_snearly THEN 'Early SN Ia candidate'
       |    WHEN f_sn THEN 'SN candidate'
       |    WHEN f_mulens THEN 'Microlensing candidate'
       |    ELSE 'Unknown' END AS class,
       |  count(*) AS n
       |FROM flags
       |GROUP BY 1 ORDER BY n DESC, class""".stripMargin
  }

  /** q85 — the SemDeDup-shape semantic dedup: identical IVF assignment
    * semantics as q27 (every-97th seeds, round-6 tie-stable argmax),
    * then per-cell exhaustive pairs and the greedy min-id
    * representative. Allocator-lean form (round 13): [[flatEmbCte]]
    * flat columns everywhere, `assign` MATERIALIZED and slim
    * (vec_id, seed_id) with the flat rows joined back by unique
    * vec_id only where a cosine is computed.
    */
  private val q85 = {
    val cosSeed = flatCosSql("e", "s", 64)
    val cosAB = flatCosSql("ea", "eb", 64)
    s"""WITH ${flatEmbCte("ef", 64)},
       |seeds AS (
       |  SELECT * EXCLUDE (vec_id), vec_id AS seed_id FROM ef
       |  WHERE vec_id % 97 = 0),
       |assign AS MATERIALIZED (
       |  SELECT vec_id, seed_id FROM (
       |    SELECT e.vec_id, s.seed_id,
       |      row_number() OVER (PARTITION BY e.vec_id
       |        ORDER BY round($cosSeed, 6) DESC, s.seed_id) AS rk
       |    FROM ef e, seeds s) t WHERE rk = 1),
       |pairs AS (
       |  SELECT a.vec_id AS id_a, b.vec_id AS vec_id,
       |    round($cosAB, 6) AS cos_sim
       |  FROM assign a JOIN assign b USING (seed_id)
       |  JOIN ef ea ON ea.vec_id = a.vec_id
       |  JOIN ef eb ON eb.vec_id = b.vec_id
       |  WHERE a.vec_id < b.vec_id)
       |SELECT vec_id, min(id_a) AS canonical_id, count(*) AS n_dups
       |FROM pairs WHERE cos_sim >= 0.25
       |GROUP BY vec_id ORDER BY vec_id""".stripMargin
  }

  /** q87 — the anomaly-history counter: nightly per-user best row,
    * nightly top-10, then the 90-day trailing count ending at the
    * newest stored night ([[graft.pipeline.AnomalyPipeline]] G9).
    */
  private val q87 =
    """WITH ev AS (
      |  SELECT CAST(ts AS DATE) AS night, user_id, value AS s,
      |    event_id AS tb
      |  FROM events
      |  WHERE ts IS NOT NULL AND value IS NOT NULL AND NOT isnan(value)),
      |dedup AS (
      |  SELECT night, user_id, s, tb FROM (
      |    SELECT night, user_id, s, tb,
      |      row_number() OVER (PARTITION BY night, user_id
      |        ORDER BY s, tb) AS rn
      |    FROM ev) t WHERE rn = 1),
      |topn AS (
      |  SELECT night, user_id FROM (
      |    SELECT night, user_id,
      |      row_number() OVER (PARTITION BY night
      |        ORDER BY s, tb, user_id) AS rk
      |    FROM dedup) t WHERE rk <= 10),
      |b AS (SELECT max(night) AS as_of FROM topn)
      |SELECT user_id, count(*) AS n_top_hits
      |FROM topn, b WHERE night > as_of - 90
      |GROUP BY user_id
      |ORDER BY n_top_hits DESC, user_id""".stripMargin

  /** q86 — the perceptual dHash over token-derived 18×16 rasters. The
    * 18×16 → 9×8 resize is exact 2×2 box averaging, so the mirror
    * compares raw 4-pixel sums (the kernel's average comparison scaled
    * by the constant area — strict < is preserved exactly); chunk ck
    * carries hash bits [16ck, 16ck+16) with bit r·8+c set iff
    * cell(r,c) < cell(r,c+1), the [[graft.expressions.ImageDHash]]
    * construction replayed from md5 hex digits alone.
    */
  private val q86 = {
    def cellSum(r: Int, c: Int): String = {
      val i0 = (2 * r) * 18 + 2 * c
      val i1 = (2 * r + 1) * 18 + 2 * c
      s"(p[${i0 + 1}] + p[${i0 + 2}] + p[${i1 + 1}] + p[${i1 + 2}])"
    }
    def chunk(ck: Int): String = sumL((0 until 16).map { local =>
      val b = ck * 16 + local
      val r = b / 8
      val c = b % 8
      s"CASE WHEN ${cellSum(r, c)} < ${cellSum(r, c + 1)} " +
        s"THEN ${1 << local} ELSE 0 END"
    })
    val ham = sumL((0 to 3).map(k =>
      s"bit_count(xor(a.c$k, b.c$k))"))
    s"""WITH t AS (
       |  SELECT doc_id,
       |    string_split(regexp_replace(lower(text), '\\s+', ' ', 'g'), ' ')
       |      AS toks
       |  FROM documents),
       |hs AS (
       |  SELECT doc_id, list_transform(toks,
       |    s -> CAST(('0x' || substr(md5(s), 1, 2)) AS INTEGER)) AS hv
       |  FROM t WHERE len(toks) > 0),
       |px AS (
       |  SELECT doc_id,
       |    list_transform(range(0, 288), i -> hv[(i % len(hv)) + 1]) AS p
       |  FROM hs),
       |dh AS (
       |  SELECT doc_id, ${(0 to 3).map(k => s"${chunk(k)} AS c$k")
            .mkString(",\n    ")}
       |  FROM px),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |    $ham AS hamming
       |  FROM dh a JOIN dh b
       |    ON a.doc_id < b.doc_id
       |    AND (a.c0 = b.c0 OR a.c1 = b.c1 OR a.c2 = b.c2 OR a.c3 = b.c3))
       |SELECT doc_a, doc_b, CAST(hamming AS INTEGER) AS hamming
       |FROM cand WHERE hamming <= 10
       |ORDER BY doc_a, doc_b""".stripMargin
  }

  // ---- Rubin fixture goldens (q83+) — same zero-transcription-drift
  // rule: flag lists and bad-value lists are generated from the Scala
  // constants the blocks themselves use.

  private val RubinFixture =
    s"${graft.operators.GoldenQueries.RubinFixtureDir}/*.parquet"

  /** `NOT(any quality flag OR negative flux OR snr<6)` — the DuckDB
    * re-expression of [[graft.filters.rubin.RubinBlocks.goodQuality]]
    * (`rubin/blocks.py:372-418`). Division is cast to DOUBLE on both
    * engines (Spark's Divide widens FLOAT operands to DOUBLE; DuckDB's
    * would stay FLOAT without the cast).
    */
  private def rubinGoodQualitySql: String = {
    val flags = graft.filters.rubin.RubinBlocks.QualityFlags
      .map(f => s"coalesce(diaSource.$f, false)")
      .mkString(" OR\n       |      ")
    s"""NOT ($flags OR
       |      coalesce(diaSource.psfFlux < 0, false) OR
       |      coalesce(CAST(diaSource.psfFlux AS DOUBLE)
       |        / CAST(diaSource.psfFluxErr AS DOUBLE) < 6, false))""".stripMargin
  }

  private lazy val q83 = {
    val bad = sqlList(graft.filters.rubin.RubinBlocks.BadValues)
    val hosts = sqlList(graft.filters.rubin.RubinBlocks.EgHosts)
    val vsx = sqlList(graft.filters.rubin.RubinBlocks.VsxStellar)
    s"""SELECT diaSourceId AS source_id,
       |  CAST(coalesce(diaSource.midpointMjdTai
       |      = misc.firstDiaSourceMjdTaiFink, false) AS INTEGER) AS f_new,
       |  CAST($rubinGoodQualitySql AS INTEGER) AS f_good_quality,
       |  CAST(coalesce(pred.is_sso, false) AS INTEGER) AS f_sso,
       |  CAST(coalesce(xm.simbad_otype IN ($hosts), false) AS INTEGER)
       |    AS f_simbad_galaxy,
       |  CAST(xm.simbad_otype IS NULL OR xm.simbad_otype IN ($bad)
       |    AS INTEGER) AS f_simbad_unknown,
       |  CAST(coalesce(xm.gaiadr3_DR3Name IS NOT NULL
       |      AND xm.gaiadr3_DR3Name NOT IN ($bad)
       |      AND CAST(xm.gaiadr3_Plx AS DOUBLE)
       |        / CAST(xm.gaiadr3_e_Plx AS DOUBLE) > 5, false) AS INTEGER)
       |    AS f_gaia_star,
       |  CAST(coalesce(xm.mangrove_lum_dist > 0, false) AS INTEGER)
       |    AS f_mangrove,
       |  CAST(coalesce(xm.vsx_Type IN ($vsx), false) AS INTEGER)
       |    AS f_vsx_star
       |FROM '$RubinFixture'
       |ORDER BY source_id""".stripMargin
  }

  private lazy val q84 =
    s"""WITH f AS (
       |  SELECT diaSourceId AS source_id,
       |    coalesce(CAST(diaSource.snr AS DOUBLE) > 10, false) AS f_snr,
       |    coalesce(diaObject.nDiaSources >= 2, false) AS f_nsources,
       |    ($rubinGoodQualitySql
       |      AND NOT coalesce(diaSource.isNegative, false)) AS f_gq_not_neg,
       |    coalesce(CAST(clf.snnSnVsOthers_score AS DOUBLE) >= 0.7, false)
       |      AS f_snn_sn,
       |    coalesce(clf.cats_class = 11
       |      AND CAST(clf.cats_score AS DOUBLE) >= 0.9, false) AS f_cats_sn,
       |    coalesce(pred.is_sso, false) AS f_sso
       |  FROM '$RubinFixture')
       |SELECT source_id,
       |  CAST(f_snr AS INTEGER) AS f_snr,
       |  CAST(f_nsources AS INTEGER) AS f_nsources,
       |  CAST(f_gq_not_neg AS INTEGER) AS f_gq_not_neg,
       |  CAST(f_snn_sn AS INTEGER) AS f_snn_sn,
       |  CAST(f_cats_sn AS INTEGER) AS f_cats_sn,
       |  CAST(f_snn_sn AND f_cats_sn AND NOT f_sso AND f_snr
       |    AND NOT f_gq_not_neg AND f_nsources AS INTEGER)
       |    AS f_most_likely_sn,
       |  CAST(NOT f_sso AND f_snr AND NOT f_gq_not_neg AND f_nsources
       |    AS INTEGER) AS f_keep_transient
       |FROM f ORDER BY source_id""".stripMargin

  /** `CASE diaSource.band WHEN 'u' THEN diaObject.u_<stat> …` — the
    * dynamic per-band column idiom (A8), generated over the same band
    * order as RubinBlocks.bandColumn.
    */
  private def rubinBandColSql(stat: String): String =
    "CASE diaSource.band " +
      graft.filters.rubin.RubinBlocks.Bands
        .map(b => s"WHEN '$b' THEN diaObject.${b}_$stat")
        .mkString(" ") + " END"

  /** q88 — the extragalactic cascade + per-band blocks + galactic
    * latitude. The NGP trig constants are EMBEDDED as the same JVM
    * doubles Astro computes at plan build (sin/cos of the NGP pole),
    * so only the per-row sin/cos/asin differ between engines — round-6
    * absorbs the libm-vs-Math ulp.
    */
  private lazy val q88 = {
    val d2r = 0.017453292519943295
    val sinNgp = math.sin(27.12825 * d2r)
    val cosNgp = math.cos(27.12825 * d2r)
    val bad = sqlList(graft.filters.rubin.RubinBlocks.BadValues)
    val hosts = sqlList(graft.filters.rubin.RubinBlocks.EgHosts)
    val vsx = sqlList(graft.filters.rubin.RubinBlocks.VsxStellar)
    val bGal = s"""(asin(sin(diaSource."dec" * $d2r) * $sinNgp
       |      + cos(diaSource."dec" * $d2r) * $cosNgp
       |      * cos((diaSource.ra - 192.85948) * $d2r)) / $d2r)""".stripMargin
    val fluxDiff = s"(diaSource.psfFlux - ${rubinBandColSql("psfFluxMean")})"
    val signif = s"(abs($fluxDiff) > ${rubinBandColSql("psfFluxMeanErr")})"
    s"""WITH f AS (
       |  SELECT diaSourceId AS source_id,
       |    $bGal AS b_gal,
       |    coalesce(abs($bGal) > 20, false) AS f_outside_plane,
       |    $rubinGoodQualitySql AS f_gq,
       |    coalesce(xm.simbad_otype IN ($hosts), false) AS f_sim_gal,
       |    (xm.simbad_otype IS NULL OR xm.simbad_otype IN ($bad))
       |      AS f_sim_unk,
       |    coalesce(xm.mangrove_lum_dist > 0, false) AS f_mangrove,
       |    coalesce(xm.gaiadr3_DR3Name IS NOT NULL
       |      AND xm.gaiadr3_DR3Name NOT IN ($bad)
       |      AND CAST(xm.gaiadr3_Plx AS DOUBLE)
       |        / CAST(xm.gaiadr3_e_Plx AS DOUBLE) > 5, false) AS f_gaia,
       |    coalesce(xm.vsx_Type IN ($vsx), false) AS f_vsx,
       |    coalesce(pred.is_sso, false) AS f_sso,
       |    coalesce(xm.legacydr8_zphot > 0, false) AS f_legacy,
       |    coalesce($signif AND $fluxDiff > 0, false) AS f_rising,
       |    coalesce($signif AND $fluxDiff < 0, false) AS f_fading,
       |    coalesce(${rubinBandColSql("psfFluxNdata")} >= 2, false)
       |      AS f_two_same_band
       |  FROM '$RubinFixture'),
       |g AS (
       |  SELECT *,
       |    (f_legacy AND (f_sim_unk OR f_sim_gal)) AS f_legacy_valid,
       |    (NOT f_gaia AND NOT f_vsx) AS f_not_star
       |  FROM f)
       |SELECT source_id, round(b_gal, 6) AS b_gal,
       |  CAST(f_outside_plane AS INTEGER) AS f_outside_plane,
       |  CAST(f_legacy_valid AS INTEGER) AS f_legacy_valid,
       |  CAST(f_not_star AS INTEGER) AS f_not_star,
       |  CAST(f_gq AND (f_sim_gal OR f_mangrove OR f_legacy_valid
       |      OR f_sim_unk)
       |    AND f_outside_plane AND NOT f_sso AND f_not_star AS INTEGER)
       |    AS f_eg_loose,
       |  CAST(f_gq AND (f_sim_gal OR f_mangrove OR f_legacy_valid)
       |    AND f_outside_plane AND NOT f_sso AND f_not_star AS INTEGER)
       |    AS f_eg_near_galaxy,
       |  CAST(f_rising AS INTEGER) AS f_rising,
       |  CAST(f_fading AS INTEGER) AS f_fading,
       |  CAST(f_two_same_band AS INTEGER) AS f_two_same_band
       |FROM g ORDER BY source_id""".stripMargin
  }

  /** q89 — the 18-filter predicate-catalog survivors table. One SELECT
    * per filter name, UNION ALL, ordered; the name list is asserted
    * identical to [[graft.operators.GoldenQueries.ZtfSurvivorFilters]]
    * so the two sides can never cover different filters.
    */
  private lazy val q89 = {
    import graft.filters.ztf.SimbadClasses
    val hosts = sqlList(SimbadClasses.ExtragalacticHosts)
    val blazars = sqlList(SimbadClasses.Blazars)
    val grav = sqlList(SimbadClasses.Gravitational)
    val yso = sqlList(SimbadClasses.Yso)
    // DuckDB map extraction yields a single-element list; try_cast of
    // the Python 'None'/'nan' sentinels mirrors the engine's ANSI-safe
    // coercion (both sides fail the < 200 comparison)
    val mangroveLum = "TRY_CAST(mangrove['lum_dist'][1] AS DOUBLE)"
    val preds: Seq[(String, String)] = Seq(
      "ztf.livestream.early_sn_candidates" ->
        s"""(snn_snia_vs_nonia > 0.5 OR snn_sn_vs_all > 0.5)
           |      AND cdsxmatch IN ($hosts)
           |      AND candidate.drb > 0.5 AND candidate.classtar > 0.4
           |      AND candidate.ndethist <= 20
           |      AND rf_snia_vs_nonia > 0.5""".stripMargin,
      "ztf.livestream.kn_candidates" ->
        s"""rf_kn_vs_nonkn > 0.5 AND candidate.drb > 0.5
           |      AND candidate.classtar > 0.4
           |      AND (candidate.jd - candidate.jdstarthist) < 5
           |      AND roid <> 3 AND candidate.ndethist < 20
           |      AND cdsxmatch IN ($hosts)""".stripMargin,
      "ztf.livestream.sso_ztf_candidates" -> "roid = 3",
      "ztf.livestream.sso_fink_candidates" -> "roid = 2",
      "ztf.livestream.microlensing_candidates" -> "mulens > 0.0",
      "ztf.livestream.blazar" -> s"cdsxmatch IN ($blazars)",
      "ztf.livestream.simbad_grav_candidates" -> s"cdsxmatch IN ($grav)",
      "ztf.livestream.tns_match" ->
        "tns <> '' AND (candidate.jd - candidate.jdstarthist) <= 30",
      "ztf.livestream.vra" ->
        """cdsxmatch = 'Unknown' AND roid <> 3
          |      AND candidate.magpsf > 19.5
          |      AND candidate.drb > 0.5""".stripMargin,
      "ztf.livestream.yso_candidates" -> s"cdsxmatch IN ($yso)",
      "ztf.rrlyr" -> "cdsxmatch IN ('RRLyr', 'RRLyrae')",
      "ztf.simbad_candidates" ->
        """NOT cdsxmatch IN ('Unknown', 'Transient', 'Fail', 'Fail 504')
          |      AND cdsxmatch NOT LIKE 'Fail%'
          |      AND cdsxmatch NOT LIKE 'Galaxy%'""".stripMargin,
      "ztf.gaia_dr3_candidates" -> "DR3Name <> 'nan'",
      // substr, not LIKE: '_' is a SQL wildcard (the q81 lesson)
      "ztf.tracklet_candidates" -> "substr(tracklet, 1, 5) = 'TRCK_'",
      "ztf.snlike" ->
        """rf_snia_vs_nonia > 0.0 AND cdsxmatch = 'Unknown'
          |      AND candidate.neargaia > 5.0
          |      AND candidate.distpsnr1 > 5.0""".stripMargin,
      "ztf.example_filter" ->
        """NOT cdsxmatch IN ('Unknown', 'Transient')
          |      AND cdsxmatch NOT LIKE 'Fail%'
          |      AND cdsxmatch NOT LIKE 'Galaxy%'
          |      AND candidate.magpsf > 20.5""".stripMargin,
      "ztf.vast_supernovae" ->
        s"""$mangroveLum < 200 AND candidate."dec" < -10
           |      AND NOT tns IN ('', 'Unknown')""".stripMargin,
      "ztf.vast_supernovae_candidates" ->
        s"""$mangroveLum < 200 AND candidate."dec" < -10
           |      AND snn_sn_vs_all > 0.5""".stripMargin)
    require(preds.map(_._1) ==
      graft.operators.GoldenQueries.ZtfSurvivorFilters,
      "q89 mirror filter list diverged from GoldenQueries")
    preds.map { case (name, p) =>
      s"""SELECT '$name' AS filter, objectId AS object_id,
         |  CAST(candidate.jd AS DOUBLE) AS jd
         |FROM '$ZtfFixture'
         |WHERE $p""".stripMargin
    }.mkString("", "\nUNION ALL\n", "\nORDER BY filter, object_id, jd")
  }

  /** q90 — semantic decontamination: train-side seeds (every 97th TRAIN
    * id), train assigned to its one nearest cell, eval probing its two
    * nearest cells, in-cell cross-split cosine ≥ 0.3
    * ([[graft.llmops.Curation.semanticDecontaminate]]).
    *
    * Memory-lean form (round 12): the ranking windows sort SLIM
    * (vec_id, seed_id, cosine) rows — the embedding data joins back by
    * unique vec_id only AFTER the rank filters. Allocator-lean form
    * (round 13): [[flatEmbCte]] flat columns end to end — the r12 form
    * still re-extracted 64-wide lists inside the cross-join cosines,
    * which alone could saturate the map table in the driver's
    * single-process 32-thread pass (the r12 q90 loss; gated by
    * `tools/oracle_stress.py --seq`).
    */
  private val q90 = {
    val cosT = flatCosSql("t", "s", 64)
    val cosE = flatCosSql("v", "s", 64)
    val cosTE = flatCosSql("t2", "e2", 64)
    s"""WITH ${flatEmbCte("ef", 64)},
       |tr AS (SELECT * FROM ef WHERE vec_id % 10 <> 7),
       |ev AS (SELECT * FROM ef WHERE vec_id % 10 = 7),
       |seeds AS (
       |  SELECT * EXCLUDE (vec_id), vec_id AS seed_id FROM tr
       |  WHERE vec_id % 97 = 0),
       |assign_t AS MATERIALIZED (
       |  SELECT vec_id AS train_id, seed_id FROM (
       |    SELECT t.vec_id, s.seed_id,
       |      row_number() OVER (PARTITION BY t.vec_id
       |        ORDER BY round($cosT, 6) DESC, s.seed_id) AS rk
       |    FROM tr t, seeds s) z WHERE rk = 1),
       |probe_e AS MATERIALIZED (
       |  SELECT vec_id AS eval_id, seed_id FROM (
       |    SELECT v.vec_id, s.seed_id,
       |      row_number() OVER (PARTITION BY v.vec_id
       |        ORDER BY round($cosE, 6) DESC, s.seed_id) AS rk
       |    FROM ev v, seeds s) z WHERE rk <= 2),
       |pairs AS (
       |  SELECT a.train_id, p.eval_id, round($cosTE, 6) AS cos_sim
       |  FROM assign_t a JOIN probe_e p USING (seed_id)
       |  JOIN tr t2 ON t2.vec_id = a.train_id
       |  JOIN ev e2 ON e2.vec_id = p.eval_id)
       |SELECT train_id AS vec_id, count(*) AS n_eval_hits,
       |  max(cos_sim) AS max_cos, min(eval_id) AS first_eval_id
       |FROM pairs WHERE cos_sim >= 0.3
       |GROUP BY 1 ORDER BY 1""".stripMargin
  }

  /** q91 — C4-shape corpus-global span dedup: the same regex chunking,
    * md5 keep-first decisions and survivor reconstruction as
    * [[graft.llmops.TextOps.spanDedup]] (chr(1) = the engine's \\u0001
    * separator; \\1 = RE2's $1).
    *
    * Memory-lean form (round 10): the keep-first decision runs as a
    * grouped struct-min over (h, doc_id, span_idx) — the heavy relation
    * that DuckDB sorts/partitions carries 32-byte hashes, never raw
    * span strings, and `spans` is MATERIALIZED so the regex chunking
    * runs once (the round-9 window form OOM'd the driver's contended
    * oracle; the engine side was already green).
    */
  private val q91 =
    """WITH sp AS (
      |  SELECT doc_id,
      |    string_split(regexp_replace(text,
      |      '((\S+ ){2}\S+) ', '\1' || chr(1), 'g'), chr(1)) AS sps
      |  FROM documents),
      |spans AS MATERIALIZED (
      |  SELECT doc_id, u.span_idx, u.span, md5(u.span) AS h FROM (
      |    SELECT doc_id, unnest(list_transform(sps,
      |      (x, i) -> struct_pack(span_idx := i - 1, span := x))) AS u
      |    FROM sp) t),
      |firsts AS (
      |  SELECT h, min(struct_pack(d := doc_id, i := span_idx)) AS f
      |  FROM spans GROUP BY h),
      |keep AS (
      |  SELECT s.doc_id, s.span_idx, s.span,
      |    (s.doc_id = struct_extract(f.f, 'd')
      |     AND s.span_idx = struct_extract(f.f, 'i')) AS keep
      |  FROM spans s JOIN firsts f ON f.h = s.h)
      |SELECT doc_id, count(*) AS n_spans,
      |  CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
      |  md5(string_agg(CASE WHEN keep THEN span END, ' '
      |    ORDER BY span_idx)) AS clean_sig,
      |  CAST(sum(CASE WHEN keep THEN length(span) ELSE 0 END)
      |    AS BIGINT) AS n_chars_kept
      |FROM keep GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** q92 — fuzzy part-name pairs: the NAIVE all-pairs levenshtein
    * formulation. The engine runs symmetric-delete blocking + verify
    * ([[graft.llmops.Linkage]]), so the hash match certifies the
    * blocking scheme loses no pair.
    */
  private val q92 =
    """WITH n AS (SELECT DISTINCT p_name AS name FROM part),
      |c AS (SELECT p_name AS name, count(*) AS np FROM part GROUP BY 1),
      |pairs AS (
      |  SELECT a.name AS name_a, b.name AS name_b,
      |    CAST(levenshtein(a.name, b.name) AS INT) AS ed
      |  FROM n a, n b
      |  WHERE a.name < b.name AND levenshtein(a.name, b.name) <= 2)
      |SELECT name_a, name_b, ed, ca.np AS n_parts_a, cb.np AS n_parts_b
      |FROM pairs
      |JOIN c ca ON ca.name = pairs.name_a
      |JOIN c cb ON cb.name = pairs.name_b
      |ORDER BY name_a, name_b""".stripMargin

  /** One z-interleave dimension as a sum of shift/mask terms — the
    * same unrolled algebra as [[graft.operators.Layout.zValue]] (bit i
    * of column j at position i·d + (d−1−j); disjoint bits sum).
    */
  private def zTermsSql(c: String, j: Int, d: Int, bits: Int): String =
    (0 until bits)
      .map(i => s"((($c >> $i) & 1) * ${1L << (i * d + (d - 1 - j))})")
      .mkString(" + ")

  /** q93 — the Morton z-order kernel under the hash gate: interleave
    * the low 8 bits of (l_partkey, l_suppkey), profile 64-cell
    * z-buckets. The bucket bounding boxes ARE the locality property
    * (8×8 key-space rectangles), pinned quantitatively by LayoutSpec.
    */
  private val q93 =
    s"""WITH sc AS (
       |  SELECT l_partkey, l_suppkey,
       |    l_partkey % 256 AS p, l_suppkey % 256 AS s
       |  FROM lineitem),
       |z AS (
       |  SELECT l_partkey, l_suppkey,
       |    (${zTermsSql("p", 0, 2, 8)})
       |    + (${zTermsSql("s", 1, 2, 8)}) AS zval
       |  FROM sc)
       |SELECT (zval >> 6) AS z_bucket, count(*) AS n,
       |  min(l_partkey) AS min_part, max(l_partkey) AS max_part,
       |  min(l_suppkey) AS min_supp, max(l_suppkey) AS max_supp
       |FROM z GROUP BY 1 ORDER BY 1""".stripMargin

  /** q94 — Duffield–Lund–Thorup priority sampling: q = w/u with the
    * md5 24-bit uniform, computed as ONE double division of exact
    * integers so the bits match across engines (see
    * [[graft.llmops.Curation.prioritySample]]); rank ties break by id.
    */
  private val q94 = {
    val fold6 = (1 to 6).map { p =>
      s"(strpos('0123456789abcdef', substr(h, $p, 1)) - 1) * ${1L << (4 * (6 - p))}"
    }.mkString("(", " + ", ")")
    s"""WITH d AS (
       |  SELECT lang, doc_id, $tokSql AS n_tokens,
       |    substr(md5(CAST(doc_id AS VARCHAR)), 1, 6) AS h
       |  FROM documents),
       |p AS (
       |  SELECT lang, doc_id, n_tokens,
       |    (CAST(n_tokens AS DOUBLE) * 16777216.0)
       |      / CAST($fold6 + 1 AS DOUBLE) AS priority
       |  FROM d)
       |SELECT lang, rk, doc_id, n_tokens, priority FROM (
       |  SELECT lang, doc_id, n_tokens, priority,
       |    row_number() OVER (PARTITION BY lang
       |      ORDER BY priority DESC, doc_id) AS rk
       |  FROM p) t
       |WHERE rk <= 10 ORDER BY lang, rk""".stripMargin
  }

  /** q95 — exact set-similarity join, the NAIVE full co-count
    * formulation over distinct trigram-hash sets of corpus + planted
    * truncations. The engine runs prefix-filter blocking
    * ([[graft.llmops.Dedup.setSimilarityJoin]]); the match certifies
    * the prefix bound drops no qualifying pair.
    */
  private val q95 =
    """WITH tr AS (
      |  SELECT doc_id + 20000 AS doc_id,
      |    array_to_string(toks[1:greatest(1, (len(toks)*7)//10)], ' ')
      |      AS text
      |  FROM (SELECT doc_id, string_split(text, ' ') AS toks
      |        FROM documents WHERE doc_id < 200)),
      |corpus AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL SELECT doc_id, text FROM tr),
      |toks0 AS (
      |  SELECT doc_id,
      |    string_split(regexp_replace(lower(text), '\s+', ' ', 'g'), ' ')
      |      AS toks
      |  FROM corpus),
      |bg AS (
      |  SELECT doc_id,
      |    CASE WHEN len(toks) - 2 > 0
      |      THEN list_transform(range(0, len(toks) - 2),
      |             i -> array_to_string(list_slice(toks, i + 1, i + 3), ' '))
      |      ELSE [array_to_string(toks, ' ')] END AS b
      |  FROM toks0),
      |sh AS (
      |  SELECT doc_id,
      |    list_distinct(list_transform(b, s -> substr(md5(s), 1, 16)))
      |      AS sh
      |  FROM bg),
      |sizes AS (SELECT doc_id, len(sh) AS n FROM sh),
      |ex AS (SELECT doc_id, unnest(sh) AS tok FROM sh),
      |pairs AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
      |  FROM ex a JOIN ex b ON a.tok = b.tok AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2),
      |j AS (
      |  SELECT doc_a, doc_b, CAST(sa.n AS BIGINT) AS na,
      |    CAST(sb.n AS BIGINT) AS nb, CAST(inter AS BIGINT) AS inter
      |  FROM pairs
      |  JOIN sizes sa ON sa.doc_id = pairs.doc_a
      |  JOIN sizes sb ON sb.doc_id = pairs.doc_b)
      |SELECT doc_a, doc_b, na, nb, inter AS n_common,
      |  round(CAST(inter AS DOUBLE) / (na + nb - inter), 6) AS jaccard
      |FROM j
      |WHERE CAST(inter AS DOUBLE) / (na + nb - inter) >= 0.5
      |ORDER BY doc_a, doc_b""".stripMargin

  /** q96 — integer-PageRank mirror: the identical BIGINT recurrence as
    * chained CTEs (one c/d/r trio per power iteration, generated by
    * the same loop count the engine runs). Every division is `//`
    * (floor — operands all non-negative, matching Spark's `div`),
    * every sum CAST back to BIGINT (DuckDB widens sum(BIGINT) to
    * HUGEINT); exact arithmetic is what lets an iterative fixpoint be
    * hash-compared at all.
    */
  private val q96 = {
    val iters = 3
    // MATERIALIZED everywhere a relation is referenced more than once:
    // DuckDB inlines plain CTEs, so the round-9 form recomputed the
    // lineitem self-join behind `edges` O(2^iters) times — >200 MB
    // working set at sf0.01 (measured) and the driver's oracle OOM.
    // With materialization the whole statement runs in <50 MB.
    val steps = (1 to iters).map { i =>
      val prev = s"r${i - 1}"
      s"""c$i AS (
         |  SELECT e.dst AS node, CAST(sum(r.pr // d.deg) AS BIGINT) AS contrib
         |  FROM $prev r JOIN outdeg d ON d.node = r.node
         |  JOIN edges e ON e.src = r.node GROUP BY 1),
         |d$i AS (
         |  SELECT CAST(coalesce(sum(r.pr), 0) AS BIGINT) AS dang
         |  FROM $prev r LEFT JOIN outdeg d ON d.node = r.node
         |  WHERE d.node IS NULL),
         |r$i AS MATERIALIZED (
         |  SELECT n0.node,
         |    CAST(150000000000 +
         |      ((coalesce(c.contrib, 0) + d$i.dang // nn.n) // 100) * 85
         |      AS BIGINT) AS pr
         |  FROM nodes n0 LEFT JOIN c$i c ON c.node = n0.node, d$i, nn)"""
        .stripMargin
    }.mkString(",\n")
    s"""WITH seq AS (
       |  SELECT l_orderkey AS ok, l_linenumber AS ln, l_partkey
       |  FROM lineitem),
       |edges AS MATERIALIZED (
       |  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
       |  FROM seq a JOIN seq b
       |    ON a.ok = b.ok AND b.ln = a.ln + 1
       |   AND a.l_partkey <> b.l_partkey),
       |nodes AS MATERIALIZED (
       |  SELECT src AS node FROM edges UNION SELECT dst FROM edges),
       |outdeg AS MATERIALIZED (
       |  SELECT src AS node, CAST(count(*) AS BIGINT) AS deg
       |  FROM edges GROUP BY 1),
       |nn AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
       |r0 AS MATERIALIZED (
       |  SELECT node, CAST(1000000000000 AS BIGINT) AS pr FROM nodes),
       |$steps
       |SELECT node AS part_key, pr AS rank_scaled
       |FROM r$iters ORDER BY pr DESC, node LIMIT 20""".stripMargin
  }

  /** q97 — integer-k-means mirror: the identical quantize/assign/update
    * recurrence with centroids as CTE relations (the engine inlines
    * them as collected literals — same values, different plan). One
    * d/a/g/cent CTE quartet per Lloyd iteration, generated per-dim
    * sum and coalesce columns, row_number argmin with the (dist, cid)
    * tie-break, every quantity CAST BIGINT.
    */
  private val KmIters = 3
  private val KmDim = 64
  private val KmK = 8
  private val KmOff = 1048576L
  private val KmScale = "1000.0"

  private def kmDistTerms(cent: String) = (0 until KmDim).map(j =>
    s"(v.qe[${j + 1}] - c.c$j) * (v.qe[${j + 1}] - c.c$j)")
    .mkString(" + ")

  /** The shared Lloyd-recurrence CTE prelude (v, cent0, a/g/cent per
    * iteration) — q97 reports clusters from it, q102 dequantizes its
    * final centroids into the trained IVF quantizer. Memory-lean form
    * (round 10): v and every cent_i MATERIALIZED so the centroid
    * recurrence is computed once per iteration instead of
    * exponentially re-inlined, and the per-vector argmin is a grouped
    * struct-min — (dist, cid) lexicographic, identical tie-break to
    * the round-9 row_number ORDER BY dist, cid — so no window ever
    * sorts the 64-element quantized vectors.
    */
  private def kmCentroidCtes: String = {
    val qe = "list_transform(embedding, x -> " +
      s"CAST(floor(CAST(x AS DOUBLE) * $KmScale + 0.5) AS BIGINT) + $KmOff)"
    val centSel = (0 until KmDim).map(j => s"qe[${j + 1}] AS c$j")
      .mkString(", ")
    val steps = (1 to KmIters).map { i =>
      val prev = s"cent${i - 1}"
      val sumCols = (0 until KmDim).map(j =>
        s"CAST(sum(v.qe[${j + 1}]) AS BIGINT) AS s$j").mkString(", ")
      val newC = (0 until KmDim).map(j =>
        s"CAST(coalesce(g.s$j // g.n, p.c$j) AS BIGINT) AS c$j")
        .mkString(", ")
      s"""a$i AS (
         |  SELECT v.vec_id, min(struct_pack(dist :=
         |    CAST(${kmDistTerms(prev)} AS BIGINT), cid := c.cid)) AS m
         |  FROM v, $prev c GROUP BY v.vec_id),
         |g$i AS (
         |  SELECT struct_extract(a.m, 'cid') AS cid,
         |    CAST(count(*) AS BIGINT) AS n, $sumCols
         |  FROM a$i a JOIN v ON v.vec_id = a.vec_id GROUP BY 1),
         |cent$i AS MATERIALIZED (
         |  SELECT p.cid, $newC
         |  FROM $prev p LEFT JOIN g$i g ON g.cid = p.cid)"""
        .stripMargin
    }.mkString(",\n")
    s"""v AS MATERIALIZED (SELECT vec_id, $qe AS qe FROM embeddings),
       |cent0 AS MATERIALIZED (
       |  SELECT vec_id AS cid, $centSel
       |  FROM (SELECT vec_id, qe FROM v ORDER BY vec_id LIMIT $KmK)),
       |$steps""".stripMargin
  }

  private val q97 = {
    val iters = KmIters
    val dim = KmDim
    val off = KmOff
    def distTerms(cent: String) = kmDistTerms(cent)
    val normExpr = (0 until dim).map(j =>
      s"(c$j - $off) * (c$j - $off)").mkString(" + ")
    s"""WITH $kmCentroidCtes,
       |af AS (
       |  SELECT v.vec_id, min(struct_pack(dist :=
       |    CAST(${distTerms(s"cent$iters")} AS BIGINT), cid := c.cid)) AS m
       |  FROM v, cent$iters c GROUP BY v.vec_id),
       |fin AS (
       |  SELECT struct_extract(m, 'cid') AS cid,
       |    CAST(count(*) AS BIGINT) AS n_members,
       |    CAST(sum(struct_extract(m, 'dist')) AS BIGINT) AS inertia
       |  FROM af GROUP BY 1),
       |nrm AS (
       |  SELECT cid, CAST($normExpr AS BIGINT) AS centroid_norm2
       |  FROM cent$iters)
       |SELECT f.cid AS cluster, f.n_members, nrm.centroid_norm2,
       |  f.inertia
       |FROM fin f JOIN nrm ON nrm.cid = f.cid ORDER BY cluster"""
      .stripMargin
  }

  /** q98 — kNN-join mirror: the q27 IVF CTEs generalized to a query
    * set (per-query probe rank ≤ nProbe, per-query neighbor rank ≤ k;
    * identical 6-decimal cosine + id tie-break contract).
    */
  private val q98 = {
    val cosQ = cosineSql("embedding", "qe", 64)
    val cosSeed = cosineSql("embedding", "semb", 64)
    val cosQSeed = cosineSql("qe", "semb", 64)
    // Memory-lean form (round 10): the corpus→seed assignment runs as a
    // grouped struct-min over (-cos, seed_id) — identical tie-break to
    // the round-9 "ORDER BY cos DESC, seed_id" window, but the heavy
    // |corpus|×|seeds| relation never carries the 64-dim embedding
    // through a window sort (embeddings rejoin by vec_id afterwards).
    // e/seeds/assign/probes MATERIALIZED so nothing re-inlines.
    s"""WITH e AS MATERIALIZED (SELECT vec_id, embedding FROM embeddings),
       |seeds AS MATERIALIZED (
       |  SELECT vec_id AS seed_id, embedding AS semb FROM e
       |  WHERE vec_id % 97 = 0),
       |am AS (
       |  SELECT e.vec_id, min(struct_pack(nc := -round($cosSeed, 6),
       |    sid := seeds.seed_id)) AS m
       |  FROM e, seeds GROUP BY e.vec_id),
       |assign AS MATERIALIZED (
       |  SELECT a.vec_id, e.embedding,
       |    struct_extract(a.m, 'sid') AS seed_id
       |  FROM am a JOIN e ON e.vec_id = a.vec_id),
       |qs AS (
       |  SELECT vec_id AS q_id, embedding AS qe FROM e
       |  WHERE vec_id % 53 = 0),
       |probes AS MATERIALIZED (
       |  SELECT q_id, qe, seed_id FROM (
       |    SELECT qs.q_id, qs.qe, seeds.seed_id,
       |      row_number() OVER (PARTITION BY qs.q_id
       |        ORDER BY round($cosQSeed, 6) DESC, seed_id) AS rk
       |    FROM qs, seeds) t WHERE rk <= 2),
       |cand AS (
       |  SELECT q_id, vec_id, round($cosQ, 6) AS cos_sim
       |  FROM assign JOIN probes USING (seed_id)
       |  WHERE vec_id <> q_id)
       |SELECT q_id, CAST(rk AS BIGINT) AS rk, vec_id AS nn_id, cos_sim
       |FROM (
       |  SELECT q_id, vec_id, cos_sim,
       |    row_number() OVER (PARTITION BY q_id
       |      ORDER BY cos_sim DESC, vec_id) AS rk
       |  FROM cand) t
       |WHERE rk <= 3 ORDER BY q_id, rk""".stripMargin
  }

  /** q101 — ivfAppend ≡ full-rebuild certificate
    * ([[graft.llmops.Similarity.qIvfAppend]]): the engine builds the
    * index on the 80% landed split and APPENDS the held-out batch;
    * this mirror computes the q98 assignment over the WHOLE corpus —
    * equality in the driver artifact proves the append path
    * reconstructs exactly the full build under the stable quantizer.
    */
  private val q101 = {
    val cosSeed = cosineSql("embedding", "semb", 64)
    s"""WITH e AS MATERIALIZED (SELECT vec_id, embedding FROM embeddings),
       |seeds AS MATERIALIZED (
       |  SELECT vec_id AS seed_id, embedding AS semb FROM e
       |  WHERE vec_id % 97 = 0),
       |am AS (
       |  SELECT e.vec_id, min(struct_pack(nc := -round($cosSeed, 6),
       |    sid := seeds.seed_id)) AS m
       |  FROM e, seeds GROUP BY e.vec_id)
       |SELECT vec_id, struct_extract(m, 'sid') AS seed_id
       |FROM am ORDER BY vec_id""".stripMargin
  }

  /** q102 — the Lloyd-TRAINED IVF quantizer end-to-end
    * ([[graft.llmops.Similarity.qIvfKmeansCells]]): reuse the q97
    * centroid recurrence, dequantize the final centroids with the one
    * IEEE division (c − offset)/scale, replay the round-6 cosine
    * argmax assignment, profile cell occupancy.
    */
  private val q102 = {
    val cos = cosineSql("e.embedding", "d.semb", 64)
    val sembList = (0 until KmDim)
      .map(j => s"CAST(c$j - $KmOff AS DOUBLE) / $KmScale")
      .mkString("list_value(", ", ", ")")
    s"""WITH $kmCentroidCtes,
       |dseeds AS MATERIALIZED (
       |  SELECT cid AS seed_id, $sembList AS semb
       |  FROM cent$KmIters),
       |e AS (SELECT vec_id, embedding FROM embeddings),
       |am AS (
       |  SELECT e.vec_id, min(struct_pack(nc := -round($cos, 6),
       |    sid := d.seed_id)) AS m
       |  FROM e, dseeds d GROUP BY e.vec_id)
       |SELECT struct_extract(m, 'sid') AS seed_id,
       |  CAST(count(*) AS BIGINT) AS n_members
       |FROM am GROUP BY 1 ORDER BY 1""".stripMargin
  }

  /** q106 — column profile mirror
    * ([[graft.operators.Profile.q106TableProfile]]): the same five
    * statistics per profiled column, one UNION ALL branch each (the
    * column list is GENERATED from the Scala constant, so the two
    * sides can never profile different columns).
    */
  private lazy val q106 = {
    val branches = graft.operators.Profile.Q106Cols.map { c =>
      s"""SELECT '$c' AS "column", CAST(count(*) AS BIGINT) AS n_rows,
         |  CAST(count(CASE WHEN $c IS NULL THEN 1 END) AS BIGINT)
         |    AS n_nulls,
         |  CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
         |  CAST(min($c) AS VARCHAR) AS min_val,
         |  CAST(max($c) AS VARCHAR) AS max_val
         |FROM li""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH li AS (
       |  SELECT *, CAST(CAST(l_shipdate AS DATE) AS VARCHAR)
       |    AS l_shipday
       |  FROM lineitem)
       |$branches
       |ORDER BY "column"""".stripMargin
  }

  /** q107 — hybrid RRF retrieval mirror
    * ([[graft.llmops.Retrieval.qHybridRrf]]): term channel = distinct-
    * token overlap counts ranked per query; vector channel = the q19
    * round-6 fixed-order cosine ranked per query; fusion = integer RRF
    * points (`1e9 // (60 + rank)` — DuckDB integer division equals the
    * engine's exact-multiple floor division) summed per (qid, did).
    */
  private val q107 = {
    val toks = "list_distinct(string_split(regexp_replace(lower(text)," +
      " '\\s+', ' ', 'g'), ' '))"
    s"""WITH queries AS (
       |  SELECT doc_id AS qid, text FROM documents WHERE doc_id % 100 = 0),
       |corpus AS (
       |  SELECT doc_id AS did, text FROM documents WHERE doc_id % 100 <> 0),
       |qt AS (SELECT qid, unnest($toks) AS tok FROM queries),
       |ct AS (SELECT did, unnest($toks) AS tok FROM corpus),
       |ovl AS (
       |  SELECT qid, did, count(*) AS overlap
       |  FROM qt JOIN ct USING (tok) GROUP BY qid, did),
       |trank AS (
       |  SELECT qid, did, row_number() OVER
       |    (PARTITION BY qid ORDER BY overlap DESC, did) AS rk
       |  FROM ovl),
       |qv AS (SELECT qid, embedding AS qe
       |  FROM queries JOIN embeddings ON qid = vec_id),
       |cv AS (SELECT did, embedding AS ce
       |  FROM corpus JOIN embeddings ON did = vec_id),
       |cos AS (SELECT qid, did,
       |    round(${cosineSql("ce", "qe", 64)}, 6) AS cos6
       |  FROM cv, qv),
       |vrank AS (
       |  SELECT qid, did, row_number() OVER
       |    (PARTITION BY qid ORDER BY cos6 DESC, did) AS rk
       |  FROM cos),
       |chans AS (
       |  SELECT qid, did, CAST(1000000000 // (60 + rk) AS BIGINT) AS pts,
       |    1 AS in_term, 0 AS in_vec
       |  FROM trank WHERE rk <= 20
       |  UNION ALL
       |  SELECT qid, did, CAST(1000000000 // (60 + rk) AS BIGINT) AS pts,
       |    0 AS in_term, 1 AS in_vec
       |  FROM vrank WHERE rk <= 20),
       |fused AS (
       |  SELECT qid, did, sum(pts) AS rrf_pts,
       |    max(in_term) AS in_term, max(in_vec) AS in_vec
       |  FROM chans GROUP BY qid, did),
       |ranked AS (
       |  SELECT qid, did, rrf_pts, in_term, in_vec, row_number() OVER
       |    (PARTITION BY qid ORDER BY rrf_pts DESC, did) AS fused_rank
       |  FROM fused)
       |SELECT qid, did, CAST(rrf_pts AS BIGINT) AS rrf_pts,
       |  in_term, in_vec, fused_rank
       |FROM ranked WHERE fused_rank <= 10
       |ORDER BY qid, fused_rank""".stripMargin
  }

  /** q108 — BM25 retrieval mirror ([[graft.llmops.Retrieval.qBm25]]):
    * postings/df/corpus-stats CTEs, then the micro-point arithmetic
    * replayed with the ENGINE'S parenthesization — double literals are
    * interpolated from the same Scala expressions the engine
    * evaluates (shortest-roundtrip repr, the q21 hyperplane trick), so
    * e.g. k1+1 is bit-identical on both sides. Rational ln-free idf:
    * division-only IEEE arithmetic, no libm.
    */
  /** The BM25 mirror base CTEs (queries/corpus split, postings, df,
    * corpus stats, the original query-term relation `qt`) — shared by
    * q108/q109/q110/q111 so the gates can never rank differently.
    */
  private def bm25BaseCtesWhere(corpusPred: String,
      corpusText: String = "text") = {
    val toks = "string_split(regexp_replace(lower(text)," +
      " '\\s+', ' ', 'g'), ' ')"
    s"""queries AS (
       |  SELECT doc_id AS qid, text FROM documents WHERE doc_id % 100 = 0),
       |corpus AS (
       |  SELECT doc_id AS did, $corpusText AS text FROM documents
       |  WHERE doc_id % 100 <> 0$corpusPred),
       |ct0 AS (SELECT did, $toks AS toks FROM corpus),
       |tokd AS (SELECT did, len(toks) AS dl0, unnest(toks) AS tok FROM ct0),
       |postings AS (
       |  SELECT did, CAST(dl0 AS DOUBLE) AS dl, tok, count(*) AS tf
       |  FROM tokd GROUP BY did, dl0, tok),
       |dfre AS (SELECT tok, count(*) AS df FROM postings GROUP BY tok),
       |stats AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs,
       |    CAST(sum(len(toks)) AS DOUBLE) / CAST(count(*) AS DOUBLE)
       |      AS avgdl
       |  FROM ct0),
       |qt AS (SELECT qid, unnest(list_distinct($toks)) AS tok
       |  FROM queries)""".stripMargin
  }

  /** The BM25 scoring CTE triple (scored/agg/ranked + `suffix`) over a
    * given query-term relation — the micro-point arithmetic with the
    * ENGINE'S parenthesization; double literals interpolated from the
    * same Scala expressions the engine evaluates (shortest-roundtrip
    * repr, the q21 hyperplane trick), so e.g. k1+1 is bit-identical on
    * both sides. Rational ln-free idf: division-only IEEE, no libm.
    */
  /** The per-posting BM25 contribution with the ENGINE'S
    * parenthesization — shared by the probe-time scoring CTEs and the
    * q128 build-time impact quantization (the engine evaluates the
    * same expression in [[graft.llmops.Retrieval.impactIndexWith]] and
    * [[graft.llmops.Retrieval.bm25ScoreTerms]], which is what makes
    * pre-quantized impacts ≡ direct scoring hash-exact).
    */
  private val bm25ContribSql: String = {
    val k1p1 = s"${1.2 + 1.0}"
    "(((n_docs - CAST(df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5))" +
      s" * ((CAST(tf AS DOUBLE) * $k1p1) / (CAST(tf AS DOUBLE)" +
      " + 1.2 * (0.25 + (0.75 * dl) / avgdl))))"
  }

  private def bm25ScoreCtes(qtName: String, suffix: String): String = {
    val contrib = bm25ContribSql
    s"""scored$suffix AS (
       |  SELECT qid, did,
       |    CAST(floor($contrib * 1000000.0 + 0.5) AS BIGINT) AS pts
       |  FROM $qtName JOIN postings USING (tok) JOIN dfre USING (tok), stats),
       |agg$suffix AS (
       |  SELECT qid, did, sum(pts) AS bm25_micro, count(*) AS n_match
       |  FROM scored$suffix GROUP BY qid, did),
       |ranked$suffix AS (
       |  SELECT qid, did, bm25_micro, n_match, row_number() OVER
       |    (PARTITION BY qid ORDER BY bm25_micro DESC, did) AS rk
       |  FROM agg$suffix)""".stripMargin
  }

  private val bm25BaseCtes = bm25BaseCtesWhere("")

  private val bm25Ctes = s"$bm25BaseCtes,\n${bm25ScoreCtes("qt", "")}"

  /** q125 — index-delete mirror
    * ([[graft.llmops.Retrieval.qBm25Deleted]]): the q108 statement
    * REBUILT over the remaining corpus (did ≢ 3 mod 10) — the engine
    * deletes from a built index, the oracle scores the survivors from
    * scratch, so the hash match is the delete ≡ rebuild certificate.
    */
  private val q125 =
    s"""WITH ${bm25BaseCtesWhere(" AND doc_id % 10 <> 3")},
       |${bm25ScoreCtes("qt", "")}
       |SELECT qid, did, CAST(bm25_micro AS BIGINT) AS bm25_micro,
       |  CAST(n_match AS BIGINT) AS n_match, rk
       |FROM ranked WHERE rk <= 10
       |ORDER BY qid, rk""".stripMargin

  /** q130 — index-upsert mirror
    * ([[graft.llmops.Retrieval.qBm25Upserted]]): the q108 statement
    * REBUILT over the post-update corpus — the did ≡ 3 (mod 10)
    * documents carry their appended `source` token via a CASE WHEN in
    * the corpus CTE — while the engine upserts into a built index, so
    * the hash match is the upsert ≡ rebuild certificate.
    */
  private val q130 =
    s"""WITH ${bm25BaseCtesWhere("",
        "CASE WHEN doc_id % 10 = 3 THEN text || ' ' || source" +
          " ELSE text END")},
       |${bm25ScoreCtes("qt", "")}
       |SELECT qid, did, CAST(bm25_micro AS BIGINT) AS bm25_micro,
       |  CAST(n_match AS BIGINT) AS n_match, rk
       |FROM ranked WHERE rk <= 10
       |ORDER BY qid, rk""".stripMargin

  /** q131 — BM25F mirror ([[graft.llmops.Retrieval.qBm25F]]): field
    * slices (title = first 6 tokens, body = rest), per-field
    * length-normalized tfs, the two-operand weighted sum, ONE
    * saturation over the combined evidence, document-level rational
    * idf — every double literal interpolated from the same Scala
    * expressions the engine evaluates, parenthesization replayed
    * verbatim, contributions micro-rounded then summed as integers.
    */
  private val q131 = {
    val toks = "string_split(regexp_replace(lower(text)," +
      " '\\s+', ' ', 'g'), ' ')"
    val oneMinusBt = s"${1.0 - 0.5}"
    val oneMinusBb = s"${1.0 - 0.75}"
    val idf = "((n_docs - CAST(df AS DOUBLE) + 0.5)" +
      " / (CAST(df AS DOUBLE) + 0.5))"
    val tNorm = s"(CAST(tf_t AS DOUBLE) / ($oneMinusBt" +
      " + ((0.5 * tl) / avg_tl)))"
    val bNorm = s"(CAST(tf_b AS DOUBLE) / ($oneMinusBb" +
      " + ((0.75 * bl) / avg_bl)))"
    val wtf = s"((2.0 * $tNorm) + (1.0 * $bNorm))"
    s"""WITH queries AS (
       |  SELECT doc_id AS qid, text FROM documents WHERE doc_id % 100 = 0),
       |corpus AS (
       |  SELECT doc_id AS did, text FROM documents
       |  WHERE doc_id % 100 <> 0),
       |ct0 AS (SELECT did, $toks AS toks FROM corpus),
       |flds AS (SELECT did, list_slice(toks, 1, 6) AS ttoks,
       |    list_slice(toks, 7, len(toks)) AS btoks
       |  FROM ct0),
       |fp0 AS (
       |  SELECT did, tl, bl, is_title, tok, count(*) AS tf FROM (
       |    SELECT did, len(ttoks) AS tl, len(btoks) AS bl,
       |      1 AS is_title, unnest(ttoks) AS tok FROM flds
       |    UNION ALL
       |    SELECT did, len(ttoks) AS tl, len(btoks) AS bl,
       |      0 AS is_title, unnest(btoks) AS tok FROM flds)
       |  GROUP BY did, tl, bl, is_title, tok),
       |fielded AS (
       |  SELECT did, tok,
       |    coalesce(max(CASE WHEN is_title = 1 THEN tf END), 0) AS tf_t,
       |    coalesce(max(CASE WHEN is_title = 0 THEN tf END), 0) AS tf_b,
       |    max(tl) AS tl, max(bl) AS bl
       |  FROM fp0 GROUP BY did, tok),
       |docs AS (SELECT DISTINCT did, tl, bl FROM fielded),
       |stats AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs,
       |    CAST(sum(tl) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_tl,
       |    CAST(sum(bl) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_bl
       |  FROM docs),
       |dfre AS (SELECT tok, count(*) AS df FROM fielded GROUP BY tok),
       |qt AS (SELECT qid, unnest(list_distinct($toks)) AS tok
       |  FROM queries),
       |scored AS (
       |  SELECT qid, did,
       |    CAST(floor(($idf * ($wtf / (1.2 + $wtf))) * 1000000.0 + 0.5)
       |      AS BIGINT) AS pts
       |  FROM qt JOIN dfre USING (tok) JOIN fielded USING (tok), stats),
       |agg AS (
       |  SELECT qid, did, sum(pts) AS bm25f_micro, count(*) AS n_match
       |  FROM scored GROUP BY qid, did),
       |ranked AS (
       |  SELECT qid, did, bm25f_micro, n_match, row_number() OVER
       |    (PARTITION BY qid ORDER BY bm25f_micro DESC, did) AS rk
       |  FROM agg)
       |SELECT qid, did, CAST(bm25f_micro AS BIGINT) AS bm25f_micro,
       |  CAST(n_match AS BIGINT) AS n_match, rk
       |FROM ranked WHERE rk <= 10
       |ORDER BY qid, rk""".stripMargin
  }

  /** q132 — MMR diversification mirror
    * ([[graft.llmops.Retrieval.qMmrDiversify]]): the 5-round greedy
    * trace UNROLLED as a CTE chain (pen → score → pick → selall → rem
    * per round, generated by the same loop bound the engine iterates),
    * candidates and pairwise similarities from the unrolled round-6
    * cosine, every objective an exact integer (7·rel − 3·maxsim) with
    * did tie-breaks — so the pick ORDER hash-gates, not just the set.
    * Every CTE of the chain is MATERIALIZED: inlined, each round
    * re-expands the unrolled-cosine CTEs once per reference
    * (pen2..pen5 each pull sims → candv → cand → cos) and the
    * statement OOM'd a 500 MB oracle_stress limit at 20 s;
    * materialized it runs in 0.5 s.
    */
  private val q132 = {
    val k = 5
    val cos = cosineSql("ce", "qe", 64)
    val simCos = cosineSql("ea", "eb", 64)
    val base =
      s"""qv AS (
         |  SELECT d.doc_id AS qid, e.embedding AS qe
         |  FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
         |  WHERE d.doc_id % 100 = 0),
         |cv AS (
         |  SELECT d.doc_id AS did, e.embedding AS ce
         |  FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
         |  WHERE d.doc_id % 100 <> 0),
         |cos AS MATERIALIZED (SELECT qid, did, round($cos, 6) AS cos6 FROM cv, qv),
         |crank AS MATERIALIZED (
         |  SELECT qid, did, cos6, row_number() OVER
         |    (PARTITION BY qid ORDER BY cos6 DESC, did) AS rk
         |  FROM cos),
         |cand AS MATERIALIZED (
         |  SELECT qid, did,
         |    CAST(floor(cos6 * 1000000.0 + 0.5) AS BIGINT) AS rel_micro
         |  FROM crank WHERE rk <= 12),
         |candv AS MATERIALIZED (
         |  SELECT c.qid, c.did, e.embedding AS emb
         |  FROM cand c JOIN embeddings e ON c.did = e.vec_id),
         |sims AS MATERIALIZED (
         |  SELECT x.qid, x.did_a, y.did_b,
         |    CAST(floor(round($simCos, 6) * 1000000.0 + 0.5) AS BIGINT)
         |      AS sim_micro
         |  FROM (SELECT qid, did AS did_a, emb AS ea FROM candv) x
         |  JOIN (SELECT qid AS qid_y, did AS did_b, emb AS eb FROM candv) y
         |    ON x.qid = y.qid_y AND x.did_a <> y.did_b),
         |rem1 AS MATERIALIZED (SELECT qid, did, rel_micro FROM cand)""".stripMargin
    val steps = (1 to k).map { j =>
      val score =
        if (j == 1)
          s"""score1 AS MATERIALIZED (
             |  SELECT qid, did, rel_micro,
             |    (7 * rel_micro) - (3 * 0) AS mmr
             |  FROM rem1)""".stripMargin
        else
          s"""pen$j AS MATERIALIZED (
             |  SELECT s.qid, s.did_a AS did, max(s.sim_micro) AS pen
             |  FROM sims s JOIN selall${j - 1} p
             |    ON p.qid = s.qid AND p.did = s.did_b
             |  GROUP BY s.qid, s.did_a),
             |score$j AS MATERIALIZED (
             |  SELECT r.qid, r.did, r.rel_micro,
             |    (7 * r.rel_micro) - (3 * coalesce(p.pen, 0)) AS mmr
             |  FROM rem$j r LEFT JOIN pen$j p
             |    ON p.qid = r.qid AND p.did = r.did)""".stripMargin
      val pick =
        s"""pick$j AS MATERIALIZED (
           |  SELECT qid, did, rel_micro, mmr, $j AS pick FROM (
           |    SELECT qid, did, rel_micro, mmr, row_number() OVER
           |      (PARTITION BY qid ORDER BY mmr DESC, did) AS rn
           |    FROM score$j)
           |  WHERE rn = 1)""".stripMargin
      val selall =
        if (j == 1) "selall1 AS MATERIALIZED (SELECT * FROM pick1)"
        else
          s"""selall$j AS MATERIALIZED (
             |  SELECT * FROM selall${j - 1}
             |  UNION ALL SELECT * FROM pick$j)""".stripMargin
      val rem =
        if (j == k) ""
        else
          s""",
             |rem${j + 1} AS MATERIALIZED (
             |  SELECT r.qid, r.did, r.rel_micro
             |  FROM rem$j r ANTI JOIN pick$j p
             |    ON p.qid = r.qid AND p.did = r.did)""".stripMargin
      s"$score,\n$pick,\n$selall$rem"
    }.mkString(",\n")
    s"""WITH $base,
       |$steps
       |SELECT qid, did, rel_micro, CAST(mmr AS BIGINT) AS mmr_pts, pick
       |FROM selall$k
       |ORDER BY qid, pick""".stripMargin
  }

  /** q134 — min–max weighted fusion mirror
    * ([[graft.llmops.Retrieval.qMinMaxFusion]]): BM25 top-20 micro
    * scores and round-6 cosine micro top-20, each min–max normalized
    * per query with integer `//` (the min-shift keeps numerators
    * non-negative, where `//` matches the engine's div), weighted
    * 3/2, summed, ranked. All-integer, so fused scores, flags and
    * ranks replay exactly.
    */
  private val q134 = {
    val cos = cosineSql("ce", "qe", 64)
    s"""WITH $bm25Ctes,
       |term AS MATERIALIZED (
       |  SELECT qid, did, CAST(bm25_micro AS BIGINT) AS score
       |  FROM ranked WHERE rk <= 20),
       |qv AS (
       |  SELECT q.qid, e.embedding AS qe
       |  FROM queries q JOIN embeddings e ON q.qid = e.vec_id),
       |cv AS (
       |  SELECT c.did, e.embedding AS ce
       |  FROM corpus c JOIN embeddings e ON c.did = e.vec_id),
       |cos AS MATERIALIZED (SELECT qid, did, round($cos, 6) AS cos6 FROM cv, qv),
       |vrank AS (
       |  SELECT qid, did, cos6, row_number() OVER
       |    (PARTITION BY qid ORDER BY cos6 DESC, did) AS rk
       |  FROM cos),
       |vec AS MATERIALIZED (
       |  SELECT qid, did,
       |    CAST(floor(cos6 * 1000000.0 + 0.5) AS BIGINT) AS score
       |  FROM vrank WHERE rk <= 20),
       |text AS (
       |  SELECT t.qid, t.did,
       |    3 * (CASE WHEN x.mx = x.mn THEN 1000000
       |      ELSE ((t.score - x.mn) * 1000000) // (x.mx - x.mn) END)
       |      AS pts,
       |    1 AS in_term, 0 AS in_vec
       |  FROM term t JOIN (
       |    SELECT qid, min(score) AS mn, max(score) AS mx
       |    FROM term GROUP BY qid) x ON t.qid = x.qid
       |  UNION ALL
       |  SELECT v.qid, v.did,
       |    2 * (CASE WHEN y.mx = y.mn THEN 1000000
       |      ELSE ((v.score - y.mn) * 1000000) // (y.mx - y.mn) END)
       |      AS pts,
       |    0 AS in_term, 1 AS in_vec
       |  FROM vec v JOIN (
       |    SELECT qid, min(score) AS mn, max(score) AS mx
       |    FROM vec GROUP BY qid) y ON v.qid = y.qid),
       |fused AS (
       |  SELECT qid, did, sum(pts) AS fused_pts,
       |    max(in_term) AS in_term, max(in_vec) AS in_vec
       |  FROM text GROUP BY qid, did),
       |franked AS (
       |  SELECT qid, did, fused_pts, in_term, in_vec, row_number() OVER
       |    (PARTITION BY qid ORDER BY fused_pts DESC, did) AS fused_rank
       |  FROM fused)
       |SELECT qid, did, CAST(fused_pts AS BIGINT) AS fused_pts,
       |  in_term, in_vec, fused_rank
       |FROM franked WHERE fused_rank <= 10
       |ORDER BY qid, fused_rank""".stripMargin
  }

  /** q136 — rank-biased-overlap mirror
    * ([[graft.llmops.Retrieval.qRboRuns]]): the q108 BM25 top-10 and
    * the q107 term-overlap top-10 rebuilt from the shared base CTEs,
    * then every depth term replayed as
    * (1e6·overlap_d) // (d · (1 << d)) — integer-exact at p = 1/2 —
    * summed per query, plus overlap@k and agreement@k.
    */
  private val q136 =
    s"""WITH $bm25Ctes,
       |runa AS (SELECT qid, did, rk FROM ranked WHERE rk <= 10),
       |ctd AS (SELECT did, unnest(list_distinct(toks)) AS tok FROM ct0),
       |ovl AS (
       |  SELECT qid, did, count(*) AS overlap
       |  FROM qt JOIN ctd USING (tok) GROUP BY qid, did),
       |runb AS (
       |  SELECT qid, did, rk FROM (
       |    SELECT qid, did, row_number() OVER
       |      (PARTITION BY qid ORDER BY overlap DESC, did) AS rk
       |    FROM ovl)
       |  WHERE rk <= 10),
       |joined AS (
       |  SELECT a.qid, greatest(a.rk, b.rk) AS mx
       |  FROM runa a JOIN runb b ON a.qid = b.qid AND a.did = b.did),
       |depths AS (
       |  SELECT qid, unnest(range(1, 11)) AS d
       |  FROM (SELECT DISTINCT qid FROM runa)),
       |ovd AS (
       |  SELECT dp.qid, dp.d,
       |    sum(CASE WHEN j.mx <= dp.d THEN 1 ELSE 0 END) AS overlap
       |  FROM depths dp LEFT JOIN joined j ON j.qid = dp.qid
       |  GROUP BY dp.qid, dp.d),
       |terms AS (
       |  SELECT qid, d, overlap,
       |    (1000000 * overlap) // (d * (CAST(1 AS BIGINT) << d)) AS term
       |  FROM ovd)
       |SELECT qid, CAST(sum(term) AS BIGINT) AS rbo_micro,
       |  CAST(max(CASE WHEN d = 10 THEN overlap END) AS BIGINT)
       |    AS overlap_k,
       |  CAST((1000000 * max(CASE WHEN d = 10 THEN overlap END)) // 10
       |    AS BIGINT) AS agree_micro
       |FROM terms GROUP BY qid
       |ORDER BY qid""".stripMargin

  private val q108 =
    s"""WITH $bm25Ctes
       |SELECT qid, did, CAST(bm25_micro AS BIGINT) AS bm25_micro,
       |  CAST(n_match AS BIGINT) AS n_match, rk
       |FROM ranked WHERE rk <= 10
       |ORDER BY qid, rk""".stripMargin

  /** q127 — sequence-packing mirror
    * ([[graft.llmops.TextOps.qSequencePacking]]): the NAIVE
    * formulation — one global window cumsum over doc_id order — which
    * is exactly what the engine's two-level bucket prefix sum must
    * equal, so the hash match is the two-level ≡ naive certificate.
    * DuckDB `//`/`%` on non-negative BIGINTs match the engine's
    * subtract-pmod div and pmod.
    */
  private val q127 = {
    val toks = "string_split(regexp_replace(lower(text)," +
      " '\\s+', ' ', 'g'), ' ')"
    s"""WITH c AS (
       |  SELECT doc_id, CAST(len($toks) AS BIGINT) AS n_tokens
       |  FROM documents),
       |s AS (
       |  SELECT doc_id, n_tokens,
       |    CAST(coalesce(sum(n_tokens + 1) OVER (ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |      AS BIGINT) AS start_tok
       |  FROM c)
       |SELECT doc_id, n_tokens, start_tok,
       |  CAST(start_tok // 512 AS BIGINT) AS seq_id,
       |  CAST(start_tok % 512 AS BIGINT) AS seq_offset
       |FROM s ORDER BY doc_id""".stripMargin
  }

  /** Unrolled Feistel rounds for
    * [[graft.llmops.TextOps.epochShuffleKey]], as a CTE chain (one CTE
    * per round — inlining would nest the round expression
    * exponentially). Round keys come from the SAME
    * `TextOps.epochShuffleRoundKeys` Scala values the engine embeds as
    * literals, so the two sides cannot drift; all arithmetic is
    * non-negative BIGINT below 2^62 (`//`/`%`/xor/`>>` match Spark's
    * subtract-pmod div, pmod, bitwiseXOR and shiftright exactly).
    * Precondition ASYMMETRY: the engine's `epochShuffleKey` raises
    * row-level on ids outside [0, 2^62), while this mirror has no
    * guard — DuckDB's `//`/`%` floor-divide negatives and would
    * silently produce keys. The shared domain holds by construction
    * (q137's packing seq_ids are non-negative exact-multiple
    * divisions), so the mirror replays identical arithmetic only on
    * in-domain ids; feeding it an unguarded id column is a mirror
    * authoring bug, not an engine-parity statement.
    * Returns (CTE text chained from `src`, final-table name, key
    * expression over that table's columns).
    */
  private def feistelCtes(src: String, idCol: String, epoch: Long,
      pfx: String): (String, String, String) = {
    val keys = graft.llmops.TextOps.epochShuffleRoundKeys(epoch)
    val half = 1L << 31
    val cte0 =
      s"""${pfx}0 AS (
         |  SELECT *, $idCol // $half AS ${pfx}_l0,
         |    $idCol % $half AS ${pfx}_r0
         |  FROM $src)""".stripMargin
    val rounds = keys.zipWithIndex.map { case (k, i) =>
      val n = i + 1
      s"""${pfx}$n AS (
         |  SELECT *, ${pfx}_r$i AS ${pfx}_l$n,
         |    xor(${pfx}_l$i, xor(${pfx}_m$n, ${pfx}_m$n >> 15))
         |      AS ${pfx}_r$n
         |  FROM (SELECT *,
         |    (${pfx}_r$i * 1103515245 + $k) % $half AS ${pfx}_m$n
         |    FROM ${pfx}$i) ${pfx}_t$n)""".stripMargin
    }
    ((cte0 +: rounds).mkString(",\n"), s"${pfx}4",
      s"(${pfx}_l4 * $half + ${pfx}_r4)")
  }

  /** q137 — training-order shuffle mirror
    * ([[graft.llmops.TextOps.qEpochShuffle]]): the q127 naive packing
    * cumsum yields the distinct seq_ids, then the epoch-1 and epoch-2
    * Feistel chains replay [[feistelCtes]] back to back.
    */
  private val q137 = {
    val toks = "string_split(regexp_replace(lower(text)," +
      " '\\s+', ' ', 'g'), ' ')"
    val (e1Ctes, e1Tbl, e1Key) = feistelCtes("ids", "seq_id", 1L, "e1")
    val (e2Ctes, _, e2Key) = feistelCtes(e1Tbl, "seq_id", 2L, "e2")
    s"""WITH c AS (
       |  SELECT doc_id, CAST(len($toks) AS BIGINT) AS n_tokens
       |  FROM documents),
       |s AS (
       |  SELECT doc_id,
       |    CAST(coalesce(sum(n_tokens + 1) OVER (ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |      AS BIGINT) AS start_tok
       |  FROM c),
       |ids AS (
       |  SELECT DISTINCT CAST(start_tok // 512 AS BIGINT) AS seq_id
       |  FROM s),
       |$e1Ctes,
       |$e2Ctes
       |SELECT seq_id, $e1Key AS shuffle_key_e1, $e2Key AS shuffle_key_e2
       |FROM e24 ORDER BY shuffle_key_e1""".stripMargin
  }

  /** q138 — unigram-LM seed-candidate mirror
    * ([[graft.llmops.Unigram.qUnigramSeed]]): the q74 token dict, then
    * every substring of length 1..4 of every word (one UNION ALL arm
    * per length — DuckDB's range() needs a constant-per-arm substring
    * width to stay off the descending-range edge, exactly the engine's
    * `least`/inner-bound guard), corpus-weighted. Empty tokens carry
    * no substring on either side (`length(tok) >= l` per arm; the
    * engine filters length >= 1 before exploding).
    */
  private val q138 = {
    val arms = (1 to 4).map { l =>
      s"""SELECT tf, unnest(list_transform(range(1, length(tok) - $l + 2),
         |    i -> substr(tok, CAST(i AS INTEGER), $l))) AS piece
         |  FROM tf WHERE length(tok) >= $l""".stripMargin
    }.mkString("\n  UNION ALL\n  ")
    s"""WITH toks0 AS (
       |  SELECT string_split(regexp_replace(lower(text), '\\s+', ' ', 'g'),
       |    ' ') AS toks
       |  FROM documents),
       |tf AS (
       |  SELECT t AS tok, count(*) AS tf
       |  FROM (SELECT unnest(toks) AS t FROM toks0)
       |  WHERE length(t) >= 1 GROUP BY 1),
       |p AS (
       |  $arms)
       |SELECT piece, CAST(sum(tf) AS BIGINT) AS weighted_n,
       |  count(*) AS n_positions
       |FROM p GROUP BY piece
       |ORDER BY weighted_n DESC, piece LIMIT 50""".stripMargin
  }

  /** q139 — JL random-projection mirror
    * ([[graft.llmops.Similarity.qRandomProjection]]): the ±1 sign
    * matrix is REBUILT from DuckDB's own md5 (first-hex-digit value
    * parity over the same "rp_j_k" keys the engine digests with
    * Java's MessageDigest — independent md5s agreeing on all 1024
    * cells is part of the certificate), embeddings unnest with
    * generate_subscripts, quantize with the shared floor(x·1e6 + 0.5)
    * spelling, and each component is the signed BIGINT sum.
    */
  private val q139 =
    s"""WITH sgn AS MATERIALIZED (
       |  SELECT j, k,
       |    CASE WHEN ((strpos('0123456789abcdef',
       |      substr(md5('rp_' || j || '_' || k), 1, 1)) - 1) % 2) = 0
       |      THEN 1 ELSE -1 END AS s
       |  FROM (SELECT unnest(range(1, 65)) AS j),
       |       (SELECT unnest(range(1, 17)) AS k)),
       |qv AS MATERIALIZED (
       |  SELECT vec_id,
       |    CAST(generate_subscripts(embedding, 1) AS BIGINT) AS j,
       |    CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000 + 0.5)
       |      AS BIGINT) AS q
       |  FROM embeddings)
       |SELECT vec_id, CAST(k AS BIGINT) AS k,
       |  CAST(sum(s * q) AS BIGINT) AS comp
       |FROM qv JOIN sgn USING (j)
       |GROUP BY vec_id, k ORDER BY vec_id, k""".stripMargin

  /** q140 — DSIR importance-resampling mirror
    * ([[graft.llmops.Curation.qDsirSelect]]): hashed unigram+bigram
    * features rebuilt with the q126 list comprehension (unigrams over
    * every document, bigrams over ≥2-token documents) and the 24-bit
    * md5 bucket, both Laplace-smoothed fits, and the
    * [[graft.llmops.Curation.log2Fix]] integer squaring recurrence
    * unrolled as 16 CTE rounds — `//` on non-negative BIGINT is the
    * engine's `>>`, the mantissa CASEs replay the normalization
    * shifts, so bucket weights and document scores are bit-for-bit
    * the engine's Longs. The four log stacks (per-bucket t/r plus the
    * two corpus totals) run through ONE chain via a tagged union.
    */
  private val q140 = {
    val toks = "string_split(regexp_replace(lower(text)," +
      " '\\s+', ' ', 'g'), ' ')"
    val eCase = "CASE " + (40 to 0 by -1).map(k =>
      s"WHEN n >= ${1L << k} THEN $k").mkString(" ") + " END"
    val mCase = "CASE e " + (0 to 40).map { k =>
      if (k <= 30) s"WHEN $k THEN n * ${1L << (30 - k)}"
      else s"WHEN $k THEN n // ${1L << (k - 30)}"
    }.mkString(" ") + " END"
    val rounds = (1 to 16).map { i =>
      s"""lg$i AS (
         |  SELECT b, wh, e,
         |    CASE WHEN (m * m) // 1073741824 >= 2147483648
         |      THEN ((m * m) // 1073741824) // 2
         |      ELSE (m * m) // 1073741824 END AS m,
         |    frac * 2 + (CASE WHEN (m * m) // 1073741824 >= 2147483648
         |      THEN 1 ELSE 0 END) AS frac
         |  FROM lg${i - 1})""".stripMargin
    }.mkString(",\n")
    s"""WITH tk AS (
       |  SELECT doc_id, lang = 'en' AS is_t, $toks AS toks
       |  FROM documents),
       |feats AS (
       |  SELECT doc_id, is_t, unnest(toks) AS f FROM tk
       |  UNION ALL
       |  SELECT doc_id, is_t,
       |    unnest(list_transform(range(0, len(toks) - 1),
       |      i -> array_to_string(list_slice(toks, i + 1, i + 2), ' ')))
       |  FROM tk WHERE len(toks) >= 2),
       |db AS MATERIALIZED (
       |  SELECT doc_id, is_t,
       |    ('0x' || substr(md5(f), 1, 6))::BIGINT % 1024 AS b,
       |    CAST(count(*) AS BIGINT) AS cnt
       |  FROM feats GROUP BY doc_id, is_t, b),
       |fit AS MATERIALIZED (
       |  SELECT b, CAST(sum(cnt) AS BIGINT) AS r,
       |    CAST(sum(CASE WHEN is_t THEN cnt ELSE 0 END) AS BIGINT) AS t
       |  FROM db GROUP BY b),
       |stack AS (
       |  SELECT b, 'r' AS wh, r + 1 AS n FROM fit
       |  UNION ALL SELECT b, 't' AS wh, t + 1 AS n FROM fit
       |  UNION ALL SELECT CAST(-1 AS BIGINT), 'R',
       |    (SELECT CAST(sum(r) AS BIGINT) FROM fit) + 1024
       |  UNION ALL SELECT CAST(-1 AS BIGINT), 'T',
       |    (SELECT CAST(sum(t) AS BIGINT) FROM fit) + 1024),
       |lge AS (
       |  SELECT b, wh, n, $eCase AS e
       |  FROM (SELECT b, wh, CAST(n AS BIGINT) AS n FROM stack)),
       |lg0 AS (
       |  SELECT b, wh, e, $mCase AS m, CAST(0 AS BIGINT) AS frac
       |  FROM lge),
       |$rounds,
       |lgf AS MATERIALIZED (
       |  SELECT b, wh, CAST(e AS BIGINT) * 65536 + frac AS lf
       |  FROM lg16),
       |wt AS (
       |  SELECT tt.b,
       |    (tt.lf - (SELECT lf FROM lgf WHERE wh = 'T'))
       |      - (rr.lf - (SELECT lf FROM lgf WHERE wh = 'R')) AS wb
       |  FROM lgf tt JOIN lgf rr ON tt.b = rr.b
       |  WHERE tt.wh = 't' AND rr.wh = 'r'),
       |sc AS (
       |  SELECT doc_id, CAST(sum(cnt * wb) AS BIGINT) AS dsir_score,
       |    CAST(sum(cnt) AS BIGINT) AS n_feat
       |  FROM db JOIN wt USING (b) GROUP BY doc_id
       |  ORDER BY dsir_score DESC, doc_id LIMIT 200)
       |SELECT sc.doc_id, d.lang, n_feat, dsir_score
       |FROM sc JOIN documents d ON sc.doc_id = d.doc_id
       |ORDER BY dsir_score DESC, sc.doc_id""".stripMargin
  }

  /** q141 — WordPiece seed-merge mirror
    * ([[graft.llmops.WordPiece.qWordpieceSeed]]): the q74 token dict,
    * the `##`-convention character-symbol lists (q74's substr/length
    * character parity), both count relations, and the likelihood
    * score c_ab/(c_a·c_b) quantized with the engine's exact double op
    * sequence — one divide of correctly-rounded products, ·1e12,
    * floor(+0.5) (pico units: the scores are ≤ 1). Zipped unnests
    * build the adjacent pairs positionally (the q139 pattern), never
    * a positional self-join.
    */
  private val q141 =
    """WITH toks0 AS (
      |  SELECT string_split(regexp_replace(lower(text), '\s+', ' ', 'g'),
      |    ' ') AS toks
      |  FROM documents),
      |tf AS (
      |  SELECT t AS tok, count(*) AS tf
      |  FROM (SELECT unnest(toks) AS t FROM toks0) GROUP BY 1),
      |symlist AS MATERIALIZED (
      |  SELECT tf, list_transform(range(1, length(tok) + 1),
      |    i -> CASE WHEN i = 1 THEN substr(tok, 1, 1)
      |         ELSE '##' || substr(tok, CAST(i AS INTEGER), 1) END) AS ss
      |  FROM tf),
      |sc AS MATERIALIZED (
      |  SELECT s, CAST(sum(tf) AS BIGINT) AS c_s
      |  FROM (SELECT tf, unnest(ss) AS s FROM symlist) GROUP BY s),
      |pr AS (
      |  SELECT a, b, CAST(sum(tf) AS BIGINT) AS c_ab
      |  FROM (
      |    SELECT tf,
      |      unnest(list_transform(range(1, len(ss)),
      |        i -> ss[CAST(i AS INTEGER)])) AS a,
      |      unnest(list_transform(range(1, len(ss)),
      |        i -> ss[CAST(i AS INTEGER) + 1])) AS b
      |    FROM symlist WHERE len(ss) >= 2)
      |  GROUP BY a, b)
      |SELECT a, b, c_ab, sa.c_s AS c_a, sb.c_s AS c_b,
      |  CAST(floor(CAST(c_ab AS DOUBLE)
      |    / (CAST(sa.c_s AS DOUBLE) * CAST(sb.c_s AS DOUBLE))
      |    * 1000000000000.0 + 0.5) AS BIGINT) AS score_pico
      |FROM pr JOIN sc sa ON pr.a = sa.s JOIN sc sb ON pr.b = sb.s
      |ORDER BY score_pico DESC, a, b LIMIT 100""".stripMargin

  /** q142 — k-center coreset mirror
    * ([[graft.llmops.Cluster.qKcenterCoreset]]): embeddings flattened
    * ONCE into 64 micro-quantized BIGINT columns (the q90
    * flat-embedding lesson — no list re-extraction in later stages),
    * then the 7 greedy rounds unroll as CTE stages: argmax by
    * (min-dist desc, id), exact Long squared-Euclidean sums in the
    * same per-dimension terms, strict-improvement re-assignment
    * (earlier center wins ties), and the k-row report groups the
    * final assignment. Integer arithmetic end-to-end — the engine's
    * Longs bit-for-bit.
    */
  private val q142 = {
    val dim = 64
    val k = 8
    val qCols = (1 to dim).map(j =>
      s"CAST(floor(CAST(embedding[$j] AS DOUBLE) * 1000000 + 0.5) " +
        s"AS BIGINT) AS q$j").mkString(", ")
    def dist(a: String, c: String): String =
      (1 to dim).map(j => s"($a.q$j - $c.q$j) * ($a.q$j - $c.q$j)")
        .mkString(" + ")
    val rounds = (1 to k - 1).map { r =>
      s"""c$r AS MATERIALIZED (
         |  SELECT q.* FROM q JOIN (
         |    SELECT vec_id FROM s${r - 1}
         |    ORDER BY md DESC, vec_id LIMIT 1) t USING (vec_id)),
         |s$r AS MATERIALIZED (
         |  SELECT vec_id, CASE WHEN d < md THEN d ELSE md END AS md,
         |    CASE WHEN d < md THEN cid ELSE ac END AS ac
         |  FROM (
         |    SELECT s.vec_id, s.md, s.ac, ${dist("a", "c")} AS d,
         |      c.vec_id AS cid
         |    FROM s${r - 1} s JOIN q a USING (vec_id), c$r c) z)"""
        .stripMargin
    }.mkString(",\n")
    val cent = (0 until k).map(r =>
      s"SELECT CAST($r AS BIGINT) AS rk, vec_id FROM c$r")
      .mkString(" UNION ALL ")
    s"""WITH q AS MATERIALIZED (
       |  SELECT vec_id, $qCols FROM embeddings),
       |c0 AS MATERIALIZED (
       |  SELECT * FROM q ORDER BY vec_id LIMIT 1),
       |s0 AS MATERIALIZED (
       |  SELECT a.vec_id, ${dist("a", "c")} AS md, c.vec_id AS ac
       |  FROM q a, c0 c),
       |$rounds,
       |cent AS ($cent)
       |SELECT cent.rk, s${k - 1}.ac AS center_id,
       |  CAST(count(*) AS BIGINT) AS n_points,
       |  CAST(max(md) AS BIGINT) AS radius_micro2
       |FROM s${k - 1} JOIN cent ON s${k - 1}.ac = cent.vec_id
       |GROUP BY cent.rk, s${k - 1}.ac
       |ORDER BY cent.rk""".stripMargin
  }

  /** q128 — champion-list pruning mirror
    * ([[graft.llmops.Retrieval.qBm25Pruned]]): impacts quantized per
    * (tok, did) with [[bm25ContribSql]] (the build-time arithmetic the
    * engine's impactIndex evaluates), pruned to each term's top 24 by
    * (impact desc, did) — the window replayed verbatim — then the
    * summed-micro probe. Pins the PRUNING semantics, not equivalence
    * to full scoring (champion lists are lossy by design).
    */
  /** q135 — tiered-serving mirror
    * ([[graft.llmops.Retrieval.qBm25Tiered]]): the q128 quantize →
    * prune fragments, tier-1 scoring over the pruned relation, the
    * per-query fill count (HAVING count = topN), and the
    * fallback arm scored over the FULL impacts for underfull queries —
    * the complete broker CASE replayed even where (as on this dense
    * corpus) the fallback stays dormant.
    */
  private val q135 =
    s"""WITH $bm25BaseCtes,
       |imp AS (
       |  SELECT tok, did,
       |    CAST(floor($bm25ContribSql * 1000000.0 + 0.5) AS BIGINT)
       |      AS impact_micro
       |  FROM postings JOIN dfre USING (tok), stats),
       |pruned AS (
       |  SELECT tok, did, impact_micro FROM (
       |    SELECT tok, did, impact_micro, row_number() OVER
       |      (PARTITION BY tok ORDER BY impact_micro DESC, did) AS prk
       |    FROM imp)
       |  WHERE prk <= 24),
       |t1agg AS (
       |  SELECT qid, did, sum(impact_micro) AS bm25_micro,
       |    count(*) AS n_match
       |  FROM qt JOIN pruned USING (tok) GROUP BY qid, did),
       |t1 AS (
       |  SELECT qid, did, bm25_micro, n_match, rk FROM (
       |    SELECT qid, did, bm25_micro, n_match, row_number() OVER
       |      (PARTITION BY qid ORDER BY bm25_micro DESC, did) AS rk
       |    FROM t1agg)
       |  WHERE rk <= 10),
       |okq AS (SELECT qid FROM t1 GROUP BY qid HAVING count(*) = 10),
       |kept AS (
       |  SELECT qid, did, bm25_micro, n_match, rk, 1 AS tier
       |  FROM t1 JOIN okq USING (qid)),
       |fbq AS (SELECT DISTINCT qid FROM qt ANTI JOIN okq USING (qid)),
       |fallagg AS (
       |  SELECT qid, did, sum(impact_micro) AS bm25_micro,
       |    count(*) AS n_match
       |  FROM qt JOIN fbq USING (qid) JOIN imp USING (tok)
       |  GROUP BY qid, did),
       |fall AS (
       |  SELECT qid, did, bm25_micro, n_match, rk, 2 AS tier FROM (
       |    SELECT qid, did, bm25_micro, n_match, row_number() OVER
       |      (PARTITION BY qid ORDER BY bm25_micro DESC, did) AS rk
       |    FROM fallagg)
       |  WHERE rk <= 10)
       |SELECT qid, did, CAST(bm25_micro AS BIGINT) AS bm25_micro,
       |  CAST(n_match AS BIGINT) AS n_match, rk, tier
       |FROM (SELECT * FROM kept UNION ALL SELECT * FROM fall)
       |ORDER BY qid, rk""".stripMargin

  private val q128 =
    s"""WITH $bm25BaseCtes,
       |imp AS (
       |  SELECT tok, did,
       |    CAST(floor($bm25ContribSql * 1000000.0 + 0.5) AS BIGINT)
       |      AS impact_micro
       |  FROM postings JOIN dfre USING (tok), stats),
       |pruned AS (
       |  SELECT tok, did, impact_micro FROM (
       |    SELECT tok, did, impact_micro, row_number() OVER
       |      (PARTITION BY tok ORDER BY impact_micro DESC, did) AS prk
       |    FROM imp)
       |  WHERE prk <= 24),
       |agg AS (
       |  SELECT qid, did, sum(impact_micro) AS bm25_micro,
       |    count(*) AS n_match
       |  FROM qt JOIN pruned USING (tok) GROUP BY qid, did),
       |ranked AS (
       |  SELECT qid, did, bm25_micro, n_match, row_number() OVER
       |    (PARTITION BY qid ORDER BY bm25_micro DESC, did) AS rk
       |  FROM agg)
       |SELECT qid, did, CAST(bm25_micro AS BIGINT) AS bm25_micro,
       |  CAST(n_match AS BIGINT) AS n_match, rk
       |FROM ranked WHERE rk <= 10
       |ORDER BY qid, rk""".stripMargin

  /** q129 — query-likelihood (Dirichlet) mirror
    * ([[graft.llmops.Retrieval.qQlDirichlet]]): the exact-integer
    * score replayed in HUGEINT — smooth = (μ·cf·1e6) // |C| per term
    * slot, per-slot factor ((tf·1e6 + smooth)·1e4) // (dl + μ), the
    * 3-slot product, rank by (ql desc, did). Scores compared as
    * VARCHAR (128-bit values don't survive the comparator's float
    * path). Both `//`s are non-negative, matching Spark's `div`.
    */
  private val q129 = {
    val toks = "string_split(regexp_replace(lower(text)," +
      " '\\s+', ' ', 'g'), ' ')"
    s"""WITH $bm25BaseCtes,
       |qd AS (
       |  SELECT qid, list_sort(list_distinct($toks)) AS dt
       |  FROM queries),
       |qt3 AS (
       |  SELECT qid, CAST(ti AS INT) AS ti,
       |    dt[CAST(ti AS INT)] AS tok
       |  FROM qd, range(1, 4) t(ti) WHERE ti <= len(dt)),
       |cfre AS (
       |  SELECT tok, CAST(sum(tf) AS BIGINT) AS cf
       |  FROM postings GROUP BY tok),
       |dlen AS (
       |  SELECT DISTINCT did, CAST(dl AS BIGINT) AS dlen FROM postings),
       |ctot AS (SELECT CAST(sum(dlen) AS BIGINT) AS c_tot FROM dlen),
       |qcf AS (
       |  SELECT qid, ti, tok,
       |    (200::HUGEINT * coalesce(cf, 0) * 1000000) // c_tot AS smooth
       |  FROM qt3 LEFT JOIN cfre USING (tok), ctot),
       |cand AS (
       |  SELECT DISTINCT qid, did FROM qt3 JOIN postings USING (tok)),
       |grid AS (
       |  SELECT c.qid, c.did, q.ti,
       |    CAST(coalesce(p.tf, 0) AS HUGEINT) AS tf0, q.smooth, d.dlen
       |  FROM cand c
       |  JOIN qcf q ON q.qid = c.qid
       |  LEFT JOIN postings p ON p.tok = q.tok AND p.did = c.did
       |  JOIN dlen d ON d.did = c.did),
       |fct AS (
       |  SELECT qid, did, ti,
       |    ((tf0 * 1000000 + smooth) * 10000) // (dlen + 200) AS fi,
       |    CASE WHEN tf0 > 0 THEN 1 ELSE 0 END AS hit
       |  FROM grid),
       |piv AS (
       |  SELECT qid, did,
       |    max(CASE WHEN ti = 1 THEN fi END) AS f1,
       |    max(CASE WHEN ti = 2 THEN fi END) AS f2,
       |    max(CASE WHEN ti = 3 THEN fi END) AS f3,
       |    sum(hit) AS n_match
       |  FROM fct GROUP BY qid, did),
       |scored AS (
       |  SELECT qid, did,
       |    f1 * coalesce(f2, CAST(1 AS HUGEINT))
       |       * coalesce(f3, CAST(1 AS HUGEINT)) AS ql,
       |    n_match
       |  FROM piv),
       |ranked AS (
       |  SELECT qid, did, ql, n_match, row_number() OVER
       |    (PARTITION BY qid ORDER BY ql DESC, did) AS rk
       |  FROM scored)
       |SELECT qid, did, CAST(ql AS VARCHAR) AS ql_scaled,
       |  CAST(n_match AS BIGINT) AS n_match, rk
       |FROM ranked WHERE rk <= 10
       |ORDER BY qid, rk""".stripMargin
  }

  /** q126 — collocation mirror ([[graft.llmops.TextOps.qCollocations]]):
    * unigram/bigram counts rebuilt with the q115-family list
    * comprehension (unigrams over every document, bigrams over
    * documents with ≥ 2 tokens — the WordShingles degenerate-shingle
    * contract), N_bi summed over the PRE-floor pair counts, and the
    * lift quantization replayed with the engine's association order:
    * ((c_ab·N_uni)·N_uni) / ((N_bi·c_a)·c_b), ·1e6, floor(+0.5).
    */
  private val q126 = {
    val toks = "string_split(regexp_replace(lower(text)," +
      " '\\s+', ' ', 'g'), ' ')"
    s"""WITH t AS (
       |  SELECT $toks AS toks FROM documents),
       |uni AS (
       |  SELECT term, count(*) AS c_term
       |  FROM (SELECT unnest(toks) AS term FROM t) GROUP BY term),
       |bi0 AS (
       |  SELECT gram, count(*) AS c_ab
       |  FROM (
       |    SELECT unnest(list_transform(range(0, len(toks) - 1),
       |             i -> array_to_string(list_slice(toks, i + 1, i + 2),
       |                                  ' '))) AS gram
       |    FROM t WHERE len(toks) >= 2)
       |  GROUP BY gram),
       |tot AS (
       |  SELECT (SELECT sum(c_term) FROM uni) AS n_uni,
       |         (SELECT sum(c_ab) FROM bi0) AS n_bi),
       |scored AS (
       |  SELECT split_part(gram, ' ', 1) AS tok_a,
       |    split_part(gram, ' ', 2) AS tok_b,
       |    CAST(c_ab AS BIGINT) AS c_ab,
       |    CAST(ua.c_term AS BIGINT) AS c_a,
       |    CAST(ub.c_term AS BIGINT) AS c_b,
       |    CAST(floor(
       |      ((CAST(c_ab AS DOUBLE) * CAST(n_uni AS DOUBLE))
       |         * CAST(n_uni AS DOUBLE))
       |      / ((CAST(n_bi AS DOUBLE) * CAST(ua.c_term AS DOUBLE))
       |         * CAST(ub.c_term AS DOUBLE))
       |      * 1000000.0 + 0.5) AS BIGINT) AS lift_micro
       |  FROM bi0, tot
       |  JOIN uni ua ON split_part(gram, ' ', 1) = ua.term
       |  JOIN uni ub ON split_part(gram, ' ', 2) = ub.term
       |  WHERE c_ab >= 5)
       |SELECT tok_a, tok_b, c_ab, c_a, c_b, lift_micro
       |FROM scored
       |ORDER BY lift_micro DESC, tok_a, tok_b
       |LIMIT 100""".stripMargin
  }

  /** q109 — retrieval metrics mirror
    * ([[graft.llmops.Retrieval.qRetrievalMetrics]]): the q108 run CTEs
    * verbatim, relevance = shared `source`, and the exact integer
    * micro metrics (DuckDB `//` == the engine's exact-multiple floor
    * division).
    */
  private val q109 =
    s"""WITH $bm25Ctes,
       |run AS (SELECT qid, did, rk FROM ranked WHERE rk <= 10),
       |rel AS (
       |  SELECT q.doc_id AS qid, c.doc_id AS did
       |  FROM documents q JOIN documents c ON q.source = c.source
       |  WHERE q.doc_id % 100 = 0 AND c.doc_id % 100 <> 0),
       |nrel AS (SELECT qid, count(*) AS n_rel FROM rel GROUP BY qid),
       |hits AS (
       |  SELECT qid, count(*) AS n_hits,
       |    CAST(min(rk) AS BIGINT) AS first_rel_rank
       |  FROM run JOIN rel USING (qid, did) GROUP BY qid)
       |SELECT nrel.qid, CAST(n_rel AS BIGINT) AS n_rel,
       |  CAST(coalesce(n_hits, 0) AS BIGINT) AS n_hits,
       |  CAST(coalesce(first_rel_rank, 0) AS BIGINT) AS first_rel_rank,
       |  CAST(coalesce(1000000 // first_rel_rank, 0) AS BIGINT)
       |    AS mrr_micro,
       |  CAST((1000000 * coalesce(n_hits, 0)) // n_rel AS BIGINT)
       |    AS recall_micro
       |FROM nrel LEFT JOIN hits ON nrel.qid = hits.qid
       |ORDER BY nrel.qid""".stripMargin

  /** q111 — PRF query expansion mirror
    * ([[graft.llmops.Retrieval.qPrfExpansion]]): round-1 ranked run
    * (top-5 feedback docs), expansion term mining (summed tf over the
    * feedback docs, minus the query's own terms, top-3 per query by
    * (mass, term)), then the SAME scoring triple over qt ∪ expansion.
    */
  private val q111 =
    s"""WITH $bm25Ctes,
       |run1 AS (SELECT qid, did FROM ranked WHERE rk <= 5),
       |mined AS (
       |  SELECT r.qid, p.tok, sum(p.tf) AS mass
       |  FROM run1 r JOIN postings p USING (did)
       |  WHERE NOT EXISTS (SELECT 1 FROM qt
       |    WHERE qt.qid = r.qid AND qt.tok = p.tok)
       |  GROUP BY r.qid, p.tok),
       |expansion AS (
       |  SELECT qid, tok FROM (
       |    SELECT qid, tok, row_number() OVER
       |      (PARTITION BY qid ORDER BY mass DESC, tok) AS erk
       |    FROM mined) WHERE erk <= 3),
       |qt2 AS (
       |  SELECT DISTINCT qid, tok FROM (
       |    SELECT qid, tok FROM qt UNION ALL
       |    SELECT qid, tok FROM expansion)),
       |${bm25ScoreCtes("qt2", "2")}
       |SELECT qid, did, CAST(bm25_micro AS BIGINT) AS bm25_micro,
       |  CAST(n_match AS BIGINT) AS n_match, rk
       |FROM ranked2 WHERE rk <= 10
       |ORDER BY qid, rk""".stripMargin

  /** q113 — hard-negative mining mirror
    * ([[graft.llmops.Retrieval.qHardNegatives]]): the q108 run CTEs,
    * the q109 relevance CTE, anti-join via NOT EXISTS, dense re-rank.
    */
  private val q113 =
    s"""WITH $bm25Ctes,
       |run AS (SELECT qid, did, rk FROM ranked WHERE rk <= 10),
       |rel AS (
       |  SELECT q.doc_id AS qid, c.doc_id AS did
       |  FROM documents q JOIN documents c ON q.source = c.source
       |  WHERE q.doc_id % 100 = 0 AND c.doc_id % 100 <> 0),
       |neg AS (
       |  SELECT r.qid, r.did, r.rk, row_number() OVER
       |    (PARTITION BY r.qid ORDER BY r.rk, r.did) AS neg_rank
       |  FROM run r
       |  WHERE NOT EXISTS (SELECT 1 FROM rel
       |    WHERE rel.qid = r.qid AND rel.did = r.did))
       |SELECT qid, did, rk, neg_rank
       |FROM neg WHERE neg_rank <= 5
       |ORDER BY qid, neg_rank""".stripMargin

  /** q116 — proximity search mirror
    * ([[graft.llmops.Retrieval.qProximitySearch]]): positional tokens
    * via the q105 struct_pack explosion, (first, last) token pair per
    * query, position pairs within the window counted per document.
    */
  private val q116 = {
    val toks = "string_split(regexp_replace(lower(text)," +
      " '\\s+', ' ', 'g'), ' ')"
    s"""WITH qt AS (
       |  SELECT doc_id AS qid, $toks AS toks
       |  FROM documents WHERE doc_id % 100 = 0),
       |pairs AS (
       |  SELECT qid, toks[1] AS tok_a, toks[len(toks)] AS tok_b FROM qt),
       |ct AS (
       |  SELECT doc_id AS did, $toks AS toks
       |  FROM documents WHERE doc_id % 100 <> 0),
       |tp AS (
       |  SELECT did, u.pos, u.tok FROM (
       |    SELECT did, unnest(list_transform(toks,
       |      (x, i) -> struct_pack(pos := CAST(i - 1 AS BIGINT),
       |                            tok := x))) AS u
       |    FROM ct) t),
       |pa AS (
       |  SELECT qid, did, pos AS ppa
       |  FROM pairs JOIN tp ON tok = tok_a),
       |pb AS (
       |  SELECT qid AS qid_b, did AS did_b, pos AS ppb
       |  FROM pairs JOIN tp ON tok = tok_b),
       |prox AS (
       |  SELECT qid, did, count(*) AS n_prox
       |  FROM pa JOIN pb ON qid = qid_b AND did = did_b
       |  WHERE abs(ppa - ppb) <= 3 AND ppa <> ppb
       |  GROUP BY qid, did),
       |ranked AS (
       |  SELECT qid, did, n_prox, row_number() OVER
       |    (PARTITION BY qid ORDER BY n_prox DESC, did) AS rk
       |  FROM prox)
       |SELECT qid, did, CAST(n_prox AS BIGINT) AS n_prox, rk
       |FROM ranked WHERE rk <= 10
       |ORDER BY qid, rk""".stripMargin
  }

  /** q115 — phrase search mirror
    * ([[graft.llmops.Retrieval.qPhraseSearch]]): positional bigrams
    * via the q49-family list comprehension (no distinct — occurrence
    * counts), query phrase = the leading bigram, rank by count.
    */
  private val q115 = {
    val toks = "string_split(regexp_replace(lower(text)," +
      " '\\s+', ' ', 'g'), ' ')"
    val bigrams =
      """CASE WHEN len(toks) - 1 > 0
        |      THEN list_transform(range(0, len(toks) - 1),
        |             i -> array_to_string(list_slice(toks, i + 1, i + 2), ' '))
        |      ELSE [array_to_string(toks, ' ')] END""".stripMargin
    s"""WITH qt0 AS (
       |  SELECT doc_id AS qid, $toks AS toks
       |  FROM documents WHERE doc_id % 100 = 0),
       |phrases AS (
       |  SELECT qid, ($bigrams)[1] AS phrase FROM qt0),
       |ct0 AS (
       |  SELECT doc_id AS did, $toks AS toks
       |  FROM documents WHERE doc_id % 100 <> 0),
       |grams AS (
       |  SELECT did, unnest($bigrams) AS gram FROM ct0),
       |occ AS (
       |  SELECT did, gram, count(*) AS n_occ
       |  FROM grams GROUP BY did, gram),
       |hits AS (
       |  SELECT qid, did, n_occ, row_number() OVER
       |    (PARTITION BY qid ORDER BY n_occ DESC, did) AS rk
       |  FROM phrases JOIN occ ON phrase = gram)
       |SELECT qid, did, CAST(n_occ AS BIGINT) AS n_occ, rk
       |FROM hits WHERE rk <= 10
       |ORDER BY qid, rk""".stripMargin
  }

  /** q120 — phrase-snippet (KWIC) mirror
    * ([[graft.llmops.Retrieval.qPhraseSnippets]]): q116-style
    * positional tokens, phrase-offset anchors complete when their hit
    * count equals the phrase length, per-(qid, did) occurrence count +
    * first anchor, and the snippet rebuilt with list_slice over the
    * SAME lowercased token arrays and the same clipped bounds.
    */
  private val q120 = {
    val toks = "string_split(regexp_replace(lower(text)," +
      " '\\s+', ' ', 'g'), ' ')"
    val bigrams =
      """CASE WHEN len(toks) - 1 > 0
        |      THEN list_transform(range(0, len(toks) - 1),
        |             i -> array_to_string(list_slice(toks, i + 1, i + 2), ' '))
        |      ELSE [array_to_string(toks, ' ')] END""".stripMargin
    s"""WITH qt0 AS (
       |  SELECT doc_id AS qid, $toks AS toks
       |  FROM documents WHERE doc_id % 100 = 0),
       |phrases AS (
       |  SELECT qid, ($bigrams)[1] AS phrase FROM qt0),
       |plen AS (
       |  SELECT qid, len(string_split(phrase, ' ')) AS m FROM phrases),
       |ptok AS (
       |  SELECT qid, u.j, u.ptok FROM (
       |    SELECT qid, unnest(list_transform(string_split(phrase, ' '),
       |      (x, i) -> struct_pack(j := CAST(i - 1 AS BIGINT),
       |                            ptok := x))) AS u
       |    FROM phrases) t),
       |ct AS (
       |  SELECT doc_id AS did, $toks AS toks
       |  FROM documents WHERE doc_id % 100 <> 0),
       |tp AS (
       |  SELECT did, u.pos, u.tok FROM (
       |    SELECT did, unnest(list_transform(toks,
       |      (x, i) -> struct_pack(pos := CAST(i - 1 AS BIGINT),
       |                            tok := x))) AS u
       |    FROM ct) t),
       |anch AS (
       |  SELECT qid, did, anchor FROM (
       |    SELECT p.qid, tp.did, tp.pos - p.j AS anchor
       |    FROM ptok p JOIN tp ON tp.tok = p.ptok) h
       |  JOIN plen USING (qid)
       |  GROUP BY qid, did, anchor, m HAVING count(*) = m),
       |occ AS (
       |  SELECT qid, did, count(*) AS n_occ, min(anchor) AS first_pos
       |  FROM anch GROUP BY qid, did),
       |ranked AS (
       |  SELECT qid, did, n_occ, first_pos, row_number() OVER
       |    (PARTITION BY qid ORDER BY n_occ DESC, did) AS rk
       |  FROM occ)
       |SELECT r.qid, r.did, CAST(n_occ AS BIGINT) AS n_occ,
       |  CAST(first_pos AS BIGINT) AS first_pos,
       |  array_to_string(list_slice(ct.toks,
       |    greatest(first_pos - 3, 0) + 1, first_pos + m + 3), ' ')
       |    AS snippet,
       |  rk
       |FROM ranked r JOIN ct USING (did) JOIN plen USING (qid)
       |WHERE rk <= 5
       |ORDER BY qid, rk""".stripMargin
  }

  /** q124 — boolean retrieval mirror
    * ([[graft.llmops.Retrieval.qBooleanRetrieval]]): required = the
    * two lexicographically-smallest distinct query tokens, excluded =
    * the largest; AND via the match-count-equals-m trick, NOT via
    * NOT EXISTS against the excluded term's postings, rank by total
    * matched tf.
    */
  private val q124 = {
    val toks = "string_split(regexp_replace(lower(text)," +
      " '\\s+', ' ', 'g'), ' ')"
    s"""WITH qt AS (
       |  SELECT doc_id AS qid, list_sort(list_distinct($toks)) AS dt
       |  FROM documents WHERE doc_id % 100 = 0),
       |req AS (
       |  SELECT qid, unnest(list_slice(dt, 1, 2)) AS tok FROM qt),
       |neg AS (
       |  SELECT qid, dt[len(dt)] AS tok FROM qt),
       |tfp AS (
       |  SELECT doc_id AS did, unnest($toks) AS tok
       |  FROM documents WHERE doc_id % 100 <> 0),
       |post AS (
       |  SELECT did, tok, count(*) AS tf FROM tfp GROUP BY did, tok),
       |m AS (SELECT qid, count(*) AS m FROM req GROUP BY qid),
       |conj AS (
       |  SELECT r.qid, p.did, count(*) AS n_req, sum(tf) AS tf_sum
       |  FROM req r JOIN post p USING (tok) GROUP BY r.qid, p.did),
       |ok AS (
       |  SELECT c.qid, c.did, c.n_req, c.tf_sum
       |  FROM conj c JOIN m USING (qid) WHERE n_req = m),
       |fin AS (
       |  SELECT o.qid, o.did, o.n_req, o.tf_sum, row_number() OVER
       |    (PARTITION BY o.qid ORDER BY o.tf_sum DESC, o.did) AS rk
       |  FROM ok o
       |  WHERE NOT EXISTS (
       |    SELECT 1 FROM neg n JOIN post p USING (tok)
       |    WHERE n.qid = o.qid AND p.did = o.did))
       |SELECT qid, did, CAST(n_req AS BIGINT) AS n_req,
       |  CAST(tf_sum AS BIGINT) AS tf_sum, rk
       |FROM fin WHERE rk <= 10
       |ORDER BY qid, rk""".stripMargin
  }

  /** q112 — passage retrieval mirror
    * ([[graft.llmops.Retrieval.qPassageRetrieval]]): the q103 chunk
    * CTEs at 32/8 over the corpus side, passage id doc_id·1000 +
    * chunk_idx, then the SAME scoring triple (the passage relation is
    * simply named `postings`) and the id unpacked in the final select.
    */
  private val q112 = {
    val chunk = 32
    val step = 24
    s"""WITH queries AS (
       |  SELECT doc_id AS qid, text FROM documents WHERE doc_id % 100 = 0),
       |corpusd AS (
       |  SELECT doc_id, text FROM documents WHERE doc_id % 100 <> 0),
       |t AS (
       |  SELECT doc_id,
       |    string_split(regexp_replace(text, '\\s+', ' ', 'g'), ' ')
       |      AS toks
       |  FROM corpusd),
       |c AS (
       |  SELECT doc_id, toks,
       |    CASE WHEN len(toks) <= $chunk THEN 1
       |      ELSE CAST(ceil(CAST(len(toks) - $chunk AS DOUBLE) / $step)
       |        AS BIGINT) + 1 END AS nch
       |  FROM t),
       |u AS (
       |  SELECT doc_id, toks, unnest(range(0, nch)) AS chunk_idx FROM c),
       |ch AS (
       |  SELECT doc_id * 1000 + chunk_idx AS did,
       |    array_to_string(
       |      toks[chunk_idx * $step + 1 : chunk_idx * $step + $chunk],
       |      ' ') AS ctext
       |  FROM u),
       |ct0 AS (SELECT did,
       |    string_split(regexp_replace(lower(ctext), '\\s+', ' ', 'g'),
       |      ' ') AS toks
       |  FROM ch),
       |tokd AS (SELECT did, len(toks) AS dl0, unnest(toks) AS tok FROM ct0),
       |postings AS (
       |  SELECT did, CAST(dl0 AS DOUBLE) AS dl, tok, count(*) AS tf
       |  FROM tokd GROUP BY did, dl0, tok),
       |dfre AS (SELECT tok, count(*) AS df FROM postings GROUP BY tok),
       |stats AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs,
       |    CAST(sum(len(toks)) AS DOUBLE) / CAST(count(*) AS DOUBLE)
       |      AS avgdl
       |  FROM ct0),
       |qt AS (SELECT qid,
       |    unnest(list_distinct(
       |      string_split(regexp_replace(lower(text), '\\s+', ' ', 'g'),
       |        ' '))) AS tok
       |  FROM queries),
       |${bm25ScoreCtes("qt", "")}
       |SELECT qid, CAST(did // 1000 AS BIGINT) AS doc_id,
       |  CAST(did % 1000 AS BIGINT) AS chunk_idx,
       |  CAST(bm25_micro AS BIGINT) AS bm25_micro,
       |  CAST(n_match AS BIGINT) AS n_match, rk
       |FROM ranked WHERE rk <= 10
       |ORDER BY qid, rk""".stripMargin
  }

  /** q105 — arbitrary-offset duplicated spans
    * ([[graft.llmops.TextOps.qDuplicatedSpans]]): the q95 trigram CTE
    * shapes at l = 8 over corpus + offset-shifted copies, corpus-global
    * occurrence counts ≥ 2, gaps-and-islands merge per doc.
    */
  private val q105 = {
    val l = 8
    s"""WITH sh0 AS (
       |  SELECT doc_id, string_split(text, ' ') AS rt FROM documents),
       |shifted AS (
       |  SELECT doc_id + 30000 AS doc_id,
       |    array_to_string(rt[6:], ' ') AS text
       |  FROM sh0 WHERE doc_id < 100),
       |corpus AS (
       |  SELECT doc_id, text FROM documents
       |  UNION ALL SELECT doc_id, text FROM shifted),
       |toks0 AS (
       |  SELECT doc_id,
       |    string_split(regexp_replace(lower(text), '\\s+', ' ', 'g'), ' ')
       |      AS toks
       |  FROM corpus),
       |g AS (
       |  SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_toks,
       |    CASE WHEN len(toks) - ${l - 1} > 0
       |      THEN list_transform(range(0, len(toks) - ${l - 1}),
       |             i -> substr(md5(array_to_string(
       |               list_slice(toks, i + 1, i + $l), ' ')), 1, 16))
       |      ELSE [substr(md5(array_to_string(toks, ' ')), 1, 16)] END
       |      AS hs
       |  FROM toks0),
       |ex AS (
       |  SELECT doc_id, n_toks, u.pos, u.h FROM (
       |    SELECT doc_id, n_toks, unnest(list_transform(hs,
       |      (x, i) -> struct_pack(pos := CAST(i - 1 AS BIGINT), h := x)))
       |      AS u
       |    FROM g) t),
       |dup AS (SELECT h FROM ex GROUP BY h HAVING count(*) >= 2),
       |dp AS (SELECT doc_id, n_toks, pos FROM ex JOIN dup USING (h)),
       |isl AS (
       |  SELECT doc_id, n_toks, pos,
       |    pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos)
       |      AS isl
       |  FROM dp)
       |SELECT doc_id, min(pos) AS gram_start, max(pos) AS gram_end,
       |  CAST(count(*) AS BIGINT) AS n_grams,
       |  least(CAST(count(*) AS BIGINT) + ${l - 1}, any_value(n_toks))
       |    AS n_dup_tokens
       |FROM isl GROUP BY doc_id, isl ORDER BY doc_id, gram_start"""
      .stripMargin
  }

  /** q104 — water-filling mixture weights
    * ([[graft.llmops.Curation.qMixtureWeights]]): token counts per
    * source, T = min(c/p), r = p·T/c — same doubles, same operation
    * order (p cast to DOUBLE; DuckDB decimal literals round to the
    * same nearest-double as the Scala literals).
    */
  private val q104 =
    s"""WITH tgt(source, p) AS (
       |  VALUES ('src0', 0.5), ('src1', 0.3), ('src2', 0.2)),
       |c AS (
       |  SELECT source, CAST(sum($tokSql) AS BIGINT) AS n_tokens
       |  FROM documents GROUP BY 1),
       |j AS (
       |  SELECT t.source, CAST(t.p AS DOUBLE) AS p,
       |    coalesce(c.n_tokens, 0) AS n_tokens
       |  FROM tgt t LEFT JOIN c ON c.source = t.source),
       |b AS (
       |  SELECT min(CAST(n_tokens AS DOUBLE) / p) AS t_total FROM j)
       |SELECT source, n_tokens, round(p, 6) AS target_share,
       |  round(CASE WHEN n_tokens > 0 THEN p * t_total / n_tokens
       |    ELSE 0.0 END, 6) AS rate,
       |  round(p * t_total, 6) AS retained_tokens
       |FROM j, b ORDER BY source""".stripMargin

  /** q103 — sliding-window chunking mirror
    * ([[graft.llmops.TextOps.chunkDocuments]] at chunk=64, overlap=16):
    * same whitespace normalization, same nChunks rule, same 1-based
    * inclusive token slices (DuckDB `l[a:b]` ≡ Spark `slice(l, a, b−a+1)`),
    * md5 over the rejoined chunk text.
    */
  private val q103 = {
    val chunk = 64
    val step = 48
    s"""WITH t AS (
       |  SELECT doc_id,
       |    string_split(regexp_replace(text, '\\s+', ' ', 'g'), ' ')
       |      AS toks
       |  FROM documents),
       |c AS (
       |  SELECT doc_id, toks,
       |    CASE WHEN len(toks) <= $chunk THEN 1
       |      ELSE CAST(ceil(CAST(len(toks) - $chunk AS DOUBLE) / $step)
       |        AS BIGINT) + 1 END AS nch
       |  FROM t),
       |u AS (
       |  SELECT doc_id, toks, unnest(range(0, nch)) AS chunk_idx FROM c),
       |ch AS (
       |  SELECT doc_id, chunk_idx,
       |    array_to_string(
       |      toks[chunk_idx * $step + 1 : chunk_idx * $step + $chunk],
       |      ' ') AS ctext,
       |    len(toks[chunk_idx * $step + 1 : chunk_idx * $step + $chunk])
       |      AS n_tokens
       |  FROM u)
       |SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
       |  CAST(n_tokens AS BIGINT) AS n_tokens,
       |  CAST(length(ctext) AS BIGINT) AS n_chars,
       |  md5(ctext) AS chunk_sig
       |FROM ch ORDER BY doc_id, chunk_idx""".stripMargin
  }

  /** q99 — the A6 rate-cut flag vector
    * ([[graft.operators.GoldenQueries.q99RubinRateCuts]]): latest
    * previous same-band point via list_filter/list_sort on the history
    * array (struct (t, flux) lexicographic — identical to Spark's
    * array_sort-of-structs), AB-magnitude rate, the rising/fading
    * cuts, and the extragalactic_new_candidate conjunction rebuilt
    * from the q88 fragments. Floats cast to DOUBLE exactly where Spark
    * widens (log10 input, the flag divisions); round-6 on the two
    * continuous columns absorbs the libm-vs-Math ulp.
    */
  private lazy val q99 = {
    val d2r = 0.017453292519943295
    val sinNgp = math.sin(27.12825 * d2r)
    val cosNgp = math.cos(27.12825 * d2r)
    val bad = sqlList(graft.filters.rubin.RubinBlocks.BadValues)
    val hosts = sqlList(graft.filters.rubin.RubinBlocks.EgHosts)
    val vsx = sqlList(graft.filters.rubin.RubinBlocks.VsxStellar)
    val bGal = s"""(asin(sin(diaSource."dec" * $d2r) * $sinNgp
       |      + cos(diaSource."dec" * $d2r) * $cosNgp
       |      * cos((diaSource.ra - 192.85948) * $d2r)) / $d2r)""".stripMargin
    def magOf(flux: String) =
      s"CASE WHEN $flux > 0 THEN -2.5 * log10(CAST($flux AS DOUBLE)) + 31.4 END"
    s"""WITH p AS (
       |  SELECT *,
       |    list_sort(list_transform(
       |      list_filter(prvDiaSources, s -> s.band = diaSource.band),
       |      s -> struct_pack(t := s.midpointMjdTai, flux := s.psfFlux)
       |    ))[-1] AS prev,
       |    (diaSource.midpointMjdTai - misc.firstDiaSourceMjdTaiFink)
       |      AS dt_rising,
       |    ${magOf("diaSource.psfFlux")} AS mag
       |  FROM '$RubinFixture'),
       |f AS (
       |  SELECT *,
       |    (mag - (${magOf("prev.flux")}))
       |      / (diaSource.midpointMjdTai - prev.t) AS rate,
       |    coalesce(abs($bGal) > 20, false) AS f_outside_plane,
       |    $rubinGoodQualitySql AS f_gq,
       |    coalesce(xm.simbad_otype IN ($hosts), false) AS f_sim_gal,
       |    (xm.simbad_otype IS NULL OR xm.simbad_otype IN ($bad))
       |      AS f_sim_unk,
       |    coalesce(xm.mangrove_lum_dist > 0, false) AS f_mangrove,
       |    coalesce(xm.gaiadr3_DR3Name IS NOT NULL
       |      AND xm.gaiadr3_DR3Name NOT IN ($bad)
       |      AND CAST(xm.gaiadr3_Plx AS DOUBLE)
       |        / CAST(xm.gaiadr3_e_Plx AS DOUBLE) > 5, false) AS f_gaia,
       |    coalesce(xm.vsx_Type IN ($vsx), false) AS f_vsx,
       |    coalesce(pred.is_sso, false) AS f_sso,
       |    coalesce(xm.legacydr8_zphot > 0, false) AS f_legacy,
       |    coalesce(${rubinBandColSql("psfFluxNdata")} >= 2, false)
       |      AS f_two_same_band
       |  FROM p),
       |g AS (
       |  SELECT *,
       |    coalesce(rate < -0.2 AND dt_rising < 3, false) AS f_rising_rate,
       |    coalesce(diaSource.band IN ('r', 'i') AND rate > 0.2, false)
       |      AS f_fading_ri,
       |    coalesce(diaSource.band IN ('g', 'u') AND rate > 0.5, false)
       |      AS f_fading_gu,
       |    (f_gq AND (f_sim_gal OR f_mangrove
       |        OR (f_legacy AND (f_sim_unk OR f_sim_gal)))
       |      AND f_outside_plane AND NOT f_sso
       |      AND NOT f_gaia AND NOT f_vsx) AS f_eg_near_galaxy
       |  FROM f)
       |SELECT diaSourceId AS source_id,
       |  round(CAST(prev.t AS DOUBLE), 6) AS prev_t,
       |  round(rate, 6) AS rate,
       |  CAST(coalesce(dt_rising < 5.0, false) AS INTEGER) AS f_new,
       |  CAST(coalesce(mag < 24, false) AS INTEGER) AS f_bright,
       |  CAST(f_rising_rate AS INTEGER) AS f_rising_rate,
       |  CAST(f_fading_ri AS INTEGER) AS f_fading_ri,
       |  CAST(f_fading_gu AS INTEGER) AS f_fading_gu,
       |  CAST(f_rising_rate OR f_fading_ri OR f_fading_gu AS INTEGER)
       |    AS f_rate,
       |  CAST(f_eg_near_galaxy AND coalesce(dt_rising < 5.0, false)
       |    AND f_two_same_band AND coalesce(mag < 24, false)
       |    AND (f_rising_rate OR f_fading_ri OR f_fading_gu) AS INTEGER)
       |    AS f_extragalactic_new
       |FROM g ORDER BY source_id""".stripMargin
  }

  val all: Map[String, String] = Map(
    "q1_agg" -> q1,
    "q2_filter_project" -> q2,
    "q3_join_agg" -> q3,
    "q4_topk" -> q4,
    "q5_distinct" -> q5,
    "q6_window_topk" -> q6,
    "q7_percentile" -> q7,
    "q8_union_dedup" -> q8,
    "q9_events_json" -> q9,
    "q10_semijoin" -> q10,
    "q11_xmatch_spatial" -> q11,
    "q12_classify_cascade" -> q12,
    "q13_array_ops" -> q13,
    "q14_anomaly_topk" -> q14,
    "q15_text_stats" -> q15,
    "q16_corpus_profile" -> q16,
    "q17_lang_id" -> q17,
    "q18_vector_stats" -> q18,
    "q19_knn_brute" -> q19,
    "q20_label_centroids" -> q20,
    "q21_ann_lsh" -> q21,
    "q22_dedup_exact" -> q22,
    "q23_neardup_minhash" -> q23,
    "q24_neardup_simhash" -> q24,
    "q25_jaccard_pairs" -> q25,
    "q26_multimodal_meta" -> q26,
    "q27_ivf_knn" -> q27,
    "q28_dedup_embedding" -> q28,
    "q29_fingerprint_winnow" -> q29,
    "q30_quota_sample" -> q30,
    "q31_hash_split" -> q31,
    "q32_decontaminate" -> q32,
    "q33_dedup_clusters" -> q33,
    "q34_quality_filter" -> q34,
    "q35_asof_attribution" -> q35,
    "q36_repetition" -> q36,
    "q37_top_terms" -> q37,
    "q38_sessionize" -> q38,
    "q39_rollup_profile" -> q39,
    "q40_pivot_events" -> q40,
    "q41_tfidf_pairs" -> q41,
    "q42_moving_avg" -> q42,
    "q43_antijoin" -> q43,
    "q44_interval_join" -> q44,
    "q45_top_keywords" -> q45,
    "q46_dedup_increment" -> q46,
    "q47_quantize_int8" -> q47,
    "q48_session_funnel" -> q48,
    "q49_containment" -> q49,
    "q50_transitions" -> q50,
    "q51_zipf_fit" -> q51,
    "q52_retention" -> q52,
    "q53_lm_score" -> q53,
    "q54_bloom_decontam" -> q54,
    "q55_length_calibration" -> q55,
    "q56_stratum_quantiles" -> q56,
    "q57_mixture_sample" -> q57,
    "q58_full_outer" -> q58,
    "q59_cube_profile" -> q59,
    "q60_oov_rate" -> q60,
    "q61_code_switch" -> q61,
    "q62_quality_select" -> q62,
    "q63_linear_attribution" -> q63,
    "q64_revenue_cycle" -> q64,
    "q65_sql_surface" -> q65,
    "q66_streaks" -> q66,
    "q67_set_ops" -> q67,
    "q68_triangles" -> q68,
    "q69_value_deciles" -> q69,
    "q70_incremental_rollup" -> q70,
    "q71_notin_nullaware" -> q71,
    "q72_salted_join" -> q72,
    "q73_sequence_pattern" -> q73,
    "q74_bpe_pairs" -> q74,
    "q75_recursive_cte" -> q75,
    "q76_variant_json" -> q76,
    "q77_lateral_topn" -> q77,
    "q78_unpivot" -> q78,
    "q79_constellation" -> q79,
    "q80_sn_candidates" -> q80,
    "q81_class_histogram" -> q81,
    "q83_rubin_blocks" -> q83,
    "q84_rubin_most_likely_sn" -> q84,
    "q85_semantic_dedup" -> q85,
    "q86_image_dhash" -> q86,
    "q87_anomaly_history" -> q87,
    "q88_rubin_extragalactic" -> q88,
    "q89_ztf_filter_survivors" -> q89,
    "q90_semantic_decontam" -> q90,
    "q91_span_dedup" -> q91,
    "q92_fuzzy_join" -> q92,
    "q93_zorder_layout" -> q93,
    "q94_priority_sample" -> q94,
    "q95_setsim_join" -> q95,
    "q96_pagerank" -> q96,
    "q97_kmeans" -> q97,
    "q98_knn_join" -> q98,
    "q99_rubin_rate_cuts" -> q99,
    "q101_ivf_append" -> q101,
    "q102_ivf_kmeans_cells" -> q102,
    "q103_chunking" -> q103,
    "q104_mixture_weights" -> q104,
    "q105_duplicated_spans" -> q105,
    "q106_table_profile" -> q106,
    "q107_hybrid_rrf" -> q107,
    "q108_bm25" -> q108,
    "q109_retrieval_metrics" -> q109,
    // q110 probes an APPENDED index; the oracle is the q108 statement
    // verbatim — hash match == append-equals-rebuild certificate
    "q110_bm25_indexed" -> q108,
    "q111_prf_expansion" -> q111,
    "q112_passage_retrieval" -> q112,
    "q113_hard_negatives" -> q113,
    // q114 prunes with the MaxScore bound; the oracle is the q108
    // full-scoring statement — hash match == losslessness certificate
    "q114_bm25_maxscore" -> q108,
    "q115_phrase_search" -> q115,
    "q116_proximity_search" -> q116,
    // q117/q118 probe a landed+appended POSITIONAL index; the oracles
    // are the q115/q116 one-shot statements verbatim — hash match ==
    // append-equals-rebuild AND probe-equals-one-shot certificate
    "q117_phrase_indexed" -> q115,
    "q118_proximity_indexed" -> q116,
    // q119 fuses the IVF-probe vector channel at nProbe >= nCells; the
    // oracle is the q107 statement verbatim — drop-in certificate
    "q119_hybrid_rrf_ivf" -> q107,
    "q120_phrase_snippets" -> q120,
    // q121/q122 probe a landed+appended GRAM index; the oracles are
    // the q115/q120 one-shot statements verbatim — hash match ==
    // append-equals-rebuild AND probe-equals-one-shot certificate
    "q121_gram_indexed" -> q115,
    "q122_snippets_indexed" -> q120,
    // q123 probes pre-quantized impacts over appended postings; the
    // oracle is the q108 full-scoring statement verbatim — the
    // append → re-quantize → probe certificate
    "q123_bm25_impact" -> q108,
    "q124_boolean_retrieval" -> q124,
    // q125 deletes from a built index; the oracle rebuilds over the
    // remaining corpus — hash match == delete-equals-rebuild
    "q125_index_delete" -> q125,
    "q126_collocations" -> q126,
    // the mirror is the naive global-window cumsum; the engine runs
    // the two-level bucket prefix sum — hash match == two-level ≡ naive
    "q127_sequence_packing" -> q127,
    // q128 probes a champion-list-pruned impact index; the mirror
    // replays quantize → prune-window → probe verbatim
    "q128_bm25_pruned" -> q128,
    // q129 ranks by the exact-integer Dirichlet QL product; the
    // mirror replays both divs and the product in HUGEINT
    "q129_ql_dirichlet" -> q129,
    // q130 upserts updated documents into a built index; the mirror
    // rebuilds over the post-update corpus (upsert ≡ rebuild)
    "q130_index_upsert" -> q130,
    // q131 scores weighted fields with one combined saturation; the
    // mirror replays slices, normalizations and rounding verbatim
    "q131_bm25f" -> q131,
    // q132 re-ranks greedily for diversity; the mirror unrolls the
    // identical 5-round integer greedy trace as a CTE chain
    "q132_mmr_diversify" -> q132,
    // q133 probes 3 did-disjoint shards with shared global invariants
    // and re-ranks the gathered top-ks; the oracle IS the q108
    // single-index statement (scatter-gather ≡ global probe)
    "q133_bm25_sharded" -> q108,
    // q134 fuses min–max normalized weighted channels (CombSUM); the
    // mirror replays both normalizations and the integer weighted sum
    "q134_minmax_fusion" -> q134,
    // q135 serves from the champion tier with per-query fallback to
    // the full impacts; the mirror replays the whole broker CASE
    "q135_bm25_tiered" -> q135,
    // q136 compares two runs by rank-biased overlap at p = 1/2; the
    // mirror replays each depth term with // and <<
    "q136_rbo_runs" -> q136,
    "q137_epoch_shuffle" -> q137,
    "q138_unigram_seed" -> q138,
    "q139_random_projection" -> q139,
    // q140 replays bucketing, both fits and the integer log2
    // recurrence bit-for-bit — the mirror IS the engine arithmetic
    "q140_dsir_select" -> q140,
    // q141 replays the ## symbol alphabet, both counts and the
    // likelihood-score quantization with the identical double ops
    "q141_wordpiece_seed" -> q141,
    // q142 unrolls the 7 greedy farthest-point rounds over the flat
    // integer relation — exact Long distances, same tie-breaks
    "q142_kcenter_coreset" -> q142)
}
