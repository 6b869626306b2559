package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph analytics phrased as relational dataflow — the shape a Spark
  * engine uses when the graph is derived FROM the warehouse tables
  * rather than stored as one (the co-occurrence projections behind
  * entity-resolution, fraud rings, recommendation neighborhoods).
  *
  * The worked operator is TRIANGLE COUNTING over the co-supply graph:
  * vertices are suppliers, an edge links two suppliers that ship the
  * same part. Triangles are the building block of clustering
  * coefficients and community detection; counting them is the classic
  * "join the edge list to itself twice" dataflow (the reference has no
  * graph operators — this extends the engine the same way the llmops
  * suite does, cf. fink-filters' absence of joins noted in SURVEY §2.6).
  */
object GraphQueries {

  /** Undirected edge list u < v from a bipartite (part → supplier)
    * projection: suppliers co-supplying >= `minShared` distinct parts.
    * The strength threshold is the standard projection-densification
    * guard: a 1-shared-part edge set over a popular part is a clique
    * of that part's supplier list.
    */
  def coSupplyEdges(partSupp: DataFrame, minShared: Long): DataFrame = {
    val a = partSupp.select(col("part").as("pa"), col("supp").as("u"))
    val b = partSupp.select(col("part").as("pb"), col("supp").as("v"))
    a.join(b, col("pa") === col("pb") && col("u") < col("v"))
      .groupBy("u", "v")
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
      .select("u", "v")
  }

  /** q68 — per-supplier triangle participation over the co-supply
    * graph of a deterministic supplier sample (s_suppkey % 7 == 0,
    * the analysis cohort; sampling vertices BEFORE the projection
    * bounds the bipartite blow-up at any scale factor).
    *
    * Dataflow: distinct (part, supplier) pairs → ordered edge list
    * u < v (each undirected edge exactly once) → wedge join
    * (e1.v = e2.u gives every ordered path u < v < w) → closing-edge
    * semi-check against the edge list → each triangle materializes
    * exactly once, under its ordered (u, v, w). The per-node counts
    * explode each triangle to its three corners.
    *
    * Scale shape: every join is an equi-join on 8-byte keys (the edge
    * list shuffles on v resp. u, the closing check on (u, w)); the
    * u < v < w canonical ordering removes the 6x duplicate
    * enumeration a naive 3-way join produces, and the wedge join's
    * fan-out is Σ deg_in·deg_out — the quantity the strength
    * threshold and vertex sampling bound. Each side projects distinct
    * scratch names before joining, so no shared-lineage ambiguity.
    */
  /** Every triangle of an undirected `(u, v)` edge list (u < v each
    * edge, each triangle once) as ordered `(a, b, c)`, a < b < c: the
    * wedge join `e1.v = e2.u` enumerates each ordered path, the third
    * join checks the closing edge. The edge list is referenced three
    * times, so it is materialized ONCE via an eager `localCheckpoint`
    * (ReuseExchange only deduplicates the shuffle writes below the
    * edge aggregation, not the join/aggregate compute above them — a
    * bare 3-reference plan re-runs the co-supply join per branch; a
    * `persist` would run once but leak a cache-manager relation into
    * the caller's session for its lifetime).
    */
  def triangles(edges: DataFrame): DataFrame = {
    val e = edges.localCheckpoint()
    val e1 = e.select(col("u").as("u1"), col("v").as("v1"))
    val e2 = e.select(col("u").as("u2"), col("v").as("v2"))
    val e3 = e.select(col("u").as("u3"), col("v").as("v3"))
    e1.join(e2, col("v1") === col("u2"))                 // wedge u<v<w
      .join(e3, col("u3") === col("u1") && col("v3") === col("v2"))
      .select(col("u1").as("a"), col("u2").as("b"), col("v2").as("c"))
  }

  /** Per-vertex triangle participation counts over [[triangles]]. */
  def triangleParticipation(edges: DataFrame): DataFrame =
    triangles(edges)
      .select(explode(array(col("a"), col("b"), col("c"))).as("vertex"))
      .groupBy("vertex")
      .agg(count(lit(1)).as("n_triangles"))

  /** PageRank over a directed `(src, dst)` edge list in EXACT integer
    * arithmetic — every quantity a BIGINT, every division an integer
    * floor division, every sum a sum of integers (order-independent,
    * so bit-identical across engines and across partitionings; the
    * same reproducibility discipline as q94's division-only priority
    * keys, applied to an iterative computation). Ranks start at
    * `scale` per node; one power step is
    *
    *   pr'(v) = 0.15·scale + 85 · ((Σ_{(u,v)∈E} pr(u) div deg(u)
    *                                  + dangling div N) div 100)
    *
    * i.e. the standard damped update with dangling-mass
    * redistribution, quantized by floor divisions (each node loses
    * < deg remainder units per step — bounded, documented drift from
    * the real-valued fixpoint, the price of exactness). `scale` must
    * be a multiple of 100; Long range holds while N·scale < 9·10^18
    * (at the default 10^12 scale: 9M nodes — drop scale for bigger
    * graphs).
    *
    * Scale shape: per iteration one equi-join of ranks to edges on
    * src and one groupBy dst — slim (dst, contrib) rows shuffle,
    * never adjacency lists; dangling mass is a single-row broadcast
    * (the repo's scalar-crossJoin pattern). Edges and the (node, deg)
    * relation are materialized once (`localCheckpoint`); ranks CARRY
    * deg with them, so the degree join happens once at setup, not
    * once per round (r15: the per-round `r ⋈ outdeg` join cost a
    * re-plan + shuffle every iteration; A/B p50 2.87 → 2.36 s at
    * sf0.1); N is the one driver-side scalar (a count). At 100 TB,
    * bucket the edge list by src and the per-iteration join is
    * Exchange-free on the edge side. A/B-REJECTED (r15): eagerly
    * hash-repartitioning e/nodesDeg by their join keys before the
    * checkpoints to pin co-partitioning through LogicalRDD — the two
    * setup shuffles cost more than the alignment saved at gate scale
    * (p50 3.36 vs 2.36 without; AQE's coalesced loop exchanges don't
    * line up with the pinned partition count anyway).
    */
  def pageRankInt(edges: DataFrame, iters: Int,
      scale: Long = 1000000000000L, checkpointEvery: Int = 1): DataFrame = {
    require(scale % 100L == 0L, "scale must be a multiple of 100")
    require(checkpointEvery >= 1, "checkpointEvery must be >= 1")
    val e = edges.select(col("src"), col("dst")).localCheckpoint()
    // (node, deg) with deg NULL for dangling nodes — the loop-invariant
    // degree join, computed ONCE here instead of once per iteration
    // (r15: `r ⋈ outdeg` was re-planned and re-shuffled every round;
    // carrying deg inside `r` costs one extra Long per node per
    // checkpoint and removes a join + its Exchanges from every
    // iteration). Also the `nodes` relation: one checkpoint serves
    // both roles the old nodes/outdeg pair filled.
    val nodesDeg = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .join(e.groupBy(col("src").as("node"))
        .agg(count(lit(1)).as("deg")), Seq("node"), "left")
      .localCheckpoint()
    val n = nodesDeg.count()
    val base = scale / 100L * 15L
    var r = nodesDeg.withColumn("pr", lit(scale))
    for (i <- 1 to iters) {
      val contrib = r.filter(col("deg").isNotNull)
        .join(e, col("node") === col("src"))
        .select(col("dst").as("cnode"), expr("pr div deg").as("c"))
        .groupBy("cnode").agg(sum(col("c")).as("contrib"))
      val dang = r.filter(col("deg").isNull)
        .agg(coalesce(sum(col("pr")), lit(0L)).as("dang"))
      r = nodesDeg
        .join(contrib, col("node") === col("cnode"), "left")
        .crossJoin(broadcast(dang))
        .select(col("node"), col("deg"),
          (lit(base) +
            expr(s"(coalesce(contrib, 0L) + dang div ${n}L) div 100L")
              * 85L).as("pr"))
      // materialize the ranks every `checkpointEvery` rounds and on
      // the final one (the connectedComponents convention). Default 1
      // — per round — is the SCALE-correct choice: r is referenced
      // twice per iteration (contrib + dangling), so an unmaterialized
      // round re-executes its whole plan twice inside the next one
      // (measured at the 100x soak: cadence 2 cost +31% on 5M edges,
      // while saving ~0.6 s of per-job overhead at sf0.1 — raise the
      // cadence only at toy scale). Pure schedule: the BIGINT
      // arithmetic (and thus the q96 hash) is checkpoint-invariant.
      if (i % checkpointEvery == 0 || i == iters) r = r.localCheckpoint()
    }
    r.select(col("node"), col("pr"))
  }

  /** q96 — integer PageRank of the part "purchased-next" graph: a
    * directed edge links part A to part B when some order's line
    * `i + 1` (part B) follows line `i` (part A) — the sequential
    * co-purchase graph recommendation pipelines rank. 3 power
    * iterations of [[pageRankInt]], top 20 parts (rank desc, key
    * tie-break). The DuckDB mirror replays the identical integer
    * recurrence as chained CTEs — exact arithmetic is what makes an
    * ITERATIVE fixpoint hash-gateable at all.
    */
  def q96PageRank(spark: SparkSession, dir: String): DataFrame = {
    val li = CoreQueries.table(spark, dir, "lineitem")
    val a = li.select(col("l_orderkey").as("ok"),
      col("l_linenumber").as("ln"), col("l_partkey").as("src"))
    val b = li.select(col("l_orderkey").as("ok"),
      (col("l_linenumber") - 1).as("ln"), col("l_partkey").as("dst"))
    val edges = a.join(b, Seq("ok", "ln"))
      .filter(col("src") =!= col("dst"))
      .select("src", "dst").distinct()
    pageRankInt(edges, 3)
      .orderBy(desc("pr"), asc("node"))
      .limit(20)
      .select(col("node").as("part_key"), col("pr").as("rank_scaled"))
  }

  def q68Triangles(spark: SparkSession, dir: String): DataFrame = {
    val ps = CoreQueries.table(spark, dir, "lineitem")
      .filter(pmod(col("l_suppkey"), lit(7L)) === 0L)
      .select(col("l_partkey").as("part"), col("l_suppkey").as("supp"))
      .distinct()
    triangleParticipation(coSupplyEdges(ps, minShared = 2L))
      .select(col("vertex").as("s_suppkey"), col("n_triangles"))
      .orderBy("s_suppkey")
  }
}
