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
