package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-4 operators on CRAFTED inputs with hand-derivable answers:
  * gaps-and-islands streaks (q66), INTERSECT/EXCEPT set ops (q67),
  * triangle counting (q68), ntile deciles (q69). The sf0.01 oracle
  * gate checks engine parity; these pin the SEMANTICS on graphs and
  * sequences small enough to verify by hand.
  */
class GraphAndStreaksSpec extends SparkSpec {

  private def ts(day: Int, h: Int = 12): Timestamp =
    Timestamp.valueOf(f"2024-01-$day%02d $h%02d:00:00")

  test("q66 island key: runs of consecutive days split on gaps") {
    import spark.implicits._
    // user 1: days 1,2,3 then 5,6 → best 3, two islands, 5 active
    // user 2: days 2,4,6 → three singleton islands (best 1)
    // user 3: days 1..4 with a duplicate event on day 2 → best 4
    val ev = Seq(
      (1L, ts(1)), (1L, ts(2)), (1L, ts(3)), (1L, ts(5)), (1L, ts(6)),
      (2L, ts(2)), (2L, ts(4)), (2L, ts(6)),
      (3L, ts(1)), (3L, ts(2)), (3L, ts(2, 18)), (3L, ts(3)), (3L, ts(4))
    ).toDF("user_id", "ts")
    val got = EventQueries.dayStreaks(ev)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap
    assert(got === Map(1L -> ((3L, 2L, 5L)), 2L -> ((1L, 3L, 3L)),
      3L -> ((4L, 1L, 4L))))
  }

  test("q67 set ops: intersect/except partition the union exactly") {
    import spark.implicits._
    val clicks = Seq(1L, 2L, 3L, 4L).toDF("user_id")
    val buys = Seq(3L, 4L, 5L).toDF("user_id")
    assert(clicks.intersect(buys).collect().map(_.getLong(0)).sorted
      === Array(3L, 4L))
    assert(clicks.except(buys).collect().map(_.getLong(0)).sorted
      === Array(1L, 2L))
    assert(buys.except(clicks).collect().map(_.getLong(0)).sorted
      === Array(5L))
  }

  test("triangles: K4 has 4, each vertex in 3; square+diagonal has 2") {
    import spark.implicits._
    // K4 on {1,2,3,4}: parts p1..p6 each shared by one pair, twice
    // (minShared = 2) → all 6 edges; C(4,3) = 4 triangles, each vertex
    // participates in C(3,2) = 3.
    val k4pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L))
    val ps = k4pairs.zipWithIndex.flatMap { case ((u, v), i) =>
      // two distinct parts per pair → co-supply strength 2
      Seq((i * 2L, u), (i * 2L, v), (i * 2L + 1, u), (i * 2L + 1, v))
    }.toDF("part", "supp")
    val edges = GraphQueries.coSupplyEdges(ps, minShared = 2L)
    assert(edges.count() === 6)
    assert(GraphQueries.triangles(edges).count() === 4)
    val participation = GraphQueries.triangleParticipation(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(participation === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))

    // square 1-2-3-4 plus diagonal 1-3: triangles (1,2,3) and (1,3,4)
    val sqPairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L), (1L, 3L))
    val ps2 = sqPairs.zipWithIndex.flatMap { case ((u, v), i) =>
      Seq((i * 2L, u), (i * 2L, v), (i * 2L + 1, u), (i * 2L + 1, v))
    }.toDF("part", "supp")
    val tri2 = GraphQueries
      .triangles(GraphQueries.coSupplyEdges(ps2, minShared = 2L))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    assert(tri2.toSeq === Seq((1L, 2L, 3L), (1L, 3L, 4L)))
  }

  test("coSupplyEdges: strength threshold prunes 1-part co-occurrence") {
    import spark.implicits._
    val ps = Seq((100L, 1L), (100L, 2L), // share ONE part only
      (200L, 2L), (200L, 3L), (201L, 2L), (201L, 3L)).toDF("part", "supp")
    val e = GraphQueries.coSupplyEdges(ps, minShared = 2L)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(e.toSeq === Seq((2L, 3L)))
  }

  test("q73 sequence pattern: subsequence order, gaps split, ties by id") {
    import spark.implicits._
    def t(h: Int, m: Int = 0) =
      Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    // user 1, one session: view, (error), click, purchase → matches
    // user 2, one session: purchase, click, view → wrong order, no match
    // user 3: view+click in session 1, purchase 10h later (new session
    //         at 6h gap) → neither session matches
    // user 4: simultaneous ts, event_id breaks the tie → view(1),
    //         click(2), purchase(3) matches
    val ev = Seq(
      (1L, 1L, t(1), "view"), (2L, 1L, t(2), "error"),
      (3L, 1L, t(3), "click"), (4L, 1L, t(4), "purchase"),
      (5L, 2L, t(1), "purchase"), (6L, 2L, t(2), "click"),
      (7L, 2L, t(3), "view"),
      (8L, 3L, t(1), "view"), (9L, 3L, t(2), "click"),
      (10L, 3L, t(12), "purchase"),
      (11L, 4L, t(1), "view"), (12L, 4L, t(1), "click"),
      (13L, 4L, t(1), "purchase")
    ).toDF("event_id", "user_id", "ts", "event_type")
    // unique temp dir (not a fixed /tmp path): concurrent runs must not
    // race on the fixture, and nothing may leak after the JVM exits
    val dir = java.nio.file.Files.createTempDirectory("graft_q73_spec")
    try {
      ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
      val got = EventQueries.q73SequencePattern(spark, dir.toString)
        .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2))))
        .toMap
      assert(got === Map(1L -> ((1L, 1L)), 4L -> ((1L, 1L))))
    } finally org.apache.commons.io.FileUtils.deleteQuietly(dir.toFile)
  }

  test("null-ts events are dropped identically by every windowed operator") {
    import spark.implicits._
    // Spark windows sort nulls FIRST, DuckDB LAST — the engine contract
    // (round 4) is that time-ordered operators drop null timestamps
    // explicitly, so a null row must change NOTHING
    val clean = Seq(
      (1L, 1L, Timestamp.valueOf("2024-01-01 01:00:00"), "view", 1.0),
      (2L, 1L, Timestamp.valueOf("2024-01-01 02:00:00"), "click", 2.0),
      (3L, 1L, Timestamp.valueOf("2024-01-01 03:00:00"), "purchase", 3.0)
    ).toDF("event_id", "user_id", "ts", "event_type", "value")
    val dirty = clean.unionByName(Seq(
      (99L, 1L, null.asInstanceOf[Timestamp], "purchase", 9.0)
    ).toDF("event_id", "user_id", "ts", "event_type", "value"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toString).sorted.toSeq
    assert(rows(EventQueries.withSessionIds(clean, 21600)) ===
      rows(EventQueries.withSessionIds(dirty, 21600)))
    assert(rows(EventQueries.dayStreaks(clean)) ===
      rows(EventQueries.dayStreaks(dirty)))
  }

  test("q69 ntile: 25 rows over 10 tiles → sizes 3,3,3,3,3,2,2,2,2,2") {
    import spark.implicits._
    val orders = (1 to 25).map(i =>
      (i.toLong, "P", i * 10.0)).toDF("o_orderkey", "o_orderpriority",
      "o_totalprice")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("o_orderpriority")
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    val sizes = orders.withColumn("decile", ntile(10).over(w))
      .groupBy("decile").count().orderBy("decile")
      .collect().map(_.getLong(1))
    assert(sizes.toSeq === Seq(3L, 3L, 3L, 3L, 3L, 2L, 2L, 2L, 2L, 2L))
  }

  /** Independent driver-side replication of the integer-PageRank
    * recurrence — Maps and loops, nothing shared with the DataFrame
    * implementation under test.
    */
  private def refPageRank(edges: Seq[(Long, Long)], iters: Int,
      scale: Long): Map[Long, Long] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val n = nodes.size.toLong
    val outdeg = edges.groupBy(_._1).map { case (s, es) =>
      (s, es.size.toLong) }
    var r = nodes.map(v => (v, scale)).toMap
    for (_ <- 1 to iters) {
      val contrib = edges
        .map { case (u, v) => (v, r(u) / outdeg(u)) }
        .groupBy(_._1).map { case (v, cs) => (v, cs.map(_._2).sum) }
      val dang = nodes.filterNot(outdeg.contains).map(r).sum
      r = nodes.map { v =>
        (v, scale / 100L * 15L +
          (contrib.getOrElse(v, 0L) + dang / n) / 100L * 85L)
      }.toMap
    }
    r
  }

  test("q96 pageRankInt == independent Map/loop replication") {
    import spark.implicits._
    // a directed graph with a cycle, a hub, a dangling sink, and an
    // isolated pure-source so every code path (contrib, dangling
    // redistribution, no-in-edge nodes) is exercised
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L), (4L, 1L),
      (5L, 3L), (3L, 6L)) // 6 is dangling (no out-edges)
    val got = GraphQueries
      .pageRankInt(edges.toDF("src", "dst"), iters = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got === refPageRank(edges, 3, 1000000000000L))
    // more iterations still agree (the recurrence, not one step)
    val got5 = GraphQueries
      .pageRankInt(edges.toDF("src", "dst"), iters = 5, scale = 1000000L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got5 === refPageRank(edges, 5, 1000000L))
  }

  test("q96 pageRankInt: mass bounded and hub outranks leaf") {
    import spark.implicits._
    // star into node 9: every spoke points at the hub
    val edges = (1L to 8L).map(s => (s, 9L)) :+ ((9L, 1L))
    val r = GraphQueries.pageRankInt(edges.toDF("src", "dst"), 3)
      .collect().map(x => (x.getLong(0), x.getLong(1))).toMap
    val scale = 1000000000000L
    // floor divisions only LOSE mass: total <= N * scale
    assert(r.values.sum <= 9L * scale)
    assert(r(9L) > r(1L) && r(1L) > r(2L)) // hub > cycle-back > leaf
  }
}
