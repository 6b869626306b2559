package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ProfileSpec extends SparkSpec {

  test("tableProfile: exact stats with null semantics pinned") {
    import spark.implicits._
    val df = Seq(
      (Some(1L), Some("x")),
      (Some(2L), None),
      (Some(2L), None),
      (None, Some("y"))
    ).toDF("a", "b")
    val got = Profile.tableProfile(df, Seq("a", "b")).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4), r.getString(5))).toMap
    // nulls excluded from n_distinct and min/max, counted in n_nulls
    assert(got("a") === ((4L, 1L, 2L, "1", "2")))
    assert(got("b") === ((4L, 2L, 2L, "x", "y")))
  }

  test("tableProfileApprox: cardinality within the rsd envelope, other stats exact") {
    val li = CoreQueries.table(spark, "/root/testdata/sf0.001", "lineitem")
    val cols = Seq("l_orderkey", "l_partkey", "l_returnflag")
    val exact = Profile.tableProfile(li, cols).collect()
      .map(r => r.getString(0) -> r).toMap
    val approx = Profile.tableProfileApprox(li, cols, rsd = 0.02)
      .collect().map(r => r.getString(0) -> r).toMap
    cols.foreach { c =>
      val (e, a) = (exact(c), approx(c))
      assert(a.getLong(1) === e.getLong(1)) // n_rows exact
      assert(a.getLong(2) === e.getLong(2)) // n_nulls exact
      assert(a.getString(4) === e.getString(4)) // min exact
      assert(a.getString(5) === e.getString(5)) // max exact
      val rel = math.abs(a.getLong(3) - e.getLong(3)).toDouble /
        math.max(1L, e.getLong(3))
      assert(rel <= 0.06, s"$c: approx ${a.getLong(3)} vs ${e.getLong(3)}")
    }
  }

  test("q106: each profile branch scans exactly its own column") {
    val df = Profile.q106TableProfile(spark, "/root/testdata/sf0.001")
    df.collect()
    val p = df.queryExecution.executedPlan.toString
      .split("(?m)^\\+- == Initial Plan ==$").head
    val reads = "ReadSchema: struct<([^>]*)>".r
      .findAllMatchIn(p).map(_.group(1)).toSeq
    assert(reads.size === Profile.Q106Cols.size, p)
    // every branch reads ONE source column (l_shipday derives from
    // l_shipdate — still a single-column read)
    assert(reads.forall(!_.contains(",")),
      s"multi-column profile scan:\n$reads")
  }
}
