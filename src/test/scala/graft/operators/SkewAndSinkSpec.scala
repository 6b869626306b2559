package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.llmops.Curation

/** Skew-salted join equivalence + the partitioned corpus sink. */
class SkewAndSinkSpec extends SparkSpec {

  import spark.implicits._

  test("saltedJoin returns exactly the plain join's rows") {
    // heavily skewed big side: 90% of rows share one key
    val big = (1 to 2000).map { i =>
      (if (i % 10 == 0) s"k${i % 7}" else "hot", i.toLong)
    }.toDF("key", "row_id")
    val small = Seq(("hot", 1.0), ("k0", 2.0), ("k3", 3.0), ("k6", 4.0))
      .toDF("key", "w")
    val plain = big.join(small, Seq("key"))
      .select("key", "row_id", "w").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).sorted
    val salted = Skew.saltedJoin(big, small, "key", col("row_id"), 8)
      .select("key", "row_id", "w").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).sorted
    assert(salted.length === plain.length)
    assert(salted.toSeq === plain.toSeq)
  }

  test("writeCorpus lays out hive partitions readable with pruning") {
    val dir = Files.createTempDirectory("graft_corpus").toString
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    Curation.writeCorpus(docs, dir, maxRecordsPerFile = 50)
    val back = spark.read.parquet(dir)
    assert(back.count() === docs.count())
    // partition columns materialize from the directory layout
    assert(back.columns.toSet.contains("split"))
    val langs = back.select("lang").distinct().collect().map(_.getString(0))
    assert(langs.nonEmpty)
    // split values round-trip against the pure splitLabel function
    val bad = back.withColumn("expect",
      Curation.splitLabel(col("doc_id")))
      .filter(col("split") =!= col("expect")).count()
    assert(bad === 0L)
    // partition pruning: a lang+split filter reads a pruned subtree —
    // pinned in the plan, not just by the result (the whole point of
    // the hive layout is that these predicates never touch file data)
    val p = back.filter(col("lang") === langs.head && col("split") === "val")
    assert(p.count() > 0)
    val plan = p.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan)
    val pf = plan.linesIterator.find(_.contains("PartitionFilters")).get
    assert(pf.contains("lang") && pf.contains("split"), pf)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }
}
