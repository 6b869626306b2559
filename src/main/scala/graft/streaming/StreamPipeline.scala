package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.filters.FilterRegistry

/** Structured Streaming wrapper — SURVEY §7 M7.
  *
  * The reference's execution contract is stateless per micro-batch
  * (history rides in-row, SURVEY §1.1), so the SAME `AlertFilter` masks
  * serve batch and stream unchanged: `readStream` → `applyFilter` →
  * `foreachBatch` sink. No watermarks, no state store (deliberately —
  * SURVEY §7.4.7).
  *
  * Side effects (Telegram/Slack in the reference,
  * `filter_early_sn_candidates/filter.py:182-211`) live exclusively
  * behind [[Notifier]]; the engine core stays pure.
  */
object StreamPipeline {

  /** Where passing alerts go. Implementations must be serializable
    * driver-side objects (foreachBatch runs on the driver; the DataFrame
    * it hands over is distributed).
    */
  trait Notifier extends Serializable {
    /** Called once per (micro-batch, filter) with the PASSING alerts. */
    def notify(filterName: String, batchId: Long, passing: DataFrame): Unit
  }

  /** Collects pass-counts in memory — the test/no-op notifier. */
  class CountingNotifier extends Notifier {
    val counts = new java.util.concurrent.ConcurrentHashMap[String, Long]()
    def notify(filterName: String, batchId: Long, passing: DataFrame): Unit =
      counts.merge(filterName, passing.count(), (a, b) => a + b)
  }

  /** Durable fan-out: passing alerts append to
    * `basePath/topic=<filter>/` — the file-based analog of the
    * broker's per-science-topic Kafka fan-out (a Kafka notifier swaps
    * in by writing the same DataFrame to a topic; downstream consumers
    * read their topic directory with partition pruning on `topic=`).
    * Filter names sanitize to directory-safe form (dots → dashes).
    */
  class ParquetTopicNotifier(basePath: String,
      selectColumns: Seq[String] = Seq.empty) extends Notifier {
    def notify(filterName: String, batchId: Long, passing: DataFrame): Unit = {
      val topic = filterName.replace('.', '-')
      val out =
        if (selectColumns.nonEmpty) passing.selectExpr(selectColumns: _*)
        else passing
      out.write.mode("append").parquet(s"$basePath/topic=$topic")
    }
  }

  /** Parquet-directory alert stream (the broker replays alert batches as
    * files; Kafka swaps in via `format("kafka")` + avro deserialization
    * without touching anything downstream).
    */
  def readParquetStream(
      spark: SparkSession, path: String, schema: StructType,
      maxFilesPerTrigger: Int = 1): DataFrame =
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(path)

  /** Run `filterNames` over every micro-batch, fanning passing alerts to
    * the notifier — the engine analog of the broker's
    * distribution loop. Returns the started query (AvailableNow by
    * default: drain what exists, then stop — tests and nightly replays;
    * pass `Trigger.ProcessingTime(..)` for a live stream).
    */
  def run(
      stream: DataFrame,
      filterNames: Seq[String],
      notifier: Notifier,
      trigger: Trigger = Trigger.AvailableNow(),
      checkpointDir: Option[String] = None,
      validateBinding: Boolean = true): StreamingQuery = {
    // pre-flight: every requested filter must bind against this
    // stream's schema (the §3.1 name-binding step, checked BEFORE the
    // query starts — a misconfigured filter list fails here with the
    // missing columns named, not per micro-batch)
    if (validateBinding) filterNames.foreach { n =>
      val missing = graft.schema.AlertSchemas.missingColumns(stream.schema, n)
      require(missing.isEmpty,
        s"filter '$n' cannot bind against this stream: missing " +
          missing.mkString(", "))
    }
    var w = stream.writeStream.trigger(trigger)
    checkpointDir.foreach(d => w = w.option("checkpointLocation", d))
    w.foreachBatch { (batch: DataFrame, batchId: Long) =>
      // one pass per filter over the SAME cached micro-batch: scan once
      val cached = batch.persist()
      try filterNames.foreach { name =>
        notifier.notify(name, batchId,
          FilterRegistry.applyFilter(cached, name))
      } finally { cached.unpersist(); () }
    }.start()
  }
}
