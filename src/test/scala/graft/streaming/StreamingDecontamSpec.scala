package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** The ingest-time scrub's batching-invariance contract: documents
  * arriving across MULTIPLE micro-batches produce exactly the batch
  * scrub's verdicts (the registry entry q_stream_decontam streams one
  * drop; this locks the multi-drop case the production claim rests on —
  * the scrub is per-doc and stateless, so batching cannot matter). */
class StreamingDecontamSpec extends AnyFunSuite {
  private lazy val s = SparkSpec.session

  test("two-drop stream scrub equals the batch scrub") {
    val docs = s.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val evalH = docs.filter(col("doc_id") < 20)
      .select(explode(graft.functions.Text.shingleHashes(col("text"))).as("h"))
    val batch = StreamingIngest.decontamScrub(
        docs.filter(col("doc_id") >= 20), evalH)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet

    val srcDir = Files.createTempDirectory("stream_decontam_src").toString
    val sink = Files.createTempDirectory("stream_decontam_sink").toString
    val n = docs.count()
    val schema = docs.schema
    def drop(pred: org.apache.spark.sql.Column): Unit =
      docs.filter(pred).coalesce(1).write.mode("append").parquet(srcDir)
    drop(col("doc_id") < n / 2)
    val q = s.readStream.schema(schema).parquet(srcDir)
      .writeStream.foreachBatch {
        (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
            _: Long) =>
          val ev = b.sparkSession.read
            .parquet("/root/testdata/sf0.001/documents.parquet")
            .filter(col("doc_id") < 20)
            .select(explode(graft.functions.Text
              .shingleHashes(col("text"))).as("h"))
          StreamingIngest.decontamScrub(b.filter(col("doc_id") >= 20), ev)
            .write.mode("append").parquet(sink)
          ()
      }.start()
    try {
      q.processAllAvailable()
      drop(col("doc_id") >= n / 2)
      q.processAllAvailable()
    } finally q.stop()

    val streamed = s.read.parquet(sink)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(streamed == batch,
      "multi-batch streamed scrub must equal the batch scrub")
  }
}
