package graft.tools

import org.apache.spark.sql.functions._

import graft.quality.DataQuality.QualityConfig
import graft.streaming.EventStreams

/** CLI drive of the streaming surface against real files: streams the
  * events table (as a file source) through the windowed aggregation and the
  * per-micro-batch quality gate, then reads back both sinks. */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val out = java.nio.file.Files.createTempDirectory("graft_stream").toString
    val spark = graft.GraftSession.local(cores = 4)

    // file-stream sources need a directory; stage the single parquet file
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$out/in"))
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      java.nio.file.Paths.get(s"$out/in/events.parquet"))
    val schema = spark.read.parquet(s"$out/in").schema
    // ts has shipped as nanos-long and as timestamp[us] across testdata
    // generations — adapt exactly as ParityQueries.events does
    val raw = spark.readStream.schema(schema).parquet(s"$out/in")
    val stream = schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => raw.withColumn("ts", col("ts").cast("timestamp"))
    }

    val counts = EventStreams.windowedCounts(stream, "1 hour", "1 day")
    val q1 = counts.writeStream.format("memory").queryName("wc")
      .outputMode("complete").start()
    q1.processAllAvailable()
    println(s"[stream] windowed rows=${spark.table("wc").count()}")
    spark.table("wc").orderBy(col("window_start"), col("event_type"))
      .show(5, truncate = false)
    q1.stop()

    val cfg = QualityConfig("events", Seq("event_type", "user_id"),
      Seq("event_id"), Map("value" -> ((0.0, 400.0))))
    val q2 = EventStreams.qualityGatedParquetSink(stream, cfg,
      s"$out/good", s"$out/bad", s"$out/ckpt")
    q2.processAllAvailable()
    q2.stop()
    val good = try spark.read.parquet(s"$out/good").count() catch { case _: Exception => 0L }
    val bad = try spark.read.parquet(s"$out/bad").count() catch { case _: Exception => 0L }
    println(s"[stream] quality gate: good=$good quarantined=$bad")
    spark.stop()
  }
}
