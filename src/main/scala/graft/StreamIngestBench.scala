package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throughput bench for the COMPOSED streaming ingest
  * ([[graft.streaming.Streams.curationIngestSink]]): standing indexes
  * built from the %4==0 slice of the sf dir (exact keys, 8-grams, IVF
  * cells), then the remaining (doc, vector) rows stream through the
  * three-rung gate in fixed-size micro-batches. Reports per-batch
  * seconds and rows/s — the number a capacity plan needs, since each
  * batch pays the same screen structure regardless of corpus size (the
  * standing side is Bloom/cell-pruned, never rescanned wholesale).
  * One JSON line (the [[Bench]] discipline); recorded in BASELINE.md.
  */
object StreamIngestBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val batchRows = sys.env.getOrElse("SPARK_GRAFT_BATCH_ROWS", "1250").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val wd = java.nio.file.Files.createTempDirectory("graft_streambench_").toString
    val (keyIdx, gramIdx, ivfIdx) = (s"$wd/keys", s"$wd/grams", s"$wd/ivf")

    val docs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    val embs = Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val standing = docs.filter(col("doc_id") % 4 === 0)
    graft.ops.Dedup.buildExactKeyIndex(standing, "text", keyIdx)
    graft.ops.Dedup.buildGramIndex(standing, "text", gramIdx, w = 8)
    graft.ops.Similarity.buildIvfIndex(
      embs.join(standing.select(col("doc_id").as("vec_id")), Seq("vec_id"), "left_semi"),
      "vec_id", "embedding", ivfIdx, nCells = 16)

    // the incoming rows: batch slice with each doc's vector attached
    val incoming = docs.filter(col("doc_id") % 4 =!= 0)
      .join(embs.withColumnRenamed("vec_id", "doc_id"), Seq("doc_id"), "left")
      .select(col("doc_id"), col("text"), col("embedding"))
      .as[(Long, String, Array[Float])]
      .collect().sortBy(_._1)

    implicit val sqlCtx = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String, Array[Float])]
    val q = graft.streaming.Streams.curationIngestSink(spark,
      mem.toDF().toDF("doc_id", "text", "embedding"),
      "doc_id", "text", "embedding",
      keyIdx, gramIdx, ivfIdx, s"$wd/out", s"$wd/ckpt")

    def fmt(d: Double): String =
      BigDecimal(d).setScale(2, BigDecimal.RoundingMode.HALF_UP).toString
    val batchTimes = try {
      incoming.grouped(batchRows).map { rows =>
        mem.addData(rows.toIndexedSeq)
        val t0 = System.nanoTime()
        q.processAllAvailable()
        (rows.size, (System.nanoTime() - t0) / 1e9)
      }.toVector
    } finally q.stop()

    val totalRows = batchTimes.map(_._1).sum
    val totalSec = batchTimes.map(_._2).sum
    val admitted = spark.read.parquet(s"$wd/out").count()
    println(
      s"""{"bench":"stream_ingest","sf":"$sfDir","batch_rows":$batchRows,""" +
      s""""n_batches":${batchTimes.size},"rows_in":$totalRows,""" +
      s""""rows_admitted":$admitted,"total_s":${fmt(totalSec)},""" +
      s""""rows_per_s":${fmt(totalRows / totalSec)},""" +
      s""""batch_s":[${batchTimes.map(t => fmt(t._2)).mkString(",")}]}""")
    spark.stop()
  }
}
