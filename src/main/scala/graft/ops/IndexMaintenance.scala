package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Maintenance for the persisted index layouts (IVF/LSH vector indexes,
  * text-dedup bands, exact-dedup keys): the streaming sinks append one
  * parquet file per micro-batch per partition directory, so a
  * long-running stream fragments a layout into thousands of tiny files —
  * at 100 TB that turns every probe's file-listing and scan setup into
  * the bottleneck (the classic small-file problem). Compaction rewrites
  * the data to one file per partition directory without changing a row.
  */
object IndexMaintenance {

  /** Rewrite a (possibly hive-partitioned) parquet directory with one
    * file per partition value — `partCol` is the layout's partition
    * column (`cell`, `bucket`, `band`), or None for a flat directory
    * (`keys/`, `sets/`), which compacts to `numFiles` files.
    *
    * The rewrite stages into a sibling `_compact_tmp` directory and
    * swaps via delete+rename, so a crash mid-compaction leaves either
    * the old layout or the staged one — never a partial mix. The swap
    * itself is not atomic for concurrent READERS (a probe racing the
    * rename can miss the directory): compaction is an offline
    * maintenance step, run it with the stream stopped — the sinks'
    * checkpoint state is untouched (foreachBatch tracks source offsets,
    * not data files), so the stream resumes against the compacted
    * layout.
    *
    * One shuffle on the partition key (each value hashes to exactly one
    * task, hence exactly one output file per directory); a flat rewrite
    * is a round-robin repartition. Row content, schema, and partition
    * values are preserved bit-for-bit — pinned by the spec.
    */
  def compact(spark: SparkSession, dir: String, partCol: Option[String],
              numFiles: Int = 1): Unit = {
    val df = spark.read.parquet(dir)
    val tmp = dir.stripSuffix("/") + "_compact_tmp"
    partCol match {
      case Some(c) =>
        df.repartition(col(c)).write.partitionBy(c).mode("overwrite").parquet(tmp)
      case None =>
        df.repartition(numFiles).write.mode("overwrite").parquet(tmp)
    }
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // Hadoop FS signals failure by RETURN VALUE: an unchecked false from
    // delete would make the rename nest the staged copy INSIDE the old
    // layout (doubling rows), an unchecked false from rename would leave
    // no layout at all — both must abort loudly
    require(fs.delete(p, true),
      s"compaction aborted: could not delete $dir (staged copy intact at $tmp)")
    require(fs.rename(new org.apache.hadoop.fs.Path(tmp), p),
      s"compaction aborted: could not rename $tmp to $dir (data is at $tmp)")
  }

  /** Parquet data files under `dir`, recursively — the fragmentation
    * measure compaction exists to reduce.
    */
  def dataFileCount(spark: SparkSession, dir: String): Int = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(p, true)
    var n = 0
    while (it.hasNext) if (it.next().getPath.getName.endsWith(".parquet")) n += 1
    n
  }
}
