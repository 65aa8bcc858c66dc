package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.VectorFunctions.registerSql(spark)
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // q12b has no SQL oracle by design (HLL++ is engine-specific), but it
    // is NOT unchecked: assert the documented accuracy contract —
    // approx_count_distinct within 5% of the exact distinct — and record
    // the measured error next to the dumps so the round artifact carries
    // a bound, not just "no_oracle".
    try {
      val exact = graft.Tables.load(spark, sfDir, "orders")
        .agg(org.apache.spark.sql.functions.countDistinct(
          org.apache.spark.sql.functions.col("o_custkey")))
        .head().getLong(0)
      val approx = spark.read.parquet(s"$outDir/q12b_approx_distinct")
        .head().getLong(0)
      val relErr = math.abs(approx - exact).toDouble / exact
      val bound = 0.05
      Files.writeString(Paths.get(s"$outDir/q12b_bound.json"),
        f"""{"query": "q12b_approx_distinct", "exact": $exact, "approx": $approx, "rel_err": $relErr%.6f, "bound": $bound, "pass": ${relErr <= bound}}""")
      if (relErr > bound)
        System.err.println(
          f"[verify] q12b_approx_distinct bound FAILED: |$approx - $exact| / $exact = $relErr%.4f > $bound")
    } catch { case e: Throwable =>
      System.err.println(s"[verify] q12b bound check failed to run: ${e.getMessage}")
    }
    spark.stop()
  }
}
