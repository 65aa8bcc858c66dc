package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional 3rd arg: comma-separated query-name filter (local
    // iteration on one query; the driver always passes 2 args)
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").toSet) else None
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
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
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
      .filter { case (k, _) => only.forall(_.contains(k)) }
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
    // q60b likewise: the percentile sketch has no SQL oracle, so check
    // the contract it actually makes — RANK error: a returned value v
    // for percentile p must sit at empirical CDF position within eps of
    // p (approx_percentile guarantees 1/accuracy = 1e-4; the recorded
    // bound leaves 50× slack). Value-distance to the interpolated exact
    // percentile is NOT the sketch's contract: the sketch returns an
    // actual data value, and a sparse value neighborhood makes that gap
    // arbitrarily large at zero rank error.
    try {
      import org.apache.spark.sql.functions._
      val docs = graft.Tables.load(spark, sfDir, "documents")
        .select(col("source"), col("n_chars"))
      val melted = spark.read.parquet(s"$outDir/q60b_percentiles_approx")
        .select(col("source"), explode(map(
          lit(0.25), col("p25"), lit(0.5), col("p50"), lit(0.9), col("p90")))
          .as(Seq("p", "v")))
      val relErr = docs.join(melted, "source")
        .groupBy(col("source"), col("p"), col("v"))
        .agg(
          (sum(when(col("n_chars") <= col("v"), 1L).otherwise(0L))
            / count(lit(1))).as("cdf_le"),
          (sum(when(col("n_chars") < col("v"), 1L).otherwise(0L))
            / count(lit(1))).as("cdf_lt"))
        .select(greatest(lit(0.0), col("p") - col("cdf_le"),
          col("cdf_lt") - col("p")).as("err"))
        .collect().map(_.getDouble(0)).max // bounded: sources × 3 rows
      val bound = 0.005
      Files.writeString(Paths.get(s"$outDir/q60b_bound.json"),
        f"""{"query": "q60b_percentiles_approx", "rel_err": $relErr%.6f, "bound": $bound, "pass": ${relErr <= bound}}""")
      if (relErr > bound)
        System.err.println(
          f"[verify] q60b_percentiles_approx bound FAILED: max rank err $relErr%.4f > $bound")
    } catch { case e: Throwable =>
      System.err.println(s"[verify] q60b bound check failed to run: ${e.getMessage}")
    }
    spark.stop()
  }
}
