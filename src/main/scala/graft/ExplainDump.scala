package graft

/** Diagnostic main (PlanAudit's sibling): write `.explain("formatted")`
  * for the named declared queries to a directory — the plan artifacts
  * the optimization rounds commit as `plans/rNN/<query>_{before,after}.txt`.
  *
  * Runs under the BENCH session recipe (local[cpus], shuffle partitions =
  * cores, auto-broadcast at its default) so the dumped plan is the one the
  * bench actually executes — unlike PlanAudit, which disables broadcast to
  * audit the 100 TB join shape. Note: stage-boundary materializations
  * (`localCheckpoint` in Curation) truncate the visible plan; for those
  * queries the interesting plan is dumped with
  * `-Dgraft.curate.materialize=none` (pass `nomat` as arg 3) so the WHOLE
  * chain is one explainable tree.
  *
  * Usage: runMain graft.ExplainDump <outDir> <suffix> [q1,q2,...]
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val only: Option[Set[String]] =
      if (args.length > 2 && args(2).nonEmpty) Some(args(2).split(",").toSet)
      else None
    val spark = BenchHarness.session(BenchHarness.cpus(default = 4))
    graft.functions.VectorFunctions.registerSql(spark)
    new java.io.File(outDir).mkdirs()
    // a failed dump must fail the RUN: committed before/after plan
    // artifacts silently going stale (e.g. a missing fixture dir failing
    // every query) is worse than a loud nonzero exit
    var failed = 0
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .foreach { case (name, fn) =>
        try {
          val df = fn(spark, BenchHarness.sfDir)
          val plan = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          java.nio.file.Files.write(
            java.nio.file.Paths.get(s"$outDir/${name}_$suffix.txt"),
            plan.getBytes("UTF-8"))
          println(s"[explain] $name -> $outDir/${name}_$suffix.txt")
        } catch { case e: Throwable =>
          failed += 1
          System.err.println(s"[explain] $name failed: ${e.getMessage}")
        }
      }
    spark.stop()
    if (failed > 0) {
      System.err.println(s"[explain] $failed dump(s) failed")
      System.exit(1)
    }
  }
}
