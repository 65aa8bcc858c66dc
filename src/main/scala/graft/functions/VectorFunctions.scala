package graft.functions

import org.apache.spark.sql.Column

/** Public face of the custom vector expressions
  * (org.apache.spark.sql.graft.DotProduct — see that file for why the
  * implementation lives in Spark's package space).
  */
object VectorFunctions {
  /** Dot product of two array<double> columns as one fused codegen loop. */
  def dot(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.VectorBridge.dot(a, b)

  /** Distinct w-word shingles of a space-split text column, single pass. */
  def wordShingles(text: Column, w: Int): Column =
    org.apache.spark.sql.graft.VectorBridge.wordShingles(text, w)
}
