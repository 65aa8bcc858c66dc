package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Vector-similarity operators over an `array<float>` embedding column.
  *
  * Everything is expressed with higher-order Column functions
  * (`zip_with`/`aggregate`/`transform`) so the dot products run inside
  * whole-stage codegen — no UDF, no serialization wall. Computation is in
  * double for cross-engine (DuckDB oracle) agreement.
  *
  * Scale notes: brute-force top-k broadcasts the single query vector and
  * is one scan + one TakeOrdered — the right baseline even at 100 TB.
  * All-pairs uses a block-nested join and belongs behind an LSH/IVF screen
  * at scale; both screens are provided.
  */
object Similarity {

  /** Sequential left-fold dot product, as one fused codegen loop (custom
    * Catalyst expression, graft.functions.DotProduct) — same operation
    * order as the oracle's list_inner_product, so doubles agree
    * bit-for-bit, but ~10× cheaper than the `aggregate(zip_with(...))`
    * composition inside O(n²) joins.
    */
  def dot(a: Column, b: Column): Column =
    graft.functions.VectorFunctions.dot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  private def asDouble(c: Column): Column = transform(c, _.cast("double"))

  /** Brute-force cosine top-k against one query vector (by id).
    * Broadcast the 1-row query side; `orderBy(...).limit(k)` plans as
    * TakeOrderedAndProject — per-partition heap + driver merge, no global
    * sort shuffle.
    */
  def bruteForceTopK(
      emb: DataFrame, idCol: String, vecCol: String,
      queryId: Long, k: Int, scale: Int = 6): DataFrame = {
    val e = emb.select(col(idCol), asDouble(col(vecCol)).as("_v"))
    val q = e.filter(col(idCol) === queryId).select(col("_v").as("_qv"))
    e.crossJoin(broadcast(q))
      .select(col(idCol), round(cosine(col("_v"), col("_qv")), scale).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col(idCol))
      .limit(k)
  }

  /** Top-k most-similar pairs across the corpus (embedding near-dup
    * detection). All-pairs — O(n²/2) — correct as the exactness anchor;
    * at scale run it per LSH bucket instead (see [[lshBuckets]]).
    */
  def topPairs(emb: DataFrame, idCol: String, vecCol: String,
               k: Int, scale: Int = 4): DataFrame = {
    val e = emb.select(col(idCol).as("_id"), asDouble(col(vecCol)).as("_v"),
      norm(asDouble(col(vecCol))).as("_n"))
    val a = e.select(col("_id").as("d1"), col("_v").as("v1"), col("_n").as("n1"))
    val b = e.select(col("_id").as("d2"), col("_v").as("v2"), col("_n").as("n2"))
    a.join(b, col("d1") < col("d2"))
      .select(col("d1"), col("d2"),
        round(dot(col("v1"), col("v2")) / (col("n1") * col("n2")), scale).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("d1"), col("d2"))
      .limit(k)
  }

  /** Random-hyperplane LSH bucket id (sign bits of `nBits` fixed pseudo
    * hyperplanes). Hyperplane component j of plane p is a deterministic
    * value in [-0.5, 0.5) derived from md5 — reproducible across runs and
    * engines, no RNG state on executors.
    */
  def lshBucket(vec: Column, dim: Int, nBits: Int): Column = {
    val bits = (0 until nBits).map { p =>
      // plane(p) . vec, with plane components folded in via zip_with over
      // a literal array built once per plane.
      val plane = array((0 until dim).map { j =>
        val hex = java.security.MessageDigest.getInstance("MD5")
          .digest(s"$p|$j".getBytes("UTF-8"))
        // first 4 bytes as signed int scaled into [-0.5, 0.5)
        val v = java.nio.ByteBuffer.wrap(hex).getInt.toDouble / (2.0 * Int.MaxValue)
        lit(v)
      }: _*)
      when(dot(plane, vec) >= 0, lit(1)).otherwise(lit(0)).cast("string")
    }
    concat(bits: _*)
  }

  /** Assign every vector an LSH bucket; ANN search = brute force within
    * the query's bucket (optionally multi-probe by hamming-adjacent
    * buckets at scale). One narrow projection, shuffles only on the
    * bucket key for downstream joins.
    */
  def lshBuckets(emb: DataFrame, idCol: String, vecCol: String,
                 dim: Int, nBits: Int = 8): DataFrame =
    emb.select(col(idCol), col(vecCol),
      lshBucket(asDouble(col(vecCol)), dim, nBits).as("bucket"))

  /** ANN top-k via LSH: restrict the scan to the query vector's bucket,
    * then exact cosine rank inside it.
    */
  def annTopK(emb: DataFrame, idCol: String, vecCol: String,
              dim: Int, queryId: Long, k: Int, nBits: Int = 4): DataFrame = {
    val bucketed = lshBuckets(emb, idCol, vecCol, dim, nBits)
    val qb = bucketed.filter(col(idCol) === queryId)
      .select(col("bucket").as("_qb"), asDouble(col(vecCol)).as("_qv"))
    bucketed.join(broadcast(qb), col("bucket") === col("_qb"))
      .select(col(idCol),
        round(cosine(asDouble(col(vecCol)), col("_qv")), 6).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col(idCol))
      .limit(k)
  }
}
