package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Hashing

/** Similarity search over the `embeddings` table (64-dim float vectors).
  *
  * Cosine is computed in DOUBLE with strict left-to-right accumulation so
  * the DuckDB oracle (same formula, same order) produces bit-identical
  * results. Brute force is the correctness baseline; hyperplane LSH is the
  * scale path (bucket join instead of cross join).
  */
object Similarity {

  /** cos(a, b) with double accumulation, builtin higher-order functions. */
  def cosine(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column) = aggregate(
      zip_with(x, y, (u, v) => u.cast("double") * v.cast("double")),
      lit(0.0), (acc, p) => acc + p)
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
  }

  /** Embedding near-dup pairs within a blocking key (label), cos ≥ threshold. */
  def embeddingDedup(emb: DataFrame, threshold: Double): DataFrame =
    emb.as("a")
      .join(emb.as("b"),
        col("a.label") === col("b.label") && col("a.vec_id") < col("b.vec_id"))
      .select(
        col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        col("a.label").as("label"),
        round(cosine(col("a.embedding"), col("b.embedding")), 4).as("cos_sim"))
      .filter(col("cos_sim") >= threshold)

  /** Exact top-k cosine neighbors for each query vector (vec_id < nQueries).
    * Queries are broadcast; ranking is deterministic (score desc, vec_id).
    */
  def bruteForceTopK(emb: DataFrame, nQueries: Int, k: Int): DataFrame = {
    val q = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val scored = emb.as("c")
      .join(broadcast(q), col("c.vec_id") =!= col("query_id"))
      .select(col("query_id"), col("c.vec_id").as("neighbor_id"),
        cosine(col("qv"), col("c.embedding")).as("cos"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rnk"),
        round(col("cos"), 4).as("score"))
  }

  val NumPlanes = 8

  /** ±1 hyperplane matrix, md5-derived (same literals in the oracle SQL). */
  lazy val planes: Seq[Seq[Double]] =
    (0 until NumPlanes).map { p =>
      (1 to 64).map(i => if (Hashing.h60jvm(s"plane${p}_$i") % 2 == 1) 1.0 else -1.0)
    }

  /** Hyperplane-LSH bucket signature (NumPlanes sign bits). */
  def lshSignature(v: Column): Column =
    planes.zipWithIndex.map { case (plane, p) =>
      val dot = aggregate(
        zip_with(v, typedLit(plane), (x, w) => x.cast("double") * w),
        lit(0.0), (acc, t) => acc + t)
      when(dot > 0, 1L << p).otherwise(0L)
    }.reduce(_ + _)

  /** ANN via LSH buckets: candidates share the query's bucket signature,
    * reranked by exact cosine. Recall < 1 by construction; the oracle
    * replicates the same bucketing, so results still match exactly.
    */
  def lshTopK(emb: DataFrame, nQueries: Int, k: Int): DataFrame = {
    val sig = emb.withColumn("sig", lshSignature(col("embedding")))
    val q = sig.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"), col("sig"))
    val scored = sig.as("c")
      .join(broadcast(q), col("c.sig") === q("sig") && col("c.vec_id") =!= col("query_id"))
      .select(col("query_id"), col("c.vec_id").as("neighbor_id"),
        cosine(col("qv"), col("c.embedding")).as("cos"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rnk"),
        round(col("cos"), 4).as("score"))
  }
}
