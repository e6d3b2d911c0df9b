package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{Hashing, VectorFunctions => V}

/** Similarity search over the `embeddings` table (64-dim float vectors).
  *
  * Hot-path design: per-vector L2 norms are projected ONCE before any join
  * (one dot per vector, not three per pair), and the per-pair dot product
  * is the codegen'd FloatDotProduct expression rather than interpreted
  * higher-order functions. Accumulation is double left-to-right, so the
  * DuckDB oracle (same formula, same order) stays bit-identical.
  */
object Similarity {

  /** cos(a, b) composed from builtins — correctness reference; the
    * operators below use the precomputed-norm + codegen path instead.
    */
  def cosine(a: Column, b: Column): Column =
    V.dotF(a, b) / (V.normF(a) * V.normF(b))

  /** Project (vec_id, embedding, label, nrm) once. */
  private def withNorm(emb: DataFrame): DataFrame =
    emb.withColumn("nrm", V.normF(col("embedding")))

  /** Embedding near-dup pairs within a blocking key (label), cos ≥ threshold. */
  def embeddingDedup(emb: DataFrame, threshold: Double): DataFrame = {
    val e = withNorm(emb)
    e.as("a")
      .join(e.as("b"),
        col("a.label") === col("b.label") && col("a.vec_id") < col("b.vec_id"))
      .select(
        col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        col("a.label").as("label"),
        Hashing.rd4(V.dotF(col("a.embedding"), col("b.embedding")) /
          (col("a.nrm") * col("b.nrm"))).as("cos_sim"))
      .filter(col("cos_sim") >= threshold)
  }

  /** Exact top-k cosine neighbors for each query vector (vec_id < nQueries).
    * Queries are broadcast; ranking is deterministic (score desc, vec_id).
    */
  def bruteForceTopK(emb: DataFrame, nQueries: Int, k: Int): DataFrame = {
    val e = withNorm(emb)
    val q = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"), col("nrm").as("qnrm"))
    val scored = e.as("c")
      .join(broadcast(q), col("c.vec_id") =!= col("query_id"))
      .select(col("query_id"), col("c.vec_id").as("neighbor_id"),
        (V.dotF(col("qv"), col("c.embedding")) / (col("qnrm") * col("c.nrm"))).as("cos"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rnk"),
        Hashing.rd4(col("cos")).as("score"))
  }

  val NumPlanes = 8

  /** ±1 hyperplane matrix, md5-derived (same literals in the oracle SQL).
    * Float entries: ±1.0 is exact in float, and the dot is computed in
    * double either way.
    */
  lazy val planes: Seq[Seq[Float]] =
    (0 until NumPlanes).map { p =>
      (1 to 64).map(i => if (Hashing.h60jvm(s"plane${p}_$i") % 2 == 1) 1.0f else -1.0f)
    }

  /** Hyperplane-LSH bucket signature (NumPlanes sign bits). */
  def lshSignature(v: Column): Column =
    planes.zipWithIndex.map { case (plane, p) =>
      when(V.dotF(v, typedLit(plane)) > 0, 1L << p).otherwise(0L)
    }.reduce(_ + _)

  /** IVF-style ANN: coarse quantization by per-label centroids (element-wise
    * mean vectors); each query probes the nProbe nearest centroids and runs
    * exact cosine only within those partitions. The scale path when buckets
    * must be balanced: |candidates| ≈ nProbe/|centroids| of the corpus.
    * Declared rows-only (centroid means are float-sum order dependent, so
    * no bit-exact SQL oracle).
    */
  def ivfTopK(emb: DataFrame, nQueries: Int, k: Int, nProbe: Int = 2): DataFrame = {
    val e = withNorm(emb)
    val cent = emb
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy(col("label"), col("pos")).agg(avg(col("v")).as("cv"))
      .groupBy(col("label"))
      .agg(expr("transform(sort_array(collect_list(struct(pos, cv))), x -> CAST(x.cv AS FLOAT))")
        .as("cvec"))
      .withColumn("cnrm", V.normF(col("cvec")))
    val q = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"), col("nrm").as("qnrm"))
    val wc = Window.partitionBy(col("query_id"))
      .orderBy((V.dotF(col("qv"), col("cvec")) / (col("qnrm") * col("cnrm"))).desc, col("label"))
    val probes = broadcast(q).crossJoin(broadcast(cent))
      .withColumn("crnk", row_number().over(wc))
      .filter(col("crnk") <= nProbe)
      .select(col("query_id"), col("qv"), col("qnrm"), col("label"))
    val scored = e.as("c")
      .join(broadcast(probes),
        col("c.label") === probes("label") && col("c.vec_id") =!= col("query_id"))
      .select(col("query_id"), col("c.vec_id").as("neighbor_id"),
        (V.dotF(col("qv"), col("c.embedding")) / (col("qnrm") * col("c.nrm"))).as("cos"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rnk"),
        Hashing.rd4(col("cos")).as("score"))
  }

  /** ANN via LSH buckets: candidates share the query's bucket signature,
    * reranked by exact cosine. Recall < 1 by construction; the oracle
    * replicates the same bucketing, so results still match exactly.
    */
  def lshTopK(emb: DataFrame, nQueries: Int, k: Int): DataFrame = {
    val sig = withNorm(emb).withColumn("sig", lshSignature(col("embedding")))
    val q = sig.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
        col("nrm").as("qnrm"), col("sig"))
    val scored = sig.as("c")
      .join(broadcast(q), col("c.sig") === q("sig") && col("c.vec_id") =!= col("query_id"))
      .select(col("query_id"), col("c.vec_id").as("neighbor_id"),
        (V.dotF(col("qv"), col("c.embedding")) / (col("qnrm") * col("c.nrm"))).as("cos"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rnk"),
        Hashing.rd4(col("cos")).as("score"))
  }
}
