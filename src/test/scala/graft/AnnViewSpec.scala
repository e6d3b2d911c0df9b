package graft

import graft.operators.Similarity
import graft.core.Tables

/** The shared k-means quantizer view: one trained (centroids,
  * assignment) pair feeding the five k-means-family queries, with
  * results identical to the cold per-query training runs.
  */
class AnnViewSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def emb = Tables.load(spark, dir, "embeddings")

  private def sameRows(a: org.apache.spark.sql.DataFrame,
      b: org.apache.spark.sql.DataFrame): Boolean =
    a.except(b).isEmpty && b.except(a).isEmpty

  test("view-based k-means family equals the cold-start computations") {
    val (cent, asn) = Similarity.sharedKmeans(spark, dir)
    assert(sameRows(Similarity.kmeansIvfTopKFrom(emb, cent, asn, 10, 5),
      Similarity.kmeansIvfTopK(emb, 10, 5)),
      "kmeansIvfTopKFrom != kmeansIvfTopK")
    assert(sameRows(Similarity.centroidStatsFrom(emb, cent, asn),
      Similarity.centroidStats(emb)),
      "centroidStatsFrom != centroidStats")
    assert(sameRows(
      Similarity.semanticDedupFrom(emb, cent, asn, 0.4, clusterCap = 64,
        bands = 2, rowsPerBand = 4),
      Similarity.semanticDedup(emb, 0.4, clusterCap = 64,
        bands = 2, rowsPerBand = 4)),
      "semanticDedupFrom != semanticDedup")
    assert(sameRows(Similarity.ivfPqTopKFrom(emb, cent, asn, 10, 5),
      Similarity.ivfPqTopK(emb, 10, 5)),
      "ivfPqTopKFrom != ivfPqTopK")
    assert(sameRows(Similarity.recallEvalIvfPqFrom(emb, cent, asn, 10, 5),
      Similarity.recallEvalIvfPq(emb, 10, 5)),
      "recallEvalIvfPqFrom != recallEvalIvfPq")
  }

  test("view-based embedding-pair family equals the cold-start computations") {
    val view = Similarity.sharedEmbPairs(spark, dir)
    assert(sameRows(view, Similarity.embeddingDedup(emb, 0.4)),
      "sharedEmbPairs != embeddingDedup(0.4)")
    assert(sameRows(Similarity.embeddingSurvivorsFrom(emb, view),
      Similarity.embeddingSurvivors(emb, 0.4)),
      "embeddingSurvivorsFrom(view) != embeddingSurvivors")
    // memoized, and frozen DISK state (the persisted EmbPairsStore):
    // the optimized plan is a parquet scan of the store's pairs/, with
    // no dependence on the embeddings source
    assert(Similarity.sharedEmbPairs(spark, dir) eq view)
    val storePaths = view.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        r.relation match {
          case f: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            f.location.rootPaths.map(_.toString)
          case _ => Seq.empty
        }
    }.flatten
    assert(storePaths.nonEmpty && storePaths.forall(p =>
      p.contains("graft_embpairs") && p.contains("pairs")),
      s"sharedEmbPairs must read the persisted pair store, got $storePaths")
  }

  test("the quantizer is trained ONCE per (session, dir)") {
    val (c1, a1) = Similarity.sharedKmeans(spark, dir)
    val before = graft.operators.QuantizerStore.trainCount.get()
    val (c2, a2) = Similarity.sharedKmeans(spark, dir)
    assert((c1 eq c2) && (a1 eq a2), "sharedKmeans retrained instead of memoizing")
    assert(graft.operators.QuantizerStore.trainCount.get() == before,
      "sharedKmeans retrained on the second call")
    // the assignment is frozen DISK state (the persisted QuantizerStore),
    // not a lazy plan over embeddings: its optimized plan is a parquet
    // scan of the store, with no dependence on the embeddings source
    val storePaths = a1.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        r.relation match {
          case f: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            f.location.rootPaths.map(_.toString)
          case _ => Seq.empty
        }
    }.flatten
    assert(storePaths.nonEmpty && storePaths.forall(_.contains("graft_quantizers")),
      s"assignment is not a quantizer-store scan: $storePaths")
  }

  test("knnJoinBlocked: edges are semantic pairs, ranks consecutive per vector") {
    import org.apache.spark.sql.functions.col
    val (c, a) = Similarity.sharedKmeans(spark, dir)
    val pairs = Similarity.semanticDedupFrom(
      graft.core.Tables.load(spark, dir, "embeddings"), c, a, 0.4,
      clusterCap = 64, bands = 2, rowsPerBand = 4).collect()
      .map(r => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b")) ->
        r.getAs[Double]("cos")).toMap
    val g = Similarity.knnJoinBlocked(spark, dir, 5).collect()
    assert(g.nonEmpty)
    for (x <- g) {
      val (s0, d0) = (x.getAs[Long]("vec_id"), x.getAs[Long]("neighbor_id"))
      val key = if (s0 < d0) (s0, d0) else (d0, s0)
      assert(pairs.get(key).contains(x.getAs[Double]("cos_sim")),
        s"edge $key not a semantic pair")
    }
    for ((_, rows) <- g.groupBy(_.getAs[Long]("vec_id"))) {
      val rnks = rows.map(_.getAs[Long]("rnk")).sorted.toSeq
      assert(rnks == (1L to rnks.length).toSeq && rnks.length <= 5)
    }
  }

  test("knnClusters: hash-min labels are component minima and edges stay intra-cluster") {
    import org.apache.spark.sql.functions.{col, least, greatest}
    val comp = Similarity.knnClusters(spark, dir, 3).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        ((r.getAs[Long]("cluster_id"), r.getAs[Long]("csize")))).toMap
    assert(comp.nonEmpty)
    // converged hash-min: every label <= its member, and is itself a member of its cluster
    assert(comp.forall { case (v, (c, _)) => c <= v && comp(c)._1 == c })
    // csize is the exact member count
    val sizes = comp.values.groupBy(_._1).map { case (c, xs) => c -> xs.size.toLong }
    assert(comp.forall { case (_, (c, sz)) => sizes(c) == sz })
    // every undirected knn edge connects members of one cluster
    val edges = Similarity.knnJoin(spark, dir, 3)
      .select(least(col("vec_id"), col("neighbor_id")).as("a"),
        greatest(col("vec_id"), col("neighbor_id")).as("b")).distinct().collect()
    assert(edges.forall(e => comp(e.getAs[Long]("a"))._1 == comp(e.getAs[Long]("b"))._1))
  }

  test("knnJoin: every edge is a shared-view pair, ranks consecutive, cos non-increasing") {
    import org.apache.spark.sql.functions.col
    val pairs = Similarity.sharedEmbPairs(spark, dir).collect()
      .map(r => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b")) ->
        r.getAs[Double]("cos_sim")).toMap
    val g = Similarity.knnJoin(spark, dir, 3).collect()
    assert(g.nonEmpty)
    for (x <- g) {
      val (s0, d0) = (x.getAs[Long]("vec_id"), x.getAs[Long]("neighbor_id"))
      val key = if (s0 < d0) (s0, d0) else (d0, s0)
      assert(pairs.get(key).contains(x.getAs[Double]("cos_sim")),
        s"edge $key not in the shared pair view")
    }
    for ((_, rows) <- g.groupBy(_.getAs[Long]("vec_id"))) {
      val sorted = rows.sortBy(_.getAs[Long]("rnk"))
      assert(sorted.map(_.getAs[Long]("rnk")).toSeq == (1L to sorted.length).toSeq)
      val cs = sorted.map(_.getAs[Double]("cos_sim"))
      assert(cs.zip(cs.tail).forall { case (a, b) => a >= b }, "cos not non-increasing")
      assert(sorted.length <= 3)
    }
  }
}
