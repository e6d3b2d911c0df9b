package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

class SimilaritySpec extends SparkSpec {

  private def emb = {
    import spark.implicits._
    Seq(
      (0L, Array(1.0f, 0.0f, 0.0f), 0),
      (1L, Array(1.0f, 0.0f, 0.0f), 0), // identical to 0
      (2L, Array(0.0f, 1.0f, 0.0f), 0), // orthogonal
      (3L, Array(0.9f, 0.1f, 0.0f), 1)) // close to 0, other label
      .toDF("vec_id", "embedding", "label")
  }

  test("cosine: identical → 1, orthogonal → 0") {
    import spark.implicits._
    val r = Seq((Array(1.0f, 2.0f), Array(1.0f, 2.0f), Array(-2.0f, 1.0f)))
      .toDF("a", "b", "c")
      .select(
        Similarity.cosine(col("a"), col("b")).as("same"),
        Similarity.cosine(col("a"), col("c")).as("orth"))
      .head()
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(math.abs(r.getDouble(1)) < 1e-12)
  }

  test("embeddingDedup blocks by label and finds the identical pair") {
    val r = Similarity.embeddingDedup(emb, 0.95).collect()
    assert(r.length == 1)
    assert(r.head.getAs[Long]("vec_a") == 0L && r.head.getAs[Long]("vec_b") == 1L)
  }

  test("bruteForceTopK ranks by cosine desc with vec_id tie-break") {
    val top = Similarity.bruteForceTopK(emb, 1, 3).collect().sortBy(_.getAs[Int]("rnk"))
    assert(top.map(_.getAs[Long]("neighbor_id")).toSeq == Seq(1L, 3L, 2L))
    assert(top.head.getAs[Double]("score") == 1.0)
  }

  test("ivfTopK probes the query's own centroid partition first") {
    val r = Similarity.ivfTopK(emb, 1, 3, nProbe = 2).collect().sortBy(_.getAs[Int]("rnk"))
    // both labels probed (only 2 centroids exist) → same result as brute force
    assert(r.map(_.getAs[Long]("neighbor_id")).toSeq == Seq(1L, 3L, 2L))
  }

  test("lshSignature puts identical vectors in the same bucket") {
    val sigs = emb.withColumn("sig", Similarity.lshSignature(col("embedding")))
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("sig")).toMap
    assert(sigs(0L) == sigs(1L))
    val r = Similarity.lshTopK(emb, 1, 3).collect()
    assert(r.exists(_.getAs[Long]("neighbor_id") == 1L)) // bucket-mate found
  }

  test("kmeansIvfTopK finds the identical vector without using labels") {
    import spark.implicits._
    // 12 vectors in two tight clusters; no informative label column
    val vecs = (0L until 6L).map(i => (i, Array(1.0f, 0.01f * i, 0.0f), 0)) ++
      (6L until 12L).map(i => (i, Array(0.0f, 0.01f * i, 1.0f), 0))
    val e = vecs.toDF("vec_id", "embedding", "label")
    val r = Similarity.kmeansIvfTopK(e, 1, 3, nCent = 2, iters = 2, nProbe = 1)
      .collect().sortBy(_.getAs[Int]("rnk"))
    // query 0 lives in the first cluster; all its top-3 must come from it
    assert(r.length == 3)
    assert(r.forall(_.getAs[Long]("neighbor_id") < 6L))
  }

  test("kmeansPpIvfTopK: farthest-point seeds split separated clusters") {
    import spark.implicits._
    val vecs = (0L until 6L).map(i => (i, Array(1.0f, 0.01f * i, 0.0f), 0)) ++
      (6L until 12L).map(i => (i, Array(0.0f, 0.01f * i, 1.0f), 0))
    val e = vecs.toDF("vec_id", "embedding", "label")
    // nCent=2: seed 2 is by construction the vector farthest from seed 1,
    // i.e. in the opposite cluster — with nProbe=1 query 0's neighbors
    // must all come from its own cluster, and the early-stop loop (iters
    // generously high) must converge rather than run 10 rounds
    val r = Similarity.kmeansPpIvfTopK(e, 1, 3, nCent = 2, iters = 10, nProbe = 1)
      .collect().sortBy(_.getAs[Int]("rnk"))
    assert(r.length == 3)
    assert(r.forall(_.getAs[Long]("neighbor_id") < 6L))
  }

  test("quantizedTopK: exact int dot, identical vector still ranks first") {
    import spark.implicits._
    val d = Seq((Array(1, 2, 3), Array(4, 5, 6))).toDF("a", "b")
      .select(graft.functions.VectorFunctions.dotI(col("a"), col("b")).as("d"))
      .head().getLong(0)
    assert(d == 32L)
    val r = Similarity.quantizedTopK(emb, 1, 3).collect().sortBy(_.getAs[Int]("rnk"))
    assert(r.map(_.getAs[Long]("neighbor_id")).toSeq == Seq(1L, 3L, 2L))
    assert(r.head.getAs[Double]("score") == 1.0) // dequant error < rd4 grid
  }

  test("embeddingSurvivors drops only the higher-id near-dup member") {
    val r = Similarity.embeddingSurvivors(emb, 0.95).collect()
    // pair (0,1) is the only near-dup → 1 dropped, 0/2/3 survive
    assert(r.map(_.getAs[Long]("vec_id")).sorted.toSeq == Seq(0L, 2L, 3L))
  }

  test("rangeSearch returns exactly the neighbors above the radius") {
    val r = Similarity.rangeSearch(emb, 1, 0.5).collect()
    // query 0: cos(1)=1.0, cos(3)≈0.9939 ≥ 0.5; cos(2)=0 excluded
    assert(r.map(_.getAs[Long]("neighbor_id")).sorted.toSeq == Seq(1L, 3L))
    assert(r.forall(_.getAs[Double]("score") >= 0.5))
  }

  test("recallEval: every query emitted, recall = hits/k, hits bounded") {
    val k = 2
    val rows = Similarity.recallEval(emb, 2, k).collect()
    assert(rows.map(_.getAs[Long]("query_id")).sorted.toSeq == Seq(0L, 1L))
    rows.foreach { r =>
      val (nf, nh) = (r.getAs[Long]("n_found"), r.getAs[Long]("n_hits"))
      assert(r.getAs[Long]("n_true") == k.toLong)
      assert(nh <= nf && nf <= k.toLong)
      assert(r.getAs[Double]("recall") == nh.toDouble / k)
    }
    // vecs 0 and 1 are identical → same LSH bucket, so each query's
    // ground-truth #1 neighbor (the identical twin) is always found
    assert(rows.forall(_.getAs[Long]("n_hits") >= 1L))
  }

  test("multiProbeTopK finds at least the single-bucket candidates") {
    val single = Similarity.lshTopK(emb, 1, 3).collect()
      .map(_.getAs[Long]("neighbor_id")).toSet
    val multi = Similarity.multiProbeTopK(emb, 1, 3).collect()
    val multiIds = multi.map(_.getAs[Long]("neighbor_id")).toSet
    assert(single.subsetOf(multiIds)) // probing more buckets never loses
    assert(multiIds.contains(1L))     // the identical twin is always found
    assert(multi.find(_.getAs[Long]("neighbor_id") == 1L)
      .get.getAs[Double]("score") == 1.0)
  }

  test("semanticDedup: identical pair found inside its learned cluster") {
    val r = Similarity.semanticDedup(emb, 0.95).collect()
    assert(r.length == 1)
    assert(r.head.getAs[Long]("vec_a") == 0L && r.head.getAs[Long]("vec_b") == 1L)
    assert(r.head.getAs[Double]("cos") == 1.0)
  }

  test("semanticDedup: LSH sub-blocking bounds fat-cluster pair counts") {
    val big = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    // threshold -2 keeps every candidate → counts compare candidate sets
    val allPairs = Similarity.semanticDedup(big, -2.0, clusterCap = Int.MaxValue).count()
    val capped = Similarity.semanticDedup(big, -2.0, clusterCap = 0).count()
    assert(capped < allPairs, "banding must prune within-cluster candidates")
    assert(capped > 0)
    // identical vectors agree on every hyperplane → share every band;
    // the cap can never lose a true duplicate pair
    val r = Similarity.semanticDedup(emb, 0.95, clusterCap = 0).collect()
    assert(r.length == 1 && r.head.getAs[Double]("cos") == 1.0)
  }

  test("recallEvalMultiProbe: multi-probe recall never below single-bucket") {
    val single = Similarity.recallEval(emb, 2, 2).collect()
      .map(r => r.getAs[Long]("query_id") -> r.getAs[Double]("recall")).toMap
    val multi = Similarity.recallEvalMultiProbe(emb, 2, 2).collect()
      .map(r => r.getAs[Long]("query_id") -> r.getAs[Double]("recall")).toMap
    assert(multi.keySet == single.keySet)
    assert(single.forall { case (q, r) => multi(q) >= r })
  }

  test("knnLabel: majority vote of top-k neighbors predicts the label") {
    // query 0 (label 0), k=3 neighbors: 1 (label 0), 3 (label 1),
    // 2 (label 0) → votes {0: 2, 1: 1} → pred 0, correct
    val r = Similarity.knnLabel(emb, 1, 3).head()
    assert(r.getAs[Int]("pred_label") == 0 && r.getAs[Long]("votes") == 2L)
    assert(r.getAs[Boolean]("correct"))
  }

  test("embeddingDrift: identical cohorts → cos 1, orthogonal cohorts → 0") {
    import spark.implicits._
    // label 0: even/odd cohorts both average to (1,0) → drift_cos 1.0;
    // label 1: cohort 0 = (1,0), cohort 1 = (0,1) → drift_cos 0.0
    val e = Seq(
      (0L, Array(1.0f, 0.0f), 0), (1L, Array(1.0f, 0.0f), 0),
      (2L, Array(1.0f, 0.0f), 0), (3L, Array(1.0f, 0.0f), 0),
      (10L, Array(1.0f, 0.0f), 1), (11L, Array(0.0f, 1.0f), 1))
      .toDF("vec_id", "embedding", "label")
    val r = Similarity.embeddingDrift(e).collect()
      .map(x => x.getAs[Int]("label") -> x.getAs[Double]("drift_cos")).toMap
    assert(r == Map(0 -> 1.0, 1 -> 0.0))
  }

  test("centroidStats: every vector counted once, twins share a tight cluster") {
    val r = Similarity.centroidStats(emb).collect()
    assert(r.map(_.getAs[Long]("n_vectors")).sum == 4L)
    // identical vecs 0/1 land in one centroid with perfect cohesion
    val pairCluster = r.find(_.getAs[Long]("n_vectors") == 2L).get
    assert(pairCluster.getAs[Double]("avg_cos") == 1.0)
    assert(pairCluster.getAs[Double]("min_cos") == 1.0)
    assert(r.forall(_.getAs[Double]("min_cos") <= 1.0))
  }

  test("kmeansPpIvfTopK degrades gracefully when the corpus is smaller than nCent") {
    // 4 vectors, 8 requested centroids: the seed sample runs out — the
    // seeding must stop with the vectors it has, not crash on empty.minBy
    val r = Similarity.kmeansPpIvfTopK(emb, 1, 3, nCent = 8, iters = 2, nProbe = 8)
      .collect()
    assert(r.map(_.getAs[Long]("neighbor_id")).toSet == Set(1L, 2L, 3L))
  }

  test("contaminationSemantic flags the train twin of a test vector") {
    // test set = {1}; train 0 is byte-identical to it → must be flagged
    // with cos 1.0; orthogonal train 2 must not appear at 0.95
    val r = Similarity.contaminationSemantic(emb, col("vec_id") === 1, 0.95).collect()
    assert(r.nonEmpty)
    assert(r.forall(_.getAs[Long]("test_id") == 1L))
    assert(r.forall(x => Set(0L, 3L).contains(x.getAs[Long]("train_id"))))
    val twin = r.find(_.getAs[Long]("train_id") == 0L).get
    assert(twin.getAs[Double]("cos_sim") == 1.0)
  }

  test("ivfPqTopK: candidates come only from probed cells, ADC ranks within") {
    import spark.implicits._
    // two orthogonal 64-dim clusters; nProbe=1 → query 0's neighbors must
    // all come from its own learned cell, scored via residual-PQ ADC
    def v(base: Int, i: Int): Array[Float] = {
      val a = Array.fill(64)(0.0f); a(base) = 1.0f; a(base + 1) = 0.01f * i; a
    }
    val vecs = (0L until 6L).map(i => (i, v(0, i.toInt), 0)) ++
      (6L until 12L).map(i => (i, v(32, i.toInt), 0))
    val e = vecs.toDF("vec_id", "embedding", "label")
    val r = Similarity.ivfPqTopK(e, 1, 3, nCent = 2, iters = 2, nProbe = 1,
      nSub = 4, nCode = 4).collect().sortBy(_.getAs[Int]("rnk"))
    assert(r.length == 3)
    assert(r.forall(_.getAs[Long]("neighbor_id") < 6L))
    assert(r.map(_.getAs[Int]("rnk")).toSeq == Seq(1, 2, 3))
  }

  test("recallEvalIvfPq: every query emitted, recall well-formed") {
    val big = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val rows = Similarity.recallEvalIvfPq(big, 5, 3).collect()
    assert(rows.map(_.getAs[Long]("query_id")).sorted.toSeq == (0L until 5L).toSeq)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_true") == 3L)
      assert(r.getAs[Long]("n_hits") <= r.getAs[Long]("n_found"))
      val rec = r.getAs[Double]("recall")
      assert(rec >= 0.0 && rec <= 1.0)
    }
  }

  test("pcaPower: converges to the dominant direction with its eigenvalue") {
    import spark.implicits._
    // zero-mean rank-1 cloud along (3,1)/sqrt(10): lambda1 = 25
    val e = Seq(
      (0L, Array(3.0f, 1.0f), 0), (1L, Array(-3.0f, -1.0f), 0),
      (2L, Array(6.0f, 2.0f), 0), (3L, Array(-6.0f, -2.0f), 0))
      .toDF("vec_id", "embedding", "label")
    val r = Similarity.pcaPower(e, iters = 3, dim = 2).collect()
      .map(x => x.getAs[Int]("dim") -> x).toMap
    val (l1, l2) = (r(1).getAs[Double]("loading"), r(2).getAs[Double]("loading"))
    val trueDir = (3.0 / math.sqrt(10.0), 1.0 / math.sqrt(10.0))
    assert(math.abs(math.abs(l1 * trueDir._1 + l2 * trueDir._2) - 1.0) < 1e-4)
    assert(math.abs(r(1).getAs[Double]("eigenvalue") - 25.0) < 0.01)
  }

  test("ivfTuningCurve: recall is monotone in the probe count") {
    val r = Similarity.ivfTuningCurve(emb, 2, 2, Seq(1, 2)).collect()
      .sortBy(_.getAs[Int]("n_probe"))
    assert(r.map(_.getAs[Int]("n_probe")).toSeq == Seq(1, 2))
    assert(r.forall(_.getAs[Long]("n_true_total") == r.head.getAs[Long]("n_true_total")))
    assert(r(1).getAs[Double]("mean_recall") >= r(0).getAs[Double]("mean_recall"))
    assert(r.forall { x =>
      val m = x.getAs[Double]("mean_recall"); m >= 0.0 && m <= 1.0
    })
  }

  test("pcaProjectionHistogram: symmetric rank-1 cloud lands in mirrored bins") {
    import spark.implicits._
    val e = Seq(
      (0L, Array(3.0f, 1.0f), 0), (1L, Array(-3.0f, -1.0f), 0),
      (2L, Array(6.0f, 2.0f), 0), (3L, Array(-6.0f, -2.0f), 0))
      .toDF("vec_id", "embedding", "label")
    val r = Similarity.pcaProjectionHistogram(e, iters = 3, binWidth = 0.5, dim = 2)
      .collect().map(x => x.getAs[Long]("bin") -> x.getAs[Long]("n_vecs")).toMap
    assert(r.values.sum == 4L && r.values.forall(_ == 1L))
    // projections are ±sqrt(10) and ±2*sqrt(10): mirrored bin pairs
    assert(r.keySet.map(b => -b - 1L) == r.keySet)
  }

  test("embeddingOutliers: the out-of-distribution vector ranks first") {
    import spark.implicits._
    val e = Seq(
      (0L, Array(1.0f, 0.1f), 0), (1L, Array(1.1f, 0.0f), 0),
      (2L, Array(0.9f, -0.1f), 0), (3L, Array(1.0f, 5.0f), 0))
      .toDF("vec_id", "embedding", "label")
    val r = Similarity.embeddingOutliers(e, 4).collect()
    assert(r.head.getAs[Long]("vec_id") == 3L)
    assert(r.head.getAs[Double]("score") > r(1).getAs[Double]("score"))
    val r2 = Similarity.embeddingOutliers(e, 4).collect()
    assert(r.map(_.toString).sameElements(r2.map(_.toString)))
  }

  test("dimStats: exact per-dimension moments and variance ranking") {
    import spark.implicits._
    val e = Seq(
      (0L, Array(1.0f, 5.0f), 0),
      (1L, Array(3.0f, 5.0f), 0)) // dim1: mean 2 var 1; dim2: mean 5 var 0
      .toDF("vec_id", "embedding", "label")
    val r = Similarity.dimStats(e).collect()
      .map(x => x.getAs[Int]("dim") -> x).toMap
    assert(r(1).getAs[Double]("mean_v") == 2.0 && r(1).getAs[Double]("var_v") == 1.0)
    assert(r(2).getAs[Double]("mean_v") == 5.0 && r(2).getAs[Double]("var_v") == 0.0)
    assert(r(1).getAs[Long]("var_rank") == 1L && r(2).getAs[Long]("var_rank") == 2L)
  }

  test("normStats: zero vectors counted, mean and percentiles exact") {
    import spark.implicits._
    val e = Seq(
      (0L, Array(3.0f, 4.0f), 0),   // norm 5
      (1L, Array(0.0f, 0.0f), 0),   // zero vector
      (2L, Array(6.0f, 8.0f), 0),   // norm 10
      (3L, Array(1.0f, 0.0f), 1))   // norm 1
      .toDF("vec_id", "embedding", "label")
    val r = Similarity.normStats(e).collect().map(x => x.getAs[Int]("label") -> x).toMap
    assert(r(0).getAs[Long]("n_vecs") == 3L)
    assert(r(0).getAs[Long]("n_zero") == 1L)
    assert(r(0).getAs[Double]("mean_norm") == 5.0) // (5 + 0 + 10) / 3
    assert(r(0).getAs[Double]("p50") == 5.0)
    assert(r(1).getAs[Long]("n_zero") == 0L)
    assert(r(1).getAs[Double]("p10") == 1.0 && r(1).getAs[Double]("p90") == 1.0)
  }

  test("clusterLabelPurity: dominant label with min-label tie break") {
    import spark.implicits._
    val emb = Seq((1L, 3), (2L, 3), (3L, 7), (4L, 4), (5L, 5))
      .toDF("vec_id", "label")
    val asn = Seq((1L, 1), (2L, 1), (3L, 1), (4L, 2), (5L, 2))
      .toDF("vec_id", "cid")
    val r = Similarity.clusterLabelPurityFrom(emb, asn).collect()
      .map(x => x.getAs[Long]("cid") -> x).toMap
    assert(r(1L).getAs[Long]("n_vectors") == 3L &&
      r(1L).getAs[Int]("top_label") == 3 &&
      r(1L).getAs[Long]("top_n") == 2L &&
      r(1L).getAs[Double]("purity") == 0.6667)
    // cid 2 ties 1-1 between labels 4 and 5: the smaller label wins
    assert(r(2L).getAs[Int]("top_label") == 4 &&
      r(2L).getAs[Double]("purity") == 0.5)
  }

  test("hybridRrfTopK: fusion rewards presence in both lists") {
    import spark.implicits._
    // docs: 1 and 2 carry the query term (1 twice); embeddings: 2 and 3
    // are the closest to query vector 0 — doc 2 is in BOTH pools and
    // must fuse to the top
    val docs = Seq((1L, "cat cat x y"), (2L, "cat a b c"), (3L, "dog e f g"))
      .toDF("doc_id", "text")
    val emb = Seq(
      (0L, Array(1.0f, 0.0f), 0), (2L, Array(0.9f, 0.1f), 0),
      (3L, Array(0.8f, 0.2f), 0), (1L, Array(0.0f, 1.0f), 0))
      .toDF("vec_id", "embedding", "label")
    val r = Similarity.hybridRrfTopK(docs, emb, Seq("cat"), 0L, 10).collect()
    val byId = r.map(x => x.getAs[Long]("doc_id") -> x).toMap
    // doc 2: lex rank 2 + sem rank 1 → 1/62 + 1/61 ≈ 0.0325; beats doc 1
    // (lex 1 + sem 3 → 1/61 + 1/63 ≈ 0.0323) and doc 3 (sem 2 only)
    assert(r.head.getAs[Long]("doc_id") == 2L)
    assert(byId(2L).getAs[Int]("lex_rank") == 2 &&
      byId(2L).getAs[Int]("sem_rank") == 1)
    // doc 1 leads the lexical pool and trails the semantic pool (cos 0
    // still makes the 20-row pool in this tiny corpus)
    assert(byId(1L).getAs[Int]("lex_rank") == 1 &&
      byId(1L).getAs[Int]("sem_rank") == 3)
    assert(byId(3L).isNullAt(byId(3L).fieldIndex("lex_rank")),
      "doc 3 has no query term, lex_rank must be NULL")
    val s2 = byId(2L).getAs[Double]("rrf_score")
    val s1 = byId(1L).getAs[Double]("rrf_score")
    assert(s2 > s1, "two-list doc must outrank single-list docs")
  }

  test("cosineThresholdCurve: deciles bucket pairs, cumulative from the top") {
    import spark.implicits._
    val pairs = Seq((1L, 2L, 0.95), (3L, 4L, 0.91), (5L, 6L, 0.42))
      .toDF("vec_a", "vec_b", "cos_sim")
    val r = Similarity.cosineThresholdCurve(pairs).collect()
      .map(x => x.getAs[Double]("cos_bucket") ->
        ((x.getAs[Long]("n_pairs"), x.getAs[Long]("n_pairs_at_or_above")))).toMap
    assert(r == Map(0.9 -> ((2L, 2L)), 0.4 -> ((1L, 3L))))
  }

  test("pagerankGraph replays the exact integer recurrence on a planted star") {
    import spark.implicits._
    // star: 2,3,4 all point at 1; node 5 isolated
    val nodes = Seq(1L, 2L, 3L, 4L, 5L).toDF("vec_id")
    val edges = Seq((2L, 1L), (3L, 1L), (4L, 1L)).toDF("src", "dst")
    val got = Similarity.pagerankGraph(edges, nodes, 3, 5)
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("rg")).toMap
    // replay the same integer recurrence sequentially
    val G = 1000000000L; val n = 5L
    var r = (1L to 5L).map(_ -> G / n).toMap
    for (_ <- 1 to 3) {
      val in1 = Seq(2L, 3L, 4L).map(s => r(s) / 1L).sum // od = 1 for each spoke
      r = r.keys.map(k =>
        k -> (15L * (G / n) + 85L * (if (k == 1L) in1 else 0L)) / 100L).toMap
    }
    assert(got == r, s"got $got want $r")
    assert(got(1L) > got(2L) && got(2L) == got(5L),
      "hub must outrank spokes; spokes and isolated node share the floor")
  }

  test("matryoshkaRecall: full-dim prefix recovers the ground truth exactly") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val r = Similarity.matryoshkaRecall(emb, Seq(8, 64), 5, 5).collect()
      .map(x => x.getAs[Int]("dim") ->
        ((x.getAs[Long]("n_queries"), x.getAs[Double]("recall")))).toMap
    assert(r(64) == ((5L, 1.0)), "dim=64 IS the ground-truth ranking")
    assert(r(8)._1 == 5L && r(8)._2 <= 1.0 && r(8)._2 >= 0.0)
  }

  test("hubness: distribution masses account for every vector and edge") {
    val dir = "/root/testdata/sf0.001"
    val n = spark.read.parquet(s"$dir/embeddings.parquet").count()
    val edges = Similarity.knnJoin(spark, dir, 5).count()
    val dist = Similarity.hubness(spark, dir, 5).collect()
      .map(x => x.getAs[Long]("in_degree") -> x.getAs[Long]("n_vectors"))
    assert(dist.map(_._2).sum == n, "every corpus vector appears once")
    assert(dist.map(t => t._1 * t._2).sum == edges,
      "in-degree mass equals the edge count")
  }
}
