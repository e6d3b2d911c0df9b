package graft

import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.operators.Similarity

/** Scale sanity harness for the ANN path: runs unsupervised-IVF top-k
  * (hash-seeded k-means coarse quantizer + nProbe probing) against exact
  * brute force on a synthetic corpus ~2-3 orders of magnitude larger than
  * the sf0.1 `embeddings` table (default 1M vectors), with PLANTED
  * cluster structure, and asserts the properties the 100-TB design
  * claims:
  *
  *   - recall@k vs exact brute force stays high (planted clusters are
  *     what real embedding corpora look like — ANN on structureless
  *     uniform noise is meaningless);
  *   - the learned coarse cells stay balanced enough that probing
  *     nProbe of nCent cells scans a bounded corpus fraction — the
  *     claim "candidates ≈ nProbe/nCent of the corpus";
  *   - no degenerate cell absorbs the corpus (the failure mode that
  *     silently turns IVF back into brute force).
  *
  * Planted layout: `C` ground-truth clusters; vector i belongs to
  * cluster i % C and is its center plus ±0.15 uniform noise per
  * component (centers are ±1.0 uniform — far apart in 64-dim, so true
  * neighbors are overwhelmingly same-cluster). Queries are corpus
  * members (vec_id < nQueries), matching the operator contract.
  * Additionally each query has `k` planted NEAR-COPIES (its vector plus
  * ±0.01 noise) at ids [nQueries, nQueries·(k+1)) — the ground-truth
  * top-k every index should recover, and the workload where residual
  * quantization earns its keep (see check 3).
  *
  * `runMain graft.AnnScaleCheck [nVec]`.
  */
object AnnScaleCheck {
  def main(args: Array[String]): Unit = {
    val nVec = args.headOption.map(_.toLong).getOrElse(1000000L)
    val spark = Harness.session()

    val dim = 64
    val C = 64        // planted clusters
    val nQueries = 32
    val k = 10
    val nCent = 16    // learned coarse cells (each covers ~C/nCent planted clusters)
    val nProbe = 4

    // ids [nQueries, nQueries·(k+1)) are near-copies of query id%nQueries:
    // same cluster center + SAME per-source noise draw, plus a ±0.01
    // per-id perturbation (applied to every vector so the formula is one
    // uniform expression)
    val emb = spark.range(nVec)
      .withColumn("src", when(
        col("id") >= nQueries && col("id") < (nQueries.toLong * (k + 1)),
        pmod(col("id"), lit(nQueries.toLong))).otherwise(col("id")))
      .withColumn("cid0", pmod(col("src"), lit(C.toLong)))
      .withColumn("embedding", expr(
        s"""transform(sequence(1, $dim), j -> CAST(
              (pmod(xxhash64(cid0 + 1000003, j), 2000) - 1000) / 1000.0 +
              (pmod(xxhash64(src, j + 100), 2000) - 1000) / 1000.0 * 0.15 +
              (pmod(xxhash64(id, j + 200), 2000) - 1000) / 1000.0 * 0.01
            AS FLOAT))"""))
      .select(col("id").as("vec_id"), col("embedding"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    import Harness.timed

    // --- 1. coarse-cell balance: the probe-cost bound is only real if
    // no learned cell degenerates into "most of the corpus".
    val e = Similarity.withNorm(emb)
    val cent = timed(s"k-means coarse quantizer over $nVec vectors") {
      Similarity.kmeansCentroids(e, nCent, 2)
    }
    val cells = Similarity.assignToCentroids(e, cent)
      .groupBy(col("cid")).agg(count(lit(1)).as("csz"))
      .collect()
    val maxCell = cells.map(_.getLong(1)).max
    println(s"  ${cells.length} non-empty cells, max cell = $maxCell " +
      s"(${100.0 * maxCell / nVec}% of corpus; uniform would be ${100 / nCent}%)")
    require(cells.length >= nCent / 2,
      s"only ${cells.length} of $nCent cells survived training — quantizer collapsed")
    require(maxCell <= nVec / 2,
      s"one cell holds $maxCell of $nVec vectors — IVF degenerated to brute force")

    // --- 2. recall@k vs exact brute force over the same corpus.
    val truth = timed(s"bruteForceTopK over $nVec vectors × $nQueries queries") {
      val t = Similarity.bruteForceTopK(emb, nQueries, k)
        .select(col("query_id"), col("neighbor_id"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      t.count(); t
    }
    val approx = timed(s"kmeansIvfTopK (nCent=$nCent, nProbe=$nProbe)") {
      val a = Similarity.kmeansIvfTopK(emb, nQueries, k, nCent, 2, nProbe)
        .select(col("query_id"), col("neighbor_id"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      a.count(); a
    }
    val hits = truth.join(approx, Seq("query_id", "neighbor_id")).count()
    val recall = hits.toDouble / (nQueries.toLong * k)
    println(f"  recall@$k: $hits/${nQueries * k} = $recall%.4f")
    require(recall >= 0.95,
      f"IVF recall $recall%.4f below 0.95 on clustered data — probing lost signal")

    // --- 3. IVF-PQ composite vs flat PQ at EQUAL code budget (nSub=4,
    // nCode=8 on both sides): the composite quantizes residuals after the
    // coarse quantizer has removed between-cell variance, so its recall
    // must match or beat flat PQ — while scoring only the probed cells
    // (nProbe/nCent of the corpus) instead of every vector.
    val pqFlat = timed(s"pqTopK (flat, nSub=4, nCode=8) over $nVec vectors") {
      val p = Similarity.pqTopK(emb, nQueries, k)
        .select(col("query_id"), col("neighbor_id"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      p.count(); p
    }
    val ivfPq = timed(s"ivfPqTopK (nCent=$nCent, nProbe=$nProbe, nSub=4, nCode=8)") {
      val p = Similarity.ivfPqTopK(emb, nQueries, k, nCent, 2, nProbe)
        .select(col("query_id"), col("neighbor_id"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      p.count(); p
    }
    val pqHits = truth.join(pqFlat, Seq("query_id", "neighbor_id")).count()
    val ivfPqHits = truth.join(ivfPq, Seq("query_id", "neighbor_id")).count()
    val (pqRec, ivfPqRec) =
      (pqHits.toDouble / (nQueries.toLong * k), ivfPqHits.toDouble / (nQueries.toLong * k))
    println(f"  flat-PQ recall@$k: $pqRec%.4f   IVF-PQ recall@$k: $ivfPqRec%.4f")
    require(ivfPqHits >= pqHits,
      f"IVF-PQ recall $ivfPqRec%.4f below flat PQ $pqRec%.4f at equal code budget")

    // --- 4. persisted IVF-PQ store at scale: build once, decide a batch
    // append against the FROZEN quantizers, search from parquet state.
    // The search must touch only the compressed code table (plus
    // broadcast cells/codebook/ADC) — the raw vectors are not read.
    val storeDir = java.nio.file.Files.createTempDirectory("annstore_scale")
    val store = new graft.operators.AnnIndexStore(spark, storeDir.toString)
    timed(s"AnnIndexStore.build over $nVec vectors") {
      store.build(emb, nCent, 2)
    }
    val batch = spark.range(nVec, nVec + 10000L)
      .withColumn("embedding", expr(
        s"""transform(sequence(1, $dim), j -> CAST(
              (pmod(xxhash64(pmod(id, $C) + 1000003, j), 2000) - 1000) / 1000.0 +
              (pmod(xxhash64(id, j + 100), 2000) - 1000) / 1000.0 * 0.15
            AS FLOAT))"""))
      .select(col("id").as("vec_id"), col("embedding"))
    timed("AnnIndexStore.append of a 10k batch (no retraining)") {
      store.append(batch)
    }
    require(store.codes.count() == nVec + 10000L,
      "append must grow the code table by exactly the batch")
    val queries = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val fromStore = timed(s"store.search ($nQueries queries, k=$k)") {
      val r = store.search(queries, k, nProbe)
        .select(col("query_id"), col("neighbor_id"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      r.count(); r
    }
    val storeHits = truth.join(fromStore, Seq("query_id", "neighbor_id")).count()
    val storeRec = storeHits.toDouble / (nQueries.toLong * k)
    println(f"  store-search recall@$k: $storeRec%.4f (in-memory IVF-PQ was $ivfPqRec%.4f)")
    // the store indexed 10k EXTRA vectors, so its top-k can differ from
    // the in-memory run; recall against the original truth must not
    // collapse (the appended batch is ordinary corpus mass, not dups)
    require(storeRec >= ivfPqRec - 0.05,
      f"persisted-store recall $storeRec%.4f fell below the in-memory path")

    // --- 4b. cid partition pruning: the probed-cells read vs the full
    // code scan. store.search resolves the probe set driver-side and
    // pushes `cid IN (...)` onto the cid-partitioned codes/ read, so the
    // plan must carry a non-empty PartitionFilters entry; at nProbe=2 of
    // nCent cells the pruned read touches ~2/nCent of the index files.
    val prunedPlan = store.search(queries, k, nProbe)
      .queryExecution.executedPlan.toString
    require("PartitionFilters: \\[[^\\]]*cid".r.findFirstIn(prunedPlan).isDefined,
      "store.search plan carries no cid partition filter — probe reads the whole index")
    // time the READS themselves (sum forces real data, not metadata):
    // a 1-query probe touches nProbe of nCent cell partitions, so the
    // pruned scan reads ~nProbe/nCent of the index files. At 10⁹+
    // vectors this fraction is the whole game; here it just needs to be
    // visibly smaller. (End-to-end search latency at THIS scale is
    // job-overhead-bound either way — the 32-query searches above.)
    val someCids = store.codes.select(col("cid")).distinct()
      .limit(nProbe).collect().map(_.getInt(0)).toSeq
    val nPruned = timed(s"pruned codes/ read ($nProbe of $nCent cell partitions)") {
      store.codes.filter(col("cid").isin(someCids: _*))
        .agg(sum(col("rnrm"))).collect(); store.codes
        .filter(col("cid").isin(someCids: _*)).count()
    }
    val nFull = timed("full codes/ read (all cell partitions)") {
      store.codes.agg(sum(col("rnrm"))).collect(); store.codes.count()
    }
    println(s"  pruned read rows = $nPruned of $nFull")
    require(nPruned < nFull, "cid pruning read the whole index")

    // cleanup (temp store can be GBs at large nVec)
    java.nio.file.Files.walk(storeDir)
      .sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
      .forEach(f => java.nio.file.Files.delete(f))

    // --- 5. semantic contamination gate at width: treat the 32 queries
    // as the held-out test set. Their 320 planted near-copies sit at
    // cos ≈ 0.9999 and MUST flag; everything outside the test clusters
    // sits near 0 and must NEVER flag (a cross-cluster flag would mean
    // the banding degenerated). Same-cluster corpus mass at cos ≈ 0.978
    // may legitimately graze a 0.995 threshold — those are true
    // positives of the semantic definition, not errors. Banding 2×4
    // bits keeps chance candidates at ~12% of train per test (an 8×
    // blocking factor at this tiny test set; a production 10k-doc eval
    // set would run wider bands over more planes).
    val cont = timed(s"contaminationSemantic ($nQueries-query test set vs $nVec train)") {
      val c = Similarity.contaminationSemantic(
        emb, col("vec_id") < nQueries, 0.995, bands = 2, rowsPerBand = 4)
        .persist(StorageLevel.MEMORY_AND_DISK)
      c.count(); c
    }
    // a vector's planted cluster is derived from its SOURCE id (near-copy
    // ids in [nQueries, nQueries·(k+1)) inherit their query's cluster)
    val trainCluster = pmod(
      when(col("train_id") >= nQueries &&
        col("train_id") < nQueries.toLong * (k + 1),
        pmod(col("train_id"), lit(nQueries.toLong)))
        .otherwise(col("train_id")), lit(C.toLong))
    val crossCluster = cont.filter(
      trainCluster =!= pmod(col("test_id"), lit(C.toLong))).count()
    require(crossCluster == 0L,
      s"$crossCluster cross-cluster contamination flags — banding degenerated")
    val plantedFlagged = cont.filter(
      col("train_id") >= nQueries && col("train_id") < nQueries.toLong * (k + 1) &&
        pmod(col("train_id"), lit(nQueries.toLong)) === col("test_id")).count()
    val contRecall = plantedFlagged.toDouble / (nQueries.toLong * k)
    println(f"  contamination: $plantedFlagged/${nQueries * k} planted near-copies " +
      f"flagged ($contRecall%.4f), 0 cross-cluster flags")
    require(contRecall >= 0.99,
      f"contamination recall $contRecall%.4f below 0.99 — gate lost planted leaks")
    cont.unpersist()

    // --- 6. embedding analytics at width: scale dim 1 by 4x (a planted
    // dominant direction) and append one far-out-of-distribution vector
    // (all 5.0s). dimStats must rank dim 1 first by variance, the
    // diagonal-Mahalanobis screen must rank the planted vector first,
    // and 2 power-iteration rounds must align the principal component
    // with e1 — closed-form ground truth the corpus generator controls.
    val embA = emb
      .select(col("vec_id"), expr(
        "transform(embedding, (x, i) -> CASE WHEN i = 0 THEN CAST(x * 4.0 AS FLOAT) ELSE x END)")
        .as("embedding"))
      .unionAll(spark.range(1).select(lit(nVec).as("vec_id"), expr(
        s"transform(sequence(1, $dim), j -> CAST(5.0 AS FLOAT))").as("embedding")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    timed(s"dimStats + outliers + pcaPower over $nVec vectors") {
      val ds = Similarity.dimStats(embA).collect()
      val v1 = ds.find(_.getAs[Int]("dim") == 1).get
      require(v1.getAs[Long]("var_rank") == 1L,
        s"planted 4x dimension ranks ${v1.getAs[Long]("var_rank")}, not 1")
      val medVar = ds.map(_.getAs[Double]("var_v")).sorted.apply(dim / 2)
      require(v1.getAs[Double]("var_v") > 10.0 * medVar,
        f"dim-1 variance ${v1.getAs[Double]("var_v")}%.4f not dominant over median $medVar%.4f")
      val out = Similarity.embeddingOutliers(embA, 10).collect()
      require(out.head.getAs[Long]("vec_id") == nVec,
        s"planted OOD vector ranks behind ${out.head.getAs[Long]("vec_id")}")
      val pca = Similarity.pcaPower(embA, iters = 2).collect()
      val l1 = math.abs(pca.find(_.getAs[Int]("dim") == 1).get.getAs[Double]("loading"))
      require(l1 > 0.95,
        f"principal loading on the planted dominant dim is $l1%.4f < 0.95")
      println(f"  dim-1 var rank 1 (${v1.getAs[Double]("var_v")}%.4f vs median " +
        f"$medVar%.4f), OOD vector ranks first, |PC1·e1| = $l1%.4f")
    }
    embA.unpersist()

    // --- 7. tuning curve at width: label each vector with its learned
    // cell and sweep nProbe — recall must be monotone in the probe count
    // and reach ≥0.9 by nProbe=4 on this planted-cluster corpus (the
    // operating-point read a deployment makes before fixing nProbe).
    timed("ivfTuningCurve (nProbe 1/2/4)") {
      val labeled = emb.join(
        Similarity.assignToCentroids(e, cent).select(col("vec_id"),
          col("cid").cast("int").as("label")), "vec_id")
      val curve = Similarity.ivfTuningCurve(labeled, nQueries, k, Seq(1, 2, 4))
        .collect().sortBy(_.getAs[Int]("n_probe"))
      val recalls = curve.map(_.getAs[Double]("mean_recall"))
      require(recalls.sliding(2).forall(p => p(1) >= p(0)),
        s"recall not monotone in nProbe: ${recalls.mkString(", ")}")
      require(recalls.last >= 0.9,
        f"recall at nProbe=4 is ${recalls.last}%.4f < 0.9 on planted clusters")
      println(s"  recall@$k by nProbe 1/2/4: ${recalls.map(r => f"$r%.4f").mkString(", ")}")
    }

    println(s"AnnScaleCheck OK at $nVec vectors")
    spark.stop()
  }
}
