package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Similarity}

/** CI-shape smoke twins of the flood audits in [[DedupScaleCheck]]
  * (2M docs) and [[AnnScaleCheck]] (1M vectors): the same planted
  * layouts and the same candidate-mass / recall invariants, shrunk so
  * they run in seconds inside `sbt test`. A regression in banding, the
  * bucket cap, Manku sub-blocking, or IVF probing now fails the suite
  * instead of waiting for a manual scale run. Caps are passed
  * explicitly (the production [[Dedup.BandBucketCap]] only binds above
  * 100k docs); gates are slightly looser than the big harnesses' purely
  * for small-sample binomial noise, never for plan slack.
  */
class ScaleSmokeSpec extends SparkSpec {

  private val L = 40
  private val V = 5000L

  /** DedupScaleCheck's planted-group corpus (base + two J=0.9 mutants
    * per 50 ids), shrunk — see the generator comments there.
    */
  private def planted(nDocs: Long): DataFrame =
    spark.range(nDocs)
      .withColumn("variant",
        when(pmod(col("id"), lit(50L)) <= 2, pmod(col("id"), lit(50L)))
          .otherwise(lit(0L)))
      .withColumn("seed", col("id") - col("variant"))
      .withColumn("tk", expr(
        s"transform(sequence(1, $L), i -> concat('w', pmod(xxhash64(seed, i), $V)))"))
      .withColumn("tk", expr(
        s"""CASE WHEN variant = 1
                 THEN concat(slice(tk, 1, ${L - 2}),
                             array(concat('m1_', id), concat('m2_', id)))
                WHEN variant = 2
                 THEN concat(array(concat('m1_', id), concat('m2_', id)),
                             slice(tk, 3, ${L - 2}))
                ELSE tk END"""))
      .select(col("id").as("doc_id"), array_join(col("tk"), " ").as("text"))

  test("flood smoke: bucket cap bounds candidate mass, planted signal survives") {
    val nDocs = 2000L
    val cap = 200L
    val floodN = 500L // > cap, so the capped-bucket path binds
    val floodBase = 10L * nDocs
    val flood = spark.range(floodBase, floodBase + floodN)
      .select(col("id").as("doc_id"), expr(
        s"array_join(transform(sequence(1, $L), i -> concat('bp', i)), ' ')")
        .as("text"))
    val mixed = planted(nDocs).union(flood)
    val cand = Dedup.candFromBands(
      Dedup.lshBands(Dedup.minhashSignatures(mixed)), cap)
      .persist()
    val nCand = cand.count()
    // an uncapped flood bucket alone would emit floodN^2/2 * 4 = 500k
    // pairs; the cap must keep total candidates linear in the corpus
    assert(nCand <= 4L * nDocs,
      s"$nCand candidates from flood-mixed corpus — bucket cap not binding")
    val floodTouch = cand.filter(
      col("doc_a") >= floodBase || col("doc_b") >= floodBase).count()
    assert(floodTouch == 0L,
      s"$floodTouch candidates touch flood docs — capped bucket leaked")
    // planted base->variant edges still surface as candidates
    val plantedHit = cand.filter(
      pmod(col("doc_a"), lit(50L)) === 0 && (col("doc_b") - col("doc_a")) <= 2).count()
    val expected = ((nDocs + 48) / 50 + (nDocs + 47) / 50).toDouble
    val recall = plantedHit / expected
    assert(recall >= 0.9,
      f"planted candidate recall $recall%.3f < 0.9 with flood present")
    cand.unpersist()
  }

  test("templated-flood smoke: sub-blocking recovers pairs without going quadratic") {
    val tplN = 2000L
    val cap = 100L
    val tpl = spark.range(0L, tplN)
      .select(col("id").as("doc_id"), expr(
        """array_join(concat(
             transform(sequence(1, 90), i -> concat('bp', i)),
             transform(sequence(1, 8), i -> concat('p', CAST(id div 2 AS STRING), '_', i)),
             transform(sequence(1, 2), i -> concat('d', CAST(id AS STRING), '_', i))), ' ')""")
        .as("text"))
    val bands = Dedup.lshBands(Dedup.minhashSignatures(tpl)).persist()
    val fat = bands.groupBy(col("band"), col("key"))
      .agg(count(lit(1)).as("bsz")).filter(col("bsz") > cap).count()
    assert(fat >= 4L, s"only $fat oversized buckets — template flood not flooding")
    val cand = Dedup.candFromBands(bands, cap).persist()
    val nCand = cand.count()
    assert(nCand <= 8L * tplN,
      s"$nCand candidates from templated flood — sub-blocking went quadratic")
    val found = cand.filter(
      col("doc_a") % 2 === 0 && col("doc_b") === col("doc_a") + 1).count()
    val recall = found.toDouble / (tplN / 2)
    // sub-block analytic ~0.89 (DedupScaleCheck phase 5b); drop
    // semantics would read ~0.68 — 0.8 separates them even at 1k pairs
    assert(recall >= 0.8,
      f"templated planted-pair recall $recall%.3f < 0.8 — sub-blocking regressed")
    cand.unpersist(); bands.unpersist()
  }

  test("simhash smoke: fp-level combo-key candidate mass stays linear") {
    val nDocs = 5000L
    val docs = planted(nDocs)
    val fps = Dedup.simhashFingerprints(docs).persist()
    val bandCols = Dedup.simhashComboKeys(3).map { case (ci, keyExpr) =>
      struct(lit(ci).as("band"), expr(keyExpr).as("key"))
    }
    val candTotal = fps.select(col("fp")).distinct()
      .select(explode(array(bandCols: _*)).as("bk"))
      .groupBy(col("bk.band"), col("bk.key"))
      .agg(count(lit(1)).as("c"))
      .agg(sum(expr("c * (c - 1) div 2")).as("cand"))
      .collect().head.getLong(0)
    assert(candTotal <= 8L * nDocs,
      s"simhash fp-level candidate mass ($candTotal) super-linear at $nDocs docs")
    // banded == brute-force hamming on a slice (the recall half)
    val slice = fps.filter(col("doc_id") < 500)
    val brute = slice.as("x").join(slice.as("y"),
        col("x.doc_id") < col("y.doc_id") && expr("bit_count(x.fp ^ y.fp)") <= 3)
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        expr("bit_count(x.fp ^ y.fp)").as("hamming"))
    val banded = Dedup.simhashPairs(docs.filter(col("doc_id") < 500), 3)
    assert(banded.except(brute).isEmpty && brute.except(banded).isEmpty,
      "banded simhash pairs differ from brute-force hamming on the slice")
    fps.unpersist()
  }

  test("ann smoke: IVF probing recovers brute-force neighbors; IVF-PQ holds flat PQ") {
    val nVec = 20000L
    val dim = 64; val C = 64; val nQueries = 16; val k = 5
    val nCent = 16; val nProbe = 4
    // AnnScaleCheck's planted layout: cluster centers +-1.0, members
    // +-0.15 noise, near-copies of each query at +-0.01
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
      .persist()
    emb.count()
    val truth = Similarity.bruteForceTopK(emb, nQueries, k)
      .select(col("query_id"), col("neighbor_id")).persist()
    val approx = Similarity.kmeansIvfTopK(emb, nQueries, k, nCent, 2, nProbe)
      .select(col("query_id"), col("neighbor_id"))
    val hits = truth.join(approx, Seq("query_id", "neighbor_id")).count()
    val recall = hits.toDouble / (nQueries.toLong * k)
    assert(recall >= 0.9,
      f"IVF recall $recall%.3f < 0.9 on planted clusters — probing lost signal")
    val pqHits = truth.join(
      Similarity.pqTopK(emb, nQueries, k)
        .select(col("query_id"), col("neighbor_id")),
      Seq("query_id", "neighbor_id")).count()
    val ivfPqHits = truth.join(
      Similarity.ivfPqTopK(emb, nQueries, k, nCent, 2, nProbe)
        .select(col("query_id"), col("neighbor_id")),
      Seq("query_id", "neighbor_id")).count()
    // 5% slack vs the big harness's strict >=: 80 truth pairs is small-
    // sample territory, but a residual-quantization regression shows as
    // a much larger drop
    assert(ivfPqHits >= pqHits - math.ceil(0.05 * nQueries * k).toLong,
      s"IVF-PQ hits $ivfPqHits fell below flat PQ $pqHits at equal code budget")
    truth.unpersist(); emb.unpersist()
  }
}
