package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.operators.Dedup

/** Scale sanity harness for the near-dup pipeline: runs MinHash-LSH →
  * exact-Jaccard verify → connected-components clustering on a synthetic
  * corpus ~3 orders of magnitude larger than the sf0.1 `documents` table
  * (default 2M docs) with PLANTED near-duplicate groups, and asserts the
  * properties the 100-TB design claims:
  *
  *   - band buckets stay O(1)-sized → candidate pairs stay O(n), never
  *     quadratic (the whole point of LSH blocking);
  *   - planted pairs at Jaccard 0.9 are recovered at the analytic
  *     1-(1-J^4)^4 ≈ 0.986 band-collision rate;
  *   - zero spurious pairs (random docs share no shingles);
  *   - clustering merges A~B, B~C groups whose A~C edge is BELOW the
  *     verify threshold — transitivity via the base doc, the case
  *     keep-first dedup cannot express — with cluster_id = component min.
  *
  * Planted layout, one group per 50 ids: base doc (variant 0), a
  * tail-mutated copy (variant 1) and a head-mutated copy (variant 2).
  * With 40 tokens/doc and 2 mutated tokens, J(base,v1) = J(base,v2)
  * = 36/40 = 0.9 ≥ 0.85 threshold, while J(v1,v2) = 34/42 ≈ 0.81 < 0.85
  * — so v1 and v2 land in one cluster only through the base edge.
  *
  * `runMain graft.DedupScaleCheck [nDocs]`.
  */
object DedupScaleCheck {

  val L = 40          // tokens per doc → L-2 = 38 distinct 3-gram shingles
  val V = 50000L      // vocabulary; 3-gram space V^3 → disjoint random docs

  /** The planted-group corpus: ids [0, nDocs), tokens xxhash64-derived
    * words; variants re-use the BASE doc's seed then mutate 2 tokens with
    * doc-unique markers (no accidental cross-group shingle sharing).
    */
  private def corpus(spark: SparkSession, nDocs: Long) =
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

  /** An arriving batch of nDocs/100 docs, ids [nDocs, nDocs + batch):
    * EVEN batch ids are tail-mutated near-dups (J = 0.9) of a pseudo-
    * random PLAIN corpus doc (id ≡ 3 mod 50 — never itself a planted
    * variant, so the expected `dup_of` is exactly that doc); ODD batch
    * ids are novel random docs that must come back `dup_of` NULL.
    */
  private def batch(spark: SparkSession, nDocs: Long) = {
    val b = nDocs / 100
    spark.range(nDocs, nDocs + b)
      .withColumn("src",
        expr(s"(pmod(xxhash64(id, 7), ${nDocs / 50 * 50}) div 50) * 50 + 3"))
      .withColumn("seed", when(pmod(col("id"), lit(2L)) === 0, col("src"))
        .otherwise(col("id")))
      .withColumn("tk", expr(
        s"transform(sequence(1, $L), i -> concat('w', pmod(xxhash64(seed, i), $V)))"))
      .withColumn("tk", expr(
        s"""CASE WHEN id % 2 = 0
                 THEN concat(slice(tk, 1, ${L - 2}),
                             array(concat('mb1_', id), concat('mb2_', id)))
                ELSE tk END"""))
      .select(col("id").as("doc_id"), array_join(col("tk"), " ").as("text"),
        col("src"))
  }

  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toLong).getOrElse(2000000L)
    val spark = Harness.session()

    val threshold = 0.85
    val docs = corpus(spark, nDocs)

    import Harness.timed

    // --- 1. candidate volume: bucket histogram over the LSH band table.
    // Sum of c*(c-1)/2 over buckets IS the per-band candidate pair mass;
    // it must stay O(n). Planted groups fill buckets of size ≤ 3; what
    // remains is the chance-collision tail of minhash min-concentration
    // (a handful of buckets at 2M docs — observed sizes 4..29 in 6 of
    // 7.8M buckets), whose pair mass must stay a rounding error next to
    // the planted signal. Analytic total: groups × (2·4J⁴ + 4J'⁴) ≈
    // 40k × 6.97 ≈ 279k at 2M docs — the run reproduces it exactly.
    val bands = Dedup.lshBands(Dedup.minhashSignatures(docs))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val bstats = timed(s"band-bucket histogram over $nDocs docs") {
      bands.groupBy(col("band"), col("key"))
        .agg(count(lit(1)).as("c"))
        .agg(max(col("c")).as("max_bucket"),
          sum(expr("c * (c - 1) div 2")).as("cand_pairs"),
          sum(expr("CASE WHEN c > 3 THEN c * (c - 1) div 2 ELSE 0 END"))
            .as("tail_pairs"))
        .collect().head
    }
    val maxBucket = bstats.getLong(0)
    val candPairs = bstats.getLong(1)
    val tailPairs = bstats.getLong(2)
    bands.unpersist()
    println(s"  max bucket = $maxBucket, candidate pairs = $candPairs, " +
      s"chance-collision tail = $tailPairs (${100.0 * tailPairs / candPairs}%)")
    require(maxBucket <= 256L,
      s"hot LSH bucket ($maxBucket docs) — degenerate key attractor, " +
        "candidate generation no longer O(n)")
    require(candPairs <= nDocs,
      s"candidate pairs ($candPairs) super-linear in corpus size ($nDocs)")
    require(tailPairs * 100L <= candPairs,
      s"chance-collision buckets contribute $tailPairs of $candPairs " +
        "candidate pairs (> 1%) — LSH precision collapsing at scale")

    // --- 2. pair recovery. All emitted pairs must be planted base→variant
    // edges (doc_a is the group base, doc_b 1 or 2 above it) at J = 0.9;
    // v1-v2 (J ≈ 0.81) and cross-group pairs must never appear.
    val pairs = timed(s"minhashLsh over $nDocs docs") {
      val p = Dedup.minhashLsh(docs, threshold)
        .persist(StorageLevel.MEMORY_AND_DISK)
      p.count(); p
    }
    val bad = pairs.filter(
      pmod(col("doc_a"), lit(50L)) =!= 0 ||
        (col("doc_b") - col("doc_a")) > 2 ||
        col("jaccard") < 0.85 || col("jaccard") > 0.95).count()
    require(bad == 0L, s"$bad non-planted or out-of-band pairs emitted")
    val found = pairs.count()
    // plantable edges: base→v1 exists iff an id ≡ 1 (mod 50) < nDocs, and
    // base→v2 iff an id ≡ 2 (mod 50) < nDocs — the last group may be
    // truncated when nDocs % 50 ∈ {1, 2}, so count each edge kind exactly
    val e1 = (nDocs + 48) / 50
    val e2 = (nDocs + 47) / 50
    val expected = (e1 + e2).toDouble
    val recall = found / expected
    println(f"  planted-edge recall: $found/${expected.toLong} = $recall%.4f " +
      "(analytic band-collision rate ≈ 0.986)")
    require(recall >= 0.95, f"recall $recall%.4f below 0.95 — LSH bands lost signal")

    // --- 3. transitive clustering over the recovered edges.
    val clusters = timed("clustersFromPairs over recovered edges") {
      val c = Dedup.clustersFromPairs(pairs.select(col("doc_a"), col("doc_b")))
        .persist(StorageLevel.MEMORY_AND_DISK)
      c.count(); c
    }
    val badLabel = clusters.groupBy(col("cluster_id"))
      .agg(min(col("doc_id")).as("m"))
      .filter(col("m") =!= col("cluster_id")).count()
    require(badLabel == 0L, s"$badLabel clusters where cluster_id != component min")
    val maxSize = clusters.agg(max(col("csize"))).collect().head.getLong(0)
    require(maxSize <= 3L, s"cluster of size $maxSize — groups bled together")
    val triples = clusters.filter(col("csize") === 3).count() / 3
    val tripleRate = triples.toDouble / e2 // only full 3-doc groups can triple
    println(f"  full 3-doc clusters: $triples/$e2 = $tripleRate%.4f " +
      "(analytic ≈ 0.986² = 0.972; v1~v2 joined ONLY via the base edge)")
    require(tripleRate >= 0.90,
      f"triple rate $tripleRate%.4f below 0.90 — transitive merge failing at scale")

    // --- 4. incremental ingestion: decide a 1% arriving batch against
    // the standing corpus. Every even batch doc is a planted J=0.9
    // near-dup of a known plain corpus doc and must come back with
    // dup_of = exactly that doc (when its bands collide — same 0.986
    // analytic rate as phase 2); every odd doc is novel and must come
    // back NULL. Wrong-partner matches must be zero. The decision joins
    // are batch-sized: the corpus contributes its band index and a
    // candidate semi-join fetch, never a corpus-wide pair join.
    val arr = batch(spark, nDocs).persist(StorageLevel.MEMORY_AND_DISK)
    val decided = timed(s"incrementalDedupAgainst (${nDocs / 100} new vs $nDocs corpus)") {
      val d = Dedup.incrementalDedupAgainst(
        docs, arr.select(col("doc_id"), col("text")), threshold)
        .join(arr.select(col("doc_id"), col("src")), "doc_id")
        .persist(StorageLevel.MEMORY_AND_DISK)
      d.count(); d
    }
    // Legitimate partners: the planted src, or a batch SIBLING that
    // near-dup'ed the same src (two tail-mutated copies of one doc are
    // J = 0.9 near-dups of each other; if the corpus edge's bands miss
    // but the sibling edge hits, dup_of correctly names the sibling).
    val wrongPartner = decided.as("d")
      .join(arr.select(col("doc_id").as("dup_of"), col("src").as("dup_src")),
        Seq("dup_of"), "left")
      .filter(pmod(col("d.doc_id"), lit(2L)) === 0 && col("dup_of").isNotNull &&
        col("dup_of") =!= col("d.src") &&
        (col("dup_src").isNull || col("dup_src") =!= col("d.src"))).count()
    require(wrongPartner == 0L, s"$wrongPartner batch docs matched the wrong corpus doc")
    val novelFp = decided.filter(pmod(col("doc_id"), lit(2L)) === 1 &&
      col("dup_of").isNotNull).count()
    require(novelFp == 0L, s"$novelFp novel batch docs falsely flagged as dups")
    val evens = decided.filter(pmod(col("doc_id"), lit(2L)) === 0)
    val evenHits = evens.filter(col("dup_of").isNotNull).count()
    val evenTotal = evens.count()
    val incRecall = evenHits.toDouble / evenTotal
    println(f"  incremental dup_of recall: $evenHits/$evenTotal = $incRecall%.4f " +
      "(analytic ≈ 0.986)")
    require(incRecall >= 0.95,
      f"incremental recall $incRecall%.4f below 0.95 — batch-vs-index path lost signal")

    // --- 5. boilerplate flood: `floodN` byte-identical docs (the
    // real-world degenerate case LSH dedup exists for) share ONE key per
    // band, so without candFromBands' bucket cap the candidate self-join
    // is floodN²/2 × 4 ≈ 4.5·10^10 pairs at 150k — quadratic, and AQE
    // can only spread it, not shrink it. With the default BandBucketCap
    // (100k < floodN) the flood contributes ZERO candidates (its members
    // are exact dups, caught by the cheaper hash-groupBy pass) while the
    // planted near-dup signal in the mixed-in normal corpus is intact.
    val floodN = 150000L
    require(floodN > Dedup.BandBucketCap,
      "flood must exceed the default cap for this phase to bind")
    val floodBase = 10L * nDocs // disjoint from corpus [0,n) and batch ids
    val flood = spark.range(floodBase, floodBase + floodN)
      .select(col("id").as("doc_id"), expr(
        s"array_join(transform(sequence(1, $L), i -> concat('bp', i)), ' ')")
        .as("text"))
    val normalN = 100000L
    val mixed = corpus(spark, normalN).union(flood)
    val nCand = timed(s"candFromBands over $floodN-doc flood + $normalN normal") {
      Dedup.candFromBands(
        Dedup.lshBands(Dedup.minhashSignatures(mixed))).count()
    }
    // O(cap·k) bound: candidates can only come from the planted groups
    // plus the chance-collision tail — linear in normalN, nowhere near
    // the 4.5·10^10 an uncapped flood bucket would emit
    require(nCand <= 4L * normalN,
      s"$nCand candidates from flood-mixed corpus — bucket cap not binding")
    val fpairs = timed(s"minhashLsh over flood-mixed corpus") {
      val p = Dedup.minhashLsh(mixed, threshold)
        .persist(StorageLevel.MEMORY_AND_DISK)
      p.count(); p
    }
    val floodTouch = fpairs.filter(
      col("doc_a") >= floodBase || col("doc_b") >= floodBase).count()
    require(floodTouch == 0L,
      s"$floodTouch pairs touch flood docs — capped bucket leaked candidates")
    val fFound = fpairs.count()
    val fExpected = ((normalN + 48) / 50 + (normalN + 47) / 50).toDouble
    val fRecall = fFound / fExpected
    println(f"  flood-mixed planted recall: $fFound/${fExpected.toLong} = $fRecall%.4f")
    require(fRecall >= 0.95,
      f"recall $fRecall%.4f below 0.95 with flood present — cap ate real signal")
    fpairs.unpersist()

    // --- 5b. TEMPLATED near-dup flood: the recall hole the pure drop
    // left open. 20k docs = 10k planted pairs, each 90 shared boilerplate
    // tokens + 8 pair-shared + 2 doc-unique tokens — so q = P(a perm's
    // min is a boilerplate gram) = 88/98, pairwise J within a pair 0.96,
    // across pairs 0.81 (near-dups exact dedup can NOT recover). Each
    // band's boilerplate bucket holds ≈ q⁴·20k ≈ 13k docs — far over the
    // phase cap (2000) — so under drop semantics a planted pair is found
    // only via a band whose agreed key is NOT all-boilerplate:
    // p = J⁴ − (88/100)⁴ ≈ 0.25/band → analytic recall 1−(1−p)⁴ ≈ 0.68.
    // Sub-blocking adds the flood-bucket path: the pair lands in SOME
    // band's flood bucket w.p. 1−(1−(88/100)⁴)⁴ ≈ 0.97 and then shares
    // a dedicated-perm 6-row sub-key that is not all-boilerplate w.p.
    // 1−(1−(J⁶−(88/100)⁶))³ ≈ 0.68 → analytic ≈ 1−0.32·(1−0.97·0.68)
    // ≈ 0.89. The ≥ 0.8 gate is > 25 SDs above the drop analytic at 10k
    // pairs — observed recall at this level is impossible under drop.
    val tplN = 20000L
    val tplCap = 2000L
    val tplBase = 20L * nDocs
    val tpl = spark.range(tplBase, tplBase + tplN)
      .select(col("id").as("doc_id"), expr(
        """array_join(concat(
             transform(sequence(1, 90), i -> concat('bp', i)),
             transform(sequence(1, 8), i -> concat('p', CAST(id div 2 AS STRING), '_', i)),
             transform(sequence(1, 2), i -> concat('d', CAST(id AS STRING), '_', i))), ' ')""")
        .as("text"))
    val tplBands = Dedup.lshBands(Dedup.minhashSignatures(tpl))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val fatBuckets = tplBands.groupBy(col("band"), col("key"))
      .agg(count(lit(1)).as("bsz")).filter(col("bsz") > tplCap).count()
    require(fatBuckets >= 4L,
      s"only $fatBuckets oversized buckets — template flood not flooding")
    val tCand = timed(s"sub-blocked candFromBands over $tplN templated docs") {
      Dedup.candFromBands(tplBands, tplCap).persist(StorageLevel.MEMORY_AND_DISK)
    }
    val nTCand = tCand.count()
    require(nTCand <= 8L * tplN,
      s"$nTCand candidates from templated flood — sub-blocking went quadratic")
    val plantedFound = tCand.filter(
      (col("doc_a") - tplBase) % 2 === 0 && col("doc_b") === col("doc_a") + 1).count()
    val tplRecall = plantedFound.toDouble / (tplN / 2)
    println(f"  templated-flood planted-pair recall: $plantedFound/${tplN / 2} " +
      f"= $tplRecall%.4f (sub-block analytic ≈ 0.89; drop analytic ≈ 0.68)")
    require(tplRecall >= 0.8,
      f"recall $tplRecall%.4f below 0.8 — oversized-bucket sub-blocking not recovering pairs")
    tCand.unpersist(); tplBands.unpersist()

    // --- 6. ingest-novelty curve: a corpus whose second half repeats the
    // first half's text verbatim (shifted ids land in deciles 5-9). With
    // the 3-gram space effectively collision-free, every 8-shingle type
    // in deciles 0-4 is first-seen there (novelty ≈ 1) and every type in
    // deciles 5-9 was already seen in its mirror decile (novelty = 0);
    // mirrored deciles must agree EXACTLY on n_types. This is the curve
    // a crawl operator reads to see a feed saturating — here in its
    // sharpest possible form.
    val half = corpus(spark, nDocs / 2)
    val novDocs = half.union(
      half.select((col("doc_id") + nDocs / 2).as("doc_id"), col("text")))
    val nov = timed(s"ngramNovelty over $nDocs docs (half repeated)") {
      Dedup.ngramNoveltyOf(novDocs, Dedup.shingles(novDocs, 8)).collect()
    }
    val byBucket = nov.map(r => r.getAs[Long]("bucket") -> r).toMap
    require(byBucket.size == 10, s"expected 10 deciles, got ${byBucket.size}")
    (0L to 4L).foreach { b =>
      val fresh = byBucket(b); val rep = byBucket(b + 5)
      require(fresh.getAs[Double]("novelty") >= 0.999,
        s"decile $b novelty ${fresh.getAs[Double]("novelty")} < 0.999 on fresh content")
      require(rep.getAs[Double]("novelty") <= 0.001,
        s"decile ${b + 5} novelty ${rep.getAs[Double]("novelty")} > 0.001 on repeated content")
      require(fresh.getAs[Long]("n_types") == rep.getAs[Long]("n_types"),
        s"mirrored deciles $b/${b + 5} disagree on n_types")
    }
    println(s"  novelty curve: deciles 0-4 ≈ 1.0, repeated deciles 5-9 ≈ 0.0, " +
      s"mirrored n_types equal (${byBucket(0L).getAs[Long]("n_types")} types in decile 0)")

    // --- 7. cluster-aware downsampling over the phase-3 components:
    // every unclustered doc survives (csize-1 admission is
    // unconditional), and the admitted mass from 3-doc clusters
    // concentrates at 1 doc per cluster in expectation (binomial
    // n ≈ 3·triples, p = 1/3).
    val dw = timed(s"clusterDownweight over $nDocs docs") {
      val d = Dedup.clusterDownweightOf(docs, clusters, "scale")
        .persist(StorageLevel.MEMORY_AND_DISK)
      d.count(); d
    }
    val nClustered = clusters.count()
    val keptSingles = dw.filter(col("csize") === 1).count()
    require(keptSingles == nDocs - nClustered,
      s"$keptSingles unclustered docs kept of ${nDocs - nClustered} — " +
        "csize-1 admission must be unconditional")
    val tripleMembers = clusters.filter(col("csize") === 3).count()
    val keptTriples = dw.filter(col("csize") === 3).count()
    val expectTriples = tripleMembers / 3.0
    val sd = math.sqrt(tripleMembers * (1.0 / 3) * (2.0 / 3))
    require(math.abs(keptTriples - expectTriples) <= 6 * sd,
      f"3-doc clusters kept $keptTriples docs vs expected $expectTriples%.0f ± ${6 * sd}%.0f")
    println(f"  downweight: $keptSingles singles kept (all), " +
      f"$keptTriples of $tripleMembers triple members kept " +
      f"(expected $expectTriples%.0f, 1 per cluster)")
    dw.unpersist()

    // --- 8. simhash candidate audit: per candidate table, the pair mass
    // the keying generates (Σ c·(c−1)/2 over its buckets, cap semantics
    // applied) vs the pairs the hamming verify keeps. The ratio is the
    // price of the scheme's recall guarantee — if it blows up, the keys
    // have stopped discriminating. THIS AUDIT EARNED ITS KEEP: the
    // original 4 x 15-bit split generated 308M candidates for 15k true
    // pairs at 2M docs (n²/2¹⁵ per band — super-linear), which is why
    // simhashPairs now keys on Manku-style 3-of-6 block combinations
    // (20 tables, 30-bit keys, random-collision mass n²·20/2³⁰ ≈ 75k at
    // 2M docs). The planted 2-token mutations perturb only a few of 60
    // fingerprint bits, so variants still share intact-block keys.
    val fps = timed(s"simhash fingerprints over $nDocs docs") {
      val f = Dedup.simhashFingerprints(docs).persist(StorageLevel.MEMORY_AND_DISK)
      f.count(); f
    }
    val bandCols = Dedup.simhashComboKeys(3).map { case (ci, keyExpr) =>
      struct(lit(ci).as("band"), expr(keyExpr).as("key"))
    }
    // the implementation collapses docs by fingerprint before banding,
    // so the candidate mass it generates has two parts: within-group
    // pairs (identical fp — verified by construction, hamming 0) and
    // the DISTINCT-fp band candidates (what the hamming verify filters)
    val groupStats = fps.groupBy(col("fp")).agg(count(lit(1)).as("k"))
      .agg(count(lit(1)).as("n_fps"),
        sum(expr("k * (k - 1) div 2")).as("within_pairs"))
      .collect().head
    val nFps = groupStats.getLong(0)
    val withinPairs = groupStats.getLong(1)
    val perBand = fps
      .select(col("fp")).distinct()
      .select(explode(array(bandCols: _*)).as("bk"))
      .groupBy(col("bk.band").as("band"), col("bk.key").as("key"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("band"))
      .agg(sum(expr("CASE WHEN c <= 100000 THEN c * (c - 1) div 2 ELSE 0 END"))
        .as("cand"), max(col("c")).as("max_bucket"))
      .orderBy(col("band"))
      .collect()
    val candTotal = perBand.map(_.getAs[Long]("cand")).sum
    val verified = timed(s"simhashPairs over $nDocs docs") {
      Dedup.simhashPairs(docs, 3).count()
    }
    perBand.foreach(r => println(
      s"  simhash band ${r.getAs[Int]("band")}: fp-level candidates " +
        s"${r.getAs[Long]("cand")}, max bucket ${r.getAs[Long]("max_bucket")}"))
    println(f"  simhash: $nDocs docs collapse to $nFps distinct fps; " +
      f"$withinPairs identical-fp pairs verified by construction; " +
      f"fp-level candidates $candTotal vs cross-fp verified " +
      f"${verified - withinPairs} (ratio " +
      f"${candTotal.toDouble / math.max(verified - withinPairs, 1L)}%.1f:1)")
    require(candTotal <= 8L * nDocs,
      s"simhash fp-level candidate mass ($candTotal) super-linear in corpus " +
        s"size ($nDocs) — bands no longer discriminate, add sub-banding")
    // the in-row bucket pairing must agree exactly with brute-force
    // hamming on a slice (the sf-scale oracle runs the uncapped twin;
    // this pins the same equivalence inside the scale harness)
    val slice = fps.filter(col("doc_id") < 2000)
    val brute = slice.as("x").join(slice.as("y"),
        col("x.doc_id") < col("y.doc_id") &&
          expr("bit_count(x.fp ^ y.fp)") <= 3)
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        expr("bit_count(x.fp ^ y.fp)").as("hamming"))
    val banded8 = Dedup.simhashPairs(docs.filter(col("doc_id") < 2000), 3)
    require(banded8.except(brute).isEmpty && brute.except(banded8).isEmpty,
      "banded simhash pairs differ from brute-force hamming on the slice")
    println("  simhash banded == brute-force on the 2000-doc slice")
    fps.unpersist()

    println(s"DedupScaleCheck OK at $nDocs docs")
    spark.stop()
  }
}
