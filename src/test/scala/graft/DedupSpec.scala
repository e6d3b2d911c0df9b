package graft

import org.apache.spark.sql.functions._

import graft.functions.Hashing
import graft.operators.Dedup

class DedupSpec extends SparkSpec {

  private def docs = docsDf(Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy dog"), // exact dup of 1
    (3L, "the quick brown fox jumps over the sleepy dog"), // near dup
    (4L, "completely different words entirely here now okay friend")))

  test("h60 is identical on the JVM and in Spark SQL") {
    import spark.implicits._
    val sparkSide = Seq("abc", "the quick", "plane0_1").toDF("s")
      .select(Hashing.h60(col("s"))).collect().map(_.getLong(0))
    val jvmSide = Seq("abc", "the quick", "plane0_1").map(Hashing.h60jvm)
    assert(sparkSide.toSeq == jvmSide)
  }

  test("blockingRecall: cumulative deciles, found bounded by true, dups at 1.0") {
    val r = Dedup.blockingRecall(docs).collect()
      .sortBy(-_.getAs[Double]("j_bucket"))
    assert(r.nonEmpty)
    // cumulative: n_true/n_found never decrease going down the deciles
    val truths = r.map(_.getAs[Long]("n_true"))
    assert(truths.zip(truths.tail).forall { case (hi, lo) => hi <= lo })
    r.foreach { row =>
      assert(row.getAs[Long]("n_found") <= row.getAs[Long]("n_true"))
      assert(row.getAs[Double]("recall") <= 1.0)
    }
    // the identical pair (1,2) sits in the top decile and identical docs
    // agree on every band — the blocking stage can never lose them
    val top = r.head
    assert(top.getAs[Double]("j_bucket") == 1.0)
    assert(top.getAs[Double]("recall") == 1.0)
  }

  test("exact dedup groups identical texts, keeper = min doc_id") {
    val r = Dedup.exact(docs).collect()
    assert(r.length == 3)
    val dup = r.find(_.getAs[Long]("n_copies") == 2L).get
    assert(dup.getAs[Long]("keeper") == 1L)
  }

  test("ngram jaccard finds exact and near dups, not unrelated docs") {
    val pairs = Dedup.ngramJaccard(docs, 0.3).collect()
    val keys = pairs.map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(keys.contains((1L, 2L)) && keys.contains((1L, 3L)) && keys.contains((2L, 3L)))
    assert(!keys.exists(p => p._1 == 4L || p._2 == 4L))
    val exactPair = pairs.find(r => r.getAs[Long]("doc_a") == 1L && r.getAs[Long]("doc_b") == 2L).get
    assert(exactPair.getAs[Double]("jaccard") == 1.0)
  }

  test("incremental dedup: batch decided against corpus index + itself") {
    val corpus = docsDf(Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (4L, "completely different words entirely here now okay friend")))
    val batch = docsDf(Seq(
      (10L, "the quick brown fox jumps over the lazy dog"), // dup of corpus 1
      (20L, "totally novel sentence with nothing shared anywhere at all"),
      (30L, "another fresh batch document about spark and parquet files"),
      (40L, "another fresh batch document about spark and parquet files"))) // dup of 30
    val r = Dedup.incrementalDedupAgainst(corpus, batch, 0.5).collect()
      .map(x => x.getAs[Long]("doc_id") ->
        (if (x.isNullAt(x.fieldIndex("dup_of"))) None
         else Some(x.getAs[Long]("dup_of")))).toMap
    assert(r.size == 4)
    assert(r(10L) == Some(1L)) // rejected against the standing corpus
    assert(r(20L) == None) // survivor
    assert(r(30L) == None) // first of the new pair survives
    assert(r(40L) == Some(30L)) // new-vs-new duplicate
  }

  test("minhash signatures are equal for identical shingle sets") {
    val sig = Dedup.minhashSignatures(docs).collect()
    def row(id: Long) = sig.find(_.getAs[Long]("doc_id") == id).get
    assert((0 until Dedup.NumPerms).forall(j =>
      row(1L).getAs[Long](s"mh$j") == row(2L).getAs[Long](s"mh$j")))
    assert((0 until Dedup.NumPerms).exists(j =>
      row(1L).getAs[Long](s"mh$j") != row(4L).getAs[Long](s"mh$j")))
  }

  test("minhash LSH surfaces the duplicate pair with jaccard 1.0") {
    val r = Dedup.minhashLsh(docs, 0.9).collect()
    assert(r.exists(x => x.getAs[Long]("doc_a") == 1L && x.getAs[Long]("doc_b") == 2L &&
      x.getAs[Double]("jaccard") == 1.0))
  }

  test("identical flood stays excluded under the sub-bucket cap") {
    import spark.implicits._
    // 6 byte-identical docs, cap 2: every band bucket holds all 6 (over
    // cap), and the identical docs share every dedicated sub-key too, so
    // every sub-bucket is ALSO over cap → zero candidates. That is the
    // contract: doubly-flooded sub-buckets are near-identical docs the
    // cheaper exact/normalized passes own; sub-blocking must not go
    // quadratic on them.
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    val flood = (1L to 6L).map(id => (id, base))
    val r = Dedup.minhashLsh(flood.toDF("doc_id", "text"), 0.5, bucketCap = 2L)
      .collect()
    assert(r.isEmpty,
      s"identical-flood pairs leaked through the sub-bucket cap: ${r.mkString(",")}")
  }

  test("templated flood: sub-blocking recovers planted near-dup pairs") {
    import spark.implicits._
    // 8 docs = 4 planted pairs: 90 shared boilerplate tokens + 8
    // pair-shared + 2 doc-unique. Primary band keys are usually
    // all-boilerplate → one bucket holding most of the 8 docs (over cap
    // 2), which the old drop semantics discarded wholesale. The varying
    // bodies spread the flood across dedicated-perm sub-buckets, so a
    // planted pair keeps its edge whenever some sub-key min lands on a
    // pair-shared gram. Pairwise J: within a pair 96/100 = 0.96; across
    // pairs 88/108 ≈ 0.81 — threshold 0.9 admits exactly the planted
    // pairs. Hash constants are fixed, so the outcome is deterministic.
    val bp = (1 to 90).map(i => s"bp$i")
    val docs8 = (0L until 8L).map { id =>
      val toks = bp ++ (1 to 8).map(i => s"p${id / 2}_$i") ++
        (1 to 2).map(i => s"d${id}_$i")
      (id, toks.mkString(" "))
    }
    val fat = Dedup.lshBands(Dedup.minhashSignatures(docs8.toDF("doc_id", "text")))
      .groupBy(col("band"), col("key")).count().filter(col("count") > 2).count()
    assert(fat >= 1L, "no oversized band bucket — template flood not flooding")
    val r = Dedup.minhashLsh(docs8.toDF("doc_id", "text"), 0.9, bucketCap = 2L)
      .collect()
    val pairs = r.map(x => (x.getAs[Long]("doc_a"), x.getAs[Long]("doc_b"))).toSet
    assert(pairs.forall(p => p._1 / 2 == p._2 / 2),
      s"non-planted pair above 0.9: $pairs")
    assert(pairs.nonEmpty,
      "sub-blocking recovered no planted pairs from the oversized buckets")
  }

  test("contamination finds train docs sharing an n-gram with test docs") {
    import org.apache.spark.sql.functions.col
    val r = Dedup.contamination(docs, col("doc_id") <= 2L, n = 5).collect()
    // docs 1,2 are test; train doc 3 shares long spans with both; doc 4 with neither
    val pairs = r.map(x => (x.getAs[Long]("train_id"), x.getAs[Long]("test_id"))).toSet
    assert(pairs == Set((3L, 1L), (3L, 2L)))
  }

  test("survivors drops the higher-id member of each near-dup pair") {
    import spark.implicits._
    val full = Seq(
      (1L, "the quick brown fox jumps over the lazy dog", "en", "s", 44L),
      (2L, "the quick brown fox jumps over the lazy dog", "en", "s", 44L),
      (4L, "completely different words entirely here now okay friend", "en", "s", 56L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val kept = Dedup.survivors(full, 0.9).collect().map(_.getAs[Long]("doc_id")).sorted
    assert(kept.toSeq == Seq(1L, 4L))
  }

  test("simhash: identical docs at hamming 0; banded join finds them") {
    val fps = Dedup.simhashFingerprints(docs).collect()
    def fp(id: Long) = fps.find(_.getAs[Long]("doc_id") == id).get.getAs[Long]("fp")
    assert(fp(1L) == fp(2L))
    assert(fp(1L) != fp(4L)) // 60-bit fingerprints discriminate unrelated docs
    val pairs = Dedup.simhashPairs(docs, 2).collect()
    assert(pairs.exists(x => x.getAs[Long]("doc_a") == 1L && x.getAs[Long]("doc_b") == 2L &&
      x.getAs[Int]("hamming") == 0))
  }

  test("simhash band-bucket cap excludes hot buckets from candidate generation") {
    // cap=1 makes every DISTINCT-fp bucket with ≥2 members "hot", so no
    // cross-fp candidate survives — the O(n²)-bucket guard is effective.
    // Identical-fp pairs are exact results (hamming 0, verified by
    // construction), NOT candidates, so the cap does not touch them:
    // the capped output is exactly the within-fp pair set.
    val capped = Dedup.simhashPairs(docs, 2, bucketCap = 1L).collect()
    assert(capped.nonEmpty && capped.forall(_.getAs[Int]("hamming") == 0),
      "cap=1 must suppress every cross-fp candidate and keep hamming-0 truths")
    assert(capped.exists(x =>
      x.getAs[Long]("doc_a") == 1L && x.getAs[Long]("doc_b") == 2L))
    // the capped set is a subset of the default-cap set
    val full = Dedup.simhashPairs(docs, 2).collect()
      .map(x => (x.getAs[Long]("doc_a"), x.getAs[Long]("doc_b"))).toSet
    assert(capped.forall(x =>
      full((x.getAs[Long]("doc_a"), x.getAs[Long]("doc_b")))))
    // banding is only pigeonhole-complete through SimhashBands-1
    intercept[IllegalArgumentException](Dedup.simhashPairs(docs, Dedup.SimhashBands))
  }

  test("clusters merge transitively: A~B, B~C puts A and C in one cluster") {
    import spark.implicits._
    // chain 1-2, 2-3 (1 and 3 never paired) + separate pair 5-6: labels
    // need a propagation round beyond the direct neighbors to converge
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("doc_a", "doc_b")
    val r = Dedup.clustersFromPairs(pairs).collect()
      .map(x => (x.getAs[Long]("doc_id"), x.getAs[Long]("cluster_id"), x.getAs[Long]("csize")))
      .toSet
    assert(r == Set((1L, 1L, 3L), (2L, 1L, 3L), (3L, 1L, 3L), (5L, 5L, 2L), (6L, 5L, 2L)))
  }

  test("clusterSurvivors keeps only each cluster's min doc_id") {
    import spark.implicits._
    val full = Seq(
      (1L, "the quick brown fox jumps over the lazy dog", "en", "s", 44L),
      (2L, "the quick brown fox jumps over the lazy dog", "en", "s", 44L), // dup of 1
      (3L, "the quick brown fox jumps over the lazy dog", "en", "s", 44L), // dup of 1
      (4L, "completely different words entirely here now okay friend", "en", "s", 56L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val kept = Dedup.clusterSurvivors(full, 0.9).collect().map(_.getAs[Long]("doc_id")).sorted
    assert(kept.toSeq == Seq(1L, 4L))
  }

  test("capShingles drops boilerplate above the doc-frequency cap") {
    val sh = Dedup.shingles(docs)
    // "the quick brown" occurs in docs 1,2,3 -> df=3 > cap=2 -> dropped
    val capped = Dedup.capShingles(sh, 2L)
    // shingle column carries the h60 hash of the n-gram
    val h = graft.functions.Hashing.h60jvm _
    assert(capped.filter(col("shingle") === h("the quick brown")).count() == 0)
    assert(capped.filter(col("shingle") === h("over the lazy")).count() == 2) // df=2 kept
    // identical docs still dedup at jaccard 1.0 over the capped sets
    val pairs = Dedup.ngramJaccard(docs, 0.9, maxDf = 2L).collect()
    assert(pairs.exists(x => x.getAs[Long]("doc_a") == 1L && x.getAs[Long]("doc_b") == 2L &&
      x.getAs[Double]("jaccard") == 1.0))
  }

  test("thresholdCurve: deciles bucket verified pairs, cumulative from the top") {
    val r = Dedup.thresholdCurve(docs, 0.2).orderBy(col("j_bucket").desc).collect()
    // docs 1/2 identical (J=1.0 → bucket 1.0); 1/3 and 2/3 near (one
    // token differs); cumulative counts never decrease going down
    assert(r.head.getAs[Double]("j_bucket") == 1.0)
    assert(r.head.getAs[Long]("n_pairs") == 1L)
    val cums = r.map(_.getAs[Long]("n_pairs_at_or_above")).toSeq
    assert(cums == cums.sorted)
    assert(cums.last == r.map(_.getAs[Long]("n_pairs")).sum)
  }

  test("dedupReport: exact dups counted, near-dups dropped, keep rate") {
    import spark.implicits._
    val d = Seq(
      (1L, "the quick brown fox jumps over the lazy dog", "web"),
      (2L, "the quick brown fox jumps over the lazy dog", "web"),  // exact dup
      (3L, "completely different words entirely here now okay friend", "books"))
      .toDF("doc_id", "text", "source")
    val r = Dedup.dedupReport(d, 0.5).collect()
      .map(x => x.getAs[String]("source") ->
        (x.getAs[Long]("n_docs"), x.getAs[Long]("n_exact_dups"),
         x.getAs[Long]("n_dropped"), x.getAs[Double]("keep_rate"))).toMap
    assert(r("web") == (2L, 1L, 1L, 0.5)) // doc 2 is both exact + near drop
    assert(r("books") == (1L, 0L, 0L, 1.0))
  }

  test("normalizedExact: reformatted copies hash together, exact misses them") {
    val d = docsDf(Seq(
      (1L, "the quick brown fox"),
      (2L, "The  Quick, BROWN fox!"), // same after normalization
      (3L, "a different doc entirely")))
    assert(Dedup.exact(d).count() == 3) // byte-exact sees three distinct
    val r = Dedup.normalizedExact(d).collect()
    assert(r.length == 2)
    val dup = r.find(_.getAs[Long]("n_copies") == 2L).get
    assert(dup.getAs[Long]("keeper") == 1L)
  }

  test("editDistancePairs: zero distance for identical LSH candidates") {
    val r = Dedup.editDistancePairs(docs, 0.5).collect()
    val exact = r.find(x =>
      x.getAs[Long]("doc_a") == 1L && x.getAs[Long]("doc_b") == 2L).get
    assert(exact.getAs[Long]("lev") == 0L && exact.getAs[Double]("sim") == 1.0)
    // the near-dup differs by one word: lazy→sleepy is 4 edits on a
    // 45/47-char pair → sim ≈ 0.9149, well above the 0.5 floor
    val near = r.filter(x => x.getAs[Long]("doc_b") == 3L)
    assert(near.forall(x => x.getAs[Long]("lev") > 0L && x.getAs[Double]("sim") >= 0.9))
    // the unrelated doc 4 never pairs (no shared LSH band)
    assert(!r.exists(x => x.getAs[Long]("doc_a") == 4L || x.getAs[Long]("doc_b") == 4L))
  }

  test("sourceOverlap: pairs counted per unordered source pair") {
    import spark.implicits._
    val d = Seq((1L, "x", "web"), (2L, "x", "book"), (3L, "x", "web"), (4L, "x", "web"))
      .toDF("doc_id", "text", "source")
    val pairs = Seq((1L, 2L, 0.9), (2L, 3L, 0.8), (1L, 3L, 0.7), (3L, 4L, 0.9))
      .toDF("doc_a", "doc_b", "jaccard")
    val r = Dedup.sourceOverlapOf(d, pairs).collect()
      .map(x => (x.getAs[String]("source_a"), x.getAs[String]("source_b")) ->
        x.getAs[Long]("n_pairs")).toMap
    // (1,2) and (2,3) cross book/web regardless of pair orientation;
    // (1,3) and (3,4) sit inside web
    assert(r == Map(("book", "web") -> 2L, ("web", "web") -> 2L))
  }

  test("clusterDownweight: unclustered always kept, clusters get 1/csize") {
    import spark.implicits._
    val d = docsDf(Seq((1L, "a"), (2L, "a"), (3L, "a"), (4L, "b"), (5L, "c")))
    val clusters = Seq((1L, 1L, 3L), (2L, 1L, 3L), (3L, 1L, 3L))
      .toDF("doc_id", "cluster_id", "csize")
    val r = Dedup.clusterDownweightOf(d, clusters, "s").collect()
    // csize-1 docs pass the admission rule unconditionally (hash%1e6 < 1e6)
    assert(r.filter(_.getAs[Long]("csize") == 1L)
      .map(_.getAs[Long]("doc_id")).toSet == Set(4L, 5L))
    assert(r.forall { x =>
      x.getAs[Double]("weight") ==
        (if (x.getAs[Long]("csize") == 1L) 1.0 else 0.3333)
    })
    assert(r.filter(_.getAs[Long]("csize") == 3L)
      .map(_.getAs[Long]("doc_id")).toSet.subsetOf(Set(1L, 2L, 3L)))
    // deterministic: the same salt re-admits the identical set
    val r2 = Dedup.clusterDownweightOf(d, clusters, "s").collect()
    assert(r.map(_.toString).sorted.sameElements(r2.map(_.toString).sorted))
  }

  test("topBoilerplate: the shared 8-gram surfaces with its text and df") {
    val prefix = "one two three four five six seven eight"
    val d = docsDf(Seq(
      (1L, s"$prefix alpha beta"), (2L, s"$prefix gamma delta"),
      (3L, "totally different words with no shared gram here at all")))
    val r = Dedup.topBoilerplateOf(d, Dedup.shingles(d, 8), 8, 3).collect()
    assert(r.head.getAs[String]("gram") == prefix)
    assert(r.head.getAs[Long]("df") == 2L)
    assert(r.forall(_.getAs[Long]("df") >= 1L))
  }

  test("kfoldGrouped: cluster members share a fold, folds stay in range") {
    import spark.implicits._
    val d = docsDf(Seq((1L, "a"), (2L, "a"), (3L, "a"), (4L, "b"), (5L, "c")))
    val clusters = Seq((1L, 1L, 3L), (2L, 1L, 3L), (3L, 1L, 3L))
      .toDF("doc_id", "cluster_id", "csize")
    val r = Dedup.kfoldGroupedOf(d, clusters, 5, "kf").collect()
    assert(r.length == 5)
    def fold(id: Long) = r.find(_.getAs[Long]("doc_id") == id).get.getAs[Long]("fold")
    // near-dup cluster {1,2,3} can never straddle a fold boundary
    assert(fold(1L) == fold(2L) && fold(2L) == fold(3L))
    assert(r.forall { x => val f = x.getAs[Long]("fold"); f >= 0L && f < 5L })
    // unclustered docs are their own group
    assert(r.find(_.getAs[Long]("doc_id") == 4L).get.getAs[Long]("group_id") == 4L)
    // re-salting redraws the assignment deterministically
    val r2 = Dedup.kfoldGroupedOf(d, clusters, 5, "kf").collect()
    assert(r.map(_.toString).sorted.sameElements(r2.map(_.toString).sorted))
  }

  test("ngramNovelty: repeated content shows zero novelty in its bucket") {
    // 10 docs of 8 tokens each -> exactly one 8-shingle per doc, and with
    // nd = 10 the bucket id IS the doc id. Doc 5 repeats doc 0's text, so
    // bucket 5's only type was first seen in bucket 0.
    val docs = docsDf((0L to 9L).map(i =>
      (i, if (i == 5L) "w0 a b c d e f g" else s"w$i a b c d e f g")))
    val r = Dedup.ngramNoveltyOf(docs, Dedup.shingles(docs, 8)).collect()
      .map(x => x.getAs[Long]("bucket") -> x).toMap
    assert(r.size == 10)
    assert(r(0L).getAs[Long]("n_types") == 1L &&
      r(0L).getAs[Long]("n_new_types") == 1L &&
      r(0L).getAs[Double]("novelty") == 1.0)
    assert(r(5L).getAs[Long]("n_types") == 1L &&
      r(5L).getAs[Long]("n_new_types") == 0L &&
      r(5L).getAs[Double]("novelty") == 0.0)
    assert((1L to 4L).forall(b => r(b).getAs[Double]("novelty") == 1.0))
  }
}
