package graft

import graft.operators.{Multimodal, TextAnalysis}

class TextAnalysisSpec extends SparkSpec {

  private def docs = docsDf(Seq(
    (1L, "the cat sat on the mat"),
    (2L, "on the mat the cat sat"), // same tokens, different order
    (3L, "xyzzy 42 plugh!")))

  test("inRowTf equals the explode-groupBy term frequencies on edge shapes") {
    import org.apache.spark.sql.functions._
    val tricky = docsDf(Seq(
      (1L, "a a a b b c"),          // runs of every length
      (2L, "  leading   spaces x"), // empty split tokens must drop
      (3L, "solo"),                 // single token
      (4L, ""),                     // empty doc -> zero rows
      (5L, "z y x w z z y")))       // unsorted input, interleaved repeats
    val inRow = TextAnalysis.inRowTf(tricky)
      .orderBy("doc_id", "term")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    val viaGroupBy = tricky
      .select(col("doc_id"), explode(TextAnalysis.tokens(col("text"))).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
      .orderBy("doc_id", "term")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(inRow == viaGroupBy, s"in-row tf diverged:\n$inRow\nvs\n$viaGroupBy")
    assert(!inRow.exists(_._1 == 4L)) // the empty doc yields nothing
  }

  test("gopherRules: flags fire on the right screens and pass is their conjunction") {
    val good = (Seq.fill(10)("the quick brown fox jumps") ++ Seq("of a to in is"))
      .mkString(" ") // 55 tokens, all alphabetic, plenty of stopwords
    val short = "tiny doc"
    val symbols = (Seq.fill(30)("the cat !!! ??? ;;;")).mkString(" ") // symbol-heavy
    val r = TextAnalysis.gopherRules(docsDf(Seq(
      (1L, good), (2L, short), (3L, symbols)))).collect()
    def row(id: Long) = r.find(_.getAs[Long]("doc_id") == id).get
    assert(row(1L).getAs[Boolean]("pass"))
    assert(row(1L).getAs[Long]("n_tokens") == 55L)
    assert(!row(2L).getAs[Boolean]("flag_word_count") && !row(2L).getAs[Boolean]("pass"))
    assert(!row(3L).getAs[Boolean]("flag_symbol") && !row(3L).getAs[Boolean]("flag_alpha"))
    assert(!row(3L).getAs[Boolean]("pass"))
  }

  test("dsirWeights: target-like docs outweigh junk") {
    // two 100-token high-quality docs (stopword-rich, no punctuation →
    // composite quality 1.0) define the target distribution; the junk doc
    // shares no tokens with them
    val target = (Seq.fill(20)("the data model trains well") ).mkString(" ")
    val junk = Seq.fill(10)("zzz9!").mkString(" ")
    val r = TextAnalysis.dsirWeights(docsDf(Seq(
      (1L, target), (2L, target), (3L, junk)))).collect()
    def w(id: Long) = r.find(_.getAs[Long]("doc_id") == id).get.getAs[Double]("log_weight")
    assert(w(1L) > w(3L))
    assert(w(1L) > 0.0 && w(3L) < 0.0)
  }

  test("bpePairStats: pair counts weighted by word-type frequency") {
    val r = TextAnalysis.bpePairStats(docsDf(Seq(
      (1L, "abab cd"), (2L, "abab x"))), 10).collect()
    def occ(p: String) = r.find(_.getAs[String]("pair") == p).map(_.getAs[Long]("occurrences"))
    // "abab" has type count 2 and contains ab twice, ba once
    assert(occ("ab").contains(4L))
    assert(occ("ba").contains(2L))
    assert(occ("cd").contains(1L))
    assert(occ("x").isEmpty) // length-1 types contribute no pairs
  }

  test("curriculumStages: equal-count stages with non-increasing score ranges") {
    val docs = docsDf((1L to 8L).map { i =>
      // vary stopword density so model scores differ across docs
      (i, (Seq.fill(i.toInt * 3)("the") ++ Seq.fill(30 - i.toInt * 3)("zq")).mkString(" "))
    })
    val r = TextAnalysis.curriculumStages(docs, 4).collect()
      .sortBy(_.getAs[Long]("stage"))
    assert(r.map(_.getAs[Long]("stage")).toSeq == Seq(0L, 1L, 2L, 3L))
    assert(r.forall(_.getAs[Long]("n_docs") == 2L))
    r.sliding(2).foreach { case Array(hi, lo) =>
      assert(hi.getAs[Double]("min_score") >= lo.getAs[Double]("max_score"))
    }
  }

  test("mixTemperature: tau<1 up-weights small domains without flattening") {
    import spark.implicits._
    val d = Seq(
      (1L, Seq.fill(90)("a").mkString(" "), "big"),
      (2L, Seq.fill(10)("b").mkString(" "), "small"))
      .toDF("doc_id", "text", "source")
    val r = TextAnalysis.mixTemperature(d, 0.5).collect()
      .map(x => x.getAs[String]("source") -> x).toMap
    // shares 0.9/0.1 → sqrt-scaled 0.75/0.25
    assert(r("big").getAs[Double]("temp_share") == 0.75)
    assert(r("small").getAs[Double]("temp_share") == 0.25)
    assert(r("small").getAs[Double]("weight") == 2.5)
    assert(r("big").getAs[Double]("weight") < 1.0)
  }

  test("zipfSlope: negative slope on a skewed vocabulary, deterministic") {
    val d = docsDf(Seq(
      (1L, (Seq.fill(8)("aa") ++ Seq.fill(4)("bb") ++ Seq.fill(2)("cc") ++ Seq("dd")).mkString(" "))))
    val r = TextAnalysis.zipfSlope(d, 100).collect()
    assert(r.length == 1)
    assert(r.head.getAs[Long]("n_points") == 4L)
    assert(r.head.getAs[Double]("slope") < 0.0)
    val r2 = TextAnalysis.zipfSlope(d, 100).collect()
    assert(r.head.toString == r2.head.toString)
  }

  test("packingEfficiency: exact integer padding accounting") {
    val d = docsDf(Seq(
      (1L, Seq.fill(10)("a").mkString(" ")),   // 10 tokens
      (2L, Seq.fill(300)("b").mkString(" ")))) // 300 tokens
    val r = TextAnalysis.packingEfficiency(d, Seq(256)).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getAs[Long]("total_tokens") == 310L)
    assert(row.getAs[Long]("padded_tokens") == 768L) // 256 + 512
    assert(row.getAs[Long]("n_seqs_padded") == 3L)
    assert(row.getAs[Long]("n_seqs_packed") == 2L)
    assert(row.getAs[Double]("pad_waste") == math.floor((1.0 - 310.0 / 768.0) * 10000.0 + 0.5) / 10000.0)
  }

  test("tokenCounts: whitespace and BPE-ish counts") {
    val r = TextAnalysis.tokenCounts(docs).collect()
    def row(id: Long) = r.find(_.getAs[Long]("doc_id") == id).get
    assert(row(1L).getAs[Int]("n_ws_tokens") == 6)
    assert(row(3L).getAs[Int]("n_ws_tokens") == 3)
    assert(row(3L).getAs[Int]("n_bpe_tokens") == 5) // xyzzy, 4, 2, plugh, !
  }

  test("quality is bounded and penalizes punctuation") {
    val r = TextAnalysis.quality(docs).collect()
    assert(r.forall { x =>
      val q = x.getAs[Double]("quality"); q >= 0.0 && q <= 1.0
    })
    def q(id: Long) = r.find(_.getAs[Long]("doc_id") == id).get.getAs[Double]("quality")
    assert(q(1L) > q(3L)) // stopwords + no punctuation beats punctuation + no stopwords
  }

  test("langId votes for marker words deterministically") {
    val r = TextAnalysis.langId(docs).collect()
    def lang(id: Long) = r.find(_.getAs[Long]("doc_id") == id).get.getAs[String]("pred_lang")
    assert(lang(1L) == "en")
    assert(lang(3L) == "und")
  }

  test("fingerprint is order-sensitive (rolling hash, not a bag hash)") {
    val r = TextAnalysis.fingerprint(docs).collect()
    def fp(id: Long) = r.find(_.getAs[Long]("doc_id") == id).get.getAs[Long]("fingerprint")
    assert(fp(1L) != fp(2L))
    assert(fp(1L) >= 0L && fp(1L) < 2147483647L)
  }

  test("bpeMerges: greedy trainer rounds with overlap-correct apply and early stop") {
    // word types: "aaaa" ×2, "ab" ×3
    // round 1 pairs: (a,a) 3 positions × 2 = 6 beats (a,b) 1 × 3 = 3
    //   greedy apply: aaaa -> [aa, aa] (left-to-right, non-overlapping)
    // round 2: (a,b) 3 beats (aa,aa) 2 -> ab fully merged
    // round 3: (aa,aa) 2 -> aaaa; round 4: no pairs left -> stop early
    val r = TextAnalysis.bpeMerges(docsDf(Seq(
      (1L, "aaaa ab ab"), (2L, "aaaa ab"))), 8)
      .orderBy("merge_round")
      .collect().map(x => (x.getInt(0), x.getString(1), x.getString(2),
        x.getString(3), x.getLong(4))).toSeq
    assert(r == Seq(
      (1, "a", "a", "aa", 6L),
      (2, "a", "b", "ab", 3L),
      (3, "aa", "aa", "aaaa", 2L)), s"merge sequence diverged: $r")
  }

  test("bpeEncodeStats: learned merges apply in order, per-source fertility exact") {
    import org.apache.spark.sql.functions._
    // trainer on word types {aaaa x2, ab x3, aab x1}: round 1 learns
    // (a,a) occ 7 (aaaa contributes 3 overlapping positions x2, aab 1),
    // round 2 learns (a,b) occ 3. Encoding with those two merges:
    // aaaa -> [aa, aa] (greedy, the round-1 merge already collapsed the
    // a's so round 2's ' a  b ' never matches inside aab), ab -> [ab],
    // aab -> [aa, b], b -> [b].
    val docs = docsDf(Seq(
      (1L, "aaaa ab ab"), (2L, "aaaa ab"), (3L, "aab b")))
      .withColumn("source", when(col("doc_id") <= 2, "X").otherwise("Y"))
    val r = TextAnalysis.bpeEncodeStats(docs, 2).collect()
      .map(x => x.getAs[String]("source") ->
        (x.getAs[Long]("n_docs"), x.getAs[Long]("n_words"),
          x.getAs[Long]("n_subtokens"), x.getAs[Double]("fertility"))).toMap
    assert(r("X") == ((2L, 5L, 7L, 1.4)), s"X diverged: ${r("X")}")
    assert(r("Y") == ((1L, 2L, 3L, 1.5)), s"Y diverged: ${r("Y")}")
  }

  test("multimodal: resize preserves aspect ratio; featureExtract is deterministic") {
    val meta = Multimodal.binaryMeta(docs)
    val resized = Multimodal.resize(meta, 128, 128).collect()
    assert(resized.forall { r =>
      val (w, h, ow, oh) = (r.getAs[Int]("width"), r.getAs[Int]("height"),
        r.getAs[Int]("out_w"), r.getAs[Int]("out_h"))
      ow <= 128 && oh <= 128 && ow <= w && oh <= h &&
        math.abs(ow.toDouble / oh - w.toDouble / h) < 0.1
    })
    val f1 = Multimodal.featureExtract(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getSeq[Float](1)).toMap
    val f2 = Multimodal.featureExtract(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getSeq[Float](1)).toMap
    assert(f1 == f2 && f1.values.forall(v => v.length == 8 && v.forall(x => x >= -1f && x < 1f)))
  }

  test("multimodal: declarative binaryMeta equals the batched mapPartitions decode") {
    import spark.implicits._
    val declarative = Multimodal.binaryMeta(docs).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("byte_len"),
        r.getAs[Int]("width"), r.getAs[Int]("height"), r.getAs[Int]("n_frames"))).toSet
    val media = docs.map(r => Multimodal.MediaBatch(
      r.getAs[Long]("doc_id"),
      r.getAs[String]("text").getBytes(java.nio.charset.StandardCharsets.UTF_8)))
    val batched = Multimodal.decodeBatched(spark, media).collect()
      .map(d => (d.doc_id, d.byte_len, d.width, d.height, d.n_frames)).toSet
    assert(declarative == batched)
  }

  test("vocabCoverage: top-N vocab covers frequent tokens, flags OOV") {
    // freq: a:3, b:2, c:1 → vocab of 2 = {a, b}; doc 2's 'c' is OOV
    val d = docsDf(Seq((1L, "a a b"), (2L, "a b c")))
    val r = graft.operators.TextAnalysis.vocabCoverage(d, 2).collect()
      .map(x => x.getAs[Long]("doc_id") ->
        (x.getAs[Long]("n_oov"), x.getAs[Double]("coverage"))).toMap
    assert(r(1L) == (0L, 1.0))
    assert(r(2L) == (1L, 0.6667))
  }

  test("vocabCoverage: a table too small for ANY band yields the empty vocab") {
    // every token unique (one cnt=1 band of 4 types) and vocabSize=2: no
    // whole band fits, so — documented degenerate semantics — the vocab
    // is empty and every doc reports coverage 0.0 rather than admitting
    // a band that overflows the table
    val d = docsDf(Seq((1L, "w x"), (2L, "y z")))
    val r = graft.operators.TextAnalysis.vocabCoverage(d, 2).collect()
      .map(x => x.getAs[Long]("doc_id") ->
        (x.getAs[Long]("n_oov"), x.getAs[Double]("coverage"))).toMap
    assert(r(1L) == (2L, 0.0) && r(2L) == (2L, 0.0))
  }

  test("qualityPercentiles: identical docs collapse the distribution") {
    import spark.implicits._
    val d = Seq.tabulate(4)(i =>
      (i.toLong, "the cat sat on the mat at the end of a story", "en"))
      .toDF("doc_id", "text", "lang")
    val r = graft.operators.TextAnalysis.qualityPercentiles(d, 0.55).head()
    val (p10, p50, p90) = (r.getAs[Double]("p10"), r.getAs[Double]("p50"),
      r.getAs[Double]("p90"))
    assert(p10 == p50 && p50 == p90) // all docs share one quality value
    assert(r.getAs[Long]("n_docs") == 4L)
    assert(Set(0.0, 1.0)(r.getAs[Double]("below_cut"))) // all or nothing
  }

  test("multimodal: sceneDetect opens a scene per doc, ids monotone") {
    val frames = Multimodal.sceneDetect(docs).collect()
      .groupBy(_.getAs[Long]("doc_id"))
    frames.foreach { case (_, fs) =>
      val ordered = fs.sortBy(_.getAs[Int]("frame_idx"))
      val first = ordered.head
      // frame 0 always opens scene 1 with no distance to a predecessor
      assert(first.getAs[Boolean]("is_boundary") && first.isNullAt(first.fieldIndex("dist")))
      assert(first.getAs[Long]("scene_id") == 1L)
      val ids = ordered.map(_.getAs[Long]("scene_id")).toSeq
      assert(ids.zip(ids.tail).forall { case (a, b) => b == a || b == a + 1 })
      // non-boundary frames stay within hamming 25 of their predecessor
      assert(ordered.tail.forall(r =>
        r.getAs[Boolean]("is_boundary") == (r.getAs[Long]("dist") > 25L)))
    }
  }

  test("multimodal: keyframes pick the first frame per scene and tile the clip") {
    val kf = Multimodal.keyframes(docs).collect().groupBy(_.getAs[Long]("doc_id"))
    val meta = Multimodal.binaryMeta(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("n_frames")).toMap
    for ((doc, scenes) <- kf) {
      val ordered = scenes.sortBy(_.getAs[Long]("scene_id"))
      assert(ordered.map(_.getAs[Long]("scene_id")).toSeq ==
        (1L to ordered.length).toSeq, s"doc $doc scene ids not consecutive")
      assert(ordered.head.getAs[Int]("keyframe_idx") == 0,
        s"doc $doc scene 1 must open at frame 0")
      // shots tile the clip exactly: lengths sum to the frame count
      assert(ordered.map(_.getAs[Long]("scene_len")).sum == meta(doc).toLong)
      // each keyframe starts where the previous shot ended
      val starts = ordered.map(_.getAs[Int]("keyframe_idx").toLong)
      val lens = ordered.map(_.getAs[Long]("scene_len"))
      assert(starts.zip(lens).zip(starts.tail).forall {
        case ((s0, l0), s1) => s1 == s0 + l0 })
    }
  }

  test("multimodal: aspectBuckets partition the corpus, crop fraction in [0,1)") {
    val r = Multimodal.aspectBuckets(docs).collect()
    assert(r.map(_.getAs[Long]("n_images")).sum == docs.count())
    val names = Set("square", "landscape_4_3", "portrait_3_4", "wide_16_9", "tall_9_16")
    assert(r.forall(x => names(x.getAs[String]("bucket"))))
    assert(r.forall { x =>
      val c = x.getAs[Double]("mean_crop"); c >= 0.0 && c < 1.0
    })
  }

  test("repetition metrics: ttr, top-bigram mass, dup trigrams, max run") {
    // "a a a b": tokens 4, distinct 2 -> ttr 0.5; bigrams [a a, a a, a b]
    // -> top mass = 2·len("a a") = 6 over 7 chars; trigrams [a a a, a a b]
    // both singletons -> dup3 0; run of three a's -> max_run 3.
    // "x y x y x y": trigrams [x y x, y x y, x y x, y x y] all duplicated
    // -> dup3 1.0; no consecutive repeats -> max_run 1.
    val r = graft.operators.TextAnalysis.repetition(
      docsDf(Seq((1L, "a a a b"), (2L, "x y x y x y")))).collect()
      .map(x => x.getAs[Long]("doc_id") -> x).toMap
    assert(r(1L).getAs[Int]("n_tokens") == 4)
    assert(r(1L).getAs[Double]("ttr") == 0.5)
    assert(r(1L).getAs[Double]("top2_char_frac") == math.floor(6.0 / 7.0 * 10000.0 + 0.5) / 10000.0)
    assert(r(1L).getAs[Double]("dup3_frac") == 0.0)
    assert(r(1L).getAs[Int]("max_run") == 3)
    assert(r(2L).getAs[Double]("dup3_frac") == 1.0)
    assert(r(2L).getAs[Int]("max_run") == 1)
  }

  test("pii scrub counts and redacts emails, phones, and IPv4 addresses") {
    import spark.implicits._
    val r = graft.operators.TextAnalysis.piiScrub(Seq(
      (1L, "contact john.doe@example.com or jane@test.org today"),
      (2L, "call +1 (555) 123-4567 now"),
      (3L, "server at 192.168.0.1 and 10.0.0.255 up"),
      (4L, "no sensitive content here")).toDF("doc_id", "text"))
      .collect().map(x => x.getAs[Long]("doc_id") -> x).toMap
    assert(r(1L).getAs[Int]("n_email") == 2 && r(1L).getAs[Int]("n_phone") == 0)
    assert(r(2L).getAs[Int]("n_phone") == 1)
    assert(r(3L).getAs[Int]("n_ipv4") == 2 && r(3L).getAs[Int]("n_phone") == 0)
    assert(r(4L).getAs[Int]("n_email") + r(4L).getAs[Int]("n_ipv4") + r(4L).getAs[Int]("n_phone") == 0)
    // redaction replaces the spans: hash equals md5 of the expected text
    val red = Seq((9L, "contact john.doe@example.com or 10.0.0.1 via +1 (555) 123-4567"))
      .toDF("doc_id", "text")
      .select(graft.operators.TextAnalysis.piiRedact(
        org.apache.spark.sql.functions.col("text")).as("r"))
      .head().getAs[String]("r")
    assert(red == "contact <EMAIL> or <IPV4> via <PHONE>")
  }

  test("corpusStats reports volume, mean quality, and dup rate per stratum") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "the cat sat on the mat at the end of a story", "en", "web", 44L),
      (2L, "the cat sat on the mat at the end of a story", "en", "web", 44L), // dup
      (3L, "the dog ran to the park in a big happy loop", "en", "web", 43L),
      (4L, "der hund und der mann und der wagen hier", "de", "web", 40L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = graft.operators.Curation.corpusStats(corpus).collect()
      .map(x => (x.getAs[String]("source"), x.getAs[String]("lang")) -> x).toMap
    val en = r(("web", "en"))
    assert(en.getAs[Long]("n_docs") == 3L && en.getAs[Long]("n_chars_total") == 131L)
    assert(en.getAs[Double]("dup_rate") == math.floor(1.0 / 3.0 * 10000.0 + 0.5) / 10000.0)
    assert(r(("web", "de")).getAs[Double]("dup_rate") == 0.0)
    assert(en.getAs[Double]("avg_quality") > 0.0 && en.getAs[Double]("avg_quality") <= 1.0)
  }

  test("curationFunnel: cumulative stage counts match the ship-path") {
    import spark.implicits._
    // doc 2 is an exact dup of doc 1 (drops at exact_dedup); docs 3 and 4
    // differ by one token (near-dups at threshold 0.2 — doc 4 drops);
    // doc 5 is German (drops at lang); doc 6 is English-marked but
    // punctuation-heavy (low quality, drops at the quality gate)
    val corpus = Seq(
      (1L, "the cat sat on the mat and then the dog sat on the same mat again today"),
      (2L, "the cat sat on the mat and then the dog sat on the same mat again today"),
      (3L, "the bird flew over the green hill and then it landed on the old oak tree"),
      (4L, "the bird flew over the green hill and then it landed on the old oak stump"),
      (5L, "der hund und der mann und der wagen und der hut sind hier heute wieder da"),
      (6L, "the !!!! ???? ####")).toDF("doc_id", "text")
    val r = graft.operators.Curation.curationFunnel(corpus, 0.55, "en", 0.2)
      .collect().map(x => x.getAs[String]("stage") ->
        ((x.getAs[Long]("n_docs"), x.getAs[Int]("stage_ord")))).toMap
    assert(r("raw") == ((6L, 0)))
    assert(r("exact_dedup") == ((5L, 1)))   // doc 2 dropped
    assert(r("near_dedup") == ((4L, 2)))    // doc 4 dropped
    assert(r("lang") == ((3L, 3)))          // doc 5 dropped
    assert(r("quality") == ((2L, 4)))       // doc 6 dropped
    // token counts are cumulative too: quality stage = docs 1 and 3 only
    val toks = graft.operators.Curation.curationFunnel(corpus, 0.55, "en", 0.2)
      .collect().map(x => x.getAs[String]("stage") -> x.getAs[Long]("n_tokens")).toMap
    assert(toks("quality") == 33L) // 17 + 16
    assert(toks("raw") > toks("exact_dedup") && toks("lang") > toks("quality"))
  }

  test("audioChunks: windows tile the clip, last chunk clipped to duration") {
    val r = Multimodal.audioChunks(docs, 10).collect()
    val byDoc = r.groupBy(_.getAs[Long]("doc_id"))
    byDoc.foreach { case (_, chunks) =>
      val dur = chunks.head.getAs[Int]("duration_s")
      assert(chunks.length == (dur + 9) / 10) // ceil(duration / chunk)
      val sorted = chunks.sortBy(_.getAs[Int]("chunk_start_s"))
      assert(sorted.head.getAs[Int]("chunk_start_s") == 0)
      assert(sorted.last.getAs[Int]("chunk_end_s") == dur)
      assert(sorted.forall(c => c.getAs[Int]("chunk_end_s") - c.getAs[Int]("chunk_start_s") <= 10))
      assert(Set(16000, 22050, 44100).contains(chunks.head.getAs[Int]("sample_rate")))
    }
  }

  test("materializeFull also drops near-duplicates, not just exact ones") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "the cat sat on the mat at the end of a big story", "web"),
      (2L, "the cat sat on the mat at the end of a big tale", "web"), // near-dup of 1
      (3L, "the dog ran along the path to the park in a loop today", "web"))
      .toDF("doc_id", "text", "source")
    val strict = graft.operators.Curation.materializeFull(corpus, 0.3, "en", 0.5)
      .collect().map(_.getAs[Long]("doc_id")).sorted
    // exact dedup alone would keep all three; the LSH stage drops doc 2
    assert(strict.toSeq == Seq(1L, 3L))
  }

  test("curation: dedup keeper + language + quality filters compose") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "the cat sat on the mat at the end of a story", "web"),
      (2L, "the cat sat on the mat at the end of a story", "web"), // exact dup
      (3L, "der hund und der mann und der wagen", "web"), // not 'en'
      (4L, "!!!! ???? ....", "web")) // low quality
      .toDF("doc_id", "text", "source")
    val r = graft.operators.Curation.materialize(corpus, 0.3, "en").collect()
    assert(r.map(_.getAs[Long]("doc_id")).toSeq == Seq(1L))
    assert(r.head.getAs[String]("source") == "web")
    assert(r.head.getAs[Double]("quality") >= 0.3)
  }

  test("dataSplit: total, deterministic, and stable under corpus growth") {
    import spark.implicits._
    def corpus(n: Int) = (1L to n.toLong).map(i => (i, "en", "web"))
      .toDF("doc_id", "lang", "source")
      .withColumn("n_chars", org.apache.spark.sql.functions.lit(10L))
    val a = graft.operators.TextAnalysis.dataSplit(corpus(40), 50, 25, "s1")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    assert(a.size == 40 && a.values.forall(Set("train", "val", "test")))
    assert(Set("train", "val", "test").subsetOf(a.values.toSet)) // all splits hit
    // adding docs never moves existing ones (hash-based, no RNG state)
    val b = graft.operators.TextAnalysis.dataSplit(corpus(80), 50, 25, "s1")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    assert(a.forall { case (id, s) => b(id) == s })
  }

  test("seqPack: docs cross budget boundaries, offsets are exact") {
    import spark.implicits._
    // token counts 3, 2, 4 with budget 4: doc 2 spans seqs 0-1, doc 3 spans 1-2
    val docs = Seq((1L, "a b c", "en"), (2L, "d e", "en"), (3L, "f g h i", "en"))
      .toDF("doc_id", "text", "lang")
    val r = graft.operators.TextAnalysis.seqPack(docs, 4).orderBy("doc_id").collect()
    assert(r.map(_.getAs[Long]("start_off")).toSeq == Seq(0L, 3L, 5L))
    assert(r.map(_.getAs[Long]("first_seq")).toSeq == Seq(0L, 0L, 1L))
    assert(r.map(_.getAs[Long]("last_seq")).toSeq == Seq(0L, 1L, 2L))
    assert(r.map(_.getAs[Long]("n_seqs")).toSeq == Seq(1L, 2L, 2L))
  }

  test("mixWeights: weight rebalances token share to the uniform target") {
    import spark.implicits._
    val docs = Seq((1L, (1 to 30).map(_ => "w").mkString(" "), "web"),
      (2L, (1 to 10).map(_ => "w").mkString(" "), "books"))
      .toDF("doc_id", "text", "source")
    val r = graft.operators.TextAnalysis.mixWeights(docs)
      .collect().map(x => x.getAs[String]("source") ->
        (x.getAs[Double]("token_share"), x.getAs[Double]("weight"))).toMap
    assert(r("web") == (0.75, 0.6667))   // over-represented → down-weighted
    assert(r("books") == (0.25, 2.0))    // under-represented → up-weighted
  }

  test("lmScore: rare-token docs score higher avg nll") {
    import spark.implicits._
    // vocab: a:2 b:1 c:1, N=4. doc 1 avg nll = (ln2+ln2+ln4)/3 ≈ 0.9242;
    // doc 2 = ln4 ≈ 1.3863 — the all-rare doc is the outlier
    val docs = Seq((1L, "a a b"), (2L, "c")).toDF("doc_id", "text")
    val r = graft.operators.TextAnalysis.lmScore(docs)
      .collect().map(x => x.getAs[Long]("doc_id") -> x.getAs[Double]("avg_nll")).toMap
    assert(r(1L) == 0.9242 && r(2L) == 1.3863)
  }

  test("applyMixture: repetition factors hit the target mixture exactly") {
    import spark.implicits._
    // web 30 tokens (share .75 → w = 0.6667), books 10 (share .25 → w = 2.0)
    val docs = Seq((1L, (1 to 30).map(_ => "w").mkString(" "), "web"),
      (2L, (1 to 10).map(_ => "w").mkString(" "), "books"))
      .toDF("doc_id", "text", "source")
    val r = graft.operators.TextAnalysis.applyMixture(docs, "s")
      .collect().map(x => x.getAs[Long]("doc_id") ->
        ((x.getAs[Double]("weight"), x.getAs[Long]("n_copies")))).toMap
    // integer weight: every books doc repeats exactly twice, no hash draw
    assert(r(2L) == ((2.0, 2L)))
    // fractional weight: the web doc gets 0 or 1 copies (hash-decided)
    assert(r(1L)._1 == 0.6667 && (r(1L)._2 == 0L || r(1L)._2 == 1L))
    // determinism: repeated evaluation yields identical copies
    val again = graft.operators.TextAnalysis.applyMixture(docs, "s")
      .collect().map(x => x.getAs[Long]("doc_id") -> x.getAs[Long]("n_copies")).toMap
    assert(again(1L) == r(1L)._2 && again(2L) == 2L)
    // expectation over many docs from one fractional-weight source:
    // kept fraction approaches frac(w) (deterministic hash thinning)
    val many = (1L to 400L).map(i => (i, "w w w", "a")) ++ Seq((401L, "w", "b"))
    val big = many.toDF("doc_id", "text", "source")
    val out = graft.operators.TextAnalysis.applyMixture(big, "s")
      .filter($"source" === "a").collect()
    val w = out.head.getAs[Double]("weight") // tot/(k*n_a) = 1201/(2*1200) ≈ 0.5004
    val kept = out.map(_.getAs[Long]("n_copies")).sum.toDouble / out.length
    assert(math.abs(kept - (w - math.floor(w))) < 0.06)
  }

  test("trainingShuffle: exact permutation, balanced round-robin shards") {
    import spark.implicits._
    val docs = (1L to 100L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val r = graft.operators.TextAnalysis.trainingShuffle(docs, 8, "s")
      .collect()
    // positions form an exact permutation: every (shard, pos_in_shard)
    // cell occupied exactly once, global positions 0..99 with no gaps
    val pos = r.map(x => x.getAs[Long]("shard") + 8L * x.getAs[Long]("pos_in_shard")).sorted
    assert(pos.toSeq == (0L until 100L).toSeq)
    // round-robin: shard sizes differ by at most 1
    val sizes = r.groupBy(_.getAs[Long]("shard")).map(_._2.length)
    assert(sizes.max - sizes.min <= 1)
    // deterministic: same salt → same layout; new salt → different layout
    val again = graft.operators.TextAnalysis.trainingShuffle(docs, 8, "s").collect()
    assert(r.map(x => (x.getAs[Long]("doc_id"), x.getAs[Long]("shard"))).toSet ==
      again.map(x => (x.getAs[Long]("doc_id"), x.getAs[Long]("shard"))).toSet)
    val resalted = graft.operators.TextAnalysis.trainingShuffle(docs, 8, "t").collect()
    assert(r.map(x => (x.getAs[Long]("doc_id"), x.getAs[Long]("pos_in_shard"))).toSet !=
      resalted.map(x => (x.getAs[Long]("doc_id"), x.getAs[Long]("pos_in_shard"))).toSet)
  }

  test("sampleTokenBudget: greedy hash-order fill caps each source") {
    import spark.implicits._
    val docs = (1L to 50L).map(i =>
      (i, (1 to 10).map(_ => "w").mkString(" "), if (i <= 40) "web" else "books"))
      .toDF("doc_id", "text", "source")
    val r = graft.operators.TextAnalysis.sampleTokenBudget(docs, 100L, "s")
      .collect()
    // each doc is 10 tokens → exactly 10 admitted per source (cap 100)
    val bySrc = r.groupBy(_.getAs[String]("source")).view.mapValues(_.length).toMap
    assert(bySrc == Map("web" -> 10, "books" -> 10))
    // admitted set = the 10 lowest salted hashes of each source (greedy
    // prefix of the hash order), and cum_tokens is the exact prefix sum
    assert(r.forall(_.getAs[Long]("cum_tokens") <= 100L))
    val webCums = r.filter(_.getAs[String]("source") == "web")
      .map(_.getAs[Long]("cum_tokens")).sorted
    assert(webCums.toSeq == (1 to 10).map(_ * 10L))
  }

  test("tokenEntropy: uniform tokens maximize, repetition minimizes") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d"),   // uniform: H = ln 4
      (2L, "a a a a"),   // degenerate: H = 0
      (3L, "a a b b")).toDF("doc_id", "text") // two fair coins: H = ln 2
    val r = graft.operators.TextAnalysis.tokenEntropy(docs)
      .collect().map(x => x.getAs[Long]("doc_id") ->
        ((x.getAs[Long]("n_tokens"), x.getAs[Long]("n_types"), x.getAs[Double]("entropy")))).toMap
    assert(r(1L) == ((4L, 4L, 1.3863)))
    assert(r(2L) == ((4L, 1L, 0.0)))
    assert(r(3L) == ((4L, 2L, 0.6931)))
  }

  test("tokenizerFertility: per-source integer sums and exact ratios") {
    import spark.implicits._
    val d = Seq(
      (1L, "ab cd", "web"),        // 5 chars, 2 ws tokens, 2 sub-tokens
      (2L, "a b!", "web"),         // 4 chars, 2 ws tokens, 3 sub-tokens (a, b, !)
      (3L, "hello world", "book")) // 11 chars, 2 ws tokens, 2 sub-tokens
      .toDF("doc_id", "text", "source")
    val r = TextAnalysis.tokenizerFertility(d).collect()
      .map(x => x.getAs[String]("source") -> x).toMap
    val web = r("web")
    assert(web.getAs[Long]("n_docs") == 2L && web.getAs[Long]("n_chars") == 9L &&
      web.getAs[Long]("n_ws_tokens") == 4L && web.getAs[Long]("n_bpe_tokens") == 5L)
    assert(web.getAs[Double]("fertility") == 1.25)        // 5 / 4
    assert(web.getAs[Double]("bpe_per_100_chars") == 55.5556) // 500 / 9, rd4
    assert(r("book").getAs[Double]("fertility") == 1.0)
  }

  test("mixtureTokenShare: achieved token mass tracks the 1/k target") {
    import spark.implicits._
    val d = Seq(
      (1L, "a b c d e f g h", "web"), (2L, "i j k l m n o p", "web"),
      (3L, "q r", "book"))
      .toDF("doc_id", "text", "source")
    val r = TextAnalysis.mixtureTokenShare(d, "t1").collect()
      .map(x => x.getAs[String]("source") -> x).toMap
    assert(r.keySet == Set("web", "book"))
    assert(r.values.forall(_.getAs[Double]("target_share") == 0.5)) // k = 2
    // mixed_tokens must equal the applyMixture repetition factors applied
    // to each doc's token count, aggregated per source
    val rep = TextAnalysis.applyMixture(d, "t1").collect()
      .map(x => x.getAs[Long]("doc_id") ->
        (x.getAs[String]("source"), x.getAs[Long]("n_copies"))).toMap
    val tokensOf = Map(1L -> 8L, 2L -> 8L, 3L -> 2L)
    val expected = rep.toSeq
      .groupBy(_._2._1)
      .view.mapValues(_.map { case (id, (_, c)) => c * tokensOf(id) }.sum).toMap
    assert(r("web").getAs[Long]("mixed_tokens") == expected("web"))
    assert(r("book").getAs[Long]("mixed_tokens") == expected("book"))
    val tot = expected.values.sum.toDouble
    assert(r("web").getAs[Double]("mixed_share") ==
      math.floor(expected("web") / tot * 10000.0 + 0.5) / 10000.0)
  }

  test("chunkWindows: overlapping windows cover every token, last one short") {
    val d = docsDf(Seq((1L, (1 to 10).map(i => s"t$i").mkString(" "))))
    val r = TextAnalysis.chunkWindows(d, chunkTokens = 8, overlap = 4).collect()
      .map(x => x.getAs[Long]("chunk_id") -> x).toMap
    assert(r.size == 3) // starts 1, 5, 9 (step 4)
    assert(r(0L).getAs[Int]("n_tokens") == 8 &&
      r(0L).getAs[String]("chunk_text") == (1 to 8).map(i => s"t$i").mkString(" "))
    assert(r(1L).getAs[Int]("start") == 5 &&
      r(1L).getAs[String]("chunk_text") == (5 to 10).map(i => s"t$i").mkString(" "))
    assert(r(2L).getAs[Int]("n_tokens") == 2 &&
      r(2L).getAs[String]("chunk_text") == "t9 t10")
  }

  test("bm25TopK: term frequency ranks, absent docs never appear") {
    val d = docsDf(Seq(
      (1L, "cat cat dog x"), (2L, "cat dog y z"), (3L, "dog mouse")))
    val r = TextAnalysis.bm25TopK(d, Seq("cat"), 10).collect()
      .map(x => x.getAs[Long]("doc_id") -> x.getAs[Double]("score")).toMap
    assert(r.keySet == Set(1L, 2L)) // doc 3 has no query term
    assert(r(1L) > r(2L) && r(2L) > 0.0) // tf 2 beats tf 1 at equal length
  }

  test("rakeKeyphrases: degree/freq word scores sum per phrase, ties break on text") {
    // doc1: "red apple and green apple" → phrases "red apple", "green apple"
    // doc2: "the apple" → phrase "apple"
    // apple: freq 3, deg 2+2+1=5 → 5/3; red/green: freq 1, deg 2 → 2
    val d = docsDf(Seq((1L, "red apple and green apple"), (2L, "the apple")))
    val r = TextAnalysis.rakeKeyphrases(d, 10).collect()
    val byPhrase = r.map(x => x.getAs[String]("phrase") ->
      (x.getAs[Long]("n_occur"), x.getAs[Double]("score"))).toMap
    val appleW = math.floor(5.0 / 3.0 * 1000000.0 + 0.5) / 1000000.0 // grid word score
    def rd4(x: Double) = math.floor(x * 10000.0 + 0.5) / 10000.0
    assert(byPhrase("apple") == ((1L, rd4(appleW))))
    assert(byPhrase("red apple") == ((1L, rd4(2.0 + appleW))))
    assert(byPhrase("green apple") == ((1L, rd4(2.0 + appleW))))
    // equal scores order lexicographically: green before red
    val order = r.map(_.getAs[String]("phrase")).toSeq
    assert(order.indexOf("green apple") < order.indexOf("red apple"))
  }

  test("ccnetBuckets: terciles balance per lang and head is more fluent than tail") {
    import spark.implicits._
    // 7 en docs spanning common→rare vocabulary, 3 de docs — tests the
    // remainder bucket (7 = 3+2+2) and the per-lang restart
    val d = ((1 to 7).map(i =>
        (i.toLong, ("the common words " * 3) + (s"rare$i unique$i " * i), "en")) ++
      (8 to 10).map(i => (i.toLong, s"das wort $i", "de")))
      .toDF("doc_id", "text", "lang")
    val r = TextAnalysis.ccnetBuckets(d).collect()
    val byLang = r.groupBy(_.getAs[String]("lang"))
    // bucket doc counts per lang differ by at most 1 (NTILE contract)
    for ((lang, rows) <- byLang) {
      val counts = rows.map(_.getAs[Long]("n_docs"))
      assert(counts.max - counts.min <= 1, s"$lang buckets unbalanced: ${counts.toSeq}")
      val byTier = rows.map(x => x.getAs[String]("tier") -> x.getAs[Double]("mean_nll")).toMap
      if (byTier.contains("head") && byTier.contains("tail"))
        assert(byTier("head") <= byTier("tail"),
          s"$lang head ${byTier("head")} not more fluent than tail ${byTier("tail")}")
    }
    assert(byLang("en").map(_.getAs[Long]("n_docs")).sum == 7L)
    assert(byLang("de").map(_.getAs[Long]("n_docs")).sum == 3L)
  }

  test("spanScrub: min-doc keeps, losers drop covered tokens, short docs untouched") {
    val span = "one two three four five six seven eight" // exactly 8 tokens
    val d = docsDf(Seq(
      (1L, s"$span alpha beta"),     // keeper (min doc_id) — untouched
      (2L, s"prefix $span suffix"),  // loser: the 8 span tokens drop
      (3L, span),                    // loser: fully scrubbed -> ''
      (4L, "short doc"),             // < n tokens: no spans, untouched
      (5L, "unique tokens here that never repeat anywhere else at all")))
    val r = TextAnalysis.spanScrub(d, 8).collect()
      .map(x => x.getAs[Long]("doc_id") ->
        ((x.getAs[String]("scrubbed_text"),
          x.getAs[Long]("n_tokens_removed"), x.getAs[Long]("n_spans_removed"))))
      .toMap
    assert(r(1L) == ((s"$span alpha beta", 0L, 0L)), s"keeper touched: ${r(1L)}")
    assert(r(2L) == (("prefix suffix", 8L, 1L)), s"loser wrong: ${r(2L)}")
    assert(r(3L) == (("", 8L, 1L)), s"full scrub wrong: ${r(3L)}")
    assert(r(4L) == (("short doc", 0L, 0L)))
    assert(r(5L)._2 == 0L && r(5L)._3 == 0L)
    // overlapping occurrences: covered positions are a UNION, not a sum
    val span9 = s"$span nine" // two overlapping 8-token spans
    val o = TextAnalysis.spanScrub(docsDf(Seq(
      (1L, span9), (2L, s"x $span9 y"))), 8).collect()
      .map(x => x.getAs[Long]("doc_id") ->
        ((x.getAs[String]("scrubbed_text"),
          x.getAs[Long]("n_tokens_removed"), x.getAs[Long]("n_spans_removed"))))
      .toMap
    assert(o(2L) == (("x y", 9L, 2L)), s"overlap union wrong: ${o(2L)}")
  }

  test("qualityRetentionCurve: monotone retention, threshold-0 keeps everything") {
    import org.apache.spark.sql.functions._
    val d = docsDf((1L to 20L).map(i =>
      (i, ("the quick brown fox " * i.toInt).trim)))
    val r = TextAnalysis.qualityRetentionCurve(d)
      .orderBy("threshold").collect()
    assert(r.length == 10, s"expected 10 thresholds, got ${r.length}")
    assert(r.head.getAs[Double]("threshold") == 0.0 &&
      r.head.getAs[Long]("n_docs") == 20L, "threshold 0 must keep every doc")
    val totTokens = d.select(TextAnalysis.nTokensL(col("text"))).collect()
      .map(_.getLong(0)).sum
    assert(r.head.getAs[Long]("n_tokens") == totTokens)
    assert(r.head.getAs[Double]("frac_docs") == 1.0)
    // retention is non-increasing in the threshold, mean quality
    // non-decreasing while docs remain
    val kept = r.map(_.getAs[Long]("n_docs"))
    assert(kept.sliding(2).forall(p => p(1) <= p(0)), kept.toSeq.toString)
    val mq = r.filter(_.getAs[Long]("n_docs") > 0).map(_.getAs[Double]("mean_quality"))
    assert(mq.sliding(2).forall(p => p.length < 2 || p(1) >= p(0) - 1e-9), mq.toSeq.toString)
    // reconciliation: each threshold's doc count equals the filter's
    val q = TextAnalysis.quality(d).collect()
    r.foreach { row =>
      val t = row.getAs[Double]("threshold")
      // bucketization keeps quality >= t exactly (quality is on the 1e-4
      // grid, thresholds on the 1e-1 grid)
      val expect = q.count(_.getAs[Double]("quality") >= t - 1e-12)
      assert(row.getAs[Long]("n_docs") == expect,
        s"threshold $t kept ${row.getAs[Long]("n_docs")} docs, filter keeps $expect")
    }
  }
}
