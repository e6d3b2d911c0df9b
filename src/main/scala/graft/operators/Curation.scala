package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** End-to-end training-corpus curation: the composition a data pipeline
  * actually runs before training — exact-dedup keeper selection, language
  * ID, quality scoring, then the final filter.
  *
  * Scale shape: quality and language ID are pure projections
  * (TextAnalysis.withQuality / withLangId) fused into ONE scan of the
  * corpus; only the dedup keeper set adds work — a content-hash groupBy
  * and a doc_id semi-join. Two shuffles total at any corpus size, with
  * every text-derived column computed exactly once.
  */
object Curation {

  /** Materialize the curated corpus: unique content, predicted language
    * = `lang`, quality ≥ `minQuality`.
    *
    * The probe side gets the scan-width floor: a small corpus file is one
    * parquet row group = ONE scan task, and the broadcast semi-join plus
    * the post-join quality/langid regexes would all run in that single
    * task (profiled: a ~1 s one-task stage at sf0.1 while 31 cores sat
    * idle). At real corpus scale the scan is already wide and spread() is
    * a no-op.
    */
  def materialize(docs: DataFrame, minQuality: Double, lang: String): DataFrame = {
    val keepers = Dedup.exact(docs).select(col("keeper").as("doc_id"))
    graft.core.Tables.spread(docs.select(col("doc_id"), col("source"), col("text")))
      .join(keepers, Seq("doc_id"), "left_semi")
      .transform(TextAnalysis.withQuality)
      .transform(TextAnalysis.withLangId)
      .filter(col("pred_lang") === lang && col("quality") >= minQuality)
      .select(col("doc_id"), col("source"), col("n_tokens"), col("quality"))
  }

  /** The full curation pipeline a training run actually ships: exact-dup
    * keepers → near-dup (MinHash-LSH) survivor filter → language +
    * quality gates, with all per-doc enrichment still fused into one
    * scan. Join order matters for scale: both dedup stages reduce to
    * doc_id sets (semi/anti joins) BEFORE the enrichment projection, so
    * the quality/langid expressions run once per surviving doc only.
    */
  def materializeFull(docs: DataFrame, minQuality: Double, lang: String,
      nearThreshold: Double): DataFrame =
    materializeFullOf(docs, Dedup.minhashLsh(docs, nearThreshold),
      minQuality, lang)

  /** [[materializeFull]] over a precomputed verified near-dup pair table
    * (already at the dedup threshold) — see [[Dedup.sharedPairs]].
    */
  def materializeFullOf(docs: DataFrame, nearPairs: DataFrame,
      minQuality: Double, lang: String): DataFrame = {
    val keepers = Dedup.exact(docs).select(col("keeper").as("doc_id"))
    val nearDrop = nearPairs
      .select(col("doc_b").as("doc_id")).distinct()
    graft.core.Tables.spread(docs.select(col("doc_id"), col("source"), col("text")))
      .join(keepers, Seq("doc_id"), "left_semi") // scan-width floor — see [[materialize]]
      .join(nearDrop, Seq("doc_id"), "left_anti")
      .transform(TextAnalysis.withQuality)
      .transform(TextAnalysis.withLangId)
      .filter(col("pred_lang") === lang && col("quality") >= minQuality)
      .select(col("doc_id"), col("source"), col("n_tokens"), col("quality"))
  }

  /** Stage-wise curation funnel: doc and token survivor counts through
    * the [[materializeFull]] ship-path — raw → exact-dup keepers →
    * near-dup survivors → language gate → quality gate. The report every
    * training-data pipeline publishes per ingest batch ("how much did
    * each filter cost us"), and the first thing checked when a corpus
    * shrinks unexpectedly.
    *
    * Shape: ONE enrichment scan computes per-doc flags for every stage
    * (the dedup stages join as doc_id sets, same as the ship-path), a
    * single-row conditional aggregate counts all five stages at once —
    * cumulative filters, so each stage's count is the size the corpus
    * would have after running the pipeline that far — and `stack`
    * unpivots the 1-row result; no per-stage corpus rescans.
    */
  def curationFunnel(docs: DataFrame, minQuality: Double, lang: String,
      nearThreshold: Double): DataFrame =
    curationFunnelOf(docs, Dedup.minhashLsh(docs, nearThreshold),
      minQuality, lang)

  /** [[curationFunnel]] over a precomputed verified near-dup pair table. */
  def curationFunnelOf(docs: DataFrame, nearPairs: DataFrame,
      minQuality: Double, lang: String): DataFrame = {
    val keepers = Dedup.exact(docs)
      .select(col("keeper").as("doc_id"), lit(true).as("is_keeper"))
    val nearDrop = nearPairs
      .select(col("doc_b").as("doc_id")).distinct()
      .withColumn("near_dropped", lit(true))
    val flagged = graft.core.Tables.spread(docs.select(col("doc_id"), col("text")))
      .transform(TextAnalysis.withQuality)
      .transform(TextAnalysis.withLangId)
      .join(keepers, Seq("doc_id"), "left")
      .join(nearDrop, Seq("doc_id"), "left")
      .select(col("n_tokens").cast("long").as("n_tokens"),
        coalesce(col("is_keeper"), lit(false)).as("k"),
        col("near_dropped").isNull.as("nd"),
        (col("pred_lang") === lang).as("lg"),
        (col("quality") >= minQuality).as("q"))
    def cnt(c: Column) = sum(when(c, 1L).otherwise(0L))
    def tok(c: Column) = coalesce(sum(when(c, col("n_tokens"))), lit(0L))
    flagged.agg(
      count(lit(1)).as("d0"), coalesce(sum(col("n_tokens")), lit(0L)).as("t0"),
      cnt(col("k")).as("d1"), tok(col("k")).as("t1"),
      cnt(col("k") && col("nd")).as("d2"), tok(col("k") && col("nd")).as("t2"),
      cnt(col("k") && col("nd") && col("lg")).as("d3"),
      tok(col("k") && col("nd") && col("lg")).as("t3"),
      cnt(col("k") && col("nd") && col("lg") && col("q")).as("d4"),
      tok(col("k") && col("nd") && col("lg") && col("q")).as("t4"))
      .select(expr("""stack(5,
          0, 'raw',          d0, t0,
          1, 'exact_dedup',  d1, t1,
          2, 'near_dedup',   d2, t2,
          3, 'lang',         d3, t3,
          4, 'quality',      d4, t4) AS (stage_ord, stage, n_docs, n_tokens)"""))
  }

  /** Per-(source, lang) corpus report: doc/char volume, mean quality, and
    * exact-duplicate rate — the health dashboard a curation pipeline
    * publishes per ingest batch. One scan + one aggregation; the mean
    * quality is averaged via a fixed-point integer sum (quality is
    * 4-decimal, so ×10⁴ is exact) because a plain double sum is
    * partition-order-dependent and would not reproduce across engines or
    * cluster layouts.
    */
  def corpusStats(docs: DataFrame): DataFrame = {
    val rd4 = graft.functions.Hashing.rd4 _
    docs
      .transform(TextAnalysis.withQuality)
      .groupBy(col("source"), col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("n_chars_total"),
        sum(floor(col("quality") * 10000.0 + 0.5).cast("long")).as("q4"),
        countDistinct(md5(col("text"))).as("n_unique"))
      .select(col("source"), col("lang"), col("n_docs"), col("n_chars_total"),
        rd4(col("q4") / 10000.0 / col("n_docs")).as("avg_quality"),
        rd4((col("n_docs") - col("n_unique")) / col("n_docs")).as("dup_rate"))
  }
}
