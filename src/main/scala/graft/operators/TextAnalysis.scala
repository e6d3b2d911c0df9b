package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines, over `documents`.
  * All pure builtin expressions (whole-stage codegen, no UDFs); every
  * pseudo-random choice is md5-derived so the DuckDB oracle can replicate
  * it exactly (see graft.functions.Hashing).
  */
object TextAnalysis {

  /** Whitespace token array. */
  def tokens(text: Column): Column = split(text, "\\s+")

  /** Token counting: whitespace tokens + a BPE-ish regex sub-token count. */
  def tokenCounts(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      size(tokens(col("text"))).as("n_ws_tokens"),
      regexp_count(col("text"), lit("[a-z]+|[0-9]|[^a-z0-9\\s]")).as("n_bpe_tokens"))

  /** Add quality columns (n_tokens, punct_ratio, stop_ratio, quality) to
    * a frame with a `text` column — a pure projection, so pipelines can
    * fuse it with other per-doc transforms in a single scan.
    * All inputs are integer counts, so the double math is bit-identical
    * across engines.
    */
  def withQuality(docs: DataFrame): DataFrame = {
    val tk = tokens(col("text"))
    val nTok = size(tk).cast("double")
    val nChars = length(col("text")).cast("double")
    val punct = regexp_count(col("text"), lit("[^a-z0-9\\s]")).cast("double")
    val stops = expr(
      "size(filter(split(text, '\\\\s+'), x -> x IN ('the','a','of','and','to','in','is')))")
      .cast("double")
    docs
      .withColumn("n_tokens", size(tk))
      .withColumn("punct_ratio", graft.functions.Hashing.rd4(punct / nChars))
      .withColumn("stop_ratio", graft.functions.Hashing.rd4(stops / nTok))
      .withColumn("quality", graft.functions.Hashing.rd4(
        least(lit(1.0), nTok / 100.0) * 0.4 +
          (lit(1.0) - punct / nChars) * 0.3 +
          least(lit(1.0), stops * 5.0 / nTok) * 0.3))
  }

  /** Quality scoring: length, punctuation ratio, stopword ratio composite. */
  def quality(docs: DataFrame): DataFrame =
    withQuality(docs).select(col("doc_id"), col("n_tokens"),
      col("punct_ratio"), col("stop_ratio"), col("quality"))

  /** Add marker-word counts + `pred_lang` — pure projection twin of
    * [[langId]], fusable into a single scan.
    */
  def withLangId(docs: DataFrame): DataFrame = {
    def cnt(w: String) = expr(s"size(filter(split(text, '\\\\s+'), x -> x = '$w'))")
    docs
      .withColumn("c_en", cnt("the")).withColumn("c_de", cnt("der"))
      .withColumn("c_es", cnt("el")).withColumn("c_fr", cnt("le"))
      .withColumn("pred_lang",
        when(col("c_en") > 0 && col("c_en") >= greatest(col("c_de"), col("c_es"), col("c_fr")), "en")
          .when(col("c_de") > 0 && col("c_de") >= greatest(col("c_es"), col("c_fr")), "de")
          .when(col("c_es") > 0 && col("c_es") >= col("c_fr"), "es")
          .when(col("c_fr") > 0, "fr")
          .otherwise("und"))
  }

  /** Language ID: marker-word voting with a deterministic priority order. */
  def langId(docs: DataFrame): DataFrame =
    withLangId(docs).select(col("doc_id"), col("c_en"), col("c_de"),
      col("c_es"), col("c_fr"), col("pred_lang"))

  /** Corpus bigram statistics: top word pairs across the corpus (document
    * frequency + total occurrences) — the distributional profile used for
    * contamination and boilerplate screening.
    */
  def topBigrams(docs: DataFrame, k: Int): DataFrame =
    docs
      .select(col("doc_id"), split(col("text"), "\\s+").as("tk"))
      .select(col("doc_id"), explode(expr(
        """CASE WHEN size(tk) >= 2
                THEN transform(sequence(1, size(tk) - 1), i -> array_join(slice(tk, i, 2), ' '))
                ELSE slice(tk, 1, 0) END""")).as("bigram"))
      .groupBy(col("bigram"))
      .agg(count(lit(1)).as("occurrences"), countDistinct(col("doc_id")).as("doc_freq"))
      .orderBy(col("occurrences").desc, col("bigram"))
      .limit(k)

  /** Deterministic stratified sampling for training-data curation: keep a
    * per-stratum fraction of docs, selected by content hash rather than
    * rand() — reproducible across runs, engines and cluster sizes, and
    * skew-free. rates = stratum → percentage [0,100).
    */
  def sampleStratified(docs: DataFrame, stratum: Column, rates: Map[String, Int],
      default: Int, salt: String): DataFrame = {
    val pct = rates.foldLeft(when(lit(false), lit(default))) {
      case (acc, (k, v)) => acc.when(stratum === k, v)
    }.otherwise(default)
    docs
      .withColumn("__bucket",
        graft.functions.Hashing.h60mod(concat(col("doc_id").cast("string"), lit(salt)), 100L))
      .filter(col("__bucket") < pct)
      .drop("__bucket")
  }

  /** Quality-weighted deterministic sampling: each doc is kept with
    * probability equal to its quality score — higher-quality docs
    * over-represented, selection by content-independent hash so the
    * sample is reproducible across runs, engines and cluster layouts
    * (same property as [[sampleStratified]], continuous rates).
    */
  def sampleWeighted(docs: DataFrame, salt: String): DataFrame =
    withQuality(docs)
      .filter(graft.functions.Hashing.h60mod(
          concat(col("doc_id").cast("string"), lit(salt)), 10000L)
        < col("quality") * 10000.0)
      .select(col("doc_id"), col("lang"), col("source"), col("quality"))

  /** Document fingerprint: rolling polynomial hash over the token stream
    * (order-sensitive, multiplicity-sensitive).
    */
  def fingerprint(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      expr(
        """aggregate(
             transform(split(text, '\\s+'),
                       x -> CAST(conv(substring(md5(x), 1, 15), 16, 10) AS BIGINT) % 1000003),
             0L, (acc, x) -> (acc * 31 + x) % 2147483647)""").as("fingerprint"))
}
