package graft.operators

import org.apache.spark.sql.DataFrame
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
    */
  def materialize(docs: DataFrame, minQuality: Double, lang: String): DataFrame = {
    val keepers = Dedup.exact(docs).select(col("keeper").as("doc_id"))
    docs
      .join(keepers, Seq("doc_id"), "left_semi")
      .transform(TextAnalysis.withQuality)
      .transform(TextAnalysis.withLangId)
      .filter(col("pred_lang") === lang && col("quality") >= minQuality)
      .select(col("doc_id"), col("source"), col("n_tokens"), col("quality"))
  }
}
