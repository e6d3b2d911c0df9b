package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet-persisted MinHash-LSH index for continuous corpus ingestion —
  * the dedup analog of the reference's epoch append path (kadiyadb keeps
  * appending epochs to a standing store rather than rebuilding it;
  * /root/reference/epoch/epoch.go). The store holds:
  *
  *   - `bands/`: the corpus's LSH band rows (doc_id, band, key) —
  *     O(|corpus| · bands) 3-column rows, the only thing a batch
  *     decision joins against;
  *   - `docs/`: (doc_id, text) for the exact-Jaccard verify fetch —
  *     read ONLY for docs that actually appear as candidates (a
  *     semi-join; typically a vanishing fraction of the corpus).
  *
  * [[ingest]] is the continuous loop: decide an arriving batch against
  * the persisted state with zero corpus re-scan, then append the
  * survivors' bands and texts. At cluster scale, bucket `bands/` by
  * (band, key) (saveAsTable bucketing) so batch decisions co-locate
  * without a corpus-side shuffle; appends stay small per-batch deltas.
  * Re-delivered batches (at-least-once schedulers) should guard the
  * append with a batch-id marker, exactly as
  * [[graft.streaming.StreamingTracker.commitBatch]] does for metric
  * segments.
  */
final class LshIndexStore(spark: SparkSession, path: String) {
  import LshIndexStore.NoveltyShingleN

  private val bandsDir = s"$path/bands"
  private val docsDir = s"$path/docs"
  private val typesDir = s"$path/shingle_types"

  /** Build (or replace) the store from a standing corpus. */
  def build(corpus: DataFrame): Unit = {
    corpus.select(col("doc_id"), col("text"))
      .write.mode("overwrite").parquet(docsDir)
    Dedup.lshIndex(corpus).write.mode("overwrite").parquet(bandsDir)
    Dedup.shingles(corpus, NoveltyShingleN).select(col("shingle")).distinct()
      .write.mode("overwrite").parquet(typesDir)
  }

  /** The persisted band index. */
  def bands: DataFrame = spark.read.parquet(bandsDir)

  /** The persisted (doc_id, text) verify-fetch table. */
  def docs: DataFrame = spark.read.parquet(docsDir)

  /** The persisted distinct shingle-type table (the store's "content
    * already seen" set, over the stored docs).
    */
  def shingleTypes: DataFrame = spark.read.parquet(typesDir)

  /** Batch content-novelty against the persisted type set: one row with
    * the batch's distinct [[NoveltyShingleN]]-gram type count, how many
    * the store has never seen, and their ratio — the continuous-ingest
    * twin of [[Dedup.ngramNoveltyOf]]'s decile curve, and the signal a
    * crawl scheduler reads to stop a saturated feed. The batch side is
    * distinct-reduced before the join (batch-sized); the store side is a
    * single-column parquet scan — at cluster scale, bucket
    * `shingle_types/` by shingle so the anti-lookup co-locates without
    * shuffling the store (the same posture as the `bands/` join).
    */
  def noveltyOf(batch: DataFrame): DataFrame = {
    val bt = Dedup.shinglesSmall(batch, NoveltyShingleN)
      .select(col("shingle")).distinct()
    bt.join(shingleTypes.select(col("shingle"), lit(1).as("seen")),
        Seq("shingle"), "left")
      .agg(count(lit(1)).as("n_types"),
        sum(when(col("seen").isNull, 1L).otherwise(0L)).as("n_new_types"))
      .select(col("n_types"), col("n_new_types"),
        graft.functions.Hashing.rd4(
          col("n_new_types") / col("n_types")).as("novelty"))
  }

  /** Decide a batch against the persisted index: one row per batch doc,
    * `dup_of` = smallest near-dup partner (NULL → survivor). The corpus
    * contributes its band index and a candidate semi-join text fetch —
    * never a corpus-wide shingle re-scan (LshIndexStoreSpec asserts the
    * store's docs scan emits only the touched rows).
    */
  def decide(batch: DataFrame, threshold: Double): DataFrame =
    Dedup.incrementalDedupFromIndex(bands, docs, batch, threshold)

  /** One continuous-ingestion step: decide the batch, then append the
    * survivors' texts and band rows so the NEXT batch is deduped against
    * them too. Decisions are frozen (eager localCheckpoint) before any
    * append, so a batch never sees its own writes; texts append before
    * bands so a crash between the two leaves only an unreferenced text,
    * never a band row whose verify fetch would silently miss.
    */
  def ingest(batch: DataFrame, threshold: Double): DataFrame = {
    val decided = decide(batch, threshold).localCheckpoint()
    val survivors = batch
      .join(decided.filter(col("dup_of").isNull).select(col("doc_id")),
        Seq("doc_id"), "left_semi")
      .select(col("doc_id"), col("text"))
      .localCheckpoint() // one batch scan feeds both appends
    survivors.write.mode("append").parquet(docsDir)
    Dedup.lshIndex(survivors).write.mode("append").parquet(bandsDir)
    appendTypes(survivors)
    decided
  }

  /** Fold a batch's unseen shingle types into the persisted type set —
    * an anti-join delta append, so the table stays distinct without ever
    * being rewritten.
    */
  def appendTypes(batch: DataFrame): Unit =
    Dedup.shinglesSmall(batch, NoveltyShingleN)
      .select(col("shingle")).distinct()
      .join(shingleTypes, Seq("shingle"), "left_anti")
      .write.mode("append").parquet(typesDir)
}

object LshIndexStore {
  /** Shingle width of the persisted novelty type set — the 8-gram
    * contamination/novelty granularity used across the batch operators.
    */
  val NoveltyShingleN = 8
}
