package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.core.Tables

object Profile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    val docs = Tables.load(spark, dir, "documents")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"TIME $name ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    time("shingles count")(println("rows=" + Dedup.shingles(docs).count()))
    time("shingles again")(println("rows=" + Dedup.shingles(docs).count()))
    val sh = Dedup.shingles(docs)
    time("self-join count")(println("pairs=" + sh.as("a").join(sh.as("b"),
      col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id")).count()))
    time("full jaccard")(println("res=" + Dedup.ngramJaccard(docs, 0.6).count()))
    time("minhash sigs")(println("sigs=" + Dedup.minhashSignatures(docs).count()))
    time("full minhashLsh")(println("res=" + Dedup.minhashLsh(docs, 0.5).count()))
    time("simhash fingerprints")(println("fps=" + Dedup.simhashFingerprints(docs).count()))
    time("simhash fingerprints 2nd")(println("fps=" + Dedup.simhashFingerprints(docs).count()))
    time("full simhashPairs")(println("pairs=" + Dedup.simhashPairs(docs, 3).count()))
    time("full simhashPairs 2nd")(println("pairs=" + Dedup.simhashPairs(docs, 3).count()))
    time("contamination")(println("rows=" + Dedup.contamination(docs, col("doc_id") < 50, 8).count()))
    time("contamination 2nd")(println("rows=" + Dedup.contamination(docs, col("doc_id") < 50, 8).count()))
    spark.stop()
  }
}
