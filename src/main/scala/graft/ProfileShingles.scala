package graft
import org.apache.spark.sql.functions._

/** Scratch A/B: legacy builtin shingle chain vs the native ShinglesExpr,
  * isolated through the noop sink (guide §1.4 — count() would let the
  * optimizer prune the hash projection and time the wrong thing).
  */
object ProfileShingles {
  def main(args: Array[String]): Unit = {
    val spark = Harness.session("spark.sql.session.timeZone" -> "UTC")
    val docs = graft.core.Tables.load(spark, "/root/testdata/sf0.1", "documents")
      .select(col("doc_id"), col("text"))
    def legacy(n: Int) = docs
      .select(col("doc_id"), split(col("text"), "\\s+").as("tk"))
      .select(col("doc_id"), explode(expr(
        s"""array_distinct(
              CASE WHEN size(tk) >= $n
                   THEN transform(sequence(1, size(tk) - ${n - 1}),
                                  i -> array_join(slice(tk, i, $n), ' '))
                   ELSE slice(tk, 1, 0) END)""")).as("sg"))
      .select(col("doc_id"), graft.functions.Hashing.h60(col("sg")).as("shingle"))
    def native(n: Int) = docs.select(col("doc_id"),
      explode(graft.functions.ShinglesExpr.hashes(col("text"), n)).as("shingle"))
    def bench(name: String, df: => org.apache.spark.sql.DataFrame): Unit = {
      df.write.format("noop").mode("overwrite").save() // warm
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"NOOP $name min=${ts.min}%.2f passes=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    bench("legacy n=3", legacy(3))
    bench("native n=3", native(3))
    // stacked: the shared-view build chain over each shingle source
    def sigs(sh: org.apache.spark.sql.DataFrame) = {
      val P = graft.operators.Dedup.P
      val hashed = sh.withColumn("hm", col("shingle") % P)
      val aggs = graft.operators.Dedup.minhashPerms.zipWithIndex.map { case ((a, b), j) =>
        min((col("hm") * a + b) % P).as(s"mh$j") }
      hashed.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
    }
    bench("legacy sigs", sigs(legacy(3)))
    bench("native sigs", sigs(native(3)))
    bench("legacy jacc", graft.operators.Dedup.ngramJaccardOf(legacy(3), 0.2))
    bench("native jacc", graft.operators.Dedup.ngramJaccardOf(native(3), 0.2))
    // full sharedPairs-equivalent chain, checkpoint included, interleaved
    def chain(sh0: org.apache.spark.sql.DataFrame): Long = {
      val sh = sh0.localCheckpoint()
      val sg = graft.operators.Dedup.minhashSignaturesFrom(sh).localCheckpoint()
      val r = graft.operators.Dedup.minhashLshOf(sh, sg, 0.2).count()
      spark.catalog.clearCache()
      r
    }
    for (round <- 1 to 3) {
      val t0 = System.nanoTime(); val nl = chain(legacy(3))
      val t1 = System.nanoTime(); val nn = chain(native(3))
      val t2 = System.nanoTime()
      println(f"CHAIN round=$round legacy=${(t1 - t0) / 1e9}%.2f native=${(t2 - t1) / 1e9}%.2f rows=$nl/$nn")
    }
    spark.stop()
  }
}
