package graft
import org.apache.spark.sql.functions._

/** Scratch stage-timer for the market-basket plan: times each subtree in
  * isolation at SPARK_GRAFT_SF_DIR so a regression can be blamed on the
  * basket build, the pair aggregate, or the join tail.
  */
object ProfileBasket {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Harness.session("spark.sql.session.timeZone" -> "UTC")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"TIME $name ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    for (pass <- 1 to 3) {
      println(s"--- pass $pass")
      val baskets = li.groupBy(col("l_orderkey"))
        .agg(sort_array(collect_set(col("l_partkey"))).as("parts"))
      time("baskets count")(println(baskets.count()))
      val basketsC = baskets.persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
      time("baskets cache")(println(basketsC.count()))
      val pairs = basketsC
        .select(explode(expr(
          """flatten(transform(parts, (a, i) ->
            |  transform(slice(parts, i + 2, size(parts)),
            |            b -> struct(a AS part_a, b AS part_b))))""".stripMargin)).as("p"))
        .select(col("p.part_a").as("part_a"), col("p.part_b").as("part_b"))
      time("pair explode only")(println(pairs.count()))
      val pc = pairs.groupBy(col("part_a"), col("part_b")).agg(count(lit(1)).as("pair_count"))
        .filter(col("pair_count") >= 2L)
      time("pair agg")(println(pc.count()))
      val marg = basketsC.select(explode(col("parts")).as("k")).groupBy(col("k")).agg(count(lit(1)).as("cnt"))
      time("marginals")(println(marg.count()))
      time("full query")(println(
        graft.operators.Analytics.marketBasket(spark, dir).count()))
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
