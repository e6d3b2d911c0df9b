package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.core.{MetricStore, StoreParams}

class MetricStoreSpec extends SparkSpec {

  private def mkEvents(rows: Seq[(String, String, String, Double)]) = {
    import spark.implicits._
    rows.toDF("ts", "f1", "f2", "value")
      .withColumn("ts", col("ts").cast("timestamp_ntz"))
  }

  test("track → fetch roundtrip merges appended segments (RW+RO epoch read)") {
    val dir = Files.createTempDirectory("graftstore").toString
    val store = new MetricStore(spark, dir)
    store.track(mkEvents(Seq(
      ("2024-01-01 10:05:00", "cpu", "host1", 10.0),
      ("2024-01-01 10:20:00", "cpu", "host2", 4.0))))
    // second append hits the same (cpu, host1, 10:00) bucket — must merge
    store.track(mkEvents(Seq(("2024-01-01 10:45:00", "cpu", "host1", 7.0))))

    val exact = store.fetch("2024-01-01", "2024-01-02", Seq(Some("cpu"), Some("host1"))).collect()
    assert(exact.length == 1)
    assert(exact.head.getAs[Double]("total") == 17.0 && exact.head.getAs[Long]("cnt") == 2L)

    val rollup = store.fetch("2024-01-01", "2024-01-02", Seq(Some("cpu"))).collect()
    assert(rollup.length == 1)
    assert(rollup.head.getAs[Double]("total") == 21.0 && rollup.head.getAs[Long]("cnt") == 3L)

    val wild = store.fetch("2024-01-01", "2024-01-02", Seq(Some("cpu"), None)).collect()
    assert(wild.length == 2)
  }

  test("compact merges an epoch's append segments without changing results") {
    val dir = Files.createTempDirectory("graftstore").toString
    val store = new MetricStore(spark, dir)
    store.track(mkEvents(Seq(("2024-01-01 10:05:00", "cpu", "h1", 10.0))))
    store.track(mkEvents(Seq(("2024-01-01 10:45:00", "cpu", "h1", 7.0))))
    def files() = {
      val d = java.nio.file.Paths.get(dir, "points", "epoch=2024-01-01")
      Files.list(d).filter(_.toString.endsWith(".parquet")).count()
    }
    val before = files()
    store.compact("2024-01-01")
    assert(files() < before)
    val r = store.fetch("2024-01-01", "2024-01-02", Seq(Some("cpu"), Some("h1"))).collect()
    assert(r.length == 1 && r.head.getAs[Double]("total") == 17.0 && r.head.getAs[Long]("cnt") == 2L)
  }

  test("expire drops epoch partitions beyond retention (cache.Expire)") {
    val dir = Files.createTempDirectory("graftstore").toString
    val store = new MetricStore(spark, dir, StoreParams(retentionEpochs = 2))
    store.track(mkEvents(Seq(
      ("2024-01-01 00:00:00", "cpu", "h", 1.0),
      ("2024-01-02 00:00:00", "cpu", "h", 1.0),
      ("2024-01-03 00:00:00", "cpu", "h", 1.0))))
    val dropped = store.expire()
    assert(dropped == Seq("2024-01-01"))
    val left = store.points().select(col("epoch")).distinct().collect()
      .map(_.getString(0)).sorted.toSeq
    assert(left == Seq("2024-01-02", "2024-01-03"))
  }
}
