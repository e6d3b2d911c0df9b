package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.StreamingTracker
import graft.streaming.StreamingTracker.{Latest, Point}

class StreamingSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("streaming track: windowed rollup aggregation over a memory stream") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val input = MemoryStream[Point]
    val agg = StreamingTracker.trackStream(input.toDF(), "1 hour", "2 hours")
    val q = agg.writeStream.format("memory").queryName("tracked")
      .outputMode(OutputMode.Complete).start()
    try {
      input.addData(
        Point("cpu", "h1", ts("2024-01-01 10:05:00"), 10.0),
        Point("cpu", "h1", ts("2024-01-01 10:50:00"), 5.0),
        Point("cpu", "h2", ts("2024-01-01 11:10:00"), 2.0))
      q.processAllAvailable()
      val rows = spark.table("tracked").collect()
      assert(rows.length == 2)
      val h1 = rows.find(_.getAs[String]("f2") == "h1").get
      assert(h1.getAs[Double]("total") == 15.0 && h1.getAs[Long]("cnt") == 2L)
      assert(h1.getAs[Timestamp]("bucket") == ts("2024-01-01 10:00:00"))
    } finally q.stop()
  }

  test("latestPerSeries keeps the newest point via mapGroupsWithState") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val input = MemoryStream[Point]
    val latest = StreamingTracker.latestPerSeries(spark, input.toDS())
    val q = latest.writeStream.format("memory").queryName("latest")
      .outputMode(OutputMode.Update).start()
    try {
      input.addData(Point("cpu", "h1", ts("2024-01-01 10:00:00"), 1.0))
      q.processAllAvailable()
      // older point arrives late — state must not regress
      input.addData(Point("cpu", "h1", ts("2024-01-01 09:00:00"), 99.0))
      q.processAllAvailable()
      val rows = spark.table("latest").as[Latest].collect()
      val last = rows.maxBy(_.ts.getTime)
      assert(last.value == 1.0 && last.ts == ts("2024-01-01 10:00:00"))
    } finally q.stop()
  }
}
