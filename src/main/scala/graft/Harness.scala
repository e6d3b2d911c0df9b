package graft

import org.apache.spark.sql.SparkSession

/** Shared plumbing for the runMain scale/timing harnesses: ONE place for
  * the local[32] session shape and the stage timer, so a protocol change
  * (shuffle width, a new config knob, timer format) cannot silently
  * drift between harnesses.
  */
object Harness {

  /** The standard harness session: local[32], 32 shuffle partitions, UI
    * off, ERROR-only logs; `extra` appends/overrides per-harness config.
    */
  def session(extra: (String, String)*): SparkSession = {
    val b = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
    val s = extra.foldLeft(b)((bb, kv) => bb.config(kv._1, kv._2)).getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    // getOrCreate silently ignores builder configs when a SparkSession
    // already exists in the JVM; re-apply runtime-settable extras and fail
    // LOUDLY on static ones, so a harness premise (AQE off, broadcast
    // disabled, …) surfaces here instead of as a confusing downstream
    // require() against a stale session.
    extra.foreach { case (k, v) =>
      if (!s.conf.getOption(k).contains(v)) {
        if (s.conf.isModifiable(k)) s.conf.set(k, v)
        else throw new IllegalStateException(
          s"Harness.session: pre-existing SparkSession pins static conf $k=" +
            s"${s.conf.getOption(k).getOrElse("<unset>")} (wanted '$v'); " +
            "stop the existing session before this harness")
      }
    }
    s
  }

  /** Print the wall time of a stage and pass its result through. */
  def timed[T](name: String)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.1f s"); r
  }
}
