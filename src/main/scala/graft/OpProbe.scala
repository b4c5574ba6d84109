package graft

import org.apache.spark.sql.SparkSession

/** Diagnostic (NOT driver-facing): time named SparkEntry queries with
  * repeats after the standard prewarm — the per-operator A/B harness for
  * optimization work. Bench.scala stays the frozen measurement.
  *
  *   SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=32 \
  *     sbt "runMain graft.OpProbe <reps> <query> [query...]"
  */
object OpProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = args.headOption.map(_.toInt).getOrElse(3)
    val names = args.drop(1).toSeq
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val tw0 = System.nanoTime()
    SparkEntry.prewarm(spark, sfDir)
    println(f"[probe] prewarm: ${(System.nanoTime() - tw0) / 1e9}%.3fs")
    for (name <- names) {
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query $name"))
      for (t <- 1 to reps) {
        spark.sparkContext.setJobDescription(s"$name t$t")
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        val tMid = System.nanoTime()
        val n = df.count()
        val tEnd = System.nanoTime()
        println(f"[probe] $name t$t: ${(tEnd - t0) / 1e9}%.3fs " +
          f"(construct ${(tMid - t0) / 1e9}%.3fs, count ${(tEnd - tMid) / 1e9}%.3fs) rows=$n")
      }
    }
    spark.stop()
  }
}
