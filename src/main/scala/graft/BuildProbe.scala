package graft

import org.apache.spark.sql.SparkSession

/** Diagnostic (NOT driver-facing): time the ScalingBench-shaped corpus
  * build (nShards=32) at an arbitrary core count, twice in one JVM —
  * isolates cold-JVM vs warm build cost per parallelism level.
  *
  *   sbt "runMain graft.BuildProbe <cores> <nFiles> [reps]"
  */
object BuildProbe {
  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val nFiles = args(1).toLong
    val reps = if (args.length > 2) args(2).toInt else 2
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores * 2)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val corpus = graft.sources.CorpusGen.withDocId(
      graft.sources.CorpusGen.generate(spark, nFiles, cores * 2))
    for (t <- 1 to reps) {
      val dir = java.nio.file.Files.createTempDirectory(s"bp$cores-$t").toString
      val t0 = System.nanoTime()
      graft.build.IndexBuilder.build(spark, corpus, "doc_id", "content", dir,
        graft.build.IndexBuilder.Params(nShards = 32, tokenizer = "code"))
      println(f"[buildprobe] cores=$cores files=$nFiles t$t: ${(System.nanoTime() - t0) / 1e9}%.1fs")
    }
    spark.stop()
  }
}
