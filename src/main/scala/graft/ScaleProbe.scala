package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sources.CorpusGen
import graft.build.IndexBuilder
import graft.core.PositionCodec
object ScaleProbe {
  def phase(name: String)(f: => Unit): Unit = {
    val t0 = System.nanoTime(); f
    println(f"[probe] $name: ${(System.nanoTime()-t0)/1e9}%.1fs")
  }
  def runAt(cores: Int, n: Long): Unit = {
    val spark = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    println(s"=== cores=$cores n=$n ===")
    val corpus = CorpusGen.withDocId(CorpusGen.generate(spark, n, cores*2))
    phase("gen+count")(corpus.count())
    val tokUdf = udf { (text: String) =>
      val occs = IndexBuilder.tokenizerFn("code")(text)
      occs.map(o => (o.term, o.tf))
    }
    phase("tokenize+agg")(
      corpus.select(explode(tokUdf(col("content"))).as("e")).agg(count(lit(1))).collect())
    val tokUdf2 = udf { (text: String) =>
      val occs = IndexBuilder.tokenizerFn("code")(text)
      var len = 0; var i = 0
      while (i < occs.length) { len += occs(i).tf; i += 1 }
      occs.map { o =>
        val (cp, cw) = PositionCodec.cap(o.positions, o.wclasses)
        graft.build.TermEntry(o.term, o.tf, len, PositionCodec.encode(cp, cw), -1)
      }
    }
    val exploded = corpus
      .withColumn("shard", pmod(xxhash64(col("doc_id")), lit(32)).cast("int"))
      .select(col("shard"), col("doc_id").as("docId"), lit(0L).as("addon"),
        explode(tokUdf2(col("content"))).as("e"))
      .select(col("shard"), col("e.term"), col("docId"), col("e.tf"), col("e.len"), col("e.pos"), col("addon"))
    phase("shuffle+sort")(
      exploded.repartitionByRange(cores, col("shard"), col("term"), col("docId"))
        .sortWithinPartitions("shard","term","docId").write.format("noop").mode("overwrite").save())
    val dir0 = java.nio.file.Files.createTempDirectory(s"spw$cores").toString
    phase("shuffle+sort+parquet")(
      exploded.repartitionByRange(cores, col("shard"), col("term"), col("docId"))
        .sortWithinPartitions("shard","term","docId").write.mode("overwrite").parquet(dir0))
    val dir = java.nio.file.Files.createTempDirectory(s"sp$cores").toString
    phase("full build")(
      IndexBuilder.build(spark, corpus, "doc_id", "content", dir,
        IndexBuilder.Params(nShards = 32, tokenizer = "code")))
    spark.stop()
  }
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 100000L
    val cores = if (args.length > 1) args.drop(1).map(_.toInt).toSeq else Seq(8, 32)
    cores.foreach(c => runAt(c, n))
  }
}
