package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthetic source-code corpus with the north-rule input
  * shape: (repo, path, commit, lang, content). No external data, no RNG —
  * every row is a pure function of its row index, so regeneration is
  * byte-identical (the per-row sha256(content) invariant holds across
  * runs/cluster sizes) and the table scales to any file count by changing
  * one number.
  *
  * Content is code-shaped text with a Zipf-ish vocabulary including
  * heavy head terms (license/return/import/the) to exercise head-term
  * skew — the cardinality profile an index build must survive.
  */
object CorpusGen {

  private val Langs = Array("scala", "java", "c", "py", "go", "sql")
  private val Exts = Map("scala" -> "scala", "java" -> "java", "c" -> "c",
    "py" -> "py", "go" -> "go", "sql" -> "sql")

  // identifier vocabulary: ~220 stems; Zipf rank by position
  private val Vocab: Array[String] = Array(
    "license", "return", "import", "the", "value", "result", "data", "index",
    "count", "size", "name", "type", "node", "list", "key", "map", "string",
    "buffer", "file", "path", "line", "token", "parse", "read", "write",
    "open", "close", "init", "free", "alloc", "copy", "move", "swap", "find",
    "insert", "delete", "update", "merge", "split", "sort", "search", "scan",
    "hash", "tree", "heap", "stack", "queue", "array", "vector", "matrix",
    "row", "column", "table", "schema", "query", "plan", "exec", "eval",
    "bind", "cast", "check", "valid", "error", "warn", "info", "debug",
    "trace", "log", "print", "format", "encode", "decode", "compress",
    "expand", "pack", "unpack", "serialize", "stream", "batch", "chunk",
    "block", "page", "segment", "partition", "shard", "replica", "commit",
    "rollback", "begin", "end", "start", "stop", "run", "wait", "notify",
    "lock", "unlock", "mutex", "atomic", "thread", "process", "worker",
    "task", "job", "stage", "step", "phase", "state", "status", "flag",
    "mode", "option", "config", "param", "arg", "input", "output", "source",
    "target", "dest", "origin", "offset", "length", "width", "height",
    "depth", "level", "rank", "score", "weight", "cost", "time", "date",
    "clock", "timer", "epoch", "span", "range", "bound", "limit", "max",
    "min", "sum", "avg", "mean", "total", "delta", "gap", "diff", "union",
    "intersect", "except", "join", "group", "window", "frame", "cursor",
    "iterator", "next", "prev", "head", "tail", "first", "last", "current",
    "parent", "child", "root", "leaf", "branch", "edge", "vertex", "graph",
    "cycle", "loop", "break", "continue", "yield", "await", "async", "sync",
    "send", "recv", "socket", "channel", "pipe", "signal", "event", "handler",
    "callback", "listener", "observer", "filter", "reduce", "fold", "apply",
    "invoke", "call", "dispatch", "route", "match", "case", "switch", "branch2",
    "test", "assert", "expect", "mock", "stub", "spec", "suite", "fixture",
    "setup", "teardown", "context", "scope", "module", "package", "class",
    "object", "trait", "interface", "struct", "enum", "field", "method",
    "function", "lambda", "closure", "curry", "partial", "compose")

  private val Kw = Map(
    "scala" -> Array("def", "val", "var", "class", "object", "match", "case"),
    "java" -> Array("public", "private", "static", "void", "class", "final", "new"),
    "c" -> Array("static", "void", "int", "char", "struct", "sizeof", "typedef"),
    "py" -> Array("def", "class", "self", "import", "return", "lambda", "yield"),
    "go" -> Array("func", "var", "type", "struct", "interface", "defer", "chan"),
    "sql" -> Array("select", "from", "where", "group", "order", "join", "insert"))

  @inline private def mix(x: Long): Long = {
    var h = x * 0x9E3779B97F4A7C15L
    h ^= (h >>> 32); h *= 0xBF58476D1CE4E5B9L
    h ^= (h >>> 29); h *= 0x94D049BB133111EBL
    h ^= (h >>> 32); h
  }

  /** Zipf-skewed vocab pick: squaring the uniform skews toward rank 0,
    * where the head terms sit.
    */
  @inline private def pick(h: Long): String = {
    val u = ((h >>> 11).toDouble / (1L << 53).toDouble) // [0,1)
    val idx = (u * u * Vocab.length).toInt
    Vocab(math.min(idx, Vocab.length - 1))
  }

  /** Pure function row-index → corpus row. */
  def genRow(i: Long): (String, String, String, String, String) = {
    val h0 = mix(i + 1)
    val lang = Langs((Math.floorMod(h0, Langs.length.toLong)).toInt)
    val repo = f"org/repo-${Math.floorMod(mix(h0 + 1), 997L)}%04d"
    val dir = Vocab((Math.floorMod(mix(h0 + 2), 60L)).toInt + 40)
    val base = Vocab((Math.floorMod(mix(h0 + 3), 120L)).toInt + 60)
    val path = s"src/$dir/$base${Math.floorMod(h0, 97L)}.${Exts(lang)}"
    val commit = f"${mix(h0 + 4)}%016x${mix(h0 + 5)}%016x${(mix(h0 + 6) & 0xffffffffL)}%08x"
    val nTokens = 50 + (Math.floorMod(mix(h0 + 7), 350L)).toInt
    val kws = Kw(lang)
    val sb = new java.lang.StringBuilder(nTokens * 8)
    sb.append("// license header for ").append(repo).append('\n')
    var t = 0
    var h = mix(h0 + 8)
    while (t < nTokens) {
      h = mix(h)
      if (t % 11 == 0) {
        sb.append('\n').append(kws((Math.floorMod(h, kws.length.toLong)).toInt)).append(' ')
      }
      val w = pick(h)
      // camelCase compound identifiers every few tokens
      if (Math.floorMod(h, 5L) == 0L) {
        val w2 = pick(mix(h + 7))
        sb.append(w).append(Character.toUpperCase(w2.charAt(0))).append(w2.substring(1))
      } else sb.append(w)
      sb.append(if (Math.floorMod(h, 7L) == 0L) "(x)" else " ")
      t += 1
    }
    sb.append("\nreturn\n")
    (repo, path, commit, lang, sb.toString)
  }

  /** Corpus as a DataFrame: spark.range → narrow map, no shuffle, scales
    * linearly with partitions.
    */
  def generate(spark: SparkSession, nFiles: Long, partitions: Int): DataFrame = {
    import spark.implicits._
    spark.range(0, nFiles, 1, partitions)
      .map(i => CorpusGen.genRow(i))
      .toDF("repo", "path", "commit", "lang", "content")
  }

  /** Stable docId for the corpus: 64-bit hash of the file identity —
    * matches the builder's expectation of a unique long id.
    */
  def withDocId(df: DataFrame): DataFrame =
    df.withColumn("doc_id", xxhash64(col("repo"), col("path"), col("commit")))
}
