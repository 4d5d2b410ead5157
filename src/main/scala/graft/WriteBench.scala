package graft

import org.apache.spark.sql.functions._

/** Write-path benchmark main — the last mile the query benches never
  * time: materializing a curated corpus as hive-partitioned training
  * shards (the scale analog of the reference's `outputfileNN` final
  * sink, `mapreduce/manager/__main__.py:246-251` — exactly N output
  * partitions, loader-recomputable assignment).
  *
  * Methodology: documents is read and counted once untimed (footers,
  * page cache, codegen), then ONE timed Layout.writeShards call —
  * shard assignment + hash exchange + 16-way partitioned parquet
  * write. The timer covers the whole write job (returns after commit);
  * rows/s and bytes/s are computed from the re-read and the on-disk
  * footprint. Prints ONE JSON line; PERF.md records the sf0.1/sf1
  * numbers.
  */
object WriteBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Engine.session("writebench")
    val out = s"${System.getProperty("java.io.tmpdir")}/graft_writebench"
    Engine.deleteRecursively(new java.io.File(out))

    val docs = Engine.table(spark, sfDir, "documents")
    val rows = docs.count() // untimed warmup: scan + footers + codegen

    val t0 = System.nanoTime()
    val back = operators.Layout.writeShards(spark, docs, out, col("doc_id"), 16)
    val secs = (System.nanoTime() - t0) / 1e9

    // verify before reporting: complete re-read, all 16 shard dirs
    val reread = back.count()
    require(reread == rows, s"re-read $reread rows, wrote $rows")
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles.toSeq.flatMap(walk) else Seq(f)
    val parts = walk(new java.io.File(out)).filter(_.getName.endsWith(".parquet"))
    val shardDirs = new java.io.File(out).listFiles.count(_.getName.startsWith("shard="))
    require(shardDirs == 16, s"expected 16 shard dirs, found $shardDirs")
    val bytes = parts.map(_.length).sum

    def fmt(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    println(
      s"""{"metric":"shard_write","unit":"sec","value":${fmt(secs)},"rows":$rows,""" +
        s""""files":${parts.size},"bytes":$bytes,"rows_per_sec":${(rows / secs).toLong},""" +
        s""""mb_per_sec":${fmt(bytes / secs / 1e6)},"sf":"$sfDir"}""")
    spark.stop()
  }
}
