package graft.mr

import graft.{Engine, QueryDef}
import org.apache.spark.sql.functions._

/** Driver-registry entries exercising the generic external-executable
  * operator (reference O1, `mapreduce/worker/__main__.py:55-87`) against
  * the typed tables: documents.text is piped through real shell
  * processes (`rdd.pipe`-style, one process per partition), then
  * aggregated natively. The oracle reproduces the pipeline in SQL.
  *
  * Scale note: pipe runs one process per partition with streamed
  * stdin/stdout — constant memory, parallelism = partitions; this is
  * exactly Hadoop-streaming's model and survives arbitrary input sizes.
  */
object PipeOps {

  val entries: Seq[QueryDef] = Seq(
    QueryDef(
      "q80_pipe_wordcount",
      (s, dir) => {
        import s.implicits._
        val lines = Engine.table(s, dir, "documents").select(col("text")).as[String].rdd
        // the wc_map.sh pipeline minus awk: tokenize + lowercase in coreutils
        val piped = lines.pipe(Seq("/bin/sh", "-c", "tr ' \\t' '\\n' | tr '[:upper:]' '[:lower:]'"))
        piped
          .toDF("word")
          .filter(length(col("word")) > 0)
          .groupBy(col("word"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("word"))
      },
      Some("""SELECT word, count(*) AS n FROM (
               SELECT unnest(string_split_regex(lower(text), '[ \t]')) AS word FROM documents) t
             WHERE length(word) > 0 GROUP BY word ORDER BY word""")
    )
  )
}
