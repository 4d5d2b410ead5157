package graft.mr

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Standalone driver for the generic MapReduce path: runs the reference's
  * own executables (word count + grep) over its test corpus through
  * graft.mr.MapReduceJob and checks sorted-line equality against the
  * golden outputs (`tests/testdata/correct/` txt files) — the same contract as
  * the reference's integration tests (`tests/test_integration_0{1,2}.py`).
  *
  * Usage: runMain graft.mr.MRDemo [referenceRoot] [outRoot]
  */
object MRDemo {
  def main(args: Array[String]): Unit = {
    val ref = if (args.length > 0) args(0) else "/root/reference"
    val out = if (args.length > 1) args(1) else Files.createTempDirectory("graft-mrdemo-").toString
    val spark = graft.Engine.session("mr-demo")

    def sortedLines(paths: Seq[java.nio.file.Path]): Seq[String] =
      paths
        .flatMap(p => Files.readAllLines(p).asScala)
        .sorted(MapReduceJob.utf8Ordering)

    def check(name: String, outFiles: Seq[java.io.File], golden: String): Unit = {
      val got = sortedLines(outFiles.map(_.toPath))
      val want = sortedLines(Seq(Paths.get(golden)))
      val ok = got == want
      println(s"[$name] files=${outFiles.length} lines=${got.length} golden=${want.length} match=$ok")
      if (!ok) {
        val diffs = got.zipAll(want, "<missing>", "<missing>").filter { case (a, b) => a != b }
        println(s"[$name] first diffs: ${diffs.take(5)}")
        sys.exit(1)
      }
    }

    val wc = MapReduceJob.run(
      spark,
      JobSpec(
        inputDir = s"$ref/tests/testdata/input",
        outputDir = s"$out/wc",
        mapperCmd = s"$ref/tests/testdata/exec/wc_map.sh",
        reducerCmd = s"$ref/tests/testdata/exec/wc_reduce.sh",
        numMappers = 2,
        numReducers = 2
      )
    )
    check("wordcount", wc, s"$ref/tests/testdata/correct/word_count_correct.txt")

    val grep = MapReduceJob.run(
      spark,
      JobSpec(
        inputDir = s"$ref/tests/testdata/input",
        outputDir = s"$out/grep",
        mapperCmd = s"python3 $ref/tests/testdata/exec/grep_map.py",
        reducerCmd = s"python3 $ref/tests/testdata/exec/grep_reduce.py",
        numMappers = 4,
        numReducers = 1
      )
    )
    check("grep", grep, s"$ref/tests/testdata/correct/grep_correct.txt")

    // parity mode: distinct-key-rank round-robin partitioning
    val wcParity = MapReduceJob.run(
      spark,
      JobSpec(
        inputDir = s"$ref/tests/testdata/input",
        outputDir = s"$out/wc_parity",
        mapperCmd = s"$ref/tests/testdata/exec/wc_map.sh",
        reducerCmd = s"$ref/tests/testdata/exec/wc_reduce.sh",
        numMappers = 2,
        numReducers = 2,
        parityPartitioning = true
      )
    )
    check("wordcount-parity", wcParity, s"$ref/tests/testdata/correct/word_count_correct.txt")

    println(s"MRDemo OK -> $out")
    spark.stop()
  }
}
