package graft.mr

import java.nio.file.{Files, Paths}

/** CLI entry — the reference's `mapreduce-submit` surface
  * (`/root/reference/mapreduce/submit.py:22-96`) without the socket hop:
  * the same flags with the same defaults, or the manager's JSON job
  * message itself (`"message_type": "new_manager_job"`,
  * `mapreduce/submit.py:68-76`) passed as file argument(s). Multiple
  * JSON messages run in argument order — the FIFO queue (O8/S5) —
  * on one embedded session.
  *
  *   sbt "runMain graft.mr.Submit -i in/ -o out/ -m map.sh -r reduce.sh"
  *   sbt "runMain graft.mr.Submit --json job1.json --json job2.json"
  */
object Submit {

  /** Parse the reference's flat job message into a JobSpec. Unknown or
    * missing fields fall back to submit.py's defaults.
    */
  def parseJob(json: String): JobSpec = {
    def str(field: String, default: String): String =
      s""""$field"\\s*:\\s*"((?:[^"\\\\]|\\\\.)*)"""".r
        .findFirstMatchIn(json)
        .map(_.group(1).replace("\\\"", "\"").replace("\\\\", "\\"))
        .getOrElse(default)
    def int(field: String, default: Int): Int =
      s""""$field"\\s*:\\s*(\\d+)""".r
        .findFirstMatchIn(json)
        .map(_.group(1).toInt)
        .getOrElse(default)
    val msgType = str("message_type", "new_manager_job")
    require(
      msgType == "new_manager_job",
      s"Submit handles new_manager_job messages, got '$msgType'"
    )
    JobSpec(
      inputDir = str("input_directory", "tests/testdata/input"),
      outputDir = str("output_directory", "output"),
      mapperCmd = str("mapper_executable", "tests/testdata/exec/wc_map.sh"),
      reducerCmd = str("reducer_executable", "tests/testdata/exec/wc_reduce.sh"),
      numMappers = int("num_mappers", 4),
      numReducers = int("num_reducers", 1)
    )
  }

  /** Parse submit.py's flags (-i/-o/-m/-r/--nmappers/--nreducers) plus
    * `--json <file>` for raw job messages. Flags and JSON files may mix;
    * each --json is its own queued job, and if any flags are present
    * they form one more job (queued last).
    */
  def parseArgs(args: Seq[String]): Seq[JobSpec] = {
    var in = "tests/testdata/input"
    var out = "output"
    var mapper = "tests/testdata/exec/wc_map.sh"
    var reducer = "tests/testdata/exec/wc_reduce.sh"
    var nm = 4
    var nr = 1
    var sawFlag = false
    val jsonJobs = scala.collection.mutable.ArrayBuffer.empty[JobSpec]
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "--json" =>
          jsonJobs += parseJob(Files.readString(Paths.get(args(i + 1)))); i += 2
        case "-i" | "--input" => in = args(i + 1); sawFlag = true; i += 2
        case "-o" | "--output" => out = args(i + 1); sawFlag = true; i += 2
        case "-m" | "--mapper" => mapper = args(i + 1); sawFlag = true; i += 2
        case "-r" | "--reducer" => reducer = args(i + 1); sawFlag = true; i += 2
        case "--nmappers" => nm = args(i + 1).toInt; sawFlag = true; i += 2
        case "--nreducers" => nr = args(i + 1).toInt; sawFlag = true; i += 2
        case other => throw new IllegalArgumentException(s"unknown argument: $other")
      }
    }
    jsonJobs.toSeq ++ (if (sawFlag || jsonJobs.isEmpty)
                         Seq(JobSpec(in, out, mapper, reducer, nm, nr))
                       else Seq.empty)
  }

  def main(args: Array[String]): Unit = {
    val jobs = parseArgs(args.toSeq)
    val spark = graft.Engine.session("submit")
    try jobs.foreach { spec =>
      val files = MapReduceJob.run(spark, spec)
      println(s"job done: ${spec.inputDir} -> ${spec.outputDir} (${files.length} output files)")
    } finally spark.stop()
  }
}
