package graft.mr

import java.io.{BufferedReader, File, InputStreamReader}
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files

/** External-executable plumbing mirroring the reference worker's
  * invocation contract (`/root/reference/mapreduce/worker/__main__.py:75-77`):
  * `subprocess.run([executable, file], shell=True, stdin=file)`. With
  * `shell=True` + a list, Python runs `sh -c <executable> <file>` — the
  * file lands in the shell's `$0`, NOT in the executable's argv, so
  * executables read ONLY stdin (that is why grep_map.py falls back to
  * its default query). We reproduce that exactly: `sh -c cmd $0=file`
  * with stdin redirected from the file.
  */
object Pipes {

  /** Run `sh -c cmd` with `$0` = file and stdin redirected from the
    * file; stream stdout lines. Map stage: one process per input file.
    */
  def pipeFile(cmd: String, file: String): Iterator[String] = {
    val pb = new ProcessBuilder("/bin/sh", "-c", cmd, file)
    pb.redirectInput(new File(file))
    // Inherit stderr like the reference (subprocess.run without
    // stderr=PIPE): a chatty executable can never fill an undrained pipe
    // buffer and deadlock the task.
    pb.redirectError(ProcessBuilder.Redirect.INHERIT)
    streamOutput(pb.start(), cmd, cleanup = None)
  }

  /** Run a partition's lines through `cmd`: spill the iterator to a temp
    * file (bounded memory — the partition may not fit in RAM), then
    * invoke exactly like pipeFile. Reduce stage: one process per sorted
    * partition (= the reference's reduceNN file).
    */
  def pipePartition(cmd: String, lines: Iterator[String]): Iterator[String] = {
    val tmp = Files.createTempFile("graft-reduce-", ".txt")
    val w = Files.newBufferedWriter(tmp, UTF_8)
    try {
      lines.foreach { l => w.write(l); w.write('\n') }
    } finally w.close()
    val pb = new ProcessBuilder("/bin/sh", "-c", cmd, tmp.toString)
    pb.redirectInput(tmp.toFile)
    pb.redirectError(ProcessBuilder.Redirect.INHERIT)
    streamOutput(pb.start(), cmd, cleanup = Some(() => Files.deleteIfExists(tmp)))
  }

  /** Lazily stream a process's stdout as lines; on exhaustion wait for
    * exit, fail the task on non-zero status (Spark's task retry then
    * gives the reference's "re-queue on failure" semantics for free).
    * If the consumer stops early (limit/take), the task-completion
    * listener destroys the process so nothing leaks.
    */
  private def streamOutput(proc: Process, cmd: String, cleanup: Option[() => Unit]): Iterator[String] = {
    Option(org.apache.spark.TaskContext.get()).foreach(_.addTaskCompletionListener[Unit] { _ =>
      if (proc.isAlive) proc.destroyForcibly()
      cleanup.foreach(_.apply())
    })
    val reader = new BufferedReader(new InputStreamReader(proc.getInputStream, UTF_8))
    new Iterator[String] {
      private var nextLine: String = reader.readLine()
      def hasNext: Boolean = {
        if (nextLine == null) {
          val code = proc.waitFor()
          reader.close()
          cleanup.foreach(_.apply())
          if (code != 0) throw new RuntimeException(s"executable failed ($code): $cmd")
          false
        } else true
      }
      def next(): String = {
        val l = nextLine
        nextLine = reader.readLine()
        l
      }
    }
  }
}
