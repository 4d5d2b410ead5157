package graft.mr

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

/** The Spark-native word count / grep must reproduce the reference's
  * golden outputs over its own corpus (SURVEY §2.4).
  */
class NativeTextJobsSpec extends AnyFunSuite {
  private val ref = "/root/reference"
  private lazy val spark = graft.Engine.session("test")

  test("native word count reproduces word_count_correct.txt") {
    val got = NativeTextJobs
      .wordCount(spark, s"$ref/tests/testdata/input")
      .collect()
      .map(r => s"${r.getString(0)}\t${r.getLong(1)}")
      .sorted(MapReduceJob.utf8Ordering)
      .toSeq
    val want = Files
      .readAllLines(Paths.get(s"$ref/tests/testdata/correct/word_count_correct.txt"))
      .asScala
      .toSeq
      .sorted(MapReduceJob.utf8Ordering)
    assert(got == want)
  }

  test("native grep reproduces grep_correct.txt in sorted order") {
    val got = NativeTextJobs.grep(spark, s"$ref/tests/testdata/input").collect().map(_.getString(0)).toSeq
    val want = Files
      .readAllLines(Paths.get(s"$ref/tests/testdata/correct/grep_correct.txt"))
      .asScala
      .toSeq
      .sorted(MapReduceJob.utf8Ordering)
    assert(got == want)
  }
}
