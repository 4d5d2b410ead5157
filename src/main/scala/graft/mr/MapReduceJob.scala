package graft.mr

import java.io.File
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.Partitioner
import org.apache.spark.sql.SparkSession

/** A MapReduce job spec — the engine-API form of the reference's JSON job
  * message (`/root/reference/mapreduce/submit.py:68-76`): no socket
  * protocol, just a method call. Mapper/reducer are arbitrary shell
  * commands, invoked exactly like the reference worker does
  * (`mapreduce/worker/__main__.py:75-77`): `sh -c "<cmd> <file>"` with
  * the input also streamed on stdin, output captured line-oriented.
  *
  * `parityPartitioning=true` replays the reference's grouping byte-for-byte:
  * distinct keys ranked in sorted order, rank % numReducers chooses the
  * partition (`mapreduce/manager/__main__.py:431-437` — the Python
  * `(count % n) - 1` with -1 wrapping to the last file is plain
  * round-robin over 0-based ranks). Default (false) is a hash partition
  * on the key — same grouping guarantee, no global rank pass, scales.
  */
final case class JobSpec(
    inputDir: String,
    outputDir: String,
    mapperCmd: String,
    reducerCmd: String,
    numMappers: Int,
    numReducers: Int,
    parityPartitioning: Boolean = false,
    /** key = text before first '\t' (the wc/grep contract,
      * `tests/testdata/exec/wc_map.sh:12`). If true, replicate the
      * reference's quirk of text before the LAST space
      * (`mapreduce/manager/__main__.py:432-434`, see SURVEY §1.1). */
    legacyKeyExtraction: Boolean = false
)

object MapReduceJob {

  /** Round-robin file-list partitioning by sorted index — file i goes to
    * task i % n (`mapreduce/manager/__main__.py:320-328`; pinned by
    * test_manager_02: files 01,03,05,07 vs 02,04,06,08 for n=2).
    */
  def roundRobin(files: Seq[String], n: Int): Seq[Seq[String]] =
    (0 until n).map(j => files.zipWithIndex.collect { case (f, i) if i % n == j => f })

  /** Grouping key of an intermediate line. */
  def groupKey(line: String, legacy: Boolean): String =
    if (legacy) {
      val i = line.lastIndexOf(' ')
      if (i < 0) line else line.substring(0, i)
    } else {
      val i = line.indexOf('\t')
      if (i < 0) line else line.substring(0, i)
    }

  /** Unsigned-UTF-8-byte (= Unicode codepoint) line ordering — matches
    * Python `sorted()` on str (`mapreduce/worker/__main__.py:98-99`).
    * (String.compareTo would differ for supplementary-plane chars.)
    */
  val utf8Ordering: Ordering[String] = new Ordering[String] {
    def compare(a: String, b: String): Int =
      java.util.Arrays.compareUnsigned(a.getBytes(UTF_8), b.getBytes(UTF_8))
  }

  /** Hash partitioner over the group key extracted from the sort key
    * (the full line). Same key -> same partition; partitions arrive
    * fully sorted via repartitionAndSortWithinPartitions.
    */
  private final class GroupKeyPartitioner(n: Int, legacy: Boolean) extends Partitioner {
    def numPartitions: Int = n
    def getPartition(key: Any): Int = {
      val k = groupKey(key.asInstanceOf[String], legacy)
      val h = k.hashCode % n
      if (h < 0) h + n else h
    }
  }

  /** Parity partitioner: partition = sorted-distinct-key rank % n.
    * Needs a global rank map — a replay/validation tool, not the scale
    * path (the rank map is broadcast; fine for test corpora).
    */
  private final class KeyRankPartitioner(ranks: Map[String, Int], n: Int, legacy: Boolean)
      extends Partitioner {
    def numPartitions: Int = n
    def getPartition(key: Any): Int = {
      val k = groupKey(key.asInstanceOf[String], legacy)
      ranks.getOrElse(
        k,
        throw new IllegalStateException(
          s"parity partitioning: key '$k' absent from the rank map — " +
            "the mapper emitted a key not seen when ranks were computed " +
            "(parity mode requires deterministic mappers)")) % n
    }
  }

  /** Map + group stages: the sorted, key-partitioned intermediate RDD
    * (the content of the reference's grouper-output). Also returns the
    * persisted map-stage RDD to unpersist after materialization (parity
    * mode only).
    */
  private def groupedRdd(
      spark: SparkSession,
      spec: JobSpec
  ): (org.apache.spark.rdd.RDD[(String, Null)], Option[org.apache.spark.rdd.RDD[String]]) = {
    val sc = spark.sparkContext

    // --- source: sorted file listing, round-robined into numMappers
    // tasks by index (mapreduce/manager/__main__.py:311-328)
    val files = new File(spec.inputDir).listFiles
      .filter(_.isFile)
      .map(_.getAbsolutePath)
      .sorted(Ordering.String)
      .toSeq
    val tasks: Seq[Seq[String]] = roundRobin(files, spec.numMappers)

    // --- map stage: one external process per input file (O1)
    val mapperCmd = spec.mapperCmd
    val mapped = sc
      .parallelize(tasks, math.max(tasks.length, 1))
      .flatMap(fileList => fileList.iterator.flatMap(f => Pipes.pipeFile(mapperCmd, f)))

    // --- group stage: shuffle on group key, external sort by full line
    // (O2/O3/O5 collapse into Spark's sort-based shuffle)
    implicit val ord: Ordering[String] = utf8Ordering
    // Parity mode reads `mapped` twice (rank pass + shuffle): persist it
    // so the mapper executables run exactly once — rerunning them would
    // both double the work and, for a non-deterministic mapper, emit
    // keys absent from the rank map. MEMORY_AND_DISK, not cache(): a
    // memory-only block evicted under pressure would be silently
    // recomputed, breaking exactly that invariant.
    if (spec.parityPartitioning)
      mapped.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val partitioner: Partitioner =
      if (spec.parityPartitioning) {
        val ranks = mapped
          .map(l => groupKey(l, spec.legacyKeyExtraction))
          .distinct()
          .collect()
          .sorted(utf8Ordering)
          .zipWithIndex
          .toMap
        new KeyRankPartitioner(ranks, spec.numReducers, spec.legacyKeyExtraction)
      } else new GroupKeyPartitioner(spec.numReducers, spec.legacyKeyExtraction)

    val grouped = mapped
      .map(l => (l, null))
      .repartitionAndSortWithinPartitions(partitioner)
    (grouped, if (spec.parityPartitioning) Some(mapped) else None)
  }

  /** Materialize an RDD's partitions as exactly `n` sequentially-named
    * files under `outDir` (empty partitions still produce files —
    * test_integration_03.py:79).
    */
  private def saveNumbered(
      rdd: org.apache.spark.rdd.RDD[String],
      n: Int,
      outDir: String,
      prefix: String
  ): Seq[File] = {
    val tmpOut = Files.createTempDirectory("graft-mr-").toString + "/out"
    rdd.saveAsTextFile(tmpOut)
    new File(outDir).mkdirs()
    (0 until n).map { i =>
      val part = Paths.get(tmpOut, f"part-$i%05d")
      val dest = Paths.get(outDir, f"$prefix${i + 1}%02d")
      if (Files.exists(part)) Files.move(part, dest, StandardCopyOption.REPLACE_EXISTING)
      else Files.write(dest, Array.emptyByteArray)
      dest.toFile
    }
  }

  /** Run a full map -> sort/group -> reduce job. Returns the output files
    * (exactly numReducers, named outputfileNN like
    * `mapreduce/manager/__main__.py:486-487`).
    */
  def run(spark: SparkSession, spec: JobSpec): Seq[File] = {
    val (grouped, toRelease) = groupedRdd(spark, spec)

    // --- reduce stage: one external process per sorted partition (O6)
    val reducerCmd = spec.reducerCmd
    val reduced = grouped.mapPartitions(it => Pipes.pipePartition(reducerCmd, it.map(_._1)))

    // --- sink: exactly numReducers files named outputfileNN (S4)
    val out = saveNumbered(reduced, spec.numReducers, spec.outputDir, "outputfile")
    toRelease.foreach(_.unpersist(blocking = false))
    out
  }

  /** Map + group only, written as the reference's grouper-output files
    * `reduceNN` (`tmp/job-N/grouper-output/reduce01..` —
    * `mapreduce/manager/__main__.py:409-437`): each file is one key
    * partition, lines fully sorted under codepoint order. This is the S3
    * per-file intermediate sink surface; with `parityPartitioning=true`
    * the files replay the reference's grouping byte-for-byte (pinned
    * against the test_manager_08 goldens in MapReduceSpec).
    */
  def mapAndGroup(spark: SparkSession, spec: JobSpec, groupOutDir: String): Seq[File] = {
    val (grouped, toRelease) = groupedRdd(spark, spec)
    val out = saveNumbered(grouped.map(_._1), spec.numReducers, groupOutDir, "reduce")
    toRelease.foreach(_.unpersist(blocking = false))
    out
  }
}
