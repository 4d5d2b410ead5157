package graft.operators

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}

/** BLUE/GREEN generation pointer for immutable artifact SETS — the
  * commit machinery behind quantizer retraining (q247): an ANN index
  * is one coherent set of artifacts (coarse cells + codebook + codes)
  * whose quantizers are FROZEN once trained, so refreshing them is
  * never an in-place mutation — a retrain writes a complete NEW
  * generation directory next to the live one and swaps a pointer,
  * exactly Delta/Iceberg's pointer-commit discipline one level up
  * (TieredIndex commits a manifest per mutation; Generations commits a
  * whole artifact ROOT per retrain). Layout under one root:
  *
  * {{{
  *   CURRENT        one line: the name of the live generation dir
  *   HISTORY        append-only commit log: one "<gen> <mark>" line
  *                  per commit, oldest first — the pointer's history
  *   LOCK           the writer-fence lock file (see below)
  *   gen-NNNNN/     a complete artifact set (coarse/ codebook/ codes/)
  * }}}
  *
  * Properties, spec-pinned (GenerationsSpec):
  *  - ATOMIC CUTOVER: [[commit]] fsyncs the pointer and swaps it with
  *    one POSIX rename — a reader resolves either the old or the new
  *    generation in full, never a half-retrained mix (a new codebook
  *    scoring old codes would be silent garbage; the generation dir
  *    makes that unrepresentable).
  *  - READERS ACROSS THE SWAP: [[commit]]'s GC keeps the `retain`
  *    generations the pointer MOST RECENTLY pointed at (default 2 =
  *    current + the generation serving until this instant), judged by
  *    COMMIT RECENCY from the HISTORY log, not by name order — so a
  *    request that resolved the pre-swap generation keeps serving
  *    from it through one full retrain cycle even when the commit
  *    sequence includes a ROLLBACK (the round-15 ADVICE trap: after a
  *    rollback, name-order GC would delete the generation that was
  *    CURRENT until the next forward commit while retaining the
  *    abandoned bad one).
  *  - SINGLE WRITER, FENCED: [[commit]] runs its fsync + swap + GC
  *    body under the same exclusive OS file lock TieredIndex's
  *    mutators use (`root/LOCK`) — two concurrent commits would
  *    otherwise interleave so one commit's GC deletes the generation
  *    the other just pointed CURRENT at. A second committer throws
  *    immediately (the caller owns serialization; the fence only
  *    enforces it).
  *  - CRASH SAFETY: a retrain killed mid-write leaves CURRENT on the
  *    old generation and the half-written dir as an un-pointed orphan
  *    — never in the pointer history, so the next commit's GC removes
  *    it (and a same-named retrain replay may overwrite it first;
  *    [[commit]] is only called after the generation is complete on
  *    disk). The HISTORY
  *    line is committed (fsync + rename) immediately BEFORE the
  *    pointer swap: a crash between the two leaves one logged-but-
  *    never-current entry pointing at a complete, fsync'd artifact
  *    set — readable, never garbage — and CURRENT still on the old
  *    generation.
  *  - TIME TRAVEL: [[commit]]'s `mark` tags the commit with the
  *    stream batch id it happened under (Delta's commit version, one
  *    level up); [[resolveAsOf]] answers "which generation served
  *    batch b" from the HISTORY log — the resolve a time-travel read
  *    of a post-retrain index needs, because a pre-swap codes
  *    snapshot decoded with post-swap quantizers is silent garbage
  *    (q256 gates exactly that cross-generation resolve).
  */
object Generations {

  private def currentPath(root: String) = Paths.get(root, "CURRENT")
  private def historyPath(root: String) = Paths.get(root, "HISTORY")

  private val GenName = "gen-(\\d+)".r

  private def genNum(name: String): Long = name match {
    case GenName(d) => d.toLong
    case _ =>
      throw new IllegalArgumentException(
        s"Generations: '$name' is not a gen-NNNNN generation name")
  }

  /** The live generation's absolute path. Fails loudly on a missing
    * pointer or a pointer at a GC'd/unwritten generation — never
    * resolves a partial artifact set.
    */
  def resolve(root: String): String = {
    val p = currentPath(root)
    require(Files.exists(p), s"Generations: $root has no CURRENT pointer")
    val gen = new String(Files.readAllBytes(p), StandardCharsets.UTF_8).trim
    val dir = new java.io.File(root, gen)
    require(
      dir.isDirectory,
      s"Generations: CURRENT points at missing generation $gen under $root")
    dir.toString
  }

  /** Committed generation names surviving on disk, oldest first by the
    * parsed NUMERIC suffix (spec observable) — lexicographic order
    * breaks the moment a name outgrows the 5-digit convention
    * (gen-100000 sorts before gen-99999), and GC ordering must never
    * hang off a formatting accident.
    */
  def list(root: String): Seq[String] =
    Option(new java.io.File(root).list()).getOrElse(Array.empty[String])
      .filter(n =>
        GenName.pattern.matcher(n).matches && new java.io.File(root, n).isDirectory)
      .sortBy(genNum)
      .toSeq

  /** The commit log, oldest first: every (generation, mark) the
    * pointer has been moved to, rollbacks included — the authority
    * for GC recency and [[resolveAsOf]]. Append-only and unbounded BY
    * DESIGN: one line per retrain/rollback (a deployment commits
    * generations quarterly, not per batch), and the full pointer
    * history IS the audit trail time travel answers from — truncating
    * it would silently cap [[resolveAsOf]]'s reach. Reads are memoized
    * per (path, mtime, size): serve paths resolve per request and
    * audit loops ([[resolveAsOf]] per batch, q259's shape) re-read the
    * log per call, so a year-long deployment would otherwise re-parse
    * an ever-growing file on every page — the stat is the cheap part,
    * and any [[commit]] moves the mtime/size, invalidating the entry.
    */
  def history(root: String): Seq[(String, Long)] = {
    val p = historyPath(root)
    if (!Files.exists(p)) Seq.empty
    else {
      val key = (p.toString, Files.getLastModifiedTime(p), Files.size(p))
      if (historyCache.size > 1024) historyCache.clear() // test-suite churn bound
      historyCache.getOrElseUpdate(key, parseHistory(p))
    }
  }

  private val historyCache =
    new scala.collection.concurrent.TrieMap[
      (String, java.nio.file.attribute.FileTime, Long), Seq[(String, Long)]]

  private def parseHistory(p: java.nio.file.Path): Seq[(String, Long)] = {
    import scala.jdk.CollectionConverters._
    Files.readAllLines(p, StandardCharsets.UTF_8).asScala.toSeq
      .filter(_.nonEmpty)
      .map { line =>
        // a malformed line must name the file and the offending text —
        // a bare MatchError from a truncated log is undiagnosable
        try {
          val Array(gen, mark) = line.split(" ", 2)
          (genName(gen), mark.trim.toLong)
        } catch {
          case e: Exception =>
            throw new IllegalStateException(
              s"Generations: malformed HISTORY line '$line' in $p", e)
        }
      }
  }

  private def genName(name: String): String = { genNum(name): Unit; name }

  /** The generation that was CURRENT as of stream batch `mark` — the
    * LAST commit whose mark is <= `mark` (commits are logged in
    * pointer order, so "last" is "what a reader at that batch
    * resolved"). That reading is only sound because [[commit]] keeps
    * the logged marks NON-DECREASING: an explicit mark below the last
    * logged one throws, and an out-of-band commit (mark -1, the
    * rollback convention) is logged AT the last mark — "the pointer
    * moved now", not "before everything" — so a rollback entry never
    * shadows the marked history behind it (the round-16 ADVICE trap:
    * an unordered -1 would match every `m <= mark` probe and answer
    * for batches its generation never served). Returns the
    * generation's absolute path; fails loudly
    * when the resolved generation has been GC'd (raise `retain` on
    * the commit schedule that owns this root — snapshot retention is
    * a policy knob, priced as retained disk) or when no commit
    * predates the mark.
    */
  def resolveAsOf(root: String, mark: Long): String = {
    val h = history(root)
    require(h.nonEmpty, s"Generations: $root has no commit history")
    val gen = h.reverse
      .collectFirst { case (g, m) if m <= mark => g }
      .getOrElse(throw new IllegalStateException(
        s"Generations.resolveAsOf($mark): no commit at or before this " +
          s"mark in $root (earliest is mark ${h.head._2})"))
    val dir = new java.io.File(root, gen)
    require(
      dir.isDirectory,
      s"Generations.resolveAsOf($mark): generation $gen aged out of the " +
        s"GC retention window under $root — raise commit(retain = ...) on " +
        "the retrain schedule that owns this root")
    dir.toString
  }

  /** Point CURRENT at `gen` (a complete generation dir under `root`),
    * durably and fenced: the whole body runs under the exclusive
    * writer lock on `root/LOCK` (TieredIndex's fence — a concurrent
    * commit throws instead of racing the swap/GC), the generation
    * tree is fsync'd (parquet writers do not force their output), the
    * HISTORY line and the pointer write are fsync'd, each swap is one
    * atomic rename, and the directory entry is forced — the same
    * ordering TieredIndex's manifest commit uses, so a power loss can
    * never persist a pointer ahead of the artifacts it names.
    *
    * GC: generations are retired by COMMIT RECENCY — the last
    * `retain` DISTINCT generations in the HISTORY log (which always
    * include `gen` itself, just appended) survive; every other gen-*
    * dir is deleted. After a rollback (history ... g0, g1, g0) the
    * next forward commit of g2 therefore keeps {g2, g0} and GCs the
    * abandoned g1 — the generation that was serving until this
    * instant survives one full cycle, whatever name-order says
    * (round-15 ADVICE; spec-pinned).
    *
    * `mark`: the stream batch id this commit happened under (-1 for
    * out-of-band commits), recorded in HISTORY for [[resolveAsOf]].
    * Marks are logged NON-DECREASING — the invariant [[resolveAsOf]]'s
    * reverse scan depends on: an explicit mark below the last logged
    * one throws (a commit cannot happen before a commit it follows),
    * and -1 is logged as the LAST mark itself (an out-of-band commit —
    * a rollback — happens "now", at whatever batch the log has
    * reached, not before the beginning of time). On a root written by
    * pre-HISTORY code (CURRENT exists, HISTORY absent) the history is
    * first seeded with the CURRENT generation at mark -1, so the first
    * new-code commit's GC keep-set still contains the generation that
    * was serving until this instant — without the seed it would be
    * deleted out from under its in-flight readers (round-16 ADVICE
    * migration hazard).
    */
  def commit(root: String, gen: String, retain: Int = 2, mark: Long = -1L): Unit = {
    genNum(gen): Unit // validate the name BEFORE it enters the log
    val dir = new java.io.File(root, gen)
    require(
      dir.isDirectory,
      s"Generations: cannot commit missing generation $gen under $root")
    TieredIndex.withWriterLock(root, owner = "Generations") {
      TieredIndex.fsyncTree(dir)
      // HISTORY first (the GC/as-of authority), then the pointer: a
      // crash between the two leaves a logged entry at a complete
      // artifact set and CURRENT still on the old generation
      val prior0 = history(root)
      val prior =
        if (prior0.isEmpty && Files.exists(currentPath(root)))
          // pre-HISTORY root: seed with the serving generation so GC
          // recency sees it (mark -1 = "before the logged era")
          Seq((new String(Files.readAllBytes(currentPath(root)),
            StandardCharsets.UTF_8).trim, -1L))
        else prior0
      val lastMark = prior.lastOption.map(_._2).getOrElse(-1L)
      val effMark = if (mark < 0L) lastMark else mark
      require(
        effMark >= lastMark,
        s"Generations.commit($gen, mark = $mark): mark precedes the last " +
          s"logged mark $lastMark under $root — HISTORY marks must be " +
          "non-decreasing (resolveAsOf reads the log as pointer order)")
      val lines = prior :+ (gen, effMark)
      val htmp = Paths.get(root, "HISTORY.tmp")
      TieredIndex.writeFsync(
        htmp,
        lines.map { case (g, m) => s"$g $m" }.mkString("", "\n", "\n")
          .getBytes(StandardCharsets.UTF_8))
      Files.move(htmp, historyPath(root), StandardCopyOption.ATOMIC_MOVE): Unit
      val tmp = Paths.get(root, "CURRENT.tmp")
      TieredIndex.writeFsync(tmp, gen.getBytes(StandardCharsets.UTF_8))
      Files.move(tmp, currentPath(root), StandardCopyOption.ATOMIC_MOVE): Unit
      TieredIndex.fsyncDir(root)
      // retire by pointer recency: the last `retain` distinct
      // generations the pointer has named (always including this
      // commit's) survive for in-flight readers and time travel
      val keep = lines.reverseIterator.map(_._1).distinct
        .take(math.max(1, retain)).toSet
      list(root).filterNot(keep).foreach { old =>
        graft.Engine.deleteRecursively(new java.io.File(root, old))
      }
    }
  }
}
