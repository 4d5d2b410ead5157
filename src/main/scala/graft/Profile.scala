package graft

/** Per-query job-level profiler — the local[32] stand-in for the Spark
  * UI's Jobs page (the UI is off in the engine session): runs each
  * query named in SPARK_GRAFT_ONLY once and attributes wall time to
  * Spark JOBS (count, total job seconds) vs DRIVER GAPS (wall minus
  * job time — planning, file listing, streaming machinery, fsyncs).
  * Optimization rounds use it to decide whether a query is data-bound
  * (job time dominates) or overhead-bound (gaps + tiny-job count
  * dominate). Prints one line per query:
  *   PROFILE <name> wall=Ws jobs=N jobSec=Js gap=Gs maxJob=Ms
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Engine.session("profile")
    val only: Option[Set[String]] =
      sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val selected = SparkEntry.queries.toSeq
      .filter { case (n, _) => only.forall(f => f.exists(n.startsWith)) }
      .sortBy(_._1)

    // job-time accumulator: listener events carry submission/completion
    // times; concurrent jobs may overlap, so jobSec is SUM of job
    // durations (can exceed wall under §2.6 overlap — that is the point)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val jobSec = new java.util.concurrent.atomic.AtomicLong(0L)
    val nJobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val maxJob = new java.util.concurrent.atomic.AtomicLong(0L)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(e: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.put(e.jobId, e.time): Unit
      override def onJobEnd(e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        Option(jobs.remove(e.jobId)).foreach { t0 =>
          val d = e.time - t0
          jobSec.addAndGet(d): Unit
          nJobs.incrementAndGet(): Unit
          maxJob.updateAndGet(m => math.max(m, d)): Unit
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)

    // one untimed warmup of the whole selection (codegen + JIT), then
    // one profiled run each
    selected.foreach { case (_, fn) =>
      try fn(spark, sfDir).count(): Unit
      catch { case _: Throwable => () }
      Engine.releaseScratch(spark)
    }
    selected.foreach { case (name, fn) =>
      jobSec.set(0L); nJobs.set(0); maxJob.set(0L); jobs.clear()
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true } catch { case _: Throwable => false }
      val wall = (System.nanoTime() - t0) / 1e9
      // drain listener-bus lag before reading the accumulators
      // (listenerBus is private[spark]; a short sleep is enough here —
      // job-end events trail an action by milliseconds)
      Thread.sleep(200)
      val js = jobSec.get / 1e3
      println(
        f"PROFILE $name%-32s wall=$wall%7.2fs jobs=${nJobs.get}%4d " +
          f"jobSec=$js%7.2fs gap=${wall - js}%7.2fs maxJob=${maxJob.get / 1e3}%6.2fs" +
          (if (ok) "" else "  ERROR"))
      Engine.releaseScratch(spark)
    }
    spark.stop()
  }
}
