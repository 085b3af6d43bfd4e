package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}

/** Per-query execution-shape probe (optimization rounds): for each named
  * SparkEntry query, run it warm (one untimed pass) and report the timed
  * pass's wall seconds, Spark JOB count, stage count, task count, shuffle
  * read/write bytes and input bytes — the §1 "where does the time go"
  * numbers that a wall clock alone hides. A query that is slow with tiny
  * shuffle volume and a large job count is paying scheduler/plan overhead
  * (fix the plan shape); one with large shuffle bytes is paying data
  * movement (fix the algorithm).
  *
  * Usage: runMain graft.tools.JobProbe <dir> <query>[,<query>...]
  * A dir spec `scaled10x:<srcDir>` resolves like the bench lane.
  */
object JobProbe {
  private class Acc extends SparkListener {
    val jobs = new java.util.concurrent.atomic.AtomicLong
    val stages = new java.util.concurrent.atomic.AtomicLong
    val tasks = new java.util.concurrent.atomic.AtomicLong
    val shufRead = new java.util.concurrent.atomic.AtomicLong
    val shufWrite = new java.util.concurrent.atomic.AtomicLong
    val input = new java.util.concurrent.atomic.AtomicLong
    // memory-pressure signals (round 16, verdict task 8): spill bytes
    // (any nonzero = an operator's buffer didn't fit execution memory)
    // and the max per-stage peak execution memory — the first query that
    // would spill at scale shows up on the artifact, not in an incident
    val memSpill = new java.util.concurrent.atomic.AtomicLong
    val diskSpill = new java.util.concurrent.atomic.AtomicLong
    val peakExecMem = new java.util.concurrent.atomic.AtomicLong
    // per-job wall durations + a call-site tag, so a many-job composite
    // (iterative clustering) shows WHERE its job count is spent
    val jobStartMs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]
    val jobDurs = new java.util.concurrent.ConcurrentLinkedQueue[(Double, String)]
    override def onJobStart(js: SparkListenerJobStart): Unit = {
      jobs.incrementAndGet()
      val site = js.stageInfos.lastOption.map(_.name).getOrElse("?")
      jobStartMs.put(js.jobId, (js.time, site))
    }
    override def onJobEnd(je: SparkListenerJobEnd): Unit = {
      val st = jobStartMs.remove(je.jobId)
      if (st != null)
        jobDurs.add(((je.time - st._1) / 1000.0, st._2))
    }
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
      stages.incrementAndGet()
      tasks.addAndGet(sc.stageInfo.numTasks.toLong)
      val m = sc.stageInfo.taskMetrics
      shufRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
      shufWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      input.addAndGet(m.inputMetrics.bytesRead)
      memSpill.addAndGet(m.memoryBytesSpilled)
      diskSpill.addAndGet(m.diskBytesSpilled)
      peakExecMem.getAndAccumulate(m.peakExecutionMemory, Math.max(_, _))
    }
    def reset(): Unit = {
      Seq(jobs, stages, tasks, shufRead, shufWrite, input,
        memSpill, diskSpill, peakExecMem).foreach(_.set(0L))
      jobStartMs.clear(); jobDurs.clear()
    }
  }

  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.create(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    val dir = graft.SparkEntry.resolveScaledSpec(spark, args(0))
    val names = args(1).split(',').toSeq
    graft.SparkEntry.prewarm(spark, dir)
    val keep = spark.sparkContext.getPersistentRDDs.keySet
    val acc = new Acc
    spark.sparkContext.addSparkListener(acc)
    for (q <- names) graft.SparkEntry.queries.get(q) match {
      case None => println(s"[jobprobe] $q UNKNOWN query name — skipped")
      case Some(fn) =>
        try {
          fn(spark, dir).count() // warmup (fixture caches, codegen)
          spark.sparkContext.getPersistentRDDs.foreach { case (id, rdd) =>
            if (!keep.contains(id)) rdd.unpersist(blocking = true)
          }
          // listener events drain asynchronously; settle before resetting
          Thread.sleep(300)
          acc.reset()
          val t0 = System.nanoTime()
          val n = fn(spark, dir).count()
          val secs = (System.nanoTime() - t0) / 1e9
          Thread.sleep(300) // let the last stage's events land
          println(f"[jobprobe] $q rows=$n time=$secs%.2f s " +
            f"jobs=${acc.jobs.get} stages=${acc.stages.get} " +
            f"tasks=${acc.tasks.get} " +
            f"shuf_read=${acc.shufRead.get / 1024}KiB " +
            f"shuf_write=${acc.shufWrite.get / 1024}KiB " +
            f"input=${acc.input.get / 1024}KiB " +
            f"spill_mem=${acc.memSpill.get / 1024}KiB " +
            f"spill_disk=${acc.diskSpill.get / 1024}KiB " +
            f"peak_exec_mem=${acc.peakExecMem.get / 1024}KiB")
          if (sys.env.get("JOBPROBE_DETAIL").contains("1")) {
            import scala.jdk.CollectionConverters._
            acc.jobDurs.asScala.toSeq.sortBy(-_._1).take(15).foreach {
              case (d, site) => println(f"[jobprobe]   $d%6.3f s  $site")
            }
          }
          spark.sparkContext.getPersistentRDDs.foreach { case (id, rdd) =>
            if (!keep.contains(id)) rdd.unpersist(blocking = true)
          }
        } catch { case e: Throwable =>
          println(s"[jobprobe] $q FAILED: ${e.getMessage}")
        }
    }
    spark.stop()
  }
}
