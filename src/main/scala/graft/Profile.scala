package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}

import scala.collection.mutable

/** Dev tool: run one registered query with a job-level listener and print
  * per-job wall time + the callsite that submitted it, so optimization
  * rounds can see WHERE a multi-action lifecycle drill spends its seconds
  * (the bench only reports the query total).
  *
  * Run: `sbt "runMain graft.Profile q211"` — first match wins; the query
  * runs twice (warm JVM) and the second run is the one broken down.
  * `SPARK_GRAFT_SF_DIR` overrides the default sf0.1 dir.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Harness.session("graft-profile", defaultCpus = "32")
    val name = args.headOption.getOrElse("q01")
    val (qname, fn) = SparkEntry.queries.toSeq.sortBy(_._1)
      .find(_._1.startsWith(name))
      .getOrElse(sys.error(s"no query matches prefix $name"))
    // warmup: q01 (session costs) + one cold run of the target
    try SparkEntry.queries("q01_pricing_summary")(spark, sfDir).count()
    catch { case _: Throwable => () }
    try { fn(spark, sfDir).count() } catch { case e: Throwable =>
      System.err.println(s"cold run failed: $e") }
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))

    case class Job(id: Int, t0: Long, desc: String, site: String)
    val open = mutable.Map[Int, Job]()
    val done = mutable.ArrayBuffer[(Job, Double)]()
    val intervals = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
    @volatile var runningJobs = 0
    val stageTimes = mutable.ArrayBuffer[(Int, String, Double, Int)]()
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        val desc = Option(j.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse("")
        val site = j.stageInfos.headOption.map(_.name.takeWhile(_ != '\n'))
          .getOrElse("")
        open.synchronized { open(j.jobId) = Job(j.jobId, System.nanoTime(), desc, site) }
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        open.synchronized { open.remove(j.jobId) }.foreach { jb =>
          val now = System.nanoTime()
          intervals.add((jb.t0, now))
          // guarded: the main thread reads these buffers after the bus
          // drains; unsynchronized appends could tear (advice finding)
          done.synchronized { done += ((jb, (now - jb.t0) / 1e9)); () } }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val info = s.stageInfo
        val dur = (for {
          a <- info.completionTime; b <- info.submissionTime
        } yield (a - b) / 1e3).getOrElse(-1.0)
        stageTimes.synchronized {
          stageTimes += ((info.stageId, info.name, dur, info.numTasks)); () }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    // sample the MAIN thread's stack while the query runs: job time is
    // attributed by the listener; the sampler attributes the driver-side
    // gap (planning, commits, file IO between jobs)
    val mainThread = Thread.currentThread()
    val samples = new java.util.concurrent.ConcurrentLinkedQueue[(Long, String)]()
    @volatile var sampling = true
    val sampler = new Thread(() => {
      // all-thread mode (SPARK_GRAFT_PROFILE_ALL=1) also catches work on
      // the AQE/broadcast pools while main blocks, but getAllStackTraces
      // is heavy enough to skew the run — default samples main only
      val allThreads = sys.env.get("SPARK_GRAFT_PROFILE_ALL").contains("1")
      while (sampling) {
        val ts = System.nanoTime()
        import scala.jdk.CollectionConverters._
        val stacks: Iterator[(String, Array[StackTraceElement])] =
          if (allThreads)
            Thread.getAllStackTraces.asScala.iterator.collect {
              case (t, st) if t.getState == Thread.State.RUNNABLE &&
                  !t.getName.startsWith("Executor task launch") &&
                  !t.getName.contains("dispatcher") &&
                  !t.getName.contains("netty") &&
                  !t.getName.contains("heartbeat") => (s"[${t.getName}] ", st)
            }
          else Iterator(("", mainThread.getStackTrace))
        stacks.foreach { case (tag, st) =>
          val key = st.iterator.map(_.toString)
            .filter(f => f.contains("graft.") || f.contains("org.apache.spark"))
            .take(6).mkString(" <- ")
          if (key.nonEmpty) samples.add((ts, tag + key))
        }
        Thread.sleep(10)
      }
    })
    sampler.setDaemon(true)
    sampler.start()
    val t0 = System.nanoTime()
    val df = fn(spark, sfDir)
    val tPlan = (System.nanoTime() - t0) / 1e9
    df.count()
    val tTotal = (System.nanoTime() - t0) / 1e9
    sampling = false
    // drain the async listener bus deterministically (advice finding:
    // a fixed sleep can miss late job/stage events under load).
    // listenerBus is private[spark] — reflection, with the old sleep as
    // the fallback (dev tool; never on a query path)
    try {
      val m = spark.sparkContext.getClass.getMethod("listenerBus")
      val bus = m.invoke(spark.sparkContext)
      bus.getClass.getMethod("waitUntilEmpty", classOf[Long])
        .invoke(bus, java.lang.Long.valueOf(30000L))
      ()
    } catch { case _: Throwable => Thread.sleep(1500) }
    println(f"===== $qname total=$tTotal%.2f s (construction=$tPlan%.2f s)")
    val jobSum = done.map(_._2).sum
    println(f"jobs=${done.size} sum=$jobSum%.2f s (gap=${tTotal - jobSum}%.2f s driver-side)")
    done.sortBy(-_._2).take(40).foreach { case (j, d) =>
      println(f"  job ${j.id}%4d $d%7.3f s  ${j.site}%-40s ${j.desc.take(80)}")
    }
    println("-- jobs grouped by callsite --")
    done.groupBy(_._1.site).map { case (s, js) =>
      (s, js.size, js.map(_._2).sum)
    }.toSeq.sortBy(-_._3).foreach { case (s, n, t) =>
      println(f"  n=$n%3d sum=$t%7.3f s  $s")
    }
    println("-- slowest stages --")
    stageTimes.sortBy(-_._3).take(25).foreach { case (id, nm, d, nt) =>
      println(f"  stage $id%4d $d%7.3f s tasks=$nt%4d  ${nm.take(100)}")
    }
    import scala.jdk.CollectionConverters._
    // true idle time = wall minus the UNION of job intervals; attribute
    // only samples falling outside every job interval
    val ivs = intervals.asScala.toSeq.sortBy(_._1)
    val merged = ivs.foldLeft(List.empty[(Long, Long)]) {
      case (acc @ ((a, b) :: rest), (c, d)) =>
        if (c <= b) (a, math.max(b, d)) :: rest else (c, d) :: acc
      case (Nil, iv) => iv :: Nil
    }.reverse
    val covered = merged.map { case (a, b) => (b - a) / 1e9 }.sum
    println(f"union of job intervals=$covered%.2f s; uncovered=${tTotal - covered}%.2f s")
    def inJob(ts: Long) = merged.exists { case (a, b) => ts >= a && ts <= b }
    val idleSamples = samples.asScala.toSeq.filterNot(s => inJob(s._1))
    println(s"-- RUNNABLE driver-side thread samples OUTSIDE job intervals (10 ms each, n=${idleSamples.size}) --")
    // histogram on the DEEPEST app frame (first in the filtered stack) so
    // call-path noise does not fragment the buckets
    idleSamples.map(_._2).groupBy(s => s.split(" <- ").take(2).mkString(" <- "))
      .view.mapValues(_.size).toSeq
      .sortBy(-_._2).take(35).foreach { case (k, n) =>
        println(f"  $n%4d  ${k.take(320)}")
      }
    spark.stop()
  }
}
