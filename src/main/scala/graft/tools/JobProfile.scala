package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

import scala.collection.concurrent.TrieMap

/** Per-JOB profile of named SparkEntry queries (guide §1: measure first).
  * Prints every Spark job the query launches — id, wall ms, task count,
  * callsite — so commit-bound lifecycle queries show their job-launch
  * floor explicitly:
  *   runMain graft.tools.JobProfile <dir> <query> [query...]
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val names = args.drop(1).filterNot(_.startsWith("-"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val starts = TrieMap.empty[Int, (Long, String, Int)]
    val done = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, String, Int)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val site = js.stageInfos.lastOption.map(_.name.take(90)).getOrElse("?")
        val nTasks = js.stageInfos.map(_.numTasks).sum
        starts.put(js.jobId, (System.nanoTime(), site, nTasks))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit =
        starts.remove(je.jobId).foreach { case (t0, site, nTasks) =>
          done.add((je.jobId, (System.nanoTime() - t0) / 1000000L, site, nTasks))
        }
    })

    names.foreach { n =>
      val fn = graft.SparkEntry.queries(n)
      done.clear()
      val t0 = System.nanoTime()
      val df = fn(spark, dir)
      val rows = df.queryExecution.toRdd.count()
      val sec = (System.nanoTime() - t0) / 1e9
      // listener bus is async — give it a moment to drain before reporting
      Thread.sleep(400)
      println(f"[jobprof] $n%-24s $sec%8.2f s  ($rows rows)")
      val jobs = done.toArray(Array.empty[(Int, Long, String, Int)]).sortBy(_._1)
      jobs.foreach { case (id, ms, site, nTasks) =>
        println(f"[jobprof]   job $id%4d  $ms%6d ms  $nTasks%4d tasks  $site")
      }
      println(f"[jobprof]   total ${jobs.length} jobs, ${jobs.map(_._2).sum} ms in jobs")
    }
    spark.stop()
  }
}
