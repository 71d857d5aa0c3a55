package graft

import scala.collection.mutable.ArrayBuffer
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

// Temporary stage-level profiler — not part of the library surface.
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val qname = if (args.nonEmpty) args(0) else "d_ngram_jaccard"
    val spark = GraftSession.local("scratch", 32)
    val stages = ArrayBuffer.empty[(Int, Int, Long, Long, String)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val wall = (for {s <- si.submissionTime; c <- si.completionTime} yield c - s).getOrElse(-1L)
        stages += ((si.stageId, si.numTasks, wall,
          si.taskMetrics.executorRunTime, si.name.take(60)))
      }
    })
    val t0 = System.nanoTime()
    SparkEntry.queries(qname)(spark, sfDir).count()
    println(f"[scratch] $qname total: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    Thread.sleep(1000)
    println("[scratch] stageId tasks wallMs execRunMs name")
    stages.sortBy(-_._3).take(12).foreach { case (id, n, w, r, nm) =>
      println(f"[scratch] $id%7d $n%5d $w%7d $r%9d $nm")
    }
    spark.stop()
  }
}
