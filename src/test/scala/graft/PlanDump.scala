package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: per-query physical-plan audit. Prints the operators that
  * matter for scale review (joins, exchanges, sorts, codegen coverage) so
  * a regression is visible at a glance. Usage: runMain graft.PlanDump [sfDir]. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val interesting = Seq(
      "Exchange hashpartitioning", "Exchange rangepartitioning",
      "Exchange SinglePartition", "BroadcastExchange",
      "SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin",
      "BroadcastNestedLoopJoin", "CartesianProduct",
      "TakeOrderedAndProject", "HashAggregate", "SortAggregate",
      "ObjectHashAggregate", "Window", "Generate", "Expand")
    SparkEntry.allQueries.sortBy(_.name).foreach { q =>
      try {
        val df = q.run(spark, sfDir)
        df.collect()
        val plan = df.queryExecution.executedPlan.toString
          .split("== Initial Plan ==").head
        val counts = interesting.flatMap { op =>
          val n = op.r.findAllIn(plan).size
          if (n > 0) Some(s"$op=$n") else None
        }
        val nonCodegen = plan.linesIterator.count(l =>
          l.trim.startsWith("+- Project") || l.trim.startsWith("+- Filter"))
        println(f"${q.name}%-28s ${counts.mkString(" ")} interpreted_proj_filter=$nonCodegen")
      } catch {
        case e: Throwable => println(s"${q.name} FAILED: ${e.getMessage.take(80)}")
      }
    }
    spark.stop()
  }
}
