package graft.tools

import graft.core.GraftSession

/** Dev scratch main for ad-hoc plan/semantics checks (not part of the
  * library surface). Edit freely; keep out of SparkEntry.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8, "scratch")
    val dir = "/root/testdata/sf0.01"
    for (q <- Seq("q42_quality_checks", "q43_shipping_priority", "t22_typo_correction")) {
      println(s"===== $q =====")
      println(graft.SparkEntry.queries(q)(spark, dir)
        .queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        .linesIterator.takeWhile(!_.startsWith("(1) ")).mkString("\n"))
    }
    spark.stop()
  }
}
