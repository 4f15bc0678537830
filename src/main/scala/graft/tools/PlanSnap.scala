package graft.tools

import org.apache.spark.sql.execution.ExplainMode

/** Dev tool: dump `explain("formatted")` for NAMED queries into
  * `plans/<tag>/<query>_<suffix>.txt` — the before/after plan evidence an
  * optimization round commits next to its OPTIMIZATION_r*.md claims.
  * Usage: `sbt "runMain graft.tools.PlanSnap r15 before q1_agg q59_gap_fill"`
  * (sf dir via SPARK_GRAFT_SF_DIR, default sf0.001 — plan SHAPE is
  * sf-independent; AQE runtime specialization is not captured either way).
  */
object PlanSnap {

  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanSnap <tag> <suffix> <query>...")
    val (tag, suffix, names) = (args(0), args(1), args.drop(2).toSeq)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = graft.core.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt, "graft-plansnap")
    val qs = graft.SparkEntry.queries
    val repoRoot = sys.env.getOrElse("GRAFT_REPO_ROOT",
      sys.props.getOrElse("user.dir", "."))
    val outDir = java.nio.file.Paths.get(repoRoot, "plans", tag)
    java.nio.file.Files.createDirectories(outDir)
    names.foreach { name =>
      val fn = qs.getOrElse(name, sys.error(s"unknown query $name"))
      val plan = fn(spark, sfDir).queryExecution.explainString(
        ExplainMode.fromString("formatted"))
      val p = outDir.resolve(s"${name}_$suffix.txt")
      java.nio.file.Files.writeString(p, plan)
      println(s"wrote $p")
    }
    spark.stop()
  }
}
