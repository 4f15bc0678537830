package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional dev-only 3rd arg: comma-separated name prefixes to run a
    // subset (the driver always passes exactly two args — full run)
    val keep: String => Boolean = args.lift(2) match {
      case Some(prefixes) =>
        val ps = prefixes.split(',').toSeq
        name => ps.exists(name.startsWith)
      case None => _ => true
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = graft.core.GraftSession.local(cpus.toInt, "graft-verify")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries.foreach { case (name, fn) =>
      if (keep(name))
        try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        catch { case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
        }
    }
    // Auxiliary dumps referenced by oracle SQL via the {OUT}/aux prefix.
    // Written to a SIBLING of outDir, not inside it: result checkers that
    // enumerate outDir subdirectories would otherwise treat `aux` as a
    // query result, and its array-typed columns (embedding vectors,
    // quantized int lists) defeat frame-level sort/hash comparison. The
    // oracle SQL still reaches them — the {OUT}/aux placeholder below is
    // rewritten to this absolute sibling path.
    val auxAbs = Paths.get(outDir).toAbsolutePath.toString + "_aux"
    SparkEntry.auxDumps.foreach { case (name, fn) =>
      if (keep(name))
        try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$auxAbs/$name")
        catch { case e: Throwable =>
          System.err.println(s"[verify] aux $name failed: ${e.getMessage}")
        }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val outAbs = Paths.get(outDir).toAbsolutePath.toString
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => keep(k) }
      .map { case (k, v) =>
        val sql = v.replace("{OUT}/aux", auxAbs).replace("{OUT}", outAbs)
        s"${q(k)}: ${q(sql)}"
      }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
