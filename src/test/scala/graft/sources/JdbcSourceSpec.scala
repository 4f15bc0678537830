package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** A7 — the real `spark.read.format("jdbc")` path (the reference reads its
  * funcX transitions from SQLite via `pd.read_sql_query`,
  * /root/reference/examples/xloop2023/performance.ipynb cell 8). The spec
  * uses embedded Derby — the JDBC engine already on Spark's classpath —
  * since the contract under test is the JDBC relation, not a vendor
  * driver: schema mapping, a partitioned (parallel) scan, filter pushdown
  * into the database, and the same event-pair analysis the registry path
  * runs.
  */
class JdbcSourceSpec extends SparkSpec {

  test("A7: JDBC read of an embedded transitions database") {
    val dbDir = java.nio.file.Files.createTempDirectory("graft-jdbc")
      .resolve("tasksdb").toString
    val conn = java.sql.DriverManager.getConnection(s"jdbc:derby:$dbDir;create=true")
    try {
      val st = conn.createStatement()
      st.execute("""CREATE TABLE transitions (
        task_uuid VARCHAR(36) NOT NULL,
        message VARCHAR(64) NOT NULL,
        state_time BIGINT NOT NULL)""")
      st.close()
      val ins = conn.prepareStatement("INSERT INTO transitions VALUES (?, ?, ?)")
      val base = 1700000000000000000L
      for (t <- 0 until 20; (msg, off) <- Seq(
          ("execution-start", 0L), ("execution-end", (t + 1) * 1000000L))) {
        ins.setString(1, f"task-$t%03d")
        ins.setString(2, msg)
        ins.setLong(3, base + t * 10000000L + off)
        ins.executeUpdate()
      }
      ins.close()
    } finally conn.close()

    def jdbc = spark.read.format("jdbc")
      .option("url", s"jdbc:derby:$dbDir")
      .option("driver", "org.apache.derby.jdbc.EmbeddedDriver")
      .option("dbtable", "transitions")

    // plain read: schema maps to the Transition model's core columns
    // (Derby uppercases unquoted identifiers)
    val df = jdbc.load()
    assert(df.count() == 40)
    assert(df.schema.fieldNames.toSeq == Seq("TASK_UUID", "MESSAGE", "STATE_TIME"))

    // partitioned read — the scan runs as parallel range queries, the
    // shape a production JDBC extract uses
    val parallel = jdbc
      .option("partitionColumn", "STATE_TIME")
      .option("lowerBound", (1700000000000000000L).toString)
      .option("upperBound", (1700000000200000000L).toString)
      .option("numPartitions", "4")
      .load()
    assert(parallel.rdd.getNumPartitions == 4)
    assert(parallel.count() == 40)

    // filters reach the database, not the Spark side
    val filtered = parallel.filter(col("MESSAGE") === "execution-end")
    val plan = filtered.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("PushedFilters") && plan.contains("MESSAGE"),
      s"filter did not push into the JDBC scan:\n$plan")
    assert(filtered.count() == 20)

    // the reference's event-pair analysis over the JDBC source: per-task
    // execution duration from start/end transitions (ipynb cell 8)
    val durations = parallel
      .groupBy(col("TASK_UUID").as("task_uuid"))
      .agg(
        min(when(col("MESSAGE") === "execution-start", col("STATE_TIME"))).as("t0"),
        min(when(col("MESSAGE") === "execution-end", col("STATE_TIME"))).as("t1"))
      .withColumn("exec_ms", (col("t1") - col("t0")) / lit(1000000.0))
      .orderBy("task_uuid")
      .collect()
    assert(durations.length == 20)
    durations.zipWithIndex.foreach { case (r, t) =>
      assert(r.getAs[Double]("exec_ms") == (t + 1).toDouble, s"task $t")
    }
  }
}
