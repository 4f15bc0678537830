package graft.pipelines

import graft.SparkSpec
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Attribution cost + misclassification guards for [[Quarantine]].
  *
  * The restart story is the case the quarantine exists for, and it is
  * exactly the case where a batch is NOT cadence-sized: a pipeline
  * restarted after downtime sweeps the backlog into ONE batch. The r13
  * implementation probed every file linearly — a 5,000-file backlog with
  * one poison file cost 5,000 sequential driver jobs before the batch
  * could commit. These specs pin the group-bisect replacement:
  * O(bad · log N) probe jobs, measured with a SparkListener job counter,
  * and the transient-infrastructure retry that keeps one executor hiccup
  * from permanently quarantining a healthy file (the exactly-once gate
  * advances past a quarantined file forever — misclassification is data
  * loss, not a retry).
  */
class QuarantineBisectSpec extends SparkSpec {

  private lazy val session = spark
  import session.implicits._

  private def mkFiles(n: Int): DataFrame =
    (1 to n).map(i => (f"/land/f$i%05d.emd", i.toLong)).toDF("path", "payload")

  /** Deterministic data-borne poison: refuse-by-name for the named paths,
    * every evaluation.
    */
  private def poisonParse(poison: Set[String]): DataFrame => DataFrame = {
    val bad = poison
    val probe = udf((p: String, v: Long) => {
      require(!bad.contains(p), s"poison file: $p")
      v * 2
    })
    df => df.select(col("path"), probe(col("path"), col("payload")).as("parsed"))
  }

  private def noopAnalyze(parse: DataFrame => DataFrame): DataFrame => Unit =
    g => parse(g).write.format("noop").mode("overwrite").save()

  test("bisect costs O(bad·logN) probe jobs on a restart-backlog batch, not O(N)") {
    val n = 1024
    val poison = Set("/land/f00137.emd", "/land/f00911.emd")
    val files = mkFiles(n)
    val parse = poisonParse(poison)
    val qDir = java.nio.file.Files.createTempDirectory("graft-bisect-q").toString

    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    org.apache.spark.graft.ListenerBridge.flush(spark.sparkContext)
    spark.sparkContext.addSparkListener(listener)
    try {
      Quarantine.run(spark, files, parse, qDir, batchId = 7L)(noopAnalyze(parse))
      org.apache.spark.graft.ListenerBridge.flush(spark.sparkContext)
    } finally spark.sparkContext.removeSparkListener(listener)

    // Job budget: initial failed analyze + path collect + final analyze +
    // quarantine write, plus the bisect itself — per bad file at most two
    // group probes per tree level (log₂N levels) and one leaf retry. The
    // old linear probe took >N jobs here.
    val bad = poison.size
    val log2 = (math.log(n) / math.log(2)).ceil.toInt
    val budget = 2 * bad * (log2 + 2) + 16
    val measured = jobs.get
    assert(measured <= budget,
      s"bisect spent $measured jobs; budget $budget (N=$n, bad=$bad)")
    assert(measured < n / 4, s"bisect is not sub-linear: $measured jobs for N=$n")
    info(s"bisect: $measured Spark jobs for N=$n, bad=$bad (budget $budget)")

    // attribution is still exact: the two poison files, nothing else
    val q = spark.read.parquet(qDir)
      .select("path", "error", "batch_id").collect()
    assert(q.map(_.getString(0)).toSet == poison)
    assert(q.forall(_.getAs[Number]("batch_id").longValue == 7L))
    assert(q.forall(_.getString(1).contains("poison file")))
  }

  test("an all-poison batch quarantines every file and analyzes nothing") {
    val poison = (1 to 4).map(i => f"/land/f$i%05d.emd").toSet
    val files = mkFiles(4)
    val parse = poisonParse(poison)
    val qDir = java.nio.file.Files.createTempDirectory("graft-bisect-all").toString
    var analyzedGood = false
    Quarantine.run(spark, files, parse, qDir, batchId = 1L) { g =>
      noopAnalyze(parse)(g); analyzedGood = true
    }
    // first call analyze(files) fails; the replay-on-survivors never runs
    // because no survivors exist — but the batch still COMMITS (no throw)
    assert(!analyzedGood)
    assert(spark.read.parquet(qDir).select("path").collect()
      .map(_.getString(0)).toSet == poison)
  }

  test("a transient probe failure is infrastructure: the file survives un-quarantined") {
    QuarantineBisectSpec.transientCalls.set(0)
    val files = Seq(("/land/only.emd", 1L)).toDF("path", "payload")
    // fails the first two evaluations (the batch analyze + the first leaf
    // probe), passes from the third — the shape of an executor hiccup,
    // not a poison file
    val parse: DataFrame => DataFrame = df => {
      val fn = udf((v: Long) => {
        if (QuarantineBisectSpec.transientCalls.incrementAndGet() <= 2)
          throw new RuntimeException("executor lost (simulated transient)")
        v * 2
      })
      df.select(col("path"), fn(col("payload")).as("parsed"))
    }
    val qBase = java.nio.file.Files.createTempDirectory("graft-bisect-tr")
    val qDir = qBase.resolve("q").toString
    intercept[Exception] {
      Quarantine.run(spark, files, parse, qDir, batchId = 2L)(noopAnalyze(parse))
    }
    // rethrown as infrastructure: the stream retries the batch; the
    // healthy file is NEVER written to the quarantine (which would have
    // advanced the exactly-once gate past it permanently)
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(qDir)))
  }

  test("an interaction-dependent failure (groups fail, every leaf passes) attributes nothing") {
    // sweep #10c: a failure the per-file probes cannot reproduce — e.g.
    // resource exhaustion only at batch width — must leave `bad` empty so
    // run() rethrows the ORIGINAL failure as infrastructure; quarantining
    // any file here would be data loss the evidence never named
    val paths = (1 to 16).map(i => f"/land/f$i%05d.emd").toVector
    val probe: Vector[String] => Option[String] =
      g => if (g.size >= 2) Some("interaction failure") else None
    assert(Quarantine.bisect(paths, probe).isEmpty)
    assert(Quarantine.attribute(paths, probe).isEmpty)
  }

  test("run() rethrows the original failure when no per-file probe explains it") {
    val files = mkFiles(4)
    // fails whenever evaluated over MORE than one row (a global count
    // window makes every row see the subset's width): the batch analyze
    // and every group probe fail, every single-file probe passes
    val parse: DataFrame => DataFrame = df => {
      val w = org.apache.spark.sql.expressions.Window.partitionBy(lit(1))
      val fn = udf((n: Long) => {
        require(n <= 1, s"interaction-dependent: $n rows"); n
      })
      df.withColumn("n", count(lit(1)).over(w))
        .select(col("path"), fn(col("n")).as("ok"))
    }
    val qBase = java.nio.file.Files.createTempDirectory("graft-bisect-ix")
    val qDir = qBase.resolve("q").toString
    val ex = intercept[Exception] {
      Quarantine.run(spark, files, parse, qDir, batchId = 4L)(noopAnalyze(parse))
    }
    assert(Quarantine.rootMsg(ex).contains("interaction-dependent"),
      s"must rethrow the ORIGINAL batch failure, got: ${Quarantine.rootMsg(ex)}")
    // and nothing was quarantined (the gate must not advance past files
    // the evidence never named)
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(qDir)))
  }

  test("density guard: an all-poison batch pays ~2N probes, not the ~3N full tree") {
    val paths = (1 to 64).map(i => f"/land/f$i%05d.emd").toVector
    var probes = 0
    val probe: Vector[String] => Option[String] =
      g => { probes += 1; Some(s"poison group of ${g.size}") }
    val out = Quarantine.attribute(paths, probe)
    assert(out.map(_._1).toSet == paths.toSet, "attribution must stay exact")
    // two first-level halves + the density sample + one probe per file +
    // one retry per bad leaf — vs the full binary tree's 2N−1 group
    // probes + N leaf retries (191 here)
    val bound = 2 + Quarantine.DensitySampleK + 2 * paths.size
    assert(probes <= bound, s"linear fallback spent $probes probes (bound $bound)")
  }

  test("density guard: sparse poison straddling the midpoint stays on the tree") {
    val paths = (1 to 64).map(i => f"/land/f$i%05d.emd").toVector
    val poison = Set(paths(1), paths(62)) // both halves fail, sample clean
    var probes = 0
    val probe: Vector[String] => Option[String] = g => {
      probes += 1
      if (g.exists(poison)) Some("poison") else None
    }
    val out = Quarantine.attribute(paths, probe)
    assert(out.map(_._1).toSet == poison)
    assert(probes < paths.size,
      s"straddling-but-sparse poison must stay sub-linear, spent $probes")
  }

  test("rootMsg walks wrapped chains, survives null messages and self-causes") {
    val leaf = new IllegalArgumentException("refused by name: bad magic")
    val mid = new RuntimeException("stage failure", leaf)
    val top = new Exception("job aborted", mid)
    assert(Quarantine.rootMsg(top) == "refused by name: bad magic")
    // a chain cut by serialization (cause dropped): the wrapper's own text
    assert(Quarantine.rootMsg(new RuntimeException("task died remotely"))
      == "task died remotely")
    // a null-message root degrades to its class name, never null
    assert(Quarantine.rootMsg(new RuntimeException(null: String))
      == classOf[RuntimeException].getName)
    // self-referential cause terminates (initCause(this) is forbidden by
    // the JDK, but a custom getCause can still return itself)
    val selfRef = new RuntimeException("looped") {
      override def getCause: Throwable = this
    }
    assert(Quarantine.rootMsg(selfRef) == "looped")
  }
}

object QuarantineBisectSpec {
  /** Static (class-held) counter: task closures serialize even in local
    * mode, so a captured AtomicInteger would deserialize into per-task
    * copies — a static field re-resolves to the one JVM-wide instance.
    */
  val transientCalls = new java.util.concurrent.atomic.AtomicInteger
}
