package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.{DateType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Contract registry for DAY-partitioned stores whose partition column is
  * DERIVED from an epoch column: `dayCol = utc_day(tsCol)` with `tsCol`
  * ns-since-epoch. The optimizer rule below may then translate
  * epoch-range predicates into partition-directory bounds. In a
  * production deployment this is a table property (Delta/Iceberg
  * generated-column metadata); here the contract lives in TWO places
  * with the same vouching rule — the rule NEVER fires on a path whose
  * derivation it cannot vouch for, because a same-named column pair with
  * a different derivation would make the rewrite wrong:
  *
  *  - an in-memory registry ([[register]]) for tables laid out in this
  *    JVM, and
  *  - a `_graft_meta.json` sidecar the WRITER persists next to the table
  *    root ([[persist]] — the [[graft.layout.LayoutQueries]] b3 writer
  *    calls it), so a FRESH session prunes with the registry cold: the
  *    contract travels with the data, like parquet's own `_metadata`
  *    family. Sidecar reads are memoized per path (positive and
  *    negative) — one filesystem probe per root per JVM, not one per
  *    optimizer pass.
  *
  * A sidecar is metadata ABOUT the data, and the two can drift: a table
  * rewritten in place by a non-Spark tool (or a foreign tool's
  * same-named file) would leave a contract the data no longer
  * satisfies, and pruning on it would silently DROP rows. So the
  * sidecar path SPOT-CHECKS the derivation before trusting it: read one
  * day directory's parquet footer and require the ts column's min/max
  * statistics to floor into that directory's day. Any inconsistency —
  * no hive-style `dayCol=` directories, no parquet footer, missing
  * stats, out-of-day bounds, or any exception — fails CLOSED (the
  * filter stays; only the pruning is lost). The check is one footer
  * read, memoized with the contract itself: still one probe per root
  * per JVM. The in-memory [[register]] path is the caller explicitly
  * vouching and is not re-checked.
  */
object DerivedPartitions {
  val MetaFile = "_graft_meta.json"

  private val reg =
    new java.util.concurrent.ConcurrentHashMap[String, (String, String)]()
  private val metaCache =
    new java.util.concurrent.ConcurrentHashMap[String, Option[(String, String)]]()

  /** Cache/registry key: the FULLY QUALIFIED path URI (scheme + authority
    * + path). Keying on the bare path alone would let same-pathed tables
    * on different filesystems or buckets (s3a://prod/tables/events vs
    * s3a://staging/tables/events) share one contract entry — and pruning
    * on a contract vouched for a DIFFERENT store silently drops rows.
    */
  private def cacheKey(p: org.apache.hadoop.fs.Path,
      conf: org.apache.hadoop.conf.Configuration): String =
    p.getFileSystem(conf).makeQualified(p).toUri.toString

  def register(path: String, tsCol: String = "ts",
      dayCol: String = "event_day"): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    reg.put(cacheKey(p, new org.apache.hadoop.conf.Configuration()),
      (tsCol, dayCol))
    ()
  }

  /** Write the derivation contract next to the table root. Works on any
    * Hadoop filesystem (the store a 100 TB table actually lives on). */
  def persist(path: String, conf: org.apache.hadoop.conf.Configuration,
      tsCol: String = "ts", dayCol: String = "event_day"): Unit = {
    val p = new org.apache.hadoop.fs.Path(path, MetaFile)
    val fs = p.getFileSystem(conf)
    val out = fs.create(p, true)
    try out.write(
      s"""{"derived_partitions":{"ts_col":"$tsCol","day_col":"$dayCol"}}"""
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    // drop a stale negative probe from before the file existed
    metaCache.remove(cacheKey(new org.apache.hadoop.fs.Path(path), conf))
    ()
  }

  /** The contract for a relation's root paths — defined only when EVERY
    * root vouches and all roots agree on one (tsCol, dayCol). First-match
    * semantics would let a single vouched root speak for sibling roots in
    * a multi-path read (spark.read.parquet(pathA, pathB)) whose derivation
    * nobody vouched for — pruning the whole relation on pathA's contract
    * would silently drop pathB's rows. */
  def lookup(rootPaths: Seq[org.apache.hadoop.fs.Path],
      conf: => org.apache.hadoop.conf.Configuration): Option[(String, String)] = {
    if (rootPaths.isEmpty) return None
    val c = conf
    val contracts = rootPaths.map { p =>
      val key = cacheKey(p, c)
      Option(reg.get(key))
        .orElse(metaCache.computeIfAbsent(key, _ => readMeta(p, c)))
    }
    contracts.head.filter(first =>
      contracts.forall(_.contains(first)))
  }

  private def readMeta(root: org.apache.hadoop.fs.Path,
      conf: org.apache.hadoop.conf.Configuration): Option[(String, String)] =
    try {
      val p = new org.apache.hadoop.fs.Path(root, MetaFile)
      val fs = p.getFileSystem(conf)
      if (!fs.exists(p)) None
      else {
        val in = fs.open(p)
        val bos = new java.io.ByteArrayOutputStream()
        org.apache.hadoop.io.IOUtils.copyBytes(in, bos, 4096, true)
        val txt = bos.toString("UTF-8")
        if (!txt.contains("\"derived_partitions\"")) None
        else (for {
          ts <- """"ts_col"\s*:\s*"([^"]+)"""".r.findFirstMatchIn(txt)
          day <- """"day_col"\s*:\s*"([^"]+)"""".r.findFirstMatchIn(txt)
        } yield (ts.group(1), day.group(1)))
          .filter { case (ts, day) => spotCheck(root, fs, ts, day) }
      }
    } catch {
      // NonFatal, not just IOException: a RuntimeException from FS
      // resolution (bad scheme, conf) must not fail PLANNING for every
      // query touching the path — it costs the pruning, nothing else.
      // computeIfAbsent caches the None, so the failure is probed once.
      case scala.util.control.NonFatal(e) =>
        System.err.println(
          s"[graft] DerivedPartitions: sidecar probe failed for $root " +
            s"(pruning disabled for this root): $e")
        None
    }

  private val NsPerDay = 86_400_000_000_000L

  /** Verify the persisted contract against the data it describes: pick
    * one `dayCol=yyyy-MM-dd` directory, read one parquet footer, and
    * require the ts column's min AND max statistics to floor into that
    * directory's day. False (fail closed) on any shape mismatch.
    */
  private def spotCheck(root: org.apache.hadoop.fs.Path,
      fs: org.apache.hadoop.fs.FileSystem, tsCol: String,
      dayCol: String): Boolean = {
    val prefix = dayCol + "="
    val dayDir = fs.listStatus(root).iterator
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(prefix))
      .take(1).toSeq.headOption
    dayDir.exists { d =>
      val epochDay = java.time.LocalDate
        .parse(d.getPath.getName.stripPrefix(prefix)).toEpochDay
      val file = fs.listStatus(d.getPath).iterator.filter { s =>
        val n = s.getPath.getName
        s.isFile && n.endsWith(".parquet") && !n.startsWith("_") && !n.startsWith(".")
      }.take(1).toSeq.headOption
      file.exists { f =>
        val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
          org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
            f.getPath, fs.getConf))
        try {
          import scala.jdk.CollectionConverters._
          val stats = reader.getFooter.getBlocks.asScala.iterator
            .flatMap(_.getColumns.asScala)
            .filter(_.getPath.toDotString == tsCol)
            .map(_.getStatistics).toSeq
          stats.nonEmpty && stats.forall {
            case s: org.apache.parquet.column.statistics.LongStatistics
                if s.hasNonNullValue =>
              Math.floorDiv(s.genericGetMin, NsPerDay) == epochDay &&
                Math.floorDiv(s.genericGetMax, NsPerDay) == epochDay
            case _ => false
          }
        } finally reader.close()
      }
    }
  }
}

/** PARTITION-DIRECTORY pruning for epoch-range filters over a
  * day-partitioned store (the [[TsRangePushdown]] mechanism, one level
  * up the storage hierarchy): `ts >= L` on a registered relation implies
  * `event_day >= utc_day(L)` — a bare partition-attribute comparison
  * that Catalyst turns into `PartitionFilters`, so a time-sliced query
  * over a 100 TB events store lists and reads only the matching day
  * directories instead of every footer in the table.
  *
  * Bounds are conservative by construction (day flooring admits a
  * superset; the exact ts predicate always remains) and sharpened on
  * exclusive edges: `ts < U ⟹ day ≤ utc_day(U−1)`, so a midnight-aligned
  * upper bound excludes the whole next day. Idempotent — a semantically
  * present bound is not re-added.
  */
object DerivedPartitionPushdown extends Rule[LogicalPlan] {

  private val NsPerDay = 86_400_000_000_000L

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      contract(child) match {
        // day ∈ child.outputSet: the relation is found ANYWHERE beneath
        // the Filter (collectFirst), so an intermediate Project/Window may
        // have pruned the partition column — referencing it from the
        // rewritten Filter would fail attribute binding at physical
        // planning. No pruning is possible then; leave the Filter alone.
        case Some((ts, day)) if child.outputSet.contains(day) =>
          val conjuncts = split(cond)
          // dedup against existing conjuncts AND previously added bounds:
          // two conjuncts can imply the same day bound (ts >= L and
          // ts > L-1), and appending it twice evaluates the partition
          // predicate twice per directory
          val implied = conjuncts.flatMap(impliedDayBound(_, ts, day))
            .foldLeft(Seq.empty[Expression]) { (acc, b) =>
              if ((conjuncts ++ acc).exists(_.semanticEquals(b))) acc
              else acc :+ b
            }
          if (implied.isEmpty) f
          else Filter((conjuncts ++ implied).reduce(And), child)
        case _ => f
      }
  }

  /** The (epoch attribute, partition attribute) pair when `plan` scans a
    * registered derived-day store and both columns are live.
    */
  private def contract(plan: LogicalPlan): Option[(Attribute, Attribute)] =
    plan.collectFirst {
      case lr @ LogicalRelation(rel: HadoopFsRelation, _, _, _, _) =>
        DerivedPartitions.lookup(rel.location.rootPaths,
          rel.sparkSession.sessionState.newHadoopConf()).flatMap {
          case (tsCol, dayCol) =>
            for {
              ts <- lr.output.find(a => a.name == tsCol && a.dataType == LongType)
              day <- lr.output.find(a => a.name == dayCol &&
                (a.dataType == DateType || a.dataType == StringType))
            } yield (ts, day)
        }
    }.flatten

  /** Partition-column literal for a days-since-epoch value, matching the
    * inferred partition type (DateType normally; StringType when
    * partition type inference is off — ISO yyyy-MM-dd compares
    * chronologically either way).
    */
  private def dayLit(days: Long, day: Attribute): Literal = day.dataType match {
    case DateType => Literal(days.toInt, DateType)
    case _ =>
      Literal(UTF8String.fromString(
        java.time.LocalDate.ofEpochDay(days).toString), StringType)
  }

  private def impliedDayBound(e: Expression, ts: Attribute,
      day: Attribute): Option[Expression] = {
    def dayOf(ns: Long): Long = Math.floorDiv(ns, NsPerDay)
    e match {
      case GreaterThanOrEqual(a: Attribute, Literal(l: Long, LongType))
          if a.semanticEquals(ts) =>
        Some(GreaterThanOrEqual(day, dayLit(dayOf(l), day)))
      case GreaterThan(a: Attribute, Literal(l: Long, LongType))
          if a.semanticEquals(ts) => // ts > L ≡ ts ≥ L+1
        Some(GreaterThanOrEqual(day, dayLit(dayOf(l + 1), day)))
      case LessThanOrEqual(a: Attribute, Literal(l: Long, LongType))
          if a.semanticEquals(ts) =>
        Some(LessThanOrEqual(day, dayLit(dayOf(l), day)))
      case LessThan(a: Attribute, Literal(l: Long, LongType))
          if a.semanticEquals(ts) => // ts < U ≡ ts ≤ U−1
        Some(LessThanOrEqual(day, dayLit(dayOf(l - 1), day)))
      case EqualTo(a: Attribute, Literal(l: Long, LongType))
          if a.semanticEquals(ts) =>
        Some(EqualTo(day, dayLit(dayOf(l), day)))
      // literal-first spellings
      case GreaterThanOrEqual(Literal(l: Long, LongType), a: Attribute)
          if a.semanticEquals(ts) =>
        Some(LessThanOrEqual(day, dayLit(dayOf(l), day)))
      case GreaterThan(Literal(l: Long, LongType), a: Attribute)
          if a.semanticEquals(ts) =>
        Some(LessThanOrEqual(day, dayLit(dayOf(l - 1), day)))
      case LessThanOrEqual(Literal(l: Long, LongType), a: Attribute)
          if a.semanticEquals(ts) =>
        Some(GreaterThanOrEqual(day, dayLit(dayOf(l), day)))
      case LessThan(Literal(l: Long, LongType), a: Attribute)
          if a.semanticEquals(ts) =>
        Some(GreaterThanOrEqual(day, dayLit(dayOf(l + 1), day)))
      case EqualTo(Literal(l: Long, LongType), a: Attribute)
          if a.semanticEquals(ts) =>
        Some(EqualTo(day, dayLit(dayOf(l), day)))
      case _ => None
    }
  }

  private def split(e: Expression): Seq[Expression] = e match {
    case And(l, r) => split(l) ++ split(r)
    case other => Seq(other)
  }
}
