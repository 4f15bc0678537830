package graft.sources

import graft.flows.FlowRun
import org.apache.spark.sql.{Dataset, Encoder, Encoders, SparkSession}

/** Marker-paginated ingestion (SURVEY §2 A6) — the reference's flow-run
  * listing loop (/root/reference/picoprobe/flow_analyzer.py:81-113): fetch
  * a page, follow the `marker` cursor while one is returned and the row
  * budget isn't exhausted, then filter and truncate.
  *
  * The paged fetch is inherently sequential driver-side work — a cursor
  * API yields page N+1 only after page N. That is fine at any scale
  * because what gets paginated is run METADATA (thousands of small
  * records), never the data itself; the result becomes a distributed
  * Dataset immediately, and everything downstream (the wide table, usage
  * aggregation) runs on the cluster.
  */
object Paginated {

  /** One page: items plus the cursor for the next page (None = last). */
  final case class Page[T](items: Seq[T], marker: Option[String])

  /** Follow markers until exhausted or `limit` rows are collected —
    * the reference's `while len(all_runs) < limit and runs["marker"]`.
    * `fetch(None)` produces the first page.
    */
  def fetchAll[T](limit: Int = Int.MaxValue)(fetch: Option[String] => Page[T]): Seq[T] = {
    val out = Seq.newBuilder[T]
    var collected = 0
    var cursor: Option[String] = None
    var done = false
    while (!done) {
      val page = fetch(cursor)
      // a server echoing the cursor back with an empty page makes no
      // progress — without this the loop spins forever (the hang is worse
      // than the error; a marker REUSED with nonempty items still
      // advances `collected` toward the limit, so only the empty echo is
      // unambiguously stuck)
      if (page.items.isEmpty && page.marker == cursor && cursor.nonEmpty)
        throw new IllegalStateException(
          s"pagination made no progress: marker ${cursor.get} returned " +
            "an empty page pointing at itself")
      out ++= page.items
      collected += page.items.size
      cursor = page.marker
      done = cursor.isEmpty || collected >= limit
    }
    out.result()
  }

  /** Paged fetch → distributed Dataset. */
  def toDS[T: Encoder](spark: SparkSession, limit: Int = Int.MaxValue)(
      fetch: Option[String] => Page[T]): Dataset[T] =
    spark.createDataset(fetchAll(limit)(fetch))

  /** The reference's exact flow-run listing semantics
    * (flow_analyzer.py:95-113): page through runs, keep SUCCEEDED, cut to
    * `limit` AFTER the status filter — a page fetched for budget may still
    * be dropped by status.
    */
  def flowRuns(spark: SparkSession, limit: Int = Int.MaxValue)(
      fetch: Option[String] => Page[FlowRun]): Dataset[FlowRun] = {
    implicit val enc: Encoder[FlowRun] = Encoders.product[FlowRun]
    val kept = fetchAll(limit)(fetch).filter(_.status == "SUCCEEDED").take(limit)
    spark.createDataset(kept)
  }
}
