package graft.stream

import graft.SparkSpec

/** Sweep #6, claim "StreamQueries replay with zero events" (sweep-5 dry
  * note) run as code: every registered streaming query over a corpus dir
  * whose tables are ZERO-row (schema preserved) must yield its empty
  * result, not crash in fixture synthesis. The conversion caught two
  * crashes the dry review missed: orderedReplay's quantile-split
  * destructured an EMPTY approxQuantile array (MatchError) and then
  * NPE'd on min(ts) of no rows; st6 read a results dir StreamingAnn
  * never creates when every batch is empty (PATH_NOT_FOUND).
  */
class StreamEmptySpec extends SparkSpec {

  private lazy val emptyDir: String = {
    val tmp = java.nio.file.Files.createTempDirectory("graft-st-empty")
      .toString
    Seq("events", "embeddings").foreach { t =>
      spark.read.parquet(s"$sf/$t.parquet").limit(0)
        .write.mode("overwrite").parquet(s"$tmp/$t.parquet")
    }
    tmp
  }

  for (q <- StreamQueries.all)
    test(s"${q.name} over a zero-event corpus returns an empty result") {
      assert(q.fn(spark, emptyDir).count() == 0L)
    }
}
