package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** t26 paragraph dedup: the planted 10-word footer must dedup to its
  * first occurrence, and content-unique unplanted documents must
  * reassemble byte-identical. (The harness PLANTS exact-duplicate
  * documents for d1, and those legitimately lose all their blocks — the
  * spec restricts to first-occurrence texts.)
  */
class ParagraphDedupSpec extends SparkSpec {

  test("planted footer dedups to first occurrence; unique docs keep all") {
    val rows = TextQueries.t26ParagraphDedup.fn(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(rows.nonEmpty)

    // docs that are the FIRST occurrence of their text (d1-planted exact
    // duplicates excluded — they lose every block by design)
    val firstOfText = graft.core.Tables.load(spark, sf, "documents")
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(sha2(col("text"), 256)).orderBy("doc_id")))
      .filter(col("rn") === 1)
      .select("doc_id").collect().map(_.getLong(0)).toSet

    val planted = rows.filter { case (id, _, _) => id % 5 == 0 && firstOfText(id) }
    val firstPlanted = planted.minBy(_._1)
    assert(firstPlanted._2 == firstPlanted._3,
      s"first planted doc must keep everything: $firstPlanted")
    planted.filter(_._1 != firstPlanted._1).foreach { case (id, nb, nk) =>
      assert(nk < nb, s"doc $id kept all $nb blocks despite planted footer")
    }
  }

  test("controlled corpus: shared paragraphs drop, unique ones survive") {
    import spark.implicits._
    def words(tag: String) = (1 to 10).map(i => s"$tag$i").mkString(" ")
    val (a, b, c, d, e, f, g, h) = (words("a"), words("b"), words("c"),
      words("d"), words("e"), words("f"), words("g"), words("h"))
    val dir = java.nio.file.Files.createTempDirectory("graft-t26").toString
    Seq(
      (0L, s"$a $b"),  // planted (%5==0): footer + a + b, owns the footer
      (1L, s"$c $d"),  // owns c
      (2L, s"$e $f"),  // fully unique
      (3L, s"$c $g"),  // repeats doc 1's paragraph c -> drops it
      (5L, h)          // planted: its footer block dedups against doc 0
    ).toDF("doc_id", "text").coalesce(1)
      .write.parquet(s"$dir/documents.parquet")
    val got = TextQueries.t26ParagraphDedup.fn(spark, dir)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(got == Map(
      0L -> ((3L, 3L)), 1L -> ((2L, 2L)), 2L -> ((2L, 2L)),
      3L -> ((2L, 1L)), 5L -> ((2L, 1L))))
  }
}
