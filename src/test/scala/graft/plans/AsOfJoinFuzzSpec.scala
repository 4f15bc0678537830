package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Generative cross-check of the custom merge exec against the
  * tag-union-window composition on random event sets — duplicate
  * timestamps, shared keys, keys on one side only, empty sides. Any
  * divergence in ordering requirements, tie-breaks or the two-pointer
  * advance shows up as a row diff here.
  */
class AsOfJoinFuzzSpec extends SparkSpec {

  import spark.implicits._

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(77L + i)))

  private val eventsGen: Gen[(List[(Long, Long, Long)], List[(Long, Long, Long)])] = {
    val row = for {
      k <- Gen.chooseNum(1L, 5L)
      t <- Gen.chooseNum(0L, 20L) // small domain → frequent exact ties
    } yield (k, t)
    for {
      nl <- Gen.chooseNum(0, 25)
      nr <- Gen.chooseNum(1, 25)
      ls <- Gen.listOfN(nl, row)
      rs <- Gen.listOfN(nr, row)
    } yield (
      ls.zipWithIndex.map { case ((k, t), i) => (k, t, 100L + i) },
      rs.zipWithIndex.map { case ((k, t), i) => (k, t, 900L + i) })
  }

  test("merge exec equals the window composition on random event sets") {
    samples(eventsGen, 20).foreach { case (ls, rs) =>
      val l = ls.toDF("k", "t", "lid")
      val r = rs.toDF("k", "t", "rid")
      val got = AsOf.lastBefore(l, r, "k", "t", "lid", "k", "t")
        .select(col("rid"),
          coalesce(col("lid"), lit(-1L)).as("lid"))
        .as[(Long, Long)].collect().toSet

      // reference: per right row, the max (t, lid) left row with same key
      // and t <= right t — computed naively in Scala
      val want = rs.map { case (rk, rt, rid) =>
        val cands = ls.filter { case (lk, lt, _) => lk == rk && lt <= rt }
        val best = if (cands.isEmpty) -1L
        else cands.maxBy { case (_, lt, lid) => (lt, lid) }._3
        (rid, best)
      }.toSet
      assert(got == want, s"left=$ls right=$rs\n got=$got\nwant=$want")
    }
  }
}
