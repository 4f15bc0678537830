package graft.sim

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.functions._

/** Cluster-scoped semantic dedup: planted near-copies are dropped against
  * their sources, kept/dropped partition the corpus, and the result is a
  * pure function of the input set (partitioning-invariant).
  */
class SemanticDedupSpec extends SparkSpec {

  import spark.implicits._

  private val K = 4

  private def aug = {
    val emb = Tables.load(spark, sf, "embeddings").select("vec_id", "embedding")
    emb.unionByName(
      emb.filter(col("vec_id") % 10 === 0)
        .select((col("vec_id") + 1000L).as("vec_id"),
          expr("""transform(embedding, (x, i) ->
                    CAST((CASE WHEN i = 0 THEN x * 1.02 + 0.01
                               ELSE x * 1.02 END) AS FLOAT))""").as("embedding")))
  }

  private def model = Ivf.train(aug, "embedding", K, 1)

  test("planted near-copies drop against their sources") {
    val m = model
    val cellOf = aug
      .select(col("vec_id"),
        graft.expressions.GraftExpressions.ivfCell(col("embedding"), m, K).as("cell"))
      .as[(Long, Int)].collect().toMap
    val dropped = SemanticDedup.dropped(aug, "vec_id", "embedding", m, K, 0.9)
      .select("vec_id", "dup_of").as[(Long, Long)].collect().toMap
    val sameCellPlants = cellOf.keys.filter(id =>
      id >= 1000L && cellOf(id) == cellOf(id - 1000L)).toSet
    assert(sameCellPlants.nonEmpty, "no planted copy landed in its source's cell")
    sameCellPlants.foreach { id =>
      assert(dropped.contains(id), s"planted $id not dropped")
      assert(dropped(id) == id - 1000L, s"planted $id dup_of ${dropped(id)}")
    }
    // background corpus has no cos >= 0.9 pairs: only plants drop
    assert(dropped.keySet.forall(_ >= 1000L), s"background vec dropped: $dropped")
  }

  test("kept and dropped partition the corpus") {
    val m = model
    val all = aug.select("vec_id").as[Long].collect().toSet
    val d = SemanticDedup.dropped(aug, "vec_id", "embedding", m, K, 0.9)
      .select("vec_id").as[Long].collect().toSet
    val k = SemanticDedup.kept(aug, "vec_id", "embedding", m, K, 0.9)
      .select("vec_id").as[Long].collect().toSet
    assert((d intersect k).isEmpty)
    assert((d union k) == all)
  }

  test("dropped set is partitioning-invariant") {
    val m = model
    def run(parts: Int) =
      SemanticDedup.dropped(aug.repartition(parts), "vec_id", "embedding", m, K, 0.9)
        .select("vec_id", "cell", "dup_of", "n_dups")
        .as[(Long, Int, Long, Long)].collect().toSet
    assert(run(1) == run(7))
  }
}
