package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Manual skew mitigation for joins whose hot keys overwhelm single
  * reducers (the technique AQE's skew-join applies automatically at
  * runtime; explicit salting is for when the skew is known ahead of time or
  * the join sits below an operator AQE can't split).
  *
  * The skewed side gets a deterministic salt in [0, salts) derived from a
  * caller-chosen discriminator column (NOT rand(): reruns must produce the
  * same partitioning for reproducible results); the other side is
  * replicated `salts` times. The join key becomes (key, salt), spreading
  * each hot key over `salts` reducers at the cost of replicating the
  * smaller side — the classic space-for-balance trade.
  */
object Skew {

  val SaltCol = "__graft_salt"

  /** Join `skewed` with `other` on `key`, spreading each key over `salts`
    * reducers. `discriminator` must vary within a key group (e.g. the
    * row's unique id) so rows of a hot key actually scatter.
    */
  /** Join types that preserve the REPLICATED side are rejected: a
    * right/full outer join would emit one null-extended row per salt
    * copy for an `other` key absent from `skewed` (salts× duplication),
    * and extra null-extended rows even for matched keys — salting is
    * only result-invisible when unmatched replicated rows are dropped.
    */
  private val SafeJoinTypes =
    Set("inner", "left", "leftouter", "left_outer", "cross",
      "semi", "leftsemi", "left_semi", "anti", "leftanti", "left_anti")

  def saltedJoin(skewed: DataFrame, other: DataFrame, key: String,
      discriminator: Column, salts: Int, joinType: String = "inner"): DataFrame = {
    require(salts > 0, "salts must be positive")
    require(SafeJoinTypes.contains(joinType.toLowerCase.replace(" ", "")),
      s"saltedJoin cannot preserve the replicated side: joinType=$joinType " +
        "would duplicate null-extended rows per salt copy (use the plain join)")
    require(!skewed.columns.contains(SaltCol) && !other.columns.contains(SaltCol),
      s"input already carries reserved column $SaltCol")
    val l = skewed.withColumn(SaltCol,
      pmod(xxhash64(discriminator), lit(salts.toLong)).cast("int"))
    val r = other.withColumn(SaltCol,
      explode(sequence(lit(0), lit(salts - 1))))
    l.join(r, Seq(key, SaltCol), joinType).drop(SaltCol)
  }
}
