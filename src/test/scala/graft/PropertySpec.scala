package graft

import graft.expressions.HashOps
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Generative property tests (SURVEY §5 test strategy) over the hash/array
  * kernels — driven by scalacheck Gens with fixed seeds, so failures are
  * reproducible.
  */
class PropertySpec extends AnyFunSuite {

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private val textGen: Gen[String] =
    Gen.listOf(Gen.oneOf("alpha", "beta", "gamma", "delta", "x1", "y2", ""))
      .map(_.mkString(" "))

  private def arr(xs: Seq[Long]) =
    UnsafeArrayData.fromPrimitiveArray(xs.toArray)

  test("longDot: matches BigInt reference, symmetric, truncates to shorter") {
    val vecGen = Gen.listOfN(8, Gen.chooseNum(-1000000L, 1000000L))
    samples(Gen.zip(vecGen, vecGen), 200).foreach { case (a, b) =>
      val got = HashOps.longDot(arr(a), arr(b))
      val ref = a.zip(b).map { case (x, y) => BigInt(x) * BigInt(y) }.sum
      assert(BigInt(got) == ref)
      assert(got == HashOps.longDot(arr(b), arr(a)))
      assert(HashOps.longDot(arr(a), arr(b.take(3))) ==
        HashOps.longDot(arr(a.take(3)), arr(b)))
    }
  }

  test("jaccardSorted: range, symmetry, identity, disjoint") {
    val setGen = Gen.listOf(Gen.chooseNum(-1000L, 1000L)).map(_.distinct.sorted)
    samples(Gen.zip(setGen, setGen), 200).foreach { case (a, b) =>
      val j = HashOps.jaccardSorted(arr(a), arr(b))
      assert(j >= 0.0 && j <= 1.0)
      assert(j == HashOps.jaccardSorted(arr(b), arr(a)))
      if (a.nonEmpty) assert(HashOps.jaccardSorted(arr(a), arr(a)) == 1.0)
      val disjoint = b.map(_ + 5000L)
      assert(HashOps.jaccardSorted(arr(a), arr(disjoint)) == 0.0)
    }
  }

  test("shingleHashes: sorted, distinct, bounded count") {
    samples(textGen, 200).foreach { t =>
      val sh = HashOps.shingleHashes(UTF8String.fromString(t), 3).toLongArray()
      assert(sh.toSeq == sh.toSeq.sorted)
      assert(sh.toSet.size == sh.length)
      val nTokens = t.split(" ", -1).length
      assert(sh.length <= math.max(nTokens - 2, 0))
    }
  }

  test("simhash: deterministic, zero self-hamming, token-permutation bounded") {
    samples(textGen, 200).foreach { t =>
      val s1 = HashOps.simhash(UTF8String.fromString(t))
      val s2 = HashOps.simhash(UTF8String.fromString(t))
      assert(s1 == s2)
      // simhash is a bag-of-tokens vote: permuting tokens preserves it
      val perm = t.split(" ", -1).reverse.mkString(" ")
      assert(HashOps.simhash(UTF8String.fromString(perm)) == s1)
    }
  }

  test("minhash: signature length k, elementwise monotone under union") {
    val setGen = Gen.nonEmptyListOf(Gen.chooseNum(Long.MinValue / 2, Long.MaxValue / 2))
      .map(_.distinct.sorted)
    samples(Gen.zip(setGen, setGen), 100).foreach { case (a, b) =>
      val k = 16
      val sa = HashOps.minhash(arr(a), k).toLongArray()
      val su = HashOps.minhash(arr((a ++ b).distinct.sorted), k).toLongArray()
      assert(sa.length == k)
      // adding elements can only lower each min-hash coordinate
      assert(sa.zip(su).forall { case (x, u) => u <= x })
    }
  }

  test("rollingHash: order-sensitive where simhash is not") {
    val h1 = HashOps.rollingHash(UTF8String.fromString("a b c d"))
    val h2 = HashOps.rollingHash(UTF8String.fromString("d c b a"))
    assert(h1 != h2)
  }

  test("cosineF: bounded and symmetric on random vectors") {
    val vecGen = Gen.listOfN(16, Gen.chooseNum(-100, 100).map(_.toFloat / 10f))
    samples(Gen.zip(vecGen, vecGen), 200).foreach { case (a, b) =>
      if (a.exists(_ != 0f) && b.exists(_ != 0f)) {
        val x = UnsafeArrayData.fromPrimitiveArray(a.toArray)
        val y = UnsafeArrayData.fromPrimitiveArray(b.toArray)
        val c = HashOps.cosineF(x, y)
        assert(c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9)
        assert(c == HashOps.cosineF(y, x))
      }
    }
  }

  test("kgramHashes: positional count, order-kept, append-stable prefix") {
    samples(textGen, 200).foreach { t =>
      val u = UTF8String.fromString(t)
      val kg = HashOps.kgramHashes(u, 3).toLongArray()
      val nTokens = t.split(" ", -1).length
      assert(kg.length == math.max(nTokens - 2, 0))
      // each position hashes only its own window: appending a token adds
      // exactly one k-gram and leaves every existing position unchanged
      val appended = HashOps.kgramHashes(
        UTF8String.fromString(t + " zz"), 3).toLongArray()
      assert(appended.length == kg.length + (if (nTokens >= 2) 1 else 0))
      assert(appended.take(kg.length).sameElements(kg))
    }
  }

  test("kgramHashesMulti: per-width rows ≡ kgramHashes, grouped in ns order") {
    samples(textGen, 200).foreach { t =>
      val u = UTF8String.fromString(t)
      val ns = Array(4, 8, 16)
      val rows = HashOps.kgramHashesMulti(u, ns).toSeq
        .map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
      // the fused generator must be hash-identical per width to the
      // single-width kernel (t31's oracle depends on it), positions
      // consecutive from 0, widths emitted in ns order
      val expected = ns.toSeq.flatMap { n =>
        HashOps.kgramHashes(u, n).toLongArray().toSeq.zipWithIndex
          .map { case (h, i) => (n, i, h) }
      }
      assert(rows == expected)
    }
  }

  test("embedShingles: unit or zero norm; positive scaling never flips buckets") {
    val rnd = new scala.util.Random(7)
    val planes = Array.fill(2 * 6 * 32)(rnd.nextGaussian())
    samples(textGen, 150).foreach { t =>
      val v = HashOps.embedShingles(UTF8String.fromString(t), 3, 32)
      val xs = v.toFloatArray()
      val norm = math.sqrt(xs.map(x => x.toDouble * x).sum)
      assert(norm == 0.0 || math.abs(norm - 1.0) < 1e-6)
      // hyperplane buckets depend on direction only: scaling by an exact
      // positive power of two preserves every sign bit
      val scaled = UnsafeArrayData.fromPrimitiveArray(xs.map(_ * 4.0f))
      val b1 = HashOps.hyperplaneBuckets(v, planes, 6, 2).toLongArray()
      val b2 = HashOps.hyperplaneBuckets(scaled, planes, 6, 2).toLongArray()
      assert(b1.length == 2 && b1.sameElements(b2))
    }
  }

  test("BPE mergePair: concatenation preserved, length decreases by merge count") {
    val symGen = Gen.listOf(Gen.oneOf("a", "b", "c", "ab"))
    samples(symGen, 200).foreach { syms =>
      val merged = graft.text.BpeTrainer.mergePair(syms, "a", "b")
      assert(merged.mkString == syms.mkString)
      val pairs = syms.sliding(2).count(w => w == Seq("a", "b"))
      assert(merged.length >= syms.length - pairs)
      // greedy left-to-right: no adjacent (a, b) survives
      assert(!merged.sliding(2).exists(_ == Seq("a", "b")))
    }
  }

  test("nearestCell within nearCells head") {
    val vecGen = Gen.listOfN(8, Gen.chooseNum(-100, 100).map(_.toFloat / 10f))
      .suchThat(_.exists(_ != 0f))
    val cents = (0 until 4).flatMap(c =>
      (0 until 8).map(i => math.sin(c * 8 + i + 1.0))).toArray
    samples(vecGen, 100).foreach { v =>
      val x = UnsafeArrayData.fromPrimitiveArray(v.toArray)
      val cell = HashOps.nearestCell(x, cents, 4)
      val probes = HashOps.nearCells(x, cents, 4, 2).toIntArray()
      assert(probes.length == 2 && probes(0) == cell)
    }
  }

  // A NaN query element makes every centroid dot NaN; NaN never wins `>`,
  // so the selection's `best` stayed -1 and indexed taken(-1). Pinned: the
  // fallback fills lowest-id cells, consistent with nearestCell's cell 0.
  test("nearCells on a NaN-bearing vector returns lowest-id cells, no crash") {
    val cents = (0 until 4).flatMap(c =>
      (0 until 8).map(i => math.sin(c * 8 + i + 1.0))).toArray
    val nanVec = UnsafeArrayData.fromPrimitiveArray(
      Array.tabulate(8)(i => if (i == 3) Float.NaN else 0.5f))
    assert(HashOps.nearCells(nanVec, cents, 4, 2).toIntArray().toSeq == Seq(0, 1))
    assert(HashOps.nearestCell(nanVec, cents, 4) == 0)
  }

  test("bandHashes rejects a band count that does not divide the signature") {
    val sig = UnsafeArrayData.fromPrimitiveArray(Array.tabulate(64)(_.toLong))
    assert(HashOps.bandHashes(sig, 16).numElements() == 16) // divisible: fine
    // remainder would silently drop trailing entries from every band;
    // bands > length would hash every band to the constant seed
    val m13 = intercept[IllegalArgumentException](HashOps.bandHashes(sig, 13))
    assert(m13.getMessage.contains("must divide"))
    val m100 = intercept[IllegalArgumentException](HashOps.bandHashes(sig, 100))
    assert(m100.getMessage.contains("must divide"))
  }

  test("AVI mux → parse roundtrip over random frame counts and geometries") {
    val caseGen = Gen.zip(
      Gen.chooseNum(1, 25),  // frames
      Gen.chooseNum(1, 9),   // width
      Gen.chooseNum(1, 7))   // height
    samples(caseGen, 40).foreach { case (n, w, h) =>
      val jpegs = Seq.tabulate(n)(f =>
        graft.sinks.Artifacts.grayJpeg(w, h,
          Array.tabulate(w * h)(i => ((i * 13 + f * 29) & 0xFF).toByte)))
      val avi = graft.sinks.Artifacts.mjpegAvi(jpegs, w, h)
      val parsed = graft.multimodal.Codec.parseAvi(avi)
      assert(parsed.frameCount == n, s"($n,$w,$h)")
      // every frame decodes at the muxed geometry, grayscale
      Seq(0, n / 2, n - 1).distinct.foreach { f =>
        val (dw, dh, dc, px) = parsed.decodeFrame(f)
        assert((dw, dh, dc) == ((w, h, 1)))
        assert(px.length == w * h)
      }
    }
  }

  test("dense HDF5 groups roundtrip over random link counts (both heap layouts)") {
    samples(Gen.zip(Gen.chooseNum(1, 40), Gen.oneOf(false, true)), 12)
      .foreach { case (n, indirect) =>
        val w = new graft.sources.Hdf5TestWriter()
        val children = (0 until n).map { i =>
          val raw = java.nio.ByteBuffer.allocate(4)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(i * 3 + 1)
          f"n$i%03d" -> w.datasetV2(Seq(1L), w.int32, raw.array())
        }
        val g = graft.sources.Hdf5.open(
          w.finishV3(w.groupV2Dense(children, forceIndirect = indirect)))
        assert(g.datasets.size == n, s"n=$n indirect=$indirect")
        (0 until n).foreach { i =>
          val d = g.child(f"n$i%03d").get.asInstanceOf[graft.sources.Hdf5.Dataset]
          assert(d.readDoubles().toSeq == Seq(i * 3.0 + 1))
        }
      }
  }

  test("cms_order sort equals the reference (df, h) sort on random arrays") {
    import graft.expressions.CountMin
    // skewed grids: many collisions at small width force heavy df ties,
    // the branch the in-place quicksort must tiebreak by hash
    val width = 64
    val depth = 2
    val keyGen = Gen.listOf(Gen.chooseNum(Long.MinValue, Long.MaxValue))
      .map(_.distinct)
    samples(keyGen, 300).foreach { keys =>
      val counts = new Array[Long](width * depth)
      keys.foreach(k => CountMin.add(k, counts, width, depth))
      val got = HashOps.longs(
        CountMin.orderByEstimate(arr(keys), counts, width, depth)).toSeq
      val ref = keys
        .map(k => (CountMin.estimate(k, counts, width, depth), k))
        .sorted.map(_._2)
      assert(got == ref, s"n=${keys.size}")
    }
  }

  test("CMS never undercounts and merge equals single-pass on random bags") {
    val bagGen = Gen.listOf(Gen.chooseNum(-50L, 50L))
    samples(bagGen, 30).foreach { bag =>
      val w = 64; val d = 3
      val grid = new Array[Long](w * d)
      bag.foreach(v => graft.expressions.CountMin.add(v, grid, w, d))
      val truth = bag.groupBy(identity).view.mapValues(_.size.toLong)
      truth.foreach { case (v, n) =>
        assert(graft.expressions.CountMin.estimate(v, grid, w, d) >= n)
      }
      // split-merge identity: element-wise addition of two halves
      val (l, r) = bag.splitAt(bag.length / 2)
      val g1 = new Array[Long](w * d); l.foreach(graft.expressions.CountMin.add(_, g1, w, d))
      val g2 = new Array[Long](w * d); r.foreach(graft.expressions.CountMin.add(_, g2, w, d))
      val merged = g1.zip(g2).map { case (a, b) => a + b }
      assert(merged.toSeq == grid.toSeq)
    }
  }

  test("int8 quantization: bounded error, sign preserved, dot symmetric") {
    val vecGen = Gen.nonEmptyListOf(Gen.chooseNum(-8.0f, 8.0f))
    samples(Gen.zip(vecGen, vecGen), 25).foreach { case (xs0, ys0) =>
      val n = math.min(xs0.length, ys0.length)
      val xs = xs0.take(n); val ys = ys0.take(n)
      def q(v: Seq[Float]) = graft.expressions.Quant.quantBytes(
        UnsafeArrayData.fromPrimitiveArray(v.toArray))
      def s(v: Seq[Float]) = graft.expressions.Quant.quantScale(
        UnsafeArrayData.fromPrimitiveArray(v.toArray))
      val (qx, sx) = (q(xs), s(xs))
      xs.zip(qx).foreach { case (x, qi) =>
        assert(math.abs(qi * sx - x) <= sx / 2 + 1e-9)
        if (math.abs(x) > sx) assert(math.signum(qi.toDouble) == math.signum(x.toDouble))
      }
      val qy = q(ys)
      assert(graft.expressions.Quant.int8Dot(qx, qy) ==
        graft.expressions.Quant.int8Dot(qy, qx))
    }
  }

  test("WAV roundtrip is bit-exact over random PCM signals") {
    val pcmGen = Gen.nonEmptyListOf(
      Gen.chooseNum(Short.MinValue.toInt, Short.MaxValue.toInt).map(_.toShort))
    samples(Gen.zip(pcmGen, Gen.oneOf(8000, 16000, 44100)), 20)
      .foreach { case (pcm, rate) =>
        val bytes = graft.sinks.Artifacts.pcmWav(rate, pcm.toArray)
        val (r, got) = graft.multimodal.Codec.decodeWav(bytes)
        assert(r == rate && got.toSeq == pcm)
      }
  }

  test("vlen HDF5 strings roundtrip over random UTF-8 lists") {
    val strGen = Gen.listOf(Gen.oneOf("", "a", "token", "π≈3.14", "x" * 57))
    samples(strGen, 15).filter(_.nonEmpty).foreach { names =>
      val w = new graft.sources.Hdf5TestWriter()
      val ds = w.vlenStringDataset(names)
      val d = graft.sources.Hdf5.open(w.finish(w.group(Seq("s" -> ds)))).datasets.head
      assert(d.readStrings().toSeq == names, names.toString)
    }
  }
}
