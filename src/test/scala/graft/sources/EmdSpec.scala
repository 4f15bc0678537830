package graft.sources

import graft.SparkSpec
import graft.pipelines.HyperspectralPipeline
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** HDF5/EMD ingestion (SURVEY §2 A4): binary-format roundtrips through a
  * field-for-field spec-conformant fixture writer, Velox signal listing
  * with squeeze semantics, and the production pipeline end to end over a
  * real `.emd` container.
  */
class EmdSpec extends SparkSpec {

  test("HDF5 contiguous dataset roundtrip (uint16, 3-D)") {
    val w = new Hdf5TestWriter()
    val dims = Seq(3L, 4L, 5L)
    val values = (0 until 60).map(_ * 7 % 1000)
    val raw = java.nio.ByteBuffer.allocate(120)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    values.foreach(v => raw.putShort(v.toShort))
    val ds = w.dataset(dims, w.uint16, raw.array())
    val root = w.group(Seq("cube" -> ds))
    val g = Hdf5.open(w.finish(root))
    val d = g.datasets.find(_.name == "cube").get
    assert(d.dims == Vector(3L, 4L, 5L))
    assert(d.dtype == Hdf5.Dtype(0, 2, signed = false))
    assert(d.readDoubles().toSeq == values.map(_.toDouble))
  }

  test("HDF5 compact-layout dataset (class 0, data inline in the header)") {
    val w = new Hdf5TestWriter()
    val values = Seq(42, 7, 1999, 0, 65535)
    val raw = java.nio.ByteBuffer.allocate(values.size * 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    values.foreach(v => raw.putShort(v.toShort))
    val compact = w.compactDataset(Seq(values.size.toLong), w.uint16, raw.array())
    // mixed file: a compact signal next to a contiguous one, both readable
    val contiguous = w.dataset(Seq(values.size.toLong), w.uint16, raw.array())
    val g = Hdf5.open(w.finish(w.group(Seq(
      "meta_axis" -> compact, "data" -> contiguous))))
    val dc = g.child("meta_axis").get.asInstanceOf[Hdf5.Dataset]
    assert(dc.dims == Vector(values.size.toLong))
    assert(dc.readDoubles().toSeq == values.map(_.toDouble))
    val dd = g.child("data").get.asInstanceOf[Hdf5.Dataset]
    assert(dd.readDoubles().toSeq == dc.readDoubles().toSeq)
  }

  test("HDF5 chunked+deflate dataset roundtrip with edge chunks") {
    val w = new Hdf5TestWriter()
    val dims = Seq(5L, 3L)
    val values = (0 until 15).map(i => i * 1.5 - 3.25)
    val raw = java.nio.ByteBuffer.allocate(120)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    values.foreach(raw.putDouble)
    // 2x2 chunks over a 5x3 extent: edge chunks are partial in both axes
    val ds = w.chunkedDataset(dims, w.float64, raw.array(), Seq(2, 2))
    val root = w.group(Seq("m" -> ds))
    val d = Hdf5.open(w.finish(root)).datasets.head
    assert(d.readDoubles().toSeq == values)
  }

  test("HDF5 nested groups navigate by name") {
    val w = new Hdf5TestWriter()
    val leaf = w.dataset(Seq(2L), w.int32,
      java.nio.ByteBuffer.allocate(8).order(java.nio.ByteOrder.LITTLE_ENDIAN)
        .putInt(-5).putInt(9).array())
    val inner = w.group(Seq("payload" -> leaf))
    val outer = w.group(Seq("level2" -> inner))
    val root = w.group(Seq("level1" -> outer))
    val g = Hdf5.open(w.finish(root))
    val d = g.child("level1").get.asInstanceOf[Hdf5.Group]
      .child("level2").get.asInstanceOf[Hdf5.Group]
      .datasets.head
    assert(d.readDoubles().toSeq == Seq(-5.0, 9.0))
  }

  test("HDF5 v2 framing: superblock v3, OHDR headers, compact links") {
    val w = new Hdf5TestWriter()
    val values = (0 until 24).map(i => i * 0.5 - 3)
    val raw = java.nio.ByteBuffer.allocate(24 * 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    values.foreach(raw.putDouble)
    val ds = w.datasetV2(Seq(2L, 3L, 4L), w.float64, raw.array())
    val inner = w.groupV2(Seq("Data" -> ds))
    val root = w.groupV2(Seq("grp" -> inner))
    val g = Hdf5.open(w.finishV3(root))
    val d = g.child("grp").get.asInstanceOf[Hdf5.Group].datasets.head
    assert(d.dims == Vector(2L, 3L, 4L))
    assert(d.readDoubles().toSeq == values)
  }

  test("HDF5 mixed framing: v3 superblock, OHDR groups, v1 dataset headers") {
    // the object-header version is per object — a new-style group may
    // point at old-style children (and libraries do produce such files)
    val w = new Hdf5TestWriter()
    val raw = java.nio.ByteBuffer.allocate(8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(11).putInt(-4)
    val oldDs = w.dataset(Seq(2L), w.int32, raw.array())
    val root = w.groupV2(Seq("x" -> oldDs))
    val g = Hdf5.open(w.finishV3(root))
    assert(g.datasets.head.readDoubles().toSeq == Seq(11.0, -4.0))
  }

  test("HDF5 dense (fractal-heap) group storage: >8 links, root direct block") {
    // h5py libver='latest' switches to dense link storage past 8 links
    val w = new Hdf5TestWriter()
    val children = (0 until 12).map { i =>
      val raw = java.nio.ByteBuffer.allocate(8)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(i * 10).putInt(i * 10 + 1)
      s"ds_$i" -> w.datasetV2(Seq(2L), w.int32, raw.array())
    }
    val root = w.groupV2Dense(children)
    val g = Hdf5.open(w.finishV3(root))
    assert(g.datasets.map(_.name).sorted ==
      (0 until 12).map(i => s"ds_$i").sorted.toVector)
    (0 until 12).foreach { i =>
      val d = g.child(s"ds_$i").get.asInstanceOf[Hdf5.Dataset]
      assert(d.readDoubles().toSeq == Seq(i * 10.0, i * 10.0 + 1))
    }
  }

  test("HDF5 dense group: depth-1 v2 B-tree name index (BTIN + two leaves)") {
    // very large groups split the link-name index past one leaf; the
    // walk must merge internal-node separator records with both leaves
    val w = new Hdf5TestWriter()
    val children = (0 until 15).map { i =>
      val raw = java.nio.ByteBuffer.allocate(8)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(i * 3).putInt(i * 3 + 1)
      f"deep_$i%02d" -> w.datasetV2(Seq(2L), w.int32, raw.array())
    }
    val root = w.groupV2Dense(children, deepNameIndex = true)
    val g = Hdf5.open(w.finishV3(root))
    assert(g.datasets.map(_.name).sorted ==
      (0 until 15).map(i => f"deep_$i%02d").toVector)
    (0 until 15).foreach { i =>
      val d = g.child(f"deep_$i%02d").get.asInstanceOf[Hdf5.Dataset]
      assert(d.readDoubles().toSeq == Seq(i * 3.0, i * 3.0 + 1))
    }
  }

  test("HDF5 dense group: FILTERED fractal heap (deflated root block)") {
    val w = new Hdf5TestWriter()
    val children = (0 until 9).map { i =>
      val raw = java.nio.ByteBuffer.allocate(8)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(i * 7).putInt(i * 7 + 1)
      s"z_$i" -> w.datasetV2(Seq(2L), w.int32, raw.array())
    }
    val root = w.groupV2Dense(children, deflateHeap = true)
    val g = Hdf5.open(w.finishV3(root))
    assert(g.datasets.map(_.name).sorted ==
      (0 until 9).map(i => s"z_$i").sorted.toVector)
    (0 until 9).foreach { i =>
      val d = g.child(s"z_$i").get.asInstanceOf[Hdf5.Dataset]
      assert(d.readDoubles().toSeq == Seq(i * 7.0, i * 7.0 + 1))
    }
  }

  test("HDF5 dense group: FILTERED INDIRECT heap (per-child stored sizes in FHIB)") {
    // the deflated INDIRECT form: no root size/mask in the FRHP tail;
    // each FHIB entry carries {addr, stored size, filter mask} and each
    // direct block inflates on its own — the round-4 fail-fast corner
    val w = new Hdf5TestWriter()
    val children = (0 until 14).map { i =>
      val raw = java.nio.ByteBuffer.allocate(4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(2000 + i)
      f"packed_name_$i%02d" -> w.datasetV2(Seq(1L), w.int32, raw.array())
    }
    val root = w.groupV2Dense(children, forceIndirect = true, deflateHeap = true)
    val g = Hdf5.open(w.finishV3(root))
    assert(g.datasets.size == 14)
    (0 until 14).foreach { i =>
      val d = g.child(f"packed_name_$i%02d").get.asInstanceOf[Hdf5.Dataset]
      assert(d.readDoubles().toSeq == Seq(2000.0 + i))
    }
  }

  test("HDF5 variable-length SEQUENCES resolve through the global heap") {
    // ragged numeric rows — h5py's vlen_dtype — over two base types,
    // including an empty row (all-zero descriptor, no heap object)
    val w = new Hdf5TestWriter()
    val f64Rows = Seq(Seq(1.5, -2.25, 3.0), Seq.empty[Double], Seq(42.0))
    val i32Rows = Seq(Seq(7.0), Seq(-1.0, 0.0, 1.0, 2.0))
    val dsF = w.vlenSeqDataset(f64Rows, w.float64)
    val dsI = w.vlenSeqDataset(i32Rows, w.int32)
    val root = w.group(Seq("f" -> dsF, "i" -> dsI))
    val g = Hdf5.open(w.finish(root))
    val f = g.child("f").get.asInstanceOf[Hdf5.Dataset]
    assert(f.dtype.clazz == 9 && f.dtype.base.exists(_.clazz == 1))
    assert(f.readVlenSeqs().map(_.toSeq).toSeq == f64Rows)
    val i = g.child("i").get.asInstanceOf[Hdf5.Dataset]
    assert(i.dtype.base.exists(b => b.clazz == 0 && b.size == 4 && b.signed))
    assert(i.readVlenSeqs().map(_.toSeq).toSeq == i32Rows)
    // fixed-length string decode must still refuse sequence datasets
    intercept[Exception](f.readStrings())
    // and a plain numeric dataset must refuse readVlenSeqs
    val plain = new Hdf5TestWriter()
    val raw = java.nio.ByteBuffer.allocate(8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(1).putInt(2)
    val pd = plain.dataset(Seq(2L), plain.int32, raw.array())
    val pg = Hdf5.open(plain.finish(plain.group(Seq("p" -> pd))))
    intercept[IllegalArgumentException](
      pg.child("p").get.asInstanceOf[Hdf5.Dataset].readVlenSeqs())
  }

  test("HDF5 dense group: tiny and huge heap IDs next to managed ones") {
    // tiny: link message bytes packed INSIDE the heap ID; huge (direct,
    // unfiltered): ID carries the object's own file extent
    val w = new Hdf5TestWriter()
    val children = (0 until 10).map { i =>
      val raw = java.nio.ByteBuffer.allocate(8)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(i * 5).putInt(i * 5 + 1)
      // single-char names keep the tiny link bodies <= 16 bytes
      ('a' + i).toChar.toString -> w.datasetV2(Seq(2L), w.int32, raw.array())
    }
    val root = w.groupV2Dense(children,
      tinyOf = Set("b", "e"), hugeOf = Set("c", "h"))
    val g = Hdf5.open(w.finishV3(root))
    assert(g.datasets.map(_.name).sorted ==
      (0 until 10).map(i => ('a' + i).toChar.toString).toVector)
    (0 until 10).foreach { i =>
      val d = g.child(('a' + i).toChar.toString).get.asInstanceOf[Hdf5.Dataset]
      assert(d.readDoubles().toSeq == Seq(i * 5.0, i * 5.0 + 1))
    }
  }

  test("HDF5 v4 layout: single-chunk, implicit, and fixed-array indexes") {
    // libver-latest chunked datasets carry a version-4 layout message
    // with a typed chunk index instead of the v1 B-tree; cover all three
    // fixed-shape index types, filtered and not, with edge chunks
    val dims = Seq(5L, 7L)
    val n = 35
    val raw = java.nio.ByteBuffer.allocate(n * 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    (0 until n).foreach(i => raw.putInt(i * 3 + 1))
    def read(build: Hdf5TestWriter => Long): Seq[Double] = {
      val w = new Hdf5TestWriter()
      val ds = build(w)
      val g = Hdf5.open(w.finishV3(w.groupV2(Seq("d" -> ds))))
      g.child("d").get.asInstanceOf[Hdf5.Dataset].readDoubles().toSeq
    }
    val want = (0 until n).map(i => (i * 3 + 1).toDouble)
    assert(read(w =>
      w.chunkedDatasetV4(dims, w.int32, raw.array(), Seq(5, 7), "single")) == want)
    assert(read(w => w.chunkedDatasetV4(dims, w.int32, raw.array(), Seq(5, 7),
      "single", deflateLevel = 6)) == want)
    assert(read(w =>
      w.chunkedDatasetV4(dims, w.int32, raw.array(), Seq(2, 3), "implicit")) == want)
    assert(read(w =>
      w.chunkedDatasetV4(dims, w.int32, raw.array(), Seq(2, 3), "fixedarray")) == want)
    assert(read(w => w.chunkedDatasetV4(dims, w.int32, raw.array(), Seq(2, 3),
      "fixedarray", deflateLevel = 6)) == want)
  }

  test("HDF5 dense group: huge IDs in B-tree-indexed and filtered sub-forms") {
    // the three huge sub-forms beyond direct-unfiltered: indexed plain
    // (v2 B-tree record type 1), direct filtered (29-byte IDs carrying
    // stored size + filter mask + de-filtered size), indexed filtered
    // (record type 2) — libhdf5 picks among them by heap-ID length and
    // pipeline presence, which is exactly how the reader dispatches
    def build(deflateHeap: Boolean, hugeIndexed: Boolean): Unit = {
      val w = new Hdf5TestWriter()
      val children = (0 until 8).map { i =>
        val raw = java.nio.ByteBuffer.allocate(8)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(i * 7).putInt(i * 7 + 3)
        ('a' + i).toChar.toString -> w.datasetV2(Seq(2L), w.int32, raw.array())
      }
      val root = w.groupV2Dense(children, hugeOf = Set("b", "f"),
        deflateHeap = deflateHeap, hugeIndexed = hugeIndexed)
      val g = Hdf5.open(w.finishV3(root))
      assert(g.datasets.size == 8,
        s"deflateHeap=$deflateHeap hugeIndexed=$hugeIndexed")
      (0 until 8).foreach { i =>
        val d = g.child(('a' + i).toChar.toString).get.asInstanceOf[Hdf5.Dataset]
        assert(d.readDoubles().toSeq == Seq(i * 7.0, i * 7.0 + 3))
      }
    }
    build(deflateHeap = false, hugeIndexed = true) // record type 1
    build(deflateHeap = true, hugeIndexed = false) // direct filtered
    build(deflateHeap = true, hugeIndexed = true)  // record type 2
  }

  test("HDF5 dense group: root INDIRECT block spanning several direct blocks") {
    val w = new Hdf5TestWriter()
    val children = (0 until 14).map { i =>
      val raw = java.nio.ByteBuffer.allocate(4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(1000 + i)
      f"longer_name_$i%02d" -> w.datasetV2(Seq(1L), w.int32, raw.array())
    }
    val root = w.groupV2Dense(children, forceIndirect = true)
    val g = Hdf5.open(w.finishV3(root))
    assert(g.datasets.size == 14)
    (0 until 14).foreach { i =>
      val d = g.child(f"longer_name_$i%02d").get.asInstanceOf[Hdf5.Dataset]
      assert(d.readDoubles().toSeq == Seq(1000.0 + i))
    }
  }

  test("HDF5 v2 filter-pipeline message (libver-latest): no name fields, no padding") {
    val w = new Hdf5TestWriter()
    val dims = Seq(4L, 3L)
    val values = (0 until 12).map(i => i * 2.25 - 5)
    val raw = java.nio.ByteBuffer.allocate(96)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    values.foreach(raw.putDouble)
    val ds = w.chunkedDataset(dims, w.float64, raw.array(), Seq(2, 2),
      filterMsgVersion = 2)
    val g = Hdf5.open(w.finishV3(w.groupV2(Seq("z" -> ds))))
    assert(g.datasets.head.readDoubles().toSeq == values)
  }

  test("HDF5 fixed-length string dataset decodes with padding trimmed") {
    val w = new Hdf5TestWriter()
    val names = Seq("haadf", "eds-spectrum", "x")
    val width = 16
    val raw = new Array[Byte](names.size * width)
    names.zipWithIndex.foreach { case (s, i) =>
      System.arraycopy(s.getBytes("UTF-8"), 0, raw, i * width, s.length)
    }
    val ds = w.dataset(Seq(names.size.toLong), w.fixedString(width), raw)
    val d = Hdf5.open(w.finish(w.group(Seq("labels" -> ds)))).datasets.head
    assert(d.dtype.clazz == 3)
    assert(d.readStrings().toSeq == names)
  }

  test("HDF5 variable-length strings resolve through the global heap") {
    val w = new Hdf5TestWriter()
    val names = Seq("haadf", "", "a much longer variable-length label — π≈3.14159",
      "x")
    val ds = w.vlenStringDataset(names)
    val d = Hdf5.open(w.finish(w.group(Seq("labels" -> ds)))).datasets.head
    assert(d.dtype.clazz == 9)
    assert(d.readStrings().toSeq == names)
  }

  test("HDF5 unsigned 64-bit values above Long.MaxValue decode correctly") {
    val w = new Hdf5TestWriter()
    val raw = java.nio.ByteBuffer.allocate(24)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    raw.putLong(7L)
    raw.putLong(java.lang.Long.parseUnsignedLong("9223372036854775808")) // 2^63
    raw.putLong(-1L) // 2^64 - 1
    val ds = w.dataset(Seq(3L), w.uint64, raw.array())
    val d = Hdf5.open(w.finish(w.group(Seq("u" -> ds)))).datasets.head
    assert(d.readDoubles().toSeq ==
      Seq(7.0, 9.223372036854776E18, 1.8446744073709552E19))
  }

  test("HDF5 shuffle+deflate filter pipeline roundtrip") {
    val w = new Hdf5TestWriter()
    val dims = Seq(6L, 4L)
    val values = (0 until 24).map(i => i * 1234.5 - 7000)
    val raw = java.nio.ByteBuffer.allocate(24 * 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    values.foreach(raw.putDouble)
    val ds = w.chunkedDataset(dims, w.float64, raw.array(), Seq(3, 3),
      shuffle = true)
    val d = Hdf5.open(w.finish(w.group(Seq("s" -> ds)))).datasets.head
    assert(d.readDoubles().toSeq == values)
  }

  test("HDF5 szip filter: chunked uint16 detector frames with edge chunks") {
    // the non-default writer config the reference's h5py read path
    // (tools/hyperspectral.py:51) could hit: szip-compressed chunks.
    // 10x12 frame in 4x8 chunks: right/bottom edge chunks are zero-padded,
    // so the coded stream mixes zero-block runs with k-split blocks.
    val w = new Hdf5TestWriter()
    val dims = Seq(10L, 12L)
    val values = (0 until 120).map(i => 800 + (math.sin(i / 3.0) * 300).toInt)
    val raw = java.nio.ByteBuffer.allocate(240)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    values.foreach(v => raw.putShort(v.toShort))
    val cd = Seq(Szip.Raw | Szip.AllowK13 | Szip.NN | Szip.LSB,
      16, 8, 8) // [options, bits/pixel, pixels/block, pixels/scanline]
    val ds = w.chunkedDataset(dims, w.uint16, raw.array(), Seq(4, 8),
      szip = Some(cd))
    val d = Hdf5.open(w.finish(w.group(Seq("frames" -> ds)))).datasets.head
    assert(d.dims == Vector(10L, 12L))
    assert(d.readDoubles().toSeq == values.map(_.toDouble))
  }

  test("HDF5 szip filter: per-chunk filter mask skips szip for masked chunks") {
    // libhdf5 registers szip as H5Z_FLAG_OPTIONAL: when the filter
    // declines a chunk, the chunk is stored RAW and its index entry's
    // filter mask marks the pipeline position as skipped. A reader that
    // ignores the mask would misread the raw chunk's first bytes as the
    // szip size prefix — silently wrong samples. Chunks 1 and 2 (of 4)
    // are stored raw here; all four must decode to the written values.
    val w = new Hdf5TestWriter()
    val dims = Seq(8L, 16L)
    val values = (0 until 128).map(i => 600 + (math.cos(i / 5.0) * 250).toInt)
    val raw = java.nio.ByteBuffer.allocate(256)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    values.foreach(v => raw.putShort(v.toShort))
    val cd = Seq(Szip.Raw | Szip.AllowK13 | Szip.NN | Szip.LSB, 16, 8, 8)
    val ds = w.chunkedDataset(dims, w.uint16, raw.array(), Seq(4, 8),
      szip = Some(cd), szipSkipChunks = Set(1, 2))
    val d = Hdf5.open(w.finish(w.group(Seq("frames" -> ds)))).datasets.head
    assert(d.readDoubles().toSeq == values.map(_.toDouble))
  }

  test("HDF5 szip filter: uint32 frames (5-bit option IDs, Long sample domain)") {
    val w = new Hdf5TestWriter()
    val values = (0 until 64).map(i => 4000000000L + i * 1234567L % 290000000L)
    val raw = java.nio.ByteBuffer.allocate(256)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    values.foreach(v => raw.putInt((v & 0xFFFFFFFFL).toInt))
    val cd = Seq(Szip.Raw | Szip.AllowK13 | Szip.NN | Szip.LSB, 32, 8, 16)
    val ds = w.chunkedDataset(Seq(8L, 8L), w.fixed(4, signed = false),
      raw.array(), Seq(4, 8), szip = Some(cd))
    val d = Hdf5.open(w.finish(w.group(Seq("deep" -> ds)))).datasets.head
    assert(d.readDoubles().toSeq == values.map(_.toDouble))
  }

  test("HDF5 szip filter: uint8 under a v2 (libver-latest) pipeline message") {
    val w = new Hdf5TestWriter()
    val values = (0 until 64).map(i => (i * 5) % 251)
    val cd = Seq(Szip.Raw | Szip.AllowK13 | Szip.EC | Szip.MSB, 8, 8, 16)
    val ds = w.chunkedDataset(Seq(8L, 8L), w.uint8,
      values.map(_.toByte).toArray, Seq(4, 4), filterMsgVersion = 2,
      v2Header = true, szip = Some(cd))
    val d = Hdf5.open(w.finish(w.group(Seq("b" -> ds)))).datasets.head
    assert(d.readDoubles().toSeq == values.map(_.toDouble))
  }

  test("Emd.signals over the full libver-latest layout (dense groups, v2 filters, shuffle)") {
    // 10 signals of one kind → the kind group goes DENSE; chunks are
    // shuffle+deflate behind v2 filter messages under OHDR headers
    val sigs = (0 until 10).map { i =>
      Hdf5TestWriter.Sig("Image", f"uid$i%02d", Seq(2L, 3L, 1L),
        (0 until 6).map(p => (p * 3 + i * 100).toDouble),
        metadataJson = if (i == 0) Some("""{"Core":{"v":"x"}}""") else None,
        chunked = Some(Seq(2, 2, 1)))
    }
    val parsed = Emd.signals(Hdf5TestWriter.emdV2(sigs))
    assert(parsed.map(_.title) == (0 until 10).map(i => f"Image/uid$i%02d"))
    parsed.zipWithIndex.foreach { case (sig, i) =>
      assert(sig.ndim == 2 && sig.shape == Seq(2, 3)) // (2,3,1) squeezes
      assert(sig.data == (0 until 6).map(p => (p * 3 + i * 100).toDouble))
    }
    assert(parsed(0).metadata_json.contains("Core"))
  }

  test("Emd.signals: Velox layout, squeeze, metadata, deterministic order") {
    val bytes = Hdf5TestWriter.emd(Seq(
      Hdf5TestWriter.Sig("Image", "uidB", Seq(4L, 4L, 1L),
        (0 until 16).map(_.toDouble),
        metadataJson = Some("""{"Core":{"MetadataDefinitionVersion":"7.9"}}""")),
      Hdf5TestWriter.Sig("SpectrumImage", "uidA", Seq(2L, 2L, 3L),
        (0 until 12).map(_ * 2.0), chunked = Some(Seq(2, 2, 2)))))
    val sigs = Emd.signals(bytes)
    assert(sigs.map(_.title) == Seq("Image/uidB", "SpectrumImage/uidA"))
    // (4,4,1) squeezes to 2-D; the spectrum cube stays 3-D
    assert(sigs(0).ndim == 2 && sigs(0).shape == Seq(4, 4))
    assert(sigs(1).ndim == 3 && sigs(1).shape == Seq(2, 2, 3))
    assert(sigs(1).data == (0 until 12).map(_ * 2.0))
    assert(sigs(0).metadata_json.contains("MetadataDefinitionVersion"))
    assert(sigs(1).metadata_json == "{}")
  }

  test("hyperspectral pipeline end-to-end over real .emd containers") {
    val watch = Files.createTempDirectory("graft-emd-watch")
    val base = Files.createTempDirectory("graft-emd-out")
    val out = base.resolve("out").toString

    def emdFile(seed: Int): Array[Byte] = Hdf5TestWriter.emd(Seq(
      Hdf5TestWriter.Sig("Image", "haadf", Seq(8L, 8L, 1L),
        (0 until 64).map(i => (i * seed % 11).toDouble)),
      Hdf5TestWriter.Sig("SpectrumImage", "eds", Seq(2L, 2L, 4L),
        (0 until 16).map(i => (i + seed).toDouble),
        metadataJson = Some("""{"Signal":{"signal_type":"EDS_TEM"}}"""),
        chunked = Some(Seq(1, 2, 4)))))

    Files.write(watch.resolve("exp1.emd"), emdFile(1))
    Files.write(watch.resolve("exp2.emd"), emdFile(100))

    HyperspectralPipeline.start(spark, watch.toString, out,
      base.resolve("catalog").toString, base.resolve("ckpt").toString,
      Emd.parseFiles, drain = true).awaitTermination()

    val spectrum = spark.read.parquet(s"$out/spectrum")
    // per file: the 3-D EDS cube (not the squeezed 2-D image) → 4 channels
    assert(spectrum.select("experiment_id").distinct().count() == 2)
    assert(spectrum.count() == 8)
    // exp1 channel sums: data = i+1 over (2,2,4); channel c sums {c+1, c+5, c+9, c+13}
    val s1 = spectrum.filter(col("experiment_id") === "exp1")
      .orderBy("channel").collect().map(_.getAs[Double]("counts")).toSeq
    assert(s1 == Seq(28.0, 32.0, 36.0, 40.0))
    assert(spark.read.parquet(s"$out/intensity").count() == 8) // 2 files x 2x2 map
    assert(spark.read.parquet(base.resolve("catalog").toString).count() == 2)
    // sidecar PNG artifacts land next to the data, one per experiment,
    // under the batch-scoped subdir (replays replace the whole batch set)
    for (e <- Seq("exp1", "exp2")) {
      val png = java.nio.file.Paths.get(out, "artifacts", "batch_id=0", s"$e.png")
      assert(java.nio.file.Files.exists(png), s"missing artifact $png")
      val img = javax.imageio.ImageIO.read(png.toFile)
      assert(img.getWidth == 2 && img.getHeight == 2)
    }
  }

  test("spatiotemporal pipeline end-to-end over a real .emd video") {
    val watch = Files.createTempDirectory("graft-emd-st-watch")
    val base = Files.createTempDirectory("graft-emd-st-out")
    val out = base.resolve("out").toString

    // a (T, X, Y) = (3, 4, 4) acquisition, chunked per frame
    val video = Hdf5TestWriter.emd(Seq(
      Hdf5TestWriter.Sig("Image", "scan", Seq(3L, 4L, 4L),
        (0 until 48).map(i => (i * 13 % 29).toDouble),
        chunked = Some(Seq(1, 4, 4)))))
    Files.write(watch.resolve("acq1.emd"), video)

    graft.pipelines.SpatiotemporalPipeline.start(spark, watch.toString, out,
      base.resolve("catalog").toString, base.resolve("ckpt").toString,
      Emd.parseFiles, drain = true).awaitTermination()

    val frames = spark.read.parquet(s"$out/frames_u8")
    assert(frames.count() == 48) // 3 frames x 4x4
    assert(frames.select("frame").distinct().count() == 3)
    val avi = java.nio.file.Paths.get(out, "artifacts", "batch_id=0", "acq1.avi")
    assert(java.nio.file.Files.exists(avi))
    assert(new String(java.nio.file.Files.readAllBytes(avi).slice(0, 4), "US-ASCII") == "RIFF")
  }
}
