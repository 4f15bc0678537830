package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.util.zip.Deflater

/** Test-only HDF5 writer emitting the 1.8-default on-disk layout the
  * reader supports: superblock v0, v1 object headers, symbol-table groups
  * (B-tree v1 + SNOD + local heap), contiguous and chunked+deflate
  * datasets. Each structure is written per the public HDF5 file-format
  * specification — field for field, including the ones the reader never
  * consults (sibling pointers, B-tree keys, float bit fields), so the
  * fixture is an honest container rather than an echo of the reader's
  * assumptions.
  */
final class Hdf5TestWriter(capacity: Int = 1 << 22) {

  private val Undef = -1L
  private val buf = ByteBuffer.allocate(capacity).order(ByteOrder.LITTLE_ENDIAN)
  buf.position(96) // superblock v0 (24 + 32 + 40 bytes) reserved at offset 0

  private def pos: Long = buf.position().toLong
  private def pad8(n: Int): Int = (n + 7) / 8 * 8

  // -- datatypes -----------------------------------------------------------
  /** (class, size, datatype-message body). */
  case class Dt(clazz: Int, size: Int, body: Array[Byte])

  def uint8: Dt = fixed(1, signed = false)
  def uint16: Dt = fixed(2, signed = false)
  def int32: Dt = fixed(4, signed = true)
  def uint64: Dt = fixed(8, signed = false)

  def fixed(size: Int, signed: Boolean): Dt = {
    val b = ByteBuffer.allocate(12).order(ByteOrder.LITTLE_ENDIAN)
    b.put(0x10.toByte) // version 1, class 0
    b.put((if (signed) 0x08 else 0x00).toByte).put(0.toByte).put(0.toByte)
    b.putInt(size)
    b.putShort(0.toShort).putShort((size * 8).toShort) // bit offset, precision
    Dt(0, size, b.array())
  }

  /** Fixed-length NUL-padded ASCII string type (class 3). */
  def fixedString(size: Int): Dt = {
    val b = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
    b.put(0x13.toByte) // version 1, class 3
    b.put(0x01.toByte).put(0.toByte).put(0.toByte) // NUL-padded, ASCII
    b.putInt(size)
    Dt(3, size, b.array())
  }

  /** Variable-length UTF-8 string type (class 9, vlen-string flavor):
    * elements are 16-byte global-heap descriptors; the base type (1-byte
    * string) follows in the properties per the spec.
    */
  def vlenString: Dt = {
    val base = fixedString(1)
    val b = ByteBuffer.allocate(8 + base.body.length).order(ByteOrder.LITTLE_ENDIAN)
    b.put(0x19.toByte) // version 1, class 9
    b.put(0x01.toByte).put(0.toByte).put(0.toByte) // vlen type: string
    b.putInt(16)
    b.put(base.body)
    Dt(9, 16, b.array())
  }

  /** Write a GCOL global-heap collection holding `strings` (objects
    * 1..n, 8-byte-aligned, trailing index-0 free-space object) and a
    * contiguous dataset of their 16-byte descriptors.
    */
  def vlenStringDataset(strings: Seq[String]): Long = {
    val bodies = strings.map(_.getBytes("UTF-8"))
    val objsSize = bodies.map(b => 16 + pad8(b.length)).sum
    val collSize = 16L + objsSize + 16L // header + objects + free space
    val gcolAddr = pos
    buf.put("GCOL".getBytes("US-ASCII"))
    buf.put(1.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
    buf.putLong(collSize)
    bodies.zipWithIndex.foreach { case (b, i) =>
      buf.putShort((i + 1).toShort).putShort(1.toShort).putInt(0)
      buf.putLong(b.length.toLong)
      buf.put(b)
      (b.length until pad8(b.length)).foreach(_ => buf.put(0.toByte))
    }
    buf.putShort(0.toShort).putShort(0.toShort).putInt(0)
    buf.putLong(16L) // free-space object covers the collection tail
    val raw = ByteBuffer.allocate(strings.size * 16).order(ByteOrder.LITTLE_ENDIAN)
    bodies.zipWithIndex.foreach { case (b, i) =>
      raw.putInt(b.length).putLong(gcolAddr).putInt(i + 1)
    }
    dataset(Seq(strings.size.toLong), vlenString, raw.array())
  }

  /** Variable-length SEQUENCE type (class 9, sequence flavor) over a
    * numeric base; the base's full datatype message nests in the
    * properties, per spec IV.A.2.h.
    */
  def vlenSeq(base: Dt): Dt = {
    val b = ByteBuffer.allocate(8 + base.body.length).order(ByteOrder.LITTLE_ENDIAN)
    b.put(0x19.toByte) // version 1, class 9
    b.put(0x00.toByte).put(0.toByte).put(0.toByte) // vlen type: sequence
    b.putInt(16)
    b.put(base.body)
    Dt(9, 16, b.array())
  }

  /** GCOL of packed base-type elements per row + a contiguous dataset of
    * their 16-byte descriptors {element count, collection addr, index} —
    * the vlen-sequence twin of [[vlenStringDataset]]. Empty rows get the
    * all-zero descriptor (no heap object), as writers emit.
    */
  def vlenSeqDataset(seqs: Seq[Seq[Double]], base: Dt): Long = {
    def enc(v: Double): Array[Byte] = {
      val bb = ByteBuffer.allocate(base.size).order(ByteOrder.LITTLE_ENDIAN)
      (base.clazz, base.size) match {
        case (0, 1) => bb.put(v.toInt.toByte)
        case (0, 2) => bb.putShort(v.toInt.toShort)
        case (0, 4) => bb.putInt(v.toInt)
        case (0, 8) => bb.putLong(v.toLong)
        case (1, 4) => bb.putFloat(v.toFloat)
        case (1, 8) => bb.putDouble(v)
        case _ => sys.error(s"vlenSeqDataset: unsupported base $base")
      }
      bb.array()
    }
    val bodies = seqs.map(sq => sq.toArray.flatMap(enc))
    val nonEmpty = bodies.filter(_.nonEmpty)
    val objsSize = nonEmpty.map(b => 16 + pad8(b.length)).sum
    val collSize = 16L + objsSize + 16L
    val gcolAddr = pos
    buf.put("GCOL".getBytes("US-ASCII"))
    buf.put(1.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
    buf.putLong(collSize)
    nonEmpty.zipWithIndex.foreach { case (b, i) =>
      buf.putShort((i + 1).toShort).putShort(1.toShort).putInt(0)
      buf.putLong(b.length.toLong)
      buf.put(b)
      (b.length until pad8(b.length)).foreach(_ => buf.put(0.toByte))
    }
    buf.putShort(0.toShort).putShort(0.toShort).putInt(0)
    buf.putLong(16L) // free-space object covers the collection tail
    val raw = ByteBuffer.allocate(seqs.size * 16).order(ByteOrder.LITTLE_ENDIAN)
    var idx = 0
    seqs.foreach { sq =>
      if (sq.isEmpty) raw.putInt(0).putLong(0L).putInt(0)
      else { idx += 1; raw.putInt(sq.size).putLong(gcolAddr).putInt(idx) }
    }
    dataset(Seq(seqs.size.toLong), vlenSeq(base), raw.array())
  }

  def float32: Dt = float(4, expLoc = 23, expSize = 8, mantSize = 23, bias = 127, signPos = 31)
  def float64: Dt = float(8, expLoc = 52, expSize = 11, mantSize = 52, bias = 1023, signPos = 63)

  private def float(size: Int, expLoc: Int, expSize: Int, mantSize: Int,
      bias: Int, signPos: Int): Dt = {
    val b = ByteBuffer.allocate(20).order(ByteOrder.LITTLE_ENDIAN)
    b.put(0x11.toByte) // version 1, class 1
    b.put(0x20.toByte) // LE, implied-msb mantissa normalization
    b.put(signPos.toByte).put(0.toByte)
    b.putInt(size)
    b.putShort(0.toShort).putShort((size * 8).toShort)
    b.put(expLoc.toByte).put(expSize.toByte).put(0.toByte).put(mantSize.toByte)
    b.putInt(bias)
    Dt(1, size, b.array())
  }

  // -- low-level writers ---------------------------------------------------
  private def writeBytes(bs: Array[Byte]): Long = { val a = pos; buf.put(bs); a }

  private def dataspaceBody(dims: Seq[Long]): Array[Byte] = {
    val b = ByteBuffer.allocate(8 + dims.size * 8).order(ByteOrder.LITTLE_ENDIAN)
    b.put(1.toByte).put(dims.size.toByte).put(0.toByte) // v1, rank, flags
    b.put(new Array[Byte](5)) // reserved
    dims.foreach(b.putLong)
    b.array()
  }

  private def objectHeader(msgs: Seq[(Int, Array[Byte])]): Long = {
    val bodySize = msgs.map { case (_, b) => 8 + pad8(b.length) }.sum
    val a = pos
    buf.put(1.toByte).put(0.toByte)
    buf.putShort(msgs.size.toShort)
    buf.putInt(1) // reference count
    buf.putInt(bodySize)
    buf.putInt(0) // prefix padding to 8-byte alignment
    msgs.foreach { case (typ, body) =>
      buf.putShort(typ.toShort)
      buf.putShort(pad8(body.length).toShort)
      buf.put(0.toByte).put(new Array[Byte](3)) // flags + reserved
      buf.put(body)
      buf.put(new Array[Byte](pad8(body.length) - body.length))
    }
    a
  }

  // -- datasets ------------------------------------------------------------
  /** Contiguous dataset; `raw` is the row-major little-endian element data. */
  def dataset(dims: Seq[Long], dt: Dt, raw: Array[Byte]): Long = {
    val dataAddr = writeBytes(raw)
    val layout = ByteBuffer.allocate(18).order(ByteOrder.LITTLE_ENDIAN)
    layout.put(3.toByte).put(1.toByte).putLong(dataAddr).putLong(raw.length.toLong)
    objectHeader(Seq(
      0x0001 -> dataspaceBody(dims),
      0x0003 -> dt.body,
      0x0008 -> layout.array()))
  }

  /** Compact dataset: the raw element bytes live INLINE in the layout
    * message (layout class 0 — what writers emit for metadata-sized
    * extents below the 64 KiB message ceiling).
    */
  def compactDataset(dims: Seq[Long], dt: Dt, raw: Array[Byte]): Long = {
    require(raw.length < 0x10000, "compact layout caps at u16 size")
    val layout = ByteBuffer.allocate(4 + raw.length).order(ByteOrder.LITTLE_ENDIAN)
    layout.put(3.toByte).put(0.toByte).putShort(raw.length.toShort).put(raw)
    objectHeader(Seq(
      0x0001 -> dataspaceBody(dims),
      0x0003 -> dt.body,
      0x0008 -> layout.array()))
  }

  /** Chunked dataset with per-chunk deflate. Chunks cover the logical
    * extent in row-major chunk-grid order; edge chunks are stored full
    * size with padding, as the format requires.
    */
  def chunkedDataset(dims: Seq[Long], dt: Dt, raw: Array[Byte],
      chunkDims: Seq[Int], deflateLevel: Int = 6,
      filterMsgVersion: Int = 1, shuffle: Boolean = false,
      v2Header: Boolean = false,
      szip: Option[Seq[Int]] = None,
      szipSkipChunks: Set[Int] = Set.empty,
      packedOverride: Option[Array[Byte]] = None): Long = {
    val rank = dims.size
    // gather each chunk (zero-padded at the edges), pack through the
    // pipeline (szip, or shuffle→deflate), write, record. Chunks listed
    // in `szipSkipChunks` (by linear grid index) are stored RAW with
    // filter-mask bit 0 set — what libhdf5 emits when the OPTIONAL szip
    // filter declines a chunk (H5Z_FLAG_OPTIONAL).
    val entries = Vector.newBuilder[(Long, Int, Seq[Long], Int)] // addr, size, offsets, mask
    gatherChunks(dims, dt, raw, chunkDims).zipWithIndex.foreach { case ((at, chunk), k) =>
      val skipped = szip.isDefined && szipSkipChunks(k)
      // packedOverride: hostile-fixture hook — store THESE bytes as every
      // chunk's payload regardless of the real pipeline (e.g. a zip bomb)
      val packed = packedOverride.getOrElse(
        if (skipped) chunk
        else szip match {
          case Some(cd) => SzipTestEncoder.encodeHdf5(chunk, cd)
          case None => deflate(
            if (shuffle) shuffleBytes(chunk, dt.size) else chunk, deflateLevel)
        })
      val addr = writeBytes(packed)
      entries += ((addr, packed.length, at, if (skipped) 1 else 0))
    }

    // chunk-index B-tree: one level-0 node type 1
    val all = entries.result()
    val btreeAddr = pos
    buf.put("TREE".getBytes)
    buf.put(1.toByte).put(0.toByte) // node type 1, level 0
    buf.putShort(all.size.toShort)
    buf.putLong(Undef).putLong(Undef)
    all.foreach { case (addr, size, at, mask) =>
      buf.putInt(size)
      buf.putInt(mask) // filter mask: bit i ⇒ pipeline position i skipped
      at.foreach(buf.putLong)
      buf.putLong(0L) // trailing element-size dimension offset
      buf.putLong(addr)
    }
    // final bounding key
    buf.putInt(0); buf.putInt(0)
    (0 to rank).foreach(_ => buf.putLong(0L))

    val layout = ByteBuffer.allocate(3 + 8 + 4 * (rank + 1)).order(ByteOrder.LITTLE_ENDIAN)
    layout.put(3.toByte).put(2.toByte).put((rank + 1).toByte)
    layout.putLong(btreeAddr)
    chunkDims.foreach(c => layout.putInt(c))
    layout.putInt(dt.size)

    // pipeline in WRITE order: szip alone (id 4, client values
    // [options_mask, bits/pixel, pixels/block, pixels/scanline] — the
    // H5Zszip layout), or shuffle (id 2, client value = element size)
    // before deflate (id 1) — readers reverse it
    val descs: Seq[(Int, Seq[Int])] = szip match {
      case Some(cd) => Seq(4 -> cd)
      case None =>
        (if (shuffle) Seq(2 -> Seq(dt.size)) else Seq.empty) :+
          (1 -> Seq(deflateLevel))
    }
    val f = ByteBuffer.allocate(8 + descs.map(d => 8 + 4 * d._2.size + 4).sum)
      .order(ByteOrder.LITTLE_ENDIAN)
    if (filterMsgVersion == 1) {
      f.put(1.toByte).put(descs.size.toByte).put(new Array[Byte](6))
      descs.foreach { case (id, vals) =>
        f.putShort(id.toShort)
        f.putShort(0.toShort)          // no name
        f.putShort(1.toShort)          // flags: optional
        f.putShort(vals.size.toShort)
        vals.foreach(f.putInt)
        if (vals.size % 2 == 1) f.putInt(0) // pad odd client-value counts
      }
    } else {
      // v2 (libver-latest): id < 256 ⇒ NO name fields, NO padding
      f.put(2.toByte).put(descs.size.toByte)
      descs.foreach { case (id, vals) =>
        f.putShort(id.toShort)
        f.putShort(1.toShort)          // flags: optional
        f.putShort(vals.size.toShort)
        vals.foreach(f.putInt)
      }
    }
    val filter = java.util.Arrays.copyOf(f.array(), f.position())

    val msgs = Seq(
      0x0001 -> dataspaceBody(dims),
      0x0003 -> dt.body,
      0x000B -> filter,
      0x0008 -> layout.array())
    if (v2Header) objectHeaderV2(msgs) else objectHeader(msgs)
  }

  /** Row-major chunk gather: (element-coordinate origin, nominal-size
    * chunk bytes zero-padded at the edges) per grid cell — the layout
    * every chunk index stores.
    */
  private def gatherChunks(dims: Seq[Long], dt: Dt, raw: Array[Byte],
      chunkDims: Seq[Int]): Vector[(Seq[Long], Array[Byte])] = {
    val rank = dims.size
    val nChunks = dims.indices.map(d =>
      ((dims(d) + chunkDims(d) - 1) / chunkDims(d)).toInt)
    val strides = new Array[Long](rank)
    var s = 1L
    for (d <- (rank - 1) to 0 by -1) { strides(d) = s; s *= dims(d) }
    val out = Vector.newBuilder[(Seq[Long], Array[Byte])]
    for (ci <- 0 until nChunks.product) {
      var rem = ci
      val grid = new Array[Int](rank)
      for (d <- (rank - 1) to 0 by -1) { grid(d) = rem % nChunks(d); rem /= nChunks(d) }
      val at = (0 until rank).map(d => grid(d).toLong * chunkDims(d))
      val chunkElems = chunkDims.product
      val chunk = new Array[Byte](chunkElems * dt.size)
      val local = new Array[Int](rank)
      for (i <- 0 until chunkElems) {
        var r2 = i
        for (d <- (rank - 1) to 0 by -1) { local(d) = r2 % chunkDims(d); r2 /= chunkDims(d) }
        val inBounds = (0 until rank).forall(d => at(d) + local(d) < dims(d))
        if (inBounds) {
          val src = (0 until rank).map(d => (at(d) + local(d)) * strides(d)).sum
          System.arraycopy(raw, (src * dt.size).toInt, chunk, i * dt.size, dt.size)
        }
      }
      out += ((at, chunk))
    }
    out.result()
  }

  /** Chunked dataset with a VERSION-4 data-layout message (what h5py
    * libver='latest' emits): chunk index "single" (whole dataset in one
    * chunk), "implicit" (dense unfiltered grid at consecutive
    * addresses), or "fixedarray" (FAHD/FADB linear index); optional
    * per-chunk deflate via a v2 filter message (not for implicit, which
    * the format restricts to unfiltered). OHDR header framing.
    */
  def chunkedDatasetV4(dims: Seq[Long], dt: Dt, raw: Array[Byte],
      chunkDims: Seq[Int], index: String, deflateLevel: Int = 0): Long = {
    val rank = dims.size
    val filtered = deflateLevel > 0
    require(!(filtered && index == "implicit"), "implicit index is unfiltered")
    val chunks = gatherChunks(dims, dt, raw, chunkDims)
    require(index != "single" || chunks.size == 1,
      "single-chunk index needs chunk dims covering the whole dataset")
    val stored = chunks.map { case (at, chunk) =>
      val bytes = if (filtered) deflate(chunk, deflateLevel) else chunk
      (at, writeBytes(bytes), bytes.length)
    }

    val layout = ByteBuffer.allocate(64 + 4 * rank).order(ByteOrder.LITTLE_ENDIAN)
    layout.put(4.toByte).put(2.toByte) // version 4, class chunked
    layout.put(if (filtered && index == "single") 2.toByte else 0.toByte)
    layout.put(rank.toByte)
    layout.put(4.toByte) // bytes per encoded chunk dimension
    chunkDims.foreach(layout.putInt)
    index match {
      case "single" =>
        layout.put(1.toByte)
        if (filtered) { layout.putLong(stored.head._3.toLong); layout.putInt(0) }
        layout.putLong(stored.head._2)
      case "implicit" =>
        layout.put(2.toByte)
        layout.putLong(stored.head._2) // chunks are consecutive from here
      case "fixedarray" =>
        val clientId = if (filtered) 1 else 0
        val entrySize = if (filtered) 8 + 8 + 4 else 8
        val fahd = pos
        buf.put("FAHD".getBytes)
        buf.put(0.toByte).put(clientId.toByte)
        buf.put(entrySize.toByte).put(10.toByte) // page bits: non-paged
        buf.putLong(stored.size.toLong)
        buf.putLong(fahd + 28) // data block follows immediately
        buf.putInt(0)          // checksum
        require(pos == fahd + 28, "FAHD size drift")
        buf.put("FADB".getBytes)
        buf.put(0.toByte).put(clientId.toByte)
        buf.putLong(fahd)
        stored.foreach { case (_, addr, len) =>
          buf.putLong(addr)
          if (filtered) { buf.putLong(len.toLong); buf.putInt(0) }
        }
        buf.putInt(0) // checksum
        layout.put(3.toByte)
        layout.put(10.toByte) // page-bits creation hint
        layout.putLong(fahd)
      case i => throw new IllegalArgumentException(s"index $i")
    }
    val layoutBytes = java.util.Arrays.copyOf(layout.array(), layout.position())

    val base = Seq(0x0001 -> dataspaceBody(dims), 0x0003 -> dt.body)
    val msgs =
      if (!filtered) base :+ (0x0008 -> layoutBytes)
      else {
        // v2 filter message: deflate only, no name fields, no padding
        val f = ByteBuffer.allocate(12).order(ByteOrder.LITTLE_ENDIAN)
        f.put(2.toByte).put(1.toByte)
        f.putShort(1.toShort)  // deflate
        f.putShort(1.toShort)  // flags: optional
        f.putShort(1.toShort)  // one client value
        f.putInt(deflateLevel)
        base ++ Seq(0x000B -> f.array(), 0x0008 -> layoutBytes)
      }
    objectHeaderV2(msgs)
  }

  /** The HDF5 shuffle filter's forward transform: element-major bytes →
    * byte-plane-major.
    */
  private def shuffleBytes(in: Array[Byte], es: Int): Array[Byte] = {
    if (es <= 1) return in
    val n = in.length / es
    val out = new Array[Byte](in.length)
    var k = 0
    var j = 0
    while (j < es) {
      var i = 0
      while (i < n) { out(k) = in(i * es + j); k += 1; i += 1 }
      j += 1
    }
    out
  }

  private def deflate(in: Array[Byte], level: Int): Array[Byte] = {
    val d = new Deflater(level)
    d.setInput(in); d.finish()
    val out = new java.io.ByteArrayOutputStream()
    val tmp = new Array[Byte](8192)
    while (!d.finished()) out.write(tmp, 0, d.deflate(tmp))
    d.end()
    out.toByteArray
  }

  // -- groups --------------------------------------------------------------
  /** Old-style group over named children (any mix of groups/datasets). */
  def group(children: Seq[(String, Long)]): Long = {
    val sorted = children.sortBy(_._1) // symbol tables are name-ordered
    // local heap: NUL-terminated names; offset 0 must stay an empty string
    val heapData = pos
    buf.put(0.toByte)
    val nameOffsets = sorted.map { case (n, _) =>
      val off = pos - heapData
      buf.put(n.getBytes("UTF-8")).put(0.toByte)
      off
    }
    while ((pos - heapData) % 8 != 0) buf.put(0.toByte)
    val heapSize = pos - heapData
    val heapAddr = pos
    buf.put("HEAP".getBytes).put(0.toByte).put(new Array[Byte](3))
    buf.putLong(heapSize).putLong(heapSize).putLong(heapData)

    val snodAddr = pos
    buf.put("SNOD".getBytes).put(1.toByte).put(0.toByte)
    buf.putShort(sorted.size.toShort)
    sorted.zip(nameOffsets).foreach { case ((_, header), off) =>
      buf.putLong(off).putLong(header)
      buf.putInt(0).putInt(0) // cache type + reserved
      buf.put(new Array[Byte](16)) // scratch
    }

    val btreeAddr = pos
    buf.put("TREE".getBytes).put(0.toByte).put(0.toByte)
    buf.putShort(1.toShort)
    buf.putLong(Undef).putLong(Undef)
    buf.putLong(nameOffsets.headOption.getOrElse(0L)) // key 0
    buf.putLong(snodAddr)
    buf.putLong(nameOffsets.lastOption.getOrElse(0L)) // bounding key

    val symtab = ByteBuffer.allocate(16).order(ByteOrder.LITTLE_ENDIAN)
    symtab.putLong(btreeAddr).putLong(heapAddr)
    objectHeader(Seq(0x0011 -> symtab.array()))
  }

  // -- version-2 framing (superblock v3 / OHDR / compact links) ------------

  /** Version-2 object header: "OHDR" framing, 1-byte types, no message
    * padding, trailing checksum field (zeroed — readers that validate
    * lookup3 checksums will reject; ours documents non-validation).
    */
  def objectHeaderV2(msgs: Seq[(Int, Array[Byte])]): Long = {
    val bodySize = msgs.map { case (_, b) => 4 + b.length }.sum
    val a = pos
    buf.put("OHDR".getBytes)
    buf.put(2.toByte)
    buf.put(0x01.toByte) // flags: 2-byte size-of-chunk-0
    buf.putShort(bodySize.toShort)
    msgs.foreach { case (typ, body) =>
      buf.put(typ.toByte)
      buf.putShort(body.length.toShort)
      buf.put(0.toByte) // message flags
      buf.put(body)
    }
    buf.putInt(0) // checksum (unvalidated)
    a
  }

  /** New-style group: hard Link messages directly in the header. */
  def groupV2(children: Seq[(String, Long)]): Long = {
    val linkMsgs = children.sortBy(_._1).map { case (name, addr) =>
      val nb = name.getBytes("UTF-8")
      val b = ByteBuffer.allocate(2 + 1 + nb.length + 8)
        .order(ByteOrder.LITTLE_ENDIAN)
      b.put(1.toByte) // link message version
      b.put(0.toByte) // flags: hard link, 1-byte name length
      b.put(nb.length.toByte)
      b.put(nb)
      b.putLong(addr)
      0x0006 -> b.array()
    }
    objectHeaderV2(linkMsgs)
  }

  /** New-style group with DENSE link storage: link messages live in a
    * fractal heap (root direct block; with `forceIndirect`, a root
    * indirect block over several direct blocks in the doubling table)
    * indexed by a single-leaf v2 B-tree of record type 5. Every structure
    * is written field-for-field per the public format spec; checksums are
    * zeroed (the reader documents non-validation).
    */
  def groupV2Dense(children: Seq[(String, Long)], forceIndirect: Boolean = false,
      deepNameIndex: Boolean = false, tinyOf: Set[String] = Set.empty,
      hugeOf: Set[String] = Set.empty, deflateHeap: Boolean = false,
      hugeIndexed: Boolean = false): Long = {
    val named = children.sortBy(_._1).map { case (name, addr) =>
      val nb = name.getBytes("UTF-8")
      val b = ByteBuffer.allocate(3 + nb.length + 8).order(ByteOrder.LITTLE_ENDIAN)
      b.put(1.toByte).put(0.toByte).put(nb.length.toByte).put(nb).putLong(addr)
      name -> b.array()
    }
    // huge objects live OUTSIDE the heap blocks: body bytes at their own
    // file extent — deflated when the heap declares a filter pipeline
    // (libhdf5 filters huge objects through the heap's pipeline too).
    // (addr, stored length, de-filtered memory size) per huge link.
    val hugeAt: Map[String, (Long, Long, Long)] = named.collect {
      case (name, body) if hugeOf(name) =>
        val stored = if (deflateHeap) deflate(body, 6) else body
        name -> ((writeBytes(stored), stored.length.toLong, body.length.toLong))
    }.toMap
    // indexed huge IDs: id → extent lives in a v2 B-tree (record type 1
    // plain / 2 filtered) the FRHP header points at; ids are 1-based in
    // name order (the value never matters, only the heap-ID ↔ record match)
    val hugeIds: Map[String, Long] = named.collect {
      case (name, _) if hugeOf(name) => name
    }.zipWithIndex.map { case (n, i) => n -> (i + 1L) }.toMap
    val hugeBtreeAddr: Long =
      if (!hugeIndexed || hugeOf.isEmpty) Undef
      else {
        val typ = if (deflateHeap) 2 else 1
        val recSz = if (deflateHeap) 8 + 8 + 4 + 8 + 8 else 8 + 8 + 8
        val bthd = pos
        buf.put("BTHD".getBytes)
        buf.put(0.toByte).put(typ.toByte)
        buf.putInt(2048)            // node size
        buf.putShort(recSz.toShort)
        buf.putShort(0.toShort)     // depth: single leaf
        buf.put(100.toByte).put(40.toByte)
        buf.putLong(bthd + 38)      // root node follows immediately
        buf.putShort(hugeIds.size.toShort)
        buf.putLong(hugeIds.size.toLong)
        buf.putInt(0)               // checksum
        require(pos == bthd + 38, "huge BTHD size drift")
        buf.put("BTLF".getBytes)
        buf.put(0.toByte).put(typ.toByte)
        named.collect { case (name, _) if hugeOf(name) =>
          val (addr, stored, mem) = hugeAt(name)
          buf.putLong(addr).putLong(stored)
          if (deflateHeap) { buf.putInt(0); buf.putLong(mem) }
          buf.putLong(hugeIds(name))
        }
        buf.putInt(0)               // checksum
        bthd
      }
    val maxTiny = named.collect {
      case (name, body) if tinyOf(name) => body.length
    }.maxOption.getOrElse(0)
    require(maxTiny <= 16, "normal tiny IDs cap at 16 data bytes")
    val bodies = named.collect {
      case (name, body) if !tinyOf(name) && !hugeOf(name) => body
    }
    val offsetSize = 4 // max heap size 32 bits
    val hugeIdLen =
      if (hugeOf.isEmpty) 0
      else if (hugeIndexed) 1 + 8             // flags + huge-object id
      else if (deflateHeap) 1 + 8 + 8 + 4 + 8 // + addr, stored, mask, mem
      else 1 + 8 + 8                          // flags + addr + len
    val heapIdLen = Seq(
      1 + offsetSize + 2,                     // managed: flags + offset + len
      hugeIdLen,
      if (tinyOf.nonEmpty) 1 + maxTiny else 0 // tiny: flags/len + data
    ).max
    // the reader (like libhdf5) detects DIRECT huge IDs by the heap ID
    // length fitting a whole extent — an indexed fixture must stay below
    require(!hugeIndexed || hugeOf.isEmpty ||
      heapIdLen < (if (deflateHeap) 29 else 17),
      s"indexed-huge fixture heap ID length $heapIdLen reads as direct")
    val hdrSize = 4 + 1 + 8 + offsetSize // FHDB header (no checksum flag)
    val width = 2
    val startSize: Long =
      if (forceIndirect) 128L
      else {
        var s = 512L
        while (s < hdrSize + bodies.map(_.length).sum) s <<= 1
        s
      }
    def slotSize(slot: Int): Long = {
      val row = slot / width
      if (row < 2) startSize else startSize << (row - 1)
    }
    // greedy packing of link bodies into the doubling-table slot sequence
    case class Placed(slot: Int, offInBlock: Long, body: Array[Byte])
    var slot = 0
    var off = hdrSize.toLong
    val placed = bodies.map { body =>
      if (off + body.length > slotSize(slot)) { slot += 1; off = hdrSize.toLong }
      val p = Placed(slot, off, body)
      off += body.length
      p
    }
    val lastSlot = placed.map(_.slot).maxOption.getOrElse(0)
    val rowsUsed = lastSlot / width + 1
    val slotHeapOff = (0 to lastSlot).scanLeft(0L)((acc, s) => acc + slotSize(s))
    // one index record per link, in name order, as raw heap-ID bytes
    val records: Seq[Array[Byte]] = {
      val managedIt = placed.iterator
      named.map { case (name, body) =>
        val id = ByteBuffer.allocate(heapIdLen).order(ByteOrder.LITTLE_ENDIAN)
        if (tinyOf(name)) {
          id.put(((2 << 4) | (body.length - 1)).toByte).put(body)
        } else if (hugeOf(name)) {
          id.put((1 << 4).toByte)
          if (hugeIndexed) id.putLong(hugeIds(name))
          else {
            val (addr, stored, mem) = hugeAt(name)
            id.putLong(addr).putLong(stored)
            if (deflateHeap) { id.putInt(0); id.putLong(mem) }
          }
        } else {
          val p = managedIt.next()
          id.put(0.toByte)
          id.putInt((slotHeapOff(p.slot) + p.offInBlock).toInt)
          id.putShort(p.body.length.toShort)
        }
        id.array()
      }
    }
    val usedSlots = placed.map(_.slot).distinct.sorted
    val indirect = forceIndirect || rowsUsed > 1

    val frhpAddr = pos
    // filtered form: build each direct block's FULL buffer (header
    // included) up front and deflate it. With a DIRECT root the FRHP
    // tail carries (stored size, mask, v2 pipeline body); with an
    // INDIRECT root only the pipeline body — the per-child stored sizes
    // and masks go into the FHIB entries instead (spec IV.B).
    def fullBlock(s: Int): Array[Byte] = {
      val bb = ByteBuffer.allocate(slotSize(s).toInt)
        .order(ByteOrder.LITTLE_ENDIAN)
      bb.put("FHDB".getBytes).put(0.toByte).putLong(frhpAddr)
      bb.putInt(slotHeapOff(s).toInt)
      placed.filter(_.slot == s).foreach { p =>
        bb.position(p.offInBlock.toInt); bb.put(p.body)
      }
      bb.array()
    }
    val compressed: Map[Int, Array[Byte]] =
      if (!deflateHeap) Map.empty
      else usedSlots.map(s => s -> deflate(fullBlock(s), 6)).toMap
    val filterInfoLen = if (deflateHeap) 12 else 0 // v2 pipeline, deflate
    val frhpSize = 146 + filterInfoLen +
      (if (deflateHeap && !indirect) 8 + 4 else 0)
    val rootAddr = frhpAddr + frhpSize
    buf.put("FRHP".getBytes)
    buf.put(0.toByte)
    buf.putShort(heapIdLen.toShort)
    buf.putShort(filterInfoLen.toShort)
    buf.put(0.toByte)       // flags: no direct-block checksums
    buf.putInt(4096)        // max managed object size
    buf.putLong(hugeIds.size + 1L)  // next huge object id
    buf.putLong(hugeBtreeAddr)      // huge-object v2 B-tree (Undef: direct)
    buf.putLong(0L); buf.putLong(Undef) // free space, free-space manager
    val totalSpace = (0 to lastSlot).map(slotSize).sum
    buf.putLong(totalSpace); buf.putLong(totalSpace) // managed, allocated
    buf.putLong(totalSpace)                          // iterator offset
    buf.putLong(bodies.size.toLong)                  // managed object count
    buf.putLong(0L); buf.putLong(0L); buf.putLong(0L); buf.putLong(0L) // huge/tiny
    buf.putShort(width.toShort)
    buf.putLong(startSize)
    buf.putLong(65536L)      // max direct block size
    buf.putShort(32.toShort) // max heap size, in bits
    buf.putShort(1.toShort)  // starting rows
    buf.putLong(rootAddr)
    buf.putShort(if (indirect) rowsUsed.toShort else 0.toShort)
    if (deflateHeap && !indirect) {
      buf.putLong(compressed(0).length.toLong) // stored root block size
      buf.putInt(0)                            // filter mask
    }
    if (deflateHeap) {
      // v2 filter pipeline body: version, nfilters, {id, flags, nvals, cd}
      buf.put(2.toByte).put(1.toByte)
      buf.putShort(1.toShort) // deflate
      buf.putShort(0.toShort)
      buf.putShort(1.toShort) // one client value: level
      buf.putInt(6)
    }
    buf.putInt(0) // checksum
    require(pos == rootAddr, s"FRHP size drift: $pos != $rootAddr")

    val blockAddrs = scala.collection.mutable.Map.empty[Int, Long]
    if (indirect) {
      // filtered FHIB entries carry {addr, stored size, filter mask}
      val entrySize = 8 + (if (deflateHeap) 8 + 4 else 0)
      val fhibLen = 4 + 1 + 8 + offsetSize + rowsUsed * width * entrySize + 4
      var next = rootAddr + fhibLen
      usedSlots.foreach { s =>
        blockAddrs(s) = next
        next += (if (deflateHeap) compressed(s).length.toLong else slotSize(s))
      }
      buf.put("FHIB".getBytes)
      buf.put(0.toByte)
      buf.putLong(frhpAddr)
      buf.putInt(0) // root block offset
      for (s <- 0 until rowsUsed * width) {
        buf.putLong(blockAddrs.getOrElse(s, Undef))
        if (deflateHeap) {
          buf.putLong(compressed.get(s).map(_.length.toLong).getOrElse(0L))
          buf.putInt(0) // filter mask
        }
      }
      buf.putInt(0) // checksum
    } else blockAddrs(0) = rootAddr

    usedSlots.foreach { s =>
      require(pos == blockAddrs(s), s"direct block $s drift")
      if (deflateHeap) buf.put(compressed(s))
      else {
        buf.put("FHDB".getBytes)
        buf.put(0.toByte)
        buf.putLong(frhpAddr)
        buf.putInt(slotHeapOff(s).toInt) // this block's heap offset
        placed.filter(_.slot == s).foreach { p =>
          require(pos == blockAddrs(s) + p.offInBlock)
          buf.put(p.body)
        }
        buf.put(new Array[Byte](((blockAddrs(s) + slotSize(s)) - pos).toInt))
      }
    }

    val recSize = 4 + heapIdLen
    val nodeSize = 2048
    val bthdAddr = pos
    def putRecord(id: Array[Byte]): Unit = {
      buf.putInt(0) // name hash (reader iterates; never looked up)
      buf.put(id)
    }
    def putBthd(depth: Int, rootNodeAddr: Long, rootNRec: Int): Unit = {
      buf.put("BTHD".getBytes)
      buf.put(0.toByte).put(5.toByte) // version, record type 5: link name
      buf.putInt(nodeSize)
      buf.putShort(recSize.toShort)
      buf.putShort(depth.toShort)
      buf.put(100.toByte).put(40.toByte) // split/merge percents
      buf.putLong(rootNodeAddr)
      buf.putShort(rootNRec.toShort)
      buf.putLong(records.size.toLong)
      buf.putInt(0) // checksum
    }
    if (!deepNameIndex) {
      val btlfAddr = bthdAddr + 38 // fixed BTHD size
      putBthd(0, btlfAddr, records.size)
      require(pos == btlfAddr, "BTHD size drift")
      buf.put("BTLF".getBytes)
      buf.put(0.toByte).put(5.toByte)
      records.foreach(putRecord)
      buf.putInt(0) // checksum
    } else {
      // depth-1 tree: BTIN root with ONE separator record and two BTLF
      // leaves. The child-pointer record-count field width is derived
      // exactly as the reader derives it: min bytes for the leaf capacity.
      require(records.size >= 3, "deep index needs >= 3 links")
      val leafCap = (nodeSize - 10) / recSize
      require(leafCap <= 255, "writer assumes 1-byte child record counts")
      val k = records.size / 2
      val leaf0 = records.take(k)
      val sep = records(k)
      val leaf1 = records.drop(k + 1)
      def leafLen(n: Int) = 6 + n * recSize + 4
      val btinLen = 6 + 2 * (8 + 1) + recSize + 4
      val rootNodeAddr = bthdAddr + 38
      val leaf0Addr = rootNodeAddr + btinLen
      val leaf1Addr = leaf0Addr + leafLen(leaf0.size)
      putBthd(1, rootNodeAddr, 1)
      require(pos == rootNodeAddr, "BTHD size drift")
      buf.put("BTIN".getBytes)
      buf.put(0.toByte).put(5.toByte)
      buf.putLong(leaf0Addr); buf.put(leaf0.size.toByte) // child ptr 0
      putRecord(sep)
      buf.putLong(leaf1Addr); buf.put(leaf1.size.toByte) // child ptr 1
      buf.putInt(0) // checksum
      require(pos == leaf0Addr, "BTIN size drift")
      Seq((leaf0Addr, leaf0), (leaf1Addr, leaf1)).foreach { case (at, recs) =>
        require(pos == at, "leaf drift")
        buf.put("BTLF".getBytes)
        buf.put(0.toByte).put(5.toByte)
        recs.foreach(putRecord)
        buf.putInt(0) // checksum
      }
    }

    val li = ByteBuffer.allocate(18).order(ByteOrder.LITTLE_ENDIAN)
    li.put(0.toByte).put(0.toByte) // version, flags
    li.putLong(frhpAddr).putLong(bthdAddr)
    objectHeaderV2(Seq(0x0002 -> li.array()))
  }

  /** Contiguous dataset under a version-2 object header. */
  def datasetV2(dims: Seq[Long], dt: Dt, raw: Array[Byte]): Long = {
    val dataAddr = writeBytes(raw)
    val layout = ByteBuffer.allocate(18).order(ByteOrder.LITTLE_ENDIAN)
    layout.put(3.toByte).put(1.toByte).putLong(dataAddr).putLong(raw.length.toLong)
    objectHeaderV2(Seq(
      0x0001 -> dataspaceBody(dims),
      0x0003 -> dt.body,
      0x0008 -> layout.array()))
  }

  /** Superblock version 3 (the libver-latest layout): root object header
    * address directly, no symbol-table entry.
    */
  def finishV3(rootHeaderAddr: Long): Array[Byte] = {
    val end = buf.position()
    buf.position(0)
    buf.put(Array(0x89.toByte, 'H'.toByte, 'D'.toByte, 'F'.toByte,
      0x0D.toByte, 0x0A.toByte, 0x1A.toByte, 0x0A.toByte))
    buf.put(3.toByte)            // superblock v3
    buf.put(8.toByte).put(8.toByte) // offset/length sizes
    buf.put(0.toByte)            // consistency flags
    buf.putLong(0L)              // base address
    buf.putLong(Undef)           // superblock extension
    buf.putLong(end.toLong)      // end of file
    buf.putLong(rootHeaderAddr)
    buf.putInt(0)                // checksum (unvalidated)
    java.util.Arrays.copyOf(buf.array(), end)
  }

  /** Write the superblock referencing the root group; returns file bytes. */
  def finish(rootHeaderAddr: Long): Array[Byte] = {
    val end = buf.position()
    buf.position(0)
    buf.put(Array(0x89.toByte, 'H'.toByte, 'D'.toByte, 'F'.toByte,
      0x0D.toByte, 0x0A.toByte, 0x1A.toByte, 0x0A.toByte))
    buf.put(0.toByte) // superblock v0
    buf.put(0.toByte).put(0.toByte).put(0.toByte) // freespace, symtab, reserved
    buf.put(0.toByte) // shared-header version
    buf.put(8.toByte).put(8.toByte).put(0.toByte) // offset/length sizes, reserved
    buf.putShort(4.toShort).putShort(16.toShort) // group leaf / internal K
    buf.putInt(0) // consistency flags
    buf.putLong(0L) // base address
    buf.putLong(Undef) // free-space info
    buf.putLong(end.toLong) // end of file
    buf.putLong(Undef) // driver info
    // root symbol-table entry
    buf.putLong(0L) // link name offset
    buf.putLong(rootHeaderAddr)
    buf.putInt(0).putInt(0) // cache type + reserved
    buf.put(new Array[Byte](16)) // scratch
    java.util.Arrays.copyOf(buf.array(), end)
  }
}

/** Convenience: build a Velox-shaped `.emd` container. */
object Hdf5TestWriter {

  /** One kind/uid signal: dims + doubles (+ optional metadata JSON). */
  final case class Sig(kind: String, uid: String, dims: Seq[Long],
      values: Seq[Double], metadataJson: Option[String] = None,
      chunked: Option[Seq[Int]] = None)

  def emd(sigs: Seq[Sig]): Array[Byte] = {
    val w = new Hdf5TestWriter()
    val uidGroups: Seq[(String, String, Long)] = sigs.map { sig =>
      val raw = ByteBuffer.allocate(sig.values.size * 8).order(ByteOrder.LITTLE_ENDIAN)
      sig.values.foreach(raw.putDouble)
      val dsAddr = sig.chunked match {
        case Some(cd) => w.chunkedDataset(sig.dims, w.float64, raw.array(), cd)
        case None => w.dataset(sig.dims, w.float64, raw.array())
      }
      val children = Seq("Data" -> dsAddr) ++ sig.metadataJson.map { j =>
        // NUL-padded uint8 JSON text, the Velox metadata convention
        val bytes = j.getBytes("UTF-8") ++ Array(0.toByte, 0.toByte)
        "Metadata" -> w.dataset(Seq(bytes.length.toLong), w.uint8, bytes)
      }
      (sig.kind, sig.uid, w.group(children))
    }
    val kindGroups = uidGroups.groupBy(_._1).toSeq.sortBy(_._1).map {
      case (kind, members) =>
        kind -> w.group(members.map(m => m._2 -> m._3))
    }
    val dataGroup = w.group(kindGroups)
    val root = w.group(Seq("Data" -> dataGroup))
    w.finish(root)
  }

  /** Same Velox shape in the libver-latest framing: superblock v3, OHDR
    * headers everywhere, v2 filter messages, shuffle+deflate chunks, and
    * DENSE (fractal-heap) storage for any group past 8 links — the layout
    * a modern h5py writer produces.
    */
  def emdV2(sigs: Seq[Sig]): Array[Byte] = {
    val w = new Hdf5TestWriter()
    def groupAuto(children: Seq[(String, Long)]): Long =
      if (children.size > 8) w.groupV2Dense(children) else w.groupV2(children)
    val uidGroups: Seq[(String, String, Long)] = sigs.map { sig =>
      val raw = ByteBuffer.allocate(sig.values.size * 8).order(ByteOrder.LITTLE_ENDIAN)
      sig.values.foreach(raw.putDouble)
      val dsAddr = sig.chunked match {
        case Some(cd) => w.chunkedDataset(sig.dims, w.float64, raw.array(), cd,
          filterMsgVersion = 2, shuffle = true, v2Header = true)
        case None => w.datasetV2(sig.dims, w.float64, raw.array())
      }
      val children = Seq("Data" -> dsAddr) ++ sig.metadataJson.map { j =>
        val bytes = j.getBytes("UTF-8") ++ Array(0.toByte, 0.toByte)
        "Metadata" -> w.datasetV2(Seq(bytes.length.toLong), w.uint8, bytes)
      }
      (sig.kind, sig.uid, groupAuto(children))
    }
    val kindGroups = uidGroups.groupBy(_._1).toSeq.sortBy(_._1).map {
      case (kind, members) =>
        kind -> groupAuto(members.map(m => m._2 -> m._3))
    }
    val root = groupAuto(Seq("Data" -> groupAuto(kindGroups)))
    w.finishV3(root)
  }
}
