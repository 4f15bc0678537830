package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.util.zip.Inflater

/** Minimal pure-JVM HDF5 reader (SURVEY §2 A4) — enough of the public HDF5
  * file-format specification to open the containers the reference ingests
  * with `hs.load` (/root/reference/picoprobe/tools/hyperspectral.py:51,
  * tools/temporal.py:72): FEI Velox `.emd` files and anything else written
  * with HDF5 1.8-default property lists.
  *
  * Supported subset (the default writer layout plus the libver-latest
  * framing):
  *   - superblocks v0-v3, 8-byte offsets/lengths;
  *   - object headers v1 (with continuation blocks) and v2 ("OHDR", with
  *     "OCHK" continuations; checksums are not validated) — dispatched
  *     per object, so mixed-framing files read correctly;
  *   - old-style groups: symbol-table message → B-tree v1 (node type 0,
  *     any depth) → SNOD symbol nodes, names in the local heap;
  *   - new-style groups with compact link storage (hard Link messages) AND
  *     dense link storage (fractal heap — root direct block, one level of
  *     indirect block, DEFLATED in either form: a filtered root direct
  *     block, or a filtered indirect heap with per-child stored sizes in
  *     the FHIB entries — indexed by a v2 B-tree of any depth); heap IDs
  *     of all three classes: managed, tiny (data inline in the ID), and
  *     huge in all four sub-forms — direct or v2-B-tree-indexed (record
  *     types 1/2), plain or deflate-filtered;
  *   - datatypes: fixed-point (1/2/4/8-byte, signed or unsigned), IEEE
  *     float (4/8-byte), little-endian, fixed-length strings
  *     (NUL-terminated/-padded or space-padded), variable-length strings
  *     (16-byte descriptors resolved through GCOL global-heap
  *     collections), and variable-length SEQUENCES of any numeric base
  *     type (same descriptors; `readVlenSeqs`);
  *   - dataspaces: simple, any rank (v1 and v2 messages);
  *   - layouts: compact (data inline in the object header), contiguous,
  *     and chunked — layout message v3 (B-tree v1 node type 1, any depth)
  *     and v4 (libver-latest) with the Single Chunk, Implicit, and Fixed
  *     Array chunk indexes — with the deflate (zlib,
  *     `java.util.zip.Inflater`), shuffle, and szip ([[Szip]], CCSDS
  *     121.0-B Rice coding) filters in any pipeline
  *     order.
  *
  * Anything outside the subset fails fast with a message naming the
  * unsupported feature rather than misreading data.
  *
  * The reader works on an in-memory byte array — the same representation
  * the streaming pipelines carry files in (a `binary` column), so a parse
  * is executor-local work distributed by file with no driver involvement.
  */
object Hdf5 {

  private val Undefined = -1L // 0xFFFF_FFFF_FFFF_FFFF: "undefined address"

  /** HDF5 datatype: `clazz` 0 = fixed-point, 1 = float, 3 = fixed string,
    * 9 = variable-length — vlen STRING when `base` is empty, vlen
    * SEQUENCE (of `base`) otherwise.
    */
  final case class Dtype(clazz: Int, size: Int, signed: Boolean,
      base: Option[Dtype] = None)

  sealed trait Node { def name: String }

  final case class Group(name: String, children: Vector[Node]) extends Node {
    def child(n: String): Option[Node] = children.find(_.name == n)
    def groups: Vector[Group] = children.collect { case g: Group => g }
    def datasets: Vector[Dataset] = children.collect { case d: Dataset => d }
  }

  final case class Dataset(
      name: String,
      dims: Vector[Long],
      dtype: Dtype,
      private val file: ByteBuffer,
      private val layoutClass: Int,
      private val dataAddr: Long,
      private val dataSize: Long,
      private val chunkDims: Vector[Int],
      private val filters: Vector[(Int, Vector[Int])],
      private val chunkIndex: Int = 0,
      private val singleChunkMask: Int = 0) extends Node {

    /** Element count with OVERFLOW-CHECKED multiplication: dims come from
      * the file as raw u64s, so a hostile dataspace (e.g. 2^32 × 2^32)
      * would wrap `dims.product` to 0 and silently read an empty dataset
      * where the old `total <= Int.MaxValue` guard saw nothing wrong.
      */
    def elementCount: Long =
      try dims.foldLeft(1L) { (a, d) =>
        if (d < 0) fail(s"dataset $name: negative dimension $d")
        Math.multiplyExact(a, d)
      } catch { case _: ArithmeticException =>
        fail(s"dataset $name: dimension product overflows (dims $dims)")
      }

    /** Raw little-endian element bytes in row-major logical order. */
    def readBytes(): Array[Byte] = {
      val total =
        try Math.multiplyExact(elementCount, dtype.size.toLong)
        catch { case _: ArithmeticException =>
          fail(s"dataset $name: byte size overflows (dims $dims × ${dtype.size})")
        }
      require(total <= Int.MaxValue, s"dataset $name too large for one array")
      layoutClass match {
        case 0 => // compact: raw data inline in the object header message
          require(dataSize >= total,
            s"compact dataset $name: stored $dataSize < logical $total bytes")
          slice(dataAddr, total.toInt)
        case 1 => // contiguous
          if (dataAddr == Undefined) new Array[Byte](total.toInt)
          else slice(dataAddr, total.toInt)
        case 2 => // chunked: resolve chunk extents via the layout's index
          val out = new Array[Byte](total.toInt)
          chunkIndex match {
            case 0 => // v3 layout: v1 B-tree, any depth
              walkChunkTree(dataAddr, out)
            case 1 => // v4 Single Chunk: the whole dataset is one chunk
              if (dataAddr != Undefined) {
                val stored =
                  if (filters.nonEmpty) dataSize
                  else chunkDims.map(_.toLong).product * dtype.size
                copyChunk(decodeChunk(slice(dataAddr, stored.toInt),
                    singleChunkMask),
                  Vector.fill(dims.length)(0L), out)
              }
            case 2 => // v4 Implicit: dense unfiltered grid, consecutive
              require(filters.isEmpty,
                "implicit chunk index cannot carry a filter pipeline")
              val chunkBytes = chunkDims.map(_.toLong).product * dtype.size
              foreachChunkOrigin { (k, origin) =>
                copyChunk(slice(dataAddr + k * chunkBytes, chunkBytes.toInt),
                  origin, out)
              }
            case 3 => // v4 Fixed Array: linear chunk-grid index
              val entries = fixedArrayEntries(dataAddr)
              foreachChunkOrigin { (k, origin) =>
                // the entry count comes from the index header, the grid
                // size from dims/chunkDims — a corrupt header can make
                // them disagree, and entries(k) past the end is a raw
                // vector crash, not a named refusal
                if (k >= entries.length)
                  fail(s"dataset $name: fixed-array index has " +
                    s"${entries.length} entries, chunk grid needs chunk $k")
                val (addr, stored, mask) = entries(k)
                if (addr != Undefined)
                  copyChunk(decodeChunk(slice(addr, stored.toInt), mask),
                    origin, out)
              }
            case t => fail(s"chunk index type $t not supported " +
              "(extensible-array and v2-B-tree indexes need unlimited dims)")
          }
          out
        case c => fail(s"layout class $c (virtual) not supported")
      }
    }

    /** Decode a fixed-length string dataset (datatype class 3): one
      * string per element, trimmed at the first NUL (termination and NUL
      * padding) or of trailing spaces (space padding).
      */
    def readStrings(): Array[String] = {
      require(dtype.clazz == 3 || (dtype.clazz == 9 && dtype.base.isEmpty),
        s"dataset $name is not a string dataset")
      val raw = readBytes()
      val n = raw.length / dtype.size
      if (dtype.clazz == 9) {
        // each element is a 16-byte descriptor {length u32, global-heap
        // collection address u64, object index u32}
        val bb = ByteBuffer.wrap(raw).order(ByteOrder.LITTLE_ENDIAN)
        Array.tabulate(n) { i =>
          val off = i * dtype.size
          val len = bb.getInt(off)
          val addr = bb.getLong(off + 4)
          val idx = bb.getInt(off + 12)
          if (len < 0) fail(s"dataset $name: vlen descriptor length $len")
          new String(gheapObject(file, addr, idx, len), 0, len,
            java.nio.charset.StandardCharsets.UTF_8)
        }
      } else Array.tabulate(n) { i =>
        val start = i * dtype.size
        var end = start
        while (end < start + dtype.size && raw(end) != 0) end += 1
        new String(raw, start, end - start,
          java.nio.charset.StandardCharsets.UTF_8)
          .replaceAll(" +$", "")
      }
    }

    /** Decode to doubles (the engine's signal `data` representation). */
    def readDoubles(): Array[Double] = decodeDoubles(readBytes(), dtype, name)

    /** Decode a variable-length SEQUENCE dataset (datatype class 9,
      * non-string flavor): each element is a 16-byte descriptor
      * {count u32, global-heap collection address u64, object index u32}
      * whose heap object holds `count` packed base-type elements.
      */
    def readVlenSeqs(): Array[Array[Double]] = {
      val base = dtype.base.getOrElse(
        fail(s"dataset $name is not a variable-length sequence"))
      val raw = readBytes()
      val n = raw.length / dtype.size
      val bb = ByteBuffer.wrap(raw).order(ByteOrder.LITTLE_ENDIAN)
      Array.tabulate(n) { i =>
        val off = i * dtype.size
        val count = bb.getInt(off)
        val addr = bb.getLong(off + 4)
        val idx = bb.getInt(off + 12)
        if (count < 0 || count.toLong * base.size > Int.MaxValue)
          fail(s"dataset $name: vlen sequence count $count")
        if (count == 0) new Array[Double](0)
        else decodeDoubles(
          gheapObject(file, addr, idx, count * base.size), base, name)
      }
    }

    private def decodeDoubles(raw: Array[Byte], dtype: Dtype,
        name: String): Array[Double] = {
      val n = (raw.length / dtype.size)
      val bb = ByteBuffer.wrap(raw).order(ByteOrder.LITTLE_ENDIAN)
      val out = new Array[Double](n)
      var i = 0
      (dtype.clazz, dtype.size, dtype.signed) match {
        case (0, 1, false) => while (i < n) { out(i) = bb.get(i) & 0xFF; i += 1 }
        case (0, 1, true)  => while (i < n) { out(i) = bb.get(i).toDouble; i += 1 }
        case (0, 2, false) => while (i < n) { out(i) = bb.getShort(i * 2) & 0xFFFF; i += 1 }
        case (0, 2, true)  => while (i < n) { out(i) = bb.getShort(i * 2).toDouble; i += 1 }
        case (0, 4, false) => while (i < n) { out(i) = bb.getInt(i * 4) & 0xFFFFFFFFL; i += 1 }
        case (0, 4, true)  => while (i < n) { out(i) = bb.getInt(i * 4).toDouble; i += 1 }
        case (0, 8, false) => while (i < n) {
          // unsigned 64-bit: values past Long.MaxValue wrap negative in the
          // raw long — re-bias by 2^64 instead of misreading them as negative
          val v = bb.getLong(i * 8)
          out(i) = if (v >= 0) v.toDouble else v.toDouble + 1.8446744073709552E19
          i += 1
        }
        case (0, 8, true)  => while (i < n) { out(i) = bb.getLong(i * 8).toDouble; i += 1 }
        case (1, 4, _)     => while (i < n) { out(i) = bb.getFloat(i * 4).toDouble; i += 1 }
        case (1, 8, _)     => while (i < n) { out(i) = bb.getDouble(i * 8); i += 1 }
        case (c, s, _)     => fail(s"datatype class $c size $s not supported")
      }
      out
    }

    private def slice(addr: Long, len: Int): Array[Byte] = {
      // named bounds check BEFORE the toInt narrowing: a 64-bit extent
      // address past 2 GiB would otherwise truncate into range and
      // misread, and a u32 stored-size past Int.MaxValue arrives here as
      // a negative len (allocation would crash namelessly); subtraction
      // form so a huge addr cannot overflow the sum past the check
      if (len < 0 || addr < 0 || addr > file.limit() - len)
        fail(s"dataset $name: extent [$addr, +$len) outside the container " +
          s"(${file.limit()} bytes)")
      val a = new Array[Byte](len)
      val dup = file.duplicate()
      dup.position(addr.toInt)
      dup.get(a)
      a
    }

    private def walkChunkTree(addr: Long, out: Array[Byte],
        path: Set[Long] = Set.empty): Unit = {
      if (addr == Undefined) return
      // a corrupt child pointer aiming back at an ancestor node would
      // recurse forever — the hang is worse than the crash it prevents
      if (path(addr)) fail(s"chunk B-tree cycle at node $addr")
      val b = reader(file, addr)
      b.expect("TREE")
      val nodeType = b.u8()
      require(nodeType == 1, s"B-tree node type $nodeType in chunk index")
      val level = b.u8()
      val nEntries = b.u16()
      b.skip(16) // left/right siblings
      val rank = dims.length
      var e = 0
      while (e < nEntries) {
        // key: chunk byte size, filter mask, then rank+1 chunk offsets
        val chunkBytes = b.u32()
        val mask = b.u32().toInt // bit i: pipeline position i skipped
        val offsets = Vector.fill(rank + 1)(b.u64())
        val child = b.u64()
        if (level > 0) {
          val save = b.pos
          walkChunkTree(child, out, path + addr)
          b.pos = save
        } else {
          copyChunk(decodeChunk(slice(child, chunkBytes.toInt), mask),
            offsets.take(rank).map(_.toLong), out)
        }
        e += 1
      }
    }

    /** Decode one stored chunk through the filter pipeline in reverse
      * order (write order was e.g. shuffle → deflate, so read inflates
      * first, then unshuffles). `mask` is the chunk's filter mask from
      * its index entry: bit i set means pipeline POSITION i was skipped
      * when the chunk was written (libhdf5 sets it when an
      * H5Z_FLAG_OPTIONAL filter — szip under some shapes — declines a
      * chunk), so that position must be skipped on read too. Feeding
      * such a chunk through the full pipeline would misread its first
      * bytes as the szip size prefix or fail inflate — silently wrong
      * or confusingly failed samples either way.
      */
    private def decodeChunk(stored: Array[Byte], mask: Int): Array[Byte] = {
      // inflate cap: the pipeline's final output is exactly the nominal
      // chunk extent, and the only legitimate over-extent intermediate
      // is a slightly-expanded coded stream (incompressible data) — 4×
      // nominal plus a fixed slack covers every real encoder while still
      // refusing gigabyte bombs at kilobyte scale
      val cap = 4L * chunkNominalBytes + 65536L
      var raw = stored
      filters.zipWithIndex.reverse.foreach { case ((id, cd), pos) =>
        if ((mask & (1 << pos)) == 0) id match {
          case 1 => raw = inflate(raw, cap)
          case 2 => raw = unshuffle(raw, dtype.size)
          case 4 => raw = Szip.decodeHdf5(raw, cd)
          case f => fail(s"filter $f in chunk pipeline")
        }
      }
      raw
    }

    /** Nominal chunk byte extent with the sign/overflow checks every
      * chunked path needs before trusting file-borne chunk dims. */
    private def chunkNominalBytes: Long = {
      chunkDims.foreach(c =>
        if (c <= 0) fail(s"dataset $name: chunk dimension $c"))
      try chunkDims.foldLeft(dtype.size.toLong)((a, c) =>
        Math.multiplyExact(a, c.toLong))
      catch { case _: ArithmeticException =>
        fail(s"dataset $name: chunk byte size overflows " +
          s"(chunk $chunkDims × ${dtype.size})")
      }
    }

    /** Visit every chunk-grid cell in row-major order: (linear index,
      * element-coordinate origin) — the order every v4 linear chunk
      * index (implicit, fixed-array) is laid out in.
      */
    private def foreachChunkOrigin(f: (Int, Vector[Long]) => Unit): Unit = {
      val rank = dims.length
      // chunk dims arrive as raw u32/encoded ints: zero would divide by
      // zero below, negative (a > 2^31 value truncated) would walk the
      // grid backwards, and an overflowing grid product would skip the
      // loop and return all-zero data without a word; a rank disagreeing
      // with the dataspace (corrupt layout message) would index past one
      // of the two vectors mid-walk
      if (chunkDims.length != rank)
        fail(s"dataset $name: chunk rank ${chunkDims.length} != " +
          s"dataspace rank $rank")
      chunkDims.foreach(c =>
        if (c <= 0) fail(s"dataset $name: chunk dimension $c"))
      val n = Vector.tabulate(rank)(d =>
        ((dims(d) + chunkDims(d) - 1) / chunkDims(d)).toInt)
      val totalChunks =
        try n.foldLeft(1)((a, c) => Math.multiplyExact(a, c))
        catch { case _: ArithmeticException =>
          fail(s"dataset $name: chunk-grid size overflows (grid $n)")
        }
      var k = 0
      while (k < totalChunks) {
        var rem = k
        val origin = new Array[Long](rank)
        var d = rank - 1
        while (d >= 0) {
          origin(d) = (rem % n(d)).toLong * chunkDims(d)
          rem /= n(d)
          d -= 1
        }
        f(k, origin.toVector)
        k += 1
      }
    }

    /** The (address, stored size, filter mask) of every chunk in a v4
      * Fixed Array index, by linear grid index. Client 0 entries are
      * bare addresses (stored size is the nominal chunk size, nothing
      * skipped); client 1 (filtered) adds a variable-width stored size
      * and the per-chunk filter mask. Paged data blocks
      * (> 2^pageBits entries) fail fast.
      */
    private def fixedArrayEntries(addr: Long): Vector[(Long, Long, Int)] = {
      val b = reader(file, addr)
      b.expect("FAHD")
      if (b.u8() != 0) fail("FAHD version")
      val clientId = b.u8()
      if (clientId != 0 && clientId != 1) fail(s"FAHD client id $clientId")
      val entrySize = b.u8()
      val pageBits = b.u8()
      val nEntries = b.u64()
      val dbAddr = b.u64()
      if (nEntries < 0 || nEntries > Int.MaxValue)
        fail(s"fixed-array chunk index claims $nEntries entries")
      if (nEntries > (1L << math.min(62, pageBits)))
        fail("paged fixed-array chunk index not supported")
      if (clientId == 1 && entrySize < 8 + 1 + 4)
        fail(s"filtered fixed-array entry size $entrySize too small")
      val db = reader(file, dbAddr)
      db.expect("FADB")
      if (db.u8() != 0) fail("FADB version")
      if (db.u8() != clientId) fail("FADB client id mismatch")
      db.u64() // header address (back-pointer; not validated)
      val nominal = chunkDims.map(_.toLong).product * dtype.size
      Vector.fill(nEntries.toInt) {
        if (clientId == 0) (db.u64(), nominal, 0)
        else {
          val a = db.u64()
          val szBytes = entrySize - 8 - 4
          var sz = 0L
          var i = 0
          while (i < szBytes) { sz |= (db.u8().toLong << (8 * i)); i += 1 }
          val mask = db.u32().toInt
          (a, sz, mask)
        }
      }
    }

    /** Scatter one decoded chunk into the row-major output buffer. */
    private def copyChunk(raw: Array[Byte], at: Vector[Long], out: Array[Byte]): Unit = {
      val rank = dims.length
      val es = dtype.size
      val cd = chunkDims
      // the v1-B-tree and single-chunk paths reach here without passing
      // foreachChunkOrigin's grid checks, so the rank guard repeats
      if (cd.length != rank)
        fail(s"dataset $name: chunk rank ${cd.length} != dataspace rank $rank")
      // the v1-B-tree path never passes foreachChunkOrigin's grid checks,
      // so the sign guards repeat here (chunkNominalBytes carries the
      // dim-sign and overflow checks): a NEGATIVE chunk dim would make
      // `needed` negative below (64 < -33554424 is false — the length
      // check silently passes) and then wrap the Int element product in
      // the scatter loop; a negative node offset walks `dest` outside
      // the output buffer while passing the `g >= dims` edge test
      at.foreach(o => if (o < 0) fail(s"dataset $name: chunk offset $o"))
      // an HDF5 chunk is always full-size (edge chunks zero-padded), so a
      // decoded chunk shorter than the nominal extent means a corrupt
      // stored size or filter output — scattering it would read past the
      // source array (raw JVM error) or, worse, misplace live bytes
      val needed = chunkNominalBytes
      if (raw.length < needed)
        fail(s"dataset $name: chunk decoded to ${raw.length} bytes, " +
          s"nominal extent is $needed")
      // row-major strides of the full dataset, in elements
      val strides = new Array[Long](rank)
      var s = 1L
      var d = rank - 1
      while (d >= 0) { strides(d) = s; s *= dims(d); d -= 1 }
      // iterate chunk-local coordinates, skipping out-of-bounds edge excess
      val local = new Array[Int](rank)
      val nChunkElems = cd.product
      var i = 0
      while (i < nChunkElems) {
        var rem = i
        var dd = rank - 1
        while (dd >= 0) { local(dd) = rem % cd(dd); rem /= cd(dd); dd -= 1 }
        var inBounds = true
        var dest = 0L
        dd = 0
        while (dd < rank) {
          val g = at(dd) + local(dd)
          if (g >= dims(dd)) { inBounds = false; dd = rank }
          else { dest += g * strides(dd); dd += 1 }
        }
        if (inBounds)
          System.arraycopy(raw, i * es, out, (dest * es).toInt, es)
        i += 1
      }
    }

    /** Reverse the HDF5 shuffle filter: stored layout is byte-plane-major
      * (all 1st bytes of every element, then all 2nd bytes, …) —
      * transpose back to element-major.
      */
    private def unshuffle(in: Array[Byte], es: Int): Array[Byte] = {
      if (es <= 1) return in
      val n = in.length / es
      val out = new Array[Byte](in.length)
      var k = 0
      var j = 0
      while (j < es) {
        var i = 0
        while (i < n) { out(i * es + j) = in(k); k += 1; i += 1 }
        j += 1
      }
      out
    }

    /** `cap`: the most bytes the CALLER can legitimately accept — the
      * inflater stops and refuses by name once output passes it. Without
      * the cap a zip-bomb chunk (a few KB of valid deflate expanding to
      * gigabytes of zeros) exhausts the heap BEFORE the nominal-extent
      * check in copyChunk ever sees the result.
      */
    private def inflate(in: Array[Byte], cap: Long): Array[Byte] = {
      val inf = new Inflater()
      inf.setInput(in)
      val buf = new Array[Byte](64 * 1024)
      val bos = new java.io.ByteArrayOutputStream()
      while (!inf.finished()) {
        // a corrupt zlib stream throws DataFormatException out of the
        // native inflater — convert to the reader's named failure so a
        // flipped bit in chunk data reads as "corrupt file", not as a
        // raw JVM error escaping an executor task
        val n =
          try inf.inflate(buf)
          catch { case e: java.util.zip.DataFormatException =>
            fail(s"corrupt deflate chunk (${e.getMessage})")
          }
        // needsDictionary: an FDICT zlib stream makes inflate() return 0
        // forever without needing input — without the check this loop
        // would hang, not fail
        if (n == 0 && (inf.needsInput() || inf.needsDictionary()))
          fail("truncated deflate chunk")
        if (bos.size().toLong + n > cap)
          fail(s"deflate chunk inflates past $cap bytes " +
            s"(zip bomb or corrupt stored size)")
        bos.write(buf, 0, n)
      }
      inf.end()
      bos.toByteArray
    }
  }

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"HDF5: $msg")

  /** Open an HDF5 container from bytes; returns the root group. */
  def open(bytes: Array[Byte]): Group = {
    val file = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val magic = Array(0x89, 'H'.toInt, 'D'.toInt, 'F'.toInt, 0x0D, 0x0A, 0x1A, 0x0A)
    if (bytes.length < 8 || magic.indices.exists(i => (bytes(i) & 0xFF) != magic(i)))
      fail("not an HDF5 container (bad signature)")
    val b = reader(file, 8)
    val sbVersion = b.u8()
    val rootHeader = sbVersion match {
      case 0 | 1 =>
        b.skip(4) // freespace/symtab/reserved/shared-header versions
        val offSize = b.u8()
        val lenSize = b.u8()
        if (offSize != 8 || lenSize != 8) fail(s"offset/length size $offSize/$lenSize")
        b.skip(1 + 2 + 2 + 4) // reserved, group K's, consistency flags
        if (sbVersion == 1) b.skip(4) // indexed-storage K + reserved
        b.skip(4 * 8) // base, freespace, EOF, driver-info addresses
        // root group symbol-table entry
        b.u64() // link name offset
        b.u64() // root object header address
      case 2 | 3 =>
        val offSize = b.u8()
        val lenSize = b.u8()
        if (offSize != 8 || lenSize != 8) fail(s"offset/length size $offSize/$lenSize")
        b.u8() // consistency flags
        b.u64() // base address
        b.u64() // superblock extension
        b.u64() // end of file
        b.u64() // root object header address (last read below via return)
      case v => fail(s"superblock version $v not supported")
    }
    readGroup(file, "/", rootHeader)
  }

  /** Object-header message, materialized across continuation blocks. */
  private final case class Msg(typ: Int, body: R)

  /** Parse a version-1 OR version-2 ("OHDR") object header — the version
    * is per object, so a file may legally mix both framings.
    */
  private def messages(file: ByteBuffer, headerAddr: Long): Vector[Msg] = {
    val h = reader(file, headerAddr)
    if (h.peek4() == "OHDR") messagesV2(file, headerAddr)
    else messagesV1(file, headerAddr)
  }

  private def messagesV1(file: ByteBuffer, headerAddr: Long): Vector[Msg] = {
    val h = reader(file, headerAddr)
    val version = h.u8()
    if (version != 1) fail(s"object header version $version (only 1/2 supported)")
    h.skip(1)
    val nMsgs = h.u16()
    h.u32() // reference count
    val headerSize = h.u32()
    h.skip(4) // prefix pads to 8-byte alignment
    var blocks = List((h.pos, headerSize.toInt))
    // a continuation pointing back at an already-queued block would loop
    // forever appending itself — track visited block starts and fail
    val seen = scala.collection.mutable.Set(h.pos)
    val out = Vector.newBuilder[Msg]
    var read = 0
    while (read < nMsgs && blocks.nonEmpty) {
      val (start, len) = blocks.head
      blocks = blocks.tail
      val b = reader(file, start)
      val end = start + len
      while (read < nMsgs && b.pos + 8 <= end) {
        val typ = b.u16()
        val size = b.u16()
        b.skip(4) // flags + reserved
        val bodyStart = b.pos
        if (typ == 0x0010) { // continuation: queue another block
          val off = b.u64()
          val clen = b.u64()
          if (!seen.add(off)) fail(s"object-header continuation cycle at $off")
          blocks = blocks :+ ((off, clen.toInt))
        }
        out += Msg(typ, reader(file, bodyStart))
        b.pos = bodyStart + size
        read += 1
      }
    }
    out.result()
  }

  /** Version-2 object header: "OHDR" framing, 1-byte message types, no
    * inter-message padding, "OCHK"-signed continuation blocks, trailing
    * checksums (not validated — corruption surfaces as a parse failure).
    */
  private def messagesV2(file: ByteBuffer, headerAddr: Long): Vector[Msg] = {
    val h = reader(file, headerAddr)
    h.expect("OHDR")
    val version = h.u8()
    if (version != 2) fail(s"OHDR version $version")
    val flags = h.u8()
    if ((flags & 0x20) != 0) h.skip(16) // times
    if ((flags & 0x10) != 0) h.skip(4)  // compact/dense phase bounds
    val sizeBytes = 1 << (flags & 0x3)
    val chunk0 = (0 until sizeBytes).map(i => (h.u8().toLong) << (8 * i)).sum
    val tracked = (flags & 0x04) != 0 // creation order tracked per message
    val msgHdrLen = 4 + (if (tracked) 2 else 0)
    var blocks = List((h.pos, chunk0))
    val seen = scala.collection.mutable.Set(h.pos) // continuation-cycle guard
    val out = Vector.newBuilder[Msg]
    while (blocks.nonEmpty) {
      val (start, len) = blocks.head
      blocks = blocks.tail
      val b = reader(file, start)
      val end = start + len
      while (b.pos + msgHdrLen <= end) {
        val typ = b.u8()
        val size = b.u16()
        b.u8() // message flags
        if (tracked) b.skip(2)
        val bodyStart = b.pos
        if (typ == 0x10) { // continuation: "OCHK" + messages + checksum
          val off = b.u64()
          val clen = b.u64()
          if (!seen.add(off + 4)) fail(s"object-header continuation cycle at $off")
          blocks = blocks :+ ((off + 4, clen - 8))
        }
        out += Msg(typ, reader(file, bodyStart))
        b.pos = bodyStart + size
      }
    }
    out.result()
  }

  /** `path` carries the header addresses of the ancestors on the CURRENT
    * branch (not everything visited): a hard link back to an ancestor is a
    * cycle and must fail, while a legal diamond — two groups hard-linking
    * the same child — just re-reads it.
    */
  private def readGroup(file: ByteBuffer, name: String, headerAddr: Long,
      path: Set[Long] = Set.empty): Group = {
    if (path(headerAddr)) fail(s"group cycle at object header $headerAddr")
    val msgs = messages(file, headerAddr)
    val entries: Vector[(String, Long)] = msgs.find(_.typ == 0x0011) match {
      case Some(symtab) => // old-style: B-tree + local heap
        val btreeAddr = symtab.body.u64()
        val heapAddr = symtab.body.u64()
        val heapData = localHeapDataAddr(file, heapAddr)
        val out = Vector.newBuilder[(String, Long)]
        walkGroupTree(file, btreeAddr, heapData, out)
        out.result()
      case None => // new-style: compact Link messages and/or dense storage
        val compact = msgs.filter(_.typ == 0x0006).map(m => readLink(m.body))
        val dense = msgs.find(_.typ == 0x0002).map { li => // Link Info
          val b = li.body
          b.skip(1) // version
          val f = b.u8()
          if ((f & 0x1) != 0) b.skip(8) // max creation index
          val fheapAddr = b.u64()
          val nameBtreeAddr = b.u64()
          if (fheapAddr != Undefined) readDenseLinks(file, fheapAddr, nameBtreeAddr)
          else Vector.empty[(String, Long)]
        }.getOrElse(Vector.empty)
        compact ++ dense
    }
    val children = entries.map { case (childName, childHeader) =>
      val childMsgs = messages(file, childHeader)
      // a layout message marks a dataset; anything else is a group
      if (childMsgs.exists(_.typ == 0x0008)) readDataset(file, childName, childMsgs)
      else readGroup(file, childName, childHeader, path + headerAddr)
    }
    Group(name, children)
  }

  // -- dense (fractal-heap) link storage ------------------------------------

  /** Fractal-heap managed space: (heapOffset, size, fileAddr) per direct
    * block. Managed heap IDs resolve to file offsets arithmetically —
    * a block's heap-offset space includes its own header, so
    * `fileAddr + (offset - blockHeapOffset)` lands on the object bytes.
    */
  /** One direct block: its heap-offset extent plus the buffer holding its
    * bytes — the file itself for plain blocks, a standalone inflated
    * buffer (base 0) for filtered ones.
    */
  private final case class HeapBlock(
      heapOff: Long, size: Long, buf: ByteBuffer, base: Long)

  private final case class HeapBlocks(
      blocks: Vector[HeapBlock], offsetSize: Int, heapIdLen: Int,
      filtered: Boolean, hugeBtree: Long) {
    def locate(id: Array[Byte]): (ByteBuffer, Long) = {
      require(((id(0) >> 4) & 0x3) == 0, "locate is for managed IDs")
      var off = 0L
      var i = 0
      while (i < offsetSize) { off |= (id(1 + i) & 0xFFL) << (8 * i); i += 1 }
      blocks.find(b => off >= b.heapOff && off < b.heapOff + b.size) match {
        case Some(b) => (b.buf, b.base + (off - b.heapOff))
        case None => fail(s"fractal-heap offset $off outside every direct block")
      }
    }

    /** The huge-object index, parsed on first indexed huge ID and cached:
      * v2 B-tree record type 1 (plain: address, length, id) or 2
      * (filtered: adds filter mask + de-filtered memory size), keyed by
      * huge-object id.
      */
    private var hugeIndexCache: Map[Long, HugeObject] = null
    private def hugeIndex(file: ByteBuffer): Map[Long, HugeObject] = {
      if (hugeIndexCache == null) {
        if (hugeBtree == Undefined)
          fail("indexed huge heap ID but heap header has no huge-object B-tree")
        val (typ, recs) = btreeV2Records(file, hugeBtree, Set(1, 2))
        hugeIndexCache = recs.map { rec =>
          val r = new R(ByteBuffer.wrap(rec).order(ByteOrder.LITTLE_ENDIAN), 0)
          val addr = r.u64()
          val len = r.u64()
          val mem = if (typ == 2) { r.u32(); r.u64() } else len
          val id = r.u64()
          id -> HugeObject(addr, len, typ == 2, mem)
        }.toMap
      }
      hugeIndexCache
    }

    /** Huge object bytes as a standalone reader: filtered extents inflate
      * into their own buffer (checked against the stored memory size);
      * plain extents read in place.
      */
    private def hugeReader(file: ByteBuffer, h: HugeObject): R =
      if (!h.filtered) new R(file, h.addr)
      else {
        // subtraction form: a hostile u64 (addr, len) pair can overflow
        // addr + len negative and slip past an addition-form check — the
        // exact silent-misread this guard exists to stop
        if (h.len < 0 || h.len > file.limit() ||
            h.addr < 0 || h.addr > file.limit() - h.len)
          fail(s"huge object extent [${h.addr}, +${h.len}) outside the container")
        val raw = new Array[Byte](h.len.toInt)
        var j = 0
        while (j < raw.length) { raw(j) = file.get((h.addr + j).toInt); j += 1 }
        val inflated = inflateBytes(raw, h.memSize)
        require(inflated.length == h.memSize,
          s"filtered huge object inflated to ${inflated.length} != ${h.memSize}")
        new R(ByteBuffer.wrap(inflated).order(ByteOrder.LITTLE_ENDIAN), 0)
      }

    /** A reader positioned on the object's bytes, for any heap ID class
      * (spec III.G): MANAGED resolves through the block map; TINY carries
      * the object DATA itself inline (normal sub-variant: low nibble of
      * the flag byte is length−1); HUGE covers all four sub-forms — the
      * ID is DIRECT when the heap's ID length fits the whole file extent
      * (address + length, plus filter mask + de-filtered size on filtered
      * heaps — libhdf5's own rule), else it carries a huge-object id
      * resolved through the header's v2 B-tree (record type 1 plain /
      * 2 filtered).
      */
    def objectReader(file: ByteBuffer, id: Array[Byte]): R = {
      (id(0) >> 4) & 0x3 match {
        case 0 =>
          val (buf, at) = locate(id)
          new R(buf, at)
        case 1 =>
          val directLen = if (filtered) 1 + 8 + 8 + 4 + 8 else 1 + 8 + 8
          val r = new R(ByteBuffer.wrap(id).order(ByteOrder.LITTLE_ENDIAN), 1)
          if (heapIdLen >= directLen) {
            val addr = r.u64()
            val len = r.u64()
            val mem = if (filtered) { r.u32(); r.u64() } else len
            hugeReader(file, HugeObject(addr, len, filtered, mem))
          } else {
            val hid = r.u64()
            hugeReader(file, hugeIndex(file).getOrElse(hid,
              fail(s"huge object id $hid not in the huge-object B-tree")))
          }
        case 2 =>
          val len = (id(0) & 0x0F) + 1
          require(1 + len <= id.length, s"tiny object length $len overruns ID")
          new R(ByteBuffer.wrap(id).order(ByteOrder.LITTLE_ENDIAN), 1)
        case t => fail(s"fractal-heap object type $t not supported")
      }
    }
  }

  /** One huge object's file extent: filtered extents store `len` deflated
    * bytes that inflate to exactly `memSize`.
    */
  private final case class HugeObject(
      addr: Long, len: Long, filtered: Boolean, memSize: Long)

  /** Parse a fractal heap's block map: root direct block, or one root
    * indirect block of direct children (the layouts h5py emits for group
    * link storage). The doubling table: rows 0-1 are `startSize` blocks,
    * row k ≥ 2 is `startSize · 2^(k-1)`, `width` blocks per row.
    */
  private def parseFractalHeap(file: ByteBuffer, addr: Long): HeapBlocks = {
    val b = reader(file, addr)
    b.expect("FRHP")
    val ver = b.u8()
    if (ver != 0) fail(s"FRHP version $ver")
    val heapIdLen = b.u16()
    val ioFilterLen = b.u16()
    b.u8() // flags (direct-block checksums not validated)
    b.u32() // max managed object size
    b.u64() // next huge object id
    val hugeBtree = b.u64() // huge-object v2 B-tree (Undefined: direct IDs)
    b.skip(8 * 10) // free/managed/huge/tiny bookkeeping — not needed to read
    val width = b.u16()
    val startSize = b.u64()
    val maxDirectSize = b.u64()
    val maxHeapBits = b.u16()
    b.u16() // starting rows
    val rootAddr = b.u64()
    val curRows = b.u16()
    val offsetSize = (maxHeapBits + 7) / 8
    require(heapIdLen > 1 + offsetSize, s"heap ID length $heapIdLen inconsistent")
    def rowSize(r: Int): Long = if (r < 2) startSize else startSize << (r - 1)

    // FILTERED heap, both forms (spec IV.B): with a DIRECT root block
    // the FRHP tail carries that block's stored (compressed) size and
    // filter mask before the pipeline body, and the whole block — header
    // included — inflates into its own buffer; with an INDIRECT root the
    // two fields are absent and instead EACH direct-block entry in the
    // FHIB gains {stored size, filter mask} after its address, every
    // child inflating separately.
    if (ioFilterLen > 0) {
      val filteredRootSize = if (curRows == 0) b.u64() else 0L
      if (curRows == 0) b.u32() // root filter mask
      val pv = b.u8()
      if (pv != 1 && pv != 2) fail(s"heap filter pipeline version $pv")
      val nf = b.u8()
      if (pv == 1) b.skip(6)
      var i = 0
      while (i < nf) {
        val id = b.u16()
        val nameLen = if (pv == 1 || id >= 256) b.u16() else 0
        b.u16() // flags
        val nVals = b.u16()
        b.skip(nameLen)
        b.skip(4 * nVals + (if (pv == 1 && nVals % 2 == 1) 4 else 0))
        if (id != 1) fail(s"heap filter $id not supported (deflate only)")
        i += 1
      }
      // standalone inflated buffer for one stored extent; FHDB-checked
      def inflateBlock(at: Long, stored: Long, logical: Long): HeapBlock = {
        if (stored < 0 || stored > file.limit() ||
            at < 0 || at > file.limit() - stored)
          fail(s"filtered heap block extent [$at, +$stored) outside the container")
        val raw = new Array[Byte](stored.toInt)
        var j = 0
        while (j < raw.length) { raw(j) = file.get((at + j).toInt); j += 1 }
        val inflated = inflateBytes(raw, 4L * logical + 65536L)
        require(inflated.length >= logical,
          s"filtered direct block inflated to ${inflated.length} < $logical")
        val blockBuf = ByteBuffer.wrap(inflated).order(ByteOrder.LITTLE_ENDIAN)
        new R(blockBuf, 0).expect("FHDB")
        HeapBlock(0L, logical, blockBuf, 0L)
      }
      if (curRows == 0)
        return HeapBlocks(
          Vector(inflateBlock(rootAddr, filteredRootSize, startSize)),
          offsetSize, heapIdLen, filtered = true, hugeBtree)
      val maxDirectRows =
        java.lang.Long.numberOfTrailingZeros(maxDirectSize / startSize) + 2
      if (curRows > maxDirectRows)
        fail("nested indirect fractal-heap blocks not supported")
      val ib = reader(file, rootAddr)
      ib.expect("FHIB")
      if (ib.u8() != 0) fail("FHIB version")
      ib.u64() // heap header address
      ib.skip(offsetSize) // root block offset (0)
      val out = Vector.newBuilder[HeapBlock]
      var heapOff = 0L
      var r = 0
      while (r < curRows) {
        var c = 0
        while (c < width) {
          val child = ib.u64()
          val stored = ib.u64() // this child's stored (filtered) size
          ib.u32() // this child's filter mask
          if (child != Undefined)
            out += inflateBlock(child, stored, rowSize(r))
              .copy(heapOff = heapOff)
          heapOff += rowSize(r)
          c += 1
        }
        r += 1
      }
      return HeapBlocks(out.result(), offsetSize, heapIdLen,
        filtered = true, hugeBtree)
    }

    val blocks = Vector.newBuilder[(Long, Long, Long)]
    if (curRows == 0) {
      if (rootAddr != Undefined) blocks += ((0L, startSize, rootAddr))
    } else {
      val maxDirectRows =
        java.lang.Long.numberOfTrailingZeros(maxDirectSize / startSize) + 2
      if (curRows > maxDirectRows)
        fail("nested indirect fractal-heap blocks not supported")
      val ib = reader(file, rootAddr)
      ib.expect("FHIB")
      if (ib.u8() != 0) fail("FHIB version")
      ib.u64() // heap header address
      ib.skip(offsetSize) // root block offset (0)
      var heapOff = 0L
      var r = 0
      while (r < curRows) {
        var c = 0
        while (c < width) {
          val child = ib.u64()
          if (child != Undefined) blocks += ((heapOff, rowSize(r), child))
          heapOff += rowSize(r)
          c += 1
        }
        r += 1
      }
    }
    val hb = blocks.result()
    hb.foreach { case (_, _, a) => reader(file, a).expect("FHDB") }
    HeapBlocks(hb.map { case (ho, sz, a) => HeapBlock(ho, sz, file, a) },
      offsetSize, heapIdLen, filtered = false, hugeBtree)
  }

  /** zlib inflate of a standalone byte extent (object-scope twin of the
    * Dataset-local chunk inflater). `cap` is the caller's known maximum
    * legitimate output — the heap-block logical size or the huge
    * object's memSize — so a zip-bomb extent refuses by name instead of
    * exhausting the heap before the post-inflate length check runs.
    */
  private def inflateBytes(in: Array[Byte], cap: Long): Array[Byte] = {
    val inf = new Inflater()
    inf.setInput(in)
    val out = new java.io.ByteArrayOutputStream(
      math.min(cap, in.length.toLong * 4).toInt.max(64))
    val buf = new Array[Byte](8192)
    while (!inf.finished()) {
      val n =
        try inf.inflate(buf)
        catch { case e: java.util.zip.DataFormatException =>
          fail(s"corrupt deflate stream in heap block (${e.getMessage})")
        }
      if (n == 0 && (inf.needsInput() || inf.needsDictionary()))
        fail("truncated deflate stream in heap block")
      if (out.size().toLong + n > cap)
        fail(s"heap block inflates past $cap bytes " +
          "(zip bomb or corrupt stored size)")
      out.write(buf, 0, n)
    }
    inf.end()
    out.toByteArray
  }

  /** All heap IDs from the group's name-index v2 B-tree (record type 5:
    * 4-byte name hash + heap ID). Iteration reads every record at every
    * level, so the hash is skipped — no lookup3 needed.
    */
  private def btreeV2HeapIds(file: ByteBuffer, addr: Long): Vector[Array[Byte]] = {
    val (_, recs) = btreeV2Records(file, addr, Set(5))
    recs.map(_.drop(4)) // strip the name hash; the rest is the heap ID
  }

  /** Every record of a v2 B-tree, in key order, as raw record bytes plus
    * the tree's record type (callers decode per type — 5: link-name
    * index; 1/2: huge-object index). Internal (BTIN) nodes carry full
    * records interleaved with child pointers.
    *
    * Child-pointer field widths are not stored; the format derives them
    * from the node capacities (spec III.A.2): the record count uses the
    * minimum bytes for the max records of a child node, and (depth ≥ 2)
    * the subtree total uses the minimum bytes for the max total below —
    * both computed from node size and record size exactly as the writer
    * did.
    */
  private def btreeV2Records(file: ByteBuffer, addr: Long,
      wantTypes: Set[Int]): (Int, Vector[Array[Byte]]) = {
    val b = reader(file, addr)
    b.expect("BTHD")
    if (b.u8() != 0) fail("BTHD version")
    val typ = b.u8()
    if (!wantTypes(typ))
      fail(s"v2 B-tree record type $typ (expected one of $wantTypes)")
    val nodeSize = b.u32()
    val recSize = b.u16()
    val depth = b.u16()
    b.skip(2) // split/merge percents
    val rootAddr = b.u64()
    val rootNRec = b.u16()
    b.u64() // total records

    def bytesFor(n: Long): Int = {
      var s = 1; var m = 0xFFL
      while (n > m) { s += 1; m = (m << 8) | 0xFF }
      s
    }
    // capacities per level: leaf and internal node headers are 6 bytes
    // (sig+version+type) plus a 4-byte checksum
    val maxNrec = new Array[Long](depth + 1)
    val maxTot = new Array[Long](depth + 1)
    maxNrec(0) = (nodeSize - 10) / recSize
    maxTot(0) = maxNrec(0)
    var d = 1
    while (d <= depth) {
      val ptrSize = 8 + bytesFor(maxNrec(d - 1)) +
        (if (d >= 2) bytesFor(maxTot(d - 1)) else 0)
      maxNrec(d) = (nodeSize - 10 - ptrSize) / (recSize + ptrSize)
      maxTot(d) = maxNrec(d) + (maxNrec(d) + 1) * maxTot(d - 1)
      d += 1
    }

    def uint(r: R, n: Int): Long = {
      var v = 0L; var i = 0
      while (i < n) { v |= (r.u8().toLong << (8 * i)); i += 1 }
      v
    }
    def record(r: R): Array[Byte] = Array.fill(recSize)(r.u8().toByte)
    def walk(at: Long, lvl: Int, nRec: Int): Vector[Array[Byte]] = {
      val r = reader(file, at)
      if (lvl == 0) {
        r.expect("BTLF")
        if (r.u8() != 0) fail("BTLF version")
        r.u8() // record type
        Vector.fill(nRec)(record(r))
      } else {
        r.expect("BTIN")
        if (r.u8() != 0) fail("BTIN version")
        r.u8() // record type
        def childPtr(): (Long, Int) = {
          val a = r.u64()
          val n = uint(r, bytesFor(maxNrec(lvl - 1))).toInt
          if (lvl >= 2) uint(r, bytesFor(maxTot(lvl - 1))) // subtree total
          (a, n)
        }
        // layout: ptr0, rec0, ptr1, rec1, …, rec_{n-1}, ptr_n
        var ptrs = Vector(childPtr())
        var recs = Vector.empty[Array[Byte]]
        var i = 0
        while (i < nRec) { recs :+= record(r); ptrs :+= childPtr(); i += 1 }
        val out = Vector.newBuilder[Array[Byte]]
        i = 0
        while (i < nRec) {
          out ++= walk(ptrs(i)._1, lvl - 1, ptrs(i)._2)
          out += recs(i)
          i += 1
        }
        out ++= walk(ptrs(nRec)._1, lvl - 1, ptrs(nRec)._2)
        out.result()
      }
    }
    (typ, walk(rootAddr, depth, rootNRec))
  }

  /** Dense link storage: every record's heap ID resolves to a Link
    * message inside the fractal heap; children sort by name for a
    * deterministic order (leaf records arrive in hash order).
    */
  private def readDenseLinks(file: ByteBuffer, fheapAddr: Long,
      btreeAddr: Long): Vector[(String, Long)] = {
    val heap = parseFractalHeap(file, fheapAddr)
    btreeV2HeapIds(file, btreeAddr)
      .map(id => readLink(heap.objectReader(file, id)))
      .sortBy(_._1)
  }

  /** Hard-link message (compact group storage): name + object address. */
  private def readLink(b: R): (String, Long) = {
    val version = b.u8()
    if (version != 1) fail(s"link message version $version")
    val flags = b.u8()
    val linkType = if ((flags & 0x08) != 0) b.u8() else 0
    if (linkType != 0) fail(s"non-hard link type $linkType")
    if ((flags & 0x04) != 0) b.skip(8) // creation order
    if ((flags & 0x10) != 0) b.skip(1) // charset
    val lenBytes = 1 << (flags & 0x3)
    val nameLen = (0 until lenBytes).map(i => (b.u8().toLong) << (8 * i)).sum
    val nameBytes = Array.fill(nameLen.toInt)(b.u8().toByte)
    (new String(nameBytes, java.nio.charset.StandardCharsets.UTF_8), b.u64())
  }

  private def localHeapDataAddr(file: ByteBuffer, heapAddr: Long): Long = {
    val b = reader(file, heapAddr)
    b.expect("HEAP")
    b.skip(4) // version + reserved
    b.u64() // data segment size
    b.u64() // free-list head
    b.u64() // data segment address
  }

  private def walkGroupTree(file: ByteBuffer, addr: Long, heapData: Long,
      out: scala.collection.mutable.Builder[(String, Long), Vector[(String, Long)]],
      path: Set[Long] = Set.empty): Unit = {
    if (addr == Undefined) return
    if (path(addr)) fail(s"group B-tree cycle at node $addr")
    val b = reader(file, addr)
    val sig = b.peek4()
    if (sig == "TREE") {
      b.skip(4)
      val nodeType = b.u8()
      require(nodeType == 0, s"B-tree node type $nodeType in group index")
      val level = b.u8()
      val nEntries = b.u16()
      b.skip(16) // siblings
      var e = 0
      while (e < nEntries) {
        b.u64() // key (heap offset of first name in subtree) — unused
        val child = b.u64()
        val save = b.pos
        if (level > 0) walkGroupTree(file, child, heapData, out, path + addr)
        else readSnod(file, child, heapData, out)
        b.pos = save
        e += 1
      }
    } else if (sig == "SNOD") {
      readSnod(file, addr, heapData, out)
    } else fail(s"expected TREE/SNOD at $addr, found '$sig'")
  }

  private def readSnod(file: ByteBuffer, addr: Long, heapData: Long,
      out: scala.collection.mutable.Builder[(String, Long), Vector[(String, Long)]]): Unit = {
    val b = reader(file, addr)
    b.expect("SNOD")
    b.skip(2) // version + reserved
    val n = b.u16()
    var i = 0
    while (i < n) {
      val nameOff = b.u64()
      val header = b.u64()
      b.skip(4 + 4 + 16) // cache type, reserved, scratch
      out += ((cstring(file, heapData + nameOff), header))
      i += 1
    }
  }

  private def readDataset(file: ByteBuffer, name: String, msgs: Vector[Msg]): Dataset = {
    var dims = Vector.empty[Long]
    var dtype: Dtype = null
    var layoutClass = -1
    var dataAddr = Undefined
    var dataSize = 0L
    var singleChunkMask = 0
    var chunkDims = Vector.empty[Int]
    var filters = Vector.empty[(Int, Vector[Int])]
    var chunkIndex = 0

    msgs.foreach { m =>
      m.typ match {
        case 0x0001 => // dataspace
          val b = m.body
          val v = b.u8()
          if (v != 1 && v != 2)
            fail(s"dataspace message version $v (only 1/2 supported)")
          val rank = b.u8()
          val flags = b.u8()
          if (v == 1) b.skip(5) else b.skip(1) // v2: type byte only
          dims = Vector.fill(rank)(b.u64()) // maxdims (flag bit 0) may follow; unused
        case 0x0003 => // datatype
          dtype = parseDatatype(m.body, name)
        case 0x0008 => // data layout
          val b = m.body
          val v = b.u8()
          if (v != 3 && v != 4)
            fail(s"layout message version $v (only 3/4 supported)")
          layoutClass = b.u8()
          layoutClass match {
            case 0 =>
              // compact: u16 size then the raw element bytes INLINE in
              // this message; record their absolute file position so
              // readBytes can slice them like any other extent
              dataSize = b.u16().toLong
              dataAddr = b.pos
            case 1 =>
              dataAddr = b.u64(); dataSize = b.u64()
            case 2 if v == 3 =>
              val dimensionality = b.u8()
              dataAddr = b.u64() // chunk B-tree root
              chunkDims = Vector.fill(dimensionality - 1)(b.u32().toInt)
              b.u32() // trailing entry: element size
            case 2 => // v4 (libver-latest): typed chunk index
              val flags = b.u8()
              val dimensionality = b.u8()
              val encLen = b.u8() // bytes per encoded chunk dimension
              chunkDims = Vector.fill(dimensionality) {
                var d = 0L
                var i = 0
                while (i < encLen) { d |= (b.u8().toLong << (8 * i)); i += 1 }
                d.toInt
              }
              b.u8() match {
                case 1 => // Single Chunk (chunk dims == dataset dims)
                  chunkIndex = 1
                  // flag bit 1: filtered — stored size + filter mask precede
                  if ((flags & 0x2) != 0) {
                    dataSize = b.u64()
                    singleChunkMask = b.u32().toInt
                  }
                  dataAddr = b.u64()
                case 2 => // Implicit (early allocation, no filters)
                  chunkIndex = 2
                  dataAddr = b.u64()
                case 3 => // Fixed Array
                  chunkIndex = 3
                  b.u8() // page-bits creation hint (FAHD carries its own)
                  dataAddr = b.u64()
                case t => fail(s"chunk index type $t not supported " +
                  "(extensible-array and v2-B-tree indexes need unlimited dims)")
              }
            case c => fail(s"layout class $c not supported (dataset $name)")
          }
        case 0x000B => // filter pipeline
          val b = m.body
          val v = b.u8()
          if (v != 1 && v != 2) fail(s"filter pipeline version $v")
          val n = b.u8()
          if (v == 1) b.skip(6)
          var i = 0
          while (i < n) {
            val id = b.u16()
            // v2 descriptions omit the name fields entirely for the
            // pre-registered filter ids (< 256), and carry no padding
            val nameLen = if (v == 1 || id >= 256) b.u16() else 0
            b.u16() // flags
            val nVals = b.u16()
            b.skip(nameLen)
            val cd = Vector.fill(nVals)(b.u32().toInt)
            if (v == 1 && nVals % 2 == 1) b.skip(4)
            filters :+= (id -> cd)
            if (id != 1 && id != 2 && id != 4)
              fail(s"filter $id not supported (deflate + shuffle + szip only)")
            i += 1
          }
        case _ => // fill value, attributes, mtime … not needed
      }
    }
    require(dtype != null && layoutClass >= 0, s"dataset $name missing messages")
    Dataset(name, dims, dtype, file, layoutClass, dataAddr, dataSize, chunkDims,
      filters, chunkIndex, singleChunkMask)
  }

  /** Parse a datatype message body (recursive: a vlen SEQUENCE's base
    * datatype follows as a nested full datatype message in the
    * properties region, per spec IV.A.2.h).
    */
  private def parseDatatype(b: R, name: String): Dtype = {
    val cv = b.u8()
    val clazz = cv & 0x0F
    val bits0 = b.u8(); b.skip(2)
    val size = b.u32().toInt
    // a u32 size of 0, or one past 2 GiB arriving negative through the
    // toInt, poisons every downstream length computation (negative
    // allocation in readBytes, division by zero in readStrings) — no
    // datatype in the supported subset is zero- or giga-byte-sized
    if (size <= 0) fail(s"datatype size $size (dataset $name)")
    // bit 0 is byte order for numeric classes only (strings use it
    // for the padding type, vlens for their flavor)
    if (clazz <= 1 && (bits0 & 0x01) != 0)
      fail("big-endian data not supported")
    clazz match {
      case 0 => Dtype(0, size, signed = (bits0 & 0x08) != 0)
      case 1 => Dtype(1, size, signed = true)
      case 3 => Dtype(3, size, signed = false) // fixed-length string
      case 9 =>
        // variable-length: low nibble of the flags distinguishes vlen
        // STRING (1) from vlen SEQUENCE (0); both are 16-byte global-
        // heap descriptors per element. A sequence carries its base
        // datatype nested right here.
        (bits0 & 0x0F) match {
          case 1 => Dtype(9, size, signed = false)
          case 0 =>
            val base = parseDatatype(b, name)
            if (base.clazz > 1)
              fail(s"vlen sequence of non-numeric base (dataset $name)")
            Dtype(9, size, signed = false, base = Some(base))
          case f => fail(s"vlen flavor $f not supported (dataset $name)")
        }
      case c => fail(s"datatype class $c not supported (dataset $name)")
    }
  }

  /** Fetch one object from a global heap collection ("GCOL" block, HDF5
    * spec IV.E): walk the object headers (index, refcount, size, 8-byte-
    * aligned data) until the requested index. Index 0 marks the free
    * space at the collection's tail — reaching it means the object is
    * absent.
    */
  private def gheapObject(file: ByteBuffer, addr: Long, idx: Int, len: Int): Array[Byte] = {
    val b = reader(file, addr)
    b.expect("GCOL")
    val ver = b.u8()
    require(ver == 1, s"global heap version $ver")
    b.skip(3)
    val collSize = b.u64() // includes the 16-byte header
    // collSize is itself a raw u64: unvalidated, it would both overflow
    // `addr + collSize` and launder any objSize through the per-object
    // bound below (a 2^32 objSize whose aligned skip narrows to 0 would
    // then cycle the cursor forever)
    if (collSize < 16 || collSize > file.limit() - addr)
      fail(s"global heap collection size $collSize at $addr outside the container")
    val end = addr + collSize
    while (b.pos + 16 <= end) {
      val objIdx = b.u16()
      b.u16() // reference count
      b.skip(4)
      val objSize = b.u64()
      if (objIdx == 0) fail(s"global heap object $idx not found at $addr")
      // a hostile objSize (huge u64) would wrap the aligned skip negative
      // and cycle this cursor forever — everything must stay inside the
      // (now-validated) collection the header declared
      if (objSize < 0 || objSize > end - b.pos)
        fail(s"global heap object $objIdx size $objSize exceeds collection")
      if (objIdx == idx) {
        require(objSize >= len, s"heap object $idx shorter than descriptor length")
        if (b.pos < 0 || b.pos > file.limit() - len)
          fail(s"global heap object $idx extent outside the container")
        val out = new Array[Byte](len)
        val dup = file.duplicate()
        dup.position(b.pos.toInt)
        dup.get(out)
        return out
      }
      b.skip(((objSize + 7) / 8 * 8).toInt)
    }
    fail(s"global heap object $idx not found at $addr")
  }

  private def cstring(file: ByteBuffer, addr: Long): String = {
    if (addr < 0 || addr >= file.limit())
      fail(s"heap string offset $addr outside the container")
    val sb = new StringBuilder
    var p = addr.toInt
    while (file.get(p) != 0) {
      sb.append(file.get(p).toChar)
      p += 1
      if (p >= file.limit()) fail("unterminated heap string (truncated file)")
    }
    sb.toString
  }

  // -- little cursor over the file buffer ----------------------------------
  private def reader(file: ByteBuffer, at: Long): R = new R(file, at)

  /** Every read is bounds-checked against the buffer as a LONG range
    * before the `toInt` narrowing: HDF5 addresses are 64-bit, so a
    * corrupt/hostile address like 0x1_0000_0010 would otherwise truncate
    * to an IN-RANGE position and silently misread real bytes — the exact
    * failure the "fail fast, never misread" contract forbids. (A buffer
    * limit is at most Int.MaxValue, so any pos that survives the check
    * narrows losslessly.)
    */
  private final class R(file: ByteBuffer, at: Long) {
    var pos: Long = at
    private def check(n: Int): Unit =
      // subtraction, not `pos + n > limit`: a hostile pos near Long.MaxValue
      // would overflow the sum negative and slip past the addition form
      if (pos < 0 || pos > file.limit() - n)
        fail(s"read of $n bytes at offset $pos outside the container " +
          s"(${file.limit()} bytes) — truncated or corrupt file")
    def u8(): Int = { check(1); val v = file.get(pos.toInt) & 0xFF; pos += 1; v }
    def u16(): Int = { check(2); val v = file.getShort(pos.toInt) & 0xFFFF; pos += 2; v }
    def u32(): Long = { check(4); val v = file.getInt(pos.toInt) & 0xFFFFFFFFL; pos += 4; v }
    def u64(): Long = { check(8); val v = file.getLong(pos.toInt); pos += 8; v }
    def skip(n: Int): Unit = pos += n
    def peek4(): String = {
      check(4)
      (0 until 4).map(i => (file.get((pos + i).toInt) & 0xFF).toChar).mkString
    }
    def expect(sig: String): Unit = {
      check(sig.length)
      val got = (0 until sig.length)
        .map(i => (file.get((pos + i).toInt) & 0xFF).toChar).mkString
      if (got != sig) fail(s"bad signature at $pos: expected ${sig.trim}, got $got")
      pos += sig.length
    }
  }
}
