package graft.multimodal

import java.awt.image.BufferedImage
import java.io.ByteArrayInputStream
import javax.imageio.ImageIO

import org.apache.spark.sql.{Dataset, Encoder, Encoders}

/** Multimodal binary-column processing (builder north-star; SURVEY §2 A4/H
  * generalized): image/audio/video as opaque `BINARY` content plus a typed
  * metadata struct, with decode / resize / frame-sample / feature-extract
  * as `mapPartitions` stages — the Scala analog of `mapInPandas`: the
  * executor walks each partition in fixed-size batches, never materializing
  * more than one batch of decoded media at a time, and the partitioning is
  * preserved (no shuffle anywhere in this module).
  *
  * Decode is REAL: images via `javax.imageio` (PNG/JPEG/BMP/GIF — the same
  * JDK codec the sink side uses, [[graft.sinks.Artifacts]]), video via a
  * RIFF/AVI container parse + per-frame JPEG decode. The reference's
  * pipeline likewise decodes pixel data before analysis
  * (/root/reference/picoprobe/tools/temporal.py:21-35).
  */
final case class MediaMeta(
    width: Int, height: Int, channels: Int,
    sampleRate: Int, nFrames: Int, format: String)

final case class Media(media_id: Long, kind: String, content: Array[Byte], meta: MediaMeta)

final case class DecodedImage(
    media_id: Long, width: Int, height: Int, channels: Int, pixels: Array[Byte])

final case class VideoFrame(media_id: Long, frame_idx: Int, frame: Array[Byte])

final case class MediaFeatures(media_id: Long, features: Array[Float])

final case class DecodedAudio(media_id: Long, sample_rate: Int, samples: Array[Short])

/** Per-frame audio features — integer-exact (energy = Σx², crossings =
  * sign flips between in-frame neighbors), so they oracle-verify with no
  * float tolerance.
  */
final case class AudioFrame(media_id: Long, frame_idx: Int, n: Int,
    energy: Long, crossings: Long)

/** Real pure-JVM media codec.
  *
  * Images decode through `javax.imageio` to row-major uint8 `(y, x, band)`
  * with the channel count taken from the image's own color model (gray→1,
  * RGB→3, RGBA→4). Video decodes from the MJPEG-in-AVI container
  * [[graft.sinks.Artifacts.mjpegAvi]] writes: the RIFF walk collects the
  * `00dc` chunk offsets ONCE per file, so frame access is random — a
  * sampler decodes only the frames it keeps, never the whole stream.
  */
object Codec {

  // in-memory sources only — never spill ImageIO's read cache to disk
  ImageIO.setUseCache(false)

  /** Decoded-pixel budget per image. A hostile header claiming
    * 50000×50000 would otherwise drive a multi-GiB allocation inside the
    * JDK reader before any content validation — an executor OOM, not a
    * parse error. 2^26 pixels (≈268 MB at 4 channels) comfortably covers
    * real camera/microscopy frames while bounding one task's decode
    * memory; the check runs on the HEADER alone, before any pixel work.
    */
  val MaxImagePixels: Long = 1L << 26

  /** Decode one encoded image to (width, height, channels, row-major u8).
    *
    * Refuse-by-name contract (same as the RIFF/ISO-BMFF parsers): hostile
    * or corrupt content throws IllegalArgumentException, never a raw
    * reader exception — `ImageIO.read` alone surfaces IIOException on a
    * stream truncated after a valid signature, which a mapPartitions
    * stage would report as an opaque task IOException.
    */
  def decodeImage(content: Array[Byte]): (Int, Int, Int, Array[Byte]) = {
    val in = ImageIO.createImageInputStream(new ByteArrayInputStream(content))
    // createImageInputStream returns null when no ImageInputStream SPI is
    // registered — without this check getImageReaders throws and the
    // finally's in.close() NPEs over it, masking the cause and breaking
    // the refuse-by-name contract
    require(in != null, "content is not a decodable image (no image input SPI)")
    try {
      val readers = ImageIO.getImageReaders(in)
      require(readers.hasNext, "content is not a decodable image")
      val reader = readers.next()
      try {
        reader.setInput(in, true, true)
        // header-only geometry read: rejects the allocation bomb before
        // the reader touches pixel data
        val (w, h) =
          try (reader.getWidth(0), reader.getHeight(0))
          catch {
            case e: java.io.IOException => throw new IllegalArgumentException(
              s"corrupt image header: ${e.getMessage}")
          }
        require(w >= 1 && h >= 1 && w.toLong * h <= MaxImagePixels,
          s"image ${w}x$h exceeds the $MaxImagePixels-pixel budget")
        val img =
          try reader.read(0)
          catch {
            // JDK readers throw IIOException/EOFException on truncation
            // and unchecked errors (e.g. CMMException, NegativeArraySize
            // on crafted palettes) on structurally hostile content
            case e @ (_: java.io.IOException | _: RuntimeException) =>
              throw new IllegalArgumentException(
                s"corrupt image content: ${e.getMessage}")
          }
        toRowMajor(img)
      } finally reader.dispose()
    } finally in.close()
  }

  private def toRowMajor(img: BufferedImage): (Int, Int, Int, Array[Byte]) = {
    val w = img.getWidth
    val h = img.getHeight
    val c = img.getColorModel.getNumComponents
    val raster = img.getRaster
    val out = new Array[Byte](w * h * c)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        var b = 0
        while (b < c) {
          out((y * w + x) * c + b) = raster.getSample(x, y, b).toByte
          b += 1
        }
        x += 1
      }
      y += 1
    }
    (w, h, c, out)
  }

  /** A parsed video: indexed frame extents + lazy per-frame decode —
    * frame access is random, a sampler never decodes the whole stream.
    */
  sealed abstract class Video(content: Array[Byte], frames: Array[(Int, Int)]) {
    def frameCount: Int = frames.length
    /** Decode frame `i` to (width, height, channels, row-major u8). */
    def decodeFrame(i: Int): (Int, Int, Int, Array[Byte]) = {
      val (off, len) = frames(i)
      decodeImage(java.util.Arrays.copyOfRange(content, off, off + len))
    }
  }
  final class AviVideo(content: Array[Byte], frames: Array[(Int, Int)])
    extends Video(content, frames)

  /** H.264 decode config from the avc1 sample entry's avcC box. */
  final case class AvcConfig(sps: graft.multimodal.h264.H264Decoder.Sps,
      pps: graft.multimodal.h264.H264Decoder.Pps, lengthSize: Int)

  /** MP4 track: MJPEG samples decode as independent JPEGs; 'avc1'
    * samples through the pure-JVM H.264 decoder
    * ([[graft.multimodal.h264.H264Decoder]]) — output is 3-channel
    * interleaved YCbCr with nearest-upsampled 4:2:0 chroma (the codec's
    * native color space; matrixing to RGB is a display choice left to
    * the caller).
    *
    * H.264 is an INTER codec: frame access decodes forward from the
    * stream start through a stateful session, so sequential access is
    * O(1) amortized and a far-backward seek restarts the session —
    * exactly the keyframe-decode cost model [[Multimodal.sampleFrames]]
    * documents. Frame index `i` is the DISPLAY index: when the track
    * carries ctts composition offsets (B-frame reordering), samples
    * decode in coded order and a small reorder window of decoded frames
    * (bounded by the stream's reorder depth) serves display order.
    */
  final class Mp4Video(content: Array[Byte], frames: Array[(Int, Int)],
      avc: Option[AvcConfig], ctsOffsets: Array[Int] = Array.emptyIntArray,
      syncSamples: Array[Int] = Array.emptyIntArray)
    extends Video(content, frames) {
    private var session: graft.multimodal.h264.H264Decoder.Session = null
    private var nextIdx = 0
    // decode-order sample index per display index: rank of cts = dts + offset
    private val displayToSample: Array[Int] =
      if (ctsOffsets.isEmpty) Array.tabulate(frames.length)(identity)
      else {
        require(ctsOffsets.length == frames.length, "ctts arity")
        frames.indices.sortBy(n => (n + ctsOffsets(n), n)).toArray
      }
    // reorder window: scanning display order, the max count of samples
    // decoded at-or-after a sample before its display turn arrives
    private val reorderWindow: Int = {
      var maxSeen = -1
      var w = 1
      displayToSample.foreach { s =>
        maxSeen = math.max(maxSeen, s)
        w = math.max(w, maxSeen - s + 1)
      }
      w
    }
    private val cache =
      scala.collection.mutable.LinkedHashMap.empty[Int, graft.multimodal.h264.H264Decoder.Frame]

    /** Largest sync sample ≤ target (0 when no stss: only sample 0 is
      * known independently decodable for an inter codec).
      */
    private def nearestSync(target: Int): Int = {
      if (syncSamples.isEmpty) return 0
      var lo = 0
      var hi = syncSamples.length - 1
      var best = 0
      while (lo <= hi) {
        val mid = (lo + hi) >>> 1
        if (syncSamples(mid) <= target) { best = syncSamples(mid); lo = mid + 1 }
        else hi = mid - 1
      }
      best
    }

    override def decodeFrame(i: Int): (Int, Int, Int, Array[Byte]) = avc match {
      case None => super.decodeFrame(i)
      case Some(cfg) =>
        val sampleIdx = displayToSample(i)
        if (session == null || (sampleIdx < nextIdx && !cache.contains(sampleIdx))) {
          // seek: restart at the nearest preceding keyframe, not the head
          session = new graft.multimodal.h264.H264Decoder.Session(cfg.sps, cfg.pps)
          nextIdx = nearestSync(sampleIdx)
          cache.clear()
        } else if (sampleIdx >= nextIdx) {
          // far forward: jump over whole GOPs when a later sync precedes
          // the target (keyframe-aware fast-forward)
          val sync = nearestSync(sampleIdx)
          if (sync > nextIdx) {
            session = new graft.multimodal.h264.H264Decoder.Session(cfg.sps, cfg.pps)
            nextIdx = sync
            cache.clear()
          }
        }
        while (nextIdx <= sampleIdx) {
          val (off, len) = frames(nextIdx)
          val f = session.decodeSample(
            java.util.Arrays.copyOfRange(content, off, off + len), cfg.lengthSize)
          cache(nextIdx) = f
          while (cache.size > math.max(reorderWindow, 2)) cache.remove(cache.head._1)
          nextIdx += 1
        }
        val f = cache(sampleIdx)
        val out = new Array[Byte](f.width * f.height * 3)
        val cw = f.chromaWidth
        var y = 0
        while (y < f.height) {
          var x = 0
          while (x < f.width) {
            val ci = (y / 2) * cw + (x / 2)
            val o = (y * f.width + x) * 3
            out(o) = f.y(y * f.width + x).toByte
            out(o + 1) = f.cb(ci).toByte
            out(o + 2) = f.cr(ci).toByte
            x += 1
          }
          y += 1
        }
        (f.width, f.height, 3, out)
    }
  }

  /** Container dispatch on the file magic: RIFF/AVI or ISO-BMFF (ftyp). */
  def parseVideo(content: Array[Byte]): Video = {
    require(content.length >= 12, "content too short for a video container")
    val head = new String(content, 0, 4, "US-ASCII")
    val brand = new String(content, 4, 4, "US-ASCII")
    if (head == "RIFF") parseAvi(content)
    else if (brand == "ftyp") parseMp4(content)
    else throw new IllegalArgumentException(
      s"unrecognized video container (magic $head/$brand)")
  }

  /** Walk the RIFF structure and index the `00dc` video chunks (one pass,
    * no frame decoded). Accepts the flat `movi` layout our muxer writes.
    */
  def parseAvi(content: Array[Byte]): AviVideo = {
    def le32(p: Int): Int =
      (content(p) & 0xFF) | ((content(p + 1) & 0xFF) << 8) |
        ((content(p + 2) & 0xFF) << 16) | ((content(p + 3) & 0xFF) << 24)
    def fourcc(p: Int): String =
      new String(content, p, 4, "US-ASCII")
    require(content.length >= 12 && fourcc(0) == "RIFF" && fourcc(8) == "AVI ",
      "content is not a RIFF/AVI container")

    val frames = Array.newBuilder[(Int, Int)]
    var pos = 12
    while (pos + 8 <= content.length) {
      val id = fourcc(pos)
      val size = le32(pos + 4)
      // a hostile size with the top bit set walks the cursor BACKWARDS
      // (pos += 8 + size) — an infinite loop, not a parse error; the
      // Long-form extent bound also stops `pos + 8 + size` overflowing
      // Int into a negative index on GiB-scale files
      require(size >= 0 && pos + 8 + size.toLong <= content.length,
        s"RIFF chunk '$id' size $size at $pos outside the file")
      if (id == "LIST" && pos + 12 <= content.length && fourcc(pos + 8) == "movi") {
        var p = pos + 12
        val end = math.min(pos + 8 + size, content.length)
        while (p + 8 <= end) {
          val cid = fourcc(p)
          val csize = le32(p + 4)
          // extents must be proven in-file here: copyOfRange at decode
          // time silently ZERO-PADS past the end — fabricated frame bytes
          require(csize >= 0 && p + 8 + csize.toLong <= content.length,
            s"AVI chunk '$cid' extent [$p, +$csize) outside the file")
          if (cid == "00dc") frames += ((p + 8, csize))
          p += 8 + csize + (csize & 1)
        }
      }
      pos += 8 + size + (size & 1)
    }
    new AviVideo(content, frames.result())
  }

  /** Walk the ISO-BMFF box tree (ISO/IEC 14496-12 — BIG-endian, unlike
    * RIFF) down moov/trak/mdia/minf/stbl and index the samples from the
    * FULL sample-table machinery: per-sample sizes from stsz, the
    * §8.7.4 sample-to-chunk map (stsc run-length rows — real muxers
    * interleave samples across many chunks), 32-bit stco or 64-bit co64
    * chunk offsets, optional ctts composition offsets, and the optional
    * stss sync-sample table (seeks restart at the nearest preceding
    * keyframe instead of the stream head). The stsd entry must be
    * 'jpeg' (independent JPEG samples) or 'avc1' (H.264).
    */
  def parseMp4(content: Array[Byte]): Mp4Video =
    try parseMp4Boxes(content)
    catch {
      // a corrupt size field can point any fixed-offset read past the
      // buffer; the contract is refuse-by-name, never an index error.
      // IndexOutOfBounds (not just the Array subtype): `fourcc` reads
      // through `new String(bytes, off, 4)`, which throws the STRING
      // subtype when a truncated stsd puts off+4 past EOF
      case e: IndexOutOfBoundsException => throw new IllegalArgumentException(
        s"corrupt ISO-BMFF structure (read outside the file: ${e.getMessage})")
    }

  private def parseMp4Boxes(content: Array[Byte]): Mp4Video = {
    def be32(p: Int): Int =
      ((content(p) & 0xFF) << 24) | ((content(p + 1) & 0xFF) << 16) |
        ((content(p + 2) & 0xFF) << 8) | (content(p + 3) & 0xFF)
    def fourcc(p: Int): String = new String(content, p, 4, "US-ASCII")

    /** Find child box `typ` inside [from, to); returns (bodyStart, bodyEnd).
      * Ranges clamp to the file — corrupt sizes must not walk past it.
      */
    def childOpt(from: Int, to: Int, typ: String): Option[(Int, Int)] = {
      var p = from
      val hi = math.min(to, content.length)
      while (p + 8 <= hi) {
        val size = be32(p)
        require(size >= 8, s"bad box size $size at $p")
        if (fourcc(p + 4) == typ)
          return Some((p + 8, math.min(p + size, content.length)))
        p += size
      }
      None
    }
    def child(from: Int, to: Int, typ: String): (Int, Int) =
      childOpt(from, to, typ).getOrElse(
        throw new IllegalArgumentException(s"box $typ not found in [$from,$to)"))

    require(content.length >= 12 && fourcc(4) == "ftyp",
      "content is not an ISO-BMFF container")
    val (moovS, moovE) = child(0, content.length, "moov")
    // real files interleave several traks (audio, video, timed metadata)
    // in any order: walk them all and take the first whose sample entry
    // this codec layer supports
    val traks = {
      val b = Seq.newBuilder[(Int, Int)]
      var p = moovS
      val hi = math.min(moovE, content.length)
      while (p + 8 <= hi) {
        val size = be32(p)
        require(size >= 8, s"bad box size $size at $p")
        if (fourcc(p + 4) == "trak")
          b += ((p + 8, math.min(p + size, content.length)))
        p += size
      }
      b.result()
    }
    require(traks.nonEmpty, "moov carries no trak")
    val stbls = traks.map { case (trakS, trakE) =>
      val (mdiaS, mdiaE) = child(trakS, trakE, "mdia")
      val (minfS, minfE) = child(mdiaS, mdiaE, "minf")
      child(minfS, minfE, "stbl")
    }
    def entryOf(stbl: (Int, Int)): String = {
      val (stsdS, _) = child(stbl._1, stbl._2, "stsd")
      require(be32(stsdS + 4) >= 1, "empty stsd")
      fourcc(stsdS + 12)
    }
    val (stblS, stblE) = stbls.find(b => {
      val f = entryOf(b); f == "jpeg" || f == "avc1"
    }).getOrElse(throw new IllegalArgumentException(
      s"no supported video track (sample entries: " +
        s"${stbls.map(entryOf).mkString(", ")} — motion-JPEG and H.264/avc1 only)"))

    val (stsdS, _) = child(stblS, stblE, "stsd")
    val entryFmt = fourcc(stsdS + 12)
    val avc: Option[AvcConfig] =
      if (entryFmt != "avc1") None
      else {
        // avcC lives in the entry's extension area after the 86-byte
        // VisualSampleEntry base (ISO/IEC 14496-15)
        val entrySize = be32(stsdS + 8)
        val (avcCS, avcCE) = child(stsdS + 8 + 86, stsdS + 8 + entrySize, "avcC")
        require(content(avcCS) == 1, "avcC configurationVersion != 1")
        val lengthSize = (content(avcCS + 4) & 3) + 1
        val numSps = content(avcCS + 5) & 0x1F
        require(numSps >= 1, "avcC carries no SPS")
        val spsLen = ((content(avcCS + 6) & 0xFF) << 8) | (content(avcCS + 7) & 0xFF)
        val spsNal = avcCS + 8
        require(spsNal + spsLen <= avcCE, "avcC SPS overruns the box")
        val sps = graft.multimodal.h264.H264Decoder.parseSps(
          graft.multimodal.h264.Nal.unescape(content, spsNal + 1, spsNal + spsLen))
        val ppsCount = spsNal + spsLen
        require((content(ppsCount) & 0xFF) >= 1, "avcC carries no PPS")
        val ppsLen = ((content(ppsCount + 1) & 0xFF) << 8) | (content(ppsCount + 2) & 0xFF)
        val ppsNal = ppsCount + 3
        require(ppsNal + ppsLen <= avcCE, "avcC PPS overruns the box")
        val pps = graft.multimodal.h264.H264Decoder.parsePps(
          graft.multimodal.h264.Nal.unescape(content, ppsNal + 1, ppsNal + ppsLen))
        Some(AvcConfig(sps, pps, lengthSize))
      }

    val (stszS, _) = child(stblS, stblE, "stsz")
    val uniform = be32(stszS + 4)
    val n = be32(stszS + 8)
    // a corrupt count would otherwise drive a giant allocation
    require(n >= 0 && n <= content.length, s"stsz sample count $n")
    require(uniform != 0 || stszS + 12 + 4L * n <= content.length,
      "stsz table overruns the file")
    val sizes = Array.tabulate(n)(i =>
      if (uniform != 0) uniform else be32(stszS + 12 + 4 * i))

    // chunk offsets: stco (32-bit) or co64 (64-bit)
    def be64(p: Int): Long = (be32(p).toLong << 32) | (be32(p + 4) & 0xFFFFFFFFL)
    val chunkOffsets: Array[Long] = childOpt(stblS, stblE, "stco") match {
      case Some((stcoS, _)) =>
        val cn = be32(stcoS + 4)
        require(cn >= 1 && stcoS + 8 + 4L * cn <= content.length,
          s"stco table ($cn chunks) overruns the file")
        Array.tabulate(cn)(i => be32(stcoS + 8 + 4 * i).toLong & 0xFFFFFFFFL)
      case None =>
        val (co64S, _) = child(stblS, stblE, "co64")
        val cn = be32(co64S + 4)
        require(cn >= 1 && co64S + 8 + 8L * cn <= content.length,
          s"co64 table ($cn chunks) overruns the file")
        Array.tabulate(cn)(i => be64(co64S + 8 + 8 * i))
    }

    // §8.7.4 sample-to-chunk: run-length rows (first_chunk,
    // samples_per_chunk, _desc_idx); each run covers chunks up to the
    // next row's first_chunk (or the stco count)
    val (stscS, _) = child(stblS, stblE, "stsc")
    val stscRows = be32(stscS + 4)
    require(stscRows >= 1 && stscS + 8 + 12L * stscRows <= content.length,
      s"stsc table ($stscRows rows) overruns the file")
    val frames = Array.newBuilder[(Int, Int)]
    var sample = 0
    var row = 0
    while (row < stscRows && sample < n) {
      val firstChunk = be32(stscS + 8 + 12 * row) // 1-based
      val perChunk = be32(stscS + 8 + 12 * row + 4)
      require(firstChunk >= 1 && firstChunk <= chunkOffsets.length,
        s"stsc first_chunk $firstChunk outside the $stscRows-chunk table")
      require(perChunk >= 1 && perChunk <= n, s"stsc samples_per_chunk $perChunk")
      val lastChunk =
        if (row + 1 < stscRows) be32(stscS + 8 + 12 * (row + 1)) - 1
        else chunkOffsets.length
      require(lastChunk >= firstChunk, "stsc first_chunk rows not ascending")
      var c = firstChunk
      while (c <= lastChunk && sample < n) {
        var off = chunkOffsets(c - 1)
        var k = 0
        while (k < perChunk && sample < n) {
          val len = sizes(sample)
          require(len > 0 && off >= 0 && off + len <= content.length,
            s"sample extent [$off, $off+$len) outside the file")
          frames += ((off.toInt, len))
          off += len
          sample += 1
          k += 1
        }
        c += 1
      }
      row += 1
    }
    require(sample == n, s"sample-to-chunk map covers $sample of $n samples")

    // optional ctts: composition offsets (v0, run-length) — B-frame
    // streams carry these so display order can be recovered
    val ctsOffsets: Array[Int] = childOpt(stblS, stblE, "ctts") match {
      case None => Array.emptyIntArray
      case Some((cttsS, _)) =>
        require((content(cttsS) & 0xFF) == 0, "ctts version 1 not supported")
        val entries = be32(cttsS + 4)
        require(entries >= 0 && cttsS + 8 + 8L * entries <= content.length,
          s"ctts table overruns the file ($entries entries)")
        val out = Array.newBuilder[Int]
        var e = 0
        var total = 0
        while (e < entries) {
          val count = be32(cttsS + 8 + 8 * e)
          val offset = be32(cttsS + 8 + 8 * e + 4)
          require(offset >= 0, "negative ctts offset in a v0 box")
          // bound the CUMULATIVE run total, not each run alone: many
          // small runs would otherwise drive a multi-GiB builder
          // allocation before the arity check below could refuse
          require(count >= 0 && count <= n - total,
            s"ctts runs cover more than the $n samples")
          var k = 0
          while (k < count) { out += offset; k += 1 }
          total += count
          e += 1
        }
        val res = out.result()
        require(res.length == n, s"ctts covers ${res.length} of $n samples")
        res
    }

    // optional stss: 1-based sync-sample (keyframe) indices — absent
    // means every sample is a sync point
    val syncSamples: Array[Int] = childOpt(stblS, stblE, "stss") match {
      case None => Array.emptyIntArray
      case Some((stssS, _)) =>
        val cnt = be32(stssS + 4)
        require(cnt >= 1 && stssS + 8 + 4L * cnt <= content.length,
          s"stss table ($cnt entries) overruns the file")
        val out = Array.tabulate(cnt) { i =>
          val v = be32(stssS + 8 + 4 * i)
          require(v >= 1 && v <= n, s"stss sample index $v")
          v - 1 // 0-based
        }
        require(out.isEmpty || out.head == 0,
          "first sample is not a sync sample — cannot decode from the head")
        out
    }
    new Mp4Video(content, frames.result(), avc, ctsOffsets, syncSamples)
  }

  /** Decode a mono 16-bit PCM WAV: walk the RIFF chunks (fmt may be
    * preceded/followed by LIST/fact/cue chunks — real encoders emit them),
    * validate the PCM format, and read the `data` payload as LE shorts.
    * Returns (sampleRate, samples). Fails fast on compressed / multi-
    * channel / non-16-bit audio rather than misreading it.
    */
  def decodeWav(content: Array[Byte]): (Int, Array[Short]) = {
    def le32(p: Int): Int =
      (content(p) & 0xFF) | ((content(p + 1) & 0xFF) << 8) |
        ((content(p + 2) & 0xFF) << 16) | ((content(p + 3) & 0xFF) << 24)
    def le16(p: Int): Int = (content(p) & 0xFF) | ((content(p + 1) & 0xFF) << 8)
    def fourcc(p: Int): String = new String(content, p, 4, "US-ASCII")
    require(content.length >= 12 && fourcc(0) == "RIFF" && fourcc(8) == "WAVE",
      "content is not a RIFF/WAVE container")
    var sampleRate = -1
    var samples: Array[Short] = null
    var pos = 12
    while (pos + 8 <= content.length) {
      val id = fourcc(pos)
      val size = le32(pos + 4)
      // same negative-size infinite-loop / overrun guard as parseAvi
      require(size >= 0 && pos + 8 + size.toLong <= content.length,
        s"RIFF chunk '$id' size $size at $pos outside the file")
      if (id == "fmt ") {
        require(size >= 16, s"fmt chunk of $size bytes too short for PCM")
        require(le16(pos + 8) == 1, "not PCM audio")
        require(le16(pos + 10) == 1, "not mono audio")
        require(le16(pos + 22) == 16, "not 16-bit audio")
        sampleRate = le32(pos + 12)
      } else if (id == "data") {
        require(sampleRate > 0, "data chunk before fmt")
        val n = size / 2
        val out = new Array[Short](n)
        var i = 0
        while (i < n) { out(i) = le16(pos + 8 + 2 * i).toShort; i += 1 }
        samples = out
      }
      pos += 8 + size + (size & 1)
    }
    require(samples != null, "no data chunk")
    (sampleRate, samples)
  }
}

object Multimodal {

  implicit private val mediaEnc: Encoder[Media] = Encoders.product[Media]
  implicit private val imgEnc: Encoder[DecodedImage] = Encoders.product[DecodedImage]
  implicit private val frameEnc: Encoder[VideoFrame] = Encoders.product[VideoFrame]
  implicit private val featEnc: Encoder[MediaFeatures] = Encoders.product[MediaFeatures]

  /** Batch size of the per-partition loop — the `mapInPandas` batch-shape
    * analog; bounds decoded-media memory per task.
    */
  val BatchSize = 64

  /** Decode images: one row per image, pixels row-major (y, x, channel).
    * Geometry comes from the decoded bytes themselves, not the metadata —
    * the typed meta is for predicate pruning, the content is the truth.
    */
  def decodeImages(media: Dataset[Media]): Dataset[DecodedImage] =
    media.mapPartitions { it =>
      it.grouped(BatchSize).flatMap { batch =>
        batch.map { m =>
          val (w, h, c, px) = Codec.decodeImage(m.content)
          DecodedImage(m.media_id, w, h, c, px)
        }
      }
    }

  /** Nearest-neighbor resize of decoded images — real array math on the
    * row-major pixel layout; partition-local, codegen-free but allocation-
    * bounded by BatchSize upstream.
    */
  def resize(images: Dataset[DecodedImage], outW: Int, outH: Int): Dataset[DecodedImage] = {
    // the 4-channel worst case must fit one Int-indexed array, or the
    // per-row allocation fails namelessly inside a task
    require(outW > 0 && outH > 0 && outW.toLong * outH <= Int.MaxValue / 4,
      s"resize target ${outW}x$outH")
    images.map { img =>
      val out = new Array[Byte](outW * outH * img.channels)
      var y = 0
      while (y < outH) {
        val sy = y * img.height / outH
        var x = 0
        while (x < outW) {
          val sx = x * img.width / outW
          var c = 0
          while (c < img.channels) {
            out((y * outW + x) * img.channels + c) =
              img.pixels((sy * img.width + sx) * img.channels + c)
            c += 1
          }
          x += 1
        }
        y += 1
      }
      DecodedImage(img.media_id, outW, outH, img.channels, out)
    }
  }

  /** Sample every `everyN`-th frame of each video (1 file → ⌈T/n⌉ rows,
    * the flatMap/UDTF shape of SURVEY §2 H). The container is parsed ONCE
    * per video and only the sampled frames are decoded — MJPEG frames are
    * independent, so random access skips the dropped frames entirely
    * (an inter-frame codec would decode forward from the last keyframe).
    */
  def sampleFrames(media: Dataset[Media], everyN: Int): Dataset[VideoFrame] = {
    // fail on the driver, by name: a 0 stride would throw a bare Range
    // error inside a task, a negative one would silently emit nothing
    require(everyN >= 1, s"frame sampling stride $everyN (must be >= 1)")
    media.mapPartitions { it =>
      it.grouped(BatchSize).flatMap { batch =>
        batch.iterator.flatMap { m =>
          // container-agnostic: MJPEG-AVI or ISO-BMFF MP4 by file magic
          val video = Codec.parseVideo(m.content)
          Range(0, video.frameCount, everyN).iterator.map { f =>
            val (_, _, _, px) = video.decodeFrame(f)
            VideoFrame(m.media_id, f, px)
          }
        }
      }
    }
  }

  /** Feature extraction: fixed-dim Float vector per item via a rolling
    * hash over the content — the batched-inference stage shape (ONNX/YOLO
    * analog, SURVEY §2 H ML-inference mapping). Deterministic; dim and
    * batching are the real contract.
    */
  implicit private val audioEnc: Encoder[DecodedAudio] = Encoders.product[DecodedAudio]
  implicit private val aFrameEnc: Encoder[AudioFrame] = Encoders.product[AudioFrame]

  /** Decode WAV audio columns — same batched per-partition loop as
    * [[decodeImages]]; geometry (rate, length) comes from the decoded
    * bytes, never the metadata.
    */
  def decodeAudio(media: Dataset[Media]): Dataset[DecodedAudio] =
    media.mapPartitions { it =>
      it.grouped(BatchSize).flatMap { batch =>
        batch.map { m =>
          val (rate, samples) = Codec.decodeWav(m.content)
          DecodedAudio(m.media_id, rate, samples)
        }
      }
    }

  /** Fixed-length framing with integer features: per frame the energy
    * Σx² and the zero-crossing count (sign products of in-frame neighbor
    * pairs) — the audio analog of per-frame image normalization, and the
    * front half of any VAD/segmentation stage. Pure per-row fan-out, no
    * shuffle.
    */
  def audioFrames(audio: Dataset[DecodedAudio], frameLen: Int): Dataset[AudioFrame] =
    audio.flatMap { a =>
      a.samples.grouped(frameLen).zipWithIndex.map { case (fr, idx) =>
        var energy = 0L
        var crossings = 0L
        var i = 0
        while (i < fr.length) {
          energy += fr(i).toLong * fr(i).toLong
          if (i > 0 && fr(i).toLong * fr(i - 1).toLong < 0L) crossings += 1
          i += 1
        }
        AudioFrame(a.media_id, idx, fr.length, energy, crossings)
      }
    }

  def extractFeatures(media: Dataset[Media], dim: Int = 16): Dataset[MediaFeatures] =
    media.mapPartitions { it =>
      it.grouped(BatchSize).flatMap { batch =>
        batch.map { m =>
          val acc = new Array[Long](dim)
          var i = 0
          while (i < m.content.length) {
            acc(i % dim) = acc(i % dim) * 31 + (m.content(i) & 0xFF)
            i += 1
          }
          MediaFeatures(m.media_id,
            acc.map(v => ((v % 1000003L).toFloat / 1000003.0f)))
        }
      }
    }
}
