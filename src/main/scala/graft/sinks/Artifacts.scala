package graft.sinks

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Binary artifact sinks (SURVEY §2 A13) — the engine's equivalent of the
  * reference's sidecar outputs: the intensity-map image next to the data
  * (/root/reference/picoprobe/tools/hyperspectral.py:106-107,127-128) and
  * the normalized-frame video (tools/temporal.py:20-35).
  *
  * Encoders are fully real and pure-JVM: PNG/JPEG via `javax.imageio`
  * (part of the JDK), video as MJPEG in BOTH containers — a RIFF AVI and
  * an ISO-BMFF MP4 — written field-for-field; playable files standing in
  * for the reference's imageio MP4 (tools/temporal.py:26-35).
  *
  * ==Video-codec stance==
  * Two real codecs, both pure-JVM: MJPEG (every frame an independent
  * JPEG, via the JDK codec) in AVI and MP4, and H.264 BASELINE I+P
  * ([[graft.multimodal.h264]]: CAVLC, I_4x4/I_16x16/I_PCM intra, P
  * slices with P_Skip + every partition family (16x16/16x8/8x16 and
  * P_8x8 sub-partitions down to 4x4), quarter-pel motion compensation,
  * multi-reference DPB, 4:2:0 8-bit, in-loop deblocking with inter
  * boundary strengths, frame cropping) in MP4 under the 'avc1' sample
  * entry + avcC — the layout ffmpeg/imageio produce for the reference's
  * temporal.py MP4s ([[avcMp4]] writes it, `Multimodal.parseMp4` reads
  * it). Outside-the-subset H.264 (CABAC, B slices, long-term
  * refs/MMCO, High-profile SPS) and foreign codecs fail fast by
  * name rather than misreading — the Hdf5/Szip documented-subset
  * discipline.
  *
  * Scale shape: images/videos are assembled per experiment with
  * `groupByKey.mapGroups` — a single detector image or acquisition video
  * is bounded (MB), so per-group assembly is executor-local and the sink
  * distributes by experiment. The file writer is `foreachPartition` with
  * write-to-temp + atomic rename, so at-least-once batch replays simply
  * replace the same artifact (idempotent).
  */
object Artifacts {

  /** Write (relativePath, bytes) rows under `dir`, atomically per file.
    *
    * Writes resolve through `dir`'s OWN filesystem (Hadoop), not
    * `java.nio` — this runs ON EXECUTORS, where a local-File write would
    * scatter each artifact onto whichever worker's local disk ran the
    * task and report success (silently unreachable output on any real
    * cluster). The DRIVER's resolved Hadoop conf ships into the closure
    * ([[graft.core.SerializableHadoopConf]]): an executor-side bare
    * `Configuration()` carries none of the session's `spark.hadoop.*`
    * settings — object-store credentials, endpoints, custom fs impls —
    * so on exactly the clusters this path targets it would write through
    * the wrong filesystem or fail on credentials. A relative path that
    * escapes `dir` (`../…`) is rejected by name.
    */
  def writeFiles(artifacts: Dataset[(String, Array[Byte])], dir: String): Unit = {
    val confHolder = new graft.core.SerializableHadoopConf(
      artifacts.sparkSession.sessionState.newHadoopConf())
    artifacts.foreachPartition { it: Iterator[(String, Array[Byte])] =>
      if (it.hasNext) {
        import org.apache.hadoop.fs.{CreateFlag, FileContext, Options, Path}
        val conf = confHolder.value
        val base = new Path(dir)
        val fs = base.getFileSystem(conf)
        val rootPath = fs.makeQualified(base).toUri.normalize().getPath
        // FileContext gives atomic rename-over-existing where the scheme
        // has an AbstractFileSystem binding (hdfs, local); schemes with
        // only a FileSystem impl (the s3a shape) fall back to plain
        // FileSystem writes — rename-first, delete+retry only when the
        // filesystem refuses overwrite (the SnapshotIo.writeAtomic
        // discipline; before r13 this path just threw
        // UnsupportedFileSystemException)
        val fcOpt =
          try Some(
            if (base.toUri.getScheme == null) FileContext.getFileContext(conf)
            else FileContext.getFileContext(base.toUri, conf))
          catch {
            case _: org.apache.hadoop.fs.UnsupportedFileSystemException => None
          }
        it.foreach { case (rel, bytes) =>
          val target = fs.makeQualified(new Path(base, rel))
          require(target.toUri.normalize().getPath.startsWith(rootPath + "/"),
            s"artifact path escapes the output directory: $rel")
          val tmp = new Path(target.getParent, target.getName + ".tmp")
          fcOpt match {
            case Some(fc) =>
              val out = fc.create(tmp,
                java.util.EnumSet.of(CreateFlag.CREATE, CreateFlag.OVERWRITE),
                Options.CreateOpts.createParent())
              try out.write(bytes) finally out.close()
              fc.rename(tmp, target, Options.Rename.OVERWRITE)
            case None =>
              val out = fs.create(tmp, true)
              try out.write(bytes) finally out.close()
              if (!fs.rename(tmp, target)) {
                fs.delete(target, false)
                if (!fs.rename(tmp, target))
                  throw new java.io.IOException(s"rename $tmp -> $target failed")
              }
          }
        }
      }
    }
  }

  /** [[writeFiles]] under a batch-scoped subdirectory
    * (`dir/batch_id=<id>/`), PRE-CLEANED before the write: an
    * at-least-once batch replay — including the quarantine path, whose
    * retry analyzes FEWER rows than the failed attempt — fully REPLACES
    * the batch's artifact set. Idempotent-by-name writes alone can't do
    * that: an artifact derived from a later-quarantined file's rows
    * would survive the replay as an orphan matched by no catalog or
    * spectrum row. The pre-clean resolves through `dir`'s own Hadoop
    * filesystem (never java.nio — the cluster-FS discipline), and a
    * crash between clean and write just re-runs on the next replay
    * (WriteBatchCrashSpec sweeps every mutation of that window).
    *
    * CONSUMER CONTRACT: batch subdirs accumulate — the pre-clean scopes
    * to THIS batch's dir, so an artifact NAME re-derived in a later batch
    * (a re-ingested experiment id) exists under both batches' subdirs. A
    * consumer resolving artifacts by bare name must take the highest
    * `batch_id` per name; consumers joining through the catalog/spectrum
    * rows (the pipelines' shape — each row carries its batch_id) are
    * unaffected. Retention of old batch dirs is the deployment's expiry
    * policy, same as the parquet sinks' batch partitions.
    */
  def writeBatch(artifacts: Dataset[(String, Array[Byte])], dir: String,
      batchId: Long): Unit = {
    val sub = s"$dir/batch_id=$batchId"
    val p = new org.apache.hadoop.fs.Path(sub)
    val fs = p.getFileSystem(
      artifacts.sparkSession.sessionState.newHadoopConf())
    if (fs.exists(p)) fs.delete(p, true)
    writeFiles(artifacts, sub)
  }

  /** Grayscale PNG from row-major uint8 pixels (width × height). */
  def grayPng(width: Int, height: Int, pixels: Array[Byte]): Array[Byte] =
    encode(gray(width, height, pixels), "png")

  /** Grayscale JPEG (the MJPEG frame payload). */
  def grayJpeg(width: Int, height: Int, pixels: Array[Byte]): Array[Byte] =
    encode(gray(width, height, pixels), "jpg")

  private def gray(w: Int, h: Int, px: Array[Byte]): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    img.getRaster.setDataElements(0, 0, w, h, px)
    img
  }

  private def encode(img: BufferedImage, fmt: String): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    require(ImageIO.write(img, fmt, bos), s"no $fmt encoder")
    bos.toByteArray
  }

  /** Mono 16-bit PCM WAV from samples — the audio-modality encoder
    * (RIFF('WAVE' fmt data) per the public WAVE format spec), playable by
    * any audio tool.
    */
  def pcmWav(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(1) // mono
      .putInt(sampleRate)
      .putInt(sampleRate * 2) // byte rate
      .putShort(2) // block align
      .putShort(16) // bits/sample
    bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(bb.putShort)
    bb.array()
  }

  /** MJPEG-in-AVI muxer: JPEG frames → one playable video file. The RIFF
    * layout is written per the public AVI specification:
    * RIFF('AVI ' LIST('hdrl' avih LIST('strl' strh strf)) LIST('movi'
    * 00dc…) idx1).
    */
  def mjpegAvi(frames: Seq[Array[Byte]], width: Int, height: Int,
      fps: Int = 100): Array[Byte] = {
    def pad2(n: Int): Int = n + (n & 1)
    val maxChunk = frames.map(_.length).maxOption.getOrElse(0)
    val moviSize = 4 + frames.map(f => 8 + pad2(f.length)).sum
    val idxSize = 16 * frames.size

    val o = new LeOut()
    o.fourcc("RIFF")
    // total size after this field: everything below
    o.u32(4 + (12 + 64 + 12 + 64 + 48) + (8 + moviSize) + (8 + idxSize))
    o.fourcc("AVI ")

    // hdrl list: avih (56+8) + strl list (12 + strh 64 + strf 48)
    o.fourcc("LIST"); o.u32(4 + 64 + 12 + 64 + 48); o.fourcc("hdrl")
    o.fourcc("avih"); o.u32(56)
    o.u32(if (fps > 0) 1000000 / fps else 0) // µs per frame
    o.u32(0); o.u32(0)                       // max bytes/sec, padding
    o.u32(0x10)                              // AVIF_HASINDEX
    o.u32(frames.size); o.u32(0); o.u32(1)   // total frames, initial, streams
    o.u32(maxChunk); o.u32(width); o.u32(height)
    (0 until 4).foreach(_ => o.u32(0))       // reserved

    o.fourcc("LIST"); o.u32(4 + 64 + 48); o.fourcc("strl")
    o.fourcc("strh"); o.u32(56)
    o.fourcc("vids"); o.fourcc("MJPG")
    o.u32(0); o.u32(0); o.u32(0)             // flags, priority+language, initial
    o.u32(1); o.u32(fps)                     // scale, rate → fps
    o.u32(0); o.u32(frames.size)             // start, length
    o.u32(maxChunk); o.u32(0xFFFFFFFF); o.u32(0) // buffer, quality, sample size
    o.u16(0); o.u16(0); o.u16(width); o.u16(height) // rcFrame

    o.fourcc("strf"); o.u32(40)              // BITMAPINFOHEADER
    o.u32(40); o.u32(width); o.u32(height)
    o.u16(1); o.u16(24)                      // planes, bit count
    o.fourcc("MJPG")
    o.u32(width * height * 3)
    o.u32(0); o.u32(0); o.u32(0); o.u32(0)

    // movi list
    o.fourcc("LIST"); o.u32(moviSize); o.fourcc("movi")
    val offsets = frames.map { f =>
      val off = o.size
      o.fourcc("00dc"); o.u32(f.length); o.bytes(f)
      if ((f.length & 1) == 1) o.u8(0)
      off
    }
    val moviStart = offsets.headOption.getOrElse(o.size) - 12 + 8 // 'movi' fourcc pos

    // idx1: offsets relative to the 'movi' fourcc
    o.fourcc("idx1"); o.u32(idxSize)
    frames.zip(offsets).foreach { case (f, off) =>
      o.fourcc("00dc"); o.u32(0x10) // AVIIF_KEYFRAME
      o.u32(off - moviStart); o.u32(f.length)
    }
    o.toArray
  }

  private final class LeOut {
    private val bos = new ByteArrayOutputStream()
    def size: Int = bos.size()
    def u8(v: Int): Unit = bos.write(v & 0xFF)
    def u16(v: Int): Unit = { u8(v); u8(v >> 8) }
    def u32(v: Long): Unit = { u8(v.toInt); u8((v >> 8).toInt); u8((v >> 16).toInt); u8((v >> 24).toInt) }
    def u32(v: Int): Unit = u32(v.toLong & 0xFFFFFFFFL)
    def fourcc(s: String): Unit = bos.write(s.getBytes("US-ASCII"))
    def bytes(b: Array[Byte]): Unit = bos.write(b)
    def toArray: Array[Byte] = bos.toByteArray
  }

  /** Motion-JPEG in an ISO-BMFF (MP4) container — the reference's video
    * container (`temporal.py:26-35` writes MP4 via imageio). Boxes per
    * ISO/IEC 14496-12: ftyp, mdat (concatenated JPEG samples), moov with
    * the full sample-table machinery — 'jpeg' visual sample entry, stts
    * (constant delta 1/fps), single-chunk stsc, per-sample stsz, stco
    * pointing at the mdat payload. Unlike RIFF, ISO-BMFF is BIG-endian.
    */
  def mjpegMp4(frames: Seq[Array[Byte]], width: Int, height: Int,
      fps: Int = 100): Array[Byte] =
    isoBmffMp4(frames, width, height, fps, "jpeg", Array.emptyByteArray)

  /** H.264-in-MP4: AVCC samples (length-prefixed NALs) under an 'avc1'
    * sample entry whose avcC box carries the SPS/PPS — the layout
    * ffmpeg/imageio produce for the reference's temporal.py MP4s. Pair
    * with [[graft.multimodal.h264.H264Encoder]] for the samples. When
    * the stream reorders (B frames), a ctts box carries the
    * composition-time offsets so readers recover display order.
    */
  def avcMp4(enc: graft.multimodal.h264.H264Encoder.Encoded,
      fps: Int = 100, chunkSize: Int = 0): Array[Byte] = {
    val avcC = graft.multimodal.h264.H264Encoder.avcC(enc.sps, enc.pps)
    val ext = new BeOut()
    ext.u32(8 + avcC.length); ext.fourcc("avcC"); ext.bytes(avcC)
    val reordered = enc.displayOrder != enc.samples.indices
    // stss only when the stream mixes sync and non-sync samples (absent
    // box = every sample is sync, the all-IDR case)
    val syncs =
      if (enc.sampleIsIdr.forall(identity)) Seq.empty[Int]
      else enc.sampleIsIdr.zipWithIndex.collect { case (true, i) => i + 1 }
    isoBmffMp4(enc.samples, enc.width, enc.height, fps, "avc1", ext.toArray,
      if (reordered) enc.ctsOffsets else Seq.empty, syncs, chunkSize)
  }

  private def isoBmffMp4(frames: Seq[Array[Byte]], width: Int, height: Int,
      fps: Int, sampleFourcc: String, entryExtension: Array[Byte],
      ctsOffsets: Seq[Int] = Seq.empty, syncSamples: Seq[Int] = Seq.empty,
      chunkSize: Int = 0): Array[Byte] = {
    val n = frames.size

    def box(typ: String)(body: BeOut => Unit): Array[Byte] = {
      val b = new BeOut(); body(b)
      val o = new BeOut()
      o.u32(8 + b.size); o.fourcc(typ); o.bytes(b.toArray)
      o.toArray
    }
    def fullBox(typ: String, version: Int, flags: Int)(body: BeOut => Unit) =
      box(typ) { b => b.u32((version << 24) | flags); body(b) }
    val unityMatrix = Seq(0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)

    val ftyp = box("ftyp") { b =>
      b.fourcc("isom"); b.u32(512)
      Seq("isom", "iso2", "mp41").foreach(b.fourcc)
    }
    val mdatPayload = frames.flatMap(_.toSeq).toArray
    val mdat = box("mdat")(_.bytes(mdatPayload))
    val firstSampleOffset = ftyp.length + 8 // into mdat's payload

    val stsd = fullBox("stsd", 0, 0) { b =>
      b.u32(1) // one VisualSampleEntry: 86 bytes + codec-config extension
      b.u32(86 + entryExtension.length); b.fourcc(sampleFourcc)
      (0 until 6).foreach(_ => b.u8(0)); b.u16(1) // reserved, data_ref_index
      b.u16(0); b.u16(0); (0 until 3).foreach(_ => b.u32(0)) // pre_def/reserved
      b.u16(width); b.u16(height)
      b.u32(0x00480000); b.u32(0x00480000) // 72 dpi
      b.u32(0); b.u16(1)                   // reserved, frame_count
      (0 until 32).foreach(_ => b.u8(0))   // compressorname
      b.u16(0x18); b.u16(0xFFFF)           // depth, pre_defined = -1
      b.bytes(entryExtension)              // avcC for 'avc1', empty for 'jpeg'
    }
    val stbl = box("stbl") { b =>
      b.bytes(stsd)
      b.bytes(fullBox("stts", 0, 0) { t => t.u32(1); t.u32(n); t.u32(1) })
      if (ctsOffsets.nonEmpty) { // composition offsets (run-length coded)
        require(ctsOffsets.size == n && ctsOffsets.forall(_ >= 0),
          "ctts v0 requires one non-negative offset per sample")
        val runs = Seq.newBuilder[(Int, Int)]
        var i = 0
        while (i < n) {
          var j = i
          while (j < n && ctsOffsets(j) == ctsOffsets(i)) j += 1
          runs += ((j - i, ctsOffsets(i)))
          i = j
        }
        val rs = runs.result()
        b.bytes(fullBox("ctts", 0, 0) { t =>
          t.u32(rs.size)
          rs.foreach { case (count, off) => t.u32(count); t.u32(off) }
        })
      }
      // sample-to-chunk: single chunk by default; `chunkSize` > 0 splits
      // into chunks of (chunkSize+1, chunkSize, chunkSize, …) samples —
      // two stsc runs, the layout interleaving muxers emit
      val chunkCounts: Seq[Int] =
        if (chunkSize <= 0 || n <= chunkSize + 1) Seq(n)
        else {
          val rest = n - (chunkSize + 1)
          Seq(chunkSize + 1) ++ Seq.fill(rest / chunkSize)(chunkSize) ++
            (if (rest % chunkSize != 0) Seq(rest % chunkSize) else Nil)
        }
      b.bytes(fullBox("stsc", 0, 0) { t =>
        // run-length rows over distinct samples_per_chunk values
        val runs = Seq.newBuilder[(Int, Int)] // (first_chunk 1-based, per_chunk)
        chunkCounts.zipWithIndex.foreach { case (cnt, i) =>
          if (i == 0 || cnt != chunkCounts(i - 1)) runs += ((i + 1, cnt))
        }
        val rs = runs.result()
        t.u32(rs.size)
        rs.foreach { case (first, cnt) => t.u32(first); t.u32(cnt); t.u32(1) }
      })
      b.bytes(fullBox("stsz", 0, 0) { t =>
        t.u32(0); t.u32(n); frames.foreach(f => t.u32(f.length))
      })
      b.bytes(fullBox("stco", 0, 0) { t =>
        t.u32(chunkCounts.size)
        var off = firstSampleOffset
        var s = 0
        chunkCounts.foreach { cnt =>
          t.u32(off)
          (0 until cnt).foreach { _ => off += frames(s).length; s += 1 }
        }
      })
      if (syncSamples.nonEmpty)
        b.bytes(fullBox("stss", 0, 0) { t =>
          t.u32(syncSamples.size); syncSamples.foreach(t.u32)
        })
    }
    val minf = box("minf") { b =>
      b.bytes(fullBox("vmhd", 0, 1) { t => t.u16(0); (0 until 3).foreach(_ => t.u16(0)) })
      b.bytes(box("dinf")(_.bytes(fullBox("dref", 0, 0) { t =>
        t.u32(1); t.bytes(fullBox("url ", 0, 1)(_ => ())) // self-contained
      })))
      b.bytes(stbl)
    }
    val mdia = box("mdia") { b =>
      b.bytes(fullBox("mdhd", 0, 0) { t =>
        t.u32(0); t.u32(0); t.u32(fps); t.u32(n)
        t.u16(0x55C4); t.u16(0) // language "und"
      })
      b.bytes(fullBox("hdlr", 0, 0) { t =>
        t.u32(0); t.fourcc("vide"); (0 until 3).foreach(_ => t.u32(0))
        t.bytes("VideoHandler".getBytes("US-ASCII")); t.u8(0)
      })
      b.bytes(minf)
    }
    val trak = box("trak") { b =>
      b.bytes(fullBox("tkhd", 0, 3) { t =>
        t.u32(0); t.u32(0); t.u32(1); t.u32(0); t.u32(n) // times, id, dur
        t.u32(0); t.u32(0); t.u16(0); t.u16(0); t.u16(0); t.u16(0)
        unityMatrix.foreach(t.u32)
        t.u32(width << 16); t.u32(height << 16) // 16.16 fixed
      })
      b.bytes(mdia)
    }
    val moov = box("moov") { b =>
      b.bytes(fullBox("mvhd", 0, 0) { t =>
        t.u32(0); t.u32(0); t.u32(fps); t.u32(n) // timescale = fps, dur = n
        t.u32(0x00010000); t.u16(0x0100); t.u16(0) // rate, volume
        t.u32(0); t.u32(0)
        unityMatrix.foreach(t.u32)
        (0 until 6).foreach(_ => t.u32(0))
        t.u32(2) // next track id
      })
      b.bytes(trak)
    }

    val out = new BeOut()
    out.bytes(ftyp); out.bytes(mdat); out.bytes(moov)
    out.toArray
  }

  private final class BeOut {
    private val bos = new ByteArrayOutputStream()
    def size: Int = bos.size()
    def u8(v: Int): Unit = bos.write(v & 0xFF)
    def u16(v: Int): Unit = { u8(v >> 8); u8(v) }
    def u32(v: Int): Unit = { u8(v >> 24); u8(v >> 16); u8(v >> 8); u8(v) }
    def fourcc(s: String): Unit = bos.write(s.getBytes("US-ASCII"))
    def bytes(b: Array[Byte]): Unit = bos.write(b)
    def toArray: Array[Byte] = bos.toByteArray
  }

  /** Intensity-map rows `(experiment_id, x, y, intensity)` → one
    * min-max-normalized grayscale PNG per experiment, named
    * `<experiment_id>.png`. x indexes rows, y columns (the reference's
    * imshow orientation).
    */
  def intensityPngs(intensity: DataFrame): Dataset[(String, Array[Byte])] = {
    val spark = intensity.sparkSession
    import spark.implicits._
    intensity.select(col("experiment_id"), col("x"), col("y"),
      col("intensity").cast("double"))
      .as[(String, Int, Int, Double)]
      .groupByKey(_._1)
      .mapGroups { (eid, it) =>
        val cells = it.map { case (_, x, y, v) => (x, y, v) }.toArray
        val h = cells.map(_._1).max + 1
        val w = cells.map(_._2).max + 1
        require(cells.length == w * h,
          s"experiment $eid: ${cells.length} cells for a ${w}x$h map — " +
            "more than one signal per experiment? select first (e.g. " +
            "Signals.firstWithNdimPerExperiment) before rendering")
        val mn = cells.map(_._3).min
        val mx = cells.map(_._3).max
        val px = new Array[Byte](w * h)
        cells.foreach { case (x, y, v) =>
          val u = if (mx > mn)
            math.floor((v - mn) / (mx - mn) * 255.0 + 0.499999999).toInt
          else 0
          px(x * w + y) = u.toByte
        }
        (s"$eid.png", grayPng(w, h, px))
      }
  }

  /** Normalized-video rows `(experiment_id, frame, x, y, v8)` → one
    * MJPEG-AVI per experiment, named `<experiment_id>.avi` — the engine's
    * realization of the reference's per-acquisition MP4
    * (temporal.py:20-35). Frames JPEG-encode in a first per-(experiment,
    * frame) group pass — executor-local, one frame at a time — then the
    * tiny encoded frames assemble per experiment.
    */
  def videoArtifacts(framesU8: DataFrame, fps: Int = 100): Dataset[(String, Array[Byte])] = {
    val spark = framesU8.sparkSession
    import spark.implicits._
    val jpegs = framesU8.select(col("experiment_id"), col("frame"),
      col("x"), col("y"), col("v8").cast("int"))
      .as[(String, Int, Int, Int, Int)]
      .groupByKey(r => (r._1, r._2))
      .mapGroups { (key: (String, Int), it: Iterator[(String, Int, Int, Int, Int)]) =>
        val (eid, frame) = key
        val cells = it.map { case (_, _, x, y, v) => (x, y, v) }.toArray
        val h = cells.map(_._1).max + 1
        val w = cells.map(_._2).max + 1
        require(cells.length == w * h,
          s"experiment $eid frame $frame: ${cells.length} cells for ${w}x$h — " +
            "more than one signal per experiment? select first before rendering")
        val px = new Array[Byte](w * h)
        cells.foreach { case (x, y, v) => px(x * w + y) = v.toByte }
        (eid, frame, w, h, grayJpeg(w, h, px))
      }
    jpegs.groupByKey(_._1)
      .mapGroups { (eid, it) =>
        val fs = it.toArray.sortBy(_._2)
        (s"$eid.avi", mjpegAvi(fs.map(_._5).toSeq, fs.head._3, fs.head._4, fps))
      }
  }
}
