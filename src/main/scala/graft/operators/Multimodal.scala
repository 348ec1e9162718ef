package graft.operators

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads travel as
  * opaque `binary` columns next to typed metadata; decode / feature
  * extraction runs per-partition over batches (the Scala analog of a
  * Pandas `mapInPandas` UDF — one iterator per partition so a real
  * decoder could amortize model/codec init across the batch).
  *
  * Image decode, resize, and EMBEDDING are REAL for the formats the
  * JVM ships codecs for (PNG/JPEG/GIF/BMP/WBMP via `javax.imageio` —
  * no external dependency): the metadata pass is a header-only parse
  * (true width/height/channels, raster never materialized), the
  * resize path bilinear-resamples actual pixels, and [[embedImage]]
  * projects decoded pixels to patch color means that feed the
  * Similarity operators (ANN / SemDeDup / near-dup) directly. Audio is
  * REAL too for JVM-containered formats (WAV/AIFF/AU via
  * `javax.sound.sampled`): [[decodeAudio]] parses true headers and
  * [[embedAudio]] projects actual PCM frames to band envelope
  * statistics. Video-analog payloads are REAL for frame-addressable
  * containers the JVM reads (animated GIF): [[sampleDecodedFrames]]
  * seeks + decodes true frames and [[embedVideo]] concatenates
  * sampled decoded frames' patch means. Payloads no registered
  * reader recognizes (arbitrary bytes, containers without a JVM
  * codec) fall back to the DETERMINISTIC STUB
  * ([[decodeStub]]/[[embedStub]]:
  * byte length, md5 fingerprint, digest-derived values) — the
  * schema/partitioning/batch contract stays identical either way, so
  * swapping in further codecs is a per-format addition, not a rewrite.
  */
object Multimodal {

  // ImageIO's default stream cache is a TEMP FILE PER CALL:
  // `ImageIO.read(InputStream)`, `createImageInputStream`,
  // `createImageOutputStream` and `ImageIO.write(_, _, OutputStream)`
  // all spill through a RandomAccessFile when useCache=true (the JDK
  // default). Per decoded blob that is create+write+read+delete of a
  // /tmp file — measured at sf10 (500k blobs) it turned q104's decode
  // pass ~80% SYSTEM time and leaked `imageio*.tmp` residue; on a real
  // cluster it is a local-disk IOP per record. Every payload here is
  // already an in-memory byte array, so the file cache can never win.
  // Object-initializer placement makes this run once per JVM —
  // executors included, since every ImageIO call site lives in this
  // object and loading it initializes the object first.
  javax.imageio.ImageIO.setUseCache(false)

  /** A media payload row: opaque bytes + source metadata. */
  case class MediaBlob(id: Long, kind: String, content: Array[Byte])

  /** Decoded metadata. `decoder` records provenance: an imageio format
    * name ("png", "jpeg", …) for real decodes, "stub" otherwise;
    * `channels` is the color band count (real) or 3 (stub default).
    */
  case class DecodedMeta(id: Long, kind: String, n_bytes: Long,
      fingerprint: String, width: Int, height: Int, channels: Int,
      decoder: String)

  /** Deterministic fake decode of one payload. */
  def decodeStub(b: MediaBlob): DecodedMeta = {
    val md = MessageDigest.getInstance("MD5").digest(b.content)
    val hex = md.map("%02x".format(_)).mkString
    // fake dimensions from the first digest bytes — stands in for the
    // codec's real width/height for formats with no JVM decoder
    val w = 64 + (((md(0) & 0xff) << 8 | (md(1) & 0xff)) % 1920)
    val h = 64 + (((md(2) & 0xff) << 8 | (md(3) & 0xff)) % 1080)
    DecodedMeta(b.id, b.kind, b.content.length.toLong, hex, w, h, 3, "stub")
  }

  /** Header-only image probe via `javax.imageio`: (width, height,
    * channels, format) if any registered reader recognizes the payload.
    * Reads ONLY the header — at 100 TB the metadata pass must not
    * decode rasters — and uses a memory-backed stream (the default
    * `createImageInputStream` spills to a temp FILE per payload).
    */
  private[operators] def imageMeta(content: Array[Byte])
      : Option[(Int, Int, Int, String)] = {
    val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
      new java.io.ByteArrayInputStream(content))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) None
      else {
        val r = readers.next()
        try {
          r.setInput(iis, true, true)
          val w = r.getWidth(0)
          val h = r.getHeight(0)
          val raw = r.getRawImageType(0)
          val ch = if (raw != null) raw.getNumBands
            else r.getImageTypes(0).next().getNumBands
          Some((w, h, ch, r.getFormatName.toLowerCase))
        } finally r.dispose()
      }
    } catch {
      // a recognized prefix with a corrupt header is still a stub row,
      // not a task failure (quarantine-over-crash, same policy as S6)
      case _: java.io.IOException => None
    } finally iis.close()
  }

  /** One payload: real image header decode when a JVM codec matches,
    * deterministic stub otherwise.
    */
  def decodeOne(b: MediaBlob): DecodedMeta = imageMeta(b.content) match {
    case Some((w, h, ch, fmt)) =>
      val md = MessageDigest.getInstance("MD5").digest(b.content)
      DecodedMeta(b.id, b.kind, b.content.length.toLong,
        md.map("%02x".format(_)).mkString, w, h, ch, fmt)
    case None => decodeStub(b)
  }

  /** Partition-batched decode: one iterator per partition (codec init
    * once per partition, not per row).
    */
  def decode(blobs: Dataset[MediaBlob]): Dataset[DecodedMeta] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions { iter => iter.map(decodeOne) }
  }

  /** Build a MediaBlob dataset from any (id, kind, binary) DataFrame. */
  def asBlobs(df: DataFrame, idCol: String, kindCol: String,
      bytesCol: String): Dataset[MediaBlob] = {
    import df.sparkSession.implicits._
    df.select(col(idCol).as("id"), col(kindCol).as("kind"),
      col(bytesCol).as("content")).as[MediaBlob]
  }

  /** Per-kind exact content dedup + storage accounting for a blob
    * table: group by md5(content) within each media kind and report
    * how many blobs, how many DISTINCT payloads, total bytes, and the
    * bytes an exact dedup would reclaim (every copy past the first).
    * The pre-training hygiene number for an image/audio corpus — run
    * BEFORE any expensive decode/embed pass, since duplicate payloads
    * multiply downstream cost byte-for-byte.
    *
    * Scale shape: one shuffle on (kind, fingerprint) with map-side
    * partial aggregation (exact copies collapse in-partition), then a
    * |kinds|-row rollup. The content column never shuffles — only its
    * 16-byte fingerprint does.
    */
  def dedupStats(df: DataFrame, idCol: String, kindCol: String,
      bytesCol: String): DataFrame =
    df.filter(col(bytesCol).isNotNull)
      .select(col(kindCol).as("kind"), md5(col(bytesCol)).as("fp"),
        length(col(bytesCol)).cast("long").as("n_bytes"))
      .groupBy("kind", "fp")
      .agg(count(lit(1)).as("cnt"), min("n_bytes").as("bytes"))
      .groupBy("kind")
      .agg(sum(col("cnt")).as("n_blobs"),
        count(lit(1)).as("n_distinct"),
        sum(col("cnt") * col("bytes")).as("total_bytes"),
        sum((col("cnt") - 1) * col("bytes")).as("reclaim_bytes"))

  /** A resized payload: new dims + re-encoded bytes (real for
    * JVM-decodable images, pass-through otherwise — `reencoded` says
    * which).
    */
  case class ResizedBlob(id: Long, kind: String, width: Int, height: Int,
      scale: Double, reencoded: Boolean, content: Array[Byte])

  /** Full raster decode of one payload — used by the resize path, NOT
    * the metadata pass ([[imageMeta]] stays header-only: at 100 TB the
    * stats/dedup queries must never touch pixels). Returns None for
    * payloads no JVM codec decodes (audio/video/junk) or corrupt images
    * (quarantine-over-crash, same policy as S6).
    */
  private[operators] def decodeRaster(content: Array[Byte])
      : Option[java.awt.image.BufferedImage] =
    try Option(javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(content)))
    // NonFatal, not just IOException: ImageIO throws RuntimeExceptions
    // (CMMException, IllegalArgumentException, codec index errors) on
    // corrupt-but-recognized payloads — one bad blob must quarantine,
    // not fail the job
    catch { case scala.util.control.NonFatal(_) => None }

  /** Real pixel resize: decode the raster, bilinear-scale it to
    * (w, h), re-encode as PNG (lossless — the resized payload stays
    * deterministic and re-decodable). None where no codec applies.
    */
  private[operators] def resizeRaster(content: Array[Byte], w: Int, h: Int)
      : Option[Array[Byte]] =
    decodeRaster(content).map { img =>
      val hasAlpha = img.getColorModel.hasAlpha
      val out = new java.awt.image.BufferedImage(w, h,
        if (hasAlpha) java.awt.image.BufferedImage.TYPE_INT_ARGB
        else java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = out.createGraphics()
      try {
        g.setRenderingHint(
          java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(img, 0, 0, w, h, null)
      } finally g.dispose()
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(out, "png", bos)
      bos.toByteArray
    }

  /** Fit-inside-box resize. Geometry (aspect-preserving scale, never
    * upscale) applies to every payload; payloads a JVM codec decodes
    * are REALLY resampled (bilinear) and re-encoded as PNG
    * (`reencoded = true`); everything else — undecodable kinds, or
    * scale 1.0 where re-encoding would only transcode — passes its
    * bytes through untouched. Runs per partition so codec init
    * amortizes across the batch.
    */
  def resize(decoded: Dataset[DecodedMeta], blobs: Dataset[MediaBlob],
      maxW: Int, maxH: Int): Dataset[ResizedBlob] = {
    import blobs.sparkSession.implicits._
    val joined = decoded.toDF()
      .select("id", "kind", "width", "height", "decoder")
      .join(blobs.toDF().drop("kind"), "id")
      .as[(Long, String, Int, Int, String, Array[Byte])]
    joined.mapPartitions { iter =>
      iter.map { case (id, kind, w, h, decoder, content) =>
        val scale = math.min(1.0,
          math.min(maxW.toDouble / w, maxH.toDouble / h))
        val nw = math.max(1, (w * scale).toInt)
        val nh = math.max(1, (h * scale).toInt)
        val real =
          if (decoder != "stub" && scale < 1.0)
            resizeRaster(content, nw, nh)
          else None
        ResizedBlob(id, kind, nw, nh, scale, real.isDefined,
          real.getOrElse(content))
      }
    }
  }

  /** One sampled frame of a video payload. */
  case class Frame(id: Long, frame_idx: Int, n_frames: Int,
      frame_bytes: Array[Byte])

  /** Frame sampling: each video blob fans out to `n` evenly-spaced
    * frames — the one-blob→many-rows generator shape, iterator-to-
    * iterator so a partition never materializes all its frames at once.
    * Stub: a "frame" is the corresponding byte slice of the payload
    * (a real extractor would seek + decode at the same positions).
    */
  def sampleFrames(blobs: Dataset[MediaBlob], n: Int): Dataset[Frame] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions { iter =>
      iter.flatMap { b =>
        val len = b.content.length
        if (len == 0) Iterator.empty
        else Iterator.tabulate(n) { i =>
          val start = (len.toLong * i / n).toInt
          val end = (len.toLong * (i + 1) / n).toInt
          Frame(b.id, i, n, java.util.Arrays.copyOfRange(
            b.content, start, math.max(end, start + 1).min(len)))
        }
      }
    }
  }

  // ── Video-analog: real multi-frame container (GIF — the one the JVM
  //    codecs both write and read frame-addressably). Indexed-color
  //    frames make the LZW round-trip lossless, so the REAL
  //    seek→decode→feature path is oracle-checkable exactly, same
  //    discipline as syntheticPng/syntheticWav. ──

  /** Deterministic synthetic animation: `nFrames` full-size 16×16
    * frames in one GIF, each pixel an index into a fixed 256-entry
    * palette:
    *
    * {{{
    *   idx(f, x, y) = (seed*31 + f*37 + x*7 + y*13) % 256
    *   palette(i)   = (r = i, g = (i*3) % 256, b = (i*7) % 256)
    * }}}
    *
    * Indexed frames + our own palette mean GIF encodes the index map
    * losslessly — a decoder that truly seeks to frame f and reads its
    * pixels reproduces the formula's colors bit for bit, so frame
    * addressing, palette lookup and LZW round-trip are all
    * oracle-checkable.
    */
  def syntheticGif(seed: Long, nFrames: Int = 8, w: Int = 16,
      h: Int = 16): Array[Byte] = {
    val r = new Array[Byte](256)
    val g = new Array[Byte](256)
    val b = new Array[Byte](256)
    var i = 0
    while (i < 256) {
      r(i) = i.toByte
      g(i) = ((i * 3) % 256).toByte
      b(i) = ((i * 7) % 256).toByte
      i += 1
    }
    val icm = new java.awt.image.IndexColorModel(8, 256, r, g, b)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    val writer =
      javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      var f = 0
      while (f < nFrames) {
        val img = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, icm)
        val raster = img.getRaster
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            raster.setSample(x, y, 0,
              ((seed * 31 + f * 37 + x * 7 + y * 13) % 256).toInt)
            x += 1
          }
          y += 1
        }
        writer.writeToSequence(
          new javax.imageio.IIOImage(img, null, null), null)
        f += 1
      }
      writer.endWriteSequence()
    } finally {
      writer.dispose()
      ios.close()
    }
    bos.toByteArray
  }

  /** REAL frame sampling: open the container with the actual codec,
    * read the true frame count, seek to `n` evenly-spaced frame
    * indices (`total*i/n`), decode each, and re-encode as PNG — the
    * decoded upgrade of [[sampleFrames]]'s byte-slice stub, keeping
    * the same one-blob→many-rows `Frame` contract (`n_frames` is now
    * the TRUE container count, `frame_idx` the sampled container
    * index). Payloads no codec recognizes are DROPPED
    * (quarantine-over-crash); iterator-to-iterator, so a partition
    * never materializes all frames at once.
    */
  def sampleDecodedFrames(blobs: Dataset[MediaBlob], n: Int)
      : Dataset[Frame] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions { iter =>
      iter.flatMap { blob =>
        withFrameReader(blob.content) { (reader, total) =>
          (0 until n).map { i =>
            val idx = (total.toLong * i / n).toInt
            val png = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(reader.read(idx), "png", png)
            Frame(blob.id, idx, total, png.toByteArray)
          }
        }.getOrElse(Seq.empty)
      }
    }
  }

  /** One embedded video row: true frame count, the sampled container
    * indices, and the concatenated per-frame features.
    */
  case class VideoEmbedding(id: Long, n_frames: Int,
      sampled: Seq[Int], embedding: Seq[Double])

  /** REAL video embedding: seek + decode `sample` evenly-spaced frames
    * with the actual codec and concatenate each decoded frame's patch
    * color means ([[imagePatchMeans]]'s raster step) frame-major —
    * feature `(s*grid + gy)*grid*3 + gx*3 + c` is sampled-frame s's
    * patch (gy, gx) channel c. One mapPartitions projection, no
    * shuffle; undecodable payloads DROP (quarantine-over-crash).
    */
  def embedVideo(blobs: Dataset[MediaBlob], sample: Int = 4,
      grid: Int = 2): Dataset[VideoEmbedding] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions { iter =>
      iter.flatMap { blob =>
        videoFrameFeatures(blob.content, sample, grid).map {
          case (total, idxs, feats) =>
            VideoEmbedding(blob.id, total, idxs, feats.toSeq)
        }
      }
    }
  }

  /** Pure per-blob form of [[embedVideo]]'s feature step: seek +
    * decode `sample` evenly-spaced frames and return (true frame
    * count, sampled indices, concatenated patch means). The
    * single-pass hook for multi-modality routing, like
    * [[imagePatchMeans]]/[[audioBandStats]]. `None` = quarantine.
    */
  def videoFrameFeatures(content: Array[Byte], sample: Int = 4,
      grid: Int = 2): Option[(Int, Seq[Int], Array[Double])] =
    withFrameReader(content) { (reader, total) =>
      val idxs = (0 until sample).map(i => (total.toLong * i / sample).toInt)
      val feats = idxs.toArray.flatMap { idx =>
        rasterPatchMeans(reader.read(idx), grid)
      }
      (total, idxs, feats)
    }

  /** Open a frame-addressable reader over `content`; `None` when no
    * codec recognizes the payload or `body` throws (quarantine).
    */
  private def withFrameReader[T](content: Array[Byte])(
      body: (javax.imageio.ImageReader, Int) => T): Option[T] =
    try {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(content))
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) { iis.close(); None }
      else {
        val reader = readers.next()
        try {
          reader.setInput(iis)
          Some(body(reader, reader.getNumImages(true)))
        } finally {
          reader.dispose()
          iis.close()
        }
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Deterministic synthetic raster: pixel (x, y) has channel values
    *
    * {{{
    *   r = (seed*31 + x*7  + y*13) % 256
    *   g = (seed*17 + x*3  + y*5 ) % 256
    *   b = (seed*29 + x*11 + y*3 ) % 256
    * }}}
    *
    * encoded as PNG (lossless). The formula is trivially re-computable
    * in SQL, which is what makes the REAL decode→embed path
    * oracle-checkable end to end: an engine that truly decodes the
    * PNG and averages real pixels reproduces the formula's patch
    * means exactly; any decode/indexing/channel-order bug shows up as
    * a value mismatch. Fixture generator for queries and specs.
    */
  def syntheticPng(seed: Long, w: Int = 16, h: Int = 16): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = ((seed * 31 + x * 7 + y * 13) % 256).toInt
        val g = ((seed * 17 + x * 3 + y * 5) % 256).toInt
        val b = ((seed * 29 + x * 11 + y * 3) % 256).toInt
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** One embedded image row: real pixel features + decode provenance. */
  case class ImageEmbedding(id: Long, width: Int, height: Int,
      decoder: String, embedding: Seq[Double])

  /** REAL pixel embedding: decode the raster (actual codec, actual
    * pixels), average each color channel over a `grid`×`grid` patch
    * lattice, and emit the 3·grid² patch means ordered
    * (patch_row, patch_col, [r, g, b]) — a color-moment projection, the
    * classic pre-neural image descriptor. No model weights, fully
    * deterministic, so the bytes→pixels→features path is
    * oracle-checkable; the output column plugs straight into the
    * Similarity operators (cosine ANN, SemDeDup, near-dup pairs) like
    * any other embedding. Payloads no codec decodes are DROPPED
    * (quarantine-over-crash) — callers wanting a total function over
    * mixed corpora union this with [[embedStub]] on the complement.
    *
    * Patch means are exact rationals (sum of 8-bit ints / pixel
    * count) evaluated identically in any IEEE engine, so oracle
    * comparison is exact, not epsilon-based.
    *
    * Scale shape: one mapPartitions projection, no shuffle; codec init
    * amortizes per partition. At 100 TB this is the per-blob decode
    * pass a real encoder would also pay — run AFTER [[dedupStats]]
    * hygiene so duplicate payloads don't multiply it.
    */
  def embedImage(blobs: Dataset[MediaBlob], grid: Int = 4)
      : Dataset[ImageEmbedding] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions { iter =>
      iter.flatMap { blob =>
        imagePatchMeans(blob.content, grid).map { case (w, h, feats) =>
          ImageEmbedding(blob.id, w, h, "pixels", feats.toSeq)
        }
      }
    }
  }

  /** Pure per-blob form of [[embedImage]]'s feature step: decode the
    * payload with the real codec and return (width, height, patch
    * color means). Exposed so multi-modality plans (one scan routing
    * each payload to its kind's features) stay a single projection
    * instead of one pass per modality. `None` = quarantine.
    */
  def imagePatchMeans(content: Array[Byte], grid: Int = 4)
      : Option[(Int, Int, Array[Double])] =
    decodeRaster(content).map { img =>
      (img.getWidth, img.getHeight, rasterPatchMeans(img, grid))
    }

  /** Patch color means of a decoded raster — the shared feature step
    * behind [[imagePatchMeans]] and [[embedVideo]].
    */
  private def rasterPatchMeans(img: java.awt.image.BufferedImage,
      grid: Int): Array[Double] = {
    val w = img.getWidth
    val h = img.getHeight
    val feats = new Array[Double](3 * grid * grid)
    var gy = 0
    while (gy < grid) {
      val y0 = h * gy / grid
      val y1 = math.max(h * (gy + 1) / grid, y0 + 1).min(h)
      var gx = 0
      while (gx < grid) {
        val x0 = w * gx / grid
        val x1 = math.max(w * (gx + 1) / grid, x0 + 1).min(w)
        var (sr, sg, sb) = (0L, 0L, 0L)
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) {
            val rgb = img.getRGB(x, y)
            sr += (rgb >> 16) & 0xff
            sg += (rgb >> 8) & 0xff
            sb += rgb & 0xff
            x += 1
          }
          y += 1
        }
        val n = ((y1 - y0) * (x1 - x0)).toDouble
        val base = (gy * grid + gx) * 3
        feats(base) = sr / n
        feats(base + 1) = sg / n
        feats(base + 2) = sb / n
        gx += 1
      }
      gy += 1
    }
    feats
  }

  // ── Audio: real JVM codec (javax.sound.sampled — WAV/AIFF/AU, no
  //    external dependency), same fixture→decode→feature discipline as
  //    the image path. ──

  /** Deterministic synthetic audio fixture: `nSamples` 16-bit signed
    * PCM mono samples where
    *
    * {{{ sample(i) = ((seed*131071 + i*8191) % 65536) - 32768 }}}
    *
    * containered as WAV (lossless). Like [[syntheticPng]], the formula
    * is trivially re-computable in SQL, so the REAL decode→feature path
    * is oracle-checkable exactly: an engine that truly parses the RIFF
    * container and PCM frames reproduces the formula's band statistics
    * bit for bit; any endianness, framing, or sign bug mismatches.
    */
  def syntheticWav(seed: Long, nSamples: Int = 64,
      sampleRate: Float = 8000f): Array[Byte] = {
    val pcm = new Array[Byte](nSamples * 2)
    var i = 0
    while (i < nSamples) {
      val v = ((seed * 131071L + i * 8191L) % 65536L - 32768L).toInt
      pcm(2 * i) = (v & 0xff).toByte // little-endian, per WAV PCM
      pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    // Hand-rolled canonical 44-byte RIFF header, byte-identical to
    // `AudioSystem.write(_, WAVE, _)` for PCM (MultimodalAudioSpec pins
    // the equality per seed). Why not AudioSystem: its write path
    // re-probes every registered file-writer SPI per call — a fixture
    // leg synthesizing one WAV per corpus row paid that probe per row.
    val dataLen = nSamples * 2
    val rate = sampleRate.toLong
    val out = new Array[Byte](44 + dataLen)
    def w16(o: Int, v: Int): Unit = {
      out(o) = (v & 0xff).toByte; out(o + 1) = ((v >> 8) & 0xff).toByte
    }
    def w32(o: Int, v: Long): Unit = {
      out(o) = (v & 0xff).toByte
      out(o + 1) = ((v >> 8) & 0xff).toByte
      out(o + 2) = ((v >> 16) & 0xff).toByte
      out(o + 3) = ((v >> 24) & 0xff).toByte
    }
    def tag(o: Int, s: String): Unit = {
      var j = 0
      while (j < 4) { out(o + j) = s.charAt(j).toByte; j += 1 }
    }
    tag(0, "RIFF"); w32(4, 36L + dataLen); tag(8, "WAVE")
    tag(12, "fmt "); w32(16, 16L)
    w16(20, 1) // wFormatTag = PCM
    w16(22, 1) // mono
    w32(24, rate); w32(28, rate * 2) // byte rate = rate * blockAlign
    w16(32, 2) // blockAlign (1 ch * 16 bit)
    w16(34, 16)
    tag(36, "data"); w32(40, dataLen.toLong)
    System.arraycopy(pcm, 0, out, 44, dataLen)
    out
  }

  /** Canonical RIFF/WAVE PCM header fast path: Some((sampleRate,
    * channels, bits, dataOff, statedDataLen)) when the payload is a
    * well-formed format-code-1 (integer PCM) WAV; None for everything
    * else — extensible/float/compressed containers, AIFF/AU, or any
    * structural surprise — so callers fall back to `javax.sound`'s SPI
    * path and behavior never changes, only speed. Rationale:
    * `AudioSystem.getAudioInputStream`/`getAudioFileFormat` re-probe
    * every registered provider PER CALL (~360 us/blob measured at
    * sf10 — the entire audio decode budget), while canonical PCM WAV,
    * the dominant payload class of a real audio corpus, is 44 bytes of
    * little-endian header that needs no SPI. `statedDataLen` is the
    * data chunk's declared size (what `javax.sound` derives frame
    * counts from); callers reading samples must cap it at the bytes
    * actually present (what `readAllBytes` would return on a truncated
    * stream).
    */
  private[operators] def wavPcmHeader(c: Array[Byte])
      : Option[(Float, Int, Int, Int, Int)] = {
    def u16(o: Int): Int = (c(o) & 0xff) | ((c(o + 1) & 0xff) << 8)
    def u32(o: Int): Long = (c(o) & 0xffL) | ((c(o + 1) & 0xffL) << 8) |
      ((c(o + 2) & 0xffL) << 16) | ((c(o + 3) & 0xffL) << 24)
    def tagAt(o: Int): String =
      new String(c, o, 4, java.nio.charset.StandardCharsets.US_ASCII)
    if (c.length < 44 || tagAt(0) != "RIFF" || tagAt(8) != "WAVE")
      return None
    var off = 12
    var fmt: Option[(Float, Int, Int)] = None // rate, channels, bits
    while (off + 8 <= c.length) {
      val size = u32(off + 4)
      val body = off + 8
      tagAt(off) match {
        case "fmt " =>
          if (size < 16 || body + 16 > c.length) return None
          val code = u16(body)
          val ch = u16(body + 2)
          val rate = u32(body + 4)
          val blockAlign = u16(body + 12)
          val bits = u16(body + 14)
          // only plain integer PCM with a consistent block align; any
          // other shape (extensible, float, a-law, weird padding) is
          // the SPI path's problem
          if (code != 1 || ch < 1 || bits == 0 || bits % 8 != 0 ||
              blockAlign != ch * (bits / 8)) return None
          fmt = Some((rate.toFloat, ch, bits))
        case "data" =>
          // data before fmt is nonstandard → None (SPI fallback)
          return fmt.map { case (rate, ch, bits) =>
            (rate, ch, bits, body,
              math.min(size, Int.MaxValue.toLong).toInt)
          }
        case _ => ()
      }
      // a non-data chunk that claims to run past EOF: structurally
      // broken, let the SPI path decide what it is
      if (size > (c.length - body).toLong) return None
      off = body + size.toInt + (size.toInt & 1) // chunks are word-aligned
    }
    None
  }

  /** Decoded audio metadata — the audio twin of [[DecodedMeta]]. */
  case class AudioMeta(id: Long, n_bytes: Long, fingerprint: String,
      sample_rate: Double, channels: Int, bits: Int, n_frames: Long,
      encoding: String)

  /** Header-only audio probe via `javax.sound.sampled`: parses the
    * container header (RIFF/AIFF/AU) WITHOUT reading PCM frames — the
    * audio analog of [[imageMeta]]'s no-raster rule: at 100 TB the
    * metadata pass must not stream payload bodies.
    */
  private[operators] def audioMeta(content: Array[Byte])
      : Option[(Float, Int, Int, Long, String)] =
    wavPcmHeader(content) match {
      case Some((rate, ch, bits, _, statedLen)) =>
        // same fields javax.sound derives: frame count from the STATED
        // data size over the block align; 8-bit WAV PCM is unsigned by
        // spec, wider is signed
        Some((rate, ch, bits, (statedLen / (ch * (bits / 8))).toLong,
          if (bits > 8) "PCM_SIGNED" else "PCM_UNSIGNED"))
      case None =>
        try {
          val aff = javax.sound.sampled.AudioSystem.getAudioFileFormat(
            new java.io.ByteArrayInputStream(content))
          val f = aff.getFormat
          Some((f.getSampleRate, f.getChannels, f.getSampleSizeInBits,
            aff.getFrameLength.toLong, f.getEncoding.toString))
        } catch { case scala.util.control.NonFatal(_) => None }
    }

  /** Partition-batched audio metadata decode. Payloads no JVM audio
    * codec recognizes are DROPPED (quarantine-over-crash, like
    * [[embedImage]]) — callers wanting a total function over mixed
    * corpora union with [[decodeStub]] rows on the complement.
    */
  def decodeAudio(blobs: Dataset[MediaBlob]): Dataset[AudioMeta] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions { iter =>
      iter.flatMap { b =>
        audioMeta(b.content).map { case (sr, ch, bits, frames, enc) =>
          val md = MessageDigest.getInstance("MD5").digest(b.content)
          AudioMeta(b.id, b.content.length.toLong,
            md.map("%02x".format(_)).mkString, sr.toDouble, ch, bits,
            frames, enc)
        }
      }
    }
  }

  /** One embedded audio row: real PCM features + stream provenance. */
  case class AudioEmbedding(id: Long, sample_rate: Double,
      n_samples: Int, channels: Int, embedding: Seq[Double])

  /** REAL audio embedding: decode the PCM stream (actual codec, actual
    * frames), split samples into `bands` contiguous windows, and emit
    * per-band [mean, mean-absolute] ordered (band, [mean, abs]) — the
    * classic pre-neural envelope descriptor, the audio twin of
    * [[embedImage]]'s patch means. Integer sample sums divided by the
    * window count are evaluated identically in any IEEE engine, so
    * oracle comparison is exact. 16-bit signed PCM only (what WAV
    * carries); anything else — undecodable payloads, other bit depths —
    * is DROPPED (quarantine-over-crash).
    *
    * Scale shape: one mapPartitions projection, no shuffle; codec init
    * amortizes per partition. Run AFTER [[dedupStats]] hygiene.
    */
  def embedAudio(blobs: Dataset[MediaBlob], bands: Int = 8)
      : Dataset[AudioEmbedding] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions { iter =>
      iter.flatMap { blob =>
        audioBandStats(blob.content, bands).map {
          case (rate, n, ch, feats) =>
            AudioEmbedding(blob.id, rate, n, ch, feats.toSeq)
        }
      }
    }
  }

  /** Pure per-blob form of [[embedAudio]]'s feature step: decode the
    * PCM stream with the real codec and return (sample rate, sample
    * count, channels, band envelope features). The single-pass hook
    * for multi-modality routing, like [[imagePatchMeans]]. `None` =
    * quarantine (undecodable, non-PCM, non-16-bit, or empty).
    */
  def audioBandStats(content: Array[Byte], bands: Int = 8)
      : Option[(Double, Int, Int, Array[Double])] = {
    // (sampleRate, channels, bigEndian, pcmBytes)
    val decoded: Option[(Float, Int, Boolean, Array[Byte])] =
      wavPcmHeader(content) match {
        case Some((rate, ch, bits, dataOff, statedLen)) =>
          // 16-bit signed only, same policy as the SPI branch (8-bit
          // WAV is PCM_UNSIGNED, 24/32-bit fails the width check there)
          if (bits != 16) None
          else {
            // cap the stated size at the bytes present — what
            // readAllBytes() yields on a truncated stream
            val len = math.min(statedLen, content.length - dataOff)
            Some((rate, ch, false,
              java.util.Arrays.copyOfRange(content, dataOff, dataOff + len)))
          }
        case None =>
          try {
            val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
              new java.io.ByteArrayInputStream(content))
            try {
              val f = ais.getFormat
              if (f.getEncoding !=
                    javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED ||
                  f.getSampleSizeInBits != 16) None
              else Some((f.getSampleRate, f.getChannels, f.isBigEndian,
                ais.readAllBytes()))
            } finally ais.close()
          } catch { case scala.util.control.NonFatal(_) => None }
      }
    decoded.flatMap { case (rate, channels, big, bytes) =>
      val n = bytes.length / 2
      if (n == 0) None
      else {
        val samples = new Array[Int](n)
        var i = 0
        while (i < n) {
          val (lo, hi) =
            if (big) (bytes(2 * i + 1), bytes(2 * i))
            else (bytes(2 * i), bytes(2 * i + 1))
          samples(i) = (hi.toInt << 8) | (lo & 0xff)
          i += 1
        }
        val feats = new Array[Double](2 * bands)
        var b = 0
        while (b < bands) {
          val s0 = n * b / bands
          val s1 = math.max(n * (b + 1) / bands, s0 + 1).min(n)
          var (sum, sumAbs) = (0L, 0L)
          var j = s0
          while (j < s1) {
            sum += samples(j)
            sumAbs += math.abs(samples(j))
            j += 1
          }
          val cnt = (s1 - s0).toDouble
          feats(2 * b) = sum / cnt
          feats(2 * b + 1) = sumAbs / cnt
          b += 1
        }
        Some((rate.toDouble, n, channels, feats))
      }
    }
  }

  /** One decoded-signal quality row: per-modality primary/auxiliary
    * metrics with a decodability flag — the multimodal twin of the
    * Gopher-style text quality record.
    */
  case class BlobQuality(id: Long, kind: String, decodable: Boolean,
      q_main: Double, q_aux: Double)

  /** DECODED-signal quality gates — the curation stage that runs
    * between ingestion hygiene ([[dedupStats]]) and embedding: route
    * each blob by its declared kind, decode with the real codec, and
    * emit the two signals a keep/drop policy thresholds on:
    *
    *  - image: q_main = mean luminance over decoded pixels (mean of
    *    the 3×grid² patch channel means — exact: patch means are
    *    rationals with power-of-two denominators), q_aux = min(w, h)
    *  - audio: q_main = overall mean |sample| (mean of the band
    *    mean-abs features — equal power-of-two bands, so exact),
    *    q_aux = duration in ms from the true sample count and rate
    *  - video: q_main = mean luminance over the sampled decoded
    *    frames, q_aux = TRUE container frame count
    *  - text (any other kind): q_main = ASCII-alpha fraction of the
    *    UTF-8 payload, q_aux = character count
    *
    * Undecodable media rows keep their id with `decodable = false`
    * and zeroed metrics (a policy can quarantine rather than silently
    * lose them — unlike the embed operators, a quality pass must
    * account for every input). One mapPartitions projection, no
    * shuffle; thresholds stay in the query layer where policy lives.
    */
  def qualitySignals(blobs: Dataset[MediaBlob], grid: Int = 4,
      bands: Int = 8, sample: Int = 4): Dataset[BlobQuality] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions { iter =>
      iter.map { b =>
        val q = b.kind match {
          case "image" =>
            imagePatchMeans(b.content, grid).map { case (w, h, f) =>
              (f.sum / f.length, math.min(w, h).toDouble)
            }
          case "audio" =>
            audioBandStats(b.content, bands).map { case (rate, n, _, f) =>
              val meanAbs = (0 until bands).map(i => f(2 * i + 1)).sum / bands
              (meanAbs, n * 1000.0 / rate)
            }
          case "video" =>
            videoFrameFeatures(b.content, sample, 2).map {
              case (total, _, f) => (f.sum / f.length, total.toDouble)
            }
          case _ =>
            val s = new String(b.content, java.nio.charset.StandardCharsets.UTF_8)
            val alpha = s.count(c =>
              (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z'))
            Some((if (s.isEmpty) 0.0 else alpha.toDouble / s.length,
              s.length.toDouble))
        }
        q match {
          case Some((m, a)) => BlobQuality(b.id, b.kind, true, m, a)
          case None => BlobQuality(b.id, b.kind, false, 0.0, 0.0)
        }
      }
    }
  }

  /** Deterministic stub embedding: digest bytes → fixed-dim unit-norm
    * float vector, the schema contract of a real vision/audio encoder.
    * Output plugs straight into the Similarity operators (ANN, near-dup).
    */
  def embedStub(blobs: Dataset[MediaBlob], dim: Int = 64): DataFrame = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions { iter =>
      // one digest instance per partition (the "model init" slot)
      val md = MessageDigest.getInstance("MD5")
      iter.map { b =>
        val v = new Array[Float](dim)
        var off = 0
        var seed = b.content
        while (off < dim) {
          seed = md.digest(seed)
          var i = 0
          while (i < seed.length && off < dim) {
            v(off) = ((seed(i) & 0xff) - 127.5f) / 127.5f
            i += 1; off += 1
          }
        }
        val norm = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
        (b.id, v.map(x => if (norm == 0) 0f else x / norm).toSeq)
      }
    }.toDF("id", "embedding")
  }
}
