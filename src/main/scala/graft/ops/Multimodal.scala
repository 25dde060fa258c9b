package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY.md §2.8 X4).
  *
  * Media (image/audio/video) are opaque `binary` columns with typed
  * metadata travelling alongside. Both the Spark-side mechanics — schema,
  * partition sizing, batch shape, pruning — AND the codecs are real
  * (r11–r13, oracle-gated by `x4_decode_real`, `x4_png_roundtrip`, …):
  * byte-level container parsers written against the public format specs —
  * PNG (zlib inflate + per-scanline defilter + CRC check), JPEG baseline
  * SOF0 / progressive SOF2 headers, EXIF in both endiannesses, WAV
  * (PCM / IEEE-float / EXTENSIBLE), and MP4 (version-1 and largesize
  * boxes). The one remaining fake, [[fakeDecodeFeatures]], is NOT a codec
  * stand-in: it is the deterministic feature-vector synthesizer the
  * media-embedding fixtures use (binary → array<double> with a stable
  * contract), kept so embedding-space ops have reproducible inputs
  * without a model in the container.
  *
  * Scale notes: binary payloads dominate row size, so (a) metadata-only
  * queries must prune the binary column at the scan (verified via
  * ReadSchema in .explain), and (b) decode fan-out uses
  * `spark.sql.files.maxPartitionBytes` to keep a partition's decoded
  * batch in executor memory.
  */
object Multimodal {

  /** Synthesize a deterministic binary payload from text — the stand-in
    * for raw media bytes in fixtures. */
  def syntheticMedia(text: Column): Column = encode(text, "UTF-8")

  /** Typed media metadata struct: (n_bytes, checksum, kind). */
  def mediaMeta(bin: Column, kind: String): Column =
    struct(length(bin).cast("long").as("n_bytes"),
      md5(bin).as("checksum"), lit(kind).as("kind"))

  /** STUB decode — deterministic fake "image decode": derives a fixed
    * 4-dim feature vector from the payload bytes (length, first/last byte,
    * checksum nibble). A real decoder would replace the body, keeping the
    * (binary → array<double>) contract. */
  def fakeDecodeFeatures(bin: Column): Column = {
    val n = length(bin).cast("double")
    // byte access via hex: first byte = first two hex chars, last byte = last two.
    val hx = hex(bin)
    val firstByte = coalesce(conv(substring(hx, 1, 2), 16, 10).cast("double"), lit(0.0))
    val lastByte = coalesce(conv(substring(hx, -2, 2), 16, 10).cast("double"), lit(0.0))
    val nibble = coalesce(conv(substring(md5(bin), 1, 1), 16, 10).cast("double"), lit(0.0))
    array(n, firstByte, lastByte, nibble)
  }

  /** STUB frame-sample: pretend the payload is a video and emit k evenly
    * spaced "frame offsets" — exercises the explode/fan-out shape of real
    * frame extraction. */
  def fakeFrameOffsets(bin: Column, k: Int): Column =
    transform(sequence(lit(0), lit(k - 1)),
      i => floor(i.cast("double") * length(bin).cast("double") / lit(k.toDouble)).cast("long"))

  /** Frame sampling as a relational fan-out — ONE ROW PER SAMPLED FRAME,
    * the shape every video pipeline needs downstream (per-frame
    * embedding, dedup, captioning all want frame rows, not arrays).
    * Offsets are evenly spaced ([[fakeFrameOffsets]]); the frame
    * "content" is stubbed as a fingerprint of (payload, offset) — a real
    * extractor replaces that one column with decoded pixels while the
    * posexplode fan-out, the row schema, and the k-multiplier on row
    * count (what you budget shuffle partitions around at 100 TB) all
    * stay. Pure projection + generate: no shuffle. */
  def frameSample(df: DataFrame, idCol: String, binCol: String, k: Int): DataFrame =
    df.select(col(idCol), col(binCol),
        posexplode(fakeFrameOffsets(col(binCol), k)))
      .select(col(idCol), col("pos").cast("long").as("frame_idx"),
        col("col").as("frame_offset"),
        md5(concat(col(binCol),
          encode(col("col").cast("string"), "UTF-8"))).as("frame_fp"))

  /** Aspect-preserving fit-in-box resize — the METADATA math of an image
    * resize stage (the pixel work is the codec stub's job; the dimension
    * arithmetic is what the pipeline plans storage and batch shapes
    * with). Never upscales; floors to integer pixels with a 1px minimum.
    * Pure IEEE-double arithmetic in a fixed association, so any engine
    * reproduces it bit-identically. */
  def resizeFit(w: Column, h: Column, maxW: Int, maxH: Int): (Column, Column) = {
    val scale = least(lit(maxW.toDouble) / w, lit(maxH.toDouble) / h, lit(1.0))
    (greatest(floor(w * scale), lit(1.0)).cast("long"),
      greatest(floor(h * scale), lit(1.0)).cast("long"))
  }

  case class MediaRow(doc_id: Long, media: Array[Byte])
  case class DecodedMedia(doc_id: Long, width: Int, height: Int,
                          n_bytes: Long, features: Array[Double])

  /** STUB codec with the lifecycle of a real one: construction is the
    * expensive per-partition step (a real decoder loads native libs /
    * model weights there), decode is per-row. Deterministic outputs so
    * tests and reruns agree. */
  final class StubCodec {
    StubCodec.constructions.incrementAndGet(): Unit
    def decode(r: MediaRow): DecodedMedia = {
      val n = r.media.length
      val first = if (n > 0) r.media(0) & 0xff else 0
      val last = if (n > 0) r.media(n - 1) & 0xff else 0
      DecodedMedia(r.doc_id, 1 + first % 64, 1 + last % 64, n.toLong,
        Array(n.toDouble, first.toDouble, last.toDouble))
    }
  }
  object StubCodec {
    /** Test hook: how many codec instances were constructed (≈ one per
      * partition when used via [[decodeMedia]]). */
    val constructions = new java.util.concurrent.atomic.AtomicLong(0L)
  }

  /** The decode fan-out shape real media pipelines need: `mapPartitions`,
    * iterator-to-iterator — ONE codec init per partition (not per row),
    * and Spark streams the partition through without materializing it.
    * Swapping the stub for a real decoder changes only the codec body;
    * the signature (binary in, typed struct + feature vector out), the
    * plan shape, and the partition-sizing story
    * (`spark.sql.files.maxPartitionBytes` bounds a partition's decoded
    * batch) all stay. */
  def decodeMedia(ds: org.apache.spark.sql.Dataset[MediaRow]): org.apache.spark.sql.Dataset[DecodedMedia] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      val codec = new StubCodec
      it.map(codec.decode)
    }
  }

  /** Build a minimal VALID 54-byte BMP header (BITMAPFILEHEADER +
    * BITMAPINFOHEADER) from width/height columns and append `pixels`
    * bytes as the payload. The builder half of [[BmpCodec]]: the codec
    * re-reads width/height from the little-endian header fields at
    * offsets 18/22, so a gate over build→decode proves a REAL byte-format
    * parse (magic check + LE int32 extraction), not an echo of the
    * inputs. All four bytes are formatted (8-digit hex, byte pairs
    * reversed for the little-endian fields), so the builder is total
    * over non-negative int32 dimensions. Pure codegen expressions:
    * hex-format + unhex + binary concat, map-only over the scan. */
  def syntheticBmp(w: Column, h: Column, pixels: Column): Column = {
    def le32(v: Column): Column = {
      val hx = lpad(hex(v), 8, "0")
      concat(substring(hx, 7, 2), substring(hx, 5, 2),
        substring(hx, 3, 2), substring(hx, 1, 2))
    }
    concat(unhex(concat(
      lit("424D"),                       // "BM" magic
      lit("00000000"), lit("00000000"),  // file size, reserved (unused)
      lit("36000000"),                   // pixel-array offset = 54
      lit("28000000"),                   // DIB header size = 40
      le32(w), le32(h),                  // the fields the codec parses
      lit("0100"), lit("1800"),          // planes = 1, 24 bpp
      lit("00000000"), lit("00000000"),  // BI_RGB, image size 0
      lit("130B0000"), lit("130B0000"),  // 2835 ppm x/y
      lit("00000000"), lit("00000000")   // palette counts
    )), pixels)
  }

  /** REAL codec for the BMP container: validates the "BM" magic and
    * parses width/height as little-endian int32 at byte offsets 18/22
    * (BITMAPINFOHEADER) — actual bytes, pure JVM, no external library.
    * Same lifecycle contract as [[StubCodec]] (one instance per
    * partition via [[decodeBmp]]); a malformed payload throws rather
    * than fabricating dimensions. Features are the closed-form
    * (width, height, pixel count) so the oracle can replay them. */
  final class BmpCodec {
    BmpCodec.constructions.incrementAndGet(): Unit
    private def le32(b: Array[Byte], off: Int): Int =
      (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
        ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
    def decode(r: MediaRow): DecodedMedia = {
      val b = r.media
      require(b.length >= 26 && b(0) == 'B'.toByte && b(1) == 'M'.toByte,
        s"not a BMP payload (doc ${r.doc_id})")
      val w = le32(b, 18)
      val h = le32(b, 22)
      DecodedMedia(r.doc_id, w, h, b.length.toLong,
        Array(w.toDouble, h.toDouble, w.toDouble * h))
    }
  }
  object BmpCodec {
    /** Test hook: constructions ≈ one per partition via [[decodeBmp]]. */
    val constructions = new java.util.concurrent.atomic.AtomicLong(0L)
  }

  /** [[decodeMedia]] with the REAL [[BmpCodec]] — identical plan shape
    * (mapPartitions, iterator-to-iterator, one codec per partition);
    * only the codec body differs, which is exactly the swap the stub's
    * contract promises. */
  def decodeBmp(ds: org.apache.spark.sql.Dataset[MediaRow]): org.apache.spark.sql.Dataset[DecodedMedia] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      val codec = new BmpCodec
      it.map(codec.decode)
    }
  }

  /** Build a valid PNG container prefix — the 8-byte signature plus a
    * correctly-formed IHDR chunk (length, type, 13 data bytes, CRC slot)
    * — from width/height columns, with `pixels` appended where a real
    * file carries IDAT chunks. BIG-endian counterpart of
    * [[syntheticBmp]] (PNG chunk fields are network order where BMP is
    * little-endian — together the two builders/codecs pin both byte
    * orders); full 4-byte fields, total over non-negative int32 dims.
    * The CRC slot is zeroed: [[PngCodec]] reads geometry, it does not
    * checksum (documented non-goal — a zero CRC keeps the byte layout
    * exact without shipping a CRC32 table through an expression). */
  def syntheticPng(w: Column, h: Column, pixels: Column): Column = {
    def be32(v: Column): Column = lpad(hex(v), 8, "0")
    concat(unhex(concat(
      lit("89504E470D0A1A0A"),            // PNG signature
      lit("0000000D"),                    // IHDR data length = 13
      lit("49484452"),                    // "IHDR"
      be32(w), be32(h),                   // the fields the codec parses
      lit("08"), lit("02"),               // bit depth 8, truecolor
      lit("000000"),                      // compression/filter/interlace
      lit("00000000")                     // CRC slot (not validated)
    )), pixels)
  }

  /** REAL codec for the PNG container: validates the 8-byte signature
    * and the IHDR chunk type, then parses width/height as BIG-endian
    * int32 at byte offsets 16/20 — the network-order mirror of
    * [[BmpCodec]]. Same per-partition lifecycle; malformed payloads
    * throw. */
  final class PngCodec {
    PngCodec.constructions.incrementAndGet(): Unit
    private val Sig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
      .map(_.toByte)
    private def be32(b: Array[Byte], off: Int): Int =
      ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
        ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)
    def decode(r: MediaRow): DecodedMedia = {
      val b = r.media
      require(b.length >= 24 && b.take(8).sameElements(Sig) &&
        b(12) == 'I'.toByte && b(13) == 'H'.toByte &&
        b(14) == 'D'.toByte && b(15) == 'R'.toByte,
        s"not a PNG payload (doc ${r.doc_id})")
      val w = be32(b, 16)
      val h = be32(b, 20)
      DecodedMedia(r.doc_id, w, h, b.length.toLong,
        Array(w.toDouble, h.toDouble, w.toDouble * h))
    }
  }
  object PngCodec {
    /** Test hook: constructions ≈ one per partition via [[decodePng]]. */
    val constructions = new java.util.concurrent.atomic.AtomicLong(0L)
  }

  /** [[decodeMedia]] with the REAL [[PngCodec]] — same plan contract as
    * [[decodeBmp]]. */
  def decodePng(ds: org.apache.spark.sql.Dataset[MediaRow]): org.apache.spark.sql.Dataset[DecodedMedia] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      val codec = new PngCodec
      it.map(codec.decode)
    }
  }

  /** Build a valid baseline-JPEG (JFIF) prefix — SOI, an APP0/JFIF
    * segment, a COM segment (so the codec must prove it SKIPS unknown
    * segments by their length fields, not by a fixed offset), and an
    * SOF0 frame header carrying height/width as BIG-endian **16-bit**
    * fields — the third byte-width variant after BMP's LE32 and PNG's
    * BE32, so the three gates together pin byte order AND field width.
    * Components declare 4:2:0 chroma subsampling (Y 2×2, Cb/Cr 1×1),
    * the layout photographic corpora actually ship. `payload` stands in
    * for the entropy-coded scan and is appended AFTER SOF0, where the
    * segment walk never reaches. Pure codegen expressions, map-only. */
  def syntheticJpeg(w: Column, h: Column, payload: Column): Column =
    syntheticJpeg(w, h, payload, progressive = lit(false))

  /** [[syntheticJpeg]] with a per-row frame-type switch: `progressive`
    * true emits an SOF2 (progressive DCT) frame header instead of SOF0.
    * ITU T.81 §B.2.2 gives both markers the IDENTICAL frame-header
    * layout — only the marker byte differs — so the builder shares
    * every other segment. */
  def syntheticJpeg(w: Column, h: Column, payload: Column,
                    progressive: Column): Column = {
    // fail-loud builder contract (matches the codecs): SOF dimensions
    // are 16-bit — lpad would silently TRUNCATE "10000" to "1000" for
    // 65536, fabricating width 4096
    def be16(v: Column): Column = when(
      assert_true(v.between(0, 0xFFFF),
        lit("syntheticJpeg: dimension exceeds the 16-bit SOF0 field")).isNull,
      lpad(hex(v), 4, "0"))
    concat(unhex(concat(
      lit("FFD8"),                        // SOI
      lit("FFE0"), lit("0010"),           // APP0, length 16
      lit("4A46494600"),                  // "JFIF\0"
      lit("0101"), lit("00"),             // version 1.01, density units: none
      lit("0001"), lit("0001"),           // x/y pixel aspect 1:1
      lit("0000"),                        // no thumbnail
      lit("FFFE"), lit("0007"),           // COM, length 7 (skip-by-length gate)
      lit("6772616674"),                  // "graft"
      when(progressive, lit("FFC2")).otherwise(lit("FFC0")), // SOF2 | SOF0
      lit("0011"),                        // length 17 (3 components)
      lit("08"),                          // sample precision 8
      be16(h), be16(w),                   // the BE16 fields the codec parses
      lit("03"),                          // 3 components
      lit("012200"),                      // Y:  id 1, sampling 2x2, qtable 0
      lit("021101"),                      // Cb: id 2, sampling 1x1, qtable 1
      lit("031101")                       // Cr: id 3, sampling 1x1, qtable 1
    )), payload)
  }

  case class DecodedJpeg(doc_id: Long, width: Int, height: Int, n_bytes: Long,
                         n_components: Int, subsampling: String,
                         sof_type: String)

  /** REAL codec for the JPEG container: validates SOI, then walks the
    * marker-segment stream — each segment skipped by its OWN big-endian
    * length field — until the frame header, from which it parses sample
    * precision, height/width (big-endian int16), component count, and
    * the luma component's chroma-subsampling factors (2×2 → 4:2:0,
    * 2×1 → 4:2:2, 1×1 → 4:4:4). BOTH baseline (SOF0) and progressive
    * (SOF2) frames are accepted for geometry — ITU T.81 §B.2.2 gives
    * them the identical frame-header layout, and a large share of real
    * crawl JPEGs are progressive — reported via `sof_type`
    * ("baseline"/"progressive"). Every OTHER SOF variant (extended
    * sequential SOF1, lossless SOF3, arithmetic SOF9… — rare and
    * untestable here), SOS-before-SOF, standalone markers, and
    * truncated segments all throw rather than guessing — same
    * fail-loud contract as [[BmpCodec]]/[[PngCodec]], same
    * one-instance-per-partition lifecycle. Entropy-coded scan decode is
    * out of scope (that is the DCT stage a native library owns); the
    * header walk is the part a data engine needs for geometry/layout
    * stats and it runs on real bytes. */
  final class JpegCodec {
    JpegCodec.constructions.incrementAndGet(): Unit
    private def be16(b: Array[Byte], off: Int): Int =
      ((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)
    def decode(r: MediaRow): DecodedJpeg = {
      val b = r.media
      require(b.length >= 4 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8,
        s"not a JPEG payload (doc ${r.doc_id})")
      var off = 2
      while (off + 4 <= b.length) {
        require((b(off) & 0xff) == 0xff,
          s"bad marker alignment at byte $off (doc ${r.doc_id})")
        // ITU T.81 §B.1.1.2: markers may be preceded by any number of
        // 0xFF fill bytes — skip them (real encoders emit them)
        while (off + 4 <= b.length && (b(off + 1) & 0xff) == 0xff) off += 1
        require(off + 4 <= b.length, s"trailing fill bytes (doc ${r.doc_id})")
        val marker = b(off + 1) & 0xff
        require(marker != 0xd9 && marker != 0xda,
          s"hit ${if (marker == 0xda) "SOS" else "EOI"} before SOF0 " +
            s"(doc ${r.doc_id})")
        require(marker != 0x01 && (marker < 0xd0 || marker > 0xd7),
          s"standalone marker ${marker.toHexString} before SOS (doc ${r.doc_id})")
        val len = be16(b, off + 2)
        require(len >= 2 && off + 2 + len <= b.length,
          s"truncated segment ${marker.toHexString} (doc ${r.doc_id})")
        // SOF0 (baseline) and SOF2 (progressive) share the frame-header
        // layout byte-for-byte (ITU T.81 §B.2.2) — only the marker differs
        if (marker == 0xc0 || marker == 0xc2) {
          val precision = b(off + 4) & 0xff
          val h = be16(b, off + 5); val w = be16(b, off + 7)
          val nc = b(off + 9) & 0xff
          require(precision == 8 && nc >= 1 && len == 8 + 3 * nc,
            s"malformed SOF (precision $precision, $nc components, len $len) " +
              s"(doc ${r.doc_id})")
          val samp = b(off + 11) & 0xff // luma sampling (component id at off+10)
          val sub = ((samp >> 4, samp & 0x0f): @unchecked) match {
            case (1, 1) => "4:4:4"
            case (2, 1) => "4:2:2"
            case (2, 2) => "4:2:0"
            case (hs, vs) => s"${hs}x$vs"
          }
          val sofType = if (marker == 0xc0) "baseline" else "progressive"
          return DecodedJpeg(r.doc_id, w, h, b.length.toLong, nc, sub, sofType)
        }
        if (marker >= 0xc1 && marker <= 0xcf &&
          marker != 0xc4 && marker != 0xc8 && marker != 0xcc)
          throw new IllegalArgumentException(
            s"unsupported SOF type ${marker.toHexString} — baseline (SOF0) " +
              s"and progressive (SOF2) only (doc ${r.doc_id})")
        off += 2 + len
      }
      throw new IllegalArgumentException(
        s"no SOF0 before end of payload (doc ${r.doc_id})")
    }
  }
  object JpegCodec {
    /** Test hook: constructions ≈ one per partition via [[decodeJpeg]]. */
    val constructions = new java.util.concurrent.atomic.AtomicLong(0L)
  }

  /** [[decodeMedia]] with the REAL [[JpegCodec]] — same plan contract as
    * [[decodeBmp]]/[[decodePng]]. */
  def decodeJpeg(ds: org.apache.spark.sql.Dataset[MediaRow]): org.apache.spark.sql.Dataset[DecodedJpeg] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      val codec = new JpegCodec
      it.map(codec.decode)
    }
  }

  /** Build a JPEG with an APP1/Exif segment carrying the ORIENTATION
    * tag (0x0112) in a real TIFF structure — byte order chosen PER ROW
    * (`littleEndian`): "II" + LE fields or "MM" + BE fields, exactly the
    * two encodings crawl JPEGs ship (camera vendors split roughly down
    * the middle). Layout: SOI, APP1 (Exif\0\0 + TIFF header + one-entry
    * IFD0), COM, SOF0, payload — so the decoder must walk PAST the Exif
    * block to the frame header, and parse INSIDE it with the endianness
    * the payload itself declares. */
  def syntheticExifJpeg(w: Column, h: Column, orientation: Column,
                        littleEndian: Column, payload: Column): Column = {
    def be16(v: Column): Column = when(
      assert_true(v.between(0, 0xFFFF),
        lit("syntheticExifJpeg: dimension exceeds the 16-bit SOF0 field")).isNull,
      lpad(hex(v), 4, "0"))
    val o2 = when(
      assert_true(orientation.between(1, 8),
        lit("syntheticExifJpeg: EXIF orientation must be 1..8")).isNull,
      lpad(hex(orientation), 2, "0"))
    // one-entry IFD0: tag 0x0112, type 3 (SHORT), count 1, value in the
    // first two bytes of the 4-byte value field; next-IFD offset 0
    val tiffLe = concat(
      lit("49492A0008000000"),       // "II", 42 LE, IFD0 at offset 8
      lit("0100"),                   // 1 entry (LE16)
      lit("12010300"), lit("01000000"), // tag/type LE, count LE32
      o2, lit("000000"),             // SHORT value LE + pad
      lit("00000000"))               // next IFD: none
    val tiffBe = concat(
      lit("4D4D002A00000008"),       // "MM", 42 BE, IFD0 at offset 8
      lit("0001"),                   // 1 entry (BE16)
      lit("01120003"), lit("00000001"),
      lit("00"), o2, lit("0000"),    // SHORT value BE + pad
      lit("00000000"))
    concat(unhex(concat(
      lit("FFD8"),                           // SOI
      lit("FFE1"), lit("0022"),              // APP1, length 34
      lit("457869660000"),                   // "Exif\0\0"
      when(littleEndian, tiffLe).otherwise(tiffBe),
      lit("FFFE"), lit("0007"),              // COM (skip-by-length gate)
      lit("6772616674"),                     // "graft"
      lit("FFC0"), lit("0011"),              // SOF0, 3 components
      lit("08"), be16(h), be16(w), lit("03"),
      lit("012200"), lit("021101"), lit("031101")
    )), payload)
  }

  case class DecodedExif(doc_id: Long, width: Int, height: Int,
                         orientation: Int, effective_w: Int, effective_h: Int,
                         byte_order: String)

  /** REAL Exif reader: walks the JPEG marker stream; inside an
    * APP1/Exif segment it parses the TIFF header — byte order from the
    * payload's own "II"/"MM" declaration (the format is
    * SELF-DESCRIBINGLY dual-endian, unlike BMP/PNG/SOF whose widths are
    * fixed), validates the 42 magic, follows the IFD0 offset, and scans
    * the directory for the orientation tag (0x0112, SHORT, 1..8) — the
    * field resize/crop planning MUST honor (orientations 5–8 transpose
    * the raster, so effective width/height swap). Continues to the
    * frame header for geometry. Missing APP1 or missing tag defaults to
    * orientation 1 (the EXIF spec default); a MALFORMED TIFF block
    * (bad byte order, bad magic, reads past the segment, out-of-range
    * orientation) fails loud — same contract as every codec here. */
  final class ExifCodec {
    ExifCodec.constructions.incrementAndGet(): Unit
    def decode(r: MediaRow): DecodedExif = {
      val b = r.media
      require(b.length >= 4 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8,
        s"not a JPEG payload (doc ${r.doc_id})")
      var orientation = 1
      var byteOrder = "none"
      var off = 2
      while (off + 4 <= b.length) {
        require((b(off) & 0xff) == 0xff,
          s"bad marker alignment at byte $off (doc ${r.doc_id})")
        while (off + 4 <= b.length && (b(off + 1) & 0xff) == 0xff) off += 1
        require(off + 4 <= b.length, s"trailing fill bytes (doc ${r.doc_id})")
        val marker = b(off + 1) & 0xff
        require(marker != 0xd9 && marker != 0xda,
          s"hit ${if (marker == 0xda) "SOS" else "EOI"} before SOF (doc ${r.doc_id})")
        val len = ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)
        require(len >= 2 && off + 2 + len <= b.length,
          s"truncated segment ${marker.toHexString} (doc ${r.doc_id})")
        val end = off + 2 + len
        val isExif = marker == 0xe1 && len >= 16 &&
          b(off + 4) == 'E' && b(off + 5) == 'x' && b(off + 6) == 'i' &&
          b(off + 7) == 'f' && b(off + 8) == 0 && b(off + 9) == 0
        if (isExif) {
          val t = off + 10 // TIFF header start; all IFD offsets relative
          val le = (b(t) & 0xff, b(t + 1) & 0xff) match {
            case (0x49, 0x49) => true
            case (0x4d, 0x4d) => false
            case (x, y) => throw new IllegalArgumentException(
              s"bad TIFF byte-order mark ${x.toHexString}${y.toHexString} " +
                s"(doc ${r.doc_id})")
          }
          byteOrder = if (le) "II" else "MM"
          def u16(p: Int): Int = {
            require(p + 2 <= end, s"TIFF read past APP1 (doc ${r.doc_id})")
            if (le) (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8)
            else ((b(p) & 0xff) << 8) | (b(p + 1) & 0xff)
          }
          def u32(p: Int): Int = {
            require(p + 4 <= end, s"TIFF read past APP1 (doc ${r.doc_id})")
            if (le) (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8) |
              ((b(p + 2) & 0xff) << 16) | ((b(p + 3) & 0xff) << 24)
            else ((b(p) & 0xff) << 24) | ((b(p + 1) & 0xff) << 16) |
              ((b(p + 2) & 0xff) << 8) | (b(p + 3) & 0xff)
          }
          require(u16(t + 2) == 42, s"bad TIFF magic (doc ${r.doc_id})")
          val ifd = t + u32(t + 4)
          val n = u16(ifd)
          for (k <- 0 until n) {
            val e = ifd + 2 + 12 * k
            if (u16(e) == 0x0112) {
              require(u16(e + 2) == 3 && u32(e + 4) == 1,
                s"orientation tag must be one SHORT (doc ${r.doc_id})")
              orientation = u16(e + 8)
              require(orientation >= 1 && orientation <= 8,
                s"EXIF orientation $orientation outside 1..8 (doc ${r.doc_id})")
            }
          }
        }
        if (marker == 0xc0 || marker == 0xc2) {
          val h = ((b(off + 5) & 0xff) << 8) | (b(off + 6) & 0xff)
          val w = ((b(off + 7) & 0xff) << 8) | (b(off + 8) & 0xff)
          val swapped = orientation >= 5
          return DecodedExif(r.doc_id, w, h, orientation,
            if (swapped) h else w, if (swapped) w else h, byteOrder)
        }
        // [[JpegCodec]]'s SOF-range rejection, mirrored: any frame type
        // other than SOF0/SOF2 (0xc4 DHT / 0xc8 JPG / 0xcc DAC are not
        // frames) must throw here too — skipping it as an ordinary
        // segment would report geometry from a LATER frame header or a
        // misleading "no frame header" error
        if (marker >= 0xc1 && marker <= 0xcf &&
          marker != 0xc4 && marker != 0xc8 && marker != 0xcc)
          throw new IllegalArgumentException(
            s"unsupported SOF type ${marker.toHexString} — baseline (SOF0) " +
              s"and progressive (SOF2) only (doc ${r.doc_id})")
        off = end
      }
      throw new IllegalArgumentException(
        s"no frame header before end of payload (doc ${r.doc_id})")
    }
  }
  object ExifCodec {
    /** Test hook: constructions ≈ one per partition via [[decodeExif]]. */
    val constructions = new java.util.concurrent.atomic.AtomicLong(0L)
  }

  /** [[decodeMedia]] with the REAL [[ExifCodec]] — same plan contract. */
  def decodeExif(ds: org.apache.spark.sql.Dataset[MediaRow]): org.apache.spark.sql.Dataset[DecodedExif] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      val codec = new ExifCodec
      it.map(codec.decode)
    }
  }

  /** Build a spec-valid WAV (RIFF/WAVE, "fmt " + "data" chunks) from
    * per-row audio parameters, with an extra "LIST" chunk between them
    * so the decoder must walk chunks by their length fields rather than
    * assume fixed offsets. `fmtMode` selects the fmt-chunk form:
    * "pcm" (tag 1, 16-byte chunk), "float" (tag 3, IEEE float),
    * "ext_pcm"/"ext_float" (tag 0xFFFE WAVE_FORMAT_EXTENSIBLE, 40-byte
    * chunk with cbSize=22 and the KSDATAFORMAT_SUBTYPE PCM/float GUID —
    * the form most encoders emit for >2 ch or >16-bit audio). `data`
    * stands in for samples; its LENGTH is real (the duration math
    * divides by it). All multi-byte fields little-endian per RIFF. */
  def syntheticWav(sampleRate: Column, channels: Column, bitsPerSample: Column,
                   data: Column, fmtMode: Column = lit("pcm")): Column = {
    def le32(v: Column): Column = {
      val hx = lpad(hex(v), 8, "0")
      concat(substring(hx, 7, 2), substring(hx, 5, 2),
        substring(hx, 3, 2), substring(hx, 1, 2))
    }
    def le16(v: Column): Column = {
      val hx = lpad(hex(v), 4, "0")
      concat(substring(hx, 3, 2), substring(hx, 1, 2))
    }
    val blockAlign = channels * (bitsPerSample / lit(8))
    val byteRate = sampleRate * blockAlign
    val dataLen = length(data).cast("long")
    val isExt = fmtMode.isin("ext_pcm", "ext_float")
    val baseTag = when(
      assert_true(fmtMode.isin("pcm", "float", "ext_pcm", "ext_float"),
        lit("syntheticWav: unknown fmtMode")).isNull,
      when(fmtMode === "pcm", lit("0100"))
        .when(fmtMode === "float", lit("0300"))
        .otherwise(lit("FEFF")))              // WAVE_FORMAT_EXTENSIBLE
    val fmtBase = concat(baseTag,
      le16(channels), le32(sampleRate),
      le32(byteRate), le16(blockAlign), le16(bitsPerSample))
    // extension block: cbSize=22, validBits=container bits, mask=0,
    // SubFormat GUID xxxxxxxx-0000-0010-8000-00AA00389B71
    val fmtExt = concat(lit("1600"), le16(bitsPerSample), lit("00000000"),
      when(fmtMode === "ext_pcm", lit("01000000")).otherwise(lit("03000000")),
      lit("0000"), lit("1000"), lit("800000AA00389B71"))
    val fmtLen = when(isExt, lit(40L)).otherwise(lit(16L))
    // riff size = 4 ("WAVE") + (8+fmt) + (8+6 LIST) + (8+data)
    val riffSize = lit(4L) + lit(8L) + fmtLen + lit(14L) + lit(8L) + dataLen
    concat(unhex(concat(
      lit("52494646"), le32(riffSize),    // "RIFF", chunk size
      lit("57415645"),                    // "WAVE"
      lit("666D7420"), le32(fmtLen),      // "fmt ", 16 or 40 bytes
      when(isExt, concat(fmtBase, fmtExt)).otherwise(fmtBase),
      lit("4C495354"), lit("06000000"),   // "LIST", 6 bytes (walk gate)
      lit("494E464F6772"),                // "INFOgr" filler
      lit("64617461"), le32(dataLen)      // "data", payload length
    )), data)
  }

  case class DecodedWav(doc_id: Long, sample_rate: Int, channels: Int,
                        bits_per_sample: Int, n_frames: Long,
                        duration_us: Long, format: String)

  /** REAL codec for the WAV container: validates RIFF/WAVE magics, then
    * walks chunks by their LITTLE-endian length fields (chunks are
    * word-aligned: odd sizes carry a pad byte) until it has both the
    * "fmt " block (channels, sample rate, bits — with the
    * byte-rate/block-align consistency equations CHECKED, since crawl
    * WAVs routinely lie) and the "data" chunk, whose byte length plus
    * the format give frame count and duration:
    * frames = data/(channels·bits/8), duration_us = frames·1e6/rate
    * (integer arithmetic — exact on both engines). THREE format tags
    * parse — 1 (PCM), 3 (IEEE float, 32/64-bit), and 0xFFFE
    * (WAVE_FORMAT_EXTENSIBLE — the default most encoders emit for
    * >2 ch or >16-bit: cbSize ≥ 22 checked, then the SubFormat GUID
    * read and required to be KSDATAFORMAT_SUBTYPE_PCM or _IEEE_FLOAT;
    * a non-audio GUID throws), reported via `format`
    * ("pcm"/"float"/"ext_pcm"/"ext_float"). Anything else, missing
    * chunks, inconsistent rates, and truncation all throw — the
    * [[BmpCodec]] fail-loud contract, now for the audio modality. */
  final class WavCodec {
    WavCodec.constructions.incrementAndGet(): Unit
    private def le16(b: Array[Byte], o: Int): Int =
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
    private def le32(b: Array[Byte], o: Int): Long =
      (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
        ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
    private def tag(b: Array[Byte], o: Int): String =
      new String(b, o, 4, "US-ASCII")
    // Data2..Data4 of the fixed audio-subformat GUID suffix
    // xxxxxxxx-0000-0010-8000-00AA00389B71 (little-endian fields)
    private val GuidTail = Array(0x00, 0x00, 0x10, 0x00,
      0x80, 0x00, 0x00, 0xaa, 0x00, 0x38, 0x9b, 0x71)
    def decode(r: MediaRow): DecodedWav = {
      val b = r.media
      require(b.length >= 12 && tag(b, 0) == "RIFF" && tag(b, 8) == "WAVE",
        s"not a RIFF/WAVE payload (doc ${r.doc_id})")
      var off = 12
      var rate = -1; var ch = -1; var bits = -1
      var fmtName: String = null
      var dataLen = -1L
      while (off + 8 <= b.length && (rate < 0 || dataLen < 0)) {
        val id = tag(b, off)
        val len = le32(b, off + 4)
        require(off + 8 + len <= b.length,
          s"truncated chunk $id (doc ${r.doc_id})")
        if (id == "fmt ") {
          require(len >= 16, s"fmt chunk too short (doc ${r.doc_id})")
          val fmt = le16(b, off + 8)
          ch = le16(b, off + 10)
          rate = le32(b, off + 12).toInt
          val byteRate = le32(b, off + 16)
          val blockAlign = le16(b, off + 20)
          bits = le16(b, off + 22)
          fmtName = fmt match {
            case 1 => "pcm"
            case 3 =>
              require(bits == 32 || bits == 64,
                s"IEEE-float WAV must be 32/64-bit, got $bits (doc ${r.doc_id})")
              "float"
            case 0xfffe =>
              require(len >= 40,
                s"extensible fmt chunk too short ($len) (doc ${r.doc_id})")
              val cb = le16(b, off + 24)
              require(cb >= 22, s"extensible cbSize $cb < 22 (doc ${r.doc_id})")
              val validBits = le16(b, off + 26)
              require(validBits >= 1 && validBits <= bits,
                s"valid bits $validBits outside 1..$bits (doc ${r.doc_id})")
              for (k <- 0 until 12)
                require((b(off + 36 + k) & 0xff) == GuidTail(k),
                  s"non-audio SubFormat GUID (doc ${r.doc_id})")
              le32(b, off + 32) match {
                case 1 => "ext_pcm"
                case 3 =>
                  require(bits == 32 || bits == 64,
                    s"IEEE-float WAV must be 32/64-bit, got $bits " +
                      s"(doc ${r.doc_id})")
                  "ext_float"
                case t => throw new IllegalArgumentException(
                  s"unsupported SubFormat tag $t (doc ${r.doc_id})")
              }
            case f => throw new IllegalArgumentException(
              s"unsupported format tag $f (doc ${r.doc_id})")
          }
          require(ch >= 1 && rate >= 1 && bits % 8 == 0 && bits >= 8,
            s"malformed fmt ($ch ch, $rate Hz, $bits bit) (doc ${r.doc_id})")
          require(blockAlign == ch * bits / 8 &&
            byteRate == rate.toLong * blockAlign,
            s"inconsistent fmt equations (doc ${r.doc_id})")
        }
        if (id == "data") dataLen = len
        off += 8 + len.toInt + (len % 2).toInt // RIFF word alignment
      }
      require(rate > 0, s"no fmt chunk before end of payload (doc ${r.doc_id})")
      require(dataLen >= 0, s"no data chunk before end of payload (doc ${r.doc_id})")
      val frameBytes = ch * bits / 8
      require(dataLen % frameBytes == 0,
        s"data length $dataLen not frame-aligned ($frameBytes) (doc ${r.doc_id})")
      val frames = dataLen / frameBytes
      DecodedWav(r.doc_id, rate, ch, bits, frames,
        frames * 1000000L / rate, fmtName)
    }
  }
  object WavCodec {
    /** Test hook: constructions ≈ one per partition via [[decodeWav]]. */
    val constructions = new java.util.concurrent.atomic.AtomicLong(0L)
  }

  /** [[decodeMedia]] with the REAL [[WavCodec]] — same plan contract. */
  def decodeWav(ds: org.apache.spark.sql.Dataset[MediaRow]): org.apache.spark.sql.Dataset[DecodedWav] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      val codec = new WavCodec
      it.map(codec.decode)
    }
  }

  /** Build a minimal spec-valid MP4: `ftyp` + a `free` box (the walk
    * gate) + `moov` containing a version-0 OR version-1 `mvhd`
    * (timescale/duration — v1 widens ctime/mtime/duration to 64 bits,
    * what real encoders emit for long material) + `mdat` carrying
    * `payload`; when `largesizeMdat` is set the mdat uses the
    * size==1 + 64-bit largesize header (the >4 GiB file form). Box
    * sizes are BIG-endian and include their own header — the ISO-BMFF
    * container every crawl video ships. */
  def syntheticMp4(timescale: Column, durationTicks: Column,
                   payload: Column, mvhdV1: Column = lit(false),
                   largesizeMdat: Column = lit(false)): Column = {
    def be32(v: Column): Column = when(
      assert_true(v.between(0, 0x7FFFFFFFL),
        lit("syntheticMp4: field exceeds uint32")).isNull,
      lpad(hex(v), 8, "0"))
    def be64(v: Column): Column = lpad(hex(v), 16, "0")
    val mvhdTail = concat(
      lit("00010000"), lit("0100"),       // rate 1.0, volume 1.0
      lit("0000"), lit("0000000000000000"), // reserved
      // identity matrix (36 bytes)
      lit("000100000000000000000000" +
        "000000000001000000000000" +
        "000000000000000040000000"),
      lit("000000000000000000000000000000000000000000000000"), // pre_defined
      lit("00000002"))                    // next track id
    val mvhd0 = concat(
      lit("0000006C"), lit("6D766864"),   // size 108, "mvhd"
      lit("00000000"),                    // version 0 + flags
      lit("00000000"), lit("00000000"),   // ctime, mtime (32-bit)
      be32(timescale), be32(durationTicks), mvhdTail)
    val be64Dur = when(
      assert_true(durationTicks >= 0,
        lit("syntheticMp4: negative duration")).isNull,
      be64(durationTicks))
    val mvhd1 = concat(
      lit("00000078"), lit("6D766864"),   // size 120, "mvhd" (v1: +12)
      lit("01000000"),                    // version 1 + flags
      be64(lit(0L)), be64(lit(0L)),       // ctime, mtime (64-bit)
      be32(timescale), be64Dur, mvhdTail)
    val mdatHdr = when(largesizeMdat,
      // size==1 sentinel + 64-bit largesize (header is 16 bytes)
      concat(lit("00000001"), lit("6D646174"),
        be64(length(payload).cast("long") + lit(16L))))
      .otherwise(concat(
        be32(length(payload).cast("long") + lit(8L)), lit("6D646174")))
    concat(unhex(concat(
      lit("00000010"), lit("66747970"),   // size 16, "ftyp"
      lit("69736F6D"), lit("00000000"),   // major "isom", minor 0
      lit("0000000C"), lit("66726565"),   // size 12, "free" (walk gate)
      lit("67726674"),                    // "grft" filler
      when(mvhdV1, lit("00000080")).otherwise(lit("00000074")),
      lit("6D6F6F76"),                    // "moov" (8 + mvhd size)
      when(mvhdV1, mvhd1).otherwise(mvhd0),
      mdatHdr
    )), payload)
  }

  case class DecodedMp4(doc_id: Long, timescale: Long, duration_ticks: Long,
                        duration_us: Long, n_boxes: Int, mdat_bytes: Long)

  /** REAL codec for the MP4 (ISO-BMFF) container: walks the TOP-LEVEL
    * box sequence by BIG-endian 32-bit sizes (each including its own
    * 8-byte header — a third container discipline after JPEG's
    * length-after-marker segments and RIFF's length-after-tag chunks),
    * RECURSES into `moov` to find the version-0 `mvhd`, and reports
    * timescale, duration ticks, the exact integer duration in µs, the
    * top-level box count, and the `mdat` payload size — the stats a
    * video curation pipeline budgets with. BOTH `mvhd` versions parse
    * (v0's 32-bit and v1's 64-bit ctime/mtime/duration — v1 is what
    * real encoders emit for long material, ISO/IEC 14496-12 §8.2.2),
    * and size==1 boxes read their 64-bit largesize header (the >4 GiB
    * file form, §4.2) — exactly the long/large inputs a duration-budget
    * pipeline sees. mvhd versions >1, size<8 (size<16 for largesize),
    * truncation, and a missing moov/mvhd/mdat all throw — the house
    * fail-loud contract. */
  final class Mp4Codec {
    Mp4Codec.constructions.incrementAndGet(): Unit
    private def be32(b: Array[Byte], o: Int): Long =
      ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
        ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
    private def be64(b: Array[Byte], o: Int): Long =
      (be32(b, o) << 32) | be32(b, o + 4)
    private def tag(b: Array[Byte], o: Int): String =
      new String(b, o, 4, "US-ASCII")
    /** (box size incl. header, header length): size==1 → largesize. */
    private def boxSize(b: Array[Byte], o: Int, limit: Int,
                        docId: Long): (Long, Int) = {
      require(o + 8 <= limit, s"truncated box header (doc $docId)")
      val s32 = be32(b, o)
      if (s32 != 1) (s32, 8)
      else {
        require(o + 16 <= limit, s"truncated largesize header (doc $docId)")
        val s64 = be64(b, o + 8)
        require(s64 >= 16, s"bad largesize $s64 at $o (doc $docId)")
        (s64, 16)
      }
    }
    def decode(r: MediaRow): DecodedMp4 = {
      val b = r.media
      require(b.length >= 16 && tag(b, 4) == "ftyp",
        s"not an ISO-BMFF payload (doc ${r.doc_id})")
      var off = 0
      var nBoxes = 0
      var timescale = -1L; var ticks = -1L; var mdat = -1L
      while (off < b.length) {
        val (size, hdr) = boxSize(b, off, b.length, r.doc_id)
        require(size >= hdr && off + size <= b.length,
          s"bad box size $size at $off (doc ${r.doc_id})")
        val id = tag(b, off + 4)
        nBoxes += 1
        if (id == "moov") {
          var in = off + hdr
          val end = off + size.toInt
          while (in < end) {
            val (cs, chdr) = boxSize(b, in, end, r.doc_id)
            require(cs >= chdr && in + cs <= end,
              s"bad moov child size $cs (doc ${r.doc_id})")
            if (tag(b, in + 4) == "mvhd") {
              val body = in + chdr
              val version = b(body) & 0xff
              version match {
                case 0 => // 32-bit ctime/mtime/duration
                  timescale = be32(b, body + 12)
                  ticks = be32(b, body + 16)
                case 1 => // 64-bit ctime/mtime/duration (§8.2.2)
                  timescale = be32(b, body + 20)
                  ticks = be64(b, body + 24)
                  require(ticks >= 0,
                    s"mvhd v1 duration overflows int64 (doc ${r.doc_id})")
                case v => throw new IllegalArgumentException(
                  s"mvhd version $v unsupported (v0/v1 only) (doc ${r.doc_id})")
              }
              require(timescale >= 1, s"zero timescale (doc ${r.doc_id})")
            }
            in += cs.toInt
          }
        }
        if (id == "mdat") mdat = size - hdr
        off += size.toInt
      }
      require(timescale > 0, s"no moov/mvhd box (doc ${r.doc_id})")
      require(mdat >= 0, s"no mdat box (doc ${r.doc_id})")
      DecodedMp4(r.doc_id, timescale, ticks,
        ticks * 1000000L / timescale, nBoxes, mdat)
    }
  }
  object Mp4Codec {
    /** Test hook: constructions ≈ one per partition via [[decodeMp4]]. */
    val constructions = new java.util.concurrent.atomic.AtomicLong(0L)
  }

  /** [[decodeMedia]] with the REAL [[Mp4Codec]] — same plan contract. */
  def decodeMp4(ds: org.apache.spark.sql.Dataset[MediaRow]): org.apache.spark.sql.Dataset[DecodedMp4] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      val codec = new Mp4Codec
      it.map(codec.decode)
    }
  }

  case class PayloadStats(doc_id: Long, n_payload: Long, mean_byte: Double,
                          max_byte: Long)

  /** Pixel-payload statistics from a BMP container — the feature-extract
    * stage working on REAL bytes end-to-end: the codec reads the
    * pixel-array OFFSET field (little-endian int32 at byte 10 of
    * BITMAPFILEHEADER — a header field the geometry gate never touches),
    * then folds mean/max over the payload from that offset. The byte sum
    * is exact integer arithmetic, so mean = sum/n is the identical IEEE
    * double on any engine — DuckDB replays it from the hex dump of the
    * same payload. Same mapPartitions lifecycle as the decode paths. */
  def bmpPayloadStats(ds: org.apache.spark.sql.Dataset[MediaRow]): org.apache.spark.sql.Dataset[PayloadStats] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      val codec = new BmpCodec // magic validation + LE field reads
      it.map { r =>
        codec.decode(r): Unit // validates container + geometry fields
        val b = r.media
        val off = (b(10) & 0xff) | ((b(11) & 0xff) << 8) |
          ((b(12) & 0xff) << 16) | ((b(13) & 0xff) << 24)
        require(off >= 14 && off <= b.length,
          s"pixel-array offset $off outside payload (doc ${r.doc_id})")
        var i = off; var sum = 0L; var mx = 0
        while (i < b.length) {
          val v = b(i) & 0xff
          sum += v; if (v > mx) mx = v; i += 1
        }
        val n = b.length - off
        PayloadStats(r.doc_id, n.toLong,
          if (n == 0) 0.0 else sum.toDouble / n, mx.toLong)
      }
    }
  }

  case class PngPixels(doc_id: Long, width: Int, height: Int, n_pixels: Long,
                       mean_r: Double, mean_g: Double, mean_b: Double,
                       max_byte: Long)

  /** PNG Paeth predictor (RFC 2083 §6.6) — shared by the filter-apply
    * (builder) and filter-invert (codec) sides. */
  private[ops] def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** Build a COMPLETE spec-valid PNG (8-bit truecolor, non-interlaced)
    * from raw RGB bytes: each scanline is FILTERED with type `y % 5`
    * (exercising None/Sub/Up/Average/Paeth), the filtered stream is
    * DEFLATED into a real zlib stream (`java.util.zip.Deflater`), and the
    * compressed bytes are split across TWO IDAT chunks — so a decoder
    * must walk and concatenate chunks, not slice one offset — each chunk
    * carrying its true CRC32. The builder half of [[PngPixelCodec]]: the
    * gate over build→decode proves a genuine decompress→defilter
    * round-trip, not a header echo. Runs per-row inside the builder
    * `mapPartitions` (executor-side, no driver state). */
  def buildFullPng(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
    require(w > 0 && h > 0 && rgb.length == w * h * 3,
      s"rgb length ${rgb.length} != $w*$h*3")
    val stride = w * 3
    val raw = new Array[Byte]((stride + 1) * h)
    var y = 0
    while (y < h) {
      val f = y % 5
      raw(y * (stride + 1)) = f.toByte
      var x = 0
      while (x < stride) {
        val cur = rgb(y * stride + x) & 0xff
        val a = if (x >= 3) rgb(y * stride + x - 3) & 0xff else 0
        val b = if (y > 0) rgb((y - 1) * stride + x) & 0xff else 0
        val c = if (x >= 3 && y > 0) rgb((y - 1) * stride + x - 3) & 0xff else 0
        val pred = f match {
          case 0 => 0
          case 1 => a
          case 2 => b
          case 3 => (a + b) / 2
          case _ => paeth(a, b, c)
        }
        raw(y * (stride + 1) + 1 + x) = ((cur - pred) & 0xff).toByte
        x += 1
      }
      y += 1
    }
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(raw); deflater.finish()
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!deflater.finished()) out.write(buf, 0, deflater.deflate(buf))
    deflater.end()
    val z = out.toByteArray
    def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
      val t = typ.getBytes("US-ASCII")
      val bb = java.nio.ByteBuffer.allocate(12 + data.length)
      bb.putInt(data.length).put(t).put(data)
      val crc = new java.util.zip.CRC32()
      crc.update(t); crc.update(data)
      bb.putInt(crc.getValue.toInt).array()
    }
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(w).putInt(h).put(8.toByte).put(2.toByte)
      .put(0.toByte).put(0.toByte).put(0.toByte).array()
    val sig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    val mid = z.length / 2
    sig ++ chunk("IHDR", ihdr) ++ chunk("IDAT", z.take(mid)) ++
      chunk("IDAT", z.drop(mid)) ++ chunk("IEND", Array.emptyByteArray)
  }

  /** REAL pixel-level PNG codec — the full decode path, pure JVM:
    * signature check, chunk walk with CRC32 VALIDATION on every chunk
    * (the header-only [[PngCodec]] documents CRC as a non-goal; this one
    * verifies it), ancillary-chunk skip, multi-IDAT concatenation, zlib
    * INFLATE (`java.util.zip.Inflater`, adler32 verified by the
    * inflater), and scanline DEFILTER inverting all five PNG filter
    * types. Supports the 8-bit truecolor non-interlaced profile
    * [[buildFullPng]] emits; anything else throws rather than guessing.
    * Same one-instance-per-partition lifecycle as the other codecs. */
  final class PngPixelCodec {
    PngPixelCodec.constructions.incrementAndGet(): Unit
    private val Sig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
      .map(_.toByte)
    private def be32(b: Array[Byte], off: Int): Int =
      ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
        ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

    /** Chunk walk + inflate + defilter → (width, height, raw RGB). */
    def decodeRaw(r: MediaRow): (Int, Int, Array[Byte]) = {
      val b = r.media
      require(b.length >= 8 && b.take(8).sameElements(Sig),
        s"not a PNG payload (doc ${r.doc_id})")
      var off = 8
      var w = -1; var h = -1; var sawIhdr = false; var done = false
      val idat = new java.io.ByteArrayOutputStream()
      while (!done) {
        require(off + 12 <= b.length, s"truncated chunk header (doc ${r.doc_id})")
        val len = be32(b, off)
        require(len >= 0 && off + 12 + len <= b.length,
          s"truncated chunk body (doc ${r.doc_id})")
        val typ = new String(b, off + 4, 4, "US-ASCII")
        val crc = new java.util.zip.CRC32()
        crc.update(b, off + 4, 4 + len)
        require(crc.getValue.toInt == be32(b, off + 8 + len),
          s"CRC mismatch in $typ chunk (doc ${r.doc_id})")
        typ match {
          case "IHDR" =>
            w = be32(b, off + 8); h = be32(b, off + 12)
            require(len == 13 && b(off + 16) == 8 && b(off + 17) == 2 &&
              b(off + 18) == 0 && b(off + 19) == 0 && b(off + 20) == 0,
              s"unsupported PNG profile (doc ${r.doc_id})")
            sawIhdr = true
          case "IDAT" => idat.write(b, off + 8, len)
          case "IEND" => done = true
          case _ => () // ancillary chunk: CRC-checked above, content skipped
        }
        off += 12 + len
      }
      require(sawIhdr && w > 0 && h > 0, s"missing IHDR (doc ${r.doc_id})")
      val stride = w * 3
      val raw = new Array[Byte]((stride + 1) * h)
      val inflater = new java.util.zip.Inflater()
      inflater.setInput(idat.toByteArray)
      var got = 0; var k = 1
      while (got < raw.length && k > 0) {
        k = inflater.inflate(raw, got, raw.length - got); got += k
      }
      val over = inflater.inflate(new Array[Byte](1))
      require(got == raw.length && over == 0 && inflater.finished(),
        s"IDAT stream inflated to $got of ${raw.length} filtered bytes " +
          s"(doc ${r.doc_id})")
      inflater.end()
      val pix = new Array[Byte](stride * h)
      var y = 0
      while (y < h) {
        val f = raw(y * (stride + 1)) & 0xff
        var x = 0
        while (x < stride) {
          val v = raw(y * (stride + 1) + 1 + x) & 0xff
          val a = if (x >= 3) pix(y * stride + x - 3) & 0xff else 0
          val up = if (y > 0) pix((y - 1) * stride + x) & 0xff else 0
          val c = if (x >= 3 && y > 0) pix((y - 1) * stride + x - 3) & 0xff else 0
          val pred = f match {
            case 0 => 0
            case 1 => a
            case 2 => up
            case 3 => (a + up) / 2
            case 4 => paeth(a, up, c)
            case _ => throw new IllegalArgumentException(
              s"bad filter type $f (doc ${r.doc_id})")
          }
          pix(y * stride + x) = ((v + pred) & 0xff).toByte
          x += 1
        }
        y += 1
      }
      (w, h, pix)
    }

    /** Per-channel means + global max over the DECODED pixels — exact
      * integer sums, so the mean divides identically on any engine. */
    def decode(r: MediaRow): PngPixels = {
      val (w, h, pix) = decodeRaw(r)
      var sr = 0L; var sg = 0L; var sb = 0L; var mx = 0; var j = 0
      while (j < pix.length) {
        val v = pix(j) & 0xff
        (j % 3: @annotation.switch) match {
          case 0 => sr += v
          case 1 => sg += v
          case _ => sb += v
        }
        if (v > mx) mx = v
        j += 1
      }
      val n = (w.toLong * h).toDouble
      PngPixels(r.doc_id, w, h, w.toLong * h,
        sr / n, sg / n, sb / n, mx.toLong)
    }
  }
  object PngPixelCodec {
    /** Test hook: constructions ≈ one per partition. */
    val constructions = new java.util.concurrent.atomic.AtomicLong(0L)
  }

  /** [[decodeMedia]] with the pixel-level [[PngPixelCodec]] — same
    * mapPartitions plan contract; the codec body is the full real
    * inflate+defilter decode. */
  def decodePngPixels(ds: org.apache.spark.sql.Dataset[MediaRow]): org.apache.spark.sql.Dataset[PngPixels] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      val codec = new PngPixelCodec
      it.map(codec.decode)
    }
  }

  /** Attach media payload + metadata + decoded features to a documents
    * table — the canonical multimodal enrichment pipeline. */
  def enrich(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val bin = encode(col(textCol), "UTF-8")
    docs.select(col(idCol),
      bin.as("media"),
      mediaMeta(bin, "text/fake").as("meta"),
      fakeDecodeFeatures(bin).as("features"))
  }

  /** X4 — media near-duplicate pairs (the image-dedup shape: fingerprint
    * → band → verify, with the decode stubbed): byte-identical payloads
    * collapse by checksum FIRST (exact dups never reach the pair stage —
    * the edit-join lesson), the surviving representatives band on
    * QUANTIZED decoded features, and candidates verify with exact L2 in
    * feature space. A real pipeline swaps [[fakeDecodeFeatures]] for a
    * CNN/pHash embedding; the collapse→band→verify dataflow, plan shape,
    * and output contract stay identical.
    *
    * Band key = (⌊len/`lenBand`⌋, first byte, last byte): a content-
    * derived fingerprint with CARDINALITY THAT GROWS with the corpus —
    * the scale property a k-hyperplane LSH over these low-dimensional,
    * length-dominated features lacks (a fixed 2^bits bucket space turns
    * the verify join bucket-quadratic as the corpus grows; measured 11 s
    * → 1 s at sf0.1 switching to bands). Near-dups differing across a
    * band boundary are missed — the standard ANN recall trade, same
    * class as [[graft.ops.Similarity.lshTopK]]'s, and a real pHash
    * banding has the same property.
    *
    * Scale: checksum collapse is one keyed groupBy; the pair join
    * shuffles on the band key (never all-pairs); verify cost is
    * candidate-bounded. Output: (doc_a, doc_b, dist), doc_a < doc_b,
    * dist ≤ maxDist rounded at 6 (the L2 fold runs in dimension order on
    * both engines). */
  def mediaNearDupPairs(docs: DataFrame, idCol: String, textCol: String,
                        lenBand: Int = 16, maxDist: Double = 5.0): DataFrame = {
    val e = enrich(docs, idCol, textCol)
      .select(col(idCol).as("doc_id"), col("meta.checksum").as("checksum"),
        col("features"))
    val reps = e.groupBy(col("checksum")).agg(min(col("doc_id")).as("doc_id"))
    val f = e.join(reps, Seq("checksum", "doc_id"), "left_semi")
      .withColumn("band", concat_ws(":",
        floor(element_at(col("features"), 1) / lit(lenBand.toDouble)).cast("long"),
        element_at(col("features"), 2).cast("long"),
        element_at(col("features"), 3).cast("long")))
    val l = f.select(col("doc_id").as("doc_a"), col("features").as("fa"),
      col("band"))
    val r = f.select(col("doc_id").as("doc_b"), col("features").as("fb"),
      col("band"))
    l.join(r, Seq("band"))
      .where(col("doc_a") < col("doc_b"))
      .withColumn("dist", sqrt(aggregate(
        zip_with(col("fa"), col("fb"), (x, y) => (x - y) * (x - y)),
        lit(0.0), (acc, v) => acc + v)))
      .where(col("dist") <= maxDist)
      .select(col("doc_a"), col("doc_b"), round(col("dist"), 6).as("dist"))
  }
}
