package graft

import org.apache.spark.sql.functions._
import graft.ops.Multimodal
import graft.ops.Multimodal.MediaRow

/** Round-13 gates: progressive-JPEG (SOF2) geometry parity with SOF0. */
class Round13OpsSpec extends SparkSpec {

  test("X4 JpegCodec: SOF2 (progressive) geometry parses identically to SOF0") {
    import spark.implicits._
    val df = spark.range(2).select(col("id").as("doc_id"),
      Multimodal.syntheticJpeg(lit(641), lit(479), lit("scan".getBytes),
        progressive = col("id") === 1).as("media"))
    val out = Multimodal.decodeJpeg(df.as[MediaRow]).collect().sortBy(_.doc_id)
    val Array(base, prog) = out
    assert(base.sof_type == "baseline" && prog.sof_type == "progressive")
    // identical frame-header layout ⇒ identical geometry fields
    assert(prog.width == base.width && base.width == 641)
    assert(prog.height == base.height && base.height == 479)
    assert(prog.n_components == 3 && prog.subsampling == "4:2:0")
    assert(prog.n_bytes == base.n_bytes)
  }

  test("X4 JpegCodec: SOF2 acceptance does not loosen the other rejections") {
    import spark.implicits._
    val prog = spark.range(1).select(lit(9L).as("doc_id"),
        Multimodal.syntheticJpeg(lit(8), lit(8), lit(Array.emptyByteArray),
          progressive = lit(true)).as("media"))
      .as[MediaRow].collect().head.media
    val codec = new Multimodal.JpegCodec()
    // truncating the SOF2 segment still throws
    intercept[IllegalArgumentException] {
      codec.decode(MediaRow(1L, prog.dropRight(12)))
    }
    // lossless SOF3 still unsupported
    val sof3 = prog.clone(); sof3(prog.length - 19 + 1) = 0xc3.toByte
    val e = intercept[IllegalArgumentException] { codec.decode(MediaRow(2L, sof3)) }
    assert(e.getMessage.contains("unsupported SOF"))
  }

  test("X2 pcaTopK: recovers a planted rank-2 structure (deflation correctness)") {
    import spark.implicits._
    val dir1 = Array(2.0, 1.0, 0.0, 0.0).map(_ / math.sqrt(5.0))
    val dir2 = Array(0.0, 0.0, 1.0, 2.0).map(_ / math.sqrt(5.0))
    // a on an i%7 grid, b on an i%5 grid over 35 points: exactly
    // independent, zero-mean, Var(a) >> Var(b) — a clean eigengap
    val pts = (0 until 35).map { i =>
      val a = (i % 7 - 3) * 2.0
      val b = ((i * 3) % 5 - 2) * 0.5
      (i.toLong, Array.tabulate(4)(d => a * dir1(d) + b * dir2(d)))
    }
    val emb = pts.toDF("vec_id", "embedding")
    val comps = ops.Similarity.pcaTopK(emb, "embedding", dim = 4, k = 2, iters = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1).toInt,
        r.getDouble(2), r.getDouble(3)))
    val v1 = comps.filter(_._1 == 1L).sortBy(_._2).map(_._3)
    val v2 = comps.filter(_._1 == 2L).sortBy(_._2).map(_._3)
    def dot(x: Array[Double], y: Array[Double]) =
      x.zip(y).map { case (p, q) => p * q }.sum
    assert(math.abs(math.abs(dot(v1, dir1)) - 1.0) < 1e-3,
      s"comp1 must align with the dominant direction: ${v1.toSeq}")
    assert(math.abs(math.abs(dot(v2, dir2)) - 1.0) < 1e-3,
      s"comp2 must align with the deflated direction: ${v2.toSeq}")
    assert(math.abs(dot(v1, v2)) < 1e-3, "components must be orthogonal")
    val l1 = comps.find(_._1 == 1L).get._4
    val l2 = comps.find(_._1 == 2L).get._4
    assert(l1 > l2 && l2 > 0, s"eigenvalues must be ordered: $l1, $l2")

    // projection: points lie exactly in span(dir1, dir2) → residual ~ 0,
    // comp-1 scores reproduce the planted coefficient a (up to sign)
    val compDf = ops.Similarity.pcaTopK(emb, "embedding", dim = 4, k = 2, iters = 8)
    val proj = ops.Similarity.pcaProjectTopK(emb, "vec_id", "embedding", compDf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
    assert(proj.forall { case (_, _, _, _, res) => math.abs(res) < 1e-3 },
      "rank-2 data must have ~zero residual after a 2-component projection")
    val sign = math.signum(dot(v1, dir1))
    proj.filter(_._2 == 1L).foreach { case (id, _, score, _, _) =>
      val a = (id % 7 - 3) * 2.0
      assert(math.abs(score - sign * a) < 1e-2, s"score($id)=$score vs a=$a")
    }
    // whitening: white = score/√λ per component, and the whitened
    // coordinates have ~unit sample variance (the point of whitening)
    val lams = comps.groupBy(_._1).map { case (c, rs) => (c, rs.head._4) }
    proj.foreach { case (_, c, score, white, _) =>
      assert(math.abs(white - score / math.sqrt(lams(c))) < 2e-6,
        s"white must be score/sqrt(eigenvalue) (comp $c)")
    }
    Seq(1L, 2L).foreach { c =>
      val ws = proj.filter(_._2 == c).map(_._4)
      val varW = ws.map(w => w * w).sum / ws.length
      assert(math.abs(varW - 1.0) < 0.05,
        s"whitened comp $c variance $varW must be ~1")
    }
  }

  test("X2 pcaTopK: fail-loud guards (dim cap, rank deficiency)") {
    import spark.implicits._
    val emb = Seq((1L, Array(0.0, 0.0)), (2L, Array(0.0, 0.0)))
      .toDF("vec_id", "embedding")
    // constant data → zero covariance → rank-deficient
    intercept[IllegalArgumentException] {
      ops.Similarity.pcaTopK(emb, "embedding", dim = 2, k = 1)
    }
    intercept[IllegalArgumentException] {
      ops.Similarity.pcaTopK(emb, "embedding", dim = 5000, k = 1)
    }
  }

  test("X4 ExifCodec: dual-endian TIFF parse, transposing orientations, defaults, rejections") {
    import spark.implicits._
    // LE and BE payloads carrying the same logical fields must decode
    // identically except for the reported byte order
    val df = spark.range(2).select(col("id").as("doc_id"),
      Multimodal.syntheticExifJpeg(lit(641), lit(479), lit(6),
        littleEndian = col("id") === 0, payload = lit("scan".getBytes)).as("media"))
    val out = Multimodal.decodeExif(df.as[MediaRow]).collect().sortBy(_.doc_id)
    val Array(le, be) = out
    assert(le.byte_order == "II" && be.byte_order == "MM")
    Seq(le, be).foreach { d =>
      assert(d.width == 641 && d.height == 479 && d.orientation == 6)
      // orientation 6 = rotate 90° CW: the raster transposes
      assert(d.effective_w == 479 && d.effective_h == 641)
    }
    // orientation ≤ 4: no transpose
    val up = spark.range(1).select(lit(1L).as("doc_id"),
        Multimodal.syntheticExifJpeg(lit(10), lit(20), lit(3),
          littleEndian = lit(true), payload = lit(Array.emptyByteArray)).as("media"))
      .as[MediaRow]
    val u = Multimodal.decodeExif(up).collect().head
    assert(u.orientation == 3 && u.effective_w == 10 && u.effective_h == 20)
    // a plain JPEG without APP1 defaults to orientation 1 (the EXIF default)
    val plain = spark.range(1).select(lit(2L).as("doc_id"),
        Multimodal.syntheticJpeg(lit(8), lit(8), lit(Array.emptyByteArray)).as("media"))
      .as[MediaRow]
    val p = Multimodal.decodeExif(plain).collect().head
    assert(p.orientation == 1 && p.byte_order == "none" && p.effective_w == 8)
    // malformed TIFF fails loud: corrupt the byte-order mark
    val base = spark.range(1).select(lit(3L).as("doc_id"),
        Multimodal.syntheticExifJpeg(lit(8), lit(8), lit(1),
          littleEndian = lit(true), payload = lit(Array.emptyByteArray)).as("media"))
      .as[MediaRow].collect().head.media
    val codec = new Multimodal.ExifCodec()
    // TIFF header at byte 12: SOI(2) + APP1 marker+len(4) + "Exif\0\0"(6)
    val badBom = base.clone(); badBom(12) = 'Z'.toByte
    val e = intercept[IllegalArgumentException] { codec.decode(MediaRow(4L, badBom)) }
    assert(e.getMessage.contains("byte-order"))
    // IFD offset pointing past the segment fails loud, not misreads
    val badOff = base.clone(); badOff(12 + 4) = 0x7f.toByte
    val e2 = intercept[IllegalArgumentException] { codec.decode(MediaRow(5L, badOff)) }
    assert(e2.getMessage.contains("past APP1"))
  }

  test("X4 WavCodec: RIFF chunk walk, fmt equations, duration math, rejections") {
    import spark.implicits._
    val df = spark.range(1).select(lit(7L).as("doc_id"),
      Multimodal.syntheticWav(lit(16000), lit(2), lit(16),
        lit(("ab" * 100).getBytes)).as("media")) // 200 bytes = 50 frames
    val d = Multimodal.decodeWav(df.as[MediaRow]).collect().head
    assert(d.sample_rate == 16000 && d.channels == 2 && d.bits_per_sample == 16)
    assert(d.n_frames == 50L) // 200 / (2ch · 2B)
    assert(d.duration_us == 50L * 1000000L / 16000L)

    val base = spark.range(1).select(lit(1L).as("doc_id"),
        Multimodal.syntheticWav(lit(8000), lit(1), lit(8),
          lit("abcd".getBytes)).as("media"))
      .as[MediaRow].collect().head.media
    val codec = new Multimodal.WavCodec()
    // sanity: the LIST chunk really sits between fmt and data (walk gate)
    assert(new String(base, 36, 4, "US-ASCII") == "LIST")
    intercept[IllegalArgumentException] { codec.decode(MediaRow(1L, "RIFX junk bytes".getBytes)) }
    intercept[IllegalArgumentException] { codec.decode(MediaRow(2L, base.dropRight(3))) }
    // inconsistent byte-rate equation fails loud (byte 28 = byteRate LSB)
    val lying = base.clone(); lying(28) = (lying(28) ^ 0x01).toByte
    val e = intercept[IllegalArgumentException] { codec.decode(MediaRow(3L, lying)) }
    assert(e.getMessage.contains("inconsistent fmt"))
    // an unsupported format tag fails loud (byte 20 = audio format LSB;
    // 2 = ADPCM — r14 widened the envelope to float/extensible, so the
    // rejection case moves off tag 3)
    val nonPcm = base.clone(); nonPcm(20) = 2
    val e2 = intercept[IllegalArgumentException] { codec.decode(MediaRow(4L, nonPcm)) }
    assert(e2.getMessage.contains("unsupported format tag"))
  }

  test("X4 Mp4Codec: BE box walk, moov recursion, duration math, rejections") {
    import spark.implicits._
    val df = spark.range(1).select(lit(5L).as("doc_id"),
      Multimodal.syntheticMp4(lit(90000L), lit(123456L),
        lit("framedata".getBytes)).as("media"))
    val d = Multimodal.decodeMp4(df.as[MediaRow]).collect().head
    assert(d.timescale == 90000L && d.duration_ticks == 123456L)
    assert(d.duration_us == 123456L * 1000000L / 90000L)
    assert(d.n_boxes == 4 && d.mdat_bytes == 9L) // ftyp, free, moov, mdat

    val base = spark.range(1).select(lit(1L).as("doc_id"),
        Multimodal.syntheticMp4(lit(600L), lit(600L),
          lit(Array.emptyByteArray)).as("media"))
      .as[MediaRow].collect().head.media
    val codec = new Multimodal.Mp4Codec()
    intercept[IllegalArgumentException] { codec.decode(MediaRow(1L, "notanmp4box".getBytes)) }
    intercept[IllegalArgumentException] { codec.decode(MediaRow(2L, base.dropRight(4))) }
    // an mvhd version BEYOND the r14-supported 0/1 rejects rather than
    // misparses (ftyp 16 + free 12 → moov at 28; its mvhd child header
    // at 36, version byte at 44)
    assert(new String(base, 40, 4, "US-ASCII") == "mvhd")
    val v2 = base.clone(); v2(44) = 2
    val e = intercept[IllegalArgumentException] { codec.decode(MediaRow(3L, v2)) }
    assert(e.getMessage.contains("mvhd version"))
    // a size==1 box whose 64-bit largesize field is garbage (here: the
    // old 32-bit size bytes now read as part of the ftyp magic) rejects
    val huge = base.clone(); huge(0) = 0; huge(1) = 0; huge(2) = 0; huge(3) = 1
    val e2 = intercept[IllegalArgumentException] { codec.decode(MediaRow(4L, huge)) }
    assert(e2.getMessage.contains("largesize") || e2.getMessage.contains("bad box size"),
      e2.getMessage)
  }

  test("X4 WavCodec: odd-length chunks advance by the RIFF pad byte") {
    // hand-built WAV with an ODD-length LIST chunk before data: RIFF
    // word alignment inserts a pad byte the walk must skip — the one
    // branch the even-sized builders never exercise
    val data = Array[Byte](1, 2, 3, 4)
    val bb = java.nio.ByteBuffer.allocate(44 + 9 + 1 + data.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + 10 + data.length)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(8000).putInt(8000).putShort(1).putShort(8)
      .put("LIST".getBytes("US-ASCII")).putInt(1).put(7.toByte) // odd chunk
      .put(0.toByte)                                            // pad byte
      .put("data".getBytes("US-ASCII")).putInt(data.length).put(data)
    val d = new ops.Multimodal.WavCodec().decode(
      ops.Multimodal.MediaRow(9L, bb.array()))
    assert(d.n_frames == 4L && d.sample_rate == 8000)
  }

  test("X3 BPE trainers: checked alphabet — digits/punct train, underscore rejects loudly") {
    import spark.implicits._
    import org.apache.spark.sql.{Column, DataFrame}
    val ws: Column => Column = t => filter(split(t, "\\s+"), x => x =!= lit(""))
    val corpus = Seq((1L, "a1! a1! a1! b2? b2?"), (2L, "a1! b2? c#3 c#3"))
      .toDF("doc_id", "text")
    def table(df: DataFrame) =
      df.as[(Long, String, String, String, Long)].collect().sortBy(_._1).toSeq
    val dist = table(ops.TextOps.bpeMerges(corpus, "doc_id", "text",
      merges = 4, wordsOf = ws))
    val local = table(ops.TextOps.bpeMergesLocal(corpus, "doc_id", "text",
      merges = 4, wordsOf = ws))
    assert(dist == local && dist.nonEmpty,
      s"trainers must agree on a digit/punct alphabet\n$dist\nvs\n$local")
    assert(dist.exists(m => (m._2 + m._3).exists(c => !c.isLetter)),
      "digit/punct symbols must actually participate in merges")
    // a word containing the `_` encoding bracket → loud reject, both trainers
    val bad = Seq((1L, "foo_bar foo_bar")).toDF("doc_id", "text")
    intercept[Exception] {
      ops.TextOps.bpeMerges(bad, "doc_id", "text", merges = 1, wordsOf = ws)
        .collect()
    }
    intercept[IllegalArgumentException] {
      ops.TextOps.bpeMergesLocal(bad, "doc_id", "text", merges = 1, wordsOf = ws)
    }
    // the default tokens() path strips non-letters up front (its documented
    // extraction), so what reaches the trainer is in-alphabet and trains
    assert(table(ops.TextOps.bpeMerges(bad, "doc_id", "text", merges = 1)).nonEmpty)
  }

  test("X3 bpeMergesBytes: byte-level merges on multi-byte UTF-8, ASCII parity with the char trainer") {
    import spark.implicits._
    // "éé" = c3 a9 c3 a9; pairs: (c3,a9) w=2·3=6, (a9,c3) w=3
    val utf8 = Seq((1L, "éé éé éé")).toDF("doc_id", "text")
    val m = ops.TextOps.bpeMergesBytes(utf8, "doc_id", "text", merges = 2)
      .as[(Long, String, String, String, Long)].collect().sortBy(_._1).toSeq
    assert(m == Seq(
      (1L, "c3", "a9", "c3a9", 6L),       // the é code point fuses first
      (2L, "c3a9", "c3a9", "c3a9c3a9", 3L) // then the full word
    ), s"got $m")

    // ASCII corpus: byte-level table ≡ char-level table, hex-encoded
    val ascii = Seq((1L, "the the cat"), (2L, "the cat sat")).toDF("doc_id", "text")
    def hexed(s: String) =
      s.getBytes("UTF-8").map(b => f"${b & 0xff}%02x").mkString
    val chars = ops.TextOps.bpeMergesLocal(ascii, "doc_id", "text", merges = 4)
      .as[(Long, String, String, String, Long)].collect().sortBy(_._1)
      .map(t => (t._1, hexed(t._2), hexed(t._3), hexed(t._4), t._5)).toSeq
    val bytes = ops.TextOps.bpeMergesBytes(ascii, "doc_id", "text", merges = 4,
        wordsOf = ops.TextOps.tokens)
      .as[(Long, String, String, String, Long)].collect().sortBy(_._1).toSeq
    assert(bytes == chars, s"byte and char trainers must agree on ASCII\n$bytes\nvs\n$chars")

    // the open alphabet needs no contract: underscores and digits train
    val open = Seq((1L, "a_1 a_1 b_2")).toDF("doc_id", "text")
    val om = ops.TextOps.bpeMergesBytes(open, "doc_id", "text", merges = 1)
      .as[(Long, String, String, String, Long)].collect().toSeq
    // ties at weight 2: ('a','_') vs ('_','1') — byte order 0x5f < 0x61
    // breaks toward ('_','1'), proving the hex tie-break IS byte order
    assert(om == Seq((1L, "5f", "31", "5f31", 2L)), s"got $om")
  }

  test("cdcLatestState: NULL event_type is not a delete marker (null-proof membership)") {
    import spark.implicits._
    import java.sql.Timestamp
    val ev = Seq(
      (1L, 10L, Timestamp.valueOf("2024-01-01 00:00:01"), "click", 1.0),
      (1L, 11L, Timestamp.valueOf("2024-01-01 00:00:02"), null: String, 2.0),
      (2L, 20L, Timestamp.valueOf("2024-01-01 00:00:03"), "error", 3.0)
    ).toDF("user_id", "event_id", "ts", "event_type", "value")
    val out = streaming.StreamingOps.cdcLatestState(ev)
      .select("user_id", "last_event_id").as[(Long, Long)].collect().toMap
    // user 1's latest row has a NULL type → kept (NULL is not 'error');
    // user 2's latest IS 'error' → dropped
    assert(out == Map(1L -> 11L))
  }

  test("domainCap: NULL domain survives the blocklist (anti-join ≡ COALESCE(NOT IN, TRUE))") {
    import spark.implicits._
    val docs = Seq(
      (1L, "https://good.example.com/p/1", 0.9),
      (2L, null: String, 0.8), // null url → null domain
      (3L, "https://bad.example.com/p/3", 0.7)
    ).toDF("doc_id", "url", "quality")
    val blocked = Seq("bad.example.com").toDF("domain")
    val kept = ops.TextOps.domainCap(docs, "url",
        Seq(col("quality").desc, col("doc_id").asc),
        maxPerDomain = 10, blocklist = blocked)
      .select("doc_id").as[Long].collect().toSet
    // blocklists are deny-lists: an unparseable (NULL) domain is not on
    // the list, so it must be kept — identical to the null-proof oracle
    assert(kept == Set(1L, 2L))
  }
}
