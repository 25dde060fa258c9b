package graft

import org.apache.spark.sql.functions._
import graft.ops.{Multimodal, Similarity}
import graft.ops.Multimodal.MediaRow

/** Round-14 gates: pcaTopK deterministic restart on start-vector
  * annihilation, ExifCodec SOF-range rejection, compactAnnIndex
  * non-numeric partition tolerance. */
class Round14OpsSpec extends SparkSpec {

  test("X2 pcaTopK: restarts deterministically when v0=1⃗ is annihilated") {
    import spark.implicits._
    // every point is t·(1,−1): covariance = Var(t)·[[1,−1],[−1,1]], so
    // A·1⃗ = 0 exactly — the all-ones start dies on the FIRST matvec and
    // the op must fall back to a basis start instead of failing
    val pts = (0 until 7).map { i =>
      val t = (i - 3).toDouble
      (i.toLong, Array(t, -t))
    }
    val emb = pts.toDF("vec_id", "embedding")
    val comps = Similarity.pcaTopK(emb, "embedding", dim = 2, k = 1, iters = 4)
      .collect().map(r => (r.getLong(1).toInt, r.getDouble(2), r.getDouble(3)))
      .sortBy(_._1)
    val v = comps.map(_._2)
    val lam = comps.head._3
    // dominant eigenvector is ±(1,−1)/√2 with eigenvalue 2·Var(t)
    assert(math.abs(math.abs(v(0)) - math.sqrt(0.5)) < 1e-5, v.toSeq.toString)
    assert(math.abs(v(0) + v(1)) < 1e-5, v.toSeq.toString)
    val varT = pts.map(p => p._2(0) * p._2(0)).sum / 7.0
    assert(math.abs(lam - 2.0 * varT) < 1e-4, s"lam=$lam varT=$varT")
  }

  test("X2 pcaTopK: a genuinely zero covariance still fails loud") {
    import spark.implicits._
    val emb = (0 until 5).map(i => (i.toLong, Array(3.0, 7.0)))
      .toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      Similarity.pcaTopK(emb, "embedding", dim = 2, k = 1, iters = 2)
    }
    assert(e.getMessage.contains("rank-deficient"), e.getMessage)
  }

  test("X4 ExifCodec: rejects unsupported SOF variants like JpegCodec") {
    import spark.implicits._
    val bytes = spark.range(1).select(lit(5L).as("doc_id"),
        Multimodal.syntheticExifJpeg(lit(10), lit(20), lit(3),
          littleEndian = lit(true),
          payload = lit(Array.emptyByteArray)).as("media"))
      .as[MediaRow].collect().head.media
    val codec = new Multimodal.ExifCodec()
    // sanity: the unmodified payload decodes
    assert(codec.decode(MediaRow(5L, bytes)).orientation == 3)
    // locate the SOF0 marker and flip it to SOF3 (lossless) — the codec
    // must throw "unsupported SOF", not skip it and report "no frame
    // header" (or worse, geometry from a later header)
    val sofAt = (0 until bytes.length - 1).find(i =>
      (bytes(i) & 0xff) == 0xff && (bytes(i + 1) & 0xff) == 0xc0).get
    val sof3 = bytes.clone(); sof3(sofAt + 1) = 0xc3.toByte
    val e = intercept[IllegalArgumentException] {
      codec.decode(MediaRow(6L, sof3))
    }
    assert(e.getMessage.contains("unsupported SOF"), e.getMessage)
  }

  test("X3 bpeApplyBytes: char-path parity on a pure-ASCII corpus") {
    import spark.implicits._
    import graft.ops.TextOps
    val docs = Seq(
      (1L, "the cat the hat the mat"),
      (2L, "that cat sat on the hat"),
      (3L, "a rat and a bat chat")).toDF("doc_id", "text")
    val charTable = TextOps.bpeMergesLocal(docs, "doc_id", "text", merges = 4)
    val byteTable = TextOps.bpeMergesBytes(docs, "doc_id", "text", merges = 4,
      wordsOf = TextOps.tokens)
    val charOut = TextOps.bpeApply(docs, "doc_id", "text", charTable, k = 4)
      .orderBy("doc_id").collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val byteOut = TextOps.bpeApplyBytes(docs, "doc_id", "text", byteTable,
        k = 4, wordsOf = TextOps.tokens)
      .orderBy("doc_id").collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // the hex rendering is a bijection of the char encoding on ASCII, so
    // counts and compression must agree row-for-row
    assert(byteOut.toSeq == charOut.toSeq,
      s"byte=${byteOut.toSeq} char=${charOut.toSeq}")
  }

  test("X3 bpeApplyBytes: multi-byte UTF-8 fuses as trained (é = c3+a9)") {
    import spark.implicits._
    import graft.ops.TextOps
    // "éé" = bytes c3 a9 c3 a9 → dominant pair (c3, a9), weight 2/word
    val docs = Seq((1L, "éé éé éé"), (2L, "éé")).toDF("doc_id", "text")
    val table = TextOps.bpeMergesBytes(docs, "doc_id", "text", merges = 1)
    val m = table.collect().map(r => (r.getString(1), r.getString(2), r.getString(3)))
    assert(m.toSeq == Seq(("c3", "a9", "c3a9")), m.toSeq.toString)
    val out = TextOps.bpeApplyBytes(docs, "doc_id", "text", table, k = 1)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // per doc: every é collapses 2 byte symbols → 1 trained symbol
    assert(out.toSeq == Seq((1L, 12L, 6L, 2.0), (2L, 4L, 2L, 2.0)),
      out.toSeq.toString)
  }

  test("X4 Mp4Codec: mvhd v0/v1 parity, 64-bit duration, largesize mdat") {
    import spark.implicits._
    def build(ticks: Long, v1: Boolean, large: Boolean) =
      spark.range(1).select(lit(1L).as("doc_id"),
          Multimodal.syntheticMp4(lit(90000L), lit(ticks),
            lit("payload".getBytes), mvhdV1 = lit(v1),
            largesizeMdat = lit(large)).as("media"))
        .as[MediaRow].collect().head
    val codec = new Multimodal.Mp4Codec()
    // same ticks → identical decode regardless of mvhd version
    val v0 = codec.decode(build(123456L, v1 = false, large = false))
    val v1 = codec.decode(build(123456L, v1 = true, large = false))
    assert(v0.copy(doc_id = 0L) == v1.copy(doc_id = 0L), s"$v0 vs $v1")
    // a duration only 64 bits can hold parses exactly
    val wide = codec.decode(build((1L << 32) + 7L, v1 = true, large = false))
    assert(wide.duration_ticks == (1L << 32) + 7L)
    assert(wide.duration_us == ((1L << 32) + 7L) * 1000000L / 90000L)
    // largesize mdat: payload length reported net of the 16-byte header
    val ls = codec.decode(build(600L, v1 = true, large = true))
    assert(ls.mdat_bytes == "payload".getBytes.length.toLong, ls.toString)
    assert(ls.n_boxes == 4)
    // an mvhd version beyond 1 still throws: patch the version byte
    val raw = build(600L, v1 = true, large = false).media
    val vAt = (0 until raw.length - 8).find(i =>
      new String(raw, i, 4, "US-ASCII") == "mvhd").get + 4
    val bad = raw.clone(); bad(vAt) = 2.toByte
    val e = intercept[IllegalArgumentException] {
      codec.decode(MediaRow(2L, bad))
    }
    assert(e.getMessage.contains("mvhd version 2 unsupported"), e.getMessage)
  }

  test("X4 WavCodec: float/extensible forms decode; non-audio GUID throws") {
    import spark.implicits._
    def build(mode: String, bits: Int) =
      spark.range(1).select(lit(1L).as("doc_id"),
          Multimodal.syntheticWav(lit(48000), lit(2), lit(bits),
            lit(("x" * 48).getBytes), lit(mode)).as("media"))
        .as[MediaRow].collect().head
    val codec = new Multimodal.WavCodec()
    val pcm = codec.decode(build("pcm", 16))
    assert(pcm.format == "pcm" && pcm.n_frames == 12 &&
      pcm.duration_us == 12L * 1000000L / 48000L)
    val fl = codec.decode(build("float", 32))
    assert(fl.format == "float" && fl.n_frames == 6)
    val ep = codec.decode(build("ext_pcm", 24))
    assert(ep.format == "ext_pcm" && ep.n_frames == 8)
    val ef = codec.decode(build("ext_float", 64))
    assert(ef.format == "ext_float" && ef.n_frames == 3)
    // float must be 32/64-bit
    val e1 = intercept[IllegalArgumentException] {
      codec.decode(build("float", 16))
    }
    assert(e1.getMessage.contains("IEEE-float WAV must be 32/64-bit"))
    // a corrupted SubFormat GUID tail (non-audio) throws — fmt chunk
    // sits at offset 12, GUID tail at +36 within it
    val raw = build("ext_pcm", 24).media
    val bad = raw.clone(); bad(12 + 36) = 0x55.toByte
    val e2 = intercept[IllegalArgumentException] {
      codec.decode(MediaRow(3L, bad))
    }
    assert(e2.getMessage.contains("non-audio SubFormat GUID"), e2.getMessage)
  }

  test("streaming compactAnnIndex: skips a non-numeric cell partition dir") {
    import spark.implicits._
    val index = java.nio.file.Files.createTempDirectory("graft_annidx").toString
    (0L until 20L).map(i => (i, i % 3)).toDF("pid", "cell")
      .repartition(5).write.partitionBy("cell").mode("overwrite").parquet(index)
    // a layout-foreign directory (what a null cell value would produce)
    val weird = new java.io.File(index, "cell=__HIVE_DEFAULT_PARTITION__")
    assert(weird.mkdir())
    val marker = new java.io.File(weird, "marker.txt")
    java.nio.file.Files.writeString(marker.toPath, "leave me alone")
    val report = graft.streaming.StreamingOps
      .compactAnnIndex(spark, index, maxFilesPerCell = 1)
      .as[(Long, Long, Long, Long)].collect()
    assert(report.map(_._1).toSet == Set(0L, 1L, 2L), report.toSeq.toString)
    assert(report.forall(_._3 == 1L), report.toSeq.toString)
    // the foreign dir is untouched
    assert(weird.isDirectory && marker.isFile &&
      java.nio.file.Files.readString(marker.toPath) == "leave me alone")
  }
}
