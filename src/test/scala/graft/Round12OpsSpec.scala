package graft

import org.apache.spark.sql.functions._
import graft.ops.Multimodal
import graft.ops.Multimodal.MediaRow

/** Round-12 gates: the full PNG pixel codec (build → decompress →
  * defilter round-trip plus the corruption rejections its scaladoc
  * promises) and the baseline-JPEG header codec. */
class Round12OpsSpec extends SparkSpec {

  /** Deterministic RGB fixture — w×h, bytes cycle a non-trivial pattern
    * so every filter inverse sees varied neighbor deltas. */
  private def rgb(w: Int, h: Int, seed: Long): Array[Byte] =
    Array.tabulate(w * h * 3)(i => ((seed * 31 + i.toLong * 7) % 256).toByte)

  test("X4 buildFullPng → PngPixelCodec: exact pixel round-trip over all five filters") {
    // h = 9 ⇒ scanlines exercise filter types 0,1,2,3,4 (y % 5) twice
    val (w, h) = (7, 9)
    val src = rgb(w, h, seed = 42L)
    val png = Multimodal.buildFullPng(w, h, src)
    val (dw, dh, pix) = new Multimodal.PngPixelCodec().decodeRaw(MediaRow(1L, png))
    assert(dw == w && dh == h)
    assert(pix.sameElements(src)) // byte-exact: inflate + every defilter correct
  }

  test("X4 PngPixelCodec: corrupted IDAT byte fails CRC validation") {
    val png = Multimodal.buildFullPng(5, 6, rgb(5, 6, seed = 3L))
    // locate the first IDAT chunk and flip one data byte inside it
    def be32(b: Array[Byte], off: Int): Int =
      ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
        ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)
    var off = 8
    while (new String(png, off + 4, 4, "US-ASCII") != "IDAT")
      off += 12 + be32(png, off)
    val corrupt = png.clone()
    corrupt(off + 8) = (corrupt(off + 8) ^ 0x5a).toByte
    val e = intercept[IllegalArgumentException] {
      new Multimodal.PngPixelCodec().decodeRaw(MediaRow(2L, corrupt))
    }
    assert(e.getMessage.contains("CRC mismatch"))
  }

  test("X4 PngPixelCodec: truncated chunk rejected, not guessed") {
    val png = Multimodal.buildFullPng(4, 5, rgb(4, 5, seed = 9L))
    intercept[IllegalArgumentException] {
      new Multimodal.PngPixelCodec().decodeRaw(MediaRow(3L, png.dropRight(6)))
    }
    // non-PNG payload
    intercept[IllegalArgumentException] {
      new Multimodal.PngPixelCodec().decodeRaw(MediaRow(4L, "BMnope".getBytes))
    }
  }

  test("X4 decodePngPixels: dataset-level stats match a hand fold; one codec per partition") {
    import spark.implicits._
    val before = Multimodal.PngPixelCodec.constructions.get()
    val rows = (0L until 8L).map { id =>
      val w = (id % 4 + 2).toInt; val h = (id % 5 + 5).toInt
      MediaRow(id, Multimodal.buildFullPng(w, h, rgb(w, h, seed = id)))
    }
    val out = Multimodal.decodePngPixels(
      spark.createDataset(rows).repartition(2)).collect().sortBy(_.doc_id)
    assert(out.length == 8)
    out.foreach { p =>
      val w = (p.doc_id % 4 + 2).toInt; val h = (p.doc_id % 5 + 5).toInt
      val src = rgb(w, h, p.doc_id)
      val r = src.indices.filter(_ % 3 == 0).map(src(_) & 0xff)
      assert(p.n_pixels == w.toLong * h)
      assert(p.mean_r == r.map(_.toLong).sum.toDouble / (w * h))
      assert(p.max_byte == src.map(_ & 0xff).max.toLong)
    }
    assert(Multimodal.PngPixelCodec.constructions.get() - before == 2L)
  }

  test("X4 JpegCodec: walks APP0+COM by length, parses BE16 SOF0 dims + 4:2:0") {
    import spark.implicits._
    val df = spark.range(1).select(lit(11L).as("doc_id"),
      Multimodal.syntheticJpeg(lit(641), lit(479), lit("scan".getBytes)).as("media"))
    val d = Multimodal.decodeJpeg(df.as[MediaRow]).collect().head
    assert(d.width == 641 && d.height == 479)
    assert(d.n_components == 3 && d.subsampling == "4:2:0")
    assert(d.sof_type == "baseline")
    assert(d.n_bytes == 48L + 4) // 2 SOI + 18 APP0 + 9 COM + 19 SOF0 + payload
  }

  test("X3 bpeMergesLocal equals distributed bpeMerges on the real corpus (k=6)") {
    val docs = sources.Tables.documents(spark, sf001)
    def table(df: org.apache.spark.sql.DataFrame): Seq[(Long, String, String, String, Long)] = {
      import spark.implicits._
      df.as[(Long, String, String, String, Long)].collect().sortBy(_._1).toSeq
    }
    val dist = table(ops.TextOps.bpeMerges(docs, "doc_id", "text", merges = 6))
    val local = table(ops.TextOps.bpeMergesLocal(docs, "doc_id", "text", merges = 6))
    assert(local == dist, s"driver-resident loop must replicate the distributed merges\n$local\nvs\n$dist")
  }

  test("X3 bpeMergesLocal equals bpeMerges on a vocabulary-rich corpus, and drains like it") {
    import spark.implicits._
    // 40 docs x 6 words from a derived 200-type universe: overlapping
    // merges, ties, and multi-char symbols all occur within k=8
    val rich = (0L until 40L).map { id =>
      (id, (0 until 6).map(j => ((id * 7 + j * 13) % 200).toInt)
        .map(n => ('a' + n % 26).toChar.toString * (1 + n % 4)).mkString(" "))
    }.toDF("doc_id", "text")
    def table(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, String, String, String, Long)].collect().sortBy(_._1).toSeq
    val dist = table(ops.TextOps.bpeMerges(rich, "doc_id", "text", merges = 8))
    val local = table(ops.TextOps.bpeMergesLocal(rich, "doc_id", "text", merges = 8))
    assert(local == dist)
    // drain parity: a tiny corpus runs out of pairs before k; both stop
    val tiny = Seq((1L, "ab ab"), (2L, "ab")).toDF("doc_id", "text")
    val dTiny = table(ops.TextOps.bpeMerges(tiny, "doc_id", "text", merges = 5))
    val lTiny = table(ops.TextOps.bpeMergesLocal(tiny, "doc_id", "text", merges = 5))
    assert(lTiny == dTiny && lTiny.length < 5, s"drained tables must agree: $lTiny vs $dTiny")
    // bounded-vocab contract fails loud
    intercept[IllegalArgumentException] {
      ops.TextOps.bpeMergesLocal(rich, "doc_id", "text", merges = 2, maxVocab = 3)
    }
  }

  test("X4 JpegCodec: rejects non-JPEG, truncation, SOS-before-SOF0, extended SOF1") {
    val base = {
      import spark.implicits._
      spark.range(1).select(lit(1L).as("doc_id"),
          Multimodal.syntheticJpeg(lit(8), lit(8), lit(Array.emptyByteArray)).as("media"))
        .as[MediaRow].collect().head.media
    }
    val codec = new Multimodal.JpegCodec()
    intercept[IllegalArgumentException] { codec.decode(MediaRow(1L, "notjpeg".getBytes)) }
    intercept[IllegalArgumentException] { codec.decode(MediaRow(2L, base.dropRight(12))) }
    // SOS (FFDA) where SOF0 sits → fail loud
    val sos = base.clone(); sos(base.length - 19 + 1) = 0xda.toByte
    intercept[IllegalArgumentException] { codec.decode(MediaRow(3L, sos)) }
    // extended-sequential SOF1 → unsupported, not misparsed (SOF2 is
    // accepted for geometry since r13 — see Round13OpsSpec)
    val sof1 = base.clone(); sof1(base.length - 19 + 1) = 0xc1.toByte
    val e = intercept[IllegalArgumentException] { codec.decode(MediaRow(4L, sof1)) }
    assert(e.getMessage.contains("unsupported SOF"))
    // ITU T.81 fill bytes: extra 0xFF padding before a marker is legal
    val filled = base.take(2) ++ Array(0xff.toByte, 0xff.toByte) ++ base.drop(2)
    val d = codec.decode(MediaRow(5L, filled))
    assert(d.width == 8 && d.height == 8 && d.subsampling == "4:2:0")
  }

  test("X4 syntheticJpeg: dimensions past the 16-bit SOF0 field fail loud, not truncate") {
    import spark.implicits._
    val df = spark.range(1).select(lit(1L).as("doc_id"),
      Multimodal.syntheticJpeg(lit(65536), lit(8), lit(Array.emptyByteArray)).as("media"))
    val e = intercept[Exception] { df.as[MediaRow].collect() }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("16-bit SOF0")), s"got: ${messages(e)}")
  }
}
