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
}
