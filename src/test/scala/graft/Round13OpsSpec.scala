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
