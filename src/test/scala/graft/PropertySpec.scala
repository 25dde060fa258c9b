package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.ops._

/** Property-based checks (SURVEY.md §5.3) via scalacheck over the pure
  * recurrence forms — invariants the Spark expressions must encode. */
class PropertySpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  private val smallD = Gen.choose(-100.0, 100.0)

  test("tokenize kernel: maximal alpha runs, lowercase, order-preserving") {
    // arbitrary strings incl. unicode: tokens are exactly the maximal
    // [a-z] runs of the UTF8String-lowercased input, in order
    check(Prop.forAll(Gen.asciiPrintableStr, Gen.alphaStr) { (a, b) =>
      val s = a + "É" + b // force a non-ASCII char through the slow path
      val toks = graft.functions.TextKernels.tokenize(
        org.apache.spark.unsafe.types.UTF8String.fromString(s))
      val lowered = org.apache.spark.unsafe.types.UTF8String.fromString(s)
        .toLowerCase.toString
      val expect = lowered.split("[^a-z]+").filter(_.nonEmpty).toSeq
      toks.toSeq == expect
    })
  }

  test("union-find components equal brute-force reachability on random graphs") {
    val edgeGen = Gen.listOf(Gen.zip(Gen.choose(0L, 15L), Gen.choose(0L, 15L)))
    check(Prop.forAll(edgeGen) { es =>
      es.isEmpty || {
        // brute force: repeated relaxation of min label over edges
        val nodes = es.flatMap(e => Seq(e._1, e._2)).distinct
        var lbl = nodes.map(n => n -> n).toMap
        var changed = true
        while (changed) {
          changed = false
          es.foreach { case (a, bb) =>
            val m = math.min(lbl(a), lbl(bb))
            if (lbl(a) != m) { lbl += a -> m; changed = true }
            if (lbl(bb) != m) { lbl += bb -> m; changed = true }
          }
          // also propagate through labels (transitive min)
          nodes.foreach { n =>
            val m = math.min(lbl(n), lbl(lbl(n)))
            if (lbl(n) != m) { lbl += n -> m; changed = true }
          }
        }
        // driver union-find path (same code the operator uses under the
        // threshold): replicate via the public operator in SparkSpec-less
        // form — here just recompute with a simple union-find
        val parent = scala.collection.mutable.Map[Long, Long]()
        def find(x: Long): Long = {
          var r = x
          while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
          r
        }
        es.foreach { case (a, bb) =>
          val (ra, rb) = (find(a), find(bb))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        nodes.forall(n => find(n) == lbl(n))
      }
    })
  }

  test("greedy packing: every bin's pre-overflow load is under budget") {
    check(Prop.forAll(Gen.nonEmptyListOf(Gen.choose(1L, 400L)), Gen.choose(100, 1000)) {
      (toks, budget) =>
        // bin = floor((cumsum - n) / budget): a doc starts in bin b only if
        // the load before it is < (b+1)*budget, so bins overflow by at most
        // one document
        val cums = toks.scanLeft(0L)(_ + _).tail
        val bins = toks.zip(cums).map { case (n, c) => (c - n) / budget }
        bins.zip(toks.zip(cums)).forall { case (b, (n, c)) =>
          (c - n) < (b + 1) * budget && (c - n) >= b * budget
        }
    })
  }

  test("clamp is idempotent and bounded") {
    check(Prop.forAll(smallD) { x =>
      val c = math.min(math.max(x, 0.0), 1.0)
      c >= 0.0 && c <= 1.0 && math.min(math.max(c, 0.0), 1.0) == c
    })
  }

  test("EMA stays within [min, max] of the series") {
    check(Prop.forAll(Gen.nonEmptyListOf(smallD)) { xs =>
      val ema = xs.tail.foldLeft(xs.head)((s, x) => 0.5 * s + 0.5 * x)
      ema >= xs.min - 1e-9 && ema <= xs.max + 1e-9
    })
  }

  test("discounted cumsum is linear in the input") {
    check(Prop.forAll(Gen.listOfN(5, smallD), Gen.choose(0.0, 1.0)) { (xs, g) =>
      def cumsum(v: Seq[Double]) = v.foldRight(List.empty[Double]) {
        case (x, Nil) => List(x)
        case (x, acc) => (x + g * acc.head) :: acc
      }
      cumsum(xs.map(_ * 2.0)).zip(cumsum(xs))
        .forall { case (a, b) => math.abs(a - 2 * b) < 1e-6 }
    })
  }

  test("soft update moves toward source; fixpoint at equality") {
    check(Prop.forAll(smallD, smallD) { (t, s) =>
      val u = 0.995 * t + 0.005 * s
      math.abs(u - s) <= math.abs(t - s) + 1e-12 &&
        math.abs((0.995 * t + 0.005 * t) - t) < 1e-9
    })
  }

  test("expectile(0.5) equals half MSE for any sample") {
    check(Prop.forAll(Gen.nonEmptyListOf(smallD)) { us =>
      val expectile = us.map(u => math.abs(0.5 - (if (u < 0) 1.0 else 0.0)) * u * u).sum / us.size
      val halfMse = us.map(u => u * u).sum / us.size / 2.0
      math.abs(expectile - halfMse) < 1e-6
    })
  }

  test("BMP/PNG codecs invert JDK-written headers for any dimensions") {
    // independent oracle: java.nio.ByteBuffer writes the int fields
    // (LITTLE_ENDIAN for BMP, BIG_ENDIAN for PNG), the codecs must read
    // them back for ANY positive dimensions — not just the < 256 range
    // the in-plan builders emit
    import java.nio.{ByteBuffer, ByteOrder}
    val dim = Gen.choose(1, Int.MaxValue)
    check(Prop.forAll(dim, dim, Gen.choose(0, 64)) { (w, h, pad) =>
      val bmp = ByteBuffer.allocate(54 + pad).order(ByteOrder.LITTLE_ENDIAN)
      bmp.put('B'.toByte).put('M'.toByte)
      bmp.position(18); bmp.putInt(w); bmp.putInt(h)
      val db = new Multimodal.BmpCodec().decode(Multimodal.MediaRow(1L, bmp.array()))
      val png = ByteBuffer.allocate(33 + pad).order(ByteOrder.BIG_ENDIAN)
      png.put(Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
      png.position(12)
      png.put('I'.toByte).put('H'.toByte).put('D'.toByte).put('R'.toByte)
      png.putInt(w); png.putInt(h)
      val dp = new Multimodal.PngCodec().decode(Multimodal.MediaRow(2L, png.array()))
      db.width == w && db.height == h && db.n_bytes == 54L + pad &&
        dp.width == w && dp.height == h && dp.n_bytes == 33L + pad
    })
  }

  test("minhash universal hash stays in [0, P) for any token id") {
    check(Prop.forAll(Gen.choose(0L, 10000000L), Gen.choose(0, 31)) { (id, j) =>
      val h = (Dedup.minhashA(j) * id + Dedup.minhashB(j)) % Dedup.MinhashP
      h >= 0 && h < Dedup.MinhashP
    })
  }

  test("Count-Min sketch: never undercounts, and merging is partition-invariant") {
    val width = 16
    val agg = new CountMinAggregator(3, width)
    def estimate(sk: Array[Long], t: String): Long =
      (0 until 3).map(j => sk(j * width + CountMin.bucket(CountMin.code(t), j, width))).min
    val tokGen = Gen.nonEmptyListOf(Gen.oneOf(
      "the", "cat", "dog", "spark", "data", "dedup", "corpus", "a", "zz"))
    val splitGen = Gen.choose(0, 1000)
    check(Prop.forAll(Gen.zip(tokGen, splitGen)) { case (toks, cut) =>
      val whole = toks.foldLeft(agg.zero)(agg.reduce)
      val (l, r) = toks.splitAt(cut % (toks.length + 1))
      val merged = agg.merge(
        l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce))
      val exact = toks.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
      java.util.Arrays.equals(whole, merged) &&
        exact.forall { case (t, n) => estimate(whole, t) >= n }
    })
  }

  test("round-robin sharding over descending sizes: counts ≤1 apart, totals ≤ max item apart") {
    // the balance bound Curation.shardManifest documents: assigning
    // shard = rank mod S over (size DESC) order telescopes — shard i's
    // round-j item dominates shard i+1's, so total spread ≤ the single
    // largest item, and counts differ by at most one by construction
    val gen = Gen.zip(Gen.nonEmptyListOf(Gen.choose(0L, 1000L)), Gen.choose(1, 16))
    check(Prop.forAll(gen) { case (sizes, s) =>
      val sorted = sizes.sorted(Ordering[Long].reverse)
      val totals = Array.fill(s)(0L)
      val counts = Array.fill(s)(0L)
      sorted.zipWithIndex.foreach { case (sz, i) =>
        totals(i % s) += sz; counts(i % s) += 1L
      }
      counts.max - counts.min <= 1 && totals.max - totals.min <= sorted.head
    })
  }

  // ---- round-13 codec properties: decode() is pure JVM, so the three
  // new container parsers get spec-derived INDEPENDENT byte builders
  // (java.nio.ByteBuffer, not the production Column builders) — a shared
  // layout bug between builder and codec cannot hide here.

  private def wavBytes(rate: Int, ch: Int, bits: Int, frames: Int): Array[Byte] = {
    val data = Array.tabulate(frames * ch * bits / 8)(i => (i * 37 % 251).toByte)
    val bb = java.nio.ByteBuffer.allocate(44 + data.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + data.length)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(ch.toShort).putInt(rate)
      .putInt(rate * ch * bits / 8).putShort((ch * bits / 8).toShort)
      .putShort(bits.toShort)
      .put("data".getBytes("US-ASCII")).putInt(data.length).put(data)
    bb.array()
  }

  test("WavCodec inverts any spec-valid PCM header (independent builder)") {
    val gen = for {
      rate <- Gen.choose(1, 96000)
      ch <- Gen.choose(1, 8)
      bits <- Gen.oneOf(8, 16, 24, 32)
      frames <- Gen.choose(0, 300)
    } yield (rate, ch, bits, frames)
    check(Prop.forAll(gen) { case (rate, ch, bits, frames) =>
      val d = new Multimodal.WavCodec().decode(
        Multimodal.MediaRow(1L, wavBytes(rate, ch, bits, frames)))
      d.sample_rate == rate && d.channels == ch && d.bits_per_sample == bits &&
        d.n_frames == frames.toLong &&
        d.duration_us == frames.toLong * 1000000L / rate
    })
  }

  private def mp4Bytes(timescale: Int, ticks: Int, payload: Int,
                       frees: Int): Array[Byte] = {
    val mdat = Array.tabulate(payload)(i => (i * 11 % 127).toByte)
    val freeSz = frees * 8
    val bb = java.nio.ByteBuffer.allocate(16 + freeSz + 116 + 8 + mdat.length)
      .order(java.nio.ByteOrder.BIG_ENDIAN)
    bb.putInt(16).put("ftyp".getBytes("US-ASCII"))
      .put("isom".getBytes("US-ASCII")).putInt(0)
    (0 until frees).foreach { _ =>
      bb.putInt(8).put("free".getBytes("US-ASCII")): Unit
    }
    bb.putInt(116).put("moov".getBytes("US-ASCII"))
      .putInt(108).put("mvhd".getBytes("US-ASCII"))
      .putInt(0).putInt(0).putInt(0)            // version/flags, ctime, mtime
      .putInt(timescale).putInt(ticks)
      .putInt(0x00010000).putShort(0x0100.toShort).putShort(0)
      .putLong(0L)                               // reserved
    (0 until 9).foreach(_ => bb.putInt(0): Unit) // matrix (values unchecked)
    (0 until 6).foreach(_ => bb.putInt(0): Unit) // pre_defined
    bb.putInt(2)                                 // next track id
      .putInt(8 + mdat.length).put("mdat".getBytes("US-ASCII")).put(mdat)
    bb.array()
  }

  test("Mp4Codec inverts any v0 mvhd under arbitrary free-box padding (independent builder)") {
    val gen = for {
      ts <- Gen.choose(1, 1000000)
      ticks <- Gen.choose(0, Int.MaxValue)
      payload <- Gen.choose(0, 200)
      frees <- Gen.choose(0, 4)
    } yield (ts, ticks, payload, frees)
    check(Prop.forAll(gen) { case (ts, ticks, payload, frees) =>
      val d = new Multimodal.Mp4Codec().decode(
        Multimodal.MediaRow(1L, mp4Bytes(ts, ticks, payload, frees)))
      d.timescale == ts.toLong && d.duration_ticks == ticks.toLong &&
        d.duration_us == ticks.toLong * 1000000L / ts &&
        d.mdat_bytes == payload.toLong && d.n_boxes == 3 + frees
    })
  }

  private def exifJpegBytes(w: Int, h: Int, orient: Int, le: Boolean): Array[Byte] = {
    val order = if (le) java.nio.ByteOrder.LITTLE_ENDIAN
                else java.nio.ByteOrder.BIG_ENDIAN
    val tiff = java.nio.ByteBuffer.allocate(26).order(order)
    tiff.putShort(if (le) 0x4949.toShort else 0x4D4D.toShort)
      .putShort(42).putInt(8)
      .putShort(1)                          // one IFD entry
      .putShort(0x0112.toShort).putShort(3).putInt(1)
    tiff.putShort(orient.toShort).putShort(0) // SHORT value + pad
    tiff.putInt(0)                          // next IFD
    // NB: the byte-order mark bytes are the same in both orders ("II"/"MM")
    val bb = java.nio.ByteBuffer.allocate(2 + 36 + 19)
      .order(java.nio.ByteOrder.BIG_ENDIAN)
    bb.putShort(0xFFD8.toShort)
      .putShort(0xFFE1.toShort).putShort(34)
      .put("Exif".getBytes("US-ASCII")).putShort(0)
      .put(tiff.array())
      .putShort(0xFFC0.toShort).putShort(17).put(8.toByte)
      .putShort(h.toShort).putShort(w.toShort).put(3.toByte)
      .put(Array[Byte](1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1))
    bb.array()
  }

  test("ExifCodec inverts both endiannesses and applies the 5-8 transpose (independent builder)") {
    val gen = for {
      w <- Gen.choose(1, 0xFFFF)
      h <- Gen.choose(1, 0xFFFF)
      o <- Gen.choose(1, 8)
      le <- Gen.oneOf(true, false)
    } yield (w, h, o, le)
    check(Prop.forAll(gen) { case (w, h, o, le) =>
      val d = new Multimodal.ExifCodec().decode(
        Multimodal.MediaRow(1L, exifJpegBytes(w, h, o, le)))
      val swap = o >= 5
      d.width == w && d.height == h && d.orientation == o &&
        d.byte_order == (if (le) "II" else "MM") &&
        d.effective_w == (if (swap) h else w) &&
        d.effective_h == (if (swap) w else h)
    })
  }
}
