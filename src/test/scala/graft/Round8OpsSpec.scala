package graft

import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Round-8 operator semantics: cache-scope idempotency plus the round's
  * fidelity/robustness fixes. */
class Round8OpsSpec extends SparkSpec {
  import spark.implicits._

  test("DedupCaches.track is idempotent: re-tracking a cached plan neither re-caches nor steals ownership") {
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "s")
    val owner = new ops.DedupCaches
    val first = owner.track(df)
    assert(first.storageLevel != StorageLevel.NONE)
    // a second handle over the SAME frame must not re-register it:
    // unpersistAll on the second handle leaves the owner's cache alive
    val second = new ops.DedupCaches
    second.track(df)
    second.unpersistAll()
    assert(df.storageLevel != StorageLevel.NONE,
      "non-owning handle must not unpersist another scope's cache")
    owner.unpersistAll()
    assert(df.storageLevel == StorageLevel.NONE)
    // unmanaged: same idempotency, plain cache
    val again = ops.DedupCaches.unmanaged.track(df)
    assert(again.storageLevel != StorageLevel.NONE)
    ops.DedupCaches.unmanaged.track(df) // no re-cache warning path
    df.unpersist()
  }

  private def emb = sources.Tables.embeddings(spark, sf001)
  private def docs = sources.Tables.documents(spark, sf001)
  private val centPred = pmod(col("vec_id"), lit(97)) === 3
  private val queryPred = pmod(col("vec_id"), lit(100)) === 0

  test("multi-probe IVF: nprobe=1 reproduces single-probe ivfTopK exactly") {
    val single = ops.Similarity.ivfTopK(emb, "vec_id", "embedding",
      centPred, queryPred, k = 5).collect().toSet
    val probe1 = ops.Similarity.ivfTopKProbe(emb, "vec_id", "embedding",
      centPred, queryPred, k = 5, nprobe = 1).collect().toSet
    assert(probe1 == single)
  }

  test("multi-probe IVF: widening nprobe never lowers recall against exact top-k") {
    val exact = ops.Similarity.bruteForceTopK(emb, "vec_id", "embedding",
      queryPred, k = 5).select(col("query_id"), col("cand_id"))
    def recallHits(nprobe: Int): Long =
      exact.join(
        ops.Similarity.ivfTopKProbe(emb, "vec_id", "embedding",
          centPred, queryPred, k = 5, nprobe = nprobe)
          .select(col("query_id"), col("cand_id")),
        Seq("query_id", "cand_id"), "left_semi").count()
    val h1 = recallHits(1); val h2 = recallHits(2); val h3 = recallHits(3)
    assert(h2 >= h1 && h3 >= h2,
      s"recall hits must be monotone in nprobe: $h1, $h2, $h3")
  }

  test("shard manifest: every doc exactly once; counts differ ≤1; token totals differ ≤ the largest doc") {
    val m = ops.Curation.shardManifest(docs, "doc_id", col("n_chars"), shards = 8)
    val nDocs = docs.count()
    assert(m.count() == nDocs)
    assert(m.select(col("doc_id")).distinct().count() == nDocs)
    val per = m.groupBy(col("shard"))
      .agg(count(lit(1)).as("n"), sum(col("n_tokens")).as("tot"))
      .collect()
    assert(per.length == 8)
    val counts = per.map(_.getAs[Long]("n"))
    assert(counts.max - counts.min <= 1,
      s"doc counts must differ by at most one: ${counts.mkString(",")}")
    val totals = per.map(_.getAs[Long]("tot"))
    val maxDoc = docs.agg(max(col("n_chars"))).head.getLong(0)
    // round-robin over descending sizes telescopes: spread ≤ largest item
    assert(totals.max - totals.min <= maxDoc,
      s"token-total spread ${totals.max - totals.min} exceeds largest doc $maxDoc")
  }

  test("histogram-fold lower medians match the collect-based lowerMedian (odd/even/dups/nulls)") {
    val odd = Seq(5.0, 1.0, 3.0, 3.0, 2.0, -4.0, 7.0).toDF("x")
    val m = ops.AggOps.lowerMediansByHistogram(odd,
      Seq("mx" -> col("x"), "m2" -> (col("x") * 2)))
    val row = m.head()
    assert(row.getAs[Double]("mx") == 3.0) // sorted: -4,1,2,3,3,5,7 → rank 4
    assert(row.getAs[Double]("m2") == 6.0) // shared histogram, second fold
    val even = Seq(4.0, 1.0, 2.0, 3.0).toDF("x") // rank ⌊5/2⌋ = 2 → 2.0
    val a = even.agg(ops.AggOps.lowerMedian(col("x"))).head().getDouble(0)
    val b = ops.AggOps.lowerMediansByHistogram(even, Seq("m" -> col("x")))
      .head().getAs[Double]("m")
    assert(a == b && b == 2.0)
    val withNull = Seq(Some(1.0), None, Some(9.0), Some(5.0)).toDF("x")
    assert(ops.AggOps.lowerMediansByHistogram(withNull, Seq("m" -> col("x")))
      .head().getAs[Double]("m") == 5.0) // nulls ignored: rank 2 of (1,5,9)
    val allNull = Seq[Option[Double]](None, None).toDF("x")
    assert(ops.AggOps.lowerMediansByHistogram(allNull, Seq("m" -> col("x")))
      .head().isNullAt(0))
    // randomized parity with the collect-based form (fixed seed)
    val rnd = new scala.util.Random(8)
    val xs = Seq.fill(257)(rnd.nextInt(40).toDouble / 4.0)
    val rdf = xs.toDF("x")
    val exact = rdf.agg(ops.AggOps.lowerMedian(col("x"))).head().getDouble(0)
    val hist = ops.AggOps.lowerMediansByHistogram(rdf, Seq("m" -> col("x")))
      .head().getAs[Double]("m")
    assert(exact == hist)
  }

  test("epoch shuffle: full permutation per epoch, epochs order differently, seed changes the order") {
    val n = docs.count()
    val e = ops.Curation.epochShuffle(docs, "doc_id", epochs = 3)
    assert(e.count() == 3 * n)
    assert(e.groupBy(col("epoch")).count().collect().forall(_.getLong(1) == n))
    def order(epoch: Int, seed: String = ""): Seq[Long] =
      ops.Curation.epochShuffle(docs, "doc_id", epochs = 3, seed = seed)
        .where(col("epoch") === epoch)
        .orderBy(col("ord"), col("doc_id"))
        .select(col("doc_id")).collect().map(_.getLong(0)).toSeq
    val o0 = order(0); val o1 = order(1)
    assert(o0.sorted == o1.sorted, "each epoch must visit the same corpus")
    assert(o0 != o1, "epochs must not repeat the same order")
    assert(o0 == order(0), "same seed must reproduce the same order")
    assert(o0 != order(0, seed = "alt"), "a different seed must change the order")
  }

  private def transitions(rows: Long, splits: Int = 4) =
    spark.read.format("graft-transitions")
      .option("rows", rows).option("splits", splits).load()

  test("DSv2 generator: closed forms match TransitionGen.value row-for-row") {
    val got = transitions(250).collect()
    assert(got.length == 250)
    val fields = sources.TransitionGen.schema.fieldNames
    got.foreach { r =>
      val i = r.getLong(0)
      fields.zipWithIndex.foreach { case (f, idx) =>
        assert(r.get(idx) == sources.TransitionGen.value(f, i), s"$f($i)")
      }
    }
    // done fires exactly on the 100-step episode boundary
    assert(got.count(_.getDouble(7) == 1.0) == 2)
  }

  test("DSv2 generator: EqualTo pushdown plans a single-row interval; empty ranges plan nothing") {
    val one = transitions(100000).where(col("i") === 4321L)
    assert(one.rdd.getNumPartitions == 1, "a point lookup must plan one split")
    assert(one.select(col("step")).as[Long].head() == 21L)
    assert(transitions(1000).where(col("i") > 5000L).count() == 0)
    assert(transitions(0).count() == 0)
  }

  test("DSv2 generator: limit pushdown truncates the planned interval") {
    val limited = transitions(1000000000L, splits = 8).limit(7)
    assert(limited.count() == 7)
    // the truncation happened at planning time, not post-scan: 7 rows
    // never need 8 splits
    assert(limited.rdd.getNumPartitions <= 7)
  }

  test("DSv2 generator: ungrouped count/min/max answer at planning time — a 2^40-row table in one row") {
    val r = transitions(1L << 40, splits = 8).where(col("i") >= 12345L)
      .agg(count(lit(1)).as("n"), min(col("i")).as("mn"), max(col("i")).as("mx"))
    assert(r.queryExecution.executedPlan.toString.contains("PushedAggregates"),
      "closed-form aggregates must push into the connector")
    val row = r.collect().head
    assert(row.getLong(0) == (1L << 40) - 12345L)
    assert(row.getLong(1) == 12345L)
    assert(row.getLong(2) == (1L << 40) - 1L)
    // empty interval keeps SQL zero-row semantics: count 0, min/max null
    val empty = transitions(100).where(col("i") >= 1000L)
      .agg(count(lit(1)), min(col("i")), max(col("i"))).collect().head
    assert(empty.getLong(0) == 0L && empty.isNullAt(1) && empty.isNullAt(2))
    // aggregates needing row content decline and evaluate post-scan
    val sums = transitions(1000).agg(sum(col("reward")).as("s"))
    assert(!sums.queryExecution.executedPlan.toString.contains("PushedAggregates"))
    assert(math.abs(sums.as[Double].head() - 1000 * 0.5) < 30.0)
  }

  test("DSv2 generator: splits cap at the row count and cover the range exactly once") {
    val df = transitions(5, splits = 32)
    assert(df.rdd.getNumPartitions == 5)
    assert(df.select(col("i")).as[Long].collect().sorted.toSeq == (0L until 5L))
    val wide = transitions(10007, splits = 3)
    assert(wide.rdd.getNumPartitions == 3)
    assert(wide.count() == 10007)
    assert(wide.select(countDistinct(col("i"))).as[Long].head() == 10007)
  }

  test("cross-corpus dedup: drops exactly the shard docs whose normalized content the reference has seen") {
    val newDocs = Seq((1L, "Hello  World"), (2L, "fresh content"), (3L, "other text"))
      .toDF("doc_id", "text")
    // fp normalizes case + whitespace, so "hello world" collides with doc 1
    val ref = Seq((100L, "hello world"), (101L, "unrelated")).toDF("doc_id", "text")
    val kept = ops.Dedup.dedupAgainstReference(newDocs, ref, "doc_id", "text")
      .select(col("doc_id")).as[Long].collect().sorted.toSeq
    assert(kept == Seq(2L, 3L))
    // dedup against itself keeps nothing; against empty keeps everything
    assert(ops.Dedup.dedupAgainstReference(newDocs, newDocs, "doc_id", "text").count() == 0L)
    assert(ops.Dedup.dedupAgainstReference(newDocs, ref.where(lit(false)),
      "doc_id", "text").count() == 3L)
  }

  test("bloom cross-corpus dedup equals the exact anti join on every shard split") {
    val newDocs = docs.where(pmod(col("doc_id"), lit(4)) === 0)
    val refDocs = docs.where(pmod(col("doc_id"), lit(4)) =!= 0)
    val exact = ops.Dedup.dedupAgainstReference(newDocs, refDocs, "doc_id", "text")
      .select(col("doc_id")).as[Long].collect().sorted.toSeq
    val bloomed = ops.Dedup.dedupAgainstReferenceBloom(newDocs, refDocs,
      "doc_id", "text", expectedItems = 512L)
      .select(col("doc_id")).as[Long].collect().sorted.toSeq
    assert(bloomed == exact, "bloom routing must not change the answer")
    // a deliberately undersized sketch (high fpp) still agrees: false
    // positives only push rows into the exact residual join
    val tiny = ops.Dedup.dedupAgainstReferenceBloom(newDocs, refDocs,
      "doc_id", "text", expectedItems = 8L)
      .select(col("doc_id")).as[Long].collect().sorted.toSeq
    assert(tiny == exact)
  }

  test("paragraph dedup: keep-first corpus-wide, hosts reassemble, no unit content survives twice") {
    val d = Seq(
      (1L, "a b c d e f"),        // unit1: "a b c" unit2: "d e f"
      (2L, "a b c x y z"),        // repeats doc1's first unit → stripped here
      (3L, "x y z d e f"),        // repeats doc2's tail and doc1's tail
      (4L, "q r s")               // unique
    ).toDF("doc_id", "text")
    val out = ops.Dedup.paragraphDedup(d, "doc_id", "text", unitTokens = 3)
      .orderBy(col("doc_id"))
      .select(col("doc_id"), col("n_units"), col("n_kept")).as[(Long, Long, Long)]
      .collect().toSeq
    // doc1 owns both its units; doc2 loses "a b c", keeps "x y z"; doc3
    // arrives after both owners → loses both; doc4 unique
    assert(out == Seq((1L, 2L, 2L), (2L, 2L, 1L), (3L, 2L, 0L), (4L, 1L, 1L)))
    // every duplicated unit survives exactly once corpus-wide: total kept
    // = number of DISTINCT units ({a b c, d e f, x y z, q r s} = 4)
    assert(out.map(_._3).sum == 4L,
      s"kept total ${out.map(_._3).sum} must equal distinct unit count")
  }

  test("BPE merges: hand-computed corpus — greedy left-to-right fuse, frequency argmax, lexicographic ties") {
    // corpus: "banana banana bandana" → words {banana:2, bandana:1}
    // pairs it1: (b,a)=3 (a,n): banana has 2 each ×2 =4, bandana has 2 → 6
    //   (n,a): banana 2×2=4, bandana 1 → 5; (n,d)=1, (d,a)=1
    //   → top = (a,n) weight 6 → "an"
    // it2 encodings: b an an a (×2), b an d an a
    //   pairs: (b,an)=3, (an,an)=2, (an,a)=3, (an,d)=1, (d,an)=1
    //   → tie (an,a) vs (b,an) at 3 → lexicographic: "an"<"b" → (an,a)
    // it3: b an ana (×2), b an d ana
    //   pairs: (b,an)=3, (an,ana)=2, (an,d)=1, (d,ana)=1 → (b,an)=3 → "ban"
    val d = Seq((1L, "banana banana"), (2L, "bandana")).toDF("doc_id", "text")
    val out = ops.TextOps.bpeMerges(d, "doc_id", "text", merges = 3)
      .orderBy(col("iter"))
      .select(col("iter"), col("left_sym"), col("right_sym"), col("merged"),
        col("pair_weight"))
      .as[(Long, String, String, String, Long)].collect().toSeq
    assert(out == Seq(
      (1L, "a", "n", "an", 6L),
      (2L, "an", "a", "ana", 3L),
      (3L, "b", "an", "ban", 3L)))
  }

  test("BPE merges: chained self-pair runs fuse like per-token greedy BPE") {
    // aaa → [aa, a], aaaa → [aa, aa] under merge (a,a) — the overlap case
    // a naive single-separator string encoding gets wrong
    val runs = Seq((1L, "aaa aaaa")).toDF("doc_id", "text")
    // it1: (a,a) weight 2+3 = 5 → "aa"
    // it2: [aa,a] gives (aa,a)=1; [aa,aa] gives (aa,aa)=1 →
    //   tie broken lexicographically: (aa,a) wins
    val out = ops.TextOps.bpeMerges(runs, "doc_id", "text", merges = 2)
      .orderBy(col("iter"))
      .select(col("iter"), col("left_sym"), col("right_sym"), col("merged"),
        col("pair_weight"))
      .as[(Long, String, String, String, Long)].collect().toSeq
    assert(out == Seq((1L, "a", "a", "aa", 5L), (2L, "aa", "a", "aaa", 1L)))
  }

  test("key-skew report: uniform key near ratio 1, hot key exposed, null keys are a real group") {
    val d = (1L to 90L).map(i => (i % 9, "hot"))        // uniform: 9 keys x 10
      .++((1L to 110L).map(_ => (99L, "x")))           // one hot key: 110 rows
      .toDF("k", "tag")
      .withColumn("k2", when(col("k") < 3, col("k")).otherwise(lit(null: java.lang.Long)))
    val rep = ops.DataProfile.keySkewReport(d, Seq("k", "k2"))
      .orderBy(col("key_col"))
      .collect()
    val k = rep(0)
    assert(k.getString(0) == "k" && k.getLong(1) == 200L && k.getLong(2) == 10L)
    assert(k.getLong(3) == 110L && k.getDouble(4) == 10.0)
    assert(k.getDouble(5) == 0.55 && k.getDouble(6) == 11.0)
    // k2: nulls form one group (keys 3..8 -> 60 rows, plus the 110 hot)
    val k2 = rep(1)
    assert(k2.getLong(2) == 4L, "null must count as its own key group")
    assert(k2.getLong(3) == 170L)
  }

  test("frame sample fans out k rows per doc; resizeFit preserves aspect, never upscales, floors at 1px") {
    val d = Seq((1L, "abcdefgh")).toDF("doc_id", "text")
    val enriched = ops.Multimodal.enrich(d, "doc_id", "text")
    val frames = ops.Multimodal.frameSample(enriched, "doc_id", "media", k = 4)
      .orderBy(col("frame_idx"))
      .select(col("frame_idx"), col("frame_offset")).as[(Long, Long)].collect().toSeq
    assert(frames == Seq((0L, 0L), (1L, 2L), (2L, 4L), (3L, 6L)))
    val dims = Seq((64L, 16L), (16L, 64L), (10L, 10L), (200L, 1L))
      .toDF("w", "h")
    val (ow, oh) = ops.Multimodal.resizeFit(col("w"), col("h"), 32, 32)
    val out = dims.select(col("w"), col("h"), ow.as("ow"), oh.as("oh"))
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      (64L, 16L, 32L, 8L),   // downscale by width, aspect held
      (16L, 64L, 8L, 32L),   // downscale by height
      (10L, 10L, 10L, 10L),  // inside the box: never upscale
      (200L, 1L, 32L, 1L))) // floor clamps to 1px
  }

  test("corpus drift: matching source sits near zero KL, alien-vocab source dominates, all non-negative") {
    val d = Seq(
      (1L, "alpha beta gamma alpha beta", "mix"),
      (2L, "alpha beta gamma beta alpha", "mix"),
      (3L, "zeta zeta zeta omega omega", "alien")
    ).toDF("doc_id", "text", "source")
    val out = ops.TextOps.corpusDriftBySource(d, "doc_id", "text", "source")
      .orderBy(col("source"))
      .select(col("source"), col("n_tokens"), col("n_vocab_source"),
        col("kl_vs_corpus"))
      .as[(String, Long, Long, Double)].collect().toSeq
    val byName = out.map(r => r._1 -> r).toMap
    assert(byName("mix")._2 == 10L && byName("mix")._3 == 3L)
    assert(byName("alien")._2 == 5L && byName("alien")._3 == 2L)
    assert(out.forall(_._4 >= 0.0), "KL is non-negative")
    assert(byName("alien")._4 > byName("mix")._4 * 2,
      "the disjoint-vocabulary source must dominate the drift report")
  }

  test("semantic decontamination flags the planted near-duplicate and clears orthogonal vectors") {
    val bench = Seq((100L, Array(1.0, 0.0, 0.0, 0.0))).toDF("vec_id", "embedding")
    val corpus = Seq(
      (1L, Array(0.99, 0.1, 0.0, 0.0)),  // near-copy of the bench vector
      (2L, Array(0.0, 1.0, 0.0, 0.0)),   // orthogonal
      (3L, Array(-1.0, 0.0, 0.0, 0.0))   // anti-parallel
    ).toDF("vec_id", "embedding")
    val out = ops.Similarity.semanticDecontaminate(corpus, "vec_id", "embedding",
        bench, "embedding", tau = 0.9)
      .orderBy(col("vec_id"))
      .select(col("vec_id"), col("contaminated")).as[(Long, Boolean)]
      .collect().toSeq
    assert(out == Seq((1L, true), (2L, false), (3L, false)))
  }

  test("CDC chunking is shift-robust: a leading insertion still dedups the shared tail; fixed windows do not") {
    val base = "the quick brown fox jumps over the lazy dog and runs far away into the hills tonight"
    val shifted = "PREFIX! " + base
    val d = Seq((1L, base), (2L, shifted)).toDF("doc_id", "text")
    // m=8 → ~8-char expected chunks: plenty of natural boundaries in an
    // 85-char string for the post-insertion re-alignment to happen
    val cdc = ops.Dedup.cdcChunkDedup(d, "doc_id", "text", window = 4, m = 8L)
      .orderBy(col("doc_id"))
      .select(col("doc_id"), col("n_units"), col("n_kept"))
      .as[(Long, Long, Long)].collect().toSeq
    // doc 2 must LOSE at least one chunk: after the first natural boundary
    // past the insertion, its chunks re-align with doc 1's and dedup
    val doc2 = cdc.find(_._1 == 2L).get
    assert(doc2._3 < doc2._2,
      s"shifted doc kept all ${doc2._2} chunks — boundaries failed to re-align")
    // the fixed-window decomposition sees zero cross-doc duplicates here:
    // one inserted token shifts every downstream 3-token window
    val fixed = ops.Dedup.paragraphDedup(d, "doc_id", "text", unitTokens = 3)
      .orderBy(col("doc_id"))
      .select(col("doc_id"), col("n_units"), col("n_kept"))
      .as[(Long, Long, Long)].collect().toSeq
    assert(fixed.forall(r => r._3 == r._2),
      "fixed windows should not dedup across the shift (the weakness CDC chunking fixes)")
  }

  test("CDC cuts: exact rolling-hash positions, empty under window, boundaries terminate at len") {
    val d = Seq((1L, "abcdefghij"), (2L, "abc"), (3L, "")).toDF("doc_id", "text")
    val cuts = d.select(col("doc_id"),
        ops.TextOps.cdcCuts(col("text"), w = 3, p = 31L, m = 7L).as("c"))
      .orderBy(col("doc_id")).collect()
    // hand-check doc 1: hash(i) = ascii(t[i]) + 31*ascii(t[i-1]) + 961*ascii(t[i-2])
    val t = "abcdefghij"
    val expect = (3 to 10).filter { i =>
      (t(i - 1).toLong + 31L * t(i - 2).toLong + 961L * t(i - 3).toLong) % 7L == 0L
    }
    assert(cuts(0).getSeq[Int](1) == expect, s"expected cuts $expect")
    assert(cuts(1).getSeq[Int](1) == Seq(3).filter { i =>
      ("abc"(2).toLong + 31L * "abc"(1).toLong + 961L * "abc"(0).toLong) % 7L == 0L
    })
    assert(cuts(2).getSeq[Int](1).isEmpty)
  }

  test("collocations: the exclusive pair out-scores frequent-but-independent pairs; output sorted by PMI") {
    val d = Seq(
      (1L, Seq.fill(6)("zig zag").mkString(" ")),   // zig ALWAYS precedes zag
      (2L, Seq.fill(10)("the a").mkString(" "))     // frequent but high-count words
    ).toDF("doc_id", "text")
    val out = ops.TextOps.collocations(d, "doc_id", "text", minCount = 5, topK = 10)
      .select(col("bg"), col("pair_count"), col("pmi"))
      .as[(String, Long, Double)].collect().toSeq
    assert(out.head._1 == "zig zag",
      s"the exclusive collocation must rank first, got ${out.head}")
    assert(out.map(_._3) == out.map(_._3).sorted.reverse, "descending PMI order")
    assert(out.forall(_._2 >= 5L), "min-count guard")
  }

  test("BPE apply: trained merges compress the training corpus by the hand-computed ratios") {
    val d = Seq((1L, "banana banana"), (2L, "bandana")).toDF("doc_id", "text")
    val merges = ops.TextOps.bpeMerges(d, "doc_id", "text", merges = 3)
    val out = ops.TextOps.bpeApply(d, "doc_id", "text", merges, k = 3)
      .orderBy(col("doc_id"))
      .select(col("doc_id"), col("n_syms_before"), col("n_syms_after"),
        col("compression"))
      .as[(Long, Long, Long, Double)].collect().toSeq
    // merges learned: an, ana, ban (see the training test). doc 1
    // "banana banana": 12 chars -> 2x[ban, ana] = 4 symbols; doc 2
    // "bandana": 7 chars -> [ban, d, ana] = 3 symbols
    assert(out == Seq((1L, 12L, 4L, 3.0), (2L, 7L, 3L, 2.3333)))
  }

  test("CDC cut invariant: every cut of s survives (shifted) in q+s for random prefixes") {
    // the window at a cut of s lies fully inside s, so prefixing cannot
    // disturb it — the formal statement of shift-robustness
    val rnd = new scala.util.Random(42)
    def randStr(n: Int) = (1 to n).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    val rows = (1 to 20).map { i =>
      val s = randStr(30 + rnd.nextInt(60)); val q = randStr(1 + rnd.nextInt(12))
      (i.toLong, s, q + s, q.length)
    }
    val df = rows.toDF("id", "s", "qs", "qlen")
    val got = df.select(col("id"), col("qlen"),
        ops.TextOps.cdcCuts(col("s"), w = 4, m = 8L).as("cs"),
        ops.TextOps.cdcCuts(col("qs"), w = 4, m = 8L).as("cqs"))
      .collect()
    got.foreach { r =>
      val (qlen, cs, cqs) = (r.getInt(1), r.getSeq[Int](2), r.getSeq[Int](3).toSet)
      cs.foreach(c => assert(cqs.contains(c + qlen),
        s"id ${r.getLong(0)}: cut $c of s lost after prefixing"))
    }
  }

  test("BPE training is invariant to uniform corpus replication") {
    val once = Seq((1L, "banana banana bandana")).toDF("doc_id", "text")
    val thrice = (1L to 3L).map(i => (i, "banana banana bandana")).toDF("doc_id", "text")
    val m1 = ops.TextOps.bpeMerges(once, "doc_id", "text", merges = 3)
      .select(col("iter"), col("merged"), col("pair_weight"))
      .as[(Long, String, Long)].collect().toSeq.sortBy(_._1)
    val m3 = ops.TextOps.bpeMerges(thrice, "doc_id", "text", merges = 3)
      .select(col("iter"), col("merged"), col("pair_weight"))
      .as[(Long, String, Long)].collect().toSeq.sortBy(_._1)
    assert(m1.map(x => (x._1, x._2)) == m3.map(x => (x._1, x._2)),
      "replication must not change the learned merges")
    assert(m3.map(_._3) == m1.map(_._3).map(_ * 3), "weights scale with the corpus")
  }

  test("snapshot diff: emits I/U/D only, suppresses unchanged keys, compares null state null-safely") {
    val oldSnap = Seq((1L, Some("a")), (2L, Some("b")), (3L, Some("c")), (5L, None: Option[String]))
      .toDF("k", "v")
    val newSnap = Seq((2L, Some("b")), (3L, Some("x")), (4L, Some("d")), (5L, Some("now-set")))
      .toDF("k", "v")
    val out = streaming.StreamingOps.snapshotDiff(oldSnap, newSnap, "k", "v")
      .orderBy(col("k"))
      .select(col("k"), col("op")).as[(Long, String)].collect().toSeq
    // 1: deleted; 2: unchanged (suppressed); 3: updated; 4: inserted;
    // 5: null → non-null counts as an update under null-safe comparison
    assert(out == Seq((1L, "D"), (3L, "U"), (4L, "I"), (5L, "U")))
  }

  test("FIM transform: gated docs reassemble to the original text with all three segments non-empty") {
    import ops.Curation
    val out = Curation.fimTransform(docs, "doc_id", "text")
      .select(col("doc_id"), col("text"), col("fim"), col("text_out")).collect()
    assert(out.nonEmpty)
    var gatedN = 0
    out.foreach { r =>
      val (text, fim, to) = (r.getString(1), r.getLong(2), r.getString(3))
      if (fim == 0L) assert(to == text, s"ungated doc ${r.getLong(0)} must pass through")
      else {
        gatedN += 1
        assert(to.startsWith("<PRE>"))
        val afterPre = to.stripPrefix("<PRE>")
        val Array(pre, rest) = afterPre.split("<SUF>", 2)
        val Array(suf, mid) = rest.split("<MID>", 2)
        assert(pre.nonEmpty && mid.nonEmpty && suf.nonEmpty,
          s"doc ${r.getLong(0)}: all PSM segments must be non-empty")
        assert(pre + mid + suf == text,
          s"doc ${r.getLong(0)}: PSM segments must reassemble the original")
      }
    }
    // the id-derived gate takes roughly the configured half of long-enough docs
    assert(gatedN > out.length / 4, s"expected a substantial gated fraction, got $gatedN")
  }

  test("DoReMi weights: normalized, floor-domain has zero excess, monotone in excess, sharpened by iterations") {
    import ops.Curation
    val loss = lit(1.0) - least(col("n_chars").cast("double") / lit(200.0), lit(1.0))
    val w3 = Curation.doremiWeights(docs, "source", loss, eta = 0.5, iters = 3)
      .select(col("source"), col("excess"), col("weight"))
      .as[(String, Double, Double)].collect().toSeq
    assert(math.abs(w3.map(_._3).sum - 1.0) < 1e-4, "weights must normalize to 1")
    assert(w3.map(_._2).min == 0.0, "the min-loss domain has zero excess")
    val byExcess = w3.sortBy(_._2)
    assert(byExcess.map(_._3) == byExcess.map(_._3).sorted,
      "higher excess loss must never get a lower weight")
    val w1 = Curation.doremiWeights(docs, "source", loss, eta = 0.5, iters = 1)
      .select(col("source"), col("weight")).as[(String, Double)].collect().toMap
    val hardest = byExcess.last._1
    assert(w3.find(_._1 == hardest).get._3 >= w1(hardest) - 1e-9,
      "more iterations concentrate weight on the hardest domain")
  }
}
