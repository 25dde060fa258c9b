package graft

import org.apache.spark.sql.functions._
import graft.ops.{Dedup, TextOps}

/** The codegen text kernels (graft_tokens / graft_shingles) must produce
  * EXACTLY the declarative chain's results — the DuckDB oracle mirrors the
  * declarative form, so any divergence breaks the correctness gate. */
class TextKernelSpec extends SparkSpec {
  import spark.implicits._

  private val cases = Seq(
    "The quick brown fox jumps over the lazy dog",
    "hello",                        // single token (< shingle width)
    "two words",                    // below shingle width, joined fallback
    "a b c",                        // exactly shingle width
    "",                             // empty → empty token set
    "123 !!! ???",                  // no alpha runs at all
    "  leading   and trailing  ",   // whitespace runs
    "MiXeD CaSe AND punct-uation, splits;here",
    "repeat repeat repeat repeat repeat", // duplicate shingles collapse
    "ünïcödé déjà vu naïve café",   // accented chars are delimiters
    "a1b2c3 x y z")                 // digits split runs

  test("graft_tokens equals the declarative regex tokenizer") {
    val df = cases.toDF("text")
    val got = df.select(TextOps.tokens(col("text"))).as[Seq[String]].collect()
    val want = df.select(TextOps.tokensHof(col("text"))).as[Seq[String]].collect()
    got.zip(want).zip(cases).foreach { case ((g, w), c) =>
      assert(g == w, s"tokens mismatch for '$c'")
    }
  }

  test("graft_shingles equals the declarative shingle chain (as a set)") {
    val df = cases.toDF("text")
    val got = df.select(Dedup.wordShingles(col("text"), 3)).as[Seq[String]].collect()
    val want = df.select(
      Dedup.shinglesFromTokens(TextOps.tokensHof(col("text")), 3)).as[Seq[String]].collect()
    got.zip(want).zip(cases).foreach { case ((g, w), c) =>
      assert(g.toSet == w.toSet, s"shingle set mismatch for '$c'")
      assert(g.length == g.toSet.size, s"duplicates in kernel output for '$c'")
    }
  }

  test("graft_pos_qgrams equals the declarative explode+substring+window chain") {
    // the Ed-Join prefix chain's positional (gram, occurrence#) tokens:
    // kernel must be bit-identical to the previous declarative derivation
    // (the DuckDB oracle mirrors the declarative form)
    val texts = Seq(
      "the quick brown fox", "aaaaaaaa", "abababab", "ab", "a", "",
      "ünïcödé déjà vu", "ababa", "xyxyxyxyxyxy", "  spaces  here ",
      "ümlaut ümlaut ümlaut") // repeated multi-byte grams
    for (q <- Seq(1, 2, 3, 4)) {
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("id", "key").withColumn("len", length(col("key")))
        .where(col("len") >= q) // kernel contract: callers pre-filter len >= q
      val kernel = df.select(col("id"),
          explode(org.apache.spark.sql.GraftPlanBridge.column(
            graft.functions.PositionalQGrams(
              org.apache.spark.sql.GraftPlanBridge.expression(col("key")), q)))
            .as("t"))
        .select(col("id"), col("t.gram"), col("t.occ"))
        .orderBy(col("id"), col("gram"), col("occ"))
        .as[(Long, String, Int)].collect()
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("id"), col("gram")).orderBy(col("p"))
      val declarative = df.select(col("id"), col("key"),
          explode(sequence(lit(0), col("len") - lit(q))).as("p"))
        .withColumn("gram", expr(s"substring(key, p + 1, $q)"))
        .withColumn("occ", row_number().over(w))
        .select(col("id"), col("gram"), col("occ"))
        .orderBy(col("id"), col("gram"), col("occ"))
        .as[(Long, String, Int)].collect()
      assert(kernel.toSeq == declarative.toSeq, s"pos-qgram mismatch at q=$q")
    }
  }

  test("graft_text_stats equals the declarative counter forms") {
    val df = cases.toDF("text") union Seq(
      "the la de que words shared across lists",  // multi-language stopwords
      "der die das und ist von mit den nicht ein" // pure German
    ).toDF("text")
    val st = TextOps.textStats(col("text"))
    val got = df.select(st.getField("n_tokens"),
      st.getField("n_subwords_alpha").cast("long"),
      st.getField("hits_en"), st.getField("hits_de"),
      st.getField("hits_fr"), st.getField("hits_es"))
      .as[(Int, Long, Int, Int, Int, Int)].collect()
    val toks = TextOps.tokensHof(col("text"))
    val want = df.select(size(toks),
      aggregate(toks, lit(0L), (acc, t) => acc + ceil(length(t) / lit(4.0)).cast("long")),
      TextOps.stopwordHits(toks, "en"), TextOps.stopwordHits(toks, "de"),
      TextOps.stopwordHits(toks, "fr"), TextOps.stopwordHits(toks, "es"))
      .as[(Int, Long, Int, Int, Int, Int)].collect()
    got.zip(want).foreach { case (g, w) => assert(g == w) }
  }

  test("x3 fused lang/quality match the declarative TextOps forms on real docs") {
    val docs = graft.sources.Tables.documents(spark, sf001)
    val st = TextOps.textStats(col("text"))
    val bad = docs.select(
      TextOps.langIdFromStats(st).as("fl"),
      TextOps.langIdHeuristic(col("text")).as("dl"),
      TextOps.qualityScoreFromStats(st, col("text")).as("fq"),
      TextOps.qualityScore(col("text")).as("dq"),
      TextOps.subwordCountFromStats(st, col("text")).as("fs"),
      TextOps.subwordCountEstimate(col("text")).as("ds"),
      st.getField("n_tokens").as("fn"), TextOps.tokenCount(col("text")).as("dn"))
      .where(col("fl") =!= col("dl") || col("fn") =!= col("dn") ||
        col("fq") =!= col("dq") || col("fs") =!= col("ds"))
    assert(bad.count() == 0)
  }

  test("kernels match on the real documents table") {
    val docs = graft.sources.Tables.documents(spark, sf001)
    val both = docs.select(col("doc_id"),
      TextOps.tokens(col("text")).as("tk"),
      TextOps.tokensHof(col("text")).as("th"),
      Dedup.wordShingles(col("text"), 3).as("sk"),
      Dedup.shinglesFromTokens(TextOps.tokensHof(col("text")), 3).as("sh"))
    val bad = both.where(col("tk") =!= col("th") ||
      size(array_except(col("sk"), col("sh"))) > 0 ||
      size(array_except(col("sh"), col("sk"))) > 0)
    assert(bad.count() == 0)
  }

  test("graft_tokens / graft_shingles callable from SQL via both registration paths") {
    graft.functions.GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT graft_tokens('A b! c'), graft_shingles('a b c d', 3)")
      .as[(Seq[String], Seq[String])].head()
    assert(r._1 == Seq("a", "b", "c"))
    assert(r._2 == Seq("a b c", "b c d"))
  }

  test("graft_gram_hashes mirrors the declarative gram structure: count, order, equality pattern") {
    import spark.implicits._
    val docs = graft.sources.Tables.documents(spark, sf001)
      .select(col("doc_id"), col("text"))
    val both = docs
      .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"),
        TextOps.gramHashCol(col("text"), 3).as("hs"))
      .select(col("doc_id"), TextOps.wordNgrams(col("toks"), 3).as("gs"), col("hs"))
      .as[(Long, Seq[String], Seq[Long])].collect()
    assert(both.nonEmpty)
    val gramToHash = scala.collection.mutable.Map[String, Long]()
    both.foreach { case (id, gs, hs) =>
      assert(gs.length == hs.length, s"doc $id: one hash per gram position")
      // equal grams (within and across docs) → equal hashes; distinct
      // grams → distinct hashes (collision-free on this corpus)
      gs.zip(hs).foreach { case (g, h) =>
        gramToHash.get(g) match {
          case Some(prev) => assert(prev == h, s"gram '$g' hashed inconsistently")
          case None       => gramToHash(g) = h
        }
      }
    }
    assert(gramToHash.values.toSet.size == gramToHash.size,
      "distinct grams must keep distinct hashes on the test corpus")
    // short docs: fewer than n tokens → empty hash array
    val short = Seq((1L, "one two")).toDF("doc_id", "text")
      .select(TextOps.gramHashCol(col("text"), 3).as("hs"))
      .as[Seq[Long]].head()
    assert(short.isEmpty)
  }

  test("shingle explode plan keeps the kernel out of a re-inlined filter") {
    val docs = graft.sources.Tables.documents(spark, sf001)
    val plan = Dedup.docShingleSets(docs, "doc_id", "text")
      .select(explode(col("toks")))
      .queryExecution.optimizedPlan.toString
    // the pushed-down size()>0 filter may duplicate graft_shingles (cheap,
    // single-pass) but must NOT contain the interpreted split/transform chain
    assert(!plan.contains("split("), plan.take(500))
  }

  test("graft_cdc_cuts kernel equals the declarative rolling-hash HOF form") {
    val rnd = new scala.util.Random(7)
    val strs = (1 to 40).map(_ =>
      (1 to (rnd.nextInt(120) + 1)).map(_ => ('a' + rnd.nextInt(27)).toChar)
        .mkString.replace('{', ' ')) ++
      cases :+ "exactly8" :+ "under8" :+ null.asInstanceOf[String]
    val df = strs.toDF("text")
    Seq((8, 31L, 64L), (4, 31L, 8L), (5, 7L, 13L)).foreach { case (w, p, m) =>
      // null-safe comparison: both forms must agree on VALUES and on
      // NULLNESS (null text → null in both, per the kernel's nullSafeEval)
      val bad = df.select(
          TextOps.cdcCuts(col("text"), w, p, m).as("k"),
          TextOps.cdcCutsHof(col("text"), w, p, m).as("h"))
        .where(col("k") =!= col("h") || (col("k").isNull =!= col("h").isNull))
      assert(bad.count() == 0, s"kernel/HOF divergence at (w=$w, p=$p, m=$m)")
    }
  }

  test("unicode kernels: NFC unifies composed/decomposed, accents strip, ASCII short-circuits") {
    import org.apache.spark.unsafe.types.UTF8String
    import graft.functions.UnicodeKernels
    val composed = "caf\u00e9"       // e-acute as one codepoint
    val decomposed = "cafe\u0301"    // e + combining acute
    assert(composed != decomposed, "the two encodings differ as strings")
    assert(UnicodeKernels.nfc(UTF8String.fromString(decomposed)).toString == composed,
      "NFC must compose")
    assert(UnicodeKernels.nfc(UTF8String.fromString(composed)).toString == composed)
    assert(UnicodeKernels.stripAccents(UTF8String.fromString(composed)).toString == "cafe")
    assert(UnicodeKernels.stripAccents(UTF8String.fromString(decomposed)).toString == "cafe")
    // ASCII fast path returns the input buffer itself — no allocation
    val ascii = UTF8String.fromString("plain ascii")
    assert(UnicodeKernels.nfc(ascii) eq ascii)
    assert(UnicodeKernels.stripAccents(ascii) eq ascii)
    // and through SQL: the two encodings fingerprint identically post-NFC
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    val fps = Seq((1L, composed), (2L, decomposed)).toDF("id", "t")
      .selectExpr("md5(graft_nfc(t)) AS fp").distinct().count()
    assert(fps == 1L, "NFC must unify the dedup fingerprints")
  }
}
