package graft

import org.apache.spark.sql.functions._
import graft.ops._

/** Round-7 curation operators: PII redaction, domain capping, the
  * logistic quality classifier, mixture resampling and token-budget
  * selection. */
class Round7CurationSpec extends SparkSpec {
  import spark.implicits._

  test("redactPii masks emails, IPs and phone groups; counts agree") {
    val df = Seq(
      (1L, "write to alice.b+spam@corp.example.org today"),
      (2L, "server 192.168.0.1 and 10.0.0.255 responded"),
      (3L, "call 555-867-5309 or 555-0100-9999"),
      (4L, "nothing sensitive here")).toDF("id", "text")
    val (ne, ni, np) = TextOps.piiCounts(col("text"))
    val got = df.select(col("id"), TextOps.redactPii(col("text")).as("red"),
      ne.as("ne"), ni.as("ni"), np.as("np"))
      .as[(Long, String, Long, Long, Long)].collect().sortBy(_._1)
    assert(got(0)._2 == "write to <EMAIL> today" && got(0)._3 == 1)
    assert(got(1)._2 == "server <IP> and <IP> responded" && got(1)._4 == 2)
    assert(got(2)._2 == "call <PHONE> or <PHONE>" && got(2)._5 == 2)
    assert(got(3)._2 == "nothing sensitive here" &&
      got(3)._3 == 0 && got(3)._4 == 0 && got(3)._5 == 0)
  }

  test("domainCap drops blocked hosts and keeps the N best per domain") {
    val docs = Seq(
      (1L, "http://a.example.com/x", 0.9),
      (2L, "http://a.example.com/y", 0.8),
      (3L, "http://a.example.com/z", 0.7),
      (4L, "http://bad.example.com/x", 0.99),
      (5L, "http://b.example.com/x", 0.5)).toDF("doc_id", "url", "score")
    val blocked = Seq("bad.example.com").toDF("domain")
    val got = TextOps.domainCap(docs, "url",
      Seq(col("score").desc, col("doc_id").asc), maxPerDomain = 2, blocked)
      .select(col("doc_id"), col("domain"), col("rk"))
      .as[(Long, String, Long)].collect().sortBy(_._1)
    assert(got.map(_._1).toSeq == Seq(1L, 2L, 5L), "cap=2 keeps a's best two, b's one; bad.* dropped")
    assert(got.map(_._2).toSet == Set("a.example.com", "b.example.com"))
    assert(got.map(r => r._1 -> r._3).toMap == Map(1L -> 1L, 2L -> 2L, 5L -> 1L))
  }

  test("classifierScore rewards stopword-rich prose, penalizes punct/digit noise") {
    val df = Seq(
      (1L, "the quick brown fox and the lazy dog are of the same mind in the sun"),
      (2L, "@@@@ ???? !!!! #### 12345 67890 $$$$ %%%% ^^^^ &&&& 00000")).toDF("id", "text")
    val got = df.select(col("id"), TextOps.classifierScore(col("text")))
      .as[(Long, Double)].collect().toMap
    assert(got.values.forall(v => v >= 0.0 && v <= 1.0))
    assert(got(1L) > 0.55, s"prose should pass the keep threshold, got ${got(1L)}")
    assert(got(2L) < 0.45, s"noise should fail the keep threshold, got ${got(2L)}")
  }

  test("mixtureRates: binding stratum keeps 100%, others downsample to the mix") {
    val df = (1 to 150).map(i => (i.toLong, "a")) ++ (1 to 50).map(i => (i.toLong + 1000, "b"))
    val got = Curation.mixtureRates(df.toDF("id", "src"), "src",
      Map("a" -> 50, "b" -> 50))
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    // T = min(150/0.5, 50/0.5) = 100 → a keeps floor(100·0.5·100/150)=33%,
    // b (binding) keeps 100%
    assert(got("a") == (150L, 33L))
    assert(got("b") == (50L, 100L))
  }

  test("temperatureRates flattens: alpha<1 up-weights the small stratum") {
    val df = ((1 to 1600).map(i => (i.toLong, "big")) ++
      (1 to 100).map(i => (i.toLong + 10000, "small"))).toDF("id", "src")
    def rates(alpha: Double): Map[String, Long] =
      Curation.temperatureRates(df, "src", alpha, totalTarget = 400L)
        .select("stratum", "rate").as[(String, Long)].collect().toMap
    // alpha = 1: proportional — both strata keep the same per-mille rate
    // (400/1700 of each): w=n so rate = 1000·400/1700 for both
    val r1 = rates(1.0)
    assert(r1("big") == r1("small"), s"alpha=1 must be proportional: $r1")
    // alpha = 0.5: w_big/w_small = sqrt(16) = 4 instead of 16 — the small
    // stratum's keep-RATE must now exceed the big one's
    val r05 = rates(0.5)
    assert(r05("small") > r05("big"), s"alpha=0.5 must favor small: $r05")
    // and the rate never exceeds 1000 per-mille
    assert(rates(0.1).values.forall(_ <= 1000L))
  }

  test("mixtureSample drops strata absent from the targets") {
    val df = Seq((1L, "a"), (2L, "b"), (3L, "zzz")).toDF("id", "src")
    val kept = Curation.mixtureSample(df, "id", "src", Map("a" -> 50, "b" -> 50))
      .select("src").as[String].collect()
    assert(!kept.contains("zzz"))
  }

  test("tokenBudgetSelect equals the naive global running-sum form") {
    import org.apache.spark.sql.expressions.Window
    // deterministic mixed fixture: coarse score buckets with ties, varied
    // token counts, budget landing mid-bucket
    val rows = (1L to 200L).map { i =>
      (i, (i * 7 % 5).toDouble / 10.0, 10 + (i * 13 % 37))
    }
    val df = rows.toDF("doc_id", "q", "n")
    val budget = 2000L
    val got = Curation.tokenBudgetSelect(df, "doc_id", col("q"), col("n"), budget)
      .as[(Long, Double, Long, Long)].collect().sortBy(_._1)
    val w = Window.orderBy(col("q").desc, col("doc_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = df.withColumn("start",
        sum(col("n").cast("long")).over(w) - col("n"))
      .where(col("start") < budget)
      .select(col("doc_id"), col("q"), col("n").cast("long"), col("start"))
      .as[(Long, Double, Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq == want.toSeq)
    // the budget can overflow by at most one document
    val total = got.map(_._3).sum
    assert(total >= budget && total - got.map(_._3).max <= budget)
  }

  test("boilerplateStrip cuts cross-doc repeated units, keeps unique text") {
    // unit = 4 tokens; "subscribe to our newsletter" recurs in 3 docs →
    // boilerplate; each doc's remaining unique unit survives
    val docs = Seq(
      (1L, "subscribe to our newsletter alpha beta gamma delta"),
      (2L, "subscribe to our newsletter epsilon zeta eta theta"),
      (3L, "subscribe to our newsletter iota kappa lambda mu"),
      (4L, "totally original content here nothing repeats at all")).toDF("doc_id", "text")
    val got = TextOps.boilerplateStrip(docs, "doc_id", "text", unitTokens = 4, minDf = 3)
      .select(col("doc_id"), col("n_units"), col("n_kept"), col("kept_fp"))
      .as[(Long, Long, Long, String)].collect().sortBy(_._1)
    assert(got.map(r => (r._1, r._2, r._3)).toSeq ==
      Seq((1L, 2L, 1L), (2L, 2L, 1L), (3L, 2L, 1L), (4L, 2L, 2L)))
    // doc 4 keeps everything: fingerprint equals md5 of its full token join
    val full4 = docs.where(col("doc_id") === 4)
      .select(md5(concat_ws(" ", TextOps.tokens(col("text")))))
      .as[String].head()
    assert(got.find(_._1 == 4L).get._4 == full4)
    // docs 1-3 keep only their distinct tail, so fingerprints all differ
    assert(got.take(3).map(_._4).distinct.length == 3)
  }

  test("tokenBudgetSelect keeps everything when the budget covers the corpus") {
    val df = Seq((1L, 0.5, 10L), (2L, 0.4, 10L), (3L, 0.6, 10L)).toDF("doc_id", "q", "n")
    val got = Curation.tokenBudgetSelect(df, "doc_id", col("q"), col("n"), 1000L)
      .as[(Long, Double, Long, Long)].collect().sortBy(_._1)
    assert(got.map(_._1).toSeq == Seq(1L, 2L, 3L))
    // starts follow (q desc, id) order: 3 first, then 1, then 2
    assert(got.map(r => r._1 -> r._4).toMap == Map(3L -> 0L, 1L -> 10L, 2L -> 20L))
  }

  test("prioritySample: deterministic, weight-monotone, TakeOrdered-planned") {
    val df = (1L to 200L).map(i => (i, if (i == 7L) 1000000L else 1L))
      .toDF("doc_id", "w")
    val got = Curation.prioritySample(df, "doc_id", col("w"), k = 20, seed = "t")
    // scale gate: per-partition heap top-k, never a global sort
    assert(got.queryExecution.executedPlan.toString.contains("TakeOrderedAndProject"))
    val ids = got.select("doc_id").as[Long].collect().toSet
    // the million-weight row's key is ~0⁻ — it must be drawn
    assert(ids.contains(7L))
    val again = Curation.prioritySample(df, "doc_id", col("w"), k = 20, seed = "t")
      .select("doc_id").as[Long].collect().toSet
    assert(ids == again, "same seed must reproduce the identical sample")
    val other = Curation.prioritySample(df, "doc_id", col("w"), k = 20, seed = "u")
      .select("doc_id").as[Long].collect().toSet
    assert(ids != other, "a different seed draws a different sample")
  }

  test("splitAssignBy: every group member shares one split; id form unchanged") {
    val docs = (1L to 200L).map(i => (i, s"host${i % 13}")).toDF("doc_id", "host")
    val byGroup = Curation.splitAssignBy(docs, col("host"))
    // leakage safety: a group never straddles splits
    assert(byGroup.groupBy("host")
      .agg(countDistinct(col("split")).as("k"))
      .where(col("k") > 1).count() == 0)
    // the id special case is exactly the original splitAssign
    val a = Curation.splitAssign(docs, "doc_id").select("doc_id", "split")
    val b = Curation.splitAssignBy(docs, col("doc_id")).select("doc_id", "split")
    assert(a.except(b).count() == 0 && b.except(a).count() == 0)
  }

  test("curriculumOrder: per-source difficulty is nondecreasing, sources interleave") {
    val docs = Seq(
      (1L, "a", 30L), (2L, "a", 10L), (3L, "a", 20L),
      (4L, "b", 5L), (5L, "b", 50L),
      (6L, "c", 7L))
      .toDF("doc_id", "source", "n_chars")
    val got = Curation.curriculumOrder(docs, "doc_id", "source",
      col("n_chars").cast("double"))
      .as[(Long, String, Long, Double)].collect().toSeq
    // manifest order: all rank-1 docs (every source, easiest each), then
    // rank-2, then rank-3 — and within a source difficulty never decreases
    assert(got == Seq(
      (1L, "a", 2L, 10.0), (1L, "b", 4L, 5.0), (1L, "c", 6L, 7.0),
      (2L, "a", 3L, 20.0), (2L, "b", 5L, 50.0),
      (3L, "a", 1L, 30.0)))
  }

  test("canonicalUrl folds case/port/slash/fragment/tracking, sorts params") {
    val urls = Seq(
      // every normalization at once: case, userinfo skip, default port,
      // trailing slash, tracking param, param order, fragment
      "HTTP://User@WWW.Ex.COM:80/a/b/?utm_source=x&b=2&a=1#frag",
      "http://www.ex.com/a/b?a=1&b=2",   // already canonical → same key
      "https://ex.com:443/x",            // https default port strips
      "https://ex.com:8443/x",           // non-default port KEPT
      "http://ex.com"                    // no path, no query
    ).toDF("u")
    val got = urls.select(TextOps.canonicalUrl(col("u"))).as[String].collect().toSeq
    assert(got == Seq(
      "http://www.ex.com/a/b?a=1&b=2",
      "http://www.ex.com/a/b?a=1&b=2",
      "https://ex.com/x",
      "https://ex.com:8443/x",
      "http://ex.com"))
  }
}
