package graft

import org.apache.spark.sql.functions._

import graft.ops.{Dedup, Similarity, TextOps}

/** Round-21 hardening for the optimization round's operator-internals
  * changes: the integer-DIV pair counts past 2^53, the shared-featurization
  * classifier apply, and nearDupComponents' single-pass groups/reps (rep
  * and rep_id now come from the SAME long ordering). */
class Round21OpsSpec extends SparkSpec {
  import spark.implicits._

  // ---- integer DIV pair counts (simhashBucketReport / cosineBucketReport
  // fix): C(n,2) stays exact where double division rounds ----

  test("DIV pair count is exact past 2^53 where double division drifts") {
    // n ≡ 2 (mod 4) with n·(n−1) > 2^54: the product is ≡ 2 (mod 4) while
    // double's lattice spacing there is 4, so the double-division form
    // must round off the true C(n, 2)
    val n = 190000002L
    val exact = (BigInt(n) * BigInt(n - 1) / 2).toLong
    val row = spark.range(1).select(lit(n).as("n_docs"))
      .select(
        expr("CAST(n_docs * (n_docs - 1) DIV 2 AS BIGINT)").as("div_form"),
        (col("n_docs") * (col("n_docs") - 1) / 2).cast("long").as("dbl_form"))
      .head()
    assert(row.getLong(0) === exact,
      "the shipped DIV form must match exact integer arithmetic")
    // pin WHY the fix exists: the old double-division form is off here
    assert(row.getLong(1) !== exact,
      "fixture must sit where double division actually drifts")
  }

  test("bucket reports carry exact small pair counts end-to-end") {
    val docs = Seq(1L -> "alpha beta gamma delta", 2L -> "alpha beta gamma delta",
      3L -> "alpha beta gamma delta", 4L -> "totally different words here")
      .toDF("doc_id", "text")
    val rep = Dedup.simhashBucketReport(docs, "doc_id", "text").collect()
    rep.foreach { r =>
      val n = r.getAs[Long]("n_docs")
      assert(r.getAs[Long]("n_candidate_pairs") === n * (n - 1) / 2)
    }
  }

  // ---- applyFromFeatures ≡ applyHashClassifier (shared featurization) ----

  test("classifier apply over shared features matches re-featurized apply") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog", "en"),
      (2L, "der schnelle braune fuchs springt", "de"),
      (3L, "a b c d e f g h", "en"),
      (4L, "12345 67890", "xx"), // zero alphabetic tokens — absent from both
      (5L, "lorem ipsum dolor sit amet", "la"))
      .toDF("doc_id", "text", "lang")
    val w = TextOps.trainHashClassifier(docs, "doc_id", "text",
      col("lang") === "en", buckets = 32, iters = 2)
    val direct = TextOps.applyHashClassifier(docs, "doc_id", "text", w, 32)
      .orderBy("doc_id").collect()
    val feats = TextOps.classifierFeatures(docs, "doc_id", "text",
      col("lang") === "en", buckets = 32)
    val shared = TextOps.applyFromFeatures(feats, w)
      .orderBy("doc_id").collect()
    assert(direct.map(_.getLong(0)).toSeq === shared.map(_.getLong(0)).toSeq)
    // bit-identical scores, not approximately equal — the two paths must
    // fold the same arrays through the same arithmetic
    assert(direct.map(_.getDouble(1)).toSeq === shared.map(_.getDouble(1)).toSeq)
    assert(!direct.map(_.getLong(0)).contains(4L),
      "zero-token docs are absent from both paths")
  }

  // ---- nearDupComponents: rep and rep_id from ONE ordering ----

  test("nearDupComponents groups string ids whose lexicographic and numeric orders disagree") {
    // ids "9" and "10": lexicographic min is "10", numeric min is 9.
    // Pre-r21 the representative came from the STRING ordering while
    // rep_id came from the long cast — the groups⋈repComp join desynced
    // and dropped the component. Now both come from the long ordering.
    val text = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    val docs = Seq("9" -> text, "10" -> text,
      "11" -> (text + " nu"), "30" -> "unrelated words only here today now")
      .toDF("doc_id", "text")
    val comps = Dedup.nearDupComponents(docs, "doc_id", "text")
      .orderBy("id").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the exact pair {9, 10} and near-dup 11 share one component rooted at 9
    assert(comps.get(9L) === Some(9L))
    assert(comps.get(10L) === Some(9L))
    assert(comps.get(11L) === Some(9L))
    assert(!comps.contains(30L), "singleton distinct text stays out")
  }

  test("nearDupComponents single-pass plan matches the two-aggregate form on long ids") {
    // the Round20 spec's proven near-dup fixture (the "+ extra" variant
    // collides in the LSH banding with the base text)
    val base =
      "the quick brown fox jumps over the lazy dog near the quiet river bank today"
    val docs = Seq(0L -> base, 1L -> base, 2L -> (base + " extra"),
      7L -> "completely different content with many other words present")
      .toDF("doc_id", "text")
    val got = Dedup.nearDupComponents(docs, "doc_id", "text")
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === Seq((0L, 0L), (1L, 0L), (2L, 0L)))
  }

  // ---- covarianceMatrix registers its own kernel functions ----

  test("covarianceMatrix analyzes in a session that never ran another Similarity op") {
    val emb = Seq((1L, Array(1.0, 2.0)), (2L, Array(2.0, 4.0)))
      .toDF("vec_id", "embedding")
    // would throw UNRESOLVED_ROUTINE for graft_dense pre-r21 when no other
    // registering op had run in the session; SparkSpec sessions are fresh
    // per suite so this pins the isolation property as long as no earlier
    // test in THIS suite registered first — keep it independent of order
    // by asserting on values, not just analysis success
    val rows = Similarity.covarianceMatrix(emb, "embedding")
      .orderBy("i", "j").collect()
    assert(rows.length === 3)
    assert(rows.map(_.getDouble(2)).forall(_ >= 0.0))
  }

  // ---- x2_pq_recall_fixedk seed cap, DATA-verified (r20 ADVICE item 3):
  // at every oracle-gated SF max vec_id < 5888, so the capped branch of
  // the Spark predicate and of the generated capSql oracle was only ever
  // exercised by construction. This fixture makes the cap BIND. ----

  test("pq_recall_fixedk seed cap binds on a >5888-id corpus, both cap paths in sync") {
    // the two oracle texts must differ by EXACTLY the cap predicate: a
    // future edit that moves one path desyncs this equality
    val capped = SparkEntry.oracleSql("x2_pq_recall_fixedk")
    val uncapped = SparkEntry.oracleSql("x2_pq_recall")
    assert(capped.contains(" AND pid < 5888"), "capSql must render the cap")
    assert(capped.replace(" AND pid < 5888", "") === uncapped,
      "fixedk oracle must be the uncapped oracle plus only the cap predicate")

    // synthetic embeddings dir with ids past the cap: seeds %23==3 exist
    // BOTH below 5888 (kept) and above it (must be excluded)
    val dir = java.nio.file.Files.createTempDirectory("r21capbind").toString
    val dim = 64
    // unique per (id, dim): the +id/1e5 term separates every sub-slice, so
    // each seed's own point sits at distance 0 from its cell and every
    // seed survives a 1-iteration train (deterministic cell set)
    def vec(id: Long): Array[Float] =
      Array.tabulate(dim)(i =>
        (((id * 31 + i * 7) % 97).toFloat - 48f) / 10f + id.toFloat / 100000f)
    (0L until 6200L).map(id => (id, vec(id), (id % 3).toInt))
      .toDF("vec_id", "embedding", "label")
      .coalesce(1).write.parquet(s"$dir/embeddings.parquet")

    // the Spark predicate, data-verified: a 1-iteration train's codebook
    // cells are exactly the surviving seed ids — capped: only sub-5888
    // stripe ids; uncapped: over-5888 stripe ids included
    val emb = sources.Tables.embeddings(spark, dir)
    val stripe = (0L until 6200L).filter(_ % 23 == 3)
    val cbCap = Similarity.pqTrain(emb, "vec_id", "embedding", m = 8, dim = dim,
      seedPred = pmod(col("vec_id"), lit(23)) === 3 && col("vec_id") < lit(5888L),
      iters = 1)
    val cbAll = Similarity.pqTrain(emb, "vec_id", "embedding", m = 8, dim = dim,
      seedPred = pmod(col("vec_id"), lit(23)) === 3, iters = 1)
    val cellsCap = cbCap.select("cell").distinct().as[Long].collect().toSet
    val cellsAll = cbAll.select("cell").distinct().as[Long].collect().toSet
    assert(cellsCap === stripe.filter(_ < 5888L).toSet, "cap must bind")
    assert(cellsAll === stripe.toSet, "uncapped stripe keeps over-cap seeds")
    assert((cellsAll -- cellsCap).forall(_ >= 5888L), "cap excludes exactly the over-cap seeds")

    // and the full declared queries run green on the binding corpus,
    // DIVERGING (different codebooks => different search results) — at
    // the oracle SFs they coincide by construction, so this is the first
    // data point where the branch actually matters
    val fixedk = SparkEntry.queries("x2_pq_recall_fixedk")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val plain = SparkEntry.queries("x2_pq_recall")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(fixedk.map(_._1) === plain.map(_._1), "same query stripe")
    assert(fixedk.nonEmpty)
  }
}
