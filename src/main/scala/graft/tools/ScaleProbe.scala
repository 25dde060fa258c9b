package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops._
import graft.sources.Tables

/** Dev-only 10× scale probe: replicate the sf0.1 tables with remapped
  * keys (≈ sf1: 6M lineitem rows, 50k docs, 50k embeddings), run the
  * scale-critical operator families, and report per-op time at 1× vs
  * 10×. A family whose 10× time grows ≫10× has a quadratic term that
  * 1000 executors cannot save at 100 TB; results are recorded in
  * SCALING.md. */
object ScaleProbe {
  def time[T](label: String)(f: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = f
    val s = (System.nanoTime() - t0) / 1e9
    println(f"[probe] $label%-34s $s%8.2f s")
    (r, s)
  }

  def replicate(df: DataFrame, idCols: Seq[String], n: Int, idSpan: Long): DataFrame =
    (0 until n).map { k =>
      idCols.foldLeft(df)((d, c) => d.withColumn(c, col(c) + lit(k * idSpan)))
    }.reduce(_ unionAll _)

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val scale = args.headOption.map(_.toInt).getOrElse(10)
    // optional comma-list of label prefixes: run only matching families
    // (e.g. "30 covariance,semantic,token" probes the quadratic-risk
    // families at 30x without paying for the full linear sweep)
    val only: Option[Seq[String]] = args.lift(1).map(_.split(",").toSeq)

    // cache BOTH sides so 1x vs Nx compares compute, not IO
    val docs1 = Tables.documents(spark, dir).cache()
    val docsN = replicate(docs1, Seq("doc_id"), scale, 1000000L).cache()
    val emb1 = Tables.embeddings(spark, dir).cache()
    val embN = replicate(emb1, Seq("vec_id"), scale, 1000000L).cache()
    val li1 = Tables.lineitem(spark, dir).cache()
    val liN = (0 until scale).map(_ => li1).reduce(_ unionAll _).cache()
    val ev1 = Tables.events(spark, dir).cache()
    val evN = replicate(ev1, Seq("event_id", "user_id"), scale, 10000000L).cache()
    println(s"[probe] docs ${docs1.count()}/${docsN.count()}, emb ${emb1.count()}/${embN.count()}, " +
      s"lineitem ${li1.count()}/${liN.count()}, events ${ev1.count()}/${evN.count()}")

    // min of 2 runs: the first pays one-off plan/codegen/cache-fill costs
    def probe(label: String, f1: => Long, fN: => Long): Unit = {
      if (only.forall(_.exists(label.startsWith))) {
        val t1 = Seq(time(s"$label 1x warm")(f1)._2, time(s"$label 1x")(f1)._2).min
        val tN = Seq(time(s"$label ${scale}x warm")(fN)._2,
          time(s"$label ${scale}x")(fN)._2).min
        println(f"[probe] $label%-34s ratio ${tN / t1}%6.1f (linear = $scale)")
      }
    }
    // noop sink: counts let Catalyst prune the computed columns entirely
    def cnt(df: DataFrame): Long = {
      df.write.format("noop").mode("overwrite").save(); 0L
    }

    probe("exact dedup",
      cnt(Dedup.exactDedup(docs1, "doc_id", "text")),
      cnt(Dedup.exactDedup(docsN, "doc_id", "text")))
    probe("minhash lsh pairs",
      cnt(Dedup.minhashLshPairs(docs1, "doc_id", "text")),
      cnt(Dedup.minhashLshPairs(docsN, "doc_id", "text")))
    probe("simhash pairs",
      cnt(Dedup.simhashPairs(docs1, "doc_id", "text")),
      cnt(Dedup.simhashPairs(docsN, "doc_id", "text")))
    probe("text analysis (fused kernel)",
      cnt(docs1.select(TextOps.textStats(col("text")).as("st"))
        .where(col("st.n_tokens") >= 0)),
      cnt(docsN.select(TextOps.textStats(col("text")).as("st"))
        .where(col("st.n_tokens") >= 0)))
    probe("ann lsh topk",
      cnt(Similarity.lshTopK(emb1, "vec_id", "embedding",
        pmod(col("vec_id"), lit(100)) === 0, 5)),
      cnt(Similarity.lshTopK(embN, "vec_id", "embedding",
        pmod(col("vec_id"), lit(1000)) === 0, 5)))
    probe("window recurrence (W1)",
      cnt(SeqOps.discountedReturn(ev1, "user_id",
        Seq(col("ts"), col("event_id")), col("value"), 0.99, "r")),
      cnt(SeqOps.discountedReturn(evN, "user_id",
        Seq(col("ts"), col("event_id")), col("value"), 0.99, "r")))
    probe("groupBy agg (a_stats shape)",
      cnt(li1.groupBy(col("l_returnflag")).agg(sum(col("l_quantity")))),
      cnt(liN.groupBy(col("l_returnflag")).agg(sum(col("l_quantity")))))
    probe("scd2 history (window chain)",
      cnt(graft.streaming.StreamingOps.scd2History(
        ev1.where(col("event_type") === "purchase"))),
      cnt(graft.streaming.StreamingOps.scd2History(
        evN.where(col("event_type") === "purchase"))))
    val ord1 = Tables.orders(spark, dir).where(col("o_totalprice") > 480000.0).cache()
    ord1.count()
    probe("bloom semi join (probe side Nx)",
      cnt(BloomJoin.bloomSemiJoin(li1, "l_orderkey", ord1, "o_orderkey")),
      cnt(BloomJoin.bloomSemiJoin(liN, "l_orderkey", ord1, "o_orderkey")))
    probe("decontamination (8-gram probe)",
      cnt(TextOps.contaminationReport(docs1, "doc_id", "text", pmod(col("doc_id"), lit(10)) === 7)),
      cnt(TextOps.contaminationReport(docsN, "doc_id", "text", pmod(col("doc_id"), lit(10)) === 7)))
    probe("repetition stats",
      cnt(TextOps.repetitionStats(docs1, "doc_id", "text")),
      cnt(TextOps.repetitionStats(docsN, "doc_id", "text")))
    probe("document chunking (32/24)",
      cnt(Curation.chunkDocuments(docs1, "doc_id", "text", 32, 24)),
      cnt(Curation.chunkDocuments(docsN, "doc_id", "text", 32, 24)))
    // gather needs a DENSE position domain: replicate with span = row count
    val evDense = replicate(ev1, Seq("event_id"), scale, ev1.count()).cache()
    evDense.count()
    probe("gather sample (2048 draws)",
      cnt(JoinOps.gatherSample(ev1, "event_id", 2048, 7)),
      cnt(JoinOps.gatherSample(evDense, "event_id", 2048, 7)))
    val tr1 = Tables.transitions(spark, dir).cache()
    val trN = replicate(tr1, Seq("episode_id"), scale, 10000000L).cache()
    println(s"[probe] transitions ${tr1.count()}/${trN.count()}")
    probe("trajectory outlier filter",
      cnt(SeqOps.dropOutlierTrajectories(tr1, "episode_id", col("cost"), 0.025, 1)),
      cnt(SeqOps.dropOutlierTrajectories(trN, "episode_id", col("cost"), 0.025, 1)))
    probe("pii redaction",
      cnt(docs1.select(TextOps.redactPii(col("text")).as("r"))),
      cnt(docsN.select(TextOps.redactPii(col("text")).as("r"))))
    probe("quality classifier",
      cnt(docs1.select(TextOps.classifierScore(col("text")).as("s"))),
      cnt(docsN.select(TextOps.classifierScore(col("text")).as("s"))))
    import spark.implicits._
    val block = Seq("src12.example.com").toDF("domain")
    def withUrl(d: DataFrame): DataFrame = d.withColumn("url",
      concat(lit("https://"), col("source"), pmod(col("doc_id"), lit(7)).cast("string"),
        lit(".example.com/p/"), col("doc_id").cast("string")))
    probe("domain cap (10 best per host)",
      cnt(TextOps.domainCap(withUrl(docs1), "url",
        Seq(col("n_chars").desc, col("doc_id").asc), 10, block)),
      cnt(TextOps.domainCap(withUrl(docsN), "url",
        Seq(col("n_chars").desc, col("doc_id").asc), 10, block)))
    val targets = Map("src0" -> 25, "src1" -> 25, "src2" -> 20, "src3" -> 15, "src4" -> 15)
    probe("source mixture resample",
      cnt(Curation.mixtureSample(docs1, "doc_id", "source", targets)),
      cnt(Curation.mixtureSample(docsN, "doc_id", "source", targets)))
    // budget FIXED across scales (a training recipe's token budget doesn't
    // grow with the crawl): 10× must prune the extra corpus before the window
    probe("token budget select (fixed budget)",
      cnt(Curation.tokenBudgetSelect(docs1, "doc_id", col("n_chars").cast("double"),
        col("n_chars"), 150000L)),
      cnt(Curation.tokenBudgetSelect(docsN, "doc_id", col("n_chars").cast("double"),
        col("n_chars"), 150000L)))

    // round-7 second batch: sketchy/statistical families. Seed predicate
    // fixed → k identical at 1x and Nx, so the probe isolates the corpus
    // scan term (the k·d term is constant by construction).
    probe("kmeans fit (2 iters, fixed k)",
      cnt(Similarity.kmeansFit(emb1, "vec_id", "embedding",
        pmod(col("vec_id"), lit(997)) === 3, iters = 2)),
      cnt(Similarity.kmeansFit(embN, "vec_id", "embedding",
        pmod(col("vec_id"), lit(997)) === 3, iters = 2)))
    probe("heavy hitters (MG 64 per source)",
      cnt(graft.Graft.heavyHitters(docs1.select(col("source"),
        explode(TextOps.tokens(col("text"))).as("t")), col("t"), Seq(col("source")), 64)),
      cnt(graft.Graft.heavyHitters(docsN.select(col("source"),
        explode(TextOps.tokens(col("text"))).as("t")), col("t"), Seq(col("source")), 64)))
    probe("bigram LM perplexity",
      cnt(TextOps.lmPerplexityScore(docs1, "doc_id", "text")),
      cnt(TextOps.lmPerplexityScore(docsN, "doc_id", "text")))
    probe("covariance matrix (64-dim)",
      cnt(Similarity.covarianceMatrix(emb1, "embedding")),
      cnt(Similarity.covarianceMatrix(embN, "embedding")))
    probe("priority sample (k=1000)",
      cnt(Curation.prioritySample(docs1, "doc_id",
        col("n_chars").cast("double"), 1000, "p")),
      cnt(Curation.prioritySample(docsN, "doc_id",
        col("n_chars").cast("double"), 1000, "p")))
    // semantic dedup: centroid count scales ~√N (the documented policy —
    // cells ~√N keeps assignment broadcast AND per-cell pairwise both
    // sublinear), so within-cell pair volume grows ~√scale·N, i.e. the
    // expected ratio is ~scale·√scale (≈32 at 10×), NOT linear. The probe
    // verifies it stays FAR below the ~100× an unclustered all-pairs pass
    // would cost.
    // seed modulus ≈ 89·√scale keeps cells ∝ √(corpus): 281 at 10x,
    // 487 at 30x — the documented sizing policy applied per scale point
    val semMod = math.max(89L, math.round(89.0 * math.sqrt(scale.toDouble)))
    probe("semantic dedup (sqrt-N cells)",
      cnt(Similarity.semanticDedup(emb1, "vec_id", "embedding",
        pmod(col("vec_id"), lit(89)) === 7, 0.3)),
      cnt(Similarity.semanticDedup(embN, "vec_id", "embedding",
        pmod(col("vec_id"), lit(semMod)) === 7, 0.3)))
    probe("winsorize (rank-quantile clamp)",
      cnt(AggOps.winsorize(li1, Seq("l_returnflag"), "l_extendedprice", 0.05, 0.95)),
      cnt(AggOps.winsorize(liN, Seq("l_returnflag"), "l_extendedprice", 0.05, 0.95)))
    probe("curriculum order (level prefix)",
      cnt(Curation.curriculumOrder(docs1, "doc_id", "source",
        (col("n_chars") / 100).cast("long").cast("double"))),
      cnt(Curation.curriculumOrder(docsN, "doc_id", "source",
        (col("n_chars") / 100).cast("long").cast("double"))))
    probe("anomaly 3-sigma (20-row frame)",
      cnt(ev1.select(col("user_id"), col("ts"), col("event_id"), col("value"))
        .withColumn("s1", sum(col("value")).over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("user_id"))
            .orderBy(col("ts"), col("event_id")).rowsBetween(-20, -1)))),
      cnt(evN.select(col("user_id"), col("ts"), col("event_id"), col("value"))
        .withColumn("s1", sum(col("value")).over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("user_id"))
            .orderBy(col("ts"), col("event_id")).rowsBetween(-20, -1)))))
    // shard count FIXED across scales (shards are an output-layout choice):
    // the level-prefix join stays distinct-size-bounded at any corpus size
    probe("shard manifest (8 shards)",
      cnt(Curation.shardManifest(docs1, "doc_id", col("n_chars"), 8)),
      cnt(Curation.shardManifest(docsN, "doc_id", col("n_chars"), 8)))
    probe("epoch shuffle (3 epochs)",
      cnt(Curation.epochShuffle(docs1, "doc_id", 3)),
      cnt(Curation.epochShuffle(docsN, "doc_id", 3)))
    // round-8 additions: duplicated spans (window over deduped pairs —
    // expect ~linear; hot grams make fat-but-streaming count frames),
    // PQ train/encode (broadcast folds — expect ~linear in the corpus
    // with the k·dim term fixed by the frozen seed predicate), and the
    // Count-Min sketch (pure partial+merge — expect ~linear).
    probe("duplicated spans (8-gram)",
      cnt(TextOps.duplicatedSpans(docs1, "doc_id", "text")),
      cnt(TextOps.duplicatedSpans(docsN, "doc_id", "text")))
    probe("pq train (m=2, 2 iters)",
      cnt(Similarity.pqTrain(emb1, "vec_id", "embedding", 2, 64,
        pmod(col("vec_id"), lit(997)) === 3, iters = 2)),
      cnt(Similarity.pqTrain(embN, "vec_id", "embedding", 2, 64,
        pmod(col("vec_id"), lit(997)) === 3, iters = 2)))
    probe("count-min sketch (3x64)", {
      val cms = org.apache.spark.sql.functions.udaf(new CountMinAggregator(3, 64))
      cnt(docs1.select(explode(TextOps.tokens(col("text"))).as("t"))
        .agg(cms(col("t")).as("sk")))
    }, {
      val cms = org.apache.spark.sql.functions.udaf(new CountMinAggregator(3, 64))
      cnt(docsN.select(explode(TextOps.tokens(col("text"))).as("t"))
        .agg(cms(col("t")).as("sk")))
    })
    probe("url canonical dedup",
      cnt(docs1.groupBy(TextOps.canonicalUrl(concat(lit("https://h"),
        (col("doc_id") % 999).cast("string"), lit(".ex.com/p/"),
        col("doc_id").cast("string"), lit("?utm_source=x&a=1"))).as("u"))
        .agg(count(lit(1)))),
      cnt(docsN.groupBy(TextOps.canonicalUrl(concat(lit("https://h"),
        (col("doc_id") % 999).cast("string"), lit(".ex.com/p/"),
        col("doc_id").cast("string"), lit("?utm_source=x&a=1"))).as("u"))
        .agg(count(lit(1)))))
    // round-8 third batch. Expectations: paragraph dedup ~linear (three
    // unit-keyed exchanges of fp-sized rows); BPE ~linear (one corpus
    // word count; the replicated corpus repeats the same words, so the
    // vocab iterations are constant by construction — as in production,
    // where vocab grows ≪ corpus); drift ~linear (sources×vocab grid is
    // corpus-independent); bloom cross-corpus ~linear (replicas make the
    // ref contain every shard text — worst case: everything bloom-positive
    // → the residual anti join sees the full shard); skew report ~linear
    // (the same count shuffle a real query pays); frame fan-out and PCA
    // apply ~linear (pure projections; the component is trained at 1×
    // both times to isolate the apply step).
    probe("paragraph dedup (8-token units)",
      cnt(Dedup.paragraphDedup(docs1, "doc_id", "text")),
      cnt(Dedup.paragraphDedup(docsN, "doc_id", "text")))
    probe("bpe merges (3 iterations)",
      cnt(TextOps.bpeMerges(docs1, "doc_id", "text", merges = 3)),
      cnt(TextOps.bpeMerges(docsN, "doc_id", "text", merges = 3)))
    probe("corpus drift (KL by source)",
      cnt(TextOps.corpusDriftBySource(docs1, "doc_id", "text", "source")),
      cnt(TextOps.corpusDriftBySource(docsN, "doc_id", "text", "source")))
    probe("cross-corpus bloom dedup",
      cnt(Dedup.dedupAgainstReferenceBloom(
        docs1.where(pmod(col("doc_id"), lit(4)) === 0),
        docs1.where(pmod(col("doc_id"), lit(4)) =!= 0), "doc_id", "text")),
      cnt(Dedup.dedupAgainstReferenceBloom(
        docsN.where(pmod(col("doc_id"), lit(4)) === 0),
        docsN.where(pmod(col("doc_id"), lit(4)) =!= 0), "doc_id", "text")))
    probe("key-skew report (3 keys)",
      cnt(DataProfile.keySkewReport(li1, Seq("l_orderkey", "l_returnflag", "l_suppkey"))),
      cnt(DataProfile.keySkewReport(liN, Seq("l_orderkey", "l_returnflag", "l_suppkey"))))
    probe("frame sample + resize (k=4)", {
      val e = Multimodal.enrich(docs1, "doc_id", "text")
      cnt(Multimodal.frameSample(e, "doc_id", "media", 4))
    }, {
      val e = Multimodal.enrich(docsN, "doc_id", "text")
      cnt(Multimodal.frameSample(e, "doc_id", "media", 4))
    })
    val pc1 = Similarity.pcaPowerIteration(emb1, "embedding", 64, iters = 2).cache()
    pc1.count()
    probe("pca project (trained component)",
      cnt(Similarity.pcaProject(emb1, "vec_id", "embedding", pc1)),
      cnt(Similarity.pcaProject(embN, "vec_id", "embedding", pc1)))
    probe("semantic decontaminate (bench 1x)",
      cnt(Similarity.semanticDecontaminate(emb1, "vec_id", "embedding",
        emb1.where(pmod(col("vec_id"), lit(97)) === 5), "embedding")),
      cnt(Similarity.semanticDecontaminate(embN, "vec_id", "embedding",
        emb1.where(pmod(col("vec_id"), lit(97)) === 5), "embedding")))
    // round-8 fourth batch: content-defined chunking (O(len·w) HOF hash →
    // fp-keyed ledger — expect ~linear), PMI collocations (vocab-bounded
    // counts + TakeOrdered — ~linear), BPE apply (broadcast fuse
    // projection — ~linear; merge table trained at 1× both times to
    // isolate the apply), cohort retention (two user-keyed aggregates).
    probe("cdc chunk dedup (rolling hash)",
      cnt(Dedup.cdcChunkDedup(docs1, "doc_id", "text")),
      cnt(Dedup.cdcChunkDedup(docsN, "doc_id", "text")))
    probe("pmi collocations (top 20)",
      cnt(TextOps.collocations(docs1, "doc_id", "text")),
      cnt(TextOps.collocations(docsN, "doc_id", "text")))
    val merges1 = TextOps.bpeMerges(docs1, "doc_id", "text", merges = 3).cache()
    merges1.count()
    probe("bpe apply (trained at 1x)",
      cnt(TextOps.bpeApply(docs1, "doc_id", "text", merges1, k = 3)),
      cnt(TextOps.bpeApply(docsN, "doc_id", "text", merges1, k = 3)))
    probe("cohort retention",
      cnt({
        val wk = expr("ts div 604800000000000").as("week")
        val e = ev1.select(col("user_id"), wk)
        val c = e.groupBy(col("user_id")).agg(min(col("week")).as("cw"))
        e.distinct().join(c, Seq("user_id"))
          .groupBy(col("cw"), (col("week") - col("cw")).as("off"))
          .agg(count_distinct(col("user_id")).as("n"))
      }),
      cnt({
        val wk = expr("ts div 604800000000000").as("week")
        val e = evN.select(col("user_id"), wk)
        val c = e.groupBy(col("user_id")).agg(min(col("week")).as("cw"))
        e.distinct().join(c, Seq("user_id"))
          .groupBy(col("cw"), (col("week") - col("cw")).as("off"))
          .agg(count_distinct(col("user_id")).as("n"))
      }))
    // round-9 batch. PQ ADC: query stripe held CONSTANT (the ann-lsh
    // convention: %100 at 1x, %(100·scale) at Nx) so the probe isolates
    // the N-side of the N·Q candidate term — flat ADC must grow ~linear
    // in N; the IVF+PQ composition probes 2 of ~N/89 cells, so its
    // per-query candidate set is ~constant and the growth should track
    // the (linear) assignment scans instead. Dup-span fraction: gram
    // explode + gh-keyed window + doc rollup — ~linear. Codebooks are
    // trained at 1x both sides to isolate the search stage.
    val cb1 = Similarity.pqTrain(emb1, "vec_id", "embedding", m = 2, dim = 64,
      seedPred = pmod(col("vec_id"), lit(97)) === 3, iters = 2).cache()
    cb1.count()
    probe("pq adc search (trained at 1x)",
      cnt(Similarity.pqSearch(emb1, "vec_id", "embedding", 2, 64, cb1,
        pmod(col("vec_id"), lit(100)) === 0, 5)),
      cnt(Similarity.pqSearch(embN, "vec_id", "embedding", 2, 64, cb1,
        pmod(col("vec_id"), lit(100L * scale)) === 0, 5)))
    probe("ivf+pq search (trained at 1x)",
      cnt(Similarity.ivfPqSearch(emb1, "vec_id", "embedding", 2, 64, cb1,
        pmod(col("vec_id"), lit(89)) === 1,
        pmod(col("vec_id"), lit(100)) === 0, 5, nprobe = 2)),
      cnt(Similarity.ivfPqSearch(embN, "vec_id", "embedding", 2, 64, cb1,
        pmod(col("vec_id"), lit(89)) === 1,
        pmod(col("vec_id"), lit(100L * scale)) === 0, 5, nprobe = 2)))
    // round-11 two-stage: IVFADC shortlist (20) → exact re-rank; the
    // exact stage adds one un-shuffled corpus scan + a broadcast
    // candidate prune, so the ratio should track ivf+pq search
    probe("two-stage rerank (trained at 1x)",
      cnt(Similarity.ivfPqRerank(emb1, "vec_id", "embedding", 2, 64, cb1,
        pmod(col("vec_id"), lit(89)) === 1,
        pmod(col("vec_id"), lit(100)) === 0, 5, nprobe = 2, shortlist = 20)),
      cnt(Similarity.ivfPqRerank(embN, "vec_id", "embedding", 2, 64, cb1,
        pmod(col("vec_id"), lit(89)) === 1,
        pmod(col("vec_id"), lit(100L * scale)) === 0, 5, nprobe = 2,
        shortlist = 20)))
    probe("dup span fraction (8-gram)",
      cnt(TextOps.duplicatedSpans(docs1, "doc_id", "text", n = 8)),
      cnt(TextOps.duplicatedSpans(docsN, "doc_id", "text", n = 8)))
    // BPE merge-count axis: FIXED data, growing k — the unrolled vocab
    // loop's lineage grows with k, measuring where the bpeMerges
    // scaladoc's "checkpoint beyond a handful of merges" advice binds.
    // Time per merge should stay roughly flat while the analysis cost of
    // the deeper plan creeps; a superlinear blow-up would mean the
    // unrolled form needs the e2e_train_kstep localCheckpoint treatment
    // sooner than documented.
    probe("edit distance join (d=2, q=2)",
      cnt(Dedup.editDistanceJoin(docs1, "doc_id",
        lower(substring(col("text"), 1, 40)), maxDist = 2, q = 2)),
      cnt(Dedup.editDistanceJoin(docsN, "doc_id",
        lower(substring(col("text"), 1, 40)), maxDist = 2, q = 2)))
    probe("dsir weights (128 buckets)",
      cnt(Curation.dsirWeights(docs1, "text", col("lang") === "en")),
      cnt(Curation.dsirWeights(docsN, "text", col("lang") === "en")))
    probe("zipf fit (top 30 per source)",
      cnt(TextOps.zipfFit(docs1, "doc_id", "source", "text")),
      cnt(TextOps.zipfFit(docsN, "doc_id", "source", "text")))
    def hll(docs: DataFrame) = HyperLogLog.estimate(
      HyperLogLog.registers(
        docs.select(col("source"), explode(TextOps.tokens(col("text"))).as("tok")),
        "source", col("tok")), "source")
    probe("hll distinct (p=8)", cnt(hll(docs1)), cnt(hll(docsN)))
    def prEdges(ev: DataFrame) = GraphOps.transitionEdges(ev, "user_id",
      Seq(col("ts"), col("event_id")),
      get_json_object(col("props"), "$.k").cast("long"))
    probe("pagerank (5 iters, 100 states)",
      cnt(GraphOps.pagerank(prEdges(ev1))),
      cnt(GraphOps.pagerank(prEdges(evN))))
    // round-9 third batch. Weighted sample: k fixed (a sample size is a
    // recipe choice) → projection + TakeOrdered, expect ~linear scan
    // cost. Session paths: one user-keyed window + TakeOrdered over a
    // state-bounded n-gram table — ~linear. PPR/HITS: same node-bounded
    // iteration state as pagerank (the probed graph keeps 100 states at
    // any event scale), so like pagerank they should be iteration-
    // overhead-bound, ratio ≪ scale. BM25: the term-pruned token stream
    // is the only corpus-sized frame; query fixed at 4 terms → ~linear.
    probe("weighted sample (k=1000)",
      cnt(Curation.weightedSample(docs1, "doc_id",
        col("n_chars").cast("double"), 1000)),
      cnt(Curation.weightedSample(docsN, "doc_id",
        col("n_chars").cast("double"), 1000)))
    probe("session paths (3-step top 20)",
      cnt(GraphOps.topPaths(ev1, "user_id", Seq(col("ts"), col("event_id")),
        get_json_object(col("props"), "$.k").cast("long"))),
      cnt(GraphOps.topPaths(evN, "user_id", Seq(col("ts"), col("event_id")),
        get_json_object(col("props"), "$.k").cast("long"))))
    val seeds10 = spark.range(0, 10).select(col("id").as("node"))
    probe("personalized pagerank (10 seeds)",
      cnt(GraphOps.pagerankPersonalized(prEdges(ev1), seeds10)),
      cnt(GraphOps.pagerankPersonalized(prEdges(evN), seeds10)))
    probe("hits (5 iters, 100 states)",
      cnt(GraphOps.hits(prEdges(ev1))),
      cnt(GraphOps.hits(prEdges(evN))))
    val bmTerms = Seq("spark", "vector", "merge", "stream").toDF("term")
    probe("bm25 (4-term query)",
      cnt(TextOps.bm25TopDocs(docs1, "doc_id", "text", bmTerms)),
      cnt(TextOps.bm25TopDocs(docsN, "doc_id", "text", bmTerms)))
    // triangle counts: the probed graph saturates (100 states → the
    // distinct-edge set stops growing), so the ratio measures the
    // canonicalize+distinct scan; the wedge join itself is bounded by
    // the degree-ordered orientation (out-degree O(√m)) either way
    probe("triangle counts (100 states)",
      cnt(GraphOps.triangleCounts(prEdges(ev1))),
      cnt(GraphOps.triangleCounts(prEdges(evN))))
    probe("hop distances (10 seeds, 5 rounds)",
      cnt(GraphOps.hopDistances(prEdges(ev1), seeds10)),
      cnt(GraphOps.hopDistances(prEdges(evN), seeds10)))
    // open-graph triangle probe: the transition graph saturates at 100
    // states, so this one grows the NODE set with scale at fixed degree
    // (the crawl-graph regime). Expected ~linear in m: bounded degree ⇒
    // wedge volume m·d, and the degree orientation caps the worst node
    def synthGraph(n: Long): DataFrame =
      spark.range(n).select(col("id").as("src"),
          explode(sequence(lit(1), lit(8))).as("k"))
        .select(col("src"),
          pmod(col("src") + col("k") * lit(7919L), lit(n)).as("dst"),
          lit(1L).as("weight"))
    probe("triangle counts (open graph, d=8)",
      cnt(GraphOps.triangleCounts(synthGraph(20000L))),
      cnt(GraphOps.triangleCounts(synthGraph(20000L * scale))))
    // round-11: the same NODE-GROWING protocol for the iterative ops —
    // the 100-state probes above measure iteration overhead only; these
    // grow the node/edge set at fixed degree (the crawl-graph regime).
    // Per-iteration cost is one edge-keyed join + one dst groupBy, both
    // linear in m, plus node-cardinality scalar aggregates → expect
    // ratio ≪ scale at small n (overhead-bound) trending to ~linear.
    probe("pagerank (open graph, d=8)",
      cnt(GraphOps.pagerank(synthGraph(20000L))),
      cnt(GraphOps.pagerank(synthGraph(20000L * scale))))
    probe("personalized pagerank (open graph)",
      cnt(GraphOps.pagerankPersonalized(synthGraph(20000L), seeds10)),
      cnt(GraphOps.pagerankPersonalized(synthGraph(20000L * scale), seeds10)))
    probe("hits (open graph, d=8)",
      cnt(GraphOps.hits(synthGraph(20000L))),
      cnt(GraphOps.hits(synthGraph(20000L * scale))))
    probe("hop distances (open graph)",
      cnt(GraphOps.hopDistances(synthGraph(20000L), seeds10)),
      cnt(GraphOps.hopDistances(synthGraph(20000L * scale), seeds10)))
    // round-11 checkpoint-cadence A/B (not a 1x-vs-Nx probe): materialize
    // every iteration vs every 2nd on the x8-shaped event graph —
    // lineage doubles only per unmaterialized step, so ckpt=2 halves the
    // materializations for one extra re-execution per cut
    if (only.forall(_.exists("checkpoint cadence".startsWith))) {
      Seq(("pagerank", 1), ("pagerank", 2), ("hits", 1), ("hits", 2))
        .foreach { case (op, every) =>
          val run: () => Long = op match {
            case "pagerank" => () =>
              cnt(GraphOps.pagerank(prEdges(evN), checkpointEvery = every))
            case _ => () =>
              cnt(GraphOps.hits(prEdges(evN), checkpointEvery = every))
          }
          val t = Seq(time(s"$op ckpt=$every warm")(run())._2,
            time(s"$op ckpt=$every")(run())._2).min
          println(f"[probe] checkpoint cadence $op every=$every $t%8.2f s")
        }
    }
    // containment shares jaccard's candidate machinery — the probe
    // measures the rare-shingle pair fan-out under replication (exact
    // copies share EVERY shingle, so df of their shingles grows with
    // scale and leaves the [2, maxDf] rare band — candidates shrink)
    probe("containment pairs (rare shingles)",
      cnt(Dedup.containmentPairs(docs1, "doc_id", "text")),
      cnt(Dedup.containmentPairs(docsN, "doc_id", "text")))
    // trainer: k=2 steps; corpus featurized once, iterations touch the
    // feature tables — expect ~linear in the corpus scan
    probe("train classifier (32 buckets, 2 steps)",
      cnt(TextOps.trainHashClassifier(docs1, "doc_id", "text",
        col("lang") === "en", buckets = 32, iters = 2)),
      cnt(TextOps.trainHashClassifier(docsN, "doc_id", "text",
        col("lang") === "en", buckets = 32, iters = 2)))
    if (only.forall(_.exists("bpe merge-count".startsWith)))
      Seq(2, 4, 8).foreach { k =>
        val t = Seq(
          time(s"bpe merge-count k=$k warm")(
            cnt(TextOps.bpeMerges(docs1, "doc_id", "text", merges = k)))._2,
          time(s"bpe merge-count k=$k")(
            cnt(TextOps.bpeMerges(docs1, "doc_id", "text", merges = k)))._2).min
        println(f"[probe] bpe merge-count k=$k%-22d $t%8.2f s (${t / k}%.2f s/merge)")
      }
    // streaming ANN index maintenance: per-batch cost as the MAINTAINED
    // index grows — the assign is O(new · k·d) by design, but each batch
    // also anti-joins the accumulated pid ledger (a one-column columnar
    // read of the index), which is the only corpus-order term. The probe
    // prices first/mid/last batch at 1x and Nx corpus and at a 3x batch
    // count so that term's growth is measured, not asserted.
    if (only.forall(_.exists("ann index maintenance".startsWith))) {
      implicit val sqlCtx = spark.sqlContext
      import spark.implicits._
      // kmeansFit emits long-form (cell, pos, coord, n); the index ops
      // take dense (cell, cv) — same collapse ivfTopK's callers use
      val cents = Similarity.kmeansFit(emb1, "vec_id", "embedding",
          pmod(col("vec_id"), lit(400)) === 0, iters = 2)
        .groupBy(col("cell"))
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("coord")))),
          s => s.getField("coord")).as("cv")).cache()
      cents.count(): Unit
      def run(label: String, src: DataFrame, batches: Int): Unit = {
        val dir = java.nio.file.Files.createTempDirectory("graft_annidx").toString
        val ckpt = java.nio.file.Files.createTempDirectory("graft_annidx_ck").toString
        val rows = src.select(col("vec_id").cast("long"), col("embedding"))
          .as[(Long, Array[Float])].collect()
        val mem = org.apache.spark.sql.execution.streaming.runtime
          .MemoryStream[(Long, Array[Float])]
        val q = graft.streaming.StreamingOps.incrementalAnnIndex(
          mem.toDF().toDF("vec_id", "embedding"), "vec_id", "embedding",
          cents, s"$dir/index", ckpt)
        val per = rows.grouped(math.max(1, rows.length / batches)).toSeq.map { chunk =>
          val t0 = System.nanoTime()
          mem.addData(chunk: _*); q.processAllAvailable()
          (System.nanoTime() - t0) / 1e9
        }
        q.stop()
        println(f"[probe] ann index maintenance $label%-18s first=${per.head}%6.2f s mid=${per(per.length / 2)}%6.2f s last=${per.last}%6.2f s total=${per.sum}%7.2f s (${per.length} batches)")
      }
      run("1x/8", emb1, 8)
      run(s"${scale}x/8", embN, 8)
      run(s"${scale}x/24", embN, 24)
    }
    // shared vocabulary-rich derived corpus for the BPE probes: 16
    // base-26 words per doc from a 50k-type universe (conv 10->26,
    // digits translated to letters) — both probe blocks MUST price the
    // same corpus or their s/merge comparison is meaningless
    def richCorpus(src: DataFrame): DataFrame = {
      def b26(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
        translate(lower(conv(c.cast("string"), 10, 26)), "0123456789", "qrstuvwxyz")
      src.select(col("doc_id"), concat_ws(" ",
        (0 until 16).map(j =>
          b26(pmod(col("doc_id") * lit(7) + lit(j * 9973), lit(50000)))): _*)
        .as("text"))
    }
    // streaming near-dedup, pairwise vs transitive: same doc stream
    // through both modes — prices the transitive mode's honest costs
    // (shingle ledger state, cross-batch candidate join against ALL seen
    // docs rather than survivors) per batch as the ledger accumulates.
    if (only.forall(_.exists("near-dedup streaming".startsWith))) {
      implicit val sqlCtx = spark.sqlContext
      import spark.implicits._
      val rows = docs1.select(col("doc_id"), col("text"))
        .as[(Long, String)].collect().sortBy(_._1)
      def run(label: String, transitive: Boolean): Unit = {
        val dir = java.nio.file.Files.createTempDirectory("graft_ndp").toString
        val (corpus, ledger, ckpt) = (s"$dir/corpus", s"$dir/ledger", s"$dir/ckpt")
        val mem = org.apache.spark.sql.execution.streaming.runtime
          .MemoryStream[(Long, String)]
        val docsStream = mem.toDF().toDF("doc_id", "text")
        val q = if (transitive)
          graft.streaming.StreamingOps.incrementalNearDedupTransitive(
            docsStream, "doc_id", "text", corpus, ledger, ckpt)
        else graft.streaming.StreamingOps.incrementalNearDedup(
          docsStream, "doc_id", "text", corpus, ledger, ckpt)
        val per = rows.grouped(math.max(1, rows.length / 10)).toSeq.map { chunk =>
          val t0 = System.nanoTime()
          mem.addData(chunk: _*); q.processAllAvailable()
          (System.nanoTime() - t0) / 1e9
        }
        q.stop()
        val ledgerRows = spark.read.parquet(ledger).count()
        val ledgerBytes = {
          val p = new org.apache.hadoop.fs.Path(ledger)
          val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
          fs.getContentSummary(p).getLength
        }
        println(f"[probe] near-dedup streaming $label%-11s first=${per.head}%6.2f s mid=${per(per.length / 2)}%6.2f s last=${per.last}%6.2f s total=${per.sum}%7.2f s ledger=$ledgerRows rows/${ledgerBytes / 1024} KiB")
      }
      run("pairwise", transitive = false)
      run("transitive", transitive = true)
    }
    // production-vocab BPE: the sf0.1 corpus has only 31 word TYPES
    // (synthetic lang-id text), so per-merge cost at tokenizer-training
    // k needs a vocabulary-rich input. Derive one from doc ids — 16
    // base-26 words per doc drawn from a 50k-type universe (conv 10→26,
    // digits translated to letters), giving the ~real shape: vocab-sized
    // merge loop over a corpus-sized one-off word count. Sweeps
    // checkpointEvery at k=200 to MEASURE the replay/IO sweet spot
    // SCALING.md previously asserted, then prices k=1000 at the winner.
    if (only.forall(_.exists("bpe production".startsWith))) {
      val rich = richCorpus(docs1).cache()
      println(s"[probe] bpe production vocab: ${rich.select(explode(split(col("text"), " ")).as("w")).distinct().count()} word types")
      val cadences = sys.env.get("SPARK_GRAFT_BPE_SWEEP")
        .map(_.split(",").toSeq.map(_.toInt)).getOrElse(Seq(2, 4, 8, 16, 32))
      cadences.foreach { every =>
        val (_, t) = time(s"bpe production k=200 ckpt=$every")(
          cnt(TextOps.bpeMerges(rich, "doc_id", "text", merges = 200,
            checkpointEvery = every)))
        println(f"[probe] bpe production k=200 ckpt=$every%-3d $t%8.2f s (${t / 200}%.3f s/merge)")
      }
      val kBig = sys.env.getOrElse("SPARK_GRAFT_BPE_K", "1000").toInt
      val best = sys.env.getOrElse("SPARK_GRAFT_BPE_CKPT", "8").toInt
      val (_, t) = time(s"bpe production k=$kBig ckpt=$best")(
        cnt(TextOps.bpeMerges(rich, "doc_id", "text", merges = kBig,
          checkpointEvery = best)))
      println(f"[probe] bpe production k=$kBig ckpt=$best $t%8.2f s (${t / kBig}%.3f s/merge)")
      rich.unpersist(): Unit
    }
    // driver-resident merge loop at tokenizer scale: same derived
    // vocabulary; the word count stays distributed, the k-merge loop is
    // in-memory incremental pair counting
    if (only.forall(_.exists("bpe local".startsWith))) {
      val rich = richCorpus(docs1).cache()
      rich.count(): Unit
      Seq(1000, 10000, 30000).foreach { k =>
        val (n, t) = time(s"bpe local k=$k")(
          TextOps.bpeMergesLocal(rich, "doc_id", "text", merges = k).count())
        println(f"[probe] bpe local k=$k%-6d $t%8.2f s (${t * 1000 / k}%.2f ms/merge, $n merges emitted)")
      }
      rich.unpersist(): Unit
    }
    // round-13: byte-level trainer at tokenizer scale — same derived
    // vocabulary as "bpe local"; symbols start as hex byte pairs, so the
    // loop carries ~2× the string length per symbol. Prices that
    // constant against the char loop on the identical corpus.
    if (only.forall(_.exists("bpe bytes".startsWith))) {
      val rich = richCorpus(docs1).cache()
      rich.count(): Unit
      Seq(1000, 10000, 30000).foreach { k =>
        val (n, t) = time(s"bpe bytes k=$k")(
          TextOps.bpeMergesBytes(rich, "doc_id", "text", merges = k,
            wordsOf = TextOps.tokens).count())
        println(f"[probe] bpe bytes k=$k%-6d $t%8.2f s (${t * 1000 / k}%.2f ms/merge, $n merges emitted)")
      }
      rich.unpersist(): Unit
    }
    // round-13: top-k PCA — the covariance reduction is the only
    // corpus-sized stage (probed ~linear above); this prices the whole
    // op (reduction + driver deflation loop) so the driver term is
    // MEASURED as scale-invariant, not asserted.
    probe("pca topk (k=2, deflation)",
      cnt(Similarity.pcaTopK(emb1, "embedding", 64, k = 2, iters = 2)),
      cnt(Similarity.pcaTopK(embN, "embedding", 64, k = 2, iters = 2)))
    // round-13: ANN index compaction — accrete B batches into the cell
    // layout, then price (a) a one-cell pruned search before compaction,
    // (b) the compaction rewrite, (c) the same search after. The search
    // delta is the file-open tax the op exists to remove.
    if (only.forall(_.exists("ann compaction".startsWith))) {
      implicit val sqlCtx = spark.sqlContext
      import spark.implicits._
      val cents = Similarity.kmeansFit(emb1, "vec_id", "embedding",
          pmod(col("vec_id"), lit(400)) === 0, iters = 2)
        .groupBy(col("cell"))
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("coord")))),
          s => s.getField("coord")).as("cv")).cache()
      cents.count(): Unit
      val dir = java.nio.file.Files.createTempDirectory("graft_anncmp").toString
      val ckpt = java.nio.file.Files.createTempDirectory("graft_anncmp_ck").toString
      val rows = embN.select(col("vec_id").cast("long"), col("embedding"))
        .as[(Long, Array[Float])].collect()
      val mem = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, Array[Float])]
      val q = graft.streaming.StreamingOps.incrementalAnnIndex(
        mem.toDF().toDF("vec_id", "embedding"), "vec_id", "embedding",
        cents, s"$dir/index", ckpt)
      rows.grouped(math.max(1, rows.length / 40)).foreach { chunk =>
        mem.addData(chunk: _*); q.processAllAvailable()
      }
      q.stop()
      def search(): Long =
        spark.read.parquet(s"$dir/index").where(col("cell") === 0L).count()
      def files(): Long = {
        val root = new org.apache.hadoop.fs.Path(s"$dir/index")
        val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
        fs.listStatus(root).filter(_.isDirectory).map(d =>
          fs.listStatus(d.getPath).count(f => f.isFile &&
            !f.getPath.getName.startsWith("_") &&
            !f.getPath.getName.startsWith("."))).map(_.toLong).sum
      }
      val fBefore = files()
      val (_, tS1) = time("ann compaction search pre")(search())
      val (_, tC) = time("ann compaction rewrite")(
        graft.streaming.StreamingOps.compactAnnIndex(spark, s"$dir/index",
          maxFilesPerCell = 2).count())
      val fAfter = files()
      val (_, tS2) = time("ann compaction search post")(search())
      println(f"[probe] ann compaction files $fBefore->$fAfter rewrite=$tC%6.2f s search $tS1%5.2f->$tS2%5.2f s")
    }
    // round-15: simhash hot-bucket guard — a template-heavy corpus (30 %
    // of docs share one boilerplate template) is the degeneracy band
    // width cannot defuse. The CAPPED path must scale ~linearly with the
    // corpus; the uncapped quadratic base is priced at 1× only (at Nx it
    // is (N·0.3n)²/2 candidates by construction — the point of the guard).
    if (only.forall(_.exists("simhash guard".startsWith))) {
      val tpl = "data pipelines shuffle partitions and broadcast joins " +
        "across executors while caching columnar batches near storage "
      def corpus(n: Long): DataFrame = spark.range(n).select(
        col("id").as("doc_id"),
        when(pmod(col("id"), lit(10)) < 3,
          concat(lit(tpl), lit("tail "), col("id").cast("string")))
        .otherwise(concat(lit("unique doc "), col("id").cast("string"),
          lit(" carries content token "),
          (col("id") * lit(2654435761L) % lit(1000003L)).cast("string")))
        .as("text")).cache()
      val c1 = corpus(5000L); val cN = corpus(5000L * scale)
      println(s"[probe] simhash guard corpus ${c1.count()}/${cN.count()}")
      val (u, tU) = time("simhash guard UNCAPPED 1x")(
        Dedup.simhashPairs(c1, "doc_id", "text").count())
      probe("simhash guard (capped)",
        cnt(Dedup.simhashPairs(c1, "doc_id", "text", maxBucketSize = Some(200))),
        cnt(Dedup.simhashPairs(cN, "doc_id", "text", maxBucketSize = Some(200))))
      val cap1 = Dedup.simhashPairs(c1, "doc_id", "text",
        maxBucketSize = Some(200)).count()
      val capN = Dedup.simhashPairs(cN, "doc_id", "text",
        maxBucketSize = Some(200)).count()
      println(f"[probe] simhash guard pairs uncapped-1x=$u (${tU}%.2f s) " +
        s"capped-1x=$cap1 capped-${scale}x=$capN")
      c1.unpersist(); cN.unpersist(): Unit
    }
    // round-15: hot-cell re-split — cost must scale with the HOT CELL's
    // bytes (per-cell k-means + rewrite), not the index: one 80 %-hot
    // cell + 3 cold, 1× vs Nx rows.
    if (only.forall(_.exists("resplit".startsWith))) {
      import spark.implicits._
      def mkIndex(n: Long): String = {
        val d = java.nio.file.Files.createTempDirectory("graft_rsp_probe")
          .toString + "/index"
        spark.range(n).select(col("id").as("pid"),
          when(pmod(col("id"), lit(10)) < 8,
            array(lit(1.0) + col("id").cast("double") / lit(1e9),
              when(pmod(col("id"), lit(2)) === 0, lit(0.3)).otherwise(lit(-0.3))))
          .otherwise(array(lit(-1.0) + col("id").cast("double") / lit(1e9),
            pmod(col("id"), lit(3)).cast("double") / lit(10.0))).as("pv"),
          when(pmod(col("id"), lit(10)) < 8, lit(0L))
            .otherwise(pmod(col("id"), lit(3)) + 1L).as("cell"))
          .write.partitionBy("cell").parquet(d)
        d
      }
      val cents = Seq((0L, Seq(1.0, 0.0)), (1L, Seq(-1.0, 0.0)),
        (2L, Seq(-1.0, 0.1)), (3L, Seq(-1.0, 0.2))).toDF("cell", "cv")
      val (i1, iN) = (mkIndex(5000L), mkIndex(5000L * scale))
      val t1 = time("resplit hot cell 1x")(
        graft.streaming.StreamingOps.resplitHotCells(spark, i1, cents,
          maxSkew = 2.5, nSplit = 2, iters = 2).count())._2
      val tN = time(s"resplit hot cell ${scale}x")(
        graft.streaming.StreamingOps.resplitHotCells(spark, iN, cents,
          maxSkew = 2.5, nSplit = 2, iters = 2).count())._2
      println(f"[probe] resplit hot cell                ratio ${tN / t1}%6.1f (linear = $scale)")
    }
    spark.stop()
  }
}
