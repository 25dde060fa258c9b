package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.{Dedup, Similarity}
import graft.sources.Tables

/** Round-20 stage probe for the second-tier super-linear cluster
  * (x2_pq_recall / x2_opq_recall / x2_ivf_pq_topk / x1_containment_pairs):
  * times and sizes each stage at a given SF dir so the sf3 → sf10 growth
  * can be attributed to a named term. Usage:
  *   runMain graft.tools.R20Probe <sfDir> pq|cont
  */
object R20Probe {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, which) = args.take(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](label: String)(f: => T): T = {
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label%-38s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    def n(label: String, v: Long): Unit =
      println(f"[probe] $label%-38s $v%12d")

    which match {
      case "pq" =>
        val emb = Tables.embeddings(spark, sfDir)
        n("vectors", emb.count())
        val seed23 = pmod(col("vec_id"), lit(23)) === 3
        n("seeds %23", emb.where(seed23).count())
        // x2_pq_recall / x2_opq_recall query stripe: capped at 8 ids
        val qp = pmod(col("vec_id"), lit(100)) === 0 && col("vec_id") < 800
        n("queries capped stripe", emb.where(qp).count())
        // x2_ivf_pq_topk's stripe is UNCAPPED — grows with the corpus
        n("queries %100 uncapped",
          emb.where(pmod(col("vec_id"), lit(100)) === 0).count())
        val cb = time("pqTrain m=8 seeds=%23 iters=2") {
          val c = Similarity.pqTrain(emb, "vec_id", "embedding", m = 8,
            dim = 64, seedPred = seed23, iters = 2)
          c.count(); c
        }
        n("cells/sub after train (%23)",
          cb.select(col("sub"), col("cell")).distinct().count() / 8)
        time("pqEncode against %23 codebook") {
          Similarity.pqEncode(emb, "vec_id", "embedding", 8, 64, cb).count()
        }
        time("pqSearch k=5 (%23 codebook)") {
          Similarity.pqSearch(emb, "vec_id", "embedding", 8, 64, cb,
            queryPred = qp, k = 5).count()
        }
        // the scale-invariant operating point: same rule, capped id range
        // → ≤256 seeds regardless of corpus size
        val seedFix = seed23 && col("vec_id") < lit(23L * 256)
        n("seeds fixed-k", emb.where(seedFix).count())
        val cbF = time("pqTrain m=8 seeds=fixed-256 iters=2") {
          val c = Similarity.pqTrain(emb, "vec_id", "embedding", m = 8,
            dim = 64, seedPred = seedFix, iters = 2)
          c.count(); c
        }
        time("pqEncode against fixed codebook") {
          Similarity.pqEncode(emb, "vec_id", "embedding", 8, 64, cbF).count()
        }
        time("pqSearch k=5 (fixed codebook)") {
          Similarity.pqSearch(emb, "vec_id", "embedding", 8, 64, cbF,
            queryPred = qp, k = 5).count()
        }
        time("exact L2 brute (capped 8-query stripe)") {
          val e = emb.select(col("vec_id").cast("long").as("cand_id"),
            col("embedding").cast("array<double>").as("cv"))
          val q = emb.where(pmod(col("vec_id"), lit(100)) === 0 &&
              col("vec_id") < 800)
            .select(col("vec_id").cast("long").as("query_id"),
              col("embedding").cast("array<double>").as("qv"))
          e.crossJoin(broadcast(q))
            .where(col("cand_id") =!= col("query_id"))
            .withColumn("d", expr(
              "aggregate(zip_with(cv, qv, (a, b) -> (a-b)*(a-b)), 0D, (acc, x) -> acc + x)"))
            .count()
        }

      case "cont" =>
        val docs = Tables.documents(spark, sfDir)
        n("docs", docs.count())
        val sets = Dedup.docShingleSets(docs, "doc_id", "text", 3)
          .select(col("doc_id"),
            array_distinct(transform(col("toks"), t => Dedup.featureHash(t)))
              .as("toks"))
          .withColumn("n_toks", size(col("toks")))
        val tok = sets.select(col("doc_id"), explode(col("toks")).as("tok"))
        val df = time("token df aggregate") {
          val d = tok.groupBy("tok").agg(count(lit(1)).as("df"))
          d.cache().count(); d
        }
        n("distinct tokens", df.count())
        val rare = df.where(col("df") <= 8 && col("df") >= 2)
        n("rare tokens (df in [2,8])", rare.count())
        n("candidate mass sum C(df,2)",
          rare.select(sum(expr("df * (df - 1) DIV 2"))).head().getLong(0))
        val cand = time("candidate self-join + distinct") {
          val rt = tok.join(rare, "tok")
          val c = rt.as("l").join(rt.as("r"), col("l.tok") === col("r.tok"))
            .where(col("l.doc_id") < col("r.doc_id"))
            .select(col("l.doc_id").as("doc_a"), col("r.doc_id").as("doc_b"))
            .distinct()
          c.cache().count(); c
        }
        n("distinct candidates", cand.count())
        time("verify join (intersect on full sets)") {
          val a = sets.select(col("doc_id").as("doc_a"), col("toks").as("toks_a"),
            col("n_toks").as("na"))
          val b = sets.select(col("doc_id").as("doc_b"), col("toks").as("toks_b"),
            col("n_toks").as("nb"))
          cand.join(a, "doc_a").join(b, "doc_b")
            .where(col("na") > 0 && col("nb") > 0)
            .withColumn("inter",
              size(array_intersect(col("toks_a"), col("toks_b"))).cast("double"))
            .count()
        }
        n("output pairs (both directions, t=0.5)",
          Dedup.containmentPairs(docs, "doc_id", "text", maxDf = 8,
            threshold = 0.5).count())
    }
    spark.stop()
  }
}
