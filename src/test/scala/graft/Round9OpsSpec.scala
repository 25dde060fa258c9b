package graft

import org.apache.spark.sql.functions._

/** Round-9 operator semantics: the IVF+PQ composed index and the
  * incremental reweighting chain components. */
class Round9OpsSpec extends SparkSpec {

  private def emb = sources.Tables.embeddings(spark, sf001)
  private val coarsePred = pmod(col("vec_id"), lit(89)) === 1
  private val seedPred = pmod(col("vec_id"), lit(97)) === 3
  private val queryPred = pmod(col("vec_id"), lit(100)) === 0

  private def codebooks = ops.Similarity.pqTrain(emb, "vec_id", "embedding",
    m = 2, dim = 64, seedPred = seedPred, iters = 2)

  test("IVF+PQ: probing every cell reproduces flat ADC search exactly") {
    // With nprobe ≥ the coarse cell count the prune is a no-op, so the
    // composed index must equal pqSearch bit-for-bit (same ADC fold
    // order, same tie-breaks) — the composition adds pruning, never a
    // different distance.
    val cb = codebooks.cache()
    try {
      val flat = ops.Similarity.pqSearch(emb, "vec_id", "embedding",
        m = 2, dim = 64, codebooks = cb, queryPred = queryPred, k = 5)
        .collect().toSet
      val full = ops.Similarity.ivfPqSearch(emb, "vec_id", "embedding",
        m = 2, dim = 64, codebooks = cb, centroidPred = coarsePred,
        queryPred = queryPred, k = 5, nprobe = 1000000)
        .collect().toSet
      assert(full == flat,
        "all-cells IVF+PQ must equal flat ADC search exactly")
    } finally cb.unpersist()
  }

  test("IVF+PQ: widening nprobe never loses flat-ADC top-k hits") {
    val cb = codebooks.cache()
    try {
      val flat = ops.Similarity.pqSearch(emb, "vec_id", "embedding",
        m = 2, dim = 64, codebooks = cb, queryPred = queryPred, k = 5)
        .select(col("query_id"), col("cand_id"))
      def hits(nprobe: Int): Long =
        flat.join(
          ops.Similarity.ivfPqSearch(emb, "vec_id", "embedding",
            m = 2, dim = 64, codebooks = cb, centroidPred = coarsePred,
            queryPred = queryPred, k = 5, nprobe = nprobe)
            .select(col("query_id"), col("cand_id")),
          Seq("query_id", "cand_id"), "left_semi").count()
      val h1 = hits(1); val h2 = hits(2); val h3 = hits(3)
      assert(h2 >= h1 && h3 >= h2,
        s"ADC hits must be monotone in nprobe: $h1, $h2, $h3")
    } finally cb.unpersist()
  }

  test("k-step training loop: per-iteration lineage truncated to leaves; plan linear in k") {
    val df4 = Queries.trainKStep(spark, sf001, 4)
    val plan4 = df4.queryExecution.executedPlan.toString
    // every step's aggregate was localCheckpointed away: the final plan
    // is a union of k one-row leaf scans — no aggregate or window left
    assert(!plan4.contains("HashAggregate") && !plan4.contains("SortAggregate"),
      "step lineage must be truncated, not re-embedded")
    assert("ExistingRDD".r.findAllIn(plan4).size == 4,
      "one checkpointed leaf per step")
    // doubling k grows the final plan linearly (one leaf per step) —
    // naive chaining would re-embed every prior step's aggregate (O(k²))
    val len2 = Queries.trainKStep(spark, sf001, 2)
      .queryExecution.executedPlan.toString.length
    val len8 = Queries.trainKStep(spark, sf001, 8)
      .queryExecution.executedPlan.toString.length
    assert(len8 < len2 * 6,
      s"plan must grow linearly in k: k=2 → $len2 chars, k=8 → $len8")
  }

  test("bpeMerges: checkpointed lineage produces the identical merge table") {
    // localCheckpoint only truncates lineage — the trained artifact must
    // be bit-identical to the single-DAG form at any k
    def docs = sources.Tables.documents(spark, sf001)
    val single = ops.TextOps.bpeMerges(docs, "doc_id", "text", merges = 6,
      checkpointEvery = 0).collect().toSet
    val capped = ops.TextOps.bpeMerges(docs, "doc_id", "text", merges = 6,
      checkpointEvery = 2).collect().toSet
    assert(capped == single, "checkpointing must not change the merges")
  }

  test("k-step training loop: first two steps reproduce e2e_train_2step exactly") {
    val two = Queries.all.find(_.name == "e2e_train_2step").get
      .run(spark, sf001).collect().map(r =>
        (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSeq
    val kfirst = Queries.trainKStep(spark, sf001, 2).collect().map(r =>
      (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSeq
    assert(kfirst == two,
      "the checkpointed loop must compute the same recurrence as the unrolled DAG")
  }
}
