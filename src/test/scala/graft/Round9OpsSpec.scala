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
}
