package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for the LLM-data-pipeline surface (SURVEY.md
  * §2.8 X1): exact, token-set Jaccard near-dup, MinHash+LSH.
  *
  * Scale design notes (the part that matters at 100 TB):
  *  - exact dedup groups on a 128-bit md5 fingerprint, never on raw text —
  *    the shuffle carries 16 bytes + doc_id per row, not documents.
  *  - near-dup candidate generation never does an all-pairs join: either
  *    rare-token prefix filtering (doc-frequency cap) or MinHash banding
  *    bounds candidates; exact Jaccard runs only on candidates.
  *  - the token dictionary is vocabulary-sized (≪ corpus) and broadcast.
  */
object Dedup {

  /** X1 exact — one row per distinct normalized text: keeper = min doc_id,
    * plus the duplicate count. Equivalent of `dropDuplicates` but keeps
    * provenance (which ids collapsed). */
  def exactDedup(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol), TextOps.fingerprint(col(textCol)).as("fp"))
      .groupBy(col("fp"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("dup_count"))

  /** Per-document distinct token sets, with set size. */
  def docTokenSets(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
      TextOps.tokenSet(col(textCol)).as("toks"))
      .withColumn("n_toks", size(col("toks")))

  /** X1 near-dup — token-set Jaccard with rare-token candidate pruning.
    *
    * Candidates = unordered doc pairs sharing ≥1 token whose corpus
    * document-frequency ≤ maxDf (near-identical docs always share rare
    * tokens; frequent tokens like "the" would produce quadratic pairs).
    * Exact Jaccard = |A∩B| / (|A|+|B|−|A∩B|) on the full token sets of
    * each candidate pair. Output: (doc_a, doc_b, jaccard) for pairs above
    * the threshold, doc_a < doc_b.
    */
  def jaccardNearDup(docs: DataFrame, idCol: String, textCol: String,
                     maxDf: Int = 8, threshold: Double = 0.5): DataFrame = {
    val sets = docTokenSets(docs, idCol, textCol)
    val tok = sets.select(col("doc_id"), explode(col("toks")).as("tok"))
    val rare = tok.groupBy("tok").agg(count(lit(1)).as("df"))
      .where(col("df") <= maxDf && col("df") >= 2)
    val rareTok = tok.join(broadcast(rare), "tok")
    val cand = rareTok.as("l").join(rareTok.as("r"), col("l.tok") === col("r.tok"))
      .where(col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("doc_a"), col("r.doc_id").as("doc_b"))
      .distinct()
    val a = sets.select(col("doc_id").as("doc_a"), col("toks").as("toks_a"), col("n_toks").as("na"))
    val b = sets.select(col("doc_id").as("doc_b"), col("toks").as("toks_b"), col("n_toks").as("nb"))
    cand.join(a, "doc_a").join(b, "doc_b")
      .withColumn("inter", size(array_intersect(col("toks_a"), col("toks_b"))))
      .withColumn("jaccard",
        col("inter").cast("double") /
          (col("na") + col("nb") - col("inter")).cast("double"))
      .where(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** Token dictionary: distinct tokens → dense 0-based ids in lexicographic
    * order. The id assignment is a window over the *vocabulary* (≪ corpus;
    * bounded by language), so the single-partition sort is on thousands-to-
    * millions of short strings — cheap and, critically, identical to the
    * oracle's `dense_rank() over (order by token)`. */
  def tokenDictionary(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = docTokenSets(docs, idCol, textCol)
      .select(explode(col("toks")).as("tok")).distinct()
    tok.withColumn("tok_id",
      (row_number().over(Window.orderBy(col("tok"))) - 1).cast("long"))
  }

  /** MinHash parameters: k independent universal hashes
    * h_j(x) = (a_j·x + b_j) mod P over the token-id universe.
    * Constants are fixed odd multipliers so the DuckDB oracle reproduces
    * them from the same closed form. */
  val MinhashP: Long = 2147483647L // 2^31 − 1 (Mersenne prime)
  def minhashA(j: Int): Long = 2L * j + 1L + 104729L * j // odd, deterministic
  def minhashB(j: Int): Long = 12582917L * (j + 1) % MinhashP

  /** X1 MinHash — per-document signature: sig[j] = min over the doc's
    * token ids of h_j(id), j = 0..k−1. Computed with one explode + join to
    * the broadcast dictionary + groupBy(doc) with k min-aggregates — the
    * shuffle carries k longs per doc. */
  def minhashSignatures(docs: DataFrame, idCol: String, textCol: String,
                        k: Int = 8): DataFrame = {
    val dict = tokenDictionary(docs, idCol, textCol)
    val tok = docTokenSets(docs, idCol, textCol)
      .select(col("doc_id"), explode(col("toks")).as("tok"))
      .join(broadcast(dict), "tok")
    val sigCols = (0 until k).map { j =>
      min(pmod(lit(minhashA(j)) * col("tok_id") + lit(minhashB(j)), lit(MinhashP)))
        .as(s"mh$j")
    }
    tok.groupBy(col("doc_id")).agg(sigCols.head, sigCols.tail: _*)
  }

  /** X1 MinHash+LSH — banding: k minhashes split into bands of r rows; a
    * pair landing in the same bucket for any band is a candidate; verified
    * with exact token-set Jaccard. Output like [[jaccardNearDup]]. */
  def minhashLshPairs(docs: DataFrame, idCol: String, textCol: String,
                      k: Int = 8, r: Int = 2, threshold: Double = 0.5): DataFrame = {
    require(k % r == 0, "k must be divisible by band width r")
    val sig = minhashSignatures(docs, idCol, textCol, k)
    val bands = (0 until k / r).map { b =>
      sig.select(col("doc_id"), lit(b).as("band"),
        concat_ws("_", (0 until r).map(i => col(s"mh${b * r + i}")): _*).as("bucket"))
    }.reduce(_ unionAll _)
    val cand = bands.as("l").join(bands.as("r"),
        col("l.band") === col("r.band") && col("l.bucket") === col("r.bucket"))
      .where(col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("doc_a"), col("r.doc_id").as("doc_b"))
      .distinct()
    val sets = docTokenSets(docs, idCol, textCol)
    val a = sets.select(col("doc_id").as("doc_a"), col("toks").as("toks_a"), col("n_toks").as("na"))
    val b2 = sets.select(col("doc_id").as("doc_b"), col("toks").as("toks_b"), col("n_toks").as("nb"))
    cand.join(a, "doc_a").join(b2, "doc_b")
      .withColumn("inter", size(array_intersect(col("toks_a"), col("toks_b"))))
      .withColumn("jaccard",
        col("inter").cast("double") /
          (col("na") + col("nb") - col("inter")).cast("double"))
      .where(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 6).as("jaccard"))
  }
}
