package graft.ops

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** X5 frequency sketch — Count–Min (Cormode & Muthukrishnan 2005) as a
  * typed, MERGEABLE `Aggregator`: point-frequency estimates over a key
  * universe too large to groupBy exactly (token/URL/user frequencies at
  * 100 TB). The sibling of [[MisraGriesAggregator]]: MG answers "which
  * keys are frequent", CMS answers "how frequent is THIS key" for any
  * key, in depth·width longs of state.
  *
  * The sketch is a depth×width counter matrix; each update increments
  * one counter per row (chosen by that row's hash), a query reads the
  * MINIMUM of its depth counters. Estimates never undercount and
  * overcount by at most 2N/width with probability 1 − 2^−depth. Merge is
  * pointwise array addition — exactly associative/commutative, so any
  * partial-aggregation merge tree yields the identical sketch, and the
  * plan shuffles depth·width longs per partition, never the corpus.
  *
  * Hashing is fixed and CLOSED-FORM so an external engine can replay it
  * (the oracle recomputes the whole sketch in SQL):
  * `code(t) = foldLeft(chars)((acc, c) => (acc·31 + c) mod 1000003)`
  * (Horner over ASCII codes — tokens here are `[a-z]+`), then row j
  * buckets to `((A(j)·code + j + 1) mod 1000003) mod width` with
  * A = (3, 5, 7, …) — pairwise-independent enough for the estimate
  * bound, and every intermediate fits int64 (A(j)·code < 2^43).
  * [[CountMin.codeSql]]/[[CountMin.bucketSql]] render the same forms for
  * Spark SQL expressions and the DuckDB oracle, so the three evaluation
  * sites can only drift together. */
class CountMinAggregator(val depth: Int = 3, val width: Int = 64)
    extends Aggregator[String, Array[Long], Array[Long]] {
  require(depth >= 1 && depth <= CountMin.A.length,
    s"depth must be in [1, ${CountMin.A.length}]")
  require(width >= 2, "width must be at least 2")

  override def zero: Array[Long] = new Array[Long](depth * width)

  override def reduce(b: Array[Long], t: String): Array[Long] = {
    val c = CountMin.code(t)
    var j = 0
    while (j < depth) {
      b(j * width + CountMin.bucket(c, j, width)) += 1L
      j += 1
    }
    b
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(m: Array[Long]): Array[Long] = m

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder()
}

object CountMin {
  /** Modulus (prime) and per-row multipliers of the bucket hash. */
  val P = 1000003L
  val A: Array[Long] = Array(3L, 5L, 7L, 11L, 13L)

  /** Horner char-code fold — the JVM site of the shared closed form. */
  def code(t: String): Long = {
    var acc = 0L
    var i = 0
    while (i < t.length) { acc = (acc * 31L + t.charAt(i).toLong) % P; i += 1 }
    acc
  }

  def bucket(code: Long, j: Int, width: Int): Int =
    (((A(j) * code + j + 1L) % P) % width).toInt

  /** The same code fold as a Spark-SQL/DuckDB-portable expression over a
    * token column `t` (both engines: ascii of each char, left fold). */
  def codeSql(t: String): String =
    s"""aggregate(split($t, ''), CAST(0 AS BIGINT),
        (acc, c) -> (acc * 31 + ascii(c)) % $P)"""

  /** DuckDB rendering (list_reduce seeds with the first element, which
    * equals the acc=0 fold because every char code is < P). */
  def codeDuck(t: String): String =
    s"""list_reduce(list_transform(range(len($t)),
        i -> CAST(ascii(substr($t, CAST(i+1 AS INT), 1)) AS BIGINT)),
        (acc, x) -> (acc * 31 + x) % $P)"""

  /** Bucket of row j for a code expression (identical text in both SQL
    * dialects). */
  def bucketSql(codeExpr: String, j: Int, width: Int): String =
    s"(((${A(j)} * ($codeExpr) + ${j + 1}) % $P) % $width)"
}
