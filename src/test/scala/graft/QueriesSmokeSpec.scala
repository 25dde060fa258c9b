package graft

/** Every declared query must execute at sf0.001 (the oracle hash-match
  * itself is the driver's t2 gate; this is the in-repo smoke). */
class QueriesSmokeSpec extends SparkSpec {

  Queries.all.foreach { q =>
    test(s"query ${q.name} executes and has a schema") {
      val df = q.run(spark, sf001)
      assert(df.columns.nonEmpty)
      assert(df.count() >= 0)
      assert(q.oracle.forall(_.trim.toLowerCase.startsWith("select") ||
        q.oracle.get.trim.toLowerCase.startsWith("with")))
    }
  }

  test("flagship entry returns rows (driver t1 smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys are a subset of queries keys with matching names") {
    val qk = SparkEntry.queries.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(qk))
  }
}
