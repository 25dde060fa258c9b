package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: the fused NearestCell codegen kernel vs the interpreted
  * HOF argmin fold, same session, on an assignment-dominated shape
  * (rows × k centroids × d dims is the whole job). Numbers cited in
  * SCALING.md round-15. */
object AssignProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)
    val rows = args.headOption.map(_.toLong).getOrElse(50000L)
    val k = args.lift(1).map(_.toInt).getOrElse(256)
    val d = 64
    def vec(seed: Int) = expr(
      s"transform(sequence(0, ${d - 1}), i -> " +
      s"CAST(pmod((id + 1) * (i + $seed) * 2654435761, 1000003) AS DOUBLE) / 1000003.0D)")
    // graft_dense mirrors the op boundary (Similarity.asDouble): validate
    // density once, let the kernels compile branch-free (r16)
    val pts = spark.range(rows).select(col("id").as("pid"),
      call_function("graft_dense", vec(3)).as("pv")).cache()
    val cents = spark.range(k).select(col("id").as("cell"),
      call_function("graft_dense", vec(7)).as("cv")).cache()
    pts.count(); cents.count()
    val one = cents.agg(sort_array(collect_list(struct(
      call_function("graft_nn", col("cell")).as("cell"), col("cv")))).as("cents"))
    def timeIt(label: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[assign-probe] $label%-12s min=${ts.min}%7.2f s  all=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    val kernel = pts.join(broadcast(one))
      .select(col("pid"), expr("graft_nearest_cell(pv, cents)").as("cell"))
    val hof = pts.withColumn("pn", expr("graft_dot(pv, pv)"))
      .join(broadcast(one))
      .withColumn("best", expr(
        """aggregate(
             transform(cents, c -> named_struct(
               'cell', c.cell,
               'dist', (pn - 2 * graft_dot(pv, c.cv)) + graft_dot(c.cv, c.cv))),
             named_struct('cell', CAST(-1 AS BIGINT),
                          'dist', CAST('Infinity' AS DOUBLE)),
             (acc, c) -> IF(c.dist < acc.dist, c, acc))"""))
      .select(col("pid"), col("best.cell").as("cell"))
    if (args.contains("maxcos")) {
      // the semantic-decontamination shape: corpus rows × |bench| × d
      val bRow = cents.agg(collect_list(col("cv")).as("bvs"))
      val mcKernel = pts.crossJoin(broadcast(bRow))
        .select(col("pid"), expr("graft_max_cosine(pv, bvs)").as("max_cos"))
      val mcHof = pts.crossJoin(broadcast(bRow))
        .withColumn("pn", sqrt(expr("graft_dot(pv, pv)")))
        .select(col("pid"), expr(
          """aggregate(bvs, CAST(-1.0 AS DOUBLE),
               (acc, bv) -> greatest(acc,
                 graft_dot(pv, bv) / (pn * sqrt(graft_dot(bv, bv)))))""").as("max_cos"))
      println(s"[assign-probe] maxcos rows=$rows bench=$k d=$d")
      timeIt("mc-kernel")(mcKernel)
      timeIt("mc-hof")(mcHof)
      val mcDiff = mcKernel.as("a").join(mcHof.as("b"), Seq("pid"))
        .where(col("a.max_cos") =!= col("b.max_cos")).count()
      println(s"[assign-probe] maxcos mismatches=$mcDiff")
    } else {
      println(s"[assign-probe] rows=$rows k=$k d=$d")
      timeIt("kernel")(kernel)
      timeIt("hof")(hof)
      // parity double-check at this scale
      val diff = kernel.as("a").join(hof.as("b"), Seq("pid"))
        .where(col("a.cell") =!= col("b.cell")).count()
      println(s"[assign-probe] mismatches=$diff")
    }
    spark.stop()
  }
}
