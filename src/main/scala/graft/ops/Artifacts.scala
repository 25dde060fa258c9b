package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Versioned persistence for TRAINED index artifacts — centroid tables
  * ([[Similarity.kmeansFit]]), PQ codebooks ([[Similarity.pqTrain]]),
  * PCA component tables ([[Similarity.pcaTopK]]), BPE merge tables
  * ([[TextOps]]) — the save/load half of the reference's checkpoint
  * story (state_dict save AND load, fawac.py:555-583) applied to the
  * engine's trained state. Everything the X2/X3 train ops emit is a
  * small DataFrame (k·d centroid rows, m·k·d codebook rows, vocab-bounded
  * merge rows); what was missing operationally was a durable, versioned
  * home for them, so e.g. the centroid table
  * [[graft.streaming.StreamingOps.resplitHotCells]] returns no longer
  * lives only in the caller's hands across restarts.
  *
  * Layout under `rootPath`:
  * {{{
  *   v00000000000000000001/data/…parquet   the artifact rows
  *   v00000000000000000001/meta.json       family/params sidecar
  *   v00000000000000000002/…               the next committed version
  * }}}
  *
  * Commit discipline: a version is staged COMPLETE (data + sidecar)
  * under a hidden `.tmp-v…` dir and installed with one atomic directory
  * rename — the same staging+rename pattern
  * [[graft.streaming.StreamingOps.compactAnnIndex]] and the txn shard
  * sink use. Readers therefore only ever see fully-written versions;
  * the CURRENT version is simply the highest committed dir (no mutable
  * pointer file to corrupt), and a crash mid-save leaves only hidden
  * residue that the next save clears. Old versions stay readable until
  * [[pruneArtifacts]] — the swap is append-then-read-latest, never
  * in-place.
  *
  * Scale: artifacts are broadcast-dim by construction (the train ops
  * bound them); the parquet read/write is one tiny file. The sidecar
  * carries (family, params) so a mis-wired load fails loud instead of
  * assigning against the wrong artifact kind. */
object Artifacts {

  final case class ArtifactMeta(family: String, version: Long,
                                params: Map[String, String])

  private def fsOf(spark: SparkSession, path: org.apache.hadoop.fs.Path) =
    path.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def versionName(v: Long): String = f"v$v%020d"

  private def committedVersions(spark: SparkSession, rootPath: String): Seq[Long] = {
    val root = new org.apache.hadoop.fs.Path(rootPath)
    val fs = fsOf(spark, root)
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).filter(_.isDirectory)
      .flatMap { st =>
        val n = st.getPath.getName
        if (n.startsWith("v")) n.stripPrefix("v").toLongOption else None
      }.toSeq.sorted
  }

  // minimal flat-JSON codec for the sidecar: family + version + a string
  // param map. Hand-rolled (no JSON dep in build.sbt); escapes the two
  // characters that can appear in values ('"' and '\').
  private def esc(s: String): String =
    s.replace("\\", "\\\\").replace("\"", "\\\"")
  private def unesc(s: String): String = {
    val b = new StringBuilder; var i = 0
    while (i < s.length) {
      if (s.charAt(i) == '\\' && i + 1 < s.length) { b += s.charAt(i + 1); i += 2 }
      else { b += s.charAt(i); i += 1 }
    }
    b.toString
  }
  private def metaJson(meta: ArtifactMeta): String = {
    val params = meta.params.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""${esc(k)}":"${esc(v)}"""" }.mkString(",")
    s"""{"family":"${esc(meta.family)}","version":${meta.version},"params":{$params}}"""
  }
  private val strField = """"((?:[^"\\]|\\.)*)"\s*:\s*"((?:[^"\\]|\\.)*)"""".r
  private def parseMeta(json: String): ArtifactMeta = {
    val version = """"version"\s*:\s*(\d+)""".r.findFirstMatchIn(json)
      .map(_.group(1).toLong)
      .getOrElse(throw new IllegalArgumentException(s"sidecar has no version: $json"))
    val paramsRegion = json.indexOf("\"params\"")
    val fields = strField.findAllMatchIn(json)
      .map(m => (unesc(m.group(1)), unesc(m.group(2)), m.start)).toSeq
    val family = fields.collectFirst { case ("family", v, _) => v }
      .getOrElse(throw new IllegalArgumentException(s"sidecar has no family: $json"))
    val params = fields.collect {
      case (k, v, off) if paramsRegion >= 0 && off > paramsRegion => k -> v
    }.toMap
    ArtifactMeta(family, version, params)
  }

  /** Persist `df` as the next version of the artifact at `rootPath`.
    * Stages data + sidecar hidden, installs with one atomic rename, and
    * returns the committed version number. `family` is a fail-loud tag
    * ("ivf_centroids", "pq_codebooks", "pca_components", "bpe_merges",
    * …) checked again at load; `params` records the training knobs the
    * next session needs (dim, k, m, roundDigits — strings, caller's
    * vocabulary). The write coalesces to one file: artifacts are
    * broadcast-dim by construction, and one file keeps the version dir
    * listable at a glance. */
  def saveArtifact(df: DataFrame, rootPath: String, family: String,
                   params: Map[String, String] = Map.empty): Long = {
    require(family.nonEmpty, "artifact family must be non-empty")
    val spark = df.sparkSession
    val root = new org.apache.hadoop.fs.Path(rootPath)
    val fs = fsOf(spark, root)
    fs.mkdirs(root)
    val version = committedVersions(spark, rootPath).lastOption.getOrElse(0L) + 1L
    val staging = new org.apache.hadoop.fs.Path(root, s".tmp-${versionName(version)}")
    val dest = new org.apache.hadoop.fs.Path(root, versionName(version))
    fs.delete(staging, true)
    df.coalesce(1).write.mode("overwrite")
      .parquet(new org.apache.hadoop.fs.Path(staging, "data").toString)
    val out = fs.create(new org.apache.hadoop.fs.Path(staging, "meta.json"), true)
    try out.write(metaJson(ArtifactMeta(family, version, params)).getBytes("UTF-8"))
    finally out.close()
    require(!fs.exists(dest),
      s"saveArtifact: version ${versionName(version)} appeared concurrently " +
        s"under $rootPath — saves must be serialized per artifact root")
    require(fs.rename(staging, dest),
      s"saveArtifact: atomic install rename failed for $dest")
    version
  }

  /** Load the CURRENT (highest committed) version. Fails loud when the
    * root is empty or the stored family differs from the expected one. */
  def loadArtifact(spark: SparkSession, rootPath: String,
                   family: String): (DataFrame, ArtifactMeta) = {
    val versions = committedVersions(spark, rootPath)
    require(versions.nonEmpty, s"no committed artifact versions under $rootPath")
    loadArtifactVersion(spark, rootPath, versions.last, family)
  }

  /** Load one specific committed version (time travel / rollback). */
  def loadArtifactVersion(spark: SparkSession, rootPath: String, version: Long,
                          family: String): (DataFrame, ArtifactMeta) = {
    val vDir = new org.apache.hadoop.fs.Path(rootPath, versionName(version))
    val fs = fsOf(spark, vDir)
    require(fs.exists(vDir), s"artifact version $version not found under $rootPath")
    val in = fs.open(new org.apache.hadoop.fs.Path(vDir, "meta.json"))
    val json = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
    val meta = parseMeta(json)
    require(meta.family == family,
      s"artifact family mismatch under $rootPath: expected '$family', " +
        s"found '${meta.family}' — wrong artifact root wired in")
    (spark.read.parquet(new org.apache.hadoop.fs.Path(vDir, "data").toString), meta)
  }

  /** All committed versions with their sidecars, oldest first. */
  def listArtifacts(spark: SparkSession, rootPath: String): Seq[ArtifactMeta] =
    committedVersions(spark, rootPath).map { v =>
      val vDir = new org.apache.hadoop.fs.Path(rootPath, versionName(v))
      val fs = fsOf(spark, vDir)
      val in = fs.open(new org.apache.hadoop.fs.Path(vDir, "meta.json"))
      val json = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
      parseMeta(json)
    }

  /** Drop committed versions older than the newest `keep` (default: keep
    * the current and one rollback target). Never touches hidden staging
    * residue younger saves may be writing. */
  def pruneArtifacts(spark: SparkSession, rootPath: String, keep: Int = 2): Seq[Long] = {
    require(keep >= 1, "must keep at least the current version")
    val versions = committedVersions(spark, rootPath)
    val drop = versions.dropRight(keep)
    val fs = fsOf(spark, new org.apache.hadoop.fs.Path(rootPath))
    drop.foreach { v =>
      fs.delete(new org.apache.hadoop.fs.Path(rootPath, versionName(v)), true)
    }
    drop
  }
}
