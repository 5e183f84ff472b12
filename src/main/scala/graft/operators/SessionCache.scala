package graft.operators

import org.apache.spark.sql.SparkSession

/** Key construction for the session-cached shared indexes
  * ([[Dedup.shingleRows]], [[Dedup.lshPairIndex]], [[TextOps.tfIndex]],
  * [[Similarity.graphCanopy]], [[GraphOps.copurchaseEdges]], …): the
  * session identity and corpus dir PLUS the driver-side listing
  * signature ([[graft.sources.RunLog.sourceSignature]] —
  * name|length|mtime per source file, no content read) of the table
  * the index derives from. The signature closes the staleness hole a
  * bare (session, dir) key leaves open: overwrite the source files
  * under the same path (a regenerated fixture, a recomputed corpus)
  * and the next access REBUILDS instead of serving the dead corpus —
  * the same guard the persisted artifacts (PQ store, CSV staging,
  * z-order layout, bootstrap base) already carry. Cost is one local
  * file listing per access — driver-side metadata, never data.
  */
private[operators] object SessionCache {
  def key(spark: SparkSession, dir: String, sourceGlob: String): String =
    s"${System.identityHashCode(spark)}@$dir@" +
      signature(spark, dir, sourceGlob)

  /** Listing signature over the glob's matches. Unlike
    * [[graft.sources.RunLog.sourceSignature]] (plain files only), a
    * matched DIRECTORY contributes its child files: the driver's
    * testdata tables are single parquet files, but a Spark-written
    * table under the same name is a directory of part files — both
    * layouts must invalidate when their bytes change (a glob that
    * silently matched nothing would freeze the key and serve a dead
    * corpus forever, which is exactly the staleness spec's scenario). */
  private def signature(
      spark: SparkSession, dir: String, sourceGlob: String): String = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val matched = Option(
      fs.globStatus(new org.apache.hadoop.fs.Path(p, sourceGlob)))
      .getOrElse(Array.empty)
    matched.flatMap { st =>
      if (st.isDirectory) fs.listStatus(st.getPath).filter(_.isFile)
      else Array(st)
    }.map(st =>
      s"${st.getPath.getParent.getName}/${st.getPath.getName}|" +
        s"${st.getLen}|${st.getModificationTime}")
      .sorted.mkString(",")
  }
}
