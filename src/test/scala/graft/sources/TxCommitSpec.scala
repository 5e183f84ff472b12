package graft.sources

import graft.SparkSpec
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

/** S12 cross-output atomicity: a crash between the two writes of a
  * transaction must NEVER expose a half-committed pair — readers see
  * the complete output set of some committed transaction or nothing.
  * (Reference: one PG transaction around the two-table write,
  * 02_normalize_scryfall_prices.js:195-209.)
  */
class TxCommitSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(tag: String): String = {
    val root = s"/tmp/graft-txcommit-$tag"
    val p = new Path(root)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    root
  }

  private def dfOf(pairs: (Long, String)*) = pairs.toSeq.toDF("k", "v")

  private def commitPair(root: String, a: Seq[(Long, String)],
      b: Seq[(Long, String)]): Long = {
    val t = TxCommit.begin(spark, root)
    dfOf(a: _*).write.mode("overwrite").parquet(t.stage("alpha"))
    dfOf(b: _*).write.mode("overwrite").parquet(t.stage("beta"))
    assert(TxCommit.commit(spark, t,
      Map("alpha" -> t.stage("alpha"), "beta" -> t.stage("beta"))))
    t.version
  }

  test("nothing is visible before the first commit") {
    val root = freshRoot("empty")
    assert(TxCommit.versions(spark, root).isEmpty)
    assert(TxCommit.latest(spark, root).isEmpty)
    intercept[IllegalArgumentException] {
      TxCommit.read(spark, root, "alpha")
    }
  }

  test("crash between the two writes exposes nothing: old pair stays intact") {
    val root = freshRoot("crash")
    commitPair(root, Seq(1L -> "a1"), Seq(1L -> "b1"))
    // txn 2 "crashes" after writing only alpha — staged, never committed
    val t2 = TxCommit.begin(spark, root)
    dfOf(9L -> "POISON").write.mode("overwrite").parquet(t2.stage("alpha"))
    // readers still resolve the v1 pair, both outputs, no mix
    assert(TxCommit.versions(spark, root) === Seq(1L))
    val alpha = TxCommit.read(spark, root, "alpha").as[(Long, String)].collect()
    val beta = TxCommit.read(spark, root, "beta").as[(Long, String)].collect()
    assert(alpha.toSet === Set(1L -> "a1"))
    assert(beta.toSet === Set(1L -> "b1"))
    // recovery: a re-run claims the SAME version under its own staging
    // token (the poison dir stays an invisible orphan), writes BOTH
    // outputs, commits — poison never surfaces
    val v2 = commitPair(root, Seq(2L -> "a2"), Seq(2L -> "b2"))
    assert(v2 === 2L)
    val m = TxCommit.latest(spark, root)
    // the pair is from one transaction: both paths carry the same version
    assert(m.values.forall(_.contains(f"v$v2%08d")))
    assert(TxCommit.read(spark, root, "alpha").as[(Long, String)].collect()
      .toSet === Set(2L -> "a2"))
    assert(TxCommit.read(spark, root, "beta").as[(Long, String)].collect()
      .toSet === Set(2L -> "b2"))
  }

  test("a torn manifest write is invisible: tmp files are not commits") {
    val root = freshRoot("torn")
    commitPair(root, Seq(1L -> "a1"), Seq(1L -> "b1"))
    // simulate a crash mid-manifest-write: partial bytes under a tmp name
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val torn = new Path(s"$root/_commits/.tmp-v00000002-deadbeef")
    val out = fs.create(torn, false)
    out.write("""{"version":2,"outputs":{"alpha":"/now""".getBytes("UTF-8"))
    out.close()
    assert(TxCommit.versions(spark, root) === Seq(1L))
    assert(TxCommit.read(spark, root, "alpha").as[(Long, String)].collect()
      .toSet === Set(1L -> "a1"))
  }

  test("two committers racing one version: exactly one wins") {
    val root = freshRoot("race")
    commitPair(root, Seq(1L -> "a1"), Seq(1L -> "b1"))
    val ta = TxCommit.begin(spark, root)
    val tb = TxCommit.begin(spark, root)
    assert(ta.version === tb.version) // both claimed v2
    dfOf(2L -> "A").write.mode("overwrite").parquet(ta.stage("alpha"))
    dfOf(2L -> "B").write.mode("overwrite").parquet(ta.stage("beta"))
    assert(TxCommit.commit(spark, ta,
      Map("alpha" -> ta.stage("alpha"), "beta" -> ta.stage("beta"))))
    // the loser's commit is refused; nothing it staged becomes visible
    assert(!TxCommit.commit(spark, tb,
      Map("alpha" -> "/should/never/appear", "beta" -> "/nor/this")))
    assert(TxCommit.latest(spark, root)("alpha") === ta.stage("alpha"))
    // loser retries at the next version and succeeds
    val v3 = commitPair(root, Seq(3L -> "a3"), Seq(3L -> "b3"))
    assert(v3 === 3L)
  }

  test("racing transactions stage into disjoint dirs: the loser cannot corrupt the winner") {
    // the unsound shape this guards against: staging paths derived from
    // the version alone would let the LOSER overwrite the winner's
    // now-live data dir before its commit is refused — readers resolving
    // the winning manifest would see the loser's rows
    val root = freshRoot("stageiso")
    commitPair(root, Seq(1L -> "a1"), Seq(1L -> "b1"))
    val ta = TxCommit.begin(spark, root)
    val tb = TxCommit.begin(spark, root)
    assert(ta.version === tb.version)
    assert(ta.stage("alpha") !== tb.stage("alpha"))
    // winner stages and commits first
    dfOf(2L -> "WINNER").write.mode("overwrite").parquet(ta.stage("alpha"))
    dfOf(2L -> "WB").write.mode("overwrite").parquet(ta.stage("beta"))
    assert(TxCommit.commit(spark, ta,
      Map("alpha" -> ta.stage("alpha"), "beta" -> ta.stage("beta"))))
    // loser stages AFTER the winner is live — in the version-only layout
    // this write would clobber the winner's committed data
    dfOf(2L -> "LOSER").write.mode("overwrite").parquet(tb.stage("alpha"))
    assert(!TxCommit.commit(spark, tb, Map("alpha" -> tb.stage("alpha"))))
    // the winner's committed rows are untouched
    assert(TxCommit.read(spark, root, "alpha").as[(Long, String)].collect()
      .toSet === Set(2L -> "WINNER"))
  }

  test("vacuum collects orphaned staging from crashed and losing transactions") {
    val root = freshRoot("orphan")
    commitPair(root, Seq(1L -> "a1"), Seq(1L -> "b1"))
    // a crashed transaction: staged, never committed
    val tCrash = TxCommit.begin(spark, root)
    dfOf(9L -> "CRASH").write.mode("overwrite").parquet(tCrash.stage("alpha"))
    // recovery commits the same version under its own token
    commitPair(root, Seq(2L -> "a2"), Seq(2L -> "b2"))
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(new Path(tCrash.stage("alpha"))), "orphan staged dir present")
    TxCommit.vacuum(spark, root, keep = 2)
    // both committed versions survive; the orphan is gone
    assert(TxCommit.versions(spark, root) === Seq(1L, 2L))
    assert(!fs.exists(new Path(tCrash.stage("alpha"))), "orphan collected")
    assert(TxCommit.read(spark, root, "alpha").as[(Long, String)].collect()
      .toSet === Set(2L -> "a2"))
    // in-flight staging ABOVE the latest committed version is left alone
    val tLive = TxCommit.begin(spark, root)
    dfOf(3L -> "LIVE").write.mode("overwrite").parquet(tLive.stage("alpha"))
    TxCommit.vacuum(spark, root, keep = 2)
    assert(fs.exists(new Path(tLive.stage("alpha"))),
      "in-flight staging must survive vacuum")
  }

  test("vacuum drops old versions but the kept tail stays readable") {
    val root = freshRoot("vacuum")
    commitPair(root, Seq(1L -> "a1"), Seq(1L -> "b1"))
    commitPair(root, Seq(2L -> "a2"), Seq(2L -> "b2"))
    commitPair(root, Seq(3L -> "a3"), Seq(3L -> "b3"))
    val v1Alpha = TxCommit.manifest(spark, root, 1L)("alpha")
    val v3Alpha = TxCommit.manifest(spark, root, 3L)("alpha")
    TxCommit.vacuum(spark, root, keep = 1)
    assert(TxCommit.versions(spark, root) === Seq(3L))
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new Path(v1Alpha)))
    assert(fs.exists(new Path(v3Alpha)))
    assert(TxCommit.read(spark, root, "alpha").as[(Long, String)].collect()
      .toSet === Set(3L -> "a3"))
  }

  test("time travel: any committed version stays resolvable until vacuumed") {
    val root = freshRoot("travel")
    commitPair(root, Seq(1L -> "a1"), Seq(1L -> "b1"))
    commitPair(root, Seq(2L -> "a2"), Seq(2L -> "b2"))
    val m1 = TxCommit.manifest(spark, root, 1L)
    assert(spark.read.parquet(m1("alpha")).as[(Long, String)].collect()
      .toSet === Set(1L -> "a1"))
  }

  test("manifest escaping round-trips hostile names and paths") {
    val hostile = Map(
      "out\"quoted" -> "/p/a\\th\"x",
      "tab\there" -> "/plain")
    val root = freshRoot("escape")
    val t = TxCommit.begin(spark, root)
    assert(TxCommit.commit(spark, t, hostile))
    assert(TxCommit.latest(spark, root) === hostile)
  }
}
