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

  test("object-store publish (conditional-PUT double): two committers " +
    "racing one version through the primitive itself — exactly one " +
    "wins with NO exists-check window") {
    val root = freshRoot("condput")
    val put = new AtomicPublish.ConditionalPut
    val ta = TxCommit.begin(spark, root)
    val tb = TxCommit.begin(spark, root)
    assert(ta.version === tb.version)
    dfOf(1L -> "A").write.mode("overwrite").parquet(ta.stage("alpha"))
    dfOf(1L -> "B").write.mode("overwrite").parquet(tb.stage("alpha"))
    val wins = Seq(
      TxCommit.commit(spark, ta, Map("alpha" -> ta.stage("alpha")), put),
      TxCommit.commit(spark, tb, Map("alpha" -> tb.stage("alpha")), put))
    assert(wins.count(identity) === 1, "conditional PUT admits ONE writer")
    // the winner's manifest is readable through the normal path and
    // resolves only the winner's staging dir
    val live = TxCommit.latest(spark, root)("alpha")
    val winner = if (wins.head) ta else tb
    assert(live === winner.stage("alpha"))
    assert(TxCommit.read(spark, root, "alpha").as[(Long, String)].collect()
      .toSet === Set(1L -> (if (wins.head) "A" else "B")))
  }

  test("conditional-PUT double under true concurrency: N threads, one " +
    "winner, winner's payload is what readers see") {
    val root = freshRoot("condput-threads")
    val fs = new Path(root).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new Path(s"$root/_commits"))
    val put = new AtomicPublish.ConditionalPut
    val dest = new Path(s"$root/_commits/v00000001.json")
    val start = new java.util.concurrent.CountDownLatch(1)
    val results = new java.util.concurrent.ConcurrentLinkedQueue[Boolean]()
    val threads = (1 to 8).map { i =>
      new Thread(() => {
        start.await()
        results.add(put.publishIfAbsent(fs, dest,
          s"""{"version":1,"outputs":{"o":"/p$i"}}""".getBytes("UTF-8")))
      })
    }
    threads.foreach(_.start())
    start.countDown()
    threads.foreach(_.join())
    import scala.jdk.CollectionConverters._
    assert(results.asScala.count(identity) === 1,
      "exactly one concurrent publisher may win")
    // the winning payload parses as one complete manifest
    assert(TxCommit.versions(spark, root) === Seq(1L))
    assert(TxCommit.latest(spark, root).keySet === Set("o"))
  }

  test("conditional-PUT double treats a pre-existing object as a " +
    "standing claim (precondition fails regardless of author)") {
    val root = freshRoot("condput-existing")
    // committed through the default filesystem primitive first
    commitPair(root, Seq(1L -> "a1"), Seq(1L -> "b1"))
    val put = new AtomicPublish.ConditionalPut
    val t2 = TxCommit.begin(spark, root)
    val loser = TxCommit.Txn(root, 1L, t2.token) // tries to re-claim v1
    dfOf(9L -> "X").write.mode("overwrite").parquet(loser.stage("alpha"))
    assert(!TxCommit.commit(spark, loser,
      Map("alpha" -> loser.stage("alpha")), put))
    assert(TxCommit.read(spark, root, "alpha").as[(Long, String)].collect()
      .toSet === Set(1L -> "a1"))
  }

  test("conditional PUT racing a cross-instance winner inside the " +
    "exists-check window returns false, never throws (ADVICE r12)") {
    val root = freshRoot("condput-window")
    val fs = new Path(root).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new Path(s"$root/_commits"))
    val dest = new Path(s"$root/_commits/v00000001.json")
    // the racer publishes through a DIFFERENT instance, so the loser's
    // in-memory claim set cannot know about it
    assert(new AtomicPublish.ConditionalPut()
      .publishIfAbsent(fs, dest, "winner".getBytes("UTF-8")))
    // an eventually-consistent store may answer the exists probe with
    // a stale NO after the racer's PUT — simulate with a filesystem
    // whose first probe lies, landing the loser exactly in the window
    // where create(dest, false) raises FileAlreadyExistsException
    val stale = new org.apache.hadoop.fs.FilterFileSystem(fs) {
      private var lied = false
      override def exists(p: Path): Boolean =
        if (!lied && p == dest) { lied = true; false }
        else super.exists(p)
    }
    val loser = new AtomicPublish.ConditionalPut
    assert(!loser.publishIfAbsent(stale, dest, "loser".getBytes("UTF-8")),
      "the precondition failing mid-window is a lost race, not a throw")
    // the winner's payload is untouched
    val in = fs.open(dest)
    val buf = new Array[Byte](64)
    val n = in.read(buf); in.close()
    assert(new String(buf, 0, n, "UTF-8") === "winner")
  }

  test("a losing stream compactor leaves no visible compacted data " +
    "dir (publish refused by the store precondition)") {
    val root = freshRoot("condput-compact")
    val t = TxCommit.begin(spark, root)
    dfOf(1L -> "r1").write.mode("overwrite").parquet(t.stage("rollup"))
    assert(TxCommit.commit(spark, t, Map("rollup" -> t.stage("rollup"))))
    val schema = dfOf(1L -> "r1").schema
    // a faster compactor won between our listing and our publish: the
    // conditional PUT's precondition fails for us
    val alwaysLose = new AtomicPublish {
      def publishIfAbsent(f: org.apache.hadoop.fs.FileSystem, d: Path,
          p: Array[Byte]): Boolean = false
    }
    assert(!TxCommit.compactStream(spark, root, "rollup", schema, alwaysLose))
    val fs = new Path(root).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val compactData = new Path(s"$root/_compactdata")
    assert(!fs.exists(compactData) ||
      fs.listStatus(compactData).isEmpty,
      "losing compactor's data dir must be removed")
    // and the append-mode read still resolves the per-version dirs
    assert(TxCommit.readAll(spark, root, "rollup", schema)
      .as[(Long, String)].collect().toSet === Set(1L -> "r1"))
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
