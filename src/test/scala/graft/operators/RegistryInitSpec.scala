package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Structural guard for the Op init-order law (round-11 verdict #1).
  *
  * The bug class: `val op: Op = Op(name, s"… $K …")(…)` where `K` is a
  * constant declared LATER in the same object. With an eagerly-built
  * oracle String the interpolation runs during object init, freezes
  * K's pre-init zero into the SQL, and can leave the oracle
  * *vacuously green* (observed in round 11: `q_simhash_recall`'s scope
  * gate became `n_words <= 0` — an empty truth set both engines agreed
  * on). [[Op]]'s oracle is now BY-NAME, rendered only on access; this
  * spec pins that contract with a deliberate forward-reference fixture
  * and audits every registered oracle for the degenerate artifacts a
  * pre-init capture would leave behind.
  */
class RegistryInitSpec extends AnyFunSuite {

  /** The exact regression shape: the Op val precedes the constants its
    * oracle interpolates. Under the pre-round-12 eager-String Op this
    * object rendered "… <= 0 …" / "… null …"; under the by-name Op the
    * thunk reads the field getters at access time, post-init. */
  private object ForwardRefFixture {
    val op: Op = Op("t_forward_ref",
      s"SELECT d FROM t WHERE n_words <= $WordCap AND lang = '$Lang'")(
      (_, _) => throw new UnsupportedOperationException("oracle-only fixture"))
    val WordCap = 4096
    val Lang = "en"
  }

  test("forward-referenced constants render post-init values, not " +
    "pre-init zeros (the q_simhash_recall bug shape)") {
    assert(ForwardRefFixture.op.oracle.contains(
      "SELECT d FROM t WHERE n_words <= 4096 AND lang = 'en'"))
  }

  test("every registered oracle renders deterministically " +
    "(byte-identical across repeated access)") {
    graft.SparkEntry.ops.foreach { op =>
      val first = op.oracle
      val second = op.oracle
      assert(first === second, s"${op.name}: oracle render is not stable")
    }
  }

  test("no registered oracle carries a pre-init capture artifact " +
    "(the literal 'null' a null String constant would interpolate)") {
    // a pre-init String constant interpolates as the 4 chars "null";
    // SQL's own null handling in this codebase is spelled NULL /
    // COALESCE, so any lowercase standalone token is a captured bug
    val token = "(?<![A-Za-z_])null(?![A-Za-z_])".r
    val offenders = graft.SparkEntry.ops.flatMap { op =>
      op.oracle.filter(sql => token.findFirstIn(sql).isDefined)
        .map(_ => op.name)
    }
    assert(offenders.isEmpty,
      s"oracles interpolated a null constant: ${offenders.mkString(", ")}")
  }

  test("every registered oracle is non-empty SQL and every name is " +
    "unique (a degenerate render cannot hide as an absent oracle)") {
    val ops = graft.SparkEntry.ops
    assert(ops.map(_.name).distinct.size === ops.size, "duplicate op names")
    ops.foreach { op =>
      val sql = op.oracle.getOrElse(
        fail(s"${op.name}: driver contract requires an oracle"))
      assert(sql.toUpperCase.contains("SELECT"), s"${op.name}: not SQL")
    }
  }

  test("noOracle constructs an oracle-free op") {
    assert(Op.noOracle("t_none")((_, _) => null).oracle.isEmpty)
  }

  test("API.md's registered-op count matches the live registry " +
    "(r13 verdict: the front-door doc drifted to a stale count)") {
    val apiMd = java.nio.file.Paths.get("API.md")
    assume(java.nio.file.Files.exists(apiMd), "API.md not at test cwd")
    val text = new String(
      java.nio.file.Files.readAllBytes(apiMd), "UTF-8")
    val m = "(\\d+) named".r.findFirstMatchIn(text).getOrElse(
      fail("API.md no longer states the registered-op count"))
    assert(m.group(1).toInt === graft.SparkEntry.queries.size,
      "API.md op count is stale — update the '<N> named' line")
  }
}
