package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}

/** The atomic-publish primitive the manifest protocol's correctness
  * rests on (r11 verdict #5): [[TxCommit]]'s commit point is "make
  * this payload visible at `dest` iff nothing is published there yet,
  * with EXACTLY ONE winner under racing publishers". How that
  * primitive is realized depends on the store:
  *
  *  - **HDFS / POSIX filesystems** — write to a nonce temp name, then
  *    rename into place ([[AtomicPublish.RenameIfAbsent]]). HDFS
  *    rename natively refuses an existing destination (atomic
  *    no-overwrite); POSIX rename(2) would overwrite, so a local FS
  *    adds an exists-guard that narrows the race to the metadata
  *    instant — fine for dev/test, and HDFS closes it for real.
  *  - **S3-class object stores** (the 100 TB deployment target) — no
  *    atomic rename exists; the primitive is a CONDITIONAL PUT
  *    (`If-None-Match: *`): the store itself accepts exactly one
  *    writer per key. S3 (since Nov 2024), GCS (`ifGenerationMatch=0`)
  *    and ABFS (ETag preconditions) all provide it. A deployment
  *    implements this trait over its store SDK;
  *    [[AtomicPublish.ConditionalPut]] is the in-memory semantic
  *    double the race-path specs drive.
  *
  * The protocol above the primitive is unchanged either way: stage
  * under nonce dirs, publish ONE manifest per version, losers
  * re-stage, readers resolve only through committed manifests.
  */
trait AtomicPublish {

  /** Atomically publish `payload` at `dest` iff nothing is published
    * there yet. Returns true iff THIS call won; a losing call must
    * leave no trace visible at `dest`. */
  def publishIfAbsent(f: FileSystem, dest: Path, payload: Array[Byte]): Boolean
}

object AtomicPublish {

  /** Filesystem realization: nonce temp file + rename-if-absent. */
  object RenameIfAbsent extends AtomicPublish {
    def publishIfAbsent(
        f: FileSystem, dest: Path, payload: Array[Byte]): Boolean = {
      // temp name carries a nonce: racing publishers must not collide
      // pre-rename
      val tmp = new Path(dest.getParent,
        s".tmp-${dest.getName}-${java.util.UUID.randomUUID()}")
      val out = f.create(tmp, false)
      try out.write(payload) finally out.close()
      val won = !f.exists(dest) && f.rename(tmp, dest)
      if (!won) f.delete(tmp, false)
      won
    }
  }

  /** Object-store semantic double: the winner decision is ONE atomic
    * claim on the qualified key (a conditional PUT's `If-None-Match:
    * *` precondition) — there is NO exists-check window at all, so
    * the spec can drive two publishers through the exact interleaving
    * that defeats a naive check-then-rename on eventually-consistent
    * stores. The winning payload still lands on the real (test)
    * filesystem so readers resolve it exactly as in production. */
  final class ConditionalPut extends AtomicPublish {
    private val claimed =
      java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

    def publishIfAbsent(
        f: FileSystem, dest: Path, payload: Array[Byte]): Boolean = {
      val key = f.makeQualified(dest).toString
      // a pre-existing object is a standing claim (the store's
      // precondition fails regardless of who created the object)
      if (f.exists(dest)) { claimed.add(key); return false }
      if (!claimed.add(key)) return false
      // ADVICE r12: dest can appear BETWEEN the exists check and the
      // create (a racer through a different ConditionalPut instance,
      // RenameIfAbsent, or another process) — the store's precondition
      // failing there must read as "lost the race", never as a thrown
      // exception, or the trait's "returns true iff THIS call won"
      // contract breaks
      try {
        val out = f.create(dest, false)
        try out.write(payload) finally out.close()
        true
      } catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
        case _: java.io.IOException if f.exists(dest) => false
      }
    }
  }
}
