package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

/** Live-database write-back: batched keyed upsert over JDBC — the
  * reference's import scripts write INTO PostgreSQL with
  * update-then-insert per key (01_import_pricecharting_csv.js:156-187),
  * and this is that sink driven from executors instead of a Node loop.
  *
  * Semantics mirror [[Sinks.upsertByKey]] exactly: incoming wins per
  * null-safe key; rows the incoming frame doesn't touch stay put. The
  * portable statement pair (UPDATE, then INSERT where the UPDATE
  * matched nothing) is the reference's own shape and needs no unique
  * index, no dialect MERGE, no ON CONFLICT — it runs on Derby and
  * PostgreSQL alike. Idempotent by construction: re-delivering a batch
  * re-UPDATEs the same rows to the same values.
  *
  * Scale shape: `foreachPartition` — one connection, one transaction,
  * and two prepared statements PER PARTITION, rows flushed in
  * `batchSize` JDBC batches (driver round-trips ∝ rows/batchSize, not
  * rows). Nothing is collected to the driver. The caller controls the
  * connection fan-out with `repartition(n)` — at 100 TB the write
  * parallelism is the number of partitions, bounded by what the
  * database accepts, exactly like any production JDBC writer.
  *
  * The UPDATE predicate is built PER NULL-MASK: rows whose key columns
  * are all non-null (the overwhelming case) run `k = ?` — sargable, so
  * a key index turns each probe into an index seek instead of a table
  * scan — and a row with a null key component gets a statement whose
  * predicate says `k IS NULL` for exactly those components. Together
  * the statement family implements the null-safe `<=>` semantics of
  * [[Sinks.upsertByKey]] without ever paying the non-sargable
  * `(k = ? OR (k IS NULL AND ? IS NULL))` form, which forces a full
  * scan PER ROW (O(rows²) for the whole write — measured: a 20k-key
  * upsert into unindexed Derby went from minutes to sub-second after
  * this change plus the key index) and scan-locks the whole table
  * under concurrent writers.
  *
  * Caveats stated rather than hidden:
  *  - atomicity is per BATCH (each flush commits its transaction); a
  *    mid-job crash can leave earlier batches applied. Because the
  *    upsert is idempotent, the recovery is re-run, same as the
  *    reference's cron replay.
  *  - concurrent partition writers can still deadlock on lock-order
  *    races (Derby escalates under load — observed as ERROR 40001
  *    under a 4-partition write before the sargable rewrite).
  *    Transient serialization failures (SQLState 40xxx) roll back and
  *    RETRY the batch with backoff — retry is safe precisely because
  *    the batch is idempotent. A production target indexes the key
  *    columns, which shrinks the lock footprint to the touched rows.
  *  - WITHIN a partition, same-key rows resolve last-wins (each batch
  *    dedups by key keeping the last row; across batches the later
  *    batch's UPDATE overwrites). ACROSS partitions same-key rows
  *    still race; callers partition or dedup by key first (the import
  *    scripts do the same).
  */
// Serializable because foreachPartition's closure compiles to an
// instance method of this (stateless) object — the task ships the
// module reference, which is empty.
object JdbcSink extends Serializable {

  /** Upsert `df` into `table` at `url`, keyed null-safely on
    * `keyCols`. Non-key columns are the update set; all columns
    * insert. */
  def upsertByKeyJdbc(
      df: DataFrame, url: String, table: String, keyCols: Seq[String],
      batchSize: Int = 500): Unit = {
    require(keyCols.nonEmpty, "upsertByKeyJdbc needs at least one key column")
    require(keyCols.size <= 30, "null-mask statement family caps keys at 30")
    val schema = df.schema
    val cols = schema.fields.map(_.name).toSeq
    require(keyCols.forall(cols.contains),
      s"key columns ${keyCols.mkString(",")} must all be in ${cols.mkString(",")}")
    val valCols = cols.filterNot(keyCols.contains)
    require(valCols.nonEmpty, "upsertByKeyJdbc needs at least one non-key column")
    val setList = valCols.map(c => s"$c = ?").mkString(", ")
    val insertSql =
      s"INSERT INTO $table (${cols.mkString(", ")}) VALUES (${cols.map(_ => "?").mkString(", ")})"
    val fields = schema.fields
    val keyIdx = keyCols.map(k => fields.indexWhere(_.name == k)).toArray
    val valIdx = valCols.map(v => fields.indexWhere(_.name == v)).toArray
    val keyNames = keyIdx.map(fields(_).name)
    // resolved OUTSIDE the closure: referencing the enclosing object's
    // sqlTypeOf from inside foreachPartition would drag JdbcSink$ into
    // the task closure (not serializable, by design — sinks hold no state)
    val jdbcTypes = fields.map(f => sqlTypeOf(f.dataType))
    df.foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
      if (rows.nonEmpty) {
        val conn = java.sql.DriverManager.getConnection(url)
        try {
          conn.setAutoCommit(false)
          val ins = conn.prepareStatement(insertSql)
          // one UPDATE statement per observed key null-mask (bit i set =
          // key column i IS NULL for this row); mask 0 — all keys
          // present, `k = ?` only — is the one that matters at scale
          val updByMask =
            scala.collection.mutable.Map.empty[Int, java.sql.PreparedStatement]
          def updFor(mask: Int): java.sql.PreparedStatement =
            updByMask.getOrElseUpdate(mask, {
              val pred = keyNames.zipWithIndex.map { case (k, i) =>
                if ((mask & (1 << i)) != 0) s"$k IS NULL" else s"$k = ?"
              }.mkString(" AND ")
              conn.prepareStatement(s"UPDATE $table SET $setList WHERE $pred")
            })
          def maskOf(row: org.apache.spark.sql.Row): Int = {
            var m = 0; var i = 0
            while (i < keyIdx.length) {
              if (row.isNullAt(keyIdx(i))) m |= (1 << i); i += 1
            }
            m
          }
          try {
            val pending = new scala.collection.mutable.ArrayBuffer[
              org.apache.spark.sql.Row](batchSize)

            def setParam(st: java.sql.PreparedStatement, pos: Int,
                row: org.apache.spark.sql.Row, field: Int): Unit = {
              val dt = fields(field).dataType
              if (row.isNullAt(field))
                st.setNull(pos, jdbcTypes(field))
              else dt match {
                case LongType => st.setLong(pos, row.getLong(field))
                case IntegerType => st.setInt(pos, row.getInt(field))
                case ShortType => st.setShort(pos, row.getShort(field))
                case DoubleType => st.setDouble(pos, row.getDouble(field))
                case FloatType => st.setFloat(pos, row.getFloat(field))
                case StringType => st.setString(pos, row.getString(field))
                case BooleanType => st.setBoolean(pos, row.getBoolean(field))
                case DateType => st.setDate(pos, row.getDate(field))
                case TimestampType => st.setTimestamp(pos, row.getTimestamp(field))
                case _: DecimalType => st.setBigDecimal(pos, row.getDecimal(field))
                case other => throw new IllegalArgumentException(
                  s"upsertByKeyJdbc: unsupported column type $other")
              }
            }

            def bindUpd(upd: java.sql.PreparedStatement,
                row: org.apache.spark.sql.Row): Unit = {
              var pos = 1
              valIdx.foreach { f => setParam(upd, pos, row, f); pos += 1 }
              keyIdx.foreach { f =>
                if (!row.isNullAt(f)) { setParam(upd, pos, row, f); pos += 1 }
              }
            }

            def applyBatchOnce(): Unit = {
              // dedup the batch by key, LAST occurrence wins: without
              // this, two same-key rows in one batch would both UPDATE
              // (both matching nothing on first sight of the key), then
              // both INSERT — duplicate rows from a single partition.
              // Null keys compare as values here (mask partitioning
              // makes (null, 1) and (0, 1) distinct entries).
              val deduped = {
                val last = scala.collection.mutable.LinkedHashMap
                  .empty[Seq[Any], org.apache.spark.sql.Row]
                pending.foreach { row =>
                  last.update(
                    keyIdx.map(i => if (row.isNullAt(i)) null else row.get(i))
                      .toSeq, row)
                }
                last.values
              }
              // group by null-mask; order within a group is row order,
              // and cross-group order is irrelevant because masks
              // partition the key space (a mask-0 row can never collide
              // with a mask-1 row's key)
              val byMask = deduped.toSeq.groupBy(maskOf)
              var hasInserts = false
              byMask.foreach { case (mask, group) =>
                val upd = updFor(mask)
                group.foreach { row => bindUpd(upd, row); upd.addBatch() }
                val batchCounts = upd.executeBatch()
                // drivers may report batch success without per-row
                // counts (Statement.SUCCESS_NO_INFO, e.g. MySQL with
                // rewriteBatchedStatements, Oracle's batch default);
                // treating -2 as "updated" would silently drop the
                // insert. Fall back to per-row execution — safe because
                // the UPDATE sets absolute values, so re-executing a
                // row that DID update is idempotent and returns the
                // true match count.
                val updated =
                  if (batchCounts.exists(_ == java.sql.Statement.SUCCESS_NO_INFO))
                    group.map { row =>
                      bindUpd(upd, row); upd.executeUpdate()
                    }.toArray
                  else batchCounts
                // rows whose UPDATE matched nothing are the inserts
                var i = 0
                while (i < group.length) {
                  if (updated(i) == 0) {
                    var pos = 1
                    (0 until fields.length).foreach { f =>
                      setParam(ins, pos, group(i), f); pos += 1
                    }
                    ins.addBatch()
                    hasInserts = true
                  }
                  i += 1
                }
              }
              if (hasInserts) ins.executeBatch(): Unit
              conn.commit()
            }

            def transient40(e: Throwable): Boolean = e match {
              case s: java.sql.SQLException =>
                val state = s.getSQLState
                (state != null && state.startsWith("40")) ||
                  (s.getNextException != null && transient40(s.getNextException)) ||
                  (s.getCause != null && transient40(s.getCause))
              case other =>
                other.getCause != null && transient40(other.getCause)
            }

            def flush(): Unit = if (pending.nonEmpty) {
              var attempt = 0
              var done = false
              while (!done) {
                try { applyBatchOnce(); done = true }
                catch {
                  case e: Throwable if transient40(e) && attempt < 8 =>
                    // deadlock victim / lock timeout: the transaction
                    // rolled back whole, the batch is idempotent — retry
                    conn.rollback()
                    updByMask.values.foreach(_.clearBatch())
                    ins.clearBatch()
                    attempt += 1
                    Thread.sleep(15L * attempt)
                  case e: Throwable => conn.rollback(); throw e
                }
              }
              pending.clear()
            }

            rows.foreach { r =>
              pending += r
              if (pending.length >= batchSize) flush()
            }
            flush()
          } finally {
            updByMask.values.foreach(_.close()); ins.close()
          }
        } finally conn.close()
      }
    }
  }

  private def sqlTypeOf(dt: DataType): Int = dt match {
    case LongType => java.sql.Types.BIGINT
    case IntegerType => java.sql.Types.INTEGER
    case ShortType => java.sql.Types.SMALLINT
    case DoubleType => java.sql.Types.DOUBLE
    case FloatType => java.sql.Types.FLOAT
    case StringType => java.sql.Types.VARCHAR
    case BooleanType => java.sql.Types.BOOLEAN
    case DateType => java.sql.Types.DATE
    case TimestampType => java.sql.Types.TIMESTAMP
    case _: DecimalType => java.sql.Types.DECIMAL
    case other => throw new IllegalArgumentException(
      s"upsertByKeyJdbc: unsupported column type $other")
  }
}
