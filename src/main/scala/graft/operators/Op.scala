package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered engine operation: a DataFrame program over a testdata
  * scale-factor dir, plus (when SQL-expressible) a DuckDB oracle twin.
  * Column names/types of `build` and `oracle` must agree exactly — the
  * driver sorts columns by name and hash-compares values.
  */
final case class Op(
    name: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Op {
  def apply(name: String, oracle: String)(
      build: (SparkSession, String) => DataFrame): Op =
    Op(name, build, Some(oracle))

  def noOracle(name: String)(build: (SparkSession, String) => DataFrame): Op =
    Op(name, build, None)
}
