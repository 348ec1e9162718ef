package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable query: a Spark implementation plus (usually) an
  * equivalent DuckDB SQL oracle over the same parquet tables.
  *
  * Oracle-parity rules (learned the hard way, keep following them):
  *  - alias every computed column identically on both sides;
  *  - never emit raw double aggregates whose accumulation order matters:
  *    sum/avg go through DECIMAL then CAST AS DOUBLE;
  *  - DuckDB numeric literals are DECIMAL — always CAST AS DOUBLE in the
  *    oracle where Spark uses double literals;
  *  - align integer widths (Spark row_number is INT, DuckDB's is BIGINT);
  *  - array results are sorted on both sides (DuckDB list_distinct does
  *    not preserve order).
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

trait QueryPack {
  def all: Seq[Q]
}
