package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The cross-engine hash primitives every text/dedup operator builds on.
  * ONE definition: five call sites (token hashes, fingerprints, rolling
  * and winnowing hashes) must stay bit-identical to their DuckDB oracle
  * twins, and a drift in any inlined copy would break cross-operator
  * consistency silently.
  */
object Hashes {

  /** Portable 60-bit hash: top 15 hex chars of md5 as a long — identical
    * in DuckDB via `CAST('0x' || substr(md5(x), 1, 15) AS BIGINT)`; 60
    * bits fits a signed int64 exactly. */
  def hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** lower + collapse whitespace: the canonical text both engines hash
    * (DuckDB twin needs the 'g' flag on regexp_replace). */
  def normText(t: Column): Column =
    trim(regexp_replace(lower(t), "\\s+", " "))
}
