package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Subset verify for fast local iteration: dump only the named queries
  * (plus their oracle SQL) so `tools/check.py <sfDir> <outDir> <names>`
  * can gate one operator without a full 60-query Verify pass.
  *
  * Usage: Test/runMain graft.VerifySubset <sfDir> <outDir> name [name ...]
  */
object VerifySubset {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: VerifySubset <sfDir> <outDir> <query> [query ...]")
    val (sfDir, outDir, names) = (args(0), args(1), args.drop(2).toSeq)
    val unknown = names.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"not declared in SparkEntry.queries: ${unknown.mkString(", ")}")
    // Same gate knobs as Verify, via the shared session fold (so the
    // chunked sf10 gate can run under a local-cluster master too).
    val spark = GraftSession.build(defaultCpus = "8")
    new java.io.File(outDir).mkdirs()
    // Same funnel discipline as Verify: repartition(1), not coalesce(1)
    // (coalesce serializes the whole final stage into the write task),
    // and SPARK_GRAFT_VERIFY_NATURAL=1 skips the funnel for big sfs.
    val natural = sys.env.contains("SPARK_GRAFT_VERIFY_NATURAL")
    // NTZ at the dump boundary: see Verify.naiveTs (µs instants read as
    // TIMESTAMPTZ in DuckDB; oracles emit naive TIMESTAMP).
    def naiveTs(df: org.apache.spark.sql.DataFrame) =
      df.schema.fields.foldLeft(df) { (d, f) =>
        if (f.dataType == org.apache.spark.sql.types.TimestampType)
          d.withColumn(f.name, org.apache.spark.sql.functions.col(f.name)
            .cast(org.apache.spark.sql.types.TimestampNTZType))
        else d
      }
    names.foreach { n =>
      val t0 = System.nanoTime()
      val df = naiveTs(SparkEntry.queries(n)(spark, sfDir))
      (if (natural) df else df.repartition(1))
        .write.mode("overwrite").parquet(s"$outDir/$n")
      println(f"PROBE $n done ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    def q(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case '\r' => "\\r"; case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // The FULL oracle map, not just the subset: check.py reads this
    // file for whatever queries it is asked to gate, and a subset dump
    // into a dir produced by a full Verify must not clobber the other
    // queries' oracle entries.
    val json = SparkEntry.oracleSql
      .map { case (n, sql) => s"${q(n)}: ${q(sql)}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    val waivers = SparkEntry.valueWaived
      .map { case (n, v) => s"${q(n)}: ${q(v)}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/waivers.json"), waivers)
    spark.stop()
  }
}
