package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** S9: catalog introspection — the reference's `pg_indexes` diagnostics
  * (`/root/reference/scripts/show_indexes.py:4-12`) generalized to "what
  * tables/columns does the engine serve". Spark analog of
  * `information_schema.columns`, derived from the declared schemas the
  * readers actually enforce (Schemas.byName), so the answer is the truth
  * the engine operates on, not a re-inference.
  */
object Catalog {
  /** One row per (table, column): table_name, column_name, ordinal (1-based). */
  def columns(s: SparkSession): DataFrame = {
    import scala.jdk.CollectionConverters._
    val rows = Schemas.byName.toSeq.sortBy(_._1).flatMap { case (t, schema) =>
      schema.fields.zipWithIndex.map { case (f, i) =>
        org.apache.spark.sql.Row(t, f.name, i + 1)
      }
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("table_name", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("column_name", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("ordinal", org.apache.spark.sql.types.IntegerType)))
    s.createDataFrame(rows.asJava, schema)
  }

  def columnsSql: String = {
    val names = Schemas.byName.keys.toSeq.sorted.map(n => s"'$n'").mkString(", ")
    s"""SELECT table_name, column_name, CAST(ordinal_position AS INT) AS ordinal
       |FROM information_schema.columns
       |WHERE table_name IN ($names)
       |ORDER BY table_name, ordinal""".stripMargin
  }
}
