package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset => CDataset, SparkSession => CSparkSession}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The one `private[sql]` doorway the custom whole-operator path needs:
  * turning a hand-built [[LogicalPlan]] back into a [[DataFrame]].
  * Everything else the custom as-of join uses ([[org.apache.spark.sql
  * .execution.SparkPlan]], strategies, `SparkSessionExtensions`) is
  * public extension API; `Dataset.ofRows` alone is `private[sql]`, so
  * this shim lives under the `org.apache.spark.sql` package — the same
  * technique every public Spark extension library uses (see SNIPPETS.md
  * [1], a public column-store extension doing exactly this).
  */
object Bridge {
  def ofRows(s: SparkSession, plan: LogicalPlan): DataFrame =
    CDataset.ofRows(s.asInstanceOf[CSparkSession], plan)
}
