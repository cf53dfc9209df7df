package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset, SparkSession => ClassicSession}

/** The one `private[sql]` doorway the engine needs: turning a custom
  * [[LogicalPlan]] (graft's AsOfJoin node) into a user-facing DataFrame.
  * Spark exposes no public constructor for this — every library that ships
  * its own logical operator (Delta, Sedona, Iceberg) carries exactly this
  * shim in the `org.apache.spark.sql` namespace. Nothing else of Spark's
  * internals is accessed here.
  */
object GraftSqlShim {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    Dataset.ofRows(spark.asInstanceOf[ClassicSession], plan)
}
