package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bridge into `private[sql]` plan-level constructors.
  *
  * The engine's plan memo (SparkEntry / QueryServer) wants to hand out
  * DataFrames whose logical plan is the ALREADY-OPTIMIZED tree of the
  * first build: later actions over the handle then re-run the optimizer
  * across an already-converged tree (idempotent rules fixpoint in one
  * pass) instead of re-deriving the full rewrite from the raw
  * construction — the "cached analyzed/optimized relation subtree"
  * design. Spark exposes plan→Dataset construction only inside
  * `private[sql]`, hence this one-file subpackage shim (same approach
  * plan-level extension libraries use; no behavior is overridden). */
object PlanDataset {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
