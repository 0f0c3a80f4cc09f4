package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * System columns — the Spark restatement of the reference's `sys__id` /
 * `sys__rand` (reference: src/datachain/data_storage/schema.py:269-274).
 *
 * In the reference every materialized table carries an autoincrement id and
 * a persisted random; id drives UDF join-back (we don't need that — Spark
 * UDF steps carry all columns through the closure) and rand drives
 * deterministic shuffle / chunk / train_test_split. Here sys columns are
 * stamped only at materialization (save) time and persisted with the data,
 * so chunk/shuffle are reproducible per dataset version:
 *
 *  - `sys.id`:   zipWithIndex-free, partition-stable `monotonically_increasing_id`
 *  - `sys.rand`: avalanche hash of the id (deterministic given the version),
 *                non-negative 63-bit.
 *
 * Both live under a single `sys` struct so `select("*")`-style user queries
 * can drop them with one `drop("sys")`.
 */
object Sys {
  val ColName = "sys"

  /** Stamp sys columns (idempotent: re-stamps if already present). */
  def stamp(df: DataFrame, seed: Long = 0L): DataFrame = {
    val base = if (df.columns.contains(ColName)) df.drop(ColName) else df
    val id = monotonically_increasing_id()
    // xxhash64 is Spark's codegen'd 64-bit hash; mask to non-negative.
    val rnd = xxhash64(id, lit(seed)).bitwiseAND(lit(Long.MaxValue))
    base.withColumn(ColName, struct(id.as("id"), rnd.as("rand")))
  }

  def drop(df: DataFrame): DataFrame =
    if (df.columns.contains(ColName)) df.drop(ColName) else df

  /** Stamp sys for rows APPENDED to an existing version (copy-on-write
    * merge inserts): ids start past `base` — the max id already present
    * in the carried files — so carried rows keep their identity and new
    * rows never collide with it. Same rand derivation as [[stamp]]. */
  def stampFrom(df: DataFrame, base: Long, seed: Long = 0L): DataFrame = {
    val b = if (df.columns.contains(ColName)) df.drop(ColName) else df
    val id = monotonically_increasing_id() + lit(base + 1L)
    val rnd = xxhash64(id, lit(seed)).bitwiseAND(lit(Long.MaxValue))
    b.withColumn(ColName, struct(id.as("id"), rnd.as("rand")))
  }
}
