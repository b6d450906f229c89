package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Mart DDL management — the engine-side analog of the reference's
  * serving-store DDL (docker/init/01_marts.sql, 02_era5_tables.sql):
  * register the hive-partitioned mart layout as an EXTERNAL catalog
  * table so consumers address it by name, with partition pruning and
  * schema enforcement owned by the catalog instead of ad-hoc paths.
  */
object Catalog {

  /** Create (if absent) an external parquet table over `location`,
    * partitioned by `partitionCols` (declare them, with types, inside
    * `columnsDdl`), then recover its partitions from the directory
    * layout. Idempotent: safe to run every pipeline cycle, exactly
    * like the reference's `CREATE TABLE IF NOT EXISTS` init scripts.
    * Recovery scans only the directory tree (partition values live in
    * the hive paths, no data files are opened).
    */
  def ensureMartTable(spark: SparkSession, name: String, location: String,
      columnsDdl: String, partitionCols: Seq[String]): Unit = {
    require(partitionCols.nonEmpty, "a mart table is partitioned")
    spark.sql(
      s"""CREATE TABLE IF NOT EXISTS $name ($columnsDdl)
         |USING PARQUET
         |PARTITIONED BY (${partitionCols.mkString(", ")})
         |LOCATION '$location'""".stripMargin)
    spark.sql(s"ALTER TABLE $name RECOVER PARTITIONS")
  }

  /** Refresh catalog state after out-of-band writes to the mart
    * location (new partitions appear; cached file listings drop).
    */
  def refreshMart(spark: SparkSession, name: String): Unit = {
    spark.sql(s"ALTER TABLE $name RECOVER PARTITIONS")
    spark.catalog.refreshTable(name)
  }

  /** The mart by name — partition-pruned scans when filtered on the
    * partition columns.
    */
  def mart(spark: SparkSession, name: String): DataFrame =
    spark.table(name)
}
