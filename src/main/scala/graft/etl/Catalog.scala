package graft.etl

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Catalog-database target (SURVEY.md §2 A10/A11 — the reference's
  * `ETLAlchemyTarget(conn, drop_database=True)`: dialect-specific DROP
  * DATABASE + CREATE DATABASE before the sources run,
  * `ETLAlchemyTarget.py::migrate` ~L30–110). Spark-native form: the
  * session catalog's databases + managed tables — `saveAsTable` carries
  * the standardized schema (A10's CREATE TABLE), and drop/recreate is
  * real `DROP DATABASE ... CASCADE` DDL, not a directory rm.
  */
object Catalog {

  /** A11: drop-and-recreate the target database (CASCADE drops its
    * managed tables and their data, exactly the reference's clean-slate
    * semantics).
    */
  def recreateDatabase(spark: SparkSession, db: String): Unit = {
    spark.sql(s"DROP DATABASE IF EXISTS `$db` CASCADE")
    // An in-memory catalog forgets databases across sessions but their
    // warehouse directories survive, so a later managed-table create
    // would hit LOCATION_ALREADY_EXISTS — clear any stale location too
    // (the reference's SQLite drop_database is likewise a file delete).
    val loc = new org.apache.hadoop.fs.Path(
      spark.sessionState.conf.warehousePath, s"$db.db")
    val fs = loc.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(loc)) fs.delete(loc, true)
    spark.sql(s"CREATE DATABASE `$db`")
  }

  /** A10: create-or-replace a managed table in `db` from the DataFrame's
    * (already standardized) schema. Append mode = the reference's
    * pre-existing-table path.
    */
  def writeTable(df: DataFrame, db: String, table: String,
                 mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).saveAsTable(s"`$db`.`$table`")

  /** Persistent tables of `db` — listTables also surfaces session temp
    * views (memory sinks etc.) regardless of database, so filter to
    * non-temporary entries.
    */
  def tables(spark: SparkSession, db: String): Seq[String] =
    spark.catalog.listTables(db).collect()
      .filter(!_.isTemporary).map(_.name).sorted.toSeq
}
