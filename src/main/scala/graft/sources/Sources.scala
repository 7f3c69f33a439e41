package graft.sources

import org.apache.spark.sql.{DataFrame, DataFrameReader, SparkSession}

import graft.api.Connection

/** External source/sink surface (SURVEY.md §2.C C1-C3): parquet is the
  * native store format; CSV/JSON cover file interchange; JDBC binds through
  * a [[Connection]] parameter (reference node.py:508-510 — the credentials
  * bundle a node receives for an external system).
  */
object Sources {
  /** Parquet scan — the catalog's native read path (C1). */
  def parquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** CSV with header + schema inference, or an explicit DDL schema (C2).
    * Defaults are applied BEFORE the caller's options so an explicit
    * `header=false` / `inferSchema=false` wins — the reverse order
    * silently consumed a headerless file's first data row as names.
    */
  def csv(spark: SparkSession, path: String, schemaDdl: Option[String] = None,
      options: Map[String, String] = Map.empty): DataFrame =
    withSchema(spark.read.option("header", "true"), schemaDdl)
      .options(options)
      .csv(path)

  /** JSON lines with inference or explicit DDL schema (C2). */
  def json(spark: SparkSession, path: String, schemaDdl: Option[String] = None,
      options: Map[String, String] = Map.empty): DataFrame =
    withSchema(spark.read, schemaDdl).options(options).json(path)

  /** ORC — the other columnar interchange format Spark ships natively
    * (C2). Same pushdown/pruning story as parquet (vectorized reader,
    * min/max stripe stats), so it is a drop-in for version dirs written
    * by ORC-producing upstreams.
    */
  def orc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** JDBC source from a Connection credentials bundle (C2/A29). The
    * partitioning options (partitionColumn/lowerBound/upperBound/
    * numPartitions) pass straight through — at scale a JDBC read without
    * them is a single-task scan, so callers should always provide them.
    */
  def jdbc(spark: SparkSession, conn: Connection, table: String,
      options: Map[String, String] = Map.empty): DataFrame =
    spark.read.format("jdbc")
      .options(conn.props ++ options)
      .option("dbtable", table)
      .load()

  private def withSchema(r: DataFrameReader, ddl: Option[String]): DataFrameReader =
    ddl match {
      case Some(s) => r.schema(s)
      case None => r.option("inferSchema", "true")
    }
}
