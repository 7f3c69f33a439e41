package graft.streaming

import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.{StructType, TimestampType}

import graft.catalog.TableCatalog

/** Structured Streaming source over a catalog table (SURVEY.md §7.6): the
  * engine's batch-incremental cursor (graft.api.Stream — strictly-greater-
  * than consumption on an ordering column, node.py:18-81) exposed through
  * Spark's streaming offset log, so a graph node can run CONTINUOUS
  * instead of per-trigger.
  *
  * `spark.readStream.format("graft.streaming.GraftTableSourceProvider")
  *    .option("root", catalogRoot).option("table", name)
  *    [.option("orderBy", col)]` — orderBy defaults through the table's
  * schema roles exactly like Table.asStream (monotonic id, else created).
  *
  * Offsets are VALUES of the ordering column (serialized as strings, cast
  * back to the column type for comparison), not file names or positions —
  * which is what makes the cursor survive version swaps: an upsert or
  * compaction moves the active pointer to a new directory, file-tailing
  * sources (tailParquet) lose their place, but `orderBy > cursor` means
  * the same rows regardless of which directory holds them. Each batch is
  * a plain pruned/pushed-down parquet scan of the active version
  * (`PushedFilters: GreaterThan(orderBy, cursor)`), so a version written
  * sorted on the cursor column skips fully-consumed files via min/max
  * stats — the same scale shape as the batch Stream.
  */
class GraftTableSourceProvider extends StreamSourceProvider with DataSourceRegister {

  override def shortName(): String = "graft-table"

  private def resolve(params: Map[String, String]): (TableCatalog, String, String) = {
    val root = params.getOrElse("root",
      throw new IllegalArgumentException("graft-table source requires option 'root'"))
    val table = params.getOrElse("table",
      throw new IllegalArgumentException("graft-table source requires option 'table'"))
    val cat = new TableCatalog(java.nio.file.Paths.get(root))
    // read path: a typo'd table name must fail, not mint a ghost manifest
    val meta = cat.load(table).getOrElse(throw new IllegalArgumentException(
      s"graft-table source: no table '$table' in catalog '$root'")).meta
    val orderBy = params.get("orderBy")
      .orElse(meta.addMonotonicId).orElse(meta.addCreated)
      .getOrElse(throw new IllegalArgumentException(
        s"stream over '$table' needs option 'orderBy' or a monotonic/" +
          "created schema role (node.py:196-200)"))
    (cat, table, orderBy)
  }

  private def activeSchema(sqlContext: SQLContext, cat: TableCatalog,
      table: String): StructType = {
    val m = cat.load(table).getOrElse(throw new IllegalArgumentException(
      s"graft-table source: no table '$table' in the catalog"))
    val dir = m.activeVersion.map(v => cat.versionDir(table, v))
      .getOrElse(throw new IllegalArgumentException(
        s"graft-table source: '$table' has no active version to infer a " +
          "schema from; pass .schema(...) explicitly"))
    StructType(sqlContext.sparkSession.read
      .option("mergeSchema", "true").parquet(dir.toString)
      .drop("__bucket").schema.fields)
  }

  override def sourceSchema(sqlContext: SQLContext, schema: Option[StructType],
      providerName: String, parameters: Map[String, String]): (String, StructType) = {
    val (cat, table, _) = resolve(parameters)
    (shortName(), schema.getOrElse(activeSchema(sqlContext, cat, table)))
  }

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source = {
    val (cat, table, orderBy) = resolve(parameters)
    new GraftTableSource(sqlContext, cat, table, orderBy,
      schema.getOrElse(activeSchema(sqlContext, cat, table)), metadataPath)
  }
}

/** Value cursor as a streaming offset: the ordering-column value is kept
  * as a string in the offset log and cast back to the column's type for
  * the `>` comparisons, so the offset survives restarts regardless of the
  * column's type (long ids, base32 monotonic strings, timestamps).
  */
case class CursorOffset(value: String) extends Offset {
  override val json: String = value
}

class GraftTableSource(sqlContext: SQLContext, cat: TableCatalog,
    table: String, orderBy: String, override val schema: StructType,
    metadataPath: String) extends Source {

  private def spark = sqlContext.sparkSession

  private def activeDf: Option[DataFrame] =
    cat.refresh(table).flatMap(_.activeVersion).filter { vid =>
      // a fileless active version (reset(), crash-before-write) must read
      // as "no data yet", not throw schema-inference errors at the poll
      val d = cat.versionDir(table, vid).toFile
      val top = Option(d.listFiles((f: java.io.File) =>
        f.getName.endsWith(".parquet"))).getOrElse(Array.empty[java.io.File])
      val nested = Option(d.listFiles((f: java.io.File) =>
        f.isDirectory && f.getName.startsWith("__bucket=")))
        .getOrElse(Array.empty[java.io.File])
        .exists(b => Option(b.listFiles((f: java.io.File) =>
          f.getName.endsWith(".parquet"))).exists(_.nonEmpty))
      top.nonEmpty || nested
    }.map { vid =>
      spark.read.option("mergeSchema", "true")
        .parquet(cat.versionDir(table, vid).toString)
        .drop("__bucket")
    }

  /** The ordering value as an offset string: timestamps canonicalize to
    * ISO-8601 instants (cast back losslessly at micro precision — the
    * engine's timestamp resolution); everything else round-trips through
    * its SQL string form.
    */
  private def encode(v: Any): String = v match {
    case ts: java.sql.Timestamp => ts.toInstant.toString
    case other => other.toString
  }

  private def cursorCol = col(orderBy)

  /** Highest offset value ever RETURNED, for clamping: a replace()/
    * truncate that rebuilds the table with lower ordering values must not
    * regress the offset — MicroBatchExecution would commit the lower
    * value and later appends in the (old, new] gap would be emitted
    * twice. PERSISTED (encoded form) under the source's metadataPath so
    * the clamp survives stream restarts — an in-memory-only high water
    * would re-admit the regression on the first poll of a new run.
    * Encoded-string comparison is order-correct for every supported
    * cursor type: base32 ids and ISO instants are lexicographic; numeric
    * cursors compare numerically after decode via the column type — we
    * clamp on the RAW value and compare via Comparable.
    */
  private val hwPath = java.nio.file.Paths.get(metadataPath, "graft-high-water")

  @volatile private var highWater: Option[Any] = {
    if (java.nio.file.Files.exists(hwPath)) {
      val enc = new String(java.nio.file.Files.readAllBytes(hwPath),
        java.nio.charset.StandardCharsets.UTF_8)
      Some(decode(enc))
    } else None
  }

  /** Inverse of [[encode]] against the cursor column's type. */
  private def decode(enc: String): Any =
    schema.fields.find(_.name == orderBy).map(_.dataType) match {
      case Some(org.apache.spark.sql.types.LongType) => enc.toLong
      case Some(org.apache.spark.sql.types.IntegerType) => enc.toInt
      case Some(org.apache.spark.sql.types.DoubleType) => enc.toDouble
      case Some(TimestampType) =>
        java.sql.Timestamp.from(java.time.Instant.parse(enc))
      case _ => enc
    }

  private def clamp(v: Any): Any = {
    val keep = highWater match {
      case Some(h) => h.asInstanceOf[Comparable[Any]].compareTo(v) >= 0
      case None => false
    }
    if (!keep) {
      highWater = Some(v)
      java.nio.file.Files.createDirectories(hwPath.getParent)
      java.nio.file.Files.write(hwPath,
        encode(v).getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
    highWater.get
  }
  private def typed(value: String) =
    lit(value).cast(schema.fields.find(_.name == orderBy)
      .map(_.dataType).getOrElse(TimestampType))

  override def getOffset: Option[Offset] =
    activeDf.flatMap { df =>
      // max() of an empty frame is null — one job, no separate isEmpty pass
      Option(df.agg(max(cursorCol)).head.get(0))
        .map(v => CursorOffset(encode(clamp(v))))
    }.orElse(highWater.map(v => CursorOffset(encode(v))))

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val base = activeDf.getOrElse(
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema))
    val upTo = base.filter(cursorCol <= typed(end.json))
    val batch = start match {
      case Some(s) => upTo.filter(cursorCol > typed(s.json)) // strictly greater (node.py:71-76)
      case None => upTo
    }
    // pin to the DECLARED schema: schema-on-write evolution (conform
    // passes new columns through; activeDf reads with mergeSchema) must
    // not widen a running stream's batch arity mid-query
    val pinned = batch.select(schema.fieldNames.map(col).toSeq: _*)
    // V1 contract: the returned frame must be tagged isStreaming — route
    // the batch rows through an internal-row conversion the way
    // FileStreamSource does (internalCreateDataFrame is private[sql] at
    // the Scala level but public bytecode; same-signature reflective call)
    val internal = pinned.queryExecution.toRdd
    val m = spark.getClass.getMethod("internalCreateDataFrame",
      classOf[org.apache.spark.rdd.RDD[_]], classOf[StructType],
      java.lang.Boolean.TYPE)
    m.invoke(spark, internal, pinned.schema, java.lang.Boolean.TRUE)
      .asInstanceOf[DataFrame]
  }

  override def deserializeOffset(json: String): org.apache.spark.sql.connector.read.streaming.Offset =
    CursorOffset(json)

  override def stop(): Unit = ()
}
