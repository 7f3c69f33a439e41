package graft.api

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, Row, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

import graft.catalog.TableCatalog

/** Named, versioned table port (reference node.py:117-414).
  *
  * Storage: one parquet directory per version under the catalog root; the
  * manifest's active pointer picks the readable version. Reads are plain
  * `spark.read.parquet` on the active dir (full Catalyst pushdown/pruning);
  * writes are buffered and flushed as parquet appends (node.py:306-307,
  * :407-414); upsert/replace/truncate are copy-on-write into a fresh
  * version + pointer swap, so readers of the old version are never torn.
  *
  * 100 TB note: every data operation is a Spark job over the version dir —
  * nothing row-sized crosses the driver except explicit `readRecords`.
  * Upsert rewrites the table (O(table) per call, SURVEY.md §7.4); the
  * mitigation path at scale is partition-level rewrite on a bucketed
  * layout, which the anti-join+union plan here already parallelizes.
  */
class Table(engine: GraftEngine, val name: String, val mode: String = "r",
    val required: Boolean = true, val connected: Boolean = true) {
  import engine.spark
  private val catalog: TableCatalog = engine.catalog
  private val buffer = ArrayBuffer.empty[DataFrame]

  /** Whether this port is bound to a store in the graph (node.py:232-238).
    * Operations on an unconnected table are no-ops returning dummies —
    * reads come back empty, writes are swallowed, introspection is None —
    * so an optional (`required = false`) port degrades gracefully.
    */
  def isConnected: Boolean = connected

  /** Default auto-column names when init is called without explicit ones
    * (the reference has the caller pick the names, node.py:286-294).
    */
  val defaultCreatedCol = "created_at"
  val defaultMonotonicCol = "monotonic_id"

  private def createdCol: Option[String] = manifest.meta.addCreated
  private def monotonicCol: Option[String] = manifest.meta.addMonotonicId

  // --- introspection (node.py:232-267) ---

  def manifest = catalog.loadOrCreate(name)

  /** Temp-view name this table registers under for SQL (node.py:240-246). */
  def sqlName: String = name

  def hasActiveVersion: Boolean = connected && manifest.activeVersion.isDefined

  /** Filesystem path of the active version dir (streaming tail target). */
  def activeVersionDir: Option[String] =
    manifest.activeVersion.filter(_ => connected)
      .map(vid => catalog.versionDir(name, vid).toString)

  def exists: Boolean = hasActiveVersion && activeFiles.nonEmpty

  def schema: Option[StructType] = activeDf.map(_.schema)

  /** Row count of the active version — O(1) from the manifest when the
    * version was committed by this engine (reference `TableVersion.
    * record_count` is a stored property, node.py:106-109; a full count()
    * per introspection call would surprise at 100 TB). Falls back to a
    * Spark count for legacy/externally-written versions.
    */
  def recordCount: Option[Long] = {
    // fresh manifest read (O(KB) disk, still no Spark job): on a SHARED
    // store another engine's flush re-stamps the count, and serving this
    // instance's cached manifest would return it stale forever
    val m = if (connected) catalog.refresh(name).getOrElse(manifest) else manifest
    val stored = m.activeVersion.flatMap(vid =>
      m.versions.find(_.id == vid).flatMap(_.rowCount))
      .filter(_ => connected)
    stored.orElse(activeDf.map(_.count()))
  }

  private def activeFiles: Array[java.io.File] =
    manifest.activeVersion.toArray.flatMap(filesIn)

  private def filesIn(vid: String): Array[java.io.File] =
    catalog.dataFiles(name, vid) // single owner of the version-dir layout

  /** Row count AND per-column max of a version dir from parquet FOOTERS —
    * metadata-only, O(#files) driver-side reads, no Spark job. Stamped
    * into the manifest at commit so [[recordCount]] is O(1) (reference
    * TableVersion.record_count, node.py:106-109) and so the streaming
    * source's `getOffset` poll is a manifest lookup instead of a
    * table-sized `max()` scan per trigger.
    *
    * The max map only carries columns whose footer statistics are present
    * and trustworthy in EVERY row group of every file: plain INT32/INT64/
    * DOUBLE, INT64 timestamps (micro/milli/nano logical annotation;
    * INT96 has no usable stats), and short UTF-8 binaries (parquet-mr may
    * truncate or omit stats for large binaries, and a truncated max is a
    * BOUND, not a value — unsafe as a cursor). Missing columns make the
    * streaming source fall back to a scan, never return a wrong offset.
    */
  /** Footer stats over an explicit file set: (rows, per-column max).
    * Map value semantics: `Some(v)` = qualified running max, `None` =
    * column SEEN but disqualified (unusable stats, unsupported type,
    * truncated binary, or mixed physical types across files); a column
    * absent from the map never appeared in any footer.
    */
  private def footerStatsCore(
      files: Seq[java.io.File]): (Long, Map[String, Option[Any]]) = {
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
    import org.apache.parquet.schema.LogicalTypeAnnotation
    import org.apache.parquet.schema.LogicalTypeAnnotation.TimestampLogicalTypeAnnotation
    val conf = spark.sessionState.newHadoopConf()
    var rows = 0L
    // per-column running max over all row groups; a column drops to None
    // (untracked forever) the first time a row group lacks usable stats
    val maxes = scala.collection.mutable.Map.empty[String, Option[Any]]
    files.foreach { f =>
      val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(f.getAbsolutePath), conf)
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try {
        rows += r.getRecordCount
        r.getFooter.getBlocks.forEach { block =>
          block.getColumns.forEach { c =>
            if (c.getPath.size() == 1) { // top-level scalars only
              val name = c.getPath.toDotString
              val stats = c.getStatistics
              val usable = stats != null && !stats.isEmpty &&
                stats.hasNonNullValue
              // ONLY (physical, logical) pairs whose stamped string the
              // streaming source's decode() reproduces are stamped: a
              // DATE's raw INT32 (days) or a DECIMAL's unscaled INT
              // would decode to a wrong offset — those logical types
              // stay unstamped and the poll falls back to a scan.
              val v: Option[Any] =
                if (!usable) None
                else (c.getPrimitiveType.getPrimitiveTypeName,
                    c.getPrimitiveType.getLogicalTypeAnnotation) match {
                  case (INT64, ts: TimestampLogicalTypeAnnotation) =>
                    val raw = stats.genericGetMax.asInstanceOf[java.lang.Long].longValue
                    val micros = ts.getUnit match {
                      case LogicalTypeAnnotation.TimeUnit.MILLIS => raw * 1000L
                      case LogicalTypeAnnotation.TimeUnit.MICROS => raw
                      case LogicalTypeAnnotation.TimeUnit.NANOS  => Math.floorDiv(raw, 1000L)
                    }
                    Some(java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
                      Math.floorDiv(micros, 1000000L),
                      Math.floorMod(micros, 1000000L) * 1000L)))
                  case (INT64, null) =>
                    Some(stats.genericGetMax.asInstanceOf[java.lang.Long].longValue)
                  case (INT64, i: LogicalTypeAnnotation.IntLogicalTypeAnnotation)
                      if i.getBitWidth == 64 && i.isSigned =>
                    Some(stats.genericGetMax.asInstanceOf[java.lang.Long].longValue)
                  case (INT32, null) =>
                    Some(stats.genericGetMax.asInstanceOf[java.lang.Integer].intValue)
                  case (INT32, i: LogicalTypeAnnotation.IntLogicalTypeAnnotation)
                      if i.getBitWidth == 32 && i.isSigned =>
                    Some(stats.genericGetMax.asInstanceOf[java.lang.Integer].intValue)
                  case (DOUBLE, null) =>
                    Some(stats.genericGetMax.asInstanceOf[java.lang.Double].doubleValue)
                  case (BINARY, _: LogicalTypeAnnotation.StringLogicalTypeAnnotation) =>
                    val bin = stats.genericGetMax
                      .asInstanceOf[org.apache.parquet.io.api.Binary]
                    // short strings only: parquet-mr stats for long
                    // binaries may be truncated bounds, not actual values
                    if (bin.length <= 256) Some(bin.toStringUsingUTF8) else None
                  case _ => None
                }
              maxes.get(name) match {
                case Some(None) => // already disqualified
                case prev =>
                  maxes(name) = (prev.flatten, v) match {
                    case (_, None) => None
                    case (None, nv) => nv
                    case (Some(p), Some(n)) =>
                      // a version dir whose column changes PHYSICAL type
                      // across files (legacy/externally-written dirs,
                      // which recordCount explicitly supports) makes this
                      // compare heterogeneous — disqualify the column
                      // (readers fall back to a scan) instead of throwing
                      // AFTER the append already committed
                      try Some(
                        if (p.asInstanceOf[Comparable[Any]].compareTo(n) >= 0) p
                        else n)
                      catch { case _: ClassCastException => None }
                  }
              }
            }
          }
        }
      } finally r.close()
    }
    (rows, maxes.toMap)
  }

  /** The streaming source's offset encoding (GraftTableSource.encode):
    * timestamps as ISO instants, everything else via its SQL string form.
    */
  private def encodeStat(v: Any): String = v match {
    case ts: java.sql.Timestamp => ts.toInstant.toString
    case other => other.toString
  }

  /** Inverse of [[encodeStat]], typed by a value of the SAME column read
    * from a newer footer — throws on type drift (callers disqualify).
    */
  private def decodeStatLike(enc: String, like: Any): Any = like match {
    case _: java.lang.Long => java.lang.Long.valueOf(enc)
    case _: java.lang.Integer => java.lang.Integer.valueOf(enc)
    case _: java.lang.Double => java.lang.Double.valueOf(enc)
    case _: java.sql.Timestamp =>
      java.sql.Timestamp.from(java.time.Instant.parse(enc))
    case _ => enc
  }

  private def footerStats(vid: String): (Long, Map[String, String]) = {
    val (rows, maxes) = footerStatsCore(filesIn(vid).toSeq)
    (rows, maxes.collect { case (k, Some(v)) => k -> encodeStat(v) })
  }

  private def stampVersionStats(vid: String): Unit = {
    val (rows, cursorMax) = footerStats(vid)
    catalog.setVersionStats(name, vid, rows, cursorMax)
  }

  /** Post-append stamp that reads ONLY the files the append created,
    * merging with the version's previous stamp. Merge rules (all
    * CONSERVATIVE — a dropped column costs a scan fallback, a wrong max
    * would corrupt streaming offsets):
    *   - column stamped before + qualified in the new files → max of the
    *     two (decode the stored string by the new value's type; any
    *     decode/compare failure disqualifies);
    *   - stamped before + absent from the new files (schema evolution:
    *     the new rows are all-null there) → keep the previous max;
    *   - stamped before + DISQUALIFIED in a new file → disqualified;
    *   - NOT stamped before → stays unstamped, even if the new files
    *     could stamp it: absence can mean "disqualified by an older file"
    *     (data-dependent, e.g. a truncated >256-byte binary bound), and
    *     stamping from new files alone could UNDERSTATE the true max.
    *     The next upsert/replace (fresh version, full stamp) recovers it.
    * Falls back to the full recompute when the version has no previous
    * stamp (legacy manifests).
    */
  private def stampVersionStatsAfterAppend(
      vid: String, preExisting: Set[String]): Unit = {
    val prev = manifest.versions.find(_.id == vid)
    (prev.flatMap(_.rowCount), prev.flatMap(_.cursorMax)) match {
      case (Some(prevRows), Some(prevMax)) =>
        val newFiles = filesIn(vid).filterNot(f => preExisting(f.getAbsolutePath))
        val (newRows, newMaxes) = footerStatsCore(newFiles.toSeq)
        val merged = prevMax.flatMap { case (k, prevEnc) =>
          newMaxes.get(k) match {
            case None => Some(k -> prevEnc) // absent in new files: keep
            case Some(None) => None         // disqualified by a new file
            case Some(Some(nv)) =>
              try {
                val pv = decodeStatLike(prevEnc, nv)
                val mx =
                  if (pv.asInstanceOf[Comparable[Any]].compareTo(nv) >= 0) pv
                  else nv
                Some(k -> encodeStat(mx))
              } catch { case _: Exception => None } // type drift
          }
        }
        catalog.setVersionStats(name, vid, prevRows + newRows, merged)
      case _ => stampVersionStats(vid)
    }
  }

  private def activeDf: Option[DataFrame] =
    manifest.activeVersion.filter(_ => connected)
      .flatMap(vid => catalog.versionScan(spark, name, vid))

  // --- read surface (node.py:141-189) ---

  /** TIME-TRAVEL read: scan a specific retained version by id. Superseded
    * version dirs survive until retention GC, and a version is immutable
    * once superseded, so the scan is reproducible — the audit/debug
    * counterpart of `read` ("what did this table hold before that
    * upsert?"). Unknown or already-GC'd versions fail loudly rather than
    * returning an empty frame a caller could mistake for "no rows".
    */
  def readVersion(vid: String,
      leaseTtlMillis: Long = TableCatalog.DefaultLeaseTtlMillis): DataFrame = {
    require(connected, s"table $name: not connected")
    require(manifest.versions.exists(_.id == vid),
      s"table $name: unknown version '$vid' (known: " +
        s"${manifest.versions.map(_.id).mkString(", ")})")
    // a TTL'd read lease keeps retention sweeps off this version while
    // the returned LAZY frame is still being consumed (crash-safe:
    // expires on its own). Unconditional — even the currently-active
    // version can be superseded by a concurrent replace() and swept
    // before the frame is collected; the active-at-read-time check would
    // be a stale snapshot. The existence check runs AFTER the lease so a
    // sweep that won the race fails loudly here instead of mid-collect.
    catalog.acquireReadLease(name, vid, leaseTtlMillis)
    val dir = catalog.versionDir(name, vid)
    require(java.nio.file.Files.isDirectory(dir),
      s"table $name: version '$vid' has been garbage-collected")
    // a legitimately EMPTY version (reset / crashed-before-write) reads as
    // an empty frame — the same answer read() gives for the active one —
    // rather than Spark's misleading "Unable to infer schema" error.
    // Same canonical recipe as every other read path (versionScan).
    catalog.versionScan(spark, name, vid).getOrElse(
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], new StructType()))
  }

  /** Full scan of the active version (node.py:156-166). */
  def read: DataFrame =
    activeDf.getOrElse(spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row], new StructType()))

  /** Row-iterator form of read (node.py:141-154 "records"); stays lazy via
    * toLocalIterator so only one partition is resident on the driver.
    */
  def readRecords: Iterator[Row] = {
    import scala.jdk.CollectionConverters._
    read.toLocalIterator().asScala
  }

  /** Chunked record iteration (node.py:144-152 `chunksize`): groups of at
    * most `chunkSize` rows, still lazy via toLocalIterator.
    */
  def readRecordsChunked(chunkSize: Int): Iterator[Seq[Row]] =
    readRecords.grouped(chunkSize)

  /** Arbitrary SQL over this table, referenced by its sqlName
    * (node.py:168-189); opens the whole Spark SQL surface.
    */
  def readSql(sql: String): DataFrame = {
    read.createOrReplaceTempView(sqlName)
    // analysis is eager; drop the view so a later session-sharing caller
    // can't resolve this table's stale snapshot without declaring it
    try spark.sql(sql)
    finally spark.catalog.dropTempView(sqlName)
  }

  // --- write surface (node.py:269-414) ---

  /** Declare schema roles at version creation (node.py:269-297).
    * `schema` is the NAME of a schema registered on the engine
    * (node.py:271-283 — "a str name of a commonmodel schema"): its fields
    * become per-field type hints, overridable by explicit `schemaHints`.
    * `addCreated` / `addMonotonicId` are the FIELD NAMES for the auto
    * columns (node.py:286-294) — null leaves the role absent.
    */
  def init(
      schema: String = null,
      schemaHints: Map[String, String] = Map.empty,
      uniqueOn: Seq[String] = Nil,
      addCreated: String = null,
      addMonotonicId: String = null,
      // boxed so "not passed" (null) preserves the persisted flag — every
      // other meta field merges-or-preserves, and a second init() tweaking
      // something else must not silently flip indexing back on
      autoIndexes: java.lang.Boolean = null,
      bucketBy: Int = 0,
      retentionMillis: Long = -1L): Table = {
    require(bucketBy == 0 || uniqueOn.nonEmpty || manifest.meta.uniqueOn.nonEmpty,
      s"bucketBy on '$name' requires unique_on (buckets hash the unique key)")
    val namedHints: Map[String, String] = Option(schema).map { n =>
      val st = engine.resolveSchema(n).getOrElse(throw new IllegalArgumentException(
        s"init(schema = \"$n\") on '$name': no schema registered under that " +
          "name (GraftEngine.registerSchema)"))
      st.fields.map(f => f.name -> f.dataType.catalogString).toMap
    }.getOrElse(Map.empty)
    catalog.updateMeta(name)(m => m.copy(
      schemaHints = m.schemaHints ++ namedHints ++ schemaHints,
      uniqueOn = if (uniqueOn.nonEmpty) uniqueOn.toList else m.uniqueOn,
      addCreated = Option(addCreated).orElse(m.addCreated),
      addMonotonicId = Option(addMonotonicId).orElse(m.addMonotonicId),
      autoIndexes = Option(autoIndexes).fold(m.autoIndexes)(_.booleanValue),
      numBuckets = if (bucketBy > 0) Some(bucketBy) else m.numBuckets,
      retentionMillis =
        if (retentionMillis >= 0L) Some(retentionMillis) else m.retentionMillis))
    this
  }

  /** Buffered insert (node.py:299-316); data hits disk on [[flush]] or at
    * execution end (GraftEngine.endExecution).
    */
  def append(df: DataFrame): Unit = if (connected) buffer += df

  /** Force buffered writes to the active version (node.py:407-414).
    * Appends into an EXISTING version follow that version's physical
    * layout — including its ORIGINAL bucket count when `init(bucketBy)`
    * has since changed it (mixed layouts/counts in one dir would corrupt
    * bucket-pruned reads); the next upsert/replace migrates the layout.
    */
  def flush(): Unit = if (connected && buffer.nonEmpty) catalog.withTableLock(name) {
    val batch = buffer.reduce(_.unionByName(_, allowMissingColumns = true))
    val isNew = manifest.activeVersion.isEmpty
    val vid = manifest.activeVersion.getOrElse {
      val (_, v) = catalog.createVersion(name)
      catalog.setActive(name, Some(v), "create")
      v
    }
    // appends into an existing dir follow that dir's layout, but only a
    // marker-ATTESTED count may (re)write the marker: promoting the
    // markerless heuristic (max __bucket index + 1, which undercounts
    // when top buckets are empty) to marker status would later authorize
    // bucket-pruned reads against a dir hashed with a different modulus
    val (buckets, attest) =
      if (activeFiles.nonEmpty) (layoutBuckets(vid), exactLayoutBuckets(vid).isDefined)
      else (bucketCount, true)
    // snapshot the dir BEFORE the write so the stats stamp can read only
    // the footers this append created (an append-heavy table otherwise
    // pays O(all files) driver-side footer reads per flush — quadratic
    // cumulative I/O for exactly the streaming workload the manifest
    // stamps exist to serve)
    val preExisting = filesIn(vid).map(_.getAbsolutePath).toSet
    writeInto(clustered(decorate(conform(batch))),
      catalog.versionDir(name, vid).toString, SaveMode.Append, buckets, attest)
    // cleared at the DURABILITY point — after the parquet append commits,
    // before stats stamping / event recording. A write failure keeps the
    // buffer (the retry writes the rows instead of silently no-opping);
    // a post-commit failure must NOT keep it, or the retry re-appends the
    // whole batch and duplicates every row.
    buffer.clear()
    try {
      Table.postAppendHook()
      stampVersionStatsAfterAppend(vid, preExisting)
    } catch {
      case scala.util.control.NonFatal(e) =>
        // non-fatal, but never leave a STALE stamp: it understates
        // rowCount/cursorMax and a streaming poll would skip the appended
        // rows forever. Dropping the stamp costs consumers a scan
        // fallback until the next flush recomputes a full fresh stamp.
        try catalog.clearVersionStats(name, vid)
        catch { case scala.util.control.NonFatal(_) => () }
        System.err.println(
          s"[graft] table $name: stats stamp failed after append " +
            s"(stamp dropped, consumers fall back to scan): ${e.getMessage}")
    }
    if (!isNew) catalog.recordEvent(name, "update")
  }

  // --- hash-bucketed layout (the 100 TB upsert/point-lookup path) ---

  /** Bucket count, when this table is laid out as `__bucket=K` partition
    * dirs hashed on the unique key (declared via `init(bucketBy = n)`).
    */
  private def bucketCount: Option[Int] =
    manifest.meta.numBuckets.filter(_ => manifest.meta.uniqueOn.nonEmpty)

  private def withBucket(df: DataFrame, n: Int): DataFrame =
    df.withColumn("__bucket",
      pmod(hash(manifest.meta.uniqueOn.map(col): _*), lit(n)))

  /** The bucket count this version dir was PHYSICALLY written with, or None
    * if unbucketed. Source of truth is the `_BUCKETS` sidecar marker every
    * bucketed write drops (underscore-prefixed files are invisible to
    * Spark's file index); markerless legacy dirs fall back to max
    * `__bucket=` index + 1 — a HEURISTIC that undercounts when the top
    * buckets happen to be empty, so it is good enough only for continuing
    * an append layout (see flush). Tracking this per version is what makes
    * changing `init(bucketBy = m)` on an already-bucketed table safe: meta
    * carries the NEW count while each version remembers the count its dirs
    * were hashed with.
    */
  private def layoutBuckets(vid: String): Option[Int] =
    exactLayoutBuckets(vid).orElse {
      val dir = catalog.versionDir(name, vid)
      Option(dir.toFile.listFiles((f: java.io.File) =>
          f.isDirectory && f.getName.startsWith("__bucket=")))
        .filter(_.nonEmpty)
        .map(_.map(_.getName.stripPrefix("__bucket=").toInt).max + 1)
    }

  /** Marker-attested bucket count ONLY. The bucket-PRUNED paths (upsert's
    * partial rewrite, lookup's single-bucket scan) gate on this: a
    * heuristic count that coincidentally equals meta's could authorize
    * pruning against a dir physically hashed with a different modulus —
    * missed rows and duplicate keys. No marker => no pruning, ever.
    */
  private def exactLayoutBuckets(vid: String): Option[Int] = {
    val marker = catalog.versionDir(name, vid).resolve(Table.BucketMarker)
    if (java.nio.file.Files.exists(marker))
      Some(new String(java.nio.file.Files.readAllBytes(marker),
        java.nio.charset.StandardCharsets.UTF_8).trim.toInt)
    else None
  }

  /** Write honoring the given physical bucket count (callers appending to
    * an existing dir pass the DIR's layout so one version never mixes).
    * `attestLayout = false` skips the `_BUCKETS` marker — for appends
    * whose count came from the markerless heuristic, which must never
    * gain marker (pruning-authorizing) status.
    */
  private def writeInto(df: DataFrame, dir: String, mode: SaveMode,
      buckets: Option[Int], attestLayout: Boolean = true): Unit =
    buckets match {
      case Some(n) =>
        withBucket(df, n).write.mode(mode).partitionBy("__bucket").parquet(dir)
        if (attestLayout)
          java.nio.file.Files.write(
            java.nio.file.Paths.get(dir).resolve(Table.BucketMarker),
            n.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      case None => df.write.mode(mode).parquet(dir)
    }

  /** Insert-or-update on the unique key (node.py:318-334): anti-join the
    * active version against incoming keys, union, write a new version
    * (copy-on-write MERGE; last-writer-wins per key).
    */
  def upsert(df: DataFrame): Unit = if (connected) catalog.withTableLock(name) {
    // the WHOLE read-merge-write holds the table lock (reentrantly shared
    // with flush/createVersion/setActive inside): without it, two writers
    // could merge against the same base version and the second pointer
    // swap would silently drop the first writer's rows
    flush()
    val keys = manifest.meta.uniqueOn
    require(keys.nonEmpty, s"upsert on '$name' requires unique_on (node.py:323)")
    // within-batch duplicates: LAST record per key wins, mirroring the
    // reference's sequential row-at-a-time apply; position comes from the
    // input's partition-ordered row sequence
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*).orderBy(col("__pos").desc)
    val lastPerKey = df.withColumn("__pos", monotonically_increasing_id())
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__pos", "__rn")
    val incoming = decorate(conform(lastPerKey))
    val oldVid = manifest.activeVersion.filter(_ => activeFiles.nonEmpty)
    (oldVid, bucketCount) match {
      // partition-level rewrite is only sound when the version's physical
      // layout was hashed with the CURRENT bucket count; after a bucketBy
      // change the full-rewrite branch below migrates to the new count
      case (Some(vid), Some(n)) if exactLayoutBuckets(vid).contains(n) =>
        bucketedUpsert(incoming, vid, n)
      case _ =>
        val merged = activeDf match {
          case Some(active) =>
            val kept = active.join(incoming, keys, "left_anti")
            incoming.unionByName(kept, allowMissingColumns = true)
          case None => incoming
        }
        writeNewVersion(merged, if (hasActiveVersion) "update" else "create")
    }
  }

  /** Partition-level copy-on-write MERGE (the 100 TB upsert): hash the
    * incoming keys to their buckets, REWRITE only the affected `__bucket=K`
    * dirs (anti-join ∪ incoming, one Spark job over those buckets), and
    * carry every untouched bucket into the new version as a file-level copy
    * — O(affected buckets) compute instead of O(table). On an object-store
    * manifest layout the copy step degenerates to a pointer; here it is a
    * local file copy, still zero shuffle/decode.
    */
  private def bucketedUpsert(incoming: DataFrame, oldVid: String, n: Int): Unit = {
    val keys = manifest.meta.uniqueOn
    val oldDir = catalog.versionDir(name, oldVid)
    val affected = withBucket(incoming, n).select("__bucket")
      .distinct().collect().map(_.getInt(0)).toSet // ≤ n values, never O(data)
    val (_, vid) = catalog.createVersion(name)
    val newDir = catalog.versionDir(name, vid)
    oldDir.toFile.listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("__bucket="))
      .filterNot(f => affected.contains(f.getName.stripPrefix("__bucket=").toInt))
      .foreach { src =>
        val dst = newDir.resolve(src.getName)
        java.nio.file.Files.createDirectories(dst)
        src.listFiles().filter(_.isFile).foreach(f =>
          java.nio.file.Files.copy(f.toPath, dst.resolve(f.getName)))
      }
    val oldPaths = affected.toSeq.sorted
      .map(k => oldDir.resolve(s"__bucket=$k"))
      .filter(p => p.toFile.exists).map(_.toString)
    val kept =
      if (oldPaths.isEmpty) incoming.limit(0)
      else spark.read.option("mergeSchema", "true").parquet(oldPaths: _*)
        .join(incoming, keys, "left_anti")
    val merged = incoming.unionByName(kept, allowMissingColumns = true)
    writeInto(clustered(merged), newDir.toString, SaveMode.Append, Some(n))
    stampVersionStats(vid)
    catalog.setActive(name, Some(vid), "update")
  }

  /** Bucket-pruned point lookup on the unique key — the `auto_indexes`
    * read path (node.py:277): on a bucketed table, scans exactly the one
    * `__bucket=K` dir the key hashes to; otherwise a filtered full read
    * (which still min/max-prunes via write-time clustering).
    */
  def lookup(keyValues: Seq[Any]): DataFrame = {
    // dummy/no-data degradation: unconnected or never-written tables have
    // no columns to filter on — return the empty frame, don't fail analysis
    if (!connected || schema.isEmpty) return read
    val keys = manifest.meta.uniqueOn
    require(keys.nonEmpty && keys.length == keyValues.length,
      s"lookup on '$name' needs unique_on values (${keys.mkString(",")})")
    val sch = schema
    def typedLit(k: String, v: Any) = sch.flatMap(s =>
      s.fields.find(_.name == k)).map(f => lit(v).cast(f.dataType)).getOrElse(lit(v))
    val eqFilter = keys.zip(keyValues)
      .map { case (k, v) => col(k) === typedLit(k, v) }.reduce(_ && _)
    (bucketCount, manifest.activeVersion) match {
      // bucket pruning needs the version's layout count to MATCH the meta
      // count — after a bucketBy change, fall through to the filtered full
      // read (still min/max-pruned by write-time clustering)
      case (Some(n), Some(vid)) if exactLayoutBuckets(vid).contains(n) =>
        // evaluate pmod(hash(key...), n) driver-side — a constant
        // expression shouldn't cost a Spark job per point lookup
        val b = try {
          import org.apache.spark.sql.catalyst.expressions.{Cast, Literal, Murmur3Hash}
          // cast in the SESSION timezone — write-time bucketing hashed
          // values the session interpreted, so a hardcoded UTC here would
          // hash string-typed timestamp keys into the wrong bucket
          val tz = Some(spark.sessionState.conf.sessionLocalTimeZone)
          val lits = keys.zip(keyValues).map { case (k, v) =>
            val dt = sch.flatMap(_.fields.find(_.name == k)).map(_.dataType)
              .getOrElse(Literal(v).dataType)
            Literal.create(Cast(Literal(v), dt, tz).eval(null), dt)
          }
          val h = Murmur3Hash(lits, 42).eval(null).asInstanceOf[Int]
          ((h % n) + n) % n
        } catch {
          case _: Throwable => // fall back to cluster-side evaluation
            spark.range(1).select(pmod(hash(
              keys.zip(keyValues).map { case (k, v) => typedLit(k, v) }: _*),
              lit(n)).as("b")).head.getInt(0)
        }
        val p = catalog.versionDir(name, vid).resolve(s"__bucket=$b")
        if (p.toFile.exists)
          spark.read.option("mergeSchema", "true").parquet(p.toString).filter(eqFilter)
        else read.limit(0)
      case _ => read.filter(eqFilter)
    }
  }

  /** New version containing only these records (node.py:336-345 —
    * "reset() then append(records)").
    */
  def replace(df: DataFrame): Unit = if (connected) catalog.withTableLock(name) {
    buffer.clear()
    catalog.recordEvent(name, "reset")
    // reference defines replace as reset()+append() (node.py:336-345), so it
    // must share the append path's schema-on-write conformance
    writeNewVersion(decorate(conform(df)), "create")
  }

  /** Delete all rows, keep schema (node.py:347-354). */
  def truncate(): Unit = if (connected) catalog.withTableLock(name) {
    buffer.clear()
    val empty = activeDf match {
      case Some(df) => df.limit(0)
      case None => spark.createDataFrame(spark.sparkContext.emptyRDD[Row], new StructType())
    }
    // plain (unbucketed) write: the dynamic-partition writer creates files
    // lazily per row, so zero rows through partitionBy would leave NO
    // parquet files and lose the schema this op promises to keep
    writeNewVersion(empty, "update", bucketed = false)
  }

  /** Consolidate the ACTIVE version's file layout into a new version with
    * identical rows — small-files compaction for append-heavy tables
    * (every flush writes ≥1 parquet file per task, so a long-running feed
    * degrades every downstream scan with per-file open + footer costs).
    * Bucketed layouts rewrite through the bucket path (files merge within
    * each `__bucket=K` dir and the `_BUCKETS` marker re-attests pruning);
    * plain layouts coalesce to `targetFiles` — coalesce, not repartition:
    * no shuffle, just fewer, larger files. Write-time clustering
    * (sortWithinPartitions on the key/role columns) is reapplied so
    * min/max file pruning survives the rewrite. The pointer swap records
    * a "compact" event for observability but does NOT bump the trigger
    * counter: content is unchanged, so downstream nodes must not re-run.
    *
    * Like every version swap (upsert/replace/truncate), compaction moves
    * the active pointer to a NEW directory: a live file-stream tailing the
    * old dir (`StreamingPipelines.tailTable`/`tailParquet`) stops seeing
    * appends and must be restarted — and the superseded dir's retention
    * clock starts at the swap. Schedule compaction accordingly (quiet
    * windows, streams restarted after).
    */
  def compact(targetFiles: Int = 1): Unit = if (connected) {
    // bucketed layouts always consolidate to one file PER BUCKET dir —
    // reject a non-default target instead of silently ignoring it
    require(bucketCount.isEmpty || targetFiles == 1,
      s"compact(targetFiles=$targetFiles): bucketed tables emit one file " +
        "per __bucket dir; targetFiles is only meaningful for plain layouts")
    catalog.withTableLock(name) {
    flush()
    activeDf.foreach { df =>
      if (df.isEmpty)
        // same guard as truncate: zero rows through the partitionBy writer
        // would emit NO parquet files and lose the schema this op promises
        // to keep — write the empty frame plain instead
        writeNewVersion(df, "compact", bucketed = false, trigger = false)
      else {
        val consolidated = bucketCount match {
          // One shuffle partition per bucket BEFORE the write: all rows of
          // a bucket land in a single task, so the partitionBy writer
          // emits exactly one file per __bucket dir. Without this, each
          // read partition writes its own file into every bucket it
          // touches and a large table consolidates ~nothing. (writeInto
          // re-derives __bucket from the same key hash, so rows stay where
          // the shuffle put them; clustering re-sorts within each
          // partition after.)
          case Some(n) =>
            withBucket(df, n).repartition(n, col("__bucket")).drop("__bucket")
          case None => df.coalesce(math.max(1, targetFiles))
        }
        writeNewVersion(consolidated, "compact", trigger = false)
      }
    }
    }
  }

  /** Active pointer := fresh null version; old data stays on disk until
    * GC'd per retention policy (node.py:399-405, :216-222).
    */
  def reset(): Unit = if (connected) {
    buffer.clear()
    val (_, vid) = catalog.createVersion(name)
    catalog.setActive(name, Some(vid), "reset")
  }

  /** Arbitrary DDL/DML scoped to this table (node.py:356-373); the parsed
    * plan's root classifies create-vs-modify for event emission
    * (node.py:360-362).
    */
  def executeSql(sql: String): DataFrame = if (!connected) spark.emptyDataFrame else {
    val registered = hasActiveVersion
    if (registered) read.createOrReplaceTempView(sqlName)
    val planClass = spark.sessionState.sqlParser.parsePlan(sql)
      .getClass.getSimpleName.toLowerCase
    val result =
      try spark.sql(sql)
      finally if (registered) spark.catalog.dropTempView(sqlName)
    // classify create-vs-modify from the parsed plan root (node.py:360-362);
    // a side-effect-free query emits NO event — phantom updates would
    // spuriously cascade every downstream consumer
    if (planClass.contains("create")) signalCreate()
    else if (Seq("insert", "update", "delete", "merge", "drop", "alter",
        "truncate", "replace").exists(planClass.contains)) signalUpdate()
    result
  }

  // --- version ops + signals (node.py:224-230, :375-397) ---

  def createNewVersion(): String = catalog.createVersion(name)._2
  def getActiveVersion: Option[String] = manifest.activeVersion
  def setActiveVersion(vid: String): Unit = catalog.setActive(name, Some(vid), "update")
  def signalCreate(): Unit = if (connected) catalog.recordEvent(name, "create")
  def signalUpdate(): Unit = if (connected) catalog.recordEvent(name, "update")
  def signalReset(): Unit = if (connected) catalog.recordEvent(name, "reset")

  /** Ordered exactly-once cursor over this table (node.py:191-214).
    * Default ordering: the strictly-monotonic id role if declared, else the
    * created role, else error (node.py:196-200).
    */
  def asStream(orderBy: String = null, startingValue: Option[Any] = None): Stream = {
    val meta = manifest.meta
    // strictly_monotonic_ordering wins over created_ordering (node.py:286-294)
    val ob = Option(orderBy).orElse(meta.addMonotonicId).orElse(meta.addCreated)
      .getOrElse(throw new IllegalArgumentException(
        s"stream over '$name' needs order_by or a monotonic/created schema role (node.py:196-200)"))
    engine.streamFor(s"$name::$ob")(
      new Stream(this, ob, engine.state, startingValue))
  }

  // --- write-path helpers ---

  /** Schema-on-write conformance (node.py:303-304 + SURVEY.md §7.4.3):
    * cast columns shared with the active schema to the existing type
    * (safe-widen policy), apply declared schema_hints, pass new columns
    * through (read side merges schemas).
    */
  private def conform(df: DataFrame): DataFrame = {
    val hinted = manifest.meta.schemaHints.foldLeft(df) { case (d, (c, ty)) =>
      if (d.columns.contains(c)) d.withColumn(c, col(c).cast(ty)) else d
    }
    schema match {
      case Some(existing) =>
        existing.fields.foldLeft(hinted) { (d, f) =>
          if (d.columns.contains(f.name) && !monotonicCol.contains(f.name))
            d.withColumn(f.name, col(f.name).cast(f.dataType))
          else d
        }
      case None => hinted
    }
  }

  /** Auto-column decoration (node.py:286-294): created timestamp and the
    * strictly-monotonic base32 id backed by the catalog high-water mark
    * (monotonically_increasing_id alone is neither dense nor stable across
    * executions — SURVEY.md §4.3).
    */
  private def decorate(df: DataFrame): DataFrame = {
    val meta = manifest.meta
    val withCreated = meta.addCreated match {
      case Some(c) if !df.columns.contains(c) =>
        df.withColumn(c, current_timestamp())
      case _ => df
    }
    meta.addMonotonicId match {
      case Some(mc) if !withCreated.columns.contains(mc) =>
        // One cheap counting pass (spark_partition_id groupBy — partial agg
        // collapses each partition to a single row before the shuffle), then
        // ids are assigned by a codegen'd Stateful expression seeded with
        // the per-partition prefix sums. Unlike the localCheckpoint +
        // zipWithIndex formulation this pins nothing in executor storage
        // and the write stays inside whole-stage codegen. The two passes
        // see the same partitioning ONLY for a deterministic plan — a
        // nondeterministic batch (sample(), rand() filters) could mint a
        // different row set than the one ids were reserved for, so those
        // are pinned once up front, exactly like the old path.
        val deterministic = withCreated.queryExecution.analyzed.collectFirst {
          // plan-LEVEL nondeterminism too: Sample re-executed over a
          // different upstream partitioning (task retry, AQE re-plan)
          // yields a different row set even with a fixed seed
          case p: org.apache.spark.sql.catalyst.plans.logical.Sample => p
          case p if p.expressions.exists(e => !e.deterministic) => p
        }.isEmpty
        // partitioning-STABILITY guard: the counting pass and the write
        // pass are separate executions, and a plan containing a shuffle
        // can be AQE-coalesced differently across them (same stats ⇒ same
        // decision usually, but it is unspecified) — which would assign
        // ids against the wrong per-partition prefix sums. Only plans
        // whose partitioning is file-split-deterministic (scans, unions
        // of materialized frames — the normal append shape) skip the pin.
        def hasShuffle(p: org.apache.spark.sql.execution.SparkPlan): Boolean =
          p match {
            case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
              hasShuffle(a.inputPlan)
            case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => true
            case other => other.children.exists(hasShuffle)
          }
        val stablePartitioning =
          deterministic && !hasShuffle(withCreated.queryExecution.executedPlan)
        val base =
          if (stablePartitioning) withCreated else withCreated.localCheckpoint(true)
        val numParts = base.rdd.getNumPartitions
        val counts = new Array[Long](numParts)
        if (numParts > 0)
          base.groupBy(spark_partition_id().as("__p")).count()
            .collect().foreach(r => counts(r.getInt(0)) = r.getLong(1))
        val offsets = counts.scanLeft(0L)(_ + _).init
        val start = catalog.reserveIds(name, counts.sum)
        // base32 formatting via builtins (conv emits uppercase 0-9A-V;
        // lower() matches Table.base32's 0-9a-v), still codegen'd
        base.withColumn(mc,
          lpad(lower(conv(graft.functions.DenseRowId.column(spark, start, offsets)
            .cast(StringType), 10, 32)), 13, "0"))
      case _ => withCreated
    }
  }

  /** auto_indexes (node.py:277, :295-297): Spark has no secondary indexes;
    * the equivalent is write-time clustering — sort within partitions on
    * the unique key (and any stream-ordering role column) so parquet
    * min/max stats prune files for key lookups and cursor scans.
    */
  private def clustered(df: DataFrame): DataFrame = {
    val meta = manifest.meta
    val sortCols =
      (if (meta.autoIndexes) meta.uniqueOn else Nil) ++
        meta.addMonotonicId.orElse(meta.addCreated).toSeq
    val usable = sortCols.distinct.filter(df.columns.contains)
    if (usable.nonEmpty) df.sortWithinPartitions(usable.map(col): _*) else df
  }

  private def writeNewVersion(df: DataFrame, eventKind: String,
      bucketed: Boolean = true, trigger: Boolean = true): Unit = {
    val (_, vid) = catalog.createVersion(name)
    writeInto(clustered(df), catalog.versionDir(name, vid).toString,
      SaveMode.Overwrite, bucketCount.filter(_ => bucketed))
    stampVersionStats(vid)
    catalog.setActive(name, Some(vid), eventKind, trigger)
  }
}

object Table {
  /** Sidecar file recording a version dir's physical bucket count.
    * Underscore prefix keeps it invisible to Spark's parquet file index.
    */
  val BucketMarker = "_BUCKETS"

  /** Test hook: runs after a flush's parquet append committed, before the
    * stats stamp — lets specs inject a post-durability failure and pin
    * that it neither duplicates rows on retry nor leaves a stale stamp.
    */
  private[graft] var postAppendHook: () => Unit = () => ()

  /** 13-char zero-padded base32: lexicographic order == numeric order
    * (node.py:291-294 "unique, strictly monotonically increasing base32
    * string").
    */
  def base32(v: Long): String = {
    val s = java.lang.Long.toString(v, 32)
    "0" * (13 - s.length) + s
  }
}
