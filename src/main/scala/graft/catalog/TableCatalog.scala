package graft.catalog

import java.nio.file.{Files, Path, Paths}
import java.nio.charset.StandardCharsets

import org.json4s._
import org.json4s.jackson.Serialization

/** One concrete materialization of a table (reference node.py:84-114):
  * a parquet directory under the table dir, identified by `id`.
  * `supersededAt` is stamped when the version stops being active — the
  * retention clock runs from THAT moment (a version active for a year then
  * replaced is brand-new garbage, not year-old garbage).
  */
case class VersionInfo(id: String, createdAt: Long,
    supersededAt: Option[Long] = None,
    // rows in the version dir, stamped from parquet footers at commit
    // (reference TableVersion.record_count, node.py:106-109) — what makes
    // Table.recordCount O(1); None for versions written by older manifests
    rowCount: Option[Long] = None,
    // per-column MAX over the version, harvested from the same parquet
    // footers (column-chunk statistics) at commit — encoded with the
    // streaming source's offset encoding (ISO instants for timestamps,
    // SQL string form otherwise). What makes GraftTableSource.getOffset a
    // manifest lookup instead of a per-poll full scan of the table: at
    // 100 TB with a short trigger interval the poll MUST NOT run a Spark
    // job. Columns whose footer stats are absent or untrustworthy
    // (truncated binary, INT96) are simply missing — readers fall back to
    // a scan. None for versions written by older manifests.
    cursorMax: Option[Map[String, String]] = None)

/** Catalog event log entry (reference node.py:387-397 signal_create/update/
  * reset) — drives downstream node triggering in the graph runner.
  */
case class TableEvent(kind: String, versionId: String, at: Long)

/** Schema-role metadata declared via Table.init (reference node.py:269-297):
  * upsert key, per-field type hints, auto-created/auto-id columns, and the
  * persisted high-water mark backing the strictly-monotonic id column.
  */
case class TableMeta(
    uniqueOn: List[String] = Nil,
    schemaHints: Map[String, String] = Map.empty,
    addCreated: Option[String] = None,     // field NAME for the auto_now column
    addMonotonicId: Option[String] = None, // field NAME for the base32 id column
    autoIndexes: Boolean = true,
    highWaterMark: Long = 0L,
    // hash-bucket count over uniqueOn: versions are laid out as
    // __bucket=K partition dirs so upsert rewrites only affected buckets
    // and point lookups scan a single bucket (the 100 TB upsert path)
    numBuckets: Option[Int] = None,
    // retention policy (reference node.py:403-404): non-active versions
    // older than this are swept automatically on every version swap.
    // None = keep forever (manual gc only). Like any vacuum, a sweep can
    // race an in-flight lazy read of an old version — set retention above
    // the longest expected job, not to 0.
    retentionMillis: Option[Long] = None)

/** Per-table manifest: active-version pointer + version/event history
  * (reference node.py:87-89 — one-or-zero active versions per table).
  */
case class TableManifest(
    name: String,
    activeVersion: Option[String],
    versions: List[VersionInfo],
    events: List[TableEvent],
    meta: TableMeta,
    versionCounter: Long = 0L,
    // total events EVER recorded — survives the event-list trim below and
    // is what downstream triggering compares (GraphRunner); events itself
    // keeps only the newest [[TableCatalog.MaxEvents]] entries so the
    // manifest stays O(1) under unbounded append workloads
    eventCounter: Long = 0L)

/** Versioned parquet catalog — the engine-side replacement for the hosted
  * platform's table store (SURVEY.md §1.1, §4.3).
  *
  * Layout: `<root>/<table>/manifest.json` + `<root>/<table>/<versionId>/`
  * (parquet dir per version). Mutations are metadata-only and O(1) in
  * data size: at 100 TB the manifest stays a few KB — data never moves
  * through the driver; only Spark jobs touch the version directories.
  * The one exception is [[versionScan]], the canonical (lazy, plan-only)
  * read recipe shared by every batch/streaming/time-travel reader so the
  * paths cannot drift on a layout change.
  *
  * Old versions stay on disk after reset/replace "until garbage collected
  * according to the table's retention policy" (reference node.py:403-404);
  * [[gc]] implements the retention sweep.
  */
class TableCatalog(val root: Path) {
  private implicit val fmts: Formats = DefaultFormats

  // in-JVM manifest cache: every mutation goes through save(), which
  // refreshes the entry, so repeated manifest reads within an operation
  // don't re-hit disk. Mutations additionally serialize on a per-table
  // FILE lock (withTableLock) and re-read from disk first, so MULTIPLE
  // writers — other catalog instances, other JVMs — on one catalog dir
  // compose instead of clobbering each other's pointer swaps.
  private val manifestCache =
    scala.collection.mutable.Map.empty[String, TableManifest]

  Files.createDirectories(root)

  /** Cross-writer mutual exclusion for one table's manifest: an OS
    * advisory lock on `<table>/manifest.lock` (released by the kernel on
    * process death — no stale-lock sweeping), fronted by a JVM-wide gate
    * because `FileChannel.lock` throws rather than blocks when the SAME
    * process already holds the region. Reentrant per thread (setActive's
    * retention gc nests inside its own lock).
    *
    * `private[graft]` so Table's copy-on-write ops (upsert/replace/...)
    * can hold it across their whole read-merge-write: the manifest
    * mutations alone being atomic would still let two interleaved upserts
    * read the same base version and silently drop one writer's rows at
    * the pointer swap. Readers never take it — a scan of the active
    * version needs no lock.
    */
  private[graft] def withTableLock[A](name: String)(f: => A): A = {
    Files.createDirectories(tableDir(name))
    val lockPath = tableDir(name).resolve("manifest.lock")
    val key = lockPath.toAbsolutePath.normalize.toString
    if (TableCatalog.heldLocks.get.contains(key)) f
    else {
      val gate = TableCatalog.jvmGates.computeIfAbsent(key, _ => new Object)
      gate.synchronized {
        val ch = java.nio.channels.FileChannel.open(lockPath,
          java.nio.file.StandardOpenOption.CREATE,
          java.nio.file.StandardOpenOption.WRITE)
        try {
          val fl = ch.lock() // blocks until cross-process exclusive
          TableCatalog.heldLocks.get.add(key)
          // entering the critical section: drop this instance's cached
          // manifest so the first read inside sees whatever another
          // writer committed while we waited for the lock — without
          // this, an upsert would merge against a stale base version
          synchronized { manifestCache -= name }
          try f finally {
            TableCatalog.heldLocks.get.remove(key)
            fl.release()
          }
        } finally ch.close()
      }
    }
  }

  /** Read-modify-write under the table lock, starting from the FRESHEST
    * on-disk manifest (the in-JVM cache is dropped first: another writer
    * may have advanced the manifest since we last read it). Every
    * mutation below goes through here — the manifest equivalent of a
    * compare-and-swap loop, with the lock standing in for the retry.
    */
  private def mutate(name: String)(f: TableManifest => TableManifest): TableManifest =
    withTableLock(name) {
      synchronized { manifestCache -= name }
      val m = loadOrCreate(name)
      val m2 = f(m)
      save(m2)
      m2
    }

  def tableDir(name: String): Path = root.resolve(name)
  def versionDir(name: String, vid: String): Path = tableDir(name).resolve(vid)
  private def manifestPath(name: String): Path = tableDir(name).resolve("manifest.json")

  /** Every parquet data file of one version — the SINGLE owner of the
    * version-dir physical layout (flat files, or `__bucket=K` partition
    * subdirs for bucketed tables). Table and the streaming source both
    * read through here so the two paths can never drift. Every listFiles
    * is null-guarded: a retention sweep may delete the dir between checks
    * (documented race) — that must read as "no files", not NPE.
    */
  def dataFiles(name: String, vid: String): Array[java.io.File] = {
    val d = versionDir(name, vid).toFile
    val top = Option(d.listFiles((f: java.io.File) =>
      f.getName.endsWith(".parquet"))).getOrElse(Array.empty[java.io.File])
    val nested = Option(d.listFiles((f: java.io.File) =>
      f.isDirectory && f.getName.startsWith("__bucket=")))
      .getOrElse(Array.empty[java.io.File])
      .flatMap(b => Option(b.listFiles((f: java.io.File) =>
        f.getName.endsWith(".parquet"))).getOrElse(Array.empty[java.io.File]))
    top ++ nested
  }

  /** Does the version dir hold at least one data file? Short-circuits at
    * the first hit — the streaming source polls this shape per trigger,
    * and a full [[dataFiles]] listing of a many-bucket dir on a remote
    * mount would pay O(total files) just to test emptiness.
    */
  def hasDataFiles(name: String, vid: String): Boolean = {
    val d = versionDir(name, vid).toFile
    val top = Option(d.listFiles((f: java.io.File) =>
      f.getName.endsWith(".parquet"))).getOrElse(Array.empty[java.io.File])
    top.nonEmpty || Option(d.listFiles((f: java.io.File) =>
      f.isDirectory && f.getName.startsWith("__bucket=")))
      .getOrElse(Array.empty[java.io.File])
      .exists(b => Option(b.listFiles((f: java.io.File) =>
        f.getName.endsWith(".parquet"))).exists(_.nonEmpty))
  }

  /** The canonical scan of one version: user-facing schema (mergeSchema
    * for schema-on-write evolution, the `__bucket` layout column dropped),
    * or None for a fileless version (reset(), crash-before-write) — which
    * must read as "no data yet", not throw schema-inference errors.
    */
  def versionScan(spark: org.apache.spark.sql.SparkSession, name: String,
      vid: String): Option[org.apache.spark.sql.DataFrame] =
    if (!hasDataFiles(name, vid)) None
    else try Some(spark.read.option("mergeSchema", "true")
      .parquet(versionDir(name, vid).toString)
      .drop("__bucket"))
    catch {
      // check-then-read window: a concurrent retention sweep can delete
      // the dir between hasDataFiles and the (eager) parquet listing —
      // that documented race must read as "no data", not crash. Swallowed
      // ONLY when the dir is actually gone, so real analysis errors
      // (permissions, corrupt footers) still surface.
      case e: org.apache.spark.sql.AnalysisException
          if !Files.exists(versionDir(name, vid)) => None
    }

  def exists(name: String): Boolean = Files.exists(manifestPath(name))

  def load(name: String): Option[TableManifest] = synchronized {
    manifestCache.get(name).orElse {
      def parse(p: Path): TableManifest = Serialization.read[TableManifest](
        new String(Files.readAllBytes(p), StandardCharsets.UTF_8))
      val tmp = tableDir(name).resolve("manifest.json.tmp")
      // Recovery for save()'s non-atomic fallback window (mounts without
      // atomic rename degrade to copy-then-delete): tmp, when present, is
      // always a COMPLETELY written manifest — so a truncated/missing
      // final file recovers from tmp instead of surfacing a parse error
      // or (worse) letting loadOrCreate silently mint an empty manifest
      // that loses the active-version pointer.
      val recovered: Option[TableManifest] =
        if (exists(name)) {
          try Some(parse(manifestPath(name)))
          catch { case _: Throwable =>
            if (Files.exists(tmp)) Some(parse(tmp))
            // tmp already consumed => the replace finished; re-read once
            else Some(parse(manifestPath(name)))
          }
        } else if (Files.exists(tmp)) Some(parse(tmp)) // crash before move
        else None
      recovered.foreach(m => manifestCache(name) = m)
      recovered
    }
  }

  /** Drop the cached entry and re-read from disk — for long-lived probe
    * catalogs observing writes made through OTHER catalog instances.
    */
  def refresh(name: String): Option[TableManifest] = synchronized {
    manifestCache -= name
    load(name)
  }

  def loadOrCreate(name: String): TableManifest =
    load(name).getOrElse {
      // mint under the table lock, double-checked: an unlocked save here
      // could clobber a manifest another writer committed between our
      // load miss and our write
      withTableLock(name) {
        synchronized { manifestCache -= name }
        load(name).getOrElse {
          val m = TableManifest(name, None, Nil, Nil, TableMeta())
          save(m); m
        }
      }
    }

  def save(m: TableManifest): Unit = synchronized {
    Files.createDirectories(tableDir(m.name))
    val tmp = tableDir(m.name).resolve("manifest.json.tmp")
    Files.write(tmp, Serialization.write(m).getBytes(StandardCharsets.UTF_8))
    try
      Files.move(tmp, manifestPath(m.name),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    catch {
      // Same fallback as State.persist: filesystems that can't rename
      // atomically (network/overlay mounts) get a best-effort replace
      // rather than failing every manifest write. COPY-then-delete (not
      // move): if the copy dies mid-write, tmp survives as a complete
      // manifest and load() recovers from it — a degraded move could
      // consume tmp and strand a truncated final file.
      case _: java.nio.file.AtomicMoveNotSupportedException =>
        Files.copy(tmp, manifestPath(m.name),
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        Files.delete(tmp)
    }
    manifestCache(m.name) = m
  }

  /** Mint a new (not-yet-active) version; returns (manifest, versionId). */
  def createVersion(name: String): (TableManifest, String) = {
    // mutate's return is OUR written manifest (a local immutable value),
    // so versions.last is the version this call minted — no outer lock
    val m2 = mutate(name) { m =>
      val vid = f"v${m.versionCounter + 1}%06d"
      Files.createDirectories(versionDir(name, vid))
      m.copy(
        versions = m.versions :+ VersionInfo(vid, System.currentTimeMillis()),
        versionCounter = m.versionCounter + 1)
    }
    (m2, m2.versions.last.id)
  }

  /** Swap the active pointer and append the triggering event; then apply
    * the table's retention policy to the now-superseded versions.
    * `trigger = false` records the event in the history window but does
    * NOT bump `eventCounter` (the downstream-trigger signal) — for
    * content-neutral pointer swaps like compaction, where re-running
    * consumers would reprocess identical rows.
    */
  def setActive(name: String, vid: Option[String], eventKind: String,
      trigger: Boolean = true): TableManifest =
    withTableLock(name) {
      mutate(name) { m =>
        val now = System.currentTimeMillis()
        // stamp the outgoing active version: its retention clock starts here
        val versions = m.versions.map { v =>
          if (m.activeVersion.contains(v.id) && !vid.contains(v.id) &&
              v.supersededAt.isEmpty) v.copy(supersededAt = Some(now))
          else v
        }
        m.copy(
          activeVersion = vid,
          versions = versions,
          events = (m.events :+ TableEvent(eventKind, vid.getOrElse(""), now))
            .takeRight(TableCatalog.MaxEvents),
          eventCounter = m.eventCounter + (if (trigger) 1 else 0))
      }
      load(name).get.meta.retentionMillis.foreach(gc(name, _))
      load(name).get
    }

  def recordEvent(name: String, kind: String): TableManifest = mutate(name) { m =>
    m.copy(
      events = (m.events :+ TableEvent(kind, m.activeVersion.getOrElse(""),
        System.currentTimeMillis())).takeRight(TableCatalog.MaxEvents),
      eventCounter = m.eventCounter + 1)
  }

  /** Stamp a version's committed row count and per-column footer maxes
    * (Table.recordCount's O(1) path + GraftTableSource's O(1) poll path).
    */
  def setVersionStats(name: String, vid: String, rows: Long,
      cursorMax: Map[String, String] = Map.empty): TableManifest =
    mutate(name) { m =>
      m.copy(versions = m.versions.map(v =>
        if (v.id == vid) v.copy(rowCount = Some(rows),
          cursorMax = Some(cursorMax)) else v))
    }

  /** Drop a version's stats stamp entirely. Used when an incremental
    * restamp FAILED after its append committed: a stale stamp silently
    * understates rowCount/cursorMax (a streaming source polling the stale
    * max would skip the appended rows forever), while NO stamp makes every
    * consumer fall back to a scan and the next successful flush recompute
    * a full fresh stamp.
    */
  def clearVersionStats(name: String, vid: String): TableManifest =
    mutate(name) { m =>
      m.copy(versions = m.versions.map(v =>
        if (v.id == vid) v.copy(rowCount = None, cursorMax = None) else v))
    }

  def updateMeta(name: String)(f: TableMeta => TableMeta): TableManifest =
    mutate(name)(m => m.copy(meta = f(m.meta)))

  /** Reserve `n` monotonic ids; returns the first reserved value
    * (exclusive high-water-mark semantics — reference node.py:291-294).
    * Under the table lock, two engines on one catalog always get DISJOINT
    * ranges.
    */
  def reserveIds(name: String, n: Long): Long = {
    val m = mutate(name)(m =>
      m.copy(meta = m.meta.copy(highWaterMark = m.meta.highWaterMark + n)))
    m.meta.highWaterMark - n
  }

  /** A read lease on one version: its presence (unexpired) makes [[gc]]
    * skip that version, so a lazy time-travel scan cannot have its files
    * swept mid-job by a concurrent writer's retention pass. Crash-safe by
    * construction: a reader that dies without releasing just leaves a
    * file that expires on its own and is swept by the next gc.
    */
  case class ReadLease(vid: String, path: Path) {
    def release(): Unit = Files.deleteIfExists(path)
  }

  private def leaseDir(name: String): Path = tableDir(name).resolve("leases")

  /** Take a TTL'd read lease on a version (multi-reader: each call mints
    * its own lease file; gc honors the union). Long jobs should size
    * `ttlMillis` above their expected runtime or re-acquire.
    *
    * Acquired UNDER the table lock: gc lists the lease dir inside its own
    * locked sweep, so serializing acquisition on the same lock closes the
    * TOCTOU where a sweep that already listed leases deletes a version a
    * reader leased a microsecond later. After this returns, either the
    * sweep saw the lease (version kept) or the sweep finished first (and
    * the caller's existence check fails loudly).
    */
  def acquireReadLease(name: String, vid: String,
      ttlMillis: Long = TableCatalog.DefaultLeaseTtlMillis): ReadLease =
    withTableLock(name) {
      // sweep expired leases on every acquisition (already under the table
      // lock, and the dir stays small because of it): a table whose
      // retention gc never runs must not accumulate crashed readers'
      // lease files unboundedly
      leasedVids(name)
      Files.createDirectories(leaseDir(name))
      val p = leaseDir(name).resolve(
        s"$vid.${java.util.UUID.randomUUID().toString.take(8)}.lease")
      Files.write(p, (System.currentTimeMillis() + ttlMillis).toString
        .getBytes(StandardCharsets.UTF_8))
      ReadLease(vid, p)
    }

  /** Version ids currently protected by an unexpired lease; expired lease
    * files are swept as a side effect (called under the table lock).
    */
  private def leasedVids(name: String): Set[String] = {
    val dir = leaseDir(name)
    if (!Files.isDirectory(dir)) Set.empty
    else {
      val now = System.currentTimeMillis()
      val files = Files.list(dir)
      try {
        import scala.jdk.CollectionConverters._
        files.iterator().asScala.filter(_.getFileName.toString.endsWith(".lease"))
          .flatMap { p =>
            val vid = p.getFileName.toString.takeWhile(_ != '.')
            val expiry = try {
              new String(Files.readAllBytes(p), StandardCharsets.UTF_8).trim.toLong
            } catch { case _: Exception => Long.MaxValue } // unreadable = held
            if (expiry >= now) Some(vid)
            else { Files.deleteIfExists(p); None }
          }.toSet
      } finally files.close()
    }
  }

  /** Retention sweep: delete non-active version dirs whose retention age
    * exceeds `keepMillis` (reference node.py:403-404 "garbage collected
    * according to the table's retention policy"). Age counts from
    * `supersededAt` when the version was once active; a version that was
    * never activated (e.g. an abandoned createNewVersion write) ages from
    * `createdAt` — writers that may outlive the retention window should
    * activate promptly or use a longer retention. Versions under an
    * unexpired [[ReadLease]] are skipped (their manifest entry stays, so
    * a later sweep retries once the lease lapses) — the multi-writer
    * answer to "a sweep can race an in-flight lazy read".
    */
  def gc(name: String, keepMillis: Long): Int = {
    var removed = 0
    mutate(name) { m =>
      val cutoff = System.currentTimeMillis() - keepMillis
      val leased = leasedVids(name)
      val (dead, live) = m.versions.partition(v =>
        !m.activeVersion.contains(v.id) && !leased.contains(v.id) &&
          v.supersededAt.getOrElse(v.createdAt) <= cutoff)
      dead.foreach { v =>
        val dir = versionDir(name, v.id)
        if (Files.exists(dir)) {
          Files.walk(dir).sorted(java.util.Comparator.reverseOrder())
            .forEach(p => Files.deleteIfExists(p))
        }
      }
      removed = dead.size
      m.copy(versions = live)
    }
    removed
  }
}

object TableCatalog {
  /** Event-history window kept in the manifest; `eventCounter` carries the
    * all-time total, so trimming never affects downstream triggering.
    */
  val MaxEvents = 1000

  /** Default read-lease TTL (30 min): long enough for an interactive
    * time-travel scan, short enough that a crashed reader's garbage
    * version is reclaimed the same hour. Batch jobs pass their own TTL.
    */
  val DefaultLeaseTtlMillis: Long = 30L * 60 * 1000

  /** JVM-wide gates per lock-file path: `FileChannel.lock` is
    * process-scoped (a second lock attempt from the SAME process throws
    * OverlappingFileLockException instead of blocking), so in-process
    * writers — including separate TableCatalog instances on one dir —
    * serialize here and cross-process writers on the OS lock.
    */
  private val jvmGates =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  /** Lock-file paths held by the current thread (reentrancy). */
  private val heldLocks = new ThreadLocal[java.util.HashSet[String]] {
    override def initialValue(): java.util.HashSet[String] =
      new java.util.HashSet[String]()
  }
}
