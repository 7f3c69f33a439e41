package graft

import graft.api.GraftEngine

/** Hash-bucketed table layout: partition-level upsert + pruned lookup
  * (the 100 TB write path — IMPLEMENTATION.md §100 TB design notes).
  */
class BucketedTableSpec extends SparkSpec {
  import spark.implicits._

  private def engine() = new GraftEngine(spark, freshRoot())

  test("bucketBy lays versions out as __bucket=K dirs; read hides the column") {
    val e = engine()
    val t = e.table("b1", "w").init(uniqueOn = Seq("id"), bucketBy = 4)
    t.append((1L to 20L).map(i => (i, s"v$i")).toDF("id", "v")); t.flush()
    val vdir = e.catalog.versionDir("b1", t.getActiveVersion.get).toFile
    val buckets = vdir.listFiles().filter(_.getName.startsWith("__bucket="))
    assert(buckets.nonEmpty && buckets.length <= 4)
    assert(!t.read.columns.contains("__bucket"))
    assert(t.read.count() == 20)
  }

  test("bucketed upsert rewrites only affected buckets; untouched files are copied byte-for-byte") {
    val e = engine()
    val t = e.table("b2", "w").init(uniqueOn = Seq("id"), bucketBy = 8)
    t.append((1L to 100L).map(i => (i, s"old$i")).toDF("id", "v")); t.flush()
    val v1 = t.getActiveVersion.get
    val dir1 = e.catalog.versionDir("b2", v1)

    // one incoming key -> exactly one affected bucket
    t.upsert(Seq((7L, "NEW")).toDF("id", "v"))
    val v2 = t.getActiveVersion.get
    assert(v2 != v1)
    val dir2 = e.catalog.versionDir("b2", v2)

    def bucketFiles(d: java.nio.file.Path) =
      d.toFile.listFiles().filter(_.getName.startsWith("__bucket="))
        .map(b => b.getName ->
          b.listFiles().filter(_.getName.endsWith(".parquet"))
            .map(f => (f.getName, f.length)).toSet).toMap
    val f1 = bucketFiles(dir1)
    val f2 = bucketFiles(dir2)
    // the affected bucket was rewritten (different files); all others are
    // identical copies of the old version's files
    val changed = f2.keys.filter(k => f1.get(k) != f2.get(k)).toSeq
    assert(changed.size == 1, s"expected 1 rewritten bucket, got $changed")

    // content is a correct merge
    val rows = t.read.as[(Long, String)].collect().toMap
    assert(rows.size == 100 && rows(7L) == "NEW" && rows(8L) == "old8")
  }

  test("lookup scans one bucket and finds the row (typed key literal)") {
    val e = engine()
    val t = e.table("b3", "w").init(uniqueOn = Seq("id"), bucketBy = 4)
    t.append((1L to 50L).map(i => (i, i * 10L)).toDF("id", "x")); t.flush()
    // Int passed for a Long key column must still hash to the right bucket
    val hit = t.lookup(Seq(13)).as[(Long, Long)].collect().toSeq
    assert(hit == Seq((13L, 130L)))
    assert(t.lookup(Seq(999L)).count() == 0)
  }

  test("flush after gaining bucketBy keeps the open version's unbucketed layout (no mixed dirs)") {
    val e = engine()
    val t = e.table("b5", "w").init(uniqueOn = Seq("id"))
    t.append(Seq((1L, "a")).toDF("id", "v")); t.flush()
    t.init(uniqueOn = Seq("id"), bucketBy = 4)
    t.append(Seq((2L, "b")).toDF("id", "v")); t.flush() // same version: stay unbucketed
    assert(t.read.count() == 2) // a mixed dir would fail this read outright
    val vdir = e.catalog.versionDir("b5", t.getActiveVersion.get).toFile
    assert(!vdir.listFiles().exists(_.getName.startsWith("__bucket=")))
    t.upsert(Seq((3L, "c")).toDF("id", "v")) // upsert migrates the layout
    assert(t.read.as[(Long, String)].collect().toMap ==
      Map(1L -> "a", 2L -> "b", 3L -> "c"))
  }

  test("changing bucketBy on an already-bucketed table never duplicates or loses keys") {
    val e = engine()
    val t = e.table("b7", "w").init(uniqueOn = Seq("id"), bucketBy = 4)
    t.append((1L to 40L).map(i => (i, s"old$i")).toDF("id", "v")); t.flush()
    val v1 = t.getActiveVersion.get
    // version dir remembers the count it was hashed with
    assert(java.nio.file.Files.readAllLines(
      e.catalog.versionDir("b7", v1).resolve(graft.api.Table.BucketMarker))
      .get(0).trim == "4")

    t.init(uniqueOn = Seq("id"), bucketBy = 8) // meta count now differs from layout
    // lookup pre-migration: pruned path would hash with n=8 against a
    // 4-bucket layout — must fall back to the filtered full read
    assert(t.lookup(Seq(13L)).as[(Long, String)].collect().toSeq ==
      Seq((13L, "old13")))
    // flush pre-migration: append must follow the DIR's original count, not
    // meta's — a mixed-count dir would corrupt every later pruned scan
    t.append(Seq((41L, "old41")).toDF("id", "v")); t.flush()
    assert(t.read.count() == 41)

    // upsert with mismatched counts takes the full-rewrite path: the old
    // row of an updated key can't survive in a verbatim-copied bucket
    t.upsert(Seq((13L, "NEW"), (42L, "new42")).toDF("id", "v"))
    val rows = t.read.as[(Long, String)].collect()
    assert(rows.length == 42, "no duplicate keys after rebucketing")
    assert(rows.toMap.apply(13L) == "NEW" && rows.toMap.apply(41L) == "old41")
    // migrated version is hashed with (and remembers) the new count
    val v2 = t.getActiveVersion.get
    assert(java.nio.file.Files.readAllLines(
      e.catalog.versionDir("b7", v2).resolve(graft.api.Table.BucketMarker))
      .get(0).trim == "8")
    assert(t.lookup(Seq(13L)).as[(Long, String)].collect().toSeq == Seq((13L, "NEW")))
    // and partition-level upsert works again on the migrated layout
    t.upsert(Seq((13L, "NEWER")).toDF("id", "v"))
    assert(t.read.count() == 42)
    assert(t.lookup(Seq(13L)).as[(Long, String)].collect().toSeq == Seq((13L, "NEWER")))
  }

  test("truncate on a bucketed table keeps the schema") {
    val e = engine()
    val t = e.table("b6", "w").init(uniqueOn = Seq("id"), bucketBy = 4)
    t.append(Seq((1L, "a")).toDF("id", "v")); t.flush()
    t.truncate()
    assert(t.read.count() == 0)
    assert(t.schema.get.fieldNames.toSeq == Seq("id", "v"))
  }

  test("upsert on a table that gained bucketBy after unbucketed writes falls back to full rewrite") {
    val e = engine()
    val t = e.table("b4", "w").init(uniqueOn = Seq("id"))
    t.append(Seq((1L, "a"), (2L, "b")).toDF("id", "v")); t.flush()
    t.init(uniqueOn = Seq("id"), bucketBy = 4)
    t.upsert(Seq((2L, "B"), (3L, "c")).toDF("id", "v"))
    val rows = t.read.as[(Long, String)].collect().toMap
    assert(rows == Map(1L -> "a", 2L -> "B", 3L -> "c"))
    // and the new version is bucket-partitioned going forward
    val vdir = e.catalog.versionDir("b4", t.getActiveVersion.get).toFile
    assert(vdir.listFiles().exists(_.getName.startsWith("__bucket=")))
  }

  test("heuristic-layout append never mints a _BUCKETS marker") {
    // regression: writeInto used to stamp the marker with whatever count
    // it wrote with — promoting the markerless heuristic (max __bucket
    // index + 1, an undercount when top buckets are empty) to the
    // pruning-authorizing attestation would mis-route lookups/upserts
    import spark.implicits._
    val e = new GraftEngine(spark, freshRoot())
    val t = e.table("b9", "w").init(uniqueOn = Seq("id"), bucketBy = 4)
    t.upsert((1L to 12L).map(i => (i, s"v$i")).toDF("id", "v"))
    val vdir = e.catalog.versionDir("b9", t.getActiveVersion.get)
    val marker = vdir.resolve("_BUCKETS")
    assert(java.nio.file.Files.exists(marker))
    java.nio.file.Files.delete(marker) // simulate a legacy markerless dir
    t.append(Seq((13L, "m")).toDF("id", "v")); t.flush()
    assert(!java.nio.file.Files.exists(marker),
      "append must not attest a heuristic bucket count")
    // data still complete through the filtered-full-read fallback
    assert(t.read.count() == 13)
  }
}
