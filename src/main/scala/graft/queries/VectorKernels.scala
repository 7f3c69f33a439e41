package graft.queries

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Broadcast argmax kernels for nearest-neighbor search shapes.
  *
  * The join formulations in [[VectorQueries]] (crossJoin/equi-join a
  * probe set, score one pair per row, collapse with max(struct) or a
  * window) are the readable statement of WHAT is computed and stay as the
  * spec references and the oversized-probe fallbacks. But their cost is
  * row MATERIALIZATION, not arithmetic: the join machinery moves and
  * deserializes a full row per scored pair, measured at ~11 M pairs/s —
  * while the arithmetic itself (64 multiply-adds per pair) sustains
  * hundreds of millions of pairs/s in a register-blocked loop (the
  * [[DedupQueries.tilePairs]] lesson, applied to search instead of
  * enumeration).
  *
  * These kernels broadcast the SMALL side (probes: centroids, query sets,
  * audit samples — guarded by [[VectorKernels.MaxProbeBytes]]) and stream
  * the corpus ONCE through a mapPartitions with per-group row blocks, so
  * per-pair cost is pure arithmetic and nothing pair-shaped is ever
  * materialized. Every dot product is the same strict left-to-right
  * double fold as `float_dot`/the DuckDB oracle, every comparison is
  * nanSafe (NaN greatest, -0.0 == +0.0) with ties to the LOWEST id —
  * bit-identical to the max(struct(cosine, -id)) / window (cos DESC, id
  * ASC) contracts they replace (equality spec-pinned on seeded corpora
  * including zero-norm, ragged-dim, and duplicate-cosine rows).
  *
  * At 100 TB: the corpus side stays fully distributed (one scan, no
  * shuffle besides an optional round-robin rebalance); only the probe set
  * must fit in a broadcast. Probe sets that outgrow the guard (e.g. an
  * eval set of millions of vectors) fall back to the join formulations,
  * which shuffle instead of broadcasting.
  */
object VectorKernels {

  /** Probe sets above this estimated size fall back to the join
    * formulations (the value is per-executor broadcast memory, not a
    * correctness bound).
    */
  private[graft] val MaxProbeBytes: Long = 256L << 20

  /** Collected probe set, grouped by an opaque Long group key. Vectors
    * are widened to double ONCE here (floats widen exactly), matching the
    * per-tile widening in [[DedupQueries.tilePairs]].
    */
  final case class ProbeSet(
      slotGkeys: Array[Long],
      slotIds: Array[Long],
      slotNrms: Array[Double],
      slotVecs: Array[Array[Double]],
      byGroup: Map[Long, Array[Int]]) {
    def nSlots: Int = slotIds.length
    def estBytes: Long =
      slotVecs.iterator.map(v => 8L * v.length + 64L).sum
  }

  /** Collect `(gkey, id, nrm, vec)` rows into a [[ProbeSet]]. The caller
    * guards the size (these are centroid/query/audit-sample sets, orders
    * of magnitude under the corpus).
    */
  private[graft] def collectProbes(df: DataFrame): ProbeSet = {
    val s = df.sparkSession
    import s.implicits._
    val rows = df.select(
        col("gkey").cast("long"), col("id").cast("long"),
        col("nrm").cast("double"), col("vec"))
      .as[(Long, Long, Double, Array[Float])].collect()
    val n = rows.length
    val gk = new Array[Long](n); val ids = new Array[Long](n)
    val nrms = new Array[Double](n); val vecs = new Array[Array[Double]](n)
    var i = 0
    while (i < n) {
      val (g, id, nr, vf) = rows(i)
      gk(i) = g; ids(i) = id; nrms(i) = nr
      val d = new Array[Double](if (vf == null) 0 else vf.length)
      var k = 0
      while (k < d.length) { d(k) = vf(k).toDouble; k += 1 }
      vecs(i) = d
      i += 1
    }
    val byG = (0 until n).groupBy(gk(_)).map { case (g, is) =>
      g -> is.toArray
    }
    ProbeSet(gk, ids, nrms, vecs, byG)
  }

  /** Spark's nanSafe double comparison: NaN greatest, NaN == NaN,
    * -0.0 == +0.0 (the [[VectorQueries.topKPerQuery]] contract).
    */
  @inline private[queries] def nanSafeCmp(a: Double, b: Double): Int = {
    val an = java.lang.Double.isNaN(a)
    val bn = java.lang.Double.isNaN(b)
    if ((an && bn) || a == b) 0
    else if (an) 1
    else if (bn) -1
    else if (a > b) 1 else -1
  }

  /** Strict left-to-right double fold — bit-identical to float_dot. */
  @inline private[graft] def fold(a: Array[Double], b: Array[Double]): Double = {
    var t = 0.0
    var k = 0
    while (k < a.length) { t += a(k) * b(k); k += 1 }
    t
  }

  @inline private[graft] def cosOf(t: Double, na: Double, nb: Double): Double = {
    val denom = na * nb
    if (denom == 0.0) Double.NaN else t / denom
  }

  /** For every probe slot: the best corpus row in the slot's group —
    * nanSafe-max cosine, ties to the LOWEST corpus id — merged across
    * partitions with the same max(struct(cosine, -id)) the join
    * formulations use. Corpus columns: (gkey long, id long, nrm double,
    * vec array<float>). Output: (probe_id, corpus_id, cosine), one row
    * per probe that saw at least one corpus row in its group; cosine is
    * NULL when every candidate had mismatched dims (float_dot's ragged
    * contract), with the lowest-id candidate — exactly what
    * max(struct(NULL, -id)) leaves behind.
    *
    * The corpus is round-robin rebalanced to the shuffle-partition count:
    * the input is often a 1-2 partition scan (or a kernel-assigned frame
    * that inherited one), and the kernel's parallelism IS its
    * partitioning. One corpus-sized exchange buys full-width execution;
    * on a many-executor cluster the scan is already wide and the
    * rebalance is a no-op cost-wise.
    */
  private[graft] def bestRowPerProbe(s: SparkSession, corpus: DataFrame,
      probes: ProbeSet, block: Int = 256,
      excludeSelf: Boolean = false): DataFrame = {
    import s.implicits._
    val bc = s.sparkContext.broadcast(probes)
    val nPart = s.sessionState.conf.numShufflePartitions
    val partials = corpus
      .select(col("gkey").cast("long"), col("id").cast("long"),
        col("nrm").cast("double"), col("vec"))
      .as[(Long, Long, Double, Array[Float])]
      .repartition(nPart)
      .mapPartitions { it =>
        val ps = bc.value
        val nS = ps.nSlots
        val bestCos = new Array[Double](nS)
        val bestId = Array.fill(nS)(Long.MinValue)
        val nullBest = Array.fill(nS)(Long.MaxValue)
        // per-group row blocks: ids, nrms, widened vectors
        final class Block {
          val ids = new Array[Long](block)
          val nrms = new Array[Double](block)
          val rows = new Array[Array[Double]](block)
          var n = 0
        }
        val blocks = scala.collection.mutable.LongMap.empty[Block]
        def flush(g: Long, b: Block): Unit = {
          val slots = ps.byGroup(g)
          // hot path precondition: every buffered row has the same dims
          val d0 = if (b.n > 0) b.rows(0).length else -1
          var uniform = d0 > 0
          var rr = 1
          while (uniform && rr < b.n) {
            uniform = b.rows(rr).length == d0; rr += 1
          }
          var si = 0
          while (si < slots.length) {
            val slot = slots(si)
            val qv = ps.slotVecs(slot)
            val qd = qv.length
            val qn = ps.slotNrms(slot)
            var bc0 = bestCos(slot); var bi0 = bestId(slot)
            var nb0 = nullBest(slot)
            // leave-one-out searches drop the probe's own corpus row
            val selfId = if (excludeSelf) ps.slotIds(slot) else Long.MinValue
            @inline def consider(cos: Double, id: Long): Unit =
              if (id != selfId) {
                val c = if (bi0 == Long.MinValue) 1 else nanSafeCmp(cos, bc0)
                if (c > 0 || (c == 0 && id < bi0)) { bc0 = cos; bi0 = id }
              }
            if (uniform && qd == d0) {
              // 4 independent accumulator chains hide the FP-add latency
              // (the tilePairs register-blocking); each chain is still a
              // strict left-to-right fold over ONE pair — bit-identical
              // to float_dot
              var r = 0
              while (r + 3 < b.n) {
                val r0 = b.rows(r); val r1 = b.rows(r + 1)
                val r2 = b.rows(r + 2); val r3 = b.rows(r + 3)
                var t0 = 0.0; var t1 = 0.0; var t2 = 0.0; var t3 = 0.0
                var k = 0
                while (k < qd) {
                  val q = qv(k)
                  t0 += r0(k) * q; t1 += r1(k) * q
                  t2 += r2(k) * q; t3 += r3(k) * q
                  k += 1
                }
                consider(cosOf(t0, b.nrms(r), qn), b.ids(r))
                consider(cosOf(t1, b.nrms(r + 1), qn), b.ids(r + 1))
                consider(cosOf(t2, b.nrms(r + 2), qn), b.ids(r + 2))
                consider(cosOf(t3, b.nrms(r + 3), qn), b.ids(r + 3))
                r += 4
              }
              while (r < b.n) {
                consider(cosOf(fold(b.rows(r), qv), b.nrms(r), qn), b.ids(r))
                r += 1
              }
            } else {
              var r = 0
              while (r < b.n) {
                val rv = b.rows(r)
                if (rv.length == qd)
                  consider(cosOf(fold(rv, qv), b.nrms(r), qn), b.ids(r))
                else if (b.ids(r) < nb0 && b.ids(r) != selfId) nb0 = b.ids(r)
                r += 1
              }
            }
            bestCos(slot) = bc0; bestId(slot) = bi0; nullBest(slot) = nb0
            si += 1
          }
          b.n = 0
        }
        it.foreach { case (g, id, nr, vf) =>
          if (ps.byGroup.contains(g)) {
            val b = blocks.getOrElseUpdate(g, new Block)
            val d = new Array[Double](if (vf == null) 0 else vf.length)
            var k = 0
            while (k < d.length) { d(k) = vf(k).toDouble; k += 1 }
            b.ids(b.n) = id; b.nrms(b.n) = nr; b.rows(b.n) = d; b.n += 1
            if (b.n == block) flush(g, b)
          }
        }
        blocks.foreach { case (g, b) => if (b.n > 0) flush(g, b) }
        (0 until nS).iterator.flatMap { slot =>
          if (bestId(slot) != Long.MinValue)
            Iterator.single((ps.slotIds(slot), bestId(slot),
              Option(bestCos(slot))))
          else if (nullBest(slot) != Long.MaxValue)
            Iterator.single((ps.slotIds(slot), nullBest(slot),
              Option.empty[Double]))
          else Iterator.empty
        }
      }
      .toDF("probe_id", "corpus_id", "cosine")
    partials
      .groupBy("probe_id")
      .agg(max(struct(col("cosine"), (-col("corpus_id")).as("neg"))).as("b"))
      .select(col("probe_id"), (-col("b.neg")).as("corpus_id"),
        col("b.cosine").as("cosine"))
  }

  /** Append to every corpus row the ids of its `p` nearest probes within
    * its group, ranked (cosine nanSafe-DESC NULLS LAST, probe id ASC) —
    * the crossJoin + max(struct) (p=1) / window row_number (p>1)
    * contract. Rows whose group has no probes are DROPPED (inner-join
    * semantics). Dim-mismatched probes are NULL-cosine candidates: they
    * rank after every scored probe, ids ascending — exactly where the
    * struct comparison / DESC-NULLS-LAST window puts them.
    *
    * `gkeyCol` None = single global group 0. Output appends `outCol`:
    * LongType for p=1 (unless `arrayOut`), else ArrayType(LongType) in
    * rank order. No shuffle: this is a pure map over whatever
    * partitioning the corpus already has.
    */
  private[graft] def assignProbes(corpus: DataFrame, probes: ProbeSet,
      vecCol: String, nrmCol: String, gkeyCol: Option[String],
      outCol: String, p: Int = 1, arrayOut: Boolean = false): DataFrame = {
    val s = corpus.sparkSession
    val bc = s.sparkContext.broadcast(probes)
    val schema = corpus.schema
    val vi = schema.fieldIndex(vecCol)
    val ni = schema.fieldIndex(nrmCol)
    val gi = gkeyCol.map(schema.fieldIndex)
    val scalarOut = p == 1 && !arrayOut
    val outType = if (scalarOut) LongType else ArrayType(LongType, false)
    val outSchema = schema.add(outCol, outType, nullable = false)
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    corpus.mapPartitions { it =>
      val ps = bc.value
      val topIds = new Array[Long](p)
      val topCos = new Array[Double](p)
      it.flatMap { r =>
        val g = gi match {
          case Some(i) => r.get(i) match {
            case l: java.lang.Long => l.longValue
            case i2: java.lang.Integer => i2.longValue
            case x => throw new IllegalArgumentException(s"non-integral gkey: $x")
          }
          case None => 0L
        }
        ps.byGroup.get(g) match {
          case None => Iterator.empty
          case Some(slots) =>
            val vf = r.getAs[scala.collection.Seq[Float]](vi)
            val nr = r.getDouble(ni)
            val d = new Array[Double](if (vf == null) 0 else vf.length)
            var k = 0
            while (k < d.length) { d(k) = vf(k).toDouble; k += 1 }
            var nTop = 0
            var nullCands: List[Long] = Nil
            var si = 0
            while (si < slots.length) {
              val slot = slots(si)
              val qv = ps.slotVecs(slot)
              if (qv.length == d.length && !(vf == null)) {
                val cos = cosOf(fold(d, qv), nr, ps.slotNrms(slot))
                val id = ps.slotIds(slot)
                // insertion into the tiny (p ≤ 3) rank buffer
                var pos = nTop
                while (pos > 0 && {
                  val c = nanSafeCmp(cos, topCos(pos - 1))
                  c > 0 || (c == 0 && id < topIds(pos - 1))
                }) pos -= 1
                if (pos < p) {
                  var m = math.min(nTop, p - 1)
                  while (m > pos) {
                    topIds(m) = topIds(m - 1); topCos(m) = topCos(m - 1)
                    m -= 1
                  }
                  topIds(pos) = id; topCos(pos) = cos
                  if (nTop < p) nTop += 1
                }
              } else nullCands = ps.slotIds(slot) :: nullCands
              si += 1
            }
            val scored = java.util.Arrays.copyOf(topIds, math.min(nTop, p))
            val chosen: Array[Long] =
              if (scored.length >= p || nullCands.isEmpty) scored
              else (scored ++ nullCands.sorted).take(p)
            val out: Any =
              if (scalarOut) chosen(0) else chosen.toSeq
            Iterator.single(Row.fromSeq(r.toSeq :+ out))
        }
      }
    }(enc)
  }

  /** Keep only the slots whose probe id passes `keep` (e.g. live IVF
    * cells), rebuilding the group index.
    */
  private[graft] def filterSlots(ps: ProbeSet, keep: Long => Boolean): ProbeSet = {
    val idx = (0 until ps.nSlots).filter(i => keep(ps.slotIds(i))).toArray
    val gk = idx.map(ps.slotGkeys)
    val byG = idx.indices.groupBy(i => gk(i)).map { case (g, is) =>
      g -> is.toArray
    }
    ProbeSet(gk, idx.map(ps.slotIds), idx.map(ps.slotNrms),
      idx.map(ps.slotVecs), byG)
  }

  /** Probe-frame helper: normalize a (gkey?, id, nrm, vec) selection. */
  private[graft] def probeFrame(df: DataFrame, id: Column, nrm: Column,
      vec: Column, gkey: Column = lit(0L)): DataFrame =
    df.select(gkey.cast("long").as("gkey"), id.cast("long").as("id"),
      nrm.cast("double").as("nrm"), vec.as("vec"))
}
