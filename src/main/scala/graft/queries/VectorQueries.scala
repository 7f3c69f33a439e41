package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** Similarity search + multimodal plumbing (SURVEY.md §2.D D3/D5).
  *
  * d05 is the brute-force cosine-top-k baseline (broadcast the query set,
  * scan the corpus once); d06 is the scale path — IVF-style partition
  * pruning with deterministic centroids, so only 1/k of the corpus is
  * scanned per query; d11 is the multimodal decode pipeline with a stubbed
  * codec (container has no image/audio libs) but real Spark plumbing:
  * binary column, typed mapPartitions batch, metadata schema.
  */
object VectorQueries {
  import Q._

  private def vecs(s: SparkSession, dir: String): DataFrame = {
    graft.functions.FloatDotProduct.register(s)
    t(s, dir, "embeddings")
      .select(col("vec_id"), col("label"), col("embedding"))
      .withColumn("nrm", l2norm(col("embedding")))
  }

  /** LSH hyperplane weight (i, j) in [-1, 1): md5-derived so the DuckDB
    * oracle reproduces the identical float. 2^59 scales the 60-bit hash
    * exactly (power-of-two division); the BIGINT→DOUBLE rounding is
    * round-to-nearest on both engines.
    */
  private[queries] def hpWeight(i: Int, j: Int): Float = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"$i:$j".getBytes("UTF-8")).map("%02x".format(_)).mkString
    val h = java.lang.Long.parseLong(hex.substring(0, 15), 16)
    ((h.toDouble / 576460752303423488.0) - 1.0).toFloat
  }

  /** d32's inputs: (training vectors, eval vectors). Factored so the spec
    * can drive both nearest-neighbor paths against the same frames (the
    * d21 size-adaptive CC pattern).
    */
  private[graft] def d32Inputs(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val v = vecs(s, dir)
    val ev = v.filter(col("label") === 0)
      .select(col("vec_id").as("eval_id"), col("embedding").as("qe"),
        col("nrm").as("qn"))
    val tr = v.filter(col("label") =!= 0)
      .select(col("vec_id").as("train_id"), col("embedding").as("te"),
        col("nrm").as("tn"))
    (tr, ev)
  }

  /** Nearest training vector per eval vector, broadcast path: the eval set
    * fits a broadcast, the training corpus streams once. struct max =
    * lexicographic (cosine, -train_id): highest cosine, ties to the LOWEST
    * train id — same pick the oracle's (cosine DESC, train_id ASC) window
    * makes.
    */
  private[graft] def nearestTrainBroadcast(tr: DataFrame, ev: DataFrame): DataFrame =
    tr.crossJoin(broadcast(ev))
      .withColumn("cosine",
        cosineWithNorms(dot(col("te"), col("qe")), col("tn"), col("qn")))
      .groupBy("eval_id")
      .agg(max(struct(col("cosine"), (-col("train_id")).as("neg_id")))
        .as("best"))
      .select(col("eval_id"), (-col("best.neg_id")).as("train_id"),
        col("best.cosine").as("cosine"))

  /** Nearest training vector per eval vector, fragment-replicate path —
    * for when the eval set outgrows a broadcast but the answer must stay
    * EXACT (the d06/d20 index paths trade exactness). Train rows salt into
    * `fragments` buckets; the eval set is replicated to every bucket
    * through a standard shuffle equi-join on the salt (no cartesian
    * product, no broadcast); the same max(struct) partial agg collapses
    * pairs map-side and merges across fragments at the final groupBy.
    * Train shuffles once, eval `fragments` times; results are identical to
    * [[nearestTrainBroadcast]] for any fragment count.
    */
  private[graft] def nearestTrainReplicated(tr: DataFrame, ev: DataFrame,
      fragments: Int = 32): DataFrame = {
    val salted = tr.withColumn("__frag",
      pmod(col("train_id"), lit(fragments.toLong)).cast("int"))
    val evRep = ev.withColumn("__frag",
      explode(sequence(lit(0), lit(fragments - 1))))
    salted.hint("shuffle_hash").join(evRep, "__frag")
      .withColumn("cosine",
        cosineWithNorms(dot(col("te"), col("qe")), col("tn"), col("qn")))
      .groupBy("eval_id")
      .agg(max(struct(col("cosine"), (-col("train_id")).as("neg_id")))
        .as("best"))
      .select(col("eval_id"), (-col("best.neg_id")).as("train_id"),
        col("best.cosine").as("cosine"))
  }

  /** Exact-NN pair budget for d32: up to ~1G (eval × train) scored pairs
    * the exact fragment-replicate path stays; beyond it the IVF-indexed
    * path takes over. The budget is a PAIR count (the actual cost unit),
    * not a row count, so the switch tracks both sides' growth.
    */
  private[graft] val ExactPairBudget = 1L << 30

  /** Exact nearest-train search through the [[VectorKernels]] broadcast
    * argmax kernel: eval vectors collect into a broadcast probe set, the
    * training corpus streams once, per-pair cost is pure register-blocked
    * arithmetic. Bit-identical to [[nearestTrainBroadcast]] /
    * [[nearestTrainReplicated]] (kernel-equality spec); callers guard the
    * eval set against [[VectorKernels.MaxProbeBytes]] and fall back to
    * the replicated join past it.
    */
  private[graft] def nearestTrainKernel(tr: DataFrame, ev: DataFrame): DataFrame = {
    val s = tr.sparkSession
    val ps = VectorKernels.collectProbes(
      VectorKernels.probeFrame(ev, col("eval_id"), col("qn"), col("qe")))
    VectorKernels.bestRowPerProbe(s,
        tr.select(lit(0L).as("gkey"), col("train_id").as("id"),
          col("tn").as("nrm"), col("te").as("vec")), ps)
      .select(col("probe_id").as("eval_id"),
        col("corpus_id").as("train_id"), col("cosine"))
  }

  /** Nearest training vector per eval vector through the d06-style IVF
    * index — the APPROXIMATE escape hatch for eval sets that outgrow
    * [[ExactPairBudget]] (workload-quadratic exact NN). Deterministic
    * centroids (every `mod`-th train id, modulus ~√n like d06), train
    * rows assigned to their nearest cell once (O(n·√n) map-side argmax),
    * each eval probes its `nprobe` nearest cells — O(eval · n/cells ·
    * nprobe) scored pairs instead of O(eval · n).
    *
    * This is the JOIN formulation — the readable statement of the IVF
    * semantics and the fallback when the probe structures outgrow
    * [[VectorKernels.MaxProbeBytes]]. [[nearestTrainIvf]] computes the
    * identical result through the broadcast argmax kernel (equality
    * spec-pinned) at a fraction of the per-pair cost.
    *
    * `nprobe >= cell count` degenerates to an EXACT search (every cell
    * probed ⇒ every train row scored ⇒ same max(struct) argmax and
    * tie-break as [[nearestTrainBroadcast]]) — which is what the
    * branch-equality spec pins; recall at the default `nprobe` is the
    * audit column's job (d32).
    */
  /** Deterministic IVF centroids for the nearest-train family: every
    * `mod`-th train id (modulus ~√n like d06). Tiny corpora may have no
    * train id on the modulus lattice (the ids divisible by mod can all
    * sit in the eval label) — one centroid is always enough for
    * correctness, it just degenerates to a full scan. Shared by all three
    * IVF formulations so the index geometry cannot drift between them.
    */
  private[graft] def ivfCentroids(tr: DataFrame, nTrain: Long): DataFrame = {
    val mod = 200L * math.max(1L,
      math.ceil(math.sqrt(nTrain / 2000.0)).toLong)
    val cent0 = tr.filter(pmod(col("train_id"), lit(mod)) === 0)
      .select(col("train_id").as("c_id"), col("te").as("ce"),
        col("tn").as("cn"))
    if (cent0.isEmpty)
      tr.orderBy("train_id").limit(1)
        .select(col("train_id").as("c_id"), col("te").as("ce"),
          col("tn").as("cn"))
    else cent0
  }

  private[graft] def nearestTrainIvfJoin(tr: DataFrame, ev: DataFrame,
      nprobe: Int = 3, knownTrainN: Option[Long] = None): DataFrame = {
    // the d32 caller just counted the train side for its budget switch —
    // don't pay a second corpus scan for the same number
    val nTrain = knownTrainN.getOrElse(tr.count())
    val cent = ivfCentroids(tr, nTrain)
    val assigned = tr.crossJoin(broadcast(cent))
      .withColumn("c_cos",
        cosineWithNorms(dot(col("te"), col("ce")), col("tn"), col("cn")))
      .groupBy("train_id")
      .agg(max(struct(col("c_cos"), (-col("c_id")).as("nc"))).as("best"),
        first("te").as("te"), first("tn").as("tn"))
      .select(col("train_id"), col("te"), col("tn"),
        (-col("best.nc")).as("cell"))
    // rank probes over NON-EMPTY cells only: a centroid can end up with
    // zero members (its own vector assigned to a duplicate centroid with
    // a smaller id), and an eval whose nprobe nearest cells were all
    // empty would silently vanish from the inner cell join — every eval
    // must keep its one output row
    val liveCent = cent.join(
      assigned.select(col("cell").as("c_id")).distinct(),
      Seq("c_id"), "left_semi")
    val wProbe = Window.partitionBy("eval_id")
      .orderBy(col("c_cos").desc, col("c_id"))
    val probes = ev.crossJoin(broadcast(liveCent))
      .withColumn("c_cos",
        cosineWithNorms(dot(col("qe"), col("ce")), col("qn"), col("cn")))
      .withColumn("pr", row_number().over(wProbe))
      .filter(col("pr") <= nprobe)
      .select(col("eval_id"), col("qe"), col("qn"), col("c_id").as("cell"))
    assigned.join(probes, "cell")
      .withColumn("cosine",
        cosineWithNorms(dot(col("te"), col("qe")), col("tn"), col("qn")))
      .groupBy("eval_id")
      .agg(max(struct(col("cosine"), (-col("train_id")).as("neg_id")))
        .as("best"))
      .select(col("eval_id"), (-col("best.neg_id")).as("train_id"),
        col("best.cosine").as("cosine"))
  }

  /** IVF nearest-train search, kernel execution: the same index semantics
    * as [[nearestTrainIvfJoin]] (same deterministic centroids, same
    * liveness rule, same probe ranking, same within-cell argmax and
    * tie-breaks — equality spec-pinned), with every row-at-a-time
    * join+agg replaced by a [[VectorKernels]] broadcast pass:
    *
    *   - cell assignment: top-1 kernel over the train scan (the join
    *     formulation's crossJoin + max(struct) + first() regroup shuffled
    *     the full corpus and scored pairs at row-materialization cost);
    *   - liveness: one light assignment pass over (te, tn) only — ~2
    *     corpus scans total, still cheaper than one join-path pass;
    *   - probe ranking: top-nprobe kernel over the eval side (replaces
    *     crossJoin + window row_number);
    *   - within-cell scoring: grouped argmax kernel (replaces the
    *     cell equi-join + groupBy), merged per eval across its probed
    *     cells by the same max(struct(cosine, -train_id)).
    *
    * Probe structures that outgrow [[VectorKernels.MaxProbeBytes]]
    * (centroids ~√n; eval×nprobe vectors) fall back to the join
    * formulation — at that scale broadcasting loses to shuffling.
    */
  private[graft] def nearestTrainIvf(tr: DataFrame, ev: DataFrame,
      nprobe: Int = 3, knownTrainN: Option[Long] = None,
      knownEvalN: Option[Long] = None): DataFrame = {
    val s = tr.sparkSession
    import s.implicits._
    val nTrain = knownTrainN.getOrElse(tr.count())
    val cent = ivfCentroids(tr, nTrain)
    val centPs = VectorKernels.collectProbes(
      VectorKernels.probeFrame(cent, col("c_id"), col("cn"), col("ce")))
    val dims = if (centPs.nSlots > 0) centPs.slotVecs(0).length else 0
    val evalN = knownEvalN.getOrElse(ev.count())
    val evProbeBytes = evalN * nprobe * (dims.toLong * 8 + 64)
    // centroids scale as ~√n and fit a broadcast far past any realistic
    // corpus; if they somehow don't, the join formulation is the only
    // shape left. An oversized EVAL probe set (the case that actually
    // happens — eval grows with the corpus) keeps the broadcast centroid
    // index and moves the within-cell scoring to the cogrouped cell
    // kernel, which never materializes a pair row (the join formulation's
    // pair-stream SortAggregates spilled partition-invariantly at 1000×).
    if (centPs.estBytes > VectorKernels.MaxProbeBytes)
      return nearestTrainIvfJoin(tr, ev, nprobe, Some(nTrain))
    if (centPs.estBytes + evProbeBytes > VectorKernels.MaxProbeBytes)
      return nearestTrainIvfCells(tr, ev, nprobe, Some(nTrain))
    // liveness: cells that received at least one member (a centroid can
    // lose its own vector to a duplicate centroid with a smaller id, and
    // evals must never probe only empty cells)
    val liveSet = VectorKernels.assignProbes(
        tr.select(col("te"), col("tn")), centPs, "te", "tn", None, "cell")
      .select(col("cell")).distinct().as[Long].collect().toSet
    val livePs = VectorKernels.filterSlots(centPs, cid => liveSet.contains(cid))
    val assigned = VectorKernels.assignProbes(tr, centPs, "te", "tn",
      None, "cell")
    // nprobe beyond the live cell count means "probe everything" — clamp
    // so the rank buffer stays probe-count sized
    val pEff = math.min(nprobe.toLong,
      math.max(1L, livePs.nSlots.toLong)).toInt
    val probed = VectorKernels.assignProbes(ev, livePs, "qe", "qn",
        None, "cells", pEff, arrayOut = true)
      .select(col("eval_id"), col("qe"), col("qn"),
        explode(col("cells")).as("cell"))
    val evPs = VectorKernels.collectProbes(VectorKernels.probeFrame(
      probed, col("eval_id"), col("qn"), col("qe"), col("cell")))
    VectorKernels.bestRowPerProbe(s,
        assigned.select(col("cell").as("gkey"), col("train_id").as("id"),
          col("tn").as("nrm"), col("te").as("vec")), evPs)
      .select(col("probe_id").as("eval_id"),
        col("corpus_id").as("train_id"), col("cosine"))
  }

  /** IVF nearest-train search, cogrouped-cell execution — the scale path
    * for eval sets that outgrow [[VectorKernels.MaxProbeBytes]] (the
    * regime the join formulation used to own). Same index semantics as
    * [[nearestTrainIvfJoin]] (same [[ivfCentroids]], same liveness rule,
    * same probe ranking, same within-cell argmax and tie-breaks —
    * equality spec-pinned), but the within-cell scoring never
    * materializes a pair row:
    *
    *   - cell assignment + probe ranking run through the broadcast
    *     [[VectorKernels.assignProbes]] kernel (centroids are ~√n and
    *     always fit — the caller routes away when they don't), so the
    *     only shuffles are one pass of members and one of probes, both
    *     corpus-shaped, never pair-shaped;
    *   - DEGENERATE CELLS are re-split before the shuffle: per-cell
    *     member counts (a ≤|centroids|-row aggregate) size a split factor
    *     f(cell) = ⌈members/target⌉, members partition into subcells by
    *     pmod(train_id, f), probes replicate to every subcell — the same
    *     mechanism d12's pair-budget hatch applies to oversized labels.
    *     `target` defaults to max(64Ki, n/(4·shufflePartitions)), so
    *     per-task state SHRINKS as partitions grow — the join
    *     formulation's per-cell sort state was partition-invariant
    *     (measured: 70 GB spill at 1000× identical at 32 and 256
    *     partitions) because a cell, however large, hashed to one task;
    *   - within each (cell, sub) cogroup the BOUNDED member block
    *     (≤~target rows) is buffered and widened once, probes STREAM
    *     through register-blocked scoring (the [[VectorKernels]] 4-chain
    *     fold, bit-identical to float_dot), and each probe emits exactly
    *     one partial row — so task memory is O(target), independent of
    *     both the eval-set size and the cell skew;
    *   - partials (≤ probes·f rows, corpus-logarithmic) merge with the
    *     same max(struct(cosine, -id)) the kernel contract pins,
    *     including the NULL-cosine ragged-dims fallback.
    *
    * Probe-replication bound: the probe-side shuffle moves ≤
    * |ev| · nprobe · fmax · rowBytes, where fmax = min([[MaxCellSplit]],
    * ⌈maxCellMembers / target⌉) and rowBytes ≈ 4·dim + ~50. With the
    * default target = max(64Ki, n/(4·partitions)), fmax ≤ 4·partitions
    * on any hash-balanced corpus, so replication stays within a small
    * constant of the eval set. The [[MaxCellSplit]] cap only binds on a
    * PATHOLOGICAL corpus (≥ cap·target members in ONE cell — e.g.
    * all-identical embeddings): there per-task member state is
    * n_cell/cap and probe bytes are |ev|·nprobe·cap·rowBytes — both
    * linear in their own input, neither pair-shaped (spec-pinned with a
    * task-metrics measurement on the degenerate corpus,
    * Round13OpsSpec).
    */
  /** Degenerate-cell re-split cap for [[nearestTrainIvfCells]]: the
    * largest factor one cell may split into. Caps probe replication at
    * cap× (probes copy to every subcell) while per-task member state
    * degrades to n_cell/cap — the trade the scaladoc bound quantifies.
    */
  private[graft] val MaxCellSplit = 1024L

  private[graft] def nearestTrainIvfCells(tr: DataFrame, ev: DataFrame,
      nprobe: Int = 3, knownTrainN: Option[Long] = None,
      targetCellRows: Option[Long] = None): DataFrame = {
    val s = tr.sparkSession
    import s.implicits._
    val nTrain = knownTrainN.getOrElse(tr.count())
    val cent = ivfCentroids(tr, nTrain)
    val centPs = VectorKernels.collectProbes(
      VectorKernels.probeFrame(cent, col("c_id"), col("cn"), col("ce")))
    // map-only kernel assignment over the corpus scan (recomputed once
    // more below for the member shuffle — two light scans beat caching a
    // corpus-sized frame on disk at the scales this path serves)
    val assigned = VectorKernels.assignProbes(tr, centPs, "te", "tn",
      None, "cell")
    // per-cell member counts: ≤ |centroids| rows. Doubles as the liveness
    // set (a cell with a count has ≥1 member by construction).
    val counts = assigned.groupBy("cell")
      .agg(count(lit(1)).as("cnt")).as[(Long, Long)].collect()
    val liveSet = counts.iterator.map(_._1).toSet
    val livePs = VectorKernels.filterSlots(centPs, liveSet.contains)
    val pEff = math.min(nprobe.toLong,
      math.max(1L, livePs.nSlots.toLong)).toInt
    val probed = VectorKernels.assignProbes(ev, livePs, "qe", "qn",
        None, "cells", pEff, arrayOut = true)
      .select(col("eval_id"), col("qe"), col("qn"),
        explode(col("cells")).as("cell"))
    val nPart = s.sessionState.conf.numShufflePartitions
    val target = math.max(1L, targetCellRows.getOrElse(
      math.max(65536L, nTrain / (4L * nPart))))
    // split factors: capped at MaxCellSplit so a pathological single-cell
    // corpus cannot explode probe replication (see the scaladoc bound)
    val splits = counts.toSeq.map { case (c, n) =>
      (c, math.min(MaxCellSplit, (n + target - 1L) / target).toInt)
    }.toDF("cell", "f")
    val memDs = assigned.join(broadcast(splits), "cell")
      .select(col("cell"),
        pmod(col("train_id"), col("f")).cast("int").as("sub"),
        col("train_id"), col("tn"), col("te"))
      .as[(Long, Int, Long, Double, Array[Float])]
    val prbDs = probed.join(broadcast(splits), "cell")
      .withColumn("sub", explode(sequence(lit(0), col("f") - 1)))
      .select(col("cell"), col("sub").cast("int"),
        col("eval_id"), col("qn"), col("qe"))
      .as[(Long, Int, Long, Double, Array[Float])]
    val partials = memDs.groupByKey(t => (t._1, t._2))
      .cogroup(prbDs.groupByKey(t => (t._1, t._2))) { case (_, ms, ps2) =>
        // bounded member block (≤~target rows by the re-split), widened
        // once; probes stream — nothing pair-shaped ever materializes
        val idsB = scala.collection.mutable.ArrayBuilder.make[Long]
        val nrmsB = scala.collection.mutable.ArrayBuilder.make[Double]
        val vecsB = scala.collection.mutable.ArrayBuilder.make[Array[Double]]
        var nM = 0
        ms.foreach { m =>
          idsB += m._3; nrmsB += m._4
          val vf = m._5
          val d = new Array[Double](if (vf == null) 0 else vf.length)
          var k = 0
          while (k < d.length) { d(k) = vf(k).toDouble; k += 1 }
          vecsB += d
          nM += 1
        }
        if (nM == 0) Iterator.empty
        else {
          val mIds = idsB.result(); val mNrms = nrmsB.result()
          val mVecs = vecsB.result()
          ps2.map { p =>
            val pid = p._3; val qn = p._4; val vf = p._5
            val qd = if (vf == null) 0 else vf.length
            val qv = new Array[Double](qd)
            var k = 0
            while (k < qd) { qv(k) = vf(k).toDouble; k += 1 }
            var bc0 = 0.0; var bi0 = Long.MinValue; var nb0 = Long.MaxValue
            @inline def consider(cos: Double, id: Long): Unit = {
              val c =
                if (bi0 == Long.MinValue) 1
                else VectorKernels.nanSafeCmp(cos, bc0)
              if (c > 0 || (c == 0 && id < bi0)) { bc0 = cos; bi0 = id }
            }
            var uniform = qd > 0
            var r = 0
            while (uniform && r < nM) {
              uniform = mVecs(r).length == qd; r += 1
            }
            if (uniform) {
              // 4 independent accumulator chains hide the FP-add latency;
              // each chain is a strict left-to-right fold over ONE pair —
              // bit-identical to float_dot (the bestRowPerProbe blocking,
              // transposed: one probe against the member block)
              r = 0
              while (r + 3 < nM) {
                val r0 = mVecs(r); val r1 = mVecs(r + 1)
                val r2 = mVecs(r + 2); val r3 = mVecs(r + 3)
                var t0 = 0.0; var t1 = 0.0; var t2 = 0.0; var t3 = 0.0
                var k2 = 0
                while (k2 < qd) {
                  val q = qv(k2)
                  t0 += r0(k2) * q; t1 += r1(k2) * q
                  t2 += r2(k2) * q; t3 += r3(k2) * q
                  k2 += 1
                }
                consider(VectorKernels.cosOf(t0, mNrms(r), qn), mIds(r))
                consider(VectorKernels.cosOf(t1, mNrms(r + 1), qn), mIds(r + 1))
                consider(VectorKernels.cosOf(t2, mNrms(r + 2), qn), mIds(r + 2))
                consider(VectorKernels.cosOf(t3, mNrms(r + 3), qn), mIds(r + 3))
                r += 4
              }
              while (r < nM) {
                consider(VectorKernels.cosOf(
                  VectorKernels.fold(mVecs(r), qv), mNrms(r), qn), mIds(r))
                r += 1
              }
            } else {
              r = 0
              while (r < nM) {
                val rv = mVecs(r)
                if (rv.length == qd)
                  consider(VectorKernels.cosOf(
                    VectorKernels.fold(rv, qv), mNrms(r), qn), mIds(r))
                else if (mIds(r) < nb0) nb0 = mIds(r)
                r += 1
              }
            }
            if (bi0 != Long.MinValue) (pid, bi0, Option(bc0))
            else (pid, nb0, Option.empty[Double])
          }
        }
      }
      .toDF("probe_id", "corpus_id", "cosine")
    // same partial-merge expression as bestRowPerProbe — inherits the
    // pinned NULL-cosine / tie-break semantics across subcells
    partials.groupBy("probe_id")
      .agg(max(struct(col("cosine"), (-col("corpus_id")).as("neg"))).as("b"))
      .select(col("probe_id").as("eval_id"), (-col("b.neg")).as("train_id"),
        col("b.cosine").as("cosine"))
  }

  /** Per-cell member counts under the shared [[ivfCentroids]] geometry —
    * spec support for asserting the cells path's re-split actually
    * engaged on a given corpus.
    */
  private[graft] def nearestTrainIvfCellsSplitProfile(
      tr: DataFrame): Seq[(Long, Long)] = {
    val s = tr.sparkSession
    import s.implicits._
    val cent = ivfCentroids(tr, tr.count())
    val centPs = VectorKernels.collectProbes(
      VectorKernels.probeFrame(cent, col("c_id"), col("cn"), col("ce")))
    VectorKernels.assignProbes(tr, centPs, "te", "tn", None, "cell")
      .groupBy("cell").agg(count(lit(1)).as("cnt"))
      .as[(Long, Long)].collect().toSeq
  }

  /** Query set: the first 10 vectors. */
  private def queriesSet(v: DataFrame): DataFrame =
    v.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("embedding").as("qe"),
        col("nrm").as("qn"))

  /** Integer-quantized per-key mean vectors, as (key, ce: array<double>,
    * cn: norm, n_members): micro-unit floor-quantize → BIGINT sums per
    * (key, pos) — exact and order-independent (the d17 trick) —
    * reassembled in pos order. One keyed shuffle, partial-agg friendly;
    * shared by d45 (Lloyd iteration-2 centroids), d52 (label-centroid
    * outliers), and d55 (drift). n_members rides along for free (every
    * pos of a key sees the same count), so consumers never re-scan the
    * corpus just to size the groups.
    */
  private[graft] def quantCentroids(df: DataFrame, keyName: String): DataFrame =
    df.select(col(keyName), posexplode(col("embedding")).as(Seq("pos", "vv")))
      .withColumn("q", floor(col("vv").cast("double") * 1000000).cast("long"))
      .groupBy(keyName, "pos")
      .agg(count(lit(1)).as("n"), sum("q").as("sq"))
      .withColumn("m", col("sq").cast("double") / (col("n") * 1000000))
      .groupBy(keyName)
      .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"),
        max("n").as("n_members"))
      .select(col(keyName), transform(col("pm"), x => x.getField("m")).as("ce"),
        col("n_members"))
      .withColumn("cn", sqrt(dotHof(col("ce"), col("ce"))))
      .select(col(keyName), col("ce"), col("cn"), col("n_members"))

  /** Exact top-k rows per query over a scored cross product, WITHOUT the
    * row_number window the naive form uses. The window is the vector
    * family's one non-scalable stage: it shuffles the entire corpus×query
    * score stream into #queries partitions (10-200 tasks sort everything,
    * idle cluster beyond that). Selection is local-first instead: each
    * input partition keeps a bounded per-query heap (global top-k ⊆ union
    * of per-partition top-k), so only partitions×queries×k rows ever
    * shuffle; the final exact ranking runs a window over that sliver.
    * The kernel COMPARES but never recomputes scores, so results are
    * bit-identical to the window form (same (ord DESC, tie ASC) total
    * order, NaN-greatest like Spark sorts; spec-pinned on every consumer).
    * `rank` (1..≤k per query) is appended as the last column.
    */
  /** NOTE (round 10, measured): re-expressing this kernel as a
    * `topk_structs` aggregation (groupBy(qCol) + the bounded-heap
    * TypedImperativeAggregate) was tried and REJECTED — sf10 solo
    * min-of-2: d05 0.63→1.01 s, d20 1.28→2.00 s, d43 0.83→1.94 s. Both
    * shapes prune identically (exchange carries partitions×queries×k
    * rows), so there is no fabric advantage to trade; the aggregate's
    * per-row `struct(...)` child evaluation allocates a full payload
    * struct per scored row and its interpreted ordering compare loses to
    * this kernel's primitive field reads. `topk_structs` earns its keep
    * where NO bounded pre-filter exists at all — the low-cardinality
    * stratum windows (d14/d15), where a row_number window would funnel
    * the corpus through one task per stratum.
    */
  private[graft] def topKPerQuery(scored: DataFrame, k: Int, qCol: String,
      ordCol: String, tieCol: String): DataFrame = {
    val schema = scored.schema
    val qi = schema.fieldIndex(qCol)
    val oi = schema.fieldIndex(ordCol)
    val ti = schema.fieldIndex(tieCol)
    // (ord DESC, tie ASC) — comparison replicates Spark's
    // nanSafeCompareDoubles (NaN greatest, -0.0 == +0.0 so the tie column
    // decides), matching how Spark orders doubles in the window this
    // replaces; java.lang.Double.compare would rank +0.0 above -0.0 and
    // let local pruning evict the row the final window ranks first
    val local = scored.mapPartitions { it =>
      // ord may be double (cosine) or integral (d43's int8 dot ≤ 2^20):
      // the long→double widening is exact far beyond those magnitudes,
      // so one double comparison path serves both
      def ordOf(r: org.apache.spark.sql.Row): Double = r.get(oi) match {
        case d: java.lang.Double => d.doubleValue
        case f: java.lang.Float => f.doubleValue
        case l: java.lang.Long => l.doubleValue
        case i: java.lang.Integer => i.doubleValue
        case x => throw new IllegalArgumentException(s"unordered $ordCol: $x")
      }
      def nanSafeCmp(a: Double, b: Double): Int = {
        val an = java.lang.Double.isNaN(a)
        val bn = java.lang.Double.isNaN(b)
        if ((an && bn) || a == b) 0
        else if (an) 1
        else if (bn) -1
        else if (a > b) 1 else -1
      }
      def better(ao: Double, at: Long, bo: Double, bt: Long): Boolean = {
        val c = nanSafeCmp(ao, bo)
        c > 0 || (c == 0 && at < bt)
      }
      val best = scala.collection.mutable.LongMap[Array[org.apache.spark.sql.Row]]()
      val sizes = scala.collection.mutable.LongMap[Int]()
      it.foreach { r =>
        val q = r.get(qi) match {
          case l: java.lang.Long => l.longValue
          case i: java.lang.Integer => i.longValue
          case x => throw new IllegalArgumentException(s"non-integral $qCol: $x")
        }
        val arr = best.getOrElseUpdate(q, new Array[org.apache.spark.sql.Row](k))
        var n = sizes.getOrElse(q, 0)
        if (n < k) { arr(n) = r; n += 1; sizes(q) = n }
        else {
          // replace the worst retained row if beaten (k is 1-3: linear
          // scan beats heap bookkeeping)
          var wi = 0
          var j = 1
          while (j < k) {
            if (better(ordOf(arr(wi)), arr(wi).getLong(ti),
                ordOf(arr(j)), arr(j).getLong(ti))) wi = j
            j += 1
          }
          if (better(ordOf(r), r.getLong(ti), ordOf(arr(wi)), arr(wi).getLong(ti)))
            arr(wi) = r
        }
      }
      best.iterator.flatMap { case (q, arr) => arr.iterator.take(sizes(q)) }
    }(org.apache.spark.sql.Encoders.row(schema))
    val w = Window.partitionBy(qCol).orderBy(col(ordCol).desc, col(tieCol))
    local.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // D3a — brute-force top-3 cosine neighbors for each of 10 query
    // vectors. One corpus scan against the broadcast query set; selection
    // via [[topKPerQuery]] (per-partition heaps), NOT a row_number window
    // — the window would shuffle the whole scored stream into #queries
    // tasks.
    "d05_knn_bruteforce" -> { (s, dir) =>
      val v = vecs(s, dir)
      val q = queriesSet(v)
      val scored = v.crossJoin(broadcast(q))
        .filter(col("vec_id") =!= col("q_id"))
        .withColumn("cosine",
          cosineWithNorms(dot(col("embedding"), col("qe")), col("nrm"), col("qn")))
        .select("q_id", "vec_id", "cosine")
      topKPerQuery(scored, 3, "q_id", "cosine", "vec_id")
        .select("q_id", "rank", "vec_id", "cosine")
        .orderBy("q_id", "rank")
    },
    // D3b — IVF-style ANN: deterministic centroids, assign every vector to
    // its nearest centroid, then search only the query's cell. The
    // centroid modulus scales as ~√n (200·⌈√(n/2000)⌉, identical at the
    // oracle SFs where it stays 200) so centroid COUNT is ~√n — a linear
    // modulus made assignment cost n²/200, measured super-linear at sf10.
    // Assignment argmax is the d45 max(struct) shape (map-side partial
    // agg), not a window. At scale the cell assignment is the partition
    // key.
    "d06_knn_ivf" -> { (s, dir) =>
      val v = vecs(s, dir)
      val n = v.count()
      val mod = 200L * math.max(1L,
        math.ceil(math.sqrt(n / 2000.0)).toLong)
      val cent = v.filter(col("vec_id") % mod === 0)
        .select(col("vec_id").as("c_id"), col("embedding").as("ce"),
          col("nrm").as("cn"))
      // top-1 broadcast argmax kernel (pure map over the scan — the
      // crossJoin + max(struct) + first() regroup it replaces shuffled
      // the whole corpus and paid row-materialization per scored pair;
      // equality spec-pinned incl. tie and zero-norm rows)
      val centPs = VectorKernels.collectProbes(
        VectorKernels.probeFrame(cent, col("c_id"), col("cn"), col("ce")))
      val assigned = VectorKernels.assignProbes(
        v.select("vec_id", "label", "embedding", "nrm"),
        centPs, "embedding", "nrm", None, "cell")
      val q = assigned.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("embedding").as("qe"),
          col("nrm").as("qn"), col("cell"))
      val scored = assigned.join(broadcast(q), "cell")
        .filter(col("vec_id") =!= col("q_id"))
        .withColumn("cosine",
          cosineWithNorms(dot(col("embedding"), col("qe")), col("nrm"), col("qn")))
        .select("q_id", "cell", "vec_id", "cosine")
      topKPerQuery(scored, 3, "q_id", "cosine", "vec_id")
        .select("q_id", "cell", "rank", "vec_id", "cosine")
        .orderBy("q_id", "rank")
    },
    // D3d — LSH-bucketed ANN (the other scale path next to IVF d06):
    // 8 random hyperplanes → 8-bit sign signature → candidates share a
    // bucket → exact cosine re-rank within the bucket. Hyperplane weights
    // derive from md5 (computed identically here and in the DuckDB
    // oracle), and the signature dot products run through the codegen'd
    // float_dot against constant arrays — one corpus scan, zero shuffles
    // before the bucket join.
    "d20_knn_lsh" -> { (s, dir) =>
      graft.functions.FloatDotProduct.register(s)
      val B = 8
      val hps = (0 until B).map(i => List.tabulate(64)(j => hpWeight(i, j)))
      val v = vecs(s, dir)
      val sig = (0 until B).map { i =>
        when(dot(col("embedding"), typedLit(hps(i))) >= 0.0, 1 << i).otherwise(0)
      }.reduce(_ + _)
      val withSig = v.withColumn("sig", sig)
      val q = withSig.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("embedding").as("qe"),
          col("nrm").as("qn"), col("sig"))
      val scored = withSig.join(broadcast(q), "sig")
        .filter(col("vec_id") =!= col("q_id"))
        .withColumn("cosine",
          cosineWithNorms(dot(col("embedding"), col("qe")), col("nrm"), col("qn")))
        .select("q_id", "sig", "vec_id", "cosine")
      topKPerQuery(scored, 3, "q_id", "cosine", "vec_id")
        .select("q_id", "sig", "rank", "vec_id", "cosine")
        .orderBy("q_id", "rank")
    },
    // D3c — per-label embedding centroids (class prototypes): distributed
    // vector mean via posexplode → groupBy(label, pos). Components are
    // quantized to integer micro-units (floor(v·1e6)) before summing so the
    // aggregate is exact and order-independent — a float/double sum would
    // depend on partition order and could never hash-match a single-threaded
    // oracle. At scale: one shuffle keyed by (label, pos), perfectly
    // partial-aggregatable.
    "d17_label_centroid" -> { (s, dir) =>
      t(s, dir, "embeddings")
        .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
        .withColumn("q", floor(col("v").cast("double") * 1000000).cast("long"))
        .groupBy("label", "pos")
        .agg(count(lit(1)).as("n_vecs"), sum("q").as("centroid_q"))
        .withColumn("centroid",
          col("centroid_q").cast("double") / (col("n_vecs") * 1000000))
        .orderBy("label", "pos")
    },
    // D5b — multimodal frame sampling: every 4th frame of each "video"
    // blob becomes its own row (sequence + explode — the row-explosion
    // shape a real frame extractor feeds into a decode UDF). Frame
    // fingerprints are a deterministic stand-in for decoded frame content
    // (no codecs in this container); the partition-parallel explode and
    // per-frame row schema are the real plumbing.
    "d18_frame_sample" -> { (s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("blob"))
        .withColumn("n_bytes", length(col("blob")))
        .withColumn("n_frames", expr("int(n_bytes div 100) + 1"))
        .withColumn("frame_idx",
          explode(sequence(lit(0), col("n_frames") - 1, lit(4))))
        .withColumn("frame_fp",
          md5(concat(col("doc_id").cast("string"), lit(":"),
            col("frame_idx").cast("string"))))
        .select("doc_id", "n_frames", "frame_idx", "frame_fp")
        .orderBy("doc_id", "frame_idx")
    },
    // D5c — multimodal resize planning: aspect-preserving downscale to a
    // 256px max dimension. The geometry math is the real operator (what a
    // resize UDF applies per image); the dimensions come from the d11 stub
    // decode since no codecs exist in this container. Pure codegen'd
    // column arithmetic — at scale this runs inside the decode scan with
    // zero extra passes.
    "d23_resize_plan" -> { (s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"), octet_length(col("text")).as("n"))
        .withColumn("orig_w", (lit(100) + col("n") % 540).cast("int"))
        .withColumn("orig_h", (lit(100) + (col("n") * 7) % 380).cast("int"))
        .withColumn("scale",
          least(lit(1.0), lit(256.0) / greatest(col("orig_w"), col("orig_h"))))
        .withColumn("new_w", floor(col("orig_w") * col("scale")).cast("int"))
        .withColumn("new_h", floor(col("orig_h") * col("scale")).cast("int"))
        .select("doc_id", "orig_w", "orig_h", "scale", "new_w", "new_h")
        .orderBy("doc_id")
    },
    // D5 — multimodal column plumbing: text → binary blob → typed
    // mapPartitions "decode" batch → metadata row. The decode body is a
    // deterministic STUB (no codecs in this container); schema, encoder,
    // and partition-wise batch shape are the real thing.
    "d11_multimodal_decode" -> { (s, dir) =>
      import s.implicits._
      val blobs = t(s, dir, "documents")
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("blob"))
        .as[(Long, Array[Byte])]
      blobs.mapPartitions { it =>
        it.map { case (id, blob) =>
          // STUB decode: a real pipeline calls the image/audio codec here.
          val n = blob.length
          (id, n, 100 + n % 540, 100 + (n * 7) % 380, n / 100 + 1)
        }
      }.toDF("doc_id", "n_bytes", "width", "height", "n_frames")
        .orderBy("doc_id")
    },
    // D3d — SEMANTIC decontamination: for every held-out eval vector
    // (label 0 as the stand-in eval set), its nearest training vector
    // (all other labels) by cosine, flagged when similarity crosses the
    // dup threshold — the embedding-space counterpart of d27's n-gram
    // decontamination. The path is picked by the MEASURED eval-set size:
    // eval sets are benchmark-sized, so the normal plan broadcasts them
    // and streams the training corpus once; past the broadcast threshold
    // the fragment-replicate join takes over ([[nearestTrainReplicated]]
    // — exact, no cartesian, spec-pinned in Round5OpsSpec). Both paths
    // argmax with max(struct(cosine, -train_id)) — PARTIAL aggregation
    // collapses each task's pairs to |eval| rows map-side, so nothing
    // corpus-sized is ever shuffled.
    "d32_semantic_decontamination" -> { (s, dir) =>
      val (tr, ev) = d32Inputs(s, dir)
      // ~(dims × 4 B float + array/row overhead) per eval vector — dims
      // MEASURED from the data (a hardcoded width would under-estimate
      // high-dimensional embeddings 10x and defeat the OOM guard); one
      // tiny agg over the eval side
      val est = ev.agg(count(lit(1)).as("n"),
        coalesce(max(size(col("qe"))), lit(0)).as("dims")).head()
      val evalN = est.getLong(0)
      val estBytes = evalN * (est.getInt(1).toLong * 4 + 256)
      val trainN = tr.count()
      // three-way measured switch: broadcast → fragment-replicate (both
      // EXACT) → IVF index once the exact pair count blows the budget
      // (the workload-quadratic regime: eval grows with the corpus).
      // Exactness at oracle SFs is structural — their pair counts sit
      // far below ExactPairBudget. Division, not multiplication: evalN ×
      // trainN overflows Long exactly at the scales the escape hatch
      // exists for, and a wrapped-negative product would route the
      // quadratic path.
      val withinBudget =
        trainN == 0 || evalN <= ExactPairBudget / math.max(trainN, 1L)
      if (withinBudget) {
        // kernel while the eval probe set fits a broadcast (the common
        // case by construction: within-budget eval sets are benchmark-
        // sized); the replicated join is the shuffle-based fallback
        val pick =
          if (estBytes <= VectorKernels.MaxProbeBytes)
            nearestTrainKernel(tr, ev)
          else nearestTrainReplicated(tr, ev)
        pick
          .withColumn("is_semantic_dup", col("cosine") >= 0.6)
          // audit columns exist in every branch (stable schema); there is
          // nothing to audit on an exact path
          .withColumn("recall_audited", lit(false))
          .withColumn("audit_ok", lit(null).cast("boolean"))
          .orderBy("eval_id")
      } else {
        // d43-style recall audit riding along: a deterministic ~1/128
        // eval sample is re-answered EXACTLY (tiny fragment-replicate)
        // and compared — audit_ok=false rows quantify recall loss in the
        // output itself instead of leaving the approximation silent
        val ann = nearestTrainIvf(tr, ev, knownTrainN = Some(trainN),
          knownEvalN = Some(evalN))
        val sampleEv = ev.filter(pmod(col("eval_id"), lit(128L)) === 0)
        // ~evalN/128 probe vectors: always inside the kernel guard when
        // the full eval set was (estBytes is the FULL-set estimate)
        val exact =
          (if (estBytes / 128 <= VectorKernels.MaxProbeBytes)
            nearestTrainKernel(tr, sampleEv)
          else nearestTrainReplicated(tr, sampleEv))
          .select(col("eval_id"), col("train_id").as("x_id"),
            col("cosine").as("x_cos"))
        ann.join(exact, Seq("eval_id"), "left")
          .withColumn("recall_audited", col("x_cos").isNotNull)
          .withColumn("audit_ok", when(col("x_cos").isNotNull,
            col("train_id") === col("x_id") ||
              col("cosine") >= col("x_cos") - lit(1e-12)))
          .drop("x_id", "x_cos")
          .withColumn("is_semantic_dup", col("cosine") >= 0.6)
          .select("eval_id", "train_id", "cosine", "is_semantic_dup",
            "recall_audited", "audit_ok")
          .orderBy("eval_id")
      }
    },
    // D3f — QUANTIZED ANN (int8 symmetric) + recall audit: per-vector scale
    // 127/max|component|, components rounded half-up to int8 range, top-3
    // by INTEGER dot product, each hit flagged against the exact-cosine
    // top-3 (the d05 baseline). This is the memory path at 100 TB — int8
    // vectors are 4x smaller than float32, the integer dot is exact (no
    // accumulation-order concern at any parallelism: |q|,|v| ≤ 127, 64
    // dims → |dot| ≤ 127²·64 < 2^20, sums in BIGINT), and the recall
    // column is the quality gate for switching search to the quantized
    // representation. Same broadcast-queries/one-corpus-scan shape as d05.
    "d43_quantized_knn" -> { (s, dir) =>
      val v = vecs(s, dir)
      // per-vector symmetric int8 quantization (double math is IEEE-exact
      // and identical in the oracle; zero vectors quantize to all-zero).
      // Codes are stored as FLOAT: every int8 value is exact in float, so
      // the codegen'd float_dot (double accumulation of integer products
      // ≤ 127² × dims ≈ 2^20 ≪ 2^53 — exact) replaces the interpreted
      // zip_with/aggregate HOF and the BIGINT cast recovers the oracle's
      // integer dot bit-for-bit. Quantization itself runs through the
      // codegen'd int8_quantize expression — the composed
      // array_max(transform)/transform(floor) HOFs are interpreted and
      // were 27 s of d43's 28 s at sf30 (equality spec-pinned incl.
      // NaN/null/empty edges).
      graft.functions.Int8Quantize.register(s)
      val qv = v
        .withColumn("qe", call_function("int8_quantize", col("embedding")))
        .select("vec_id", "qe")
      val q = qv.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("qe").as("qq"))
      // exact-cosine top-3 (the d05 ranking) as the recall reference
      val exScored = v.crossJoin(broadcast(queriesSet(v)))
        .filter(col("vec_id") =!= col("q_id"))
        .withColumn("cosine",
          cosineWithNorms(dot(col("embedding"), col("qe")), col("nrm"), col("qn")))
        .select("q_id", "vec_id", "cosine")
      val exact = topKPerQuery(exScored, 3, "q_id", "cosine", "vec_id")
        .select(col("q_id"), col("vec_id"), lit(true).as("in_exact_top3"))
      val qScored = qv.crossJoin(broadcast(q))
        .filter(col("vec_id") =!= col("q_id"))
        .withColumn("qdot", dot(col("qe"), col("qq")).cast("long"))
        .select("q_id", "vec_id", "qdot")
      topKPerQuery(qScored, 3, "q_id", "qdot", "vec_id")
        .join(exact, Seq("q_id", "vec_id"), "left")
        .select(col("q_id"), col("rank"), col("vec_id"), col("qdot"),
          coalesce(col("in_exact_top3"), lit(false)).as("in_exact_top3"))
        .orderBy("q_id", "rank")
    },
    // D3e — contrastive pair mining: for each anchor, the HARDEST NEGATIVE
    // (most-similar vector with a different label) and HARDEST POSITIVE
    // (least-similar vector with the same label). Same 100 TB shape as
    // d32: broadcast the anchor set, stream the corpus once, and collapse
    // the cross product map-side with conditional struct-extrema partial
    // aggregation — nothing corpus-sized is shuffled. max(struct(cos,
    // -id)) = (cosine DESC, id ASC); min(struct(cos, id)) = (cosine ASC,
    // id ASC); the whens null out the other-label rows and max/min skip
    // nulls, so one aggregate pass computes both extremes.
    "d35_hard_negatives" -> { (s, dir) =>
      val v = vecs(s, dir)
      val anch = v.filter(col("vec_id") < 50)
        .select(col("vec_id").as("a_id"), col("label").as("a_label"),
          col("embedding").as("ae"), col("nrm").as("an"))
      v.crossJoin(broadcast(anch))
        .filter(col("vec_id") =!= col("a_id"))
        .withColumn("cosine",
          cosineWithNorms(dot(col("embedding"), col("ae")), col("nrm"), col("an")))
        .groupBy("a_id")
        .agg(
          max(when(col("label") =!= col("a_label"),
            struct(col("cosine"), (-col("vec_id")).as("nid")))).as("hn"),
          min(when(col("label") === col("a_label"),
            struct(col("cosine"), col("vec_id").as("pid")))).as("hp"))
        .select(col("a_id"),
          (-col("hn.nid")).as("neg_id"), col("hn.cosine").as("neg_cos"),
          col("hp.pid").as("pos_id"), col("hp.cosine").as("pos_cos"))
        .orderBy("a_id")
    },
    // D3g — deterministic k-means (2 Lloyd iterations, k=8, seeds = the
    // first 8 vectors): the corpus-clustering primitive behind domain
    // discovery / semantic sharding of a training set. Exact and
    // order-independent end to end: assignment is max-cosine (ties →
    // lowest seed id) and the recomputed centroid is an integer-quantized
    // component mean (micro-units, the d17 trick), so a partition-parallel
    // run and the single-threaded oracle build bit-identical iteration-2
    // centroids. Scale shape per iteration: one broadcast of k centroid
    // rows against a single corpus scan + one (cluster, pos) hash agg —
    // nothing corpus-sized shuffles unkeyed, and iterations are a fixed
    // constant (more Lloyd rounds = more of the same jobs, not more state).
    "d45_kmeans" -> { (s, dir) =>
      val v = vecs(s, dir)
      val init = v.filter(col("vec_id") < 8)
        .select(col("vec_id").as("c_id"), col("embedding").as("ce"),
          col("nrm").as("cn"))
      // assignment argmax is max(struct(cos, -c_id)) — (cosine DESC, c_id
      // ASC), the same pick a row_number window makes, but PARTIAL
      // aggregation collapses the k candidate rows per vector map-side
      // before the shuffle and nothing gets sorted (the d32/d35 shape);
      // embedding rides along via first(), constant within a vec_id group
      val a1 = v.crossJoin(broadcast(init))
        .withColumn("cos",
          cosineWithNorms(dot(col("embedding"), col("ce")), col("nrm"), col("cn")))
        .groupBy("vec_id")
        .agg(max(struct(col("cos"), (-col("c_id")).as("nc"))).as("best"),
          first("embedding").as("embedding"))
        .select(col("vec_id"), col("embedding"), (-col("best.nc")).as("c1"))
      val cent2 = quantCentroids(a1.select(col("c1"), col("embedding")), "c1")
        .select(col("c1").as("c_id2"), col("ce").as("ce2"),
          col("cn").as("cn2"))
      v.crossJoin(broadcast(cent2))
        .withColumn("cos2",
          cosineWithNorms(dotHof(col("embedding"), col("ce2")),
            col("nrm"), col("cn2")))
        .groupBy("vec_id")
        .agg(max(struct(col("cos2"), (-col("c_id2")).as("nc"))).as("best"),
          first(floor(element_at(col("embedding"), 1).cast("double") * 1000000)
            .cast("long")).as("c0q"))
        .groupBy((-col("best.nc")).as("cluster"))
        .agg(count(lit(1)).as("n_vecs"), min("vec_id").as("min_vec"),
          sum("c0q").as("comp0_q"))
        .orderBy("cluster")
    },
    // D3h — label-centroid OUTLIERS: the 3 vectors least similar to their
    // own label's mean — the mislabeled/noise-candidate report a curation
    // run reviews before training. Centroids are the exact quantized
    // means (shared helper with d45); scoring is one corpus scan against
    // the |labels|-row centroid table; per-label top-k is a keyed window.
    "d52_label_outliers" -> { (s, dir) =>
      val v = vecs(s, dir)
      val cent = quantCentroids(v.select(col("label"), col("embedding")),
        "label")
      // bottom-3 per label via `topk_structs`, not a row_number window:
      // labels are LOW-cardinality, so the window funnels the whole
      // corpus through one sort task per label (the d14/d15 hazard —
      // at 10⁹ vectors that is 10 tasks sorting 10⁸ rows each); the
      // aggregate's k-slot heaps combine map-side on every core. Rank
      // order (cosine ASC, vec_id ASC) is already the struct's natural
      // ascending order — no negation, so NaN/null cosines land exactly
      // where the window's ASC ordering puts them (equality spec-pinned).
      // MEASURED local cost of the scale-correct shape: 1.32 vs 1.07 s
      // solo sf10 min-of-2 — at fixture group sizes (~22k rows/label)
      // the codegen'd primitive-key window sort is still cheap, and the
      // aggregate pays interpreted compares; the window's cost grows
      // with the biggest label's size, the aggregate's with cores.
      v.join(broadcast(cent), "label")
        .withColumn("cosine",
          cosineWithNorms(dotHof(col("embedding"), col("ce")),
            col("nrm"), col("cn")))
        .groupBy("label")
        .agg(call_function("topk_structs",
          struct(col("cosine"), col("vec_id")), lit(3)).as("top"))
        .select(col("label"), posexplode(col("top")))
        .select(col("label"), (col("pos") + 1).cast("int").as("rnk"),
          col("col.vec_id").as("vec_id"), col("col.cosine").as("cosine"))
        .orderBy("label", "rnk")
    },
    // D3i — embedding DRIFT by ingest decile: cosine of each decile's
    // centroid against the global centroid — the dataset-shift monitor a
    // pipeline runs as a corpus grows ("are the newest vectors still the
    // same distribution?"). Deciles are id-range buckets (d50's trick, no
    // global row_number); both centroid levels are exact quantized means
    // (quantCentroids), so the drift scores are bit-reproducible. Two
    // keyed aggs over one corpus scan lineage + an 11-row join.
    "d55_embedding_drift" -> { (s, dir) =>
      val v = vecs(s, dir)
      val vb = Q.withDecileBucket(v, "vec_id")
      // bucket sizes ride out of quantCentroids (n_members) — no second
      // corpus aggregation just to count the groups
      val bCent = quantCentroids(vb.select(col("bucket"), col("embedding")),
        "bucket")
      val gCent = quantCentroids(
        v.select(lit(0).as("g"), col("embedding")), "g")
        .select(col("ce").as("gce"), col("cn").as("gcn"))
      bCent.crossJoin(broadcast(gCent))
        .withColumn("cos_to_global",
          cosineWithNorms(dotHof(col("ce"), col("gce")),
            col("cn"), col("gcn")))
        .select(col("bucket"), col("n_members").as("n_vecs"),
          col("cos_to_global"))
        .orderBy("bucket")
    },
    // D3j — 1-NN leave-one-out ACCURACY: classify each probe vector by
    // its nearest other vector's label and score per-label accuracy —
    // the standard embedding-quality audit ("do neighborhoods respect
    // labels?"). Probes are a broadcast sample (the evaluation practice
    // at scale); the corpus is scanned once; at 100 TB the d06 IVF /
    // d20 LSH index replaces the brute-force scan, same probe protocol.
    "d57_knn_accuracy" -> { (s, dir) =>
      val v = vecs(s, dir)
      // broadcast argmax kernel with leave-one-out self-exclusion (the
      // crossJoin + topKPerQuery pass it replaces paid
      // row-materialization per scored pair); the winner's label attaches
      // with one narrow broadcast lookup against the ~|probes|-row result
      val ps = VectorKernels.collectProbes(VectorKernels.probeFrame(
        v.filter(col("vec_id") < 200), col("vec_id"), col("nrm"),
        col("embedding")))
      val best = VectorKernels.bestRowPerProbe(s,
        v.select(lit(0L).as("gkey"), col("vec_id").as("id"),
          col("nrm").as("nrm"), col("embedding").as("vec")),
        ps, excludeSelf = true)
      val plbl = v.filter(col("vec_id") < 200)
        .select(col("vec_id").as("probe_id"), col("label").as("p_label"))
      v.select(col("vec_id").as("corpus_id"), col("label"))
        .join(broadcast(best), "corpus_id")
        .join(broadcast(plbl), "probe_id")
        .groupBy("p_label")
        .agg(count(lit(1)).as("n_probes"),
          sum(when(col("label") === col("p_label"), 1L).otherwise(0L))
            .as("n_correct"))
        .withColumn("accuracy",
          col("n_correct").cast("double") / col("n_probes"))
        .orderBy("p_label")
    },
    // D3k — ROBUST scaling statistics (median + MAD) per label for an
    // embedding component: the outlier-insensitive normalization a
    // feature pipeline prefers over mean/stddev when the data has heavy
    // tails. Entirely in the integer micro-unit domain (quantize →
    // percentile_DISC → integer deviations → percentile_DISC), so every
    // value is an actual data point and no float formula crosses engines.
    "d59_robust_scaling" -> { (s, dir) =>
      t(s, dir, "embeddings").createOrReplaceTempView("graft_emb_d59")
      s.sql(
        """WITH q AS (
          |  SELECT label,
          |         CAST(floor(CAST(embedding[0] AS DOUBLE) * 1000000)
          |              AS BIGINT) AS c0
          |  FROM graft_emb_d59),
          |med AS (
          |  SELECT label,
          |         CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY c0)
          |              AS BIGINT) AS median_q
          |  FROM q GROUP BY label),
          |dev AS (
          |  SELECT q.label, median_q, abs(c0 - median_q) AS ad
          |  FROM q JOIN med ON q.label = med.label)
          |SELECT label, COUNT(*) AS n_vecs, MAX(median_q) AS median_q,
          |       CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY ad)
          |            AS BIGINT) AS mad_q
          |FROM dev GROUP BY label ORDER BY label""".stripMargin)
    },
    // D5e — multimodal COVERAGE audit: which documents have an embedding
    // at all (vec_id aligns with doc_id by fixture construction — at
    // larger SF only a prefix is embedded, the realistic "embedding job
    // lags ingestion" state). The completeness report a pipeline checks
    // before semantic dedup/search is allowed to gate anything. One left
    // semi-ish join + per-source rollup, no data movement beyond keys.
    "d61_vector_coverage" -> { (s, dir) =>
      val vecIds = t(s, dir, "embeddings")
        .select(col("vec_id").as("doc_id"))
        .withColumn("has_vec", lit(1L))
      t(s, dir, "documents").select("doc_id", "source")
        .join(vecIds, Seq("doc_id"), "left")
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(coalesce(col("has_vec"), lit(0L))).as("n_with_vec"))
        .withColumn("coverage",
          col("n_with_vec").cast("double") / col("n_docs"))
        .orderBy("source")
    },
    // D3l — label BALANCE report: class-imbalance summary (count spread +
    // max/min ratio) — the one-row check before anyone trusts per-label
    // metrics or trains on the labels. Two tiny keyed aggs.
    "d62_label_balance" -> { (s, dir) =>
      t(s, dir, "embeddings")
        .groupBy("label").agg(count(lit(1)).as("n"))
        .agg(count(lit(1)).as("n_labels"),
          min("n").as("min_count"), max("n").as("max_count"),
          sum("n").as("n_vecs"))
        .withColumn("imbalance",
          col("max_count").cast("double") / col("min_count"))
        .select("n_labels", "n_vecs", "min_count", "max_count", "imbalance")
    }
  )

  val oracle: Map[String, String] = Map(
    "d05_knn_bruteforce" ->
      s"""WITH v AS (
         |  SELECT vec_id, embedding, ${oNorm("embedding")} AS nrm FROM embeddings),
         |q AS (SELECT vec_id q_id, embedding qe, nrm qn FROM v WHERE vec_id < 10),
         |scored AS (
         |  SELECT q_id, vec_id,
         |         ${oDot("v.embedding", "q.qe")} / (v.nrm * q.qn) AS cosine,
         |         row_number() OVER (PARTITION BY q_id
         |           ORDER BY ${oDot("v.embedding", "q.qe")} / (v.nrm * q.qn) DESC,
         |                    vec_id) AS rank
         |  FROM v CROSS JOIN q WHERE vec_id != q_id)
         |SELECT q_id, rank, vec_id, cosine FROM scored
         |WHERE rank <= 3 ORDER BY q_id, rank""".stripMargin,
    "d06_knn_ivf" ->
      s"""WITH v AS (
         |  SELECT vec_id, label, embedding, ${oNorm("embedding")} AS nrm FROM embeddings),
         |cent AS (SELECT vec_id c_id, embedding ce, nrm cn FROM v
         |         WHERE vec_id % (SELECT 200 * GREATEST(CAST(ceil(sqrt(count(*) / 2000.0)) AS BIGINT), 1) FROM v) = 0),
         |assigned AS (
         |  SELECT vec_id, embedding, nrm, cell FROM (
         |    SELECT v.vec_id, v.embedding, v.nrm, cent.c_id AS cell,
         |           row_number() OVER (PARTITION BY v.vec_id
         |             ORDER BY ${oDot("v.embedding", "cent.ce")} / (v.nrm * cent.cn) DESC,
         |                      cent.c_id) AS rn
         |    FROM v CROSS JOIN cent) x WHERE rn = 1),
         |q AS (SELECT vec_id q_id, embedding qe, nrm qn, cell
         |      FROM assigned WHERE vec_id < 10),
         |scored AS (
         |  SELECT q.q_id, a.cell, a.vec_id,
         |         ${oDot("a.embedding", "q.qe")} / (a.nrm * q.qn) AS cosine,
         |         row_number() OVER (PARTITION BY q.q_id
         |           ORDER BY ${oDot("a.embedding", "q.qe")} / (a.nrm * q.qn) DESC,
         |                    a.vec_id) AS rank
         |  FROM assigned a JOIN q ON a.cell = q.cell WHERE a.vec_id != q.q_id)
         |SELECT q_id, cell, rank, vec_id, cosine FROM scored
         |WHERE rank <= 3 ORDER BY q_id, rank""".stripMargin,
    "d20_knn_lsh" ->
      s"""WITH hp AS (
         |  SELECT i, list(w ORDER BY j) AS w FROM (
         |    SELECT i, j,
         |      CAST((CAST(('0x'||substring(md5(i||':'||j),1,15)) AS BIGINT)
         |            / 576460752303423488.0) - 1.0 AS FLOAT) AS w
         |    FROM (SELECT unnest(range(8)) AS i) a,
         |         (SELECT unnest(range(64)) AS j) b) t
         |  GROUP BY i),
         |v AS (SELECT vec_id, embedding, ${oNorm("embedding")} AS nrm FROM embeddings),
         |sigb AS (
         |  SELECT v.vec_id,
         |         CAST(SUM(CASE WHEN ${oDot("v.embedding", "hp.w")} >= 0
         |                       THEN 1 << i ELSE 0 END) AS INT) AS sig
         |  FROM v CROSS JOIN hp GROUP BY v.vec_id),
         |q AS (
         |  SELECT s.vec_id AS q_id, v.embedding AS qe, v.nrm AS qn, s.sig
         |  FROM sigb s JOIN v ON s.vec_id = v.vec_id WHERE s.vec_id < 10),
         |scored AS (
         |  SELECT q.q_id, q.sig, a.vec_id,
         |         ${oDot("av.embedding", "q.qe")} / (av.nrm * q.qn) AS cosine,
         |         row_number() OVER (PARTITION BY q.q_id
         |           ORDER BY ${oDot("av.embedding", "q.qe")} / (av.nrm * q.qn) DESC,
         |                    a.vec_id) AS rank
         |  FROM sigb a JOIN v av ON a.vec_id = av.vec_id
         |  JOIN q ON a.sig = q.sig
         |  WHERE a.vec_id != q.q_id)
         |SELECT q_id, sig, rank, vec_id, cosine FROM scored
         |WHERE rank <= 3 ORDER BY q_id, rank""".stripMargin,
    "d17_label_centroid" ->
      """WITH ex AS (
        |  SELECT label,
        |         unnest(range(len(embedding))) AS pos,
        |         unnest(embedding) AS v
        |  FROM embeddings)
        |SELECT label, CAST(pos AS INT) AS pos, COUNT(*) AS n_vecs,
        |       CAST(SUM(CAST(floor(CAST(v AS DOUBLE) * 1000000) AS BIGINT)) AS BIGINT) AS centroid_q,
        |       CAST(SUM(CAST(floor(CAST(v AS DOUBLE) * 1000000) AS BIGINT)) AS DOUBLE)
        |         / (COUNT(*) * 1000000) AS centroid
        |FROM ex GROUP BY label, pos ORDER BY label, pos""".stripMargin,
    "d23_resize_plan" ->
      """WITH d AS (
        |  SELECT doc_id,
        |         CAST(100 + octet_length(encode(text)) % 540 AS INT) AS orig_w,
        |         CAST(100 + (octet_length(encode(text)) * 7) % 380 AS INT) AS orig_h
        |  FROM documents)
        |SELECT doc_id, orig_w, orig_h,
        |       least(CAST(1.0 AS DOUBLE), CAST(256.0 AS DOUBLE) / greatest(orig_w, orig_h)) AS scale,
        |       CAST(floor(orig_w * least(CAST(1.0 AS DOUBLE), CAST(256.0 AS DOUBLE) / greatest(orig_w, orig_h))) AS INT) AS new_w,
        |       CAST(floor(orig_h * least(CAST(1.0 AS DOUBLE), CAST(256.0 AS DOUBLE) / greatest(orig_w, orig_h))) AS INT) AS new_h
        |FROM d ORDER BY doc_id""".stripMargin,
    "d18_frame_sample" ->
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) // 100 + 1 AS INT) AS n_frames,
        |  CAST(unnest(range(0, octet_length(encode(text)) // 100 + 1, 4)) AS INT) AS frame_idx,
        |  md5(CAST(doc_id AS VARCHAR) || ':' ||
        |      CAST(unnest(range(0, octet_length(encode(text)) // 100 + 1, 4)) AS VARCHAR)) AS frame_fp
        |FROM documents ORDER BY doc_id, frame_idx""".stripMargin,
    "d11_multimodal_decode" ->
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS INT) AS n_bytes,
        |  CAST(100 + octet_length(encode(text)) % 540 AS INT) AS width,
        |  CAST(100 + (octet_length(encode(text)) * 7) % 380 AS INT) AS height,
        |  CAST(octet_length(encode(text)) // 100 + 1 AS INT) AS n_frames
        |FROM documents ORDER BY doc_id""".stripMargin,
    "d32_semantic_decontamination" ->
      s"""WITH v AS (
         |  SELECT vec_id, label, embedding, ${oNorm("embedding")} AS nrm
         |  FROM embeddings),
         |ev AS (SELECT vec_id AS eval_id, embedding AS qe, nrm AS qn
         |       FROM v WHERE label = 0),
         |tr AS (SELECT vec_id AS train_id, embedding AS te, nrm AS tn
         |       FROM v WHERE label != 0),
         |scored AS (
         |  SELECT eval_id, train_id,
         |         ${oDot("tr.te", "ev.qe")} / (tr.tn * ev.qn) AS cosine,
         |         row_number() OVER (PARTITION BY eval_id
         |           ORDER BY ${oDot("tr.te", "ev.qe")} / (tr.tn * ev.qn) DESC,
         |                    train_id) AS rn
         |  FROM tr CROSS JOIN ev)
         |SELECT eval_id, train_id, cosine, cosine >= 0.6 AS is_semantic_dup,
         |       FALSE AS recall_audited, CAST(NULL AS BOOLEAN) AS audit_ok
         |FROM scored WHERE rn = 1 ORDER BY eval_id""".stripMargin,
    "d43_quantized_knn" ->
      s"""WITH v AS (
         |  SELECT vec_id, embedding, ${oNorm("embedding")} AS nrm FROM embeddings),
         |sc AS (
         |  SELECT vec_id, embedding, nrm,
         |         CASE WHEN list_max(list_transform(embedding,
         |                x -> abs(CAST(x AS DOUBLE)))) > 0
         |              THEN 127.0 / list_max(list_transform(embedding,
         |                x -> abs(CAST(x AS DOUBLE))))
         |              ELSE 0.0 END AS scl
         |  FROM v),
         |qv AS (
         |  SELECT vec_id,
         |         list_transform(embedding,
         |           x -> CAST(floor(CAST(x AS DOUBLE) * scl + 0.5) AS BIGINT)) AS qe
         |  FROM sc),
         |q AS (SELECT vec_id AS q_id, qe AS qq FROM qv WHERE vec_id < 10),
         |fq AS (SELECT vec_id AS q_id, embedding AS fqe, nrm AS qn
         |       FROM v WHERE vec_id < 10),
         |exact AS (
         |  SELECT q_id, vec_id FROM (
         |    SELECT fq.q_id, v.vec_id,
         |           row_number() OVER (PARTITION BY fq.q_id
         |             ORDER BY ${oDot("v.embedding", "fq.fqe")} / (v.nrm * fq.qn) DESC,
         |                      v.vec_id) AS rank
         |    FROM v CROSS JOIN fq WHERE v.vec_id != fq.q_id) x
         |  WHERE rank <= 3),
         |quant AS (
         |  SELECT q.q_id, qv.vec_id,
         |         CAST(list_sum(list_transform(list_zip(qv.qe, q.qq),
         |           p -> p[1] * p[2])) AS BIGINT) AS qdot,
         |         row_number() OVER (PARTITION BY q.q_id
         |           ORDER BY CAST(list_sum(list_transform(list_zip(qv.qe, q.qq),
         |             p -> p[1] * p[2])) AS BIGINT) DESC,
         |                    qv.vec_id) AS rank
         |  FROM qv CROSS JOIN q WHERE qv.vec_id != q.q_id)
         |SELECT qu.q_id, qu.rank, qu.vec_id, qu.qdot,
         |       e.vec_id IS NOT NULL AS in_exact_top3
         |FROM quant qu
         |LEFT JOIN exact e ON qu.q_id = e.q_id AND qu.vec_id = e.vec_id
         |WHERE qu.rank <= 3 ORDER BY qu.q_id, qu.rank""".stripMargin,
    "d35_hard_negatives" ->
      s"""WITH v AS (
         |  SELECT vec_id, label, embedding, ${oNorm("embedding")} AS nrm
         |  FROM embeddings),
         |a AS (SELECT vec_id AS a_id, label AS a_label, embedding AS ae,
         |             nrm AS an
         |      FROM v WHERE vec_id < 50),
         |sc AS (
         |  SELECT a_id, a_label, v.vec_id, v.label,
         |         ${oDot("v.embedding", "a.ae")} / (v.nrm * a.an) AS cosine
         |  FROM v CROSS JOIN a WHERE v.vec_id != a.a_id),
         |neg AS (
         |  SELECT a_id, vec_id, cosine,
         |         row_number() OVER (PARTITION BY a_id
         |           ORDER BY cosine DESC, vec_id) AS rn
         |  FROM sc WHERE label != a_label),
         |pos AS (
         |  SELECT a_id, vec_id, cosine,
         |         row_number() OVER (PARTITION BY a_id
         |           ORDER BY cosine ASC, vec_id) AS rn
         |  FROM sc WHERE label = a_label)
         |SELECT b.a_id, n.vec_id AS neg_id, n.cosine AS neg_cos,
         |       p.vec_id AS pos_id, p.cosine AS pos_cos
         |FROM (SELECT DISTINCT a_id FROM sc) b
         |LEFT JOIN (SELECT * FROM neg WHERE rn = 1) n ON b.a_id = n.a_id
         |LEFT JOIN (SELECT * FROM pos WHERE rn = 1) p ON b.a_id = p.a_id
         |ORDER BY b.a_id""".stripMargin,
    "d45_kmeans" ->
      s"""WITH v AS (
         |  SELECT vec_id, embedding, ${oNorm("embedding")} AS nrm
         |  FROM embeddings),
         |init AS (SELECT vec_id AS c_id, embedding AS ce, nrm AS cn
         |         FROM v WHERE vec_id < 8),
         |a1 AS (
         |  SELECT vec_id, embedding, c1 FROM (
         |    SELECT v.vec_id, v.embedding, init.c_id AS c1,
         |           row_number() OVER (PARTITION BY v.vec_id
         |             ORDER BY ${oDot("v.embedding", "init.ce")}
         |                        / (v.nrm * init.cn) DESC,
         |                      init.c_id) AS rn
         |    FROM v CROSS JOIN init) x WHERE rn = 1),
         |ex AS (
         |  SELECT c1, unnest(range(len(embedding))) AS pos,
         |         unnest(embedding) AS val
         |  FROM a1),
         |m AS (
         |  SELECT c1, pos, COUNT(*) AS n,
         |         SUM(CAST(floor(CAST(val AS DOUBLE) * 1000000) AS BIGINT))
         |           AS sq
         |  FROM ex GROUP BY c1, pos),
         |cent2 AS (
         |  SELECT c1 AS c_id2,
         |         list(CAST(sq AS DOUBLE) / (n * 1000000) ORDER BY pos)
         |           AS ce2
         |  FROM m GROUP BY c1),
         |cent2n AS (SELECT c_id2, ce2, ${oNorm("ce2")} AS cn2 FROM cent2),
         |a2 AS (
         |  SELECT vec_id, embedding, c_id2 FROM (
         |    SELECT v.vec_id, v.embedding, c.c_id2,
         |           row_number() OVER (PARTITION BY v.vec_id
         |             ORDER BY ${oDot("v.embedding", "c.ce2")}
         |                        / (v.nrm * c.cn2) DESC,
         |                      c.c_id2) AS rn
         |    FROM v CROSS JOIN cent2n c) x WHERE rn = 1)
         |SELECT c_id2 AS cluster, COUNT(*) AS n_vecs, MIN(vec_id) AS min_vec,
         |       CAST(SUM(CAST(floor(CAST(embedding[1] AS DOUBLE) * 1000000)
         |                     AS BIGINT)) AS BIGINT) AS comp0_q
         |FROM a2 GROUP BY c_id2 ORDER BY cluster""".stripMargin,
    "d52_label_outliers" ->
      s"""WITH v AS (
         |  SELECT vec_id, label, embedding, ${oNorm("embedding")} AS nrm
         |  FROM embeddings),
         |ex AS (
         |  SELECT label, unnest(range(len(embedding))) AS pos,
         |         unnest(embedding) AS val
         |  FROM v),
         |m AS (
         |  SELECT label, pos, COUNT(*) AS n,
         |         SUM(CAST(floor(CAST(val AS DOUBLE) * 1000000) AS BIGINT))
         |           AS sq
         |  FROM ex GROUP BY label, pos),
         |cent AS (
         |  SELECT label,
         |         list(CAST(sq AS DOUBLE) / (n * 1000000) ORDER BY pos)
         |           AS ce
         |  FROM m GROUP BY label),
         |cn AS (SELECT label, ce, ${oNorm("ce")} AS cn FROM cent),
         |sc AS (
         |  SELECT v.label, v.vec_id,
         |         ${oDot("v.embedding", "c.ce")} / (v.nrm * c.cn) AS cosine,
         |         row_number() OVER (PARTITION BY v.label
         |           ORDER BY ${oDot("v.embedding", "c.ce")} / (v.nrm * c.cn)
         |                      ASC,
         |                    v.vec_id) AS rnk
         |  FROM v JOIN cn c ON v.label = c.label)
         |SELECT label, rnk, vec_id, cosine FROM sc
         |WHERE rnk <= 3 ORDER BY label, rnk""".stripMargin,
    "d55_embedding_drift" ->
      s"""WITH v AS (SELECT vec_id, embedding FROM embeddings),
         |mx AS (SELECT MAX(vec_id) AS mx FROM v),
         |vb AS (SELECT vec_id, embedding,
         |              (vec_id * 10) // (mx + 1) AS bucket
         |       FROM v CROSS JOIN mx),
         |bex AS (SELECT bucket, unnest(range(len(embedding))) AS pos,
         |               unnest(embedding) AS val
         |        FROM vb),
         |bm AS (SELECT bucket, pos, COUNT(*) AS n,
         |              SUM(CAST(floor(CAST(val AS DOUBLE) * 1000000)
         |                  AS BIGINT)) AS sq
         |       FROM bex GROUP BY bucket, pos),
         |bc AS (SELECT bucket,
         |              list(CAST(sq AS DOUBLE) / (n * 1000000)
         |                   ORDER BY pos) AS ce
         |       FROM bm GROUP BY bucket),
         |bcn AS (SELECT bucket, ce, ${oNorm("ce")} AS cn FROM bc),
         |gex AS (SELECT unnest(range(len(embedding))) AS pos,
         |               unnest(embedding) AS val
         |        FROM v),
         |gm AS (SELECT pos, COUNT(*) AS n,
         |              SUM(CAST(floor(CAST(val AS DOUBLE) * 1000000)
         |                  AS BIGINT)) AS sq
         |       FROM gex GROUP BY pos),
         |gc AS (SELECT list(CAST(sq AS DOUBLE) / (n * 1000000)
         |                   ORDER BY pos) AS gce
         |       FROM gm),
         |gcn AS (SELECT gce, ${oNorm("gce")} AS gcn FROM gc),
         |sizes AS (SELECT bucket, COUNT(*) AS n_vecs FROM vb
         |          GROUP BY bucket)
         |SELECT s.bucket, n_vecs,
         |       ${oDot("b.ce", "g.gce")} / (b.cn * g.gcn) AS cos_to_global
         |FROM sizes s JOIN bcn b ON s.bucket = b.bucket CROSS JOIN gcn g
         |ORDER BY s.bucket""".stripMargin,
    "d57_knn_accuracy" ->
      s"""WITH v AS (
         |  SELECT vec_id, label, embedding, ${oNorm("embedding")} AS nrm
         |  FROM embeddings),
         |p AS (SELECT vec_id AS p_id, label AS p_label, embedding AS pe,
         |             nrm AS pn
         |      FROM v WHERE vec_id < 200),
         |nn AS (
         |  SELECT p_id, p_label, label FROM (
         |    SELECT p.p_id, p.p_label, v.label,
         |           row_number() OVER (PARTITION BY p.p_id
         |             ORDER BY ${oDot("v.embedding", "p.pe")}
         |                        / (v.nrm * p.pn) DESC,
         |                      v.vec_id) AS rn
         |    FROM v CROSS JOIN p WHERE v.vec_id != p.p_id) x
         |  WHERE rn = 1)
         |SELECT p_label, COUNT(*) AS n_probes,
         |       CAST(SUM(CASE WHEN label = p_label THEN 1 ELSE 0 END)
         |            AS BIGINT) AS n_correct,
         |       CAST(SUM(CASE WHEN label = p_label THEN 1 ELSE 0 END)
         |            AS DOUBLE) / COUNT(*) AS accuracy
         |FROM nn GROUP BY p_label ORDER BY p_label""".stripMargin,
    "d59_robust_scaling" ->
      """WITH q AS (
        |  SELECT label,
        |         CAST(floor(CAST(embedding[1] AS DOUBLE) * 1000000)
        |              AS BIGINT) AS c0
        |  FROM embeddings),
        |med AS (
        |  SELECT label, CAST(quantile_disc(c0, 0.5) AS BIGINT) AS median_q
        |  FROM q GROUP BY label),
        |dev AS (
        |  SELECT q.label, median_q, abs(c0 - median_q) AS ad
        |  FROM q JOIN med ON q.label = med.label)
        |SELECT label, COUNT(*) AS n_vecs,
        |       CAST(MAX(median_q) AS BIGINT) AS median_q,
        |       CAST(quantile_disc(ad, 0.5) AS BIGINT) AS mad_q
        |FROM dev GROUP BY label ORDER BY label""".stripMargin,
    "d61_vector_coverage" ->
      """SELECT d.source, COUNT(*) AS n_docs,
        |       CAST(SUM(CASE WHEN e.vec_id IS NULL THEN 0 ELSE 1 END)
        |            AS BIGINT) AS n_with_vec,
        |       CAST(SUM(CASE WHEN e.vec_id IS NULL THEN 0 ELSE 1 END)
        |            AS DOUBLE) / COUNT(*) AS coverage
        |FROM documents d
        |LEFT JOIN embeddings e ON d.doc_id = e.vec_id
        |GROUP BY d.source ORDER BY d.source""".stripMargin,
    "d62_label_balance" ->
      """WITH c AS (SELECT label, COUNT(*) AS n FROM embeddings
        |           GROUP BY label)
        |SELECT COUNT(*) AS n_labels,
        |       CAST(SUM(n) AS BIGINT) AS n_vecs,
        |       MIN(n) AS min_count, MAX(n) AS max_count,
        |       CAST(MAX(n) AS DOUBLE) / MIN(n) AS imbalance
        |FROM c""".stripMargin
  )
}
