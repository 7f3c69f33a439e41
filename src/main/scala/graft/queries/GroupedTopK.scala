package graft.queries

import org.apache.spark.sql.{Dataset, Encoders}

/** Exact per-group k-th element selection by distributed histogram
  * refinement — the scale-out replacement for `ntile`/`percent_rank`-style
  * windows PARTITIONED BY A LOW-CARDINALITY KEY, where Spark's window
  * exchange hashes every row of a group onto ONE task and sorts it there
  * (7 calendar years over a 100 TB orders table = 7 tasks doing all the
  * work, however many executors exist). Selection needs no per-group
  * total sort: each pass histograms the surviving candidate band into
  * [[GroupedTopK.Buckets]] ranges with one map-side-combined scan (every
  * core participates), the driver keeps only the bucket containing the
  * k-th element, and the band shrinks ×Buckets per pass — a handful of
  * slim-projection scans replace the single-task sort, at any group size.
  *
  * The rank order is (ord DESC, key ASC) with `key` unique — the same
  * total order a `row_number`/`ntile` window with that ORDER BY uses.
  * Doubles are refined on their order-preserving long bits (sign-folded
  * IEEE-754), which makes every pass integral and exact: the band width
  * divides by Buckets each pass until the band is a single value; rows
  * tied on `ord` are then split on the unique integral `key` by the same
  * machinery. Bands start at the observed per-group data bounds (one
  * stats pass), so ≤ 5 passes cover any real span; typical bands converge
  * in 2-3.
  *
  * Domain requirements (all hold for money/count/id columns): `ord`
  * finite (NaN breaks the bits order — checked per row), group ids in
  * [0, 2^50) (checked), and the per-group spans of ord-bits and key each
  * fit a signed long (same-sign data always does; checked). -0.0 needs
  * no restriction: [[sortableBits]] canonicalizes it to +0.0, matching
  * Spark's sort order where -0.0 ties +0.0 and the key decides. `key`
  * uniqueness within a group is ASSUMED, not globally verified (that
  * would cost a shuffle); duplicate (ord, key) pairs inside the final
  * collected band — the only place they can corrupt the threshold —
  * are detected and fail loudly.
  */
object GroupedTopK {

  private val Buckets = 8192L

  /** A band whose surviving mass is at most this collects to the driver
    * and finishes with an exact local sort of the sliver.
    */
  private val CollectLimit = 65536L

  /** Order-preserving long image of a finite double: positives keep their
    * raw bits (already ascending), negatives flip magnitude bits so
    * larger doubles always map to larger signed longs. -0.0 is
    * canonicalized to +0.0 first — Spark's double ordering ties the two
    * zeros (nanSafeCompareDoubles), so they must share one bits image.
    */
  @inline def sortableBits(d: Double): Long = {
    val b = java.lang.Double.doubleToLongBits(d + 0.0)
    b ^ ((b >> 63) & 0x7fffffffffffffffL)
  }

  /** dim 0: refining on ord bits (descending = rank order); dim 1: ord is
    * pinned to `tieBits`, refining on key (ascending = rank order among
    * the tie). `need` is the 1-based rank still to locate inside [lo,hi];
    * `mass` is the band's candidate row count (MaxValue until measured).
    */
  private final case class Band(need: Long, dim: Int, lo: Long, hi: Long,
      tieBits: Long, mass: Long)

  /** Per-group scan summary: ord bounds as sign-folded bits, key bounds,
    * row count. Opaque to callers beyond `n`/`minOrd`/`maxOrd`; pass the
    * whole map back to [[kthLargest]] so the scan isn't repeated.
    */
  final case class Stats(private[GroupedTopK] val minB: Long,
      private[GroupedTopK] val maxB: Long,
      private[GroupedTopK] val minK: Long,
      private[GroupedTopK] val maxK: Long, n: Long) {
    def minOrd: Double = fromBits(minB)
    def maxOrd: Double = fromBits(maxB)
  }

  /** Per-group [[Stats]] in ONE parallel scan — partial per partition,
    * merged on the driver. Public because callers usually need `n` anyway
    * (q34's k = ⌈n/10⌉) and [[kthLargest]] takes the result as-is.
    */
  def groupStats(ds: Dataset[(Int, Double, Long)]): Map[Int, Stats] =
    statsPass(ds)

  // the sign-fold is an involution on longs, so decode = re-apply
  @inline private def fromBits(v: Long): Double =
    java.lang.Double.longBitsToDouble(v ^ ((v >> 63) & 0x7fffffffffffffffL))

  private def statsPass(ds: Dataset[(Int, Double, Long)]): Map[Int, Stats] = {
    val partials = ds.mapPartitions { it =>
      val m = scala.collection.mutable.Map[Int, Stats]()
      it.foreach { case (g, ord, key) =>
        require(java.lang.Double.isFinite(ord), s"non-finite ord in group $g")
        require(g >= 0 && g < (1L << 50), s"group id $g outside [0, 2^50)")
        val b = sortableBits(ord)
        val st = m.getOrElse(g, Stats(Long.MaxValue, Long.MinValue,
          Long.MaxValue, Long.MinValue, 0L))
        m(g) = Stats(math.min(st.minB, b), math.max(st.maxB, b),
          math.min(st.minK, key), math.max(st.maxK, key), st.n + 1)
      }
      m.iterator.map { case (g, st) =>
        ((g, st.minB, st.maxB), (st.minK, st.maxK, st.n)) }
    }(Encoders.tuple(
      Encoders.tuple(Encoders.scalaInt, Encoders.scalaLong, Encoders.scalaLong),
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaLong)))
      .collect()
    partials.groupBy(_._1._1).map { case (g, rows) =>
      g -> rows.map { case ((_, minB, maxB), (minK, maxK, n)) =>
          Stats(minB, maxB, minK, maxK, n) }
        .reduce((a, b) => Stats(math.min(a.minB, b.minB), math.max(a.maxB, b.maxB),
          math.min(a.minK, b.minK), math.max(a.maxK, b.maxK), a.n + b.n))
    }
  }

  /** The k-th largest (ord DESC, key ASC) element per group.
    *
    * @param ds  (group, ord, key) rows; key unique within its group
    * @param kBy per-group k (1-based, ≤ the group's row count)
    * @return    per group: the threshold pair (ord*, key*). The top-k row
    *            set is exactly { ord > ord* ∨ (ord = ord* ∧ key ≤ key*) }.
    */
  def kthLargest(ds: Dataset[(Int, Double, Long)],
      kBy: Map[Int, Long]): Map[Int, (Double, Long)] =
    kthLargest(ds, kBy, statsPass(ds))

  /** As above, with the [[groupStats]] result passed in — callers that
    * already ran the stats scan (q34's plan switch) must not pay it twice.
    */
  def kthLargest(ds: Dataset[(Int, Double, Long)], kBy: Map[Int, Long],
      stats: Map[Int, Stats]): Map[Int, (Double, Long)] = {
    val s = ds.sparkSession
    val done = scala.collection.mutable.Map[Int, (Double, Long)]()
    var bands: Map[Int, Band] = kBy.map { case (g, k) =>
      val st = stats.getOrElse(g,
        throw new IllegalArgumentException(s"group $g has no rows"))
      require(k >= 1 && k <= st.n, s"group $g: k=$k outside [1, ${st.n}]")
      require(st.maxB - st.minB >= 0 && st.maxK - st.minK >= 0,
        s"group $g: ord-bits/key span overflows a signed long")
      g -> Band(k, 0, st.minB, st.maxB, 0L, st.n)
    }

    var pass = 0
    while (bands.nonEmpty) {
      pass += 1
      require(pass <= 12, "kthLargest: failed to converge")

      val (finish, refine) = bands.partition(_._2.mass <= CollectLimit)
      if (finish.nonEmpty) {
        val bcf = s.sparkContext.broadcast(finish)
        val pairs = ds.filter { t: (Int, Double, Long) =>
          bcf.value.get(t._1).exists(b => inBand(b, t._2, t._3))
        }.collect().groupBy(_._1)
        for ((g, b) <- finish) {
          val cand = pairs.getOrElse(g, Array.empty)
          require(cand.length >= b.need,
            s"group $g: ${cand.length} band candidates < need ${b.need}")
          val sorted = cand.sortWith { (x, y) =>
            val bx = sortableBits(x._2); val by = sortableBits(y._2)
            if (bx != by) bx > by else x._3 < y._3
          }
          // duplicate (ord, key) pairs here would silently shift the
          // threshold — the one place key-uniqueness violations can
          // corrupt the result, so the one place we pay to check
          var di = 1
          while (di < sorted.length) {
            require(sortableBits(sorted(di)._2) != sortableBits(sorted(di - 1)._2) ||
              sorted(di)._3 != sorted(di - 1)._3,
              s"group $g: duplicate (ord, key) pair ${sorted(di)} in band — key not unique")
            di += 1
          }
          val (_, o, k) = sorted((b.need - 1).toInt)
          done(g) = (o, k)
        }
      }
      bands = refine
      if (bands.nonEmpty) {
        val bc = s.sparkContext.broadcast(bands)
        // one map-side-combined histogram over every live band's candidates
        val hist = ds.mapPartitions { it =>
          val bb = bc.value
          val m = new scala.collection.mutable.LongMap[Long]()
          it.foreach { case (g, ord, key) =>
            bb.get(g).foreach { b =>
              if (inBand(b, ord, key)) {
                val v = if (b.dim == 0) sortableBits(ord) else key
                // bucket index ascending in RANK order (dim 0: high ord
                // first; dim 1: low key first)
                val i = if (b.dim == 0) (b.hi - v) / width(b)
                        else (v - b.lo) / width(b)
                val gk = (g.toLong << 13) | i
                m(gk) = m.getOrElse(gk, 0L) + 1L
              }
            }
          }
          m.iterator
        }(Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong))
          .groupByKey(_._1)(Encoders.scalaLong)
          .mapValues(_._2)(Encoders.scalaLong)
          .reduceGroups(_ + _)
          .collect()
          .groupBy { case (gk, _) => (gk >>> 13).toInt }

        bands = bands.map { case (g, b) =>
          val counts = hist.getOrElse(g, Array.empty)
            .map { case (gk, c) => (gk & 8191L) -> c }.sortBy(_._1)
          var need = b.need
          var picked = -1L
          var mass = 0L
          val it = counts.iterator
          while (picked < 0 && it.hasNext) {
            val (i, c) = it.next()
            if (need <= c) { picked = i; mass = c } else need -= c
          }
          require(picked >= 0, s"group $g: histogram ran dry")
          val w = width(b)
          val nb =
            if (b.dim == 0) {
              val hi = b.hi - w * picked
              val lo = math.max(b.lo, hi - w + 1)
              if (lo == hi && mass > CollectLimit) {
                // a single ord value carries a tie class too big to
                // collect: split it on the unique key next pass
                val st = stats(g)
                Band(need, 1, st.minK, st.maxK, hi, mass)
              } else Band(need, 0, lo, hi, 0L, mass)
            } else {
              val lo = b.lo + w * picked
              val hi = math.min(b.hi, lo + w - 1)
              Band(need, 1, lo, hi, b.tieBits, mass)
            }
          g -> nb
        }
      }
    }
    done.toMap
  }

  /** span/Buckets rounded up — guarantees every in-band value lands in
    * bucket [0, Buckets) and the next band is strictly smaller.
    */
  @inline private def width(b: Band): Long = (b.hi - b.lo) / Buckets + 1

  @inline private def inBand(b: Band, ord: Double, key: Long): Boolean =
    if (b.dim == 0) {
      val v = sortableBits(ord); v >= b.lo && v <= b.hi
    } else sortableBits(ord) == b.tieBits && key >= b.lo && key <= b.hi
}
