package graft.algo

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import scala.collection.mutable

/** In-task graph kernels for stats-gated small inputs.
  *
  * The distributed loops in [[Algorithms]] pay ~2 Spark jobs per iteration
  * (eager checkpoint + action); on a graph that fits in ONE task that fixed
  * scheduling cost dominates the actual compute by 10-50x. Exactly like a
  * broadcast-join decision, the gate reads the optimizer's size estimate
  * (free — no job) and routes small inputs to a single `mapPartitions` task
  * running the classic array kernel ON AN EXECUTOR — nothing is collected
  * to the driver, and the result is a regular DataFrame. Large inputs keep
  * the shuffle-join formulation unchanged; the gate never counts a big
  * input (no extra pass over 100 TB — the size estimate alone rejects it).
  *
  * The reference runs ALL of these as single-node CSR kernels
  * (`crates/samyama-graph-algorithms/src`), so below the threshold
  * this is the same-shape execution with identical semantics, not a
  * capability downgrade; above it the distributed path is the only one
  * that exists.
  *
  * Every kernel here replicates its distributed twin's OBSERVABLE semantics
  * bit-for-bit on integer outputs (wcc/cdlp/bfs/mst/varlength) and to
  * summation-order ULPs on floating outputs (pagerank/sssp — absorbed by
  * the catalog's 4-6 decimal rounding, same slack the DuckDB oracles rely
  * on). Differential specs in LocalKernelsSpec enforce this against the
  * distributed implementations on random graphs.
  */
object LocalKernels {

  /** Route to the in-task kernel? Three tiers:
    * below `localSizeBytes` (default 64 MB) by plan estimate → local with
    * zero extra work (the estimate is conservative: without CBO a Filter
    * reports its child's full size). In the gray zone up to
    * `localCountBytes` (default 2 GB) spend ONE cheap count job and accept
    * up to `localMaxEdges` (default 4M ≈ 64 MB of id pairs in-task).
    * Past THAT, a DENSE tier: up to `localMaxEdgesDense` (default 32M ≈
    * 0.5 GB of primitive arrays) IF the vertex count stays under
    * `localMaxNodesDense` (default 1M, one extra approx-distinct pass over
    * the already-checkpointed leaf) — per-iteration kernel work is
    * O(V + E) but the distributed twin pays per-round vertex-sized
    * SHUFFLES, so a dense small-vertex graph (the co-purchase shape:
    * sf1 = 12M edges over 200k nodes) wins in-task 3-4× (sf1 cdlp
    * 58.7 s → 17.4 s, bit-identical output) while a large-vertex graph
    * of the same edge count (6.4M-node HITS projection: single-task CSR
    * build + 6.4M-row result from one task) correctly stays distributed.
    * Past the dense tier: distributed, and never counted.
    * `localSizeBytes=0` disables the local path entirely (used by specs
    * and the soak harness to pin the distributed formulation). */
  def isSmall(df: DataFrame): Boolean = gate(df)._2

  /** Like [[isSmall]] but when the gray zone forces a count, the input is
    * localCheckpointed FIRST and the (possibly materialized) frame is
    * returned for downstream use — an expensive derived input (e.g. a
    * self-join edge projection) is computed once, shared by the count and
    * whichever execution path wins, instead of twice. */
  def gate(df: DataFrame): (DataFrame, Boolean) = {
    val conf = df.sparkSession.conf
    val sizeB = conf.get("spark.graft.algo.localSizeBytes", (64L << 20).toString).toLong
    if (sizeB <= 0L) return (df, false)
    val est = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (est <= BigInt(sizeB)) (df, true)
    else {
      val countB = conf.get("spark.graft.algo.localCountBytes", (2L << 30).toString).toLong
      val maxE = conf.get("spark.graft.algo.localMaxEdges", "4000000").toLong
      if (est > BigInt(countB)) (df, false)
      else {
        val leaf = df.localCheckpoint(true)
        val m = leaf.count()
        if (m <= maxE) (leaf, true)
        else {
          val denseE = conf.get("spark.graft.algo.localMaxEdgesDense", "32000000").toLong
          val maxV = conf.get("spark.graft.algo.localMaxNodesDense", "1000000").toLong
          if (m > denseE) (leaf, false)
          else {
            // one partial-combined pass over the leaf (±5% HLL is plenty:
            // the threshold only picks an execution strategy, both paths
            // are differentially pinned equal) — endpoints by position,
            // matching every gated call's (src, dst[, ...]) layout
            val c = leaf.columns
            val v = leaf.select(explode(array(col(c(0)), col(c(1)))).as("__v"))
              .agg(approx_count_distinct(col("__v")).as("__n"))
              .first().getLong(0)
            (leaf, v <= maxV)
          }
        }
      }
    }
  }

  /** Gate for SUPERLINEAR kernels (triangle counting / lcc are O(m^1.5)
    * intersection work, not O(m) passes): a graph can be byte-small yet
    * compute-heavy — the sf0.1 co-purchase graph is 1.3M edges over 2k
    * nodes (avg degree ~1300), where the single-task intersection loses to
    * the 32-way distributed plan. Much tighter caps: 1 MB fast tier /
    * 200k-edge count tier (200k^1.5 ≈ 10^8 merge steps ≈ 0.1 s in-task). */
  def isSmallSuperlinear(df: DataFrame): Boolean = gateSuperlinear(df)._2

  /** [[gate]] with the superlinear caps. */
  def gateSuperlinear(df: DataFrame): (DataFrame, Boolean) = {
    val conf = df.sparkSession.conf
    val sizeB = conf.get("spark.graft.algo.localSizeBytesSuperlinear", (1L << 20).toString).toLong
    val base = conf.get("spark.graft.algo.localSizeBytes", (64L << 20).toString).toLong
    if (sizeB <= 0L || base <= 0L) return (df, false)
    val est = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (est <= BigInt(sizeB)) (df, true)
    else {
      // Gray zone is much narrower than [[gate]]'s 2 GB: a 200k-edge cap is
      // ~3 MB of id pairs, so any estimate past ~64 MB cannot pass the count
      // — rejecting on the estimate alone avoids a pure-overhead
      // materialize+count on every large-side call (the r6 q_lcc regression).
      val countB = conf.get("spark.graft.algo.localCountBytesSuperlinear", (64L << 20).toString).toLong
      val maxE = conf.get("spark.graft.algo.localMaxEdgesSuperlinear", "200000").toLong
      if (est > BigInt(countB)) (df, false)
      else {
        val leaf = df.localCheckpoint(true)
        (leaf, leaf.count() <= maxE)
      }
    }
  }

  // ---- in-task graph assembly -------------------------------------------

  /** Growable primitive-long buffer (no boxing inside the task). */
  private final class Longs(initial: Int = 1 << 12) {
    private[this] var a = new Array[Long](initial)
    var n = 0
    def +=(v: Long): Unit = {
      if (n == a.length) a = java.util.Arrays.copyOf(a, n << 1)
      a(n) = v; n += 1
    }
    def apply(i: Int): Long = a(i)
    def toArray: Array[Long] = java.util.Arrays.copyOf(a, n)
  }

  // ---- resident edge-stream cache ---------------------------------------
  //
  // Every kernel call above re-runs scan → shuffle-to-1 → per-row decode of
  // the SAME edge table (the reference instead keeps its CSR resident in
  // memory). The cache stores the materialized primitive edge arrays keyed
  // by (canonicalized plan, input files + len + mtime) — file-backed plans
  // only, so literal/RDD-backed inputs (mutated graphs, checkpoints) can
  // never false-hit. Entries are PUT by the task that materialized the
  // stream and LOOKED UP on the driver before launching a job: in
  // single-process mode (local[n] — where these kernels run at all-pay-off)
  // driver and executor share the JVM, so the second kernel over the same
  // edges skips the whole scan job; on a multi-JVM cluster the driver never
  // sees executor entries and always takes the standard path — correct,
  // just not resident. LRU-bounded by total cached rows.

  private final case class CachedRows(rows: AnyRef, n: Long)
  private[this] val resident =
    new java.util.LinkedHashMap[String, CachedRows](8, 0.75f, true)
  private[this] var residentRows = 0L
  private val ResidentRowBudget = 32L * 1000 * 1000

  private def residentLookup(key: String): AnyRef =
    resident.synchronized(Option(resident.get(key)).map(_.rows).orNull)

  private def residentStore(key: String, rows: AnyRef, n: Long): Unit =
    resident.synchronized {
      if (!resident.containsKey(key)) {
        resident.put(key, CachedRows(rows, n))
        residentRows += n
        val it = resident.entrySet().iterator()
        while (residentRows > ResidentRowBudget && resident.size() > 1 && it.hasNext) {
          val e = it.next()
          if (!e.getKey.equals(key)) { residentRows -= e.getValue.n; it.remove() }
        }
      }
    }

  /** Cache key for a PROJECTED edge frame, or None when the plan isn't
    * purely file-backed (LocalRelation / LogicalRDD leaves have
    * data-invisible canonical forms — never cache those). */
  private def cacheKey(df: DataFrame): Option[String] = {
    if (!df.sparkSession.conf
          .get("spark.graft.algo.residentCache", "true").toBoolean) return None
    val leaves = df.queryExecution.optimizedPlan.collectLeaves()
    val fileBacked = leaves.nonEmpty && leaves.forall { l =>
      val n = l.getClass.getSimpleName
      n == "LogicalRelation" || n == "DataSourceV2Relation"
    }
    if (!fileBacked) None
    else {
      // every input must be a stat-able LOCAL file: the length+mtime pair
      // is the staleness guard, and for a remote scheme (s3a://, hdfs://)
      // java.io.File stats nothing — a silent ":0:0" would mean in-place
      // overwrites never invalidate the entry. Remote inputs: no caching.
      val files = df.inputFiles.sorted.map { p =>
        val f =
          try new java.io.File(new java.net.URI(p))
          catch { case _: Exception => new java.io.File(p) }
        if (!f.isFile) null else s"$p:${f.length}:${f.lastModified}"
      }
      if (files.isEmpty || files.contains(null)) None
      else {
        val md = java.security.MessageDigest.getInstance("MD5")
        val s = df.queryExecution.optimizedPlan.canonicalized.toString() +
          "\n" + files.mkString("\n")
        Some(java.util.Base64.getEncoder.encodeToString(md.digest(s.getBytes("UTF-8"))))
      }
    }
  }

  import org.apache.spark.sql.{Dataset, Encoder, SparkSession}

  private def oneRow(spark: SparkSession): Dataset[java.lang.Long] =
    spark.range(0, 1, 1, 1).as(org.apache.spark.sql.Encoders.LONG)

  // Pin registry for cache hits: the hit-path plan captures a small
  // HANDLE (a serializable long wrapper), not the arrays (capturing the
  // arrays would serialize up to the full row budget into every task
  // binary). The registry maps token → (WeakReference(handle), arrays):
  // the plan's closure strongly references the handle, so the pinned
  // arrays stay resolvable for EXACTLY the lifetime of the returned
  // DataFrame — a hit-path plan executed arbitrarily late, or more than
  // once (show() then count(), a stage retry), can never lose its arrays
  // to eviction; once the DataFrame is GC'd the weak ref clears and the
  // entry is purged on the next pin() (r13's fixed 64-pin FIFO could age
  // a live plan's pin out and turn a cache eviction into a query error —
  // the hit-path plan's only leaf is a 1-row range, so there is no
  // recompute fallback). Pinned values alias the resident store's arrays,
  // so a live pin costs one map entry, not a second copy; while pins are
  // live the arrays can outlast the resident LRU budget — that is the
  // point (they are reachable through user-held DataFrames regardless).
  // Hits only happen in local mode (gated below), where driver and task
  // share the JVM.
  private final class PinHandle(val token: Long) extends Serializable
  private final case class PinEntry(
    handle: java.lang.ref.WeakReference[PinHandle], rows: AnyRef)
  private[this] val pinned = new java.util.HashMap[java.lang.Long, PinEntry]()
  private[this] val pinSeq = new java.util.concurrent.atomic.AtomicLong()
  private def pin(v: AnyRef): PinHandle = pinned.synchronized {
    val it = pinned.values().iterator()
    while (it.hasNext) if (it.next().handle.get() == null) it.remove()
    val h = new PinHandle(pinSeq.incrementAndGet())
    pinned.put(h.token, PinEntry(new java.lang.ref.WeakReference(h), v))
    h
  }
  private def pinGet(t: Long, key: String): AnyRef = {
    val v = pinned.synchronized(Option(pinned.get(t)).map(_.rows).orNull)
    if (v != null) v
    else residentLookup(key) match { // GC-race belt-and-braces
      case null => throw new IllegalStateException(
        s"resident-cache pin $t was garbage-collected and entry $key " +
          "was evicted before the kernel task ran")
      case rows => rows
    }
  }

  /** Cached (src, dst) arrays for `key` — non-null only in local mode
    * (driver and tasks share the JVM; on a cluster the driver never sees
    * executor entries and the standard scan path runs). */
  private[graft] def hitPair(spark: SparkSession, key: Option[String])
      : Option[(Array[Long], Array[Long])] =
    if (!spark.sparkContext.isLocal) None
    else key.flatMap(k => residentLookup(k) match {
      case (as: Array[Long], bs: Array[Long]) => Some((as, bs))
      case _ => None
    })

  private def hitTriple(spark: SparkSession, key: Option[String])
      : Option[(Array[Long], Array[Long], AnyRef)] =
    if (!spark.sparkContext.isLocal) None
    else key.flatMap(k => residentLookup(k) match {
      case (as: Array[Long], bs: Array[Long], p: AnyRef) => Some((as, bs, p))
      case _ => None
    })

  /** Store only when driver and executors share the JVM (local[n]): on a
    * multi-JVM cluster the driver can never see executor entries, so a
    * store would be permanently-retained dead weight in executor heaps. */
  private def residentStoreLocal(key: String, rows: AnyRef, n: Long): Unit = {
    val env = org.apache.spark.SparkEnv.get
    if (env != null && env.executorId == "driver") residentStore(key, rows, n)
  }

  /** Run `body` in one task over the (Long, Long) edge stream, serving the
    * stream from the resident cache when the same file-backed projection
    * was materialized before in this JVM. */
  private def inTask2[T](src: Dataset[(Long, Long)], key: Option[String])
                        (body: Iterator[(Long, Long)] => Iterator[T])
                        (implicit enc: Encoder[T]): Dataset[T] =
    hitPair(src.sparkSession, key) match {
      case Some(g) =>
        val h = pin(g); val k = key.get
        oneRow(src.sparkSession).mapPartitions { _ =>
          val (as, bs) = pinGet(h.token, k).asInstanceOf[(Array[Long], Array[Long])]
          body(Iterator.range(0, as.length).map(i => (as(i), bs(i))))
        }
      case None => src.repartition(1).mapPartitions { it =>
        key match {
          case Some(k) =>
            val ab = new Longs(); val bb = new Longs()
            it.foreach { case (a, b) => ab += a; bb += b }
            val as = ab.toArray; val bs = bb.toArray
            residentStoreLocal(k, (as, bs), as.length.toLong)
            body(Iterator.range(0, as.length).map(i => (as(i), bs(i))))
          case None => body(it)
        }
      }
    }

  /** (Long, Long, Double) variant — weighted kernels. */
  private def inTask3[T](src: Dataset[(Long, Long, Double)], key: Option[String])
                        (body: Iterator[(Long, Long, Double)] => Iterator[T])
                        (implicit enc: Encoder[T]): Dataset[T] =
    hitTriple(src.sparkSession, key) match {
      case Some(g @ (_, _, _: Array[Double])) =>
        val h = pin(g); val k = key.get
        oneRow(src.sparkSession).mapPartitions { _ =>
          val (as, bs, ws) = pinGet(h.token, k)
            .asInstanceOf[(Array[Long], Array[Long], Array[Double])]
          body(Iterator.range(0, as.length).map(i => (as(i), bs(i), ws(i))))
        }
      case _ => src.repartition(1).mapPartitions { it =>
        key match {
          case Some(k) =>
            val ab = new Longs(); val bb = new Longs()
            val wb = mutable.ArrayBuilder.make[Double]
            it.foreach { case (a, b, w) => ab += a; bb += b; wb += w }
            val as = ab.toArray; val bs = bb.toArray; val ws = wb.result()
            residentStoreLocal(k, (as, bs, ws), as.length.toLong)
            body(Iterator.range(0, as.length).map(i => (as(i), bs(i), ws(i))))
          case None => body(it)
        }
      }
    }

  private final class Ints(initial: Int = 1 << 12) {
    private[this] var a = new Array[Int](initial)
    var n = 0
    def +=(v: Int): Unit = {
      if (n == a.length) a = java.util.Arrays.copyOf(a, n << 1)
      a(n) = v; n += 1
    }
    def apply(i: Int): Int = a(i)
    def result(): Array[Int] = java.util.Arrays.copyOf(a, n)
  }

  /** Vertex interner: external long id ↔ dense index. */
  private final class Interner {
    val idOf = mutable.LongMap.empty[Int]
    val ids = new Longs()
    def idx(v: Long): Int = idOf.getOrElse(v, {
      val i = ids.n; idOf.update(v, i); ids += v; i
    })
    def n: Int = ids.n
  }

  /** CSR from (src-index, dst-index) pairs. Returns (offsets, targets). */
  private def csr(n: Int, si: Array[Int], di: Array[Int]): (Array[Int], Array[Int]) = {
    val off = new Array[Int](n + 1)
    var k = 0
    while (k < si.length) { off(si(k) + 1) += 1; k += 1 }
    var i = 0
    while (i < n) { off(i + 1) += off(i); i += 1 }
    val tgt = new Array[Int](si.length)
    val cur = java.util.Arrays.copyOf(off, n)
    k = 0
    while (k < si.length) { val s = si(k); tgt(cur(s)) = di(k); cur(s) += 1; k += 1 }
    (off, tgt)
  }

  // ---- kernels ----------------------------------------------------------

  /** Damped power iteration with dangling-mass redistribution — same
    * update as [[Algorithms.pageRank]]'s distributed loop, same float
    * association `(1-d)/n + d*(recv + dmass/n)`. */
  def pageRank(edges: DataFrame, iterations: Int, damping: Double): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val src = edges.select(col("src").cast("long"), col("dst").cast("long")).as[(Long, Long)]
    inTask2(src, cacheKey(src.toDF())) { it =>
        val vx = new Interner
        val sb = new Ints(); val db = new Ints()
        it.foreach { case (s, d) => sb += vx.idx(s); db += vx.idx(d) }
        val (si, di) = (sb.result(), db.result())
        val n = vx.n
        if (n == 0) Iterator.empty
        else {
          val m = si.length
          val deg = new Array[Int](n)
          var k = 0
          while (k < m) { deg(si(k)) += 1; k += 1 }
          var rank = Array.fill(n)(1.0 / n)
          var iter = 0
          while (iter < iterations) {
            var dmass = 0.0
            var i = 0
            while (i < n) { if (deg(i) == 0) dmass += rank(i); i += 1 }
            val recv = new Array[Double](n)
            k = 0
            while (k < m) { recv(di(k)) += rank(si(k)) / deg(si(k)); k += 1 }
            val nr = new Array[Double](n)
            i = 0
            while (i < n) {
              nr(i) = (1 - damping) / n + damping * (recv(i) + dmass / n); i += 1
            }
            rank = nr; iter += 1
          }
          (0 until n).iterator.map(i => (vx.ids(i), rank(i)))
        }
      }.toDF("id", "rank")
  }

  /** Shared in-task truncated directed BFS from one seed over a CSR.
    * Returns (dist array (-1 unreached), level order list) with seed at
    * dist 0, truncated at `radius`. */
  private def bfsFrom(seed: Int, n: Int, off: Array[Int], tgt: Array[Int],
                      radius: Int): (Array[Int], Array[Int]) = {
    val dist = Array.fill(n)(-1)
    dist(seed) = 0
    val order = new Ints()
    var frontier = List(seed)
    var d = 0
    while (frontier.nonEmpty && d < radius) {
      var nf: List[Int] = Nil
      frontier.foreach { u =>
        var k = off(u)
        while (k < off(u + 1)) {
          val w = tgt(k)
          if (dist(w) < 0) { dist(w) = d + 1; order += w; nf ::= w }
          k += 1
        }
      }
      frontier = nf
      d += 1
    }
    (dist, order.result())
  }

  /** Truncated harmonic centrality — same semantics as
    * [[Algorithms.harmonicCentrality]]'s distributed multi-source BFS:
    * directed, seed excluded, exact within radius; absent/isolated seeds
    * return (seed, 0, 0.0). */
  def harmonicCentrality(edges: DataFrame, seeds: Seq[Long], radius: Int): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val sd = seeds.distinct
    val src = edges.select(col("src").cast("long"), col("dst").cast("long")).as[(Long, Long)]
    inTask2(src, cacheKey(src.toDF())) { it =>
      val vx = new Interner
      val sb = new Ints(); val db = new Ints()
      it.foreach { case (s, d) => sb += vx.idx(s); db += vx.idx(d) }
      val (si, di) = (sb.result(), db.result())
      val n = vx.n
      val (off, tgt) = csr(n, si, di)
      sd.iterator.map { s =>
        vx.idOf.get(s) match {
          case Some(seed) =>
            val (dist, order) = bfsFrom(seed, n, off, tgt, radius)
            var h = 0.0; var c = 0L; var i = 0
            while (i < order.length) { h += 1.0 / dist(order(i)); c += 1; i += 1 }
            (s, c, math.signum(h) * math.floor(math.abs(h) * 1e4 + 0.5) / 1e4)
          case None => (s, 0L, 0.0)
        }
      }
    }.toDF("seed", "n_reached", "harmonic")
  }

  /** Truncated closeness + eccentricity — same semantics as
    * [[Algorithms.closenessCentrality]]. */
  def closenessCentrality(edges: DataFrame, seeds: Seq[Long], radius: Int): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val sd = seeds.distinct
    val src = edges.select(col("src").cast("long"), col("dst").cast("long")).as[(Long, Long)]
    inTask2(src, cacheKey(src.toDF())) { it =>
      val vx = new Interner
      val sb = new Ints(); val db = new Ints()
      it.foreach { case (s, d) => sb += vx.idx(s); db += vx.idx(d) }
      val (si, di) = (sb.result(), db.result())
      val n = vx.n
      val (off, tgt) = csr(n, si, di)
      sd.iterator.map { s =>
        vx.idOf.get(s) match {
          case Some(seed) =>
            val (dist, order) = bfsFrom(seed, n, off, tgt, radius)
            var sdist = 0L; var c = 0L; var ecc = 0; var i = 0
            while (i < order.length) {
              val d = dist(order(i)); sdist += d; if (d > ecc) ecc = d; c += 1; i += 1
            }
            val cl = if (c == 0) 0.0 else c.toDouble / sdist
            (s, c, math.signum(cl) * math.floor(math.abs(cl) * 1e4 + 0.5) / 1e4, ecc)
          case None => (s, 0L, 0.0, 0)
        }
      }
    }.toDF("seed", "n_reached", "closeness", "eccentricity")
  }

  /** Sampled-source Brandes betweenness — same semantics as
    * [[Algorithms.betweennessCentrality]]'s distributed loop: directed,
    * edges deduped, σ over ≤maxDepth-hop shortest paths (exact integers in
    * FP, so identical to the distributed hash aggregate), endpoints
    * excluded structurally; every node reached at dist ≥ 1 by any seed
    * emits a row (deepest-level nodes carry δ = 0), bc rounded to 4. */
  def betweennessCentrality(edges: DataFrame, seeds: Seq[Long], maxDepth: Int): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val sd = seeds.distinct
    val src = edges.select(col("src").cast("long"), col("dst").cast("long")).as[(Long, Long)]
    inTask2(src, cacheKey(src.toDF())) { it =>
      // directed dedup as pack → sort → unique (r15: a boxed
      // mutable.HashSet[Long] on packed keys measured ~µs per insert —
      // same pathology as the Louvain contraction's LongMap; one
      // Arrays.sort replaces 2M hash inserts)
      val vx = new Interner
      val keys = new Longs()
      it.foreach { case (s, d) =>
        keys += (vx.idx(s).toLong << 32) | (vx.idx(d).toLong & 0xffffffffL)
      }
      val ks = uniqueSorted(keys.toArray)
      val sb = new Ints(); val db = new Ints()
      var ki = 0
      while (ki < ks.length) { sb += (ks(ki) >>> 32).toInt; db += ks(ki).toInt; ki += 1 }
      val (si, di) = (sb.result(), db.result())
      val n = vx.n
      val (off, tgt) = csr(n, si, di)
      val bc = new Array[Double](n)
      val emit = new Array[Boolean](n)
      sd.foreach { s =>
        vx.idOf.get(s).foreach { seed =>
          val (dist, order) = bfsFrom(seed, n, off, tgt, maxDepth)
          val sigma = new Array[Double](n)
          sigma(seed) = 1.0
          // forward σ: order is level-sorted, so pushing seed then each
          // node in order completes σ(w) = Σ σ(v) over DAG edges before
          // w itself is pushed
          def push(u: Int): Unit = {
            var k = off(u)
            while (k < off(u + 1)) {
              val w = tgt(k)
              if (dist(w) == dist(u) + 1) sigma(w) += sigma(u)
              k += 1
            }
          }
          push(seed)
          var i = 0
          while (i < order.length) { push(order(i)); i += 1 }
          // backward δ: reverse level order; deepest level δ = 0
          val delta = new Array[Double](n)
          i = order.length - 1
          while (i >= 0) {
            val v = order(i)
            var k = off(v)
            while (k < off(v + 1)) {
              val w = tgt(k)
              if (dist(w) == dist(v) + 1)
                delta(v) += sigma(v) / sigma(w) * (1.0 + delta(w))
              k += 1
            }
            bc(v) += delta(v); emit(v) = true
            i -= 1
          }
        }
      }
      (0 until n).iterator.filter(emit).map(i =>
        (vx.ids(i), math.signum(bc(i)) * math.floor(math.abs(bc(i)) * 1e4 + 0.5) / 1e4))
    }.toDF("id", "bc")
  }

  /** Weighted PageRank — identical per-round float association to
    * [[Algorithms.pageRankWeighted]]'s distributed loop:
    * recv(v) += (rank(u)/W(u))·w(e), rank' = (1−d)/n + d·(recv + dmass/n);
    * weight ≤ 0 edges dropped (not an edge), dangling = zero surviving
    * out-weight. */
  def pageRankWeighted(edges: DataFrame, iterations: Int, damping: Double): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val srcDs = edges.select(col("src").cast("long"), col("dst").cast("long"),
        col("weight").cast("double")).filter(col("weight") > 0)
      .as[(Long, Long, Double)]
    inTask3(srcDs, cacheKey(srcDs.toDF())) { it =>
      val vx = new Interner
      val sb = new Ints(); val db = new Ints(); val wb = mutable.ArrayBuffer.empty[Double]
      it.foreach { case (s, d, w) => sb += vx.idx(s); db += vx.idx(d); wb += w }
      val (si, di, w) = (sb.result(), db.result(), wb.toArray)
      val n = vx.n
      if (n == 0) Iterator.empty
      else {
        val m = si.length
        val outW = new Array[Double](n)
        var k = 0
        while (k < m) { outW(si(k)) += w(k); k += 1 }
        var rank = Array.fill(n)(1.0 / n)
        var iter = 0
        while (iter < iterations) {
          var dmass = 0.0
          var i = 0
          while (i < n) { if (outW(i) == 0.0) dmass += rank(i); i += 1 }
          val recv = new Array[Double](n)
          k = 0
          while (k < m) { recv(di(k)) += (rank(si(k)) / outW(si(k))) * w(k); k += 1 }
          val nr = new Array[Double](n)
          i = 0
          while (i < n) {
            nr(i) = (1 - damping) / n + damping * (recv(i) + dmass / n); i += 1
          }
          rank = nr; iter += 1
        }
        (0 until n).iterator.map(i => (vx.ids(i), rank(i)))
      }
    }.toDF("id", "rank")
  }

  /** HITS hubs & authorities — same half-step updates and L1
    * normalization as [[Algorithms.hits]]'s distributed loop (edges
    * deduped first, matching its distinct). */
  def hits(edges: DataFrame, iterations: Int): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val src = edges.select(col("src").cast("long"), col("dst").cast("long")).as[(Long, Long)]
    inTask2(src, cacheKey(src.toDF())) { it =>
      // directed dedup as pack → sort → unique (r15: a boxed
      // mutable.HashSet[Long] on packed keys measured ~µs per insert —
      // same pathology as the Louvain contraction's LongMap; one
      // Arrays.sort replaces 2M hash inserts)
      val vx = new Interner
      val keys = new Longs()
      it.foreach { case (s, d) =>
        keys += (vx.idx(s).toLong << 32) | (vx.idx(d).toLong & 0xffffffffL)
      }
      val ks = uniqueSorted(keys.toArray)
      val sb = new Ints(); val db = new Ints()
      var ki = 0
      while (ki < ks.length) { sb += (ks(ki) >>> 32).toInt; db += ks(ki).toInt; ki += 1 }
      val (si, di) = (sb.result(), db.result())
      val n = vx.n
      if (n == 0) Iterator.empty
      else {
        val m = si.length
        var hub = Array.fill(n)(1.0)
        var auth = new Array[Double](n)
        var iter = 0
        while (iter < iterations) {
          val ar = new Array[Double](n)
          var k = 0
          while (k < m) { ar(di(k)) += hub(si(k)); k += 1 }
          var s = 0.0; var i = 0
          while (i < n) { s += ar(i); i += 1 }
          i = 0; while (i < n) { ar(i) /= s; i += 1 }
          auth = ar
          val hr = new Array[Double](n)
          k = 0
          while (k < m) { hr(si(k)) += auth(di(k)); k += 1 }
          s = 0.0; i = 0
          while (i < n) { s += hr(i); i += 1 }
          i = 0; while (i < n) { hr(i) /= s; i += 1 }
          hub = hr
          iter += 1
        }
        (0 until n).iterator.map(i => (vx.ids(i), hub(i), auth(i)))
      }
    }.toDF("id", "hub", "auth")
  }

  /** Personalized PageRank — identical per-round arithmetic to
    * [[Algorithms.personalizedPageRank]]: teleport AND dangling mass go to
    * the seed set, non-seed restart is zero. */
  def personalizedPageRank(edges: DataFrame, seeds: Seq[Long],
                           iterations: Int, damping: Double): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val seedSet = seeds.toSet
    val src = edges.select(col("src").cast("long"), col("dst").cast("long")).as[(Long, Long)]
    inTask2(src, cacheKey(src.toDF())) { it =>
        val vx = new Interner
        val sb = new Ints(); val db = new Ints()
        it.foreach { case (s, d) => sb += vx.idx(s); db += vx.idx(d) }
        val (si, di) = (sb.result(), db.result())
        val n = vx.n
        if (n == 0) Iterator.empty
        else {
          val m = si.length
          val deg = new Array[Int](n)
          var k = 0
          while (k < m) { deg(si(k)) += 1; k += 1 }
          val isSeed = Array.tabulate(n)(i => seedSet.contains(vx.ids(i)))
          val ns = seedSet.size.toDouble // dedup: teleport share per distinct seed
          var rank = Array.tabulate(n)(i => if (isSeed(i)) 1.0 / ns else 0.0)
          var iter = 0
          while (iter < iterations) {
            var dmass = 0.0
            var i = 0
            while (i < n) { if (deg(i) == 0) dmass += rank(i); i += 1 }
            val recv = new Array[Double](n)
            k = 0
            while (k < m) { recv(di(k)) += rank(si(k)) / deg(si(k)); k += 1 }
            val nr = new Array[Double](n)
            i = 0
            while (i < n) {
              nr(i) = (if (isSeed(i)) (1 - damping) / ns + damping * dmass / ns
                       else 0.0) + damping * recv(i)
              i += 1
            }
            rank = nr; iter += 1
          }
          (0 until n).iterator.map(i => (vx.ids(i), rank(i)))
        }
      }.toDF("id", "rank")
  }

  /** Synchronous label propagation, both directions incident (duplicates
    * kept), argmax frequency with min-label tie-break — the exact
    * per-round rule of [[Algorithms.cdlp]]. */
  def cdlp(edges: DataFrame, iterations: Int): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val srcDs = edges.select(col("src").cast("long"), col("dst").cast("long")).as[(Long, Long)]
    inTask2(srcDs, cacheKey(srcDs.toDF())) { it =>
        val vx = new Interner
        val sb = new Ints(); val db = new Ints()
        // undirected incidence: every input edge contributes BOTH directions
        it.foreach { case (s, d) =>
          val a = vx.idx(s); val b = vx.idx(d)
          sb += a; db += b
          sb += b; db += a
        }
        val n = vx.n
        if (n == 0) Iterator.empty
        else {
          // in-neighbor CSR (src of und edge is the label donor)
          val (off, nbr) = csr(n, db.result(), sb.result())
          // labels as DENSE vertex indices (a label is always some vertex's
          // id), counted in a flat int array + touched list — the same
          // no-map idiom as the Louvain rounds. The per-vertex
          // mutable.LongMap counter this replaces measured tens of µs per
          // update on id-valued keys (r15 profile of the louvain
          // contraction, same map type), and clear() per vertex re-walks
          // the map's backing arrays; the flat counter resets only the
          // touched entries. Tie-break semantics unchanged: max frequency,
          // then smallest label VALUE (ids(idx) comparison).
          val ids = vx.ids.toArray
          var lbl = Array.tabulate(n)(identity)
          val cnt = new Array[Int](n)
          val touched = new Ints()
          var r = 0
          while (r < iterations) {
            val next = new Array[Int](n)
            var v = 0
            while (v < n) {
              touched.n = 0
              var k = off(v)
              while (k < off(v + 1)) {
                val li = lbl(nbr(k))
                if (cnt(li) == 0) touched += li
                cnt(li) += 1
                k += 1
              }
              var bestI = lbl(v); var bestF = 0
              var t = 0
              while (t < touched.n) {
                val li = touched(t); val f = cnt(li)
                if (f > bestF || (f == bestF && ids(li) < ids(bestI))) {
                  bestI = li; bestF = f
                }
                t += 1
              }
              t = 0
              while (t < touched.n) { cnt(touched(t)) = 0; t += 1 }
              next(v) = bestI
              v += 1
            }
            lbl = next; r += 1
          }
          (0 until n).iterator.map(i => (ids(i), ids(lbl(i))))
        }
      }.toDF("id", "label")
  }

  /** Connected components, component = min vertex id — union-find with the
    * smaller ROOT id kept as root, which is exactly the fixpoint of
    * [[Algorithms.wcc]]'s min-label propagation. */
  def wcc(edges: DataFrame): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val srcDs = edges.select(col("src").cast("long"), col("dst").cast("long")).as[(Long, Long)]
    inTask2(srcDs, cacheKey(srcDs.toDF())) { it =>
        val vx = new Interner
        def find(x0: Int, p: Array[Int]): Int = {
          var x = x0
          while (p(x) != x) { p(x) = p(p(x)); x = p(x) }
          x
        }
        val es = new Ints(); val ed = new Ints()
        it.foreach { case (s, d) => es += vx.idx(s); ed += vx.idx(d) }
        val n = vx.n
        val p = Array.tabulate(n)(identity)
        var k = 0
        val (si, di) = (es.result(), ed.result())
        while (k < si.length) {
          val a = find(si(k), p); val b = find(di(k), p)
          if (a != b) {
            // root with the smaller EXTERNAL id wins → component = min id
            if (vx.ids(a) < vx.ids(b)) p(b) = a else p(a) = b
          }
          k += 1
        }
        (0 until n).iterator.map(i => (vx.ids(i), vx.ids(find(i, p))))
      }.toDF("id", "component")
  }

  /** Strongly connected components — iterative Tarjan over the interned
    * CSR, one pass, exact (no iteration bound). Component label = min
    * external id in the SCC, the same labeling GraphX's
    * stronglyConnectedComponents converges to ([[Algorithms.sccDistributed]]
    * is the distributed twin; SccKernelSpec is the differential check). */
  def scc(edges: DataFrame): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val srcDs = edges.select(col("src").cast("long"), col("dst").cast("long")).as[(Long, Long)]
    inTask2(srcDs, cacheKey(srcDs.toDF())) { it =>
      val vx = new Interner
      val es = new Ints(); val ed = new Ints()
      it.foreach { case (s, d) => es += vx.idx(s); ed += vx.idx(d) }
      val n = vx.n
      val (off, adj) = csr(n, es.result(), ed.result())
      val index = Array.fill(n)(-1)
      val low = new Array[Int](n)
      val onStack = new Array[Boolean](n)
      val tarjan = new Array[Int](n); var tn = 0          // Tarjan's SCC stack
      val dfsNode = new Array[Int](n)                      // explicit DFS stack
      val dfsEdge = new Array[Int](n)
      val compMin = new Array[Long](n)                     // min external id per node's SCC
      var idx = 0
      var v = 0
      while (v < n) {
        if (index(v) == -1) {
          var top = 0
          dfsNode(0) = v; dfsEdge(0) = off(v)
          index(v) = idx; low(v) = idx; idx += 1
          tarjan(tn) = v; tn += 1; onStack(v) = true
          while (top >= 0) {
            val u = dfsNode(top)
            val ei = dfsEdge(top)
            if (ei < off(u + 1)) {
              dfsEdge(top) = ei + 1
              val w = adj(ei)
              if (index(w) == -1) {
                index(w) = idx; low(w) = idx; idx += 1
                tarjan(tn) = w; tn += 1; onStack(w) = true
                top += 1; dfsNode(top) = w; dfsEdge(top) = off(w)
              } else if (onStack(w) && index(w) < low(u)) low(u) = index(w)
            } else {
              top -= 1
              if (top >= 0) {
                val p = dfsNode(top)
                if (low(u) < low(p)) low(p) = low(u)
              }
              if (low(u) == index(u)) {
                // pop the SCC rooted at u; label every member min external id
                var mn = Long.MaxValue
                var i = tn - 1
                var done = false
                while (!done) {
                  val m = tarjan(i)
                  if (vx.ids(m) < mn) mn = vx.ids(m)
                  if (m == u) done = true else i -= 1
                }
                while (tn > i) {
                  tn -= 1
                  val m = tarjan(tn)
                  onStack(m) = false
                  compMin(m) = mn
                }
              }
            }
          }
        }
        v += 1
      }
      (0 until n).iterator.map(i => (vx.ids(i), compMin(i)))
    }.toDF("id", "component")
  }

  /** Synchronous fixed-round k-core peel — mirrors
    * [[Algorithms.kCoreDistributed]] exactly: symmetrize+dedup+drop self
    * loops, then `rounds` rounds each removing ALL nodes with degree < k
    * at once; returns (id, deg) for nodes with a surviving edge. */
  def kCore(edges: DataFrame, k: Int, rounds: Int): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val srcDs = edges.select(col("src").cast("long"), col("dst").cast("long")).as[(Long, Long)]
    inTask2(srcDs, cacheKey(srcDs.toDF())) { it =>
        // canonical dedup as pack → sort → unique (see betweenness — the
        // tuple-keyed HashSet boxed every pair)
        val vx = new Interner
        val keys = new Longs()
        it.foreach { case (s, d) =>
          if (s != d) {
            val lo = math.min(s, d); val hi = math.max(s, d)
            keys += (vx.idx(lo).toLong << 32) | (vx.idx(hi).toLong & 0xffffffffL)
          }
        }
        val ks = uniqueSorted(keys.toArray)
        val es = new Ints(); val ed = new Ints()
        var ki = 0
        while (ki < ks.length) { es += (ks(ki) >>> 32).toInt; ed += ks(ki).toInt; ki += 1 }
        val n = vx.n
        val (si, di) = (es.result(), ed.result())
        val alive = Array.fill(n)(true)
        val deg = new Array[Int](n)
        var r = 0
        while (r < rounds) {
          java.util.Arrays.fill(deg, 0)
          var i = 0
          while (i < si.length) {
            if (alive(si(i)) && alive(di(i))) { deg(si(i)) += 1; deg(di(i)) += 1 }
            i += 1
          }
          var v = 0
          while (v < n) { if (alive(v) && deg(v) < k) alive(v) = false; v += 1 }
          r += 1
        }
        // final degrees over the surviving edge set
        java.util.Arrays.fill(deg, 0)
        var i = 0
        while (i < si.length) {
          if (alive(si(i)) && alive(di(i))) { deg(si(i)) += 1; deg(di(i)) += 1 }
          i += 1
        }
        (0 until n).iterator.filter(v => alive(v) && deg(v) > 0)
          .map(v => (vx.ids(v), deg(v).toLong))
      }.toDF("id", "deg")
  }

  /** Layered BFS over out-edges, depth capped at maxIter, source always
    * present at dist 0 — mirrors [[Algorithms.bfs]]. */
  def bfs(edges: DataFrame, source: Long, maxIter: Int): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val srcDs = edges.select(col("src").cast("long"), col("dst").cast("long")).as[(Long, Long)]
    inTask2(srcDs, cacheKey(srcDs.toDF())) { it =>
        val vx = new Interner
        val sb = new Ints(); val db = new Ints()
        it.foreach { case (s, d) => sb += vx.idx(s); db += vx.idx(d) }
        val src = vx.idx(source) // ensure present even with no incident edges
        val n = vx.n
        val (off, tgt) = csr(n, sb.result(), db.result())
        val dist = Array.fill(n)(-1)
        dist(src) = 0
        var frontier = Array(src)
        var depth = 0
        while (frontier.nonEmpty && depth < maxIter) {
          val next = new Ints(math.max(frontier.length, 16))
          var i = 0
          while (i < frontier.length) {
            val v = frontier(i)
            var k = off(v)
            while (k < off(v + 1)) {
              val w = tgt(k)
              if (dist(w) < 0) { dist(w) = depth + 1; next += w }
              k += 1
            }
            i += 1
          }
          frontier = next.result()
          depth += 1
        }
        (0 until n).iterator.filter(dist(_) >= 0).map(i => (vx.ids(i), dist(i)))
      }.toDF("id", "dist")
  }

  /** In-task twin of [[Algorithms.bidirectionalBfs]] — per distinct pair
    * one depth-capped UNDIRECTED BFS from src (meet-in-the-middle buys
    * nothing inside one task: a plain BFS to maxDepth is one O(V+E) pass).
    * Output contract matches the distributed meet exactly: one
    * (src, dst, dist) row per pair whose true undirected distance is
    * ≤ maxDepth; a degenerate (x, x) pair is distance 0 even when x has
    * no edges (the distributed seeds both sides at dist 0 before any
    * expansion, so they "meet" immediately); self-loop edges are dropped
    * like the distributed symmetrization's a != b filter. */
  def bidirBfs(edges: DataFrame, pairs: Seq[(Long, Long)], maxDepth: Int): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val srcDs = edges.select(col("src").cast("long"), col("dst").cast("long")).as[(Long, Long)]
    val pd = pairs.distinct
    inTask2(srcDs, cacheKey(srcDs.toDF())) { it =>
        val vx = new Interner
        val sb = new Ints(); val db = new Ints()
        it.foreach { case (s, d) =>
          if (s != d) {
            val a = vx.idx(s); val b = vx.idx(d)
            sb += a; db += b; sb += b; db += a
          }
        }
        val n = vx.n
        val (off, tgt) = csr(n, sb.result(), db.result())
        // one bfsFrom per DISTINCT source: k pairs sharing a source answer
        // from the same dist array instead of paying k traversals (ADVICE
        // r15). Degenerate (s, s) pairs keep their unconditional emit —
        // including sources absent from the edge set.
        pd.groupBy(_._1).toSeq.sortBy(_._1).iterator.flatMap { case (s, grp) =>
          val degenerate = grp.collect { case (a, b) if a == b => (a, b, 0L) }
          val targets = grp.collect { case (a, b) if a != b => b }
          val resolved = vx.idOf.get(s) match {
            case Some(si) if targets.nonEmpty =>
              val (dist, _) = bfsFrom(si, n, off, tgt, maxDepth)
              targets.flatMap { t =>
                vx.idOf.get(t) match {
                  case Some(ti) if dist(ti) >= 0 => Seq((s, t, dist(ti).toLong))
                  case _ => Nil
                }
              }
            case _ => Nil
          }
          degenerate.iterator ++ resolved.iterator
        }
      }.toDF("src", "dst", "dist")
  }

  /** Synchronous (round-based) Bellman-Ford, `maxIter` rounds or fixpoint —
    * the same bounded relaxation as [[Algorithms.sssp]], so intermediate
    * states after a capped round count match too. Emits reachable vertices
    * only; source always present at 0.0. */
  def sssp(edges: DataFrame, source: Long, maxIter: Int): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val srcDs = edges.select(col("src").cast("long"), col("dst").cast("long"),
        coalesce(col("weight"), lit(1.0)).cast("double")).as[(Long, Long, Double)]
    inTask3(srcDs, cacheKey(srcDs.toDF())) { it =>
        val vx = new Interner
        val sb = new Ints(); val db = new Ints(); val wb = mutable.ArrayBuffer.empty[Double]
        it.foreach { case (s, d, w) => sb += vx.idx(s); db += vx.idx(d); wb += w }
        val src = vx.idx(source)
        val n = vx.n
        val (si, di, w) = (sb.result(), db.result(), wb.toArray)
        val inf = Double.MaxValue
        var dist = Array.fill(n)(inf)
        dist(src) = 0.0
        var it2 = 0
        var changed = true
        while (changed && it2 < maxIter) {
          changed = false
          val nd = dist.clone() // synchronous: relax against the PREVIOUS round
          var k = 0
          while (k < si.length) {
            val ds = dist(si(k))
            if (ds != inf) {
              val cand = ds + w(k)
              if (cand < nd(di(k))) { nd(di(k)) = cand; changed = true }
            }
            k += 1
          }
          dist = nd; it2 += 1
        }
        (0 until n).iterator.filter(dist(_) != inf).map(i => (vx.ids(i), dist(i)))
      }.toDF("id", "dist")
  }

  /** Full weighted shortest PATH in one task — solve + parent derivation +
    * backward walk, the in-task twin of [[Algorithms.ssspPath]]'s
    * 16-sequential-join reconstruction. The distance solve is the same
    * synchronous Bellman-Ford as [[sssp]] (identical double additions, so
    * the exact-FP parent equality below matches the distributed parent
    * join bit-for-bit); parent(v) = min ORIGINAL-id u with
    * dist(u) + w(u,v) == dist(v), v != source; the walk follows parents
    * target→source for at most `maxHops` hops. Emits (pos, id, dist) with
    * pos counted from the TARGET, unrounded — [[Algorithms.ssspPath]]
    * applies the shared rounding/order. Same all-or-nothing completeness
    * contract as the distributed certificate: a walk whose terminal row is
    * not the source at dist 0 (unreachable target, path longer than
    * maxHops) returns NOTHING, never a silent prefix. Caller pre-filters
    * weight > 0 like the distributed path (a zero-weight cycle would make
    * the parent relation cyclic); with w > 0 the walk strictly decreases
    * dist and must terminate. */
  def ssspPath(edges: DataFrame, source: Long, target: Long, maxHops: Int): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val srcDs = edges.select(col("src").cast("long"), col("dst").cast("long"),
        coalesce(col("weight"), lit(1.0)).cast("double")).as[(Long, Long, Double)]
    inTask3(srcDs, cacheKey(srcDs.toDF())) { it =>
        val vx = new Interner
        val sb = new Ints(); val db = new Ints(); val wb = mutable.ArrayBuilder.make[Double]
        it.foreach { case (s, d, w) => sb += vx.idx(s); db += vx.idx(d); wb += w }
        val src = vx.idx(source)
        val n = vx.n
        val (si, di, w) = (sb.result(), db.result(), wb.result())
        val inf = Double.MaxValue
        var dist = Array.fill(n)(inf)
        dist(src) = 0.0
        var round = 0
        var changed = true
        while (changed && round < maxHops * 2) { // same cap as the distributed solve
          changed = false
          val nd = dist.clone() // synchronous: relax against the PREVIOUS round
          var k = 0
          while (k < si.length) {
            val ds = dist(si(k))
            if (ds != inf) {
              val cand = ds + w(k)
              if (cand < nd(di(k))) { nd(di(k)) = cand; changed = true }
            }
            k += 1
          }
          dist = nd; round += 1
        }
        // parent(v) = min original-id u with dist(u) + w == dist(v) — exact FP:
        // dist(v) was literally produced by one of these same additions
        val parent = Array.fill(n)(-1)
        var k = 0
        while (k < si.length) {
          val u = si(k); val v = di(k)
          if (v != src && dist(u) != inf && dist(u) + w(k) == dist(v) &&
              (parent(v) < 0 || vx.ids(u) < vx.ids(parent(v)))) parent(v) = u
          k += 1
        }
        val tgt = vx.idOf.getOrElse(target, -1)
        if (tgt < 0 || dist(tgt) == inf) Iterator.empty
        else {
          val walk = mutable.ArrayBuffer((0, vx.ids(tgt), dist(tgt)))
          var cur = tgt; var pos = 0
          while (cur != src && parent(cur) >= 0 && pos < maxHops) {
            cur = parent(cur); pos += 1
            walk += ((pos, vx.ids(cur), dist(cur)))
          }
          val (_, lastId, lastD) = walk.last
          if (lastId == source && lastD == 0.0) walk.iterator else Iterator.empty
        }
      }.toDF("pos", "id", "dist")
  }

  // ---- Louvain ----------------------------------------------------------

  /** One level of Louvain local moves — the in-task twin of
    * [[Algorithms.louvainMovesDistributed]], term for term: synchronous
    * rounds (all scores against the PREVIOUS round's assignment), score
    * `k − (d·dcx)/m2` with dcx = dc−d for the current community, argmax by
    * (score, then smaller community LABEL), and the (id + round) parity
    * move rule. All inputs are integer-valued (k and d are neighbor
    * counts, dc an integer sum), so the double expressions are EXACT and
    * summation-order-free — the kernel's labels are bit-identical to the
    * distributed twin's (LocalKernelsSpec differentials). */
  def louvainMoves(edges: DataFrame, rounds: Int): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val srcDs = edges.select(col("a").cast("long"), col("b").cast("long"))
      .as[(Long, Long)]
    inTask2(srcDs, cacheKey(srcDs.toDF())) { it =>
        val vx = new Interner
        val keys = new Longs()
        // mirror the distributed dedup: DISTINCT raw (a, b) pairs, a != b
        it.foreach { case (a, b) =>
          if (a != b)
            keys += (vx.idx(a).toLong << 32) | (vx.idx(b).toLong & 0xffffffffL)
        }
        val n = vx.n
        if (n == 0) Iterator.empty
        else {
          val ks = uniqueSorted(keys.toArray)
          val (off, nbr) = pairCsr(n, ks)
          val ids = vx.ids.toArray
          val comm = louvainRoundsUnweighted(n, off, nbr, ids, 2.0 * ks.length, rounds)
          (0 until n).iterator.map(i => (ids(i), ids(comm(i))))
        }
      }.toDF("id", "community")
  }

  /** Multi-level Louvain — the in-task twin of [[Algorithms.louvain]]:
    * level-1 local moves, then per level one contraction (community-pair
    * counts, least/greatest canonicalization, intra edges as self-loops)
    * and WEIGHTED local moves over the contracted graph, with the
    * node→top-level mapping composed at the end. Contracted weights are
    * pair COUNTS (integer-valued doubles), so the weighted score
    * arithmetic stays exact — same parity argument as the distributed
    * oracle relies on. */
  def louvain(edges: DataFrame, rounds: Int, levels: Int): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val srcDs = edges.select(col("a").cast("long"), col("b").cast("long"))
      .as[(Long, Long)]
    inTask2(srcDs, cacheKey(srcDs.toDF())) { it =>
        val vx = new Interner
        val keys = new Longs()
        it.foreach { case (a, b) =>
          if (a != b)
            keys += (vx.idx(a).toLong << 32) | (vx.idx(b).toLong & 0xffffffffL)
        }
        val n = vx.n
        if (n == 0) Iterator.empty
        else {
          val ks = uniqueSorted(keys.toArray)
          val (off, nbr) = pairCsr(n, ks)
          val ids = vx.ids.toArray
          var comm = louvainRoundsUnweighted(n, off, nbr, ids, 2.0 * ks.length, rounds)
          var lvl = 2
          while (lvl <= levels) {
            // contraction over the DISTINCT pair set: (least, greatest) of
            // the endpoint community LABELS, weight = pair count.
            // Counting is SORT + run-length over packed (loIdx, hiIdx)
            // keys — the same no-map idiom as level 1's uniqueSorted. The
            // r15 profile caught the previous mutable.LongMap counter at
            // ~30 µs/update on exactly these packed small-int keys (4.4 s
            // for 150k pairs on the PLACED projection — the whole
            // q_cypher_call_louvain_levels row was this loop); one
            // Arrays.sort of the packed keys does the same dedup+count in
            // ~10 ms and is branch-predictable regardless of key mixing.
            val cx = new Interner
            val pk = new Longs()
            var i = 0
            while (i < ks.length) {
              val la = ids(comm((ks(i) >>> 32).toInt))
              val lb = ids(comm(ks(i).toInt))
              val lo = if (la <= lb) la else lb
              val hi = if (la <= lb) lb else la
              pk += (cx.idx(lo).toLong << 32) | (cx.idx(hi).toLong & 0xffffffffL)
              i += 1
            }
            val n2 = cx.n
            val ids2 = cx.ids.toArray
            val pks = pk.toArray
            java.util.Arrays.sort(pks)
            // split self-loops (deg += 2w, no sym edge) from real edges,
            // consuming sorted runs as (pair, count)
            val sb = new Ints(); val db = new Ints()
            val wb = mutable.ArrayBuilder.make[Double]
            val deg2 = new Array[Double](n2)
            var m2w = 0.0
            var p = 0
            while (p < pks.length) {
              val key = pks(p)
              var q = p + 1
              while (q < pks.length && pks(q) == key) q += 1
              val a = (key >>> 32).toInt; val b = key.toInt
              val w = (q - p).toDouble
              m2w += w
              if (a == b) deg2(a) += w * 2
              else {
                sb += a; db += b; wb += w
                sb += b; db += a; wb += w
                deg2(a) += w; deg2(b) += w
              }
              p = q
            }
            val (off2, nbr2, w2) = pairCsrW(n2, sb.result(), db.result(), wb.result())
            val up = louvainRoundsWeighted(n2, off2, nbr2, w2, deg2, ids2, 2.0 * m2w, rounds)
            // compose: node's community label -> contracted node -> its label
            val next = new Array[Int](n)
            val liftIdx = new Array[Int](n2) // contracted comm idx -> level-1 comm idx of that LABEL
            i = 0
            while (i < n2) { liftIdx(i) = -1; i += 1 }
            i = 0
            while (i < n) {
              val c2 = up(cx.idOf(ids(comm(i)))) // contracted node of my label, its community
              if (liftIdx(c2) < 0) {
                // the new label is ids2(c2): find/remember a level-1 index carrying it
                liftIdx(c2) = vx.idOf.getOrElse(ids2(c2), -1)
              }
              next(i) = liftIdx(c2)
              i += 1
            }
            comm = next
            lvl += 1
          }
          (0 until n).iterator.map(i => (ids(i), ids(comm(i))))
        }
      }.toDF("id", "community")
  }

  /** Sort + unique in place; returns the deduped prefix copy. */
  private def uniqueSorted(ks: Array[Long]): Array[Long] = {
    java.util.Arrays.sort(ks)
    var m = 0; var i = 0
    while (i < ks.length) {
      if (i == 0 || ks(i) != ks(i - 1)) { ks(m) = ks(i); m += 1 }
      i += 1
    }
    java.util.Arrays.copyOf(ks, m)
  }

  /** Symmetrized CSR from packed unique (a idx << 32 | b idx) pairs. */
  private def pairCsr(n: Int, ks: Array[Long]): (Array[Int], Array[Int]) = {
    val sb = new Ints(); val db = new Ints()
    var i = 0
    while (i < ks.length) {
      val a = (ks(i) >>> 32).toInt; val b = ks(i).toInt
      sb += a; db += b; sb += b; db += a
      i += 1
    }
    csr(n, sb.result(), db.result())
  }

  /** CSR carrying per-incidence weights (aligned with the targets). */
  private def pairCsrW(n: Int, si: Array[Int], di: Array[Int],
                       wi: Array[Double]): (Array[Int], Array[Int], Array[Double]) = {
    val off = new Array[Int](n + 1)
    var k = 0
    while (k < si.length) { off(si(k) + 1) += 1; k += 1 }
    var i = 0
    while (i < n) { off(i + 1) += off(i); i += 1 }
    val tgt = new Array[Int](si.length)
    val w = new Array[Double](si.length)
    val cur = java.util.Arrays.copyOf(off, n)
    k = 0
    while (k < si.length) {
      val s = si(k); tgt(cur(s)) = di(k); w(cur(s)) = wi(k); cur(s) += 1; k += 1
    }
    (off, tgt, w)
  }

  /** Synchronous unweighted local-move rounds. deg = incidence count; k
    * counts neighbors per community; score = k − (d·dcx)/m2 with LONG
    * products (the distributed expression's exact type path). */
  private def louvainRoundsUnweighted(n: Int, off: Array[Int], nbr: Array[Int],
                                      ids: Array[Long], m2: Double,
                                      rounds: Int): Array[Int] = {
    val deg = new Array[Long](n)
    var i = 0
    while (i < n) { deg(i) = (off(i + 1) - off(i)).toLong; i += 1 }
    var comm = Array.tabulate(n)(identity)
    val dc = new Array[Long](n)
    val cnt = new Array[Long](n)
    val touched = new Ints()
    var r = 1
    while (r <= rounds) {
      java.util.Arrays.fill(dc, 0L)
      i = 0
      while (i < n) { dc(comm(i)) += deg(i); i += 1 }
      val next = new Array[Int](n)
      var v = 0
      while (v < n) {
        if (java.lang.Math.floorMod(ids(v) + r, 2L) != 0L) next(v) = comm(v)
        else {
          touched.n = 0
          var k = off(v)
          while (k < off(v + 1)) {
            val c = comm(nbr(k))
            if (cnt(c) == 0L) touched += c
            cnt(c) += 1L
            k += 1
          }
          val cur = comm(v); val d = deg(v)
          if (cnt(cur) == 0L) touched += cur // k = 0 candidate
          var bestC = -1; var bestScore = 0.0; var bestLabel = 0L
          var t = 0
          while (t < touched.n) {
            val c = touched(t)
            val dcx = if (c == cur) dc(c) - d else dc(c)
            val score = cnt(c).toDouble - (d * dcx).toDouble / m2
            val label = ids(c)
            if (bestC < 0 || score > bestScore ||
              (score == bestScore && label < bestLabel)) {
              bestC = c; bestScore = score; bestLabel = label
            }
            t += 1
          }
          // clear scratch
          t = 0
          while (t < touched.n) { cnt(touched(t)) = 0L; t += 1 }
          next(v) = bestC
        }
        v += 1
      }
      comm = next
      r += 1
    }
    comm
  }

  /** Synchronous WEIGHTED local-move rounds (contracted levels): k and d
    * are weight sums — integer-valued doubles here (pair counts), so the
    * sums are exact and order-free, matching the distributed twin. */
  private def louvainRoundsWeighted(n: Int, off: Array[Int], nbr: Array[Int],
                                    w: Array[Double], deg: Array[Double],
                                    ids: Array[Long], m2: Double,
                                    rounds: Int): Array[Int] = {
    var comm = Array.tabulate(n)(identity)
    val dc = new Array[Double](n)
    val cnt = new Array[Double](n)
    val seen = new Array[Boolean](n)
    val touched = new Ints()
    var r = 1
    while (r <= rounds) {
      java.util.Arrays.fill(dc, 0.0)
      var i = 0
      while (i < n) { dc(comm(i)) += deg(i); i += 1 }
      val next = new Array[Int](n)
      var v = 0
      while (v < n) {
        if (java.lang.Math.floorMod(ids(v) + r, 2L) != 0L) next(v) = comm(v)
        else {
          touched.n = 0
          var k = off(v)
          while (k < off(v + 1)) {
            val c = comm(nbr(k))
            if (!seen(c)) { seen(c) = true; touched += c }
            cnt(c) += w(k)
            k += 1
          }
          val cur = comm(v); val d = deg(v)
          if (!seen(cur)) { seen(cur) = true; touched += cur }
          var bestC = -1; var bestScore = 0.0; var bestLabel = 0L
          var t = 0
          while (t < touched.n) {
            val c = touched(t)
            val dcx = if (c == cur) dc(c) - d else dc(c)
            val score = cnt(c) - (d * dcx) / m2
            val label = ids(c)
            if (bestC < 0 || score > bestScore ||
              (score == bestScore && label < bestLabel)) {
              bestC = c; bestScore = score; bestLabel = label
            }
            t += 1
          }
          t = 0
          while (t < touched.n) { cnt(touched(t)) = 0.0; seen(touched(t)) = false; t += 1 }
          next(v) = bestC
        }
        v += 1
      }
      comm = next
      r += 1
    }
    comm
  }

  /** Kruskal over the canonicalized (min,max,min-weight) edge set with the
    * (w,a,b) total order — the forest is unique under that order, so the
    * output edge set is identical to [[Algorithms.mst]]'s Borůvka. */
  def mst(edges: DataFrame): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val srcDs = edges.select(
        least(col("src"), col("dst")).cast("long"),
        greatest(col("src"), col("dst")).cast("long"),
        coalesce(col("weight"), lit(1.0)).cast("double"))
      .as[(Long, Long, Double)]
    inTask3(srcDs, cacheKey(srcDs.toDF())) { it =>
        val minW = mutable.HashMap.empty[(Long, Long), Double]
        it.foreach { case (a, b, w) =>
          if (a != b) {
            val k = (a, b)
            val prev = minW.getOrElse(k, Double.MaxValue)
            if (w < prev) minW.update(k, w)
          }
        }
        val sorted = minW.iterator.map { case ((a, b), w) => (w, a, b) }.toArray
        java.util.Arrays.sort(sorted, Ordering.Tuple3[Double, Long, Long])
        val vx = new Interner
        sorted.foreach { case (_, a, b) => vx.idx(a); vx.idx(b) }
        val p = Array.tabulate(vx.n)(identity)
        def find(x0: Int): Int = {
          var x = x0
          while (p(x) != x) { p(x) = p(p(x)); x = p(x) }
          x
        }
        sorted.iterator.flatMap { case (w, a, b) =>
          val ra = find(vx.idx(a)); val rb = find(vx.idx(b))
          if (ra != rb) { p(ra) = rb; Iterator.single((a, b, w)) } else Iterator.empty
        }
      }.toDF("a", "b", "w")
  }

  /** Multi-source BFS emitting (start, node, hops) for hops in
    * [minHops, maxHops] with per-start first-reach dedup — the exact row
    * set of `Traversals.varLengthExpand`. Starts ride into the task as
    * tagged rows (no driver collect). */
  def varLengthExpand(edges: DataFrame, starts: DataFrame, startCol: String,
                      minHops: Int, maxHops: Int): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val eProj = edges.select(col("src").cast("long"), col("dst").cast("long")).as[(Long, Long)]
    val key = cacheKey(eProj.toDF())
    hitPair(spark, key).foreach { g =>
      // resident edge stream (held by a pin handle): only the (tiny,
      // gated) start set rides a job
      val h = pin(g); val k = key.get
      return starts.select(col(startCol).cast("long")).distinct().as[Long]
        .repartition(1)
        .mapPartitions { sit =>
          val (as, bs) = pinGet(h.token, k).asInstanceOf[(Array[Long], Array[Long])]
          val ss = new Longs(16); sit.foreach(ss += _)
          vleBody(as, bs, ss, minHops, maxHops)
        }.toDF("start", "node", "hops")
    }
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"), lit(0))
      .as[(Long, Long, Int)]
    val s0 = starts.select(col(startCol).cast("long"), lit(0L), lit(1))
      .distinct().as[(Long, Long, Int)]
    e.unionAll(s0).repartition(1)
      .mapPartitions { it =>
        val ab = new Longs(); val bb = new Longs()
        val startIds = new Longs(16)
        it.foreach { case (a, b, t) =>
          if (t == 0) { ab += a; bb += b }
          else startIds += a
        }
        val as = ab.toArray; val bs = bb.toArray
        key.foreach(k => residentStoreLocal(k, (as, bs), as.length.toLong))
        vleBody(as, bs, startIds, minHops, maxHops)
      }.toDF("start", "node", "hops")
  }

  /** Multi-source BFS body shared by the tagged-stream and resident-cache
    * routes of [[varLengthExpand]]. */
  private def vleBody(as: Array[Long], bs: Array[Long], startIds: Longs,
                      minHops: Int, maxHops: Int): Iterator[(Long, Long, Int)] = {
        val vx = new Interner
        val sb = new Ints(); val db = new Ints()
        var ei = 0
        while (ei < as.length) { sb += vx.idx(as(ei)); db += vx.idx(bs(ei)); ei += 1 }
        val (off, tgt) = csr(vx.n, sb.result(), db.result())
        val n = vx.n
        val seenAt = new Array[Int](n) // visit stamp per start (1-based)
        (0 until startIds.n).iterator.flatMap { s =>
          val startId = startIds(s)
          val stamp = s + 1
          val out = mutable.ArrayBuffer.empty[(Long, Long, Int)]
          if (minHops == 0) out += ((startId, startId, 0))
          vx.idOf.get(startId) match {
            case None => // start not an edge endpoint: no hops ≥ 1 rows
            case Some(sIdx) =>
              seenAt(sIdx) = stamp
              var frontier = Array(sIdx)
              var h = 1
              while (frontier.nonEmpty && h <= maxHops) {
                val next = new Ints(16)
                var i = 0
                while (i < frontier.length) {
                  val v = frontier(i)
                  var k = off(v)
                  while (k < off(v + 1)) {
                    val w = tgt(k)
                    if (seenAt(w) != stamp) {
                      seenAt(w) = stamp
                      next += w
                      if (h >= minHops) out += ((startId, vx.ids(w), h))
                    }
                    k += 1
                  }
                  i += 1
                }
                frontier = next.result()
                h += 1
              }
          }
          out.iterator
        }
  }

  /** Lexicographic compare of long arrays (Spark's array ordering:
    * element-wise, shorter strict prefix sorts first). */
  private def cmpLongs(a: Array[Long], b: Array[Long]): Int = {
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) {
      val c = java.lang.Long.compare(a(i), b(i))
      if (c != 0) return c
      i += 1
    }
    Integer.compare(a.length, b.length)
  }

  /** One-witness shortest paths — the exact row set of
    * `Traversals.varLengthExpandPaths`: per (start, node) the
    * lexicographically-smallest (node-seq, edge-seq) among BFS min-depth
    * paths. Starts ride in as tagged rows. */
  def varLengthExpandPaths(edges: DataFrame, starts: DataFrame, startCol: String,
                           minHops: Int, maxHops: Int): DataFrame =
    pathExpand(edges, starts, startCol, minHops, maxHops, allPaths = false)

  /** All-distinct-node-sequence shortest paths — the exact row set of
    * `Traversals.varLengthExpandAllPaths`: every distinct min-depth node
    * sequence per (start, node), min edge-id witness per sequence. */
  def varLengthExpandAllPaths(edges: DataFrame, starts: DataFrame, startCol: String,
                              minHops: Int, maxHops: Int): DataFrame =
    pathExpand(edges, starts, startCol, minHops, maxHops, allPaths = true)

  /** Target-aware shortest paths (`shortestPath((a)-[*]-(b))` with BOTH
    * endpoints constrained): BFS per start that emits ONLY rows landing on a
    * target and STOPS at the depth where every target has been reached —
    * an unbounded `*` never explores past the last target's BFS depth.
    * Without this, `allShortestPaths` over `*` enumerates every distinct
    * shortest node-sequence to the whole component (combinatorial in
    * diamond-rich graphs) before the target filter ever runs. */
  def shortestPathsToTargets(edges: DataFrame, starts: DataFrame, startCol: String,
                             targets: DataFrame, targetCol: String,
                             minHops: Int, maxHops: Int, allPaths: Boolean): DataFrame =
    pathExpand(edges, starts, startCol, minHops, maxHops, allPaths,
      Some((targets, targetCol)))

  private def pathExpand(edges: DataFrame, starts: DataFrame, startCol: String,
                         minHops: Int, maxHops: Int, allPaths: Boolean,
                         targets: Option[(DataFrame, String)] = None): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val hasId = edges.columns.contains("id")
    val eidCol = if (hasId) col("id").cast("long") else lit(-1L)
    val eProj = edges.select(col("src").cast("long"), col("dst").cast("long"),
      eidCol.as("eid")).as[(Long, Long, Long)]
    val key = cacheKey(eProj.toDF())
    // starts tagged 1, targets tagged 2, in one tiny driver-side stream
    def tagged: Dataset[(Long, Int)] = {
      val s = starts.select(col(startCol).cast("long"), lit(1)).distinct()
        .as[(Long, Int)]
      targets match {
        case Some((t, tc)) =>
          s.unionAll(t.select(col(tc).cast("long"), lit(2)).distinct().as[(Long, Int)])
        case None => s
      }
    }
    hitTriple(spark, key).foreach {
      case g @ (_, _, _: Array[Long]) =>
        // resident edge stream (held by a pin handle)
        val h = pin(g); val k = key.get
        return tagged
          .repartition(1)
          .mapPartitions { sit =>
            val (as, bs, es) = pinGet(h.token, k)
              .asInstanceOf[(Array[Long], Array[Long], Array[Long])]
            val ss = new Longs(16)
            val ts = if (targets.isDefined) new Longs(16) else null
            sit.foreach { case (v, t) => if (t == 1) ss += v else ts += v }
            pathBody(as, bs, es, ss, minHops, maxHops, hasId, allPaths, ts)
          }.toDF("start", "node", "path", "epath", "hops")
      case _ => ()
    }
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"), eidCol, lit(0))
      .as[(Long, Long, Long, Int)]
    val s0 = tagged.map { case (v, t) => (v, 0L, 0L, t) }
    e.unionAll(s0).repartition(1)
      .mapPartitions { it =>
        val ab = new Longs(); val bb = new Longs(); val eb = new Longs()
        val startIds = new Longs(16)
        val targetIds = if (targets.isDefined) new Longs(16) else null
        it.foreach { case (a, b, eid, t) =>
          if (t == 0) { ab += a; bb += b; eb += eid }
          else if (t == 1) startIds += a
          else targetIds += a
        }
        val as = ab.toArray; val bs = bb.toArray; val es = eb.toArray
        key.foreach(k => residentStoreLocal(k, (as, bs, es), as.length.toLong))
        pathBody(as, bs, es, startIds, minHops, maxHops, hasId, allPaths, targetIds)
      }.toDF("start", "node", "path", "epath", "hops")
  }

  /** Witness-path BFS body shared by the tagged-stream and resident-cache
    * routes of [[pathExpand]]. */
  private def pathBody(as: Array[Long], bs: Array[Long], esIn: Array[Long],
                       startIds: Longs, minHops: Int, maxHops: Int,
                       hasId: Boolean, allPaths: Boolean,
                       targetIds: Longs = null)
      : Iterator[(Long, Long, Seq[Long], Seq[Long], Int)] = {
        val vx = new Interner
        val sb = new Ints(); val db = new Ints()
        var ei = 0
        while (ei < as.length) { sb += vx.idx(as(ei)); db += vx.idx(bs(ei)); ei += 1 }
        val (si, di, eids) = (sb.result(), db.result(), esIn)
        // target vertex indices (ids absent from the graph are unreachable
        // and simply never satisfied — the loop then ends at frontier
        // exhaustion like before)
        val tgtIdx: java.util.HashSet[Integer] =
          if (targetIds == null) null
          else {
            val s = new java.util.HashSet[Integer]()
            var ti = 0
            while (ti < targetIds.n) {
              vx.idOf.get(targetIds(ti)).foreach(ix => s.add(ix): Unit)
              ti += 1
            }
            s
          }
        // CSR over edge INDICES so parallel edges keep their own eid
        val n = vx.n
        val off = new Array[Int](n + 1)
        var k = 0
        while (k < si.length) { off(si(k) + 1) += 1; k += 1 }
        var i = 0
        while (i < n) { off(i + 1) += off(i); i += 1 }
        val eIdx = new Array[Int](si.length)
        val cur = java.util.Arrays.copyOf(off, math.max(n, 1))
        k = 0
        while (k < si.length) { val s = si(k); eIdx(cur(s)) = k; cur(s) += 1; k += 1 }
        val seenAt = new Array[Int](n)

        (0 until startIds.n).iterator.flatMap { s =>
          val startId = startIds(s)
          val stamp = s + 1
          val out = mutable.ArrayBuffer.empty[(Long, Long, Seq[Long], Seq[Long], Int)]
          if (minHops == 0 && (tgtIdx == null || targetIds.toArray.contains(startId)))
            out += ((startId, startId, Seq(startId), Seq.empty[Long], 0))
          vx.idOf.get(startId).foreach { sIdx =>
            // targets left to reach from THIS start; 0 => stop the BFS
            var remain =
              if (tgtIdx == null) Int.MaxValue
              else tgtIdx.size - (if (tgtIdx.contains(sIdx)) 1 else 0)
            seenAt(sIdx) = stamp
            // frontier rows: (nodeIdx, node-seq, edge-seq); paths mode keeps
            // one row per node, allPaths one per distinct node-seq
            var frontier = mutable.ArrayBuffer((sIdx, Array(startId), Array.empty[Long]))
            var h = 1
            while (frontier.nonEmpty && h <= maxHops) {
              // per (node, node-seq): min edge-seq; paths mode additionally
              // collapses to min (node-seq, edge-seq) per node afterwards
              val best = mutable.HashMap.empty[(Int, Seq[Long]), (Array[Long], Array[Long])]
              frontier.foreach { case (u, p, ep) =>
                var j = off(u)
                while (j < off(u + 1)) {
                  val ke = eIdx(j)
                  val w = di(ke)
                  if (seenAt(w) != stamp) {
                    val np = p :+ vx.ids(w)
                    val nep = if (hasId) ep :+ eids(ke) else ep
                    val key = (w, np.toSeq)
                    best.get(key) match {
                      case Some((_, oldEp)) if cmpLongs(nep, oldEp) >= 0 => ()
                      case _ => best.update(key, (np, nep))
                    }
                  }
                  j += 1
                }
              }
              val entries0 = best.iterator.map { case ((w, _), (p, ep)) => (w, p, ep) }.toArray
              val entries =
                if (allPaths) entries0
                else { // one witness per node: min (node-seq, edge-seq)
                  val perNode = mutable.HashMap.empty[Int, (Array[Long], Array[Long])]
                  entries0.foreach { case (w, p, ep) =>
                    perNode.get(w) match {
                      case Some((op, oep)) =>
                        val c = cmpLongs(p, op)
                        if (c < 0 || (c == 0 && cmpLongs(ep, oep) < 0)) perNode.update(w, (p, ep))
                      case None => perNode.update(w, (p, ep))
                    }
                  }
                  perNode.iterator.map { case (w, (p, ep)) => (w, p, ep) }.toArray
                }
              if (entries.isEmpty) frontier = mutable.ArrayBuffer.empty
              else {
                entries.foreach { case (w, _, _) =>
                  if (seenAt(w) != stamp) {
                    seenAt(w) = stamp
                    if (tgtIdx != null && tgtIdx.contains(w)) remain -= 1
                  }
                }
                if (h >= minHops)
                  entries.foreach { case (w, p, ep) =>
                    if (tgtIdx == null || tgtIdx.contains(w))
                      out += ((startId, vx.ids(w), p.toSeq, ep.toSeq, h))
                  }
                // every target reached: deeper levels can only add LONGER
                // paths to them — stop this start's BFS here
                frontier = if (remain <= 0) mutable.ArrayBuffer.empty
                           else mutable.ArrayBuffer.from(entries)
                h += 1
              }
            }
          }
          out.iterator
        }
  }

  /** Degree-oriented common-neighbor triangle total — replicates
    * [[Algorithms.triangleCount]] including multigraph quirks (duplicate
    * input rows orient and count per row; the common-neighbor set is
    * DISTINCT values, as `array_intersect` dedups). One-row result. */
  def triangleCount(undirected: DataFrame): DataFrame = {
    val spark = undirected.sparkSession
    import spark.implicits._
    val srcDs = undirected.select(col("a").cast("long"), col("b").cast("long")).as[(Long, Long)]
    inTask2(srcDs, cacheKey(srcDs.toDF())) { it =>
        Iterator.single(Tuple1(triangleSum(it)._1))
      }.toDF("triangles")
  }

  /** Per-vertex triangles + clustering coefficient — replicates
    * [[Algorithms.lcc]]'s corner attribution. */
  def lcc(undirected: DataFrame): DataFrame = {
    val spark = undirected.sparkSession
    import spark.implicits._
    val srcDs = undirected.select(col("a").cast("long"), col("b").cast("long")).as[(Long, Long)]
    inTask2(srcDs, cacheKey(srcDs.toDF())) { it =>
        val (_, vx, deg, tri) = triangleSum(it)
        (0 until vx.n).iterator.map { i =>
          val d = deg(i).toLong
          val t = tri(i)
          val l = if (d >= 2) t * 2.0 / (d * (d - 1)) else 0.0
          (vx.ids(i), d, t, l)
        }
      }.toDF("id", "deg", "triangles", "lcc")
  }

  /** Shared oriented-intersection pass. Returns (total, interner,
    * degree-with-duplicates, per-vertex triangle counts). */
  private def triangleSum(it: Iterator[(Long, Long)])
      : (Long, Interner, Array[Int], Array[Long]) = {
    val vx = new Interner
    val ea = new Ints(); val eb = new Ints()
    it.foreach { case (a, b) => ea += vx.idx(a); eb += vx.idx(b) }
    val n = vx.n
    val (ia, ib) = (ea.result(), eb.result())
    val deg = new Array[Int](n)
    var k = 0
    while (k < ia.length) { deg(ia(k)) += 1; deg(ib(k)) += 1; k += 1 }
    // orientation: lower (deg, id) endpoint → higher; adjacency of the LO
    // endpoint only, sorted by target id (matches sort_array(collect_list))
    def lower(x: Int, y: Int): Boolean =
      deg(x) < deg(y) || (deg(x) == deg(y) && vx.ids(x) < vx.ids(y))
    val los = new Array[Int](ia.length); val his = new Array[Int](ia.length)
    k = 0
    while (k < ia.length) {
      if (lower(ia(k), ib(k))) { los(k) = ia(k); his(k) = ib(k) }
      else { los(k) = ib(k); his(k) = ia(k) }
      k += 1
    }
    val (off, tgtRaw) = csr(n, los, his)
    // sort each adjacency segment by external id
    var v = 0
    while (v < n) {
      val seg = java.util.Arrays.copyOfRange(tgtRaw, off(v), off(v + 1))
        .sortBy(i => vx.ids(i))
      var i = 0
      while (i < seg.length) { tgtRaw(off(v) + i) = seg(i); i += 1 }
      v += 1
    }
    val tri = new Array[Long](n)
    var total = 0L
    // per oriented edge ROW: distinct common neighbors of adj(lo), adj(hi)
    k = 0
    while (k < los.length) {
      val lo = los(k); val hi = his(k)
      var i = off(lo); var j = off(hi)
      var nw = 0L
      var lastId = Long.MinValue
      while (i < off(lo + 1) && j < off(hi + 1)) {
        val xi = vx.ids(tgtRaw(i)); val xj = vx.ids(tgtRaw(j))
        if (xi < xj) i += 1
        else if (xi > xj) j += 1
        else {
          if (xi != lastId) { // distinct: array_intersect dedups
            nw += 1; tri(tgtRaw(i)) += 1; lastId = xi
          }
          i += 1; j += 1
        }
      }
      if (nw > 0) { tri(lo) += nw; tri(hi) += nw }
      total += nw
      k += 1
    }
    (total, vx, deg, tri)
  }
}
