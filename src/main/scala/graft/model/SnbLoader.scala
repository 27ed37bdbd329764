package graft.model

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** LDBC SNB-shaped property graph, derived DETERMINISTICALLY from the TPC-H
  * testdata so the DuckDB oracles can recompute the identical graph in SQL
  * (`LdbcQueries.SnbSql` mirrors every rule below — keep the two in sync).
  *
  * The reference's flagship validation is the 21-query SNB Interactive read
  * suite over its CSV-loaded SF1 social network (`benches/ldbc_common/
  * mod.rs:50-143`, `benches/ldbc_benchmark.rs:54-325`, `docs/ldbc/
  * SNB_INTERACTIVE.md`). We reproduce the schema — Person/KNOWS, Post,
  * Comment/REPLY_OF, Forum/HAS_MEMBER/CONTAINER_OF, Tag/TagClass,
  * Place, Organisation/WORK_AT, LIKES, HAS_INTEREST — as a projection of
  * the driver's tables:
  *
  *   Person        <- customer   (firstName = mktsegment, lastName = name)
  *   KNOWS         <- arithmetic near-key rules (deltas 1/4/13, see below)
  *   Post          <- orders     (creator = o_custkey, date = o_orderdate)
  *   Comment       <- lineitem   (replyOf = order's post; id dedup'd — the
  *                                (l_orderkey, l_linenumber) collision rule)
  *   Forum         <- supplier   (CONTAINER_OF / HAS_MEMBER by o_orderkey
  *                                mod |supplier|; moderator = min customer
  *                                of the supplier's nation)
  *   Tag           <- part       (post HAS_TAG its lineitems' parts)
  *   TagClass      <- p_type     (id = min partkey of the type)
  *   Place         <- nation (Country) + region (Continent)
  *   Organisation  <- supplier   (WORK_AT with workFrom year)
  *   LIKES         <- orders     (the two "next customers" like each post)
  *   HAS_INTEREST  <- orders x lineitem (creator interested in post tags)
  *
  * All rules are pure key arithmetic + joins — no RNG, no row_number — so
  * Spark and DuckDB derive bit-identical graphs at any scale factor.
  */
object SnbLoader {

  // Node id-space offsets (disjoint by construction; person id = c_custkey).
  val PostOff: Long     = 10000000L
  val CommentOff: Long  = 100000000L   // CommentOff + l_orderkey*8 + l_linenumber
  val TagOff: Long      = 1000000000L
  val ForumOff: Long    = 1100000000L
  val TagClassOff: Long = 1200000000L
  val CountryOff: Long  = 1300000000L
  val ContinentOff: Long = 1400000000L
  val OrgOff: Long      = 1500000000L

  private val memo =
    new java.util.concurrent.ConcurrentHashMap[(Int, String, Boolean), PropertyGraph]()

  def snb(spark: SparkSession, dir: String): PropertyGraph =
    memo.computeIfAbsent((System.identityHashCode(spark), dir, false),
      _ => build(spark, dir, zipf = false))

  /** The DATAGEN-SHAPED twin (r14 verdict task #7): identical projection
    * except KNOWS additionally carries the deterministic power-law hub
    * families — edge (a, a mod 2^j) for even j in [2, 16] wherever the
    * target is a distinct existing person. Hub b's degree is
    * Σ_{2^j > b} n/2^j ≈ 2n/2^ceil(log2 b) ∝ n/b — a Zipf tail like
    * LDBC datagen's KNOWS (facebookDegreeDistribution), from pure key
    * arithmetic the DuckDB oracles replay exactly (`LdbcQueries.PreZipf`).
    * Friend-of-friend sets through the hubs genuinely explode (any
    * 2-hop neighborhood contains a hub's whole modulus class), which is
    * the IC3/IC5/IC6/IC10 workload character the near-key graph's flat
    * deg ≈ 2.5 could not produce. */
  def snbZipf(spark: SparkSession, dir: String): PropertyGraph =
    memo.computeIfAbsent((System.identityHashCode(spark), dir, true),
      _ => build(spark, dir, zipf = true))

  private val anchorMemo =
    new java.util.concurrent.ConcurrentHashMap[(Int, String, Boolean), (Long, String, Long)]()

  /** Stats-derived workload anchors (r11 verdict task #8): the reference
    * curates Interactive parameters from graph statistics — percentile-of-
    * degree anchors — rather than fixed literals
    * (`benches/ldbc_common/mod.rs:460-628`). Here:
    *   - anchor PERSON = minimum id whose undirected KNOWS degree equals
    *     the 90th percentile of degree over persons who authored ≥1 post
    *     (the "active, well-connected person" workload character; post
    *     authorship keeps the message-feed reads non-empty);
    *   - anchor TAG = name of the minimum-id tag whose HAS_TAG in-degree
    *     equals the 90th percentile of tag degrees;
    *   - path TARGET (IC13/IC14) = maximum id at KNOWS-distance EXACTLY 3
    *     from the anchor person — derived with the same r1/r2/r3 reach
    *     sets the oracles already share, and near enough that the oracle's
    *     bounded walk enumeration stays tractable (an arbitrary-distance
    *     target makes the all-shortest-paths UNION ALL walk explode).
    * Discrete percentile = sorted element at index ceil(0.9·n) (the
    * [[graft.functions.CypherFunctions.percentileDisc]] rule); the DuckDB
    * oracles recompute the identical anchors in SQL with the same
    * ORDER BY/OFFSET formulation (`LdbcQueries.Pre` adeg/anchor/tdeg/atag
    * CTEs — keep in sync). A few tiny aggregate jobs, memoized per
    * (session, dataset). */
  def anchors(spark: SparkSession, dir: String): (Long, String, Long) =
    anchorsOf(spark, dir, zipf = false)

  /** [[anchors]] over the [[snbZipf]] graph — the same percentile-of-degree
    * derivation; on the power-law KNOWS the p90-degree anchor sits near
    * the hub tiers, so its 1..2-hop reach is genuinely large. */
  def anchorsZipf(spark: SparkSession, dir: String): (Long, String, Long) =
    anchorsOf(spark, dir, zipf = true)

  private def anchorsOf(spark: SparkSession, dir: String,
                        zipf: Boolean): (Long, String, Long) =
    anchorMemo.computeIfAbsent((System.identityHashCode(spark), dir, zipf), _ => {
      val g = if (zipf) snbZipf(spark, dir) else snb(spark, dir)
      val k = g.edges.filter(col("relationship") === "KNOWS")
        .select(col("src").as("s"), col("dst").as("d"))
      val ku = k.unionAll(k.select(col("d").as("s"), col("s").as("d")))
      // post authors only: HAS_CREATOR src in the Post id space (comments
      // carry the same edge type from the Comment id space)
      val authors = g.edges.filter(col("relationship") === "HAS_CREATOR" &&
          col("src") >= PostOff && col("src") < CommentOff)
        .select(col("dst").as("s")).distinct()
      val adeg = ku.join(authors, Seq("s"), "left_semi")
        .groupBy(col("s")).agg(count(lit(1)).as("deg"))
        .localCheckpoint(true) // consumed by the percentile and the argmin
      val p90 = adeg.agg(
        graft.functions.CypherFunctions.percentileDisc(col("deg"), lit(0.9)))
        .first().getLong(0)
      val pid = adeg.filter(col("deg") === p90)
        .agg(min(col("s"))).first().getLong(0)
      val tdeg = g.edges.filter(col("relationship") === "HAS_TAG")
        .groupBy(col("dst").as("tid")).agg(count(lit(1)).as("deg"))
        .localCheckpoint(true)
      val tp90 = tdeg.agg(
        graft.functions.CypherFunctions.percentileDisc(col("deg"), lit(0.9)))
        .first().getLong(0)
      val tid = tdeg.filter(col("deg") === tp90)
        .agg(min(col("tid"))).first().getLong(0)
      val tname = g.nodes.filter(col("id") === tid)
        .select(col("name")).first().getString(0)
      // distance-exactly-3 target: mirror the oracles' r1/r2/r3 reach CTEs
      val r1 = ku.filter(col("s") === pid).select(col("d").as("id")).distinct()
        .localCheckpoint(true)
      val r2 = ku.join(r1.withColumnRenamed("id", "s"), Seq("s"), "left_semi")
        .select(col("d").as("id")).distinct().localCheckpoint(true)
      val r3 = ku.join(r2.withColumnRenamed("id", "s"), Seq("s"), "left_semi")
        .select(col("d").as("id")).distinct()
      val reach2 = r1.unionAll(r2).distinct()
      val target = r3.join(reach2, Seq("id"), "left_anti")
        .filter(col("id") =!= pid)
        .agg(coalesce(max(col("id")), lit(pid))).first().getLong(0)
      (pid, tname, target)
    })

  /** IC3/IC11 stats-derived filter parameters (r12 verdict task #2). */
  final case class IcParams(nation1: String, nation2: String,
                            from: String, to: String,
                            org: String, yearLt: Long)

  // Keyed on the dataset dir ALONE: the derived params depend only on the
  // (immutable) data under `dir`, and a session-identity component would
  // both accumulate entries for stopped sessions and, on an identity-hash
  // collision between a GC'd and a new session, serve memoized params
  // without recomputation anyway — same behavior, no leak.
  private val icMemo =
    new java.util.concurrent.ConcurrentHashMap[(String, Boolean), IcParams]()

  /** IC3's (nation pair, date window) and IC11's (organisation, workFrom
    * bound), derived from the curated anchor's ACTUAL 1..2-hop neighborhood
    * so the rows are non-empty BY CONSTRUCTION at any scale factor — the
    * r12 percentile anchors made both queries vacuous (0 == 0 greens)
    * because the fixed literals missed the new anchor's neighborhood:
    *   - IC3 nations = the two most-posted-from countries among the
    *     friend set's posts (count DESC, name ASC); window = the modal
    *     post YEAR within those countries (count DESC, year ASC), as
    *     [year-01-01, year+1-01-01) — the modal year has >=1 post;
    *   - IC11 org = the friend set's modal WORK_AT employer (count DESC,
    *     id ASC); workFrom bound = p50(workFrom at that org) + 1, so the
    *     p50 element itself always qualifies.
    * The DuckDB oracles recompute the identical parameters in SQL
    * (`LdbcQueries.Pre` fr2/fpost/ic3nat/ic3yr/fwork/ic11org/ic11wf CTEs
    * — keep in sync; same percentileDisc OFFSET formulation as `anchor`).
    * Reference parameter-curation character: `benches/ldbc_common/
    * mod.rs:460-628`. Tiny aggregate jobs, memoized per dataset dir. */
  def icParams(spark: SparkSession, dir: String): IcParams =
    icParamsOf(spark, dir, zipf = false)

  /** [[icParams]] over the [[snbZipf]] graph. */
  def icParamsZipf(spark: SparkSession, dir: String): IcParams =
    icParamsOf(spark, dir, zipf = true)

  private def icParamsOf(spark: SparkSession, dir: String,
                         zipf: Boolean): IcParams =
    icMemo.computeIfAbsent((dir, zipf), _ => {
      val (pid, _, _) = anchorsOf(spark, dir, zipf)
      val g = if (zipf) snbZipf(spark, dir) else snb(spark, dir)
      val k = g.edges.filter(col("relationship") === "KNOWS")
        .select(col("src").as("s"), col("dst").as("d"))
      val ku = k.unionAll(k.select(col("d").as("s"), col("s").as("d")))
      val r1 = ku.filter(col("s") === pid).select(col("d").as("id")).distinct()
        .localCheckpoint(true)
      val r2 = ku.join(r1.withColumnRenamed("id", "s"), Seq("s"), "left_semi")
        .select(col("d").as("id")).distinct()
      // the oracles' reach2 \ {anchor} — the IC3/IC11 friend set
      val fr2 = r1.unionAll(r2).distinct().filter(col("id") =!= pid)
        .localCheckpoint(true) // consumed by fposts AND fw
      val postCreator = g.edges.filter(col("relationship") === "HAS_CREATOR" &&
          col("src") >= PostOff && col("src") < CommentOff)
        .select(col("src").as("mid"), col("dst").as("creator"))
      val postLoc = g.edges.filter(col("relationship") === "IS_LOCATED_IN" &&
          col("src") >= PostOff && col("src") < CommentOff)
        .select(col("src").as("mid"), col("dst").as("cid"))
      val countries = g.nodes.filter(col("id") >= CountryOff && col("id") < ContinentOff)
        .select(col("id").as("cid"), col("name").as("cname"))
      val fposts = postCreator
        .join(fr2.withColumnRenamed("id", "creator"), Seq("creator"), "left_semi")
        .join(postLoc, Seq("mid")).join(countries, Seq("cid"))
        .localCheckpoint(true) // consumed by the nation top-2 AND the year
      val top2 = fposts.groupBy(col("cname")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("cname")).limit(2)
        .select(col("cname")).collect().map(_.getString(0))
      require(top2.nonEmpty, s"IC3 derivation: anchor $pid's friends authored no posts")
      val (n1, n2) = (top2(0), if (top2.length > 1) top2(1) else top2(0))
      val dates = g.nodes.filter(col("id") >= PostOff && col("id") < CommentOff)
        .select(col("id").as("mid"), col("creationDate"))
      val year = fposts.filter(col("cname").isin(top2.toSeq: _*))
        .join(dates, Seq("mid"))
        .groupBy(substring(col("creationDate"), 1, 4).as("y"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("y")).limit(1)
        .select(col("y")).first().getString(0).toInt
      val fw = g.edges.filter(col("relationship") === "WORK_AT")
        .join(fr2.withColumnRenamed("id", "src"), Seq("src"), "left_semi")
        .select(col("dst").as("oid"), col("workFrom"))
        .localCheckpoint(true) // consumed by the org argmax AND the p50
      val oid = fw.groupBy(col("oid")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("oid")).limit(1).first().getLong(0)
      val orgName = g.nodes.filter(col("id") === oid)
        .select(col("name")).first().getString(0)
      val yearLt = fw.filter(col("oid") === oid)
        .agg(graft.functions.CypherFunctions.percentileDisc(col("workFrom"), lit(0.5)))
        .first().getLong(0) + 1
      IcParams(n1, n2, s"$year-01-01", s"${year + 1}-01-01", orgName, yearLt)
    })

  /** Canonical node schema: one typed column per SNB property in use. */
  private val nodeProps = Seq(
    "firstName" -> "string", "lastName" -> "string", "gender" -> "string",
    "birthday" -> "long", "creationDate" -> "string", "locationIP" -> "string",
    "browserUsed" -> "string", "content" -> "string", "imageFile" -> "string",
    "title" -> "string", "name" -> "string")

  private def nodeRow(id: Column, labels: Seq[String], props: (String, Column)*): Seq[Column] = {
    val m = props.toMap
    Seq(id.cast("long").as("id"), array(labels.map(lit): _*).as("labels")) ++
      nodeProps.map { case (n, t) =>
        m.getOrElse(n, lit(null)).cast(t).as(n)
      }
  }

  private def edgeRow(id: Column, src: Column, dst: Column, rel: String,
                      workFrom: Column = lit(null)): Seq[Column] =
    Seq(id.cast("long").as("id"), src.cast("long").as("src"),
      dst.cast("long").as("dst"), lit(rel).as("relationship"),
      workFrom.cast("long").as("workFrom"))

  private def build(spark: SparkSession, dir: String,
                    zipf: Boolean): PropertyGraph = {
    val cust = Tables(spark, dir, "customer")
    val ord  = Tables(spark, dir, "orders")
    val li   = Tables(spark, dir, "lineitem")
    val part = Tables(spark, dir, "part")
    val supp = Tables(spark, dir, "supplier")
    val nat  = Tables(spark, dir, "nation")
    val reg  = Tables(spark, dir, "region")

    // Stats-class driver scalars (the oracle's `(SELECT count(*) FROM …)`):
    // two tiny counts, computed once per (session, dataset) and baked into
    // the MV — never a per-row driver loop.
    val nCust = cust.count()
    val nSupp = supp.count()

    val ck = col("c_custkey")
    val persons = cust.select(nodeRow(ck, Seq("Person"),
      "firstName" -> col("c_mktsegment"), "lastName" -> col("c_name"),
      "gender" -> when(ck % 2 === 0, "male").otherwise("female"),
      "birthday" -> (ck % 365),
      "creationDate" -> (ck % 1000).cast("long").cast("string"),
      "locationIP" -> concat((ck % 256).cast("long").cast("string"), lit("."),
        col("c_nationkey").cast("long").cast("string")),
      "browserUsed" -> when(ck % 3 === 0, "Firefox")
        .when(ck % 3 === 1, "Chrome").otherwise("Safari")): _*)

    val ok = col("o_orderkey")
    // posts carry the creator's nation for IS_LOCATED_IN
    val postBase = ord.join(cust, col("o_custkey") === ck)
      .select((ok + PostOff).as("pid"), col("o_custkey").as("creator"),
        when(ok % 5 === 0, lit(null)).otherwise(col("o_orderpriority")).as("content"),
        when(ok % 5 === 0, concat(col("o_orderpriority"), lit(".jpg"))).as("imageFile"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("cdate"),
        (lit(ForumOff) + ok % nSupp).as("forum"),
        (col("c_nationkey") + CountryOff).as("country"), ok.as("okey"))
    val posts = postBase.select(nodeRow(col("pid"), Seq("Post"),
      "content" -> col("content"), "imageFile" -> col("imageFile"),
      "creationDate" -> col("cdate")): _*)

    // comment id collides where (l_orderkey, l_linenumber) repeats — the
    // known testdata rule; min-aggregation makes the dedup deterministic
    val cmtBase = li.groupBy(
        (col("l_orderkey") * 8 + col("l_linenumber") + CommentOff).as("cid"),
        col("l_orderkey").as("cok"))
      .agg(min("l_partkey").as("pk"), min("l_suppkey").as("sk"),
        date_format(min("l_shipdate"), "yyyy-MM-dd").as("cdate"),
        concat(min("l_returnflag"), lit("/"), min("l_linestatus")).as("ccontent"))
      .withColumn("creator", (col("pk") * 31 + col("sk")) % nCust)
    val cmtLoc = cmtBase.join(supp, col("sk") === col("s_suppkey"))
      .select(col("cid"), (col("s_nationkey") + CountryOff).as("country"))
    val comments = cmtBase.select(nodeRow(col("cid"), Seq("Comment"),
      "content" -> col("ccontent"), "creationDate" -> col("cdate")): _*)

    val forums = supp.select(nodeRow(col("s_suppkey") + ForumOff, Seq("Forum"),
      "title" -> col("s_name")): _*)
    val tags = part.select(nodeRow(col("p_partkey") + TagOff, Seq("Tag"),
      "name" -> col("p_name")): _*)
    val tagClasses = part.groupBy(col("p_type")).agg(min("p_partkey").as("mpk"))
      .select(nodeRow(col("mpk") + TagClassOff, Seq("TagClass"),
        "name" -> col("p_type")): _*)
    val countries = nat.select(nodeRow(col("n_nationkey") + CountryOff,
      Seq("Place", "Country"), "name" -> col("n_name")): _*)
    val continents = reg.select(nodeRow(col("r_regionkey") + ContinentOff,
      Seq("Place", "Continent"), "name" -> col("r_name")): _*)
    val orgs = supp.select(nodeRow(col("s_suppkey") + OrgOff, Seq("Organisation"),
      "name" -> col("s_name")): _*)

    val nodes = Seq(posts, comments, forums, tags, tagClasses, countries,
      continents, orgs).foldLeft(persons)(_ unionByName _)

    // ---- edges ----------------------------------------------------------

    // KNOWS: near-key rules — (a, a+1) unless a%3=0; (a, a+4) when a%7<3;
    // (a, a+13) when a%11<2. Sparse (deg ≈ 2.5), connected, triangle-free
    // (no delta pair sums to a third), and SF-agnostic: the dst-existence
    // check is a semi-join, not a count bound.
    val pk2 = cust.select(ck.cast("long").as("dst"))
    def knows(delta: Int, pred: Column, fam: Int): DataFrame =
      cust.filter(pred)
        .select(ck.cast("long").as("src"), (ck + delta).cast("long").as("dst"))
        .join(pk2, Seq("dst"), "left_semi")
        .select(edgeRow(lit(2000000000L) + col("src") * 8 + fam,
          col("src"), col("dst"), "KNOWS"): _*)
    val knowsNear = knows(1, ck % 3 =!= 0, 0)
      .unionByName(knows(4, ck % 7 < 3, 1))
      .unionByName(knows(13, ck % 11 < 2, 2))
    // Zipf variant: add the power-law hub families — (a, a mod 2^j) for
    // even j in [2, 16] when the target exists and differs. deg(hub b) ≈
    // Σ_{2^j > b} n/2^j ∝ n/b. DISTINCT over the families (a's low bits
    // can make several j collapse to the same target); near-key pairs
    // never collide with these (near-key dst > src, hub dst < src), so
    // the union stays pair-distinct and `ku`'s both-ways UNION ALL keeps
    // exact multiplicity 1 per direction. dst < 2^16 bounds make
    // 20e9 + src*65536 + dst a unique id clear of every other edge space.
    val knowsE =
      if (!zipf) knowsNear
      else {
        val hub = (2 to 16 by 2).map { j =>
          val m = 1L << j
          cust.filter(ck >= m)
            .select(ck.cast("long").as("src"), (ck % m).cast("long").as("dst"))
            .filter(col("dst") =!= col("src"))
        }.reduce(_ unionAll _).distinct()
          .join(pk2, Seq("dst"), "left_semi")
          .select(edgeRow(lit(20000000000L) + col("src") * 65536L + col("dst"),
            col("src"), col("dst"), "KNOWS"): _*)
        knowsNear.unionByName(hub)
      }

    val postCreator = postBase.select(edgeRow(lit(3000000000L) + col("okey"),
      col("pid"), col("creator"), "HAS_CREATOR"): _*)
    val containerOf = postBase.select(edgeRow(lit(4000000000L) + col("okey"),
      col("forum"), col("pid"), "CONTAINER_OF"): _*)
    val postLoc = postBase.select(edgeRow(lit(5000000000L) + col("okey"),
      col("pid"), col("country"), "IS_LOCATED_IN"): _*)
    // the two "next customers" like each post (distinct by construction:
    // +1 and +17 never coincide mod |customer|)
    val likes = postBase.select(edgeRow(lit(6000000000L) + col("okey") * 4,
        (col("creator") + 1) % nCust, col("pid"), "LIKES"): _*)
      .unionByName(postBase.select(edgeRow(lit(6000000000L) + col("okey") * 4 + 1,
        (col("creator") + 17) % nCust, col("pid"), "LIKES"): _*))
    val member = ord.select((lit(ForumOff) + ok % nSupp).as("fid"),
        col("o_custkey").as("mid")).distinct()
      .select(edgeRow(lit(7000000000L) + (col("fid") - ForumOff) * 1000000L + col("mid"),
        col("fid"), col("mid"), "HAS_MEMBER"): _*)
    val cmtCreator = cmtBase.select(edgeRow(lit(8000000000L) + (col("cid") - CommentOff),
      col("cid"), col("creator"), "HAS_CREATOR"): _*)
    val replyOf = cmtBase.select(edgeRow(lit(9000000000L) + (col("cid") - CommentOff),
      col("cid"), col("cok") + PostOff, "REPLY_OF"): _*)
    val cmtLocE = cmtLoc.select(edgeRow(lit(10000000000L) + (col("cid") - CommentOff),
      col("cid"), col("country"), "IS_LOCATED_IN"): _*)
    val postTag = li.select((col("l_orderkey") + PostOff).as("mid"),
        (col("l_partkey") + TagOff).as("tid"), col("l_orderkey").as("lok"),
        col("l_partkey").as("lpk")).distinct()
      .select(edgeRow(lit(1000000000000L) + col("lok") * 1000000L + col("lpk"),
        col("mid"), col("tid"), "HAS_TAG"): _*)
    val interest = ord.join(li, col("l_orderkey") === ok)
      .select(col("o_custkey").as("pid"), (col("l_partkey") + TagOff).as("tid"),
        col("l_partkey").as("lpk")).distinct()
      .select(edgeRow(lit(2000000000000L) + col("pid") * 1000000L + col("lpk"),
        col("pid"), col("tid"), "HAS_INTEREST"): _*)
    val workAt = cust.select(edgeRow(lit(12000000000L) + ck,
      ck, lit(OrgOff) + ck % nSupp, "WORK_AT", lit(1990) + ck % 25): _*)
    val hasType = part.join(
        part.groupBy(col("p_type").as("t2")).agg(min("p_partkey").as("mpk")),
        col("p_type") === col("t2"))
      .select(edgeRow(lit(13000000000L) + col("p_partkey"),
        col("p_partkey") + TagOff, col("mpk") + TagClassOff, "HAS_TYPE"): _*)
    val moderator = supp.join(
        cust.groupBy(col("c_nationkey").as("mn")).agg(min("c_custkey").as("mc")),
        col("s_nationkey") === col("mn"))
      .select(edgeRow(lit(14000000000L) + col("s_suppkey"),
        col("s_suppkey") + ForumOff, col("mc"), "HAS_MODERATOR"): _*)
    val partOf = nat.select(edgeRow(lit(15000000000L) + col("n_nationkey"),
      col("n_nationkey") + CountryOff, col("n_regionkey") + ContinentOff,
      "IS_PART_OF"): _*)
    val personLoc = cust.select(edgeRow(lit(16000000000L) + ck,
      ck, col("c_nationkey") + CountryOff, "IS_LOCATED_IN"): _*)

    val edges = Seq(postCreator, containerOf, postLoc, likes, member,
      cmtCreator, replyOf, cmtLocE, postTag, interest, workAt, hasType,
      moderator, partOf, personLoc).foldLeft(knowsE)(_ unionByName _)

    // Materialize once per dataset (content-fingerprinted parquet MV — the
    // union re-reads lineitem 4x otherwise; same rationale as the TPC-H
    // graph MV). Bump the version on ANY derivation change above.
    val srcTables = Seq("customer", "orders", "lineitem", "part",
      "supplier", "nation", "region")
    val gv = "snb-v2" // v2: hive-partitioned MVs (labelset / relationship)
    // the two KNOWS variants are DIFFERENT graphs sharing one builder
    // (and therefore one bytecode fingerprint) — the MV name must carry
    // the variant or whichever builds first poisons the other's reads
    val mvBase = if (zipf) "snb_zipf" else "snb"
    // nodes partitioned by the label SET (single string: "Place|Country"),
    // so a label scan prunes to its directories — the label index as
    // storage layout. The helper column is dropped before the graph is
    // published (it must not appear in properties()/schema output).
    val labelSets = Seq(Seq("Person"), Seq("Post"), Seq("Comment"),
      Seq("Forum"), Seq("Tag"), Seq("TagClass"), Seq("Place", "Country"),
      Seq("Place", "Continent"), Seq("Organisation"))
    val nodesMv = SharedMv(spark, dir, srcTables, s"${mvBase}_nodes", gv,
      partitionCols = Seq("labelset"))(
      nodes.withColumn("labelset", concat_ws("|", col("labels")))
        .repartition(col("labelset"), pmod(hash(col("id")), lit(4))))
    val edgesMv = SharedMv(spark, dir, srcTables, s"${mvBase}_edges", gv,
      partitionCols = Seq("relationship"))(
      edges.repartition(col("relationship"), pmod(hash(col("id")), lit(4))))

    def byLbl(l: String) = {
      val sets = labelSets.filter(_.contains(l)).map(_.mkString("|"))
      nodesMv.filter(col("labelset").isin(sets: _*)).drop("labelset")
    }
    val byLabel = Seq("Person", "Post", "Comment", "Forum", "Tag", "TagClass",
      "Place", "Country", "Continent", "Organisation").map(l => l -> byLbl(l)).toMap

    PropertyGraph(nodesMv.drop("labelset"), edgesMv, byLabel,
      statsKey = Some(s"snb:$dir"))
  }
}
