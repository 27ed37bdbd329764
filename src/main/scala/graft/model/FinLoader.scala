package graft.model

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** LDBC FinBench-shaped property graph — Account/Person/Company/Loan/Medium
  * with TRANSFER/OWN/DEPOSIT/GUARANTEE/INVEST/SIGN_IN edges carrying
  * (timestamp, amount, ratio) — derived deterministically from the TPC-H
  * testdata (the reference generates its FinBench fixture synthetically,
  * `benches/finbench_benchmark.rs:30-51`, `docs/ldbc/FINBENCH.md`; ours is a
  * pure-arithmetic projection so the DuckDB oracles in `FinQueries.FinPre`
  * recompute the identical graph — keep the two in sync).
  *
  *   Account  <- customer  (isBlocked = key%37=0, type = mktsegment)
  *   Person   <- supplier  (owns accounts with key ≡ s mod |supplier|)
  *   Company  <- part      (GUARANTEE near-key deltas 1/7; INVEST (p*7+1)%|part| -> p)
  *   Loan     <- orders with o_orderkey%10=0 (DEPOSIT to the order's customer)
  *   Medium   <- nation    (SIGN_IN: account -> its nation's medium)
  *   TRANSFER <- orders: forward (c -> (c+1+ok%7)%n, amount=totalprice) and
  *               backward (c -> (c-3)%n, amount=totalprice*0.25) — the ± delta
  *               mix makes the transfer graph connected and 3-cycle-rich
  *               (CR-3 shortest path / CR-4 cycle detection need both).
  *   timestamps are pure arithmetic (1.5e12 + o_orderkey*1e6 etc.), never
  *   epoch conversions — engine-timezone-proof.
  */
object FinLoader {

  val PersonOff: Long  = 20000000L
  val CompanyOff: Long = 30000000L
  val LoanOff: Long    = 40000000L
  val MediumOff: Long  = 50000000L

  private val memo =
    new java.util.concurrent.ConcurrentHashMap[(Int, String), PropertyGraph]()

  def fin(spark: SparkSession, dir: String): PropertyGraph =
    memo.computeIfAbsent((System.identityHashCode(spark), dir),
      _ => build(spark, dir))

  private val nodeProps = Seq(
    "name" -> "string", "isBlocked" -> "boolean", "accountType" -> "string",
    "mediumType" -> "string", "loanAmount" -> "double")

  private def nodeRow(id: Column, label: String, props: (String, Column)*): Seq[Column] = {
    val m = props.toMap
    Seq(id.cast("long").as("id"), array(lit(label)).as("labels")) ++
      nodeProps.map { case (n, t) => m.getOrElse(n, lit(null)).cast(t).as(n) }
  }

  private def edgeRow(id: Column, src: Column, dst: Column, rel: String,
                      amount: Column = lit(null), ts: Column = lit(null),
                      ratio: Column = lit(null)): Seq[Column] =
    Seq(id.cast("long").as("id"), src.cast("long").as("src"),
      dst.cast("long").as("dst"), lit(rel).as("relationship"),
      amount.cast("double").as("amount"), ts.cast("long").as("timestamp"),
      ratio.cast("double").as("ratio"))

  private def build(spark: SparkSession, dir: String): PropertyGraph = {
    val cust = Tables(spark, dir, "customer")
    val ord  = Tables(spark, dir, "orders")
    val part = Tables(spark, dir, "part")
    val supp = Tables(spark, dir, "supplier")
    val nat  = Tables(spark, dir, "nation")

    val nCust = cust.count()
    val nSupp = supp.count()
    val nPart = part.count()

    val ck = col("c_custkey"); val ok = col("o_orderkey"); val pk = col("p_partkey")

    val accounts = cust.select(nodeRow(ck, "Account",
      "isBlocked" -> (ck % 37 === 0), "accountType" -> col("c_mktsegment")): _*)
    val persons = supp.select(nodeRow(col("s_suppkey") + PersonOff, "Person",
      "name" -> col("s_name")): _*)
    val companies = part.select(nodeRow(pk + CompanyOff, "Company",
      "name" -> col("p_name")): _*)
    val loans = ord.filter(ok % 10 === 0).select(nodeRow(ok + LoanOff, "Loan",
      "loanAmount" -> col("o_totalprice")): _*)
    val media = nat.select(nodeRow(col("n_nationkey") + MediumOff, "Medium",
      "mediumType" -> col("n_name")): _*)

    val nodes = Seq(persons, companies, loans, media).foldLeft(accounts)(_ unionByName _)

    val ts = lit(1500000000000L) + ok * 1000000L
    val fwd = ord.select(edgeRow(lit(100000000000L) + ok * 2,
      col("o_custkey"), (col("o_custkey") + 1 + ok % 7) % nCust, "TRANSFER",
      col("o_totalprice"), ts): _*)
    val bwd = ord.select(edgeRow(lit(100000000000L) + ok * 2 + 1,
      col("o_custkey"), (col("o_custkey") + nCust - 3) % nCust, "TRANSFER",
      col("o_totalprice") * 0.25, ts): _*)
    val own = cust.select(edgeRow(lit(110000000000L) + ck,
      lit(PersonOff) + ck % nSupp, ck, "OWN", ts = lit(1400000000000L) + ck): _*)
    val deposit = ord.filter(ok % 10 === 0).select(edgeRow(lit(120000000000L) + ok,
      ok + LoanOff, col("o_custkey"), "DEPOSIT",
      col("o_totalprice") * 0.5, lit(1450000000000L) + ok): _*)
    val pk2 = part.select(pk.cast("long").as("dst0"))
    def guarantee(delta: Int, pred: Column, fam: Int): DataFrame =
      part.filter(pred)
        .select(pk.cast("long").as("src0"), (pk + delta).cast("long").as("dst0"))
        .join(pk2, Seq("dst0"), "left_semi")
        .select(edgeRow(lit(130000000000L) + col("src0") * 4 + fam,
          col("src0") + CompanyOff, col("dst0") + CompanyOff, "GUARANTEE",
          ts = lit(1460000000000L) + col("src0")): _*)
    val guaranteeE = guarantee(1, pk % 3 =!= 0, 0)
      .unionByName(guarantee(7, pk % 5 < 2, 1))
    val invest = part.select(edgeRow(lit(140000000000L) + pk,
      (pk * 7 + 1) % nPart + CompanyOff, pk + CompanyOff, "INVEST",
      ts = lit(1470000000000L) + pk, ratio = (pk % 10) * 0.05): _*)
    val signIn = cust.select(edgeRow(lit(150000000000L) + ck,
      ck, col("c_nationkey") + MediumOff, "SIGN_IN",
      ts = lit(1480000000000L) + ck): _*)

    val edges = Seq(bwd, own, deposit, guaranteeE, invest, signIn)
      .foldLeft(fwd)(_ unionByName _)

    val srcTables = Seq("customer", "orders", "part", "supplier", "nation")
    val gv = "fin-v2" // v2: hive-partitioned MVs; bump on ANY derivation change
    // single-label graph: partition nodes by labels[0] and edges by type so
    // label / edge-type scans prune to their directories (see SnbLoader)
    val nodesMv = SharedMv(spark, dir, srcTables, "fin_nodes", gv,
      partitionCols = Seq("labelset"))(
      nodes.withColumn("labelset", col("labels").getItem(0))
        .repartition(col("labelset"), pmod(hash(col("id")), lit(4))))
    val edgesMv = SharedMv(spark, dir, srcTables, "fin_edges", gv,
      partitionCols = Seq("relationship"))(
      edges.repartition(col("relationship"), pmod(hash(col("id")), lit(4))))

    def byLbl(l: String) = nodesMv.filter(col("labelset") === l).drop("labelset")
    val byLabel = Seq("Account", "Person", "Company", "Loan", "Medium")
      .map(l => l -> byLbl(l)).toMap
    PropertyGraph(nodesMv.drop("labelset"), edgesMv, byLabel,
      statsKey = Some(s"fin:$dir"))
  }
}
