package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted join — the manual skew mitigation [[Diagnostics.keySkewReport]]
  * exists to decide on. When one join key carries a dominant share of the
  * big side (share ≫ 1/parallelism), a plain shuffle join lands that key's
  * every row on ONE reducer and the stage runs at single-task speed no
  * matter the cluster size; AQE's skew-join split helps only
  * sort-merge-join stages it can see at runtime. Salting fixes it
  * structurally: the big side spreads each key over `salts` sub-keys with
  * a deterministic per-row hash, the small side replicates each row once
  * per salt, and the join runs on (key, salt) — the hot key becomes
  * `salts` independent reducer-sized pieces.
  *
  * Cost model: small side grows ×salts (it must actually be the small
  * side), big side is unchanged. The result is EXACTLY the plain inner
  * join's — pinned by the q_salted_join oracle, which computes the
  * unsalted join in SQL. */
object SkewJoin {

  /** Inner-join `big ⋈ small` on `key`, spread over `salts` sub-keys.
    * Output columns: big's then small's (minus its join key), like a
    * plain `join(small, key)`. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 salts: Int): DataFrame = {
    require(salts > 0, s"salts must be positive, got $salts")
    // per-row deterministic salt: hash the whole big row, not the key —
    // hashing the key would put the hot key's rows back on one sub-key
    val b = big.withColumn("__salt",
      pmod(xxhash64(struct(big.columns.map(col).toIndexedSeq: _*)), lit(salts.toLong)))
    val s = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1L))))
    b.join(s, Seq(key, "__salt")).drop("__salt")
  }
}
