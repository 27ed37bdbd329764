package graft

import graft.vector.VectorSearch
import org.apache.spark.sql.functions._

/** Int8 scalar quantization: code range, degenerate dims, and exact-top-k
  * recovery through the prefilter + re-rank pipeline. */
class QuantizeSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = Seq(
    (0L, Seq(1.0f, 0.0f, 5.0f)), (1L, Seq(0.9f, 0.1f, 5.0f)),
    (2L, Seq(-1.0f, 1.0f, 5.0f)), (3L, Seq(0.0f, -1.0f, 5.0f)),
    (4L, Seq(0.5f, 0.5f, 5.0f))).toDF("vec_id", "embedding")

  test("codes span [-127, 127] and a constant dimension quantizes to 0") {
    val (mins, maxs) = VectorSearch.quantizeMinMax(emb, "embedding", 3)
    assert(mins(0) == -1.0 && maxs(0) == 1.0)
    assert(mins(2) == 5.0 && maxs(2) == 5.0) // degenerate
    val codes = VectorSearch.quantizedCodes(emb, "vec_id", "embedding", mins, maxs)
      .orderBy("vec_id").collect().map(_.getSeq[Byte](1))
    assert(codes(0)(0) == 127 && codes(2)(0) == -127) // extremes hit the range ends
    assert(codes.forall(_(2) == 0))                   // degenerate dim → 0
    assert(codes.forall(_.forall(b => b >= -127 && b <= 127)))
  }

  test("quantized prefilter + exact re-rank returns the exact top-k") {
    val q = Seq(1.0f, 0.0f, 5.0f)
    val got = VectorSearch.knnQuantized(emb, "vec_id", "embedding", q, 3, candidates = 5)
      .select("vec_id").as[Long].collect().toSeq
    val exact = VectorSearch.knnExact(emb, "vec_id", "embedding", q, 3)
      .select("vec_id").as[Long].collect().toSeq
    assert(got == exact)
  }
}
