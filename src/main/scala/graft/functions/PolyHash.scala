package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native polynomial string hash: fold over the UTF-8 bytes of the input,
  * `h = (h * 131 + byte) mod 1000003`, starting from 0.
  *
  * Why a custom Catalyst `Expression`: the portable formulation
  * (`aggregate(transform(split(tok, "")), …)`) is a nest of higher-order
  * functions — CodegenFallback, interpreted per ELEMENT, allocating a
  * row per character. On the DSIR feature stream (every token + bigram of
  * a corpus) that interpreted fold dominated the whole operator. This is
  * ONE tree node whose `doGenCode` emits a tight byte loop inside
  * whole-stage codegen.
  *
  * Semantics are identical to the HOF form ON ASCII input (the DSIR
  * features are lowercased and stripped to [a-z0-9_] before hashing;
  * DuckDB's `ord` = code point = UTF-8 byte there). Non-ASCII bytes fold
  * as unsigned bytes — fine for a hash, but callers wanting cross-engine
  * equality must normalize first, as [[graft.text.TextAnalysis]] does.
  * Empty string hashes to 0; null propagates.
  *
  * Registered as the SQL function `graft_polyhash` by
  * [[graft.GraftExtensions]].
  */
case class PolyHash(child: Expression) extends UnaryExpression {

  override def prettyName: String = "graft_polyhash"
  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_polyhash requires a string argument, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = (h * 131L + (bytes(i) & 0xFF)) % 1000003L
      i += 1
    }
    h
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      s"""
         |byte[] $bytes = $c.getBytes();
         |long $h = 0L;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  $h = ($h * 131L + ($bytes[$i] & 0xFF)) % 1000003L;
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)
}
