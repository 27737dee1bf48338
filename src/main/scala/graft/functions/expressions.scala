package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import graft.core.{BlockedBloomFilter, Hashing}

/** Native scalar expressions with codegen — these stay inside
  * whole-stage-generated code, so a scan -> hash -> probe pipeline runs
  * without UDF boxing or per-row closure dispatch.
  */
object expressions {

  /** splitmix64 of an int token id (the engine-wide token hash). */
  case class TokenHash64(child: Expression) extends UnaryExpression {
    override def prettyName: String = "token_hash64"
    override def dataType: DataType = LongType
    override protected def nullSafeEval(v: Any): Any =
      Hashing.tokenHash(v.asInstanceOf[Int])
    override protected def doGenCode(ctx: CodegenContext,
                                     ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"graft.core.Hashing.splitmix64((long)($c))")
    override protected def withNewChildInternal(c: Expression): TokenHash64 =
      copy(child = c)
  }

  /** FNV-1a 64 of a string (the reference's string-key adapter,
    * /root/reference/example_test.go:29-46).
    */
  case class Fnv1a64(child: Expression) extends UnaryExpression {
    override def prettyName: String = "fnv1a64"
    override def dataType: DataType = LongType
    override protected def nullSafeEval(v: Any): Any =
      Hashing.fnv1a64(
        v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes)
    override protected def doGenCode(ctx: CodegenContext,
                                     ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"graft.core.Hashing.fnv1a64($c.getBytes())")
    override protected def withNewChildInternal(c: Expression): Fnv1a64 =
      copy(child = c)
  }

  /** Membership probe against a plan-time-bound filter. The deserialized
    * filter ships with the serialized expression (one copy per task,
    * like a broadcast) and probes run fully inside codegen — the Spark
    * lift of the reference's early-exit Has
    * (/root/reference/bloomfilter.go:185-196).
    */
  case class BloomProbe(filter: BlockedBloomFilter, child: Expression)
      extends UnaryExpression {
    override def prettyName: String = "bloom_probe"
    override def dataType: DataType = BooleanType
    override protected def nullSafeEval(h: Any): Any =
      filter.has(h.asInstanceOf[Long])
    override protected def doGenCode(ctx: CodegenContext,
                                     ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("graftBloomFilter", filter,
        classOf[BlockedBloomFilter].getName)
      defineCodeGen(ctx, ev, c => s"$ref.has($c)")
    }
    override protected def withNewChildInternal(c: Expression): BloomProbe =
      copy(child = c)
  }

  // Column wrappers

  // wrappers cast inputs explicitly (no ExpectsInputTypes coercion:
  // AbstractDataType is private[sql] in Spark 4)

  def token_hash64(c: Column): Column =
    catalyst.aggColExpr(TokenHash64(catalyst.expr(c.cast("int"))))

  def fnv1a64(c: Column): Column =
    catalyst.aggColExpr(Fnv1a64(catalyst.expr(c.cast("string"))))

  def bloom_probe(filter: BlockedBloomFilter)(hash: Column): Column =
    catalyst.aggColExpr(BloomProbe(filter, catalyst.expr(hash.cast("bigint"))))
}
