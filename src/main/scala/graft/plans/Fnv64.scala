package graft.plans

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native FNV-1a 64-bit hash over a string/binary column — a custom
  * Catalyst `Expression` with whole-stage codegen (`doGenCode`), used where
  * dedup/fingerprint pipelines need a fast non-cryptographic hash and
  * cross-engine md5 parity is NOT required (scespet has no hash functions;
  * this is part of the beyond-reference pipeline surface).
  *
  * Codegen emits a tight primitive loop — no MessageDigest allocation or
  * hex round-trip per row, unlike the md5-based [[graft.queries.Q.hash60]].
  */
case class Fnv64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def prettyName: String = "fnv64"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"fnv64 requires string or binary input, got ${other.catalogString}")
  }

  protected override def nullSafeEval(input: Any): Any = {
    val bytes = child.dataType match {
      case StringType => input.asInstanceOf[UTF8String].getBytes
      case _ => input.asInstanceOf[Array[Byte]]
    }
    Fnv64.hash(bytes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      val toBytes = child.dataType match {
        case StringType => s"$c.getBytes()"
        case _ => c
      }
      s"""
        byte[] $bytes = $toBytes;
        long $h = 0xcbf29ce484222325L;
        for (int $i = 0; $i < $bytes.length; $i++) {
          $h ^= ($bytes[$i] & 0xffL);
          $h *= 0x100000001b3L;
        }
        ${ev.value} = $h;
      """
    })

  override protected def withNewChildInternal(newChild: Expression): Fnv64 =
    copy(child = newChild)
}

object Fnv64 {

  /** Interpreted twin of the generated code (and of Multimodal.fnv64). */
  def hash(bytes: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) { h ^= (bytes(i) & 0xffL); h *= 0x100000001b3L; i += 1 }
    h
  }

  /** Register `fnv64` in the session's function registry (the same hook
    * [[GraftExtensions]] uses at session build time).
    */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      new FunctionIdentifier("fnv64"),
      new ExpressionInfo(classOf[Fnv64].getName, "fnv64"),
      (children: Seq[Expression]) => {
        require(children.size == 1, "fnv64 takes exactly one argument")
        Fnv64(children.head)
      })

  /** Column-level entry point; requires [[register]] (or GraftExtensions). */
  def fnv64(c: Column): Column = call_function("fnv64", c)
}
