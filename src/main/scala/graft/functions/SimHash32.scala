package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared SimHash kernel, called from both interpreted eval and generated
  * code (a static call keeps the codegen template trivial). */
object SimHashImpl {
  private val md5 = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** 32-bit token hash = first 4 md5 bytes big-endian — bit-compatible with
    * the SQL formulation `CAST(conv(substr(md5(t),1,8),16,10) AS BIGINT)`
    * and DuckDB's `CAST('0x'||substr(md5(t),1,8) AS BIGINT)`. */
  def tokenHash(t: UTF8String): Long = {
    val d = md5.get()
    d.reset()
    val h = d.digest(t.getBytes)
    ((h(0) & 0xffL) << 24) | ((h(1) & 0xffL) << 16) | ((h(2) & 0xffL) << 8) | (h(3) & 0xffL)
  }

  /** 32-bit SimHash over a token array: per-bit majority vote (+1/-1) of the
    * token hash bits, ties (`>= 0`) resolve to 1. Callers pass distinct
    * tokens when set semantics are wanted. */
  def compute(tokens: ArrayData): Long = {
    val votes = new Array[Int](32)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val h = tokenHash(tokens.getUTF8String(i))
        var j = 0
        while (j < 32) {
          votes(j) += (if (((h >>> j) & 1L) == 1L) 1 else -1)
          j += 1
        }
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 32) {
      if (votes(j) >= 0) out |= (1L << j)
      j += 1
    }
    out
  }
}

/** `simhash32(array<string>)`: whole-code SimHash as one narrow expression.
  *
  * Replaces a 3-shuffle formulation (explode tokens × 32 bit positions →
  * per-bit vote aggregate → per-doc reassembly) with a single pass per row —
  * at scale that removes two wide exchanges over tokens×32 rows entirely.
  * Result is bit-identical to the exploded formulation (same md5-derived
  * token hash, same tie rule), which the DuckDB oracle still computes the
  * long way.
  */
case class SimHash32(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def prettyName: String = "simhash32"

  override def nullSafeEval(tokens: Any): Any =
    SimHashImpl.compute(tokens.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHashImpl.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
