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
  // Shared per-thread digest for every md5-derived kernel in this package
  // (RpBandCodesImpl reuses it rather than holding a second ThreadLocal).
  private[functions] val md5 = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** Shared analysis-time check for the token-array expressions. */
  private[functions] def requireStringArray(fn: String,
      dt: org.apache.spark.sql.types.DataType)
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    dt match {
      case org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$fn requires array<string>, got ${other.sql}")
    }
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

  /** 60-bit token hash = first 15 md5 hex chars (first 8 bytes big-endian,
    * top nibble dropped) — bit-compatible with the SQL formulation
    * `CAST(conv(substr(md5(t),1,15),16,10) AS BIGINT)` and DuckDB's
    * `CAST('0x'||substr(md5(t),1,15) AS BIGINT)`. 15 hex chars (not 16)
    * keeps the value inside a signed BIGINT in every engine. */
  def tokenHash60(t: UTF8String): Long = {
    val d = md5.get()
    d.reset()
    val h = d.digest(t.getBytes)
    var out = 0L
    var i = 0
    while (i < 8) {
      out = (out << 8) | (h(i) & 0xffL)
      i += 1
    }
    out >>> 4
  }

  /** True iff the array holds at least one NON-NULL token — the "any
    * vote at all" guard both simhash expressions share: null elements are
    * skipped by the vote loop, so an all-null array would tie every bit
    * at 0 exactly like the empty array and take the all-ones code. O(1)
    * amortized (the first element is almost always non-null). */
  def hasToken(tokens: ArrayData): Boolean = {
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) return true
      i += 1
    }
    false
  }

  /** SimHash over a token array: per-bit majority vote (+1/-1) of the
    * token hash bits, ties (`>= 0`) resolve to 1. Callers pass distinct
    * tokens when set semantics are wanted. */
  private def simhash(tokens: ArrayData, bits: Int, hash: UTF8String => Long): Long = {
    val votes = new Array[Int](bits)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val h = hash(tokens.getUTF8String(i))
        var j = 0
        while (j < bits) {
          votes(j) += (if (((h >>> j) & 1L) == 1L) 1 else -1)
          j += 1
        }
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < bits) {
      if (votes(j) >= 0) out |= (1L << j)
      j += 1
    }
    out
  }

  /** 48-bit hash = first 12 md5 hex chars (6 bytes big-endian) —
    * bit-compatible with the SQL chain
    * `CAST(conv(substr(md5(t),1,12),16,10) AS BIGINT)` and DuckDB's
    * `CAST('0x'||substr(md5(t),1,12) AS BIGINT)`, but computed without
    * materializing the 32-char hex string, the substring copy, or the
    * base-16 re-parse — the gram-hash hot path of the winnowing/CDC
    * fingerprint family runs this once per 4-gram. */
  def prefix48(t: UTF8String): Long = {
    val d = md5.get()
    d.reset()
    val h = d.digest(t.getBytes)
    ((h(0) & 0xffL) << 40) | ((h(1) & 0xffL) << 32) | ((h(2) & 0xffL) << 24) |
      ((h(3) & 0xffL) << 16) | ((h(4) & 0xffL) << 8) | (h(5) & 0xffL)
  }

  /** 32-bit SimHash code. */
  def compute(tokens: ArrayData): Long = simhash(tokens, 32, tokenHash)

  /** 60-bit SimHash code — the width that supports multi-band LSH with
    * bands wide enough to bucket at scale: the corpus-adaptive ladder
    * (graft.dedup.Dedup.SimShape) tiles the 60 bits as 4x15, 3x20, or
    * 2x30 depending on corpus size. */
  def compute60(tokens: ArrayData): Long = simhash(tokens, 60, tokenHash60)
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

  // Null even for a non-null child: the empty token array yields null (see
  // the nullSafeEval note), so the parent's child-nullability shortcut
  // must not apply.
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    SimHashImpl.requireStringArray(prettyName, child.dataType)

  // ZERO USABLE tokens → null, not the all-ones code: with no non-null
  // token every bit vote ties at 0 and the >= 0 rule would set all bits,
  // clustering every such doc into one LSH bucket — and diverging from
  // the exploded/oracle formulation, which produces NO vote row for a doc
  // without tokens. Null is the scalar analog of that absent row. The
  // guard covers BOTH the empty array and the all-null-elements array
  // (null elements are skipped by the vote loop, so the two are the same
  // degenerate case).
  override def nullSafeEval(tokens: Any): Any = {
    val arr = tokens.asInstanceOf[ArrayData]
    if (!SimHashImpl.hasToken(arr)) null else SimHashImpl.compute(arr)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
       |if (!graft.functions.SimHashImpl.hasToken($c)) {
       |  ${ev.isNull} = true;
       |} else {
       |  ${ev.value} = graft.functions.SimHashImpl.compute($c);
       |}
     """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `md5_prefix48(string)`: the first 12 md5 hex chars as a BIGINT, as one
  * codegen'd kernel. Semantically identical to
  * `CAST(conv(substr(md5(s),1,12),16,10) AS BIGINT)` — the form every
  * oracle still computes — but skips two string materializations and a
  * base-16 parse per call; the winnowing / CDC-chunking gram streams call
  * it once per 4-gram, which makes it their single hottest scalar. */
case class Md5Prefix48(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def prettyName: String = "md5_prefix48"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    child.dataType match {
      case org.apache.spark.sql.types.StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"md5_prefix48 requires string, got ${other.sql}")
    }
  }

  override def nullSafeEval(s: Any): Any =
    SimHashImpl.prefix48(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHashImpl.prefix48($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `simhash60(array<string>)`: 60-bit SimHash (15 md5 hex chars per token).
  *
  * The wider code exists for banded near-dup candidate generation at scale:
  * 32 bits only supports bands too narrow to bucket well (an 8-bit band =
  * 256 buckets = ~N/256 docs per bucket, quadratic at 100 TB), while 60
  * bits tile into the corpus-adaptive band widths of
  * graft.dedup.Dedup.SimShape (4x15 / 3x20 / 2x30 — up to 2^30 buckets per
  * band). Same majority-vote/tie semantics as [[SimHash32]].
  */
case class SimHash60(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def prettyName: String = "simhash60"

  // See SimHash32: zero usable tokens → null, so nullable regardless of
  // child.
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    SimHashImpl.requireStringArray(prettyName, child.dataType)

  override def nullSafeEval(tokens: Any): Any = {
    val arr = tokens.asInstanceOf[ArrayData]
    if (!SimHashImpl.hasToken(arr)) null else SimHashImpl.compute60(arr)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
       |if (!graft.functions.SimHashImpl.hasToken($c)) {
       |  ${ev.isNull} = true;
       |} else {
       |  ${ev.value} = graft.functions.SimHashImpl.compute60($c);
       |}
     """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
