package graft.functions


import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Shared sign-random-projection kernel: all `Planes` signed dot products
  * of one quantized vector against the fixed ±1 hyperplane matrix, packed
  * into `Bands` band codes, in a single pass per row.
  *
  * Semantics are bit-identical to the relational formulation it replaces
  * (explode components × broadcast plane table → SUM(xm*sgn) per plane →
  * band-code packing aggregate) — for inputs whose dimensionality equals
  * the plane table's. The sign derivation is dim-parametric (signs rebuild
  * per distinct vector length), so the kernel is self-consistent at any
  * uniform dim, but a ragged corpus would hash different-length vectors
  * against different sign sets where the fixed-dim relational plane table
  * would zero-pad or drop — callers own enforcing uniform dimensionality
  * (graft.sim.Similarity vectors are all `Dim`): the hyperplane sign for (plane p, dim i)
  * is +1 iff the first hex char of md5("rp:p:i") is in '0'..'7' (i.e. the
  * high bit of the first digest byte is 0) — the same fixed public
  * derivation the DuckDB oracle computes for itself — and the dot is an
  * exact integer sum over the caller-quantized micro-unit components, so
  * addition order cannot matter. Band p∕BandBits gets bit p%BandBits set
  * iff the plane's dot is >= 0 (the SQL `CASE WHEN dm >= 0` tie rule).
  *
  * Why a kernel instead of the join: the relational form multiplies the
  * corpus Planes× through a shuffle (N·Dim exploded rows × 128 plane
  * matches → two wide aggregations) for what is per-row arithmetic with a
  * constant right-hand side. Here the plane matrix is a per-JVM constant
  * (Planes×Dim bytes, built once per dimensionality) and the whole
  * projection stays inside whole-stage codegen — the same narrow-map shape
  * as [[SimHashImpl]]. At 100 TB that removes the suite's largest
  * intermediate (the exploded component×plane join) entirely; the only
  * remaining shuffle in the LSH path is the (band, code) bucket groupBy the
  * algorithm inherently needs.
  */
object RpBandCodesImpl {
  /** LSH shape: Bands bands × BandBits sign bits (128 hyperplanes). Shared
    * single source of truth — graft.sim.Similarity's query and oracle SQL
    * derive from these. */
  val Bands = 16
  val BandBits = 8
  val Planes: Int = Bands * BandBits

  // md5 comes from SimHashImpl's shared per-thread digest — one ThreadLocal
  // per executor thread for the whole package, not one per kernel.
  private def md5 = SimHashImpl.md5

  /** signs(p*dim + i) ∈ {+1, -1}: high bit of md5("rp:p:i") first byte.
    * Built once per dimensionality per JVM (Planes×Dim md5 calls — 8k at
    * Dim=64), then every row reads the same array. */
  private val signCache = new java.util.concurrent.ConcurrentHashMap[Int, Array[Byte]]()

  private def signsFor(dim: Int): Array[Byte] =
    signCache.computeIfAbsent(dim, d => {
      val out = new Array[Byte](Planes * d)
      val digest = md5.get()
      var p = 0
      while (p < Planes) {
        var i = 0
        while (i < d) {
          digest.reset()
          val h = digest.digest(s"rp:$p:$i".getBytes("UTF-8"))
          out(p * d + i) = if ((h(0) & 0x80) == 0) 1 else -1
          i += 1
        }
        p += 1
      }
      out
    })

  /** Band codes for one micro-unit-quantized vector. Null components read
    * as 0 — the value a null contributes to the SQL SUM it replaces. */
  def compute(vm: ArrayData): ArrayData = {
    val dim = vm.numElements()
    val signs = signsFor(dim)
    val xs = new Array[Long](dim)
    var i = 0
    while (i < dim) {
      xs(i) = if (vm.isNullAt(i)) 0L else vm.getLong(i)
      i += 1
    }
    val out = new Array[Long](Bands)
    var p = 0
    while (p < Planes) {
      val base = p * dim
      var dm = 0L
      i = 0
      while (i < dim) {
        dm += (if (signs(base + i) > 0) xs(i) else -xs(i))
        i += 1
      }
      if (dm >= 0L) out(p / BandBits) |= (1L << (p % BandBits))
      p += 1
    }
    // Unsafe packing: GenericArrayData would box all Bands longs per row in
    // the hot path this kernel exists to keep narrow.
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}

/** `rp_band_codes(array<bigint>)` → `array<bigint>` of
  * [[RpBandCodesImpl.Bands]] LSH band codes (array position = band index).
  * Callers quantize with the engine's own `CAST(round(x*1e6) AS BIGINT)`
  * first, so float-rounding parity stays in SQL where both engines already
  * agree, and the expression is pure integer arithmetic. */
case class RpBandCodes(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "rp_band_codes"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"rp_band_codes requires array<bigint>, got ${t.sql}")
    }
  }

  override def nullSafeEval(vm: Any): Any =
    RpBandCodesImpl.compute(vm.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RpBandCodesImpl.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
