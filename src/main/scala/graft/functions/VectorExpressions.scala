package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expressions for vector distance — the hot path of
  * similarity search, so they implement `doGenCode` and run one fused
  * loop over the two `ArrayData` inputs inside whole-stage codegen.
  * The SQL-composable alternative (`aggregate(zip_with(...))`) is also
  * codegen'd but materializes a zipped intermediate array per row and
  * walks it three times for cosine (dot, |a|, |b|); these walk the
  * inputs once with three scalar accumulators and no allocation.
  *
  * Accumulation order is left-to-right per accumulator — bit-identical
  * to the sequential-fold SQL formulation they replace, so oracle
  * comparisons are unaffected.
  *
  * (The reference engine delegates distance eval to Lance's Rust
  * kernels behind JNI — SURVEY.md section 2.9; this is the Spark-native
  * equivalent of those kernels.)
  */
object VectorMath {

  @inline private def at(a: ArrayData, i: Int, dbl: Boolean): Double =
    if (dbl) a.getDouble(i) else a.getFloat(i).toDouble

  /** Cosine similarity; computes in double regardless of input width. */
  def cosine(a: ArrayData, b: ArrayData, aDbl: Boolean, bDbl: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      val x = at(a, i, aDbl); val y = at(b, i, bDbl)
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Squared euclidean distance (no sqrt — callers rank or sqrt once). */
  def l2sq(a: ArrayData, b: ArrayData, aDbl: Boolean, bDbl: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0; var i = 0
    while (i < n) {
      val d = at(a, i, aDbl) - at(b, i, bDbl)
      acc += d * d; i += 1
    }
    acc
  }

  /** Asymmetric-distance (ADC) lookup for product-quantized codes:
    * `codes(j)` indexes subspace j's 256-entry slice of the flattened
    * per-(query, list) distance table, so the estimated distance is one
    * m-step table walk per candidate — no vector math in the scan. */
  def pqAdc(codes: Array[Byte], table: ArrayData, dbl: Boolean): Double = {
    var acc = 0.0; var j = 0
    val m = codes.length
    while (j < m) {
      acc += at(table, (j << 8) | (codes(j) & 0xFF), dbl)
      j += 1
    }
    acc
  }
}

abstract class VectorDistanceExpression extends BinaryExpression {
  override def dataType: DataType = DoubleType

  private def elem(t: DataType): Option[DataType] = t match {
    case ArrayType(et @ (FloatType | DoubleType), _) => Some(et)
    case _ => None
  }
  protected def leftIsDouble: Boolean = elem(left.dataType).contains(DoubleType)
  protected def rightIsDouble: Boolean = elem(right.dataType).contains(DoubleType)

  override def checkInputDataTypes(): TypeCheckResult =
    if (elem(left.dataType).isDefined && elem(right.dataType).isDefined)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two ARRAY<FLOAT|DOUBLE> args, got " +
        s"(${left.dataType.sql}, ${right.dataType.sql})")
}

/** cosine_sim(a, b): cosine similarity in [-1, 1]. */
case class CosineSim(left: Expression, right: Expression)
    extends VectorDistanceExpression {
  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorMath.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      leftIsDouble, rightIsDouble)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.VectorMath.cosine($a, $b, $leftIsDouble, $rightIsDouble)")

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): CosineSim = copy(left = l, right = r)
}

/** l2_sq(a, b): squared euclidean distance. */
case class L2Squared(left: Expression, right: Expression)
    extends VectorDistanceExpression {
  override def prettyName: String = "l2_sq"

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorMath.l2sq(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      leftIsDouble, rightIsDouble)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.VectorMath.l2sq($a, $b, $leftIsDouble, $rightIsDouble)")

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): L2Squared = copy(left = l, right = r)
}

/** pq_adc(codes, table): product-quantization asymmetric distance —
  * codes is the candidate's m-byte PQ code word, table the flattened
  * m×256 per-(query, list) lookup table. */
case class PqAdcDistance(left: Expression, right: Expression)
    extends BinaryExpression {
  override def prettyName: String = "pq_adc"
  override def dataType: DataType = DoubleType

  private def tableIsDouble: Boolean = right.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (org.apache.spark.sql.types.BinaryType,
        ArrayType(FloatType | DoubleType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"pq_adc requires (BINARY, ARRAY<FLOAT|DOUBLE>), got (${l.sql}, ${r.sql})")
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorMath.pqAdc(a.asInstanceOf[Array[Byte]], b.asInstanceOf[ArrayData],
      tableIsDouble)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.VectorMath.pqAdc($a, $b, $tableIsDouble)")

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): PqAdcDistance = copy(left = l, right = r)
}

object VectorFunctions {
  /** Column-level API. */
  def cosine_sim(a: Column, b: Column): Column =
    GraftShim.column(CosineSim(GraftShim.expression(a), GraftShim.expression(b)))

  def pq_adc(codes: Column, table: Column): Column =
    GraftShim.column(PqAdcDistance(
      GraftShim.expression(codes), GraftShim.expression(table)))

  def l2_sq(a: Column, b: Column): Column =
    GraftShim.column(L2Squared(GraftShim.expression(a), GraftShim.expression(b)))

  /** The canonical name→builder list — the ONE place these functions
    * are enumerated; both [[register]] and
    * `graft.plans.GraftExtensions` (extension-injected SQL functions)
    * iterate it, so the two registration paths cannot drift. */
  private[graft] val builders
      : Seq[(String, Seq[Expression] => Expression)] = Seq(
    "cosine_sim" -> (es => CosineSim(es.head, es(1))),
    "l2_sq" -> (es => L2Squared(es.head, es(1))),
    "pq_adc" -> (es => PqAdcDistance(es.head, es(1))))

  /** SQL registration (idempotent): cosine_sim(a, b), l2_sq(a, b),
    * pq_adc(codes, table). */
  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "built-in")
    }
}
