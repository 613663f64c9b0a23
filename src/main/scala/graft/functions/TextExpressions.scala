package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for document fingerprinting — the hot
  * path of corpus-scale dedup, so they implement `doGenCode` and stay
  * inside whole-stage codegen (no UDF boxing, no Row materialization).
  *
  * The reference engine has no scalar-function surface of its own
  * (SURVEY.md section 2.6) — these are north-star extensions.
  */
object TextHashing {
  /** FNV-1a-style 64-bit polynomial hash over UTF-8 bytes. */
  final val Offset = 0xcbf29ce484222325L
  final val Prime = 0x100000001b3L

  def polyHash64(bytes: Array[Byte]): Long = {
    var h = Offset
    var i = 0
    while (i < bytes.length) { h = (h ^ (bytes(i) & 0xffL)) * Prime; i += 1 }
    h
  }

  /** Minimum polynomial hash over all k-byte windows (winnowing-style
    * content fingerprint: stable under prepend/append edits). */
  def winnow(bytes: Array[Byte], k: Int): Long = {
    if (bytes.length <= k) return polyHash64(bytes)
    var best = Long.MaxValue
    var start = 0
    while (start + k <= bytes.length) {
      var h = Offset
      var i = start
      while (i < start + k) { h = (h ^ (bytes(i) & 0xffL)) * Prime; i += 1 }
      if (h < best) best = h
      start += 1
    }
    best
  }

  /** Per-permutation seeds for [[minHash64]]: Spark's
    * `xxhash64(k, h)` folds the INT literal k into the default seed
    * first (hashInt(k, 42)), then folds h into that — so precomputing
    * seedK = hashInt(k, 42) and evaluating hashLong(h, seedK) per
    * element reproduces the SQL formulation bit for bit. */
  def minhashSeeds(perms: Int): Array[Long] =
    Array.tabulate(perms)(k => XXH64.hashInt(k, 42L))

  /** MinHash signature over a shingle array in ONE pass (r18
    * optimization): each shingle is string-hashed once (xxhash64 seed
    * 42 — Spark's `xxhash64(s)` exactly), then every permutation's
    * running minimum folds hashLong(h, seedK) in place. Bit-identical
    * to the `transform(shingles, xxhash64)` + perms ×
    * `array_min(transform(hashes, h -> xxhash64(k, h)))` pipeline it
    * replaces, which allocated perms+1 intermediate arrays per row in
    * interpreted higher-order functions. A null shingle contributes
    * h = 42 (the seed, exactly what xxhash64(NULL) yields); an empty
    * array yields all-null elements (array_min of empty is NULL). */
  def minHash64(arr: ArrayData, seeds: Array[Long]): ArrayData = {
    val perms = seeds.length
    val n = arr.numElements()
    if (n == 0) return new org.apache.spark.sql.catalyst.util
      .GenericArrayData(new Array[Any](perms))
    val mins = new Array[Long](perms)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var i = 0
    while (i < n) {
      val h =
        if (arr.isNullAt(i)) 42L
        else XXH64.hashUTF8String(arr.getUTF8String(i), 42L)
      var k = 0
      while (k < perms) {
        val v = XXH64.hashLong(h, seeds(k))
        if (v < mins(k)) mins(k) = v
        k += 1
      }
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(mins)
  }

  /** Signature-agreement count between two minhash arrays in ONE pass
    * (r19 optimization — VERDICT r18 #2): positions where both elements
    * are non-null and equal. Bit-identical to the SQL formulation it
    * replaces, `aggregate(zip_with(a, b, (x, y) -> IF(x = y, 1, 0)), 0,
    * (acc, v) -> acc + v)`: zip_with pads the shorter array with NULLs
    * and `NULL = anything` is never TRUE, so positions past
    * min(len a, len b) — and positions where either side is NULL (the
    * all-null signature of an empty shingle set) — contribute 0 there
    * and are skipped here. The HOF chain allocated a zipped
    * struct-array per pair and ran interpreted; this is one fused loop
    * inside whole-stage codegen. */
  def sigAgree(a: ArrayData, b: ArrayData): Int = {
    val n = math.min(a.numElements(), b.numElements())
    var c = 0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i) && a.getLong(i) == b.getLong(i))
        c += 1
      i += 1
    }
    c
  }

  /** SimHash-64 over a token array in ONE pass: per-bit ±1 majority of
    * each token's xxhash64 (seed 42 — Spark's `xxhash64()` exactly, so
    * this is bit-identical to the explode + 64-conditional-sums SQL
    * formulation it replaces, at per-row cost instead of a
    * shuffle + wide aggregate). Null tokens are skipped. */
  def simHash64(arr: ArrayData): Long = {
    val counts = new Array[Int](64)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = XXH64.hashUTF8String(arr.getUTF8String(i), 42L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (counts(b) > 0) out |= (1L << b); b += 1 }
    out
  }
}

/** 64-bit content hash of a string; codegen'd tight byte loop. */
case class PolyHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "poly_hash64"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"poly_hash64 requires STRING, got ${child.dataType.sql}")

  override def nullSafeEval(v: Any): Any =
    TextHashing.polyHash64(v.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextHashing.polyHash64($c.getBytes())")

  override protected def withNewChildInternal(c: Expression): PolyHash64 =
    copy(child = c)
}

/** Winnowing-style fingerprint: min hash over rolling k-byte windows. */
case class WinnowFingerprint(child: Expression, k: Int)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "winnow_fingerprint"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && k > 0) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"winnow_fingerprint requires (STRING, k > 0), got (${child.dataType.sql}, $k)")

  override def nullSafeEval(v: Any): Any =
    TextHashing.winnow(v.asInstanceOf[UTF8String].getBytes, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextHashing.winnow($c.getBytes(), $k)")

  override protected def withNewChildInternal(c: Expression): WinnowFingerprint =
    copy(child = c)
}

/** Fused single-pass SimHash-64 of a token array (see
  * [[TextHashing.simHash64]]). */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash64 requires ARRAY<STRING>, got ${other.sql}")
  }

  override def nullSafeEval(v: Any): Any =
    TextHashing.simHash64(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashing.simHash64($c)")

  override protected def withNewChildInternal(c: Expression): SimHash64 =
    copy(child = c)
}

/** Fused single-pass MinHash signature of a shingle array (see
  * [[TextHashing.minHash64]]).
  *
  * NULL input returns NULL (standard null-propagating expression
  * semantics), whereas the `transform` + perms × `array_min(...)`
  * formulation it replaced returned a non-null array of `perms` NULLs
  * for a NULL shingle array. Unreachable through [[graft.operators
  * .TextOps.withShingles]] (its CASE always yields a non-null array),
  * but callers of the public Column API passing nullable arrays should
  * coalesce first if they relied on the legacy shape (r18 ADVICE —
  * divergence documented rather than emulated). */
case class MinHash64(child: Expression, perms: Int) extends UnaryExpression {
  require(perms >= 1, s"minhash64 needs perms >= 1, got $perms")
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "minhash64"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash64 requires ARRAY<STRING>, got ${other.sql}")
  }

  @transient private lazy val seeds = TextHashing.minhashSeeds(perms)

  override def nullSafeEval(v: Any): Any =
    TextHashing.minHash64(v.asInstanceOf[ArrayData], seeds)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val seedsRef = ctx.addReferenceObj("minhashSeeds", seeds,
      "long[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextHashing.minHash64($c, $seedsRef)")
  }

  override protected def withNewChildInternal(c: Expression): MinHash64 =
    copy(child = c)
}

/** Fused single-pass signature-agreement count of two ARRAY<BIGINT>
  * minhash signatures (see [[TextHashing.sigAgree]]). NULL if either
  * input array is NULL — exactly what the replaced
  * `aggregate(zip_with(...))` formulation yields (aggregate over a
  * NULL array is NULL). */
case class SigAgree(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def prettyName: String = "sig_agree"
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType

  private def isLongArray(t: DataType): Boolean = t match {
    case ArrayType(LongType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (isLongArray(left.dataType) && isLongArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sig_agree requires two ARRAY<BIGINT> args, got " +
        s"(${left.dataType.sql}, ${right.dataType.sql})")

  override def nullSafeEval(a: Any, b: Any): Any =
    TextHashing.sigAgree(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.TextHashing.sigAgree($a, $b)")

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): SigAgree = copy(left = l, right = r)
}

object TextFunctions {
  /** Column-level API. */
  def poly_hash64(c: Column): Column =
    GraftShim.column(PolyHash64(GraftShim.expression(c)))

  def sig_agree(a: Column, b: Column): Column =
    GraftShim.column(SigAgree(GraftShim.expression(a), GraftShim.expression(b)))

  def simhash64(c: Column): Column =
    GraftShim.column(SimHash64(GraftShim.expression(c)))

  def minhash64(c: Column, perms: Int): Column =
    GraftShim.column(MinHash64(GraftShim.expression(c), perms))

  def winnow_fingerprint(c: Column, k: Int): Column =
    GraftShim.column(WinnowFingerprint(GraftShim.expression(c), k))

  /** The canonical name→builder list — the ONE place these functions
    * are enumerated; both [[register]] and
    * `graft.plans.GraftExtensions` (extension-injected SQL functions)
    * iterate it, so the two registration paths cannot drift.
    *
    * Beyond the native codegen'd expressions, the per-row corpus-build
    * primitives (r17 VERDICT #6) register here too: they build the
    * SAME Column compositions the gate queries run
    * (graft.operators.TextOps.*Col), so SQL-only users — `SELECT
    * lang_id(text), quality_stats(text).stop_ratio ...` — get exactly
    * the gate-certified logic. */
  private def colFn(f: Column => Column): Seq[Expression] => Expression =
    es => {
      require(es.length == 1, s"expected 1 argument, got ${es.length}")
      GraftShim.catalystExpression(f(GraftShim.column(es.head)))
    }
  private def litInt(e: Expression, what: String): Int =
    e match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Number, _) =>
        v.intValue()
      case other => throw new IllegalArgumentException(
        s"$what must be an integer literal, got $other")
    }
  private[graft] val builders
      : Seq[(String, Seq[Expression] => Expression)] = Seq(
    "poly_hash64" -> (es => PolyHash64(es.head)),
    "winnow_fingerprint" -> (es => WinnowFingerprint(es.head,
      es(1).eval(null).asInstanceOf[Number].intValue())),
    "simhash64" -> (es => SimHash64(es.head)),
    "sig_agree" -> (es => SigAgree(es.head, es(1))),
    "lang_id" -> colFn(graft.operators.TextOps.langIdCol),
    "quality_stats" -> colFn(graft.operators.TextOps.qualityStatsCol),
    "token_counts" -> colFn(graft.operators.TextOps.tokenCountsCol),
    "pii_scrub" -> colFn(graft.operators.TextOps.piiScrubCol),
    "chunk_windows" -> (es => {
      require(es.length == 3,
        s"chunk_windows(text, window, stride): got ${es.length} args")
      GraftShim.catalystExpression(graft.operators.TextOps.chunkWindowsCol(
        GraftShim.column(es.head),
        litInt(es(1), "window"), litInt(es(2), "stride")))
    }))

  /** SQL registration (idempotent): poly_hash64(s),
    * winnow_fingerprint(s, k), simhash64(toks). */
  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "built-in")
    }
}
