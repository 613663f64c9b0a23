package graft.catalog

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types._

/** The graft bucket function, exposed through the catalog's
  * `FunctionCatalog` so Spark can resolve the `bucket(n, col)` transform
  * a bucketized table's scan reports in its `KeyGroupedPartitioning` —
  * the resolution step storage-partitioned joins require. The function
  * MUST compute exactly what `Maintenance.bucketize` computed at write
  * time: `pmod(col, n)` over the integral key.
  */
object GraftBucketFunction extends UnboundFunction {
  override def name(): String = "bucket"
  override def description(): String =
    "bucket(n, col): pmod(col, n) — the graft bucketize layout function"

  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.length == 2,
      s"bucket expects (nBuckets, col), got ${inputType.catalogString}")
    val keyType = inputType.fields(1).dataType
    keyType match {
      case ByteType | ShortType | IntegerType | LongType => ()
      case other => throw new UnsupportedOperationException(
        s"bucket requires an integral key, got ${other.sql}")
    }
    GraftBucketBound(keyType)
  }
}

case class GraftBucketBound(keyType: DataType)
    extends ScalarFunction[Integer] {
  override def inputTypes(): Array[DataType] = Array(IntegerType, keyType)
  override def resultType(): DataType = IntegerType
  override def name(): String = "bucket"
  override def canonicalName(): String = s"graft.bucket(${keyType.typeName})"
  override def isResultNullable: Boolean = false

  override def produceResult(input: InternalRow): Integer = {
    val n = input.getInt(0)
    val k: Long = keyType match {
      case ByteType => input.getByte(1).toLong
      case ShortType => input.getShort(1).toLong
      case IntegerType => input.getInt(1).toLong
      case LongType => input.getLong(1)
      case other => throw new IllegalStateException(s"unexpected $other")
    }
    (((k % n) + n) % n).toInt
  }
}
