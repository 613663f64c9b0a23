package org.apache.spark.sql

import org.apache.hadoop.conf.Configuration

import org.apache.spark.paths.SparkPath
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.execution.datasources.{FileFormat, PartitionedFile}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.StructType

/** Bridge to `private[sql]` Spark internals the graft connector builds on.
  * Standard extension-library technique (Delta/Iceberg do the same): reuse
  * Spark's battle-tested vectorized parquet reader and Column converters
  * instead of reimplementing them.
  */
object GraftShim {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Name of the temporary column the vectorized parquet reader fills
    * with the physical row index of each row (deletion-vector support). */
  def rowIndexColumnName: String =
    ParquetFileFormat.ROW_INDEX_TEMPORARY_COLUMN_NAME

  /** Spark's vectorized parquet read pipeline as a serializable
    * per-file function; rows (not columnar batches) are returned so the
    * caller can apply deletion vectors and row-address projection. */
  def parquetReaderFunc(
      spark: SparkSession,
      dataSchema: StructType,
      requiredSchema: StructType,
      filters: Seq[Filter],
      hadoopConf: Configuration): PartitionedFile => Iterator[InternalRow] =
    new ParquetFileFormat().buildReaderWithPartitionValues(
      spark.asInstanceOf[classic.SparkSession],
      dataSchema,
      new StructType(),
      requiredSchema,
      filters,
      Map(FileFormat.OPTION_RETURNING_BATCH -> "false"),
      hadoopConf)

  def partitionedFile(absPath: String, fileSize: Long): PartitionedFile =
    PartitionedFile(InternalRow.empty, SparkPath.fromPathString(absPath),
      0L, fileSize, Array.empty, 0L, fileSize, Map.empty)
}
