package graft.format

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Declared vector (embedding) columns — reference: table property
  * `vector_columns='embedding:768'` creating FixedSizeList columns
  * (LanceTableProperties.java:33,50-52,88-125), validated to be
  * ARRAY(REAL|DOUBLE) (TestLanceVectorColumns.java:97-116), with the
  * fixed dimension enforced on write
  * (LancePageToArrowConverter.java:642-645).
  *
  * Spark has no fixed-size-list type, so the logical type stays
  * ArrayType(Float|Double) and the fixed dimension is a write-time
  * contract checked by a codegen'd expression — the property is the
  * index-layer's guarantee that every row is k-dimensional.
  */
object VectorColumns {

  /** Parse `name:dim, name2:dim2` (reference grammar). */
  def parse(spec: String): Seq[(String, Int)] =
    spec.split(",").map(_.trim).filter(_.nonEmpty).map { part =>
      part.split(":") match {
        case Array(n, d) if d.trim.matches("[0-9]+") && d.trim.toInt > 0 =>
          (n.trim, d.trim.toInt)
        case _ => throw new IllegalArgumentException(
          s"invalid vector_columns entry '$part' (expected name:dim)")
      }
    }.toSeq

  def fromProperties(props: Map[String, String]): Seq[(String, Int)] =
    props.get("vector_columns").map(parse).getOrElse(Seq.empty)

  /** Declaration-time validation (reference: must be ARRAY(REAL) or
    * ARRAY(DOUBLE)). */
  def validate(schema: StructType, vectors: Seq[(String, Int)]): Unit =
    vectors.foreach { case (name, dim) =>
      val f = schema.fields.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"vector column '$name' not found in schema"))
      f.dataType match {
        case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => ()
        case other => throw new IllegalArgumentException(
          s"vector column '$name' must have ARRAY(FLOAT) or ARRAY(DOUBLE) " +
            s"type, got ${other.sql}")
      }
    }

  /** Write-time dimension enforcement: any row whose vector is non-null
    * and not exactly `dim` elements fails the write. */
  def enforce(df: DataFrame, vectors: Seq[(String, Int)]): DataFrame =
    vectors.foldLeft(df) { case (d, (name, dim)) =>
      d.withColumn(name,
        when(col(name).isNull || size(col(name)) === dim, col(name))
          .otherwise(raise_error(concat(
            lit(s"vector column '$name' requires dimension $dim, got "),
            size(col(name)).cast("string")))))
    }
}
