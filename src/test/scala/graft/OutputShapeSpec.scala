package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Harness-safe output doctrine: every query's FINAL projection must be
  * scalar-typed (atomic) columns only. The driver's verify harness sorts
  * result columns with pandas before hashing, and pandas cannot sort an
  * array-typed column (`factorize: unhashable type 'numpy.ndarray'` —
  * the r11 `q_inverted_index` failure, which silently voided the parity
  * gate for that query). Queries that conceptually produce collections
  * must stringify them in the final projection (`array_join`, JSON text,
  * …) so the parity gate stays operative.
  *
  * Schema-only check: building the DataFrame runs analysis, not
  * execution, so this covers all queries cheaply.
  */
class OutputShapeSpec extends AnyFunSuite with SparkFixture {

  private def complexCols(schema: StructType): Seq[String] =
    schema.fields.collect {
      case f if f.dataType.isInstanceOf[ArrayType] ||
        f.dataType.isInstanceOf[MapType] ||
        f.dataType.isInstanceOf[StructType] => s"${f.name}:${f.dataType.simpleString}"
    }.toSeq

  test("every query's final projection is scalar-typed (harness-sortable)") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val bad = complexCols(fn(spark, sfDir).schema)
        if (bad.isEmpty) None else Some(s"$name -> ${bad.mkString(", ")}")
    }
    assert(offenders.isEmpty,
      "queries emitting non-scalar output columns (stringify them — " +
        s"the verify harness cannot sort arrays):\n${offenders.mkString("\n")}")
  }
}
