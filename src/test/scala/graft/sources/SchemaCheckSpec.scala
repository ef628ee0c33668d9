package graft.sources

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class SchemaCheckSpec extends AnyFunSuite {

  private val base = StructType(Seq(
    StructField("nodeId", LongType),
    StructField("labels", StringType),
    StructField("balance", DoubleType)))

  test("identical schemas report no drift") {
    val d = SchemaCheck.diff(base, base)
    assert(d.isIdentical && d.isCompatible)
  }

  test("added columns are compatible, removed and retyped are not") {
    val next = StructType(Seq(
      StructField("nodeid", LongType),      // case-insensitive match
      StructField("labels", ArrayType(StringType)), // retyped
      StructField("segment", StringType)))  // added; balance removed
    val d = SchemaCheck.diff(base, next)
    assert(d.added.toSeq == Seq("segment"))
    assert(d.removed.toSeq == Seq("balance"))
    assert(d.typeChanged.map(c => (c.name, c.expected, c.actual)).toSeq ==
      Seq(("labels", "string", "array<string>")))
    assert(!d.isCompatible)
    val additiveOnly = SchemaCheck.diff(base,
      StructType(base.fields :+ StructField("extra", IntegerType)))
    assert(additiveOnly.isCompatible && !additiveOnly.isIdentical)
  }
}
