package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Pins the Verify-time hash-safety guard: no dumped query may emit a
  * DecimalType column with precision > 18 (round-8 red gate — parquet
  * FLBA decimals diverge under the driver's hasher even when values are
  * cell-identical; see Verify.assertHashSafeSchema). */
class SchemaGuardSpec extends SparkSpecBase {
  import spark.implicits._

  test("guard rejects a planted DECIMAL(25,2) top-level column") {
    val df = Seq(1L).toDF("k")
      .withColumn("total", col("k").cast(DecimalType(25, 2)))
    val e = intercept[IllegalStateException] {
      Verify.assertHashSafeSchema("planted", df.schema)
    }
    assert(e.getMessage.contains("planted") && e.getMessage.contains("total"))
  }

  test("guard rejects wide decimals nested in struct and array") {
    val nested = StructType(Seq(
      StructField("id", LongType),
      StructField("payload", StructType(Seq(
        StructField("amts", ArrayType(DecimalType(38, 4))))))))
    val e = intercept[IllegalStateException] {
      Verify.assertHashSafeSchema("nested", nested)
    }
    assert(e.getMessage.contains("payload.amts[]"))
  }

  test("guard accepts the repo's edge discipline (≤18 decimals, doubles)") {
    val df = Seq((1L, 2.5)).toDF("k", "v")
      .withColumn("money", col("v").cast(DecimalType(18, 2)))
      .withColumn("edge", col("money").cast("double"))
    Verify.assertHashSafeSchema("ok", df.schema) // must not throw
  }

  test("the round-8 offender emits DOUBLE money columns now") {
    val g = graft.operators.Entity.qGoldenRecords(spark, sf)
    Verify.assertHashSafeSchema("entity_golden_record", g.schema)
    assert(g.schema("max_acctbal").dataType == DoubleType)
    assert(g.schema("total_acctbal").dataType == DoubleType)
  }
}
