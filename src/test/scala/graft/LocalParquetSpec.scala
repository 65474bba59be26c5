package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.api.LocalParquet

/** Pins the driver-side small-parquet reader (r19, VERDICT r18 #3 — it
  * replaced the Spark read+collect job on every warm sidecar/model serve)
  * byte-for-byte against the Spark reader over the exact artifact type
  * vocabulary: string, long, int, double, boolean, binary, array<double>,
  * array<long>, nulls in each, and multi-file layouts.
  */
class LocalParquetSpec extends SparkSpec {

  private def roundTrip(df: org.apache.spark.sql.DataFrame,
                        dir: String): Unit = {
    df.write.mode("overwrite").parquet(dir)
    val viaSpark = spark.read.parquet(dir)
    val sparkRows = viaSpark.collect().toSeq
    val local = LocalParquet.readRows(spark, dir)
    assert(local.isDefined, s"driver-side read fell back on $dir")
    val (schema, rows) = local.get
    assert(schema == viaSpark.schema)
    // order-insensitive multiset compare on a canonical rendering
    // (binary -> hex, arrays -> seq strings); doubles print exactly via
    // toString round-trip, and the model frames are re-created through
    // createDataFrame anyway — also exercised below
    def canon(r: Row): String = r.toSeq.map {
      case b: Array[Byte] => b.map("%02x".format(_)).mkString
      case sq: scala.collection.Seq[_] => sq.mkString("[", ",", "]")
      case x => String.valueOf(x)
    }.mkString("|")
    assert(rows.map(canon).sorted == sparkRows.map(canon).sorted)
    // the readModel consumption path: rows must be createDataFrame-able
    val rebuilt = spark.createDataFrame(
      java.util.Arrays.asList(rows: _*), schema)
    assert(rebuilt.count() == sparkRows.length)
  }

  test("sidecar shape: (tag, mf, n) one row") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("lp1").toString + "/mf"
    roundTrip(Seq(("stack3-nev", "a:1:2:c\nb:3:4:d", 42L))
      .toDF("tag", "mf", "n"), dir)
  }

  test("model shape: long + array<double> + string fp, many rows") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("lp2").toString + "/m"
    val rows = (0 until 40).map(i =>
      (i.toLong, Array.tabulate(64)(j => math.sin(i * 64 + j)), "fp-1"))
    roundTrip(rows.toDF("cid", "v", "__fp"), dir)
  }

  test("nulls, booleans, ints, binary, array<long>, multi-file") {
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "s string, l bigint, i int, d double, b boolean, " +
        "bin binary, al array<bigint>")
    val rows = Seq(
      Row("x", 1L, 2, 3.5, true, Array[Byte](1, 2, 3), Seq(1L, 2L)),
      Row(null, null, null, null, null, null, null),
      Row("y", -9L, -8, Double.MinPositiveValue, false,
        Array[Byte](), Seq.empty[Long]))
    val dir = java.nio.file.Files.createTempDirectory("lp3").toString + "/t"
    roundTrip(spark.createDataFrame(
      java.util.Arrays.asList(rows: _*), schema).repartition(3), dir)
  }

  test("doubles survive bit-exactly (model parity contract)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("lp4").toString + "/d"
    val vals = Seq(0.1, -0.0, Double.NaN, 1.0 / 3.0, 6.02214076e23)
    vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("k", "v").write.mode("overwrite").parquet(dir)
    val got = LocalParquet.readRows(spark, dir).get._2
      .map(r => r.getLong(0) -> java.lang.Double.doubleToRawLongBits(
        r.getDouble(1))).toMap
    vals.zipWithIndex.foreach { case (v, i) =>
      assert(got(i.toLong) == java.lang.Double.doubleToRawLongBits(v))
    }
  }

  test("unsupported type falls back to None (decimal)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("lp5").toString + "/x"
    Seq((1L, BigDecimal("1.23"))).toDF("k", "v")
      .write.mode("overwrite").parquet(dir)
    assert(LocalParquet.readRows(spark, dir).isEmpty)
  }

  test("absent path is None") {
    assert(LocalParquet.readRows(spark, "/no/such/dir/at/all").isEmpty)
  }
}
