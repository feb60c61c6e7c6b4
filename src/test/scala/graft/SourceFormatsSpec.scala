package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Source/sink format breadth beyond parquet: CSV and JSON round-trips with
  * schema preservation, through the same read-by-name layout the pipeline
  * uses. */
class SourceFormatsSpec extends AnyFunSuite {

  lazy val spark = graft.core.GraftSession.local(4)

  test("csv and json round-trip the region table with schemas intact") {
    val region = spark.read.parquet("/root/testdata/sf0.001/region.parquet")
    val dir = Files.createTempDirectory("graft_formats").toString

    region.write.mode("overwrite").option("header", "true").csv(s"$dir/region_csv")
    val fromCsv = spark.read.option("header", "true")
      .schema(region.schema).csv(s"$dir/region_csv")
    assert(fromCsv.exceptAll(region).isEmpty && region.exceptAll(fromCsv).isEmpty)

    region.write.mode("overwrite").json(s"$dir/region_json")
    val fromJson = spark.read.schema(region.schema).json(s"$dir/region_json")
    assert(fromJson.exceptAll(region).isEmpty && region.exceptAll(fromJson).isEmpty)
  }

  test("json lines with nested structs survive a write/read cycle") {
    import spark.implicits._
    val nested = Seq((1L, ("img", 640, 480)), (2L, ("aud", 0, 0)))
      .toDF("id", "meta")
    val dir = Files.createTempDirectory("graft_nested").toString
    nested.write.mode("overwrite").json(dir + "/m")
    val back = spark.read.schema(nested.schema).json(dir + "/m")
    assert(back.exceptAll(nested).isEmpty)
    assert(back.select($"meta._2").as[Int].collect().sorted.toSeq == Seq(0, 640))
  }
}
