package graft

import org.scalatest.funsuite.AnyFunSuite

/** The SparkSessionExtensions surface: native expressions callable from SQL. */
class ExtensionsRegistrySpec extends AnyFunSuite {

  lazy val spark = graft.core.GraftSession.local(4)

  test("rolling_hash and dot_f are registered SQL functions with codegen") {
    val h = spark.sql("SELECT rolling_hash('abc') AS h").collect().head.getLong(0)
    def ref(s: String): Long = s.foldLeft(0L)((acc, c) => acc * 1000003L + c)
    assert(h == ref("abc"))
    val d = spark.sql(
      "SELECT dot_f(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d")
      .collect().head.getDouble(0)
    assert(d == 11.0)
  }
}
