package graft

import java.nio.file.Files
import java.sql.DriverManager
import java.util.Properties

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.JdbcSource

/** Exercises the live JDBC ingest path (reference
  * 12_ETL_Bronze_PySpark.py:14-26) against an in-JVM embedded Derby
  * database — a real JDBC driver, a real SQL engine, no network — covering
  * the snapshot read, predicate pushdown into the remote scan, and the
  * range-partitioned parallel extraction shape. */
class JdbcSourceSpec extends AnyFunSuite {

  lazy val spark = graft.core.GraftSession.local(4)

  private lazy val (url, source) = {
    val dir = Files.createTempDirectory("graft_derby").resolve("db")
    val u = s"jdbc:derby:$dir;create=true"
    val conn = DriverManager.getConnection(u)
    val st = conn.createStatement()
    st.execute("CREATE SCHEMA SALESLT")
    st.execute(
      "CREATE TABLE SALESLT.CUSTOMER (customer_id INT NOT NULL, name VARCHAR(64), acctbal DOUBLE)")
    val ins = conn.prepareStatement("INSERT INTO SALESLT.CUSTOMER VALUES (?, ?, ?)")
    (1 to 100).foreach { i =>
      ins.setInt(1, i); ins.setString(2, s"Customer#$i"); ins.setDouble(3, i * 10.5)
      ins.executeUpdate()
    }
    ins.close(); st.close(); conn.close()
    val props = new Properties()
    props.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    (u, new JdbcSource(u, props, schema = "SALESLT"))
  }

  test("snapshot read round-trips rows and schema through a live JDBC driver") {
    val df = source.read(spark, "CUSTOMER")
    assert(df.count() == 100)
    assert(df.columns.map(_.toLowerCase).toSet == Set("customer_id", "name", "acctbal"))
    val r = df.filter(df("CUSTOMER_ID") === 7).collect().head
    assert(r.getString(1) == "Customer#7" && r.getDouble(2) == 73.5)
  }

  test("filters push down into the JDBC scan, not a post-scan Spark filter only") {
    val df = source.read(spark, "CUSTOMER").filter("CUSTOMER_ID > 90")
    assert(df.count() == 10)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("CUSTOMER_ID"),
      s"expected the predicate pushed to JDBC, plan:\n${plan.take(1500)}")
  }

  test("range-partitioned extraction opens one stripe per partition") {
    val df = source.readPartitioned(spark, "CUSTOMER", "CUSTOMER_ID",
      lower = 1, upper = 101, numPartitions = 4)
    assert(df.rdd.getNumPartitions == 4)
    assert(df.count() == 100, "stripes must cover the full key range")
  }
}
