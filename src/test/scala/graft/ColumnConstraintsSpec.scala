package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.tables.TableStore

/** Enforced NOT NULL constraints and column DEFAULT values (Delta
  * parity): NOT NULL is validated against existing rows at declaration
  * and then enforced INSIDE every write job (raise_error branch — a
  * violating write aborts with the table unchanged); DEFAULT fills a
  * column the INSERT statement omits, never an explicit NULL. */
class ColumnConstraintsSpec extends AnyFunSuite {

  lazy val spark = graft.core.GraftSession.local(4)

  private def freshStore(): TableStore =
    new TableStore(spark, Files.createTempDirectory("graft_cc").toString)

  private def messages(t: Throwable): Seq[String] =
    if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)

  test("SET NOT NULL validates existing rows and rejects a table with NULLs") {
    val store = freshStore()
    store.createOrReplace("db.n",
      spark.range(0, 10).select(col("id").as("k"),
        when(col("id") % 3 === 0, lit(null)).otherwise(col("id")).as("v")))
    val e = intercept[IllegalArgumentException] { store.setNotNull("db.n", "v") }
    assert(e.getMessage.contains("existing NULL"))
    store.setNotNull("db.n", "k") // no nulls — accepted
    assert(store.notNullColumns("db.n") == Seq("k"))
    store.detach()
  }

  test("a write violating NOT NULL aborts inside the job, table unchanged") {
    val store = freshStore()
    store.createOrReplace("db.n2",
      spark.range(0, 10).select(col("id").as("k"), col("id").cast("string").as("v")))
    spark.sql("ALTER TABLE db.n2 ALTER COLUMN v SET NOT NULL")
    val v0 = store.version("db.n2").get
    val bad = spark.range(0, 3).select(col("id").as("k"),
      when(col("id") === 1, lit(null)).otherwise(lit("x")).as("v"))
    val e = intercept[Exception] { store.append("db.n2", bad) }
    assert(messages(e).exists(_.contains("NOT NULL constraint")), e.toString)
    assert(store.version("db.n2").get == v0, "violating write must not commit")
    assert(store.read("db.n2").count() == 10)
    // DROP NOT NULL lifts the constraint; the same append succeeds
    spark.sql("ALTER TABLE db.n2 ALTER COLUMN v DROP NOT NULL")
    store.append("db.n2", bad)
    assert(store.read("db.n2").count() == 13)
    store.detach()
  }

  test("DEFAULT fills omitted columns in SQL INSERT; explicit NULL stays NULL") {
    val store = freshStore()
    store.createOrReplace("db.d",
      spark.range(0, 2).select(col("id").as("k"), lit("seed").as("tag"),
        lit(1.5).as("score")))
    spark.sql("ALTER TABLE db.d ALTER COLUMN tag SET DEFAULT 'pending'")
    spark.sql("ALTER TABLE db.d ALTER COLUMN score SET DEFAULT 2.5 + 0.5")
    // omitted columns take their defaults
    spark.sql("INSERT INTO db.d (k) VALUES (100)")
    val r = store.read("db.d").filter(col("k") === 100).head()
    assert(r.getString(1) == "pending" && r.getDouble(2) == 3.0)
    // an explicit NULL is respected — defaults apply on omission only
    spark.sql("INSERT INTO db.d (k, tag) VALUES (101, NULL)")
    val r2 = store.read("db.d").filter(col("k") === 101).head()
    assert(r2.isNullAt(1) && r2.getDouble(2) == 3.0)
    // DROP DEFAULT reverts to NULL fill
    spark.sql("ALTER TABLE db.d ALTER COLUMN tag DROP DEFAULT")
    spark.sql("INSERT INTO db.d (k) VALUES (102)")
    assert(store.read("db.d").filter(col("k") === 102).head().isNullAt(1))
    store.detach()
  }

  test("a bad DEFAULT fails the ALTER, not a later INSERT") {
    val store = freshStore()
    store.createOrReplace("db.bd",
      spark.range(0, 2).select(col("id").as("k"), lit(0.0).as("v")))
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE db.bd ALTER COLUMN v SET DEFAULT no_such_col + 1")
    }
    assert(messages(e).nonEmpty)
    assert(store.columnDefaults("db.bd").isEmpty)
    store.detach()
  }

  test("SHOW CREATE TABLE and DESCRIBE DETAIL surface both declarations") {
    val store = freshStore()
    store.createOrReplace("db.sc",
      spark.range(0, 2).select(col("id").as("k"), lit("a").as("tag")))
    spark.sql("ALTER TABLE db.sc ALTER COLUMN k SET NOT NULL")
    spark.sql("ALTER TABLE db.sc ALTER COLUMN tag SET DEFAULT 'n/a'")
    spark.sql("ALTER TABLE db.sc ALTER COLUMN tag COMMENT 'label'")
    val ddl = spark.sql("SHOW CREATE TABLE db.sc").head().getString(0)
    assert(ddl.contains("`k` BIGINT NOT NULL"), ddl)
    assert(ddl.contains("DEFAULT 'n/a'"), ddl)
    assert(ddl.contains("COMMENT 'label'"), ddl)
    assert(!ddl.contains("notnull.") && !ddl.contains("coldefault."), ddl)
    val detail = store.detail("db.sc")
    assert(detail("not_null_columns") == "k")
    assert(detail("column_defaults").contains("tag: 'n/a'"))
    store.detach()
  }

  test("column-defined CREATE TABLE wires every inline declaration") {
    val store = freshStore()
    store.createOrReplace("ddl.seed", spark.range(0, 1).select(col("id").as("k")))
    spark.sql(
      """CREATE TABLE ddl.orders (
        |  order_id BIGINT GENERATED ALWAYS AS IDENTITY (START WITH 10 INCREMENT BY 2),
        |  cust_key BIGINT NOT NULL COMMENT 'customer ref',
        |  status STRING DEFAULT 'NEW',
        |  amount DOUBLE NOT NULL,
        |  amount_x2 DOUBLE GENERATED ALWAYS AS (amount * 2),
        |  CONSTRAINT pk_o PRIMARY KEY (order_id),
        |  CONSTRAINT fk_c FOREIGN KEY (cust_key) REFERENCES ddl.seed (k),
        |  CONSTRAINT amt_pos CHECK (amount > 0)
        |) USING parquet""".stripMargin)
    // declarations landed
    // GENERATED ALWAYS AS IDENTITY implies NOT NULL, so order_id is listed
    assert(store.notNullColumns("ddl.orders") == Seq("amount", "cust_key", "order_id"))
    assert(store.columnDefaults("ddl.orders") == Map("status" -> "'NEW'"))
    assert(store.identityColumn("ddl.orders").map(t => (t._1, t._2, t._3)) ==
      Some(("order_id", 10L, 2L)))
    assert(store.checkConstraints("ddl.orders") == Map("amt_pos" -> "amount > 0"))
    assert(store.foreignKeys("ddl.orders").contains("fk_c"))
    // and they BEHAVE: identity + generated derive, default fills,
    // NOT NULL and CHECK gate the write
    spark.sql("INSERT INTO ddl.orders (cust_key, amount) VALUES (7, 2.5), (8, 4.0)")
    val rows = store.read("ddl.orders")
      .select(col("order_id"), col("cust_key"), col("status"), col("amount_x2"))
      .orderBy(col("order_id")).collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(10L, 12L), "identity start/step")
    assert(rows.forall(_.getString(2) == "NEW"), "default filled")
    assert(rows.map(_.getDouble(3)).toSeq == Seq(5.0, 8.0), "generated derived")
    val e1 = intercept[Exception] {
      spark.sql("INSERT INTO ddl.orders (cust_key, amount) VALUES (9, -1.0)")
    }
    assert(messages(e1).exists(_.contains("amt_pos")), e1.toString)
    val e2 = intercept[Exception] {
      spark.sql("INSERT INTO ddl.orders (amount) VALUES (1.0)")
    }
    assert(messages(e2).exists(_.contains("NOT NULL constraint")), e2.toString)
    // SHOW CREATE TABLE round-trips the declarations — INCLUDING the
    // GENERATED clauses: a reconstruction missing them would create a
    // table whose surrogate keys stop generating (the reference's most
    // distinctive DDL, 01_Init.py:59)
    val ddl = spark.sql("SHOW CREATE TABLE ddl.orders").head().getString(0)
    assert(ddl.contains("NOT NULL") && ddl.contains("DEFAULT 'NEW'") &&
      ddl.contains("PRIMARY KEY") && ddl.contains("FOREIGN KEY") &&
      ddl.contains("CHECK"), ddl)
    assert(ddl.contains(
      "GENERATED ALWAYS AS IDENTITY (START WITH 10 INCREMENT BY 2)"), ddl)
    assert(ddl.contains("GENERATED ALWAYS AS (amount * 2)"), ddl)
    // a non-store namespace falls through to Spark untouched
    val e3 = intercept[Exception] {
      spark.sql("CREATE TABLE nosuchdb.t (k INT) USING parquet")
    }
    assert(!e3.getMessage.contains("snapshot store"), e3.getMessage)
    store.detach()
  }

  test("NOT NULL and DEFAULT survive a column rename; die with a drop") {
    val store = freshStore()
    store.createOrReplace("db.rn",
      spark.range(0, 3).select(col("id").as("k"), lit("x").as("tag")))
    store.setNotNull("db.rn", "tag")
    store.setColumnDefault("db.rn", "tag", "'z'")
    store.renameColumn("db.rn", "tag", "label")
    assert(store.notNullColumns("db.rn") == Seq("label"))
    assert(store.columnDefaults("db.rn") == Map("label" -> "'z'"))
    // enforcement follows the new name
    val e = intercept[Exception] {
      store.append("db.rn", spark.range(0, 1).select(col("id").as("k"),
        lit(null).cast("string").as("label")))
    }
    assert(messages(e).exists(_.contains("NOT NULL constraint")), e.toString)
    store.dropNotNull("db.rn", "label")
    store.dropColumn("db.rn", "label")
    assert(store.notNullColumns("db.rn").isEmpty)
    assert(store.columnDefaults("db.rn").isEmpty)
    store.detach()
  }
}
