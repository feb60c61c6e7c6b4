package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.tables.TableStore

/** Model-based property suite for SQL INSERT column alignment — the layer
  * that decides which query column feeds which target column. For
  * ARBITRARY insert spellings (positional, explicit column list, BY NAME),
  * arbitrary column subsets/orders, and case-mangled spellings (Spark SQL
  * resolves case-insensitively by default), the landed rows must equal a
  * direct Scala model: named columns take their values, omitted columns
  * take their declared DEFAULT, defaultless omitted columns take NULL, and
  * INSERT INTO appends while INSERT OVERWRITE replaces. The case-mangling
  * dimension pins the r14 review fix (an exact-`contains` match silently
  * default-filled a column whose list spelling differed only in case). */
class InsertAlignmentPropertySpec extends AnyFunSuite {

  lazy val spark = graft.core.GraftSession.local(4)

  // target: k BIGINT, v STRING DEFAULT 'd', x DOUBLE (no default)
  private val targetCols = Seq("k", "v", "x")

  private def mangle(c: String, up: Boolean): String =
    if (up) c.toUpperCase else c

  sealed trait Form
  case object Positional extends Form
  final case class ColumnList(cols: Seq[(String, Boolean)]) extends Form
  final case class ByName(cols: Seq[(String, Boolean)]) extends Form

  private val subsetGen: Gen[Seq[(String, Boolean)]] = for {
    subset <- Gen.someOf(targetCols).suchThat(_.nonEmpty)
    // generator-driven permutation (not Random.shuffle) so withInitialSeed
    // reproduces failures exactly
    perm <- Gen.choose(0, 5)
    ordered = {
      val s = subset.toIndexedSeq
      if (s.size < 2) s
      else {
        val i = perm % s.size
        val rotated = s.drop(i) ++ s.take(i)
        if (perm >= 3 && rotated.size >= 2)
          rotated.updated(0, rotated(1)).updated(1, rotated(0))
        else rotated
      }
    }
    cases <- Gen.listOfN(ordered.size, Gen.oneOf(true, false))
  } yield ordered.zip(cases)

  private val formGen: Gen[Form] = Gen.oneOf(
    Gen.const(Positional: Form),
    subsetGen.map(ColumnList(_): Form),
    subsetGen.map(ByName(_): Form))

  private val rowGen: Gen[(Long, String, Double)] = for {
    k <- Gen.choose(1L, 50L)
    v <- Gen.oneOf("a", "b", "c")
    x <- Gen.choose(0, 9).map(_.toDouble)
  } yield (k, v, x)

  private val caseGen: Gen[(Form, Seq[(Long, String, Double)], Boolean)] = for {
    form <- formGen
    n <- Gen.choose(1, 3)
    rows <- Gen.listOfN(n, rowGen)
    overwrite <- Gen.oneOf(true, false)
  } yield (form, rows, overwrite)

  private def lit(c: String, r: (Long, String, Double)): String = c match {
    case "k" => s"CAST(${r._1} AS BIGINT)"
    case "v" => s"'${r._2}'"
    case "x" => s"CAST(${r._3} AS DOUBLE)"
  }

  /** The model: one landed row per inserted tuple — named columns take
    * their values, omitted v takes DEFAULT 'd', omitted k/x take NULL. */
  private def expectRow(provided: Set[String],
      r: (Long, String, Double)): (Option[Long], Option[String], Option[Double]) = (
    if (provided("k")) Some(r._1) else None,
    if (provided("v")) Some(r._2) else Some("d"),
    if (provided("x")) Some(r._3) else None)

  test("arbitrary INSERT spellings land exactly the modeled rows (positional, " +
      "column list, BY NAME; case-mangled; append and overwrite)") {
    val root = Files.createTempDirectory("graft_insprop").toString
    val store = new TableStore(spark, root)
    try {
      val prop = Prop.forAll(caseGen) { case (form, rows, overwrite) =>
        import spark.implicits._
        store.createOrReplace("db.t",
          Seq((0L, "seed", 0.5)).toDF("k", "v", "x"))
        store.setColumnDefault("db.t", "v", "'d'")
        val (sqlText, provided) = form match {
          case Positional =>
            val vals = rows.map(r => s"(${targetCols.map(lit(_, r)).mkString(", ")})")
            (s"INSERT ${if (overwrite) "OVERWRITE" else "INTO"} db.t VALUES ${vals.mkString(", ")}",
              targetCols.toSet)
          case ColumnList(cols) =>
            val names = cols.map { case (c, up) => mangle(c, up) }
            val vals = rows.map(r => s"(${cols.map { case (c, _) => lit(c, r) }.mkString(", ")})")
            (s"INSERT ${if (overwrite) "OVERWRITE" else "INTO"} db.t (${names.mkString(", ")}) " +
              s"VALUES ${vals.mkString(", ")}", cols.map(_._1).toSet)
          case ByName(cols) =>
            val selects = rows.map(r => "SELECT " + cols.map { case (c, up) =>
              s"${lit(c, r)} AS ${mangle(c, up)}" }.mkString(", "))
            (s"INSERT ${if (overwrite) "OVERWRITE" else "INTO"} db.t BY NAME " +
              selects.mkString(" UNION ALL "), cols.map(_._1).toSet)
        }
        spark.sql(sqlText)
        val got = store.read("db.t").collect().map(r => (
          Option(r.getAs[java.lang.Long]("k")).map(_.longValue),
          Option(r.getAs[String]("v")),
          Option(r.getAs[java.lang.Double]("x")).map(_.doubleValue))).toSeq.sorted
        val inserted = rows.map(expectRow(provided, _))
        val want = (if (overwrite) inserted
          else (Some(0L), Some("seed"), Some(0.5)) +: inserted).sorted
        if (got != want)
          Prop.falsified :| s"$sqlText\n got: $got\nwant: $want"
        else Prop.passed
      }
      val result = SCTest.check(
        SCTest.Parameters.default.withMinSuccessfulTests(24).withInitialSeed(77L), prop)
      assert(result.passed, s"property failed: ${result.status}")
    } finally {
      store.detach()
      graft.queries.Scratch.deleteRecursively(java.nio.file.Paths.get(root))
    }
  }

  // ---------------------------------------------------------------------
  // The r14 INSERT fix was an instance of a CLASS: any string-keyed map
  // lookup against schema-cased names silently no-ops on a cased
  // identifier. This property sweeps the OTHER DML surfaces — MERGE ON
  // keys, MERGE UPDATE SET / INSERT maps, NOT MATCHED BY SOURCE SET,
  // UPDATE SET targets (SQL text and the TableStore API), and bloom-index
  // DDL — asserting a case-mangled spelling lands BIT-IDENTICAL state to
  // the schema-cased spelling of the same operation.
  // ---------------------------------------------------------------------

  private def m(c: String, up: Boolean): String = if (up) c.toUpperCase else c

  test("case-mangled identifiers across MERGE/UPDATE/bloom surfaces land the " +
      "same state as schema-cased spellings") {
    val root = Files.createTempDirectory("graft_caseprop").toString
    val store = new TableStore(spark, root)
    try {
      val flagsGen: Gen[(List[Boolean], Int)] = for {
        fs <- Gen.listOfN(8, Gen.oneOf(true, false))
        whereK <- Gen.choose(0, 4)
      } yield (fs, whereK)
      val prop = Prop.forAll(flagsGen) { case (fs, whereK) =>
        import spark.implicits._
        val List(fOn, fSet, fInsK, fInsV, fBys, fUpd, fApiK, fApiSet) = fs
        val seed = Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0),
          (4L, "d", 4.0)).toDF("k", "v", "x")
        val src = Seq((2L, "B2", 20.0), (3L, "C2", 30.0), (5L, "E", 50.0))
          .toDF("k", "v", "x")
        // twin tables: db.a takes the mangled statements, db.b the exact
        for (t <- Seq("db.a", "db.b")) store.createOrReplace(t, seed)
        src.createOrReplaceTempView("case_src")
        def mergeSql(t: String, mangled: Boolean): String = {
          def id(c: String, f: Boolean) = if (mangled) m(c, f) else c
          s"""MERGE INTO $t AS tgt USING case_src AS src
             |ON tgt.${id("k", fOn)} = src.${id("k", fOn)}
             |WHEN MATCHED AND src.k < 3 THEN UPDATE SET
             |  tgt.${id("v", fSet)} = src.v
             |WHEN NOT MATCHED THEN INSERT
             |  (${id("k", fInsK)}, ${id("v", fInsV)}, x)
             |  VALUES (src.k, src.v, src.x)
             |WHEN NOT MATCHED BY SOURCE AND tgt.k = 4 THEN UPDATE SET
             |  tgt.${id("x", fBys)} = tgt.x + 100.0
             |""".stripMargin
        }
        spark.sql(mergeSql("db.a", mangled = true))
        spark.sql(mergeSql("db.b", mangled = false))
        def updSql(t: String, mangled: Boolean): String = {
          def id(c: String, f: Boolean) = if (mangled) m(c, f) else c
          s"UPDATE $t SET ${id("x", fUpd)} = x * 2.0 WHERE k = $whereK"
        }
        spark.sql(updSql("db.a", mangled = true))
        spark.sql(updSql("db.b", mangled = false))
        // API surfaces: cased merge keys + cased SET map keys, cased update map
        store.merge("db.a", src.filter(col("k") === 2L),
          keys = Seq(m("k", fApiK)),
          matched = Seq(graft.operators.MergeInto.MatchedUpdate(None,
            Map(m("v", fApiSet) -> concat(col("t.v"), org.apache.spark.sql.functions.lit("!"))))))
        store.merge("db.b", src.filter(col("k") === 2L), keys = Seq("k"),
          matched = Seq(graft.operators.MergeInto.MatchedUpdate(None,
            Map("v" -> concat(col("t.v"), org.apache.spark.sql.functions.lit("!"))))))
        store.update("db.a", col("k") === 5L, Map(m("x", fApiSet) -> org.apache.spark.sql.functions.lit(99.0)))
        store.update("db.b", col("k") === 5L, Map("x" -> org.apache.spark.sql.functions.lit(99.0)))
        val got = store.read("db.a").collect().map(_.toSeq).toSeq
          .sortBy(_.mkString("|"))
        val want = store.read("db.b").collect().map(_.toSeq).toSeq
          .sortBy(_.mkString("|"))
        if (got != want)
          Prop.falsified :| s"flags=$fs whereK=$whereK\n got: $got\nwant: $want"
        else Prop.passed
      }
      val result = SCTest.check(
        SCTest.Parameters.default.withMinSuccessfulTests(16).withInitialSeed(101L), prop)
      assert(result.passed, s"property failed: ${result.status}")

      // named errors, not silent no-ops: an unknown SET column
      import spark.implicits._
      store.createOrReplace("db.err", Seq((1L, "a")).toDF("k", "v"))
      val e1 = intercept[IllegalArgumentException] {
        store.update("db.err", col("k") === 1L,
          Map("nosuch" -> org.apache.spark.sql.functions.lit(1)))
      }
      assert(e1.getMessage.contains("nosuch"))
      val e2 = intercept[IllegalArgumentException] {
        store.merge("db.err", Seq((1L, "z")).toDF("k", "v"), keys = Seq("k"),
          matched = Seq(graft.operators.MergeInto.MatchedUpdate(None,
            Map("nosuch" -> org.apache.spark.sql.functions.lit(1)))))
      }
      assert(e2.getMessage.contains("nosuch"))

      // bloom DDL: the stored property carries the SCHEMA's spelling
      store.setBloomFilterIndex("db.err", Seq("K"))
      assert(store.bloomIndexCols("db.err") == Seq("k"),
        s"bloom must store schema case, got ${store.bloomIndexCols("db.err")}")
    } finally {
      store.detach()
      graft.queries.Scratch.deleteRecursively(java.nio.file.Paths.get(root))
    }
  }
}
