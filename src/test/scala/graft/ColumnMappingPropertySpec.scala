package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.tables.TableStore

/** Randomized model test for the column-mapping layer: arbitrary
  * interleavings of RENAME / DROP / append / UPDATE / DELETE against a
  * driver-side reference model must keep `store.read` equal to the model
  * — the mapping (logical↔physical translation at the parquet boundary)
  * has to be invisible to every DML path in every order. */
class ColumnMappingPropertySpec extends AnyFunSuite {

  lazy val spark = graft.core.GraftSession.local(4)
  import spark.implicits._

  // model row: k is the immutable key; a (long) and b (string) are
  // payload columns that can be renamed, dropped, updated
  private case class Model(
      aName: Option[String], bName: Option[String],
      rows: Map[Long, (Option[Long], Option[String])])

  sealed private trait Op
  private case class RenameA(to: String) extends Op
  private case class RenameB(to: String) extends Op
  private case object DropA extends Op
  private case object DropB extends Op
  private case class Append(ks: Seq[Long]) extends Op
  private case class UpdateA(mod: Long) extends Op
  private case class Delete(mod: Long) extends Op

  private val opGen: Gen[Op] = Gen.frequency(
    3 -> Gen.oneOf("x1", "x2", "x3", "x4", "x5").map(RenameA.apply),
    3 -> Gen.oneOf("y1", "y2", "y3", "y4", "y5").map(RenameB.apply),
    1 -> Gen.const(DropA),
    1 -> Gen.const(DropB),
    3 -> Gen.chooseNum(100L, 120L).map(base => Append(Seq(base, base + 1))),
    3 -> Gen.chooseNum(2L, 5L).map(UpdateA.apply),
    2 -> Gen.chooseNum(2L, 5L).map(Delete.apply))

  test("random rename/drop/DML interleavings equal the reference model") {
    var salt = 0L // fresh key space per sequence so appends never collide
    val prop = Prop.forAll(Gen.listOfN(7, opGen)) { ops =>
      salt += 1000L
      val root = Files.createTempDirectory("graft_cmprop").toString
      val store = new TableStore(spark, root)
      val tbl = "db.m"
      try {
        val init = (0L until 10L).map(k => (k, k * 10, s"v$k"))
        store.createOrReplace(tbl, init.toDF("k", "a", "b"))
        var m = Model(Some("a"), Some("b"),
          init.map { case (k, a, b) => k -> (Some(a): Option[Long], Some(b): Option[String]) }.toMap)

        ops.foreach {
          case RenameA(to0) =>
            val to = to0 + salt
            if (m.aName.isDefined && !m.bName.contains(to)) {
              store.renameColumn(tbl, m.aName.get, to); m = m.copy(aName = Some(to))
            }
          case RenameB(to0) =>
            val to = to0 + salt
            if (m.bName.isDefined && !m.aName.contains(to)) {
              store.renameColumn(tbl, m.bName.get, to); m = m.copy(bName = Some(to))
            }
          case DropA =>
            if (m.aName.isDefined && m.bName.isDefined) { // keep ≥2 cols (k + one)
              store.dropColumn(tbl, m.aName.get)
              m = m.copy(aName = None,
                rows = m.rows.view.mapValues { case (_, b) => (None: Option[Long], b) }.toMap)
            }
          case DropB =>
            if (m.aName.isDefined && m.bName.isDefined) {
              store.dropColumn(tbl, m.bName.get)
              m = m.copy(bName = None,
                rows = m.rows.view.mapValues { case (a, _) => (a, None: Option[String]) }.toMap)
            }
          case Append(ks0) =>
            val ks = ks0.map(_ + salt).filterNot(m.rows.contains)
            val cols = Seq("k") ++ m.aName ++ m.bName
            val rows = ks.map { k =>
              org.apache.spark.sql.Row.fromSeq(
                Seq(k) ++ m.aName.map(_ => k * 10) ++ m.bName.map(_ => s"v$k"))
            }
            val schema = org.apache.spark.sql.types.StructType(cols.map {
              case "k" => org.apache.spark.sql.types.StructField("k",
                org.apache.spark.sql.types.LongType)
              case n if m.aName.contains(n) => org.apache.spark.sql.types.StructField(n,
                org.apache.spark.sql.types.LongType)
              case n => org.apache.spark.sql.types.StructField(n,
                org.apache.spark.sql.types.StringType)
            })
            store.append(tbl, spark.createDataFrame(
              spark.sparkContext.parallelize(rows), schema))
            m = m.copy(rows = m.rows ++ ks.map(k =>
              k -> (m.aName.map(_ => k * 10), m.bName.map(_ => s"v$k"))))
          case UpdateA(mod) =>
            m.aName.foreach { a =>
              store.update(tbl, col("k") % mod === 0, Map(a -> (col(a) + 1)))
              m = m.copy(rows = m.rows.map { case (k, (av, bv)) =>
                k -> (if (k % mod == 0) (av.map(_ + 1), bv) else (av, bv))
              })
            }
          case Delete(mod) =>
            store.delete(tbl, col("k") % mod === 1)
            m = m.copy(rows = m.rows.filterNot { case (k, _) => k % mod == 1 })
        }

        val expectCols = (Seq("k") ++ m.aName ++ m.bName).sorted
        val got = store.read(tbl)
        val gotCols = got.columns.sorted.toSeq
        val colsOk = gotCols == expectCols
        val gotRows = got.collect().map { r =>
          val k = r.getLong(r.fieldIndex("k"))
          k -> (m.aName.map(a => r.getLong(r.fieldIndex(a))),
            m.bName.map(b => r.getString(r.fieldIndex(b))))
        }.toMap
        val expectRows = m.rows.view.mapValues { case (a, b) =>
          (m.aName.flatMap(_ => a), m.bName.flatMap(_ => b))
        }.toMap
        val rowsOk = gotRows == expectRows
        if (!colsOk) println(s"cols mismatch: got $gotCols expect $expectCols after $ops")
        if (!rowsOk) println(s"rows mismatch after $ops")
        colsOk && rowsOk
      } finally store.detach()
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(12), prop)
    assert(res.passed, res.status.toString)
  }
}
