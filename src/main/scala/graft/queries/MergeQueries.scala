package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{MergeInto, Scd}
import graft.sources.Tables.t

/** Oracle-backed exercises of the merge operator family (SURVEY.md §2.2 K5,
  * §2.3 F3/F4, §2.4 J2). Each query simulates deterministic source batches
  * from the `customer`/`orders` tables (modulo-key slices stand in for the
  * reference's bronze snapshots) and fixed batch timestamps, so the full
  * SCD2/SCD1/MERGE state machine is reproducible in plain SQL for DuckDB.
  */
object MergeQueries {

  private val Ts1 = "2024-01-01 00:00:00"
  private val Ts2 = "2024-02-01 00:00:00"

  // Batch 1: 80 % of customers. Batch 2: adds keys ≡8 (mod 10), drops keys
  // ≡0 (mod 17), bumps acctbal by 100 for keys ≡0 (mod 7).
  private def batch1(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .filter(col("c_custkey") % 10 < 8)
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"))

  private def batch2(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .filter(col("c_custkey") % 10 < 9 && col("c_custkey") % 17 =!= 0)
      .select(
        col("c_custkey"), col("c_name"),
        when(col("c_custkey") % 7 === 0, col("c_acctbal") + 100.0)
          .otherwise(col("c_acctbal")).as("c_acctbal"))

  // q18: full SCD2 lifecycle — initial load, then an incremental batch with
  // updates, deletes and inserts; output is the complete version history.
  def q18Scd2(s: SparkSession, dir: String): DataFrame = {
    val state1 = Scd.scd2Init(batch1(s, dir), lit(Ts1))
    Scd.scd2Merge(state1, batch2(s, dir), Seq("c_custkey"), lit(Ts2))
      .orderBy(col("c_custkey"), col(Scd.ValidFrom))
  }

  // q36: q18's SCD2 lifecycle with the reference's audit pair maintained by
  // the operator itself (opt-in via the target carrying the columns). The
  // oracle is shared with q34 — the SQL-text two-phase MERGE — pinning that
  // the fused operator, the SQL path, and DuckDB all agree on the full
  // envelope including _tf_create_date/_tf_update_date.
  def q36Scd2Audit(s: SparkSession, dir: String): DataFrame = {
    val state1 = Scd.scd2Init(batch1(s, dir), lit(Ts1), audit = true)
    Scd.scd2Merge(state1, batch2(s, dir), Seq("c_custkey"), lit(Ts2))
      .orderBy(col("c_custkey"), col(Scd.ValidFrom))
  }

  // q19: SCD1 dimension upsert — matched-and-changed update, insert, keep.
  def q19Scd1(s: SparkSession, dir: String): DataFrame =
    Scd.scd1Merge(batch1(s, dir), batch2(s, dir), Seq("c_custkey"))
      .orderBy(col("c_custkey"))

  // q22: generic MERGE with conditional update, insert, and conditional
  // NOT-MATCHED-BY-SOURCE delete (the branch Delta calls
  // `whenNotMatchedBySource` — reference 22_ETL_Silver_PySpark.py:78-81).
  def q22MergeDelete(s: SparkSession, dir: String): DataFrame = {
    val target = t(s, dir, "orders")
      .filter(col("o_orderkey") % 4 < 3)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    val source = t(s, dir, "orders")
      .filter(col("o_orderkey") % 4 > 0)
      .select(col("o_orderkey"), col("o_orderstatus"), (col("o_totalprice") * 1.05).as("o_totalprice"))
    MergeInto(
      target, source, Seq("o_orderkey"),
      matched = Seq(MergeInto.MatchedUpdate(
        Some(col("s.o_totalprice") > 200000.0),
        Map("o_totalprice" -> col("s.o_totalprice")))),
      notMatched = Seq(MergeInto.NotMatchedInsert(
        None,
        Map("o_orderkey" -> col("s.o_orderkey"),
            "o_orderstatus" -> col("s.o_orderstatus"),
            "o_totalprice" -> col("s.o_totalprice")))),
      notMatchedBySource = Seq(MergeInto.BySourceDelete(
        Some(col("t.o_orderstatus") === "O"))))
      .orderBy(col("o_orderkey"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q18_scd2_history" -> q18Scd2 _,
    "q19_scd1_upsert" -> q19Scd1 _,
    "q22_merge_delete" -> q22MergeDelete _,
    "q36_scd2_audit" -> q36Scd2Audit _)

  private val B1 = "SELECT c_custkey, c_name, c_acctbal FROM customer WHERE c_custkey % 10 < 8"
  private val B2 =
    """SELECT c_custkey, c_name,
      |  CASE WHEN c_custkey % 7 = 0 THEN c_acctbal + 100.0 ELSE c_acctbal END AS c_acctbal
      |FROM customer WHERE c_custkey % 10 < 9 AND c_custkey % 17 <> 0""".stripMargin

  val oracles: Map[String, String] = Map(
    "q18_scd2_history" ->
      s"""WITH b1 AS ($B1), b2 AS ($B2)
         |SELECT * FROM (
         |  -- unchanged current rows from batch 1
         |  SELECT b1.c_custkey, b1.c_name, b1.c_acctbal,
         |    TIMESTAMP '$Ts1' AS _tf_valid_from, CAST(NULL AS TIMESTAMP) AS _tf_valid_to
         |  FROM b1 JOIN b2 ON b1.c_custkey = b2.c_custkey
         |  WHERE b1.c_name = b2.c_name AND b1.c_acctbal = b2.c_acctbal
         |  UNION ALL
         |  -- closed: changed in batch 2
         |  SELECT b1.c_custkey, b1.c_name, b1.c_acctbal,
         |    TIMESTAMP '$Ts1', TIMESTAMP '$Ts2'
         |  FROM b1 JOIN b2 ON b1.c_custkey = b2.c_custkey
         |  WHERE b1.c_name <> b2.c_name OR b1.c_acctbal <> b2.c_acctbal
         |  UNION ALL
         |  -- closed: deleted from batch 2
         |  SELECT b1.c_custkey, b1.c_name, b1.c_acctbal,
         |    TIMESTAMP '$Ts1', TIMESTAMP '$Ts2'
         |  FROM b1 WHERE NOT EXISTS (SELECT 1 FROM b2 WHERE b2.c_custkey = b1.c_custkey)
         |  UNION ALL
         |  -- new current version: changed keys
         |  SELECT b2.c_custkey, b2.c_name, b2.c_acctbal,
         |    TIMESTAMP '$Ts2', CAST(NULL AS TIMESTAMP)
         |  FROM b1 JOIN b2 ON b1.c_custkey = b2.c_custkey
         |  WHERE b1.c_name <> b2.c_name OR b1.c_acctbal <> b2.c_acctbal
         |  UNION ALL
         |  -- inserted keys
         |  SELECT b2.c_custkey, b2.c_name, b2.c_acctbal,
         |    TIMESTAMP '$Ts2', CAST(NULL AS TIMESTAMP)
         |  FROM b2 WHERE NOT EXISTS (SELECT 1 FROM b1 WHERE b1.c_custkey = b2.c_custkey))
         |ORDER BY c_custkey, _tf_valid_from""".stripMargin,
    "q19_scd1_upsert" ->
      s"""WITH b1 AS ($B1), b2 AS ($B2)
         |SELECT COALESCE(b2.c_custkey, b1.c_custkey) AS c_custkey,
         |  COALESCE(b2.c_name, b1.c_name) AS c_name,
         |  COALESCE(b2.c_acctbal, b1.c_acctbal) AS c_acctbal
         |FROM b1 FULL OUTER JOIN b2 ON b1.c_custkey = b2.c_custkey
         |ORDER BY c_custkey""".stripMargin,
    // shared with the SQL-text MERGE twin — one oracle pins both paths
    "q36_scd2_audit" -> SqlDmlQueries.oracles("q34_sql_merge_scd2"),
    "q22_merge_delete" ->
      """WITH tgt AS (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders WHERE o_orderkey % 4 < 3),
        |src AS (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice * 1.05 AS o_totalprice
        |  FROM orders WHERE o_orderkey % 4 > 0)
        |SELECT * FROM (
        |  -- matched: conditional update else keep
        |  SELECT tgt.o_orderkey, tgt.o_orderstatus,
        |    CASE WHEN src.o_totalprice > 200000.0 THEN src.o_totalprice ELSE tgt.o_totalprice END AS o_totalprice
        |  FROM tgt JOIN src ON tgt.o_orderkey = src.o_orderkey
        |  UNION ALL
        |  -- not matched: insert
        |  SELECT src.o_orderkey, src.o_orderstatus, src.o_totalprice
        |  FROM src WHERE NOT EXISTS (SELECT 1 FROM tgt WHERE tgt.o_orderkey = src.o_orderkey)
        |  UNION ALL
        |  -- not matched by source: conditional delete (keep non-'O')
        |  SELECT tgt.o_orderkey, tgt.o_orderstatus, tgt.o_totalprice
        |  FROM tgt WHERE NOT EXISTS (SELECT 1 FROM src WHERE src.o_orderkey = tgt.o_orderkey)
        |    AND tgt.o_orderstatus <> 'O')
        |ORDER BY o_orderkey""".stripMargin)
}
