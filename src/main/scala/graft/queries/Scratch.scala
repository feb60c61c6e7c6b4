package graft.queries

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.tables.TableStore

/** Query-local scratch stores for the correctness/bench harness: the
  * store-layer queries (SQL DML, incremental indexes, streaming sinks)
  * each materialize a throwaway [[TableStore]] under a fresh temp
  * directory. One helper owns the lifecycle — create ([[store]]), then
  * MATERIALIZE-detach-delete ([[seal]]) — because the returned DataFrame
  * is otherwise lazy over the store's files and the directory could
  * never be reclaimed: before this helper ~25 call sites created temp
  * dirs and only detached, leaking a small store per bench/correctness
  * invocation, a few hundred MB per round.
  *
  * [[seal]]'s `localCheckpoint()` is the load-bearing step: it cuts the
  * result's lineage over to executor-storage blocks so the files can be
  * deleted before the caller consumes the frame (the bench's per-query
  * `clearState` releases the blocks afterwards). Harness-only by design —
  * production operators return lazy plans over durable tables and never
  * route through here.
  */
private[graft] object Scratch {

  /** A throwaway [[TableStore]] under a fresh temp directory; pair with
    * [[seal]] on the query's result. */
  def store(s: SparkSession, prefix: String): TableStore =
    new TableStore(s, Files.createTempDirectory(prefix).toString)

  /** A bare scratch directory (streaming checkpoints, file-sink output);
    * pass it to [[seal]]'s `extraDirs` for deletion. */
  def dir(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  /** Materialize `result` (cutting its lineage off the scratch files),
    * then detach every store and delete its directory plus `extraDirs`.
    * Call this EXACTLY where the old code called `store.detach()` — on
    * the query's final frame, after all DML/streaming is done. */
  def seal(result: DataFrame, stores: Seq[TableStore],
      extraDirs: Seq[String] = Nil): DataFrame = {
    val out = result.localCheckpoint()
    stores.foreach { st =>
      st.detach()
      deleteRecursively(Paths.get(st.rootDir))
    }
    extraDirs.foreach(d => deleteRecursively(Paths.get(d)))
    out
  }

  def seal(result: DataFrame, store: TableStore): DataFrame =
    seal(result, Seq(store))

  /** Bracket form for `try { … } finally store.detach()` sites: run
    * `body`, [[seal]] its result; on failure still detach (scratch files
    * are left for debugging, exactly like the old finally-detach). */
  def sealing(store: TableStore, extraDirs: Seq[String] = Nil)(
      body: => DataFrame): DataFrame = {
    var ok = false
    try { val out = seal(body, Seq(store), extraDirs); ok = true; out }
    finally if (!ok) store.detach()
  }

  def deleteRecursively(p: Path): Unit = {
    import scala.jdk.CollectionConverters._
    if (Files.exists(p)) {
      // Files.walk holds directory handles until closed — an unclosed
      // stream per seal leaks handles (and an open handle can make the
      // delete itself fail on some filesystems)
      val walk = Files.walk(p)
      val all = try walk.iterator().asScala.toSeq finally walk.close()
      all.reverse.foreach(q => Files.deleteIfExists(q))
    }
  }
}
