package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Catalog/metastore surface (VERDICT r10 missing #3): the engine's
  * tables as CATALOG objects with computed statistics, so sizing
  * decisions (the q_dedup_bloom sketch geometry, broadcast choices a
  * user makes by hand) can read a metastore SCALAR instead of paying a
  * count() pre-scan over the corpus.
  *
  * The local harness runs an in-memory catalog (statistics live for the
  * session); against a persistent metastore (Hive/Glue/Unity) the same
  * calls durably record stats at write time and every later session
  * reads them for free — `ANALYZE TABLE ... COMPUTE STATISTICS` is the
  * standard contract either way. CBO also picks these stats up for join
  * planning when spark.sql.cbo.enabled is set.
  */
object CatalogOps {

  /** Register an existing parquet path as an EXTERNAL catalog table
    * (idempotent). The data stays where it is; only metadata enters the
    * catalog.
    */
  def registerParquet(s: SparkSession, table: String, path: String): Unit =
    if (!s.catalog.tableExists(table)) {
      s.catalog.createTable(table, path, "parquet")
      ()
    }

  /** Compute table-level statistics (row count, size) into the catalog —
    * one scan now, a free scalar for every consumer after.
    */
  def analyze(s: SparkSession, table: String): Unit = {
    s.sql(s"ANALYZE TABLE $table COMPUTE STATISTICS")
    ()
  }

  /** The catalog's row count for `table`, if statistics were computed —
    * the scalar bloomSeen's sizing reads instead of a corpus pre-scan.
    */
  def statsRowCount(s: SparkSession, table: String): Option[Long] = {
    if (!s.catalog.tableExists(table)) return None
    val meta = s.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(table))
    meta.stats.flatMap(_.rowCount).map(_.toLong)
  }

  /** The catalog name a fixture table of `dir` registers under — ONE
    * definition shared by [[registerFixture]] and stats consumers
    * (q_dedup_bloom's sizing), so the lookup can never drift from the
    * registration.
    */
  def fixtureTableName(dir: String, name: String): String = {
    val slug = dir.replaceAll("[^A-Za-z0-9]+", "_").stripPrefix("_")
    s"graft_${slug}_$name"
  }

  /** Register + analyze every fixture table of a dir under
    * `graft_<slug>_<name>` — the one-time setup a production deployment
    * does at ingest time. Returns the table-name map.
    */
  def registerFixture(s: SparkSession, dir: String): Map[String, String] = {
    val names = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    names.map { n =>
      val t = fixtureTableName(dir, n)
      registerParquet(s, t, s"$dir/$n.parquet")
      analyze(s, t)
      n -> t
    }.toMap
  }

  /** [[graft.operators.DedupQueries.bloomSeen]] with CATALOG-STATS
    * sizing: the corpus is a registered, analyzed table and the sketch
    * geometry comes from `statsRowCount` — zero pre-scan when stats
    * exist (falls back to one count() when they don't, with the same
    * result: the geometry scalar is the only thing stats replace).
    */
  def bloomSeenCatalog(s: SparkSession, corpusTable: String,
                       batch: DataFrame): DataFrame = {
    val corpus = s.table(corpusTable)
    graft.operators.DedupQueries.bloomSeen(
      corpus, batch, knownCount = statsRowCount(s, corpusTable))
  }
}
