package graft.io

import java.sql.DriverManager
import java.util.Properties

import org.apache.spark.sql.{DataFrame, SaveMode}

/** JDBC row-store sinks — the direct twin of the reference's Postgres
  * load stage (`Part3/load_breadcrumb.py:60-89` builds an in-memory CSV
  * and `copy_from`s it on one connection; `Part3/stop.sql:1-74` defines
  * the trip/breadcrumb schema it lands in).
  *
  * Spark-native differences, by design:
  *  - the append path writes PER PARTITION in parallel (one connection
  *    and one batched insert stream per task) instead of the reference's
  *    single driver-side COPY — the only load shape that survives a
  *    1000-executor cluster;
  *  - upsert is stage-and-merge: land the batch in a staging table with
  *    the executors, then one driver-side set-based MERGE moves it into
  *    the target transactionally. Row-at-a-time upserts from executors
  *    would serialize on row locks; a set-based merge is one statement.
  *
  * Both write paths run end-to-end in the spec suite against embedded
  * Derby (the one row store on the classpath): append round-trip,
  * upsert key-overwrite, and re-apply idempotence. The merge statement
  * comes in two dialects — Postgres `ON CONFLICT` (the reference's
  * target database) and ANSI `MERGE INTO` (Derby/Oracle/DB2/SQL
  * Server) — both pure spec-pinned string generation.
  */
object JdbcSink {

  /** Parallel append load: each partition opens its own connection and
    * streams batched inserts (`batchsize` rows per round trip). The
    * partition count bounds concurrent connections — repartition the
    * frame to what the database can absorb before calling. */
  def appendJdbc(df: DataFrame, url: String, table: String,
      props: Properties, batchSize: Int = 10000): Unit =
    df.write
      .mode(SaveMode.Append)
      .option("batchsize", batchSize.toLong)
      .jdbc(url, table, props)

  /** Keyed upsert: stage the changes in `<table>_stage` (overwritten
    * per batch), then merge into `table` keeping the incoming row on
    * key conflict — the idempotent re-run story the reference's plain
    * COPY lacks. Re-applying the same batch is a no-op row-wise. */
  def upsertJdbc(df: DataFrame, url: String, table: String,
      keyCols: Seq[String], props: Properties,
      dialect: String = "postgres"): Unit = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val staging = table + "_stage"
    val valueCols = df.columns.toSeq.filterNot(keyCols.contains)
    // one staged row per key: both merge dialects REJECT a batch that
    // hits the same target row twice ("cannot affect row a second
    // time") — a normal CDC shape when one micro-batch carries two
    // updates to a key. Deterministic pick: max by the value columns
    // (callers wanting true latest-wins should include a version
    // column among the values — it then dominates the ordering).
    val deduped =
      if (valueCols.isEmpty) df.dropDuplicates(keyCols)
      else {
        val w = Window.partitionBy(keyCols.map(col): _*)
          .orderBy(valueCols.map(c => col(c).desc): _*)
        df.withColumn("_graft_rn", row_number().over(w))
          .filter(col("_graft_rn") === 1).drop("_graft_rn")
      }
    // first-ever batch: materialize the target's schema (zero-row
    // append creates the table when missing, appends nothing when
    // present) so the merge below always has somewhere to land —
    // the day-one state of a streaming foreachBatch upsert
    df.limit(0).write.mode(SaveMode.Append).jdbc(url, table, props)
    deduped.write
      .mode(SaveMode.Overwrite)
      .option("truncate", "true") // reuse the staging table, don't re-DDL
      .jdbc(url, staging, props)
    val sql = dialect match {
      case "postgres" => mergeSql(table, staging, keyCols, valueCols)
      case "ansi"     => mergeSqlStandard(table, staging, keyCols, valueCols)
      case other      => throw new IllegalArgumentException(
        s"unknown jdbc merge dialect: $other")
    }
    val conn = DriverManager.getConnection(url, props)
    try {
      val st = conn.createStatement()
      try {
        // ON CONFLICT demands a unique constraint, which Spark's JDBC
        // CREATE TABLE never emits — idempotently ensure one on the
        // key columns (ANSI MERGE needs no constraint; Derby also has
        // no IF NOT EXISTS, so this stays postgres-only)
        if (dialect == "postgres")
          st.executeUpdate(uniqueIndexSql(table, keyCols))
        st.executeUpdate(sql)
      } finally st.close()
    } finally conn.close()
  }

  /** Idempotent unique-index DDL backing the ON CONFLICT arbiter. */
  private[graft] def uniqueIndexSql(table: String, keyCols: Seq[String]): String =
    s"CREATE UNIQUE INDEX IF NOT EXISTS ${table}_graft_upsert_key " +
      s"ON $table (${keyCols.map(quoteIdent).mkString(", ")})"

  /** The set-based merge statement (Postgres `INSERT .. ON CONFLICT`
    * dialect, matching the reference's target database): insert every
    * staged row, and on key conflict overwrite the non-key columns with
    * the staged values. Pure string generation — spec-pinned.
    *
    * TABLE names interpolate RAW, exactly as handed to `df.write.jdbc`
    * (which also interpolates them unquoted): quoting them here would
    * resolve a different identifier on case-folding databases than the
    * one Spark created. COLUMN names are quoted — Spark's DDL quotes
    * them, so the created case is preserved and must be matched. */
  private[graft] def mergeSql(target: String, staging: String,
      keyCols: Seq[String], valueCols: Seq[String]): String = {
    require(keyCols.nonEmpty, "upsert needs at least one key column")
    val allCols = (keyCols ++ valueCols).map(quoteIdent).mkString(", ")
    val conflictKeys = keyCols.map(quoteIdent).mkString(", ")
    val updates =
      if (valueCols.isEmpty) ""
      else valueCols.map(c => s"${quoteIdent(c)} = EXCLUDED.${quoteIdent(c)}")
        .mkString(" DO UPDATE SET ", ", ", "")
    val action = if (updates.isEmpty) " DO NOTHING" else updates
    s"INSERT INTO $target ($allCols) " +
      s"SELECT $allCols FROM $staging " +
      s"ON CONFLICT ($conflictKeys)$action"
  }

  /** The same set-based merge in ANSI SQL:2003 `MERGE INTO` form
    * (Derby, Oracle, DB2, SQL Server). Semantics identical to the
    * Postgres form: key match → overwrite non-key columns with staged
    * values, no match → insert. */
  private[graft] def mergeSqlStandard(target: String, staging: String,
      keyCols: Seq[String], valueCols: Seq[String]): String = {
    require(keyCols.nonEmpty, "upsert needs at least one key column")
    val allCols = keyCols ++ valueCols
    val on = keyCols.map(c => s"t.${quoteIdent(c)} = s.${quoteIdent(c)}")
      .mkString(" AND ")
    val matched =
      if (valueCols.isEmpty) ""
      else valueCols.map(c => s"t.${quoteIdent(c)} = s.${quoteIdent(c)}")
        .mkString(" WHEN MATCHED THEN UPDATE SET ", ", ", "")
    val insertCols = allCols.map(quoteIdent).mkString(", ")
    val insertVals = allCols.map(c => s"s.${quoteIdent(c)}").mkString(", ")
    s"MERGE INTO $target t USING $staging s " +
      s"ON ($on)$matched " +
      s"WHEN NOT MATCHED THEN INSERT ($insertCols) VALUES ($insertVals)"
  }

  /** Double-quote an SQL identifier (escaping embedded quotes) so
    * generated statements never interpolate raw names. */
  private def quoteIdent(name: String): String =
    "\"" + name.replace("\"", "\"\"") + "\""
}
