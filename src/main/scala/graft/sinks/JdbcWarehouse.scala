package graft.sinks

import java.sql.{Connection, DriverManager}
import java.util.Properties

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JDBC warehouse load/read — Spark-native rethink of the reference's
  * `DatabaseLoader` (`/root/reference/src/load/db_loader.py:225`
  * load_dataframe, `:289` batched to_sql, `:319` _upsert_data INSERT ON
  * CONFLICT).
  *
  * The reference pushes pandas batches through ONE driver-side connection;
  * here writes go through Spark's JDBC sink, where EVERY PARTITION opens
  * its own connection and streams `batchsize`-row `executeBatch` inserts —
  * load parallelism is the cluster's, not a single loop. Reads come back
  * partitioned on a numeric column so a big dim read-back is also parallel.
  *
  * Upsert is computed as a Spark-side last-wins merge ([[DataSink.upsert]])
  * against the current snapshot, landed in a staging table, then swapped in
  * with DROP + RENAME inside one transaction — readers see the old or the
  * new version, never a half-written one. (Row-at-a-time INSERT ON CONFLICT
  * on 100 TB of updates is a serialization bottleneck; merge-then-swap is
  * one distributed write.)
  */
object JdbcWarehouse {

  /** Load a DataFrame into a table (db_loader.py:225): `Append` ≡ the
    * reference's 'append', `Overwrite` ≡ 'replace', `ErrorIfExists` ≡
    * 'fail'. Each executor batches `batchSize` rows per round trip
    * (db_loader.py's `batch_size`, default 1000).
    *
    * Deliberately does NOT return a row count: the reference counts the
    * pandas frame it already holds, but here that would be a second full
    * pass over a distributed dataset — pipeline stages log counts from
    * aggregates they already compute.
    */
  def load(df: DataFrame, url: String, table: String,
           mode: SaveMode = SaveMode.Append, batchSize: Int = 1000,
           props: Properties = new Properties): Unit =
    df.write.mode(mode).option("batchsize", batchSize.toString)
      .jdbc(url, table, props)

  /** Dim read-back (db_loader.py reads dims for FK resolution). Single
    * partition — use [[readPartitioned]] for anything big.
    */
  def read(spark: SparkSession, url: String, table: String,
           props: Properties = new Properties): DataFrame =
    spark.read.jdbc(url, table, props)

  /** Parallel read: Spark slices `[lower, upper]` of `partitionCol` into
    * `numPartitions` range predicates, one connection each.
    */
  def readPartitioned(spark: SparkSession, url: String, table: String,
                      partitionCol: String, lower: Long, upper: Long,
                      numPartitions: Int,
                      props: Properties = new Properties): DataFrame =
    spark.read.jdbc(url, table, partitionCol, lower, upper, numPartitions, props)

  /** Load-metadata stamps (db_loader.py:249–252): `updated_at` always
    * refreshed, `created_at` added only if absent. `loadedAt` is
    * caller-supplied so re-runs are reproducible (the reference stamps
    * wall-clock time, which breaks idempotent replays).
    */
  def withLoadMetadata(df: DataFrame, loadedAt: java.sql.Timestamp): DataFrame = {
    val stamped = df.withColumn("updated_at", lit(loadedAt))
    if (df.columns.contains("created_at")) stamped
    else stamped.withColumn("created_at", lit(loadedAt))
  }

  /** Project `df` down to the columns that exist in the target table
    * (db_loader.py:255–262's inspector filter), case-insensitively.
    */
  def projectToTable(spark: SparkSession, df: DataFrame, url: String,
                     table: String, props: Properties = new Properties): DataFrame = {
    val target = read(spark, url, table, props).schema.fieldNames
      .map(_.toLowerCase).toSet
    df.select(df.columns.filter(c => target.contains(c.toLowerCase)).map(col).toIndexedSeq: _*)
  }

  /** True iff `table` is queryable (probe query, dialect-neutral — JDBC
    * catalog metadata case-folds differently per engine).
    */
  def tableExists(url: String, table: String,
                  props: Properties = new Properties): Boolean =
    withConnection(url, props) { conn =>
      try { conn.createStatement().executeQuery(s"SELECT 1 FROM $table WHERE 1=0").close(); true }
      catch { case _: java.sql.SQLException => false }
    }

  /** Upsert `updates` into `table` by `keys` (db_loader.py:319 INSERT ON
    * CONFLICT UPDATE): last-wins on `versionCol`, updates beating current
    * on ties. The merge runs distributed, lands in `table_staging`, and the
    * swap is DROP + RENAME in one transaction (transactional DDL where the
    * engine supports it, e.g. Derby/Postgres).
    *
    * @param renameSql dialect hook for the swap statement; default is the
    *                  Derby/MySQL `RENAME TABLE a TO b` form.
    */
  def upsert(spark: SparkSession, url: String, table: String, updates: DataFrame,
             keys: Seq[String], versionCol: String, batchSize: Int = 1000,
             props: Properties = new Properties,
             renameSql: (String, String) => String =
               (a, b) => s"RENAME TABLE $a TO $b"): Unit = {
    if (!tableExists(url, table, props)) {
      load(updates, url, table, SaveMode.ErrorIfExists, batchSize, props)
      return
    }
    val current = read(spark, url, table, props)
    val merged = DataSink.upsert(current, updates.select(current.columns.map(col).toIndexedSeq: _*),
      keys, versionCol)
    val staging = s"${table}_staging"
    // the staging write EXECUTES the lazy read of `table`, so the snapshot
    // is fully consumed before anything below mutates it
    load(merged, url, staging, SaveMode.Overwrite, batchSize, props)
    withConnection(url, props) { conn =>
      conn.setAutoCommit(false)
      val st = conn.createStatement()
      st.execute(s"DROP TABLE $table")
      st.execute(renameSql(staging, table))
      conn.commit()
    }
  }

  /** A warehouse table definition for [[initializeSchema]]: schema plus
    * the constraint/index DDL the reference's schema.sql carries.
    */
  final case class TableDef(name: String, schema: StructType,
                            primaryKey: Seq[String] = Nil,
                            indexes: Seq[Seq[String]] = Nil)

  /** The `etl_runs` bookkeeping table ([[logEtlRun]]'s target), indexed by
    * run id — the analog of the reference's etl_runs DDL in schema.sql.
    */
  val EtlRunsDef: TableDef = TableDef("etl_runs",
    StructType(Seq(
      StructField("run_id", StringType), StructField("stage", StringType),
      StructField("status", StringType), StructField("rows_processed", LongType),
      StructField("finished_at", TimestampType))),
    indexes = Seq(Seq("run_id")))

  /** ANSI DDL type for a Spark field. Strings map to VARCHAR, not
    * CLOB/TEXT: Derby's CLOB rejects pushed-down `=` predicates, and a
    * warehouse dim column should be comparable/indexable.
    */
  def ddlType(dt: DataType): String = dt match {
    case LongType          => "BIGINT"
    case IntegerType       => "INTEGER"
    case ShortType         => "SMALLINT"
    case DoubleType        => "DOUBLE"
    case FloatType         => "REAL"
    case BooleanType       => "BOOLEAN"
    case DateType          => "DATE"
    case TimestampType | TimestampNTZType => "TIMESTAMP"
    case d: DecimalType    => s"DECIMAL(${d.precision},${d.scale})"
    case StringType        => "VARCHAR(4000)"
    case other => throw new IllegalArgumentException(
      s"ddlType: no warehouse mapping for ${other.simpleString}")
  }

  /** CREATE TABLE statement for a [[TableDef]] (no IF NOT EXISTS — Derby
    * lacks it; [[initializeSchema]] probes first).
    */
  def createTableDdl(t: TableDef): String = {
    val cols = t.schema.fields.map { f =>
      val nullability = if (f.nullable) "" else " NOT NULL"
      s"${f.name} ${ddlType(f.dataType)}$nullability"
    }
    val pk = if (t.primaryKey.nonEmpty)
      Seq(s"PRIMARY KEY (${t.primaryKey.mkString(", ")})") else Nil
    s"CREATE TABLE ${t.name} (${(cols ++ pk).mkString(", ")})"
  }

  /** Bootstrap the warehouse schema before any load — the reference's
    * `initialize_schema` (db_loader.py:84 executes schema.sql: tables +
    * indexes). Spark's JDBC sink otherwise CREATEs implicitly on first
    * write, which loses constraints, indexes, and NOT NULLs, and races
    * when several arms first-write concurrently. Idempotent: existing
    * tables are left untouched, so re-runs and rolling deploys are safe.
    *
    * @return the table names actually created this call.
    */
  def initializeSchema(url: String, tables: Seq[TableDef],
                       props: Properties = new Properties): Seq[String] =
    tables.filterNot(t => tableExists(url, t.name, props)).map { t =>
      withConnection(url, props) { conn =>
        val st = conn.createStatement()
        st.execute(createTableDdl(t))
        t.indexes.zipWithIndex.foreach { case (cols, i) =>
          st.execute(s"CREATE INDEX idx_${t.name}_$i ON ${t.name} (${cols.mkString(", ")})")
        }
      }
      t.name
    }

  /** ETL run log row (db_loader.py:443 log_etl_run), appended via JDBC. */
  def logEtlRun(spark: SparkSession, url: String, table: String, runId: String,
                stage: String, status: String, rowsProcessed: Long,
                finishedAt: java.sql.Timestamp,
                props: Properties = new Properties): Unit = {
    import spark.implicits._
    load(Seq((runId, stage, status, rowsProcessed, finishedAt))
      .toDF("run_id", "stage", "status", "rows_processed", "finished_at"),
      url, table, SaveMode.Append, 1, props)
  }

  private def withConnection[A](url: String, props: Properties)(f: Connection => A): A = {
    val conn = DriverManager.getConnection(url, props)
    try f(conn) finally conn.close()
  }
}
