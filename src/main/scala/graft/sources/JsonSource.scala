package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructType}

/** JSON / REST-payload ingestion — Spark-native rethink of the reference's
  * `APIConnector` (`/root/reference/src/extract/api_connector.py`).
  *
  * The reference pulls JSON over HTTP and flattens it row-by-row in Python.
  * In a Spark pipeline the payloads land first (object store / Kafka) and
  * are parsed declaratively: nested structs project with dot-paths, arrays
  * explode into child rows — all codegen'd, no per-record Python.
  */
object JsonSource {

  /** Read a directory/file of JSON records with an explicit schema
    * (multiline tolerated for API-dump files).
    */
  def read(spark: SparkSession, path: String, schema: StructType,
           multiline: Boolean = false): DataFrame =
    spark.read.option("multiLine", multiline.toString).schema(schema).json(path)

  /** Parse a string column of JSON payloads in place (the landed-in-a-
    * column shape: Kafka value, events.props, …). `keepRawAs` preserves
    * the ORIGINAL string under that name — a malformed payload parses to
    * null, and overwriting in place would destroy the only evidence a
    * quarantine/debug table could use (a 100 TB ingest WILL contain
    * garbage payloads; `filter(parsed.isNull && raw.isNotNull)` is the
    * quarantine).
    */
  def parseColumn(df: DataFrame, jsonCol: String, schema: DataType,
                  keepRawAs: Option[String] = None): DataFrame = {
    val kept = keepRawAs match {
      case Some(raw) => df.withColumn(raw, col(jsonCol))
      case None      => df
    }
    kept.withColumn(jsonCol, from_json(col(jsonCol), schema))
  }

  /** Claim a unique output name: `wanted` if free, else `wanted_2`,
    * `wanted_3`, … — a flatten/explode that emits two columns with one
    * name poisons everything downstream (AMBIGUOUS_REFERENCE on by-name
    * access, duplicate-column failure on write), and API payloads DO
    * carry ids at several levels.
    */
  private def claim(taken: scala.collection.mutable.Set[String], wanted: String): String = {
    val name = if (!taken(wanted)) wanted
      else Iterator.from(2).map(i => s"${wanted}_$i").find(!taken(_)).get
    taken += name
    name
  }

  /** Flatten one level of nested structs to `parent_child` columns —
    * the reference's products flattening (`api_connector.py:137`
    * fetch_products: rating.{rate,count} → rating_rate, rating_count).
    * Name collisions (a top-level `rating_rate` next to struct
    * `rating{rate}`) disambiguate with a numeric suffix in field order.
    */
  def flattenStructs(df: DataFrame): DataFrame = {
    val taken = scala.collection.mutable.Set.empty[String]
    val cols: Seq[Column] = df.schema.fields.flatMap { f =>
      f.dataType match {
        case s: StructType =>
          s.fieldNames.map(n =>
            col(s"`${f.name}`.`$n`").as(claim(taken, s"${f.name}_$n"))).toSeq
        case _ => Seq(col(s"`${f.name}`").as(claim(taken, f.name)))
      }
    }.toIndexedSeq
    df.select(cols: _*)
  }

  /** Explode an array-of-structs column into child rows carrying the
    * parent keys — the reference's carts → order-items expansion
    * (`api_connector.py:168` fetch_carts: one row per cart product).
    * An item field sharing a parent column's name (ids at both levels)
    * disambiguates with a numeric suffix.
    */
  def explodeItems(df: DataFrame, arrayCol: String, parentCols: Seq[String]): DataFrame = {
    val item = explode(col(arrayCol)).as("_item")
    val base = df.select(parentCols.map(col) :+ item: _*)
    val itemFields = base.schema("_item").dataType.asInstanceOf[StructType].fieldNames
    val taken = scala.collection.mutable.Set(parentCols: _*)
    base.select(parentCols.map(col) ++
      itemFields.map(n => col(s"_item.`$n`").as(claim(taken, n))): _*)
  }
}
