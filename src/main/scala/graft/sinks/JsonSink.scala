package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DateType, TimestampNTZType, TimestampType}

/** The document sink (SURVEY.md §2.1 S4). The reference writes one
  * `collection{i}.json` JSON-array file per non-empty root collection and
  * zips them (server/WriteToFile.js:5-62), with the whole dataset
  * stringified in driver memory. Here each collection writes as
  * distributed JSON-lines (`df.write.json`) — the scalable framing; null
  * fields are omitted by Spark's JSON writer (matching the reference's
  * key-omission for empty embeds), and empty collections are skipped
  * (server/WriteToFile.js:9-11).
  */
object JsonSink {

  /** Write every non-empty collection under `outDir/<name>/`. */
  def write(collections: Seq[(String, DataFrame)], outDir: String): Seq[String] =
    collections.flatMap { case (name, df) =>
      if (df.isEmpty) None
      else {
        df.write.mode("overwrite").json(s"$outDir/$name")
        Some(name)
      }
    }

  /** L5 — date normalization parity (server/MySQLDBManager.js:268-276,
    * server/PostgresDBManager.js:284-293): the reference formats every
    * driver `Date` as a `"YYYY-MM-DD"` string in `Asia/Bangkok` time. The
    * reference *sniffs values* (so loosely that numeric-ish strings can be
    * misclassified — a recorded defect); we drive off the schema instead
    * and convert only true date/timestamp columns. Apply at scan time
    * (before nesting), as the reference does.
    */
  def normalizeDates(df: DataFrame): DataFrame =
    df.schema.fields.foldLeft(df) { (d, f) =>
      f.dataType match {
        case TimestampType =>
          d.withColumn(f.name,
            date_format(from_utc_timestamp(col(f.name), "Asia/Bangkok"), "yyyy-MM-dd"))
        case TimestampNTZType =>
          // NTZ wall-times are UTC by fixture convention; under a UTC
          // session the cast to instant is identity, then shift.
          d.withColumn(f.name,
            date_format(from_utc_timestamp(col(f.name).cast(TimestampType),
              "Asia/Bangkok"), "yyyy-MM-dd"))
        case DateType =>
          d.withColumn(f.name, date_format(col(f.name), "yyyy-MM-dd"))
        case _ => d
      }
    }

  /** A loader wrapper for parity mode: plug into
    * [[graft.map.DataMapper]] so every scanned table has its temporal
    * columns normalized before nesting.
    */
  def normalizingLoader(
      base: (SparkSession, String, String) => DataFrame): (SparkSession, String, String) => DataFrame =
    (spark, dir, table) => normalizeDates(base(spark, dir, table))
}
