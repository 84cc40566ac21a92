package graft.sources

import org.apache.spark.sql.{DataFrame, DataFrameReader, SparkSession}
import org.apache.spark.sql.types.StructType

/** Multi-format file source: the harness fixtures are Parquet, but a
  * migration engine's relational input can arrive as CSV/JSON dumps or
  * ORC exports. One entry point, format-dispatched; always prefer an
  * explicit schema (schema inference reads the data twice and guesses —
  * never acceptable at 100 TB; for CSV it is also the only way to get
  * correct types).
  */
object FileSource {

  val supported: Set[String] = Set("parquet", "orc", "csv", "json")

  /** Infer format from the path extension; unknown extensions are an
    * error (a silent parquet fallback would surface later as a cryptic
    * 'not a Parquet file').
    */
  def formatOf(path: String): String = {
    val ext = path.split('.').last.toLowerCase
    require(supported(ext),
      s"cannot infer format from '$path' (extension .$ext); pass format explicitly")
    ext
  }

  def read(
      spark: SparkSession,
      path: String,
      format: String = "",
      schema: Option[StructType] = None): DataFrame = {
    val fmt = if (format.nonEmpty) format else formatOf(path)
    require(supported(fmt), s"unsupported format $fmt")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    var r: DataFrameReader = spark.read
    schema.foreach(s => r = r.schema(s))
    fmt match {
      case "csv" =>
        require(schema.nonEmpty, "CSV requires an explicit schema (no inference at scale)")
        r.option("header", "true").csv(path)
      case "json" =>
        // schema-less JSON would run a full inference pass (double I/O)
        require(schema.nonEmpty, "JSON requires an explicit schema (no inference at scale)")
        r.json(path)
      case "orc" => r.orc(path)
      case _ => r.parquet(path)
    }
  }

  /** Write a DataFrame out in any supported format (round-trip tests /
    * interchange).
    */
  def write(df: DataFrame, path: String, format: String): Unit = {
    require(supported(format), s"unsupported format $format")
    val w = df.write.mode("overwrite")
    format match {
      case "csv" => w.option("header", "true").csv(path)
      case "json" => w.json(path)
      case "orc" => w.orc(path)
      case _ => w.parquet(path)
    }
  }
}
