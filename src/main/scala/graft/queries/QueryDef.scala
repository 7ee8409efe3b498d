package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One driver-checkable query: a Spark DataFrame program over the testdata
  * tables plus (when SQL-expressible) the equivalent DuckDB oracle SQL.
  * Column names/types must match the oracle exactly — the driver sorts
  * columns by name and hashes values.
  */
final case class QueryDef(
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  /** Parquet table loader rooted at the per-SF dir. */
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** The events table carries TIMESTAMP(NANOS) parquet, which Spark 4
    * only reads as long (spark.sql.legacy.parquet.nanosAsLong=true, set
    * in every session builder); convert to a proper timestamp at µs
    * precision here. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = table(spark, dir, "events")
    import org.apache.spark.sql.functions._
    if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      // Integer division: `/` on a long column promotes to double, whose
      // 53-bit mantissa cannot represent epoch-nanos (~1.7e18) exactly —
      // the ±hundreds-of-ns rounding error can flip a second boundary vs
      // DuckDB's native-nanos epoch(). `div` stays in long arithmetic.
      raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else raw
  }

  /** Shared tokenizer fragments — MUST stay in lockstep with
    * [[graft.functions.Text.tokenize]]. */
  val stopwordsSqlList: String =
    graft.functions.Text.Stopwords.map(s => s"'$s'").mkString("(", ",", ")")

  /** DuckDB token stream: SELECT <id> AS id, tok AS key FROM <table>. */
  def duckTokens(idExpr: String, textExpr: String, table: String, minLen: Int = 3): String =
    s"""SELECT id, tok AS key FROM (
       |  SELECT $idExpr AS id,
       |         unnest(regexp_split_to_array(lower($textExpr), '[^a-z0-9]+')) AS tok
       |  FROM $table)
       |WHERE length(tok) >= $minLen AND tok NOT IN $stopwordsSqlList""".stripMargin
}
