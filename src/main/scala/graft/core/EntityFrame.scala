package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** An attribute table of one dataset, the engine's fundamental input.
  *
  * Mirrors the reference's `KlinkerFrame` metadata contract (table name +
  * id column carried through transformations; reference:
  * src/klinker/data/enhanced_df.py:87-310) but as a thin wrapper around a
  * Spark [[DataFrame]] — no DataFrame subclassing, and the reference's
  * whole pandas/dask dual code path collapses into this one distributed
  * implementation.
  *
  * Two shapes:
  *   - wide  (`isTriple=false`): one row per entity, arbitrary attribute
  *     columns, `idCol` is the entity id.
  *   - triple (`isTriple=true`): EAV form `(head, rel, tail)`;
  *     `idCol` must be the head column (enhanced_df.py:264-267).
  */
final case class EntityFrame(
    df: DataFrame,
    tableName: String,
    idCol: String,
    isTriple: Boolean = false) {

  require(df.columns.contains(idCol), s"id column '$idCol' not in ${df.columns.mkString(",")}")
  require(!isTriple || df.columns.length == 3, "triple frames must have exactly 3 columns")

  /** All attribute (non-id) columns. Triple frames expose only the tail
    * column as attribute data (enhanced_df.py:144-147,264-267). */
  def nonIdColumns: Seq[String] =
    if (isTriple) Seq(df.columns.last)
    else df.columns.toSeq.filterNot(_ == idCol)

  /** The reference's core prep op `concat_values`
    * (enhanced_df.py:180-310): per entity, stringify + space-join all
    * attribute values → `(idCol, _conc)`.
    *
    * Wide frames stay a narrow projection (no shuffle); triple frames
    * aggregate by head (one shuffle, map-side combined by Catalyst).
    * Distinct tails are sorted before joining so output is deterministic
    * (the reference's Python `set` ordering is not; its tests compare
    * set-wise — tests/util.py:4-14).
    */
  def concatValues(removeDuplicates: Boolean = true): DataFrame = {
    if (isTriple) {
      val Array(h, _, t) = df.columns
      val tail = trim(col(t).cast("string"))
      val joined =
        if (removeDuplicates) concat_ws(" ", array_sort(collect_set(tail)))
        else concat_ws(" ", collect_list(tail))
      df.na.drop(Seq(t))
        .groupBy(col(h).as(idCol))
        .agg(joined.as(EntityFrame.ConcCol))
    } else {
      // fillna("") + astype(str) + " ".join + strip (enhanced_df.py:202-209)
      val parts = nonIdColumns.map(c => coalesce(col(c).cast("string"), lit("")))
      df.select(
        col(idCol),
        trim(concat_ws(" ", parts: _*)).as(EntityFrame.ConcCol))
    }
  }

  /** Entity ids as a single-column frame. */
  def ids: DataFrame =
    if (isTriple) df.select(col(idCol)).distinct() else df.select(col(idCol))

  /** Bucketed sink on the id column (the [[Blocks.writeBucketed]]
    * treatment for entity tables): frames bucketed with the same count
    * join/semi-join on entity id across jobs with no exchange — the
    * sample restriction, anti-filter, and neighbor-concat joins all key
    * on it. */
  def writeBucketed(
      spark: org.apache.spark.sql.SparkSession,
      table: String, path: String, buckets: Int): Unit =
    df.write.mode("overwrite")
      .option("path", path)
      .bucketBy(buckets, idCol)
      .sortBy(idCol)
      .format("parquet")
      .saveAsTable(table)
}

object EntityFrame {
  /** Canonical name of the concatenated-values column. */
  val ConcCol = "_conc"

  /** Source for [[EntityFrame.writeBucketed]] tables — resolves through
    * the catalog so the scan keeps the bucket spec. */
  def readBucketed(
      spark: org.apache.spark.sql.SparkSession,
      table: String, tableName: String, idCol: String,
      isTriple: Boolean = false): EntityFrame =
    EntityFrame(spark.table(table), tableName, idCol, isTriple)

  /** Build a triple-form frame from a wide frame by unpivoting attribute
    * columns (reference fixture shape: tests/conftest.py:48-72). Null
    * tails are dropped, matching the reference's concat-time fillna. */
  def unpivot(wide: EntityFrame): EntityFrame = {
    val attrs = wide.nonIdColumns
    val stacked = wide.df.select(
      col(wide.idCol).cast("string").as("head"),
      explode(array(attrs.map(c =>
        struct(lit(c).as("rel"), col(c).cast("string").as("tail"))): _*)).as("kv"))
      .select(col("head"), col("kv.rel").as("rel"), col("kv.tail").as("tail"))
      .na.drop(Seq("tail"))
    EntityFrame(stacked, wide.tableName, "head", isTriple = true)
  }
}
