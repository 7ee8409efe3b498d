package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Text

/** The full input bundle of a blocking task (reference
  * src/klinker/data/ea_dataset.py:18-110): left/right attribute frames,
  * optional relation-triple frames, optional gold standard. */
object BlockingDataset {
  import org.apache.spark.sql.SparkSession

  /** S1: load a dataset bundle from a directory of data files
    * (`left.<ext>`, `right.<ext>`, optional `left_rel.<ext>`,
    * `right_rel.<ext>`, `gold.<ext>`) — the Spark shape of the
    * reference's sylloge loader (ea_dataset.py:28-110), for any
    * DataSource format. Parquet is the scale path (columnar, predicate
    * pushdown, splittable); CSV (header + schema inference by default —
    * how sylloge benchmark dumps ship) and JSON-lines ride the same
    * DataSourceV2 machinery, so partitioned reads and column pruning
    * where the format allows come free. Triple-form is detected by the
    * 3-column (head, rel, tail) convention. */
  def load(
      spark: SparkSession, dir: String,
      format: String = "parquet",
      options: Map[String, String] = Map.empty,
      leftName: String = "left", rightName: String = "right",
      idCol: String = "id"): BlockingDataset = {
    val defaults = format match {
      case "csv" => Map("header" -> "true", "inferSchema" -> "true")
      case _     => Map.empty[String, String]
    }
    def read(name: String): DataFrame =
      spark.read.format(format).options(defaults ++ options)
        .load(s"$dir/$name.$format")
    def opt(name: String): Option[DataFrame] =
      try Some(read(name)) catch { case _: Throwable => None }
    def frame(name: String, tableName: String): EntityFrame = {
      val df = read(name)
      val triple = df.columns.length == 3 && df.columns(0) == "head"
      EntityFrame(df, tableName, if (triple) "head" else idCol, triple)
    }
    BlockingDataset(
      frame("left", leftName), frame("right", rightName),
      opt("left_rel"), opt("right_rel"), opt("gold"))
  }

  /** S1, parquet shorthand (the original entry point). */
  def fromParquet(
      spark: SparkSession, dir: String,
      leftName: String = "left", rightName: String = "right",
      idCol: String = "id"): BlockingDataset =
    load(spark, dir, "parquet", Map.empty, leftName, rightName, idCol)
}

final case class BlockingDataset(
    left: EntityFrame,
    right: EntityFrame,
    leftRel: Option[DataFrame] = None,
    rightRel: Option[DataFrame] = None,
    gold: Option[DataFrame] = None) {

  /** P5: deterministic downsample (reference ea_dataset.py:112-166, with
    * md5-mod selection instead of a random frac so results are
    * reproducible and oracle-checkable): keep every gold pair whose left
    * id hashes into `1/mod` of the space, then restrict all frames to
    * the sampled entities via semi-joins. */
  def sample(mod: Int, salt: String = "s"): BlockingDataset = {
    require(gold.isDefined, "sampling needs a gold standard")
    val Array(gl, gr) = gold.get.columns.take(2)
    val g = gold.get.filter(
      Text.md5Long(concat(lit(salt), col(gl).cast("string"))) % mod === 0)
    val lIds = g.select(col(gl).cast("string").as("_id")).distinct()
    val rIds = g.select(col(gr).cast("string").as("_id")).distinct()

    // no broadcast hint on the id lists: they scale with |gold|/mod —
    // AQE broadcasts while small, shuffles when not
    def restrict(f: EntityFrame, ids: DataFrame): EntityFrame =
      f.copy(df = f.df.join(ids,
        f.df(f.idCol).cast("string") === ids("_id"), "left_semi"))

    def restrictRel(rel: DataFrame, ids: DataFrame): DataFrame = {
      val Array(h, _, t) = rel.columns.take(3)
      rel.join(ids, rel(h).cast("string") === ids("_id"), "left_semi")
    }

    BlockingDataset(
      restrict(left, lIds), restrict(right, rIds),
      leftRel.map(restrictRel(_, lIds)), rightRel.map(restrictRel(_, rIds)),
      Some(g))
  }
}
