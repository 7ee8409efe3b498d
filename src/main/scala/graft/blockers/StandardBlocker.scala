package graft.blockers

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.{Blocks, EntityFrame}

/** Block on the exact value of one attribute column
  * (reference src/klinker/blockers/standard.py:10-90).
  * Wide frames use `blockingKey` as the column; triple frames use the
  * tails of triples whose relation == `blockingKey` (or all tails when
  * `blockingKey` is empty).
  */
final case class StandardBlocker(blockingKey: String) extends Blocker {

  private def keyed(f: EntityFrame): DataFrame =
    if (f.isTriple) {
      val Array(h, rel, t) = f.df.columns
      val base = if (blockingKey.nonEmpty) f.df.filter(col(rel) === blockingKey) else f.df
      base.select(col(h).as("id"), col(t).cast("string").as("key")).na.drop(Seq("key"))
    } else {
      f.df.select(col(f.idCol).as("id"), col(blockingKey).cast("string").as("key"))
        .na.drop(Seq("key"))
    }

  override def assign(
      left: EntityFrame, right: EntityFrame,
      leftRel: Option[DataFrame], rightRel: Option[DataFrame]): Blocks =
    Blocker.blockJoin(keyed(left), keyed(right))
}

/** Block on character q-grams of the blocking key
  * (reference src/klinker/blockers/qgrams.py:10-93): each value explodes
  * into its q-grams, then standard blocking on the grams.
  */
final case class QgramsBlocker(blockingKey: String, q: Int = 3) extends Blocker {
  import graft.functions.Text

  private def keyed(f: EntityFrame): DataFrame = {
    val base =
      if (f.isTriple) {
        val Array(h, rel, t) = f.df.columns
        val b = if (blockingKey.nonEmpty) f.df.filter(col(rel) === blockingKey) else f.df
        b.select(col(h).as("id"), col(t).cast("string").as("v"))
      } else
        f.df.select(col(f.idCol).as("id"), col(blockingKey).cast("string").as("v"))
    base.na.drop(Seq("v"))
      .select(col("id"), explode(Text.qgrams(col("v"), q)).as("key"))
  }

  override def assign(
      left: EntityFrame, right: EntityFrame,
      leftRel: Option[DataFrame], rightRel: Option[DataFrame]): Blocks =
    Blocker.blockJoin(keyed(left), keyed(right))
}
