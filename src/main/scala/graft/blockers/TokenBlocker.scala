package graft.blockers

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.{Blocks, EntityFrame}
import graft.functions.Text

/** Token blocking (reference src/klinker/blockers/token_blocking.py:64-165):
  * concat all attribute values per entity → tokenize → one block per
  * token shared by both sides.
  *
  * Scale design: hot tokens are THE skew hazard (SURVEY §7.3). When
  * `maxBlockComparisons > 0`, oversized tokens are dropped *before* the
  * `collect_set` materializes their arrays: a cheap count-aggregate per
  * (token, side) feeds an anti-filter, so neither the agg buffers nor the
  * join ever see the hot keys. This is the purge (P10) pushed below the
  * join, where it must live at 100 TB.
  */
final case class TokenBlocker(
    minTokenLength: Int = 3,
    stopwords: Seq[String] = Text.Stopwords,
    maxBlockComparisons: Long = 0L) extends Blocker {

  /** (id, token) pairs for one side. */
  private[graft] def tokens(f: EntityFrame): DataFrame =
    f.concatValues()
      .select(
        col(f.idCol).cast("string").as("id"),
        explode(Text.tokenize(col(EntityFrame.ConcCol), minTokenLength, stopwords)).as("key"))
      .distinct()

  override def assign(
      left: EntityFrame, right: EntityFrame,
      leftRel: Option[DataFrame], rightRel: Option[DataFrame]): Blocks = {
    var lt = tokens(left)
    var rt = tokens(right)
    if (maxBlockComparisons > 0) {
      val hot = lt.groupBy("key").agg(count("*").as("nl"))
        .join(rt.groupBy("key").agg(count("*").as("nr")), Seq("key"))
        .filter(col("nl") * col("nr") > maxBlockComparisons)
        .select("key")
      lt = lt.join(hot, Seq("key"), "left_anti")
      rt = rt.join(hot, Seq("key"), "left_anti")
    }
    Blocker.blockJoin(lt, rt)
  }
}

/** Partitioning token blocker (reference token_blocking.py:207-248, M2):
  * the sparse count-matrix product `X_left @ X_right.T` in relational
  * form — entities sharing at least `minOverlap` tokens form one block
  * per left entity. Candidates come from the token equi-join (sparse
  * path: only co-occurring tokens generate work); overlap counting
  * groups directly on the (left id, right id) pair.
  */
final case class PartitioningTokenBlocker(
    minOverlap: Int = 1,
    minTokenLength: Int = 3,
    stopwords: Seq[String] = Text.Stopwords) extends Blocker {

  override def assign(
      left: EntityFrame, right: EntityFrame,
      leftRel: Option[DataFrame], rightRel: Option[DataFrame]): Blocks = {
    val tb = TokenBlocker(minTokenLength, stopwords)
    val lt = tb.tokens(left)
    val rt = tb.tokens(right).withColumnRenamed("id", "rid")
    val pairs = lt.join(rt, Seq("key"))
      .groupBy(col("id"), col("rid")).agg(count(lit(1)).as("overlap"))
      .filter(col("overlap") >= minOverlap)
    Blocks.fromNN(
      pairs.groupBy("id").agg(array_sort(collect_set(col("rid"))).as("rids")),
      "id", "rids")
  }
}

/** Unique-name blocking (token_blocking.py:168-204): attribute values held
  * by exactly one entity per side join into singleton blocks — the cheap,
  * high-precision first pass of the composite blockers.
  */
final case class UniqueNameBlocker() extends Blocker {

  /** Values appearing for exactly 1 entity: (value, id). */
  private[graft] def uniqueValues(f: EntityFrame): DataFrame = {
    val valued =
      if (f.isTriple) {
        val Array(h, _, t) = f.df.columns
        f.df.select(col(h).cast("string").as("id"), col(t).cast("string").as("v"))
      } else {
        val parts = f.nonIdColumns.map(c =>
          struct(lit(c).as("k"), col(c).cast("string").as("v")))
        f.df.select(col(f.idCol).cast("string").as("id"),
            explode(array(parts: _*)).as("kv"))
          .select(col("id"), col("kv.v").as("v"))
      }
    valued.na.drop(Seq("v"))
      .groupBy("v").agg(countDistinct("id").as("n"), min("id").as("id"))
      .filter(col("n") === 1)
      .select(col("v"), col("id"))
  }

  override def assign(
      left: EntityFrame, right: EntityFrame,
      leftRel: Option[DataFrame], rightRel: Option[DataFrame]): Blocks = {
    val l = uniqueValues(left).withColumnRenamed("id", "lid")
    val r = uniqueValues(right).withColumnRenamed("id", "rid")
    Blocks(l.join(r, Seq("v"), "inner").select(
      col("v").as(Blocks.KeyCol),
      array(col("lid")).as(Blocks.LeftCol),
      array(col("rid")).as(Blocks.RightCol)))
  }
}
