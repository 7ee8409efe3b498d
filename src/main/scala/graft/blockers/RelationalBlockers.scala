package graft.blockers

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.{Blocks, EntityFrame}
import graft.relational.Relational

/** Relation-aware blockers (reference src/klinker/blockers/
  * relation_aware.py:296-631 and composite.py:35-140).
  */

/** SimpleRelational*: merge each entity's own text with its neighbors'
  * text, then run ONE inner blocker on the merged text
  * (relation_aware.py:296-389). */
final case class SimpleRelationalBlocker(
    inner: Blocker,
    topNA: Option[Int] = None,
    topNR: Option[Int] = None) extends Blocker {

  override def assign(
      left: EntityFrame, right: EntityFrame,
      leftRel: Option[DataFrame], rightRel: Option[DataFrame]): Blocks = {
    require(leftRel.isDefined && rightRel.isDefined, "relational blocker needs rel frames")
    def conc(f: EntityFrame, rel: DataFrame): EntityFrame =
      EntityFrame(
        Relational.concatNeighborAttributes(f, rel, includeOwn = true, topNA, topNR),
        f.tableName, f.idCol)
    inner.assign(conc(left, leftRel.get), conc(right, rightRel.get))
  }
}

object SimpleRelationalTokenBlocker {
  def apply(topNA: Option[Int] = None, topNR: Option[Int] = None,
            minTokenLength: Int = 3,
            tokenizer: Option[org.apache.spark.sql.Column => org.apache.spark.sql.Column] = None)
      : SimpleRelationalBlocker =
    SimpleRelationalBlocker(
      TokenBlocker(minTokenLength, tokenizer = tokenizer), topNA, topNR)
}

/** Relational*: one blocker on own attributes, a second on neighbor-only
  * text, results combined (relation_aware.py:391-592). */
final case class RelationalBlocker(
    attributeBlocker: Blocker,
    relationBlocker: Blocker,
    topNA: Option[Int] = None,
    topNR: Option[Int] = None) extends Blocker {

  override def assign(
      left: EntityFrame, right: EntityFrame,
      leftRel: Option[DataFrame], rightRel: Option[DataFrame]): Blocks = {
    require(leftRel.isDefined && rightRel.isDefined, "relational blocker needs rel frames")
    val attrBlocks = attributeBlocker.assign(left, right)
    def conc(f: EntityFrame, rel: DataFrame): EntityFrame =
      EntityFrame(
        Relational.concatNeighborAttributes(f, rel, includeOwn = true, topNA, topNR),
        f.tableName, f.idCol)
    val relBlocks = relationBlocker.assign(conc(left, leftRel.get), conc(right, rightRel.get))
    attrBlocks.combine(relBlocks)
  }
}

/** Composite blockers (composite.py:54-140): cheap high-precision
  * unique-name pass first; entities it already covered are anti-filtered
  * (P6) out of the attribute and relation passes; all block tables are
  * combined at the end.
  */
final case class CompositeUniqueNameBlocker(
    attributeBlocker: Blocker,
    relationBlocker: Option[Blocker] = None,
    topNA: Option[Int] = None,
    topNR: Option[Int] = None,
    useUniqueName: Boolean = true) extends Blocker {

  /** P6 `filter_with_unique` — see [[Blocker.antiFilter]]. */
  private def filterCovered(f: EntityFrame, coveredIds: DataFrame): EntityFrame =
    Blocker.antiFilter(f, coveredIds)

  override def assign(
      left: EntityFrame, right: EntityFrame,
      leftRel: Option[DataFrame], rightRel: Option[DataFrame]): Blocks = {
    if (!useUniqueName) {
      val attr = attributeBlocker.assign(left, right)
      return relationBlockerResult(left, right, leftRel, rightRel, None)
        .map(attr.combine).getOrElse(attr)
    }
    val unique = UniqueNameBlocker().assign(left, right)
    unique.df.persist()
    val coveredL = unique.df.select(explode(col(Blocks.LeftCol)).as("_cid")).distinct()
    val coveredR = unique.df.select(explode(col(Blocks.RightCol)).as("_cid")).distinct()

    val attrBlocks = unique.combine(
      attributeBlocker.assign(filterCovered(left, coveredL), filterCovered(right, coveredR)))
    val relBlocks = relationBlockerResult(left, right, leftRel, rightRel,
      Some((coveredL, coveredR)))
    val result = relBlocks.map(attrBlocks.combine).getOrElse(attrBlocks)
    // blocks are output-sized: materialize and release the unique-pass
    // cache (CacheScope contract)
    Blocks(graft.core.CacheScope.seal(result.df, unique.df))
  }

  private def relationBlockerResult(
      left: EntityFrame, right: EntityFrame,
      leftRel: Option[DataFrame], rightRel: Option[DataFrame],
      covered: Option[(DataFrame, DataFrame)]): Option[Blocks] =
    relationBlocker.map { rb =>
      require(leftRel.isDefined && rightRel.isDefined, "relation blocker needs rel frames")
      def conc(f: EntityFrame, rel: DataFrame, cov: Option[DataFrame]): EntityFrame = {
        val c = EntityFrame(
          Relational.concatNeighborAttributes(f, rel, includeOwn = true, topNA, topNR),
          f.tableName, f.idCol)
        cov.map(ids => filterCovered(c, ids)).getOrElse(c)
      }
      rb.assign(
        conc(left, leftRel.get, covered.map(_._1)),
        conc(right, rightRel.get, covered.map(_._2)))
    }
}
