package graft.blockers

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.{Blocks, EntityFrame}
import graft.encoders.{FrameEncoder, HashTokenEncoder, LightEAEncoder}

/** Hybrid composite blockers (reference src/klinker/blockers/hybrid.py:
  * 15-178): the CompositeUniqueName pipeline with an embedding kNN
  * blocker as the relation pass.
  *
  * Two of the three are pure configurations of
  * [[CompositeUniqueNameBlocker]] (composite.py's base runs the rel
  * blocker over neighbor-CONCATENATED text, pre-filtered by unique-name
  * coverage); [[CompositeLightEABlocker]] is special — its encoder
  * propagates over the relation GRAPH, so filtering must happen after
  * encoding (hybrid.py:155-178 `_filter_emb`).
  */
object CompositeEmbeddingBlocker {
  /** hybrid.py:87-115: unique-name + token-attr + embedding-kNN over the
    * neighbor-concatenated text of uncovered entities. */
  def apply(
      encoder: FrameEncoder,
      k: Int = 5,
      strategy: AnnStrategy = AnnStrategy.Brute,
      topNA: Option[Int] = None,
      topNR: Option[Int] = None,
      minTokenLength: Int = 3,
      hubness: Option[graft.similarity.Similarity.HubnessReduction] = None,
      hubnessCandidates: Int = 10,
      tokenizer: Option[org.apache.spark.sql.Column => org.apache.spark.sql.Column] = None)
      : CompositeUniqueNameBlocker =
    CompositeUniqueNameBlocker(
      attributeBlocker = TokenBlocker(minTokenLength, tokenizer = tokenizer),
      relationBlocker = Some(EmbeddingKnnBlocker(encoder, k,
        strategy = strategy, hubness = hubness,
        hubnessCandidates = hubnessCandidates)),
      topNA = topNA, topNR = topNR, useUniqueName = true)
}

object CompositeRelationalDeepBlocker {
  /** hybrid.py:15-84. DeepBlocker's learned autoencoder is out of scope
    * (SURVEY.md M7 — embeddings enter as data); any [[FrameEncoder]]
    * stands in its place. NB the reference defaults use_unique_name to
    * FALSE for this variant (hybrid.py:32). */
  def apply(
      encoder: FrameEncoder,
      k: Int = 5,
      topNA: Option[Int] = None,
      topNR: Option[Int] = None,
      useUniqueName: Boolean = false,
      minTokenLength: Int = 3,
      tokenizer: Option[org.apache.spark.sql.Column => org.apache.spark.sql.Column] = None)
      : CompositeUniqueNameBlocker =
    CompositeUniqueNameBlocker(
      attributeBlocker = TokenBlocker(minTokenLength, tokenizer = tokenizer),
      relationBlocker = Some(EmbeddingKnnBlocker(encoder, k)),
      topNA = topNA, topNR = topNR, useUniqueName = useUniqueName)
}

/** hybrid.py:117-178: LightEA propagation encoder over attr text +
  * relation triples; unique-covered entities are removed from the
  * EMBEDDINGS (post-encode), not from the frames — the propagation must
  * see the whole graph. `dims` is the inner encoder's output width
  * (LightEA stacks per-round channels of that width). */
final case class CompositeLightEABlocker(
    innerEncoder: FrameEncoder = HashTokenEncoder(),
    depth: Int = 2,
    k: Int = 5,
    dims: Int = 8,
    strategy: AnnStrategy = AnnStrategy.Brute,
    minTokenLength: Int = 3,
    tokenizer: Option[org.apache.spark.sql.Column => org.apache.spark.sql.Column] = None)
  extends Blocker {

  override def assign(
      left: EntityFrame, right: EntityFrame,
      leftRel: Option[DataFrame], rightRel: Option[DataFrame]): Blocks = {
    require(leftRel.isDefined && rightRel.isDefined, "LightEA hybrid needs rel frames")
    val unique = UniqueNameBlocker().assign(left, right)
    unique.df.persist()
    val coveredL = unique.df.select(explode(col(Blocks.LeftCol)).as("_cid")).distinct()
    val coveredR = unique.df.select(explode(col(Blocks.RightCol)).as("_cid")).distinct()
    val attr = unique.combine(
      TokenBlocker(minTokenLength, tokenizer = tokenizer).assign(
        Blocker.antiFilter(left, coveredL), Blocker.antiFilter(right, coveredR)))
    val lightEa = LightEAEncoder(innerEncoder, depth = depth, dims = dims)
    val rel = EmbeddingKnnBlocker(lightEa, k, strategy = strategy)
      .assignExcluding(left, right, leftRel, rightRel, Some((coveredL, coveredR)))
    // blocks are output-sized: materialize and release the unique-pass
    // cache (CacheScope contract)
    Blocks(graft.core.CacheScope.seal(attr.combine(rel).df, unique.df))
  }
}
