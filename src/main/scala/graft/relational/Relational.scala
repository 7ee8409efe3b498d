package graft.relational

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.EntityFrame

/** Relation-aware primitives (reference src/klinker/blockers/
  * relation_aware.py:30-247): make the relation graph symmetric, score
  * relation/attribute importance, keep each entity's top-n most important
  * relations, and concatenate neighbor attribute text.
  *
  * All pure DataFrame combinators. Scale notes:
  *   - importance tables are tiny (one row per relation name) → always
  *     broadcast into their joins (J6).
  *   - neighbor concat (J5) shuffles on the entity-id join key; the
  *     downstream per-head aggregate reuses that partitioning.
  */
object Relational {

  /** Relation triples are positional: (head, rel, tail)
    * (enhanced_df.py:264-267). */
  private def cols(rel: DataFrame): (String, String, String) = {
    val Array(h, r, t) = rel.columns.take(3)
    (h, r, t)
  }

  /** U3: swap head/tail, optionally prefixing the relation
    * (relation_aware.py:30-48). */
  def reverseRel(rel: DataFrame, inversePrefix: String = ""): DataFrame = {
    val (h, r, t) = cols(rel)
    rel.select(
      col(t).as(h),
      concat(lit(inversePrefix), col(r)).as(r),
      col(h).as(t))
  }

  /** rel ∪ reversed rel — the symmetric relation view every neighbor op
    * uses (relation_aware.py:185-186). */
  def withInverse(rel: DataFrame): DataFrame =
    rel.unionByName(reverseRel(rel))

  /** A6: number of distinct entities mentioned in attribute heads or on
    * either side of a relation (relation_aware.py:62-71). Exact count;
    * at 100 TB swap in approx_count_distinct upstream if this becomes a
    * planning-only statistic. */
  def countEntities(attr: EntityFrame, rel: DataFrame): Long = {
    val (h, _, t) = cols(rel)
    attr.ids.select(col(attr.idCol).cast("string").as("e"))
      .unionByName(rel.select(col(h).cast("string").as("e")))
      .unionByName(rel.select(col(t).cast("string").as("e")))
      .distinct().count()
  }

  /** A6 at 100 TB: importance scoring only needs n to a few percent, so
    * the exact distinct-union count (a full shuffle of every entity id)
    * can be replaced by HyperLogLog++ with `rsd` relative error — one
    * pass, no shuffle of distinct values. */
  def countEntitiesApprox(attr: EntityFrame, rel: DataFrame, rsd: Double = 0.01): Long = {
    val (h, _, t) = cols(rel)
    attr.ids.select(col(attr.idCol).cast("string").as("e"))
      .unionByName(rel.select(col(h).cast("string").as("e")))
      .unionByName(rel.select(col(t).cast("string").as("e")))
      .agg(approx_count_distinct(col("e"), rsd))
      .head.getLong(0)
  }

  private def harmonic(a: Column, b: Column): Column =
    when(a + b === 0.0, 0.0).otherwise(lit(2.0) * a * b / (a + b))

  /** The distinct entity count as a ONE-ROW frame (`_n: double`) for
    * in-plan use: importance pipelines crossJoin(broadcast) it instead
    * of running a separate driver-side count job per query. */
  def countEntitiesFrame(attr: EntityFrame, rel: DataFrame): DataFrame = {
    val (h, _, t) = cols(rel)
    attr.ids.select(col(attr.idCol).cast("string").as("e"))
      .unionByName(rel.select(col(h).cast("string").as("e")))
      .unionByName(rel.select(col(t).cast("string").as("e")))
      .agg(countDistinct(col("e")).cast("double").as("_n"))
  }

  /** A4: per-relation importance = harmonic(support, discriminability),
    * support = count/n², discriminability = distinct tails / count
    * (relation_aware.py:83-92). The reference's pandas `count` is
    * non-distinct there (≈1.0 discriminability for non-null tails) but
    * set-based in graph_statistics.py:30-47; we pin DISTINCT tails —
    * SURVEY.md A4 documents the divergence. Output: (rel, importance). */
  def relationImportance(rel: DataFrame, numEntities: Long): DataFrame =
    relationImportance(rel, oneRowN(rel, numEntities))

  /** In-plan variant: `nFrame` is a one-row (`_n: double`) frame —
    * [[countEntitiesFrame]] — broadcast into the aggregate, so the
    * whole importance computation is a single job. */
  def relationImportance(rel: DataFrame, nFrame: DataFrame): DataFrame = {
    val (_, r, t) = cols(rel)
    rel.groupBy(col(r).as("rel"))
      .agg(count(lit(1)).as("rel_count"), countDistinct(col(t)).as("tail_count"))
      .crossJoin(broadcast(nFrame))
      .select(col("rel"), harmonic(
        col("rel_count") / (col("_n") * col("_n")),
        col("tail_count").cast("double") / col("rel_count")).as("importance"))
  }

  private def oneRowN(any: DataFrame, n: Long): DataFrame =
    any.sparkSession.range(1).select(lit(n.toDouble).as("_n"))

  /** A5: per-attribute-property importance, support = heads/n
    * (relation_aware.py:95-103). Input must be triple-form attributes. */
  def nameImportance(attrTriples: DataFrame, numEntities: Long): DataFrame =
    nameImportance(attrTriples, oneRowN(attrTriples, numEntities))

  /** In-plan variant of A5 (see [[relationImportance]]). */
  def nameImportance(attrTriples: DataFrame, nFrame: DataFrame): DataFrame = {
    val (h, r, t) = cols(attrTriples)
    attrTriples.groupBy(col(r).as("rel"))
      .agg(
        count(col(h)).as("head_count"),
        count(lit(1)).as("rel_count"),
        countDistinct(col(t)).as("tail_count"))
      .crossJoin(broadcast(nFrame))
      .select(col("rel"), harmonic(
        col("head_count") / col("_n"),
        col("tail_count").cast("double") / col("rel_count")).as("importance"))
  }

  /** P8/W1: keep only each head's triples whose relation ranks in that
    * head's top-n by importance (relation_aware.py:106-153). The
    * reference's nlargest tie-break is insertion order (nondeterministic
    * under dask); we pin (importance DESC, rel ASC) row_number —
    * deterministic, documented divergence. Importance is one row per
    * relation → broadcast (J6). */
  def filterImportance(triples: DataFrame, importance: DataFrame, topN: Int): DataFrame = {
    val (h, r, _) = cols(triples)
    val imp = importance.select(col("rel").as("_imp_rel"), col("importance"))
    val withImp = triples.select(col(h), col(r)).distinct()
      .join(broadcast(imp), col(r) === col("_imp_rel"), "left")
      .na.fill(0.0, Seq("importance"))
    val w = Window.partitionBy(col(h)).orderBy(col("importance").desc, col(r).asc)
    val topRels = withImp
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= topN)
      .select(col(h), col(r))
    triples.join(topRels, Seq(h, r), "left_semi")
  }

  /** W1 as a named API — the reference's `filtered_names`
    * (graph_statistics.py:106-126 + name_property :61-78): per entity,
    * keep only the attribute triples whose property ranks in that
    * entity's top-n by name importance. Pure wiring of A5 + P8. */
  def topNNameProperties(attr: EntityFrame, rel: DataFrame, n: Int): DataFrame = {
    val attrTriple = if (attr.isTriple) attr else EntityFrame.unpivot(attr)
    val imp = nameImportance(attrTriple.df, countEntitiesFrame(attr, rel))
    filterImportance(attrTriple.df, imp, n)
  }

  /** The reference's `filtered_concated` (graph_statistics.py:88-103):
    * [[topNNameProperties]] then per-entity concatenated distinct values
    * (sorted for determinism — the reference joins an unordered set). */
  def topNNamePropertiesConcat(attr: EntityFrame, rel: DataFrame, n: Int): DataFrame = {
    val attrTriple = if (attr.isTriple) attr else EntityFrame.unpivot(attr)
    attrTriple.copy(df = topNNameProperties(attr, rel, n)).concatValues()
  }

  /** J5: per entity, the concatenated attribute text of its relation
    * neighbors (relation_aware.py:156-247). Returns (idCol, _conc).
    *
    * @param includeOwn  also mix in the entity's own attribute text
    *                    (`include_own_attributes`).
    * @param topNA       keep only the top-n attribute properties per
    *                    entity before concatenation.
    * @param topNR       keep only each entity's top-n relations (scored
    *                    on the un-reversed rel frame).
    */
  def concatNeighborAttributes(
      attr: EntityFrame,
      rel: DataFrame,
      includeOwn: Boolean = true,
      topNA: Option[Int] = None,
      topNR: Option[Int] = None): DataFrame = {
    val (h, _, t) = cols(rel)
    // in-plan one-row count: no separate driver job
    lazy val nFrame = countEntitiesFrame(attr, rel)

    val attrTriple: EntityFrame = if (attr.isTriple) attr else EntityFrame.unpivot(attr)
    val filteredAttr = topNA match {
      case Some(n) =>
        val imp = nameImportance(attrTriple.df, nFrame)
        attrTriple.copy(df = filterImportance(attrTriple.df, imp, n))
      case None => attrTriple
    }
    // (id, text) of own attributes — one bounded row per entity,
    // referenced by two renamed subtrees below (the neighbor join side
    // and the own-text union), which static exchange reuse does not
    // collapse; persist so the concat aggregation runs once
    val concAttr = filteredAttr.concatValues().persist()

    val inv = withInverse(rel)
    val filteredRel = topNR match {
      case Some(n) => filterImportance(inv, relationImportance(rel, nFrame), n)
      case None => inv
    }

    // neighbor text: join relation tails against attribute text (inner —
    // the reference's left-join + dropna)
    val neighborText = filteredRel
      .select(col(h).cast("string").as("_head"), col(t).cast("string").as("_tail"))
      .join(concAttr.select(
        col(filteredAttr.idCol).cast("string").as("_tail"),
        col(EntityFrame.ConcCol).as("_txt")), Seq("_tail"), "inner")
      .select(col("_head"), col("_txt"))

    val allText =
      if (includeOwn)
        neighborText.unionByName(concAttr.select(
          col(filteredAttr.idCol).cast("string").as("_head"),
          col(EntityFrame.ConcCol).as("_txt")))
      else neighborText

    // final concat_values over the (head, text) pairs: sorted distinct
    // texts, space-joined (triple-form concatValues semantics)
    // one concatenated row per entity — output-sized; release the
    // own-text cache (CacheScope contract)
    graft.core.CacheScope.seal(
      allText
        .groupBy(col("_head").as(attr.idCol))
        .agg(concat_ws(" ", array_sort(collect_set(col("_txt")))).as(EntityFrame.ConcCol)),
      concAttr)
  }
}
