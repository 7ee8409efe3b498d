package graft.blockers

import org.apache.spark.sql.SparkSession

/** Pure-SQL blocking recipes — the blocker surface for SQL-only users.
  *
  * Each builder returns ONE Spark-SQL SELECT (no Scala closures, no temp
  * tables) over already-registered input views, composed from built-in
  * functions plus the [[graft.functions.SqlFunctions]] scalar surface
  * (`graft_tokenize`, `graft_md5_long` — register via
  * `spark.sql.extensions=org.apache.spark.sql.graft.GraftExtensions` or
  * [[org.apache.spark.sql.graft.GraftExtensions.register]]). The
  * generated plans are the SAME plans the Scala blockers produce (same
  * tokenizer expression tree, same groupBy/join shape), so SQL use keeps
  * whole-stage codegen and every scale property documented on
  * [[TokenBlocker]] / [[StandardBlocker]] / [[MinHashLSHBlocker]].
  *
  * Output schema is the canonical blocks table:
  * `(block_key string, left array<string>, right array<string>)`.
  *
  * [[registerView]] materializes a recipe as a temp view, so downstream
  * SQL reads `SELECT * FROM <view>` — the "blocking as a table" shape a
  * warehouse user expects.
  */
object BlockingSql {

  /** `concat_values` (P2-P4) as a SQL expression over attribute columns:
    * stringify, null-fill, space-join, trim — EntityFrame.concatValues'
    * wide-frame semantics. */
  def concatValuesExpr(attrCols: Seq[String]): String =
    attrCols.map(c => s"coalesce(cast(`$c` AS string), '')")
      .mkString("trim(concat_ws(' ', ", ", ", "))")

  /** Distinct `(id, key)` token stream of one side (TokenBlocker.tokens):
    * tokenize the concatenated attributes, one row per (entity, token). */
  def tokenStreamSql(
      table: String, idCol: String, attrCols: Seq[String],
      minTokenLength: Int = 3): String =
    s"""SELECT DISTINCT cast(`$idCol` AS string) AS id, tok AS key
       |FROM (SELECT `$idCol`, explode(graft_tokenize(${concatValuesExpr(attrCols)}, $minTokenLength)) AS tok
       |      FROM $table)""".stripMargin

  /** The universal block finisher (A1+J1, Blocker.blockJoin) in SQL:
    * per-side collect_set by key, inner join on the key. */
  private def blockJoinSql(leftStream: String, rightStream: String): String =
    s"""WITH lt AS ($leftStream),
       |rt AS ($rightStream),
       |lb AS (SELECT key AS block_key, array_sort(collect_set(id)) AS `left`
       |       FROM lt GROUP BY key),
       |rb AS (SELECT key AS block_key, array_sort(collect_set(id)) AS `right`
       |       FROM rt GROUP BY key)
       |SELECT lb.block_key, lb.`left`, rb.`right`
       |FROM lb JOIN rb USING (block_key)""".stripMargin

  /** J1: token blocking (≡ [[TokenBlocker]]). */
  def tokenBlocksSql(
      leftTable: String, leftId: String, leftAttrs: Seq[String],
      rightTable: String, rightId: String, rightAttrs: Seq[String],
      minTokenLength: Int = 3): String =
    blockJoinSql(
      tokenStreamSql(leftTable, leftId, leftAttrs, minTokenLength),
      tokenStreamSql(rightTable, rightId, rightAttrs, minTokenLength))

  /** S/J1: standard (exact attribute value) blocking (≡ [[StandardBlocker]]
    * on wide frames). */
  def standardBlocksSql(
      leftTable: String, leftId: String, leftKey: String,
      rightTable: String, rightId: String, rightKey: String): String = {
    def side(t: String, id: String, k: String) =
      s"""SELECT cast(`$id` AS string) AS id, cast(`$k` AS string) AS key
         |FROM $t WHERE `$k` IS NOT NULL""".stripMargin
    blockJoinSql(side(leftTable, leftId, leftKey), side(rightTable, rightId, rightKey))
  }

  /** F2/J1: q-gram blocking (≡ [[QgramsBlocker]] on wide frames): each
    * key value explodes into its character q-grams, then standard
    * blocking on the grams. */
  def qgramsBlocksSql(
      leftTable: String, leftId: String, leftKey: String,
      rightTable: String, rightId: String, rightKey: String,
      q: Int = 3): String = {
    def side(t: String, id: String, k: String) =
      s"""SELECT cast(`$id` AS string) AS id, gram AS key
         |FROM (SELECT `$id`, explode(graft_qgrams(cast(`$k` AS string), $q)) AS gram
         |      FROM $t WHERE `$k` IS NOT NULL)""".stripMargin
    blockJoinSql(side(leftTable, leftId, leftKey), side(rightTable, rightId, rightKey))
  }

  /** M1: MinHash-LSH blocking (≡ [[MinHashLSHBlocker]]): tokenize, sign
    * with `numPerm` md5-derived permutations, band into `bands` buckets,
    * block on band-key collisions. The signature aggregate and band-key
    * md5 mirror [[graft.functions.MinHash.signature]]/`bandBuckets`
    * exactly (same hash family), so SQL and Scala results are
    * bit-identical. */
  def minHashBlocksSql(
      leftTable: String, leftId: String, leftAttrs: Seq[String],
      rightTable: String, rightId: String, rightAttrs: Seq[String],
      numPerm: Int = 32, bands: Int = 8, minTokenLength: Int = 3): String = {
    require(numPerm % bands == 0, "numPerm must be divisible by bands")
    val rows = numPerm / bands
    import graft.functions.MinHash
    // one md5 per token + affine per-perm constants — MinHash.signature's
    // exact structure (same literals, bit-identical signatures)
    val mins = (0 until numPerm)
      .map(i => s"min((${MinHash.permA(i)}L * (graft_md5_long(key) % ${MinHash.Space}L) " +
        s"+ ${MinHash.permB(i)}L) % ${MinHash.Modulus}L) AS h$i").mkString(", ")
    val bandKeys = (0 until bands).map { j =>
      val hs = (0 until rows).map(i => s"cast(h${j * rows + i} AS string)").mkString(", ")
      s"concat('$j:', md5(concat_ws(',', $hs)))"
    }.mkString(", ")
    def side(stream: String) =
      s"""SELECT id, key FROM (
         |  SELECT id, explode(array($bandKeys)) AS key FROM (
         |    SELECT id, $mins FROM ($stream) GROUP BY id))""".stripMargin
    blockJoinSql(
      side(tokenStreamSql(leftTable, leftId, leftAttrs, minTokenLength)),
      side(tokenStreamSql(rightTable, rightId, rightAttrs, minTokenLength)))
  }

  /** Materialize any recipe as a temp view: blocking becomes
    * `SELECT * FROM <name>` for every downstream SQL consumer. */
  def registerView(spark: SparkSession, name: String, recipeSql: String): Unit =
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW $name AS $recipeSql")

  /** M11/M12 density blocking for SQL-only users — the one blocker
    * family the recipe builders above cannot express: DBSCAN*'s
    * neighborhood closure and the HDBSCAN ladder/Borůvka rounds are
    * ITERATIVE, so there is no single-SELECT form. Instead this runs
    * the same [[AttributeClusteringBlocker]] +
    * [[DensityClusterAssigner]] pipeline the Scala/CLI surface uses
    * (deterministic [[graft.encoders.HashTokenEncoder]] embedding, so
    * the view is reproducible) over two registered input views and
    * materializes the canonical `(block_key, left, right)` blocks table
    * as a temp view — downstream SQL reads `SELECT * FROM <name>`
    * exactly as with [[registerView]].
    *
    * Ladder knobs mirror the CLI (`--eps-ladder`): default = fixed-eps
    * DBSCAN* (the `density_cluster` view form); `autoLadderLevels > 0`
    * = data-derived ladder + stability flat cut (the `hdbscan_auto`
    * form); a non-empty `epsLadder` = explicit ladder;
    * `exactHierarchy` = continuous dendrogram. `lshPlanes > 0` is the
    * bucketed candidate-graph scale path, as everywhere. */
  def registerDensityClusterView(
      spark: SparkSession, name: String,
      leftTable: String, leftId: String, leftAttrs: Seq[String],
      rightTable: String, rightId: String, rightAttrs: Seq[String],
      eps: Double = 0.5, minPts: Int = 3, dims: Int = 8,
      lshPlanes: Int = 0,
      epsLadder: Seq[Double] = Nil, autoLadderLevels: Int = 0,
      exactHierarchy: Boolean = false,
      minClusterSize: Int = 1,
      noise: NoiseHandling = NoiseHandling.Keep): Unit = {
    import org.apache.spark.sql.functions.col
    def frame(t: String, id: String, attrs: Seq[String]) =
      graft.core.EntityFrame(
        spark.table(t).select((id +: attrs).distinct.map(col): _*), t, id)
    val blocker = AttributeClusteringBlocker(
      DensityClusterAssigner(
        graft.encoders.HashTokenEncoder(dims), eps, minPts, lshPlanes,
        epsLadder = epsLadder, autoLadderLevels = autoLadderLevels,
        exactHierarchy = exactHierarchy),
      minClusterSize, noise)
    blocker.assign(
      frame(leftTable, leftId, leftAttrs),
      frame(rightTable, rightId, rightAttrs), None, None)
      .df.createOrReplaceTempView(name)
  }
}
