package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.{Blocks, EntityFrame}
import graft.blockers._
import graft.eval.Evaluation
import graft.functions.{Num, Text}
import QueryDef.{table, duckTokens, stopwordsSqlList}

/** Scans, projections, core aggregations, and the flagship blocking
  * queries — each with its DuckDB oracle (SURVEY.md §2.1/§2.2/§2.4).
  *
  * Testdata framing (FIXTURES.md §7): left entity frame = `part`
  * (real-word names), right = `documents`; customer×supplier pair on
  * `nationkey` for key-equality blocking; synthetic gold
  * `(c_custkey, c_custkey % 100)`.
  */
object CoreQueries {

  /** Entity frames used across blocking queries. */
  def partFrame(s: org.apache.spark.sql.SparkSession, dir: String): EntityFrame =
    EntityFrame(table(s, dir, "part").select(col("p_partkey"), col("p_name")), "part", "p_partkey")

  def docFrame(s: org.apache.spark.sql.SparkSession, dir: String): EntityFrame =
    EntityFrame(table(s, dir, "documents").select(col("doc_id"), col("text")), "documents", "doc_id")

  val defs: Map[String, QueryDef] = Map(

    // ---- warm-up relational aggregation (TPC-H Q1 shape) -----------------
    "q1_agg" -> QueryDef(
      (s, dir) => table(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          Num.stableRound(sum(col("l_extendedprice")), 2).as("sum_base"),
          Num.stableRound(avg(col("l_discount")), 6).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus")),
      Some("""SELECT l_returnflag, l_linestatus,
             |  sum(l_quantity) AS sum_qty,
             |  floor((sum(l_extendedprice)) * 1e2 + 0.5) / 1e2 AS sum_base,
             |  floor((avg(l_discount)) * 1e6 + 0.5) / 1e6 AS avg_disc,
             |  count(*) AS count_order
             |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // ---- S1: raw RDF source round-trip ----------------------------------
    // The N-Triples parse path proven on corpus data: documents are
    // serialized to N-Triples (escape encoding, per-run temp dir — the
    // write is part of the measured round-trip), re-parsed by the
    // distributed line parser (codegen'd RdfUnescape), and pivoted back
    // to one row per document. Adversarial characters (quote, backslash,
    // newline, tab, non-ASCII) are injected into every text value so the
    // escape/unescape path is load-bearing in the hash compare; the
    // DuckDB oracle reproduces the injected suffix, NOT the round-trip —
    // byte equality against the original corpus is the whole check.
    "src_ntriples_roundtrip" -> QueryDef(
      (s, dir) => {
        import graft.sources.Rdf
        val docs = table(s, dir, "documents")
        val head = concat(lit("http://g/doc/"), col("doc_id"))
        val triples = docs.select(
          head.as("head"), lit("http://g/p/text").as("rel"),
          concat(col("text"), lit("\"\\\n\té")).as("tail"),
          lit(true).as("is_literal"))
          .unionByName(docs.select(
            head.as("head"), lit("http://g/p/source").as("rel"),
            concat(lit("http://g/src/"), col("source")).as("tail"),
            lit(false).as("is_literal")))
        val out = java.nio.file.Files
          .createTempDirectory("graft_nt_rt_").toString + "/nt"
        Rdf.toNTriples(triples).write.mode("overwrite").text(out)
        Rdf.loadNTriples(s, out)
          .groupBy(regexp_extract(col("head"), "doc/(\\d+)$", 1)
            .cast("long").as("doc_id"))
          .agg(
            max(when(col("rel") === "http://g/p/text", col("tail"))).as("text_rt"),
            max(when(col("rel") === "http://g/p/source", col("tail"))).as("source_rt"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
             |  text || '"\' || chr(10) || chr(9) || 'é' AS text_rt,
             |  'http://g/src/' || source AS source_rt
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // ---- S1 end-to-end: raw OAEI bundle → blocking → eval -----------------
    // The reference's OAEI experiment shape (ea_dataset.py:28-110 +
    // later_eval.py): a raw pair directory — source/target RDF dumps plus
    // an Alignment-format reference.xml — is BUILT from customer/supplier
    // inside the query (serialized through toNTriples, the
    // src_ntriples_roundtrip pattern; the alignment gold aligns each
    // supplier k with customer k), then driven through the production
    // path: loadOaei (format sniff + literal/relation split + alignment
    // parse) → TokenBlocker over the concatenated literals → J7/A8
    // evaluation. The zero-padded entity number in the names is the
    // discriminative cross-side token (recall 1), the shared nation
    // literal adds coarse collisions (precision < 1). The oracle recomputes
    // blocking + metrics straight from the tables — no part of the
    // RDF/XML round-trip is replayed, so the hash proves the parsers and
    // the split end-to-end. The reference.xml fixture is driver-written
    // by STREAMING the supplier keys (toLocalIterator, one row of driver
    // memory) behind a loud dim-table size guard — fixture generation,
    // not the operator under test.
    "src_oaei_pipeline" -> QueryDef(
      (s, dir) => {
        import graft.sources.Rdf
        val out = java.nio.file.Files
          .createTempDirectory("graft_oaei_pipe_").toString
        def triples(df: DataFrame, pfx: String, id: String, name: String,
                    nation: String) =
          df.select(concat(lit(s"http://$pfx/e"), col(id)).as("head"),
              lit("http://g/p/name").as("rel"), col(name).as("tail"),
              lit(true).as("is_literal"))
            .unionByName(df.select(
              concat(lit(s"http://$pfx/e"), col(id)).as("head"),
              lit("http://g/p/nation").as("rel"),
              concat(lit("nation"), col(nation)).as("tail"),
              lit(true).as("is_literal")))
        val cust = table(s, dir, "customer")
        val supp = table(s, dir, "supplier")
        Rdf.toNTriples(triples(cust, "src", "c_custkey", "c_name", "c_nationkey"))
          .write.mode("overwrite").text(s"$out/source.nt")
        Rdf.toNTriples(triples(supp, "tgt", "s_suppkey", "s_name", "s_nationkey"))
          .write.mode("overwrite").text(s"$out/target.nt")
        // fixture alignment XML: size-guarded and STREAMED (one row of
        // driver memory via toLocalIterator) — fixture generation must
        // stay dim-table-bounded even if testdata SFs grow, and a loud
        // failure beats a silent multi-GB driver array
        val nSupp = supp.count()
        require(nSupp <= 1000000L,
          s"src_oaei_pipeline fixture wants $nSupp alignment cells; the " +
            "driver-side reference.xml build is bounded to dim-table scale")
        val w = java.nio.file.Files.newBufferedWriter(
          java.nio.file.Paths.get(s"$out/reference.xml"))
        try {
          w.write("<?xml version=\"1.0\" encoding=\"utf-8\"?>\n" +
            "<rdf:RDF xmlns=\"http://knowledgeweb.semanticweb.org/heterogeneity/alignment#\"\n" +
            "         xmlns:rdf=\"http://www.w3.org/1999/02/22-rdf-syntax-ns#\">\n" +
            "<Alignment>\n")
          val it = supp.select(col("s_suppkey").cast("long"))
            .orderBy("s_suppkey").toLocalIterator()
          var first = true
          while (it.hasNext) {
            val k = it.next().getLong(0)
            if (!first) w.write("\n")
            first = false
            w.write(s"""  <map><Cell><entity1 rdf:resource="http://src/e$k"/>""" +
              s"""<entity2 rdf:resource="http://tgt/e$k"/>""" +
              "<relation>=</relation><measure>1.0</measure></Cell></map>")
          }
          w.write("\n</Alignment>\n</rdf:RDF>\n")
        } finally w.close()
        val ds = Rdf.loadOaei(s, out)
        val blocks = TokenBlocker().assign(ds.left, ds.right)
        Evaluation.evaluateDF(s, blocks, ds.gold.get,
          cust.count(), nSupp)
      },
      Some {
        val lt = duckTokens("'http://src/e'||cast(c_custkey AS varchar)",
          "c_name||' nation'||cast(c_nationkey AS varchar)", "customer")
        val rt = duckTokens("'http://tgt/e'||cast(s_suppkey AS varchar)",
          "s_name||' nation'||cast(s_nationkey AS varchar)", "supplier")
        s"""WITH lt AS ($lt), rt AS ($rt),
           |cand AS (SELECT DISTINCT lt.id AS l, rt.id AS r
           |         FROM lt JOIN rt USING (key)),
           |gold AS (SELECT 'http://src/e'||cast(s_suppkey AS varchar) AS l,
           |                'http://tgt/e'||cast(s_suppkey AS varchar) AS r
           |         FROM supplier),
           |m AS (SELECT
           |  (SELECT count(*) FROM cand) AS pairs,
           |  (SELECT count(*) FROM cand JOIN gold USING (l, r)) AS tp,
           |  (SELECT count(*) FROM gold) AS gc,
           |  (SELECT count(*) FROM customer) * (SELECT count(*) FROM supplier) AS total),
           |x AS (SELECT tp, pairs,
           |  tp / gc AS rec, tp / pairs AS prec,
           |  1 - pairs / total AS rr FROM m)
           |SELECT tp, pairs,
           |  floor((rec) * 1e6 + 0.5) / 1e6 AS recall,
           |  floor((prec) * 1e6 + 0.5) / 1e6 AS precision,
           |  floor((CASE WHEN rec + prec = 0 THEN 0 ELSE 2*rec*prec/(rec+prec) END) * 1e6 + 0.5) / 1e6 AS f_measure,
           |  floor((rr) * 1e6 + 0.5) / 1e6 AS reduction_ratio,
           |  floor((CASE WHEN rr + rec = 0 THEN 0 ELSE 2*rr*rec/(rr+rec) END) * 1e6 + 0.5) / 1e6 AS h3r
           |FROM x""".stripMargin
      }),

    // ---- S3: gold from a cluster dump, end-to-end ------------------------
    // The eche PrefixedClusterHelper text format proven on corpus data:
    // a deterministic cluster dump is BUILT from documents (cluster =
    // doc_id % 49; members carry an a:/b: dataset prefix by parity) and
    // written one-line-per-cluster to a per-run temp dir inside the
    // measured query (the src_ntriples_roundtrip pattern), then parsed
    // back through the production loader (line split + explode + prefix
    // extraction + Gold.fromClusters' cluster self-join). The DuckDB
    // oracle computes the expected inter-dataset pairs INDEPENDENTLY
    // from documents — no part of the file round-trip is replayed, so
    // equality checks the parser, the prefix rule and the pair
    // expansion end-to-end.
    "s3_cluster_gold" -> QueryDef(
      (s, dir) => {
        val docs = table(s, dir, "documents")
          .select(col("doc_id").cast("long").as("id"))
        val lines = docs
          .select((col("id") % 49).as("cl"),
            concat(when(col("id") % 2 === 0, lit("a:")).otherwise(lit("b:")),
              col("id")).as("ent"))
          .groupBy("cl")
          .agg(concat_ws("\t", sort_array(collect_list(col("ent")))).as("value"))
          .select("value")
        val out = java.nio.file.Files
          .createTempDirectory("graft_clusters_").toString + "/ent_clusters"
        lines.write.mode("overwrite").text(out)
        graft.core.BlockingDataset.goldFromClusterFile(s, out, "a", "b")
          .orderBy("a", "b")
      },
      Some("""SELECT 'a:' || cast(e.doc_id AS varchar) AS a,
             |       'b:' || cast(o.doc_id AS varchar) AS b
             |FROM documents e JOIN documents o
             |  ON e.doc_id % 49 = o.doc_id % 49
             |WHERE e.doc_id % 2 = 0 AND o.doc_id % 2 = 1
             |ORDER BY a, b""".stripMargin)),

    // ---- S1/S2: load + literal cleaning ---------------------------------
    "s2_clean_datatype" -> QueryDef(
      (s, dir) => table(s, dir, "customer")
        .select(col("c_custkey"),
          Text.stripDatatype(concat(col("c_name"), lit("^^xsd:string"))).as("cleaned"))
        .orderBy("c_custkey"),
      Some("""SELECT c_custkey, split_part(c_name || '^^xsd:string', '^^', 1) AS cleaned
             |FROM customer ORDER BY c_custkey""".stripMargin)),

    // ---- P2: concat_values on a wide frame ------------------------------
    "p2_concat_wide" -> QueryDef(
      (s, dir) => {
        val f = EntityFrame(
          table(s, dir, "customer").select(col("c_custkey"), col("c_name"), col("c_mktsegment")),
          "customer", "c_custkey")
        f.concatValues().withColumnRenamed(EntityFrame.ConcCol, "txt").orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, trim(concat_ws(' ', coalesce(c_name, ''), coalesce(c_mktsegment, ''))) AS txt
             |FROM customer ORDER BY c_custkey""".stripMargin)),

    // ---- P3: concat_values on a triple frame (unpivot + groupBy head) ---
    "p3_concat_triple" -> QueryDef(
      (s, dir) => {
        val wide = EntityFrame(
          table(s, dir, "customer").select(col("c_custkey"), col("c_name"), col("c_mktsegment")),
          "customer", "c_custkey")
        EntityFrame.unpivot(wide).concatValues()
          .withColumnRenamed(EntityFrame.ConcCol, "txt")
          .withColumnRenamed("head", "id")
          .orderBy("id")
      },
      Some("""WITH triples AS (
             |  SELECT cast(c_custkey AS varchar) AS head, 'c_name' AS rel, c_name AS tail FROM customer
             |  UNION ALL
             |  SELECT cast(c_custkey AS varchar), 'c_mktsegment', c_mktsegment FROM customer)
             |SELECT head AS id, string_agg(DISTINCT trim(tail), ' ' ORDER BY trim(tail)) AS txt
             |FROM triples WHERE tail IS NOT NULL GROUP BY head ORDER BY id""".stripMargin)),

    // ---- F1/A3: tokenizer + global token counts --------------------------
    "a3_token_counts" -> QueryDef(
      (s, dir) => table(s, dir, "documents")
        .select(explode(Text.tokenize(col("text"))).as("token"))
        .groupBy("token").agg(count(lit(1)).as("n"))
        .orderBy(col("token")),
      Some(s"""SELECT key AS token, count(*) AS n FROM (
              |${duckTokens("doc_id", "text", "documents")})
              |GROUP BY key ORDER BY token""".stripMargin)),

    // ---- F2: character q-grams -------------------------------------------
    "f2_qgrams" -> QueryDef(
      (s, dir) => table(s, dir, "part")
        .select(col("p_partkey"), explode(Text.qgrams(col("p_name"), 3)).as("gram"))
        .orderBy(col("p_partkey"), col("gram")),
      Some("""SELECT p_partkey, unnest([substring(p_name, i, 3) for i in range(1, len(p_name)-1)]) AS gram
             |FROM part ORDER BY p_partkey, gram""".stripMargin)),

    // ---- J1/A1: standard blocking customer×supplier on nationkey --------
    "j1_standard_blocker" -> QueryDef(
      (s, dir) => {
        val l = table(s, dir, "customer")
          .select(col("c_custkey").as("id"), col("c_nationkey").cast("string").as("key"))
        val r = table(s, dir, "supplier")
          .select(col("s_suppkey").as("id"), col("s_nationkey").cast("string").as("key"))
        val b = Blocker.blockJoin(l, r)
        b.df.select(
          col(Blocks.KeyCol),
          array_join(col(Blocks.LeftCol), ",").as("left_ids"),
          array_join(col(Blocks.RightCol), ",").as("right_ids"),
          size(col(Blocks.LeftCol)).as("left_size"),
          size(col(Blocks.RightCol)).as("right_size"))
          .orderBy(col(Blocks.KeyCol))
      },
      Some("""WITH lb AS (
             |  SELECT cast(c_nationkey AS varchar) AS block_key,
             |         array_to_string(list_sort(list(DISTINCT cast(c_custkey AS varchar))), ',') AS left_ids,
             |         count(DISTINCT c_custkey) AS left_size
             |  FROM customer GROUP BY 1),
             |rb AS (
             |  SELECT cast(s_nationkey AS varchar) AS block_key,
             |         array_to_string(list_sort(list(DISTINCT cast(s_suppkey AS varchar))), ',') AS right_ids,
             |         count(DISTINCT s_suppkey) AS right_size
             |  FROM supplier GROUP BY 1)
             |SELECT block_key, left_ids, right_ids,
             |       cast(left_size AS int) AS left_size, cast(right_size AS int) AS right_size
             |FROM lb JOIN rb USING (block_key) ORDER BY block_key""".stripMargin)),

    // ---- S4/S5: blocks → parquet → blocks, all three layouts --------------
    // The reference's block persistence dispatch end-to-end
    // (blocks.py:319-381 write/read + :484-557 NN layout + :608-636
    // composite): the J1 blocking is written in the NORMAL layout with
    // dataset-named list columns and sniffed back in; an NN-shaped
    // derivative (key = left id, first-3 neighbor list — the
    // NNBlockManager shape, null-padded scalar columns "0".."k-1" on
    // disk) plus the normal part are then written as a COMPOSITE
    // (blocks/ + nn_blocks/) and read back through the dispatch, which
    // must union them. The oracle replays the SEMANTICS only (blocking +
    // top-3 reshape + union) — any loss or reshuffle in the
    // write/read/sniff detour breaks the hash, the s7/ann_ivf_pq_saved
    // storage contract: a bit-identical detour, never a transformation.
    "s4_blocks_roundtrip" -> QueryDef(
      (s, dir) => {
        val l = table(s, dir, "customer")
          .select(col("c_custkey").as("id"), col("c_nationkey").cast("string").as("key"))
        val r = table(s, dir, "supplier")
          .select(col("s_suppkey").as("id"), col("s_nationkey").cast("string").as("key"))
        val base = Blocker.blockJoin(l, r)
        val out = java.nio.file.Files
          .createTempDirectory("graft_blocks_rt_").toString
        base.write(s"$out/normal", "customer", "supplier")
        val normal = Blocks.read(s, s"$out/normal")
        val nn = Blocks(normal.df
          .select(explode(col(Blocks.LeftCol)).as("_lid"), col(Blocks.RightCol))
          .select(concat(lit("c"), col("_lid")).as(Blocks.KeyCol),
            array(concat(lit("c"), col("_lid"))).as(Blocks.LeftCol),
            slice(col(Blocks.RightCol), 1, 3).as(Blocks.RightCol)))
        normal.writeComposite(s"$out/composite", nn, "customer", "supplier")
        Blocks.read(s, s"$out/composite").df
          .select(col(Blocks.KeyCol),
            array_join(col(Blocks.LeftCol), ",").as("left_ids"),
            array_join(col(Blocks.RightCol), ",").as("right_ids"))
          .orderBy(Blocks.KeyCol, "left_ids")
      },
      Some("""WITH lb AS (
             |  SELECT cast(c_nationkey AS varchar) AS block_key,
             |         list_sort(list(DISTINCT cast(c_custkey AS varchar))) AS llist
             |  FROM customer GROUP BY 1),
             |rb AS (
             |  SELECT cast(s_nationkey AS varchar) AS block_key,
             |         list_sort(list(DISTINCT cast(s_suppkey AS varchar))) AS rlist
             |  FROM supplier GROUP BY 1),
             |normal AS (
             |  SELECT block_key, array_to_string(llist, ',') AS left_ids,
             |         array_to_string(rlist, ',') AS right_ids
             |  FROM lb JOIN rb USING (block_key)),
             |nn AS (
             |  SELECT 'c'||cast(c.c_custkey AS varchar) AS block_key,
             |         'c'||cast(c.c_custkey AS varchar) AS left_ids,
             |         array_to_string(rb.rlist[1:3], ',') AS right_ids
             |  FROM customer c
             |  JOIN rb ON cast(c.c_nationkey AS varchar) = rb.block_key)
             |SELECT block_key, left_ids, right_ids FROM normal
             |UNION ALL SELECT block_key, left_ids, right_ids FROM nn
             |ORDER BY block_key, left_ids""".stripMargin)),

    // ---- flagship: token blocking, documents split even/odd --------------
    "tb_token_blocker" -> QueryDef(
      (s, dir) => {
        val docs = table(s, dir, "documents")
        val lf = EntityFrame(docs.filter(col("doc_id") % 2 === 0)
          .select(col("doc_id"), col("text")), "docs_even", "doc_id")
        val rf = EntityFrame(docs.filter(col("doc_id") % 2 === 1)
          .select(col("doc_id"), col("text")), "docs_odd", "doc_id")
        val b = TokenBlocker().assign(lf, rf)
        b.df.select(
          col(Blocks.KeyCol),
          array_join(col(Blocks.LeftCol), ",").as("left_ids"),
          array_join(col(Blocks.RightCol), ",").as("right_ids"))
          .orderBy(col(Blocks.KeyCol))
      },
      Some(s"""WITH lt AS (SELECT DISTINCT * FROM (
              |${duckTokens("cast(doc_id AS varchar)", "text", "(SELECT * FROM documents WHERE doc_id % 2 = 0)")})),
              |rt AS (SELECT DISTINCT * FROM (
              |${duckTokens("cast(doc_id AS varchar)", "text", "(SELECT * FROM documents WHERE doc_id % 2 = 1)")})),
              |lb AS (SELECT key, array_to_string(list_sort(list(id)), ',') AS left_ids FROM lt GROUP BY key),
              |rb AS (SELECT key, array_to_string(list_sort(list(id)), ',') AS right_ids FROM rt GROUP BY key)
              |SELECT key AS block_key, left_ids, right_ids
              |FROM lb JOIN rb USING (key) ORDER BY block_key""".stripMargin)),

    // ---- J7/A8: full evaluation metrics ----------------------------------
    "a8_eval_metrics" -> QueryDef(
      (s, dir) => {
        val l = table(s, dir, "customer")
          .select(col("c_custkey").as("id"), col("c_nationkey").cast("string").as("key"))
        val r = table(s, dir, "supplier")
          .select(col("s_suppkey").as("id"), col("s_nationkey").cast("string").as("key"))
        val blocks = Blocker.blockJoin(l, r)
        val gold = table(s, dir, "customer")
          .select(col("c_custkey").as("gl"), (col("c_custkey") % 100).as("gr"))
        val nl = table(s, dir, "customer").count()
        val nr = table(s, dir, "supplier").count()
        Evaluation.evaluateDF(s, blocks, gold, nl, nr)
      },
      Some("""WITH cand AS (
             |  SELECT DISTINCT c.c_custkey AS l, s.s_suppkey AS r
             |  FROM customer c JOIN supplier s ON c.c_nationkey = s.s_nationkey),
             |gold AS (SELECT c_custkey AS l, c_custkey % 100 AS r FROM customer),
             |m AS (SELECT
             |  (SELECT count(*) FROM cand) AS pairs,
             |  (SELECT count(*) FROM cand JOIN gold USING (l, r)) AS tp,
             |  (SELECT count(*) FROM gold) AS gc,
             |  (SELECT count(*) FROM customer) * (SELECT count(*) FROM supplier) AS total),
             |x AS (SELECT tp, pairs,
             |  tp / gc AS rec, tp / pairs AS prec,
             |  1 - pairs / total AS rr FROM m)
             |SELECT tp, pairs,
             |  floor((rec) * 1e6 + 0.5) / 1e6 AS recall,
             |  floor((prec) * 1e6 + 0.5) / 1e6 AS precision,
             |  floor((CASE WHEN rec + prec = 0 THEN 0 ELSE 2*rec*prec/(rec+prec) END) * 1e6 + 0.5) / 1e6 AS f_measure,
             |  floor((rr) * 1e6 + 0.5) / 1e6 AS reduction_ratio,
             |  floor((CASE WHEN rr + rec = 0 THEN 0 ELSE 2*rr*rec/(rr+rec) END) * 1e6 + 0.5) / 1e6 AS h3r
             |FROM x""".stripMargin))
  )
}
