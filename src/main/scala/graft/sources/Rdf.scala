package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.TextOps
import graft.core.{BlockingDataset, EntityFrame}
import graft.functions.Text

/** Raw RDF ingestion — the path the reference reaches through sylloge's
  * parsers (reference src/klinker/data/ea_dataset.py:28-110 consumes
  * sylloge datasets, whose OAEI family is distributed as RDF dumps plus
  * Alignment-format reference links). This module makes the raw formats
  * first-class Spark sources, so a user can point the engine at an OAEI
  * pair directory without any Python pre-pass.
  *
  * Scale design:
  *   - '''N-Triples is the scale path.''' One triple per line, so
  *     `spark.read.text` splits a single 100 TB dump across every
  *     executor, and the whole parse — field extraction, escape
  *     decoding, literal/IRI classification — is built-in expressions +
  *     one codegen'd kernel ([[org.apache.spark.sql.graft.RdfUnescape]]),
  *     zero UDFs, fully inside whole-stage codegen. This is the format
  *     large public KGs actually dump in (Wikidata/DBpedia exports).
  *   - '''RDF/XML parallelizes per file, not per byte.''' XML nesting +
  *     namespace scoping make the format unsplittable, so each file is
  *     one task (`binaryFile` source + a streaming StAX parse that never
  *     materializes a DOM). OAEI dumps ship as per-dataset files of
  *     modest size, which is exactly this shape; anything bigger should
  *     be converted to N-Triples once ([[toNTriples]]) and re-read
  *     splittably ever after.
  *
  * Malformed rows are skipped (N-Triples: non-matching lines are
  * filtered; a `strict` flag turns them into a loud failure instead),
  * matching how a production corpus scan must behave — one bad line in
  * a terabyte dump must not kill the job.
  */
object Rdf {

  private val RdfNs = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"

  /** One parsed triple. `is_literal` drives the attribute/relation split
    * (sylloge separates attr_triples from rel_triples by exactly this
    * test). For literals, `tail` carries the lexical form with its
    * `@lang` or `^^<datatype>` suffix preserved (strippable with the S2
    * datatype-strip, as the reference's `clean=True` does). */
  final case class RdfTriple(head: String, rel: String, tail: String, is_literal: Boolean)

  // ---------------------------------------------------------------------------
  // N-Triples (distributed line parse)
  // ---------------------------------------------------------------------------

  // subject: IRI or blank node; predicate: IRI; object: rest up to final '.'
  private val NtLine =
    """^\s*(<[^>]*>|_:\S+)\s+<([^>]*)>\s+(.*?)\s*\.\s*$"""
  // literal object: lexical form, then optional @lang or ^^<datatype>
  private val NtLiteral =
    """^"((?:[^"\\]|\\.)*)"(?:@([A-Za-z][A-Za-z0-9-]*)|\^\^<([^>]*)>)?\s*$"""
  // full-line validity in ONE anchored match: subject/predicate as in
  // NtLine, and the object must be a CLOSED IRI, a bnode, or a complete
  // literal (so an unclosed `<http://broken .` object fails the line
  // instead of slipping through as an empty tail). The filter runs this
  // single rlike per line; the expensive group extraction happens once,
  // after the filter, in one projection — without this split, predicate
  // pushdown inlines the three NtLine extracts into the filter AND the
  // projection re-evaluates them (measured: 6 NtLine executions per
  // line).
  private val NtValid =
    """^\s*(<[^>]*>|_:\S+)\s+<([^>]*)>\s+(<[^>]*>|_:\S+|"(?:[^"\\]|\\.)*"(?:@[A-Za-z][A-Za-z0-9-]*|\^\^<[^>]*>)?)\s*\.\s*$"""

  /** Load an N-Triples file/directory/glob as a (head, rel, tail,
    * is_literal) DataFrame. Line-splittable, so the parse scales like
    * any text scan; every step is a built-in or codegen'd expression.
    *
    * @param strict when true, any non-comment line that fails to parse
    *               raises (via `raise_error`) instead of being dropped.
    */
  def loadNTriples(spark: SparkSession, path: String, strict: Boolean = false): DataFrame = {
    val lines = spark.read.text(path)
      .select(col("value").as("line"))
      .filter(length(trim(col("line"))) > 0 && !trim(col("line")).startsWith("#"))
    // ONE validating match per line (see NtValid) — malformed and
    // comment lines never pay the group extraction at all
    val wellFormed = col("line").rlike(NtValid)
    val checked =
      if (strict)
        // the raise lives INSIDE the filter predicate so projection
        // pruning can never skip it for dropped rows
        lines.filter(when(wellFormed, lit(true)).otherwise(
          raise_error(concat(lit("malformed N-Triples line: "), col("line")))))
      else lines.filter(wellFormed)
    // group extraction in ONE projection over pre-validated lines
    // (whole-stage codegen's subexpression elimination evaluates each
    // distinct extract once per row). The validated terms are exact, so
    // IRI angle brackets strip with substr — no further regexes.
    val s = regexp_extract(col("line"), NtLine, 1)
    val o = regexp_extract(col("line"), NtLine, 3)
    val isLit = o.startsWith("\"")
    val lit_lex = regexp_extract(o, NtLiteral, 1)
    val lit_lang = regexp_extract(o, NtLiteral, 2)
    val lit_dt = regexp_extract(o, NtLiteral, 3)
    checked
      .select(
        when(s.startsWith("<"), s.substr(lit(2), length(s) - 2))
          .otherwise(s).as("head"),
        regexp_extract(col("line"), NtLine, 2).as("rel"),
        when(!isLit,
          when(o.startsWith("<"), o.substr(lit(2), length(o) - 2))
            .otherwise(o))
          .otherwise(concat(
            TextOps.rdfUnescape(lit_lex),
            when(lit_lang =!= "", concat(lit("@"), lit_lang)).otherwise(lit("")),
            when(lit_dt =!= "", concat(lit("^^"), lit_dt)).otherwise(lit(""))))
          .as("tail"),
        isLit.as("is_literal"))
  }

  /** Serialize a triple frame back to N-Triples text lines — the
    * convert-once step that turns an unsplittable RDF/XML dump into the
    * splittable scale format (write with `df.write.text(dir)`). Literal
    * suffix (`@lang` / `^^dt`) is re-split from the tail; quotes and
    * control characters in the lexical form are re-escaped with
    * built-ins. */
  def toNTriples(triples: DataFrame): DataFrame = {
    // The in-band tail encoding (`value@lang` / `value^^dtIri`) is
    // ambiguous for plain content that happens to end in a suffix-shaped
    // string, so reinterpretation is deliberately NARROW: a lang tag
    // must look like BCP-47 (2-3 letter primary subtag + optional
    // subtags — so "user@gmail" stays content), and a datatype must be
    // a scheme-qualified IRI with no whitespace (so "wow ^^ smiley"
    // stays content). Residual ambiguity ("note@en") is inherent to the
    // in-band form and documented here rather than hidden.
    val LangTail = "@[A-Za-z]{2,3}(-[A-Za-z0-9]{1,8})*$"
    val DtTail = """\^\^[A-Za-z][A-Za-z0-9+.\-]*:\S+$"""
    val langSuffix = regexp_extract(col("tail"), s"($LangTail)", 1)
    val dt = regexp_extract(col("tail"), """\^\^([A-Za-z][A-Za-z0-9+.\-]*:\S+)$""", 1)
    val lex = when(dt =!= "", regexp_replace(col("tail"), DtTail, ""))
      .otherwise(when(langSuffix =!= "",
        regexp_replace(col("tail"), LangTail, "")).otherwise(col("tail")))
    val escaped = regexp_replace(regexp_replace(regexp_replace(regexp_replace(
      lex, "\\\\", "\\\\\\\\"), "\"", "\\\\\""), "\n", "\\\\n"), "\r", "\\\\r")
    val objTerm = when(col("is_literal"),
      concat(lit("\""), escaped, lit("\""),
        when(dt =!= "", concat(lit("^^<"), dt, lit(">"))).otherwise(langSuffix)))
      .otherwise(when(col("tail").startsWith("_:"), col("tail"))
        .otherwise(concat(lit("<"), col("tail"), lit(">"))))
    val subjTerm = when(col("head").startsWith("_:"), col("head"))
      .otherwise(concat(lit("<"), col("head"), lit(">")))
    triples.select(concat(
      subjTerm, lit(" <"), col("rel"), lit("> "), objTerm, lit(" .")).as("value"))
  }

  // ---------------------------------------------------------------------------
  // RDF/XML (per-file StAX parse)
  // ---------------------------------------------------------------------------

  /** Load RDF/XML file(s) as a (head, rel, tail, is_literal) DataFrame.
    * Each file is parsed by one task with a streaming StAX reader (no
    * DOM — memory stays O(nesting depth), not O(file)); files
    * parallelize across executors via the `binaryFile` source. Blank
    * node labels are made unique per file by a path-hash prefix, so a
    * multi-file load never collides bnodes across files.
    *
    * Supported RDF/XML subset (sufficient for OAEI / DBpedia-style
    * dumps; documented, not silently wrong): rdf:Description and typed
    * node elements; rdf:about / rdf:ID / rdf:nodeID / anonymous nodes;
    * property elements with rdf:resource, rdf:nodeID, literal content
    * (rdf:datatype, xml:lang), nested node elements, and
    * rdf:parseType="Resource"; property attributes on node elements.
    * Not supported: rdf:parseType="Collection"/"Literal", rdf:li
    * container expansion, reification sugar. */
  def loadRdfXml(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(path)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (p, bytes) => parseRdfXmlBytes(bytes, p) }
      .toDF()
      .select("head", "rel", "tail", "is_literal")
  }

  /** Streaming parse of one RDF/XML document. Package-visible for the
    * spec; executor-side only. */
  private[sources] def parseRdfXmlBytes(
      bytes: Array[Byte], sourcePath: String): Iterator[RdfTriple] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[RdfTriple]
    val factory = javax.xml.stream.XMLInputFactory.newInstance()
    factory.setProperty(javax.xml.stream.XMLInputFactory.IS_NAMESPACE_AWARE, true)
    factory.setProperty(javax.xml.stream.XMLInputFactory.IS_COALESCING, true)
    factory.setProperty(javax.xml.stream.XMLInputFactory.SUPPORT_DTD, false)
    factory.setProperty(
      javax.xml.stream.XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    val r = factory.createXMLStreamReader(new java.io.ByteArrayInputStream(bytes))
    val bnodePrefix = f"_:f${sourcePath.hashCode & 0x7fffffff}%x"
    var bnodeCounter = 0
    def freshBnode(): String = { bnodeCounter += 1; s"${bnodePrefix}b$bnodeCounter" }
    var base = sourcePath

    def attr(ns: String, local: String): Option[String] = {
      var i = 0
      var found: Option[String] = None
      while (i < r.getAttributeCount && found.isEmpty) {
        if (r.getAttributeLocalName(i) == local &&
            (r.getAttributeNamespace(i) == ns ||
             (ns == null && r.getAttributeNamespace(i) == null)))
          found = Some(r.getAttributeValue(i))
        i += 1
      }
      found
    }
    def resolve(ref: String): String =
      try new java.net.URI(base).resolve(ref).toString
      catch { case _: Exception => ref }

    /** Parse a node element (reader ON its START_ELEMENT); returns the
      * node's subject term, leaves reader on its END_ELEMENT. */
    def parseNode(): String = {
      val subject =
        attr(RdfNs, "about").map(resolve)
          .orElse(attr(RdfNs, "ID").map(id => resolve("#" + id)))
          .orElse(attr(RdfNs, "nodeID").map(id => s"$bnodePrefix-$id"))
          .getOrElse(freshBnode())
      val qname = Option(r.getNamespaceURI).getOrElse("") + r.getLocalName
      if (qname != RdfNs + "Description")
        out += RdfTriple(subject, RdfNs + "type", qname, is_literal = false)
      // property attributes (non-rdf, non-xml attrs on the node element)
      var i = 0
      while (i < r.getAttributeCount) {
        val ans = r.getAttributeNamespace(i)
        if (ans != null && ans != RdfNs &&
            ans != "http://www.w3.org/XML/1998/namespace")
          out += RdfTriple(subject, ans + r.getAttributeLocalName(i),
            r.getAttributeValue(i), is_literal = true)
        i += 1
      }
      parseProperties(subject)
      subject
    }

    /** Parse property elements until the enclosing node's END_ELEMENT. */
    def parseProperties(subject: String): Unit = {
      var done = false
      while (!done && r.hasNext) {
        r.next() match {
          case javax.xml.stream.XMLStreamConstants.START_ELEMENT =>
            val pred = Option(r.getNamespaceURI).getOrElse("") + r.getLocalName
            val resource = attr(RdfNs, "resource")
            val nodeId = attr(RdfNs, "nodeID")
            val datatype = attr(RdfNs, "datatype")
            val lang = attr("http://www.w3.org/XML/1998/namespace", "lang")
            val parseType = attr(RdfNs, "parseType")
            if (resource.isDefined) {
              out += RdfTriple(subject, pred, resolve(resource.get), is_literal = false)
              skipToEnd()
            } else if (nodeId.isDefined) {
              out += RdfTriple(subject, pred, s"$bnodePrefix-${nodeId.get}",
                is_literal = false)
              skipToEnd()
            } else if (parseType.contains("Resource")) {
              val b = freshBnode()
              out += RdfTriple(subject, pred, b, is_literal = false)
              parseProperties(b) // children are properties of the bnode
            } else {
              // literal text OR one nested node element
              val text = new java.lang.StringBuilder
              var nested: Option[String] = None
              var innerDone = false
              while (!innerDone && r.hasNext) {
                r.next() match {
                  case javax.xml.stream.XMLStreamConstants.CHARACTERS |
                       javax.xml.stream.XMLStreamConstants.CDATA =>
                    text.append(r.getText)
                  case javax.xml.stream.XMLStreamConstants.START_ELEMENT =>
                    nested = Some(parseNode())
                  case javax.xml.stream.XMLStreamConstants.END_ELEMENT =>
                    innerDone = true
                  case _ => ()
                }
              }
              nested match {
                case Some(obj) =>
                  out += RdfTriple(subject, pred, obj, is_literal = false)
                case None =>
                  val suffix = datatype.map("^^" + _)
                    .orElse(lang.map("@" + _)).getOrElse("")
                  out += RdfTriple(subject, pred, text.toString + suffix,
                    is_literal = true)
              }
            }
          case javax.xml.stream.XMLStreamConstants.END_ELEMENT => done = true
          case _ => ()
        }
      }
    }

    def skipToEnd(): Unit = {
      var depth = 0
      var done = false
      while (!done && r.hasNext) {
        r.next() match {
          case javax.xml.stream.XMLStreamConstants.START_ELEMENT => depth += 1
          case javax.xml.stream.XMLStreamConstants.END_ELEMENT =>
            if (depth == 0) done = true else depth -= 1
          case _ => ()
        }
      }
    }

    // drive: find rdf:RDF (or a bare node element), then parse top-level nodes
    try {
      var inRoot = false
      while (r.hasNext) {
        r.next() match {
          case javax.xml.stream.XMLStreamConstants.START_ELEMENT =>
            val isRdfRoot = r.getNamespaceURI == RdfNs && r.getLocalName == "RDF"
            if (!inRoot && isRdfRoot) {
              inRoot = true
              attr("http://www.w3.org/XML/1998/namespace", "base").foreach(b => base = b)
            } else parseNode()
          case _ => ()
        }
      }
    } finally r.close()
    out.iterator
  }

  // ---------------------------------------------------------------------------
  // Alignment format (OAEI reference links → gold pairs)
  // ---------------------------------------------------------------------------

  /** Load an OAEI Alignment-format file (the `<Cell><entity1/><entity2/>
    * <relation>=</relation><measure>…</measure></Cell>` XML that every
    * OAEI track publishes its reference alignment in) as a two-column
    * gold-pair DataFrame. Only cells whose relation matches `relation`
    * (default `=`, equivalence) and whose measure is ≥ `minMeasure` are
    * kept. Per-file StAX, parallel across files, like [[loadRdfXml]]. */
  def loadAlignment(
      spark: SparkSession, path: String,
      leftName: String = "left", rightName: String = "right",
      relation: String = "=", minMeasure: Double = 0.0): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(path)
      .select(col("content")).as[Array[Byte]]
      .flatMap(bytes => parseAlignmentBytes(bytes, relation, minMeasure))
      .toDF(leftName, rightName)
  }

  private[sources] def parseAlignmentBytes(
      bytes: Array[Byte], relation: String,
      minMeasure: Double): Iterator[(String, String)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    val factory = javax.xml.stream.XMLInputFactory.newInstance()
    factory.setProperty(javax.xml.stream.XMLInputFactory.IS_NAMESPACE_AWARE, true)
    factory.setProperty(javax.xml.stream.XMLInputFactory.IS_COALESCING, true)
    factory.setProperty(javax.xml.stream.XMLInputFactory.SUPPORT_DTD, false)
    factory.setProperty(
      javax.xml.stream.XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    val r = factory.createXMLStreamReader(new java.io.ByteArrayInputStream(bytes))
    var e1: String = null; var e2: String = null
    var rel: String = "="; var measure: Double = 1.0
    var inCell = false; var textTarget: String = null
    def rdfResource(): String = {
      var i = 0
      var v: String = null
      while (i < r.getAttributeCount && v == null) {
        if (r.getAttributeLocalName(i) == "resource") v = r.getAttributeValue(i)
        i += 1
      }
      v
    }
    try {
      while (r.hasNext) {
        r.next() match {
          case javax.xml.stream.XMLStreamConstants.START_ELEMENT =>
            r.getLocalName match {
              case "Cell" =>
                inCell = true; e1 = null; e2 = null; rel = "="; measure = 1.0
              case "entity1" if inCell => e1 = rdfResource()
              case "entity2" if inCell => e2 = rdfResource()
              case n @ ("relation" | "measure") if inCell => textTarget = n
              case _ => ()
            }
          case javax.xml.stream.XMLStreamConstants.CHARACTERS if textTarget != null =>
            val t = r.getText.trim
            if (t.nonEmpty) {
              if (textTarget == "relation") rel = t
              else measure = try t.toDouble catch { case _: NumberFormatException => 1.0 }
            }
          case javax.xml.stream.XMLStreamConstants.END_ELEMENT =>
            r.getLocalName match {
              case "Cell" =>
                if (inCell && e1 != null && e2 != null &&
                    rel == relation && measure >= minMeasure)
                  out += ((e1, e2))
                inCell = false
              case "relation" | "measure" => textTarget = null
              case _ => ()
            }
          case _ => ()
        }
      }
    } finally r.close()
    out.iterator
  }

  // ---------------------------------------------------------------------------
  // OAEI bundle
  // ---------------------------------------------------------------------------

  /** Load a raw OAEI pair directory straight into a [[BlockingDataset]]
    * — the end-to-end path that previously required sylloge's Python
    * parse. Conventions tried for each side: `source`/`target` (the
    * OAEI KG-track layout) with extensions `.nt`, `.rdf`, `.xml`, `.owl`;
    * gold from `reference.xml`/`reference.rdf`/`refalign.rdf` (Alignment
    * format). Triples split into attribute frames (literal tails — the
    * blockers' text surface) and relation frames (IRI/bnode tails),
    * exactly the split sylloge hands the reference
    * (ea_dataset.py:54-66). `clean` applies the S2 datatype strip
    * (reference ea_dataset.py:88-91 — a naive `split("^^")[0]` at the
    * FIRST `^^` anywhere; ours is suffix-anchored and scheme-qualified,
    * so a literal like `"a^^b c"` deliberately survives intact here).
    * The `@lang` strip has NO reference counterpart — it is a
    * repo-specific consequence of the in-band tail encoding (our triple
    * rows carry `"lex"@lang` as one string; stripping recovers the bare
    * lexical form the reference gets for free from rdflib's typed
    * Literal), narrowed to BCP-47-shaped tags so plain content like
    * `user@gmail` is untouched. File discovery resolves through the
    * Hadoop FileSystem of `dir`, so bundles on HDFS/S3A work, not just
    * the local filesystem. */
  def loadOaei(
      spark: SparkSession, dir: String,
      leftName: String = "source", rightName: String = "target",
      clean: Boolean = true): BlockingDataset = {

    def findFile(stem: String): String = {
      val exts = Seq("nt", "rdf", "xml", "owl")
      exts.map(e => s"$dir/$stem.$e")
        .find(p => pathExists(spark, p))
        .getOrElse(throw new IllegalArgumentException(
          s"no $stem.{${exts.mkString(",")}} under $dir"))
    }
    def loadAny(path: String): DataFrame =
      if (path.endsWith(".nt")) loadNTriples(spark, path)
      else loadRdfXml(spark, path)

    def split(path: String, tableName: String): (EntityFrame, DataFrame) = {
      val triples = loadAny(path)
      val attrRaw = triples.filter(col("is_literal")).select("head", "rel", "tail")
      // same NARROW suffix rules as [[toNTriples]]: only BCP-47-shaped
      // lang tags and scheme-qualified datatype IRIs strip, so literal
      // content like "user@gmail" survives clean=true intact (the broad
      // `@[A-Za-z][A-Za-z0-9-]*$` strip corrupted it to "user")
      val attr = if (clean)
        attrRaw.withColumn("tail",
          regexp_replace(
            regexp_replace(col("tail"), """\^\^[A-Za-z][A-Za-z0-9+.\-]*:\S+$""", ""),
            "@[A-Za-z]{2,3}(-[A-Za-z0-9]{1,8})*$", ""))
      else attrRaw
      val rel = triples.filter(!col("is_literal")).select("head", "rel", "tail")
      (EntityFrame(attr, tableName, "head", isTriple = true), rel)
    }

    val (left, leftRel) = split(findFile(leftName), leftName)
    val (right, rightRel) = split(findFile(rightName), rightName)
    val gold = Seq("reference.xml", "reference.rdf", "refalign.rdf")
      .map(n => s"$dir/$n").find(p => pathExists(spark, p))
      .map(p => loadAlignment(spark, p, leftName, rightName))
    BlockingDataset(left, right, Some(leftRel), Some(rightRel), gold)
  }

  /** Existence probe through the path's OWN Hadoop filesystem (local,
    * HDFS, S3A, …) — `java.io.File.exists` silently made every
    * format-sniffing loader local-filesystem-only even though the
    * readers themselves accept any Hadoop path. */
  def pathExists(spark: SparkSession, p: String): Boolean = {
    val path = new org.apache.hadoop.fs.Path(p)
    path.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(path)
  }

  /** Names of sub-directories of `dir` (empty if `dir` is absent), via
    * the same Hadoop filesystem resolution as [[pathExists]]. */
  def subDirs(spark: SparkSession, dir: String): Seq[String] = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(path)) Seq.empty
    else fs.listStatus(path).toSeq.filter(_.isDirectory).map(_.getPath.getName)
  }
}
