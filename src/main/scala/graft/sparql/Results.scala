package graft.sparql

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** W3C SPARQL 1.1 Query Results serialization — the interop surface a
  * Jena-based deployment gets from `ResultSetFormatter` (the reference
  * delegates all result handling to Jena; cf.
  * `graphula/sparql/src/main/scala/com/graphula/sparql/Sparql.scala:41-52`).
  *
  * Term convention (matches the store, `TripleStore.cleanTerm`): values
  * carrying their quotes are literals (`"v"`, `"v"@lang`, `"v"^^<dt>`),
  * `_:`-prefixed values are blank nodes, everything else is an IRI.
  *
  * Scale shapes: CSV/TSV are DISTRIBUTED writes (Spark's csv sink does
  * the RFC 4180 quoting; coalesce(1) first if a single file is wanted).
  * The JSON results document is a single object by construction, so
  * `toJson` is an explicitly DRIVER-SIDE bounded serialization — use it
  * for protocol responses, not bulk export.
  */
object Results {

  private val litRe = """^"((?:[^"\\]|\\.)*)"(?:@([A-Za-z0-9-]+)|\^\^<([^>]*)>)?$""".r

  /** Store-convention literal escape (the exact inverse pair used by the
    * Turtle/N-Triples parsers): lexical forms travel inside the store
    * with `\\ \" \n \r \t` escapes; serialization boundaries unescape to
    * the RAW lexical form and re-escape per the carrier format.
    */
  private[graft] def escapeLex(s: String): String = s.flatMap {
    case '\\' => "\\\\"
    case '"' => "\\\""
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c => c.toString
  }

  private[graft] def unescapeLex(v: String): String = {
    val sb = new StringBuilder; var i = 0
    while (i < v.length) {
      val c = v.charAt(i)
      if (c == '\\' && i + 1 < v.length) {
        v.charAt(i + 1) match {
          case 'n' => sb.append('\n')
          case 't' => sb.append('\t')
          case 'r' => sb.append('\r')
          case '\\' => sb.append('\\')
          case '"' => sb.append('"')
          // not an escapeLex production (a mal-escaped lone backslash in
          // the data): preserve it verbatim rather than eat the backslash
          case other => sb.append('\\').append(other)
        }
        i += 2
      } else { sb.append(c); i += 1 }
    }
    sb.result()
  }

  /** SPARQL 1.1 Query Results JSON (driver-side; at most `limit` rows,
    * throws beyond it rather than silently truncating).
    */
  def toJson(df: DataFrame, limit: Int = 10000): String = {
    val vars = df.columns.toSeq
    val rows = df.limit(limit + 1).collect()
    require(rows.length <= limit,
      s"result exceeds $limit rows - raise the limit or use the CSV/TSV writers")
    def esc(s: String): String = s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
    def term(v: String): String = v match {
      case litRe(lex, lang, dt) =>
        val extra =
          if (lang != null) s""","xml:lang":"${esc(lang)}""""
          else if (dt != null) s""","datatype":"${esc(dt)}""""
          else ""
        // the W3C value is the RAW lexical form: store escapes unescape
        // first, then JSON re-escapes (a stored \n becomes JSON "\n")
        s"""{"type":"literal","value":"${esc(unescapeLex(lex))}"$extra}"""
      case b if b.startsWith("_:") =>
        s"""{"type":"bnode","value":"${esc(b.substring(2))}"}"""
      case i => s"""{"type":"uri","value":"${esc(i)}"}"""
    }
    val bindings = rows.map { r =>
      vars.indices.flatMap { i =>
        if (r.isNullAt(i)) None // unbound: the var is omitted from the row
        else Some(s""""${esc(vars(i))}":${term(String.valueOf(r.get(i)))}""")
      }.mkString("{", ",", "}")
    }.mkString("[", ",", "]")
    val head = vars.map(v => s""""${esc(v)}"""").mkString("[", ",", "]")
    s"""{"head":{"vars":$head},"results":{"bindings":$bindings}}"""
  }

  /** SPARQL Query Results XML Format (the fourth W3C serialization;
    * driver-side and bounded like `toJson` — the protocol-response
    * shape). Same term convention; unbound vars omit their `<binding>`.
    */
  def toXml(df: DataFrame, limit: Int = 10000): String = {
    val vars = df.columns.toSeq
    val rows = df.limit(limit + 1).collect()
    require(rows.length <= limit,
      s"result exceeds $limit rows - raise the limit or use the CSV/TSV writers")
    def esc(s: String): String = s.flatMap {
      case '<' => "&lt;"
      case '>' => "&gt;"
      case '&' => "&amp;"
      case '"' => "&quot;"
      case '\r' => "&#13;" // survives XML line-end normalization
      case c => c.toString
    }
    def term(v: String): String = v match {
      case litRe(lex, lang, dt) =>
        val attrs =
          if (lang != null) s""" xml:lang="${esc(lang)}""""
          else if (dt != null) s""" datatype="${esc(dt)}""""
          else ""
        s"""<literal$attrs>${esc(unescapeLex(lex))}</literal>"""
      case b if b.startsWith("_:") => s"""<bnode>${esc(b.substring(2))}</bnode>"""
      case i => s"""<uri>${esc(i)}</uri>"""
    }
    val head = vars.map(v => s"""<variable name="${esc(v)}"/>""").mkString
    val results = rows.map { r =>
      vars.indices.flatMap { i =>
        if (r.isNullAt(i)) None
        else Some(s"""<binding name="${esc(vars(i))}">""" +
          term(String.valueOf(r.get(i))) + "</binding>")
      }.mkString("<result>", "", "</result>")
    }.mkString
    """<?xml version="1.0"?>""" +
      """<sparql xmlns="http://www.w3.org/2005/sparql-results#">""" +
      s"<head>$head</head><results>$results</results></sparql>"
  }

  /** The store-convention term for a parsed results binding. */
  private def bindingTerm(tpe: String, value: String, lang: Option[String],
                          dt: Option[String]): String = tpe match {
    case "uri" => value
    case "bnode" => "_:" + value
    case "literal" | "typed-literal" => // typed-literal: legacy alias
      "\"" + escapeLex(value) + "\"" +
        lang.map("@" + _).orElse(dt.map("^^<" + _ + ">")).getOrElse("")
    case other =>
      throw new IllegalArgumentException(s"unknown binding type '$other'")
  }

  private def bindingsDf(spark: SparkSession, vars: Seq[String],
                         rows: Seq[Map[String, String]]): DataFrame = {
    val schema = StructType(vars.map(StructField(_, StringType, nullable = true)))
    val data = rows.map(m => Row.fromSeq(vars.map(m.get(_).orNull)))
    spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters
        .SeqHasAsJava(data).asJava), schema)
  }

  /** Parse a SPARQL 1.1 Query Results JSON document into a DataFrame —
    * the CLIENT half of [[toJson]], what a federation consumer does
    * with a protocol response (register the result as a SERVICE
    * endpoint relation). Columns follow `head.vars` in document order;
    * vars absent from a row's bindings are null; terms re-enter the
    * store convention. Driver-side and document-bounded by nature.
    */
  def fromJson(spark: SparkSession, doc: String): DataFrame = {
    val root = Json.parse(doc) match {
      case m: Map[_, _] => m.asInstanceOf[Map[String, Any]]
      case _ => throw new IllegalArgumentException("results doc is not a JSON object")
    }
    val head = root.getOrElse("head", Map.empty)
      .asInstanceOf[Map[String, Any]]
    val vars = head.getOrElse("vars", Vector.empty)
      .asInstanceOf[Vector[Any]].map(_.toString)
    val bindings = root.get("results").toSeq
      .flatMap(_.asInstanceOf[Map[String, Any]]
        .getOrElse("bindings", Vector.empty).asInstanceOf[Vector[Any]])
    val rows = bindings.map { b =>
      b.asInstanceOf[Map[String, Any]].map { case (v, t) =>
        val m = t.asInstanceOf[Map[String, Any]]
        v -> bindingTerm(m("type").toString, m("value").toString,
          m.get("xml:lang").map(_.toString), m.get("datatype").map(_.toString))
      }
    }
    bindingsDf(spark, vars, rows)
  }

  /** Parse a SPARQL Query Results XML document into a DataFrame — the
    * client half of [[toXml]] (StAX, DTD/external entities disabled).
    */
  def fromXml(spark: SparkSession, doc: String): DataFrame = {
    import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}
    val f = XMLInputFactory.newInstance()
    f.setProperty(XMLInputFactory.IS_COALESCING, java.lang.Boolean.TRUE)
    f.setProperty(XMLInputFactory.SUPPORT_DTD, java.lang.Boolean.FALSE)
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES,
      java.lang.Boolean.FALSE)
    val r = f.createXMLStreamReader(new java.io.StringReader(doc))
    val vars = scala.collection.mutable.ArrayBuffer[String]()
    val rows = scala.collection.mutable.ArrayBuffer[Map[String, String]]()
    var row = Map.empty[String, String]
    var bindName: String = null
    try {
      while (r.hasNext) r.next() match {
        case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
          case "variable" => vars += r.getAttributeValue(null, "name")
          case "result" => row = Map.empty
          case "binding" => bindName = r.getAttributeValue(null, "name")
          case t @ ("uri" | "bnode" | "literal") =>
            val lang = Option(r.getAttributeValue(
              "http://www.w3.org/XML/1998/namespace", "lang"))
            val dt = Option(r.getAttributeValue(null, "datatype"))
            row += bindName -> bindingTerm(t, r.getElementText, lang, dt)
          case _ => ()
        }
        case XMLStreamConstants.END_ELEMENT if r.getLocalName == "result" =>
          rows += row
        case _ => ()
      }
    } finally r.close()
    bindingsDf(spark, vars.toSeq, rows.toSeq)
  }

  /** Minimal strict JSON reader (objects → Map, arrays → Vector,
    * numbers → BigDecimal, strings with full \\uXXXX escapes) — enough
    * for results documents and the JSON-LD loader without pulling a
    * dependency. [[parseRaw]] returns numbers as [[RawNum]] (the
    * unparsed lexeme) instead — JSON-LD number-to-RDF typing depends on
    * whether the SOURCE carried a fraction/exponent, which the numeric
    * value alone cannot recover (1e2 == 100).
    */
  private[graft] object Json {
    final case class RawNum(lex: String) {
      def dec: BigDecimal = BigDecimal(lex)
    }
    def parse(s: String): Any = run(s, raw = false)
    def parseRaw(s: String): Any = run(s, raw = true)
    private def run(s: String, raw: Boolean): Any = {
      val p = new P(s)
      p.raw = raw
      val v = p.value()
      p.ws()
      require(p.pos >= s.length, s"trailing JSON content at ${p.pos}")
      v
    }
    private final class P(in: String) {
      var raw = false
      var pos = 0
      def ws(): Unit =
        while (pos < in.length && in.charAt(pos).isWhitespace) pos += 1
      private def fail(msg: String): Nothing =
        throw new IllegalArgumentException(s"$msg at offset $pos")
      private def expect(c: Char): Unit = {
        ws()
        if (pos >= in.length || in.charAt(pos) != c) fail(s"expected '$c'")
        pos += 1
      }
      def value(): Any = {
        ws()
        if (pos >= in.length) fail("unexpected end")
        in.charAt(pos) match {
          case '{' => obj()
          case '[' => arr()
          case '"' => str()
          case 't' => lit("true", java.lang.Boolean.TRUE)
          case 'f' => lit("false", java.lang.Boolean.FALSE)
          case 'n' => lit("null", null)
          case _ => num()
        }
      }
      private def lit(kw: String, v: Any): Any = {
        if (!in.regionMatches(pos, kw, 0, kw.length)) fail(s"expected $kw")
        pos += kw.length; v
      }
      private def obj(): Map[String, Any] = {
        expect('{'); ws()
        val m = scala.collection.mutable.LinkedHashMap[String, Any]()
        if (pos < in.length && in.charAt(pos) == '}') { pos += 1; return m.toMap }
        var more = true
        while (more) {
          ws(); val k = str(); expect(':'); m(k) = value(); ws()
          if (pos < in.length && in.charAt(pos) == ',') pos += 1
          else { expect('}'); more = false }
        }
        m.toMap
      }
      private def arr(): Vector[Any] = {
        expect('['); ws()
        val b = Vector.newBuilder[Any]
        if (pos < in.length && in.charAt(pos) == ']') { pos += 1; return b.result() }
        var more = true
        while (more) {
          b += value(); ws()
          if (pos < in.length && in.charAt(pos) == ',') pos += 1
          else { expect(']'); more = false }
        }
        b.result()
      }
      private def str(): String = {
        expect('"')
        val sb = new StringBuilder
        while (pos < in.length && in.charAt(pos) != '"') {
          val c = in.charAt(pos)
          if (c == '\\') {
            pos += 1
            if (pos >= in.length) fail("dangling escape")
            in.charAt(pos) match {
              case '"' => sb.append('"'); pos += 1
              case '\\' => sb.append('\\'); pos += 1
              case '/' => sb.append('/'); pos += 1
              case 'b' => sb.append('\b'); pos += 1
              case 'f' => sb.append('\f'); pos += 1
              case 'n' => sb.append('\n'); pos += 1
              case 'r' => sb.append('\r'); pos += 1
              case 't' => sb.append('\t'); pos += 1
              case 'u' =>
                if (pos + 4 >= in.length) fail("short \\u escape")
                sb.append(Integer.parseInt(in.substring(pos + 1, pos + 5), 16).toChar)
                pos += 5
              case other => fail(s"bad escape '\\$other'")
            }
          } else { sb.append(c); pos += 1 }
        }
        expect('"')
        sb.result()
      }
      private def num(): Any = {
        val start = pos
        while (pos < in.length &&
          ("+-.eE0123456789".indexOf(in.charAt(pos)) >= 0)) pos += 1
        if (pos == start) fail("expected a JSON value")
        val lex = in.substring(start, pos)
        val d = BigDecimal(lex) // validates the lexeme in BOTH modes
        if (raw) RawNum(lex) else d
      }
    }
  }

  /** Turtle serialization of an (s, p, o) GRAPH result (CONSTRUCT /
    * DESCRIBE output) — driver-side and bounded like `toJson`; the
    * distributed bulk path is the N-Triples export sink. Prefixes
    * compact IRIs (longest-namespace match, only when the local part is
    * a valid PN_LOCAL); literals keep their stored lexical form with
    * `^^<dt>` datatypes compacted too. Deterministic: subjects,
    * predicates and objects sort lexicographically, predicate-object
    * lists group with `;` / `,`.
    */
  private def turtleTerm(prefixes: Map[String, String])(v: String): String = {
    def pn(iri: String): String =
      prefixes.toSeq.filter { case (_, ns) => iri.startsWith(ns) }
        .sortBy(-_._2.length).collectFirst {
          // PN_LOCAL allows digit-initial names; no trailing dot
          case (p, ns) if iri.substring(ns.length)
            .matches("[A-Za-z0-9_](?:[A-Za-z0-9_.-]*[A-Za-z0-9_-])?") =>
            s"$p:${iri.substring(ns.length)}"
        }.getOrElse(s"<$iri>")
    v match {
      case litRe(_, _, dt) if dt != null =>
        v.substring(0, v.length - dt.length - 4) + s"^^${pn(dt)}"
      case lit if lit.startsWith("\"") => lit
      case b if b.startsWith("_:") => "_:" + blankPn(b.substring(2))
      case iri => pn(iri)
    }
  }

  /** Rewrite a store blank label to a W3C-valid BLANK_NODE_LABEL: store
    * labels are `scope:label` with a ':' separator, but the Turtle/TriG
    * grammars forbid ':' in blank labels, so serializing them verbatim
    * produces documents external parsers (and `Turtle.parse`) reject.
    * The escape is injective ('_' doubles itself, so decodes are
    * unambiguous) and emits only PN-safe chars — distinct store labels
    * stay distinct, and the output parses anywhere.
    */
  def blankPn(label: String): String = label.flatMap {
    case '_' => "__"
    case ':' => "_c"
    case '.' => "_d"
    case c if c.isLetterOrDigit || c == '-' => c.toString
    case c => f"_u${c.toInt}%04x"
  }

  /** Predicate-object-grouped Turtle stanzas of a sorted triple set,
    * indented by `indent` — shared by the Turtle and TriG writers.
    */
  private def turtleStanzas(triples: Seq[(String, String, String)],
                            prefixes: Map[String, String],
                            indent: String): Seq[String] = {
    val term = turtleTerm(prefixes) _
    triples.groupBy(_._1).toSeq.sortBy(_._1).map { case (s, ts) =>
      val poList = ts.groupBy(_._2).toSeq.sortBy(_._1).map { case (p, os) =>
        s"${term(p)} " + os.map(_._3).sorted.map(term).mkString(" , ")
      }.mkString(s" ;\n$indent  ")
      s"$indent${term(s)} $poList ."
    }
  }

  def toTurtle(graph: DataFrame, prefixes: Map[String, String] = Map.empty,
               limit: Int = 10000): String = {
    val rows = graph.select(col("s"), col("p"), col("o")).limit(limit + 1).collect()
    require(rows.length <= limit,
      s"graph exceeds $limit triples - raise the limit or use the N-Triples sink")
    val header = prefixes.toSeq.sortBy(_._1)
      .map { case (p, ns) => s"@prefix $p: <$ns> ." }
    val triples = rows
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSeq.sorted
    (header ++ turtleStanzas(triples, prefixes, "")).mkString("\n")
  }

  /** TriG serialization of a quad dataset (driver-side bounded, the
    * protocol-response twin of [[toTurtle]]): default-graph triples as
    * plain stanzas first, then one `<g> { ... }` block per named graph
    * in sorted order — the writer half of `TripleStore.parseTriG`
    * (round-tripped in ResultsSpec). Graphs/subjects/predicates/objects
    * all sort, so the document is deterministic.
    */
  def toTrig(quads: DataFrame, prefixes: Map[String, String] = Map.empty,
             limit: Int = 10000): String = {
    val rows = quads.select(col("s"), col("p"), col("o"), col("g"))
      .limit(limit + 1).collect()
    require(rows.length <= limit,
      s"dataset exceeds $limit quads - raise the limit or use the N-Quads sink")
    val term = turtleTerm(prefixes) _
    val header = prefixes.toSeq.sortBy(_._1)
      .map { case (p, ns) => s"@prefix $p: <$ns> ." }
    val byGraph = rows
      .map(r => (Option(r.getString(3)),
        (r.getString(0), r.getString(1), r.getString(2))))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq.sorted).toMap
    val dflt = byGraph.getOrElse(None, Seq.empty)
    val named = byGraph.collect { case (Some(g), ts) => (g, ts) }.toSeq.sortBy(_._1)
    val blocks = turtleStanzas(dflt, prefixes, "") ++ named.map { case (g, ts) =>
      s"${term(g)} {\n" + turtleStanzas(ts, prefixes, "  ").mkString("\n") + "\n}"
    }
    (header ++ blocks).mkString("\n")
  }

  /** RDF/XML serialization of a bounded graph — the writer half of
    * `TripleStore.parseRdfXml` (round-tripped in RdfXmlSpec, byte-pinned
    * by the q_results_rdfxml gate). Property elements must be QNames, so
    * each predicate IRI splits at the longest caller namespace whose
    * remainder is an NCName, else automatically before its longest
    * NCName suffix; auto namespaces get deterministic nsK prefixes in
    * sorted order. Subjects, predicates and objects sort, so the
    * document is deterministic. Blank nodes emit NCName-safe
    * rdf:nodeID labels ('b' + the injective blankPn escape) — the usual
    * label-renaming round-trip, isomorphic not byte-identical. Literals
    * containing control characters XML 1.0 cannot carry are rejected
    * (use the N-Triples sink); '\r' survives as a character reference.
    */
  def toRdfXml(graph: DataFrame, namespaces: Map[String, String] = Map.empty,
               limit: Int = 10000): String = {
    val RDFNS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
    val rows = graph.select(col("s"), col("p"), col("o")).limit(limit + 1).collect()
    require(rows.length <= limit,
      s"graph exceeds $limit triples - raise the limit or use the N-Triples sink")
    val triples = rows
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSeq.sorted
    def escT(v: String) = v.replace("&", "&amp;").replace("<", "&lt;")
      .replace(">", "&gt;")
    def escA(v: String) = escT(v).replace("\"", "&quot;")
    def ncName(v: String) = v.nonEmpty && (v.head.isLetter || v.head == '_') &&
      v.forall(c => c.isLetterOrDigit || c == '_' || c == '-' || c == '.')
    def split(p: String): (String, String) =
      namespaces.values.toSeq.distinct.sortBy(-_.length)
        .collectFirst {
          case ns if p.startsWith(ns) && ncName(p.substring(ns.length)) =>
            (ns, p.substring(ns.length))
        }
        .getOrElse {
          val tail = p.reverseIterator
            .takeWhile(c => c.isLetterOrDigit || c == '_' || c == '-' || c == '.')
            .length
          var i = p.length - tail
          while (i < p.length && !(p(i).isLetter || p(i) == '_')) i += 1
          require(i > 0 && i < p.length,
            s"predicate IRI '$p' has no namespace/NCName split for RDF/XML " +
              "- register its namespace explicitly")
          (p.substring(0, i), p.substring(i))
        }
    val splits = triples.map(t => (t._2, split(t._2))).toMap
    val prefixOf = scala.collection.mutable.LinkedHashMap(RDFNS -> "rdf")
    namespaces.toSeq.sortBy(_._1).foreach { case (pfx, ns) =>
      if (!prefixOf.contains(ns)) prefixOf(ns) = pfx
    }
    val taken = scala.collection.mutable.Set(prefixOf.values.toSeq: _*) += "xml"
    splits.values.map(_._1).toSeq.distinct.sorted.foreach { ns =>
      if (!prefixOf.contains(ns)) {
        var k = 1
        while (taken.contains(s"ns$k")) k += 1
        taken += s"ns$k"; prefixOf(ns) = s"ns$k"
      }
    }
    def textContent(lexEscaped: String): String = {
      val raw = unescapeLex(lexEscaped)
      require(raw.forall(c => c >= ' ' || c == '\n' || c == '\t' || c == '\r'),
        "literal contains control characters XML 1.0 cannot represent " +
          "- use the N-Triples sink")
      escT(raw).replace("\r", "&#xD;")
    }
    val body = triples.groupBy(_._1).toSeq.sortBy(_._1).flatMap { case (s, ts) =>
      val subjAttr =
        if (s.startsWith("_:")) s"""rdf:nodeID="b${blankPn(s.substring(2))}""""
        else s"""rdf:about="${escA(s)}""""
      val props = ts.map(t => (t._2, t._3)).sorted.map { case (p, o) =>
        val (ns, local) = splits(p)
        val q = s"${prefixOf(ns)}:$local"
        o match {
          case litRe(lex, lang, dt) if dt != null =>
            s"""    <$q rdf:datatype="${escA(dt)}">${textContent(lex)}</$q>"""
          case litRe(lex, lang, _) if lang != null =>
            s"""    <$q xml:lang="$lang">${textContent(lex)}</$q>"""
          case litRe(lex, _, _) =>
            s"""    <$q>${textContent(lex)}</$q>"""
          case b if b.startsWith("_:") =>
            s"""    <$q rdf:nodeID="b${blankPn(b.substring(2))}"/>"""
          case iri => s"""    <$q rdf:resource="${escA(iri)}"/>"""
        }
      }
      s"  <rdf:Description $subjAttr>" +: props :+ "  </rdf:Description>"
    }
    val decls = prefixOf.toSeq.map { case (ns, pfx) => (pfx, ns) }.sortBy(_._1)
      .map { case (pfx, ns) => s"""xmlns:$pfx="${escA(ns)}"""" }
    (Seq("<?xml version=\"1.0\"?>", s"<rdf:RDF ${decls.mkString(" ")}>") ++
      body :+ "</rdf:RDF>").mkString("\n")
  }

  /** JSON-LD serialization of a bounded graph — the writer half of
    * `TripleStore.parseJsonLd` (round-tripped in JsonLdSpec, byte-pinned
    * by the q_results_jsonld gate). Compacted, deterministic layout: one
    * `@graph` node object per subject (sorted by subject term, one per
    * line), properties sorted by full predicate IRI after @id/@type,
    * multi-values as sorted arrays. IRIs compact against the caller
    * `context` (longest namespace with a non-empty remainder); canonical
    * xsd:integer/boolean literals emit as native JSON scalars (the
    * loader's §8.2 inverse), other typed/lang literals as @value
    * objects. Blank nodes emit `_:b`-prefixed blankPn labels — the
    * usual renaming round trip.
    */
  def toJsonLd(graph: DataFrame, context: Map[String, String] = Map.empty,
               limit: Int = 10000): String = {
    val RDFT = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
    val XSD = "http://www.w3.org/2001/XMLSchema#"
    val rows = graph.select(col("s"), col("p"), col("o")).limit(limit + 1).collect()
    require(rows.length <= limit,
      s"graph exceeds $limit triples - raise the limit or use the N-Triples sink")
    val triples = rows
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSeq.sorted
    def jesc(s: String): String = s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
    def compact(iri: String): String =
      context.toSeq.sortBy { case (_, ns) => -ns.length }.collectFirst {
        case (pfx, ns) if iri.startsWith(ns) && iri.length > ns.length =>
          s"$pfx:${iri.substring(ns.length)}"
      }.getOrElse(iri)
    def idOf(term: String): String =
      if (term.startsWith("_:")) "_:b" + blankPn(term.substring(2))
      else compact(term)
    val intRe = "^-?(0|[1-9][0-9]*)$".r
    def value(o: String): String = o match {
      case litRe(lex, lang, dt) =>
        val raw = unescapeLex(lex)
        if (dt == XSD + "integer" && intRe.matches(raw)) raw
        else if (dt == XSD + "boolean" && (raw == "true" || raw == "false")) raw
        else if (lang != null)
          s"""{"@value":"${jesc(raw)}","@language":"${jesc(lang)}"}"""
        else if (dt != null)
          s"""{"@value":"${jesc(raw)}","@type":"${jesc(compact(dt))}"}"""
        else s""""${jesc(raw)}""""
      case term => s"""{"@id":"${jesc(idOf(term))}"}"""
    }
    val nodes = triples.groupBy(_._1).toSeq.sortBy(_._1).map { case (s, ts) =>
      val (typeTs, propTs) = ts.partition(_._2 == RDFT)
      val typePart =
        if (typeTs.isEmpty) ""
        else {
          val cs = typeTs.map(t => s""""${jesc(compact(t._3))}"""").sorted.distinct
          val v = if (cs.length == 1) cs.head else cs.mkString("[", ",", "]")
          s""","@type":$v"""
        }
      val props = propTs.groupBy(_._2).toSeq.sortBy(_._1).map { case (p, os) =>
        val vs = os.map(_._3).distinct.map(value).sorted
        val v = if (vs.length == 1) vs.head else vs.mkString("[", ",", "]")
        s""""${jesc(compact(p))}":$v"""
      }
      (s"""{"@id":"${jesc(idOf(s))}"$typePart""" +:
        props).mkString("", ",", "}")
    }
    val ctx = context.toSeq.sortBy(_._1)
      .map { case (p, ns) => s""""${jesc(p)}":"${jesc(ns)}"""" }
      .mkString("{", ",", "}")
    s"""{"@context":$ctx,"@graph":[\n${nodes.mkString(",\n")}\n]}"""
  }

  /** The literal's lexical form for CSV (IRIs/bnodes pass through bare,
    * per the W3C CSV rules).
    */
  private def csvValue(c: Column): Column =
    when(c.startsWith("\""),
      regexp_replace(regexp_extract(c, litRe.regex, 1), """\\(.)""", "$1"))
      .otherwise(c)

  /** SPARQL 1.1 CSV results: distributed write, one header + raw lexical
    * values, RFC 4180 quoting by Spark's csv sink. `escape` is set to the
    * quote char so embedded quotes DOUBLE (RFC 4180 §2.7) instead of
    * Spark's default backslash-escaping.
    */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.select(df.columns.map(n => csvValue(col(n)).as(n)): _*)
      .write.mode("overwrite").option("header", "true")
      .option("escape", "\"").csv(path)

  /** The term in SPARQL surface syntax for TSV: literals keep their
    * stored (already-escaped) form, IRIs re-wrap as `<iri>`.
    */
  private def tsvTerm(c: Column): Column =
    when(c.startsWith("\"") || c.startsWith("_:"), c)
      .otherwise(concat(lit("<"), c, lit(">")))

  /** SPARQL 1.1 TSV results: distributed write; header of `?var` names,
    * terms in SPARQL syntax, no quoting (the TSV format escapes inside
    * literals instead).
    */
  def writeTsv(df: DataFrame, path: String): Unit =
    df.select(df.columns.map(n => tsvTerm(col(n)).as(s"?$n")): _*)
      .write.mode("overwrite").option("header", "true")
      .option("delimiter", "\t").option("quote", "\u0000").csv(path)

  /** Read SPARQL 1.1 TSV results back into a relation — the DISTRIBUTED
    * client half of [[writeTsv]] (TSV is line-splittable, unlike the
    * JSON/XML documents, so this is the bulk-results ingest path).
    * `?var` headers become columns, `<iri>` unwraps, literals and
    * blanks keep their SPARQL-surface form (= the store convention),
    * empty cells are unbound nulls. The W3C CSV form is NOT given a
    * reader: it erases term kind (IRI vs literal) by design, so reading
    * it back would have to guess — use TSV.
    */
  def readTsv(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read.option("header", "true").option("delimiter", "\t")
      .option("quote", "\u0000").csv(path)
    val df = raw.toDF(raw.columns.map(_.stripPrefix("?")).toSeq: _*)
    df.select(df.columns.map { n =>
      val c = col(n)
      when(c.startsWith("<") && c.endsWith(">"),
        c.substr(lit(2), length(c) - 2)).otherwise(c).as(n)
    }.toSeq: _*)
  }
}
