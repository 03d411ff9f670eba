package graft.store

import javax.xml.stream.{XMLInputFactory, XMLStreamConstants, XMLStreamReader}

/** RDF/XML parser (public W3C RDF 1.1 XML syntax) for the loader surface
  * beside Turtle/TriG/N-Triples/N-Quads. The reference loads only
  * N-Triples (`sparql/Sparql.scala:78-113` via NxParser); RDF/XML is the
  * format most LEGACY RDF ships in (the original 2004 serialization,
  * still the default export of many triple stores), so the engine
  * accepts it directly.
  *
  * Scale shape: identical to the Turtle loader — RDF/XML is a single XML
  * document and never line-splittable, so the unit of parallelism is the
  * FILE (`wholetext` read, one StAX cursor parse per file executor-side).
  * Sharded corpora parse with full parallelism; a single giant .rdf file
  * is the documented anti-pattern (convert to N-Triples).
  *
  * Supported (RDF 1.1 XML syntax spec sections in parens): rdf:RDF
  * roots and rootless node elements (§2.8), rdf:Description and typed
  * node elements (§2.13), rdf:about / rdf:ID / rdf:nodeID subjects,
  * property elements with rdf:resource / rdf:nodeID / rdf:datatype,
  * nested node elements, property attributes on node AND property
  * elements (§2.5, §2.12), xml:lang (incl. reset via lang="") and
  * xml:base inheritance, rdf:li list expansion to rdf:_n (§2.15),
  * rdf:parseType="Resource" / "Literal" / "Collection" (§2.9–2.11),
  * and statement reification via rdf:ID on property elements (§2.17).
  * parseType="Literal" captures the inner XML re-serialized from parser
  * events (canonicalized quoting/self-closing, namespace declarations
  * on the literal root are not re-emitted) and types it rdf:XMLLiteral.
  * DTDs and external entities are disabled (XXE hardening) — documents
  * relying on entity expansion are rejected, not silently mis-read.
  *
  * Emitted term convention matches the store and the Turtle loader:
  * bare IRIs, literals quoted with the store lex escape (+ `@lang` /
  * `^^<dt>`), `_:`-prefixed blank labels skolemized under the
  * caller-supplied per-file scope — explicit rdf:nodeID labels keep
  * their names, generated blanks take collision-free `gen$k` labels via
  * the same two-phase marker discipline as the Turtle parser.
  */
object RdfXml {

  private val RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
  private val XML = "http://www.w3.org/XML/1998/namespace"

  final class ParseException(msg: String) extends RuntimeException(msg)

  private final class LiCounter {
    private var n = 0
    def next(): Int = { n += 1; n }
  }

  /** Parse one RDF/XML document into store-convention (s, p, o) terms.
    * `scope` namespaces the document's blank nodes (file id at the
    * loader; any stable string in tests). `baseIri` seeds xml:base for
    * relative-IRI resolution (empty = leave relative IRIs as written,
    * matching the Turtle parser's convention).
    */
  def parse(content: String, scope: String,
            baseIri: String = ""): Seq[(String, String, String)] = {
    val f = XMLInputFactory.newInstance()
    f.setProperty(XMLInputFactory.IS_COALESCING, java.lang.Boolean.TRUE)
    f.setProperty(XMLInputFactory.SUPPORT_DTD, java.lang.Boolean.FALSE)
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES,
      java.lang.Boolean.FALSE)
    val r = f.createXMLStreamReader(new java.io.StringReader(content))
    try new Parser(r, scope, baseIri).document()
    catch {
      case e: javax.xml.stream.XMLStreamException =>
        throw new ParseException(s"malformed XML: ${e.getMessage}")
    }
    finally r.close()
  }

  private final class Parser(r: XMLStreamReader, scope: String, baseIri: String) {
    private val out = scala.collection.mutable.ArrayBuffer[(String, String, String)]()
    private var blankCounter = 0
    private val explicitLabels = scala.collection.mutable.Set[String]()

    private def fail(msg: String): Nothing = throw new ParseException(
      s"$msg at line ${r.getLocation.getLineNumber}")

    // ---- blank-node labeling: same two-phase discipline as Turtle ----
    // generated labels carry a space marker no explicit label can contain;
    // `finished` renames them gen$k, skipping explicit rdf:nodeID labels.
    private def freshBlank(): String = {
      blankCounter += 1; s"_:$scope: $blankCounter"
    }
    private def nodeIdLabel(l: String): String = {
      if (l.isEmpty) fail("empty rdf:nodeID")
      explicitLabels += l
      s"_:$scope:$l"
    }
    private def finished: Seq[(String, String, String)] = {
      val marker = s"_:$scope: "
      var k = 0
      val names = scala.collection.mutable.Map[String, String]()
      def fin(t: String): String =
        if (t == null || !t.startsWith(marker)) t
        else names.getOrElseUpdate(t, {
          k += 1
          while (explicitLabels.contains(s"gen$k")) k += 1
          s"_:$scope:gen$k"
        })
      out.toSeq.map(t => (fin(t._1), fin(t._2), fin(t._3)))
    }

    // ---- term construction (store conventions) ----
    private def escapeLex(s: String): String = s.flatMap {
      case '\\' => "\\\\"
      case '"' => "\\\""
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c => c.toString
    }
    private def lit(lex: String, lang: String, dt: String): String =
      if (dt != null) "\"" + escapeLex(lex) + "\"^^<" + dt + ">"
      else if (lang != null && lang.nonEmpty) "\"" + escapeLex(lex) + "\"@" + lang
      else "\"" + escapeLex(lex) + "\""

    /** Same joining rules as the Turtle parser's resolve (RFC 3986-lite):
      * absolute IRIs and empty bases pass through; fragment/query refs
      * replace only their component; absolute paths join the authority;
      * relative paths join the base's directory.
      */
    private def resolve(base: String, iri: String): String = {
      if (iri.matches("^[A-Za-z][A-Za-z0-9+.-]*:.*") || base.isEmpty) iri
      else if (iri.isEmpty) base
      else if (iri.startsWith("#")) {
        val cut = base.indexOf('#')
        (if (cut >= 0) base.substring(0, cut) else base) + iri
      } else if (iri.startsWith("?")) {
        val cut = base.indexWhere(c => c == '#' || c == '?')
        (if (cut >= 0) base.substring(0, cut) else base) + iri
      } else if (iri.startsWith("/")) {
        val schemeEnd = base.indexOf("://")
        if (schemeEnd < 0) base + iri
        else {
          val auth = base.indexOf('/', schemeEnd + 3)
          (if (auth < 0) base else base.substring(0, auth)) + iri
        }
      } else {
        val dir = base.lastIndexOf('/')
        (if (dir >= 0) base.substring(0, dir + 1) else base) + iri
      }
    }

    // ---- attribute helpers (reader must sit on START_ELEMENT) ----
    private def attr(ns: String, local: String): Option[String] = {
      val v = r.getAttributeValue(ns, local)
      Option(v)
    }
    /** (base, lang) effective at the current element. */
    private def scoped(base0: String, lang0: String): (String, String) = {
      val b = attr(XML, "base").map(resolve(base0, _)).getOrElse(base0)
      val l = attr(XML, "lang").map(v => if (v.isEmpty) null else v)
        .getOrElse(lang0)
      (b, l)
    }
    /** Non-syntax attributes: everything except rdf:{about,ID,nodeID,
      * resource,datatype,parseType,li}, xml:*, and xmlns decls (StAX
      * already excludes xmlns from the attribute list).
      */
    private def propertyAttrs: Seq[(String, String)] = {
      val syntax = Set("about", "ID", "nodeID", "resource", "datatype",
        "parseType", "li", "RDF", "Description")
      (0 until r.getAttributeCount).flatMap { i =>
        val ns = Option(r.getAttributeNamespace(i)).getOrElse("")
        val ln = r.getAttributeLocalName(i)
        val v = r.getAttributeValue(i)
        if (ns == XML || ns.isEmpty) None // unqualified attrs carry no IRI
        else if (ns == RDF && syntax.contains(ln)) None
        else Some((ns + ln, v))
      }
    }

    private def emit(s: String, p: String, o: String): Unit = out += ((s, p, o))

    // ---- grammar ----
    def document(): Seq[(String, String, String)] = {
      var rootSeen = false
      while (r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT =>
            if (rootSeen) fail("multiple root elements")
            rootSeen = true
            val (base, lang) = scoped(baseIri, null)
            if (r.getNamespaceURI == RDF && r.getLocalName == "RDF")
              nodeElementList(base, lang)
            else nodeElement(base, lang)
          case _ => () // prolog/comments/PIs/whitespace
        }
      }
      if (!rootSeen) fail("no root element")
      finished
    }

    /** Children of rdf:RDF (reader on the rdf:RDF START_ELEMENT). */
    private def nodeElementList(base: String, lang: String): Unit = {
      var open = true
      while (open) r.next() match {
        case XMLStreamConstants.START_ELEMENT => nodeElement(base, lang)
        case XMLStreamConstants.END_ELEMENT => open = false
        case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA =>
          if (!r.isWhiteSpace) fail("text content between node elements")
        case _ => ()
      }
    }

    /** Parse a node element (reader on its START_ELEMENT); consumes
      * through the matching END_ELEMENT and returns the subject term.
      */
    private def nodeElement(base0: String, lang0: String): String = {
      val (base, lang) = scoped(base0, lang0)
      val ns = Option(r.getNamespaceURI).getOrElse("")
      val ln = r.getLocalName
      if (ns == RDF && Set("li", "RDF").contains(ln))
        fail(s"rdf:$ln is not a node element")
      val about = attr(RDF, "about"); val id = attr(RDF, "ID")
      val nodeId = attr(RDF, "nodeID")
      if (Seq(about, id, nodeId).count(_.isDefined) > 1)
        fail("rdf:about / rdf:ID / rdf:nodeID are mutually exclusive")
      val subj = about.map(resolve(base, _))
        .orElse(id.map(i => resolve(base, "#" + i)))
        .orElse(nodeId.map(nodeIdLabel))
        .getOrElse(freshBlank())
      if (!(ns == RDF && ln == "Description")) emit(subj, RDF + "type", ns + ln)
      // property attributes (a rdf:type attr names a CLASS, not a literal)
      propertyAttrs.foreach { case (iri, v) =>
        if (iri == RDF + "type") emit(subj, iri, resolve(base, v))
        else emit(subj, iri, lit(v, lang, null))
      }
      propertyElementList(subj, base, lang)
      subj
    }

    /** Property elements until the owner's END_ELEMENT. */
    private def propertyElementList(subj: String, base: String,
                                    lang: String): Unit = {
      // the li-counter increments only when an rdf:li is processed
      // (W3C RDF/XML §7.4), so rdf:li mixed with named properties still
      // numbers densely
      val li = new LiCounter
      var open = true
      while (open) r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          propertyElement(subj, base, lang, li)
        case XMLStreamConstants.END_ELEMENT => open = false
        case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA =>
          if (!r.isWhiteSpace) fail("mixed content in a node element")
        case _ => ()
      }
    }

    /** Parse one property element of `subj` (reader on its
      * START_ELEMENT); `liIndex` numbers rdf:li expansion.
      */
    private def propertyElement(subj: String, base0: String, lang0: String,
                                li: LiCounter): Unit = {
      val (base, lang) = scoped(base0, lang0)
      val ns = Option(r.getNamespaceURI).getOrElse("")
      val ln = r.getLocalName
      if (ns == RDF && Set("Description", "RDF").contains(ln))
        fail(s"rdf:$ln is not a property element")
      val pred = if (ns == RDF && ln == "li") RDF + "_" + li.next() else ns + ln
      val reify = attr(RDF, "ID").map(i => resolve(base, "#" + i))
      val parseType = attr(RDF, "parseType")
      val res = attr(RDF, "resource"); val nid = attr(RDF, "nodeID")
      val dt = attr(RDF, "datatype").map(resolve(base, _))
      val pattrs = propertyAttrs

      val obj: String = parseType match {
        case Some("Resource") =>
          val b = freshBlank()
          propertyElementList(b, base, lang)
          b
        case Some("Literal") =>
          lit(innerXml(), null, RDF + "XMLLiteral")
        case Some("Collection") =>
          collection(base, lang)
        case Some(other) => fail(s"unsupported rdf:parseType='$other'")
        case None if res.isDefined || nid.isDefined || pattrs.nonEmpty =>
          if (res.isDefined && nid.isDefined)
            fail("rdf:resource and rdf:nodeID are mutually exclusive")
          val node = res.map(resolve(base, _)).orElse(nid.map(nodeIdLabel))
            .getOrElse(freshBlank())
          pattrs.foreach { case (iri, v) =>
            if (iri == RDF + "type") emit(node, iri, resolve(base, v))
            else emit(node, iri, lit(v, lang, null))
          }
          expectEmpty()
          node
        case None =>
          textOrNode(base, lang, dt)
      }
      emit(subj, pred, obj)
      reify.foreach { stmt =>
        emit(stmt, RDF + "type", RDF + "Statement")
        emit(stmt, RDF + "subject", subj)
        emit(stmt, RDF + "predicate", pred)
        emit(stmt, RDF + "object", obj)
      }
    }

    /** Content of a plain property element: either character data (a
      * literal, typed by `dt` or tagged by the in-scope lang) or exactly
      * one nested node element (a resource object). Consumes through the
      * property element's END_ELEMENT.
      */
    private def textOrNode(base: String, lang: String,
                           dt: Option[String]): String = {
      val sb = new StringBuilder
      var node: String = null
      var open = true
      while (open) r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          if (node != null) fail("two node elements under one property")
          if (sb.toString.exists(!_.isWhitespace))
            fail("mixed text and node element (use rdf:parseType='Literal')")
          node = nodeElement(base, lang)
        case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA =>
          if (node != null && !r.isWhiteSpace)
            fail("mixed node element and text")
          sb.append(r.getText)
        case XMLStreamConstants.END_ELEMENT => open = false
        case _ => ()
      }
      if (node != null) {
        if (dt.isDefined) fail("rdf:datatype on a resource-valued property")
        node
      } else lit(sb.toString, if (dt.isDefined) null else lang, dt.orNull)
    }

    /** rdf:parseType="Collection": the property's child node elements
      * become an rdf:first/rdf:rest list of fresh blanks; an empty body
      * is rdf:nil. Consumes through the property's END_ELEMENT.
      */
    private def collection(base: String, lang: String): String = {
      val items = scala.collection.mutable.ArrayBuffer[String]()
      var open = true
      while (open) r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          items += nodeElement(base, lang)
        case XMLStreamConstants.END_ELEMENT => open = false
        case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA =>
          if (!r.isWhiteSpace) fail("text in a Collection body")
        case _ => ()
      }
      if (items.isEmpty) RDF + "nil"
      else {
        val cells = items.map(_ => freshBlank())
        cells.indices.foreach { i =>
          emit(cells(i), RDF + "first", items(i))
          emit(cells(i), RDF + "rest",
            if (i + 1 < cells.length) cells(i + 1) else RDF + "nil")
        }
        cells.head
      }
    }

    /** The property element must be empty (whitespace only). */
    private def expectEmpty(): Unit = {
      var open = true
      while (open) r.next() match {
        case XMLStreamConstants.END_ELEMENT => open = false
        case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA =>
          if (!r.isWhiteSpace)
            fail("content on a property element that names its object")
        case XMLStreamConstants.START_ELEMENT =>
          fail("child element on a property element that names its object")
        case _ => ()
      }
    }

    /** Re-serialize events until the owner's END_ELEMENT as the
      * rdf:XMLLiteral lexical form (canonicalized: attributes
      * double-quoted in document order, no self-closing tags; namespace
      * DECLARATIONS are not re-emitted — prefixes appear as written).
      */
    private def innerXml(): String = {
      val sb = new StringBuilder
      var depth = 1
      def qname: String = {
        val p = r.getPrefix
        if (p == null || p.isEmpty) r.getLocalName else p + ":" + r.getLocalName
      }
      def escText(s: String): String =
        s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      while (depth > 0) r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          depth += 1
          sb.append('<').append(qname)
          (0 until r.getAttributeCount).foreach { i =>
            val ap = Option(r.getAttributePrefix(i)).filter(_.nonEmpty)
            val an = ap.map(_ + ":").getOrElse("") + r.getAttributeLocalName(i)
            sb.append(' ').append(an).append("=\"")
              .append(escText(r.getAttributeValue(i)).replace("\"", "&quot;"))
              .append('"')
          }
          sb.append('>')
        case XMLStreamConstants.END_ELEMENT =>
          depth -= 1
          if (depth > 0) sb.append("</").append(qname).append('>')
        case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA =>
          sb.append(escText(r.getText))
        case XMLStreamConstants.COMMENT =>
          sb.append("<!--").append(r.getText).append("-->")
        case _ => ()
      }
      sb.result()
    }
  }
}
