package graft.store

/** JSON-LD loader (public W3C JSON-LD 1.0 core, the documented subset
  * below) beside Turtle/TriG/RDF/XML/N-Triples — the format modern web
  * APIs and schema.org data ship in. The reference loads only N-Triples
  * (`sparql/Sparql.scala:78-113`).
  *
  * Scale shape: identical to the other document formats — a JSON-LD
  * document is one JSON value, so the unit of parallelism is the FILE
  * (`wholetext`, one parse per file executor-side); sharded corpora
  * (the JSON-lines-of-documents layout) parse with full parallelism.
  *
  * Supported subset (deliberate, documented — each a §ref into the
  * JSON-LD 1.0 REC): `@context` term definitions as IRI strings or
  * `{"@id":…, "@type":"@id"|dt}` (§5.1), prefix (compact-IRI) expansion
  * and `@vocab` (§6.2), node objects with `@id` / `@type` (string or
  * array), `_:` blank identifiers, nested node objects and arrays of
  * values (§6.3-6.9), `@reverse` maps (§6.12 — each entry emits the
  * edge flipped, object → subject), value objects
  * `{"@value":…, "@language"|"@type"}` (§6.10), `@list` (§6.11),
  * named graphs (§6.13): a top-level `@graph` beside only `@context`
  * is the default graph, a node object carrying `@graph` is a GRAPH
  * OBJECT whose `@id` names the graph its contents land in —
  * [[parseQuads]] surfaces them as (s, p, o, g) rows (g null =
  * default graph), pairing with the TriG/N-Quads loaders, while the
  * triple-only [[parse]] REJECTS named-graph content loudly rather
  * than silently merging it. JSON scalars type per §8.2 data
  * round-tripping: strings are plain literals, numbers whose SOURCE
  * LEXEME carries no fraction or exponent are xsd:integer, all others
  * (1.5, 1e2, 1.0) xsd:double in canonical Java form, booleans
  * xsd:boolean. A `null` property value is an entry REMOVAL (§6.1):
  * the entry is skipped, never an error and never a triple.
  *
  * NOT supported (rejected or ignored, never silently mis-read):
  * `@index`, `@nest`, `@included`, keyword aliasing, scoped/array/
  * remote contexts (remote fetch would be an egress dependency), and
  * `@json` literals. Term convention and two-phase blank-node scoping
  * match the Turtle parser.
  */
object JsonLd {

  private val RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
  private val XSD = "http://www.w3.org/2001/XMLSchema#"

  final class ParseException(msg: String) extends RuntimeException(msg)

  /** Triples-only entry: named-graph content (graph objects) fails
    * loudly with a pointer to [[parseQuads]].
    */
  def parse(content: String, scope: String): Seq[(String, String, String)] = {
    val quads = parseQuads(content, scope)
    quads.find(_._4.isDefined).foreach { q =>
      throw new ParseException(
        s"document carries named graph <${q._4.get}> - use parseQuads " +
          "(quad dataset ingest) for named-graph JSON-LD")
    }
    quads.map(q => (q._1, q._2, q._3))
  }

  /** Quad entry: graph objects land their contents in the graph named
    * by their `@id`; everything else is the default graph (g = None).
    */
  def parseQuads(content: String, scope: String)
      : Seq[(String, String, String, Option[String])] = {
    val root =
      try graft.sparql.Results.Json.parseRaw(content)
      catch {
        case e: IllegalArgumentException =>
          throw new ParseException(s"malformed JSON: ${e.getMessage}")
      }
    new Parser(scope).document(root)
  }

  private type Ctx = Map[String, TermDef]
  private final case class TermDef(iri: String, typeCoercion: Option[String])
  private type Quad = (String, String, String, Option[String])

  private final class Parser(scope: String) {
    private val out = scala.collection.mutable.ArrayBuffer[Quad]()
    private var blankCounter = 0
    private val explicitLabels = scala.collection.mutable.Set[String]()
    /** The graph current statements land in (None = default graph);
      * graph objects push their `@id` for the span of their contents.
      */
    private var curGraph: Option[String] = None

    private def fail(msg: String): Nothing = throw new ParseException(msg)

    private def emit(s: String, p: String, o: String): Unit =
      out += ((s, p, o, curGraph))

    private def freshBlank(): String = {
      blankCounter += 1; s"_:$scope: $blankCounter"
    }
    private def explicitBlank(l: String): String = {
      explicitLabels += l
      s"_:$scope:$l"
    }
    private def finished: Seq[Quad] = {
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
      out.toSeq.map(t => (fin(t._1), fin(t._2), fin(t._3), t._4.map(fin)))
    }

    private def escapeLex(s: String): String = s.flatMap {
      case '\\' => "\\\\"
      case '"' => "\\\""
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c => c.toString
    }

    def document(root: Any): Seq[Quad] = {
      root match {
        case m: Map[_, _] =>
          val obj = m.asInstanceOf[Map[String, Any]]
          val ctx = context(obj.get("@context"))
          obj.get("@graph") match {
            case Some(g) if (obj.keySet -- Set("@context", "@graph")).isEmpty =>
              // a top-level @graph beside only @context is the DEFAULT
              // graph (§6.13)
              values(g).foreach(n => node(n, ctx))
            case Some(_) =>
              // @graph beside @id (or other entries): a named GRAPH
              // OBJECT — parse as a node so its contents land in the
              // graph it names
              node(obj, ctx)
            case None => node(obj, ctx)
          }
        case v: Vector[_] => v.foreach(n => node(n, Map.empty))
        case _ => fail("JSON-LD document must be an object or array")
      }
      finished
    }

    /** Parse an @context value into term definitions. */
    private def context(v: Option[Any]): Ctx = v match {
      case None => Map.empty
      case Some(m: Map[_, _]) =>
        val raw = m.asInstanceOf[Map[String, Any]]
        // two passes so prefix terms can reference each other and @vocab
        val strs = raw.collect { case (k, s: String) => (k, s) }
        def expandWith(partial: Map[String, String], iri: String): String = {
          val colon = iri.indexOf(':')
          if (colon > 0) {
            val pfx = iri.substring(0, colon)
            partial.get(pfx).map(_ + iri.substring(colon + 1)).getOrElse(iri)
          } else partial.get("@vocab").map(_ + iri).getOrElse(iri)
        }
        val base = strs.map { case (k, s) =>
          (k, if (k == "@vocab") s else expandWith(strs, s))
        }
        val defs = raw.map {
          case (k, _) if k == "@vocab" =>
            k -> TermDef(base("@vocab"), None)
          case (k, s: String) => k -> TermDef(base(k), None)
          case (k, d: Map[_, _]) =>
            val dm = d.asInstanceOf[Map[String, Any]]
            val iri = dm.get("@id") match {
              case Some(s: String) => expandWith(base, s)
              case _ => fail(s"term '$k' definition needs a string @id")
            }
            val tc = dm.get("@type").map {
              case s: String if s == "@id" => "@id"
              case s: String => expandWith(base, s)
              case _ => fail(s"term '$k' @type must be a string")
            }
            k -> TermDef(iri, tc)
          case (k, _) => fail(s"unsupported @context entry for '$k'")
        }
        defs
      case Some(_: String) =>
        fail("remote @context IRIs are not supported (no egress)")
      case Some(_) => fail("unsupported @context form (arrays/remote)")
    }

    /** Expand a term/compact-IRI/IRI in predicate or @type position. */
    private def expand(ctx: Ctx, t: String): String =
      ctx.get(t).map(_.iri).getOrElse {
        val colon = t.indexOf(':')
        if (colon > 0) {
          val pfx = t.substring(0, colon)
          ctx.get(pfx).map(_.iri + t.substring(colon + 1)).getOrElse(t)
        } else ctx.get("@vocab").map(_.iri + t).getOrElse(t)
      }

    /** Expand a string in @id position (blank label or IRI). */
    private def idTerm(ctx: Ctx, s: String): String =
      if (s.startsWith("_:")) explicitBlank(s.substring(2))
      else expand(ctx, s)

    /** Emit a node object's statements; returns its subject term. */
    private def node(v: Any, outerCtx: Ctx): String = v match {
      case m: Map[_, _] =>
        val obj = m.asInstanceOf[Map[String, Any]]
        val ctx = obj.get("@context")
          .map(c => outerCtx ++ context(Some(c))).getOrElse(outerCtx)
        for (kw <- Seq("@index", "@nest", "@included"))
          if (obj.contains(kw)) fail(s"$kw is not in the JSON-LD subset")
        val subj = obj.get("@id") match {
          case Some(s: String) => idTerm(ctx, s)
          case Some(_) => fail("@id must be a string")
          case None => freshBlank()
        }
        obj.get("@type").foreach { t =>
          val types = t match {
            case s: String => Seq(s)
            case a: Vector[_] => a.map {
              case s: String => s
              case _ => fail("@type entries must be strings")
            }
            case _ => fail("@type must be a string or array")
          }
          types.foreach(c => emit(subj, RDF + "type", expand(ctx, c)))
        }
        // §6.12: each @reverse entry emits the edge FLIPPED — the
        // referenced node becomes the subject; values must be node
        // references, a literal cannot take subject position
        obj.get("@reverse").foreach {
          case rm: Map[_, _] =>
            rm.asInstanceOf[Map[String, Any]].foreach { case (k, value) =>
              val pred = expand(ctx, k)
              values(value).filter(_ != null).foreach {
                case s: String => emit(idTerm(ctx, s), pred, subj)
                case nm: Map[_, _] =>
                  val om = nm.asInstanceOf[Map[String, Any]]
                  if (om.contains("@value") || om.contains("@list"))
                    fail("@reverse values must be node references")
                  emit(node(nm, ctx), pred, subj)
                case other => fail(s"@reverse value must be a node: $other")
              }
            }
          case _ => fail("@reverse must be a map of properties")
        }
        // §6.13: a node carrying @graph is a GRAPH OBJECT — its
        // contents land in the graph its subject names
        obj.get("@graph").foreach { g =>
          val prev = curGraph
          curGraph = Some(subj)
          values(g).filter(_ != null).foreach(n => node(n, ctx))
          curGraph = prev
        }
        obj.foreach { case (k, value) =>
          if (!k.startsWith("@")) {
            val pred = expand(ctx, k)
            val coerce = ctx.get(k).flatMap(_.typeCoercion)
            // §6.1: null values (and null array members) REMOVE the
            // entry — skipped, never emitted
            values(value).filter(_ != null).foreach(o =>
              emit(subj, pred, objectTerm(o, ctx, coerce)))
          }
        }
        subj
      case _ => fail("node object expected")
    }

    /** Flatten an array value into its members (arrays of arrays are not
      * a JSON-LD shape).
      */
    private def values(v: Any): Seq[Any] = v match {
      case a: Vector[_] => a
      case other => Seq(other)
    }

    /** §8.2 data round-tripping: the TYPE depends on the source LEXEME —
      * a fraction or exponent makes the number xsd:double even when its
      * VALUE is whole (1e2, 1.0); only a bare integer lexeme is
      * xsd:integer.
      */
    private def numTerm(n: graft.sparql.Results.Json.RawNum): String =
      if (n.lex.exists(c => c == '.' || c == 'e' || c == 'E'))
        "\"" + n.dec.toDouble.toString + "\"^^<" + XSD + "double>"
      else
        "\"" + n.dec.toBigInt.toString + "\"^^<" + XSD + "integer>"

    /** The object term for one value in property position. */
    private def objectTerm(v: Any, ctx: Ctx, coerce: Option[String]): String =
      v match {
        case s: String => coerce match {
          case Some("@id") => idTerm(ctx, s)
          case Some(dt) => "\"" + escapeLex(s) + "\"^^<" + dt + ">"
          case None => "\"" + escapeLex(s) + "\""
        }
        case n: graft.sparql.Results.Json.RawNum => numTerm(n)
        case b: java.lang.Boolean =>
          "\"" + b.toString + "\"^^<" + XSD + "boolean>"
        case null => fail("null is not a JSON-LD value")
        case m: Map[_, _] =>
          val obj = m.asInstanceOf[Map[String, Any]]
          if (obj.contains("@value")) {
            val raw = obj("@value") match {
              case s: String => s
              case n: graft.sparql.Results.Json.RawNum =>
                return numTerm(n) // typed by the scalar rule
              case b: java.lang.Boolean => return objectTerm(b, ctx, None)
              case _ => fail("@value must be a scalar")
            }
            val lex = "\"" + escapeLex(raw) + "\""
            (obj.get("@language"), obj.get("@type")) match {
              case (Some(l: String), None) => lex + "@" + l
              case (None, Some(t: String)) => lex + "^^<" + expand(ctx, t) + ">"
              case (None, None) => lex
              case _ => fail("@value with both/invalid @language and @type")
            }
          } else if (obj.contains("@list")) {
            val items = obj("@list") match {
              case a: Vector[_] => a
              case _ => fail("@list must be an array")
            }
            if (items.isEmpty) RDF + "nil"
            else {
              val cells = items.map(_ => freshBlank())
              cells.indices.foreach { i =>
                emit(cells(i), RDF + "first",
                  objectTerm(items(i), ctx, None))
                emit(cells(i), RDF + "rest",
                  if (i + 1 < cells.length) cells(i + 1) else RDF + "nil")
              }
              cells.head
            }
          } else if (obj.keySet == Set("@id")) {
            idTerm(ctx, obj("@id") match {
              case s: String => s
              case _ => fail("@id must be a string")
            })
          } else node(obj, ctx) // nested node object
        case _ => fail(s"unsupported JSON-LD value: $v")
      }
  }
}
