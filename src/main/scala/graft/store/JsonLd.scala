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
  * values (§6.3-6.9), value objects `{"@value":…, "@language"|"@type"}`
  * (§6.10), `@list` (§6.11), a top-level `@graph` node array (§6.13,
  * default graph only). JSON scalars type per §8.2: strings are plain
  * literals, whole numbers xsd:integer, fractional numbers xsd:double
  * (Java canonical form), booleans xsd:boolean.
  *
  * NOT supported (rejected or ignored, never silently mis-read):
  * `@reverse`, `@index`, `@nest`, `@included`, keyword aliasing,
  * scoped/array/remote contexts (remote fetch would be an egress
  * dependency), named graphs inside node objects (use TriG/N-Quads),
  * and `@json` literals. Term convention and two-phase blank-node
  * scoping match the Turtle parser.
  */
object JsonLd {

  private val RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
  private val XSD = "http://www.w3.org/2001/XMLSchema#"

  final class ParseException(msg: String) extends RuntimeException(msg)

  def parse(content: String, scope: String): Seq[(String, String, String)] = {
    val root =
      try graft.sparql.Results.Json.parse(content)
      catch {
        case e: IllegalArgumentException =>
          throw new ParseException(s"malformed JSON: ${e.getMessage}")
      }
    new Parser(scope).document(root)
  }

  private type Ctx = Map[String, TermDef]
  private final case class TermDef(iri: String, typeCoercion: Option[String])

  private final class Parser(scope: String) {
    private val out = scala.collection.mutable.ArrayBuffer[(String, String, String)]()
    private var blankCounter = 0
    private val explicitLabels = scala.collection.mutable.Set[String]()

    private def fail(msg: String): Nothing = throw new ParseException(msg)

    private def freshBlank(): String = {
      blankCounter += 1; s"_:$scope: $blankCounter"
    }
    private def explicitBlank(l: String): String = {
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

    private def escapeLex(s: String): String = s.flatMap {
      case '\\' => "\\\\"
      case '"' => "\\\""
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c => c.toString
    }

    def document(root: Any): Seq[(String, String, String)] = {
      root match {
        case m: Map[_, _] =>
          val obj = m.asInstanceOf[Map[String, Any]]
          val ctx = context(obj.get("@context"))
          obj.get("@graph") match {
            case Some(g: Vector[_]) =>
              // a top-level @graph beside only @context is the default
              // graph; anything else alongside would make it a NAMED
              // graph node, out of the subset
              val extra = obj.keySet -- Set("@context", "@graph")
              if (extra.nonEmpty)
                fail(s"named graphs are not in the JSON-LD subset " +
                  s"(top-level @graph with ${extra.mkString(",")}); use TriG")
              g.foreach(n => node(n, ctx))
            case Some(_) => fail("@graph must be an array")
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

    /** Emit a node object's triples; returns its subject term. */
    private def node(v: Any, outerCtx: Ctx): String = v match {
      case m: Map[_, _] =>
        val obj = m.asInstanceOf[Map[String, Any]]
        val ctx = obj.get("@context")
          .map(c => outerCtx ++ context(Some(c))).getOrElse(outerCtx)
        for (kw <- Seq("@reverse", "@index", "@nest", "@included", "@graph"))
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
          types.foreach(c => out += ((subj, RDF + "type", expand(ctx, c))))
        }
        obj.foreach { case (k, value) =>
          if (!k.startsWith("@")) {
            val pred = expand(ctx, k)
            val coerce = ctx.get(k).flatMap(_.typeCoercion)
            values(value).foreach(o =>
              out += ((subj, pred, objectTerm(o, ctx, coerce))))
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

    /** The object term for one value in property position. */
    private def objectTerm(v: Any, ctx: Ctx, coerce: Option[String]): String =
      v match {
        case s: String => coerce match {
          case Some("@id") => idTerm(ctx, s)
          case Some(dt) => "\"" + escapeLex(s) + "\"^^<" + dt + ">"
          case None => "\"" + escapeLex(s) + "\""
        }
        case n: BigDecimal =>
          if (n.isWhole)
            "\"" + n.toBigInt.toString + "\"^^<" + XSD + "integer>"
          else // §8.2: fractional JSON numbers are xsd:double (canonical
            // Java form; exponent inputs land here too)
            "\"" + n.toDouble.toString + "\"^^<" + XSD + "double>"
        case b: java.lang.Boolean =>
          "\"" + b.toString + "\"^^<" + XSD + "boolean>"
        case null => fail("null is not a JSON-LD value")
        case m: Map[_, _] =>
          val obj = m.asInstanceOf[Map[String, Any]]
          if (obj.contains("@value")) {
            val raw = obj("@value") match {
              case s: String => s
              case n: BigDecimal =>
                return objectTerm(n, ctx, None) // typed by the scalar rule
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
                out += ((cells(i), RDF + "first",
                  objectTerm(items(i), ctx, None)))
                out += ((cells(i), RDF + "rest",
                  if (i + 1 < cells.length) cells(i + 1) else RDF + "nil"))
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
