package graft.sparql

import graft.bgp.{Bgp, C, PredStats, Term, TriplePattern, V}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Minimal SPARQL 1.1 SELECT front-end.
  *
  * The reference delegates everything beyond BGPs to Jena ARQ
  * (`sparql/src/main/scala/com/graphula/sparql/Sparql.scala:41-65`,
  * `GraphulaStageGenerator.scala:28-133`); here the same query surface
  * compiles onto Spark built-ins instead: BGP -> `Bgp.compile` self-join
  * chain, OPTIONAL -> left join, UNION -> unionByName (bag semantics,
  * missing vars null), FILTER -> `where`, DISTINCT/ORDER BY/LIMIT ->
  * `distinct`/`orderBy`/`limit` (Catalyst turns sort+limit into top-k).
  *
  * Grammar subset (LUBM-shaped queries + solution modifiers):
  *   PREFIX pfx: <iri>
  *   SELECT [DISTINCT] (?v ... | *) WHERE {
  *     s p o .            triple patterns; `a` for rdf:type
  *     OPTIONAL { ... }   left join on shared variables
  *     { ... } UNION { ... }
  *     FILTER (expr)      comparisons, && || !, REGEX(?v, "re")
  *   } [ORDER BY (?v | ASC(?v) | DESC(?v))*] [LIMIT n]
  */
object Sparql {

  // ---------- AST ----------
  /** Projection item: a plain variable or an aggregate `(FN(?v) AS ?a)`. */
  sealed trait ProjItem
  final case class PVar(name: String) extends ProjItem
  final case class PAgg(fn: String, arg: Option[String], alias: String) extends ProjItem

  final case class Query(distinct: Boolean, projection: Seq[ProjItem], group: Group,
                         groupBy: Seq[String], orderBy: Seq[(String, Boolean)],
                         limit: Option[Int], offset: Option[Int] = None)
  final case class Group(triples: Seq[TriplePattern], filters: Seq[Expr],
                         optionals: Seq[Group], unions: Seq[(Group, Group)],
                         minuses: Seq[Group] = Seq.empty,
                         values: Seq[(String, Seq[String])] = Seq.empty,
                         transitives: Seq[(Term, String, Term)] = Seq.empty)

  sealed trait Expr
  final case class Cmp(l: Operand, op: String, r: Operand) extends Expr
  final case class And(l: Expr, r: Expr) extends Expr
  final case class Or(l: Expr, r: Expr) extends Expr
  final case class Not(e: Expr) extends Expr
  final case class Regex(v: String, pattern: String) extends Expr

  sealed trait Operand
  final case class OVar(name: String) extends Operand
  final case class ONum(v: Double) extends Operand
  final case class OStr(v: String) extends Operand

  // ---------- Tokenizer ----------
  private sealed trait Tok
  private case class TWord(s: String) extends Tok      // bare word / keyword / `a`
  private case class TVar(s: String) extends Tok       // ?name (name only)
  private case class TIri(s: String) extends Tok       // <...> (stripped)
  private case class TStr(s: String) extends Tok       // "..." (unquoted)
  private case class TNum(s: String) extends Tok
  private case class TPName(prefix: String, local: String) extends Tok // pfx:local
  private case class TSym(s: String) extends Tok

  private val tokenRe =
    """\s*(?:(\?[A-Za-z_][A-Za-z0-9_]*)|(<[^>]*>)|("(?:[^"\\]|\\.)*")|([+-]?\d+(?:\.\d+)?)|([A-Za-z_][A-Za-z0-9_]*)?:([A-Za-z0-9_][A-Za-z0-9_]*)?|([A-Za-z_][A-Za-z0-9_]*)|(&&|\|\||!=|<=|>=|[{}().!=<>*,/+]))""".r

  private def tokenize(s: String): Vector[Tok] = {
    var i = 0
    val out = Vector.newBuilder[Tok]
    while (i < s.length && !s.substring(i).forall(_.isWhitespace)) {
      tokenRe.findPrefixMatchOf(s.subSequence(i, s.length)) match {
        case Some(m) if m.end > 0 =>
          if (m.group(1) != null) out += TVar(m.group(1).substring(1))
          else if (m.group(2) != null) out += TIri(m.group(2).stripPrefix("<").stripSuffix(">"))
          else if (m.group(3) != null) out += TStr(unescape(m.group(3)))
          else if (m.group(4) != null) out += TNum(m.group(4))
          else if (m.group(5) != null || m.group(6) != null ||
            (m.matched.trim.contains(":") && m.group(7) == null && m.group(8) == null))
            out += TPName(Option(m.group(5)).getOrElse(""), Option(m.group(6)).getOrElse(""))
          else if (m.group(7) != null) out += TWord(m.group(7))
          else out += TSym(m.group(8))
          i += m.end
        case _ =>
          throw new IllegalArgumentException(s"SPARQL tokenizer stuck at: ${s.substring(i).take(30)}")
      }
    }
    out.result()
  }

  private def unescape(quoted: String): String =
    quoted.substring(1, quoted.length - 1)
      .replace("\\\"", "\"").replace("\\\\", "\\")
      .replace("\\n", "\n").replace("\\t", "\t")

  // ---------- Parser (recursive descent) ----------
  private class P(toks: Vector[Tok]) {
    var pos = 0
    def peek: Option[Tok] = toks.lift(pos)
    def next(): Tok = { val t = toks(pos); pos += 1; t }
    def isKw(t: Tok, kw: String): Boolean = t match {
      case TWord(w) => w.equalsIgnoreCase(kw)
      case _ => false
    }
    def eatKw(kw: String): Unit = {
      if (!peek.exists(isKw(_, kw))) fail(s"expected $kw")
      pos += 1
    }
    def tryKw(kw: String): Boolean =
      if (peek.exists(isKw(_, kw))) { pos += 1; true } else false
    def eatSym(sym: String): Unit = peek match {
      case Some(TSym(s)) if s == sym => pos += 1
      case _ => fail(s"expected '$sym'")
    }
    def trySym(sym: String): Boolean = peek match {
      case Some(TSym(s)) if s == sym => pos += 1; true
      case _ => false
    }
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"SPARQL parse error at token $pos: $msg (found ${peek.getOrElse("EOF")})")
  }

  def parse(text: String): Query = {
    val p = new P(tokenize(text))
    var prefixes = Map.empty[String, String]
    while (p.tryKw("PREFIX")) {
      val (pfx, local) = p.next() match {
        case TPName(a, b) => (a, b)
        case t => p.fail(s"expected prefix declaration, got $t")
      }
      if (local.nonEmpty) p.fail("prefix declaration must end with ':'")
      val iri = p.next() match {
        case TIri(i) => i
        case t => p.fail(s"expected <iri>, got $t")
      }
      prefixes += (pfx -> iri)
    }
    p.eatKw("SELECT")
    val distinct = p.tryKw("DISTINCT")
    var proj = Seq.empty[ProjItem]
    var star = false
    var reading = true
    val aggFns = Seq("COUNT", "SUM", "MIN", "MAX", "AVG")
    while (reading) p.peek match {
      case Some(TVar(v)) => proj :+= PVar(v); p.pos += 1
      case Some(TSym("*")) => star = true; p.pos += 1
      case Some(TSym("(")) => // ( FN(?v | *) AS ?alias )
        p.pos += 1
        val fn = p.next() match {
          case TWord(w) if aggFns.contains(w.toUpperCase) => w.toUpperCase
          case t => p.fail(s"expected aggregate function, got $t")
        }
        p.eatSym("(")
        val arg = p.peek match {
          case Some(TVar(v)) => p.pos += 1; Some(v)
          case Some(TSym("*")) => p.pos += 1; None
          case t => p.fail(s"expected ?var or * in aggregate, got $t")
        }
        p.eatSym(")")
        p.eatKw("AS")
        val alias = p.next() match {
          case TVar(v) => v
          case t => p.fail(s"expected ?alias, got $t")
        }
        p.eatSym(")")
        proj :+= PAgg(fn, arg, alias)
      case _ => reading = false
    }
    if (!star && proj.isEmpty) p.fail("empty projection")
    p.eatKw("WHERE")
    val group = parseGroup(p, prefixes)
    var groupBy = Seq.empty[String]
    if (p.tryKw("GROUP")) {
      p.eatKw("BY")
      var more = true
      while (more) p.peek match {
        case Some(TVar(v)) => groupBy :+= v; p.pos += 1
        case _ => more = false
      }
      if (groupBy.isEmpty) p.fail("empty GROUP BY")
    }
    var order = Seq.empty[(String, Boolean)]
    if (p.tryKw("ORDER")) {
      p.eatKw("BY")
      var more = true
      while (more) p.peek match {
        case Some(TVar(v)) => order :+= (v -> true); p.pos += 1
        case Some(t) if p.isKw(t, "ASC") || p.isKw(t, "DESC") =>
          val asc = p.isKw(t, "ASC"); p.pos += 1
          p.eatSym("(")
          val v = p.next() match { case TVar(x) => x; case x => p.fail(s"expected ?var, got $x") }
          p.eatSym(")")
          order :+= (v -> asc)
        case _ => more = false
      }
    }
    def num(kw: String): Option[Int] =
      if (p.tryKw(kw)) Some(p.next() match {
        case TNum(n) => n.toInt
        case t => p.fail(s"expected number after $kw, got $t")
      }) else None
    // LIMIT/OFFSET accepted in either order, as in SPARQL
    var limit = num("LIMIT")
    val offset = num("OFFSET")
    if (limit.isEmpty) limit = num("LIMIT")
    Query(distinct, proj, group, groupBy, order, limit, offset)
  }

  private def parseGroup(p: P, prefixes: Map[String, String]): Group = {
    p.eatSym("{")
    var triples = Seq.empty[TriplePattern]
    var filters = Seq.empty[Expr]
    var optionals = Seq.empty[Group]
    var unions = Seq.empty[(Group, Group)]
    var minuses = Seq.empty[Group]
    var values = Seq.empty[(String, Seq[String])]
    var transitives = Seq.empty[(Term, String, Term)]
    var freshVar = 0
    while (!p.trySym("}")) {
      p.peek match {
        case Some(t) if p.isKw(t, "OPTIONAL") =>
          p.pos += 1
          optionals :+= parseGroup(p, prefixes)
        case Some(t) if p.isKw(t, "MINUS") =>
          p.pos += 1
          minuses :+= parseGroup(p, prefixes)
        case Some(t) if p.isKw(t, "VALUES") =>
          p.pos += 1
          val v = p.next() match {
            case TVar(x) => x
            case x => p.fail(s"expected ?var after VALUES, got $x")
          }
          p.eatSym("{")
          var vals = Seq.empty[String]
          while (!p.trySym("}")) p.next() match {
            case TStr(sv) => vals :+= sv
            case TIri(i) => vals :+= i
            case TNum(n) => vals :+= n
            case x => p.fail(s"unexpected VALUES entry $x")
          }
          values :+= (v -> vals)
        case Some(t) if p.isKw(t, "FILTER") =>
          p.pos += 1
          p.eatSym("(")
          filters :+= parseExpr(p)
          p.eatSym(")")
        case Some(TSym("{")) =>
          val left = parseGroup(p, prefixes)
          p.eatKw("UNION")
          val right = parseGroup(p, prefixes)
          unions :+= (left -> right)
        case _ =>
          val s = parseTerm(p, prefixes)
          val pr = parseTerm(p, prefixes)
          // property paths: sequence `p1/p2/...` expands to chained
          // patterns over fresh internal variables; `p+` marks a
          // transitive-closure step (single predicate)
          if (p.trySym("+")) {
            val predName = pr match {
              case C(v) => v.toString
              case _ => p.fail("transitive path requires a constant predicate")
            }
            val o = parseTerm(p, prefixes)
            transitives :+= ((s, predName, o))
          } else {
            var subject = s
            var pred = pr
            while (p.trySym("/")) {
              val mid = V(s"__pv${freshVar}")
              freshVar += 1
              triples :+= TriplePattern(subject, pred, mid)
              subject = mid
              pred = parseTerm(p, prefixes)
            }
            val o = parseTerm(p, prefixes)
            triples :+= TriplePattern(subject, pred, o)
          }
          p.trySym(".") // trailing dot optional before '}'
      }
    }
    Group(triples, filters, optionals, unions, minuses, values, transitives)
  }

  private def parseTerm(p: P, prefixes: Map[String, String]): graft.bgp.Term =
    p.next() match {
      case TVar(v) => V(v)
      case TStr(s) => C(s)
      case TIri(i) => C(i)
      case TNum(n) => C(n)
      case TPName(pfx, local) =>
        val base = prefixes.getOrElse(pfx,
          throw new IllegalArgumentException(s"undeclared prefix '$pfx:'"))
        C(base + local)
      case TWord("a") => C("a") // rdf:type shortcut, stored as predicate "a"
      case t => p.fail(s"unexpected term $t")
    }

  private def parseExpr(p: P): Expr = {
    var left = parseCond(p)
    var more = true
    while (more) p.peek match {
      case Some(TSym("&&")) => p.pos += 1; left = And(left, parseCond(p))
      case Some(TSym("||")) => p.pos += 1; left = Or(left, parseCond(p))
      case _ => more = false
    }
    left
  }

  private def parseCond(p: P): Expr = p.peek match {
    case Some(TSym("!")) => p.pos += 1; Not(parseCond(p))
    case Some(TSym("(")) => p.pos += 1; val e = parseExpr(p); p.eatSym(")"); e
    case Some(t) if p.isKw(t, "REGEX") =>
      p.pos += 1
      p.eatSym("(")
      val v = p.next() match { case TVar(x) => x; case x => p.fail(s"expected ?var, got $x") }
      p.eatSym(",")
      val re = p.next() match { case TStr(s) => s; case x => p.fail(s"expected pattern, got $x") }
      p.eatSym(")")
      Regex(v, re)
    case _ =>
      val l = parseOperand(p)
      val op = p.next() match {
        case TSym(o) if Seq("=", "!=", "<", "<=", ">", ">=").contains(o) => o
        case t => p.fail(s"expected comparison operator, got $t")
      }
      val r = parseOperand(p)
      Cmp(l, op, r)
  }

  private def parseOperand(p: P): Operand = p.next() match {
    case TVar(v) => OVar(v)
    case TNum(n) => ONum(n.toDouble)
    case TStr(s) => OStr(s)
    case t => p.fail(s"unexpected operand $t")
  }

  // ---------- Compiler ----------

  /** Full reference lifecycle over the ENCODED store (dictionary-encoded
    * long keys, the reference's execution model end-to-end,
    * `GraphulaStageGenerator.scala:33-131`): parse -> encode query
    * constants driver-side (sound under the store's collision
    * certificate) -> BGP-join on longs -> lazily decode only projected
    * variables from the term stream. Only the BGP subset (no
    * OPTIONAL/UNION over encoded ids here — those run on the string
    * store, where decode is a no-op).
    */
  def executeEncoded(spark: SparkSession, store: graft.store.StoreHandle,
                     queryText: String): DataFrame = {
    import graft.dict.Dictionary
    val q = parse(queryText)
    require(q.group.unions.isEmpty && q.group.optionals.isEmpty &&
      q.group.minuses.isEmpty && q.group.values.isEmpty && q.group.transitives.isEmpty &&
      !q.projection.exists(_.isInstanceOf[PAgg]),
      "executeEncoded supports the BGP+FILTER subset; use execute() for UNION/OPTIONAL/MINUS/VALUES/paths/aggregates")
    val consts = q.group.triples.flatMap(_.consts).map(_.toString).distinct
    // Constant encode must agree with how `store.enc` was encoded: pure
    // hashing is sound only under the collision certificate; a repaired
    // store carries escaped ids, so constants go through the repaired
    // dictionary instead (a driver-side point lookup, D2). A dictionary
    // miss means the constant matches nothing -> fail fast with an empty
    // result, no job (reference `GraphulaStageGenerator.scala:107-110`).
    val ids: Map[String, Long] =
      if (store.pureHash) Dictionary.hashLiterals(spark, consts)
      else Dictionary.lookup(store.dict, consts)
    val allVars = q.group.triples.flatMap(_.vars).distinct
    if (consts.exists(c => !ids.contains(c)))
      return emptyStringResult(spark,
        if (q.projection.isEmpty) allVars
        else q.projection.collect { case PVar(v) => v })
    val encPatterns = q.group.triples.map { tp =>
      def enc(t: Term): Term = t match {
        case C(v) => C(ids(v.toString))
        case v => v
      }
      TriplePattern(enc(tp.s), enc(tp.p), enc(tp.o))
    }
    val res = Bgp.compile(spark, store.enc, encPatterns, store.encStats, store.totalCnt)
      .localCheckpoint(true)
    val vars = res.columns.toSeq
    // lazy decode (reference `LazyBinding.scala:22-28`): semi-join the
    // INGEST-materialized dictionary down to the ids that appear in the
    // (small) result — cost ∝ dict scan + result size, never a re-scan of
    // the full triple store
    var df = Dictionary.decodeAll(res, store.dict, vars)
    q.group.filters.foreach(f => df = df.where(compileExpr(f)))
    val proj =
      if (q.projection.isEmpty) vars
      else q.projection.collect { case PVar(v) => v }
    df = df.select(proj.map(col): _*)
    if (q.distinct) df = df.distinct()
    if (q.orderBy.nonEmpty)
      df = df.orderBy(q.orderBy.map { case (v, asc) => if (asc) col(v).asc else col(v).desc }: _*)
    q.limit.foreach(n => df = df.limit(n))
    df
  }

  private def emptyStringResult(spark: SparkSession, vars: Seq[String]): DataFrame = {
    import org.apache.spark.sql.types._
    val schema = StructType(vars.map(v => StructField(v, StringType)))
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
  }

  def execute(spark: SparkSession, triples: DataFrame, queryText: String,
              stats: Map[String, PredStats] = Map.empty): DataFrame = {
    val q = parse(queryText)
    var df = compileGroup(spark, triples, q.group, stats)
    val allVars = df.columns.toSeq
    val aggs = q.projection.collect { case a: PAgg => a }
    if (aggs.nonEmpty) {
      // SPARQL aggregates: COUNT counts bound (non-null) solutions;
      // SUM/AVG apply the numeric cast (terms are stored as strings)
      val aggCols = aggs.map { a =>
        (a.fn match {
          case "COUNT" => count(a.arg.map(col).getOrElse(lit(1)))
          case "SUM" => sum(col(a.arg.get).cast("double"))
          case "MIN" => min(col(a.arg.get))
          case "MAX" => max(col(a.arg.get))
          case "AVG" => avg(col(a.arg.get).cast("double"))
        }).as(a.alias)
      }
      df = if (q.groupBy.nonEmpty)
        df.groupBy(q.groupBy.map(col): _*).agg(aggCols.head, aggCols.tail: _*)
      else df.agg(aggCols.head, aggCols.tail: _*)
      val names = q.projection.map { case PVar(v) => v; case PAgg(_, _, a) => a }
      df = df.select(names.map(col): _*)
    } else {
      val proj =
        if (q.projection.isEmpty) allVars
        else q.projection.map { case PVar(v) => v; case PAgg(_, _, a) => a }
      df = df.select(proj.map(col): _*)
    }
    if (q.distinct) df = df.distinct()
    if (q.orderBy.nonEmpty)
      df = df.orderBy(q.orderBy.map { case (v, asc) => if (asc) col(v).asc else col(v).desc }: _*)
    q.offset.foreach(n => df = df.offset(n))
    q.limit.foreach(n => df = df.limit(n))
    df
  }

  private def compileGroup(spark: SparkSession, triples: DataFrame, g: Group,
                           stats: Map[String, PredStats]): DataFrame = {
    var df: DataFrame =
      if (g.triples.nonEmpty) Bgp.compile(spark, triples, g.triples, stats) else null
    g.unions.foreach { case (l, r) =>
      val u = compileGroup(spark, triples, l, stats)
        .unionByName(compileGroup(spark, triples, r, stats), allowMissingColumns = true)
      df =
        if (df == null) u
        else {
          val shared = df.columns.intersect(u.columns).toSeq
          if (shared.isEmpty) df.crossJoin(u) else df.join(u, shared, "inner")
        }
    }
    g.optionals.foreach { opt =>
      val o = compileGroup(spark, triples, opt, stats)
      require(df != null, "OPTIONAL without a preceding pattern group")
      val shared = df.columns.intersect(o.columns).toSeq
      df = if (shared.isEmpty) df.crossJoin(o) else df.join(o, shared, "left")
    }
    // transitive paths: closure relation joined like a pattern scan
    g.transitives.foreach { case (sTerm, oTermPred, oTerm) =>
      val closure = transitiveClosure(triples, oTermPred)
      var scan = closure
      sTerm match { case C(v) => scan = scan.where(col("s") === lit(v)); case _ => }
      oTerm match { case C(v) => scan = scan.where(col("o") === lit(v)); case _ => }
      if (sTerm.isInstanceOf[V] && sTerm == oTerm)
        scan = scan.where(col("s") === col("o"))
      val proj = Seq(sTerm -> "s", oTerm -> "o")
        .collect { case (V(n), c) => n -> c }.distinct
      val scanP =
        if (proj.isEmpty) scan.select(lit(1).as("__c"))
        else scan.select(proj.map { case (n, c) => col(c).as(n) }: _*)
      df =
        if (df == null) scanP
        else {
          val shared = df.columns.intersect(scanP.columns).toSeq
          if (shared.isEmpty) df.crossJoin(scanP) else df.join(scanP, shared, "inner")
        }
    }
    // MINUS: remove solutions matching the inner group on shared vars
    g.minuses.foreach { m =>
      val neg = compileGroup(spark, triples, m, stats)
      require(df != null, "MINUS without a preceding pattern group")
      val shared = df.columns.intersect(neg.columns).toSeq
      // SPARQL MINUS with no shared vars removes nothing
      if (shared.nonEmpty) df = df.join(neg, shared, "left_anti")
    }
    // VALUES: inline binding relation joined in (constrains or extends)
    g.values.foreach { case (v, vals) =>
      import spark.implicits._
      val vdf = vals.toDF(v)
      require(df != null, "VALUES without a preceding pattern group")
      df = if (df.columns.contains(v)) df.join(vdf, Seq(v), "inner")
      else df.crossJoin(vdf)
    }
    require(df != null, "empty group pattern")
    g.filters.foreach(f => df = df.where(compileExpr(f)))
    df
  }

  /** One-or-more-step reachability over a single predicate (`p+`):
    * path-doubling expansion with eager checkpoints — joining the closure
    * with ITSELF each round squares the reachable path length, so `r`
    * rounds cover diameter 2^r and the 60-round safety bound can only trip
    * on a non-converging plan bug, never on a deep-but-finite hierarchy.
    * Runs until a fixpoint (size stops growing); throws instead of
    * silently truncating.
    */
  private def transitiveClosure(triples: DataFrame, pred: String): DataFrame = {
    val edges = triples.where(col("p") === pred)
      .select(col("s"), col("o")).distinct().localCheckpoint(true)
    var closure = edges
    var size = closure.count()
    var prev = -1L
    var iter = 0
    while (size != prev) {
      if (iter >= 60)
        throw new IllegalStateException(
          s"transitive closure over '$pred' did not converge after $iter doubling rounds")
      prev = size
      val next = closure.as("l").join(closure.as("r"), col("l.o") === col("r.s"))
        .select(col("l.s").as("s"), col("r.o").as("o"))
      closure = closure.unionByName(next).distinct().localCheckpoint(true)
      size = closure.count()
      iter += 1
    }
    closure
  }

  private def compileExpr(e: Expr): Column = e match {
    case And(l, r) => compileExpr(l) && compileExpr(r)
    case Or(l, r) => compileExpr(l) || compileExpr(r)
    case Not(x) => !compileExpr(x)
    case Regex(v, re) => col(v).rlike(re)
    case Cmp(l, op, r) =>
      // numeric literal on either side -> numeric comparison (terms are
      // stored as strings; the reference's decode-time type heuristic,
      // Transformations.scala:27-75, becomes an explicit cast here)
      val numeric = Seq(l, r).exists(_.isInstanceOf[ONum])
      def operand(o: Operand): Column = o match {
        case OVar(v) => if (numeric) col(v).cast("double") else col(v)
        case ONum(n) => lit(n)
        case OStr(s) => lit(s)
      }
      val (lc, rc) = (operand(l), operand(r))
      op match {
        case "=" => lc === rc
        case "!=" => lc =!= rc
        case "<" => lc < rc
        case "<=" => lc <= rc
        case ">" => lc > rc
        case ">=" => lc >= rc
      }
  }
}
