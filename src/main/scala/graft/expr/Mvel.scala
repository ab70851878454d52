package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.expr

/**
 * MVEL-subset → Catalyst translator.
 *
 * The reference's entire user-expression surface is MVEL strings over
 * `row.<col>` references, used by FieldValueFilter predicates
 * (reference: implementation/FieldValueFilter.java:35-89) and calculated
 * columns (implementation/DefaultMigratorPlugin.java:137-173). Column
 * dependencies are extracted there with the regex
 * `row\.(?<columnName>[a-zA-Z0-9_]*)`
 * (util/CassandraSchemaUtil.java:26-28). We translate the practically-used
 * subset (comparisons, boolean algebra, arithmetic, a few method calls) to a
 * Spark SQL expression string — so the predicate lands in Catalyst, gets
 * pushed down / codegen'd, and never runs row-at-a-time.
 *
 * Expression subset:
 *   - `row.col` column refs (prefix stripped, like FieldValueFilter.java:60-62)
 *   - `&&  ||  !` → `AND OR NOT`; `==` → `=`; `!=` stays
 *   - arithmetic `+ - * / %`, parens, numeric/string/bool literals
 *   - `x.hashCode()` → `java_hash_code(x)` (JVM-exact, codegen'd —
 *     see [[graft.functions.JavaHashCode]])
 *   - `x.length()` / `x.isEmpty()` → `java_str_len(x)` (JVM-exact UTF-16
 *     units); `x.startsWith(y)` / `x.endsWith(y)` / `x.contains(y)` →
 *     `startswith/endswith/contains` — these are the predicates that make
 *     filter PUSHDOWN work (an interpreter-fallback UDF never reaches the
 *     scan; `startswith` on a key column prunes parquet row groups)
 *   - `x.substring(a[, b])` / `x.indexOf(y)` → `java_substring` /
 *     `java_index_of` kernels — JVM UTF-16 index semantics exactly,
 *     including the out-of-range exception and indexOf's −1 (SQL
 *     `substring`'s 1-based clamping would silently disagree)
 *   - `abs(...)`, ternary `c ? a : b` → `IF(c, a, b)`
 *   - `(short)/(int)/(long)/(byte)/(double)/(float)` casts → SQL CAST,
 *     binding to the next primary term only (Java precedence: `(short)x % 32`
 *     is `((short)x) % 32`)
 * Statement subset (multi-statement scripts like the reference's
 * config/migration-config.example.yaml:112-120): straight-line
 * `var x = e;` / `x = e;` / `x op= e;` / `if (c) { x = e; }` /
 * `return e;` sequences, normalized by inline substitution into a single
 * expression. Anything outside both subsets throws at plan time
 * (fail-fast, matching the reference's unsupported-type contract).
 */
object MvelTranslator {

  final case class UnsupportedMvel(msg: String) extends RuntimeException(msg)

  private val ColRef = """row\.([a-zA-Z0-9_]+)""".r
  private val HashCall = """([a-zA-Z0-9_]+)\.hashCode\(\)""".r
  private val CastRe = """\((short|int|long|byte|float|double)\)\s*""".r
  // string-method fast paths with JVM-identical semantics (the args regex
  // admits identifiers / masked literals only — nested calls fall back to
  // the interpreter). startsWith/endsWith/contains are byte-equivalent
  // between UTF-16 and UTF-8 (prefix-preserving, self-synchronizing);
  // length() routes through the JVM-exact java_str_len kernel (UTF-16
  // units, not code points).
  private val LenCall = """([a-zA-Z0-9_]+)\.length\(\)""".r
  private val EmptyCall = """([a-zA-Z0-9_]+)\.isEmpty\(\)""".r
  private val StartsCall = """([a-zA-Z0-9_]+)\.startsWith\(([a-zA-Z0-9_]+)\)""".r
  private val EndsCall = """([a-zA-Z0-9_]+)\.endsWith\(([a-zA-Z0-9_]+)\)""".r
  private val ContainsCall = """([a-zA-Z0-9_]+)\.contains\(([a-zA-Z0-9_]+)\)""".r
  private val SubRangeCall =
    """([a-zA-Z0-9_]+)\.substring\(([a-zA-Z0-9_]+)\s*,\s*([a-zA-Z0-9_]+)\)""".r
  private val SubFromCall = """([a-zA-Z0-9_]+)\.substring\(([a-zA-Z0-9_]+)\)""".r
  private val IndexOfCall = """([a-zA-Z0-9_]+)\.indexOf\(([a-zA-Z0-9_]+)\)""".r

  /** Column names referenced as `row.x` — mirrors
    * CassandraSchemaUtil.findRowColumnReferencesInString (:58-65).
    */
  def referencedColumns(mvel: String): Seq[String] =
    ColRef.findAllMatchIn(mvel).map(_.group(1)).toSeq.distinct

  private val castType = Map(
    "short" -> "SMALLINT", "int" -> "INT", "long" -> "BIGINT",
    "byte" -> "TINYINT", "float" -> "FLOAT", "double" -> "DOUBLE")

  /** Translate an MVEL-subset expression or straight-line script into a
    * Spark SQL expression string. String literals are masked before any
    * rewriting, so operator translation (`&&` → AND, `row.` stripping, …)
    * can never mutate quoted values like `'a&&b'` or `'see row.id'`.
    *
    * Without a schema every identifier receiver is assumed STRING — the
    * schema-aware overload (used by [[toColumnFor]]) gates the
    * string-method rewrites on the receiver's actual type, so
    * `row.tags.contains('x')` over an `array` column routes to the
    * interpreter (which has collection semantics) instead of translating
    * to `contains(tags, 'x')` and failing at analysis (ADVICE r6).
    */
  def toSql(mvel: String): String = toSql(mvel, None)

  def toSql(mvel: String, schema: Option[org.apache.spark.sql.types.StructType]): String = {
    val isStringy: String => Boolean = schema match {
      case None => _ => true
      case Some(st) => ident =>
        ident.startsWith("__GRAFT_STR_") ||
          // case-insensitive like Spark's default resolver: a
          // case-mismatched reference must hit the same gate the
          // analyzer-resolved column would
          (st.fields.find(_.name.equalsIgnoreCase(ident)) match {
            case Some(f) => f.dataType == org.apache.spark.sql.types.StringType
            // not a column: a masked literal handled above, a numeric, or a
            // genuinely unknown name — keep today's behavior (translate;
            // analysis surfaces real errors instead of the interpreter
            // hiding them behind a runtime NPE)
            case None => true
          })
    }
    val (masked, literals) = maskStrings(mvel)
    val single = normalizeScript(masked)
    unmask(translateExpression(single, isStringy), literals)
  }

  /** Replace quoted literals with identifier-shaped placeholders. */
  private def maskStrings(s: String): (String, Vector[String]) = {
    val out = new StringBuilder
    val lits = Vector.newBuilder[String]
    var i = 0
    var n = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\'' || c == '"') {
        // find the close, consuming backslash escapes pairwise (so a
        // literal ending in an escaped backslash still terminates)
        var j = i + 1
        var closed = false
        while (j < s.length && !closed) {
          val cj = s.charAt(j)
          if (cj == '\\') j += 2
          else if (cj == c) closed = true
          else j += 1
        }
        if (!closed || j >= s.length)
          throw UnsupportedMvel(s"unterminated string literal in '$s'")
        lits += s.substring(i, j + 1)
        out ++= s"__GRAFT_STR_${n}__"
        n += 1
        i = j + 1
      } else { out += c; i += 1 }
    }
    (out.result(), lits.result())
  }

  private def unmask(s: String, lits: Vector[String]): String =
    lits.zipWithIndex.foldLeft(s) { case (acc, (lit, idx)) =>
      acc.replace(s"__GRAFT_STR_${idx}__", lit)
    }

  /** Collapse a straight-line MVEL script into one expression via inline
    * substitution. Mirrors the semantics (not the mechanics) of the
    * reference's compiled-MVEL evaluation
    * (DefaultMigratorPlugin.java:367-387). Supported statements:
    * declarations, re-assignments, compound assignment (`%=` etc.),
    * single-variable `if (c) { v = e; }`, and a final bare/`return`
    * expression.
    */
  private def normalizeScript(script: String): String = {
    // Split on ';' not inside quotes/parens.
    val stmts = splitStatements(script).map(_.trim).filter(_.nonEmpty)
    if (stmts.isEmpty) throw UnsupportedMvel(s"empty MVEL script: '$script'")
    if (stmts.length == 1 && !stmts.head.startsWith("return ") &&
        !stmts.head.matches(
          """(?s)^(?:var|int|long|short|byte|float|double|boolean|String)\s.*""")) {
      return stmts.head // plain single expression
    }
    var env = Map.empty[String, String] // var name -> substituted expression
    def subst(e: String): String = {
      // replace known vars (longest name first to avoid prefix clashes)
      var out = e
      env.keys.toSeq.sortBy(-_.length).foreach { v =>
        // (?<!\.) keeps `row.value` intact when a local is named `value`
        out = out.replaceAll(s"""(?<!\\.)\\b$v\\b(?!\\s*\\()""", s"(${env(v)})")
      }
      out
    }
    val VarDecl =
      """(?s)^(?:var|int|long|short|byte|float|double|boolean|String)\s+([a-zA-Z_][a-zA-Z0-9_]*)\s*=\s*(.*)$""".r
    val Compound = """(?s)^([a-zA-Z_][a-zA-Z0-9_]*)\s*([+\-*/%])=\s*(.*)$""".r
    val Assign = """(?s)^([a-zA-Z_][a-zA-Z0-9_]*)\s*=([^=].*)$""".r
    val IfAssign =
      """(?s)^if\s*\((.*)\)\s*\{\s*([a-zA-Z_][a-zA-Z0-9_]*)\s*(?:([+\-*/%])\s*)?=\s*([^=;{}][^;{}]*);?\s*\}$""".r
    val Return = """(?s)^return\s+(.*)$""".r

    var result: Option[String] = None
    stmts.foreach {
      case _ if result.isDefined =>
        throw UnsupportedMvel(s"statements after return in MVEL script: '$script'")
      case VarDecl(name, e) => env += name -> subst(e)
      case Compound(name, op, e) if env.contains(name) =>
        env += name -> s"(${env(name)}) $op (${subst(e)})"
      case IfAssign(cond, name, op, e) if env.contains(name) =>
        val thenExpr =
          if (op == null) subst(e)
          else s"(${env(name)}) $op (${subst(e)})" // `if (c) { v *= e; }`
        env += name -> s"IF(${subst(cond)}, $thenExpr, ${env(name)})"
      case Return(e) => result = Some(subst(e))
      case Assign(name, e) => env += name -> subst(e) // first use declares (MVEL-style)
      case other =>
        throw UnsupportedMvel(
          s"unsupported MVEL statement '$other' (supported: var/assign/compound-assign/if-assign/return)")
    }
    result.getOrElse(
      throw UnsupportedMvel(s"multi-statement MVEL script has no return: '$script'"))
  }

  /** Split on top-level ';' (outside quotes, parens and braces — `if {...}`
    * blocks keep their inner ';' with the block) and after a top-level
    * closing '}' (Java statements need no ';' after a block).
    */
  private def splitStatements(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var depthPar = 0
    var depthBrace = 0
    var inStr: Char = 0
    s.foreach { ch =>
      if (inStr != 0) { cur += ch; if (ch == inStr) inStr = 0 }
      else ch match {
        case '\'' | '"' => inStr = ch; cur += ch
        case '(' => depthPar += 1; cur += ch
        case ')' => depthPar -= 1; cur += ch
        case '{' => depthBrace += 1; cur += ch
        case '}' =>
          depthBrace -= 1; cur += ch
          if (depthPar == 0 && depthBrace == 0) { out += cur.result(); cur.clear() }
        case ';' if depthPar == 0 && depthBrace == 0 => out += cur.result(); cur.clear()
        case _ => cur += ch
      }
    }
    out += cur.result()
    out.result()
  }

  /** Single-expression translation (no statements). `isStringy` gates the
    * string-method rewrites on the receiver (and, for predicates, the
    * argument): a non-string receiver keeps its method-call syntax, which
    * the residual check below rejects — routing the expression to the
    * interpreter, whose collection semantics are correct for it.
    */
  private def translateExpression(
      mvelExpr: String, isStringy: String => Boolean): String = {
    var s = mvelExpr.trim.stripSuffix(";").trim
    if (s.startsWith("return ")) s = s.drop(7).trim
    // `row.x` → `x` (FieldValueFilter.java:60-62 strips the same prefix)
    s = ColRef.replaceAllIn(s, m => m.group(1))
    // method-call mappings (keep = leave the match untranslated so the
    // residual check throws and the interpreter takes over)
    def keep(m: scala.util.matching.Regex.Match): String =
      scala.util.matching.Regex.quoteReplacement(m.matched)
    // java_hash_code is a STRING kernel (UTF8String.toString.hashCode) —
    // an int/array receiver must route to the interpreter, whose
    // `t.hashCode()` is JVM-exact for every type
    s = HashCall.replaceAllIn(s, m =>
      if (isStringy(m.group(1))) s"java_hash_code(${m.group(1)})" else keep(m))
    s = LenCall.replaceAllIn(s, m =>
      if (isStringy(m.group(1))) s"java_str_len(${m.group(1)})" else keep(m))
    s = EmptyCall.replaceAllIn(s, m =>
      if (isStringy(m.group(1))) s"(java_str_len(${m.group(1)}) = 0)" else keep(m))
    s = StartsCall.replaceAllIn(s, m =>
      if (isStringy(m.group(1)) && isStringy(m.group(2)))
        s"startswith(${m.group(1)}, ${m.group(2)})" else keep(m))
    s = EndsCall.replaceAllIn(s, m =>
      if (isStringy(m.group(1)) && isStringy(m.group(2)))
        s"endswith(${m.group(1)}, ${m.group(2)})" else keep(m))
    s = ContainsCall.replaceAllIn(s, m =>
      if (isStringy(m.group(1)) && isStringy(m.group(2)))
        s"contains(${m.group(1)}, ${m.group(2)})" else keep(m))
    s = SubRangeCall.replaceAllIn(s, m =>
      if (isStringy(m.group(1)))
        s"java_substring(${m.group(1)}, ${m.group(2)}, ${m.group(3)})" else keep(m))
    s = SubFromCall.replaceAllIn(s, m =>
      if (isStringy(m.group(1)))
        s"java_substring(${m.group(1)}, ${m.group(2)})" else keep(m))
    s = IndexOfCall.replaceAllIn(s, m =>
      if (isStringy(m.group(1)) && isStringy(m.group(2)))
        s"java_index_of(${m.group(1)}, ${m.group(2)})" else keep(m))
    // java casts → SQL cast over the next primary term (Java precedence)
    s = rewriteCasts(s)
    // ternary → IF: precedence-aware (top-level '?' with its matching ':',
    // recursing into parenthesized groups — so an EMBEDDED ternary like
    // `x + (c > 0 ? 1 : 2)` rewrites correctly instead of producing
    // malformed SQL, ADVICE r2)
    s = rewriteTernaries(s)
    // residual method calls (`x.endsWith(…)`, `Math.abs(…)`) parse as
    // qualified SQL routines and only fail at ANALYSIS time — far past the
    // fallback's reach. Fail fast here so [[toColumnFor]] can route the
    // expression to the interpreter instead.
    val resid = """[a-zA-Z0-9_]\.\s*[a-zA-Z_][a-zA-Z0-9_]*\s*\(""".r
    resid.findFirstIn(s).foreach { m =>
      throw UnsupportedMvel(
        s"method call '$m…' outside the translator subset (interpreter fallback applies)")
    }
    // boolean algebra / equality
    s = s.replace("&&", " AND ").replace("||", " OR ")
    s = s.replaceAll("""!=""", "<#NEQ#>")
      .replaceAll("""==""", " = ")
      .replace("<#NEQ#>", " != ")
      .replaceAll("""!\s*\(""", " NOT (")
    collapseSpaces(s)
  }

  /** Collapse runs of whitespace to one space — but never inside quoted
    * string literals.
    */
  private def collapseSpaces(s: String): String = {
    val out = new StringBuilder
    var inStr: Char = 0
    var pendingSpace = false
    s.trim.foreach { ch =>
      if (inStr != 0) { out += ch; if (ch == inStr) inStr = 0 }
      else if (ch == '\'' || ch == '"') {
        if (pendingSpace) { out += ' '; pendingSpace = false }
        inStr = ch; out += ch
      } else if (ch.isWhitespace) pendingSpace = true
      else {
        if (pendingSpace) { out += ' '; pendingSpace = false }
        out += ch
      }
    }
    out.result()
  }

  /** Rewrite every ternary to IF(c, a, b), honoring precedence: the ternary
    * is the lowest-precedence right-associative operator, so a top-level
    * `?` splits (condition)?(then):(else) with the matching `:` found by
    * tracking nested `?` depth; parenthesized groups rewrite recursively.
    * Runs after string masking, so `?`/`:` inside literals can't confuse it.
    */
  private def rewriteTernaries(s: String): String = {
    var depth = 0
    var q = -1
    var i = 0
    while (i < s.length && q < 0) {
      s.charAt(i) match {
        case '(' => depth += 1
        case ')' => depth -= 1
        case '?' if depth == 0 => q = i
        case _ =>
      }
      i += 1
    }
    if (q < 0) return rewriteTernaryGroups(s)
    // find the ':' matching THIS '?': nested ternaries in the then-branch
    // push/pop; parens shield their contents
    var pending = 0
    depth = 0
    i = q + 1
    var colon = -1
    while (i < s.length && colon < 0) {
      s.charAt(i) match {
        case '(' => depth += 1
        case ')' => depth -= 1
        case '?' if depth == 0 => pending += 1
        case ':' if depth == 0 =>
          if (pending == 0) colon = i else pending -= 1
        case _ =>
      }
      i += 1
    }
    if (colon < 0)
      throw UnsupportedMvel(s"ternary '?' without matching ':' in '$s'")
    val cond = rewriteTernaries(s.substring(0, q))
    val thenE = rewriteTernaries(s.substring(q + 1, colon))
    val elseE = rewriteTernaries(s.substring(colon + 1)) // right-assoc tail
    s"IF(${cond.trim}, ${thenE.trim}, ${elseE.trim})"
  }

  /** No top-level ternary: recurse into each parenthesized group. */
  private def rewriteTernaryGroups(s: String): String = {
    if (!s.contains('?')) return s
    val out = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '(') {
        var depth = 0
        var j = i
        var end = -1
        while (j < s.length && end < 0) {
          s.charAt(j) match {
            case '(' => depth += 1
            case ')' => depth -= 1; if (depth == 0) end = j
            case _ =>
          }
          j += 1
        }
        if (end < 0) throw UnsupportedMvel(s"unbalanced parens in '$s'")
        out += '('
        out ++= rewriteTernaries(s.substring(i + 1, end))
        out += ')'
        i = end + 1
      } else { out += c; i += 1 }
    }
    out.result()
  }

  /** `(short) x % 32` → `CAST(x AS SMALLINT) % 32`: the cast binds to the
    * immediately-following primary term only, matching Java/MVEL precedence
    * (ADVICE r1). `(short)(x % 32)` casts the parenthesized group.
    */
  private def rewriteCasts(s: String): String =
    CastRe.findFirstMatchIn(s) match {
      case Some(m) =>
        val rest = s.substring(m.end)
        val (term, tail) = takePrimary(rest)
        s"${s.substring(0, m.start)}CAST(${term.trim} AS ${castType(m.group(1))})" +
          rewriteCasts(tail)
      case None => s
    }

  /** Take the next primary term: a parenthesized group, a function call, or
    * an identifier/number (with unary minus).
    */
  private def takePrimary(s0: String): (String, String) = {
    val s = s0
    var i = 0
    while (i < s.length && s.charAt(i).isWhitespace) i += 1
    val start = i
    if (i < s.length && (s.charAt(i) == '-' || s.charAt(i) == '+')) i += 1
    // identifier / function-name part
    while (i < s.length && (s.charAt(i).isLetterOrDigit || s.charAt(i) == '_' || s.charAt(i) == '.')) i += 1
    // optional call args or a bare parenthesized group
    if (i < s.length && s.charAt(i) == '(') {
      var depth = 0
      while (i < s.length) {
        val c = s.charAt(i)
        if (c == '(') depth += 1
        else if (c == ')') { depth -= 1; if (depth == 0) { i += 1
          return (s.substring(start, i), s.substring(i)) } }
        i += 1
      }
      throw UnsupportedMvel(s"unbalanced parens after cast in '$s0'")
    }
    if (i == start) throw UnsupportedMvel(s"cast applies to nothing in '$s0'")
    (s.substring(start, i), s.substring(i))
  }

  /** Translate to a Column ready for `df.filter` / `df.withColumn`. */
  def toColumn(mvel: String): Column = expr(toSql(mvel))

  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Translate with interpreter fallback: the Catalyst translation is the
    * fast path (codegen, pushdown); an expression outside the subset —
    * loops, method calls, mutation-heavy scripts, string methods over
    * NON-string columns (the schema gates the rewrites) — falls back to
    * [[MvelInterp]]'s row-interpreting UDF with JVM-exact semantics, and
    * the de-optimization is logged (the reference compiles arbitrary MVEL,
    * DefaultMigratorPlugin.java:367-387 — generality must not be a plan
    * error).
    *
    * NULL-receiver divergence (documented contract, ADVICE r6): translated
    * predicates follow SQL three-valued logic — `row.name.startsWith('x')`
    * with a null `name` is NULL, and a filter DROPS the row — while the
    * interpreter (like MVEL itself, and like the reference executing the
    * same expression) throws an NPE that surfaces through row-level error
    * handling. Null-hostile datasets that need reference-exact error
    * accounting should pre-filter nulls explicitly (`row.name != null &&
    * …`, which both paths honor identically); the translated behavior is
    * kept because wrapping every receiver in a null check would break
    * predicate pushdown — the fast path's reason to exist.
    */
  def toColumnFor(mvel: String, schema: org.apache.spark.sql.types.StructType): Column =
    try expr(toSql(mvel, Some(schema)))
    catch {
      case reason @ (_: UnsupportedMvel | _: org.apache.spark.sql.catalyst.parser.ParseException) =>
        val c = MvelInterp.toColumn(mvel, schema)
        log.warn(
          s"MVEL expression falls back to interpreted UDF (no pushdown/codegen " +
            s"for this expression): '${mvel.linesIterator.mkString(" ").take(120)}' " +
            s"(${reason.getClass.getSimpleName})")
        c
    }
}
