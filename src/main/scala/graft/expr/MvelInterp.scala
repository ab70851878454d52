package graft.expr

import org.apache.spark.sql.{Column, Row}
import org.apache.spark.sql.api.java.UDF1
import org.apache.spark.sql.functions.{col, struct, udf}
import org.apache.spark.sql.types._

/**
 * Interpreted-MVEL fallback for expressions outside the Catalyst
 * translator's subset (loops, method calls, mutation-heavy scripts).
 *
 * The reference compiles arbitrary MVEL and evaluates it per row
 * (reference: DefaultMigratorPlugin.java:367-387); the translator
 * ([[MvelTranslator]]) covers the practically-used subset as pure Catalyst
 * expressions — codegen'd, pushdown-friendly, the fast path. When
 * translation throws [[MvelTranslator.UnsupportedMvel]], this interpreter
 * takes over: a tokenizer + recursive-descent parser + evaluator with JVM
 * numeric semantics (int division, 32-bit wraparound, String '+' concat),
 * packaged as a Scala UDF over a struct of the referenced columns.
 *
 * This is a DELIBERATE de-optimization (the caller logs it): a black-box
 * UDF blocks predicate pushdown and whole-stage codegen for the expression,
 * but row throughput is still executor-parallel and the rest of the plan
 * is unaffected. Exactly the posture SURVEY §2 promised for O4/O9
 * generality.
 *
 * Statement surface: `var`/typed declarations, assignment and compound
 * assignment, `if`/`else`, `while`, classic `for(;;)`, postfix `++`/`--`,
 * blocks, `return`. Expression surface: ternary, boolean algebra,
 * comparisons, Java arithmetic, String methods (length/substring/indexOf/
 * toUpperCase/toLowerCase/trim/contains/startsWith/endsWith/replace/
 * charAt/isEmpty/equals/concat/matches/hashCode), Math.* and abs/min/max,
 * Integer/Long/Double.parse*, String.valueOf. Collection columns (CQL
 * list/set/map arrive as Spark array/map — reference
 * CassandraSchemaUtil.java:170-179): subscripts `xs[i]` / `m['k']` with
 * ANSI-SQL/JVM semantics (array OOB throws, missing map key is null, both
 * matching the translator's SQL passthrough), and size/isEmpty/contains/
 * indexOf/get/containsKey/containsValue. Nulls propagate through
 * arithmetic and method calls (a per-row NPE would fail the whole task;
 * CQL-shaped data is sparse by design).
 */
object MvelInterp {

  import MvelTranslator.UnsupportedMvel

  /** Hard cap on loop iterations per row — an accidental `while(true)`
    * must fail the row loudly, not hang an executor core.
    */
  private val MaxLoopIters = 1000000

  // ----------------------------------------------------------------- AST

  sealed trait Expr
  final case class NumLit(v: Any) extends Expr // Integer | Long | Float | Double
  final case class StrLit(v: String) extends Expr
  final case class BoolLit(v: Boolean) extends Expr
  case object NullLit extends Expr
  final case class ColRef(name: String) extends Expr
  final case class VarRef(name: String) extends Expr
  final case class Un(op: String, e: Expr) extends Expr
  final case class Bin(op: String, l: Expr, r: Expr) extends Expr
  final case class Tern(c: Expr, t: Expr, f: Expr) extends Expr
  final case class Method(target: Expr, name: String, args: List[Expr]) extends Expr
  final case class Index(target: Expr, key: Expr) extends Expr
  final case class Fun(name: String, args: List[Expr]) extends Expr
  final case class CastE(tpe: String, e: Expr) extends Expr

  sealed trait Stmt
  final case class Decl(name: String, e: Option[Expr]) extends Stmt
  final case class Assign(name: String, op: Option[String], e: Expr) extends Stmt
  final case class IncDec(name: String, op: String) extends Stmt
  final case class If(c: Expr, t: List[Stmt], f: List[Stmt]) extends Stmt
  final case class While(c: Expr, body: List[Stmt]) extends Stmt
  final case class For(init: Option[Stmt], c: Option[Expr], upd: Option[Stmt],
      body: List[Stmt]) extends Stmt
  final case class Return(e: Expr) extends Stmt
  final case class ExprStmt(e: Expr) extends Stmt

  // ------------------------------------------------------------ tokenizer

  private final case class Tok(kind: String, text: String)

  private def tokenize(s: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (c.isWhitespace) i += 1
      else if (c == '\'' || c == '"') {
        val sb = new StringBuilder
        var j = i + 1
        var closed = false
        while (j < n && !closed) {
          val cj = s.charAt(j)
          if (cj == '\\' && j + 1 < n) {
            sb += (s.charAt(j + 1) match {
              case 'n' => '\n'; case 't' => '\t'; case 'r' => '\r'
              case other => other
            })
            j += 2
          } else if (cj == c) { closed = true; j += 1 }
          else { sb += cj; j += 1 }
        }
        if (!closed) throw UnsupportedMvel(s"unterminated string in '$s'")
        out += Tok("str", sb.result()); i = j
      } else if (c.isDigit || (c == '.' && i + 1 < n && s.charAt(i + 1).isDigit)) {
        var j = i
        var isFloat = false
        while (j < n && (s.charAt(j).isDigit || s.charAt(j) == '.')) {
          if (s.charAt(j) == '.') isFloat = true
          j += 1
        }
        var text = s.substring(i, j)
        if (j < n && "lLfFdD".indexOf(s.charAt(j)) >= 0) {
          text += s.charAt(j).toLower; j += 1
        }
        if (isFloat && !text.exists(c => "lfd".contains(c))) () // plain double
        out += Tok("num", text)
        i = j
      } else if (c.isLetter || c == '_' || c == '$') {
        var j = i
        while (j < n && (s.charAt(j).isLetterOrDigit || s.charAt(j) == '_' || s.charAt(j) == '$')) j += 1
        out += Tok("id", s.substring(i, j)); i = j
      } else {
        val two = if (i + 1 < n) s.substring(i, i + 2) else ""
        if (Set("&&", "||", "==", "!=", "<=", ">=", "++", "--",
            "+=", "-=", "*=", "/=", "%=").contains(two)) {
          out += Tok("op", two); i += 2
        } else {
          out += Tok("op", c.toString); i += 1
        }
      }
    }
    out.result()
  }

  // -------------------------------------------------------------- parser

  private final class Parser(toks: Vector[Tok], src: String) {
    private var p = 0
    private def peek: Tok = if (p < toks.length) toks(p) else Tok("eof", "")
    private def peek2: Tok = if (p + 1 < toks.length) toks(p + 1) else Tok("eof", "")
    private def next(): Tok = { val t = peek; p += 1; t }
    private def expect(text: String): Unit = {
      val t = next()
      if (t.text != text) throw UnsupportedMvel(
        s"expected '$text' but found '${t.text}' in MVEL '$src'")
    }
    private def at(text: String): Boolean = peek.text == text
    private def eat(text: String): Boolean = { if (at(text)) { p += 1; true } else false }

    private val declTypes = Set("var", "int", "long", "short", "byte",
      "float", "double", "boolean", "String", "char")

    def script(): List[Stmt] = {
      val out = List.newBuilder[Stmt]
      while (peek.kind != "eof") {
        out += statement()
        while (eat(";")) ()
      }
      val stmts = out.result()
      if (stmts.isEmpty) throw UnsupportedMvel(s"empty MVEL script: '$src'")
      stmts
    }

    private def block(): List[Stmt] =
      if (eat("{")) {
        val out = List.newBuilder[Stmt]
        while (!at("}")) {
          if (peek.kind == "eof") throw UnsupportedMvel(s"unclosed block in '$src'")
          out += statement()
          while (eat(";")) ()
        }
        expect("}")
        out.result()
      } else {
        val s = statement(); eat(";"); List(s)
      }

    private def statement(): Stmt = {
      if (peek.kind == "id" && declTypes.contains(peek.text) && peek2.kind == "id") {
        next() // type token — dynamic typing, the initializer decides
        val name = next().text
        val init = if (eat("=")) Some(expression()) else None
        Decl(name, init)
      } else if (at("if")) {
        next(); expect("(")
        val c = expression(); expect(")")
        val t = block()
        val f = if (eat("else")) block() else Nil
        If(c, t, f)
      } else if (at("while")) {
        next(); expect("(")
        val c = expression(); expect(")")
        While(c, block())
      } else if (at("for")) {
        next(); expect("(")
        val init = if (at(";")) None else Some(statement())
        expect(";")
        val cond = if (at(";")) None else Some(expression())
        expect(";")
        val upd = if (at(")")) None else Some(statement())
        expect(")")
        For(init, cond, upd, block())
      } else if (at("return")) {
        next(); Return(expression())
      } else if (peek.kind == "id" && peek2.kind == "op" &&
          Set("=", "+=", "-=", "*=", "/=", "%=").contains(peek2.text) &&
          peek.text != "row") {
        val name = next().text
        val op = next().text
        val e = expression()
        if (op == "=") Assign(name, None, e) else Assign(name, Some(op.take(1)), e)
      } else if (peek.kind == "id" && peek2.kind == "op" &&
          (peek2.text == "++" || peek2.text == "--") && peek.text != "row") {
        val name = next().text
        val op = next().text
        IncDec(name, op)
      } else ExprStmt(expression())
    }

    def expression(): Expr = ternary()

    private def ternary(): Expr = {
      val c = or()
      if (eat("?")) {
        val t = expression()
        expect(":")
        val f = ternary() // right-associative
        Tern(c, t, f)
      } else c
    }
    private def or(): Expr = {
      var l = and()
      while (at("||")) { next(); l = Bin("||", l, and()) }
      l
    }
    private def and(): Expr = {
      var l = eqx()
      while (at("&&")) { next(); l = Bin("&&", l, eqx()) }
      l
    }
    private def eqx(): Expr = {
      var l = rel()
      while (at("==") || at("!=")) { val op = next().text; l = Bin(op, l, rel()) }
      l
    }
    private def rel(): Expr = {
      var l = add()
      while (at("<") || at(">") || at("<=") || at(">=")) {
        val op = next().text; l = Bin(op, l, add())
      }
      l
    }
    private def add(): Expr = {
      var l = mul()
      while (at("+") || at("-")) { val op = next().text; l = Bin(op, l, mul()) }
      l
    }
    private def mul(): Expr = {
      var l = unary()
      while (at("*") || at("/") || at("%")) { val op = next().text; l = Bin(op, l, unary()) }
      l
    }
    private val castTypes = Set("short", "int", "long", "byte", "float", "double")
    private def unary(): Expr = {
      if (at("!")) { next(); Un("!", unary()) }
      else if (at("-")) { next(); Un("-", unary()) }
      else if (at("+")) { next(); unary() }
      else if (at("(") && peek2.kind == "id" && castTypes.contains(peek2.text) &&
          p + 2 < toks.length && toks(p + 2).text == ")") {
        next(); val tpe = next().text; next()
        CastE(tpe, unary())
      } else postfix()
    }

    private def postfix(): Expr = {
      var e = primary()
      while (at(".") || at("[")) {
        if (eat("[")) {
          // list / map subscript: `row.tags[0]`, `row.attrs['k']` — the
          // SAME spelling the translator passes through as Spark SQL
          // element access, so both paths accept it
          val k = expression()
          expect("]")
          e = Index(e, k)
        } else {
        next()
        val name = next()
        if (name.kind != "id") throw UnsupportedMvel(
          s"expected member name after '.' in '$src'")
        if (eat("(")) {
          val args = callArgs()
          e = e match {
            // static namespace call (Math.abs, Integer.parseInt, …), not a
            // method on a value
            case VarRef(ns @ ("Math" | "Integer" | "Long" | "Double" | "String")) =>
              Fun(s"$ns.${name.text}", args)
            case _ => Method(e, name.text, args)
          }
        } else e match {
          // bare `row.colname`
          case VarRef("row") => e = ColRef(name.text)
          case VarRef(ns) => e = VarRef(s"$ns.${name.text}") // Math.abs target
          case _ => throw UnsupportedMvel(
            s"field access '.${name.text}' unsupported in '$src'")
        }
        }
      }
      e
    }

    private def callArgs(): List[Expr] = {
      val args = List.newBuilder[Expr]
      if (!at(")")) {
        args += expression()
        while (eat(",")) args += expression()
      }
      expect(")")
      args.result()
    }

    private def primary(): Expr = {
      val t = next()
      t.kind match {
        case "num" =>
          val txt = t.text
          if (txt.endsWith("l")) NumLit(java.lang.Long.valueOf(txt.dropRight(1)))
          else if (txt.endsWith("f")) NumLit(java.lang.Float.valueOf(txt.dropRight(1)))
          else if (txt.endsWith("d")) NumLit(java.lang.Double.valueOf(txt.dropRight(1)))
          else if (txt.contains('.')) NumLit(java.lang.Double.valueOf(txt))
          else {
            val l = txt.toLong
            if (l >= Int.MinValue && l <= Int.MaxValue) NumLit(Int.box(l.toInt))
            else NumLit(Long.box(l))
          }
        case "str" => StrLit(t.text)
        case "id" => t.text match {
          case "true" => BoolLit(true)
          case "false" => BoolLit(false)
          case "null" | "nil" => NullLit
          case name =>
            if (eat("(")) Fun(name, callArgs())
            else VarRef(name)
        }
        case "op" if t.text == "(" =>
          val e = expression(); expect(")"); e
        case _ => throw UnsupportedMvel(s"unexpected token '${t.text}' in '$src'")
      }
    }
  }

  def parse(mvel: String): List[Stmt] = {
    val p = new Parser(tokenize(mvel), mvel)
    p.script()
  }

  // ------------------------------------------------------------ evaluator

  private def num(v: Any): Number = v.asInstanceOf[Number]

  private def rank(v: Any): Int = v match {
    case _: java.lang.Double => 4
    case _: java.lang.Float => 3
    case _: java.lang.Long => 2
    case _ => 1 // Integer / Short / Byte promote to int
  }

  private def arith(op: String, l: Any, r: Any): Any = {
    if (l == null || r == null) return null
    (l, r) match {
      case (a: String, b) if op == "+" => a + valueOfStr(b)
      case (a, b: String) if op == "+" => valueOfStr(a) + b
      case _ =>
        val rk = math.max(rank(l), rank(r))
        rk match {
          case 4 =>
            val (a, b) = (num(l).doubleValue(), num(r).doubleValue())
            op match {
              case "+" => a + b; case "-" => a - b; case "*" => a * b
              case "/" => a / b; case "%" => a % b
            }
          case 3 =>
            val (a, b) = (num(l).floatValue(), num(r).floatValue())
            op match {
              case "+" => a + b; case "-" => a - b; case "*" => a * b
              case "/" => a / b; case "%" => a % b
            }
          case 2 =>
            val (a, b) = (num(l).longValue(), num(r).longValue())
            op match {
              case "+" => a + b; case "-" => a - b; case "*" => a * b
              case "/" => a / b; case "%" => a % b
            }
          case _ =>
            val (a, b) = (num(l).intValue(), num(r).intValue())
            op match {
              case "+" => a + b; case "-" => a - b; case "*" => a * b
              case "/" => a / b; case "%" => a % b
            }
        }
    }
  }

  private def compare(op: String, l: Any, r: Any): Any = {
    if (l == null || r == null) return null
    val c = (l, r) match {
      case (a: Number, b: Number) =>
        java.lang.Double.compare(a.doubleValue(), b.doubleValue())
      case (a: String, b: String) => a.compareTo(b)
      case _ => throw UnsupportedMvel(s"cannot compare ${l.getClass} $op ${r.getClass}")
    }
    op match {
      case "<" => c < 0; case ">" => c > 0; case "<=" => c <= 0; case ">=" => c >= 0
    }
  }

  private def isIntegral(n: Number): Boolean = n match {
    case _: java.lang.Long | _: java.lang.Integer | _: java.lang.Short |
         _: java.lang.Byte => true
    case _ => false
  }

  private def eq(l: Any, r: Any): Boolean = (l, r) match {
    case (null, null) => true
    case (null, _) | (_, null) => false
    // integral vs integral compares exactly — doubleValue would collapse
    // distinct longs above 2^53 (snowflake-style CQL bigint ids live
    // there). Mixed int/float goes through double, which IS Java's own
    // (lossy) widening rule for long == double.
    case (a: Number, b: Number) if isIntegral(a) && isIntegral(b) =>
      a.longValue() == b.longValue()
    case (a: Number, b: Number) => a.doubleValue() == b.doubleValue()
    case (a, b) => a == b
  }

  private def truthy(v: Any): Boolean = v match {
    case null => false // null condition = false (SQL-style; MVEL would NPE)
    case b: java.lang.Boolean => b
    case other => throw UnsupportedMvel(s"non-boolean condition value: $other")
  }

  private def valueOfStr(v: Any): String = v match {
    case null => "null"
    case f: java.lang.Float => f.toString
    case d: java.lang.Double => d.toString
    case other => other.toString
  }

  private def castNum(tpe: String, v: Any): Any = {
    if (v == null) return null
    val n = num(v)
    tpe match {
      case "int" => Int.box(n.intValue())
      case "long" => Long.box(n.longValue())
      case "short" => Int.box(n.shortValue().toInt) // java promotes back to int
      case "byte" => Int.box(n.byteValue().toInt)
      case "float" => Float.box(n.floatValue())
      case "double" => Double.box(n.doubleValue())
    }
  }

  private def callMethod(target: Any, name: String, args: List[Any]): Any = {
    if (target == null) return null
    (target, name, args) match {
      case (s: String, "length", Nil) => Int.box(s.length)
      case (s: String, "substring", List(a: Number)) => s.substring(a.intValue())
      case (s: String, "substring", List(a: Number, b: Number)) =>
        s.substring(a.intValue(), b.intValue())
      case (s: String, "toUpperCase", Nil) => s.toUpperCase
      case (s: String, "toLowerCase", Nil) => s.toLowerCase
      case (s: String, "trim", Nil) => s.trim
      case (s: String, "indexOf", List(a: String)) => Int.box(s.indexOf(a))
      case (s: String, "charAt", List(a: Number)) => s.charAt(a.intValue()).toString
      case (s: String, "contains", List(a: String)) => Boolean.box(s.contains(a))
      case (s: String, "startsWith", List(a: String)) => Boolean.box(s.startsWith(a))
      case (s: String, "endsWith", List(a: String)) => Boolean.box(s.endsWith(a))
      case (s: String, "replace", List(a: String, b: String)) => s.replace(a, b)
      case (s: String, "isEmpty", Nil) => Boolean.box(s.isEmpty)
      case (s: String, "equals", List(a)) => Boolean.box(s == a)
      case (s: String, "concat", List(a: String)) => s.concat(a)
      case (s: String, "matches", List(a: String)) => Boolean.box(s.matches(a))
      // CQL list/set/map columns arrive as Spark Seq / Map values
      // (reference type surface: CassandraSchemaUtil.java:170-179).
      // Element equality is numeric-aware ([[eq]]): Spark boxes CQL int as
      // Integer and bigint as Long while MVEL literals default to Integer,
      // so raw .equals would make `row.big_ids.contains(3)` false purely
      // through boxing — a representation artifact, not user intent.
      case (xs: scala.collection.Seq[_], "size", Nil) => Int.box(xs.size)
      case (xs: scala.collection.Seq[_], "isEmpty", Nil) => Boolean.box(xs.isEmpty)
      case (xs: scala.collection.Seq[_], "contains", List(a)) =>
        Boolean.box(xs.exists(x => eq(fromSpark(x), a)))
      case (xs: scala.collection.Seq[_], "indexOf", List(a)) =>
        Int.box(xs.indexWhere(x => eq(fromSpark(x), a)))
      case (xs: scala.collection.Seq[_], "get", List(a: Number)) =>
        subscript(xs, a)
      case (m: scala.collection.Map[_, _], "size", Nil) => Int.box(m.size)
      case (m: scala.collection.Map[_, _], "isEmpty", Nil) => Boolean.box(m.isEmpty)
      case (m: scala.collection.Map[_, _], "containsKey", List(a)) =>
        Boolean.box(m.keysIterator.exists(k => eq(fromSpark(k), a)))
      case (m: scala.collection.Map[_, _], "containsValue", List(a)) =>
        Boolean.box(m.valuesIterator.exists(v => eq(fromSpark(v), a)))
      case (m: scala.collection.Map[_, _], "get", List(a)) => subscript(m, a)
      case (t, "hashCode", Nil) => Int.box(t.hashCode()) // JVM-exact (O22 parity)
      case (n: Number, "intValue", Nil) => Int.box(n.intValue())
      case (n: Number, "longValue", Nil) => Long.box(n.longValue())
      case (n: Number, "doubleValue", Nil) => Double.box(n.doubleValue())
      case (s: String, "toString", Nil) => s
      case (n: Number, "toString", Nil) => valueOfStr(n)
      case _ => throw UnsupportedMvel(
        s"unsupported method .$name/${args.length} on ${target.getClass.getSimpleName}")
    }
  }

  /** `xs[i]` / `m[k]` — element-access semantics matching BOTH the JVM and
    * the translator's SQL passthrough under ANSI mode (probed, Spark 4
    * default): list index out of bounds THROWS (Java List.get and ANSI
    * `xs[i]` agree), missing map key yields null (ANSI map access returns
    * NULL, probed), null target/key propagates null. Map keys match with
    * numeric-aware equality for the same boxing reason as `.contains`
    * above.
    */
  private def subscript(target: Any, key: Any): Any = {
    if (target == null || key == null) return null
    (target, key) match {
      case (xs: scala.collection.Seq[_], i: Number) =>
        val idx = i.intValue()
        if (idx < 0 || idx >= xs.size) throw new IndexOutOfBoundsException(
          s"list index $idx out of bounds for length ${xs.size}")
        else fromSpark(xs(idx))
      case (m: scala.collection.Map[_, _], k) =>
        m.collectFirst { case (mk, v) if eq(fromSpark(mk), k) => fromSpark(v) }
          .orNull
      case _ => throw UnsupportedMvel(
        s"subscript on ${target.getClass.getSimpleName} unsupported")
    }
  }

  private def callFun(name: String, args: List[Any]): Any = {
    def n1 = num(args.head)
    def n2 = num(args(1))
    if (args.exists(_ == null) && name != "String.valueOf") return null
    name match {
      case "abs" | "Math.abs" => arith("*", args.head,
        if (compare("<", args.head, Int.box(0)) == Boolean.box(true)) Int.box(-1) else Int.box(1))
      case "min" | "Math.min" =>
        if (truthy(compare("<=", args.head, args(1)))) args.head else args(1)
      case "max" | "Math.max" =>
        if (truthy(compare(">=", args.head, args(1)))) args.head else args(1)
      case "Math.floor" => Double.box(math.floor(n1.doubleValue()))
      case "Math.ceil" => Double.box(math.ceil(n1.doubleValue()))
      case "Math.sqrt" => Double.box(math.sqrt(n1.doubleValue()))
      case "Math.pow" => Double.box(math.pow(n1.doubleValue(), n2.doubleValue()))
      case "String.valueOf" => valueOfStr(args.head)
      case "Integer.parseInt" => Int.box(args.head.toString.trim.toInt)
      case "Long.parseLong" => Long.box(args.head.toString.trim.toLong)
      case "Double.parseDouble" => Double.box(args.head.toString.trim.toDouble)
      case other => throw UnsupportedMvel(s"unsupported function '$other'")
    }
  }

  /** Evaluate a parsed script against one row's column values. */
  def eval(stmts: List[Stmt], rowVals: Map[String, Any]): Any = {
    val env = scala.collection.mutable.Map.empty[String, Any]
    var returned: Option[Any] = None
    // MVEL value-of-script: an explicit `return` wins; otherwise the last
    // evaluated bare expression statement is the script's value
    var lastValue: Option[Any] = None

    def evalExpr(e: Expr): Any = e match {
      case NumLit(v) => v
      case StrLit(v) => v
      case BoolLit(v) => Boolean.box(v)
      case NullLit => null
      case ColRef(c) => rowVals.getOrElse(c,
        throw UnsupportedMvel(s"unknown column 'row.$c'"))
      case VarRef(v) => env.getOrElse(v,
        throw UnsupportedMvel(s"undefined variable '$v'"))
      case Un("!", x) => evalExpr(x) match {
        case null => null
        case b: java.lang.Boolean => Boolean.box(!b)
        case other => throw UnsupportedMvel(s"'!' on non-boolean $other")
      }
      case Un("-", x) => arith("-", Int.box(0), evalExpr(x)) match {
        case null => null
        case v => v
      }
      case Un(op, _) => throw UnsupportedMvel(s"unsupported unary '$op'")
      case Bin("&&", l, r) => // short-circuit
        if (!truthy(evalExpr(l))) Boolean.box(false)
        else Boolean.box(truthy(evalExpr(r)))
      case Bin("||", l, r) =>
        if (truthy(evalExpr(l))) Boolean.box(true)
        else Boolean.box(truthy(evalExpr(r)))
      case Bin("==", l, r) => Boolean.box(eq(evalExpr(l), evalExpr(r)))
      case Bin("!=", l, r) => Boolean.box(!eq(evalExpr(l), evalExpr(r)))
      case Bin(op @ ("<" | ">" | "<=" | ">="), l, r) => compare(op, evalExpr(l), evalExpr(r))
      case Bin(op, l, r) => arith(op, evalExpr(l), evalExpr(r))
      case Tern(c, t, f) => if (truthy(evalExpr(c))) evalExpr(t) else evalExpr(f)
      case Method(t, name, args) => callMethod(evalExpr(t), name, args.map(evalExpr))
      case Fun(name, args) => callFun(name, args.map(evalExpr))
      case CastE(tpe, x) => castNum(tpe, evalExpr(x))
      case Index(t, k) => subscript(evalExpr(t), evalExpr(k))
    }

    def run(ss: List[Stmt]): Unit = ss.foreach { s =>
      if (returned.isEmpty) s match {
        case Decl(name, e) => env(name) = e.map(evalExpr).orNull
        case Assign(name, None, e) => env(name) = evalExpr(e)
        case Assign(name, Some(op), e) =>
          env(name) = arith(op, env.getOrElse(name,
            throw UnsupportedMvel(s"undefined variable '$name'")), evalExpr(e))
        case IncDec(name, op) =>
          env(name) = arith(if (op == "++") "+" else "-",
            env.getOrElse(name, throw UnsupportedMvel(s"undefined variable '$name'")),
            Int.box(1))
        case If(c, t, f) => if (truthy(evalExpr(c))) run(t) else run(f)
        case While(c, body) =>
          var iters = 0
          while (returned.isEmpty && truthy(evalExpr(c))) {
            run(body); iters += 1
            if (iters > MaxLoopIters)
              throw UnsupportedMvel(s"loop exceeded $MaxLoopIters iterations")
          }
        case For(init, c, upd, body) =>
          init.foreach(i => run(List(i)))
          var iters = 0
          while (returned.isEmpty && c.forall(e => truthy(evalExpr(e)))) {
            run(body)
            upd.foreach(u => run(List(u)))
            iters += 1
            if (iters > MaxLoopIters)
              throw UnsupportedMvel(s"loop exceeded $MaxLoopIters iterations")
          }
        case Return(e) => returned = Some(evalExpr(e))
        case ExprStmt(e) => lastValue = Some(evalExpr(e))
      }
    }
    run(stmts)
    returned.orElse(lastValue)
      .getOrElse(throw UnsupportedMvel("MVEL script produced no value"))
  }

  // -------------------------------------------------------- type inference

  /** Small type lattice for the UDF's declared return DataType. The
    * evaluator's result is coerced to the inferred type at the row
    * boundary, so inference only has to be SOUND on the lattice join,
    * not exact.
    */
  private sealed trait T
  private case object TInt extends T
  private case object TLong extends T
  private case object TFloat extends T
  private case object TDouble extends T
  private case object TBool extends T
  private case object TStr extends T
  private case object TNull extends T
  private final case class TArr(elem: T) extends T
  private final case class TMap(key: T, value: T) extends T

  private def join(a: T, b: T): T = (a, b) match {
    case (x, y) if x == y => x
    case (TNull, x) => x
    case (x, TNull) => x
    case (TArr(x), TArr(y)) => TArr(join(x, y))
    case (TMap(k1, v1), TMap(k2, v2)) => TMap(join(k1, k2), join(v1, v2))
    case (_: TArr | _: TMap, _) | (_, _: TArr | _: TMap) =>
      throw UnsupportedMvel(s"cannot unify collection type with $a/$b")
    case (TStr, _) | (_, TStr) => TStr
    case (TDouble, _) | (_, TDouble) => TDouble
    case (TFloat, _) | (_, TFloat) => TFloat
    case (TLong, _) | (_, TLong) => TLong
    case (TBool, _) | (_, TBool) => TStr // heterogeneous — stringly safe
    case _ => TInt
  }

  private def colT(dt: DataType): T = dt match {
    case ByteType | ShortType | IntegerType => TInt
    case LongType => TLong
    case FloatType => TFloat
    case DoubleType | _: DecimalType => TDouble
    case BooleanType => TBool
    case StringType => TStr
    // CQL list/set → Spark array, CQL map → Spark map
    // (reference CassandraSchemaUtil.java:170-179)
    case ArrayType(e, _) => TArr(colT(e))
    case MapType(k, v, _) => TMap(colT(k), colT(v))
    case other => throw UnsupportedMvel(
      s"column type ${other.simpleString} unsupported in interpreted MVEL")
  }

  private def inferScript(
      stmts: List[Stmt], colTypes: Map[String, T]): T = {
    var env = Map.empty[String, T]
    var ret: Option[T] = None
    var last: Option[T] = None

    def tExpr(e: Expr): T = e match {
      case NumLit(_: java.lang.Integer) => TInt
      case NumLit(_: java.lang.Long) => TLong
      case NumLit(_: java.lang.Float) => TFloat
      case NumLit(_) => TDouble
      case StrLit(_) => TStr
      case BoolLit(_) => TBool
      case NullLit => TNull
      case ColRef(c) => colTypes.getOrElse(c,
        throw UnsupportedMvel(s"unknown column 'row.$c'"))
      case VarRef(v) => env.getOrElse(v, TNull)
      case Un("!", _) => TBool
      case Un(_, x) => tExpr(x)
      case Bin("&&" | "||" | "==" | "!=" | "<" | ">" | "<=" | ">=", _, _) => TBool
      case Bin("+", l, r) if tExpr(l) == TStr || tExpr(r) == TStr => TStr
      case Bin(_, l, r) => join(tExpr(l), tExpr(r)) match {
        case TBool | TStr | TNull => TInt // arithmetic never yields these
        case t => t
      }
      case Tern(_, t, f) => join(tExpr(t), tExpr(f))
      case Method(tgt, name, _) => name match {
        case "length" | "indexOf" | "hashCode" | "intValue" | "size" => TInt
        case "longValue" => TLong
        case "doubleValue" => TDouble
        case "contains" | "startsWith" | "endsWith" | "isEmpty" | "equals" |
             "matches" | "containsKey" | "containsValue" => TBool
        case "get" => tExpr(tgt) match {
          case TMap(_, v) => v
          case TArr(e) => e
          case _ => TStr
        }
        case _ => TStr
      }
      case Index(tgt, _) => tExpr(tgt) match {
        case TArr(e) => e
        case TMap(_, v) => v
        case TNull => TNull
        case other => throw UnsupportedMvel(s"subscript on $other unsupported")
      }
      case Fun(name, args) => name match {
        case "Math.floor" | "Math.ceil" | "Math.sqrt" | "Math.pow" |
             "Double.parseDouble" => TDouble
        case "Integer.parseInt" => TInt
        case "Long.parseLong" => TLong
        case "String.valueOf" => TStr
        case _ => args.map(tExpr).foldLeft(TNull: T)(join) // abs/min/max
      }
      case CastE(tpe, _) => tpe match {
        case "long" => TLong
        case "float" => TFloat
        case "double" => TDouble
        case _ => TInt
      }
    }

    def walk(ss: List[Stmt]): Unit = ss.foreach {
      case Decl(name, e) => env += name -> e.map(tExpr).getOrElse(TNull)
      case Assign(name, None, e) =>
        env += name -> join(env.getOrElse(name, TNull), tExpr(e))
      case Assign(name, Some(_), e) =>
        env += name -> join(env.getOrElse(name, TInt), tExpr(e))
      case IncDec(name, _) => env += name -> env.getOrElse(name, TInt)
      case If(_, t, f) => walk(t); walk(f)
      case While(_, body) => iterateToFixpoint(body, None)
      case For(init, _, upd, body) =>
        init.foreach(i => walk(List(i)))
        iterateToFixpoint(body, upd)
      case Return(e) => ret = Some(ret.map(join(_, tExpr(e))).getOrElse(tExpr(e)))
      case ExprStmt(e) => last = Some(tExpr(e))
    }
    // loop bodies can widen variable types across iterations (x = x + 0.5):
    // re-walk until the env stabilizes — the lattice is finite, so this
    // terminates in a handful of passes
    def iterateToFixpoint(body: List[Stmt], upd: Option[Stmt]): Unit = {
      var stable = false
      var guard = 0
      while (!stable && guard < 8) {
        val before = env
        walk(body)
        upd.foreach(u => walk(List(u)))
        stable = env == before
        guard += 1
      }
    }
    walk(stmts)
    ret.orElse(last)
      .getOrElse(throw UnsupportedMvel("MVEL script produced no value"))
  }

  private def dataTypeOf(t: T): DataType = t match {
    case TInt => IntegerType
    case TLong => LongType
    case TFloat => FloatType
    case TDouble => DoubleType
    case TBool => BooleanType
    case TArr(e) => ArrayType(dataTypeOf(e))
    case TMap(k, v) => MapType(dataTypeOf(k), dataTypeOf(v))
    case TStr | TNull => StringType
  }

  private def coerce(v: Any, t: T): Any = v match {
    case null => null
    case _ => t match {
      case TInt => Int.box(num(v).intValue())
      case TLong => Long.box(num(v).longValue())
      case TFloat => Float.box(num(v).floatValue())
      case TDouble => Double.box(num(v).doubleValue())
      case TBool => v
      // a returned collection re-coerces its elements: the evaluator's
      // value domain promotes byte/short/decimal, and the declared Spark
      // type above was mapped through the same promotion
      case TArr(e) =>
        v.asInstanceOf[scala.collection.Seq[Any]].map(x => coerce(fromSpark(x), e))
      case TMap(k, w) =>
        v.asInstanceOf[scala.collection.Map[Any, Any]].map { case (a, b) =>
          coerce(fromSpark(a), k) -> coerce(fromSpark(b), w)
        }
      case _ => valueOfStr(v)
    }
  }

  /** Normalize a Spark row value to the evaluator's value domain. */
  private def fromSpark(v: Any): Any = v match {
    case b: java.lang.Byte => Int.box(b.intValue())
    case s: java.lang.Short => Int.box(s.intValue())
    case d: java.math.BigDecimal => Double.box(d.doubleValue())
    case d: BigDecimal => Double.box(d.toDouble)
    case other => other
  }

  /** Compile arbitrary MVEL to an interpreting UDF Column over the
    * referenced `row.*` columns of `schema`.
    */
  def toColumn(mvel: String, schema: StructType): Column = {
    val stmts = parse(mvel)
    val cols = MvelTranslator.referencedColumns(mvel)
    val missing = cols.filterNot(schema.fieldNames.contains)
    if (missing.nonEmpty) throw UnsupportedMvel(
      s"MVEL references missing column(s): ${missing.mkString(", ")}")
    val colTypes = cols.map(c => c -> colT(schema(c).dataType)).toMap
    val retT = inferScript(stmts, colTypes)
    val colsArr = cols.toArray
    val f = new UDF1[Row, Any] {
      override def call(r: Row): Any = {
        var i = 0
        var m = Map.empty[String, Any]
        while (i < colsArr.length) {
          m += colsArr(i) -> (if (r.isNullAt(i)) null else fromSpark(r.get(i)))
          i += 1
        }
        coerce(eval(stmts, m), retT)
      }
    }
    udf(f, dataTypeOf(retT)).apply(struct(cols.map(col): _*))
  }
}
