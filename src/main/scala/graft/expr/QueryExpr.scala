package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** pandas `DataFrame.query` / `pd.eval` grammar → Catalyst Column
  * (SURVEY §3c / §4.4; reference: pandas/core/computation/expr.py:717
  * Expr, ops.py:180 term tree, eval.py:156).
  *
  * Supported grammar (the oracle-checkable core):
  *   expr    := or
  *   or      := and (('or'|'|') and)*
  *   and     := not (('and'|'&') not)*
  *   not     := ('not'|'~') not | cmp
  *   cmp     := arith (('=='|'!='|'<='|'>='|'<'|'>'|'in'|'not in') arith)?
  *   arith   := term (('+'|'-') term)*
  *   term    := unary (('*'|'/'|'%') unary)*
  *   unary   := '-' unary | atom
  *   atom    := number | 'string' | ident | `backtick ident` | '(' expr ')'
  *            | '[' literal (',' literal)* ']'
  *   @var resolution: pass bindings in `vars` (the reference resolves
  *   them from the Python frame; we take an explicit map).
  *
  * Chained comparisons (a < b < c) and python function calls are not
  * supported — same subset the reference's numexpr engine accelerates.
  */
object QueryExpr {

  def translate(q: String, vars: Map[String, Any] = Map.empty): Column =
    new Parser(q, vars).parse()

  /** DataFrame.eval / pd.eval assignment form (reference eval.py:156
    * multi-line programs): "target = expr" per line, later lines may
    * reference earlier targets (realized by sequential withColumn).
    * Returns (target, translated Column) in program order. */
  def evalAssignments(program: String,
      vars: Map[String, Any] = Map.empty): Seq[(String, Column)] =
    program.split("\n").map(_.trim).filter(_.nonEmpty).toSeq.map { line =>
      val i = topLevelAssignIndex(line)
      require(i > 0, s"eval expects 'name = expr': $line")
      val name = line.substring(0, i).trim
      require(name.matches("[A-Za-z_][A-Za-z0-9_]*"), s"bad eval target: $name")
      name -> translate(line.substring(i + 1), vars)
    }

  /** Index of a bare '=' (not ==, <=, >=, !=), outside string literals. */
  private def topLevelAssignIndex(s: String): Int = {
    var i = 0; var quote: Char = 0
    while (i < s.length) {
      val c = s(i)
      if (quote != 0) { if (c == quote) quote = 0 }
      else if (c == '\'' || c == '"') quote = c
      else if (c == '=' &&
          (i + 1 >= s.length || s(i + 1) != '=') &&
          (i == 0 || !"<>=!".contains(s(i - 1)))) return i
      i += 1
    }
    -1
  }

  private sealed trait Tok
  private case class Ident(s: String) extends Tok
  private case class Num(v: Double, isInt: Boolean) extends Tok
  private case class Str(s: String) extends Tok
  private case class Op(s: String) extends Tok
  private case class AtVar(s: String) extends Tok

  private class Parser(input: String, vars: Map[String, Any]) {
    private val toks = tokenize(input)
    private var pos = 0

    private def peek: Option[Tok] = toks.lift(pos)
    private def next(): Tok = { val t = toks(pos); pos += 1; t }
    private def accept(op: String): Boolean = peek match {
      case Some(Op(`op`)) => pos += 1; true
      case Some(Ident(id)) if id == op => pos += 1; true
      case _ => false
    }

    def parse(): Column = {
      val c = orExpr()
      require(pos == toks.length, s"trailing tokens at $pos in: $input")
      c
    }

    private def orExpr(): Column = {
      var l = andExpr()
      while (accept("or") || accept("|")) l = l || andExpr()
      l
    }

    private def andExpr(): Column = {
      var l = notExpr()
      while (accept("and") || accept("&")) l = l && notExpr()
      l
    }

    private def notExpr(): Column =
      if (accept("not") || accept("~")) !notExpr() else cmpExpr()

    private def cmpExpr(): Column = {
      val l = arith()
      peek match {
        case Some(Op(o)) if Set("==", "!=", "<=", ">=", "<", ">").contains(o) =>
          pos += 1
          val r = arith()
          o match {
            case "==" => l === r; case "!=" => l =!= r
            case "<=" => l <= r;  case ">=" => l >= r
            case "<"  => l < r;   case ">"  => l > r
          }
        case Some(Ident("in")) =>
          pos += 1; l.isin(listLiteral(): _*)
        case Some(Ident("not")) if toks.lift(pos + 1).contains(Ident("in")) =>
          pos += 2; !l.isin(listLiteral(): _*)
        case _ => l
      }
    }

    private def arith(): Column = {
      var l = term()
      var go = true
      while (go) peek match {
        case Some(Op("+")) => pos += 1; l = l + term()
        case Some(Op("-")) => pos += 1; l = l - term()
        case _ => go = false
      }
      l
    }

    private def term(): Column = {
      var l = unary()
      var go = true
      while (go) peek match {
        case Some(Op("*")) => pos += 1; l = l * unary()
        case Some(Op("/")) => pos += 1; l = l / unary()
        case Some(Op("%")) => pos += 1; l = l % unary()
        case _ => go = false
      }
      l
    }

    private def unary(): Column =
      if (accept("-")) -unary() else atom()

    private def atom(): Column = next() match {
      case Num(v, true)  => lit(v.toLong)
      case Num(v, false) => lit(v)
      case Str(s)        => lit(s)
      case AtVar(v)      => lit(vars.getOrElse(v,
        throw new IllegalArgumentException(s"unresolved @$v")))
      case Ident(id)     => col(id)
      case Op("(")       =>
        val c = orExpr(); require(accept(")"), "missing )"); c
      case t => throw new IllegalArgumentException(s"unexpected token $t")
    }

    private def listLiteral(): Seq[Any] = {
      require(accept("(") || accept("["), "expected list literal after in")
      val out = scala.collection.mutable.ArrayBuffer[Any]()
      var go = true
      while (go) next() match {
        case Num(v, true)  => out += v.toLong; go = accept(",")
        case Num(v, false) => out += v; go = accept(",")
        case Str(s)        => out += s; go = accept(",")
        case AtVar(v)      => out += vars(v); go = accept(",")
        case t => throw new IllegalArgumentException(s"bad list element $t")
      }
      require(accept(")") || accept("]"), "unterminated list")
      out.toSeq
    }
  }

  private def tokenize(s: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    while (i < s.length) {
      val c = s(i)
      if (c.isWhitespace) i += 1
      else if (c.isDigit || (c == '.' && i + 1 < s.length && s(i + 1).isDigit)) {
        val start = i
        while (i < s.length && (s(i).isDigit || s(i) == '.' || s(i) == 'e' ||
          s(i) == 'E' || ((s(i) == '+' || s(i) == '-') && (s(i - 1) == 'e' || s(i - 1) == 'E'))))
          i += 1
        val str = s.substring(start, i)
        out += Num(str.toDouble, !str.exists(ch => ch == '.' || ch == 'e' || ch == 'E'))
      } else if (c.isLetter || c == '_') {
        val start = i
        while (i < s.length && (s(i).isLetterOrDigit || s(i) == '_')) i += 1
        out += Ident(s.substring(start, i))
      } else if (c == '`') {
        val end = s.indexOf('`', i + 1)
        require(end > 0, "unterminated backtick")
        out += Ident(s.substring(i + 1, end)); i = end + 1
      } else if (c == '\'' || c == '"') {
        val end = s.indexOf(c, i + 1)
        require(end > 0, "unterminated string")
        out += Str(s.substring(i + 1, end)); i = end + 1
      } else if (c == '@') {
        val start = i + 1
        i += 1
        while (i < s.length && (s(i).isLetterOrDigit || s(i) == '_')) i += 1
        out += AtVar(s.substring(start, i))
      } else {
        val two = if (i + 1 < s.length) s.substring(i, i + 2) else ""
        if (Set("==", "!=", "<=", ">=").contains(two)) { out += Op(two); i += 2 }
        else { out += Op(c.toString); i += 1 }
      }
    }
    out.result()
  }
}
