package graft.transform

import scala.util.matching.Regex

/** Compiler for petl-style row-expression strings to Spark SQL.
  *
  * The reference's `filter` transform passes a Python expression over
  * `{field}` references to petl's `select`
  * (/root/reference/dasladen/task.py:151-152; petl `expr`), e.g.
  * `"{qty} > 10 and {flag} == 'A'"`. We compile the declared subset to a
  * Spark SQL predicate string (fed to `functions.expr`), so the filter
  * participates in Catalyst pushdown instead of running row-at-a-time.
  *
  * Declared subset (documented, validated; out-of-subset input → error —
  * arbitrary code is the module-SPI's job, SURVEY.md §2.3 T2/T4):
  *   - `{field}` references
  *   - literals: numbers, single/double-quoted strings, True/False/None
  *   - comparison: == != < <= > >= , `in (...)`, `not in (...)`
  *   - null tests: `is None` / `is not None`
  *   - boolean: and / or / not, parentheses
  *   - arithmetic: + - * / %
  */
object PetlExpr {

  private val fieldRef: Regex = """\{([A-Za-z_][A-Za-z0-9_]*)\}""".r

  // Tokens allowed AFTER field refs and string literals are stripped out.
  private val allowedToken: Regex =
    """(?i)(and|or|not|in|is|none|true|false|[0-9]+(\.[0-9]+)?|==|!=|<=|>=|<|>|[+\-*/%(),])""".r

  /** Validate then translate; throws IllegalArgumentException on anything
    * outside the declared subset.
    */
  def compile(expr: String): String = {
    validate(expr)
    translate(expr)
  }

  def fields(expr: String): Seq[String] =
    fieldRef.findAllMatchIn(expr).map(_.group(1)).toSeq.distinct

  private def validate(expr: String): Unit = {
    // Strip string literals and field refs, then every remaining token must
    // be in the allowed set.
    val noStrings = stringLit.replaceAllIn(expr, " ")
    val noFields = fieldRef.replaceAllIn(noStrings, " ")
    val leftovers = noFields.split("\\s+").filter(_.nonEmpty)
    leftovers.foreach { chunk =>
      val consumed = allowedToken.findAllIn(chunk).mkString
      if (consumed.length != chunk.length)
        throw new IllegalArgumentException(
          s"unsupported petl expression construct '$chunk' in: $expr " +
            "(supported: {field} refs, literals, comparisons, in/is None, and/or/not, arithmetic; " +
            "for arbitrary logic use a module transform)")
    }
  }

  private val stringLit: Regex = """'([^'\\]|\\.)*'|"([^"\\]|\\.)*"""".r

  private def translate(expr: String): String = {
    // Work on a token stream that leaves string literals intact.
    val sb = new StringBuilder
    var i = 0
    while (i < expr.length) {
      val rest = expr.substring(i)
      stringLit.findPrefixMatchOf(rest) match {
        case Some(m) =>
          // normalize double-quoted Python strings to single-quoted SQL
          val body = m.matched.substring(1, m.matched.length - 1)
          sb.append('\'').append(body.replace("'", "\\'")).append('\'')
          i += m.end
        case None =>
          fieldRef.findPrefixMatchOf(rest) match {
            case Some(m) =>
              sb.append('`').append(m.group(1)).append('`')
              i += m.end
            case None =>
              wordOp.findPrefixMatchOf(rest) match {
                case Some(m) =>
                  sb.append(wordMap(m.matched.toLowerCase))
                  i += m.end
                case None =>
                  val c = expr.charAt(i)
                  if (c == '=' && i + 1 < expr.length && expr.charAt(i + 1) == '=') {
                    sb.append('='); i += 2
                  } else if (c == '!' && i + 1 < expr.length && expr.charAt(i + 1) == '=') {
                    sb.append("<>"); i += 2
                  } else {
                    sb.append(c); i += 1
                  }
              }
          }
      }
    }
    // `is not null` / `is null` word order already handled by word mapping
    sb.toString
  }

  private val wordOp: Regex =
    """(?i)\bis\s+not\s+none\b|\bis\s+none\b|\bnot\s+in\b|\bin\b|\band\b|\bor\b|\bnot\b|\btrue\b|\bfalse\b|\bnone\b""".r

  private def wordMap(matched: String): String = {
    val norm = matched.toLowerCase.replaceAll("\\s+", " ")
    norm match {
      case "is not none" => "IS NOT NULL"
      case "is none"     => "IS NULL"
      case "not in"      => "NOT IN"
      case "in"          => "IN"
      case "and"         => "AND"
      case "or"          => "OR"
      case "not"         => "NOT"
      case "true"        => "true"
      case "false"       => "false"
      case "none"        => "NULL"
    }
  }
}
