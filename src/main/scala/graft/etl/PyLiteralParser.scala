package graft.etl

/** Python-literal → JSON converter for MongoDB CDC exports whose nested
  * event arrays are stringified Python lists of dicts, e.g.
  * `[{'createdAt': {'$date': 1689856037000}, 'status': None, ...}]`
  * (reference: dags/datahelper/postgres.py:185 does this with `eval`;
  * corpus shape verified in SURVEY.md §1.2-1.3).
  *
  * A real recursive-descent parser, not a regex chain: handles nested
  * dicts/lists, single- OR double-quoted strings, `\'` and `\"` escapes
  * (none occur in the corpus, but the parser must not be corpus-fragile),
  * ints, floats, None/True/False. Emits canonical JSON; JSON string
  * escaping is applied to the string contents.
  *
  * Pure function on one cell — safe to call from codegen'd expressions.
  * Malformed input returns null (never throws into the executor), so bad
  * rows surface as null arrays that can be quarantined downstream.
  */
object PyLiteralParser {

  /** Java-callable entry point used by the generated code of
    * [[graft.etl.expressions.PyLiteralToJson]]. */
  def toJson(s: String): String =
    try {
      val p = new Parser(s)
      p.skipWs()
      val sb = new StringBuilder(s.length + 16)
      p.value(sb)
      p.skipWs()
      if (p.pos != s.length) null else sb.toString
    } catch { case _: ParseError => null }

  /** Sentinel distinguishing "failed to parse" from a literal `None`. */
  case object Malformed

  /** Number node: keeps the RAW literal text; integral-vs-float is
    * decided by spelling (presence of '.'/'e'), matching Jackson's token
    * classification of the same text. */
  final case class PyNum(text: String) {
    def isIntegral: Boolean =
      text.indexOf('.') < 0 && text.indexOf('e') < 0 && text.indexOf('E') < 0
  }

  /** Dict node: preserves ENTRY ORDER AND DUPLICATE KEYS — Jackson's
    * raw-subtree copy keeps duplicates verbatim when a nested dict is
    * coerced into a string field, so the tree must too. Field lookup is
    * last-occurrence-wins, matching the row writer's behavior. */
  final class PyDict {
    val entries = new java.util.ArrayList[(String, AnyRef)]()
    def put(k: String, v: AnyRef): Unit = entries.add((k, v))
    def get(key: String): AnyRef = {
      var r: AnyRef = null
      var i = 0
      while (i < entries.size) {
        if (entries.get(i)._1 == key) r = entries.get(i)._2
        i += 1
      }
      r
    }
    /** All values bound to `key`, in occurrence order — needed where a
      * LATER duplicate can fail conversion and the EARLIER value must
      * survive (Jackson writes per occurrence; a failed write keeps the
      * previously written value). */
    def occurrences(key: String): java.util.ArrayList[AnyRef] = {
      val r = new java.util.ArrayList[AnyRef]()
      var i = 0
      while (i < entries.size) {
        if (entries.get(i)._1 == key) r.add(entries.get(i)._2)
        i += 1
      }
      r
    }
  }

  /** The text Jackson's copy/re-render produces for a number token: longs
    * via parsed value (BigInteger beyond Long range), floats via parsed
    * double — "1e-3" becomes "0.001" — and overflowed floats as the
    * QUOTED non-numeric form `"Infinity"`. */
  def jacksonNumberText(n: PyNum): String =
    if (n.isIntegral)
      try java.lang.Long.parseLong(n.text).toString
      catch { case _: NumberFormatException => BigInt(n.text).toString }
    else {
      val d = n.text.toDouble
      if (java.lang.Double.isInfinite(d))
        if (d > 0) "\"Infinity\"" else "\"-Infinity\""
      else java.lang.Double.toString(d)
    }

  /** Parse to a value tree for direct struct construction
    * ([[graft.etl.expressions.PyEventsArray]]): dict → [[PyDict]],
    * list → java.util.ArrayList[AnyRef], string → String (unescaped
    * content), number → [[PyNum]], True/False → java.lang.Boolean,
    * None → null. Returns [[Malformed]] on any parse failure. */
  def parseTree(s: String): AnyRef =
    try {
      val p = new Parser(s)
      p.skipWs()
      val v = p.tree()
      p.skipWs()
      if (p.pos != s.length) Malformed else v
    } catch { case _: ParseError => Malformed }

  /** JSON text of a tree node AS JACKSON WOULD RE-RENDER IT — not as the
    * raw literal spelled it. Used for string-coercing nested containers:
    * the two-pass pipeline runs the subtree through Jackson's
    * copyCurrentStructure, which re-renders numbers from their parsed
    * values and re-escapes strings with Jackson's table (\b \f \t \n \r
    * shortforms, uppercase \u00XX for other control chars). */
  def treeToJson(v: AnyRef): String = {
    val sb = new StringBuilder
    appendJson(v, sb)
    sb.toString
  }

  private def appendJson(v: AnyRef, sb: StringBuilder): Unit = v match {
    case null => sb.append("null")
    case b: java.lang.Boolean => sb.append(if (b) "true" else "false")
    case n: PyNum => sb.append(jacksonNumberText(n))
    case s: String => appendJsonString(s, sb)
    case l: java.util.ArrayList[_] =>
      sb.append('[')
      var i = 0
      while (i < l.size) {
        if (i > 0) sb.append(',')
        appendJson(l.get(i).asInstanceOf[AnyRef], sb); i += 1
      }
      sb.append(']')
    case m: PyDict =>
      sb.append('{')
      var i = 0
      while (i < m.entries.size) {
        if (i > 0) sb.append(',')
        val (k, x) = m.entries.get(i)
        appendJsonString(k, sb)
        sb.append(':')
        appendJson(x, sb)
        i += 1
      }
      sb.append('}')
    case other => throw new IllegalStateException(s"unexpected node $other")
  }

  private def appendJsonString(s: String, sb: StringBuilder): Unit = {
    sb.append('"')
    s.foreach {
      case '"'  => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\b' => sb.append("\\b")
      case '\f' => sb.append("\\f")
      case '\n' => sb.append("\\n")
      case '\t' => sb.append("\\t")
      case '\r' => sb.append("\\r")
      case x if x < ' ' => sb.append(f"\\u${x.toInt}%04X")
      case x    => sb.append(x)
    }
    sb.append('"')
  }

  private final class ParseError extends RuntimeException

  private final class Parser(s: String) {
    var pos = 0

    private def fail(): Nothing = throw new ParseError

    def skipWs(): Unit =
      while (pos < s.length && Character.isWhitespace(s.charAt(pos))) pos += 1

    private def peek: Char = if (pos < s.length) s.charAt(pos) else '\u0000'

    private def expect(c: Char): Unit =
      if (peek == c) pos += 1 else fail()

    def value(sb: StringBuilder): Unit = {
      skipWs()
      peek match {
        case '{'                          => dict(sb)
        case '['                          => list(sb)
        case '\'' | '"'                   => str(sb)
        case c if c == '-' || c.isDigit   => number(sb)
        case 'N'                          => keyword("None", "null", sb)
        case 'T'                          => keyword("True", "true", sb)
        case 'F'                          => keyword("False", "false", sb)
        case _                            => fail()
      }
    }

    /** Tree-building twin of [[value]] (see [[PyLiteralParser.parseTree]]). */
    def tree(): AnyRef = {
      skipWs()
      peek match {
        case '{'                        => dictTree()
        case '['                        => listTree()
        case '\'' | '"'                 => strTree()
        case c if c == '-' || c.isDigit => numberTree()
        case 'N' => keywordTree("None", null)
        case 'T' => keywordTree("True", java.lang.Boolean.TRUE)
        case 'F' => keywordTree("False", java.lang.Boolean.FALSE)
        case _   => fail()
      }
    }

    private def keywordTree(py: String, v: AnyRef): AnyRef = {
      if (!s.startsWith(py, pos)) fail()
      pos += py.length
      v
    }

    private def dictTree(): PyDict = {
      expect('{'); skipWs()
      val m = new PyDict()
      var first = true
      while (peek != '}') {
        if (!first) { expect(','); skipWs() }
        first = false
        val k = strTree(); skipWs()
        expect(':')
        val v = tree(); skipWs()
        m.put(k, v)
      }
      expect('}')
      m
    }

    private def listTree(): java.util.ArrayList[AnyRef] = {
      expect('['); skipWs()
      val l = new java.util.ArrayList[AnyRef]()
      var first = true
      while (peek != ']') {
        if (!first) { expect(','); skipWs() }
        first = false
        l.add(tree()); skipWs()
      }
      expect(']')
      l
    }

    /** Raw (unescaped) string content — same lexical rules as [[str]]. */
    private def strTree(): String = {
      val quote = peek
      if (quote != '\'' && quote != '"') fail()
      pos += 1
      val sb = new StringBuilder
      while (peek != quote) {
        if (pos >= s.length) fail()
        val c = s.charAt(pos)
        if (c == '\\') {
          if (pos + 1 >= s.length) fail()
          s.charAt(pos + 1) match {
            case '\'' => sb.append('\'')
            case '"'  => sb.append('"')
            case '\\' => sb.append('\\')
            case 'n'  => sb.append('\n')
            case 't'  => sb.append('\t')
            case 'r'  => sb.append('\r')
            case _    => fail()
          }
          pos += 2
        } else { sb.append(c); pos += 1 }
      }
      pos += 1
      sb.toString
    }

    /** Like [[number]] but enforces strict JSON number syntax (no leading
      * zeros, no trailing dot): the two-pass pipeline would emit such
      * text into the JSON and Jackson would reject the whole cell, so the
      * tree parser must fail identically. */
    private def numberTree(): PyNum = {
      val start = pos
      if (peek == '-') pos += 1
      if (!peek.isDigit) fail()
      val firstDigit = pos
      while (peek.isDigit) pos += 1
      if (pos - firstDigit > 1 && s.charAt(firstDigit) == '0') fail()
      if (peek == '.') {
        pos += 1
        if (!peek.isDigit) fail()
        while (peek.isDigit) pos += 1
      }
      if (peek == 'e' || peek == 'E') {
        pos += 1
        if (peek == '+' || peek == '-') pos += 1
        if (!peek.isDigit) fail()
        while (peek.isDigit) pos += 1
      }
      PyNum(s.substring(start, pos))
    }

    private def keyword(py: String, json: String, sb: StringBuilder): Unit = {
      if (!s.startsWith(py, pos)) fail()
      pos += py.length
      sb.append(json)
    }

    private def dict(sb: StringBuilder): Unit = {
      expect('{'); sb.append('{'); skipWs()
      var first = true
      while (peek != '}') {
        if (!first) { expect(','); sb.append(','); skipWs() }
        first = false
        str(sb); skipWs()
        expect(':'); sb.append(':')
        value(sb); skipWs()
      }
      expect('}'); sb.append('}')
    }

    private def list(sb: StringBuilder): Unit = {
      expect('['); sb.append('['); skipWs()
      var first = true
      while (peek != ']') {
        if (!first) { expect(','); sb.append(','); skipWs() }
        first = false
        value(sb); skipWs()
      }
      expect(']'); sb.append(']')
    }

    private def str(sb: StringBuilder): Unit = {
      val quote = peek
      if (quote != '\'' && quote != '"') fail()
      pos += 1
      sb.append('"')
      while (peek != quote) {
        if (pos >= s.length) fail()
        val c = s.charAt(pos)
        if (c == '\\') {
          if (pos + 1 >= s.length) fail()
          val e = s.charAt(pos + 1)
          e match {
            case '\'' => sb.append('\'') // JSON does not escape single quotes
            case '"'  => sb.append("\\\"")
            case '\\' => sb.append("\\\\")
            case 'n'  => sb.append("\\n")
            case 't'  => sb.append("\\t")
            case 'r'  => sb.append("\\r")
            case _    => fail()
          }
          pos += 2
        } else {
          c match {
            case '"'  => sb.append("\\\"")
            case '\n' => sb.append("\\n")
            case '\t' => sb.append("\\t")
            case '\r' => sb.append("\\r")
            case x if x < ' ' => sb.append(f"\\u${x.toInt}%04x")
            case x    => sb.append(x)
          }
          pos += 1
        }
      }
      pos += 1
      sb.append('"')
    }

    private def number(sb: StringBuilder): Unit = {
      val start = pos
      if (peek == '-') pos += 1
      if (!peek.isDigit) fail()
      while (peek.isDigit) pos += 1
      if (peek == '.') { pos += 1; while (peek.isDigit) pos += 1 }
      if (peek == 'e' || peek == 'E') {
        pos += 1
        if (peek == '+' || peek == '-') pos += 1
        if (!peek.isDigit) fail()
        while (peek.isDigit) pos += 1
      }
      sb.append(s.substring(start, pos))
    }
  }
}
