package graft.core

/** Minimal strict JSON reader for the engine's own metadata files
  * (`_tables/meta.json`, `_snapshots/snap-*.json`, streaming offsets).
  *
  * Replaces the earlier per-field regex extraction, whose failure mode was
  * silent: a string value containing `"` or a reordered field produced a
  * regex miss (field "absent") instead of a parse error. This parser reads
  * the whole document and fails loudly — with the offending position — on
  * malformed input, and the typed accessors fail with the FIELD NAME on a
  * missing/mistyped field.
  *
  * Deliberately tiny: objects, arrays, strings (with the standard escapes),
  * numbers, booleans, null. Numbers keep their raw text so integral fields
  * round-trip exactly through Long (no double detour). Not a general JSON
  * library — no streaming, no duplicate-key detection (last wins, like
  * every mainstream reader).
  */
object MiniJson {

  sealed trait J
  final case class JStr(v: String) extends J
  final case class JNum(raw: String) extends J
  final case class JBool(v: Boolean) extends J
  case object JNull extends J
  final case class JArr(v: Vector[J]) extends J
  final case class JObj(v: Map[String, J]) extends J

  final class ParseException(msg: String) extends IllegalArgumentException(msg)

  /** Parse a full JSON document; trailing non-whitespace is an error. */
  def parse(s: String): J = {
    val p = new Parser(s)
    val v = p.value()
    p.skipWs()
    if (!p.eof) p.fail("trailing content after JSON value")
    v
  }

  /** Parse a document that must be a JSON object; `where` names the source
    * (a file path) in error messages.
    */
  def parseObject(s: String, where: String): JObj =
    try parse(s) match {
      case o: JObj => o
      case other   => throw new ParseException(s"$where: expected a JSON object, got ${other.getClass.getSimpleName}")
    } catch {
      case e: ParseException => throw new ParseException(s"$where: ${e.getMessage}")
    }

  /** Typed field access that names the field (and its source) on failure. */
  implicit final class ObjOps(private val o: JObj) extends AnyVal {
    def get(name: String): Option[J] = o.v.get(name) match {
      case Some(JNull) => None
      case other       => other
    }
    def longOpt(name: String): Option[Long] = get(name).map {
      case JNum(raw) =>
        try raw.toLong
        catch { case _: NumberFormatException => throw new ParseException(s"field $name is not an integer: $raw") }
      case other => throw new ParseException(s"field $name is not a number: $other")
    }
    def long(name: String): Long =
      longOpt(name).getOrElse(throw new ParseException(s"missing field $name"))
    def strOpt(name: String): Option[String] = get(name).map {
      case JStr(v) => v
      case other   => throw new ParseException(s"field $name is not a string: $other")
    }
    def str(name: String): String =
      strOpt(name).getOrElse(throw new ParseException(s"missing field $name"))
    def longArrOpt(name: String): Option[Seq[Long]] = get(name).map {
      case JArr(xs) =>
        xs.map {
          case JNum(raw) =>
            try raw.toLong
            catch {
              case _: NumberFormatException =>
                throw new ParseException(s"field $name holds a non-integer element: $raw")
            }
          case other => throw new ParseException(s"field $name holds a non-integer element: $other")
        }
      case other => throw new ParseException(s"field $name is not an array: $other")
    }
    def strArrOpt(name: String): Option[Seq[String]] = get(name).map {
      case JArr(xs) =>
        xs.map {
          case JStr(v) => v
          case other   => throw new ParseException(s"field $name holds a non-string element: $other")
        }
      case other => throw new ParseException(s"field $name is not an array: $other")
    }
  }

  /** Render a value back to compact JSON (object keys sorted for
    * deterministic output — the maintenance ops rewrite snapshot files and
    * tests compare them byte-wise).
    */
  def render(j: J): String = j match {
    case JStr(v)   => renderString(v)
    case JNum(raw) => raw
    case JBool(v)  => v.toString
    case JNull     => "null"
    case JArr(xs)  => xs.map(render).mkString("[", ",", "]")
    case JObj(m)   => m.toSeq.sortBy(_._1).map { case (k, v) => s"${renderString(k)}:${render(v)}" }.mkString("{", ",", "}")
  }

  private def renderString(s: String): String = {
    val sb = new StringBuilder("\"")
    s.foreach {
      case '"'           => sb ++= "\\\""
      case '\\'          => sb ++= "\\\\"
      case '\n'          => sb ++= "\\n"
      case '\r'          => sb ++= "\\r"
      case '\t'          => sb ++= "\\t"
      case c if c < ' '  => sb ++= f"\\u${c.toInt}%04x"
      case c             => sb += c
    }
    (sb += '"').toString
  }

  private final class Parser(s: String) {
    private var i = 0
    def eof: Boolean = i >= s.length
    def fail(msg: String): Nothing =
      throw new ParseException(s"$msg at offset $i" + (if (eof) " (end of input)" else s" near '${s.substring(i, math.min(i + 16, s.length))}'"))

    def skipWs(): Unit =
      while (i < s.length && (s.charAt(i) == ' ' || s.charAt(i) == '\n' || s.charAt(i) == '\r' || s.charAt(i) == '\t')) i += 1

    private def expect(c: Char): Unit = {
      if (eof || s.charAt(i) != c) fail(s"expected '$c'")
      i += 1
    }

    def value(): J = {
      skipWs()
      if (eof) fail("unexpected end of input")
      s.charAt(i) match {
        case '{'                                  => obj()
        case '['                                  => arr()
        case '"'                                  => JStr(string())
        case 't'                                  => lit("true"); JBool(true)
        case 'f'                                  => lit("false"); JBool(false)
        case 'n'                                  => lit("null"); JNull
        case c if c == '-' || (c >= '0' && c <= '9') => num()
        case c                                    => fail(s"unexpected character '$c'")
      }
    }

    private def lit(word: String): Unit = {
      if (!s.startsWith(word, i)) fail(s"expected $word")
      i += word.length
    }

    private def obj(): JObj = {
      expect('{'); skipWs()
      val b = Map.newBuilder[String, J]
      if (!eof && s.charAt(i) == '}') { i += 1; return JObj(b.result()) }
      var more = true
      while (more) {
        skipWs()
        val k = string()
        skipWs(); expect(':')
        b += k -> value()
        skipWs()
        if (!eof && s.charAt(i) == ',') i += 1
        else { expect('}'); more = false }
      }
      JObj(b.result())
    }

    private def arr(): JArr = {
      expect('['); skipWs()
      val b = Vector.newBuilder[J]
      if (!eof && s.charAt(i) == ']') { i += 1; return JArr(b.result()) }
      var more = true
      while (more) {
        b += value()
        skipWs()
        if (!eof && s.charAt(i) == ',') i += 1
        else { expect(']'); more = false }
      }
      JArr(b.result())
    }

    private def string(): String = {
      expect('"')
      val sb = new StringBuilder
      while (true) {
        if (eof) fail("unterminated string")
        val c = s.charAt(i)
        i += 1
        c match {
          case '"' => return sb.toString
          case '\\' =>
            if (eof) fail("unterminated escape")
            val e = s.charAt(i); i += 1
            e match {
              case '"'  => sb += '"'
              case '\\' => sb += '\\'
              case '/'  => sb += '/'
              case 'b'  => sb += '\b'
              case 'f'  => sb += '\f'
              case 'n'  => sb += '\n'
              case 'r'  => sb += '\r'
              case 't'  => sb += '\t'
              case 'u' =>
                if (i + 4 > s.length) fail("truncated \\u escape")
                val hex = s.substring(i, i + 4)
                // strict hex-digit check: Integer.parseInt accepts +/- signs
                if (!hex.forall(c => Character.digit(c, 16) >= 0))
                  fail(s"bad \\u escape \\u$hex")
                sb += Integer.parseInt(hex, 16).toChar
                i += 4
              case other => fail(s"bad escape \\$other")
            }
          case other => sb += other
        }
      }
      sb.toString // unreachable
    }

    private def num(): JNum = {
      val start = i
      if (!eof && s.charAt(i) == '-') i += 1
      while (!eof && s.charAt(i) >= '0' && s.charAt(i) <= '9') i += 1
      if (!eof && s.charAt(i) == '.') {
        i += 1
        while (!eof && s.charAt(i) >= '0' && s.charAt(i) <= '9') i += 1
      }
      if (!eof && (s.charAt(i) == 'e' || s.charAt(i) == 'E')) {
        i += 1
        if (!eof && (s.charAt(i) == '+' || s.charAt(i) == '-')) i += 1
        while (!eof && s.charAt(i) >= '0' && s.charAt(i) <= '9') i += 1
      }
      if (i == start || (i == start + 1 && s.charAt(start) == '-')) fail("malformed number")
      JNum(s.substring(start, i))
    }
  }
}
