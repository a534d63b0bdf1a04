package graft.pipeline

import scala.collection.immutable.ListMap

/** Minimal JSON AST + parser + renderer for the pipeline spec codec
  * (C2/C3). Hand-rolled because the image ships only json4s-core (no
  * json4s-jackson methods jar); the pipeline spec grammar is tiny and
  * fully under our control. Object key order is preserved (ListMap) so
  * spec files round-trip byte-stably.
  */
sealed trait Json {
  def render: String = this match {
    case JNull => "null"
    case JBool(b) => b.toString
    case JNum(n) =>
      if (!java.lang.Double.isFinite(n)) "null" // NaN/Inf are not JSON
      else if (n.isWhole && math.abs(n) < 1e15) n.toLong.toString
      else n.toString
    case JStr(s) => JStr.escape(s)
    case JArr(xs) => xs.map(_.render).mkString("[", ", ", "]")
    case JObj(m) =>
      m.map { case (k, v) => s"${JStr.escape(k)}: ${v.render}" }.mkString("{", ", ", "}")
  }
}
case object JNull extends Json
final case class JBool(b: Boolean) extends Json
final case class JNum(n: Double) extends Json
final case class JStr(s: String) extends Json
final case class JArr(xs: Vector[Json]) extends Json
final case class JObj(fields: ListMap[String, Json]) extends Json {
  def apply(k: String): Json = fields.getOrElse(k, JNull)
  def str(k: String): String = fields.get(k) match {
    case Some(JStr(s)) => s
    case other => sys.error(s"expected string at '$k', got $other")
  }
}

object JObj {
  def apply(kvs: (String, Json)*): JObj = JObj(ListMap(kvs: _*))
}

object JStr {
  def escape(s: String): String = "\"" + s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""
}

object Json {
  def parse(input: String): Json = {
    val p = new Parser(input)
    val v = p.value()
    p.skipWs()
    if (!p.atEnd) sys.error(s"trailing content at offset ${p.pos}")
    v
  }

  private final class Parser(s: String) {
    var pos = 0
    def atEnd: Boolean = pos >= s.length
    def skipWs(): Unit = while (!atEnd && s(pos).isWhitespace) pos += 1
    private def expect(c: Char): Unit = {
      skipWs()
      if (atEnd || s(pos) != c) sys.error(s"expected '$c' at offset $pos")
      pos += 1
    }
    def value(): Json = {
      skipWs()
      if (atEnd) sys.error("unexpected end of input")
      s(pos) match {
        case '{' => obj()
        case '[' => arr()
        case '"' => JStr(string())
        case 't' => lit("true", JBool(true))
        case 'f' => lit("false", JBool(false))
        case 'n' => lit("null", JNull)
        case _ => num()
      }
    }
    private def lit(word: String, v: Json): Json = {
      if (!s.startsWith(word, pos)) sys.error(s"bad literal at offset $pos")
      pos += word.length; v
    }
    private def obj(): JObj = {
      expect('{'); skipWs()
      if (!atEnd && s(pos) == '}') { pos += 1; return JObj(ListMap.empty[String, Json]) }
      val b = ListMap.newBuilder[String, Json]
      var done = false
      while (!done) {
        skipWs()
        val k = string()
        expect(':')
        b += k -> value()
        skipWs()
        if (!atEnd && s(pos) == ',') pos += 1
        else { expect('}'); done = true }
      }
      JObj(b.result())
    }
    private def arr(): JArr = {
      expect('['); skipWs()
      if (!atEnd && s(pos) == ']') { pos += 1; return JArr(Vector.empty) }
      val b = Vector.newBuilder[Json]
      var done = false
      while (!done) {
        b += value()
        skipWs()
        if (!atEnd && s(pos) == ',') pos += 1
        else { expect(']'); done = true }
      }
      JArr(b.result())
    }
    private def string(): String = {
      expect('"')
      val sb = new StringBuilder
      while (!atEnd && s(pos) != '"') {
        val c = s(pos)
        if (c == '\\') {
          pos += 1
          if (atEnd) sys.error("bad escape at end")
          s(pos) match {
            case '"' => sb += '"'
            case '\\' => sb += '\\'
            case '/' => sb += '/'
            case 'b' => sb += '\b'
            case 'f' => sb += '\f'
            case 'n' => sb += '\n'
            case 'r' => sb += '\r'
            case 't' => sb += '\t'
            case 'u' =>
              if (pos + 5 > s.length) sys.error(s"truncated \\u escape at offset $pos")
              val hex = s.substring(pos + 1, pos + 5)
              if (!hex.forall(c => Character.digit(c, 16) >= 0))
                sys.error(s"bad \\u escape '$hex' at offset $pos")
              sb += Integer.parseInt(hex, 16).toChar
              pos += 4
            case other => sys.error(s"bad escape '\\$other'")
          }
        } else sb += c
        pos += 1
      }
      expect('"')
      sb.result()
    }
    private def num(): JNum = {
      val start = pos
      while (!atEnd && (s(pos).isDigit || "+-.eE".contains(s(pos)))) pos += 1
      if (pos == start) sys.error(s"bad value at offset $pos")
      JNum(s.substring(start, pos).toDouble)
    }
  }
}
