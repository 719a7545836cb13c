package graft.api

/**
 * JSON wire format for [[GeoAst]] — the reference's upickle serialisation of
 * PMQuery (reference: query-model/.../PMSerialiser.scala:14-21). Hand-rolled
 * (offline resolver: no JSON library on the compile classpath) but
 * round-trip-tested; the grammar is the fixed AST shape, not general JSON.
 *
 * Format example:
 * {"type":"PoisFromArea","tagK":"amenity","tagV":"cat_3",
 *  "area":{"type":"AreaByCoordinates","level":6,"lon":6.0,"lat":51.0}}
 */
object AstJson {

  import GeoAst._

  private def esc(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  def write(ast: GeoAst): String = ast match {
    case AreaByCoordinates(l, lon, lat) =>
      s"""{"type":"AreaByCoordinates","level":$l,"lon":$lon,"lat":$lat}"""
    case AreaByName(l, n) =>
      s"""{"type":"AreaByName","level":$l,"name":"${esc(n)}"}"""
    case AreasFromArea(l, p) =>
      s"""{"type":"AreasFromArea","level":$l,"parent":${write(p)}}"""
    case PoisFromArea(k, v, a) =>
      s"""{"type":"PoisFromArea","tagK":"${esc(k)}","tagV":"${esc(v)}","area":${write(a)}}"""
    case PoisFromCoordinates(k, lon, lat) =>
      s"""{"type":"PoisFromCoordinates","tagK":"${esc(k)}","lon":$lon,"lat":$lat}"""
    case Nearby(lon, lat, r) =>
      s"""{"type":"Nearby","lon":$lon,"lat":$lat,"radiusM":$r}"""
    case NearbyRanked(lon, lat, k) =>
      s"""{"type":"NearbyRanked","lon":$lon,"lat":$lat,"k":$k}"""
    case PoiByName(n) =>
      s"""{"type":"PoiByName","name":"${esc(n)}"}"""
    case BboxFetch(lo0, la0, lo1, la1) =>
      s"""{"type":"BboxFetch","lonMin":$lo0,"latMin":$la0,"lonMax":$lo1,"latMax":$la1}"""
    case KnnBatch(p, k, m) =>
      s"""{"type":"KnnBatch","probeSet":"${esc(p)}","k":$k,"pruneM":$m}"""
    case SnapshotRead(v) =>
      s"""{"type":"SnapshotRead","version":$v}"""
    case NameSearch(q, k) =>
      s"""{"type":"NameSearch","query":"${esc(q)}","k":$k}"""
  }

  /** Minimal recursive-descent parser for the fixed AST grammar. Returns
    * Left(error) on malformed input (the reference's unparseable-query
    * error message path, Flows.scala:117-122). */
  def read(s: String): Either[String, GeoAst] = {
    val p = new Parser(s)
    try {
      val ast = p.parseAst()
      p.skipWs()
      if (p.pos != s.length) Left(s"trailing input at ${p.pos}") else Right(ast)
    } catch {
      case e: ParseError => Left(e.getMessage)
    }
  }

  private final class ParseError(msg: String) extends RuntimeException(msg)

  private final class Parser(s: String) {
    var pos = 0
    def fail(msg: String): Nothing = throw new ParseError(s"$msg at $pos")
    def skipWs(): Unit = while (pos < s.length && s(pos).isWhitespace) pos += 1
    def expect(c: Char): Unit = { skipWs(); if (pos >= s.length || s(pos) != c) fail(s"expected '$c'"); pos += 1 }
    def parseString(): String = {
      expect('"')
      val sb = new StringBuilder
      while (pos < s.length && s(pos) != '"') {
        if (s(pos) == '\\') {
          pos += 1
          if (pos >= s.length) fail("bad escape")
          s(pos) match {
            case '"' => sb += '"'; case '\\' => sb += '\\'
            case 'n' => sb += '\n'; case 't' => sb += '\t'
            case 'u' =>
              if (pos + 4 >= s.length) fail("bad unicode escape")
              sb += Integer.parseInt(s.substring(pos + 1, pos + 5), 16).toChar; pos += 4
            case c => fail(s"bad escape '\\$c'")
          }
        } else sb += s(pos)
        pos += 1
      }
      expect('"')
      sb.result()
    }
    def parseNumber(): Double = {
      skipWs()
      val start = pos
      while (pos < s.length && (s(pos).isDigit || "+-.eE".contains(s(pos)))) pos += 1
      if (pos == start) fail("expected number")
      try s.substring(start, pos).toDouble catch { case _: NumberFormatException => fail("bad number") }
    }
    /** Parse one {"k":v,...} object into a field map (values: String |
      * Double | GeoAst). */
    def parseFields(): Map[String, Any] = {
      expect('{')
      var m = Map.empty[String, Any]
      skipWs()
      if (pos < s.length && s(pos) == '}') { pos += 1; return m }
      var done = false
      while (!done) {
        val k = parseString()
        expect(':')
        skipWs()
        val v: Any =
          if (pos < s.length && s(pos) == '"') parseString()
          else if (pos < s.length && s(pos) == '{') parseAstFields()
          else parseNumber()
        m += (k -> v)
        skipWs()
        if (pos < s.length && s(pos) == ',') pos += 1
        else { expect('}'); done = true }
      }
      m
    }
    def parseAstFields(): GeoAst = build(parseFields())
    def parseAst(): GeoAst = { skipWs(); parseAstFields() }

    private def str(m: Map[String, Any], k: String): String = m.get(k) match {
      case Some(v: String) => v; case _ => fail(s"missing string field '$k'")
    }
    private def num(m: Map[String, Any], k: String): Double = m.get(k) match {
      case Some(v: Double) => v; case _ => fail(s"missing number field '$k'")
    }
    private def ast(m: Map[String, Any], k: String): GeoAst = m.get(k) match {
      case Some(v: GeoAst) => v; case _ => fail(s"missing query field '$k'")
    }

    private def build(m: Map[String, Any]): GeoAst = str(m, "type") match {
      case "AreaByCoordinates" => AreaByCoordinates(num(m, "level").toInt, num(m, "lon"), num(m, "lat"))
      case "AreaByName" => AreaByName(num(m, "level").toInt, str(m, "name"))
      case "AreasFromArea" => AreasFromArea(num(m, "level").toInt, ast(m, "parent"))
      case "PoisFromArea" => PoisFromArea(str(m, "tagK"), str(m, "tagV"), ast(m, "area"))
      case "PoisFromCoordinates" => PoisFromCoordinates(str(m, "tagK"), num(m, "lon"), num(m, "lat"))
      case "Nearby" => Nearby(num(m, "lon"), num(m, "lat"), num(m, "radiusM"))
      case "NearbyRanked" => NearbyRanked(num(m, "lon"), num(m, "lat"), num(m, "k").toInt)
      case "PoiByName" => PoiByName(str(m, "name"))
      case "BboxFetch" => BboxFetch(num(m, "lonMin"), num(m, "latMin"), num(m, "lonMax"), num(m, "latMax"))
      case "KnnBatch" => KnnBatch(str(m, "probeSet"), num(m, "k").toInt, num(m, "pruneM"))
      case "SnapshotRead" => SnapshotRead(num(m, "version").toInt)
      case "NameSearch" => NameSearch(str(m, "query"), num(m, "k").toInt)
      case t => fail(s"unknown query type '$t'") // the reference's UnknownCommand
    }
  }
}
