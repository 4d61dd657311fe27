package graft.recon

/**
 * Builders for the MongoDB aggregation-pipeline JSON the production path
 * ships to the server — the Spark analog plugs these into the mongo-spark
 * connector's `aggregation.pipeline` option so `$match`/`$project` run on
 * mongod exactly as the reference does (reference: pipeline JSON built at
 * src/data_extractor.py:31-47, src/expression_builder.py:22-43,
 * second_conciliate.py:120-226, seed job first_populate_table.py:24-57).
 *
 * Pure string builders — unit-testable offline, no driver dependency. In
 * this environment file sources + Catalyst pushdown play the mongod role
 * (SURVEY §4); these builders exist so a production deployment is a config
 * change, not a rewrite.
 *
 * Every builder SELF-VALIDATES its emission against the aggregation
 * grammar ([[MongoGrammar]]) before returning — a malformed stage throws
 * here, in unit-test territory, not at deploy time against a live mongod.
 */
object MongoPipelines {

  private def validated(stageJson: String): String = {
    MongoGrammar.validateStages(stageJson)
    stageJson
  }

  private def jsonStr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  /** `$match` on processor/status/time-window (reference:
    * src/data_extractor.py:33-44). */
  def matchStage(
      statusIn: Seq[String],
      statusField: String,
      tsField: String,
      fromMs: Long,
      toMs: Long,
      extraEq: Map[String, String] = Map.empty): String = {
    val eqs = extraEq.map { case (k, v) => s"${jsonStr(k)}: ${jsonStr(v)}" }
    val parts = eqs ++ Seq(
      s"${jsonStr(statusField)}: {$$in: [${statusIn.map(jsonStr).mkString(", ")}]}",
      s"${jsonStr(tsField)}: {$$gte: $fromMs, $$lt: $toMs}")
    validated(s"{$$match: {${parts.mkString(", ")}}}")
  }

  /** Stringify `$project`: `$toString` for untyped fields, passthrough for
    * the long/double overrides (reference: src/expression_builder.py:29-43). */
  def projectStage(fields: Seq[String], types: FieldTypes): String = {
    val parts = fields.map { f =>
      if (types.longFields.contains(f) || types.doubleFields.contains(f))
        s"${jsonStr(f)}: 1"
      else
        s"${jsonStr(f)}: {$$toString: ${jsonStr("$" + f)}}"
    }
    validated(s"{$$project: {${parts.mkString(", ")}}}")
  }

  /** `$lookup`+`$unwind` remanent re-read (reference:
    * src/data_extractor.py:68-75). */
  def lookupUnwind(fromColl: String, idField: String, asField: String): String =
    validated(
      s"""{$$lookup: {from: ${jsonStr(fromColl)}, localField: ${jsonStr(idField)}, """ +
        s"""foreignField: ${jsonStr(idField)}, as: ${jsonStr(asField)}}}, """ +
        s"""{$$unwind: ${jsonStr("$" + asField)}}""")

  /** `$merge` upsert stage (reference: second_conciliate.py:431-438 merge
    * mode; first_populate_table.py:48-55 keepExisting mode). */
  def mergeStage(intoColl: String, keepExisting: Boolean): String = {
    val whenMatched = if (keepExisting) "keepExisting" else "merge"
    validated(
      s"""{$$merge: {into: ${jsonStr(intoColl)}, on: "_id", """ +
        s"""whenMatched: ${jsonStr(whenMatched)}, whenNotMatched: "insert"}}""")
  }

  /** Full scan pipeline: `[$match, $project]` (reference:
    * src/data_extractor.py:26-50). */
  def scanPipeline(conf: ReconConfig, fields: Seq[String], statusIn: Seq[String],
      statusField: String, tsField: String, fromMs: Long, toMs: Long): String =
    {
    val p = s"[${matchStage(statusIn, statusField, tsField, fromMs, toMs)}, " +
      s"${projectStage(fields, conf.types)}]"
    MongoGrammar.validatePipeline(p)
    p
  }
}
