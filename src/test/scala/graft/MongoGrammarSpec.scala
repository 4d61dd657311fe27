package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.recon.{FieldTypes, MongoGrammar, MongoPipelines, ReconConfig, KeyPair}

/** The aggregation-grammar validator: every [[MongoPipelines]] emission
  * parses and validates; hand-mutated near-misses fail with a located
  * error. Pure string work, no Spark session. */
class MongoGrammarSpec extends AnyFunSuite {

  private val types = FieldTypes(
    longFields = Set("create_timestamp"),
    doubleFields = Set("approved_transaction_amount"))
  private val conf = ReconConfig(
    keys = Seq(KeyPair("ext_importe", "approved_transaction_amount")),
    types = types)

  test("every builder emission validates against the grammar") {
    // builders self-validate; reaching the assertion at all is the test,
    // but re-validate explicitly so a future builder bypass still fails here
    val m = MongoPipelines.matchStage(Seq("APPROVED", "REVERSED"),
      "transaction_status_type", "create_timestamp", 1714500000000L, 1714586400000L,
      extraEq = Map("processor_name" -> "acme"))
    MongoGrammar.validateStages(m)
    val p = MongoPipelines.projectStage(
      Seq("_id", "transaction_code", "create_timestamp", "approved_transaction_amount"),
      types)
    MongoGrammar.validateStages(p)
    MongoGrammar.validateStages(
      MongoPipelines.lookupUnwind("sales_remanent", "_id", "rem"))
    MongoGrammar.validateStages(MongoPipelines.mergeStage("recon_out", keepExisting = true))
    MongoGrammar.validateStages(MongoPipelines.mergeStage("recon_out", keepExisting = false))
    MongoGrammar.validatePipeline(MongoPipelines.scanPipeline(conf,
      Seq("_id", "transaction_code", "create_timestamp"),
      Seq("APPROVED"), "transaction_status_type", "create_timestamp", 0L, 1L))
  }

  test("special characters in values survive the escape round-trip") {
    val m = MongoPipelines.matchStage(Seq("A\"B", "C\\D"),
      "status", "ts", 0L, 1L, extraEq = Map("note" -> "tab\there"))
    MongoGrammar.validateStages(m) // would throw on a broken escape
  }

  private def rejected(fragment: String, needle: String): Unit = {
    val e = intercept[IllegalArgumentException](MongoGrammar.validateStages(fragment))
    assert(e.getMessage.contains(needle), s"message '${e.getMessage}' lacks '$needle'")
  }

  test("grammar rejects the near-misses a typo'd builder would emit") {
    // unknown stage operator
    rejected("""{$macth: {a: 1}}""", "unknown stage operator")
    // two operators in one stage object
    rejected("""{$match: {a: 1}, $project: {a: 1}}""", "exactly ONE operator")
    // $in must take an array
    rejected("""{$match: {status: {$in: "APPROVED"}}}""", "$in")
    // unknown comparison operator
    rejected("""{$match: {ts: {$gte: 1, $ltt: 2}}}""", "unknown comparison operator")
    // projection values limited to 0 / 1 / {$toString: "$f"}
    rejected("""{$project: {a: 2}}""", "projection value")
    rejected("""{$project: {a: {$toString: "f"}}}""", "$toString")
    // $unwind must be a $-path
    rejected("""{$unwind: "rem"}""", "must start with")
    // $merge modes are enumerated
    rejected("""{$merge: {into: "t", whenMatched: "keepExisting ", whenNotMatched: "insert"}}""",
      "unknown mode")
    rejected("""{$merge: {into: "t", whenNotMatched: "upsert"}}""", "unknown mode")
    // $lookup shape is closed
    rejected("""{$lookup: {from: "c", localField: "_id", as: "r"}}""", "missing keys")
    rejected(
      """{$lookup: {from: "c", localField: "_id", foreignField: "_id", as: "r", let: "x"}}""",
      "unknown keys")
    // $sort / $limit operand shapes
    rejected("""{$sort: {a: 2}}""", "$sort")
    rejected("""{$limit: 0}""", "positive integer")
  }

  test("reference-shaped object forms validate: $unwind {path}, $merge.into {db, coll}") {
    // the reference emits {"$unwind": {"path": "$transaction"}} and
    // addresses $merge targets as {db, coll} — both must pass (ADVICE r12)
    MongoGrammar.validateStages("""{$unwind: {path: "$transaction"}}""")
    MongoGrammar.validateStages(
      """{$unwind: {path: "$rem", includeArrayIndex: "i", preserveNullAndEmptyArrays: false}}""")
    MongoGrammar.validateStages(
      """{$merge: {into: {db: "sales", coll: "recon_out"}, on: "_id", whenMatched: "merge"}}""")
    // and their near-misses still fail with a located error
    rejected("""{$unwind: {path: "rem"}}""", "must start with")
    rejected("""{$unwind: {paht: "$rem"}}""", "path")
    rejected("""{$unwind: {path: "$rem", arrayIndex: "i"}}""", "unknown keys")
    rejected("""{$unwind: {path: "$rem", preserveNullAndEmptyArrays: "yes"}}""", "boolean")
    rejected("""{$unwind: 1}""", "operand must be")
    rejected("""{$merge: {into: {db: "sales"}, on: "_id"}}""", "into.coll")
    rejected("""{$merge: {into: {db: "sales", coll: ""}, on: "_id"}}""", "into.coll")
    rejected("""{$merge: {into: {db: "s", coll: "c", shard: "x"}}}""", "unknown keys")
  }

  test("parser rejects malformed JSON outright") {
    intercept[IllegalArgumentException](MongoGrammar.validatePipeline("""[{$match: {a: 1}}"""))
    intercept[IllegalArgumentException](MongoGrammar.validatePipeline("""[{$match: {a: 1}}] x"""))
    intercept[IllegalArgumentException](MongoGrammar.validatePipeline("""not json"""))
    intercept[IllegalArgumentException](MongoGrammar.validatePipeline("""[{$match: {a: 1,}}]"""))
  }

  test("pipeline must be a non-empty array of stage objects") {
    intercept[IllegalArgumentException](MongoGrammar.validatePipeline("[]"))
    intercept[IllegalArgumentException](MongoGrammar.validatePipeline("""{"a": 1}"""))
    intercept[IllegalArgumentException](MongoGrammar.validatePipeline("""[1, 2]"""))
  }
}
