package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.recon.{FieldTypes, KeyPair, MongoConnector, MongoPipelines, ReconConfig}
import graft.recon.MongoConnector.MongoTarget

/** Deploy-time connector option assembly: the maps carry exactly the
  * connector's published keys, the pipeline rides grammar-validated, and
  * every escaping/illegal-name edge throws at assembly. Pure string work,
  * no Spark session. */
class MongoConnectorSpec extends AnyFunSuite {

  private val target = MongoTarget("mongodb://host:27017", "sales", "transactions")
  private val conf = ReconConfig(
    keys = Seq(KeyPair("ext_amount", "approved_transaction_amount")),
    types = FieldTypes(longFields = Set("create_timestamp"),
      doubleFields = Set("approved_transaction_amount")))

  test("scanOptions: one call assembles the full S1 read map, pipeline validated") {
    val opts = MongoConnector.scanOptions(conf, target,
      fields = Seq("_id", "transaction_code", "create_timestamp"),
      statusIn = Seq("APPROVED", "REVERSED"),
      statusField = "transaction_status_type", tsField = "create_timestamp",
      fromMs = 1714500000000L, toMs = 1714586400000L)
    assert(opts("connection.uri") == "mongodb://host:27017")
    assert(opts("database") == "sales" && opts("collection") == "transactions")
    assert(opts("readConcern.level") == "majority")
    assert(opts("partitioner.options.partition.field") == "_id")
    assert(opts("partitioner.options.partition.size") == "64")
    // the pipeline option is the EXACT builder emission — no re-escaping
    val expected = MongoPipelines.scanPipeline(conf,
      Seq("_id", "transaction_code", "create_timestamp"),
      Seq("APPROVED", "REVERSED"), "transaction_status_type", "create_timestamp",
      1714500000000L, 1714586400000L)
    assert(opts("aggregation.pipeline") == expected)
    // and it still parses as a pipeline (round-trip through the grammar)
    graft.recon.MongoGrammar.validatePipeline(opts("aggregation.pipeline"))
  }

  test("quotes and backslashes in match values survive into a parseable pipeline option") {
    val pipeline = "[" + MongoPipelines.matchStage(Seq("A\"B", "C\\D"),
      "status", "ts", 0L, 1L, extraEq = Map("note" -> "tab\there")) + "]"
    val opts = MongoConnector.readOptions(target, Some(pipeline))
    assert(opts("aggregation.pipeline").contains("\\\"") &&
      opts("aggregation.pipeline").contains("\\\\"))
    graft.recon.MongoGrammar.validatePipeline(opts("aggregation.pipeline"))
  }

  test("a malformed pipeline throws at assembly, not at deploy") {
    intercept[IllegalArgumentException](
      MongoConnector.readOptions(target, Some("""[{$macth: {a: 1}}]""")))
    intercept[IllegalArgumentException](
      MongoConnector.readOptions(target, Some("""not json""")))
  }

  test("upsertOptions mirrors the reference's whenMatched:merge as operationType=update") {
    val opts = MongoConnector.upsertOptions(target, Seq("transaction_code", "ext_id"))
    assert(opts("operationType") == "update")
    assert(opts("idFieldList") == "transaction_code,ext_id")
    assert(opts("writeConcern.w") == "majority")
    assert(opts("maxBatchSize") == "512")
  }

  test("illegal names, schemes, and enum values throw with the offending value") {
    intercept[IllegalArgumentException](MongoTarget("http://x", "db", "c"))
    intercept[IllegalArgumentException](MongoTarget("mongodb://x", "bad db", "c"))
    intercept[IllegalArgumentException](MongoTarget("mongodb://x", "bad$db", "c"))
    intercept[IllegalArgumentException](MongoTarget("mongodb://x", "a.b", "c"))
    intercept[IllegalArgumentException](MongoTarget("mongodb://x", "", "c"))
    intercept[IllegalArgumentException](MongoTarget("mongodb://x", "db", "sys$coll"))
    intercept[IllegalArgumentException](MongoTarget("mongodb://x", "db", ".c"))
    intercept[IllegalArgumentException](MongoTarget("mongodb://x", "db", "system.views"))
    intercept[IllegalArgumentException](MongoTarget("mongodb://x", "db", "c\u0000x"))
    intercept[IllegalArgumentException](
      MongoConnector.readOptions(target, None, readConcernLevel = "strong"))
    intercept[IllegalArgumentException](
      MongoConnector.writeOptions(target, operationType = "upsert"))
    intercept[IllegalArgumentException](
      MongoConnector.writeOptions(target, "update", idFields = Seq("a,b")))
    intercept[IllegalArgumentException](
      MongoConnector.writeOptions(target, "update", writeConcernW = "most"))
  }

  test("sessionPrefixed re-keys for session-level configuration") {
    val opts = MongoConnector.readOptions(target, None)
    val prefixed = MongoConnector.sessionPrefixed(opts, write = false)
    assert(prefixed.keySet.forall(_.startsWith("spark.mongodb.read.")))
    assert(prefixed("spark.mongodb.read.database") == "sales")
    val w = MongoConnector.sessionPrefixed(
      MongoConnector.writeOptions(target, "insert"), write = true)
    assert(w("spark.mongodb.write.operationType") == "insert")
  }
}
