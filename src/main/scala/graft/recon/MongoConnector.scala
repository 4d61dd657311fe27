package graft.recon

/**
 * Deploy-time option assembly for the MongoDB Spark connector (v10.x
 * `format("mongodb")` surface): maps a [[ReconConfig]] + builder-emitted
 * pipeline JSON to the exact option map a production read/write needs —
 * `aggregation.pipeline`, database/collection addressing, read/write
 * concern, partitioner sizing — so the wiring is ONE grammar-validated,
 * unit-tested call instead of hand-assembled strings at deploy time
 * (VERDICT r12 #8; reference reads/writes built ad hoc at
 * second_conciliate.py:120-226 and first_populate_table.py:24-57).
 *
 * Pure driver-side string work. The connector itself is not on this
 * classpath (zero-egress environment) — these maps feed
 * `spark.read.format("mongodb").options(...)` verbatim in production;
 * option keys are the connector's published unprefixed form (the
 * session-level `spark.mongodb.read.`/`.write.` prefix is added by
 * [[sessionPrefixed]] when the deployment configures the session instead
 * of the reader).
 *
 * Validation happens HERE, in unit-test territory: the pipeline must
 * parse against [[MongoGrammar]], names must be legal MongoDB
 * identifiers, and the URI must carry a mongodb scheme — a typo throws at
 * assembly, never at the first executor task against a live mongod.
 */
object MongoConnector {

  /** One addressable collection. `uri` is the cluster connection string
    * (`mongodb://` or `mongodb+srv://`). */
  final case class MongoTarget(uri: String, database: String, collection: String) {
    require(uri.startsWith("mongodb://") || uri.startsWith("mongodb+srv://"),
      s"connection uri must use a mongodb scheme: '$uri'")
    validateDbName(database)
    validateCollName(collection)
  }

  /** MongoDB database-name rules: non-empty, < 64 bytes, none of the
    * characters the server rejects (`/\. "$*<>:|?` and NUL). */
  private[recon] def validateDbName(db: String): Unit = {
    require(db.nonEmpty && db.getBytes("UTF-8").length < 64,
      s"database name length out of range (server limit is 64 BYTES): '$db'")
    val bad = "/\\. \"$*<>:|?\u0000"
    db.find(bad.contains(_)).foreach(c =>
      throw new IllegalArgumentException(
        s"database name '$db' contains illegal character '$c'"))
  }

  /** Collection-name rules: non-empty, no NUL, no leading/trailing '.',
    * no '$' (reserved for system namespaces), not starting with `system.`. */
  private[recon] def validateCollName(coll: String): Unit = {
    require(coll.nonEmpty, "collection name must be non-empty")
    require(!coll.contains('\u0000'), s"collection name '$coll' contains NUL")
    require(!coll.contains('$'), s"collection name '$coll' contains '$$'")
    require(!coll.startsWith(".") && !coll.endsWith("."),
      s"collection name '$coll' starts or ends with '.'")
    require(!coll.startsWith("system."),
      s"collection name '$coll' is in the reserved system namespace")
  }

  /**
   * Read-side option map: addressing + server-side `aggregation.pipeline`
   * (grammar-validated — a malformed stage throws here) + the partitioner
   * sizing that decides the scan's task fan-out. `samplePoolSize`/schema
   * inference options are left at connector defaults on purpose: the
   * recon path supplies explicit schemas ([[Sources]]), never inference.
   */
  def readOptions(target: MongoTarget, pipelineJson: Option[String],
      readConcernLevel: String = "majority",
      partitionField: String = "_id", partitionSizeMB: Int = 64,
      allowDiskUse: Boolean = true): Map[String, String] = {
    require(partitionSizeMB >= 1, s"partitionSizeMB must be >= 1: $partitionSizeMB")
    require(Set("local", "available", "majority", "linearizable", "snapshot")
      .contains(readConcernLevel), s"unknown readConcern level '$readConcernLevel'")
    pipelineJson.foreach(MongoGrammar.validatePipeline)
    Map(
      "connection.uri" -> target.uri,
      "database" -> target.database,
      "collection" -> target.collection,
      "readConcern.level" -> readConcernLevel,
      "partitioner" -> "com.mongodb.spark.sql.connector.read.partitioner.SamplePartitioner",
      "partitioner.options.partition.field" -> partitionField,
      "partitioner.options.partition.size" -> s"$partitionSizeMB",
      "aggregation.allowDiskUse" -> allowDiskUse.toString
    ) ++ pipelineJson.map("aggregation.pipeline" -> _)
  }

  /**
   * Write-side option map. `operationType` mirrors the reference's two
   * `$merge` modes: `update` ≡ whenMatched:merge (the S8 upsert),
   * `replace` ≡ replace, `insert` for append-only sinks; `idFields` is
   * the connector's `idFieldList` (the `on` keys of the `$merge`).
   */
  def writeOptions(target: MongoTarget, operationType: String,
      idFields: Seq[String] = Seq("_id"),
      writeConcernW: String = "majority",
      maxBatchSize: Int = 512): Map[String, String] = {
    require(Set("insert", "replace", "update").contains(operationType),
      s"unknown operationType '$operationType' (insert|replace|update)")
    require(idFields.nonEmpty && idFields.forall(f => f.nonEmpty && !f.contains(',')),
      s"idFields must be non-empty, comma-free names: $idFields")
    require(maxBatchSize >= 1, s"maxBatchSize must be >= 1: $maxBatchSize")
    require(writeConcernW == "majority" || writeConcernW.matches("""\d+"""),
      s"writeConcern.w must be 'majority' or a replica count: '$writeConcernW'")
    Map(
      "connection.uri" -> target.uri,
      "database" -> target.database,
      "collection" -> target.collection,
      "operationType" -> operationType,
      "idFieldList" -> idFields.mkString(","),
      "writeConcern.w" -> writeConcernW,
      "maxBatchSize" -> s"$maxBatchSize")
  }

  /** The S1 scan wired end-to-end: [[MongoPipelines.scanPipeline]] (own
    * grammar validation inside) assembled into the read option map — the
    * "one tested line" a production deployment calls. */
  def scanOptions(conf: ReconConfig, target: MongoTarget, fields: Seq[String],
      statusIn: Seq[String], statusField: String, tsField: String,
      fromMs: Long, toMs: Long): Map[String, String] =
    readOptions(target, Some(MongoPipelines.scanPipeline(
      conf, fields, statusIn, statusField, tsField, fromMs, toMs)))

  /** The S8 interval upsert's write map: whenMatched:merge ≡ update on
    * the `on` keys (reference second_conciliate.py:420-440); the seed
    * job's keepExisting has no connector operationType — it stays a
    * server-side `$merge` pipeline (see [[MongoPipelines.mergeStage]]). */
  def upsertOptions(target: MongoTarget, onFields: Seq[String]): Map[String, String] =
    writeOptions(target, operationType = "update", idFields = onFields)

  /** Re-key an unprefixed option map for session-level configuration
    * (`spark.mongodb.read.*` / `spark.mongodb.write.*`). */
  def sessionPrefixed(options: Map[String, String], write: Boolean): Map[String, String] = {
    val prefix = if (write) "spark.mongodb.write." else "spark.mongodb.read."
    options.map { case (k, v) => (prefix + k) -> v }
  }
}
