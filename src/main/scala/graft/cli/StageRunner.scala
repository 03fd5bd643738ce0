package graft.cli

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit}

import graft.config.PipelineConfig.Stage
import graft.ops.{AfpStore, DedupStore, IvfIndex, IvfPqStore, PhashStore,
  PqStore, StoreMaintenance}

/** Executes one declarative analytics stage
  * ([[graft.config.PipelineConfig.Stage]]) and returns the DataFrame
  * the orchestrator lands on the stage's sink — the analytics analog
  * of a module's SQL result, flowing through the SAME writer stack
  * (parquet warehouse / postgres / clickhouse / bigquery, MERGE when
  * a primary key is declared).
  *
  *  - `kind: query` resolves the operator from the
  *    [[graft.queries.Extensions.queries]] registry and runs it
  *    against the stage's `input_dir` — the whole operator surface
  *    (dedup, curation, text quality, ANN, corpus stats, …) is
  *    YAML-orchestratable with no per-operator glue, and the result
  *    relation is exactly the gate-verified one. `columns:` /
  *    `table:` / `table_as:` adapt a NON-fixture corpus into the
  *    operator's expected shape (plan-level renames — pruning and
  *    pushdown reach the real scan), and `input_stage:` chains the
  *    stage onto a PRIOR stage's landed output.
  *  - `kind: store` drives the persisted-store lifecycle. Build /
  *    rebuild / append / compact / maintain run the maintenance op
  *    (under the store's maintainer lease, loud on a second
  *    maintainer — the library contract rides through unchanged), and
  *    the stage's OUTPUT is the store's post-action stats relation
  *    tagged with (stage, action, compacted): the run's audit row, so
  *    a season of scheduled pipeline runs leaves a queryable
  *    maintenance history in the warehouse instead of a log trail.
  *    `action: recommend` lands the rebuild-vs-compact-vs-ok ADVISORY
  *    row for ANY of the four stores, judged at the stage's own
  *    `margin`/`min_cosine`/threshold knobs; `action: rebuild` ACTS
  *    on it — a fresh save() from the stage's current corpus under
  *    the maintainer lease, so a fingerprint-drifted store goes
  *    recommend("rebuild") → rebuild → recommend("ok") from YAML
  *    alone.
  *  - `kind: stream` drives the streaming modules
  *    ([[graft.streaming.StreamingIndexIngest]] /
  *    [[graft.streaming.StreamingEmbeddingDedup]] /
  *    [[graft.streaming.StreamingStoreDedup]] /
  *    [[graft.streaming.StreamingClassify]]) as an INCREMENTAL DRAIN:
  *    start the stream over `source_dir`, process everything
  *    available, stop. The REQUIRED durable `checkpoint:` is what
  *    makes successive scheduled CLI runs exactly-once — a restart
  *    resumes at the unprocessed files, and replayed micro-batches
  *    land idempotently (ingest-keyed store appends, batch-keyed
  *    output partitions). This is the reference's scheduled
  *    incremental-pull premise, carried to the store/dedup surface.
  */
object StageRunner {

  /** `priorOutput` resolves an `input_stage:` name to that stage's
    * landed relation (the orchestrator passes the warehouse read);
    * the default refuses loudly for direct library callers.
    */
  def run(spark: SparkSession, stage: Stage,
      priorOutput: String => DataFrame = noChain): DataFrame =
    stage.kind match {
      case "query" => runQuery(spark, stage, priorOutput)
      case "store" => runStore(spark, stage, priorOutput)
      case "stream" => runStream(spark, stage, priorOutput)
      case other =>
        // unreachable after config validation; loud anyway
        throw new IllegalArgumentException(
          s"stage '${stage.name}': unknown kind '$other'")
    }

  private def noChain(name: String): DataFrame =
    throw new IllegalArgumentException(
      s"input_stage '$name' needs an orchestrator-provided resolver " +
        "(run the stage through the CLI with a file warehouse)")

  /** The stage's adapted input relation, when the stage declares one:
    * a prior stage's landed output (`input_stage:`) or a named parquet
    * table under `input_dir` (`table:`), with `columns:` renamed from
    * the source schema into the operator's expected names — loudly on
    * a missing source column (withColumnRenamed would silently no-op,
    * and a typo'd mapping must not quietly run the operator on the
    * wrong column).
    */
  private def adaptedInput(spark: SparkSession, stage: Stage,
      priorOutput: String => DataFrame, default: String): Option[DataFrame] = {
    val declared = stage.inputStage.isDefined || stage.table.isDefined ||
      stage.columns.nonEmpty || stage.tableAs.isDefined
    if (!declared) None
    else {
      // with no explicit `table:`, a declared `table_as:` names BOTH
      // the overlay target and the source table — a stage adapting an
      // embeddings-shaped corpus must not silently read documents
      val src = stage.inputStage.map(priorOutput).getOrElse(
        graft.engine.Tables.table(spark, stage.inputDir,
          stage.table.getOrElse(stage.tableAs.getOrElse(default))))
      Some(stage.columns.foldLeft(src) { case (df, (expected, source)) =>
        require(df.columns.contains(source),
          s"stage '${stage.name}': columns maps '$expected' from " +
            s"'$source', which is not in the input " +
            s"(${df.columns.mkString(", ")})")
        // withColumnRenamed onto an already-present name would yield
        // DUPLICATE columns and an ambiguous-reference error deep in
        // the operator's plan — refuse here with the stage named
        require(expected == source || !df.columns.contains(expected),
          s"stage '${stage.name}': columns maps '$expected' from " +
            s"'$source', but the input already has a '$expected' " +
            "column — renaming would create duplicates")
        df.withColumnRenamed(source, expected)
      })
    }
  }

  private def runQuery(spark: SparkSession, stage: Stage,
      priorOutput: String => DataFrame): DataFrame = {
    val name = stage.query.get
    val q = graft.queries.Extensions.queries.getOrElse(name,
      throw new IllegalArgumentException(
        s"stage '${stage.name}': unknown operator '$name' — " +
          "not in the Extensions registry"))
    adaptedInput(spark, stage, priorOutput, default = "documents") match {
      case None => q(spark, stage.inputDir)
      case Some(adapted) =>
        // the operator reads its tables by NAME: overlay the adapted
        // relation under the name it expects (default `documents`;
        // `table_as: embeddings` for the vector operators). The plan
        // is BUILT inside the scope, so the substitution sticks.
        val as = stage.tableAs.getOrElse("documents")
        graft.engine.Tables.withOverlay(Map(as -> adapted))(
          q(spark, stage.inputDir))
    }
  }

  private def runStore(spark: SparkSession, stage: Stage,
      priorOutput: String => DataFrame): DataFrame = {
    val dir = stage.dir.get
    val store = stage.store.get
    val action = stage.action.get
    def embeddings: DataFrame =
      adaptedInput(spark, stage, priorOutput, default = "embeddings")
        .getOrElse(graft.engine.Tables.table(spark, stage.inputDir,
          "embeddings"))
    def documents: DataFrame =
      adaptedInput(spark, stage, priorOutput, default = "documents")
        .getOrElse(graft.engine.Tables.table(spark, stage.inputDir,
          "documents"))
    // advisory/dedup knobs: the stage's own bar, else the ONE shared
    // set of library defaults (StoreMaintenance.Default*) — an
    // advisory judged at a margin the deployment does not run is the
    // "silent knob" class the round-15 certification work exists to
    // kill, and a default retune must reach YAML and library callers
    // together
    val margin = stage.margin.getOrElse(StoreMaintenance.DefaultMargin)
    val minCosine =
      stage.minCosine.getOrElse(StoreMaintenance.DefaultMinCosine)
    val maxTombstoneRatio = stage.maxTombstoneRatio
      .getOrElse(StoreMaintenance.DefaultMaxTombstoneRatio)
    val maxIngests =
      stage.maxIngests.getOrElse(StoreMaintenance.DefaultMaxIngests)
    // `dedup` is the one action whose OUTPUT is the operator relation
    // (flagged near-duplicates of the incoming batch against the
    // persisted history), not the stats audit row — the incremental
    // step of a declarative curation pipeline: yesterday's store,
    // today's batch, flags to the sink
    // `recommend` lands the maintenance ADVISORY row (rebuild vs
    // compact vs ok, from stats + lineage + the sampled margin gap) —
    // a scheduled pipeline run leaves the decision trail in the
    // warehouse next to the stats audit rows. The stage's corpus rides
    // in for the lineage-drift check.
    // `auto` closes the whole loop in ONE scheduled stage: compute the
    // advisory (at the stage's knobs, against the stage's corpus),
    // then ACT on it — ok → nothing, compact → compact, rebuild → a
    // fresh save() from the current corpus — and land the advisory row
    // tagged with what was done. The nightly maintenance cron becomes
    // one YAML stage whose audit trail shows both the decision and the
    // action taken.
    if (action == "auto") {
      val advice = recommendFor(spark, store, dir,
        embeddings, documents, margin, minCosine, maxTombstoneRatio,
        maxIngests)
      val head = advice.head()
      val verdict = head.getString(head.fieldIndex("recommendation"))
      verdict match {
        case "rebuild" => store match {
          case "dedup" => DedupStore.save(documents, dir)
          case "phash" => PhashStore.save(documents, dir)
          case "afp" => AfpStore.save(documents, dir)
          case "ivf" => IvfIndex.save(embeddings, dir)
          case "pq" => PqStore.save(embeddings, dir)
          case "ivfpq" => IvfPqStore.save(embeddings, dir)
        }
        case "compact" => store match {
          case "dedup" => DedupStore.compact(spark, dir)
          case "phash" => PhashStore.compact(spark, dir)
          case "afp" => AfpStore.compact(spark, dir)
          case "ivf" => IvfIndex.compact(spark, dir)
          case "pq" => PqStore.compact(spark, dir)
          case "ivfpq" => IvfPqStore.compact(spark, dir)
        }
        case _ => // ok: nothing to do
      }
      return advice.withColumn("stage", lit(stage.name))
        .withColumn("acted", lit(verdict != "ok"))
    }
    if (action == "recommend") return recommendFor(spark, store, dir,
      embeddings, documents, margin, minCosine, maxTombstoneRatio,
      maxIngests).withColumn("stage", lit(stage.name))
    // `delete` files tombstones from a declared takedown relation (a
    // GDPR erasure / license takedown batch, from YAML): retraction is
    // immediate (queries anti-join the ids out), physical reclaim is
    // the next compact/maintain — the library lifecycle, declared. The
    // ids come from the stage's input (default table `takedowns`,
    // adaptable via table/columns/input_stage); malformed ids refuse
    // loudly through requireLongIds, never a silent non-retraction.
    if (action == "delete") {
      val idCol =
        if (Set("dedup", "phash", "afp")(store)) "doc_id" else "vec_id"
      val rel = adaptedInput(spark, stage, priorOutput,
        default = "takedowns").getOrElse(
        graft.engine.Tables.table(spark, stage.inputDir, "takedowns"))
      require(rel.columns.contains(idCol),
        s"stage '${stage.name}': action 'delete' needs column '$idCol' " +
          s"in the takedown relation (${rel.columns.mkString(", ")}) — " +
          "map it via 'columns:'")
      val ids = rel.select(col(idCol))
      store match {
        case "dedup" => DedupStore.delete(ids, dir)
        case "phash" => PhashStore.delete(ids, dir)
        case "afp" => AfpStore.delete(ids, dir)
        case "ivf" => IvfIndex.delete(ids, dir)
        case "pq" => PqStore.delete(ids, dir)
        case "ivfpq" => IvfPqStore.delete(ids, dir)
      }
      return statsAudit(spark, stage, store, dir, "delete",
        compacted = false)
    }
    if (action == "dedup") return store match {
      case "dedup" => DedupStore.dedupAgainst(spark, documents, dir)
      // the incremental image/audio step: decode TODAY'S batch only,
      // flag it against the stored fingerprints — the corpus never
      // re-decodes
      case "phash" => PhashStore.dedupAgainst(spark, documents, dir)
      case "afp" => AfpStore.dedupAgainst(spark, documents, dir)
      case "ivfpq" => IvfPqStore.dedupAgainst(spark, dir,
        embeddings.select(col("vec_id").as("query_id"),
          col("embedding").as("qv")),
        minCosine = minCosine, margin = margin)
      case other => throw new IllegalArgumentException(
        s"stage '${stage.name}': action 'dedup' supports the dedup, " +
          s"phash, afp and ivfpq stores, not '$other'")
    }
    var compacted = false
    (store, action) match {
      // `rebuild` IS save(): a fresh version root re-fit from the
      // stage's CURRENT corpus, committed by marker under the
      // maintainer lease — the ACT half of the recommend advisory
      // (geometry re-fits, lineage re-fingerprints, tombstones and
      // fragmentation reset with the fresh build)
      case ("dedup", "build" | "rebuild") => DedupStore.save(documents, dir)
      case ("dedup", "append") =>
        DedupStore.append(documents, dir, stage.ingestId.get)
      case ("dedup", "compact") => DedupStore.compact(spark, dir)
      case ("dedup", "maintain") =>
        compacted = StoreMaintenance.maintainDedup(spark, dir,
          maxTombstoneRatio, maxIngests)
      // the image fingerprint store: same lifecycle verbs, decode paid
      // once at build/append, never again
      case ("phash", "build" | "rebuild") => PhashStore.save(documents, dir)
      case ("phash", "append") =>
        PhashStore.append(documents, dir, stage.ingestId.get)
      case ("phash", "compact") => PhashStore.compact(spark, dir)
      case ("phash", "maintain") =>
        compacted = StoreMaintenance.maintainPhash(spark, dir,
          maxTombstoneRatio, maxIngests)
      // the audio fingerprint store: the same shared lifecycle
      case ("afp", "build" | "rebuild") => AfpStore.save(documents, dir)
      case ("afp", "append") =>
        AfpStore.append(documents, dir, stage.ingestId.get)
      case ("afp", "compact") => AfpStore.compact(spark, dir)
      case ("afp", "maintain") =>
        compacted = StoreMaintenance.maintainAfp(spark, dir,
          maxTombstoneRatio, maxIngests)
      case ("ivf", "build" | "rebuild") => IvfIndex.save(embeddings, dir)
      case ("ivf", "append") =>
        IvfIndex.append(embeddings, dir, stage.ingestId.get)
      case ("ivf", "compact") => IvfIndex.compact(spark, dir)
      case ("ivf", "maintain") =>
        compacted = StoreMaintenance.maintainIvf(spark, dir,
          maxTombstoneRatio, maxIngests)
      case ("pq", "build" | "rebuild") => PqStore.save(embeddings, dir)
      case ("pq", "append") =>
        PqStore.append(embeddings, dir, stage.ingestId.get)
      case ("pq", "compact") => PqStore.compact(spark, dir)
      case ("pq", "maintain") =>
        compacted = StoreMaintenance.maintainPq(spark, dir,
          maxTombstoneRatio, maxIngests)
      // the classifier model is a store too (build once, score many):
      // `build`/`rebuild` train from the stage's (adaptable) corpus and
      // commit a fresh version — the labels come from the corpus' `lang`
      // column, so a differently-labeled corpus maps it via `columns:`
      case ("classifier", "build" | "rebuild") =>
        graft.ops.Classify.saveModel(documents, dir)
      case ("ivfpq", "build" | "rebuild") => IvfPqStore.save(embeddings, dir)
      case ("ivfpq", "append") =>
        IvfPqStore.append(embeddings, dir, stage.ingestId.get)
      case ("ivfpq", "compact") => IvfPqStore.compact(spark, dir)
      case ("ivfpq", "maintain") =>
        compacted = StoreMaintenance.maintainIvfPq(spark, dir,
          maxTombstoneRatio, maxIngests)
      case (_, "stats") => // introspection only, no maintenance op
      case other => throw new IllegalArgumentException(
        s"stage '${stage.name}': unsupported $other")
    }
    statsAudit(spark, stage, store, dir, action, compacted)
  }

  /** One advisory body for the `recommend` and `auto` actions: the
    * stage's corpus rides in for the lineage-drift check, the stage's
    * knobs set the bar.
    */
  private def recommendFor(spark: SparkSession, store: String, dir: String,
      embeddings: => DataFrame, documents: => DataFrame,
      margin: Double, minCosine: Double, maxTombstoneRatio: Double,
      maxIngests: Long): DataFrame = store match {
    case "ivfpq" => StoreMaintenance.recommendIvfPq(spark, dir,
      corpus = Some(embeddings), margin = margin, minCosine = minCosine,
      maxTombstoneRatio = maxTombstoneRatio, maxIngests = maxIngests)
    case "pq" => StoreMaintenance.recommendPq(spark, dir,
      corpus = Some(embeddings), margin = margin, minCosine = minCosine,
      maxTombstoneRatio = maxTombstoneRatio, maxIngests = maxIngests)
    case "ivf" => StoreMaintenance.recommendIvf(spark, dir,
      corpus = Some(embeddings),
      maxTombstoneRatio = maxTombstoneRatio, maxIngests = maxIngests)
    case "dedup" => StoreMaintenance.recommendDedup(spark, dir,
      corpus = Some(documents),
      maxTombstoneRatio = maxTombstoneRatio, maxIngests = maxIngests)
    case "phash" => StoreMaintenance.recommendPhash(spark, dir,
      corpus = Some(documents),
      maxTombstoneRatio = maxTombstoneRatio, maxIngests = maxIngests)
    case "afp" => StoreMaintenance.recommendAfp(spark, dir,
      corpus = Some(documents),
      maxTombstoneRatio = maxTombstoneRatio, maxIngests = maxIngests)
  }

  private def statsAudit(spark: SparkSession, stage: Stage, store: String,
      dir: String, action: String, compacted: Boolean): DataFrame = {
    val stats = store match {
      case "dedup" => DedupStore.stats(spark, dir)
      case "phash" => PhashStore.stats(spark, dir)
      case "afp" => AfpStore.stats(spark, dir)
      case "ivf" => IvfIndex.stats(spark, dir)
      case "pq" => PqStore.stats(spark, dir)
      case "ivfpq" => IvfPqStore.stats(spark, dir)
      case "classifier" => graft.ops.Classify.modelStats(spark, dir)
    }
    val statCols = stats.columns.toSeq
    stats
      .withColumn("stage", lit(stage.name))
      .withColumn("action", lit(action))
      .withColumn("compacted", lit(compacted))
      .select((Seq("stage", "action", "compacted") ++ statCols).map(col): _*)
  }

  /** Drain-what's-available streaming: start, processAllAvailable,
    * stop. With the stage's durable checkpoint this is the scheduled
    * incremental regime — each CLI run picks up exactly the source
    * files that arrived since the last one.
    */
  private def runStream(spark: SparkSession, stage: Stage,
      priorOutput: String => DataFrame): DataFrame = {
    val sourceDir = stage.sourceDir.get
    val checkpoint = stage.checkpoint.get
    val throttle = stage.maxFilesPerTrigger.getOrElse(0)
    // a scheduled run may legitimately fire before the source has
    // produced its first drop (the nightly pipeline racing the
    // crawler): that's a NO-OP drain, not an error — schema inference
    // on an empty dir would throw, so gate the drain on data existing
    val srcReady = hasDataFiles(spark, sourceDir)
    // the file stream needs an explicit schema: one metadata-only
    // batch read of the source dir provides it (schema inference off
    // a dir the stage DECLARES, not a guess)
    def schema = spark.read.parquet(sourceDir).schema
    // every stream that reads or grows a persisted store must find a
    // COMMITTED version: the first scheduled run legitimately races
    // both the crawler AND the initial build, and surfacing that as a
    // requireRoot stack out of the post-drain audit read (or a wrapped
    // streaming exception mid-drain) buries the fix — refuse up front
    // with the action that unblocks it (r16 ADVICE)
    def requireStore(dir: String, what: String): Unit =
      require(StoreMaintenance.storeExists(spark, dir),
        s"stage '${stage.name}': $what at '$dir' has no committed " +
          "version yet — build it first with a 'kind: store' stage " +
          "(action: build); stream stages only read or grow an " +
          "existing store")
    stage.stream.get match {
      case "index_ingest" =>
        val dir = stage.dir.get
        requireStore(dir, s"${stage.store.get} store")
        if (srcReady) {
          val q = stage.store.get match {
            case "ivf" => graft.streaming.StreamingIndexIngest.intoIvf(
              spark, sourceDir, schema, dir, throttle, Some(checkpoint))
            case "pq" => graft.streaming.StreamingIndexIngest.intoPq(
              spark, sourceDir, schema, dir, throttle, Some(checkpoint))
            case "ivfpq" => graft.streaming.StreamingIndexIngest.intoIvfPq(
              spark, sourceDir, schema, dir, throttle, Some(checkpoint))
          }
          drain(q)
        }
        statsAudit(spark, stage, stage.store.get, dir, "stream_ingest",
          compacted = false)
      case "embedding_dedup" =>
        val outDir = stage.outDir.get
        requireStore(stage.dir.get, "ivfpq store")
        if (srcReady) {
          val q = graft.streaming.StreamingEmbeddingDedup
            .streamingDedupAgainstStore(spark, sourceDir, schema,
              stage.dir.get, outDir,
              minCosine = stage.minCosine
                .getOrElse(StoreMaintenance.DefaultMinCosine),
              margin = stage.margin
                .getOrElse(StoreMaintenance.DefaultMargin),
              maxFilesPerTrigger = throttle, checkpoint = Some(checkpoint))
          drain(q)
        }
        // the stage lands the accumulated flag relation (all batches);
        // empty-schema'd when nothing has ever landed
        readOrEmpty(spark, outDir,
          "query_id BIGINT, corpus_id BIGINT, cosine DOUBLE, graft_batch BIGINT")
      case "image_dedup" =>
        // the IMAGE-side analogue of store_dedup: incoming image
        // batches decoded once and flagged against the persisted
        // fingerprint store, per micro-batch — the corpus never
        // re-decodes
        val outDir = stage.outDir.get
        requireStore(stage.dir.get, "phash store")
        if (srcReady) {
          val q = graft.streaming.StreamingImageDedup
            .streamingDedupAgainstStore(spark, sourceDir, schema,
              stage.dir.get, outDir,
              maxFilesPerTrigger = throttle, checkpoint = Some(checkpoint))
          drain(q)
        }
        readOrEmpty(spark, outDir,
          "inc_id BIGINT, corpus_id BIGINT, hamming BIGINT, graft_batch BIGINT")
      case "audio_dedup" =>
        // the AUDIO twin of image_dedup: incoming clips decoded once
        // and flagged against the persisted afp store
        val outDir = stage.outDir.get
        requireStore(stage.dir.get, "afp store")
        if (srcReady) {
          val q = graft.streaming.StreamingAudioDedup
            .streamingDedupAgainstStore(spark, sourceDir, schema,
              stage.dir.get, outDir,
              maxFilesPerTrigger = throttle, checkpoint = Some(checkpoint))
          drain(q)
        }
        readOrEmpty(spark, outDir,
          "inc_id BIGINT, corpus_id BIGINT, hamming BIGINT, graft_batch BIGINT")
      case "store_dedup" =>
        // the TEXT-side analogue of embedding_dedup: incoming document
        // batches flagged against the persisted gram store, per
        // micro-batch, history never re-read
        val outDir = stage.outDir.get
        requireStore(stage.dir.get, "dedup gram store")
        if (srcReady) {
          val q = graft.streaming.StreamingStoreDedup
            .streamingDedupAgainstStore(spark, sourceDir, schema,
              stage.dir.get, outDir,
              maxFilesPerTrigger = throttle, checkpoint = Some(checkpoint))
          drain(q)
        }
        readOrEmpty(spark, outDir,
          "inc_id BIGINT, corpus_id BIGINT, jaccard DOUBLE, graft_batch BIGINT")
      case "classify" =>
        val outDir = stage.outDir.get
        // with `model_dir:` the gate applies whether or not the source
        // has data — a misconfigured model path must not lie dormant
        // until the first real batch arrives
        stage.modelDir.foreach(requireStore(_, "classifier model"))
        if (srcReady) {
          // the scoring model, frozen for this drain. `model_dir:`
          // loads the COMMITTED persisted model (trained by its own
          // `store: classifier` stage — each drain pays a model read,
          // not an O(corpus) training job); without it the model is
          // trained from the stage's HISTORICAL corpus — the adapted
          // input when declared (table/columns/input_stage, like every
          // other stage kind), else input_dir documents — and the next
          // scheduled run retrains from the then-current corpus
          val model = stage.modelDir match {
            case Some(md) => graft.ops.Classify.loadModel(spark, md)
            case None =>
              val docs = adaptedInput(spark, stage, priorOutput,
                default = "documents").getOrElse(
                graft.engine.Tables.table(spark, stage.inputDir, "documents"))
              graft.ops.Classify.tokenClassifierModel(docs)
          }
          val q = graft.streaming.StreamingClassify.streamingPredictToDir(
            spark, sourceDir, schema, model, outDir,
            maxFilesPerTrigger = throttle, checkpoint = Some(checkpoint))
          drain(q)
        }
        readOrEmpty(spark, outDir,
          "doc_id BIGINT, predicted STRING, score BIGINT, graft_batch BIGINT")
    }
  }

  private def hasDataFiles(spark: SparkSession, dir: String): Boolean = {
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // qualify the base so the relative-component check below compares
    // against the SAME absolute form fs.listFiles returns — a relative
    // YAML path must not make the walk judge the launch directory's
    // own ancestors (a '.'-prefixed checkout dir would hide everything)
    val base = fs.makeQualified(new org.apache.hadoop.fs.Path(dir))
    val basePath = {
      val p = base.toUri.getPath
      if (p.endsWith("/")) p else p + "/"
    }
    // hidden/temporary filtering must apply to EVERY path component
    // UNDER the base, not just the leaf: a writer mid-commit holds its
    // part files under _temporary/, and counting those as data would
    // race the schema inference this gate exists to protect
    def visible(p: org.apache.hadoop.fs.Path): Boolean = {
      val rel = p.toUri.getPath.stripPrefix(basePath)
      rel.split('/').forall(n =>
        !n.startsWith("_") && !n.startsWith("."))
    }
    fs.exists(base) && {
      val it = fs.listFiles(base, true)
      var found = false
      while (!found && it.hasNext) {
        if (visible(it.next().getPath)) found = true
      }
      found
    }
  }

  private def readOrEmpty(spark: SparkSession, dir: String,
      ddl: String): DataFrame =
    if (hasDataFiles(spark, dir))
      // partition-value inference types `graft_batch=<id>` as INT;
      // the empty schema (and any warehouse landing) wants one stable
      // type across runs — cast to the declared BIGINT
      spark.read.parquet(dir).withColumn("graft_batch",
        col("graft_batch").cast("long"))
    else spark.createDataFrame(
      java.util.Collections.emptyList[org.apache.spark.sql.Row](),
      org.apache.spark.sql.types.StructType.fromDDL(ddl))

  /** Drain everything available, then stop — without letting the
    * shutdown mask the real failure or fail a drain that succeeded:
    * if processAllAvailable threw, stop()/awaitTermination() errors
    * are suppressed (the PRIMARY exception is the diagnosis); if the
    * drain succeeded, a stop hiccup is swallowed too — every batch
    * already landed idempotently, and poisoning downstream consumers
    * over a teardown timeout would fail landed work.
    */
  private def drain(q: org.apache.spark.sql.streaming.StreamingQuery): Unit = {
    var primary: Throwable = null
    try q.processAllAvailable()
    catch { case scala.util.control.NonFatal(e) => primary = e }
    finally {
      try { q.stop(); q.awaitTermination() }
      catch { case scala.util.control.NonFatal(_) => () }
    }
    if (primary != null) throw primary
  }
}
