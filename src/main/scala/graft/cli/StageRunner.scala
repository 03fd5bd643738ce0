package graft.cli

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit}

import graft.config.PipelineConfig.Stage
import graft.ops.{DedupStore, IvfIndex, IvfPqStore, PqStore, StoreMaintenance}

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
  *    relation is exactly the gate-verified one.
  *  - `kind: store` drives the persisted-store lifecycle. Build /
  *    append / compact / maintain run the maintenance op (under the
  *    store's maintainer lease, loud on a second maintainer — the
  *    library contract rides through unchanged), and the stage's
  *    OUTPUT is the store's post-action stats relation tagged with
  *    (stage, action, compacted): the run's audit row, so a season of
  *    scheduled pipeline runs leaves a queryable maintenance history
  *    in the warehouse instead of a log trail.
  */
object StageRunner {

  def run(spark: SparkSession, stage: Stage): DataFrame = stage.kind match {
    case "query" =>
      val name = stage.query.get
      val q = graft.queries.Extensions.queries.getOrElse(name,
        throw new IllegalArgumentException(
          s"stage '${stage.name}': unknown operator '$name' — " +
            "not in the Extensions registry"))
      q(spark, stage.inputDir)
    case "store" =>
      runStore(spark, stage)
    case other =>
      // unreachable after config validation; loud anyway
      throw new IllegalArgumentException(
        s"stage '${stage.name}': unknown kind '$other'")
  }

  private def runStore(spark: SparkSession, stage: Stage): DataFrame = {
    val dir = stage.dir.get
    val store = stage.store.get
    val action = stage.action.get
    def embeddings: DataFrame =
      graft.engine.Tables.table(spark, stage.inputDir,
        stage.table.getOrElse("embeddings"))
    def documents: DataFrame =
      graft.engine.Tables.table(spark, stage.inputDir,
        stage.table.getOrElse("documents"))
    // `dedup` is the one action whose OUTPUT is the operator relation
    // (flagged near-duplicates of the incoming batch against the
    // persisted history), not the stats audit row — the incremental
    // step of a declarative curation pipeline: yesterday's store,
    // today's batch, flags to the sink
    // `recommend` lands the maintenance ADVISORY row (rebuild vs
    // compact vs ok, from stats + lineage + the sampled margin gap) —
    // a scheduled pipeline run leaves the decision trail in the
    // warehouse next to the stats audit rows
    if (action == "recommend") return store match {
      case "ivfpq" => StoreMaintenance.recommendIvfPq(spark, dir,
        corpus = Some(embeddings))
      case other => throw new IllegalArgumentException(
        s"stage '${stage.name}': action 'recommend' supports the ivfpq " +
          s"store, not '$other'")
    }
    if (action == "dedup") return store match {
      case "dedup" => DedupStore.dedupAgainst(spark, documents, dir)
      case "ivfpq" => IvfPqStore.dedupAgainst(spark, dir,
        embeddings.select(col("vec_id").as("query_id"),
          col("embedding").as("qv")))
      case other => throw new IllegalArgumentException(
        s"stage '${stage.name}': action 'dedup' supports the dedup and " +
          s"ivfpq stores, not '$other'")
    }
    var compacted = false
    (store, action) match {
      case ("dedup", "build") => DedupStore.save(documents, dir)
      case ("dedup", "append") =>
        DedupStore.append(documents, dir, stage.ingestId.get)
      case ("dedup", "compact") => DedupStore.compact(spark, dir)
      case ("dedup", "maintain") =>
        compacted = StoreMaintenance.maintainDedup(spark, dir)
      case ("ivf", "build") => IvfIndex.save(embeddings, dir)
      case ("ivf", "append") =>
        IvfIndex.append(embeddings, dir, stage.ingestId.get)
      case ("ivf", "compact") => IvfIndex.compact(spark, dir)
      case ("ivf", "maintain") =>
        compacted = StoreMaintenance.maintainIvf(spark, dir)
      case ("pq", "build") => PqStore.save(embeddings, dir)
      case ("pq", "append") =>
        PqStore.append(embeddings, dir, stage.ingestId.get)
      case ("pq", "compact") => PqStore.compact(spark, dir)
      case ("pq", "maintain") =>
        compacted = StoreMaintenance.maintainPq(spark, dir)
      case ("ivfpq", "build") => IvfPqStore.save(embeddings, dir)
      case ("ivfpq", "append") =>
        IvfPqStore.append(embeddings, dir, stage.ingestId.get)
      case ("ivfpq", "compact") => IvfPqStore.compact(spark, dir)
      case ("ivfpq", "maintain") =>
        compacted = StoreMaintenance.maintainIvfPq(spark, dir)
      case (_, "stats") => // introspection only, no maintenance op
      case other => throw new IllegalArgumentException(
        s"stage '${stage.name}': unsupported $other")
    }
    val stats = store match {
      case "dedup" => DedupStore.stats(spark, dir)
      case "ivf" => IvfIndex.stats(spark, dir)
      case "pq" => PqStore.stats(spark, dir)
      case "ivfpq" => IvfPqStore.stats(spark, dir)
    }
    val statCols = stats.columns.toSeq
    stats
      .withColumn("stage", lit(stage.name))
      .withColumn("action", lit(action))
      .withColumn("compacted", lit(compacted))
      .select((Seq("stage", "action", "compacted") ++ statCols).map(col): _*)
  }
}
