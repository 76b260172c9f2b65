package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** DELTA-STYLE TRANSACTION-LOG REPLAY — the lakehouse table-format
  * primitive (the public Delta Lake PROTOCOL.md action model): a
  * table's state is the FOLD of its JSON action log — `add` actions
  * contribute files, `remove` actions tombstone them, a later re-`add`
  * resurrects the path — and every reader reconstructs "which files
  * are live" by replaying the log in version order with LAST-WRITER-
  * WINS per path.
  *
  * Spark-first shape: the JSON lines parse with `from_json` (codegen'd,
  * no UDF), and the replay is ONE hash aggregation — `max_by(action,
  * version)` per path — not a window, not a self-join, not an
  * iterative fold: at 100 TB the log fits in a fraction of the data it
  * describes and the per-path aggregate shuffles log-sized rows once.
  * Ties inside one version are broken add-wins (a transaction that
  * both removes and re-adds a path leaves it live), matching the
  * protocol's checkpoint semantics.
  */
object DeltaReplay {

  private val ActionSchema =
    "add STRUCT<path: STRING, size: BIGINT, dataChange: BOOLEAN>, " +
      "remove STRUCT<path: STRING, deletionTimestamp: BIGINT>"

  /** Reconstruct live-file state from an action log of
    * `(version long, line string)` rows. Returns one row per path
    * ever referenced: `(path, is_live, size, last_version)` — `size`
    * is null for tombstoned paths. Non-file actions (commitInfo,
    * metaData, protocol) are ignored, as a reader must.
    */
  def replay(log: DataFrame): DataFrame =
    foldActions(parseActions(log))

  /** JSON action lines → normalized `(version, path, size, is_add)`. */
  private def parseActions(log: DataFrame): DataFrame = {
    val parsed = log.select(col("version"),
      from_json(col("line"),
        org.apache.spark.sql.types.StructType.fromDDL(ActionSchema),
        Map.empty[String, String]).as("j"))
    parsed.select(col("version"),
      coalesce(col("j.add.path"), col("j.remove.path")).as("path"),
      col("j.add.size").as("size"),
      col("j.add.path").isNotNull.as("is_add"),
      col("j.remove.deletionTimestamp").as("del_ts"))
      .filter(col("path").isNotNull)
  }

  private val TableSchema =
    "protocol STRUCT<minReaderVersion: INT, minWriterVersion: INT>, " +
      "metaData STRUCT<id: STRING, schemaString: STRING, " +
      "partitionColumns: ARRAY<STRING>>"

  /** TABLE-LEVEL ACTIONS — the protocol/metaData layer [[replay]]
    * deliberately skips: per the public Delta protocol, `protocol`
    * carries the reader/writer version gate a client MUST check before
    * trusting anything else in the log, and `metaData` carries the
    * table id, the JSON-serialized schema, and the partition columns;
    * both are last-writer-wins by version. One hash aggregation per
    * group (two conditional max_by over the same shuffle — the
    * [[diff]] shape); `reader_supported` reports whether THIS reader
    * (protocol reader version 1 semantics: plain add/remove file
    * actions) may proceed, instead of fabricating a read it cannot
    * honor. `groupCols` lets a caller fold many per-document synthetic
    * logs in one pass (empty = one global table).
    */
  def tableInfo(log: DataFrame, groupCols: Seq[String] = Nil): DataFrame = {
    val parsed = log.select(
      (groupCols.map(col) :+ col("version") :+
        from_json(col("line"),
          org.apache.spark.sql.types.StructType.fromDDL(TableSchema),
          Map.empty[String, String]).as("j")): _*)
    val gb =
      if (groupCols.isEmpty) parsed.groupBy()
      else parsed.groupBy(groupCols.map(col): _*)
    gb.agg(
        max_by(col("j.protocol"),
          when(col("j.protocol").isNotNull, col("version"))).as("pr"),
        max_by(col("j.metaData"),
          when(col("j.metaData").isNotNull, col("version"))).as("md"))
      .select((groupCols.map(col) ++ Seq(
        col("pr.minReaderVersion").as("min_reader"),
        col("pr.minWriterVersion").as("min_writer"),
        (col("pr.minReaderVersion") <= 1).as("reader_supported"),
        col("md.id").as("meta_id"),
        regexp_count(col("md.schemaString"), lit("\"name\":"))
          .cast("int").as("n_schema_fields"),
        size(col("md.partitionColumns")).as("n_part_cols"),
        // get() (0-based) is out-of-bounds-null under ANSI, where
        // element_at would throw on an empty partitionColumns
        get(col("md.partitionColumns"), lit(0)).as("first_part_col"))): _*)
  }

  /** VACUUM planning — the physical-cleanup audit behind `VACUUM
    * RETAIN`: a data file is reclaimable at `asOf` exactly when its LAST
    * action at or before `asOf` is a remove (a later re-add resurrects
    * the path, so add-wins folding already protects it) AND its tombstone
    * timestamp predates `horizonTs` (the retention window that keeps
    * time-travel readers safe). One hash aggregation per path carrying
    * both the last state and the last add's size (the bytes the vacuum
    * reclaims — a tombstone itself has no size); never a log self-join,
    * and at 100 TB this runs off the checkpoint-state fold exactly like
    * [[replayFromCheckpoint]].
    */
  def vacuumCandidates(log: DataFrame, asOf: Long,
      horizonTs: Long): DataFrame = {
    val acts = parseActions(log).filter(col("version") <= asOf)
    acts.groupBy("path")
      .agg(
        max_by(struct(col("is_add"), col("version"), col("del_ts")),
          struct(col("version"), col("is_add"))).as("last"),
        max_by(col("size"), when(col("is_add"), col("version"))).as("add_size"))
      .filter(!col("last.is_add"))
      .select(col("path"),
        col("last.version").as("removed_version"),
        col("last.del_ts").as("del_ts"),
        coalesce(col("add_size"), lit(0L)).as("size"),
        (col("last.del_ts") < horizonTs).as("eligible"))
  }

  /** The last-writer-wins fold shared by [[replay]] and
    * [[replayFromCheckpoint]]: one `max_by` hash aggregation per path.
    */
  private def foldActions(acts: DataFrame): DataFrame =
    acts.groupBy("path")
      .agg(max_by(
        struct(col("is_add"), col("size"), col("version")),
        // add-wins inside a version: (version, is_add) orders the tie
        struct(col("version"), col("is_add"))).as("last"))
      .select(col("path"), col("last.is_add").as("is_live"),
        when(col("last.is_add"), col("last.size")).as("size"),
        col("last.version").as("last_version"))

  /** The REAL delta read path: a reader never replays the whole log —
    * it loads the newest CHECKPOINT (the per-path state fold
    * materialized as parquet at some version V) and overlays only the
    * JSON commits after V. `ckpt` carries one state row per path
    * (`path, is_add, size, version` — a tombstone row has `is_add`
    * false and null size, exactly what the protocol's checkpoint
    * retains so later readers still see the remove); `tailLog` is the
    * `(version, line)` JSON tail. Checkpoint state rows ARE the fold
    * of everything ≤ V, so unioning them with the tail's parsed
    * actions and re-folding yields the same last-writer-wins state a
    * full replay would — one union, one hash aggregation, and at
    * 100 TB the checkpoint read replaces an unbounded log walk.
    */
  def replayFromCheckpoint(ckpt: DataFrame, tailLog: DataFrame): DataFrame = {
    val base = ckpt.select(col("version"), col("path"),
      col("size").cast("long").as("size"), col("is_add"))
    foldActions(base.unionByName(parseActions(tailLog).drop("del_ts")))
  }

  /** CDC BETWEEN VERSIONS — the incremental-processing primitive: what
    * changed in the table between version `vLow` and version `vHigh`?
    * One hash aggregation computes BOTH endpoint states per path (two
    * conditional `max_by`s over the same shuffle — never two replays,
    * never a self-join) and classifies:
    *
    *   - `added`      — absent at vLow, live at vHigh
    *   - `transient`  — absent at vLow, appeared and died before vHigh
    *   - `removed`    — live at vLow, tombstoned at vHigh
    *   - `restored`   — tombstoned at vLow, live at vHigh
    *   - `resized`    — live at both with different sizes (an overwrite)
    *   - `unchanged`  — live at both, same size
    *   - `still_dead` — tombstoned at both
    *
    * Returns `(path, change, lo_size, hi_size)` with sizes null when
    * the endpoint is not live. At 100 TB the log rows shuffle once on
    * path, exactly like [[replay]].
    */
  def diff(log: DataFrame, vLow: Long, vHigh: Long): DataFrame = {
    require(vLow <= vHigh, "diff expects vLow <= vHigh")
    val acts = parseActions(log).filter(col("version") <= vHigh)
    def lastAtMost(v: Long) = max_by(
      struct(col("is_add"), col("size"), col("version")),
      when(col("version") <= v, struct(col("version"), col("is_add"))))
    val both = acts.groupBy("path").agg(
      lastAtMost(vLow).as("lo"), lastAtMost(vHigh).as("hi"))
    both.select(col("path"),
      when(col("lo").isNull && col("hi.is_add"), "added")
        .when(col("lo").isNull && !col("hi.is_add"), "transient")
        .when(col("lo.is_add") && !col("hi.is_add"), "removed")
        .when(!col("lo.is_add") && col("hi.is_add"), "restored")
        .when(col("lo.is_add") && col("hi.is_add") &&
          col("lo.size") =!= col("hi.size"), "resized")
        .when(col("lo.is_add") && col("hi.is_add"), "unchanged")
        .otherwise("still_dead").as("change"),
      when(col("lo.is_add"), col("lo.size")).as("lo_size"),
      when(col("hi.is_add"), col("hi.size")).as("hi_size"))
  }

  /** STREAMING twin of [[replayFromCheckpoint]] — the checkpoint SEEDS
    * the per-path state (`mapGroupsWithState` initial state, so paths
    * the tail never touches still surface), and tail batches fold in
    * with the same newer-than-held guard as [[replayStream]]. Equals
    * the batch checkpoint overlay on the same prefix at every
    * micro-batch; runs in batch mode too, so it is oracle-checkable.
    */
  def replayStreamFromCheckpoint(ckpt: DataFrame,
      tailLog: DataFrame): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
    import tailLog.sparkSession.implicits._
    val init = ckpt.select(col("path"), col("is_add"),
      coalesce(col("size").cast("long"), lit(-1L)).as("size"),
      col("version"))
      .as[(String, Boolean, Long, Long)]
      .groupByKey(_._1)
      .mapValues(r => (r._2, r._3, r._4))
    val acts = parseActions(tailLog).select(
      col("path"), col("version"), col("is_add"),
      coalesce(col("size"), lit(-1L)).as("size"))
      .as[(String, Long, Boolean, Long)]
    acts.groupByKey(_._1)
      .mapGroupsWithState[(Boolean, Long, Long), (String, Boolean, Long, Long)](
        GroupStateTimeout.NoTimeout, init) {
        case (path, rows, state: GroupState[(Boolean, Long, Long)]) =>
          var (live, size, ver) =
            state.getOption.getOrElse((false, -1L, Long.MinValue))
          def rank(isAdd: Boolean): Int = if (isAdd) 1 else 0
          rows.toSeq.sortBy(r => (r._2, r._3)).foreach { r =>
            val newer = r._2 > ver ||
              (r._2 == ver && rank(r._3) >= rank(live))
            if (newer) { live = r._3; size = r._4; ver = r._2 }
          }
          state.update((live, size, ver))
          (path, live, size, ver)
      }
      .toDF("path", "is_live", "raw_size", "last_version")
      .select(col("path"), col("is_live"),
        when(col("is_live") && col("raw_size") >= 0, col("raw_size"))
          .as("size"),
        col("last_version"))
  }

  /** STREAMING twin of [[replay]] — continuous table-state maintenance
    * as log batches arrive (the tailing-reader / CDC shape): per-path
    * `mapGroupsWithState` holding `(is_live, size, last_version)`;
    * each micro-batch folds its group's actions in (version, is_add)
    * order and an action applies only when it is not older than the
    * held state, so late-arriving stale actions cannot regress the
    * fold. State is O(1) per path forever. Equals [[replay]] on the
    * same log prefix at every micro-batch (StreamingSpec pins it;
    * mapGroupsWithState also runs in batch mode, so the same function
    * is oracle-checkable).
    */
  def replayStream(log: DataFrame): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
    import log.sparkSession.implicits._
    val parsed = log.select(col("version"),
      from_json(col("line"),
        org.apache.spark.sql.types.StructType.fromDDL(ActionSchema),
        Map.empty[String, String]).as("j"))
    val acts = parsed.select(
      coalesce(col("j.add.path"), col("j.remove.path")).as("path"),
      col("version"),
      col("j.add.path").isNotNull.as("is_add"),
      coalesce(col("j.add.size"), lit(-1L)).as("size"))
      .filter(col("path").isNotNull)
      .as[(String, Long, Boolean, Long)]
    acts.groupByKey(_._1)
      .mapGroupsWithState[(Boolean, Long, Long), (String, Boolean, Long, Long)](
        GroupStateTimeout.NoTimeout) {
        case (path, rows, state: GroupState[(Boolean, Long, Long)]) =>
          var (live, size, ver) =
            state.getOption.getOrElse((false, -1L, Long.MinValue))
          def rank(isAdd: Boolean): Int = if (isAdd) 1 else 0
          rows.toSeq.sortBy(r => (r._2, r._3)).foreach { r =>
            val newer = r._2 > ver ||
              (r._2 == ver && rank(r._3) >= rank(live))
            if (newer) { live = r._3; size = r._4; ver = r._2 }
          }
          state.update((live, size, ver))
          (path, live, size, ver)
      }
      .toDF("path", "is_live", "raw_size", "last_version")
      .select(col("path"), col("is_live"),
        when(col("is_live") && col("raw_size") >= 0, col("raw_size"))
          .as("size"),
        col("last_version"))
  }
}
