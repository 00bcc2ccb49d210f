package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Lake-maintenance merge operators: MERGE-style upsert, CDC
  * apply-changes, and SCD2 dimension versioning — the mutation tier a
  * parquet lake needs on top of the append-only writers (the Spark
  * analog of the reference's aligned assignment / combine_first
  * family, pandas/core/frame.py:8765 update, re-expressed as
  * whole-table rewrites because immutable columnar storage has no
  * in-place row update).
  *
  * Scale shapes (all key-clustered, no global state):
  *   - [[upsert]]: ONE anti-join shuffle on the keys + a union — the
  *     physical plan of a Delta/Iceberg MERGE's rewrite phase. A small
  *     changeset broadcasts; AQE handles a skewed key.
  *   - [[applyChanges]]: latest-wins compaction of the change stream is
  *     a `max(struct(seq, …))` aggregation — map-side combinable, so a
  *     hot key partial-aggregates BEFORE the shuffle (never a
  *     single-reducer window), then the same anti-join + union.
  *   - [[scd2Apply]]: per-key chains via a key-partitioned window —
  *     parallel across keys; no key has more versions than its update
  *     count, so partitions stay bounded.
  */
object MergeOps {

  /** MERGE upsert: source rows REPLACE whole matching target rows on
    * `keys`; unmatched source rows insert; unmatched target rows
    * persist. Schemas must align (enforced by unionByName).
    *
    * PRECONDITION: the source carries at most one row per key — a real
    * MERGE errors on multiple matches, and an uncompacted CDC batch
    * here would silently emit duplicate rows (compact it with
    * [[applyChanges]] first). `validate = true` enforces the
    * precondition loudly at the cost of one extra aggregation job;
    * the default trusts the caller, the right trade for a 100 TB
    * changeset that is distinct by construction. */
  def upsert(target: DataFrame, source: DataFrame,
      keys: Seq[String], validate: Boolean = false): DataFrame = {
    require(keys.nonEmpty, "upsert: need at least one key column")
    if (validate) {
      val dup = source.groupBy(keys.map(col): _*)
        .agg(count(lit(1)).as("__n")).filter(col("__n") > 1)
        .limit(1).collect()
      require(dup.isEmpty,
        s"upsert: source has multiple rows for key " +
          s"${dup.headOption.map(_.toString).getOrElse("")} — compact " +
          "the changeset (applyChanges) before upserting")
    }
    target.join(source.select(keys.map(col): _*).distinct(),
        keys, "left_anti")
      .unionByName(source)
  }

  /** Column-level MERGE: on match take `updateCols` from the source and
    * keep every other target column; unmatched source rows insert;
    * unmatched target rows persist. Full-outer join on null-safe key
    * equality — ONE shuffle, both sides key-clustered. `source` must
    * carry `keys ++ updateCols` plus (for inserts) the remaining target
    * columns. */
  def mergeUpdate(target: DataFrame, source: DataFrame, keys: Seq[String],
      updateCols: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "mergeUpdate: need at least one key column")
    // explicit presence marker: "keep the target value on match" must
    // hold even when that value is NULL — a bare coalesce(t, s) would
    // silently overwrite a matched row's legitimate NULL with the
    // source value (it exists only to serve unmatched-source inserts)
    val t = target.withColumn("__t_present", lit(true)).alias("t")
    val s = source.alias("s")
    val cond = keys.map(k => col(s"t.$k") <=> col(s"s.$k")).reduce(_ && _)
    val matched = col("t.__t_present").isNotNull
    val proj = target.columns.toSeq.map { c =>
      if (keys.contains(c)) coalesce(col(s"t.$c"), col(s"s.$c")).as(c)
      else if (updateCols.contains(c)) {
        // matched-or-insert: source wins; target-only rows fall back.
        // A matched source NULL "misses" the update — the documented
        // combine_first semantics; callers wanting NULL-overwrite
        // should model it as a sentinel.
        coalesce(col(s"s.$c"), col(s"t.$c")).as(c)
      } else when(matched, col(s"t.$c")).otherwise(col(s"s.$c")).as(c)
    }
    t.join(s, cond, "full_outer").select(proj: _*)
  }

  /** CDC apply-changes: compact `changes` to the latest operation per
    * key (greatest `seqCol`, ties broken by favoring the delete so a
    * same-instant upsert+delete converges deterministically), then
    * apply: 'D' deletes the key, anything else upserts the row. The
    * latest-wins compaction is `max(struct(seq, isDelete, payload))`
    * — a map-side-combinable aggregate, NOT a row_number window, so a
    * hot key (one entity updated millions of times) partial-aggregates
    * before the exchange. */
  def applyChanges(target: DataFrame, changes: DataFrame,
      keys: Seq[String], opCol: String, seqCol: String): DataFrame = {
    require(keys.nonEmpty, "applyChanges: need at least one key column")
    val payload = target.columns.toSeq
    require(payload.forall(changes.columns.contains),
      s"applyChanges: changes must carry every target column; missing " +
        s"${payload.filterNot(changes.columns.contains).mkString(", ")}")
    val latest = changes
      .groupBy(keys.map(col): _*)
      .agg(max(struct(
        col(seqCol).as("__seq"),
        (col(opCol) === "D").cast("int").as("__del"),
        struct(payload.map(col): _*).as("__row"))).as("__last"))
      .select(col("__last.__del").as("__del"),
        col("__last.__row.*"))
    val survivors = latest.filter(col("__del") === 0).drop("__del")
    val touched = latest.select(keys.map(col): _*).distinct()
    target.join(touched, keys, "left_anti").unionByName(survivors)
  }

  /** SCD2 apply: version a dimension against timestamped attribute
    * updates. `dim` rows are current versions `(key, attrs…,
    * validFrom, validTo = NULL)`; `updates` carries `(key, attrs…,
    * tsCol)`. Each updated key's current row closes at its FIRST
    * update instant, intermediate updates chain `validFrom →
    * next update ts`, and the last update becomes the open version.
    * Updates at or before the current version's validFrom are rejected
    * loudly (they would corrupt interval ordering — out-of-order CDC
    * feeds must be compacted first). Window is key-partitioned: scale
    * = max updates per key, not corpus size. */
  def scd2Apply(dim: DataFrame, updates: DataFrame, key: String,
      tsCol: String, attrCols: Seq[String], validFrom: String = "valid_from",
      validTo: String = "valid_to"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val attrs = attrCols
    require(dim.columns.toSet == (Seq(key) ++ attrs ++
        Seq(validFrom, validTo)).toSet,
      s"scd2Apply: dim columns ${dim.columns.mkString(", ")} must be " +
        s"exactly key + attrs + $validFrom + $validTo")
    val w = Window.partitionBy(col(key)).orderBy(col(tsCol))
    // new versions from the update stream: close each at the NEXT
    // update's instant; the last stays open (NULL)
    val versions = updates.select(
      (col(key) +: attrs.map(col)) ++ Seq(
        col(tsCol).cast("timestamp").as(validFrom),
        lead(col(tsCol), 1).over(w).cast("timestamp").as(validTo)): _*)
    val firstUpd = updates.groupBy(col(key))
      .agg(min(col(tsCol)).cast("timestamp").as("__first_ts"))
    // close the previously-current row of each updated key
    val dimCols = dim.columns.toSeq
    val closed = dim.join(firstUpd, Seq(key), "left")
      .select(dimCols.map {
        case c if c == validTo =>
          when(col("__first_ts").isNotNull && col(validTo).isNull,
            when(col("__first_ts") <= col(validFrom),
              raise_error(concat(lit("scd2Apply: out-of-order update at or " +
                "before current validFrom for key "), col(key))))
              .otherwise(col("__first_ts")))
            .otherwise(col(validTo)).as(validTo)
        case c => col(c)
      }: _*)
    closed.unionByName(
      versions.select(dimCols.map(col): _*), allowMissingColumns = false)
  }

  /** Incremental MATERIALIZED-ROLLUP maintenance (insert-only IVM):
    * `state` holds the aggregated view `(keys…, cntCol, sumCols…)`;
    * a `delta` of RAW rows folds in with ONE map-side-combinable
    * delta aggregation plus a full-outer merge on the keys — the view
    * is maintained without ever rescanning history, which is the whole
    * point at 100 TB (re-aggregating a year of events to absorb an
    * hour of new ones is the anti-pattern this replaces). Count and
    * sums are additive, so incremental ≡ full re-aggregation exactly
    * when the sums are exact (feed decimal-cast columns; float sums
    * would drift by merge order). Retractions are out of scope here —
    * route deletions through [[applyChanges]] upstream or maintain a
    * signed-weight variant. */
  def mergeAggState(state: DataFrame, delta: DataFrame, keys: Seq[String],
      sumCols: Seq[String], cntCol: String = "cnt"): DataFrame = {
    require(keys.nonEmpty, "mergeAggState: need at least one key")
    val expect = (keys ++ Seq(cntCol) ++ sumCols).toSet
    require(state.columns.toSet == expect,
      s"mergeAggState: state columns ${state.columns.mkString(", ")} " +
        s"must be exactly keys + $cntCol + sums")
    val dAgg = delta.groupBy(keys.map(col): _*).agg(
      count(lit(1)).as(cntCol),
      sumCols.map(c => sum(col(c)).as(c)): _*)
    val t = state.alias("t"); val dl = dAgg.alias("d")
    val cond = keys.map(k => col(s"t.$k") <=> col(s"d.$k")).reduce(_ && _)
    t.join(dl, cond, "full_outer").select(
      keys.map(k => coalesce(col(s"t.$k"), col(s"d.$k")).as(k)) ++
        Seq((coalesce(col(s"t.$cntCol"), lit(0L)) +
          coalesce(col(s"d.$cntCol"), lit(0L))).as(cntCol)) ++
        sumCols.map(c => (coalesce(col(s"t.$c"), lit(0)) +
          coalesce(col(s"d.$c"), lit(0))).as(c)): _*)
  }
}
