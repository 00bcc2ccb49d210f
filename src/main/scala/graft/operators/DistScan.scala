package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed order-dependent scans: cumulative / bounded-lookback
  * windows over a GLOBAL row order without a single-partition WindowExec.
  *
  * pandas positional ops (reference: cumsum/shift `pandas/core/generic.py
  * :8353,:8540`, rolling `pandas/core/window.py:48`) assume one in-memory
  * array. Spark's unpartitioned Window is the literal translation — it
  * moves every row to ONE partition: correct, but serial and
  * memory-bound, the classic 100 TB failure mode. This lifts the same
  * semantics to a range-bucketed two-pass plan:
  *
  *   1. bucket rows by ranges of the leading sort key (boundaries from
  *      `approxQuantile` — boundary placement affects balance only,
  *      never results, so the 1e-3 quantile error is harmless);
  *   2. run the window WITHIN each bucket — parallelism = `buckets`;
  *   3. stitch buckets:
  *      - running sums add a per-bucket exclusive-prefix offset
  *        (a ≤`buckets`-row aggregate collected to the driver and
  *        re-broadcast as a literal when-chain);
  *      - bounded lookback (lag / rolling ≤ n rows) replicates the last
  *        n rows of bucket i into bucket i+1 as flagged context rows,
  *        dropped after the window runs.
  *
  * Results are bit-identical to the single-partition plan when summed
  * values are exact (decimal / integer): only where the running prefix
  * is CUT differs, never the addition order inside it.
  *
  * Requirements (asserted by the local equality spec, hold by
  * construction at scale where rows/bucket ≫ window width):
  *   - leading key non-null;
  *   - for context windows, every bucket holds ≥ ctxRows rows;
  *   - the `order` passed to withContext/windowSpec must be a TOTAL
  *     order. Physically identical duplicate rows break any key-derived
  *     order — totalize with the running count from `withRunningSums`
  *     (`"rn" -> lit(1L)`) and order by that single column instead;
  *     identical rows are interchangeable, so the arbitrary tie
  *     assignment stays multiset-correct.
  */
object DistScan {

  val PidCol = "__pid"
  val CtxCol = "__ctx"

  // Persisted intermediates (the range-partitioned frames whose
  // boundaries must not drift between the counts pass and the ranking
  // pass). They cannot be unpersisted inside the builder — the returned
  // plan still reads them — so they register here and the application
  // releases them at its own step boundaries (Verify does per query).
  private val persistedFrames =
    new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]

  /** Register an externally-persisted frame (e.g. minhash signatures)
    * with the same release queue, so `releaseCaches()` is the single
    * step-boundary hook a long-lived application calls. */
  def registerCache(df: DataFrame): DataFrame = { persistedFrames.add(df); df }

  /** Unpersist every DistScan-cached intermediate. Call between
    * pipeline steps once prior results are materialized; long sessions
    * that skip this accumulate executor storage until eviction. */
  def releaseCaches(): Unit = {
    var d = persistedFrames.poll()
    while (d != null) { d.unpersist(blocking = false); d = persistedFrames.poll() }
  }

  /** Range boundaries of the leading key's numeric image. Distinct +
    * sorted; duplicate quantiles (heavy keys) just merge buckets. */
  private def boundaries(df: DataFrame, leadNum: Column, buckets: Int): Seq[Double] = {
    val probs = (1 until buckets).map(_.toDouble / buckets).toArray
    df.select(leadNum.cast("double").as("__lead"))
      .stat.approxQuantile("__lead", probs, 0.001)
      .toSeq.distinct.sorted
  }

  /** Deterministic bucket id: #boundaries strictly below the key, so
    * tied keys always land together in the lower bucket. */
  private def pidExpr(leadNum: Column, bs: Seq[Double]): Column =
    bs.foldLeft(lit(0)) { (acc, b) =>
      acc + when(leadNum.cast("double") > lit(b), 1).otherwise(0)
    }

  /** Tag rows with their range-bucket id (`__pid`). `leadNum` must be a
    * monotone numeric image of `order.head` (e.g. `unix_micros(ts)`). */
  def bucketed(df: DataFrame, leadNum: Column, buckets: Int): DataFrame =
    df.withColumn(PidCol, pidExpr(leadNum, boundaries(df, leadNum, buckets)))

  /** Boundary/bucket primitives for operators that must range-bucket TWO
    * frames consistently (e.g. the keyless asof): compute boundaries from
    * one frame, apply the same deterministic pid expression to both. */
  def boundariesOf(df: DataFrame, leadNum: Column, buckets: Int): Seq[Double] =
    boundaries(df, leadNum, buckets)

  def bucketedBy(df: DataFrame, leadNum: Column, bs: Seq[Double]): DataFrame =
    df.withColumn(PidCol, pidExpr(leadNum, bs))

  /** Global running sums over the (order) total order. `sums` maps output
    * column name → summed expression; use EXACT types (decimal/integer)
    * so the bucket cut cannot perturb values. Output keeps `__pid` for
    * chaining into `withContext`. */
  def withRunningSums(df: DataFrame, leadNum: Column, order: Seq[Column],
      sums: Seq[(String, Column)], buckets: Int = 32): DataFrame = {
    val withPid = bucketed(df, leadNum, buckets)
    val w = Window.partitionBy(col(PidCol)).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = sums.foldLeft(withPid) { case (d, (name, expr)) =>
      d.withColumn(name, sum(expr).over(w))
    }
    // Bucket totals → exclusive prefix offsets. The collect is ≤ buckets
    // rows (cluster-core count), not data-sized: this is the standard
    // two-pass distributed scan, not a driver-side loop over data.
    val aggCols = sums.map { case (name, expr) => sum(expr).as(name) }
    val totals = withPid.groupBy(col(PidCol)).agg(aggCols.head, aggCols.tail: _*)
      .collect().toSeq.sortBy(_.getInt(0))
    sums.map(_._1).zipWithIndex.foldLeft(local) { case (d, (name, i)) =>
      var acc = BigDecimal(0)
      var integral = true
      val offsets = totals.map { row =>
        val p = row.getInt(0)
        val prefix = acc
        acc += (row.get(i + 1) match {
          case null                      => BigDecimal(0)
          case bd: java.math.BigDecimal  => integral = false; BigDecimal(bd)
          case l: java.lang.Long         => BigDecimal(l)
          case n: java.lang.Integer      => BigDecimal(n.longValue())
          case other => sys.error(s"non-exact running-sum type: ${other.getClass}")
        })
        p -> prefix
      }.filter(_._2 != BigDecimal(0))
      if (offsets.isEmpty) d
      else {
        def litOf(v: BigDecimal): Column =
          if (integral) lit(v.toLongExact) else lit(v.underlying)
        val offsetExpr = offsets.foldLeft(if (integral) lit(0L) else lit(BigDecimal(0).underlying)) {
          case (e, (p, off)) => when(col(PidCol) === p, litOf(off)).otherwise(e)
        }
        d.withColumn(name, col(name) + offsetExpr)
      }
    }
  }

  /** Per-GROUP distributed running sum over a global order — the
    * grouped form of [[withRunningSums]]: same range buckets on the
    * leading numeric, local cumsums within (bucket, group), and the
    * per-(bucket, group) totals prefix-summed per group with a TINY
    * window (≤ buckets·|groups| rows) broadcast back onto the data.
    * Unlike a window partitioned by the group alone, a group holding
    * half the corpus still splits across every bucket — this is the
    * skew-safe shape for domain-grained running totals (per-source
    * token budgets, per-language quotas).
    *
    * The group key must be DOMAIN-grained (sources, languages — not
    * per-document): the offsets frame is buckets·|groups| rows and is
    * counted with a loud `maxGroups` guard before broadcasting. Sum
    * expressions must be exact types (integer/decimal), same as
    * [[withRunningSums]]. Output keeps `__pid`. */
  def withGroupedRunningSum(df: DataFrame, groupCols: Seq[String],
      leadNum: Column, order: Seq[Column], name: String, expr: Column,
      buckets: Int = 32, maxGroups: Int = 100000): DataFrame = {
    val keys = PidCol +: groupCols
    val withPid = bucketed(df, leadNum, buckets)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = withPid.withColumn(name, sum(expr).over(w))
    val totals = withPid.groupBy(keys.map(col): _*)
      .agg(sum(expr).as("__tot")).cache()
    persistedFrames.add(totals)
    val nRows = totals.count()
    require(nRows <= buckets.toLong * maxGroups,
      s"withGroupedRunningSum: ${nRows} (bucket, group) cells exceed " +
        s"buckets*maxGroups = ${buckets.toLong * maxGroups} — the group " +
        "key looks row-grained; use a plain grouped window instead")
    val wOff = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col(PidCol).asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = totals
      .withColumn("__off", sum(col("__tot")).over(wOff))
      .filter(col("__off").isNotNull).drop("__tot")
    local.join(broadcast(offsets), keys, "left")
      .withColumn(name,
        // lit(0L) coerces to the sum's exact type (long or decimal)
        col(name) + coalesce(col("__off"), lit(0L)))
      .drop("__off")
  }

  /** Replicate each bucket's last `ctxRows` rows (by `order`) into the
    * NEXT bucket as flagged context, so a within-bucket window looking
    * back ≤ ctxRows rows sees exactly its global predecessors. Context
    * keys sort strictly before the target bucket's own keys (bucket
    * boundaries are strict), so ordering is preserved. Input must carry
    * `__pid`; compute windows over `windowSpec(order)` then `dropContext`.
    */
  def withContext(df: DataFrame, order: Seq[Column], ctxRows: Int): DataFrame = {
    val wDesc = Window.partitionBy(col(PidCol)).orderBy(order.map(_.desc): _*)
    val ctx = df.withColumn("__rnd", row_number().over(wDesc))
      .filter(col("__rnd") <= ctxRows).drop("__rnd")
      .withColumn(PidCol, col(PidCol) + 1)
      .withColumn(CtxCol, lit(true))
    df.withColumn(CtxCol, lit(false)).unionByName(ctx)
  }

  /** The within-bucket window equal to the global-order window for
    * frames reaching back at most the replicated context. */
  def windowSpec(order: Seq[Column]) =
    Window.partitionBy(col(PidCol)).orderBy(order: _*)

  /** Drop context rows and bucketing helpers. */
  def dropContext(df: DataFrame): DataFrame =
    df.filter(!col(CtxCol)).drop(PidCol, CtxCol)

  def dropBuckets(df: DataFrame): DataFrame = df.drop(PidCol)

  /** Global row_number over an arbitrary multi-column sort order (any
    * asc/desc/null placement) without a single-partition WindowExec:
    * range-repartition on the order, count rows per range (a ≤buckets-row
    * aggregate), then within-range row_number plus the collected prefix
    * offsets. Equal keys always land in one range, so the same offsets
    * also make within-range `rank()` globally correct. The range
    * exchange is computed once and reused across the two jobs (shuffle
    * stage reuse). Returns (frame with `out` column, total row count). */
  def withGlobalRowNumber(df: DataFrame, ord: Seq[Column], out: String = "rn",
      buckets: Int = 32): (DataFrame, Long) = {
    // Persisted: RangePartitioner samples with an execution-dependent
    // seed, so two separate jobs over the same plan can draw DIFFERENT
    // boundaries — the counts pass and the ranking pass must see one
    // materialized partitioning or the offsets silently misalign.
    val parted = df.repartitionByRange(buckets, ord: _*)
      .withColumn(PidCol, spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    persistedFrames.add(parted)
    val counts = parted.groupBy(col(PidCol)).count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    var acc = 0L
    val offsets = counts.map { case (p, c) => val o = acc; acc += c; (p, o) }
      .filter(_._2 != 0L)
    val offsetExpr = offsets.foldLeft(lit(0L)) { case (e, (p, o)) =>
      when(col(PidCol) === p, lit(o)).otherwise(e)
    }
    val w = Window.partitionBy(col(PidCol)).orderBy(ord: _*)
    (parted.withColumn(out, row_number().over(w) + offsetExpr).drop(PidCol), acc)
  }

  /** Global ntile(n) (qcut-style quantile bucketing) from the
    * distributed row number: buckets 1..(N mod n) hold ⌈N/n⌉ rows, the
    * rest ⌊N/n⌋ — the SQL ntile definition, evaluated as arithmetic on
    * rn with N collected during the ranking pass. */
  def globalNtile(df: DataFrame, ord: Seq[Column], n: Int, out: String,
      buckets: Int = 32): DataFrame = {
    val (ranked, total) = withGlobalRowNumber(df, ord, "__grn", buckets)
    val k = total / n; val m = total % n
    // floor of a double division is exact here: rn ≪ 2^53
    val bucket =
      if (k == 0L) col("__grn")
      else when(col("__grn") <= m * (k + 1),
          floor((col("__grn") - 1) / (k + 1)) + 1)
        .otherwise(lit(m) + floor((col("__grn") - 1 - m * (k + 1)) / k) + 1)
    ranked.withColumn(out, bucket.cast("int")).drop("__grn")
  }

  /** Global forward-fill (ffill / merge_ordered fill) over a total
    * order: per-bucket windows fill locally, and each bucket's missing
    * prefix is seeded with the LATEST non-null value of any preceding
    * bucket — a ≤buckets-row aggregate (FILTER'd max_by per column)
    * collected once and re-broadcast as literals. Deterministic literal
    * boundaries (same machinery as withRunningSums), so no persist is
    * needed. */
  def withGlobalFfill(df: DataFrame, leadNum: Column, order: Seq[Column],
      fillCols: Seq[String], buckets: Int = 32): DataFrame = {
    val withPid = bucketed(df, leadNum, buckets)
    // per column, last non-null in-bucket value via max_by over the
    // order struct (FILTER keeps null values out of the argmax)
    val tagged = withPid.withColumn("__ok", struct(order: _*))
    val aggCols = fillCols.map(c =>
      expr(s"max_by($c, __ok) FILTER (WHERE $c IS NOT NULL)").as(s"__last_$c"))
    val lastRows = tagged.groupBy(col(PidCol))
      .agg(aggCols.head, aggCols.tail: _*)
      .collect().sortBy(_.getInt(0))
    // seed for bucket p and column i: latest non-null among buckets < p
    val pidOf = lastRows.map(_.getInt(0))
    val seeds: Map[Int, Seq[Any]] = pidOf.zipWithIndex.map { case (p, rowIdx) =>
      p -> fillCols.indices.map { ci =>
        var q = rowIdx - 1; var v: Any = null
        while (q >= 0 && v == null) { v = lastRows(q).get(ci + 1); q -= 1 }
        v
      }
    }.toMap
    val w = Window.partitionBy(col(PidCol)).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    fillCols.zipWithIndex.foldLeft(tagged.drop("__ok")) { case (d, (c, ci)) =>
      val seedExpr = seeds.toSeq.sortBy(_._1).foldLeft(lit(null)) {
        case (e, (p, vs)) =>
          if (vs(ci) == null) e
          else when(col(PidCol) === p, lit(vs(ci))).otherwise(e)
      }
      d.withColumn(c,
        coalesce(last(col(c), ignoreNulls = true).over(w), seedExpr))
    }.drop(PidCol)
  }

  /** One-shuffle distributed rolling sum over a GLOBAL order for exact
    * integer (cent) values — the scale path for pandas
    * `rolling(n).sum()` on the whole frame.
    *
    * Plan: range-repartition on the order (RangePartitioner's seeded
    * reservoir sample — no extra quantile pass) + in-partition sort,
    * persisted once; then
    *   pass 1 (slim): per-partition row count, total, and the local
    *     running sums of its last `n` rows (≤ buckets·n longs to the
    *     driver — boundary state, not data);
    *   pass 2: per-partition linear scan with an n-slot ring buffer of
    *     global running sums, seeded from the previous partitions'
    *     tails, emitting cum − cum@(rn−n) per row.
    *
    * No WindowExec, no second full-data shuffle; cents stay exact in
    * Long (100 TB of 2-decimal values ≪ 2^63). Emits the input columns
    * plus `roll_sum_cents` and the global row number `rn`. Identical
    * duplicate rows are interchangeable (multiset-correct ties).
    */
  def centRollingSum(df: DataFrame, ord: Seq[Column], valueCents: Column,
      n: Int, buckets: Int = 32): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.LongType
    val base = df.withColumn("__c", valueCents.cast("long"))
      .repartitionByRange(buckets, ord: _*)
      .sortWithinPartitions(ord: _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    persistedFrames.add(base)

    // Pass 1: boundary stats. Local cum of row j lives at ring((j-1) % n).
    val stats = base.select(col("__c")).rdd.mapPartitionsWithIndex { (pid, it) =>
      var cnt = 0L; var tot = 0L
      val ring = new Array[Long](n)
      it.foreach { r =>
        tot += r.getLong(0); cnt += 1; ring(((cnt - 1) % n).toInt) = tot
      }
      val tailLen = math.min(cnt, n.toLong).toInt
      val tail = Array.tabulate(tailLen) { i =>
        ring(((cnt - tailLen + i) % n).toInt)
      }
      Iterator.single((pid, cnt, tot, tail))
    }.collect().sortBy(_._1)

    val nParts = stats.length
    val sumOff = new Array[Long](nParts)
    val rnOff = new Array[Long](nParts)
    var accSum = 0L; var accRn = 0L
    stats.foreach { case (p, cnt, tot, _) =>
      sumOff(p) = accSum; rnOff(p) = accRn; accSum += tot; accRn += cnt
    }
    // Global cums of the ≤n rows preceding each partition (oldest first),
    // walking back across partitions shorter than n.
    val seeds: Array[Array[Long]] = Array.tabulate(nParts) { p =>
      val buf = scala.collection.mutable.ArrayBuffer.empty[Long]
      var q = p - 1
      while (q >= 0 && buf.size < n) {
        val (_, _, _, tail) = stats(q)
        val global = tail.map(_ + sumOff(q))
        buf.prependAll(global.takeRight(n - buf.size))
        q -= 1
      }
      buf.toArray
    }

    val cIdx = base.schema.fieldIndex("__c")
    val outRdd = base.rdd.mapPartitionsWithIndex { (pid, it) =>
      val off = sumOff(pid); val ro = rnOff(pid)
      val ring = new Array[Long](n)
      val seed = seeds(pid)
      var i = 0
      while (i < seed.length) {
        val r = ro - seed.length + 1 + i
        ring(((r - 1) % n).toInt) = seed(i); i += 1
      }
      var localCnt = 0L; var localSum = 0L
      it.map { row =>
        localSum += row.getLong(cIdx); localCnt += 1
        val rn = ro + localCnt; val cum = off + localSum
        val idx = ((rn - 1) % n).toInt
        val lagCum = if (rn > n) ring(idx) else 0L
        ring(idx) = cum
        Row.fromSeq(row.toSeq :+ (cum - lagCum) :+ rn)
      }
    }
    val schema = base.schema.add("roll_sum_cents", LongType).add("rn", LongType)
    df.sparkSession.createDataFrame(outRdd, schema).drop("__c")
  }
}
