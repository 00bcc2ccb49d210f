package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** merge_asof (SURVEY §2.3 flagship custom operator; reference:
  * pandas/core/reshape/merge.py:229 merge_asof, :1290 _AsOfMerge,
  * kernels _libs/join.pyx:680-1020).
  *
  * Implementation: the union-tag trick. Tag left rows 0 and right rows 1,
  * union them, and take a running last/first of the right-side payload
  * over (by, on) order. Cost: ONE shuffle on `by` + an in-partition sort
  * — the same asymptotics as a sort-merge join, no row explosion, no
  * range self-join. This is the 100 TB-safe formulation: each `by` group
  * is processed independently, so skew handling falls out of AQE.
  *
  * `right` must be unique per (by, on): pre-dedupe with
  * SelectionOps.dropDuplicates(keep="last") if it isn't — matching
  * pandas, which takes the last right row among equal keys.
  */
object AsofOps {

  /** direction='backward' (default) or 'forward'. Returns all left rows
    * + matched right payload columns (null when nothing qualifies) +
    * `__matched_on`: the matched right key (for tolerance checks /
    * debugging; drop it if unwanted).
    */
  def asof(left: DataFrame, right: DataFrame, on: String, by: Seq[String],
      rightCols: Seq[String], direction: String = "backward",
      allowExact: Boolean = true,
      toleranceMicros: Option[Long] = None): DataFrame = {

    val leftOnly = left.columns.toSeq.filterNot(c => by.contains(c) || c == on)
    require(leftOnly.intersect(rightCols).isEmpty,
      s"left/right column collision: rename first (${leftOnly.intersect(rightCols)})")

    val lTagged = rightCols.foldLeft(left.withColumn("__side", lit(0))) {
      (df, c) => df.withColumn(c, lit(null).cast(right.schema(c).dataType))
    }
    val rTagged = leftOnly.foldLeft(
      right.select((by.map(col) :+ col(on)) ++ rightCols.map(col): _*)
        .withColumn("__side", lit(1))) {
      (df, c) => df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }
    val cols = (by :+ on) ++ leftOnly ++ rightCols :+ "__side"
    val all = lTagged.select(cols.map(col): _*)
      .unionByName(rTagged.select(cols.map(col): _*))

    // At equal `on`, the right row must be inside the frame iff
    // allow_exact_matches: backward looks back from the current row, so
    // exact-eligible right rows sort BEFORE left ones; forward mirrors.
    val sideOrder = (direction, allowExact) match {
      case ("backward", true)  => col("__side").desc
      case ("backward", false) => col("__side").asc
      case ("forward", true)   => col("__side").asc
      case ("forward", false)  => col("__side").desc
      case (d, _) => throw new IllegalArgumentException(s"direction=$d")
    }
    val base = (if (by.isEmpty) Window.partitionBy() else Window.partitionBy(by.map(col): _*))
      .orderBy(col(on).asc, sideOrder)
    val w = direction match {
      case "backward" => base.rowsBetween(Window.unboundedPreceding, 0)
      case _          => base.rowsBetween(0, Window.unboundedFollowing)
    }
    def pick(c: Column): Column = direction match {
      case "backward" => last(c, ignoreNulls = true).over(w)
      case _          => first(c, ignoreNulls = true).over(w)
    }

    val matchedOn = pick(when(col("__side") === 1, col(on)))
    val withinTol: Column = toleranceMicros match {
      case None => matchedOn.isNotNull
      case Some(tol) =>
        val delta = direction match {
          case "backward" => unix_micros(col(on)) - unix_micros(matchedOn)
          case _          => unix_micros(matchedOn) - unix_micros(col(on))
        }
        matchedOn.isNotNull && delta <= tol
    }

    val filled = rightCols.foldLeft(all) { (df, c) =>
      df.withColumn(c, when(withinTol, pick(col(c))).otherwise(lit(null)))
    }.withColumn("__matched_on", when(withinTol, matchedOn).otherwise(lit(null)))

    filled.filter(col("__side") === 0).drop("__side")
  }

  /** direction='nearest': the closer of backward/forward, backward wins
    * ties (pandas semantics). Computed as both directions + a choice —
    * two window passes over the same shuffled layout. */
  def asofNearest(left: DataFrame, right: DataFrame, on: String, by: Seq[String],
      rightCols: Seq[String], leftKey: String,
      toleranceMicros: Option[Long] = None): DataFrame = {
    val b = asof(left, right, on, by, rightCols, "backward", true, toleranceMicros)
    val f = asof(left, right, on, by, rightCols, "forward", true, toleranceMicros)
    val bSel = b.select((Seq(leftKey, on).map(col) :+ col("__matched_on").as("__b_on")) ++
      rightCols.map(c => col(c).as(s"__b_$c")): _*)
    val fSel = f.select((Seq(leftKey).map(col) :+ col("__matched_on").as("__f_on")) ++
      rightCols.map(c => col(c).as(s"__f_$c")): _*)
    val j = bSel.join(fSel, Seq(leftKey))
    val bDelta = unix_micros(col(on)) - unix_micros(col("__b_on"))
    val fDelta = unix_micros(col("__f_on")) - unix_micros(col(on))
    val useBackward = col("__b_on").isNotNull &&
      (col("__f_on").isNull || bDelta <= fDelta)
    val out = rightCols.foldLeft(j) { (df, c) =>
      df.withColumn(c, when(useBackward, col(s"__b_$c")).otherwise(col(s"__f_$c")))
    }
    out.select((Seq(leftKey) ++ rightCols).map(col): _*)
  }
}
