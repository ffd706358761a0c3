package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Generic SCD Type-2 dimension maintenance.
  *
  * Re-expresses the reference's 4-step transactional SCD2
  * (snapshot → expire UPDATE → INSERT versions → cleanup,
  * etl_target_loader.py:299-656) as one deterministic DataFrame
  * computation: `history ∪ unchangedCurrent ∪ expired ∪ newVersions ∪
  * brandNew`, written atomically by overwrite. Constants follow the
  * reference: initial/new rows effective 2000-01-01, current rows
  * expire 9999-12-31, a changed row expires at runDate−1 and its
  * successor becomes effective at runDate (etl_target_loader.py:46-49,
  * 359-363). `runDate` is injected for determinism (no wall clock).
  *
  * Scale: one shuffle on the natural key (the join of current ×
  * updates); everything else is union + filter. Change detection uses
  * the reference's concat-fingerprint (CONCAT(COALESCE(col,''),'|',…),
  * etl_target_loader.py:333-341) so NULL→'' coercions match exactly.
  */
object Scd {
  val Epoch     = "2000-01-01"
  val FarFuture = "9999-12-31"

  final case class Cols(
      version: String = "version",
      effective: String = "effective_date",
      expiry: String = "expiry_date",
      isCurrent: String = "is_current")

  private def fingerprint(tracked: Seq[String], prefix: String = ""): org.apache.spark.sql.Column =
    concat_ws("|", tracked.map(t => coalesce(col(prefix + t).cast("string"), lit(""))): _*)

  /** First load: every row version 1, effective Epoch, current. */
  def initial(src: DataFrame, c: Cols = Cols()): DataFrame = src
    .withColumn(c.version, lit(1L))
    .withColumn(c.effective, to_date(lit(Epoch)))
    .withColumn(c.expiry, to_date(lit(FarFuture)))
    .withColumn(c.isCurrent, lit(true))

  /** Apply a batch of updates to an SCD2 dimension.
    *
    * Precondition (matching the reference exactly): every key present
    * in `dim` has exactly one current row. A key existing only as
    * expired history would silently drop its update — in the reference
    * too: the expire step matches `is_current = TRUE` rows only, and
    * the insert step requires "completely new" (no versions at all) OR
    * "just expired" (etl_target_loader.py:320-344, 383-389) — so a
    * history-only key matches neither. This state is unreachable
    * through [[applyChanges]]/[[initial]] themselves (every expire
    * writes a successor version in the same batch).
    *
    * @param dim      current dimension (all versions)
    * @param updates  latest attribute values keyed by `keys` (caller
    *                 dedups to one row per key, e.g. via
    *                 [[Relational.latestPerKey]])
    * @param tracked  attribute columns whose change triggers a new version
    * @param runDate  logical load date, "yyyy-MM-dd"
    */
  def applyChanges(dim: DataFrame, updates: DataFrame, keys: Seq[String],
      tracked: Seq[String], runDate: String, c: Cols = Cols()): DataFrame = {
    val dimCols  = dim.columns.toSeq
    val current  = dim.filter(col(c.isCurrent))
    val history  = dim.filter(!col(c.isCurrent))

    // updates with tracked columns renamed so the join is unambiguous
    val u = updates.select(
      keys.map(col) ++ tracked.map(t => col(t).as(s"__u_$t")): _*)

    val joined = current.join(u, keys, "inner")
      .where(fingerprint(tracked) =!= fingerprint(tracked, "__u_"))
      .cache() // reused 3× (expired, newVersions, anti-key set)

    val changedKeys = joined.select(keys.map(col): _*)

    val expired = joined
      .select(dimCols.map(col): _*)
      .withColumn(c.expiry, date_sub(to_date(lit(runDate)), 1))
      .withColumn(c.isCurrent, lit(false))

    val newVersions = joined
      .select(keys.map(col) ++ tracked.map(t => col(s"__u_$t").as(t)) :+
        (col(c.version) + 1L).as(c.version): _*)
      .withColumn(c.effective, to_date(lit(runDate)))
      .withColumn(c.expiry, to_date(lit(FarFuture)))
      .withColumn(c.isCurrent, lit(true))
      .select(dimCols.map(col): _*)

    val unchangedCurrent = current.join(changedKeys, keys, "left_anti")

    // keys present in updates but absent from the dimension entirely:
    // reference inserts them effective Epoch (etl_target_loader.py:359-362)
    val brandNew = initial(
      updates.join(dim.select(keys.map(col): _*).distinct(), keys, "left_anti"), c)
      .select(dimCols.map(col): _*)

    history
      .unionByName(unchangedCurrent)
      .unionByName(expired)
      .unionByName(newVersions)
      .unionByName(brandNew)
  }

  /** Point-in-time (range) join of a fact to an SCD2 dimension: picks
    * the dimension version valid on the fact date (reference:
    * `fact_date BETWEEN effective_date AND expiry_date`,
    * etl_target_loader.py:750-758). Catalyst plans the equi part as a
    * hash/sort-merge join with the range as a post-join residual, so
    * this shuffles once on the natural key.
    */
  def pointInTime(fact: DataFrame, dim: DataFrame, factKey: String,
      dimKey: String, factDate: String, c: Cols = Cols()): DataFrame =
    fact.join(dim,
      fact(factKey) === dim(dimKey) &&
        fact(factDate) >= dim(c.effective) &&
        fact(factDate) <= dim(c.expiry))
}
