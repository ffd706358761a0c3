package graft.etl

import java.time.LocalDate

/** Injected run parameters — the determinism boundary of the pipeline.
  *
  * The reference leans on three nondeterministic sources (SURVEY §7.4):
  * `datetime.now()` stamped into data (etl_ods_loader.py:241 et al.),
  * unseeded `random` for synthetic returns/inventory
  * (etl_ods_loader.py:693-745, 834-836), and process-seeded Python
  * `hash()` for contact fields (etl_ods_loader.py:339-343). This engine
  * replaces all three with values derived from this context plus
  * md5-based hashing, so every run over the same input is bit-identical
  * and layer outputs are assertable in tests.
  *
  * @param runDate  the logical "today" (SCD2 effective/expiry anchor,
  *                 future-date filters)
  * @param batchId  audit batch id (reference: BATCH_yyyyMMddHHmmss,
  *                 etl_staging_loader.py:47)
  * @param decimalMeasures  DDL-type fidelity switch (SURVEY §1.2
  *                 declared divergence): the reference DDL declares
  *                 money measures Numeric(12,2)/(10,2)
  *                 (etl_ods_tables.py:162-165) but its runtime computes
  *                 them in float (etl_staging_loader.py:834-845). Off
  *                 (default) stores doubles — float-faithful to the
  *                 reference runtime; on, fact money columns are STORED
  *                 as the DDL's DecimalType while the arithmetic stays
  *                 the reference's own float.
  */
final case class RunContext(runDate: LocalDate, batchId: String,
    decimalMeasures: Boolean = false) {
  def runDateStr: String = runDate.toString
  /** Audit timestamp: midnight of runDate — a constant, not a clock. */
  def tsStr: String = s"$runDateStr 00:00:00"
}

object RunContext {
  def apply(runDate: String): RunContext = {
    val d = LocalDate.parse(runDate)
    RunContext(d, "BATCH_" + runDate.replace("-", "") + "000000")
  }
}
