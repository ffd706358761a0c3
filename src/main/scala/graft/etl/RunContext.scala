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
  */
final case class RunContext(runDate: LocalDate, batchId: String) {
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
