package graft.etl

import graft.functions.Md5ModExpr
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge

/** Deterministic key generation (SURVEY F1/F2/F21/F22).
  *
  * Business keys follow the reference exactly: `PREFIX_` + first 14 hex
  * chars of md5 of the key string (etl_ods_loader.py:91-170), so a user
  * of the reference sees identical ids from this engine.
  *
  * The reference also derives synthetic numbers two ways:
  *  - `int(hashlib.md5(x).hexdigest(), 16) % n` — the full 128-bit md5
  *    integer mod n (inventory levels, supplier pick;
  *    etl_ods_loader.py:425, 814-817). Reproduced exactly by
  *    [[md5Mod]] (native expression, BigInteger mod under the hood).
  *  - Python builtin `hash(x) % n` (contact fields,
  *    etl_ods_loader.py:339-343) — PYTHONHASHSEED-dependent, so NOT
  *    reproducible even between two runs of the reference itself.
  *    Declared divergence: we substitute [[md5Mod]] for these too.
  */
object Ids {

  /** `PREFIX_` + first 14 hex chars of md5(key). */
  def businessKey(prefix: String, key: Column): Column =
    concat(lit(prefix + "_"), substring(md5(key), 1, 14))

  /** YYYYMMDD integer date id (etl_ods_loader.py:91-93). */
  def dateId(d: Column): Column =
    (year(d) * 10000 + month(d) * 100 + dayofmonth(d)).cast("int")

  /** Exact `int(md5(x),16) % n` — the full 128-bit value, matching the
    * reference bit-for-bit (a 64-bit truncation would not: 2^64 mod n
    * ≠ 1 in general). */
  def md5Mod(c: Column, n: Long): Column = md5ModBy(c, lit(n))

  /** Same, with a per-row modulus column (the supplier-pick site mods
    * by the category's supplier count, etl_ods_loader.py:425). */
  def md5ModBy(c: Column, n: Column): Column =
    ColumnBridge.column(Md5ModExpr(
      ColumnBridge.expression(c), ColumnBridge.expression(n.cast("long"))))
}
