package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

/** JSONL (newline-delimited JSON) corpus ingest — the de-facto
  * interchange format for LLM training corpora. Schema is EXPLICIT
  * (never inferSchema — the same contract as [[graft.etl.CsvSource]]:
  * a sampling-based inference pass both costs a corpus scan and can
  * flip types between batches), parsing is PERMISSIVE, and malformed
  * lines are QUARANTINED rather than dropped or fatal: a crawl batch
  * always contains some torn writes and truncated records, and a
  * pipeline must both keep loading and account for every input line.
  *
  * Returns (clean, quarantine): `clean` carries exactly `schema`'s
  * columns for rows that parsed; `quarantine` carries the raw
  * malformed line in `corruptCol` for the audit sink. A field
  * missing from a valid JSON line is a null in `clean`, not a
  * quarantine — absence is data, torn syntax is not. Blank and
  * whitespace-only lines (and the bare `null` literal) quarantine:
  * they are not documents, and letting them through as phantom
  * all-null rows would break the line accounting.
  *
  * Execution: ONE parallel text scan + `from_json` with the corrupt
  * record column in the parse schema, so both sides split off the
  * SAME parse — clean ∪ quarantine is exactly the input, line for
  * line. (The native `spark.read.json` reader is deliberately not
  * used here: it refuses plans whose required schema prunes down to
  * only the corrupt column — precisely the shape a
  * quarantine-counting audit takes. `from_json` has no such
  * restriction, and Catalyst's json-expression pruning still drops
  * unaccessed fields from the parse.) Consumers reading only clean
  * wide corpora can always take plain `spark.read.schema(s).json`;
  * this entry point is for ingest that must account for its rejects.
  */
object JsonlSource {

  def read(spark: SparkSession, path: String, schema: StructType,
      corruptCol: String = "_corrupt_record"): (DataFrame, DataFrame) = {
    require(!schema.fieldNames.contains(corruptCol),
      s"schema already contains the corrupt-record column '$corruptCol'")
    val withCorrupt = schema.add(corruptCol, StringType)
    val parsed = spark.read.textFile(path).toDF("value")
      .select(col("value"), from_json(col("value"), withCorrupt,
        Map("mode" -> "PERMISSIVE",
          "columnNameOfCorruptRecord" -> corruptCol)).as("j"))
    // malformed = parser flagged it (corrupt col set), OR the whole
    // parse came back null — from_json yields a NULL struct (corrupt
    // col unset) for blank/whitespace-only lines and the bare `null`
    // literal, which are NOT documents; without this disjunct they
    // would leak into `clean` as phantom all-null rows and undercount
    // the quarantine, breaking the every-line accounting
    val bad = col("j").isNull || col("j").getField(corruptCol).isNotNull
    (parsed.where(!bad).select(
        schema.fieldNames.map(f => col("j").getField(f).as(f)).toSeq: _*),
      parsed.where(bad).select(
        coalesce(col("j").getField(corruptCol), col("value")).as(corruptCol) +:
          schema.fieldNames.map(f => col("j").getField(f).as(f)).toSeq: _*))
  }
}
