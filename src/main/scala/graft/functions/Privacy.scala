package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** PII detection and redaction — a mandatory pass in any training-data
  * pipeline before text leaves the curation boundary. Pure map-only column
  * expressions (regexp_count / regexp_replace stay inside whole-stage
  * codegen), so at 100 TB this is embarrassingly parallel scan work with
  * no shuffle at all: detection emits per-doc counts, redaction rewrites
  * the text column in place.
  *
  * Patterns are deliberately ASCII/RE2-safe (no lookahead, no unicode
  * classes) so Java regex (Spark) and RE2 (DuckDB) match identically and
  * the operator is oracle-checkable.
  */
object Privacy {

  /** Email addresses (conservative: alnum+punct local part, dotted domain,
    * alpha TLD). */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** North-American-style dashed phone numbers in the reserved 555 test
    * exchange shape the synthetic corpus carries. */
  val PhonePattern = "\\b555-[0-9]{3}-[0-9]{4}\\b"

  /** Dotted-quad IPv4 literals. */
  val IpPattern = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  /** Deterministic PII enrichment of the synthetic corpus (the raw
    * documents table is digit-free word salad): contact lines derived from
    * doc_id, same derived-column technique as Multimodal.withMediaColumns —
    * every value is a pure function of table fields, so the DuckDB oracle
    * reproduces the input bit-for-bit. Docs hit 0–3 of the three PII kinds
    * depending on doc_id residues. */
  def withPiiColumns(docs: DataFrame): DataFrame = {
    val id = col("doc_id")
    docs.withColumn("text_pii", concat(col("text"),
      when(id % 3 === 0,
        concat(lit(" contact user"), id.cast("string"), lit("@example.com"))).otherwise(lit("")),
      when(id % 5 === 0,
        concat(lit(" call 555-"), lpad((id % 1000).cast("string"), 3, "0"),
          lit("-"), lpad((id % 10000).cast("string"), 4, "0"))).otherwise(lit("")),
      when(id % 7 === 0,
        concat(lit(" host 10.0."), (id % 256).cast("string"),
          lit("."), (id % 100).cast("string"))).otherwise(lit(""))))
  }

  /** Redact all three PII kinds, emails first so their dotted domains can
    * never be half-eaten by the IP pass. */
  def redact(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, lit(EmailPattern), lit("[EMAIL]")),
        lit(PhonePattern), lit("[PHONE]")),
      lit(IpPattern), lit("[IP]"))

  /** x27 — PII scan + redaction over the (deterministically enriched)
    * documents table: per-doc counts per PII kind, an any-hit flag, and the
    * redacted text. Map-only; the scan is the only data touch. */
  def x27PiiRedact(s: SparkSession, dir: String): DataFrame =
    withPiiColumns(documents(s, dir))
      .select(col("doc_id"),
        regexp_count(col("text_pii"), lit(EmailPattern)).as("n_emails"),
        regexp_count(col("text_pii"), lit(PhonePattern)).as("n_phones"),
        regexp_count(col("text_pii"), lit(IpPattern)).as("n_ips"),
        (regexp_count(col("text_pii"), lit(EmailPattern))
          + regexp_count(col("text_pii"), lit(PhonePattern))
          + regexp_count(col("text_pii"), lit(IpPattern)) > 0).as("has_pii"),
        redact(col("text_pii")).as("redacted"))
      .orderBy(col("doc_id"))
}
