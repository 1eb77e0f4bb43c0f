package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII masking beyond the reference's constant-literal replacement
  * (T4, `UserProfileTransform.java:61-62`): the generalized masks a real
  * pipeline needs, all deterministic and DuckDB-renderable.
  */
object MaskFunctions {

  /** T4 exact semantics: unconditional literal. */
  def literalMask(value: String = "redacted@email.com"): Column = lit(value)

  /** Keep the domain, redact the local part: a@b.com -> redacted@b.com. */
  def redactEmailLocal(email: Column): Column =
    regexp_replace(email, "^[^@]+", "redacted")

  /** Salted one-way hash (sha-256 hex) — joinable pseudonymization:
    * equal inputs map to equal tokens but originals are unrecoverable. */
  def hashMask(c: Column, salt: String): Column =
    sha2(concat(lit(salt), c), 256)

  /** Show only the last `keep` chars: 12345678 -> ****5678. */
  def partialMask(c: Column, keep: Int): Column =
    concat(
      repeat(lit("*"), greatest(length(c) - keep, lit(0))),
      substring(c, -keep, keep))
}
