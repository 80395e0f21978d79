package graft.core

import java.text.Normalizer

/** Identifier / text normalization helpers (SURVEY §2.3 O1).
  *
  * Semantics match the reference's `normalize_column_name`
  * (reference: src/preprocess_to_staging.py:13-32): NFKD unaccent to
  * ASCII, lowercase, strip, collapse non-alphanumeric runs to `_`,
  * prefix `_` when the name starts with a digit.
  *
  * These run on *schema names* (driver-side, tiny), so plain Scala is
  * correct here — no UDF / Expression needed. The data-side variant
  * lives in [[graft.operators.TextAnalysis.normalizeText]].
  */
object Names {

  /** NFKD-decompose and drop combining marks + any remaining non-ASCII,
    * mirroring Python's `unicodedata.normalize('NFKD', s).encode('ASCII', 'ignore')`. */
  def unaccent(s: String): String =
    Normalizer
      .normalize(s, Normalizer.Form.NFKD)
      .replaceAll("\\p{M}+", "")
      .filter(_ < 128)

  /** `"Date de début"` -> `date_de_debut`, `"type d'implantation"` ->
    * `type_d_implantation`, `"1col"` -> `_1col`. */
  def normalizeColumnName(raw: String): String = {
    val ascii = unaccent(raw).toLowerCase.trim
    val underscored = ascii.replaceAll("[^a-z0-9]+", "_")
    if (underscored.nonEmpty && underscored.head.isDigit) "_" + underscored
    else underscored
  }
}
