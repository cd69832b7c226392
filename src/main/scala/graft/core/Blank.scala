package graft.core

/** Null / empty-string duality helpers.
  *
  * The reference treats a cell as "empty" when it is either missing (pandas
  * NaN / None) or whitespace-only, but *preserves* whichever form was present
  * (reference: src/utils/preprocess_table.py:99-100,121,145). We model the
  * pandas NaN as Scala `null` and keep the dual representation intact.
  */
object Blank {
  /** Python `pd.isna(v) or str(v).strip() == ''`. */
  @inline def isBlank(s: String): Boolean = s == null || s.trim.isEmpty

  /** Python truthiness of a string-or-None: None and "" are falsy. */
  @inline def isFalsy(s: String): Boolean = s == null || s.isEmpty

  /** Python `str(v)` on a possibly-missing value: None -> "None".
    * (pandas column labels go through str() in the reference,
    * preprocess_table.py:84,93.) */
  @inline def pyStr(s: String): String = if (s == null) "None" else s

  /** Python3 round() — half-to-even ("banker's") rounding, used by
    * fuzzywuzzy's utils.intr (int(round(x))). */
  @inline def pyRound(x: Double): Int = math.rint(x).toInt
}
