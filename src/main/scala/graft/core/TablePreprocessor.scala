package graft.core

import scala.collection.mutable.ArrayBuffer

/** Auxiliary-column cleanup for detected tables — faithful port of the
  * reference's `preprocess_array` / `preprocess_dataframe`
  * (reference: src/utils/preprocess_table.py:13-221).
  *
  * A detected table marks helper columns with `Col\d+` headers (or empty
  * headers); their content must be merged into the adjacent real column and
  * the helper dropped. Invariant (reference docstring, preprocess_table.py:26):
  * a non-blank target cell is NEVER overwritten by a fill — except the
  * documented `combine_first` quirk on the *first* auxiliary column, where a
  * present-but-empty-string source cell does overwrite (pandas combine_first
  * only treats NaN as missing, preprocess_table.py:106).
  *
  * pandas quirks preserved on purpose:
  *   - `df.drop(columns=[name])` drops ALL columns with that name;
  *   - `df[name] = series` assigns into ALL columns with that name;
  *   - `df.astype(str)` renders missing cells as the literal string "None"
  *     (preprocess_table.py:217): table cells enter as Python None in object
  *     columns and stay None through fills/combine_first, and str(None) is
  *     "None" — verified against the reference implementation on random
  *     tables (see ReferenceCrossCheckSpec);
  *   - row drops: all-missing rows first (dropna(how='all')), then rows
  *     whose every cell is a whitespace-only *string* (a missing cell
  *     stringifies to "nan" and keeps the row) (preprocess_table.py:210-213).
  *
  * Cells are `String`s where `null` models pandas NaN.
  */
object TablePreprocessor {

  private val ColRe = "^Col\\d+".r

  private final class Col(var name: String, val values: ArrayBuffer[String])

  /** data(0) is the header row; returns cleaned table with header re-prepended
    * (reference: data2df/df2data round-trip, src/utils/dataframe.py:7-15). */
  def preprocessArray(data: IndexedSeq[IndexedSeq[String]]): Vector[Vector[String]] = {
    require(data.nonEmpty, "table must have a header row")
    val header = data.head
    val width = header.length
    // columns-of-values; rows padded/truncated defensively to header width
    val cols = ArrayBuffer.tabulate(width) { c =>
      val buf = new ArrayBuffer[String](data.length - 1)
      var r = 1
      while (r < data.length) {
        buf += (if (c < data(r).length) data(r)(c) else null)
        r += 1
      }
      new Col(header(c), buf)
    }
    val nRows = data.length - 1

    // -- rename blank headers to unique temp names (preprocess_table.py:82-90)
    val emptyColMap = scala.collection.mutable.HashMap.empty[String, String]
    var i = 0
    while (i < cols.length) {
      if (Blank.pyStr(cols(i).name).trim.isEmpty) {
        val temp = s"__EMPTY_COL_${i}__"
        emptyColMap(temp) = cols(i).name
        cols(i).name = temp
      }
      i += 1
    }

    // -- auxiliary columns by name (preprocess_table.py:93)
    def isAuxName(n: String): Boolean =
      Blank.isFalsy(n) || ColRe.findFirstIn(Blank.pyStr(n)).isDefined ||
        Blank.pyStr(n).startsWith("__EMPTY_COL_")
    val auxCols = ArrayBuffer.from(cols.iterator.map(_.name).filter(isAuxName))

    def names: IndexedSeq[String] = cols.map(_.name).toIndexedSeq
    def firstIndexOf(n: String): Int = cols.indexWhere(_.name == n)
    def dropAllNamed(n: String): Unit = {
      var k = cols.length - 1
      while (k >= 0) { if (cols(k).name == n) cols.remove(k); k -= 1 }
    }

    // -- first pass: first aux column with content merges into the first
    //    real column via combine_first (preprocess_table.py:96-109)
    auxCols.headOption.foreach { firstCol =>
      val srcIdx = firstIndexOf(firstCol)
      if (srcIdx >= 0) {
        val src = cols(srcIdx).values
        val hasContent = src.exists(v => !Blank.isBlank(v))
        if (hasContent) {
          cols.find(c => !auxCols.contains(c.name) && Blank.pyStr(c.name).trim.nonEmpty)
            .foreach { target =>
              val targetName = target.name
              // combine_first: source non-NaN wins (even an empty string)
              val combined = Array.tabulate(nRows) { r =>
                if (src(r) != null) src(r) else target.values(r)
              }
              cols.foreach { c => // pandas df[name]= assigns all same-named cols
                if (c.name == targetName) {
                  var r = 0
                  while (r < nRows) { c.values(r) = combined(r); r += 1 }
                }
              }
              dropAllNamed(firstCol)
              auxCols.remove(auxCols.indexOf(firstCol))
            }
        }
      }
    }

    // -- second pass (preprocess_table.py:112-193)
    def fillInto(targetIdx: Int, auxIdx: Int): Unit = {
      val t = cols(targetIdx).values
      val a = cols(auxIdx).values
      var r = 0
      while (r < nRows) {
        if (Blank.isBlank(t(r))) t(r) = a(r)
        r += 1
      }
    }

    auxCols.foreach { auxCol =>
      val auxIdx = firstIndexOf(auxCol)
      if (auxIdx >= 0) { // skip if already dropped
        val av = cols(auxIdx).values
        val isEmpty = av.forall(Blank.isBlank)
        if (isEmpty) dropAllNamed(auxCol)
        else {
          val n = names
          val leftIdx = auxIdx - 1
          val rightIdx = auxIdx + 1
          val canRight = rightIdx < n.length
          val canLeft = leftIdx >= 0
          var done = false
          if (canRight) {
            val rightName = n(rightIdx)
            if (!auxCols.contains(rightName) && Blank.pyStr(rightName).trim.nonEmpty) {
              fillInto(rightIdx, auxIdx); dropAllNamed(auxCol); done = true
            }
          }
          if (!done && canLeft) {
            val leftName = n(leftIdx)
            if (!auxCols.contains(leftName) && Blank.pyStr(leftName).trim.nonEmpty) {
              fillInto(leftIdx, auxIdx); dropAllNamed(auxCol); done = true
            }
          }
          if (!done && canRight) { // fallback: merge into aux neighbor
            fillInto(rightIdx, auxIdx); dropAllNamed(auxCol); done = true
          }
          if (!done && canLeft) {
            fillInto(leftIdx, auxIdx); dropAllNamed(auxCol); done = true
          }
        }
      }
    }

    // -- restore blank header names (preprocess_table.py:195-200)
    cols.foreach { c =>
      emptyColMap.get(c.name).foreach(orig => c.name = orig)
    }

    // -- drop all-missing rows, then all-whitespace-string rows
    val keep = (0 until nRows).filter { r =>
      val allNull = cols.forall(_.values(r) == null)
      val allEmptyStr = cols.forall { c =>
        val v = c.values(r); v != null && v.trim.isEmpty
      }
      !allNull && !allEmptyStr
    }

    // -- degenerate case: when every body row is dropped, pandas boolean
    //    indexing with an empty mask Series also drops the COLUMNS, so the
    //    reference returns [[], []] (verified against real pandas/np.vstack)
    if (keep.isEmpty) return Vector(Vector.empty, Vector.empty)

    // -- astype(str): missing -> "None"; header re-prepended
    val headerRow = cols.map(_.name).toVector
    val body = keep.iterator.map { r =>
      cols.iterator.map { c =>
        val v = c.values(r)
        if (v == null) "None" else v
      }.toVector
    }.toVector
    headerRow +: body
  }
}
