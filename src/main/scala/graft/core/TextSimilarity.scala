package graft.core

import scala.collection.mutable

/** String-similarity primitives matching the reference's two backends.
  *
  * 1. `difflibRatio` — CPython difflib.SequenceMatcher.ratio() (the
  *    Ratcliff–Obershelp-style greedy longest-matching-block recursion),
  *    used by the reference's column normalizer
  *    (reference: src/v3_stable/step_4_dump_tables.py:14-16).
  *    Autojunk only activates for second strings of length >= 200
  *    (never in the reference's usage — compared against fixed short
  *    labels) so the plain non-junk algorithm is exact here.
  *
  * 2. `fuzzRatio` / `fuzzPartialRatio` — fuzzywuzzy with the
  *    python-Levenshtein backend (reference: pyproject.toml declares
  *    python-levenshtein), used by the L1 classifier
  *    (reference: src/v3_stable/step_5_pivot_table.py:45-49).
  *    Levenshtein.ratio is the indel ratio 2*LCS/(|a|+|b|); fuzz.ratio
  *    rounds it to an int with Python round() (half-to-even).
  *    partial_ratio is fuzzywuzzy's best-matching-substring score; we
  *    evaluate the indel ratio of the shorter string against *every*
  *    alignment window of the longer string (a deterministic superset of
  *    fuzzywuzzy's editop-anchored candidate starts — scores can only be
  *    >= the reference heuristic, never below), with the same 0.995
  *    short-circuit to 100. The divergence is pinned empirically:
  *    ReferencePivotDifferentialSpec replays the reference's OWN 304-row
  *    corpus sheet (data/terminal-evaluation-report_0.1.0.xlsx) through
  *    matchL1 and reproduces its published pivot (real fuzzywuzzy +
  *    python-Levenshtein output) exactly on every row.
  */
object TextSimilarity {

  // ---------------------------------------------------------------- difflib

  /** difflib.SequenceMatcher(None, a, b).ratio() with no junk. */
  def difflibRatio(a: String, b: String): Double = {
    val total = a.length + b.length
    if (total == 0) return 1.0
    2.0 * matchingTotal(a, b) / total
  }

  /** Sum of matching-block sizes, via difflib's queue-based recursion over
    * find_longest_match. */
  private def matchingTotal(a: String, b: String): Int = {
    // b2j: char -> ascending positions in b
    val b2j = mutable.HashMap.empty[Char, mutable.ArrayBuffer[Int]]
    var idx = 0
    while (idx < b.length) {
      b2j.getOrElseUpdate(b.charAt(idx), mutable.ArrayBuffer.empty[Int]) += idx
      idx += 1
    }

    def findLongestMatch(alo: Int, ahi: Int, blo: Int, bhi: Int): (Int, Int, Int) = {
      var besti = alo; var bestj = blo; var bestsize = 0
      var j2len = mutable.HashMap.empty[Int, Int]
      var i = alo
      while (i < ahi) {
        val newj2len = mutable.HashMap.empty[Int, Int]
        b2j.get(a.charAt(i)) match {
          case Some(js) =>
            var p = 0
            var break = false
            while (p < js.length && !break) {
              val j = js(p)
              if (j >= blo) {
                if (j >= bhi) break = true
                else {
                  val k = j2len.getOrElse(j - 1, 0) + 1
                  newj2len(j) = k
                  if (k > bestsize) { besti = i - k + 1; bestj = j - k + 1; bestsize = k }
                }
              }
              p += 1
            }
          case None =>
        }
        j2len = newj2len
        i += 1
      }
      // no junk => only the non-junk edge extension applies
      while (besti > alo && bestj > blo && a.charAt(besti - 1) == b.charAt(bestj - 1)) {
        besti -= 1; bestj -= 1; bestsize += 1
      }
      while (besti + bestsize < ahi && bestj + bestsize < bhi &&
             a.charAt(besti + bestsize) == b.charAt(bestj + bestsize)) {
        bestsize += 1
      }
      (besti, bestj, bestsize)
    }

    var totalMatched = 0
    val queue = mutable.Stack((0, a.length, 0, b.length))
    while (queue.nonEmpty) {
      val (alo, ahi, blo, bhi) = queue.pop()
      val (i, j, k) = findLongestMatch(alo, ahi, blo, bhi)
      if (k > 0) {
        totalMatched += k
        if (alo < i && blo < j) queue.push((alo, i, blo, j))
        if (i + k < ahi && j + k < bhi) queue.push((i + k, ahi, j + k, bhi))
      }
    }
    totalMatched
  }

  // ------------------------------------------------------------ Levenshtein

  /** Longest common subsequence length, O(n*m) two-row DP. */
  def lcsLen(a: String, b: String): Int = {
    if (a.isEmpty || b.isEmpty) return 0
    val (s, t) = if (a.length <= b.length) (a, b) else (b, a)
    var prev = new Array[Int](s.length + 1)
    var cur = new Array[Int](s.length + 1)
    var j = 0
    while (j < t.length) {
      val tc = t.charAt(j)
      var i = 0
      while (i < s.length) {
        cur(i + 1) =
          if (s.charAt(i) == tc) prev(i) + 1
          else math.max(prev(i + 1), cur(i))
        i += 1
      }
      val tmp = prev; prev = cur; cur = tmp
      j += 1
    }
    prev(s.length)
  }

  /** Levenshtein.ratio(a, b) == (|a|+|b| - indelDistance) / (|a|+|b|)
    * == 2*LCS/(|a|+|b|); 1.0 when both empty. */
  def indelRatio(a: String, b: String): Double = {
    val total = a.length + b.length
    if (total == 0) 1.0 else 2.0 * lcsLen(a, b) / total
  }

  /** fuzz.ratio: int(round(100 * Levenshtein.ratio)). */
  def fuzzRatio(a: String, b: String): Int = Blank.pyRound(100.0 * indelRatio(a, b))

  /** fuzz.partial_ratio: best indel ratio of the shorter string against
    * windows of the longer; window of shorter-length at every start
    * (truncated at the tail, like fuzzywuzzy's longer[long_start:long_end]).
    * Any window ratio > 0.995 short-circuits to 100. */
  def fuzzPartialRatio(a: String, b: String): Int = {
    val (shorter, longer) = if (a.length <= b.length) (a, b) else (b, a)
    if (shorter.isEmpty) return 100 // ratio("", "") == 1.0 -> > .995 path
    var best = 0.0
    var start = 0
    while (start <= longer.length - 1) {
      val end = math.min(start + shorter.length, longer.length)
      val r = indelRatio(shorter, longer.substring(start, end))
      if (r > 0.995) return 100
      if (r > best) best = r
      start += 1
    }
    Blank.pyRound(100.0 * best)
  }
}
