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
  *    partial_ratio is fuzzywuzzy's best-matching-substring score: the
  *    indel ratio of the shorter string against the windows of the longer
  *    string anchored at Levenshtein editops matching blocks
  *    (long_start = dpos - spos per block, the terminating zero-block
  *    included), with the 0.995 short-circuit to 100. [[levMatchingBlocks]]
  *    reproduces python-Levenshtein's editops backtrack including its
  *    direction bias, so the candidate set — not a superset of it — is
  *    evaluated; [[fuzzPartialRatioAllWindows]] keeps the every-window
  *    upper bound for property tests. Pinned empirically:
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

  private final val OpInsert = 0
  private final val OpDelete = 1
  private final val OpReplace = 2

  /** Matching blocks of an optimal Levenshtein edit script, exactly as
    * fuzzywuzzy's StringMatcher.get_matching_blocks() computes them when
    * python-Levenshtein is installed: `matching_blocks(editops(s1,s2))`.
    * The backtrack reproduces editops_from_cost_matrix from the
    * python-Levenshtein C source (_levenshtein.c) including its `dir`
    * bias — after an insert (resp. delete) run it keeps taking inserts
    * (deletes) while they stay optimal, and a diagonal move resets the
    * bias — because WHICH optimal path is chosen decides the block
    * anchors partial_ratio scores from. Returns (spos, dpos, size)
    * triples plus the difflib-style (|s1|, |s2|, 0) terminator. */
  def levMatchingBlocks(s1: String, s2: String): Vector[(Int, Int, Int)] = {
    val l1 = s1.length
    val l2 = s2.length
    val w = l2 + 1
    val m = new Array[Int]((l1 + 1) * w)
    var i = 0
    while (i <= l1) { m(i * w) = i; i += 1 }
    var j = 0
    while (j <= l2) { m(j) = j; j += 1 }
    i = 1
    while (i <= l1) {
      val c1 = s1.charAt(i - 1)
      j = 1
      while (j <= l2) {
        val sub = m((i - 1) * w + j - 1) + (if (c1 == s2.charAt(j - 1)) 0 else 1)
        val dl = m((i - 1) * w + j) + 1
        val in = m(i * w + j - 1) + 1
        m(i * w + j) = math.min(sub, math.min(dl, in))
        j += 1
      }
      i += 1
    }
    // backtrack (ops emitted back-to-front, prepended => forward order)
    var ops = List.empty[(Int, Int, Int)] // (type, spos, dpos)
    var ii = l1
    var jj = l2
    var dir = 0
    while (ii > 0 || jj > 0) {
      val cur = m(ii * w + jj)
      if (dir < 0 && jj > 0 && cur == m(ii * w + jj - 1) + 1) {
        jj -= 1; ops = (OpInsert, ii, jj) :: ops
      } else if (dir > 0 && ii > 0 && cur == m((ii - 1) * w + jj) + 1) {
        ii -= 1; ops = (OpDelete, ii, jj) :: ops
      } else if (ii > 0 && jj > 0 && cur == m((ii - 1) * w + jj - 1) &&
                 s1.charAt(ii - 1) == s2.charAt(jj - 1)) {
        ii -= 1; jj -= 1; dir = 0
      } else if (ii > 0 && jj > 0 && cur == m((ii - 1) * w + jj - 1) + 1) {
        ii -= 1; jj -= 1; dir = 0; ops = (OpReplace, ii, jj) :: ops
      } else if (dir == 0 && jj > 0 && cur == m(ii * w + jj - 1) + 1) {
        jj -= 1; dir = -1; ops = (OpInsert, ii, jj) :: ops
      } else if (dir == 0 && ii > 0 && cur == m((ii - 1) * w + jj) + 1) {
        ii -= 1; dir = 1; ops = (OpDelete, ii, jj) :: ops
      } else {
        throw new IllegalStateException("lost in the cost matrix")
      }
    }
    // ops -> matching blocks (lev_editops_matching_blocks)
    val blocks = Vector.newBuilder[(Int, Int, Int)]
    var sp = 0
    var dp = 0
    ops.foreach { case (tpe, spos, dpos) =>
      if (sp < spos || dp < dpos) {
        blocks += ((sp, dp, spos - sp))
        sp = spos; dp = dpos
      }
      tpe match {
        case OpReplace => sp += 1; dp += 1
        case OpDelete => sp += 1
        case OpInsert => dp += 1
      }
    }
    if (sp < l1 || dp < l2) blocks += ((sp, dp, l1 - sp))
    blocks += ((l1, l2, 0))
    blocks.result()
  }

  /** fuzz.partial_ratio, exact: indel ratio of the shorter string against
    * the longer's windows anchored at each matching block
    * (long_start = max(dpos - spos, 0), window truncated at the tail like
    * fuzzywuzzy's longer[long_start:long_end]); any window ratio > 0.995
    * short-circuits to 100. */
  def fuzzPartialRatio(a: String, b: String): Int = {
    val (shorter, longer) = if (a.length <= b.length) (a, b) else (b, a)
    val blocks = levMatchingBlocks(shorter, longer)
    var best = 0.0
    var bi = 0
    while (bi < blocks.length) {
      val (spos, dpos, _) = blocks(bi)
      val longStart = math.min(math.max(dpos - spos, 0), longer.length)
      val longEnd = math.min(longStart + shorter.length, longer.length)
      val r = indelRatio(shorter, longer.substring(longStart, longEnd))
      if (r > 0.995) return 100
      if (r > best) best = r
      bi += 1
    }
    Blank.pyRound(100.0 * best)
  }

  /** Every-window upper bound on partial_ratio (the block-anchored
    * candidate windows are a subset of all windows): kept for property
    * tests — fuzzPartialRatio can never exceed this. */
  def fuzzPartialRatioAllWindows(a: String, b: String): Int = {
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
