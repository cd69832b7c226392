package graft.core

/** Longest consecutive-page run finder.
  *
  * Faithful port of the reference's run selection over the ordered page list
  * of a document's candidate tables
  * (reference: src/utils/find_longest_subsequence.py:4-41):
  *
  *   - collect all maximal runs of `seq(i) == seq(i-1) + 1` with length > 1;
  *   - return the longest one as a list of *indices* into `seq`
  *     (Python `max(..., key=len)` keeps the FIRST maximum on ties);
  *   - empty input -> empty; single element -> List(0);
  *   - no run of length > 1 -> List(lastIndex)  (e.g. [89, 91] -> [1]).
  */
object LongestRun {
  def findLongestSubsequence(sequence: Seq[Int]): List[Int] = {
    if (sequence.isEmpty) return Nil
    if (sequence.length == 1) return List(0)

    val subsequences = scala.collection.mutable.ListBuffer.empty[List[Int]]
    var current = List.newBuilder[Int]
    current += 0
    var currentLen = 1

    var i = 1
    while (i < sequence.length) {
      if (sequence(i) == sequence(i - 1) + 1) {
        current += i
        currentLen += 1
      } else {
        if (currentLen > 1) subsequences += current.result()
        current = List.newBuilder[Int]
        current += i
        currentLen = 1
      }
      i += 1
    }
    if (currentLen > 1) subsequences += current.result()

    if (subsequences.isEmpty) List(sequence.length - 1)
    else subsequences.maxBy(_.length) // first max wins on ties (Python max)
  }
}
