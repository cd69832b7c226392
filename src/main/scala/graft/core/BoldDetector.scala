package graft.core

/** Bold-cell detection — port of the reference's span-format inspection
  * (reference: src/v1_plain/parse_table.py:146-165): a cell is bold when any
  * of its spans has a font name containing a bold mark, the bold flag bit
  * (16) set, or weight >= 600.
  *
  * Our span grammar carries no font objects (the driver-mandated span struct
  * is (kind, text, media_ref, offset)), so documents encode emphasis inline
  * as `**text**`; [[isBoldMarked]]/[[stripBold]] handle that encoding, while
  * [[isBoldFont]] keeps the reference's font-attribute predicate for callers
  * that do carry font metadata.
  */
object BoldDetector {

  private val boldMarks = Seq("bold", "bd", "-b", "black", "heavy")

  /** The reference predicate over (font name, flags, weight). */
  def isBoldFont(font: String, flags: Int, weight: Int): Boolean = {
    val f = if (font == null) "" else font.toLowerCase
    boldMarks.exists(f.contains) || (flags & 16) != 0 || weight >= 600
  }

  /** Inline `**...**` emphasis in the span grammar. */
  def isBoldMarked(text: String): Boolean =
    text != null && text.length >= 4 && text.startsWith("**") && text.endsWith("**")

  def stripBold(text: String): String =
    if (isBoldMarked(text)) text.substring(2, text.length - 2) else text
}
