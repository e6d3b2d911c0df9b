package graft.functions

/** Shared single-pass token-offset scan for the native text kernels:
  * Java `split("\\s+", -1)` boundary semantics (a leading separator run
  * yields an empty first token, a trailing run an empty last token, the
  * empty string one empty token), with offsets collected into growable
  * `int[]` buffers — the r15 ADVICE fix for the per-token
  * `ArrayList<Integer>` boxing the n-gram/shingle helpers paid in their
  * hot per-row path.
  */
private[functions] final class TokenOffsets {
  var starts: Array[Int] = new Array[Int](16)
  var ends: Array[Int] = new Array[Int](16)
  var count: Int = 0

  private def add(a: Int, b: Int): Unit = {
    if (count == starts.length) {
      starts = java.util.Arrays.copyOf(starts, count * 2)
      ends = java.util.Arrays.copyOf(ends, count * 2)
    }
    starts(count) = a
    ends(count) = b
    count += 1
  }

  def scan(bytes: Array[Byte]): TokenOffsets = {
    val len = bytes.length
    if (len == 0 || TokenOffsets.isWs(bytes(0))) add(0, 0)
    var i = 0
    while (i < len) {
      if (!TokenOffsets.isWs(bytes(i))) {
        val st = i
        while (i < len && !TokenOffsets.isWs(bytes(i))) i += 1
        add(st, i)
      } else i += 1
    }
    if (len > 0 && TokenOffsets.isWs(bytes(len - 1))) add(len, len)
    this
  }
}

private[functions] object TokenOffsets {
  /** Java-regex `\s` = ASCII [ \t\n\x0B\f\r]. */
  def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 11 || b == '\f' || b == '\r'
}
