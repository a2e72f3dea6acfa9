package graft.ops

/** Cross-engine deterministic 62-bit hash family.
  *
  * The dedup/fingerprint operators must be recomputable by the DuckDB oracle
  * to give the driver a hard correctness signal, so every hash here stays in
  * a 62-bit domain where both engines can do exact arithmetic:
  *   - Scala: multiply wraps mod 2^64; masking the low 62 bits yields the
  *     product mod 2^62 (2^62 divides 2^64).
  *   - DuckDB: BIGINT multiply would overflow-check, but a 62-bit × 41-bit
  *     (or 62-bit × 62-bit) product fits HUGEINT (int128), so
  *     `CAST(a AS HUGEINT) * b % 2^62` is exact.
  * Shifts/xors of sub-2^62 values are positive in both engines' signed i64.
  *
  * The functions mirror FNV-1a (the reference's table-hash flavor,
  * /root/reference/src/huffman — FNV is public domain) and the splitmix64
  * finisher, reduced mod 2^62. Each `sql*` method emits the DuckDB
  * expression computing exactly what the Scala twin computes.
  */
object XHash {
  val Mask62: Long = (1L << 62) - 1
  val FnvPrime: Long = 0x100000001b3L // 1099511628211, fits 41 bits
  val FnvInit: Long = 0xcbf29ce484222325L & Mask62
  val MixAdd: Long = 0x9e3779b97f4a7c15L & Mask62
  val MixC1: Long = 0xbf58476d1ce4e5b9L & Mask62
  val MixC2: Long = 0x94d049bb133111ebL & Mask62
  /** Fold seed for multi-value combines (shingles, band buckets). */
  val FoldInit: Long = 0x9e3779b97f4a7c15L & Mask62

  @inline def mul62(a: Long, b: Long): Long = (a * b) & Mask62

  /** splitmix-style avalanche finisher in the 62-bit domain. */
  @inline def mix62(z0: Long): Long = {
    var z = (z0 + MixAdd) & Mask62
    z = mul62(z ^ (z >>> 30), MixC1)
    z = mul62(z ^ (z >>> 27), MixC2)
    z ^ (z >>> 31)
  }

  @inline def fnvStep(h: Long, code: Long): Long = mul62(h ^ code, FnvPrime)

  /** FNV-1a-style fold over the CODEPOINTS of `s`, finished with mix62.
    * Codepoints (not UTF-16 units) because the DuckDB twin
    * [[sqlHashCharsRaw]] folds `ascii()` over per-character splits, which
    * yields codepoints — folding UTF-16 units would diverge on any non-BMP
    * character (emoji, astral CJK). For BMP text the two are identical.
    */
  def hashChars(s: String): Long = {
    var h = FnvInit
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h = fnvStep(h, cp.toLong)
      i += Character.charCount(cp)
    }
    mix62(h)
  }

  /** Combine an ordered sequence of 62-bit hashes: h = mix62(h ^ v). */
  def fold(values: Array[Long], init: Long = FoldInit): Long = {
    var h = init
    var i = 0
    while (i < values.length) { h = mix62(h ^ values(i)); i += 1 }
    h
  }

  // ---- DuckDB expression twins -------------------------------------------

  private val Mod62 = "4611686018427387904" // 2^62

  /** (a * b) mod 2^62 via HUGEINT. `a` must be < 2^62. */
  def sqlMul62(a: String, b: Long): String =
    s"CAST((CAST(($a) AS HUGEINT) * $b) % $Mod62 AS BIGINT)"

  /** mix62 over an arbitrary expression. The input expression is duplicated
    * ~8x by the three stages — pass a column reference (stage via CTE) when
    * the operand is itself large.
    */
  def sqlMix62(z0: String): String = {
    val z1 = s"((($z0) + $MixAdd) & $Mask62)"
    val z2 = sqlMul62(s"xor($z1, $z1 >> 30)", MixC1)
    val z3 = sqlMul62(s"xor($z2, $z2 >> 27)", MixC2)
    s"xor($z3, $z3 >> 31)"
  }

  /** The FNV fold of [[hashChars]] WITHOUT the mix62 finisher (stage the
    * finisher via a CTE column: `sqlMix62("h_raw")`). Empty strings fold
    * zero steps (DuckDB's split-to-chars of '' yields [''], filtered out).
    */
  def sqlHashCharsRaw(strExpr: String): String = {
    val codes = s"list_transform(list_filter(string_split($strExpr, ''), c -> c != ''), " +
      "c -> CAST(ascii(c) AS BIGINT))"
    s"list_reduce(list_prepend(CAST($FnvInit AS BIGINT), $codes), " +
      s"(h, c) -> ${sqlMul62("xor(h, c)", FnvPrime)})"
  }

  /** Lambda-friendly inline fold step: mix62(xor(h, v)) for use inside
    * list_reduce lambdas (operands are lambda variables, so the ~8x
    * duplication stays small).
    */
  def sqlFoldStep(h: String, v: String): String = sqlMix62(s"xor($h, $v)")
}
