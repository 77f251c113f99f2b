package graft

/** SQL-text generators that replicate Spark's hash functions inside
  * DuckDB — the machinery that lets the xxhash64-based dedup pipelines
  * be hash-oracled end to end instead of rows-only.
  *
  * Everything here is plain modular arithmetic: 64-bit state lives in
  * HUGEINT (128-bit) with explicit `% 2^64`, 64×64-bit products are
  * split lo/hi so they never overflow the 128-bit type, rotations are
  * divmod identities, and the final value converts back to a signed
  * BIGINT. Verified token-for-token against Spark's `xxhash64()` and
  * multi-arg `hash()` on every code path (empty string, <32-byte tail
  * with and without the 4-byte step, ≥32-byte striped lanes).
  *
  * The generated text is large (tens of KB per hash site) but flat:
  * accumulator references go through list_reduce lambdas, so the
  * expression never compounds exponentially.
  */
object OracleSqlGen {
  private val M64 = "18446744073709551616::HUGEINT"

  private def add(a: String, b: String) = s"((($a) + ($b)) % $M64)"
  // (a*b) mod 2^64 via lo/hi split: a_lo*b_lo + ((a_lo*b_hi + a_hi*b_lo) mod 2^32)<<32
  private def mul(a: String, b: String) =
    s"(((($a) % 4294967296) * (($b) % 4294967296) + " +
      s"((((($a) // 4294967296) * (($b) % 4294967296) + " +
      s"(($a) % 4294967296) * (($b) // 4294967296)) % 4294967296) * 4294967296)) % $M64)"
  private def rotl(x: String, r: Int) = {
    val loMod = BigInt(1) << (64 - r)
    s"(((($x) % $loMod::HUGEINT) * ${BigInt(1) << r}) + (($x) // $loMod::HUGEINT))"
  }
  private def shr(x: String, k: Int) = s"(($x) // ${BigInt(1) << k}::HUGEINT)"
  private def xor(a: String, b: String) = s"xor(($a)::HUGEINT, ($b)::HUGEINT)"

  private val P1 = "11400714785074694791::HUGEINT"
  private val P2 = "14029467366897019727::HUGEINT"
  private val P3 = "1609587929392839161::HUGEINT"
  private val P4 = "9650029242287828579::HUGEINT"
  private val P5 = "2870177450012600261::HUGEINT"

  private def round0(v: String) = mul(rotl(mul(v, P2), 31), P1)

  /** Full SELECT computing Spark's xxhash64(seed) per row of
    * `srcRel(strCol)` → columns (s, h). ASCII inputs only (the dedup
    * streams are normalized a-z/space, so codepoint == byte). */
  def xxh64Sql(srcRel: String, strCol: String, seed: Long): String = {
    val sd = s"$seed::HUGEINT"
    val inits = Seq(
      add(add(sd, P1), P2), add(sd, P2), sd,
      s"((($sd - $P1) % $M64 + $M64) % $M64)")
    val lanes = (0 until 4).map { l =>
      val laneWords = s"list_filter(ws, (w, i) -> i <= (n // 32) * 4 AND (i - 1) % 4 = $l)"
      s"""list_reduce(list_prepend(${inits(l)}, $laneWords),
         |  (acc, w) -> ${mul(rotl(add("acc", mul("w", P2)), 31), P1)})""".stripMargin
    }
    val hsum = add(add(add(rotl("v1", 1), rotl("v2", 7)), rotl("v3", 12)), rotl("v4", 18))
    val merged =
      s"""list_reduce(list_prepend($hsum, [v1, v2, v3, v4]),
         |  (acc, v) -> ${add(mul(xor("acc", round0("v")), P1), P4)})""".stripMargin
    val h0 = s"CASE WHEN n >= 32 THEN $merged ELSE ${add(sd, P5)} END"
    val h1 = add("h0", "n::HUGEINT")
    val tail8 = "list_filter(ws, (w, i) -> i > (n // 32) * 4)"
    val h2 =
      s"""list_reduce(list_prepend($h1, $tail8),
         |  (acc, w) -> ${add(mul(rotl(xor("acc", round0("w")), 27), P1), P4)})""".stripMargin
    val o4 = "((n // 8) * 8)"
    val w4 = s"(bs[$o4+1]::HUGEINT + bs[$o4+2]::HUGEINT*256 + " +
      s"bs[$o4+3]::HUGEINT*65536 + bs[$o4+4]::HUGEINT*16777216)"
    val h3 = s"CASE WHEN n % 8 >= 4 THEN ${add(mul(rotl(xor("h2", mul(w4, P1)), 23), P2), P3)} ELSE h2 END"
    val tailb = "bs[((n // 8) * 8) + (CASE WHEN n % 8 >= 4 THEN 4 ELSE 0 END) + 1 : n]"
    val h4 =
      s"""list_reduce(list_prepend(h3, list_transform($tailb, b -> b::HUGEINT)),
         |  (acc, b) -> ${mul(rotl(xor("acc", mul("b", P5)), 11), P1)})""".stripMargin
    val a1 = mul(xor("h4", shr("h4", 33)), P2)
    val a2 = mul(xor("a1", shr("a1", 29)), P3)
    val a3 = xor("a2", shr("a2", 32))
    s"""SELECT s, CASE WHEN a3 >= 9223372036854775808::HUGEINT THEN (a3 - $M64)::BIGINT ELSE a3::BIGINT END AS h
       |FROM (
       |  SELECT s, $a3 AS a3 FROM (
       |    SELECT s, $a2 AS a2 FROM (
       |    SELECT s, $a1 AS a1, h4 FROM (
       |      SELECT s, $h4 AS h4 FROM (
       |        SELECT s, bs, n, $h3 AS h3 FROM (
       |          SELECT s, bs, n, ws, $h2 AS h2 FROM (
       |            SELECT s, bs, n, ws, $h0 AS h0 FROM (
       |              SELECT s, bs, n, ws,
       |                ${lanes(0)} AS v1, ${lanes(1)} AS v2,
       |                ${lanes(2)} AS v3, ${lanes(3)} AS v4
       |              FROM (
       |                SELECT s, bs, n,
       |                  list_transform(generate_series(0, (n // 8) - 1), k ->
       |                    (bs[k*8+1]::HUGEINT + bs[k*8+2]::HUGEINT*256 + bs[k*8+3]::HUGEINT*65536 +
       |                     bs[k*8+4]::HUGEINT*16777216 + bs[k*8+5]::HUGEINT*4294967296 +
       |                     bs[k*8+6]::HUGEINT*1099511627776 + bs[k*8+7]::HUGEINT*281474976710656 +
       |                     bs[k*8+8]::HUGEINT*72057594037927936)) AS ws
       |                FROM (
       |                  SELECT $strCol AS s,
       |                    list_transform(string_split($strCol, ''), c -> ascii(c)::BIGINT) AS bs,
       |                    len($strCol)::BIGINT AS n
       |                  FROM $srcRel))))))))))""".stripMargin
  }

  // ---- Murmur3 x86_32 hashLong chain (Spark's multi-arg hash()) ----
  private val M32 = "4294967296"
  private def add32(a: String, b: String) = s"((($a) + ($b)) % $M32)"
  private def mul32(a: String, b: String) =
    s"(((($a)::HUGEINT * ($b)::HUGEINT) % $M32)::BIGINT)"
  private def rotl32(x: String, r: Int) =
    s"(((($x) % ${1L << (32 - r)}) * ${1L << r}) + (($x) // ${1L << (32 - r)}))"
  private def shr32(x: String, k: Int) = s"(($x) // ${1L << k})"
  private def xor32(a: String, b: String) = s"xor(($a)::BIGINT, ($b)::BIGINT)"

  private def mixK1(k: String) = mul32(rotl32(mul32(k, "3432918353"), 15), "461845907")
  private def mixH1(h: String, k: String) =
    add32(mul32(rotl32(xor32(h, k), 13), "5"), "3864292196")
  private def fmix8(h: String): String = {
    var a = xor32(h, "8")
    a = xor32(a, shr32(a, 16))
    a = mul32(a, "2246822507")
    a = xor32(a, shr32(a, 13))
    a = mul32(a, "3266489909")
    a = xor32(a, shr32(a, 16))
    a
  }

  /** One Spark Murmur3 hashLong step: running hash `acc` (0..2^32),
    * long value `l` (any sign) → new hash. Chain via list_reduce only
    * (textual chaining compounds exponentially). */
  def murmurLongStep(l: String, acc: String): String = {
    val low = s"((($l) % $M32 + $M32) % $M32)"
    val high = s"(((($l) // $M32) % $M32 + $M32) % $M32)"
    fmix8(mixH1(mixH1(acc, mixK1(low)), mixK1(high)))
  }

  /** One hashLong step as a STAGED nested-select chain: input relation
    * `src` exposes `keep` plus a BIGINT value column `l`; `accIn` is
    * the running-hash expression at entry; output exposes keep + the
    * new hash as column `macc`. Every subexpression lands in a named
    * column exactly once, so evaluation is plain vectorized projection
    * — the textual-compounding trap `murmurLongStep` documents never
    * arises because duplicated args are column references. */
  private def murmurStepStaged(src: String, keep: Seq[String],
      l: String, accIn: String): String = {
    val K = if (keep.isEmpty) "" else keep.mkString(", ") + ", "
    var s = s"SELECT $K$accIn AS acc, ((($l) % $M32 + $M32) % $M32) AS lo, " +
      s"(((($l) // $M32) % $M32 + $M32) % $M32) AS hi FROM ($src)"
    s = s"SELECT ${K}acc, ${mul32("lo", "3432918353")} AS m1l, ${mul32("hi", "3432918353")} AS m1h FROM ($s)"
    s = s"SELECT ${K}acc, ${rotl32("m1l", 15)} AS r1l, ${rotl32("m1h", 15)} AS r1h FROM ($s)"
    s = s"SELECT ${K}acc, ${mul32("r1l", "461845907")} AS k1l, ${mul32("r1h", "461845907")} AS k1h FROM ($s)"
    s = s"SELECT $K${xor32("acc", "k1l")} AS x1, k1h FROM ($s)"
    s = s"SELECT $K${add32(mul32(rotl32("x1", 13), "5"), "3864292196")} AS h1, k1h FROM ($s)"
    s = s"SELECT $K${xor32("h1", "k1h")} AS x2 FROM ($s)"
    s = s"SELECT $K${add32(mul32(rotl32("x2", 13), "5"), "3864292196")} AS h2 FROM ($s)"
    s = s"SELECT $K${xor32("h2", "8")} AS a0 FROM ($s)"
    s = s"SELECT $K${xor32("a0", shr32("a0", 16))} AS a1 FROM ($s)"
    s = s"SELECT $K${mul32("a1", "2246822507")} AS a2 FROM ($s)"
    s = s"SELECT $K${xor32("a2", shr32("a2", 13))} AS a3 FROM ($s)"
    s = s"SELECT $K${mul32("a3", "3266489909")} AS a4 FROM ($s)"
    s"SELECT $K${xor32("a4", shr32("a4", 16))} AS macc FROM ($s)"
  }

  /** The Murmur3 band-hash fold over `r` signature slots, STAGED and
    * VECTORIZED — the drop-in replacement for the list_reduce fold
    * that was the sf1 oracle's single biggest cost (the ~21 KB lambda
    * body re-interpreted per element: 723 of dedup_eval's 871 s;
    * this form measured 26× faster on the same 1.6M-band replay,
    * bit-identical output). Shape: pivot the r rows of each (doc,
    * band) group to columns with one hash aggregate, then unroll one
    * staged step per slot. Each step is its own MATERIALIZED CTE —
    * nesting all r·14 sub-selects in one expression exhausts the
    * parser at r=32, and materialization keeps the binder from
    * re-inlining the chain. Emits CTEs `{p}piv, {p}f0..{p}f{r-1},
    * {p}bands`; the final `{p}bands` exposes (doc_id, band_id,
    * band_hash) with the same signed-int32 convention as before.
    * `sigsRel` must expose (doc_id, i, v). */
  def murmurBandCtesSql(p: String, sigsRel: String, r: Int): String = {
    val piv = (0 until r)
      .map(j => s"max(CASE WHEN i % $r = $j THEN v END) AS s$j")
      .mkString(", ")
    val pivCte =
      s"""${p}piv AS MATERIALIZED (
         |  SELECT doc_id, i // $r AS band_id, $piv
         |  FROM $sigsRel GROUP BY doc_id, i // $r)""".stripMargin
    val stepCtes = (0 until r).map { j =>
      val keep = Seq("doc_id", "band_id") ++ (j + 1 until r).map(k => s"s$k")
      val src = if (j == 0) s"SELECT * FROM ${p}piv" else s"SELECT * FROM ${p}f${j - 1}"
      val accIn = if (j == 0) "42::BIGINT" else "macc"
      s"${p}f$j AS MATERIALIZED (${murmurStepStaged(src, keep, s"s$j", accIn)})"
    }
    val bandsCte =
      s"""${p}bands AS MATERIALIZED (
         |  SELECT doc_id, band_id,
         |    macc - CASE WHEN macc >= 2147483648 THEN 4294967296 ELSE 0 END AS band_hash
         |  FROM ${p}f${r - 1})""".stripMargin
    (pivCte +: stepCtes :+ bandsCte).mkString(",\n")
  }
}
