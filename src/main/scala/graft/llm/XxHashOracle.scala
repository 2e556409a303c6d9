package graft.llm

/** DuckDB SQL generator replaying Spark's xxhash64 (XXH64, seed 42) so the
  * MinHash and SimHash queries can be oracle-checked end-to-end.
  *
  * XXH64 is public-domain (Cyan4973/xxHash); Spark's XxHash64Function uses
  * it with seed 42 over UTF-8 bytes. DuckDB has no xxhash64 built-in, so
  * the oracle embeds the algorithm: HUGEINT arithmetic with explicit
  * mod-2^64 reduction, split-multiplies (a 64x64 product overflows
  * HUGEINT), and list_reduce for the stripe/chunk loops. Validated
  * bit-for-bit against Spark for every input length class (empty, <8, <32,
  * >= 32 bytes = the 4-lane path) and for the two-column int+long form the
  * MinHash families use. ASCII corpora only (byte = character code — the
  * driver testdata is verified ASCII); non-ASCII would need a byte-level
  * decode DuckDB SQL cannot express.
  */
object XxHashOracle {
  private val M64v = BigInt("18446744073709551615")
  private val M64 = s"CAST($M64v AS HUGEINT)"
  private def ch(v: BigInt): String =
    s"CAST(${v.mod(BigInt(1) << 64)} AS HUGEINT)"
  private val P1v = BigInt("11400714785074694791")
  private val P2v = BigInt("14029467366897019727")
  private val P3v = BigInt("1609587929392839161")
  private val P4v = BigInt("9650029242287828579")
  private val P5v = BigInt("2870177450012600261")
  private val Seq(p1, p2, p3, p4, p5) = Seq(P1v, P2v, P3v, P4v, P5v).map(ch)

  /** (a * b) mod 2^64 without overflowing HUGEINT: split a into 32-bit
    * halves; the high half contributes only its low-32 product bits. */
  private def mm(a: String, b: String): String =
    s"((($a & CAST(4294967295 AS HUGEINT)) * $b + " +
      s"(((($a >> 32) * ($b & CAST(4294967295 AS HUGEINT))) & " +
      s"CAST(4294967295 AS HUGEINT)) << 32)) & $M64)"
  private def rotl(x: String, r: Int): String =
    s"((($x << $r) | ($x >> ${64 - r})) & $M64)"
  private def add(a: String, b: String): String = s"(($a + $b) & $M64)"
  private def roundE(acc: String, w: String): String =
    mm(rotl(add(acc, mm(w, p2)), 31), p1)
  private def fmix(h: String): String = {
    val s1 = s"xor($h, ($h >> 33))"
    val s2 = mm(s1, p2)
    val s3 = s"xor($s2, ($s2 >> 29))"
    val s4 = mm(s3, p3)
    s"xor($s4, ($s4 >> 32))"
  }
  private def mergeAll: String = {
    var h = s"((${rotl("st.v1", 1)} + ${rotl("st.v2", 7)} + " +
      s"${rotl("st.v3", 12)} + ${rotl("st.v4", 18)}) & $M64)"
    for (v <- Seq("st.v1", "st.v2", "st.v3", "st.v4"))
      h = add(mm(s"xor($h, ${roundE(ch(0), v)})", p1), p4)
    h
  }
  private def tail8(h: String, w: String): String =
    add(mm(rotl(s"xor($h, ${roundE(ch(0), w)})", 27), p1), p4)
  private def tail4: String = {
    val w4 = "(b[CAST((n // 8) * 8 + 1 AS INT)] + " +
      "(b[CAST((n // 8) * 8 + 2 AS INT)] << 8) + " +
      "(b[CAST((n // 8) * 8 + 3 AS INT)] << 16) + " +
      "(b[CAST((n // 8) * 8 + 4 AS INT)] << 24))"
    add(mm(rotl(s"xor(h8, ${mm(w4, p1)})", 23), p2), p3)
  }
  private def tailByte(h: String, x: String): String =
    mm(rotl(s"xor($h, ${mm(x, p5)})", 11), p1)

  private val dummy4 = Seq(1, 2, 3, 4).map(i => s"w$i := $M64").mkString(", ")

  /** CTE chain hashing column `tok` of CTE `src` (doc_id, tok) to
    * unsigned HUGEINT column `hu` in CTE `hashed` — Spark xxhash64 parity. */
  def xxh64Ctes(src: String): String = s"""
  bytes AS (SELECT *, list_transform(range(1, length(tok) + 1),
      i -> CAST(ascii(substring(tok, CAST(i AS INT), 1)) AS HUGEINT)) AS b,
      CAST(length(tok) AS HUGEINT) AS n FROM $src),
  words AS (SELECT *, list_transform(range(0, CAST(n // 8 AS BIGINT)),
      k -> b[CAST(8*k+1 AS INT)] + (b[CAST(8*k+2 AS INT)] << 8) + (b[CAST(8*k+3 AS INT)] << 16)
         + (b[CAST(8*k+4 AS INT)] << 24) + (b[CAST(8*k+5 AS INT)] << 32) + (b[CAST(8*k+6 AS INT)] << 40)
         + (b[CAST(8*k+7 AS INT)] << 48) + (b[CAST(8*k+8 AS INT)] << 56)) AS w8 FROM bytes),
  lanes AS (SELECT *, CASE WHEN n >= 32 THEN
      list_reduce(
        list_prepend(
          struct_pack(v1 := ${ch(42 + P1v + P2v)}, v2 := ${ch(42 + P2v)},
                      v3 := ${ch(42)}, v4 := ${ch(42 - P1v)}, $dummy4),
          list_transform(range(0, CAST(n // 32 AS BIGINT)), k -> struct_pack(
            v1 := $M64, v2 := $M64, v3 := $M64, v4 := $M64,
            w1 := w8[CAST(4*k+1 AS INT)], w2 := w8[CAST(4*k+2 AS INT)],
            w3 := w8[CAST(4*k+3 AS INT)], w4 := w8[CAST(4*k+4 AS INT)]))),
        (s, x) -> struct_pack(
          v1 := ${roundE("s.v1", "x.w1")}, v2 := ${roundE("s.v2", "x.w2")},
          v3 := ${roundE("s.v3", "x.w3")}, v4 := ${roundE("s.v4", "x.w4")},
          $dummy4))
      ELSE NULL END AS st FROM words),
  h0 AS (SELECT *, CASE WHEN n >= 32 THEN $mergeAll ELSE ${add(ch(42), p5)} END AS hh FROM lanes),
  tail AS (SELECT *, list_reduce(
      list_prepend(${add("hh", "n")},
        list_transform(range(CAST(CASE WHEN n >= 32 THEN (n // 32) * 4 ELSE 0 END AS BIGINT),
                             CAST(n // 8 AS BIGINT)), k -> w8[CAST(k + 1 AS INT)])),
      (h, w) -> ${tail8("h", "w")}) AS h8 FROM h0),
  tail4 AS (SELECT *, CASE WHEN (n % 8) >= 4 THEN $tail4 ELSE h8 END AS h4,
      CAST(CASE WHEN (n % 8) >= 4 THEN (n // 8) * 8 + 4 ELSE (n // 8) * 8 END AS BIGINT) AS bstart
      FROM tail),
  tailb AS (SELECT *, list_reduce(
      list_prepend(h4, list_transform(range(bstart, CAST(n AS BIGINT)), k -> b[CAST(k + 1 AS INT)])),
      (h, x) -> ${tailByte("h", "x")}) AS hfin FROM tail4),
  hashed AS (SELECT doc_id, tok, ${fmix("hfin")} AS hu FROM tailb)"""

  /** XXH64 of one long `h` (unsigned HUGEINT expr) with seed expr `s` —
    * Spark's per-family MinHash rehash xxhash64(i, h) is
    * hashLong(h, seed = hashInt(i, 42)). */
  def hashLong(h: String, s: String): String = {
    val acc = s"xor(${add(add(s, p5), ch(8))}, ${roundE(ch(0), h)})"
    fmix(add(mm(rotl(acc, 27), p1), p4))
  }

  /** hashLong(l, seed) computed in Scala — XXH64 of one 8-byte long, the
    * same function [[hashLong]] expands to SQL. Use it to fold
    * hash-of-constant subexpressions (e.g. q380's per-step XOR constants
    * xxhash64(lit(t))) into a single HUGEINT literal instead of embedding
    * the macro expansion — the textual expansion multiplies its argument
    * ~1000x, so nesting it is what ballooned the round-8 q380 oracle to
    * 36 MB. Pinned against Spark's xxhash64(lit(l)) in XxHashOracleSpec. */
  def hashLongConst(l: BigInt, seed: BigInt): BigInt = {
    val M = BigInt(1) << 64
    def rotlL(x: BigInt, r: Int): BigInt = ((x << r) | (x >> (64 - r))).mod(M)
    def fmixL(h0: BigInt): BigInt = {
      var h = h0
      h ^= h >> 33; h = (h * P2v).mod(M)
      h ^= h >> 29; h = (h * P3v).mod(M)
      h ^ (h >> 32)
    }
    val w = l.mod(M)
    val k1 = (rotlL((w * P2v).mod(M), 31) * P1v).mod(M)
    val acc = (seed + P5v + 8).mod(M) ^ k1
    fmixL((rotlL(acc, 27) * P1v + P4v).mod(M))
  }

  /** Unsigned HUGEINT literal for a Scala-computed hash constant. */
  def hugeint(v: BigInt): String = ch(v)

  /** hashLong(inExpr, seedExpr) as a LINEAR nested-projection chain —
    * returns a parenthesized subquery over `srcRel` computing the hash as
    * unsigned HUGEINT column `outCol` (keeping `keepCols`). Each XXH64
    * step lands in a named column of its own projection, so the statement
    * stays ~2 KB and DuckDB evaluates every step ONCE per row; the
    * [[hashLong]] inline macro instead duplicates its argument ~1000x in
    * both text and evaluation, which is what made the per-row replay
    * oracles (q241 KMV, q402 ridge folds) the suite's residual
    * heavyweights. `srcRel` may be a table name or a parenthesized
    * subquery; same bit-for-bit Spark xxhash64 parity as [[hashLong]]. */
  /** The seven XXH64-of-one-long steps as (column, SQL expression)
    * pairs over the chain variables `_xh0` (input) and `_xsd` (seed) —
    * the linear chain [[hashLongSubquery]] wires into nested
    * projections. package-private so XxHashOracleSpec can EVALUATE the
    * actual emitted expressions (a tiny HUGEINT-fragment interpreter)
    * against Spark's XxHash64Function: an edit that drops the `_xsd`
    * carry or a step's mask now fails `sbt test` instead of surfacing
    * only in the external DuckDB gate. */
  private[llm] val hashLongSteps: Seq[(String, String)] = Seq(
    "_xh1" -> mm("_xh0", p2),
    "_xh2" -> mm(rotl("_xh1", 31), p1),
    "_xh3" -> s"xor(${add(add("_xsd", p5), ch(8))}, _xh2)",
    "_xh4" -> add(mm(rotl("_xh3", 27), p1), p4),
    "_xh5" -> mm("xor(_xh4, (_xh4 >> 33))", p2),
    "_xh6" -> mm("xor(_xh5, (_xh5 >> 29))", p3),
    "_out" -> "xor(_xh6, (_xh6 >> 32))")

  def hashLongSubquery(srcRel: String, keepCols: Seq[String], inExpr: String,
      seedExpr: String, outCol: String): String = {
    val keep = keepCols.map(c => s"$c, ").mkString
    def st(inner: String, extra: String, alias: String) =
      s"(SELECT $keep$extra FROM $inner AS $alias)"
    val q0 = st(srcRel, s"($inExpr) AS _xh0, ($seedExpr) AS _xsd", "_x0")
    hashLongSteps.zipWithIndex.foldLeft(q0) {
      case (inner, ((stepCol, ex), idx)) =>
        val colName = if (stepCol == "_out") outCol else stepCol
        // `_xsd` is consumed by step _xh3; carry it through until then
        val carry = if (idx < 2) "_xsd, " else ""
        st(inner, s"$carry$ex AS $colName", s"_x${idx + 1}")
    }
  }

  /** The corpus's most common oracle shape — a SIGNED xxhash64(42, key)
    * gate column over a relation — as a parenthesized subquery usable
    * directly as a CTE body: `h AS ${signedHashCol(...)}`. Built on
    * [[hashLongSubquery]], so the statement stays ~2 KB and every hash
    * step evaluates once per row (the inline [[hashLong]] macro costs
    * ~800 KB of text and ~2 s of DuckDB parse+bind per use). */
  def signedHashCol(rel: String, keep: Seq[String], inExpr: String,
      outCol: String): String = {
    val ks = keep.map(_ + ", ").mkString
    s"(SELECT $ks${signed("_shu")} AS $outCol FROM ${hashLongSubquery(
      rel, keep, inExpr, "CAST(42 AS HUGEINT)", "_shu")} _shc)"
  }

  /** hashInt(i, 42) computed in Scala — XXH64 of a 4-byte int, the MinHash
    * family seed. Formula = Spark XxHash64Function.hashInt; pinned against
    * Spark's own xxhash64(lit(i)) in XxHashOracleSpec. */
  def familySeed(i: Int): BigInt = {
    def rotlL(x: BigInt, r: Int): BigInt =
      ((x << r) | (x >> (64 - r))).mod(BigInt(1) << 64)
    def fmixL(h0: BigInt): BigInt = {
      var h = h0
      h ^= h >> 33; h = (h * P2v).mod(BigInt(1) << 64)
      h ^= h >> 29; h = (h * P3v).mod(BigInt(1) << 64)
      h ^ (h >> 32)
    }
    var h = (BigInt(42) + P5v + 4).mod(BigInt(1) << 64)
    h ^= (BigInt(i) * P1v).mod(BigInt(1) << 64)
    h = (rotlL(h, 23) * P2v + P3v).mod(BigInt(1) << 64)
    fmixL(h)
  }

  /** The k family seeds inlined as VALUES (fi, fs). */
  def famValues(k: Int): String =
    (0 until k).map(i => s"($i, ${ch(familySeed(i))})").mkString(",\n        ")

  private val toSigned =
    "CASE WHEN %s >= CAST(9223372036854775808 AS HUGEINT) " +
      "THEN %s - CAST(18446744073709551616 AS HUGEINT) ELSE %s END"
  def signed(e: String): String = toSigned.format(e, e, e)

  /** Full q37 oracle: SimHash signatures + 16-bit chunk blocking. */
  val simhashSql: String = s"""
    WITH toks AS (
      SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
      FROM documents),
    ${xxh64Ctes("toks")},
    bits AS (SELECT doc_id, i,
        SUM(CASE WHEN (hu >> CAST(i AS INT)) & 1 = 1 THEN 1 ELSE -1 END) AS s
      FROM hashed, (SELECT unnest(range(64)) AS i) GROUP BY doc_id, i),
    sigs AS (SELECT doc_id,
        SUM(CASE WHEN s > 0 THEN (CAST(1 AS HUGEINT) << CAST(63 - i AS INT))
                 ELSE CAST(0 AS HUGEINT) END) AS sig_u
      FROM bits GROUP BY doc_id),
    sigss AS (SELECT doc_id, CAST(${signed("sig_u")} AS BIGINT) AS sig, sig_u
      FROM sigs),
    chunked AS (SELECT doc_id, sig, j AS chunk_id,
        CAST((sig_u >> CAST(16 * j AS INT)) & 65535 AS BIGINT) AS chunk
      FROM sigss, (SELECT unnest(range(4)) AS j)),
    pairs AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2,
        CAST(bit_count(xor(a.sig, b.sig)) AS INT) AS hamming
      FROM chunked a JOIN chunked b
        ON a.chunk_id = b.chunk_id AND a.chunk = b.chunk AND a.doc_id < b.doc_id)
    SELECT d1, d2, hamming FROM pairs WHERE hamming <= 3 ORDER BY d1, d2"""

  /** Word n-gram CTE pair mirroring NearDup.gramsOf, INCLUDING the
    * fewer-than-n-tokens fallback (the whole joined text as one gram). */
  private def gramCtes(n: Int): String = {
    val concat = (1 until n).foldLeft("tk[i]")((acc, j) => s"$acc || ' ' || tk[i+$j]")
    s"""tkn AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS tk
      FROM documents),
    toks AS (SELECT DISTINCT doc_id,
        unnest(CASE WHEN len(tk) >= $n
          THEN list_transform(range(1, len(tk) - ${n - 2}), i -> $concat)
          ELSE [array_to_string(tk, ' ')] END) AS tok
      FROM tkn)"""
  }

  /** Full q36 oracle: MinHash signatures (k = bands*rowsPerBand families
    * over distinct word n-grams) + banding, parameterized to match the
    * engine call site. Buckets group on the raw signature slice — the
    * engine hashes the slice first, but equal slices hash equal and
    * distinct-slice collisions are ~2^-64 (would only ADD candidates). */
  /** Shared CTE prefix through per-band buckets (`banded`), plus the
    * signature-agreement scorer, parameterized by the candidate join. */
  /** CTE prefix through the k-hash signature index (`sigarr`): grams,
    * XXH64 gram hashes, the k family rehashes, per-family minima. */
  private def sigPrefix(n: Int, k: Int): String = s"""
    WITH ${gramCtes(n)},
    ${xxh64Ctes("toks")},
    fam(fi, fs) AS (VALUES ${famValues(k)}),
    perfam AS (SELECT doc_id, fi,
        MIN(CAST(${signed("r")} AS BIGINT)) AS m
      FROM ${hashLongSubquery("(SELECT doc_id, fi, fs, hu FROM hashed, fam)",
        Seq("doc_id", "fi"), "hu", "fs", "r")} _pf
      GROUP BY doc_id, fi),
    sigarr AS (SELECT doc_id, list(m ORDER BY fi) AS sig FROM perfam
      GROUP BY doc_id)"""

  private def minhashPrefix(n: Int, bands: Int, rowsPerBand: Int): String = {
    val k = bands * rowsPerBand
    s"""${sigPrefix(n, k)},
    banded AS (SELECT doc_id, b,
        list_slice(sig, CAST($rowsPerBand*b+1 AS INT),
          CAST($rowsPerBand*b+$rowsPerBand AS INT)) AS bucket, sig
      FROM sigarr, (SELECT unnest(range($bands)) AS b))"""
  }

  /** LSH tuning-sweep oracle: ONE k-hash signature index (`sigarr`),
    * several (bands, rowsPerBand) bandings sliced from it, each banding's
    * distinct candidate pairs scored against the exact n-gram Jaccard
    * truth at `tau` — replaying NearDup.minhashSignatures +
    * lshCandidatePairs + jaccardPairs end to end. */
  def lshSweepSql(n: Int, k: Int, configs: Seq[(Int, Int)],
      tau: Double): String = {
    require(configs.forall { case (b, r) => b * r <= k },
      s"bandings must fit the $k-hash signature")
    val bandedCtes = configs.zipWithIndex.map { case ((b, r), i) =>
      s"""banded$i AS (SELECT doc_id, b,
        list_slice(sig, CAST($r*b+1 AS INT), CAST($r*b+$r AS INT)) AS bucket
      FROM sigarr, (SELECT unnest(range($b)) AS b)),
    cand$i AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
      FROM banded$i a JOIN banded$i b
        ON a.b = b.b AND a.bucket = b.bucket AND a.doc_id < b.doc_id)"""
    }.mkString(",\n    ")
    val perConfig = configs.zipWithIndex.map { case ((b, r), i) =>
      s"""SELECT $b AS bands, $r AS rows_per_band,
        (SELECT COUNT(*) FROM cand$i) AS n_candidates,
        (SELECT COUNT(*) FROM cand$i c
         WHERE EXISTS (SELECT 1 FROM truth t
           WHERE t.d1 = c.d1 AND t.d2 = c.d2)) AS tp,
        (SELECT COUNT(*) FROM truth t
         WHERE NOT EXISTS (SELECT 1 FROM cand$i c
           WHERE c.d1 = t.d1 AND c.d2 = t.d2)) AS fn"""
    }.mkString("\n      UNION ALL\n      ")
    s"""${sigPrefix(n, k)},
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM toks GROUP BY 1),
    inter AS (SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS n_common
      FROM toks a JOIN toks b ON a.tok = b.tok AND a.doc_id < b.doc_id
      GROUP BY 1, 2),
    truth AS (SELECT d1, d2
      FROM inter JOIN sizes sa ON sa.doc_id = d1
      JOIN sizes sb ON sb.doc_id = d2
      WHERE CAST(n_common AS DOUBLE) / (sa.sz + sb.sz - n_common) >= $tau),
    $bandedCtes,
    per AS ($perConfig)
    SELECT CAST(bands AS BIGINT) AS bands,
      CAST(rows_per_band AS BIGINT) AS rows_per_band,
      CAST(n_candidates AS BIGINT) AS n_candidates,
      CAST(tp AS BIGINT) AS tp,
      CAST(n_candidates - tp AS BIGINT) AS fp,
      CAST(fn AS BIGINT) AS fn,
      CAST(CASE WHEN n_candidates = 0 THEN 0
        ELSE tp * 10000 // n_candidates END AS BIGINT) AS precision_bp,
      CAST(CASE WHEN tp + fn = 0 THEN 0
        ELSE tp * 10000 // (tp + fn) END AS BIGINT) AS recall_bp
    FROM per ORDER BY bands"""
  }

  private def minhashScore(k: Int, tau: Double): String = s"""
    scored AS (SELECT d1, d2,
        CAST(len(list_filter(range(1, ${k + 1}),
          k -> s1.sig[CAST(k AS INT)] = s2.sig[CAST(k AS INT)])) AS DOUBLE) / $k
          AS est_jaccard
      FROM cand JOIN sigarr s1 ON s1.doc_id = d1
      JOIN sigarr s2 ON s2.doc_id = d2)
    SELECT d1, d2, est_jaccard FROM scored WHERE est_jaccard >= $tau
    ORDER BY d1, d2"""

  def minhashSql(n: Int, bands: Int, rowsPerBand: Int, tau: Double): String = {
    val k = bands * rowsPerBand
    s"""${minhashPrefix(n, bands, rowsPerBand)},
    cand AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
      FROM banded a JOIN banded b
        ON a.b = b.b AND a.bucket = b.bucket AND a.doc_id < b.doc_id),
    ${minhashScore(k, tau)}"""
  }

  /** End-to-end dedup variant: the q36 pair replay, then transitive
    * closure over the >=tau pair graph (recursive CTE) and a min-id
    * cluster label — replays minhashLshPairs + connectedComponentsStars
    * + the keeper aggregation as one statement. Output is the dedup
    * decision relation: one row per surviving (keeper) document with the
    * number of near-duplicates its cluster absorbed. */
  def minhashDedupSql(n: Int, bands: Int, rowsPerBand: Int,
      tau: Double): String = {
    val k = bands * rowsPerBand
    val prefix = minhashPrefix(n, bands, rowsPerBand)
      .replaceFirst("WITH", "WITH RECURSIVE")
    s"""$prefix,
    cand AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
      FROM banded a JOIN banded b
        ON a.b = b.b AND a.bucket = b.bucket AND a.doc_id < b.doc_id),
    dup AS (SELECT d1, d2 FROM cand
      JOIN sigarr s1 ON s1.doc_id = d1
      JOIN sigarr s2 ON s2.doc_id = d2
      WHERE CAST(len(list_filter(range(1, ${k + 1}),
        k -> s1.sig[CAST(k AS INT)] = s2.sig[CAST(k AS INT)])) AS DOUBLE)
        / $k >= $tau),
    uedges AS (SELECT d1 AS u, d2 AS v FROM dup
      UNION SELECT d2, d1 FROM dup),
    reach AS (SELECT u, v FROM uedges
      UNION
      SELECT r.u, e.v FROM reach r JOIN uedges e ON r.v = e.u
      WHERE e.v <> r.u),
    comp AS (SELECT u AS doc_id, LEAST(u, MIN(v)) AS cluster_id
      FROM reach GROUP BY u),
    lab AS (SELECT d.doc_id,
        CAST(COALESCE(c.cluster_id, d.doc_id) AS BIGINT) AS cluster_id
      FROM documents d LEFT JOIN comp c USING (doc_id))
    SELECT cluster_id AS keeper_id, COUNT(*) AS cluster_size
    FROM lab GROUP BY 1 ORDER BY keeper_id"""
  }

  /** Incremental variant: candidates are batch × corpus, where the two
    * predicates (over the placeholder `DOCID`) partition the id space —
    * replays [[graft.llm.NearDup.minhashLshAgainstIndex]]. */
  def minhashIncrementalSql(n: Int, bands: Int, rowsPerBand: Int, tau: Double,
      batchPred: String, corpusPred: String): String = {
    val k = bands * rowsPerBand
    val bp = batchPred.replace("DOCID", "a.doc_id")
    val cp = corpusPred.replace("DOCID", "b.doc_id")
    s"""${minhashPrefix(n, bands, rowsPerBand)},
    cand AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
      FROM banded a JOIN banded b
        ON a.b = b.b AND a.bucket = b.bucket AND ($bp) AND ($cp)),
    ${minhashScore(k, tau)}"""
  }
}
