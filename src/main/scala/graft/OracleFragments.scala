package graft

/** Shared DuckDB oracle SQL fragments. Every fragment here encodes the
  * SAME math as a Spark-side operator (tokenization regex, shingle
  * assembly, minhash constants) — single source so the d3/d4 oracles
  * and the d8 closure oracle can never silently drift apart.
  */
private[graft] object OracleFragments {

  val toksSql: String =
    "list_filter(string_split_regex(trim(regexp_replace(lower(text), '\\s+', ' ')), ' '), x -> x <> '')"

  val normSql: String = "trim(regexp_replace(lower(text), '\\s+', ' '))"

  def shinglesSql(n: Int): String =
    s"""CASE WHEN len($toksSql) >= $n
       |  THEN list_distinct(list_transform(range(1, len($toksSql) - $n + 2),
       |       i -> array_to_string(($toksSql)[i:i+${n - 1}], ' ')))
       |  ELSE [$normSql] END""".stripMargin

  val hash60: String => String =
    expr => s"('0x' || substr(md5($expr), 1, 15))::BIGINT"

  val minhashASql: String =
    graft.operators.Dedup.minhashA.take(8).mkString("[", ", ", "]")
  val minhashBSql: String =
    graft.operators.Dedup.minhashB.take(8).mkString("[", ", ", "]")
  val minhashP: Long = graft.operators.Dedup.minhashP

  /** CTEs sh/ex/hx/sigs: universal-hash minhash signatures (K=8) over
    * 3-gram shingles — the exact pipeline of Dedup.minhashFromShingles.
    */
  def minhashSigsCte: String =
    s"""sh AS (SELECT doc_id, ${shinglesSql(3)} AS sh FROM documents),
       |ex AS (SELECT doc_id, unnest(sh) AS s FROM sh),
       |hx AS (SELECT doc_id, (('0x' || substr(md5(s), 1, 8))::BIGINT % $minhashP) AS h FROM ex),
       |sigs AS (
       |  SELECT doc_id, k::INT AS k,
       |    min(($minhashASql[k::INT + 1] * h + $minhashBSql[k::INT + 1]) % $minhashP) AS minhash
       |  FROM hx CROSS JOIN range(8) r(k) GROUP BY doc_id, k
       |)""".stripMargin
}
