package graft.queries

/** Shared DuckDB CTE builders for the unrolled BPE-trainer oracles
  * (q230/q231/q275): the corpus word-frequency table, the per-round
  * pair-count + argmax CTEs, and the leftmost-greedy list_reduce merge
  * fold that mirrors `TextAnalysis.bpeApplyMerge` symbol for symbol.
  * One definition so the three oracles cannot drift apart.
  */
private[queries] object BpeSql {

  /** `words` + `sym0` — the frequency table and initial segmentation. */
  val words: String =
    """words AS (SELECT word AS w, CAST(count(*) AS BIGINT) AS cnt
      |               FROM (SELECT unnest(string_split(text, ' ')) AS word
      |                     FROM documents)
      |               WHERE word != '' GROUP BY 1),
      |      sym0 AS (SELECT w, cnt,
      |                      ' ' || regexp_replace(w, '(.)', '\1 ', 'g') AS s
      |               FROM words)""".stripMargin

  /** Round `i` pair counts + argmax (count desc, pair asc). */
  def pairs(i: Int): String =
    s"""p$i AS (SELECT t[i] || ' ' || t[i+1] AS p, SUM(cnt) AS pc
       |  FROM (SELECT cnt, string_split(trim(s), ' ') AS t FROM sym${i - 1}),
       |       unnest(range(1, len(t))) AS u(i)
       |  GROUP BY 1),
       |top$i AS (SELECT p, pc FROM p$i ORDER BY pc DESC, p LIMIT 1)"""
      .stripMargin

  /** Round `i` merge fold — the identical leftmost-greedy semantics as
    * `bpeApplyMerge` (see its scaladoc for why a string replace is wrong).
    */
  def fold(i: Int): String =
    s"""sym$i AS (SELECT w, cnt,
       |  ' ' || list_reduce(string_split(trim(s), ' '), (acc, x) ->
       |    CASE WHEN (acc = str_split(top$i.p, ' ')[1]
       |               OR ends_with(acc, ' ' || str_split(top$i.p, ' ')[1]))
       |              AND x = str_split(top$i.p, ' ')[2]
       |      THEN substr(acc, 1,
       |             length(acc) - length(str_split(top$i.p, ' ')[1]))
       |           || replace(top$i.p, ' ', '')
       |      ELSE acc || ' ' || x END) || ' ' AS s
       |  FROM sym${i - 1} CROSS JOIN top$i)""".stripMargin

  /** The full K-round chain: pairs + fold per round, comma-joined. */
  def chain(k: Int): String =
    (1 to k).map(i => pairs(i) + ",\n" + fold(i)).mkString(",\n")
}
