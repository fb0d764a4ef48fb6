package graft.ops

/** DuckDB oracle SQL for the language-ID queries, generated from the
  * SAME [[LangProfiles]] data the Spark scorer uses — parity by
  * construction. Mirrors [[LangScorer]] exactly: script census over
  * code points with ≥5% integer thresholds (kana→ja, hangul→ko,
  * thai→th, hebrew→he, greek→el, devanagari→hi, han→zh), then integer
  * n-gram cost argmin within the Latin/Cyrillic/Arabic script group,
  * ties ORDER BY cost ASC, lang ASC.
  */
object LangOracle {

  private def q(s: String): String = "'" + s.replace("'", "''") + "'"

  private lazy val profValues: String =
    LangScorer.GramLangs.flatMap { l =>
      LangProfiles.Profiles(l).toSeq.sortBy(_._1).map { case (g, c) =>
        s"(${q(l)}, ${q(g)}, $c)"
      }
    }.mkString(", ")

  private lazy val cost0Values: String =
    LangScorer.GramLangs.map(l =>
      s"(${q(l)}, ${LangProfiles.Cost0(l)}, ${q(LangProfiles.Groups(l))})")
      .mkString(", ")

  private lazy val wordValues: String =
    LangProfiles.Langs.flatMap { l =>
      LangProfiles.CommonWords(l).toSeq.sorted.map(w => s"(${q(l)}, ${q(w)})")
    }.mkString(", ")

  private def census(range: String): String =
    s"length(text) - length(regexp_replace(text, '[$range]', '', 'g'))"

  /** Shared CTE chain: script census + routing, tokens, padded
    * code-point trigrams, per-(doc,lang) integer cost within the
    * routed script group, argmin row, final prediction.
    */
  private lazy val ctes: String =
    s"""chars AS (SELECT doc_id, length(text) AS ncp,
         ${census("\\x{4e00}-\\x{9fff}")} AS han,
         ${census("\\x{3040}-\\x{30ff}")} AS kana,
         ${census("\\x{ac00}-\\x{d7af}")} AS hangul,
         ${census("\\x{0e00}-\\x{0e7f}")} AS thai,
         ${census("\\x{0590}-\\x{05ff}")} AS hebrew,
         ${census("\\x{0370}-\\x{03ff}")} AS greek,
         ${census("\\x{0900}-\\x{097f}")} AS deva,
         ${census("\\x{0600}-\\x{06ff}")} AS arab,
         ${census("\\x{0400}-\\x{04ff}")} AS cyr
         FROM documents),
       route AS (SELECT doc_id,
         CASE WHEN kana * 20 >= greatest(ncp, 1) THEN 'ja'
              WHEN hangul * 20 >= greatest(ncp, 1) THEN 'ko'
              WHEN thai * 20 >= greatest(ncp, 1) THEN 'th'
              WHEN hebrew * 20 >= greatest(ncp, 1) THEN 'he'
              WHEN greek * 20 >= greatest(ncp, 1) THEN 'el'
              WHEN deva * 20 >= greatest(ncp, 1) THEN 'hi'
              WHEN han * 20 >= greatest(ncp, 1) THEN 'zh'
              ELSE NULL END AS direct,
         CASE WHEN arab * 20 >= greatest(ncp, 1) THEN 'arab'
              WHEN cyr * 20 >= greatest(ncp, 1) THEN 'cyr'
              ELSE 'latin' END AS grp
         FROM chars),
       toks AS (SELECT doc_id, list_filter(string_split(lower(text), ' '),
           x -> x <> '') AS tk FROM documents),
       tok AS (SELECT doc_id, unnest(tk) AS t FROM toks),
       grams AS (SELECT doc_id, substr(' ' || t || ' ', CAST(i AS INTEGER), 3) AS g
         FROM (SELECT doc_id, t,
                 unnest(generate_series(1, length(t))) AS i FROM tok)),
       gc AS (SELECT doc_id, g, count(*) AS tf FROM grams GROUP BY doc_id, g),
       totals AS (SELECT doc_id,
         coalesce(list_sum(list_transform(tk, x -> length(x))), 0) AS tt
         FROM toks),
       prof(lang, g, c) AS (VALUES $profValues),
       c0t(lang, c0, grp) AS (VALUES $cost0Values),
       m AS (SELECT gc.doc_id, p.lang,
               sum(CAST(gc.tf AS BIGINT) * p.c) AS mc,
               sum(CAST(gc.tf AS BIGINT)) AS mt
             FROM gc JOIN prof p ON gc.g = p.g GROUP BY gc.doc_id, p.lang),
       sc AS (SELECT t.doc_id, c.lang,
               coalesce(m.mc, 0) + (CAST(t.tt AS BIGINT) - coalesce(m.mt, 0))
                 * c.c0 AS cost
             FROM totals t
             JOIN route r ON r.doc_id = t.doc_id
             JOIN c0t c ON c.grp = r.grp
             LEFT JOIN m ON m.doc_id = t.doc_id AND m.lang = c.lang),
       gbest AS (SELECT doc_id, lang, cost,
                row_number() OVER (PARTITION BY doc_id
                  ORDER BY cost ASC, lang ASC) AS rn FROM sc),
       pred AS (SELECT t.doc_id,
                coalesce(r.direct, b.lang) AS lang,
                CAST(t.tt AS INTEGER) AS n_grams,
                CAST(CASE WHEN r.direct IS NOT NULL THEN -1
                     ELSE b.cost END AS BIGINT) AS cost_best
              FROM totals t
              JOIN route r ON r.doc_id = t.doc_id
              LEFT JOIN gbest b ON b.doc_id = t.doc_id AND b.rn = 1)"""

  lazy val q12Sql: String =
    s"""WITH $ctes
       SELECT doc_id, lang AS lang_pred, n_grams, cost_best FROM pred"""

  lazy val q29Sql: String =
    s"""WITH $ctes
       SELECT d.lang, p.lang AS lang_pred, count(*) AS n
       FROM pred p JOIN documents d USING (doc_id)
       GROUP BY d.lang, p.lang"""

  lazy val q27Sql: String =
    s"""WITH $ctes,
       words(lang, w) AS (VALUES $wordValues),
       th AS (SELECT tok.doc_id, count(*) AS h
              FROM tok JOIN pred ON pred.doc_id = tok.doc_id
              JOIN words w ON w.lang = pred.lang AND w.w = tok.t
              GROUP BY tok.doc_id),
       zh AS (SELECT doc_id,
                CAST(${census("\\x{4e00}-\\x{9fff}")} AS INTEGER) AS c_zh,
                CAST(${census("的了是在和不有我他这")} AS INTEGER) AS c_zh_common
              FROM documents),
       ntok AS (SELECT doc_id, CAST(len(tk) AS INTEGER) AS n_tokens FROM toks)
       SELECT p.doc_id, p.lang AS lang_pred, n.n_tokens,
         CAST(CASE WHEN p.lang = 'zh' THEN z.c_zh_common
              ELSE coalesce(th.h, 0) END AS INTEGER) AS common_hits,
         round(1.0 - CAST(CASE WHEN p.lang = 'zh' THEN z.c_zh_common
                 ELSE coalesce(th.h, 0) END AS DOUBLE)
           / greatest(CASE WHEN p.lang = 'zh' THEN z.c_zh
                 ELSE n.n_tokens END, 1), 4) AS oov_rate
       FROM pred p JOIN ntok n ON n.doc_id = p.doc_id
       JOIN zh z ON z.doc_id = p.doc_id
       LEFT JOIN th ON th.doc_id = p.doc_id"""
}
