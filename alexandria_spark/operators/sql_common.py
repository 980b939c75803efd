"""Shared DuckDB-SQL fragments for the oracle side of the suite."""

# trim set = C whitespace + C punct minus '+'/'#' (reference my_ispunct,
# text.h:44-49). DuckDB e'' string; '' escapes a quote, \\\\ a backslash.
TRIM_DUCK = "e' \\t\\n\\x0b\\x0c\\r!\"$%&''()*,-./:;<=>?@[\\\\]^_`{|}~'"

SQL_PRELUDE = f"""
WITH toks AS (
  SELECT doc_id, source, lang,
         list_filter(
           list_transform(regexp_split_to_array(lower(text), '[ \\t,|!]'),
                          w -> trim(w, {TRIM_DUCK})),
           w -> length(w) BETWEEN 1 AND 100) AS toks
  FROM documents
),
tok AS (
  SELECT doc_id, source, lang, unnest(toks) AS term,
         unnest(range(len(toks))) AS pos
  FROM toks
),
tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
dl AS (SELECT doc_id, count(*) AS doc_len FROM tok GROUP BY doc_id),
stats AS (SELECT count(*) AS n_docs, avg(doc_len) AS avg_dl FROM dl),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
scored AS (
  SELECT tf.doc_id, tf.term, tf.tf, dl.doc_len, dfreq.df,
         CAST( ln((stats.n_docs - dfreq.df + 0.5e0)/(dfreq.df + 0.5e0) + 1.0e0)
             * ((tf.tf/CAST(dl.doc_len AS DOUBLE)) * 2.2e0)
             / ((tf.tf/CAST(dl.doc_len AS DOUBLE))
                + 1.2e0 * (0.25e0 + (0.75e0 * dl.doc_len)/stats.avg_dl))
           AS REAL) AS score
  FROM tf JOIN dl USING (doc_id) JOIN dfreq USING (term) CROSS JOIN stats
)
"""
