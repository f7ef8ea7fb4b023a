#!/usr/bin/env python3
"""Dev-side ground-truth check for the F9 title-postprocess oracle.

Transcribes the reference pipeline (postprocess_functions.py semantics)
in plain Python, builds the same adversarial titles the f9 query builds,
and compares the DuckDB oracle SQL against the Python ground truth.
NOT part of the engine - local development tool only.
"""
import re, sys
import duckdb

STOP = set("""i me my myself we our ours ourselves you you're you've you'll you'd your yours yourself
yourselves he him his himself she she's her hers herself it it's its itself they them their theirs
themselves what which who whom this that that'll these those am is are was were be been being have
has had having do does did doing a an the and but if or because as until while of at by for with
about against between into through during before after above below to from up down in out on off
over under again further then once here there when where why how all any both each few more most
other some such no nor not only own same so than too very s t can will just don don't should
should've now d ll m o re ve y ain aren aren't couldn couldn't didn didn't doesn doesn't hadn
hadn't hasn hasn't haven haven't isn isn't ma mightn mightn't mustn mustn't needn needn't shan
shan't shouldn shouldn't wasn wasn't weren weren't won won't wouldn wouldn't""".split())

def clean_junk(t):
    for j in ['Microsoft Word - ', '.Doc', '.doc']:
        t = re.sub(j, '', t)
    return re.sub(r'\s+', ' ', t)

def postprocess(title):
    # remove_other_patterns
    m = re.search(r'page (\d+) of (\d+)', title)
    if m:
        title = title[:m.start()] + title[m.end():]
    m = re.search(r'\b(Crown Copyright|Crown copyright)\b', title)
    if m:
        title = title[:m.start()].strip()
    # remove_open_brackets
    if title.count('(') > title.count(')'):
        title = title[:title.rfind('(')]
    # delete_repeated_ngrams
    toks, cleaned = title.strip().split(' '), []
    for w in toks:
        if w in STOP:
            cleaned.append(w)
        elif w not in cleaned:
            cleaned.append(w)
    # remove_trailing_stopwords_and_single_chars (divergence: '' on empty)
    while cleaned and (cleaned[-1].lower() in STOP or
                       (len(cleaned[-1]) == 1 and not cleaned[-1].isdigit()
                        and cleaned[-1].lower() != 'a')):
        cleaned = cleaned[:-1]
    # capital case
    out = []
    for i, w in enumerate(cleaned):
        if i == 0 or (not w.isupper() and w not in STOP):
            out.append(w[0].upper() + w[1:] if w and w[0].isalpha() else w)
        else:
            out.append(w)
    s = ' '.join(out)
    # remove_table_of_contents
    m = re.search(r'\b(Contents|Table of Contents|Table of contents)\b\s*1\s+\D+?\s+2', s)
    if m:
        s = s[:m.start()].strip()
    # capitalize_if_majority_uppercase
    if sum(1 for c in s if c.isupper()) > len(s) / 2 and not any(c.isdigit() for c in s):
        s = s.upper()
    return s

RAW_SQL = """
SELECT doc_id,
  (CASE WHEN doc_id % 3 = 0 THEN 'Microsoft Word - ' ELSE '' END) ||
  (CASE WHEN doc_id % 11 = 0 THEN upper(head) ELSE head END) ||
  (CASE WHEN doc_id % 4 = 0 THEN ' page 3 of 10 appendix' ELSE '' END) ||
  (CASE WHEN doc_id % 13 = 0 THEN ' Contents 1 alpha beta 2' ELSE '' END) ||
  (CASE WHEN doc_id % 5 = 0 THEN ' (Draft Annex' ELSE '' END) ||
  (CASE WHEN doc_id % 7 = 0 THEN ' Crown Copyright 2024 reserved' ELSE '' END) ||
  (CASE WHEN doc_id % 9 = 0 THEN ' report.doc' ELSE '' END) ||
  (CASE WHEN doc_id % 2 = 0 THEN ' of the t' ELSE '' END) AS raw
FROM (SELECT doc_id, array_to_string((string_split(text, ' '))[1:8], ' ') AS head
      FROM documents)
"""

def oracle_sql(stops):
    sl = ",".join("'" + w.replace("'", "''") + "'" for w in sorted(stops))
    return f"""
WITH raw AS ({RAW_SQL}),
j AS (
  SELECT doc_id,
    regexp_replace(regexp_replace(regexp_replace(regexp_replace(raw,
      'Microsoft Word - ', '', 'g'), '.Doc', '', 'g'), '.doc', '', 'g'),
      '\\s+', ' ', 'g') AS t
  FROM raw),
p AS (
  SELECT doc_id,
    CASE WHEN regexp_matches(t2, '\\b(Crown Copyright|Crown copyright)\\b')
         THEN trim(regexp_extract(t2, '^(.*?)\\b(Crown Copyright|Crown copyright)\\b', 1))
         ELSE t2 END AS t
  FROM (SELECT doc_id, regexp_replace(t, 'page (\\d+) of (\\d+)', '') AS t2 FROM j) x),
b AS (
  SELECT doc_id,
    CASE WHEN length(t) - length(replace(t, '(', '')) >
              length(t) - length(replace(t, ')', ''))
         THEN t[1 : length(t) - strpos(reverse(t), '(')]
         ELSE t END AS t
  FROM p),
tok AS (
  SELECT doc_id,
         unnest(string_split(trim(t), ' ')) AS w,
         unnest(generate_series(1, len(string_split(trim(t), ' ')))) AS pos
  FROM b),
kept AS (
  SELECT doc_id, w, pos FROM (
    SELECT doc_id, w, pos,
           row_number() OVER (PARTITION BY doc_id, w ORDER BY pos) AS rn
    FROM tok) x
  WHERE w IN ({sl}) OR rn = 1),
r AS (
  SELECT doc_id, w,
         row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS pos
  FROM kept),
g AS (
  SELECT doc_id,
         max(CASE WHEN NOT (lower(w) IN ({sl}) OR
                            (length(w) = 1 AND NOT regexp_matches(w, '^[0-9]$')
                             AND lower(w) <> 'a'))
                  THEN pos END) AS maxgood
  FROM r GROUP BY doc_id),
cc AS (
  SELECT r.doc_id, r.pos,
    CASE WHEN r.pos = 1 OR (NOT (r.w = upper(r.w) AND r.w <> lower(r.w))
                            AND r.w NOT IN ({sl}))
         THEN CASE WHEN regexp_matches(r.w[1:1], '^[A-Za-z]$')
                   THEN upper(r.w[1:1]) || r.w[2:] ELSE r.w END
         ELSE r.w END AS w
  FROM r JOIN g USING (doc_id) WHERE r.pos <= g.maxgood),
joined AS (
  SELECT doc_id, coalesce(string_agg(w, ' ' ORDER BY pos), '') AS s
  FROM cc GROUP BY doc_id),
toc AS (
  SELECT d.doc_id, coalesce(
    CASE WHEN regexp_matches(s, '\\b(Contents|Table of Contents|Table of contents)\\b\\s*1\\s+\\D+?\\s+2')
         THEN trim(regexp_extract(s,
           '^(.*?)\\b(Contents|Table of Contents|Table of contents)\\b\\s*1\\s+\\D+?\\s+2', 1))
         ELSE s END, '') AS s
  FROM (SELECT DISTINCT doc_id FROM documents) d LEFT JOIN joined USING (doc_id))
SELECT doc_id,
  CASE WHEN length(regexp_replace(s, '[^A-Z]', '', 'g')) > length(s) / 2.0
            AND NOT regexp_matches(s, '[0-9]')
       THEN upper(s) ELSE s END AS title
FROM toc
"""

def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
    raws = dict(con.execute(RAW_SQL).fetchall())
    truth = {k: postprocess(clean_junk(v)) for k, v in raws.items()}
    got = dict(con.execute(oracle_sql(STOP)).fetchall())
    bad = 0
    for k in sorted(truth):
        if truth[k] != got.get(k):
            bad += 1
            if bad <= 10:
                print(f"doc {k}:\n  raw  : {raws[k]!r}\n  truth: {truth[k]!r}\n  duck : {got.get(k)!r}")
    print(f"{len(truth) - bad}/{len(truth)} match")
    sys.exit(1 if bad else 0)

main()
