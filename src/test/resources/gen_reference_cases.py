#!/usr/bin/env python3
"""Regenerate the reference-differential case files in this directory by
EXECUTING the reference's own Python (pandas + stdlib difflib — the fuzz
path is covered separately by reference_pivot_cases.tsv, extracted from the
reference's published xlsx output).

Run from the repo root with the reference checkout at /root/reference:

    python3 src/test/resources/gen_reference_cases.py

Outputs (committed):
  - preproc_cases.json : 300 random tables through preprocess_array
                         (src/utils/preprocess_table.py)
  - purefn_cases.json  : normalize_column_name / clean_criterion /
                         find_month on adversarial strings
  - step4_cases.json   : random merged tables through the FULL step_4
                         dump (normalize -> project -> FileName -> dedupe
                         -> sorted outer concat), expected corpus rows
"""
import json, random, re, sys, os
from difflib import SequenceMatcher

sys.path.insert(0, '/dev/null')  # never import the repo itself
import pandas as pd
import numpy as np

REF = '/root/reference'
OUT = os.path.dirname(os.path.abspath(__file__))


def load_fn(path, names):
    """Exec a reference source file with stubbed project imports and return
    the requested function objects."""
    src = open(os.path.join(REF, path)).read()
    # drop project-local imports (db/logger/config); keep stdlib/pandas
    src = re.sub(r'^from src\..*$', '', src, flags=re.M)
    src = re.sub(r'^from sqlalchemy.*$', '', src, flags=re.M)
    src = re.sub(r'^from sqlmodel.*$', '', src, flags=re.M)
    src = re.sub(r'^from fuzzywuzzy.*$', '', src, flags=re.M)
    src = re.sub(r'^import pymupdf.*$', '', src, flags=re.M)
    # cut everything from the first db-touching top-level function
    for cut in ('def step_', 'if __name__'):
        i = src.find(cut)
        if i >= 0:
            src = src[:i]
    class _FakePyMuPDF:  # annotation-only stand-in (find_month's signature)
        class Page: pass
    class _NoopLogger:
        def debug(self, *a, **k): pass
        def info(self, *a, **k): pass
        def error(self, *a, **k): pass
    def _df2data(df):  # src/utils/dataframe.py:11-15 verbatim semantics
        return np.vstack([df.columns.tolist(), df.values.tolist()]).tolist()
    g = {'pd': pd, 'np': np, 'SequenceMatcher': SequenceMatcher,
         'pymupdf': _FakePyMuPDF, 'logger': _NoopLogger(), 'df2data': _df2data}
    exec(compile(src, path, 'exec'), g)
    return [g[n] for n in names]


class FakePage:
    """find_month reads page.get_textpage().extractText() — feed a string."""
    def __init__(self, text): self._t = text
    def get_textpage(self): return self
    def extractText(self): return self._t


(preprocess_array,) = load_fn('src/utils/preprocess_table.py', ['preprocess_array'])
(normalize_column_name, get_similarity) = load_fn(
    'src/v3_stable/step_4_dump_tables.py', ['normalize_column_name', 'get_similarity'])
(clean_criterion,) = load_fn('src/v3_stable/step_5_pivot_table.py', ['clean_criterion'])
(find_month,) = load_fn('src/v3_stable/step_6_update_publish_month.py', ['find_month'])


def data2df(data):
    return pd.DataFrame(data[1:], columns=data[0])


rnd = random.Random(20260816)
WORDS = ['Strategic', 'Relevance', 'rating', 'HS', 'S', 'MS', 'None', '',
         'alpha', 'beta', 'x', '1.', '2.1', 'assessment', 'of', 'project']
HEADERS = ['Criterion', 'criterion ', 'CRITERION', 'Summary Assessment',
           'SummaryAssessment', 'S ummary Assessment', 'summary assessment/comments',
           'Summary\nAssessment', 'Rating', 'Rating (achievement)', 'rating 2024',
           'Col1', 'Col2', '', 'Notes', 'Criterio', 'Sumary Assessment', 'x']


def rand_cell():
    r = rnd.random()
    if r < 0.1: return None
    if r < 0.2: return ''
    if r < 0.28: return 'None'
    return ' '.join(rnd.choice(WORDS) for _ in range(rnd.randint(1, 4)))


# ---------------- preprocess_array cases (step_3's M3 cleanup)
preproc = []
for _ in range(300):
    ncols = rnd.randint(1, 6)
    nrows = rnd.randint(0, 6)
    header = [rnd.choice(HEADERS + ['Col%d' % rnd.randint(0, 5)]) for _ in range(ncols)]
    table = [header] + [[rand_cell() for _ in range(ncols)] for _ in range(nrows)]
    try:
        expected = preprocess_array([list(r) for r in table])
        # pandas values come out as str after astype(str)
        expected = [[None if c is None else str(c) for c in row] for row in expected]
    except Exception:
        expected = ['ERROR']
    preproc.append({'input': table, 'expected': expected})
json.dump(preproc, open(os.path.join(OUT, 'preproc_cases.json'), 'w'))

# ---------------- pure-function cases
norm_ins = HEADERS + ['Ratings', 'RATING-x', ' rating', 'Summaryassessment',
                      'Criterion\n(overall)', 'a  b   c', 'None', '42',
                      'Critérion', 'summary_assessment', 'Summary  Assessment ']
crit_ins = ['1. Alignment to UNEP', '2.1 Partners:', '12.34. x', '...', '1.',
            'No numbers', '  spaced  out  ', '3 .leading', '2.1.2 deep', '']
month_ins = ['December 2024', 'Dec. 2024', 'Dec, 2024', 'published May, 2019 ok',
             'February2020', 'Jan 1999 and May 2000', 'May Day 2001', 'nothing',
             'September 1987', 'Sept. 2020', 'March  2021', 'april 2022',
             'JUNE 2023', 'Oct 2018', 'Oct. 2018 vs January 2019']
purefn = {
    'norm': [{'in': s, 'out': normalize_column_name(s)} for s in norm_ins],
    'crit': [{'in': s, 'out': clean_criterion(s)} for s in crit_ins],
    'month': [{'in': s, 'out': find_month(FakePage(s))} for s in month_ins],
}
json.dump(purefn, open(os.path.join(OUT, 'purefn_cases.json'), 'w'))

# ---------------- step_4 end-to-end cases (C1+C2+C3)
cases = []
for case_idx in range(40):
    ntabs = rnd.randint(1, 5)
    tables, names = [], []
    for t in range(ntabs):
        ncols = rnd.randint(1, 6)
        nrows = rnd.randint(0, 5)
        header = [rnd.choice(HEADERS) for _ in range(ncols)]
        body = [[(lambda c: '' if c is None else str(c))(rand_cell())
                 for _ in range(ncols)] for _ in range(nrows)]
        tables.append([header] + body)
        names.append('%d.doc%d_%d.pdf' % (t + 1, case_idx, t))
    # replicate step_4_dump_tables.py:40-96 exactly
    dfs, all_columns = [], set()
    for table, name in zip(tables, names):
        if not table:
            continue
        try:
            paper_df = data2df(table)
            paper_df.columns = [normalize_column_name(c) for c in paper_df.columns]
            kept = ['Criterion', 'SummaryAssessment', 'Rating']
            existing = [c for c in kept if c in paper_df.columns]
            paper_df = paper_df[existing]
            paper_df['FileName'] = name
            paper_df = paper_df.loc[:, ~paper_df.columns.duplicated()]
            all_columns.update(paper_df.columns)
            dfs.append(paper_df)
        except Exception:
            continue
    all_columns = sorted(list(all_columns))
    result_df = pd.DataFrame(columns=all_columns)
    for df in dfs:
        for c in all_columns:
            if c not in df.columns:
                df[c] = pd.NA
        df = df[all_columns]
        result_df = pd.concat([result_df, df], ignore_index=True)
    expected = {
        'columns': all_columns,
        'rows': [[None if pd.isna(v) else str(v) for v in row]
                 for row in result_df.itertuples(index=False)],
    }
    cases.append({'tables': tables, 'names': names, 'expected': expected})
json.dump(cases, open(os.path.join(OUT, 'step4_cases.json'), 'w'))

print('preproc:', len(preproc), 'purefn:', {k: len(v) for k, v in purefn.items()},
      'step4:', len(cases), 'step4 total rows:',
      sum(len(c['expected']['rows']) for c in cases))
