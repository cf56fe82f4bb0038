#!/usr/bin/env python3
"""Build an adversarial documents corpus for cross-engine parity sweeps:
copies an sf dir and replaces documents.parquet with rows exercising NULL
text, empty text, irregular whitespace (empty tokens), astral-plane
unicode, heavy repetition, control characters and quote/backslash content.

Usage: make_advdata.py [<srcSfDir> <outDir>]
Then:  sbt "runMain graft.Verify <outDir> /tmp/verify_adv"
       python3 scripts/check.py /tmp/verify_adv <outDir>

Round-7 result: the full gate hash-exact on this corpus (the
NULL-text row is the case that motivated q47's explicit filter)."""
import sys, shutil, os, glob
import duckdb

if len(sys.argv) not in (1, 3):
    sys.exit(f'usage: {sys.argv[0]} [<srcSfDir> <outDir>] '
             '(both or neither — one arg alone would silently use defaults)')
src = sys.argv[1] if len(sys.argv) == 3 else '/root/testdata/sf0.001'
adv = sys.argv[2] if len(sys.argv) == 3 else '/tmp/advdata'

shutil.rmtree(adv, ignore_errors=True)
os.makedirs(adv)
for p in glob.glob(os.path.join(src, '*.parquet')):
    # skip the one file being replaced: if the COPY below ever failed, a
    # pre-copied real documents.parquet would masquerade as adversarial
    if os.path.basename(p) not in ('documents.parquet',
                                   'embeddings.parquet'):
        shutil.copy(p, adv)

rows = [
    (0, None, 'en', 'src0', None),                        # NULL text
    (1, '', 'en', 'src0', 0),                             # empty text
    (2, 'word', 'es', 'src1', 4),                         # single word
    (3, 'a  b   c', 'de', 'src1', 8),                     # empty tokens
    (4, ' leading and trailing ', 'fr', 'src2', 22),      # boundary spaces
    (5, 'emoji \U0001F600 and \U0001F680 fly', 'zh', 'src2', None),
    (6, 'the the the the the the', 'en', 'src3', 23),     # heavy repetition
    (7, 'Ünïcödé wörds ünïcödé wörds', 'de', 'src3', 27),
    (8, 'tab\tand\nnewline chars', 'en', 'src4', 21),     # control chars
    (9, 'quote\'s and "double" and back\\slash', 'en', 'src4', None),
] + [(10 + i, f'filler doc {i} with some shared tokens the a of',
      'en', f'src{i % 3}', None) for i in range(20)]

con = duckdb.connect()
con.execute("CREATE TABLE adv(doc_id BIGINT, text VARCHAR, lang VARCHAR, "
            "source VARCHAR, n_chars BIGINT)")
con.executemany("INSERT INTO adv VALUES (?,?,?,?,?)", rows)
con.execute(f"COPY adv TO '{adv}/documents.parquet' (FORMAT PARQUET)")
print(f'{adv}: {con.execute("select count(*) from adv").fetchone()[0]} '
      'adversarial docs')

# adversarial embeddings: zero vector (no direction — under ANSI mode an
# unguarded cosine is a DIVIDE_BY_ZERO crash, found by this sweep), huge /
# tiny magnitudes (float overflow/underflow through the double fold), and
# an all-NaN vector (NaN sorts greatest in BOTH engines, so parity holds)
import random
random.seed(7)
vrows = []
for i in range(60):
    if i == 0:
        v = [0.0] * 64
    elif i == 1:
        v = [1e30] * 64
    elif i == 2:
        v = [1e-30] * 64
    elif i == 3:
        v = [float('nan')] * 64
    else:
        v = [random.gauss(0, 1) for _ in range(64)]
    vrows.append((i, v, i % 5))
con.execute("CREATE TABLE adve(vec_id BIGINT, embedding FLOAT[], "
            "label INTEGER)")
con.executemany("INSERT INTO adve VALUES (?,?,?)", vrows)
con.execute(f"COPY adve TO '{adv}/embeddings.parquet' (FORMAT PARQUET)")
print(f'{adv}: {con.execute("select count(*) from adve").fetchone()[0]} '
      'adversarial embeddings')
