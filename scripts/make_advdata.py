#!/usr/bin/env python3
"""Build an adversarial corpus for cross-engine parity sweeps: copies an
sf dir and replaces documents/embeddings/events (NULL and empty text,
irregular whitespace, astral-plane unicode, control characters, zero/huge/
NaN vectors, hostile JSON) and — round 12 — orders/customer, the triple
derivation's source tables, so the LWW/scan/shard/graph gate entries run
on hostile strings and duplicated-key equal-timestamp ties whose objects
straddle the astral/BMP UTF-16-vs-UTF-8 order divergence.

Usage: make_advdata.py [<srcSfDir> <outDir>]
Then:  sbt "runMain graft.Verify <outDir> /tmp/verify_adv"
       python3 scripts/check.py /tmp/verify_adv <outDir>

Round-7 result: the full gate hash-exact on this corpus (the
NULL-text row is the case that motivated q47's explicit filter).
Round-12 result: 75/75 hash-exact with the triple sources adversarial;
replayed against pre-round-12 code, the corpus catches the uncompacted
q31 bucketed store (dup keys fan out through the full-outer join,
247 rows vs the oracle's 237) — the regression class Lww.compact
closes."""
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
                                   'embeddings.parquet',
                                   'events.parquet',
                                   'orders.parquet',
                                   'customer.parquet',
                                   'lineitem.parquet'):
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
      'en', f'src{i % 3}', None) for i in range(20)] + [
    # hostile source/lang values: the q62/q64 groupers + q64's try_cast
    # weight parse + the NULLS FIRST source orderings (Spark default vs
    # DuckDB's NULLS LAST default) are exercised by these
    (30, 'null source filler the a of', 'en', None, None),
    (31, 'unparseable source the of and', 'en', 'weird-name', None),
    (32, 'overflow source the of a', 'en', 'src99999999999999999999', None),
    (33, 'null lang filler the a of', None, 'src5', None),
    (34, 'empty source filler the of', 'en', '', None),
    # r16 StableRound corpus guard, DOCS-RATIO family (d=4): one 800-token
    # doc engineered so every ratio that divides by the token count lands
    # EXACTLY on a 5-decimal '…5' double whose scaled binary sits BELOW the
    # half — the class where Spark's builtin round(x, 4) (HALF_UP on the
    # shortest repr) says round-up while the bit-stable floor form and
    # DuckDB both say round-down. 163×'the' + 637 distinct fillers (one
    # extended to 22 chars) gives: top1_frac = dup1_frac = stop_ratio =
    # 163/800 = 0.20375 (builtin 0.2038, stable 0.2037) and avg_tok_len =
    # 3691/800 = 4.61375 (builtin 4.6138, stable 4.6137) — all verified
    # divergent in DuckDB before pinning (0.30875-class candidates whose
    # scaled product lands ABOVE the half do NOT diverge; each fixture
    # here was searched, not assumed). A regression of q16/q47 back to
    # the builtin hash-mismatches this corpus loudly. 800 = 2^5·5^2 is
    # the smallest token count that can place a 5th-decimal tie at all —
    # ratio boundaries need 5^2·2^5 in the reduced denominator.
    (35, ' '.join(['the'] * 163
                  + [f'w{i:04d}' for i in range(1, 637)]
                  + ['w0637extendedtokenlong']), 'en', 'src6', None),
]

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
    elif i == 4:
        v = []              # empty vector: DuckDB's array_to_string([]) /
                            # list_sum([]) return NULL where Spark returns
                            # ''/0 — q58's oracle must CASE them back
    elif i == 5:
        v = None            # NULL vector: NULL through both engines
    elif i == 6:
        v = [1.0] * 64      # NULL ELEMENT: Spark's sequential fold nulls
        v[7] = None         # the whole sum; DuckDB's list_sum/list_max skip
                            # nulls — oracles carry an explicit has-null
                            # guard so both engines drop/sentinel the row
    else:
        v = [random.gauss(0, 1) for _ in range(64)]
    vrows.append((i, v, i % 5))
# r16 StableRound corpus guard, VECTORS-COS family (d=4): a same-LSH-bucket
# pair whose exact cosine is the divergent double 251/800 = 0.31375
# (above q38's 0.3 floor; builtin round(·,4) says 0.3138, the stable floor
# form and DuckDB say 0.3137). Exactness by construction: v60's norm² =
# 251² + 759² + 30² + 3² + 3² = 640000 (sqrt exactly 800), v61 is a single
# 500 aligned with the 251, so dot = 125500 and every IEEE step (two exact
# sqrts, one product, one division) is identical in both engines. The
# position/sign permutation was searched so both vectors project to the
# SAME 8-plane bucket (md5-derived planes recomputed in the search) —
# otherwise q38 never scores the pair. A q38/q21/q66/q68 regression to
# the builtin round hash-mismatches here loudly.
v60 = [0.0] * 64
for p, c in ((15, 251.0), (31, -759.0), (5, -30.0), (10, 3.0), (53, -3.0)):
    v60[p] = c
v61 = [0.0] * 64
v61[15] = 500.0
vrows.append((60, v60, 0))
vrows.append((61, v61, 1))
con.execute("CREATE TABLE adve(vec_id BIGINT, embedding FLOAT[], "
            "label INTEGER)")
con.executemany("INSERT INTO adve VALUES (?,?,?)", vrows)
con.execute(f"COPY adve TO '{adv}/embeddings.parquet' (FORMAT PARQUET)")
print(f'{adv}: {con.execute("select count(*) from adve").fetchone()[0]} '
      'adversarial embeddings')

# adversarial events (ns timestamps via pyarrow — duckdb COPY would write
# us-precision and flip Spark's nanosAsLong schema branch): duplicate
# (user, ts) pairs (total-order tie-breaks), NULL user/type/value/props,
# NaN value (excluded from percentiles: engines disagree on NaN rank),
# malformed + non-numeric + null-valued JSON (try_cast/json_valid
# discipline), unicode event_type, 1e308 value. NULL ts is deliberately
# absent: events without timestamps are an ingest-contract violation.
import pyarrow as pa, pyarrow.parquet as pq
base_ns = 1704067200 * 10**9  # 2024-01-01
erows = []
def add(eid, ts_off_ns, uid, etype, value, props):
    erows.append((eid, base_ns + ts_off_ns, uid, etype, value, props))
add(0, 10**9, 1, 'click', 1.0, '{"k": 1}')
add(1, 10**9, 1, 'click', 2.0, '{"k": 2}')
add(2, 10**9, 1, 'purchase', 3.0, '{"k": 3}')
add(3, 2*10**9, None, 'click', 4.0, '{"k": 4}')
add(4, 3*10**9, 2, None, 5.0, '{"k": 5}')
add(5, 4*10**9, 2, 'click', None, None)
add(6, 5*10**9, 3, 'error', float('nan'), '{"k": 6}')
add(7, 6*10**9, 3, 'click', 7.0, 'not json at all')
add(8, 7*10**9, 3, 'click', 8.0, '{"k": "string not int"}')
add(9, 8*10**9, 3, 'click', 9.0, '{}')
add(10, 9*10**9, 4, 'signup', 10.0, '{"k": null}')
add(11, 10*10**9, 4, '\u0442\u0438\u043f', 1e308, '{"k": 11}')
# cross-engine rounding-boundary session (r15, StableRound's corpus-level
# regression guard): one fresh-user session of two 0.5025 events whose
# pinned-fold sum is EXACTLY double(1.005) \u2014 shortest decimal repr
# "1.005", the value where Spark's builtin round(x, 2) says 1.01 and
# DuckDB's says 1.00. q39/q74 emit 1.00 via the bit-stable floor round;
# a regression back to the builtin hash-mismatches this corpus loudly.
# Placement keeps every OTHER rounded aggregate boundary-safe: fresh
# user_id 9 (own session), fresh event_type (own q11/q41 groups), one
# event per 1-minute tumbling window (q11 sums 0.5025 per group -> 0.50
# in both engines), and 0.5025 itself rounds/quantiles identically
# everywhere (verified in DuckDB before pinning).
add(80, 55*10**9, 9, 'boundary', 0.5025, '{"k": 80}')
add(81, 115*10**9, 9, 'boundary', 0.5025, '{"k": 81}')
# r16 StableRound corpus guards, one per remaining migrated EVENTS family
# (every fixture verified divergent-under-builtin in DuckDB before
# pinning — see the r15 note above for why 0.5025 pairs sum to exactly
# double(1.005), the canonical below-half tie):
#   q11 tumbling sum: two 0.5025 events in ONE minute window (fresh user
#     10, fresh type) -> group sum 1.005 (builtin 1.01, stable 1.00)
add(82, 130*10**9, 10, 'bnd11', 0.5025, None)
add(83, 150*10**9, 10, 'bnd11', 0.5025, None)
#   q45 range-join sum + q46 as-of purchase_value: user 11's purchase
#     carries value 1.005 itself; its 24h window sums 1.005 + 0.0, and
#     the click probes back to it -> purchase_value rounds the raw 1.005
add(84, 200*10**9, 11, 'purchase', 1.005, None)
add(85, 260*10**9, 11, 'click', 0.0, None)
#   q41 percentiles (d=4): singleton group 'bndq' -> p50/p90/p99 all
#     exactly 1.03625 (builtin 1.0363, stable 1.0362)
add(86, 310*10**9, 12, 'bndq', 1.03625, None)
#   q27 avg_k: singleton 'bndk' group -> avg_k = 1.005 via the JSON k
add(87, 370*10**9, 13, 'bndk', 2.0, '{"k": 1.005}')
for i in range(12, 80):
    add(i, (i * 37 % 50) * 10**9 + (i % 3) * 10**8, i % 6,
        ['click', 'purchase', 'signup', 'error'][i % 4],
        round(random.uniform(0, 500), 2), '{"k": %d}' % i)
etbl = pa.table({
    'event_id': pa.array([r[0] for r in erows], pa.int64()),
    'ts': pa.array([r[1] for r in erows], pa.timestamp('ns')),
    'user_id': pa.array([r[2] for r in erows], pa.int64()),
    'event_type': pa.array([r[3] for r in erows], pa.string()),
    'value': pa.array([r[4] for r in erows], pa.float64()),
    'props': pa.array([r[5] for r in erows], pa.string()),
})
pq.write_table(etbl, f'{adv}/events.parquet')
print(f'{adv}: {len(erows)} adversarial events')

# adversarial orders + customer: the TRIPLE derivation's source tables
# (TripleStore.triples / updates / remoteChangelog read only these), so
# every LWW / scan / shard / graph gate entry runs on hostile strings and
# — via duplicated customer keys — on equal-timestamp ties whose objects
# straddle the astral/BMP divide ('😀' UTF-8 F0 9F…, UTF-16 D83D…; 'ﬀ'
# UTF-8 EF AC…, UTF-16 FB00 — the two orders FLIP), the divergence class
# that UTF-16 comparators in JVM-side winner selection silently get wrong
# (ASCII corpora mask it; the round-12 lww_object/streaming fix is the
# motivating bug). Corpus invariants the gate's oracles assume, kept here:
#   - o_orderkey stays UNIQUE (remoteChangelog/updates derive one row per
#     matching key and must stay key-unique changelogs); the dup-key tie
#     vector is CUSTOMER, whose triples carry ts_ms=0 on every row
#   - duplicated custkeys share ONE c_nationkey: a customer linking two
#     nations in different regions would merge components that q33's
#     region-rooted oracle labels independently
#   - every o_custkey exists in customer, and no string value starts with
#     '<': a '<'-prefixed object becomes a graph LEAF that never reaches a
#     region node, which q33's 3-hop region-labelled oracle drops
#   - no tabs/newlines (q73 round-trips these values through the plain-TSV
#     wire format, which cannot carry them) and no empty strings (an empty
#     unquoted CSV field reads back as NULL, not '')
STATUS = ['F', '😀', 'ﬀ', 'Ünïcödé', '中文状态', 'a b', 'é', 'é',
          '🚀🌕', 'b\\s', 'Z' * 200, '�', 'private', 'ᄀᄀᄀ',
          'ع ر ب', 'F']   # 'F' twice: q5_semi_anti's status='F' probe
PRIO = ['1-URGENT', '9-😀', '2-ﬀ LIGATURE', '5-ز عالية', '3-中等', '0-*',
        '7-Ẑẑ', '4-NOT SPECIFIED']
DATES = ['1995-03-15 00:00:00', '1969-07-20 20:17:40',  # pre-1970: ts_ms
         '1998-06-01 00:00:00', '2000-12-31 00:00:00']  # goes NEGATIVE
# through every LWW comparison tied to that date and through the TSV
# %f wire (format -> parse of a negative epoch must round-trip exactly)
orows = []
for k in range(1, 61):   # covers %3/%7/%11 (and combined) derivation
    orows.append((        # residues: REMOTE equal-ts/newer ties, UPDATED
        k,                # equal-ts overwrites, note inserts
        500 + k % 16,
        STATUS[k % len(STATUS)],
        1000.0 if k <= 15 else round((k * 137.31) % 400000, 2),
        DATES[k % 4],     # k<=15 share o_totalprice: q8's LIMIT 10 cuts
        PRIO[k % len(PRIO)]))  # inside a tie run (orderkey breaks it)
con.execute("CREATE TABLE advo(o_orderkey BIGINT, o_custkey BIGINT, "
            "o_orderstatus VARCHAR, o_totalprice DOUBLE, "
            "o_orderdate TIMESTAMP, o_orderpriority VARCHAR)")
con.executemany("INSERT INTO advo VALUES (?,?,?,?,?,?)", orows)
con.execute(f"COPY advo TO '{adv}/orders.parquet' (FORMAT PARQUET)")
print(f'{adv}: {len(orows)} adversarial orders')

crows = [
    # dup custkeys: equal-ts (0) hasSegment ties on divergent object pairs
    (500, 'n500', 3, 50.0, '😀seg'), (500, 'n500b', 3, 50.0, 'ﬀseg'),
    (501, 'n501', 7, 60.0, '🚀'),    (501, 'n501b', 7, 60.0, 'ﬁ'),
    (502, 'n502', 11, 70.0, '😀a'),  (502, 'n502b', 11, 70.0, 'ﬀa'),
    (502, 'n502c', 11, 70.0, 'za'),  # 3-way tie
    (503, 'same', 2, 80.0, 'same'),  (503, 'same', 2, 80.0, 'same'),
    # unique keys, hostile segments
    (504, 'n504', 1, 11.5, 'Ünïcödé wörds'),
    (505, 'n505', 5, -3.25, 'é'),          # precomposed U+00E9
    (506, 'n506', 5, 0.0, 'é'),      # decomposed e + combining acute
    (507, 'n507', 9, 2.25, '中文段'),
    (508, 'n508', 4, 91.0, ' leading'),
    (509, 'n509', 4, 92.0, 'trailing '),
] + [
    # one shared segment with equal balances: q8_topk's rn ties break on
    # custkey inside one window partition
    (510 + i, f'n{510 + i}', i % 25, 100.0, 'COMMON') for i in range(6)
]
con.execute("CREATE TABLE advc(c_custkey BIGINT, c_name VARCHAR, "
            "c_nationkey INTEGER, c_acctbal DOUBLE, c_mktsegment VARCHAR)")
con.executemany("INSERT INTO advc VALUES (?,?,?,?,?)", crows)
con.execute(f"COPY advc TO '{adv}/customer.parquet' (FORMAT PARQUET)")
print(f'{adv}: {len(crows)} adversarial customers')

# r16 StableRound corpus guard, LINEITEM-SUM family (d=2): the source
# lineitem rows pass through verbatim PLUS one planted order of two lines
# with quantity = extendedprice = 0.5025, so
#   - q6 gets a fresh ('B','B') group whose sum_qty = sum_price =
#     exactly double(1.005) (builtin 1.01, stable 1.00),
#   - q7's fresh l_orderkey partition reaches run_qty = 1.005 on line 2.
# The orderkey (999999) matches no adversarial order, so q5's inner join
# drops the rows (its revenue sum spans uncontrollable rows and cannot
# host an exact boundary); q42's global sums shift by the planted values
# identically in both engines; the fresh suppkey gives q43 its own
# two-row partition. Discount/tax are 0 so no other rounded column moves.
con.execute(f"CREATE TABLE advl AS SELECT * FROM "
            f"read_parquet('{src}/lineitem.parquet')")
con.executemany(
    "INSERT INTO advl VALUES (?,?,?,?,?,?,?,?,?,?,?)",
    [(999999, 999901, 999900, 1, 0.5025, 0.5025, 0.0, 0.0, 'B', 'B',
      '1997-01-01 00:00:00'),
     (999999, 999902, 999900, 2, 0.5025, 0.5025, 0.0, 0.0, 'B', 'B',
      '1997-01-02 00:00:00')])
con.execute(f"COPY advl TO '{adv}/lineitem.parquet' (FORMAT PARQUET)")
print(f'{adv}: '
      f'{con.execute("select count(*) from advl").fetchone()[0]} '
      'lineitem rows (2 planted boundary lines)')
