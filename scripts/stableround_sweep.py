#!/usr/bin/env python3
"""Randomized cross-engine sweep of the StableRound formula: DuckDB
executing the EXACT SQL text `stableRoundSql` emits vs a bit-faithful
Python twin of `stableRoundScala` (Python floats are IEEE doubles and
`math.floor` is the double-typed floor, so the twin is exact). The
in-repo StableRoundSpec proves Column form == SQL-text form == Scala
form INSIDE Spark; this sweep closes the chain's other half — that
DuckDB computes the same bits — on millions of doubles instead of the
hand-picked spec battery, across every digit the gate uses (2, 4, 6, 9)
and the magnitude bands where each guard branch fires:

  - uniform mantissas at magnitudes 1e-8 .. 1e20 (all three branches),
  - values engineered NEAR k/10^d half boundaries (the divergence class),
  - the pass-through threshold 2^(52-d) +/- ulps,
  - the floor-safe split 2^52 crossing in v = x*10^d + 0.5,
  - NaN / +-inf / +-0.0 / subnormals / huge.

Exits non-zero on the first bit mismatch. Run:
  python3 scripts/stableround_sweep.py [n_per_band=200000] [seed=16]
"""
import math, random, struct, sys

import duckdb
import pyarrow as pa


def stable_py(x: float, d: int) -> float:
    t = float(1 << (52 - d))
    if not (abs(x) < t):          # NaN compares false -> pass-through
        return x
    p = 10.0 ** d
    v = x * p + 0.5
    if abs(v) < float(1 << 52):
        return math.floor(v) / p
    return v / p                  # |v| >= 2^52 -> v integral, floor = id


def sql_text(inner: str, d: int) -> str:
    # keep in lockstep with graft.functions.StableRound.stableRoundSql
    p = str(int(10.0 ** d)) + ".0"
    t = str(1 << (52 - d))
    return (f"CASE WHEN abs(({inner})) < {t}.0 "
            f"THEN (CASE WHEN abs(({inner}) * {p} + 0.5) < 4503599627370496.0 "
            f"THEN floor(({inner}) * {p} + 0.5) / {p} "
            f"ELSE (({inner}) * {p} + 0.5) / {p} END) ELSE ({inner}) END")


def bands(rng, n, d):
    out = []
    # uniform mantissa x magnitude sweep
    for _ in range(n):
        mag = 10.0 ** rng.uniform(-8, 20)
        out.append(rng.uniform(-1, 1) * mag)
    # near k/10^d half boundaries (the builtin-divergence class)
    for _ in range(n):
        k = rng.randrange(1, 10 ** min(d + 6, 15))
        base = (k + 0.5) / 10.0 ** d
        out.append(math.nextafter(base, rng.choice((0.0, math.inf))))
        out.append(base)
    # the pass-through threshold and the floor-safe split, +/- ulps
    t = float(1 << (52 - d))
    vsplit = float(1 << 52) / 10.0 ** d
    for anchor in (t, vsplit):
        x = anchor
        for _ in range(50):
            out.append(x); out.append(-x)
            x = math.nextafter(x, 0.0)
        x = anchor
        for _ in range(50):
            out.append(x); out.append(-x)
            x = math.nextafter(x, math.inf)
    # specials
    out += [float("nan"), float("inf"), float("-inf"), 0.0, -0.0,
            5e-324, -5e-324, 1.7976931348623157e308, 2.0 ** 52, 2.0 ** 53]
    return out


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200000
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    rng = random.Random(seed)
    con = duckdb.connect()
    total = bad = 0
    for d in (2, 4, 6, 9):
        xs = bands(rng, n, d)
        # bulk ARROW registration, NOT executemany (per-row inserts take
        # minutes at this cardinality) and NOT pandas (whose float64 NaN
        # registers as SQL NULL, silently dropping the NaN band); an
        # arrow float64 array round-trips the exact bits incl. NaN
        sweep_tbl = pa.table({"x": pa.array(xs, type=pa.float64())})
        con.register("sweep", sweep_tbl)
        con.execute(f"SELECT x, {sql_text('x', d)} FROM sweep")
        rows = con.fetchall()
        con.unregister("sweep")
        for x, got in rows:
            want = stable_py(x, d)
            total += 1
            if struct.pack("<d", got) != struct.pack("<d", want):
                bad += 1
                if bad <= 10:
                    print(f"MISMATCH d={d} x={x!r} duck={got!r} py={want!r}")
    print(f"swept {total} (value, d) pairs across d in (2,4,6,9): "
          f"{bad} bit mismatches")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
