"""Empirically calibrate the HLL++ bias-correction table for THIS repo's
HLL parameters (p=8, m=256, md5-60bit hash, integerized raw estimate).

The HLL++ paper (Heule/Nussbaumer/Hunkeler, EDBT'13) corrects the raw
estimator's multiplicative bias in the mid range (raw <= 5m) by k-NN
interpolation over an empirical (rawEstimate, bias) table. Google's
published 200-point tables are for THEIR 64-bit hash family and are not
reproducible offline; this script rebuilds the table by the paper's own
method for OUR hash family: for each true cardinality n on a grid through
the bias zone, stream n distinct values through the EXACT production
register/estimate arithmetic (md5 -> 60-bit -> bucket/rho -> integer raw)
over T independent deterministic trials, and record
(mean raw estimate, mean raw - n).

Output: a literal HLL_BIAS_TABLE to paste into
bqetl_spark/functions/sketch.py — the SAME constants drive the Spark
expression and the DuckDB oracle CASE ladder, so the correction is
bit-replayable cross-engine.

Deterministic: streams are md5("cal:<trial>:<i>"); no RNG, no clock.
Hold-out evaluation in tests uses a DIFFERENT salt ("eval:").
"""

import hashlib
import sys

M = 256
W = 52
RHO_MAX = W + 1           # 53
ALPHA_PPM = 718272
RAW_NUM = ALPHA_PPM * M * M * (1 << RHO_MAX)


def raw_estimate(n: int, salt: str) -> tuple[int, int]:
    """(integer raw estimate, V) for a stream of n distinct values."""
    regs = [0] * M
    for i in range(n):
        hv = int(hashlib.md5(f"{salt}:{i}".encode()).hexdigest()[:15], 16)
        b = hv >> W
        rest = hv & ((1 << W) - 1)
        rho = RHO_MAX if rest == 0 else (W + 1) - rest.bit_length()
        if rho > regs[b]:
            regs[b] = rho
    v = sum(1 for r in regs if r)
    s = (M - v) * (1 << RHO_MAX) + sum(1 << (RHO_MAX - r) for r in regs if r)
    return RAW_NUM // (10**6 * s), v


def main():
    trials = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    # grid through the correction zone: raw <= 5m = 1280. Start below the
    # linear-counting handoff (raw <= 5m/2 = 640 with V < m) so the table
    # covers every raw the corrected branch can actually see.
    grid = list(range(500, 1525, 25))
    rows = []
    for n in grid:
        tot_raw = 0
        for t in range(trials):
            r, _ = raw_estimate(n, f"cal:{t}")
            tot_raw += r
        mean_raw = tot_raw // trials
        bias = max(0, mean_raw - n)
        rows.append((mean_raw, bias))
        print(f"n={n:5d}  mean_raw={mean_raw:5d}  bias={bias:4d}",
              file=sys.stderr)
    # anchors must be strictly increasing for interpolation
    dedup = []
    for x, b in rows:
        if not dedup or x > dedup[-1][0]:
            dedup.append((x, b))
    print("HLL_BIAS_TABLE = (")
    for i in range(0, len(dedup), 4):
        print("    " + " ".join(f"({x}, {b})," for x, b in dedup[i:i + 4]))
    print(")")


if __name__ == "__main__":
    main()
