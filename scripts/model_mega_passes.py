"""Analytic MXU tile-pass model for the vocoder megakernel.

Counts 128x128x128 MXU passes per matmul in the current phase-block layout
vs candidate "lane-group fold" layouts (g true-time phases folded into
sublane channel blocks, banded block-Toeplitz weights with overlap
sharing). Used to rank fold candidates before burning chip time.

Model: a (M, K) @ (K, L) matmul costs ceil(M/128)*ceil(K/128)*ceil(L/128)
passes. Measured total (5.43 ms @ B128) is ~1.3x below the model's naive
sum, so use RELATIVE savings only.

Fold math (see fused_melgan.py for the unfolded layout):
- folded storage: lanes = true time groups of g, sublane block p = in-group
  phase; a dilated conv (3 taps, dilation d) on folded data is ONE matmul
  with K = (g + 2d)*C_in (contiguous in-group phase window, edge blocks from
  +-1 lane shifts) and M = g*C_out; weight density 3/(g+2d) -> FLOP
  replication is the price of full tiles.
- pointwise (w2): K = 2*g*C (block-diag), M = g*C.
- k-tap conv head (proj_out, k=7 d=1): K = (g + k - 1)*C_in.
"""

import math
from itertools import product

TILE = 128


def ceil(x):
    return math.ceil(x / TILE)


def passes(m, k, l):
    return ceil(m) * ceil(k) * ceil(l)


def stage_report(t0=248, factors=(2, 8, 2, 2), base=384, nrb=3, ks=3):
    rows = []
    # proj_in: k=7 conv, 80 -> base, P=1
    rows.append(("proj_in", passes(base, 7 * 80, t0), None))
    c_in, P = base, 1
    for i, f in enumerate(factors):
        c_out = c_in // 2
        L_in = P * t0
        P_out = P * f
        L_out = P_out * t0
        # upsample: two matmuls (f/2*C_out, 2C_in) @ (2C_in, L_in)
        up = 2 * passes(f // 2 * c_out, 2 * c_in, L_in)
        # fold candidates for the stack at this stage
        best = None
        unfolded = 0
        for blk in range(nrb):
            d = ks ** blk
            unfolded += passes(c_out, 3 * c_out, L_out)       # w1
            unfolded += passes(c_out, 2 * c_out, L_out)       # w2
        for g in (1, 2, 4, 8, 16):
            if g > P_out or (P_out * t0) % g:
                continue
            tot = 0
            for blk in range(nrb):
                d = ks ** blk
                if g == 1:
                    tot += passes(c_out, 3 * c_out, L_out)
                    tot += passes(c_out, 2 * c_out, L_out)
                else:
                    tot += passes(g * c_out, (g + 2 * d) * c_out, L_out // g)
                    tot += passes(g * c_out, 2 * g * c_out, L_out // g)
            if best is None or tot < best[1]:
                best = (g, tot)
        rows.append((f"stage{i} up (f={f},C={c_out})", up, None))
        rows.append((f"stage{i} stack C={c_out} P={P_out}", unfolded, best))
        c_in, P = c_out, P_out
    L = P * t0
    # proj_out: k=7, C_in=24 -> 4
    po_un = passes(4, 7 * c_in, L)
    po_best = None
    for g in (8, 16, 32, 64):
        if L % g:
            continue
        p = passes(g * 4, (g + 6) * c_in, L // g)
        if po_best is None or p < po_best[1]:
            po_best = (g, p)
    rows.append(("proj_out", po_un, po_best))
    # pqmf tail: J=16 taps, N=4 -> 4 phases
    pq_un = passes(4, 16 * 4, L)
    pq_best = None
    for g in (16, 32, 64):
        if L % g:
            continue
        p = passes(g * 4, (g + 15) * 4, L // g)
        if pq_best is None or p < pq_best[1]:
            pq_best = (g, p)
    rows.append(("pqmf tail", pq_un, pq_best))

    total_un = sum(r[1] for r in rows)
    total_best = sum((r[2][1] if r[2] and r[2][1] < r[1] else r[1])
                     for r in rows)
    print(f"{'matmul group':34s} {'passes':>7s} {'folded':>7s} {'g':>3s}")
    for name, un, best in rows:
        if best and best[1] < un:
            print(f"{name:34s} {un:7d} {best[1]:7d} {best[0]:3d}")
        else:
            print(f"{name:34s} {un:7d} {'-':>7s}")
    print(f"{'TOTAL':34s} {total_un:7d} {total_best:7d}  "
          f"({100*(1-total_best/total_un):.1f}% saved)")
    # measured 5.43 ms maps to total_un; project folded time
    print(f"projected folded time: {5.43*total_best/total_un:.2f} ms "
          f"(from 5.43)")


if __name__ == "__main__":
    stage_report()
