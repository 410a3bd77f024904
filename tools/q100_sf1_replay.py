#!/usr/bin/env python3
"""Focused sf1 replay of the q100_semdedup oracle CONTRACT with an
independent vectorized implementation.

The DuckDB single-statement oracle (SparkEntry.oracleSql
["q100_semdedup"]) is correct but its recursive-CTE transitive
closure materializes all reachable PAIRS — quadratic in component
size, which at sf1 (50k vectors, dense fixed-grain LSH buckets)
exceeds any replay budget. This script computes the IDENTICAL
contract end to end:

  - hyperplanes s[i,j] = +1 iff the first hex digit of
    md5(f"{i}:{j}") is in 8..f (the oracle's `plane` CTE, bit for bit)
  - sign signature sg = sum(1<<i for proj_i > 0), 4 bands of 4 bits
  - candidate pairs = same-band same-key, vec_i < vec_j
  - cosine rounded half-away-from-zero to 6 dp (DuckDB ROUND), kept
    at >= 0.4
  - connected components via union-find, component label = min id
  - output rows: (vec_id, kept_id=component) for vec_id != component

and diffs against the engine's parquet output. Matmul + union-find
replace the quadratic closure: minutes instead of unbounded.

Float note: the only arithmetic difference vs DuckDB is summation
order inside the dot products (pairwise BLAS vs sequential list_sum);
a divergence requires a cosine within ~1e-12 of a 6-dp rounding
boundary AND of the 0.4 threshold — checked and reported below.

Usage: q100_sf1_replay.py <sfDir> <verifyOutDir>
"""
import hashlib
import sys

import numpy as np
import pandas as pd


def main(sf_dir, out_dir):
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    emb = emb.sort_values("vec_id").reset_index(drop=True)
    ids = emb["vec_id"].to_numpy()
    V = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    n, d = V.shape
    assert d == 64, d

    # oracle `plane` CTE, bit for bit
    S = np.empty((16, d))
    for i in range(16):
        for j in range(d):
            h = hashlib.md5(f"{i}:{j}".encode()).hexdigest()[0]
            S[i, j] = 1.0 if h in "89abcdef" else -1.0
    proj = V @ S.T  # n x 16
    bits = (proj > 0).astype(np.int64)
    sg = (bits << np.arange(16, dtype=np.int64)).sum(axis=1)

    norms = np.sqrt((V * V).sum(axis=1))

    # union-find over POSITIONS
    parent = np.arange(n)

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[rb] = ra

    def round6(x):
        # DuckDB ROUND: half away from zero (cos >= 0.4 => positive)
        return np.floor(x * 1e6 + 0.5) / 1e6

    n_pairs = 0
    boundary_risk = 0
    for b in range(4):
        key = (sg >> (4 * b)) & 15
        for k in range(16):
            members = np.where(key == k)[0]
            if len(members) < 2:
                continue
            Vm = V[members]
            G = Vm @ Vm.T
            denom = np.outer(norms[members], norms[members])
            cos = G / denom
            r = round6(cos)
            iu, ju = np.triu_indices(len(members), k=1)
            hit = r[iu, ju] >= 0.4
            # float-boundary audit: a DuckDB divergence needs the raw
            # cosine within ~1e-12 of a 6-dp HALF boundary (k + 0.5 in
            # units of 1e-6, where round-half-away flips) — i.e. the
            # fractional part of cos*1e6 sits at 0.5, so flag
            # |frac(cos*1e6) - 0.5| small. (The earlier form added 0.5
            # before taking the fraction, which flagged cosines exactly
            # AT a 6-dp value — the safest points — and never the true
            # boundary; fixed per the round-9 advisor.)
            frac = np.abs((cos[iu, ju] * 1e6) % 1.0 - 0.5)
            boundary_risk += int(((frac < 1e-6) & (np.abs(
                r[iu, ju] - 0.4) < 1e-5)).sum())
            for a_, b_ in zip(members[iu[hit]], members[ju[hit]]):
                union(a_, b_)
                n_pairs += 1

    # canonical min-id label per component, over nodes IN some pair
    in_pair = parent != np.arange(n)
    # nodes that are roots of a >1 component also count — recompute:
    roots = np.array([find(x) for x in range(n)])
    comp_sizes = np.bincount(roots, minlength=n)
    touched = comp_sizes[roots] > 1
    comp_min = {}
    for x in np.where(touched)[0]:
        r_ = roots[x]
        comp_min[r_] = min(comp_min.get(r_, ids[x]), ids[x])
    rows = [(ids[x], comp_min[roots[x]])
            for x in np.where(touched)[0]
            if ids[x] != comp_min[roots[x]]]
    got = pd.DataFrame(rows, columns=["vec_id", "kept_id"]) \
        .sort_values(["vec_id"]).reset_index(drop=True)

    eng = pd.read_parquet(f"{out_dir}/q100_semdedup") \
        .sort_values(["vec_id"]).reset_index(drop=True)
    print(f"pairs>=0.4: {n_pairs}, boundary-risk pairs: {boundary_risk}")
    print(f"replay rows: {len(got)}, engine rows: {len(eng)}")
    if len(got) != len(eng):
        print("FAIL q100_semdedup: row count mismatch")
        sys.exit(1)
    eq = (got["vec_id"].to_numpy() == eng["vec_id"].to_numpy()).all() \
        and (got["kept_id"].to_numpy() == eng["kept_id"].to_numpy()).all()
    if not eq:
        diff = (got["kept_id"].to_numpy() != eng["kept_id"].to_numpy())
        print("FAIL q100_semdedup: values differ; first:")
        print(got[diff].head(3))
        print(eng[diff].head(3))
        sys.exit(1)
    print(f"OK   q100_semdedup ({len(got)} rows)")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
