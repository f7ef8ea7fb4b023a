#!/usr/bin/env python3
"""Vet character bijections for graft.ScaleSynth's replica transform.

ScaleSynth replicates the documents table with a per-replica alphabet
bijection: r15+ ships seeded Fisher-Yates PERMUTATIONS
(ScaleSynth.permAlpha, `vettedPermSeeds`); rotations were r14's
transform and remain sweepable here for comparison (`rot` mode). Any
bijection preserves the TRUE shingle-overlap structure exactly (it is
applied to both sides of every pair), but the 16-permutation MinHash
ESTIMATE rides the hash landscape of each replica's shingle universe —
and with the synthetic corpus's ~30-word vocabulary that universe is
small enough for a bad roll: a transform under which a handful of very
common shingles draw tiny hash values across many permutations
correlates every doc's minima and inflates the >=0.5-estimate pair
count by orders of magnitude (r14 measurement: rotation 8 gives 3.5M
pairs where identity gives 43k; perm seed 6 gives 3.6M). Rotations
have a SECOND defect permutations fix: a rotation shifts adjacent
bytes equally, so byte-ORDER relations (the dHash bits of the
multimodal family) are rotation-invariant and replicas collided 267x
in mm_phash_dedup; a random permutation scrambles order relations.

This sweep computes, for each candidate transform, the number of
distinct banded-LSH candidate pairs whose 16-perm estimate passes 0.5
— the dd_minhash_lsh load — over a source documents.parquet, then
prints the seeds whose count lands within [1/1.5, 1.5]x of the
identity's, in seed order. ScaleSynth's `vettedPermSeeds` is that list
from `perm` mode over /root/testdata/sf0.1 (NOT part of the engine —
dev/measurement tool). The LCG here (a=1103515245, c=12345, m=2^31)
is bit-identical to ScaleSynth.permAlpha, so a seed vetted here is
exactly the transform the synthesizer applies.

Usage: python3 tools/vet_rotations.py [documents.parquet] [perm|rot] [maxSeed] [minSeed]
"""
import sys

import duckdb

ALPHA = "abcdefghijklmnopqrstuvwxyz"


def perm_alpha(seed: int) -> str:
    """Seeded Fisher-Yates permutation of the alphabet — the SAME LCG
    as ScaleSynth.permAlpha (a=1103515245, c=12345, m=2^31), so a seed
    vetted here is bit-identical to the transform the synthesizer
    applies (seed 0 = identity on both sides). Shingle-set equality —
    the minhash geometry — is preserved under ANY character
    bijection."""
    chars = list(ALPHA)
    x = seed & 0x7FFFFFFF
    for i in range(25, 0, -1):
        x = (1103515245 * x + 12345) % (1 << 31)
        j = x % (i + 1)
        chars[i], chars[j] = chars[j], chars[i]
    return "".join(chars)


def transforms(mode: str, max_seed: int, min_seed: int = 1):
    if mode == "rot":
        return [(f"rot {r}", ALPHA[r:] + ALPHA[:r]) for r in range(26)]
    return [("seed 0 (identity)", ALPHA)] + \
        [(f"seed {s}", perm_alpha(s)) for s in range(min_seed, max_seed + 1)]


def sweep(src: str, mode: str = "perm", max_seed: int = 40,
          min_seed: int = 1):
    con = duckdb.connect()
    results = {}
    for name, rot in transforms(mode, max_seed, min_seed):
        sql = f"""
WITH c AS (
  SELECT doc_id,
    array_to_string((string_split(lower(trim(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
      translate(text, '{ALPHA}', '{rot}'), '<[^>]*>', ' ', 'g'), '\\.\\.\\.+', '.', 'g'),
      '([.]|,|;|:|!|\\?)[.,;:!?]+', '.', 'g'), '\\s+', ' ', 'g'))), ' '))[1:24], ' ') AS ct
  FROM '{src}'
), h AS (
  SELECT doc_id,
    list_transform(generate_series(1, greatest(strlen(ct) - 4, 1)),
      i -> ('0x' || substr(md5(substr(ct, i, 5)), 1, 15))::BIGINT % 2147483647) AS hashes
  FROM c
), s AS (
  SELECT doc_id,
    list_transform(generate_series(0, 15), p ->
      list_min(list_transform(hashes, h ->
        ((2654435761 * (p+1) % 2147483647) * h
         + (40503 * (p+7) % 2147483647)) % 2147483647))) AS sig
  FROM h
), b AS (
  SELECT doc_id, sig, band_id,
    md5(array_to_string(sig[band_id*4+1 : band_id*4+4], '_')) AS band_key
  FROM s, (SELECT unnest(generate_series(0,3)) AS band_id)
), pairs AS (
  SELECT DISTINCT a.doc_id AS a_id, b2.doc_id AS b_id,
         a.sig AS asig, b2.sig AS bsig
  FROM b a JOIN b b2 USING (band_id, band_key)
  WHERE a.doc_id < b2.doc_id
)
SELECT count(*) FROM pairs
WHERE len(list_filter(generate_series(1,16), i -> asig[i] = bsig[i]))::DOUBLE / 16 >= 0.5
"""
        results[name] = con.sql(sql).fetchone()[0]
        print(f"{name:20s}: {results[name]:>9d} pairs", flush=True)
    names = list(results)
    base = results[names[0]]
    # acceptance band: within 1.5x of identity EITHER WAY — the hazard
    # being vetted against is load DISTORTION (inflation correlates
    # every doc's minima; deflation starves the candidate stage), and
    # the chosen replicas' SUM should track replicas x identity
    vetted = [n for n in names[1:]
              if base / 1.5 <= results[n] <= base * 1.5]
    vetted_counts = [results[n] for n in vetted]
    print(f"\nidentity: {base} pairs")
    print(f"vetted (within 1.5x, seed order): "
          f"{[int(n.split()[1]) for n in vetted]}")
    print(f"vetted count: {len(vetted)}; mean load ratio: "
          f"{sum(vetted_counts) / max(len(vetted_counts), 1) / base:.3f}")
    worst = max(names, key=results.get)
    print(f"worst: {worst} at {results[worst]} "
          f"({results[worst] / max(base, 1):.0f}x identity)")


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 \
        else "/root/testdata/sf0.1/documents.parquet"
    mode = sys.argv[2] if len(sys.argv) > 2 else "perm"
    sweep(src, mode, int(sys.argv[3]) if len(sys.argv) > 3 else 40,
          int(sys.argv[4]) if len(sys.argv) > 4 else 1)
