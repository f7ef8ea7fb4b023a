#!/usr/bin/env python3
"""Independent transcription of the reference's datasketch MinHash scheme
(reference/lambdas/check_duplicate/utils.py:22-30) used ONLY to generate
test pins for DatasketchSpec.scala.

Scheme (all public knowledge -- datasketch library docs + kshingle docs):
  shingles = set of UNIQUE character substrings of lengths 1..k
  h        = first 4 bytes of sha1(shingle_utf8), little-endian uint32
  phv      = ((a*h + b) wrapped to uint64) mod (2^61-1), masked to 2^32-1
  sig[p]   = min over shingles, init 2^32-1

Perm table (a, b) is parsed out of DatasketchPerms.scala, whose first
entries are independently pinned against numpy RandomState(1).

PROVENANCE (updated r6): numpy IS available driver-side (1.26.4), and
the FULL 512-constant permutation table in DatasketchPerms.scala was
verified bit-exact against a live numpy.random.RandomState(1)
replaying datasketch's _init_permutations draw — the permutation
layer is library-ground-truth. What remains transcription-pinned is
only the shingle/sha1/fold semantics: datasketch/kshingle themselves
still cannot be installed here (no network egress), so a shared
MISREADING of those semantics between this pure-python transcription
and the Scala impl would pass both. To close that last gap, run in
any networked env:

    pip install datasketch==1.6.4 kshingle numpy
    python - <<'EOF'
    from datasketch import MinHash
    import kshingle
    for text in ["the quick brown fox jumps over the lazy dog", "ab"]:
        m = MinHash(num_perm=256, seed=1)
        for sh in kshingle.shingleset_k(text, 5):
            m.update(sh.encode("utf8"))
        print(list(m.hashvalues[:8]))
    EOF

and diff against EXPECTED below; record the output alongside this file.
"""
import hashlib
import re
import sys

PRIME = (1 << 61) - 1
MAXHASH = (1 << 32) - 1
U64 = (1 << 64) - 1


def load_perms(path):
    src = open(path).read()
    arrays = re.findall(r"val ([AB]): Array\[Long\] = Array\((.*?)\)", src, re.S)
    out = {}
    for name, body in arrays:
        out[name] = [int(x) for x in re.findall(r"(-?\d+)L", body)]
    assert len(out["A"]) == 256 and len(out["B"]) == 256
    return out["A"], out["B"]


def sha1_hash32(b):
    d = hashlib.sha1(b).digest()
    return d[0] | (d[1] << 8) | (d[2] << 16) | (d[3] << 24)


def shingleset_k(s, k):
    out = set()
    for ln in range(1, k + 1):
        for i in range(0, len(s) - ln + 1):
            out.add(s[i:i + ln])
    return out


def signature(s, k, A, B):
    sig = [MAXHASH] * 256
    for sh in shingleset_k(s, k):
        h = sha1_hash32(sh.encode("utf8"))
        for p in range(256):
            v = ((A[p] * h + B[p]) & U64) % PRIME & MAXHASH
            if v < sig[p]:
                sig[p] = v
    return sig


if __name__ == "__main__":
    A, B = load_perms(sys.argv[1] if len(sys.argv) > 1 else
                      "src/main/scala/graft/functions/DatasketchPerms.scala")
    for text in ["the quick brown fox", "ab", "regulatory document body text"]:
        sig = signature(text, 5, A, B)
        print(repr(text))
        print("  first6 :", sig[:6])
        print("  sum256 :", sum(sig))
        print("  last2  :", sig[-2:])
