package graft

/** Vetted permutation-seed list for [[ScaleSynth]]'s documents
  * transform — the output of the r15 sweep
  * `python3 tools/vet_rotations.py /root/testdata/sf0.1/documents.parquet perm 170`
  * (seeds whose banded-LSH ≥0.5-estimate pair count lands within 1.5×
  * of the identity's either way, in seed order; see the acceptance
  * rationale in the tool). Kept as data-only so the sweep can refresh
  * it without touching the synthesizer logic.
  */
object VettedSeeds {
  val r15: Seq[Int] = Seq(
    3, 19, 21, 22, 24, 32, 34, 35, 38, 42, 47, 50, 53, 55, 56, 57, 59,
    60, 65, 72, 83, 85, 88, 91, 94, 95, 102, 106, 107, 114, 121, 122,
    125, 128, 129, 131, 132, 133, 145, 156, 157, 161, 168, 169)
}
