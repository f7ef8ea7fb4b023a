package graft

/** Vetted permutation-seed list for [[ScaleSynth]]'s documents
  * transform — the union of the r15 sweeps
  * `python3 tools/vet_rotations.py /root/testdata/sf0.1/documents.parquet perm 170`
  * and `... perm 600 171` (seeds whose banded-LSH ≥0.5-estimate pair
  * count lands within 1.5× of the identity's either way, in seed
  * order; acceptance 166/600 ≈ 28%, mean load ratio 1.02× — see the
  * acceptance rationale in the tool). 166 seeds ⇒ documents factors up
  * to 167 (identity replica + 166), covering the ~sf10 text decade
  * (factor 100). Kept as data-only so the sweep can refresh it without
  * touching the synthesizer logic.
  */
object VettedSeeds {
  val r15: Seq[Int] = Seq(
    3, 19, 21, 22, 24, 32, 34, 35, 38, 42, 47, 50, 53, 55, 56, 57, 59,
    60, 65, 72, 83, 85, 88, 91, 94, 95, 102, 106, 107, 114, 121, 122,
    125, 128, 129, 131, 132, 133, 145, 156, 157, 161, 168, 169,
    177, 178, 180, 181, 184, 189, 190, 191, 193, 198, 207, 208, 212,
    213, 218, 220, 221, 244, 247, 250, 251, 255, 259, 260, 263, 276,
    277, 279, 283, 284, 294, 295, 297, 298, 318, 320, 330, 334, 335,
    336, 339, 340, 342, 343, 352, 356, 359, 361, 362, 364, 365, 367,
    369, 375, 376, 381, 388, 390, 391, 396, 402, 403, 407, 410, 411,
    414, 431, 432, 433, 436, 441, 452, 454, 456, 458, 467, 471, 472,
    475, 483, 484, 485, 487, 491, 494, 497, 498, 500, 504, 505, 508,
    509, 512, 513, 521, 522, 535, 536, 538, 539, 540, 542, 545, 548,
    557, 558, 565, 566, 573, 577, 578, 579, 584, 585, 586, 589, 591,
    592, 593, 596, 599, 600)
}
