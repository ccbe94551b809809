package graft

import graft.nexmark.SparkSpec
import graft.queries.Similarity

/** Pins for `s_opq_permute` (OPQ-P energy-balanced dimension allocation):
  *
  *   - conservation — the allocation is a true permutation, so the total
  *     dimension-energy mass is identical across the two layouts (a
  *     dropped or doubled dim breaks this exactly);
  *   - balance — the sorted round-robin deal must not WIDEN the
  *     per-subspace energy spread vs the contiguous layout (the entire
  *     point of the permutation);
  *   - shape — exactly one row per subspace, every audit column
  *     non-negative.
  *
  * Total reconstruction MSE is deliberately NOT pinned to improve: on
  * near-isotropic embeddings the gain is marginal by construction (the
  * sf0.1 measurement is −0.3%), and OPQ's guarantee is about balanced
  * subspace energy, which IS pinned.
  */
class OpqPermuteSpec extends SparkSpec {
  private val Dirs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")

  test("s_opq_permute: energy conservation, non-widened spread, shape") {
    for (dir <- Dirs) {
      val rows = Similarity.opqPermute(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .sortBy(_._1)
      assert(rows.map(_._1).toSeq == (0L to 7L), s"subspace rows wrong at $dir")
      assert(rows.forall(r => r._2 >= 0 && r._3 >= 0 && r._4 >= 0 && r._5 >= 0),
        s"negative audit mass at $dir")
      val (base, perm) = (rows.map(_._2), rows.map(_._3))
      assert(base.sum == perm.sum,
        s"energy not conserved at $dir: ${base.sum} != ${perm.sum}")
      val spreadBase = base.max - base.min
      val spreadPerm = perm.max - perm.min
      assert(spreadPerm <= spreadBase,
        s"permutation widened the energy spread at $dir: $spreadPerm > $spreadBase")
    }
  }
}
