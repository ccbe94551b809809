package graft

import graft.nexmark.SparkSpec
import graft.queries.Relational

/** Pins for the round-11 relational scale operators:
  *
  *   - `r_incremental_agg`: merge(base MV, delta partials) must equal the
  *     from-scratch aggregate on EVERY key (matches_full ≡ 1) — the MV
  *     maintenance identity, checked at two SFs;
  *   - `r_zorder_layout`: the property the entry exists to demonstrate —
  *     the single-column sort leaves d2 effectively unbounded per bucket
  *     while z-order bounds BOTH spans below a domain fraction, so
  *     either-dimension predicates can skip files.
  */
class LayoutAndMvSpec extends SparkSpec {

  for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
    test(s"incremental MV merge equals full recompute on every key ($dir)") {
      val rows = Relational.incrementalAgg(spark, dir).collect()
      assert(rows.nonEmpty)
      assert(rows.forall(_.getInt(3) == 1), "a key diverged from the recompute")
    }
  }

  test("z-order bounds both dimension spans; custsort leaves d2 unbounded") {
    val rows = Relational.zorderLayout(spark, "/root/testdata/sf0.01").collect()
      .map(r => (r.getString(0), r.getLong(7), r.getLong(8))) // layout, d1_span, d2_span
    val (z, c) = rows.partition(_._1 == "zorder")
    assert(z.nonEmpty && c.nonEmpty)
    val dom = 1 << 10
    // custsort: d1 tight, d2 ~the whole domain on every bucket
    assert(c.forall(_._2 <= dom / 16), s"custsort d1 spans: ${c.map(_._2).toSeq}")
    assert(c.forall(_._3 > dom / 2), s"custsort d2 spans: ${c.map(_._3).toSeq}")
    // z-order: BOTH spans bounded well below the domain on every bucket
    assert(z.forall(b => b._2 <= dom / 2 && b._3 <= dom / 4),
      s"zorder spans: ${z.map(b => (b._2, b._3)).toSeq}")
  }
}
