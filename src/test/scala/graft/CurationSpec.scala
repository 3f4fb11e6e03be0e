package graft

import org.scalatest.funsuite.AnyFunSuite

/** SURVEY §2.3 L28–L31: curation knobs — quota caps, vocabulary
  * coverage, distinctive terms, temperature mixture. */
class CurationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("L28: quota cap — kept ≤ N per source, kept ≤ total, deterministic") {
    val rows = SparkEntry.queries("q_quota_cap")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val total = r.getLong(1); val kept = r.getLong(2)
      assert(kept <= operators.Curation.QuotaN, s"${r.getString(0)}: kept $kept > cap")
      assert(kept <= total)
      assert(kept == math.min(total, operators.Curation.QuotaN.toLong),
        "cap must bind exactly: keep min(total, N)")
    }
    val again = SparkEntry.queries("q_quota_cap")(spark, dir).collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq, "not deterministic")
  }

  test("L28: the kept SET itself is deterministic and hash-ranked (not arbitrary rows)") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    // reconstruct the kept set twice with different shuffle partitioning;
    // the hash-ranked rule must pick identical doc_ids
    def keptSet(parts: Int): Set[Long] = {
      val h = graft.functions.HashExpr.polyHash(
        concat(col("doc_id").cast("string"), lit(":"), col("source")))
      Tables.documents(spark, dir).repartition(parts)
        .withColumn("rn", row_number().over(
          Window.partitionBy("source").orderBy(h, col("doc_id"))))
        .filter(col("rn") <= operators.Curation.QuotaN)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    }
    assert(keptSet(3) == keptSet(17), "kept set depends on partitioning")
  }

  test("L29: vocabulary coverage — ratios in [0,1], integer sums consistent") {
    val rows = SparkEntry.queries("q_vocab_coverage")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val hits = r.getLong(2); val dw = r.getLong(3); val cov = r.getDouble(4)
      assert(hits <= dw, "in-vocab hits cannot exceed distinct words")
      assert(cov >= 0.0 && cov <= 1.0)
      assert(math.abs(cov - hits.toDouble / dw) < 1e-3, "coverage != hits/words")
    }
  }

  test("L30: distinctive terms — ≤5 per lang, scores in (0,1], df floor respected, rank order") {
    val rows = SparkEntry.queries("q_tfidf_terms")(spark, dir).collect()
    val byLang = rows.groupBy(_.getString(0))
    assert(byLang.nonEmpty)
    byLang.foreach { case (lang, rs) =>
      assert(rs.length <= 5, s"$lang has ${rs.length} rows")
      assert(rs.map(_.getLong(1)).toSeq == (1L to rs.length).toSeq, "rn not 1..k")
      rs.foreach { r =>
        val ldf = r.getLong(3); val cdf = r.getLong(4); val score = r.getDouble(5)
        assert(cdf >= operators.Curation.TermMinDf)
        assert(ldf <= cdf, "lang df cannot exceed corpus df")
        assert(score > 0.0 && score <= 1.0)
      }
      val scores = rs.map(_.getDouble(5)).toSeq
      assert(scores == scores.sorted.reverse, s"$lang scores not descending")
    }
  }

  test("L31: temperature mixture — sub-linear scaling flattens the distribution") {
    val rows = SparkEntry.queries("q_mixture_temperature")(spark, dir).collect()
    assert(rows.nonEmpty)
    val byN = rows.sortBy(_.getLong(1))
    val smallest = byN.head; val largest = byN.last
    // the largest stratum keeps ~everything (thr = TempBps exactly:
    // floor(B·sqrt(max)/sqrt(max)) = B); smaller strata keep a HIGHER
    // fraction than proportional-to-sqrt would allow relative to the
    // largest — i.e. thr/TempBps ≥ n_l/n_max (sqrt is concave)
    assert(largest.getLong(2) == operators.Curation.TempBps,
      s"largest stratum thr ${largest.getLong(2)} != TempBps")
    rows.foreach { r =>
      val n = r.getLong(1); val thr = r.getLong(2); val kept = r.getLong(3)
      assert(kept <= n)
      assert(thr * largest.getLong(1) >= n * operators.Curation.TempBps - largest.getLong(1),
        s"${r.getString(0)}: thr below the concavity floor")
      // thr ≈ B·sqrt(n/nmax) ⇒ thr² ≈ B²·n/nmax within rounding
      val lhs = thr.toDouble * thr
      val rhs = operators.Curation.TempBps.toDouble * operators.Curation.TempBps *
        n / largest.getLong(1)
      assert(math.abs(lhs - rhs) <= 2 * operators.Curation.TempBps.toDouble,
        s"${r.getString(0)}: thr² $lhs vs expected $rhs")
    }
    // determinism: the kept count is a pure function of the data
    val again = SparkEntry.queries("q_mixture_temperature")(spark, dir).collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("L37: train/val/test split — disjoint, exhaustive, stratified, deterministic") {
    val rows = SparkEntry.queries("q_split_train")(spark, dir).collect()
    assert(rows.nonEmpty)
    val byLang = rows.groupBy(_.getString(0))
    val docTotal = Tables.documents(spark, dir).count()
    // exhaustive: per-lang split counts sum to the lang total, and lang
    // totals sum to the corpus (nothing dropped, nothing duplicated)
    byLang.foreach { case (lang, rs) =>
      val total = rs.head.getLong(4)
      assert(rs.map(_.getLong(4)).distinct.length == 1, s"$lang: lang_total disagrees")
      assert(rs.map(_.getLong(2)).sum == total, s"$lang: splits don't partition")
      assert(rs.map(_.getString(1)).toSet.subsetOf(Set("train", "val", "test")))
      assert(rs.map(_.getString(1)).distinct.length == rs.length, s"$lang: dup split rows")
    }
    assert(byLang.values.map(_.head.getLong(4)).sum == docTotal)
    // stratified: with 90/5/5 bands, train must dominate in every lang
    // that has enough docs for the expectation to bind (loose 2-sigma-ish
    // bound — the draw is a fixed hash, so this is deterministic, not flaky)
    byLang.foreach { case (lang, rs) =>
      val total = rs.head.getLong(4)
      if (total >= 100) {
        val train = rs.find(_.getString(1) == "train").map(_.getLong(2)).getOrElse(0L)
        assert(train.toDouble / total > 0.8, s"$lang: train frac ${train.toDouble / total}")
      }
    }
    // frac column is the single-division rendering of n/lang_total
    rows.foreach { r =>
      // HALF_UP to 4dp, matching Spark's round() (math.rint is half-even
      // and would diverge on an exact .00005 tie)
      val expect = BigDecimal(r.getLong(2).toDouble / r.getLong(4))
        .setScale(4, scala.math.BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getDouble(5) - expect) < 1e-12)
    }
    // determinism
    val again = SparkEntry.queries("q_split_train")(spark, dir).collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }
}
