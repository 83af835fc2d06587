package graft

/** Exchange/join-count regression gate (round-3 verdict item 3).
  *
  * PlanSweepSpec catches categorical regressions (cartesian, unlisted
  * BNLJ, lost total order) but not QUANTITATIVE ones: a query that
  * silently gains an exchange, or whose broadcast join degrades into a
  * sort-merge join (e.g. a lost `broadcast()` hint), only surfaces as
  * a slower bench. This spec diffs every declared query's physical
  * plan against the committed census artifact (`PLANS_r{N}.md`, the
  * newest in cwd — written by `runMain graft.Explain --all` at sf0.01)
  * and fails on unexplained growth:
  *
  *   - exchange count above the committed value,
  *   - broadcast-hash joins below committed while shuffle-side joins
  *     (SMJ + shuffled-hash + BNLJ) grew — the lost-broadcast shape.
  *
  * Shrinkage (fewer exchanges, more broadcasts) passes — that's an
  * improvement whose new baseline lands in the next census. Queries
  * not in the census (new this round) are skipped here and enter the
  * census when the round artifact is regenerated. Intentional plan
  * changes go in [[explainedChanges]] with the reason.
  *
  * Census conditions are replicated exactly: sf0.01 tables (file sizes
  * drive broadcast planning) and the runtime bloom-filter flag Explain
  * sets; session confs are applied on a forked session so other suites
  * sharing the JVM are untouched.
  */
class PlanCensusSpec extends SparkSpec {

  /** query -> reason, for plan changes made deliberately this round
    * (empty once the census is regenerated to the new baseline).
    */
  private val explainedChanges: Map[String, String] = Map.empty

  private case class Census(exchanges: Int, bhj: Int, smj: Int, bnlj: Int,
      cartesian: Int)

  private def loadCensus(): Option[(String, Map[String, Census])] = {
    val f = Option(new java.io.File(".").listFiles()).toSeq.flatten
      .filter(_.getName.matches("PLANS_r\\d+\\.md"))
      .sortBy(_.getName).lastOption
    f.map { file =>
      val row = """\|\s*([a-z0-9_]+)\s*\|\s*(\d+)\s*\|\s*(\d+)\s*\|\s*(\d+)\s*\|\s*(\d+)\s*\|\s*(\d+)\s*\|\s*(\d+)\s*\|\s*(\d+)\s*\|""".r
      val rows = scala.io.Source.fromFile(file, "UTF-8").getLines().collect {
        case row(q, ex, bhj, smj, bnlj, cart, _, _) =>
          q -> Census(ex.toInt, bhj.toInt, smj.toInt, bnlj.toInt, cart.toInt)
      }.toMap
      file.getName -> rows
    }
  }

  test("no query's plan gained exchanges or lost a broadcast vs the " +
      "committed census") {
    val (censusFile, census) = loadCensus().getOrElse(
      fail("no committed PLANS_r*.md census found"))
    assert(census.size > 100, s"census $censusFile parsed only ${census.size} rows")

    // replicate the census capture conditions on a forked session
    val s = spark.newSession()
    s.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    val sfDir = "/root/testdata/sf0.01"

    val offenders = scala.collection.mutable.ArrayBuffer.empty[String]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      census.get(name).foreach { c =>
        val p =
          try fn(s, sfDir).queryExecution.executedPlan.toString
          catch { case e: Throwable => offenders += s"$name: planning failed: $e"; "" }
        def n(pat: String) = pat.r.findAllIn(p).size
        val ex = n("Exchange ")
        val bhj = n("BroadcastHashJoin")
        val shuffleJoins = n("SortMergeJoin") + n("ShuffledHashJoin") +
          n("BroadcastNestedLoopJoin")
        val committedShuffleJoins = c.smj + c.bnlj
        if (explainedChanges.contains(name)) ()
        else {
          if (ex > c.exchanges)
            offenders += s"$name: exchanges $ex > committed ${c.exchanges} ($censusFile)"
          if (bhj < c.bhj && shuffleJoins > committedShuffleJoins)
            offenders += (s"$name: broadcast joins $bhj < committed ${c.bhj} " +
              s"while shuffle-side joins grew ($shuffleJoins > " +
              s"$committedShuffleJoins) — lost broadcast?")
        }
        if (n("CartesianProduct") > 0)
          offenders += s"$name: CartesianProduct"
      }
    }
    assert(offenders.isEmpty,
      s"plan regressions vs $censusFile:\n${offenders.mkString("\n")}")
  }
}
