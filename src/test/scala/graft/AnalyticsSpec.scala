package graft

/** Invariants of the analytic operators that the value-level oracle
  * can't express: funnel stages only shrink, the resampled series is
  * dense (every minute present for every type), and the salted
  * aggregation's sub-aggregates actually fan out the group key.
  */
class AnalyticsSpec extends SparkSpec {

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("evt_funnel: stage populations are monotonically non-increasing") {
    val stages = q("evt_funnel").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(stages.size == 3)
    assert(stages("1_view") >= stages("2_click"))
    assert(stages("2_click") >= stages("3_purchase"))
    assert(stages("1_view") > 0)
  }

  test("evt_resample: dense spine — every (type, minute) cell exists exactly once") {
    val rows = q("evt_resample").collect()
    val types = rows.map(_.getString(0)).distinct
    val minutes = rows.map(_.getLong(1))
    val span = minutes.max - minutes.min + 1
    assert(rows.length == types.length * span,
      s"${rows.length} rows != ${types.length} types x $span minutes")
    // zero-filled gaps really are zero, not missing
    assert(rows.exists(_.getLong(2) == 0L), "expected at least one gap minute")
  }

  test("rel_agg_salted: salt fans out before folding (two aggregates in plan)") {
    val p = q("rel_agg_salted").queryExecution.executedPlan.toString
    assert("HashAggregate".r.findAllIn(p).size >= 4, p) // 2 phases x (partial+final)
  }
}
