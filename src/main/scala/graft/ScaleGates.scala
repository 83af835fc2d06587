package graft

/** Regression gates for the won performance bars (round-14, VERDICT
  * r13 item 2): ScaleSmoke FAILS — exits nonzero, not just records —
  * when a structural win silently backslides. Each bound is a
  * GENEROUS structural ceiling, sized to catch a lost fusion / a lost
  * probe confinement, not capture noise:
  *
  *   - IVM steady-epoch overhead ≤ 3.5 s at 30× (won bar 2.45 s,
  *     r13; losing the fused single-exchange advances re-adds ~1 s+
  *     of exchanges per epoch — over the ceiling; host noise measured
  *     ±0.5 s — under it).
  *   - PageRank post-derivation ≤ 15 s at 30× (won 10.06 s, r13,
  *     under the split methodology: the shared `lsh_derivation` is
  *     accounted once for the whole family).
  *   - Dup-spans steady probe ≤ 52 / 256 buckets (the r13 pinned
  *     confinement; the value is DETERMINISTIC — it depends only on
  *     the steady doc's gram content, not on timing — so the pin is
  *     exact, not slack).
  *
  * Kept as pure predicates so the forced-failure spec
  * (ScaleGatesSpec) can prove each gate trips without running the
  * smoke.
  */
object ScaleGates {

  val IvmSteadyOverheadMaxSec = 3.5
  val PageRankMaxSec = 15.0
  val DupSpansProbeBucketsMax = 52

  /** 100× IVM steady-epoch ceiling AT THE STATE-PROPORTIONAL BUCKET
    * SHAPE (the r14 A/B: 256 buckets reads 2.10 s steady at 100× —
    * below the 30× floor; the 64-bucket shape reads 3.18–3.52 s and is
    * NOT the deployment shape at that state size). The 100× smoke
    * earns this gate by migrating 64→256 mid-run via
    * `ExactlyOnce.rebucketState` and measuring the steady epochs at
    * 256 — losing either the migration or the fused advances puts the
    * number over this ceiling.
    */
  val Ivm100SteadyOverheadMaxSec = 3.5

  /** 30× novelty steady-epoch ceiling (r15 verdict item 5: the slowest
    * UNGATED steady materializer — 4.84 s at 30× in SCALE_r15 — and
    * ungated numbers are the ones that rot). Generous: losing the
    * O(batch grams + touched buckets) retraction path re-reads the
    * whole standing census per epoch, which lands well over 7 s; host
    * noise measured ±0.5 s stays under it.
    */
  val NoveltySteadyMaxSec = 7.0

  /** True iff the novelty steady-epoch max holds its bar (a zero or
    * negative measurement fails — steady epochs must actually run).
    */
  def noveltySteadyOk(sec: Double): Boolean =
    sec > 0 && sec <= NoveltySteadyMaxSec

  /** True iff the measured IVM steady-epoch overhead holds the bar.
    * A missing measurement (negative sentinel) FAILS — a smoke that
    * never produced steady epochs must not pass silently.
    */
  def ivmSteadyOk(sec: Double): Boolean =
    sec >= 0 && sec <= IvmSteadyOverheadMaxSec

  /** True iff the 100× post-migration steady overhead holds its bar
    * (negative sentinel fails, as above).
    */
  def ivm100SteadyOk(sec: Double): Boolean =
    sec >= 0 && sec <= Ivm100SteadyOverheadMaxSec

  /** True iff the post-derivation pagerank time holds the bar (0 or
    * absent fails — the op must actually have run).
    */
  def pagerankOk(sec: Option[Double]): Boolean =
    sec.exists(s => s > 0 && s <= PageRankMaxSec)

  /** True iff the steady probe stayed within the pinned bucket set. */
  def dupSpansProbeOk(buckets: Int): Boolean =
    buckets > 0 && buckets <= DupSpansProbeBucketsMax
}
