package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine-stable numeric helpers.
  *
  * `round(v, d)` is NOT engine-stable: Spark rounds via BigDecimal
  * HALF_UP over the decimal rendering of the binary double while DuckDB
  * rounds half away from zero through a different path, and when
  * `v·10^d` lands exactly on `x.5` they can disagree by one unit of the
  * last decimal (observed live: one cell of `m8_graph_propagation` at
  * sf0.1, `0.272687` vs `0.272688`; same family as the `-0.0` artifact
  * that reddened m9 in round 4). The floor form below is pure IEEE
  * arithmetic — multiply, add, floor, divide are bit-identical in every
  * engine — so results hash identically everywhere. Ties round toward
  * +∞ (floor(x+0.5)), a different convention from either engine's
  * `round`, but conventions don't matter for the oracle: only
  * cross-engine agreement does.
  *
  * What this does NOT fix: when the INPUT doubles themselves differ by
  * an ulp between engines (groupBy-sum addition order is deterministic
  * in neither) and the value sits within that ulp of a rounding
  * boundary, no rounding convention can agree. The mitigation is
  * coarser precision on iterative-aggregation outputs (m8/m9 round to
  * 4 decimals, w5 scales then rounds to 2), and — when the true values
  * live on an exact DECIMAL grid (m8: sums of k/1000 hash features), so
  * boundary landings are systematic rather than measure-zero —
  * [[gridSafeRound]], which nudges the rounding point 1e-9 off the
  * grid: far above ulp noise, far below the grid spacing, and written
  * identically on both engines. Exact integer ratios (jaccard) need
  * NEITHER: both engines divide the same integers and get the same
  * double, which the floor form then rounds identically.
  */
object Num {

  /** floor(c·10^d + 0.5) / 10^d — engine-stable `d`-decimal rounding. */
  def stableRound(c: Column, d: Int): Column = {
    val s = math.pow(10, d) // exact for d ≤ 15
    floor(c * s + lit(0.5)) / s
  }

  /** DuckDB SQL mirror of [[stableRound]], kept in lockstep. */
  def stableRoundSql(expr: String, d: Int): String =
    s"floor(($expr) * 1e$d + 0.5) / 1e$d"

  /** [[stableRound]] for values on an exact decimal grid: the +1e-9
    * nudge moves systematic x.5 landings decisively above the boundary
    * in BOTH engines (ulp noise ~1e-16 can no longer flip the floor),
    * while every off-boundary grid point stays ≥ grid-spacing/2 − 1e-9
    * away from a boundary. Same operation order as the SQL mirror. */
  def gridSafeRound(c: Column, d: Int): Column = stableRound(c + lit(1e-9), d)

  /** DuckDB SQL mirror of [[gridSafeRound]], kept in lockstep. */
  def gridSafeRoundSql(expr: String, d: Int): String =
    stableRoundSql(s"($expr) + 1e-9", d)
}
